package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The sf1 fixture staleness guard (round 9): SfGen.validateManifest
  * must accept a fixture whose MANIFEST matches the current base data
  * and name the reason otherwise — this is what stops a driver
  * testdata regeneration from being silently verified against stale
  * scaled data. The validateManifest cases are pure-JVM; the
  * sfcheck.py chaos cases (round 10) borrow the shared session only
  * to count rows when staging an honest fake fixture. */
class SfGenGuardSpec extends SparkTestBase {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def md5hex(p: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(Files.readAllBytes(p))
    md.digest().map("%02x".format(_)).mkString
  }

  /** A fake base dir (copies of the tiny sf0.001 files) + a fixture
    * dir whose manifest matches it exactly. */
  private def stage(): (java.nio.file.Path, java.nio.file.Path) = {
    val base = Files.createTempDirectory("sfguard_base")
    val fix = Files.createTempDirectory("sfguard_fix")
    val entries = tables.map { t =>
      val src = Paths.get(s"/root/testdata/sf0.001/$t.parquet")
      val dst = base.resolve(s"$t.parquet")
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
      // scaled side: content irrelevant to the md5 check, presence isn't
      Files.copy(src, fix.resolve(s"$t.parquet"))
      s"""    "$t": {"base_md5": "${md5hex(dst)}", "scaled_rows": 1}"""
    }.mkString(",\n")
    Files.writeString(fix.resolve("MANIFEST.json"),
      s"""{\n  "factor": 10,\n  "base_dir": "$base",\n""" +
        s"""  "tables": {\n$entries\n  }\n}\n""")
    (base, fix)
  }

  test("matching manifest validates (None)") {
    val (base, fix) = stage()
    assert(SfGen.validateManifest(base.toString, fix.toString, 10).isEmpty)
  }

  test("a changed base file is reported by table name") {
    val (base, fix) = stage()
    Files.writeString(base.resolve("documents.parquet"), "regenerated")
    val why = SfGen.validateManifest(base.toString, fix.toString, 10)
    assert(why.exists(_.contains("documents.parquet changed")), why)
  }

  test("a missing manifest is reported (pre-guard fixture)") {
    val (base, fix) = stage()
    Files.delete(fix.resolve("MANIFEST.json"))
    val why = SfGen.validateManifest(base.toString, fix.toString, 10)
    assert(why.exists(_.contains("no MANIFEST.json")), why)
  }

  test("a missing scaled table is reported as corrupt") {
    val (base, fix) = stage()
    Files.delete(fix.resolve("lineitem.parquet"))
    val why = SfGen.validateManifest(base.toString, fix.toString, 10)
    assert(why.exists(_.contains("lineitem.parquet missing")), why)
  }

  test("a factor mismatch is refused, naming both factors (ADVICE r9)") {
    val (base, fix) = stage()
    val why = SfGen.validateManifest(base.toString, fix.toString, 30)
    assert(why.exists(w => w.contains("factor 10") &&
      w.contains("factor 30")), why)
  }

  // ---- cross-tool chaos cases: tools/sfcheck.py (the fast harness-side
  // twin) must ALSO fail loudly, by table name, on an adversarial tree —
  // the guard is only as strong as its weakest implementation.

  private def sfcheck(base: java.nio.file.Path, fix: java.nio.file.Path,
      extra: String*): (Int, String) = {
    // resolve relative to the working directory (ADVICE r10: no repo-root
    // coupling — the spec must run from any checkout location)
    val script = new java.io.File("tools/sfcheck.py").getAbsolutePath
    val cmd = (Seq("python3", script, base.toString, fix.toString) ++ extra)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  /** stage() plus a real single-file parquet per scaled table and a
    * manifest whose scaled_rows match — sfcheck.py reads real parquet
    * footers, so the fake needs honest metadata. */
  private def stageReal(): (java.nio.file.Path, java.nio.file.Path) = {
    val base = Files.createTempDirectory("sfguard_base")
    val fix = Files.createTempDirectory("sfguard_fix")
    val entries = tables.map { t =>
      val src = Paths.get(s"/root/testdata/sf0.001/$t.parquet")
      Files.copy(src, base.resolve(s"$t.parquet"))
      Files.copy(src, fix.resolve(s"$t.parquet"))
      // scaled_rows = the real row count of the copied file
      val rows = rowCount(src)
      s"""    "$t": {"base_md5": "${md5hex(src)}", "scaled_rows": $rows}"""
    }.mkString(",\n")
    Files.writeString(fix.resolve("MANIFEST.json"),
      s"""{\n  "factor": 10,\n  "base_dir": "$base",\n""" +
        s"""  "tables": {\n$entries\n  }\n}\n""")
    Files.createFile(fix.resolve("_SUCCESS"))
    (base, fix)
  }

  private def rowCount(p: java.nio.file.Path): Long =
    spark.read.parquet(p.toString).count()

  test("sfcheck.py passes a whole fixture and fails a factor mismatch") {
    val (base, fix) = stageReal()
    val (ok, okOut) = sfcheck(base, fix)
    assert(ok == 0, okOut)
    val (bad, badOut) = sfcheck(base, fix, "--factor", "30")
    assert(bad != 0 && badOut.contains("factor"), badOut)
  }

  test("sfcheck.py fails loudly (no traceback) on a bad --factor operand") {
    val (base, fix) = stageReal()
    // ADVICE r10: missing / non-integer operands must hit the same
    // named-FAIL contract the parquet chaos cases enforce
    val (noOp, noOpOut) = sfcheck(base, fix, "--factor")
    assert(noOp != 0 && noOpOut.contains("FAIL") &&
      !noOpOut.contains("Traceback"), noOpOut)
    val (notInt, notIntOut) = sfcheck(base, fix, "--factor", "ten")
    assert(notInt != 0 && notIntOut.contains("FAIL") &&
      !notIntOut.contains("Traceback"), notIntOut)
  }

  test("sfcheck.py names the table on a truncated scaled parquet") {
    val (base, fix) = stageReal()
    // truncate to half: parquet footer gone → unreadable, must not traceback
    val victim = fix.resolve("orders.parquet")
    val bytes = Files.readAllBytes(victim)
    Files.write(victim, bytes.take(bytes.length / 2))
    val (code, out) = sfcheck(base, fix)
    assert(code != 0 && out.contains("orders.parquet") &&
      !out.contains("Traceback"), out)
  }

  test("sfcheck.py names the table on a row-count mismatch") {
    val (base, fix) = stageReal()
    val mf = fix.resolve("MANIFEST.json")
    val txt = Files.readString(mf)
    // bump customer's recorded count by one
    val pat = """("customer": \{"base_md5": "[0-9a-f]{32}", "scaled_rows": )(\d+)""".r
    val bumped = pat.replaceAllIn(txt,
      m => m.group(1) + (m.group(2).toLong + 1))
    assert(bumped != txt, "spec bug: customer entry not found")
    Files.writeString(mf, bumped)
    val (code, out) = sfcheck(base, fix)
    assert(code != 0 && out.contains("customer.parquet"), out)
  }
}
