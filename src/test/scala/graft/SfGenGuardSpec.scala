package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

/** The sf1 fixture staleness guard (round 9): SfGen.validateManifest
  * must accept a fixture whose MANIFEST matches the current base data
  * and name the reason otherwise — this is what stops a driver
  * testdata regeneration from being silently verified against stale
  * scaled data. Pure-JVM spec (no Spark session). */
class SfGenGuardSpec extends AnyFunSuite {

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
    assert(SfGen.validateManifest(base.toString, fix.toString).isEmpty)
  }

  test("a changed base file is reported by table name") {
    val (base, fix) = stage()
    Files.writeString(base.resolve("documents.parquet"), "regenerated")
    val why = SfGen.validateManifest(base.toString, fix.toString)
    assert(why.exists(_.contains("documents.parquet changed")), why)
  }

  test("a missing manifest is reported (pre-guard fixture)") {
    val (base, fix) = stage()
    Files.delete(fix.resolve("MANIFEST.json"))
    val why = SfGen.validateManifest(base.toString, fix.toString)
    assert(why.exists(_.contains("no MANIFEST.json")), why)
  }

  test("a missing scaled table is reported as corrupt") {
    val (base, fix) = stage()
    Files.delete(fix.resolve("lineitem.parquet"))
    val why = SfGen.validateManifest(base.toString, fix.toString)
    assert(why.exists(_.contains("lineitem.parquet missing")), why)
  }
}
