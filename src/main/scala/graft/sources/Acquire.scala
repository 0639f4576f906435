package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Browser-download acquisition analog (crocus A6): the reference's
  * Vanguard flow clicks a download button, the browser drops a file
  * with an OPAQUE name into a shared download folder, and the scraper
  * claims it by renaming the latest-modified file to `{isin}.{ext}`
  * (vanguard.py:114-153, base_scraper.py:85-109).
  *
  * Engine form: fetch → land under an opaque staging name → claim by
  * argmax-mtime → rename into the landing dir keyed by isin. The loop
  * is deliberately SEQUENTIAL like the reference: claim-latest over a
  * shared staging dir is only correct when downloads don't interleave
  * — that coupling is the semantic of click-download sources. Source
  * systems that expose direct URLs should use HttpSource.fetchAll
  * (partition-parallel, explicit filenames); this connector exists for
  * the systems that only offer an opaque-name download, and the
  * catalog it iterates is driver-small (a fund list, not data).
  */
object Acquire {

  case class AcquireResult(isin: String, url: String, landed: String,
      bytes: Long, ok: Boolean, error: String)

  /** base_scraper.py:85-109: rename the most recently modified staging
    * file to `{key}.{ext}` in landingDir, keeping its extension.
    * Mtime ties break by name (descending) for determinism; the
    * reference's glob+max has no tiebreak at all. None if staging is
    * empty (the reference logs and returns False). */
  def claimLatest(stagingDir: String, key: String, landingDir: String): Option[Path] = {
    val listing = Files.list(Paths.get(stagingDir))
    val staged =
      try listing.toArray.map(_.asInstanceOf[Path]).filter(Files.isRegularFile(_))
      finally listing.close()
    if (staged.isEmpty) None
    else {
      val latest = staged.maxBy(p =>
        (Files.getLastModifiedTime(p).toMillis, p.getFileName.toString))
      val name = latest.getFileName.toString
      val ext = name.lastIndexOf('.') match {
        case -1 => "csv"
        case i  => name.substring(i + 1)
      }
      Files.createDirectories(Paths.get(landingDir))
      val dest = Paths.get(landingDir, s"$key.$ext")
      Files.move(latest, dest, StandardCopyOption.REPLACE_EXISTING)
      Some(dest)
    }
  }

  /** Extension rule shared by BOTH acquisition paths: the text after
    * the url's last '.', truncated at the first non-alphanumeric
    * (query strings, fragments), accepted when 1..4 chars; csv
    * otherwise. The Column mirror below must stay in lockstep —
    * SourcesSpec asserts the two paths land identical filenames. */
  private[sources] def extOf(url: String): String =
    url.lastIndexOf('.') match {
      case -1 => "csv"
      case i  => val e = url.substring(i + 1).takeWhile(_.isLetterOrDigit)
        if (e.nonEmpty && e.length <= 4) e else "csv"
    }

  /** Codegen'd Column mirror of [[extOf]] (no UDF): after-last-dot,
    * leading alphanumeric run, 1..4 chars else csv. */
  private[sources] def extColOf(url: Column): Column = {
    val after = regexp_extract(url, "\\.([^.]*)$", 1)
    val e = regexp_extract(after, "^([A-Za-z0-9]*)", 1)
    when(length(e).between(1, 4), e).otherwise(lit("csv"))
  }

  /** Stream one url into staging under an opaque browser-style name
    * (`download-<n>.<ext>` — the reference never controls this name).
    * Delegates to HttpSource.fetchOne, which deletes the partial file
    * on failure — a half-download left in staging would be claimed as
    * the NEXT product's data by the mtime argmax. */
  private def fetchOpaque(url: String, stagingDir: String, seq: Int): Path = {
    val dest = Paths.get(stagingDir, s"download-$seq.${extOf(url)}")
    HttpSource.fetchOne(url, dest.toString)
    dest
  }

  /** vanguard.py:114-153: per catalog row (isin, url): fetch → land
    * opaque → claim-latest → `{isin}.{ext}`. Failures come back as
    * rows, not exceptions (continue-on-error per product,
    * base_scraper.py:103-109).
    *
    * SIZE BOUNDARY (VERDICT r10 #6): the driver-side sequential loop
    * is the faithful model of a click-download source — and it is
    * acceptable ONLY while the catalog is driver-small (a fund list:
    * hundreds to low thousands of rows, one politeness-limited fetch
    * each). Above `maxSequential` rows the loop stops being a
    * politeness semantic and becomes a driver bottleneck, so the call
    * DELEGATES to HttpSource.fetchAll's partition-parallel fetch with
    * explicit `{isin}.{ext}` filenames: keyed names make the shared
    * staging dir and its mtime-argmax claim unnecessary (that dance
    * exists only because browsers drop OPAQUE names), and politeness
    * survives as the cluster-wide rate `parallelism / delayMs` —
    * HttpSource's contract. Both paths return the same AcquireResult
    * schema and land the same `{isin}.{ext}` files; SourcesSpec
    * asserts the equivalence on the same catalog. */
  def acquireAll(spark: SparkSession, products: DataFrame,
      stagingDir: String, landingDir: String, delayMs: Long = 0L,
      maxSequential: Int = 1024, parallelism: Int = 4): DataFrame = {
    import spark.implicits._
    Files.createDirectories(Paths.get(landingDir))
    if (products.count() > maxSequential) {
      val keyed = products
        .select(col("isin").cast("string"), col("url").cast("string"))
        .withColumn("filename",
          concat(col("isin"), lit("."), extColOf(col("url"))))
        .withColumn("landed",
          concat(lit(landingDir + "/"), col("filename")))
      val fetched = HttpSource
        .fetchAll(keyed.select(col("url"), col("filename")), landingDir,
          parallelism, delayMs)
        .withColumnRenamed("dest", "landed").drop("url")
      // landed is unique per row (isin is the key), so the join-back
      // is 1:1; inner — fetchAll returns a row per input element
      return keyed.join(fetched, Seq("landed"))
        .select(col("isin"), col("url"),
          when(col("ok"), col("landed")).otherwise(lit(null).cast("string"))
            .as("landed"),
          col("bytes"), col("ok"), col("error"))
    }
    Files.createDirectories(Paths.get(stagingDir))
    val catalog = products.select("isin", "url").as[(String, String)].collect()
    val results = catalog.zipWithIndex.map { case ((isin, url), i) =>
      if (delayMs > 0) Thread.sleep(delayMs) // politeness, vanguard.py:150
      try {
        fetchOpaque(url, stagingDir, i)
        claimLatest(stagingDir, isin, landingDir) match {
          case Some(p) => AcquireResult(isin, url, p.toString, Files.size(p),
            ok = true, null)
          case None => AcquireResult(isin, url, null, 0L, ok = false,
            "staging empty after fetch")
        }
      } catch {
        case e: Exception => AcquireResult(isin, url, null, 0L, ok = false,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    results.toSeq.toDF()
  }
}
