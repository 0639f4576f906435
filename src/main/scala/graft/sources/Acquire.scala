package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Stream one url into staging under an opaque browser-style name
    * (`download-<n>.<ext>` — the reference never controls this name).
    * Delegates to HttpSource.fetchOne, which deletes the partial file
    * on failure — a half-download left in staging would be claimed as
    * the NEXT product's data by the mtime argmax. */
  private def fetchOpaque(url: String, stagingDir: String, seq: Int): Path = {
    val ext = url.lastIndexOf('.') match {
      case -1 => "csv"
      case i  => val e = url.substring(i + 1).takeWhile(_.isLetterOrDigit)
        if (e.nonEmpty && e.length <= 4) e else "csv"
    }
    val dest = Paths.get(stagingDir, s"download-$seq.$ext")
    HttpSource.fetchOne(url, dest.toString)
    dest
  }

  /** vanguard.py:114-153: per catalog row (isin, url): fetch → land
    * opaque → claim-latest → `{isin}.{ext}`. Failures come back as
    * rows, not exceptions (continue-on-error per product,
    * base_scraper.py:103-109). */
  def acquireAll(spark: SparkSession, products: DataFrame,
      stagingDir: String, landingDir: String, delayMs: Long = 0L): DataFrame = {
    import spark.implicits._
    Files.createDirectories(Paths.get(stagingDir))
    Files.createDirectories(Paths.get(landingDir))
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
