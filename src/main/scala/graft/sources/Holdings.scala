package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-fund holdings files (crocus §1.1: one CSV per ISIN next to the
  * catalog; content schema not captured in the reference → inferred at
  * ingest, FIXTURES.md §A.3).
  *
  * Engine form: holdings land as a directory of csv files named
  * `{isin}.csv`; ingest reads the whole tree in one distributed scan
  * and derives the `isin` column from the file name — no per-file
  * driver loop (the reference's sequential per-ISIN handling,
  * ishares.py:175-187, becomes partition-parallel I/O).
  */
object Holdings {

  /** Read every `{isin}.csv` under dir; header + schema inference, isin
    * from the filename. Generic entry for trees of UNKNOWN content
    * schema (the reference never pins one) — inference is an extra
    * full scan of the tree, so callers that KNOW their content schema
    * (every engine-landed tree) must use [[readHoldingsAs]]. */
  def readHoldings(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("mode", "PERMISSIVE") // continue-on-error, base_scraper.py:130-134
      .csv(s"$dir/*.csv")
      .withColumn("isin",
        regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))

  /** [[readHoldings]] with an EXPLICIT content schema (r18, guide §6 /
    * VERDICT r17 #5): csv inferSchema is a FULL EXTRA SCAN of the
    * landed tree per resolved relation — a 100 TB anti-pattern and,
    * locally, a per-execution re-scan for every holdings query (the
    * r17 memo only amortized it in-session). The engine WRITES these
    * trees (landPerKeyCsv), so the content schema is known at the call
    * site; binding is positional against the header row (enforceSchema
    * default), and the value parse (UnivocityParser) is the same one
    * inference would have picked for these types, so ingested values
    * are bit-identical to the inferred path — oracle-checked on all
    * four holdings queries. */
  def readHoldingsAs(spark: SparkSession, dir: String,
      content: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(content)
      .csv(s"$dir/*.csv")
      .withColumn("isin",
        regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))

  /** Write one csv per key — the reference's `{isin}.{ext}` sink shape
    * (ishares.py:184-186) as a partitioned write. */
  def writePerKey(df: DataFrame, dir: String, keyCol: String): Unit =
    df.write.mode("overwrite")
      .partitionBy(keyCol)
      .option("header", "true")
      .csv(dir)

  /** Land one FLAT `{key}.csv` per key — the exact on-disk shape the
    * reference's downloader leaves behind (ishares.py:184-186: one
    * holdings csv named by the fund's ISIN, key in the FILENAME, not
    * a column). One distributed partitioned write, then a driver-side
    * rename per key (the rename is metadata-only, like the reference's
    * claim-latest move in base_scraper.py:96); readHoldings re-derives
    * the key from the filename. Key values must be filesystem-safe
    * (the fund ids here are). */
  def landPerKeyCsv(df: DataFrame, dir: String, keyCol: String): Unit = {
    val staging = dir.stripSuffix("/") + ".staging"
    // coalesce(1): exactly one csv per partition dir, so the rename
    // below is unambiguous (fixture-scale catalogs — a real 100 TB
    // deployment keeps the partitioned tree and skips the flattening)
    df.coalesce(1).write.mode("overwrite").partitionBy(keyCol)
      .option("header", "true").csv(staging)
    val dest = new java.io.File(dir)
    dest.mkdirs()
    Option(new java.io.File(staging).listFiles).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(keyCol + "="))
      .foreach { kd =>
        val v = java.net.URLDecoder.decode(
          kd.getName.drop(keyCol.length + 1), "UTF-8")
        val part = kd.listFiles.filter(_.getName.endsWith(".csv"))
        require(part.length == 1, s"expected one csv under $kd")
        java.nio.file.Files.move(part.head.toPath,
          new java.io.File(dest, v + ".csv").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(staging))
  }

  /** Latest file per key by modification time — the reference's
    * argmax-by-mtime rename (base_scraper.py:85-109,96) as a windowed
    * top-1 over a binaryFile listing. */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("isin"))
      .orderBy(desc("modificationTime"), desc("path"))
    spark.read.format("binaryFile").load(s"$dir/*")
      .select(col("path"), col("modificationTime"), col("length"),
        regexp_extract(col("path"), "([^/]+)\\.[A-Za-z0-9]+$", 1).as("isin"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
