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
    * from the filename. */
  def readHoldings(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("mode", "PERMISSIVE") // continue-on-error, base_scraper.py:130-134
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
