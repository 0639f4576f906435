package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for repeated big-big joins (100 TB design
  * point): bucketed + sorted tables co-locate join keys at write time,
  * so every subsequent join/aggregation on the bucket key runs
  * shuffle-free (Exchange elision; asserted in LayoutSpec).
  *
  * The reference re-scrapes and re-reads its whole catalog every run
  * (crocus ishares.py:196 memoization TODO); the engine's answer is
  * write-once layout: fact tables bucketed by their join key, snapshot
  * partitions on top (Catalog.writeSnapshot).
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet") // managed: lands under spark.sql.warehouse.dir
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Compact a directory of small parquet files into ~`targetMB`-sized
    * ones. Small-files is the canonical 100 TB operational problem
    * (per-file open cost, driver listing pressure, tiny tasks); daily
    * snapshot ingestion (Catalog.writeSnapshot) produces exactly this
    * shape over time. Rewrites into a temp dir then swaps, so readers
    * never see a half-compacted directory. */
  def compact(spark: SparkSession, dir: String, targetMB: Int = 128): Long = {
    val df = spark.read.parquet(dir)
    val bytes = df.inputFiles.map(f =>
      new java.io.File(new java.net.URI(f)).length()).sum
    val parts = math.max(1, (bytes / (targetMB * 1024L * 1024L)).toInt)
    val tmp = dir.stripSuffix("/") + ".compacting"
    df.repartition(parts).write.mode("overwrite").parquet(tmp)
    val dest = new java.io.File(dir)
    val old = java.nio.file.Files.createTempDirectory("compact-old")
    java.nio.file.Files.move(dest.toPath, old.resolve("old"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(new java.io.File(tmp).toPath, dest.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    parts.toLong
  }
}
