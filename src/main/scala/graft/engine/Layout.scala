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
}
