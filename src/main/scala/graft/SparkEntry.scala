package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.engine.Tables.{dec2, dec4}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine surface is assembled from query packs; every pack entry
  * has a matching DuckDB oracle unless the operator is inherently
  * non-SQL-expressible (sketches, LSH) — those get rows-only checks
  * and are ground-truthed in the ScalaTest suite instead.
  */
object SparkEntry {
  private val packs = Seq(Relational, Windows, Funcs, Pipeline,
    StreamingQueries, Typed, Multimodal, SqlSurface, Curation, Retrieval,
    Temporal, Snapshots, Audits, HoldingsContent)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation (scan→filter→join→agg→sort→limit — the
    * reference's full capability arc A1→A10→A13→A15→A14 in one plan). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.t(spark, d, "customer")
      .join(Tables.t(spark, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(Tables.t(spark, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.t(spark, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue"), col("n_name"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
