package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB design point.
  *
  * A hot grouping key (one customer with 10% of all events, one
  * near-dup cluster with millions of members) turns a single reducer
  * into the stage's critical path. Salting splits each key into
  * `buckets` sub-keys for the wide shuffle, then combines the partials
  * with a second (tiny) aggregation. Valid for any associative,
  * salt-independent aggregate; the exact-decimal sums used across this
  * engine are associative by construction, so salted == direct
  * bit-for-bit (asserted in SkewSpec).
  *
  * AQE's skew-join splitting (enabled by default) covers joins; this
  * covers aggregations, which AQE does not re-split.
  */
object Skew {

  /** Two-phase salted sum of `valCol` (exact decimal, emitted double)
    * plus row count, grouped by `keyCol`. The salt is a DETERMINISTIC
    * hash of the whole row — never monotonically_increasing_id, whose
    * value changes when a map task is recomputed after a shuffle-fetch
    * failure, re-routing rows to different reduce partitions than the
    * copies already fetched (the SPARK-23207 double-count/drop class).
    * Identical rows sharing a salt is harmless: the salt only spreads
    * the hot key, it carries no semantics. */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col): _*), lit(buckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(Tables.dec2(col(valCol))).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).cast("double").as(s"sum_$valCol"),
        sum(col("_pcnt")).as("n"))
  }
}
