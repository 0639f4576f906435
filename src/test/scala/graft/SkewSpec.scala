package graft

import org.apache.spark.sql.functions._

import graft.engine.{Skew, Tables}

/** Salted two-phase aggregation must equal the direct aggregation
  * bit-for-bit (exact-decimal partials are associative). */
class SkewSpec extends SparkTestBase {

  test("saltedSumCount == direct groupBy sum/count on a skewed key") {
    val ev = Tables.t(spark, sf, "events")
    val salted = Skew.saltedSumCount(ev, "event_type", "value")
      .orderBy("event_type").collect()
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(Tables.dec2(col("value"))).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) == d.getString(0))
      assert(s.getDouble(1) == d.getDouble(1), s"sum mismatch for ${s.getString(0)}")
      assert(s.getLong(2) == d.getLong(2))
    }
  }

  test("salted plan splits the wide shuffle across (key, salt)") {
    val df = Skew.saltedSumCount(Tables.t(spark, sf, "events"),
      "event_type", "value", buckets = 8)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p)
    assert(p.split("Exchange").length >= 3, "expected two shuffle stages\n" + p)
  }

  test("MapType columns are tolerated and the salt mixes partition id (r6 ADVICE)") {
    import spark.implicits._
    // the old whole-row hash salt raised AnalysisException on any
    // table carrying a MapType column
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
      .withColumn("m", map(lit("x"), col("v")))
    assert(df.schema("m").dataType
      .isInstanceOf[org.apache.spark.sql.types.MapType])
    val out = Skew.saltedSumCount(df, "k", "v").orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("a", 3.0, 2L), ("b", 3.0, 1L)))
    // the salt must include spark_partition_id so hot keys whose rows
    // are IDENTICAL (dup-heavy event data) still spread across buckets
    // (analyzed plan: the physical string truncates wide projections
    // and the optimizer folds a local Seq input into a LocalRelation,
    // evaluating the salt away entirely)
    val p = Skew.saltedSumCount(df, "k", "v")
      .queryExecution.analyzed.toString.toLowerCase
    assert(p.contains("spark_partition_id"), p)
  }

  test("nondeterministic input falls back to the content-hash salt (r6 ADVICE)") {
    import spark.implicits._
    val base = Tables.t(spark, sf, "events")
    assert(Skew.deterministicPlan(base))
    val sampled = base.sample(withReplacement = false, 0.5, seed = 42)
    assert(!Skew.deterministicPlan(sampled),
      "Sample must be detected as nondeterministic input")
    val ndExpr = Seq(("a", 1.0)).toDF("k", "v").withColumn("r", rand(7))
    assert(!Skew.deterministicPlan(ndExpr))
    // the fallback salt must not mention partition id — its mapping is
    // unstable across fetch-failure recomputes for these inputs
    val p = Skew.saltedSumCount(sampled, "event_type", "value")
      .queryExecution.analyzed.toString.toLowerCase
    assert(!p.contains("spark_partition_id"), p)
    // and the verdict is still exact
    val got = Skew.saltedSumCount(sampled.cache(), "event_type", "value")
      .orderBy("event_type").collect()
    val want = sampled.groupBy(col("event_type"))
      .agg(sum(Tables.dec2(col("value"))).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    sampled.unpersist()
  }

  test("q_join_skew: AQE splits the hot join partition; values unchanged (VERDICT r10 #3)") {
    // the join half of the skew pair (q_skew_salted is the agg half):
    // 70% of lineitem collapses onto one order key, and the merge hint
    // keeps the join a shuffle SMJ (fact-scale orders is past any
    // broadcast budget). AQE's skew thresholds are sized for real
    // clusters (256 MB), so the spec lowers them to fixture scale —
    // the assertion is that the runtime re-plan actually fires
    // (skew=true on the join node) and that the split is value-free.
    val deflt = q("q_join_skew").collect()
    assert(deflt.nonEmpty)
    // a skewed reduce partition can only split at MAP-OUTPUT
    // granularity, and the sf0.001 fixture is one parquet row group =
    // one productive mapper — re-lay lineitem as 8 files (row set
    // unchanged) so the hot partition has chunks to split into, the
    // layout any real multi-executor writer produces
    val dir = java.nio.file.Files.createTempDirectory("graft-skewjoin")
      .toString
    Tables.t(spark, sf, "lineitem").repartition(8)
      .write.parquet(s"$dir/lineitem.parquet")
    Tables.t(spark, sf, "orders").write.parquet(s"$dir/orders.parquet")
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      // one map task per file: keep the 8 chunks distinct
      "spark.sql.files.maxPartitionBytes" -> "16KB",
      "spark.sql.files.openCostInBytes" -> "0")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = SparkEntry.queries("q_join_skew")(spark, dir)
      val got = df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)   // hint held: no broadcast
      assert(p.contains("skew=true"), p)       // the hot partition split
      assert(got.sameElements(deflt),
        s"skew split changed values: ${got.length} vs ${deflt.length}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("duplicate-heavy input aggregates exactly (the case the salt exists for)") {
    import spark.implicits._
    val dup = Seq.fill(5000)(("hot", 2.5)).toDF("k", "v")
      .union(Seq.fill(10)(("cold", 1.0)).toDF("k", "v"))
      .repartition(8)
    val got = Skew.saltedSumCount(dup, "k", "v", buckets = 8)
      .orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("cold", 10.0, 10L), ("hot", 12500.0, 5000L)))
  }
}
