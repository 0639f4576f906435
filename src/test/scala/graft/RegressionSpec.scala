package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Layout
import graft.plans.AsOf

/** Regression tests for the round-1 review findings (ADVICE.md):
  * conjunctive isin pushdown, as-of tie/null semantics, top_k_by
  * extreme-ordinal sort, compact swap hygiene. */
class RegressionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("ProductsSource: conjunctive isin filters intersect, not union") {
    val dir = tmpDir("pjson")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/products.json"),
      """{"A": {"name": "a"}, "B": {"name": "b"}, "C": {"name": "c"}}""")
    val df = spark.read.format("graft.sources.ProductsSource")
      .load(s"$dir/products.json")
    // isin = 'A' AND isin IN ('A','B')  ->  {A}
    assert(df.filter(col("isin") === "A" && col("isin").isin("A", "B"))
      .collect().map(_.getString(0)).toSeq == Seq("A"))
    // isin = 'A' AND isin IN ('B','C')  ->  empty (contradiction), the
    // pre-fix union would have leaked all of {A,B,C}
    assert(df.filter(col("isin") === "A" && col("isin").isin("B", "C"))
      .count() == 0)
    // two IN conjuncts intersect
    assert(df.filter(col("isin").isin("A", "B") && col("isin").isin("B", "C"))
      .collect().map(_.getString(0)).toSeq == Seq("B"))
  }

  test("native as-of join: deterministic tiebreak among equal (key, time)") {
    val left = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 100L), (1L, 5L, 200L), (1L, 5L, 150L))
      .toDF("rk", "rt", "rv")
    val out = AsOf.join(left, right, "k", "rk", "t", "rt",
      rightTieBreak = "rv")
      .select(col("k"), col("rv")).orderBy("k").collect()
    // largest tiebreak wins among the time-tied rows; key 2 unmatched
    assert(out(0) == Row(1L, 200L), out.mkString(","))
    assert(out(1) == Row(2L, null), out.mkString(","))
  }

  test("native as-of join: null keys/times never match and never crash") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("t", LongType, nullable = true),
      StructField("lid", LongType, nullable = false)))
    val left = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L, 1L), Row(null, 10L, 2L), Row(1L, null, 3L))), schema)
    val rschema = StructType(Seq(
      StructField("rk", LongType, nullable = true),
      StructField("rt", LongType, nullable = true),
      StructField("rv", LongType, nullable = false)))
    val right = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 5L, 100L), Row(null, 5L, 888L), Row(1L, null, 999L))), rschema)
    val got = AsOf.join(left, right, "k", "rk", "t", "rt",
      rightTieBreak = "rv")
      .select(col("lid"), col("rv")).orderBy("lid").collect()
    // only the fully-non-null left row matches, and only the fully-
    // non-null right row is eligible (SQL: NULL matches nothing)
    assert(got(0) == Row(1L, 100L), got.mkString(","))
    assert(got(1) == Row(2L, null), got.mkString(","))
    assert(got(2) == Row(3L, null), got.mkString(","))
  }

  test("approx percentile tracks the exact discrete percentile per group") {
    import org.apache.spark.sql.functions._
    val approx = q("q_agg_approx_percentile").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = q("q_agg_percentile").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (grp, (ap50, ap90)) =>
      val (p50, p90) = exact(grp)
      // accuracy 10000 → rank error ≤ n/10000; prices are dense, so a
      // loose 5% relative tolerance is far above the guarantee
      assert(math.abs(ap50 - p50) <= 0.05 * p50, s"$grp p50: $ap50 vs $p50")
      assert(math.abs(ap90 - p90) <= 0.05 * p90, s"$grp p90: $ap90 vs $p90")
    }
  }

  test("top_k_by ranks Long.MinValue ordinals smallest (no negation overflow)") {
    graft.functions.GraftFunctions.register(spark)
    val got = Seq((1L, Long.MinValue), (2L, 5L), (3L, 0L), (4L, Long.MaxValue))
      .toDF("arg", "ord")
      .agg(call_function("top_k_by", col("arg"), col("ord"), lit(3)).as("top"))
      .as[Seq[Long]].collect()(0)
    // desc by ord: MaxValue, 5, 0 — MinValue must NOT surface
    assert(got == Seq(4L, 2L, 3L), got.mkString(","))
  }

  test("Layout.compact leaves no .old/.compacting residue next to dir") {
    val parent = tmpDir("compact2")
    val dir = s"$parent/t"
    spark.range(100).repartition(8).write.parquet(dir)
    Layout.compact(spark, dir, targetMB = 128)
    assert(spark.read.parquet(dir).count() == 100)
    val siblings = new java.io.File(parent).list().toSeq
    assert(siblings == Seq("t"), siblings.mkString(","))
  }
}
