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
}
