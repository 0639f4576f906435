package graft

import org.apache.spark.sql.functions._

import graft.engine.{Sample, Tables}

/** Deterministic sampling + cache-reuse (crocus A28 memoization). */
class SampleSpec extends SparkTestBase {

  test("byKey is stable across runs and partition layouts") {
    val o = Tables.t(spark, sf, "orders")
    val s1 = Sample.byKey(o, "o_orderkey", 10)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val s2 = Sample.byKey(o.repartition(17), "o_orderkey", 10)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(s1.nonEmpty && s1.sameElements(s2))
    val frac = s1.length.toDouble / o.count()
    assert(frac > 0.05 && frac < 0.15, s"fraction $frac")
  }

  test("consistentPair keeps sampled joins joinable") {
    val o = Tables.t(spark, sf, "orders")
    val l = Tables.t(spark, sf, "lineitem")
    val (so, sl) = Sample.consistentPair(o, "o_orderkey", l, "l_orderkey", 20)
    val joined = so.join(sl, col("o_orderkey") === col("l_orderkey")).count()
    // every sampled order keeps ALL its lineitems (same hash bucket)
    val expected = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .filter(pmod(xxhash64(col("o_orderkey")), lit(100)) < 20).count()
    assert(joined == expected && joined > 0)
  }

  test("stratified sampling builds a reproducible per-language training mix") {
    val docs = Tables.t(spark, sf, "documents")
    val mix = Sample.stratified(docs, "doc_id", "lang",
      Map("en" -> 80, "de" -> 40), defaultPct = 10)
    val got = mix.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def frac(l: String) = got.getOrElse(l, 0L).toDouble / totals(l)
    assert(frac("en") > 0.6 && frac("en") <= 1.0, s"en ${frac("en")}")
    assert(frac("de") > 0.2 && frac("de") < 0.6, s"de ${frac("de")}")
    totals.keys.filterNot(Set("en", "de")).foreach { l =>
      assert(frac(l) < 0.3, s"$l ${frac(l)}")
    }
    // reproducible: same rows on a different layout
    val again = Sample.stratified(docs.repartition(9), "doc_id", "lang",
      Map("en" -> 80, "de" -> 40), defaultPct = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(
      mix.select("doc_id").collect().map(_.getLong(0)).sorted))
  }

  test("cache() reuses across distinct queries (A28 memoization)") {
    val base = Tables.t(spark, sf, "customer")
      .filter(col("c_acctbal") > 0).cache()
    try {
      base.count() // materialize
      val q1 = base.groupBy("c_mktsegment").count()
      val q2 = base.agg(max("c_acctbal"))
      assert(q1.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
      assert(q2.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
      assert(q1.count() > 0 && q2.count() == 1)
    } finally base.unpersist()
  }
}
