package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, MinHashSig}

/** minhash_sig: single-pass array-buffer signature aggregate. Kept as a
  * library function; the query path uses 32 codegen'd min-aggs, which
  * measured FASTER at sf0.1 (object aggregates forfeit whole-stage
  * codegen and fall back to sort-based aggregation past 128 groups) —
  * see functions/MinHashSig.scala for the trade-off notes. */
class MinHashSigSpec extends SparkTestBase {
  import spark.implicits._

  test("lanes equal the elementwise min of the mixed hashes") {
    GraftFunctions.register(spark)
    val bases = Seq((1L, 101L), (1L, 202L), (1L, 303L), (2L, 404L))
    val got = bases.toDF("g", "base")
      .groupBy("g")
      .agg(call_function("minhash_sig", col("base"), lit(8)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def expected(vs: Seq[Long]): Seq[Long] =
      (0 until 8).map(i => vs.map(v => MinHashSig.fmix64(v ^ MinHashSig.seed(i))).min)
    assert(got(1L) == expected(Seq(101L, 202L, 303L)))
    assert(got(2L) == expected(Seq(404L)))
  }

  test("signature is partition-invariant (merge path)") {
    GraftFunctions.register(spark)
    val df = graft.engine.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), xxhash64(col("text")).as("base"))
    def sig(parts: Int) = df.repartition(parts)
      .groupBy(lit(1).as("g"))
      .agg(call_function("minhash_sig", col("base"), lit(16)).as("sig"))
      .collect()(0).getSeq[Long](1)
    assert(sig(1) == sig(13))
  }
}
