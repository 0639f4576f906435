package graft

/** Smoke per operator: every SparkEntry query runs on sf0.001 and
  * returns a sane row count; keys/oracle wiring is consistent.
  * (Value-level correctness is the DuckDB oracle gate — tools/check.py
  * / the driver's t2; these specs guard execution + contract shape.) */
class QueriesSpec extends SparkTestBase {

  // queries that legitimately return 0 rows at sf0.001 (tiny data)
  private val mayBeEmpty = Set("q_join_anti", "q_except", "q_dedup_simhash",
    "q_dedup_minhash", "q_dedup_cluster")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("non-oracled queries are the expected sketch/stub set") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == Set("q_agg_approx_distinct", "q_dedup_minhash",
      "q_dedup_simhash", "q_similarity_ann", "q_multimodal_decode",
      "q_dedup_cluster"))
  }

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name runs on sf0.001") {
      val df = q(name)
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
