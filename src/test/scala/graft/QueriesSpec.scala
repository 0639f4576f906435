package graft

/** Smoke per operator: every SparkEntry query runs on sf0.001 and
  * returns a sane row count; keys/oracle wiring is consistent.
  * (Value-level correctness is the DuckDB oracle gate — tools/check.py
  * / the driver's t2; these specs guard execution + contract shape.) */
class QueriesSpec extends SparkTestBase {

  // queries that legitimately return 0 rows at sf0.001 (tiny data)
  private val mayBeEmpty = Set("q_join_anti", "q_except", "q_dedup_simhash",
    "q_dedup_minhash", "q_dedup_cluster", "q_graph_pagerank",
    // recursion over the minhash edge set — empty when minhash is
    "q_recursive_reach")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("non-oracled queries are the expected sketch/stub set") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // round 10: q_similarity_ann / q_similarity_batch_ann left this set
    // (sign-LSH planes interpolated into the DuckDB mirror — see
    // Pipeline.annBucketCtes). The 10 remaining are engine-internal
    // sketches (HLL/KLL/bloom) and real codecs — each with an oracled
    // audit twin or exact-replay spec; every round-11 addition is
    // fully oracled.
    assert(unoracled == Set("q_agg_approx_distinct", "q_agg_approx_percentile",
      "q_multimodal_decode",
      "q_decontaminate_bloom",
      "q_image_features", "q_image_dedup_phash", "q_audio_features",
      "q_embed_real", "q_frame_sample", "q_image_resize"))
  }

  test("determinism contract: every oracle imposes a total ORDER BY") {
    val missing = SparkEntry.oracleSql.filterNot(_._2.toUpperCase
      .contains("ORDER BY")).keys
    assert(missing.isEmpty, s"oracles without ORDER BY: $missing")
  }

  test("oracles reference only driver-known tables") {
    val known = graft.engine.Tables.names.toSet
    // \b + lookahead: `FROM range(63)` is a TABLE FUNCTION, not a table
    // (the \b stops backtracking from matching a shorter prefix)
    val tablePattern = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)\\b(?!\\s*\\()".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val cites = tablePattern.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .toSet -- Set("r", "null") // CTE self-ref; "FROM NULL" in IS NOT DISTINCT FROM NULL
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = cites -- known -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("the session serves concurrent queries (thread safety)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val names = Seq("q_agg_group", "q_join_inner", "q_text_analysis",
      "q_window_rank")
    val seqCounts = names.map(n => n -> q(n).count()).toMap
    val parCounts = Await.result(
      Future.sequence(names.map(n => Future(n -> q(n).count()))), 120.seconds)
      .toMap
    assert(parCounts == seqCounts, s"par=$parCounts seq=$seqCounts")
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
