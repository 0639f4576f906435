package graft

import org.apache.spark.sql.functions._

/** Sanity checks for the oracle-adjacent audit pack (Audits.scala).
  * The real witnesses are the driver-side DuckDB oracles — every
  * audit query carries one — so these specs only pin the structural
  * claims the oracles rely on: non-vacuousness (an audit over an
  * empty exact set proves nothing) and the containment direction.
  */
class AuditsSpec extends SparkTestBase {

  test("bloom-gated decontamination equals the exact result (no false negatives)") {
    val exact = q("q_decontaminate").collect()
    val gated = q("q_audit_bloom_fn").collect()
    assert(exact.nonEmpty, "vacuous: exact contamination set is empty")
    assert(gated.map(_.toSeq).toSet == exact.map(_.toSeq).toSet)
  }

  test("minhash recall audit is non-vacuous and a subset of minhash output") {
    val exactFound = q("q_audit_minhash_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exactFound.nonEmpty, "vacuous: no exact shingle-jaccard >= 0.9 pairs")
    val mh = q("q_dedup_minhash")
      .select(col("da"), col("db")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactFound.forall(mh.contains), "audit emitted a pair minhash never found")
  }

  test("simhash LSH misses zero exact-slice pairs (pigeonhole)") {
    val missed = q("q_audit_simhash_lsh").collect()
    assert(missed.length == 1 && missed.head.getLong(0) == 0L)
    // the exact slice itself must be non-empty for the zero to mean anything
    assert(q("q_dedup_simhash").limit(1).collect().nonEmpty,
      "vacuous: exact simhash slice has no near pairs")
  }

  test("phash recall audit counts every planted pair") {
    val planted = q("q_image_dedup_phash").sparkSession
      .read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id div 3 AS g")
      .groupBy(col("g")).count()
      .agg(sum(expr("count * (count - 1) div 2"))).collect().head.getLong(0)
    val phash = q("q_audit_phash_recall").collect().head.getLong(0)
    assert(phash == planted, s"phash recall $phash of $planted planted pairs")
  }

  test("embedding recall audit: LSH misses nothing the exact cosine gate accepts") {
    // the audit's exact side recomputes planted-pair cosines from the
    // decoded embeddings in-plan (not from a fixture assumption — at
    // sf1 two planted groups legitimately fall below the 0.9 gate);
    // with hamming-1 multiprobe banding the miss count is pinned zero.
    // exact_nonempty rules out the vacuous form of that pin (a dead
    // embedding pipeline accepts no pairs and misses none of them).
    val row = q("q_audit_embed_recall").collect().head
    assert(row.getBoolean(1), "exact side empty — recall claim vacuous")
    val embed = row.getLong(0)
    assert(embed == 0L, s"LSH missed $embed exact-gate planted pairs")
  }

  test("approx sketch audits: every tolerance flag true, non-vacuous groups") {
    val d = q("q_audit_approx_distinct").collect()
    assert(d.length == 3)
    d.foreach(r => { assert(r.getLong(1) > 0); assert(r.getBoolean(2), s"$r") })
    val p = q("q_audit_approx_percentile").collect()
    assert(p.length == 3)
    p.foreach { r =>
      assert(r.getDouble(1) > 0 && r.getDouble(2) >= r.getDouble(1))
      assert(r.getBoolean(3) && r.getBoolean(4), s"$r")
    }
  }

  test("cms heavy hitters: 20 rows, estimates never undercount, and the " +
      "estimate is within the CMS error bound on this corpus") {
    val rows = q("q_audit_cms_hh").collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getBoolean(2), s"CMS undercounted ${r.getString(0)}"))
    // tighten beyond the shipped boolean: re-probe the sketch and check
    // est <= exact + eps*N (eps = 0.001) for every heavy hitter
    graft.functions.GraftFunctions.register(spark)
    val toks = graft.engine.Tables.t(spark, sf, "documents")
      .selectExpr("explode(split(text, ' ')) AS tok").where("tok <> ''")
    val n = toks.count()
    val probed = toks
      .agg(org.apache.spark.sql.functions.expr(
        "count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"))
      .crossJoin(toks.groupBy("tok").count()
        .orderBy(org.apache.spark.sql.functions.desc("count"),
          org.apache.spark.sql.functions.col("tok")).limit(20))
      .selectExpr("tok", "count AS c", "cms_estimate(sk, tok) AS est")
      .collect()
    probed.foreach { r =>
      val (c, est) = (r.getLong(1), r.getLong(2))
      assert(est >= c && est <= c + (0.001 * n).toLong + 1,
        s"estimate $est outside [$c, c+εN] for ${r.getString(0)}")
    }
  }

  test("cms_estimate rejects wrong input types at analysis time (r6 ADVICE)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "x")).toDF("n", "s")
    // string sketch: used to pass analysis and die with
    // ClassCastException at execution
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(org.apache.spark.sql.functions.expr("cms_estimate(s, s)"))
        .collect()
    }
    // numeric item: would silently probe a different representation
    // than CountMinSketchAgg counted
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(org.apache.spark.sql.functions.expr(
        "cms_estimate(cast(null as binary), n)")).collect()
    }
  }
}
