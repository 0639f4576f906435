package graft

import org.apache.spark.sql.functions._

import graft.engine.Maintenance

/** The drift gauges wired to the re-freeze DECISION (VERDICT r15 #5):
  * pure policy trip points, plus the end-to-end wiring — gauge read →
  * policy → rebuild — for both frozen-stats families, pinned against
  * from-scratch builds over the same membership. Thresholds in the
  * end-to-end tests are forced (a fixture-scale corpus cannot honestly
  * outgrow the 24·2^8 floor capacity); SoakBench demonstrates the trip
  * at the DEFAULT thresholds on a scaled fixture. */
class MaintenanceSpec extends SparkTestBase {

  test("policy trip points: emb growth/occ-skew, text oov/df-shift") {
    // emb: growth alone
    assert(Maintenance.embNeedsRefreeze(4.0, 1.0, 1L))
    assert(!Maintenance.embNeedsRefreeze(3.99, 1.0, 1L))
    // emb: a runaway bucket trips at low growth
    assert(Maintenance.embNeedsRefreeze(0.1, 2.0, 128L))
    assert(!Maintenance.embNeedsRefreeze(0.1, 2.0, 127L))
    // emb: empty index (occAvg 0) never trips on skew
    assert(!Maintenance.embNeedsRefreeze(0.0, 0.0, 0L))
    // text: either gauge independently
    assert(Maintenance.textNeedsRefreeze(0.2, 0.0))
    assert(Maintenance.textNeedsRefreeze(0.0, 0.5))
    assert(!Maintenance.textNeedsRefreeze(0.19, 0.49))
    // custom thresholds pass through
    assert(Maintenance.embNeedsRefreeze(0.5, 1.0, 1L, growthMax = 0.5))
    assert(Maintenance.textNeedsRefreeze(0.01, 0.0, oovMax = 0.01))
  }

  test("text wiring: a tripped gauge fires refreezeLsh; probe ≡ from-scratch build over the same membership; healthy gauge fires nothing") {
    val bk = graft.engine.Layout.bucketsFor(s"$sf/documents.parquet")
    val t = operators.Retrieval.buildLshIndex(spark, sf, "_mnt",
      _.filter(col("doc_id") % 10 =!= 0))
    operators.Retrieval.absorbLshBatch(spark, sf, t, bk,
      _.filter(col("doc_id") % 20 === 0))
    val batch = col("doc_id") % 20 === 10
    // healthy thresholds: no rebuild
    assert(operators.Retrieval.maybeRefreezeText(spark, sf, t, batch,
      "_mntN", oovMax = 1.1, shiftMax = 2.1).isEmpty,
      "policy fired on an un-trippable threshold")
    // forced trip: the rebuild fires and lands NEW tables
    val refr = operators.Retrieval.maybeRefreezeText(spark, sf, t, batch,
      "_mntR", oovMax = 0.0)
    assert(refr.nonEmpty, "tripped policy did not fire the re-freeze")
    assert(refr.get._1 != t._1 && spark.catalog.tableExists(refr.get._1),
      "re-freeze did not land a new index instance")
    // probe ≡ a from-scratch build over the membership predicates
    val fresh = operators.Retrieval.buildLshIndex(spark, sf, "_mntF",
      _.filter(col("doc_id") % 10 =!= 0 || col("doc_id") % 20 === 0))
    def probe(tt: (String, String, String, String)) =
      operators.Retrieval.lshIndexProbe(spark, sf, tt, batch)
        .collect().map(_.toString).toSeq
    assert(probe(refr.get) == probe(fresh),
      "policy-fired re-freeze diverged from the from-scratch build")
  }

  test("emb wiring: a tripped gauge fires refreezeEmb; probe ≡ from-scratch build over the same membership; healthy gauge fires nothing") {
    val bk = graft.engine.Layout.bucketsFor(s"$sf/embeddings.parquet")
    val t = operators.Pipeline.buildEmbIndex(spark, sf, "_mnt",
      col("vec_id") % 10 =!= 0)
    operators.Pipeline.absorbEmbBatch(spark, sf, t, bk,
      col("vec_id") % 20 === 0)
    // healthy thresholds: no rebuild
    assert(operators.Pipeline.maybeRefreezeEmb(spark, sf, t, "_mntN",
      growthMax = 1e9, occSkewMax = 1e9).isEmpty,
      "policy fired on an un-trippable threshold")
    // forced trip: rebuild fires; membership comes from the vec table
    val refr = operators.Pipeline.maybeRefreezeEmb(spark, sf, t, "_mntR",
      growthMax = 0.0)
    assert(refr.nonEmpty, "tripped policy did not fire the re-freeze")
    val fresh = operators.Pipeline.buildEmbIndex(spark, sf, "_mntF",
      col("vec_id") % 10 =!= 0 || col("vec_id") % 20 === 0)
    def probe(tt: (String, String, String)) =
      operators.Pipeline.embIndexProbeOn(spark, tt,
        graft.engine.Tables.t(spark, sf, "embeddings")
          .filter(col("vec_id") % 20 === 10),
        s"$sf/embeddings.parquet").collect().map(_.toString).toSeq
    assert(probe(refr.get) == probe(fresh),
      "policy-fired re-freeze diverged from the from-scratch build")
    // membership round trip: refrozen vec table = old vec table's ids
    val oldIds = spark.table(t._2).select(col("corpus_id"))
    val newIds = spark.table(refr.get._2).select(col("corpus_id"))
    assert(oldIds.exceptAll(newIds).isEmpty && newIds.exceptAll(oldIds).isEmpty)
  }

  test("emb re-freeze after a purge covers survivors only (no resurrection)") {
    val bk = graft.engine.Layout.bucketsFor(s"$sf/embeddings.parquet")
    val t = operators.Pipeline.buildEmbIndex(spark, sf, "_mntP",
      col("vec_id") % 10 =!= 0)
    val purgeIds = graft.engine.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 30 === 7)
      .select(col("vec_id"))
    assert(purgeIds.count() > 0, "no purgeable vectors at this sf")
    operators.Pipeline.purgeEmbIndex(spark, t, purgeIds)
    val refr = operators.Pipeline.refreezeEmb(spark, sf, "_mntPR", t)
    assert(spark.table(refr._2).filter(col("corpus_id") % 30 === 7
      && col("corpus_id") % 10 =!= 0).count() == 0,
      "re-freeze resurrected purged vectors")
    val fresh = operators.Pipeline.buildEmbIndex(spark, sf, "_mntPF",
      col("vec_id") % 10 =!= 0 && col("vec_id") % 30 =!= 7)
    def probe(tt: (String, String, String)) =
      operators.Pipeline.embIndexProbeOn(spark, tt,
        graft.engine.Tables.t(spark, sf, "embeddings")
          .filter(col("vec_id") % 10 === 0),
        s"$sf/embeddings.parquet").collect().map(_.toString).toSeq
    assert(probe(refr) == probe(fresh),
      "post-purge re-freeze diverged from a from-scratch survivor build")
  }
}
