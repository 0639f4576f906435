package graft

import org.apache.spark.sql.functions._

import graft.engine.StandingIndex

/** Every standing-index family driven through the ONE lifecycle seam
  * (VERDICT r16 #7): build → absorb → probe → purge → compact(fold) →
  * policy, with the cross-family invariants asserted family-
  * AGNOSTICALLY — the test body never names a family-specific
  * function, which is the point of the seam: the fifth family gets
  * this whole battery by registering one instance. */
class StandingIndexSpec extends SparkTestBase {

  private def lifecycle[T](fam: StandingIndex[T]): Unit = {
    val idc = col(fam.idCol)
    val srcTable = if (fam.idCol == "doc_id") "documents" else "embeddings"
    val t = fam.build(spark, sf, s"_seam_${fam.family}",
      _.filter(idc % 10 =!= 0))
    val m0 = fam.members(spark, sf, t).localCheckpoint()
    assert(m0.count() > 0, s"${fam.family}: built an empty index")
    // absorb one day: membership grows by covered day rows ONLY —
    // nothing lost, nothing from outside the day
    fam.absorb(spark, sf, t, idc % 40 === 0)
    val m1 = fam.members(spark, sf, t).localCheckpoint()
    assert(m0.exceptAll(m1).isEmpty,
      s"${fam.family}: absorb dropped standing members")
    val delta = m1.exceptAll(m0)
    val dayIds = graft.engine.Tables.t(spark, sf, srcTable)
      .filter(idc % 40 === 0).select(idc)
    assert(delta.count() > 0,
      s"${fam.family}: absorb grew nothing — vacuous day")
    assert(delta.join(dayIds, Seq(fam.idCol), "left_semi").count() ==
      delta.count(), s"${fam.family}: absorb invented members")
    val batch = idc % 40 === 30
    // purge: tombstoned ids vanish from the membership at once
    val ids = graft.engine.Tables.t(spark, sf, srcTable)
      .filter(idc % 10 =!= 0 && idc % 30 === 3).select(idc)
    assert(ids.count() > 0, s"${fam.family}: no purgeable rows at this sf")
    fam.purge(spark, sf, t, ids)
    val mP = fam.members(spark, sf, t).localCheckpoint()
    assert(mP.join(ids, Seq(fam.idCol), "left_semi").count() == 0,
      s"${fam.family}: purged ids survive in the membership")
    val p1 = fam.probe(spark, sf, t, batch).collect().map(_.toString).toSeq
    // the fold is invisible to probes and membership
    fam.compact(spark, sf, t)
    assert(fam.probe(spark, sf, t, batch).collect().map(_.toString).toSeq
      == p1, s"${fam.family}: the fold moved a verdict")
    val mF = fam.members(spark, sf, t)
    assert(mP.exceptAll(mF).isEmpty && mF.exceptAll(mP).isEmpty,
      s"${fam.family}: the fold changed the membership")
    // the DEFAULT policy consults without error; a fired repair must
    // keep the purge-aware membership (no resurrection through the
    // seam — SoakBench trips the defaults on honestly-aged fixtures)
    fam.maybeMaintain(spark, sf, t, batch, s"_seamm_${fam.family}")
      .foreach { nt =>
        assert(fam.members(spark, sf, nt)
          .join(ids, Seq(fam.idCol), "left_semi").count() == 0,
          s"${fam.family}: the policy's repair resurrected purged ids")
      }
    ()
  }

  graft.operators.StandingIndexes.families.foreach { f =>
    test(s"seam lifecycle (build/absorb/probe/purge/fold/policy): ${f.family}") {
      lifecycle(f)
    }
  }
}
