package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** ONE lifecycle seam over the standing-index families (VERDICT r16
  * #7): gram (exact 3-gram dedup), text-LSH, embedding-LSH, and IVF
  * each land a write-once bucketed layout, probe it with daily
  * batches, absorb, tombstone-purge, compact-with-fold, and consult a
  * drift gauge wired to a repair. The four families hand-rolled the
  * same pattern; the seam names it ONCE, so harnesses (the lifecycle
  * spec, a future fifth family) drive every family through the same
  * calls and a cross-family contract fix lands against one interface
  * instead of four spot edits. Instances (operators.StandingIndexes)
  * are pure delegation to the per-family implementations the batch
  * queries and streaming loops already run — registering through the
  * seam changes NO behavior (the r16 done-criterion: CORRECTNESS
  * green, PLANS.md diff empty).
  *
  * `T` is the family's landed-table tuple; `d` is the fixture dir the
  * corpus derives from (also the probeSide gate's byte bound). Probes
  * and absorbs take the batch as a Column predicate over the family's
  * source table — the batch-query shape; the streaming paths keep
  * their frame-shaped entry points (a micro-batch has no predicate).
  *
  * Lifecycle contracts every instance inherits from its delegates:
  * probes read ONLY through Layout.readPurged; absorb appends with the
  * frozen stats (never refits); purge is a tombstone append, physical
  * removal is `compact`'s fold; `maybeMaintain` is build-new-then-
  * switch — the repaired instance lands completely before the caller
  * flips its reference (the SoakBench / runIvfProbeAbsorbLoop swap
  * posture). */
trait StandingIndex[T] {

  /** Family name (diagnostics / registry lookups). */
  def family: String

  /** Natural id column of the family's source rows (doc_id / vec_id)
    * — the column `purge`'s ids frame must carry. */
  def idCol: String

  /** Land a throwaway instance over the source rows `sel` keeps. */
  def build(s: SparkSession, d: String, suffix: String,
      sel: DataFrame => DataFrame): T

  /** Append one day's batch with the frozen stats / quantizer. */
  def absorb(s: SparkSession, d: String, t: T, day: Column): Unit

  /** Daily batch probe: the index side rides its bucket layout (zero
    * Exchange), batch sides ride the Layout.probeSide gate. */
  def probe(s: SparkSession, d: String, t: T, batch: Column): DataFrame

  /** PURGE-AWARE membership: one `idCol` row per covered source row,
    * read from the family's landed manifest (the same read its
    * re-freeze rebuilds from — a purge is invisible here the moment
    * the tombstone lands, which is why a repair can never resurrect
    * erased rows). */
  def members(s: SparkSession, d: String, t: T): DataFrame

  /** Retention purge: tombstone every table that names the ids
    * (single-column frame named `idCol`). Readers exclude them at
    * once; rows leave the disk at the next `compact`. */
  def purge(s: SparkSession, d: String, t: T, ids: DataFrame): Unit

  /** Fold tombstones + append fan-in on every bucketed table — the
    * family's periodic upkeep (and, for the exact gram family, its
    * ONLY maintenance). */
  def compact(s: SparkSession, d: String, t: T): Unit

  /** Gauge → engine.Maintenance decision → repair at the DEFAULT
    * thresholds: Some(new tables) when the policy fired (the caller
    * swaps its reference — the old instance stays landed under its own
    * suffix), None while the frozen stats are healthy — or when the
    * family has none to age. */
  def maybeMaintain(s: SparkSession, d: String, t: T, batch: Column,
      suffix: String): Option[T]
}
