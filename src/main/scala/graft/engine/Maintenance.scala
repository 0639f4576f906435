package graft.engine

/** Re-freeze policy for the standing frozen-stats indexes (VERDICT
  * r15 #5 — the drift gauges wired to a maintenance DECISION). The
  * gauges (Retrieval.lshDriftGauge, Pipeline.embDriftGauge) measure;
  * these pure predicates decide; the family-specific maybeRefreeze*
  * wrappers fire the rebuild. Pure functions so the trip points are
  * spec-testable without building an index.
  *
  * Thresholds are operational config, not constants of nature — the
  * defaults encode the repo's own scaling notes:
  *  - embeddings (SCALING §6c): the frozen plane width ab is sized for
  *    24·2^ab vectors at build; past ~4× that design capacity the
  *    per-bucket candidate volume has grown ~4× and the rebuild
  *    re-derives ab. occ-skew is the second alarm: a single bucket
  *    running away (≫ the average) multiplies candidate volume even
  *    at low total growth.
  *  - text (§6d / q_dedup_text_index_drift): OOV tokens silently drop
  *    out of the frozen featurization — at 20% of batch occurrences
  *    the signatures describe four fifths of the text; a df-share L1
  *    shift of 0.5 means half the distribution mass moved.
  */
object Maintenance {

  /** Trip when the corpus has outgrown the frozen design capacity
    * (`growth` = n_vec / 24·2^ab) or one signature bucket is running
    * away from the mean occupancy. */
  def embNeedsRefreeze(growth: Double, occAvg: Double, occMax: Long,
      growthMax: Double = 4.0, occSkewMax: Double = 64.0): Boolean =
    growth >= growthMax || (occAvg > 0 && occMax >= occSkewMax * occAvg)

  /** Trip when the probe batch's OOV occurrence rate or its df-share
    * L1 distance from the frozen corpus passes the alarm level. */
  def textNeedsRefreeze(oovRate: Double, dfShift: Double,
      oovMax: Double = 0.2, shiftMax: Double = 0.5): Boolean =
    oovRate >= oovMax || dfShift >= shiftMax

  /** Trip when the IVF membership has outgrown the fit-time corpus
    * (`growth` = n_vec / fit_n) or one cell runs hot (occ_max ≫ the
    * mean — probe candidate volume is per-cell, so a hot cell costs
    * every query that probes it). The skew bar sits lower than the
    * embedding family's (8× vs 64×): k is small (16 cells), so a
    * single runaway cell is a large fraction of the corpus. */
  def ivfNeedsRecluster(growth: Double, occAvg: Double, occMax: Long,
      growthMax: Double = 4.0, occSkewMax: Double = 8.0): Boolean =
    growth >= growthMax || (occAvg > 0 && occMax >= occSkewMax * occAvg)
}
