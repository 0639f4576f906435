package graft

/** Structural ground truths for the temporal analytics pack. */
class TemporalSpec extends SparkTestBase {

  test("q_event_funnel steps shrink monotonically") {
    val rows = q("q_event_funnel").collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(2))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    assert(counts(0) > 0)
  }

  test("q_cohort_retention: offset-0 row is the cohort's peak") {
    val rows = q("q_cohort_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) >= 0))
    rows.groupBy(_.getDate(0)).foreach { case (cohort, rs) =>
      val day0 = rs.find(_.getInt(1) == 0)
      assert(day0.isDefined, s"cohort $cohort missing offset 0")
      assert(rs.map(_.getLong(2)).max == day0.get.getLong(2),
        s"cohort $cohort retains more users than it started with")
    }
  }

  test("q_scd2_intervals: contiguous, non-overlapping, one current row per user") {
    val rows = q("q_scd2_intervals").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      // sort by (valid_from, event_id): ts ties are possible in general
      val ordered = rs.sortBy(r =>
        (r.getAs[java.time.LocalDateTime](3).toString, r.getLong(2)))
      assert(ordered.count(_.getInt(5) == 1) == 1,
        s"user $user: not exactly one current interval")
      assert(ordered.last.getInt(5) == 1 && ordered.last.isNullAt(4))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.time.LocalDateTime](4) ==
            b.getAs[java.time.LocalDateTime](3),
            s"user $user: gap between intervals")
          assert(a.getString(1) != b.getString(1),
            s"user $user: adjacent intervals share event_type (not collapsed)")
        case _ =>
      }
    }
  }
}
