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

  test("q_sessionize: sessions partition events and split exactly at >30min gaps") {
    val rows = q("q_sessionize").collect()
    assert(rows.nonEmpty)
    val totalEvents = rows.map(_.getLong(4)).sum
    val ev = graft.engine.Tables.t(spark, sf, "events")
    val nEvents = ev.count()
    assert(totalEvents == nEvents, s"sessions cover $totalEvents of $nEvents events")
    // independent recomputation per user from raw events (µs epoch;
    // session tz is UTC so the ntz cast is value-preserving)
    val byUser = ev
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      val expected = byUser(user).sortBy(e => (e._2, e._3))
        .foldLeft(List.empty[Long]) { (acc, e) =>
          acc match {
            case prev :: _ if e._2 - prev <= 30L * 60 * 1000000 => e._2 :: acc.tail
            case _ => e._2 :: acc // new session (gap > 30 min or first)
          }
        }.length
      assert(rs.length == expected, s"user $user: ${rs.length} sessions, expected $expected")
      // session indices are 1..n and starts are increasing
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).sameElements(1L to expected))
    }
  }

  test("q_join_interval_overlap: bucket equi-join rewrite matches the literal theta-join") {
    val rows = q("q_join_interval_overlap").collect()
    assert(rows.nonEmpty, "vacuous: no incident hours at this SF")
    // recompute with the literal overlap predicate driver-side
    val sess = q("q_sessionize").collect().map { r =>
      def hourMs(i: Int) = {
        val t = r.getAs[java.time.LocalDateTime](i)
        t.withMinute(0).withSecond(0).withNano(0)
      }
      (hourMs(2), hourMs(3))
    }
    rows.foreach { r =>
      val h = r.getAs[java.time.LocalDateTime](0)
      val expected = sess.count { case (s0, s1) =>
        !h.isBefore(s0) && !h.isAfter(s1)
      }
      assert(r.getLong(2) == expected,
        s"hour $h: ${r.getLong(2)} sessions vs literal $expected")
    }
  }
}
