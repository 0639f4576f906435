package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{QueryPack, Tables}

/** Round-4 temporal/behavioral analytics over the event stream: ordered
  * funnel conversion, cohort retention, and SCD2 validity-interval
  * construction (the engine analog of the reference's daily catalog
  * snapshots — crocus base_scraper.py:72-83 lays a date-partitioned
  * snapshot tree; an SCD2 build is how a warehouse turns those
  * snapshots/events into queryable validity ranges).
  *
  * Scale notes:
  *  - funnel: three keyed aggregations, each shuffling only the
  *    users surviving the previous step (monotone shrinking);
  *  - retention: groupBy (cohort_day, offset) — partial aggregation,
  *    key space = days², tiny;
  *  - scd2: lag/lead windows partitioned BY USER — parallel across
  *    users, no global sort; ties broken by event_id so the intervals
  *    are deterministic under shuffle.
  */
object Temporal extends QueryPack {

  private def events(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "events")

  val queries: Map[String, Q] = Map(

    // Ordered funnel view -> click -> purchase: each step counts users
    // whose first step-event strictly follows their first prior-step
    // event.
    "q_event_funnel" -> ((s, d) => {
      val e = events(s, d)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("v_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("c_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      val row = (step: Int, name: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(step).as("step"), lit(name).as("event_type"),
            col("n_users"))
      row(1, "view", v).unionByName(row(2, "click", c))
        .unionByName(row(3, "purchase", p))
        .orderBy(col("step"))
    }),

    // Cohort retention: users bucketed by first-active day, activity
    // counted per day offset.
    "q_cohort_retention" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      e.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // SCD2 interval build: collapse each user's event-type run-lengths
    // into validity ranges [valid_from, valid_to), open-ended current
    // row flagged. Deterministic under ts ties via event_id.
    "q_scd2_intervals" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val wc = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      changes
        .withColumn("valid_to", lead(col("ts"), 1).over(wc))
        // event_id stays in the output (provenance: the event that
        // opened the interval) AND in the final sort: two change rows
        // can share (user_id, ts) when events carry timestamp ties, and
        // without the unique id the output order — hence the oracle
        // hash — would be nondeterministic.
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").as("valid_from"), col("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // Gap-based sessionization as an explicit window computation (the
    // relational twin of q_stream_session's session_window): a new
    // session opens when the gap since the previous event exceeds 30
    // minutes; the session index is a running sum of the break flags.
    // Unlike session_window this form keeps per-event lineage (an
    // event's session_idx is addressable), which is what training-data
    // pipelines need to join session features back onto events.
    // Timestamp arithmetic stays in timestamp space (ts > prev + 30min)
    // on both engines — no epoch truncation to diverge on sub-second
    // timestamps. Scale: both windows partition BY USER — parallel
    // across users, no global sort; state per key is one row.
    "q_sessionize" -> ((s, d) =>
      sessions(s, d).orderBy(col("user_id"), col("session_idx"))),

    // Two-sided interval-overlap join, bucketized: sessions (arbitrary
    // [start,end] intervals) × incident hours (hours whose error count
    // exceeds 1.5× the hourly mean). The scale rewrite: each interval
    // EXPLODES into the hour buckets it covers, and candidates meet in
    // a bucket EQUI-join — never the O(n·m) theta-join the overlap
    // predicate literally states. The oracle runs that literal
    // predicate (BETWEEN over the hour range) in DuckDB, certifying
    // the rewrite. Bucket fan-out is bounded by interval length /
    // bucket width (sessions are minutes-to-hours — a few buckets);
    // at 100 TB pick the bucket so fan-out stays O(1) per interval.
    "q_join_interval_overlap" -> ((s, d) => {
      val errs = events(s, d).filter(col("event_type") === "error")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
        .agg(count(lit(1)).as("n_err"))
      val thr = errs.agg(
        (sum(col("n_err")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_err"))
      val inc = errs.crossJoin(broadcast(thr))
        .filter(col("n_err").cast("double") > col("mean_err") * lit(1.5))
        .select(col("h"), col("n_err"))
      val covered = sessions(s, d).select(col("user_id"), col("session_idx"),
          explode(expr(
            """transform(sequence(date_trunc('hour', session_start),
              |date_trunc('hour', session_end), interval 1 hour),
              |x -> cast(x as timestamp_ntz))""".stripMargin))
            .as("h"))
      covered.join(inc, Seq("h"))
        .groupBy(col("h"), col("n_err"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("h"))
    }),
  )

  /** Shared session builder (30-minute gap rule, per-event lineage). */
  private def sessions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
    val ws = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked
      .withColumn("session_idx", sum(col("is_new")).over(ws))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(Tables.dec2(col("value"))).cast("double").as("session_value"))
  }

  val oracle: Map[String, String] = Map(

    "q_event_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT 2, 'click', count(*) FROM c
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM p
        |ORDER BY step""".stripMargin,

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
        |SELECT cohort_day, CAST(e.day - cohort_day AS INT) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN cohort ON e.user_id = cohort.user_id
        |GROUP BY cohort_day, e.day - cohort_day
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q_scd2_intervals" ->
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_type
        |  FROM events),
        |changes AS (SELECT user_id, ts, event_id, event_type FROM x
        |            WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, event_id, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS valid_to,
        |  CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM changes ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN prev_ts IS NULL
        |           OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1
        |         ELSE 0 END AS is_new
        |  FROM m),
        |x AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // the literal two-sided overlap predicate (theta-join) — certifies
    // the engine's explode-to-buckets + equi-join rewrite
    "q_join_interval_overlap" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1
        |         ELSE 0 END AS is_new
        |  FROM m),
        |x AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM f),
        |sess AS (SELECT user_id, session_idx, min(ts) AS session_start,
        |                max(ts) AS session_end
        |         FROM x GROUP BY 1, 2),
        |errs AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n_err
        |         FROM events WHERE event_type = 'error' GROUP BY 1),
        |thr AS (SELECT CAST(sum(n_err) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |          AS mean_err FROM errs),
        |inc AS (SELECT h, n_err FROM errs, thr
        |        WHERE CAST(n_err AS DOUBLE) > mean_err * CAST(1.5 AS DOUBLE))
        |SELECT inc.h AS h, inc.n_err AS n_err, count(*) AS n_sessions
        |FROM inc JOIN sess
        |  ON inc.h BETWEEN date_trunc('hour', sess.session_start)
        |               AND date_trunc('hour', sess.session_end)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
  )
}
