package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.Tables.dec2

/** Structured Streaming surface over the `events` table (SURVEY.md §2B
  * streaming; reference analog: the daily re-scrape snapshot stream,
  * crocus base_scraper.py:72-83 — each day's folder is a new batch).
  *
  * The transforms are the same window()/session_window() expressions as
  * the batch queries in operators.StreamingQueries — batch/stream
  * equivalence is the correctness argument (tested in StreamingSpec).
  *
  * Scale notes: watermark bounds state (late events beyond 1 hour are
  * dropped); Trigger.AvailableNow gives batch-incremental runs — the
  * 100 TB pattern for daily snapshot ingest (process what's new, then
  * stop; no always-on cluster).
  */
object StreamRunner {

  /** readStream view of events with the same nanos→micros normalization
    * as the batch loader (events.parquet is TIMESTAMP(NANOS)). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.engine.Tables.t(spark, dir, "events").schema
    val rawSchema = org.apache.spark.sql.types.StructType(schema.map(f =>
      if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.LongType)
      else f))
    // NOTE: streaming keeps instant-typed timestamps — EventTimeWatermark
    // rejects TIMESTAMP_NTZ; the batch queries use NTZ (session tz UTC
    // makes the wall-clock values identical).
    // events.parquet is a single file; the streaming file source wants a
    // directory — stream the SF dir with a glob filter instead.
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour counts with a 1-hour watermark. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("n"), col("sum_value"))

  /** Per-user 30-minute session windows with watermark. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Stream-static join: the live event stream enriched against a
    * batch-computed user dimension (first-active cohort day). The
    * static side re-plans per micro-batch but holds NO streaming state
    * — the standard shape for dimension enrichment at scale (broadcast
    * when the dim is small; here it's one row per user). The global
    * (non-windowed) aggregation means complete output mode — run via
    * runAvailableNow, not the append sink. No watermark: nothing here
    * consumes one (the join is stateless and the agg isn't windowed),
    * so declaring it would bound nothing. Output: events per
    * (cohort_day, event_type). */
  def cohortEnriched(stream: DataFrame, userDim: DataFrame): DataFrame =
    stream
      .join(userDim, Seq("user_id"))
      .groupBy(col("cohort_day"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Stream-stream interval join: each purchase joined to the clicks of
    * the same user in the preceding hour. Both sides carry watermarks so
    * the join state is bounded: a buffered click can be dropped once the
    * purchase-side watermark passes click_ts + 1h — the at-scale
    * requirement for unbounded stream joins (state would otherwise grow
    * with the full history). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("user_id"), col("p_ts"), col("c_id"), col("c_ts"))
  }

  /** Streaming exact dedup: drop events whose key was already seen
    * within the watermark horizon — the streaming side of the corpus-
    * dedup story. State holds only keys newer than the watermark, so
    * memory is bounded by (arrival rate × delay), not history. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Custom keyed state (SURVEY.md §1.4 "daily re-scrape stream"):
    * per-user running stats maintained across micro-batches with
    * flatMapGroupsWithState — the engine's arbitrary-state surface for
    * logic window aggregates can't express. State is bounded per key
    * (a few counters), the 100 TB pattern for long-running per-entity
    * accumulators. */
  case class UserEvent(user_id: Long, value: Double)
  case class UserState(n: Long, sum: Double)
  case class UserUpdate(user_id: Long, n: Long, sum: Double, batch_n: Long)

  def runningUserStats(events: DataFrame): org.apache.spark.sql.Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val next = UserState(prev.n + batch.size, prev.sum + batch.map(_.value).sum)
          state.update(next)
          Iterator.single(UserUpdate(user, next.n, next.sum, batch.size.toLong))
      }
  }

  /** Append-mode variant (stream-stream joins only support append). */
  def runAvailableNowAppend(spark: SparkSession, df: DataFrame,
      name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Spark 4 transformWithState form of the per-user accumulator — the
    * modern arbitrary-state API (named ValueState handles, TTL support,
    * RocksDB-backed). Semantics identical to runningUserStats above;
    * equivalence asserted in StreamingSpec. Requires the RocksDB state
    * store provider. */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserUpdate] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var state: ValueState[UserState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("running",
        Encoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserUpdate] = {
      val batch = rows.toSeq
      val prev = if (state.exists()) state.get() else UserState(0L, 0.0)
      val next = UserState(prev.n + batch.size, prev.sum + batch.map(_.value).sum)
      state.update(next)
      Iterator.single(UserUpdate(user, next.n, next.sum, batch.size.toLong))
    }
  }

  def runningUserStatsTws(events: DataFrame): org.apache.spark.sql.Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Run a streaming frame to completion (AvailableNow) into an
    * in-memory table and return its final contents. */
  def runAvailableNow(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** foreachBatch parquet sink (append) — the batch-incremental write
    * path; each micro-batch lands atomically under `outDir`. */
  def runForeachBatchParquet(spark: SparkSession, df: DataFrame,
      outDir: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
