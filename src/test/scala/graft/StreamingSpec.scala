package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamRunner

/** Batch/stream equivalence (SURVEY.md §5.5): the readStream pipelines
  * with watermarks, run to completion with Trigger.AvailableNow, must
  * agree with the batch window queries the DuckDB oracle checks. */
class StreamingSpec extends SparkTestBase {

  test("streaming tumbling window == batch q_stream_tumbling") {
    val stream = StreamRunner.runAvailableNow(spark,
      StreamRunner.tumblingHourly(StreamRunner.eventsStream(spark, sf)),
      "t_tumbling")
      .withColumn("win_start", col("win_start").cast("timestamp_ntz"))
    val batch = q("q_stream_tumbling")
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("streaming session windows == batch q_stream_session (keys+counts)") {
    val stream = StreamRunner.runAvailableNow(spark,
      StreamRunner.sessions(StreamRunner.eventsStream(spark, sf)),
      "t_sessions")
      .withColumn("session_start", col("session_start").cast("timestamp_ntz"))
    val batch = q("q_stream_session")
      .select(col("user_id"), col("session_start"), col("n_events"))
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("foreachBatch parquet sink lands the stream incrementally") {
    val tmp = java.nio.file.Files.createTempDirectory("sink").toString
    StreamRunner.runForeachBatchParquet(spark,
      StreamRunner.eventsStream(spark, sf)
        .withWatermark("ts", "1 hour")
        .select(col("event_id"), col("ts"), col("user_id")),
      s"$tmp/out", s"$tmp/ckpt")
    val landed = spark.read.parquet(s"$tmp/out")
    assert(landed.count() ==
      graft.engine.Tables.t(spark, sf, "events").count())
  }
}
