package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming operators validated against their batch equivalents: the same
  * parquet drives a file-stream source (one file = one micro-batch) into a
  * memory sink, then the results are compared with the batch computation.
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  // normalize whatever the file stores to epoch nanos, then convert to a
  // proper timestamp column for event-time semantics
  private def withTs(df: org.apache.spark.sql.DataFrame) =
    // integer division: `/ 1000` would route through double and lose
    // sub-ms precision at 2024-epoch nano magnitudes (~1.7e18 > 2^53)
    graft.util.EventTs.normalizeTs(df)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  // FileStreamSource requires a DIRECTORY; stage the single parquet file
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(eventsPath),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private lazy val rawSchema = spark.read.parquet(eventsPath).schema
  private lazy val batchEvents = withTs(spark.read.parquet(eventsPath))

  private def streamingEvents = withTs(
    spark.readStream.schema(rawSchema).parquet(streamDir))

  test("windowed counts: streaming result equals batch result") {
    val q = EventStreams.windowedCounts(streamingEvents)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("win_counts")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    // Append mode only emits FINALIZED windows (watermark passed). With a
    // single micro-batch, windows near the max event time stay open, so the
    // streaming output must be a subset of the batch result — and closed
    // windows must match exactly.
    val streamed = spark.table("win_counts").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), math.round(r.getAs[Double]("total_value") * 1e6)))
      .toSet
    val batch = EventStreams.windowedCounts(batchEvents).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), math.round(r.getAs[Double]("total_value") * 1e6)))
      .toSet
    assert(streamed.nonEmpty, "no finalized windows emitted")
    assert(streamed.subsetOf(batch),
      s"streaming emitted rows absent from batch: ${(streamed -- batch).take(3)}")
  }

  test("streaming dedup drops duplicate event_ids") {
    val q = EventStreams.dedupEvents(streamingEvents)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_events")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val n = spark.table("dedup_events").count()
    val distinct = batchEvents.select("event_id").distinct().count()
    assert(n == distinct)
  }

  test("stream-stream impression-click join equals the batch range join") {
    // split the event stream into two roles by event_type hash parity —
    // deterministic, both sides time-ordered like real telemetry
    def impressions(df: org.apache.spark.sql.DataFrame) =
      df.where(pmod(xxhash64(col("event_type")), lit(2L)) === 0)
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.where(pmod(xxhash64(col("event_type")), lit(2L)) === 1)

    val q = EventStreams.impressionClickJoin(
        impressions(streamingEvents), clicks(streamingEvents))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("imp_click")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("imp_click").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStreams.impressionClickJoin(
        impressions(batchEvents), clicks(batchEvents)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a single micro-batch buffers everything, so the inner join emits the
    // complete batch answer
    assert(batch.nonEmpty, "fixture produced no impression-click pairs")
    assert(streamed == batch)
  }

  test("stateful session totals accumulate per user") {
    val q = EventStreams.sessionTotals(streamingEvents)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("sessions")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("sessions")
      .groupBy($"user_id").agg(max($"n_events").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = batchEvents.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("native session_window: gap semantics incl. the exact-gap boundary") {
    // user 1: events at 0s, 10s, then exactly +30min after the last (the
    // session window is end-INCLUSIVE -> still the SAME session), then
    // +30min+1us after that (also merges); user 2: a gap of 30min+1us
    // genuinely breaks; user 3: one event
    val gapUs = 30L * 60 * 1000000
    val fixture = Seq(
      (1L, 0L, 5L), (1L, 10000000L, 7L),
      (1L, 10000000L + gapUs, 11L),          // exactly at last + gap: merges
      (1L, 10000000L + 2 * gapUs + 1L, 13L), // gap + 1us after that: breaks
      (2L, 0L, 19L), (2L, gapUs + 1L, 23L),  // strict break
      (3L, 42L, 17L)
    ).toDF("user_id", "ts_us", "cents")
      .withColumn("ts", timestamp_micros($"ts_us"))
    val out = EventStreams.sessionWindowStats(fixture, "user_id", "ts", "cents")
      .select($"user_id", unix_micros($"session_start"), unix_micros($"session_end"),
        $"n_events", $"sum_value")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 10000000L + gapUs, 3L, 23L),
      (1L, 10000000L + 2 * gapUs + 1L, 10000000L + 2 * gapUs + 1L, 1L, 13L),
      (2L, 0L, 0L, 1L, 19L),
      (2L, gapUs + 1L, gapUs + 1L, 1L, 23L),
      (3L, 42L, 42L, 1L, 17L)), s"got $out")
  }

  test("native session_window streaming run equals the batch run") {
    def sessions(df: org.apache.spark.sql.DataFrame) =
      EventStreams.sessionWindowStats(
        df.withColumn("cents", expr("cast(round(value * 100) as long)")),
        "user_id", "ts", "cents", watermark = Some("2 hours"))
    val q = sessions(streamingEvents)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_win")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    // Append emits only sessions FINALIZED by the watermark; with one
    // micro-batch, sessions near max event time stay open -> streamed is
    // a subset of batch, and every emitted session must match exactly
    val streamed = spark.table("sess_win")
      .select($"user_id", $"sum_value", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = sessions(batchEvents)
      .select($"user_id", $"sum_value", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "no finalized sessions emitted")
    assert(streamed.subsetOf(batch),
      s"streaming emitted sessions absent from batch: ${(streamed -- batch).take(3)}")
  }
}
