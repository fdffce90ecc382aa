package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no event-time streaming ("streaming" there means
  * Polars' out-of-core batch engine, SURVEY.md §1.1); these operators are
  * part of the north-star pipeline surface. All are source-agnostic: they
  * accept either a batch or a streaming DataFrame of the same schema, so
  * specs can validate streaming output against the batch equivalent.
  */
object EventStreams {

  /** Sliding-window event aggregation with a watermark: late rows beyond
    * `watermark` are dropped, state is bounded. */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "1 hour",
                     slide: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessionization via the NATIVE `session_window` — the
    * incremental streaming path for what [[graft.pipeline.Sessionize]]
    * computes with batch windows: under a watermark, Spark maintains and
    * merges open sessions as state and emits each session when it closes,
    * so an unbounded stream sessionizes with bounded memory (the
    * foreachBatch-free shape). Batch frames run the same code.
    *
    * Boundary semantics (native, pinned by spec fixture): an event MERGES
    * into the open session iff `ts - last <= gap` — the session window
    * `[start, last + gap]` is end-INCLUSIVE, so an event at exactly
    * `last + gap` extends the session. Identical to
    * `Sessionize.sessionStats`' `<=` merge rule.
    *
    * Session bounds are reported as min/max EVENT times (the
    * `session_window` struct's end is `last + gap`, a retention bound,
    * not an event time). */
  def sessionWindowStats(events: DataFrame, userCol: String, tsCol: String,
                         valueCol: String, gap: String = "30 minutes",
                         watermark: Option[String] = None): DataFrame = {
    val base = watermark.map(w => events.withWatermark(tsCol, w)).getOrElse(events)
    base.groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
      .drop("session_window")
  }

  /** Streaming exact dedup on event_id, state bounded by the watermark
    * (the streaming analog of Dedup.exactDedupRows). */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join on user_id within a time bound: each click
    * joins impressions of the SAME user at most `joinWindow` older.
    * Watermarks on both sides bound the buffered state (Spark drops
    * impression state older than watermark + joinWindow) — the canonical
    * ad-attribution / action-cause join at 100 TB event volume. */
  def impressionClickJoin(impressions: DataFrame, clicks: DataFrame,
                          watermark: String = "1 hour",
                          joinWindow: String = "30 minutes"): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("ts").as("imp_ts"),
        col("user_id").as("imp_user"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("click_user"))
      .withWatermark("click_ts", watermark)
    clk.join(imp,
        col("imp_user") === col("click_user") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $joinWindow"))
      .select(col("click_user").as("user_id"), col("imp_id"), col("click_id"),
        col("imp_ts"), col("click_ts"))
  }

  final case class SessionUpdate(user_id: Long, n_events: Long, total_value: Double)
  // public: Catalyst's generated encoders instantiate this reflectively
  final case class SessionState(n: Long, total: Double)

  /** Per-user running session state via mapGroupsWithState — the custom
    * stateful-operator shape (KeyValueGroupedDataset) for logic windows
    * can't express. Emits one updated row per user per micro-batch. */
  def sessionTotals(events: DataFrame): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update(SessionState(n, total))
          SessionUpdate(userId, n, total)
      }
  }
}
