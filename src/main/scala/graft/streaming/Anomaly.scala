package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key streaming anomaly detection on the `transformWithState` API
  * (Spark 4's arbitrary-state processor — the successor to
  * mapGroupsWithState, with typed state handles and per-state TTL).
  *
  * Each user's value stream maintains Welford running mean/variance
  * state; every event emits its z-score against the state BEFORE it
  * (self-exclusion — an outlier must not dilute the baseline it is
  * judged against) and a flag when |z| exceeds the threshold after a
  * warm-up count. The streaming shape of quality/fraud monitors: state
  * is three numbers per user, optionally TTL'd for abandoned keys.
  */
object Anomaly {

  // public: Catalyst's generated encoders instantiate these reflectively
  final case class ValueEvent(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  final case class WelfordState(n: Long, mean: Double, m2: Double)
  final case class AnomalyFlag(user_id: Long, event_id: Long, ts_us: Long,
                               value: Double, zscore: Double, flagged: Boolean)

  /** Deterministic per-event fold: rows sort by (ts, event_id) within
    * each micro-batch (the iterator's own order is partition-arbitrary),
    * so replays and the batch reference produce identical flags. */
  class Processor(k: Double, minN: Long, ttl: TTLConfig)
      extends StatefulProcessor[Long, ValueEvent, AnomalyFlag] {
    @transient private var state: ValueState[WelfordState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[WelfordState]("welford",
        Encoders.product[WelfordState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[ValueEvent],
                                 timers: TimerValues): Iterator[AnomalyFlag] = {
      var s = if (state.exists()) state.get() else WelfordState(0L, 0.0, 0.0)
      val out = rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).map { r =>
        val sigma = if (s.n >= 2) math.sqrt(s.m2 / (s.n - 1)) else 0.0
        val z = if (s.n >= minN && sigma > 0) (r.value - s.mean) / sigma else 0.0
        val flagged = s.n >= minN && sigma > 0 && math.abs(z) > k
        val n1 = s.n + 1
        val d = r.value - s.mean
        val mean1 = s.mean + d / n1
        s = WelfordState(n1, mean1, s.m2 + d * (r.value - mean1))
        AnomalyFlag(key, r.event_id, r.ts_us, r.value, z, flagged)
      }
      state.update(s)
      out.iterator
    }
  }

  /** Flags each event whose value deviates more than `k` running standard
    * deviations from its user's history (first `minN` events warm up).
    * Bounded state (three numbers per key), one row out per row in.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`) — transformWithState keeps
    * each state variable in its own column family, which the default
    * HDFSBacked provider does not support. */
  def valueAnomalies(events: DataFrame, k: Double = 3.0, minN: Long = 10L,
                     ttl: TTLConfig = TTLConfig.NONE): Dataset[AnomalyFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("ts_us").cast("long").as("ts_us"),
        col("value").cast("double").as("value"))
      .as[ValueEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(k, minN, ttl),
        timeModeFor(ttl), OutputMode.Append(), Encoders.product[AnomalyFlag])
  }

  /** A non-NONE state TTL is only legal under ProcessingTime time mode —
    * Spark's StatefulProcessorHandle rejects a TTL'd state variable in
    * TimeMode.None at getValueState. Selecting the mode from the config
    * keeps the `ttl` parameter honest (it crashed every query before). */
  private[streaming] def timeModeFor(ttl: TTLConfig): TimeMode =
    if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
}
