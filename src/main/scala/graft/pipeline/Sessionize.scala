package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the classic event-pipeline operator: a new
  * session starts when a user's inter-event gap exceeds `gapMicros`.
  *
  * Executes as ONE shuffle keyed by the user column (the per-user window
  * sort): lag flags session breaks, a running sum numbers sessions within
  * each user. No state beyond the window sort, scales with users x events
  * like any keyed aggregation. Timestamps are plain epoch-microsecond
  * longs — arithmetic stays integer (no timezone or float-precision
  * semantics), which also makes results bit-comparable across engines.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per user) to the event frame. `tieCol`
    * makes the within-timestamp order — and therefore the numbering —
    * deterministic. */
  def sessions(events: DataFrame, userCol: String, tsMicrosCol: String,
               tieCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsMicrosCol).asc, col(tieCol).asc)
    val prev = lag(col(tsMicrosCol), 1).over(w)
    events
      .withColumn("__brk",
        when(prev.isNull || col(tsMicrosCol) - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** Per-session aggregate: event count, start/end (epoch micros), and the
    * summed value. One additional hash-aggregate shuffle on
    * (user, session). */
  def sessionStats(events: DataFrame, userCol: String, tsMicrosCol: String,
                   tieCol: String, valueCol: String, gapMicros: Long): DataFrame =
    sessions(events, userCol, tsMicrosCol, tieCol, gapMicros)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsMicrosCol)).as("session_start_us"),
        max(col(tsMicrosCol)).as("session_end_us"),
        sum(col(valueCol)).as("sum_value"))
}
