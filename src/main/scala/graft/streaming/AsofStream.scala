package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.AsofJoin
import graft.util.{CheckpointStrategy, Materialize}

/** Stream-static as-of enrichment: attach to each streamed record the
  * nearest reference row at or before its timestamp — the streaming form
  * of point-in-time lookup (enrich events with the config/price/model
  * snapshot that was live when the event happened).
  *
  * [[graft.pipeline.AsofJoin]]'s union-window plan needs a bounded sort
  * domain per key, which is inexpressible as an incremental streaming
  * operator against an unbounded stream — but with a STATIC reference
  * side, each micro-batch is a self-contained batch as-of join. So,
  * exactly like [[FuzzyMatchStream]], the idiomatic shape is
  * `foreachBatch`: identical semantics to the batch operator per batch,
  * exactly-once through the caller's sink.
  *
  * The reference side is pruned to the needed columns and materialized
  * ONCE under `checkpoint` before the stream starts; per-batch cost is
  * then one shuffle of (batch rows + reference rows) on the key — the
  * reference source files are never re-scanned.
  */
object AsofStream {

  /** A `DataStreamWriter` running the backward as-of join per micro-batch
    * and handing each enriched batch to `sink`. Caller starts it and
    * picks the trigger, as with any streaming writer. */
  def enrichWriter(stream: DataFrame, reference: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payloadCols: Seq[String],
                   tolerance: Option[Column] = None,
                   checkpoint: CheckpointStrategy = CheckpointStrategy.Local)
                  (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val needed = (keys :+ rightTs) ++ payloadCols
    val prepared = Materialize(
      reference.select(needed.distinct.map(col): _*), checkpoint)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(AsofJoin.backward(batch, prepared, keys, leftTs, rightTs,
          payloadCols, tolerance), batchId)
      }
  }
}
