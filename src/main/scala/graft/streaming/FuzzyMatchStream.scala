package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.fuzzy.{FuzzyMapping, FuzzyMatcher, MatchOptions}

/** Stream-static fuzzy matching: match a stream of incoming records
  * against a static reference corpus.
  *
  * The matcher is a multi-pass batch algorithm (stable row ids,
  * checkpointed passes, value-level dedup) — none of which Structured
  * Streaming's incremental operators can express directly. The idiomatic
  * Spark shape is `foreachBatch`: every micro-batch runs the FULL batch
  * matcher against the (unchanging) reference side, so each batch's output
  * is exactly what the batch API would produce for those rows — identical
  * semantics, per-batch exactly-once through the sink the caller provides.
  *
  * Per-batch cost: the reference frame is materialized ONCE here (under
  * `opts.checkpoint`), so each batch's reference scans hit checkpoint
  * storage rather than the source; the matcher still re-derives its row
  * index and value statistics per batch (they are defined jointly with
  * the batch side). For large references prefer `runPreprocess = false`
  * in `opts` and size micro-batches accordingly.
  */
object FuzzyMatchStream {

  /** A `DataStreamWriter` running the fuzzy match per micro-batch and
    * handing each batch's matched frame to `sink`. The caller starts it
    * (`.start()`) and chooses trigger / checkpoint options as with any
    * streaming writer (e.g. `Trigger.AvailableNow()` for drain-and-stop,
    * the default processing-time trigger for a continuous stream). */
  def matchWriter(stream: DataFrame, reference: DataFrame,
                  maps: Seq[FuzzyMapping],
                  opts: MatchOptions = MatchOptions.default)
                 (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val ref = graft.util.Materialize(reference, opts.checkpoint)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(FuzzyMatcher.matchDfs(batch, ref, maps, opts), batchId)
      }
  }
}
