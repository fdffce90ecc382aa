package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
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
  * The reference side should be pre-materialized by the caller (e.g.
  * `matchDfsEager`'s checkpoint or a bucketed table) so per-batch cost is
  * the match itself, not a rescan.
  */
object FuzzyMatchStream {

  /** A `DataStreamWriter` running the fuzzy match per micro-batch and
    * handing each batch's matched frame to `sink`. Caller starts it
    * (`.start()`), picks the trigger/checkpoint options as usual. */
  def matchWriter(stream: DataFrame, reference: DataFrame,
                  maps: Seq[FuzzyMapping],
                  opts: MatchOptions = MatchOptions.default)
                 (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) sink(FuzzyMatcher.matchDfs(batch, reference, maps, opts), batchId)
      }
}
