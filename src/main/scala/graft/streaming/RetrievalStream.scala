package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.TextAnalysis

/** Stream-static lexical retrieval: score each arriving query row
  * against a static corpus by BM25 — the sparse twin of [[AnnStream]]
  * (route incoming questions to their best documents, attach citations
  * on ingest, online dedup-by-retrieval triage).
  *
  * Shape: `foreachBatch` over a PREBUILT [[TextAnalysis.Bm25Index]] —
  * the index is the expensive half (corpus tokenize + three hash-aggs)
  * and is built or loaded ONCE before the stream starts; each
  * micro-batch then pays exactly the search half: one token equi-join
  * of the batch's query terms against the checkpointed postings plus
  * the BoundedTopK ranking. Per-batch output is bit-identical to the
  * batch API's answer for those rows ([[RetrievalStreamSpec]] drives a
  * two-batch file stream against the batch operator). */
object RetrievalStream {

  /** A `DataStreamWriter` emitting, per micro-batch, the BM25 top-k
    * corpus documents for each arriving (query id, query text) row. The
    * caller starts it and picks trigger/checkpoint options. */
  def bm25Writer(stream: DataFrame, index: TextAnalysis.Bm25Index,
                 queryTextCol: String, queryIdCol: String, k: Int)
                (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(TextAnalysis.bm25TopKWithIndex(index, batch, queryTextCol,
        queryIdCol, k), batchId)
    }

  /** [[bm25Writer]] against a TOKEN-BUCKETED stored index
    * ([[TextAnalysis.Bm25StoredIndex]]): each micro-batch opens its own
    * partition-pruned postings scan over the batch's query-term buckets
    * — per-batch cost tracks the touched buckets' postings, not the
    * corpus (the scale path for big stored indexes; same arithmetic,
    * same per-batch == batch-API guarantee). */
  def bm25StoredWriter(stream: DataFrame, index: TextAnalysis.Bm25StoredIndex,
                       queryTextCol: String, queryIdCol: String, k: Int)
                      (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(TextAnalysis.bm25TopKStored(index, batch, queryTextCol,
        queryIdCol, k), batchId)
    }

  /** INDEX MAINTENANCE on ingest — the write-side twin of the two
    * search writers above: each micro-batch of arriving DOCUMENTS folds
    * into the running index, so the index the search writers serve is
    * only ever one trigger behind the corpus. State is a
    * [[graft.pipeline.Bm25SegmentState]] (base + bounded delta
    * segments): each trigger checkpoints ONE O(batch) delta — never the
    * O(index) full-frame re-materialization the flat
    * [[TextAnalysis.bm25Append]] pays — segments fold into a new base
    * every `compactEvery` triggers (the amortized O(index)/compactEvery
    * step), and superseded segments are explicitly released one trigger
    * later ([[graft.util.Materialize.release]]), so resident
    * checkpointed blocks stay bounded forever on an unbounded stream
    * (IndexSegmentsSpec pins the bound across thousands of folds;
    * RetrievalStreamSpec pins the result equal to one batch-API build
    * over the union, scores and all). `onUpdate` receives each new
    * generation as a lazy index view — valid until one trigger after
    * the next compaction supersedes its segments (the serving-swap
    * grace; see [[graft.pipeline.IndexSegments]]). For crash recovery
    * use [[bm25AppendWriterRecoverable]] — a bare restart of THIS
    * writer replays unacknowledged source batches, and a replayed
    * append violates the disjoint-ids contract. Ungated indexes only,
    * like every incremental mutation (TUNING.md §3e). */
  def bm25AppendWriter(docStream: DataFrame, initial: TextAnalysis.Bm25Index,
                       textCol: String, compactEvery: Int = 16)
                      (onUpdate: (TextAnalysis.Bm25Index, Long) => Unit): DataStreamWriter[Row] = {
    val state = new graft.pipeline.Bm25SegmentState(initial, textCol, compactEvery)
    docStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onUpdate(state.fold(batch), batchId)
    }
  }

  /** CRASH-RECOVERABLE [[bm25AppendWriter]]: segments live as
    * batchId-keyed parquet directories under `indexPath`
    * ([[graft.pipeline.DurableBm25SegmentState]]), so the fold survives
    * JVM death AND a restart from the stream checkpoint is idempotent —
    * a replayed batch (one whose foreachBatch ran but whose stream
    * commit didn't) is recognized by `batchId <= highWater` and skipped
    * instead of double-counted (RecoverableWriterSpec kills a stream
    * mid-fold and pins the restarted result equal to a clean one-shot
    * build, scores and all). `initial` bootstraps an EMPTY store and is
    * not evaluated on reopen. The caller must set the SAME
    * `checkpointLocation` across restarts, as with any stateful sink. */
  def bm25AppendWriterRecoverable(docStream: DataFrame, indexPath: String,
                                  textCol: String,
                                  initial: => TextAnalysis.Bm25Index,
                                  compactEvery: Int = 16)
                                 (onUpdate: (TextAnalysis.Bm25Index, Long) => Unit): DataStreamWriter[Row] = {
    val state = graft.pipeline.DurableBm25SegmentState.openOrCreate(
      docStream.sparkSession, indexPath, textCol, initial, compactEvery)
    docStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onUpdate(state.fold(batch, batchId), batchId)
    }
  }
}
