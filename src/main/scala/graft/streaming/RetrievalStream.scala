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
    * into the running [[TextAnalysis.Bm25Index]] via
    * [[TextAnalysis.bm25Append]], so the index the search writers serve
    * is only ever one trigger behind the corpus. State is the index
    * itself: `bm25Append` materializes each generation's postings with
    * a raw `localCheckpoint`, so lineage is CUT at every fold — N
    * batches cost N×O(batch + touched-token correction), never a
    * re-execution chain back to batch 0 (the same bounded-lineage
    * contract as the build barriers; RetrievalStreamSpec folds a
    * two-batch stream and pins the result equal to one batch-API build
    * over the union, scores and all). `onUpdate` receives each new
    * index generation (publish it to a serving thread, or
    * [[TextAnalysis.saveBm25Index]] it for crash recovery — the stream
    * checkpoint replays unacknowledged source batches, and a REPLAYED
    * append violates the disjoint-ids contract, so persist the index
    * and its high-water batchId together and skip already-folded
    * batches on restart). Ungated indexes only, like every decremental
    * mutation (TUNING.md §3e). */
  def bm25AppendWriter(docStream: DataFrame, initial: TextAnalysis.Bm25Index,
                       textCol: String)
                      (onUpdate: (TextAnalysis.Bm25Index, Long) => Unit): DataStreamWriter[Row] = {
    val state = new java.util.concurrent.atomic.AtomicReference(initial)
    docStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val next = TextAnalysis.bm25Append(state.get(), batch, textCol)
      state.set(next)
      onUpdate(next, batchId)
    }
  }
}
