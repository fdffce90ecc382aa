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
}
