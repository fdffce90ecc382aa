package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.AnnSearch

/** Stream-static similarity search: enrich a stream of embedding rows
  * with their neighbors from a static corpus — the online face of
  * [[graft.pipeline.AnnSearch]], for "route each incoming document to its
  * nearest cluster / flag near-duplicates on arrival" ingest jobs.
  *
  * Shape: `foreachBatch`, like [[FuzzyMatchStream]] — the search is a
  * batch algorithm (broadcast or LSH-bucketed candidate join + exact
  * re-rank), so each micro-batch runs it in full against the unchanging
  * corpus; per-batch output is exactly the batch API's answer for those
  * rows. The corpus projection is materialized ONCE before the stream
  * starts (`localCheckpoint`): micro-batches scan the checkpointed
  * blocks, not the source parquet, and recompute none of the upstream
  * plan. A micro-batch is naturally below [[AnnSearch.BroadcastQueryLimit]]
  * at any sane trigger, so routing lands on the broadcast-exact arm
  * without a probe action (the batch row count is known to the router
  * only after an action — pass through `topK`/`radius`'s count probe on
  * the tiny batch instead, which is one cheap job per trigger). */
object AnnStream {

  /** A `DataStreamWriter` emitting, per micro-batch, every corpus
    * neighbor at cosine >= `tau` for each arriving vector
    * ((query_id, corpus_id, cosine) rows to `sink`). The caller starts
    * it and picks trigger/checkpoint options. */
  def radiusWriter(stream: DataFrame, corpus: DataFrame,
                   vecCol: String, idCol: String, tau: Double, dim: Int)
                  (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val corpusPrepared = corpus.select(col(idCol), col(vecCol)).localCheckpoint()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(AnnSearch.radius(batch, corpusPrepared, vecCol, idCol, tau, dim), batchId)
    }
  }

  /** A `DataStreamWriter` emitting, per micro-batch, the exact cosine
    * top-k corpus neighbors for each arriving vector
    * ((query_id, corpus_id, cosine, rank) rows to `sink`). */
  def topKWriter(stream: DataFrame, corpus: DataFrame,
                 vecCol: String, idCol: String, k: Int, dim: Int)
                (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val corpusPrepared = corpus.select(col(idCol), col(vecCol)).localCheckpoint()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(AnnSearch.topK(batch, corpusPrepared, vecCol, idCol, k, dim), batchId)
    }
  }

  /** The stored-index form of [[topKWriter]] — search arriving vectors
    * against PERSISTED IVF postings + a frozen quantizer
    * ([[graft.pipeline.AnnSearch.ivfPostings]]/`loadPostings` +
    * `loadCentroids`), so each micro-batch pays only cell assignment and
    * the probed-cell re-rank, never a full-corpus scan — the
    * fit-once/search-forever production shape at corpus scale (the
    * brute-force writer's per-batch cost grows with the corpus; this
    * one's grows with nProbe cell populations). The postings frame is
    * checkpointed once on the caller thread; refreshing the index
    * (append or refit) is the caller's nightly cycle, same contract as
    * the other stream-static writers. */
  def ivfTopKWriter(stream: DataFrame, postings: DataFrame,
                    vecCol: String, idCol: String, k: Int, dim: Int,
                    centroids: Array[Double], nProbe: Int)
                   (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val postingsPrepared = postings.localCheckpoint()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(AnnSearch.ivfTopKFromPostings(batch, postingsPrepared,
        vecCol, idCol, k, dim, centroids, nProbe), batchId)
    }
  }

  /** INDEX MAINTENANCE on ingest — the vector twin of
    * [[RetrievalStream.bm25AppendWriter]]: each micro-batch of arriving
    * embeddings assigns to the FROZEN quantizer and unions onto the
    * running postings ([[AnnSearch.ivfAppendPostings]] per trigger).
    * The union is lazy, so each generation is `localCheckpoint`ed here —
    * without the barrier N batches would stack a re-executed union
    * lineage back to batch 0; with it every fold costs O(batch)
    * assignment plus the copy of a bounded postings frame. `onUpdate`
    * receives each generation (hand it to [[ivfTopKWriter]]'s nightly
    * refresh, or [[AnnSearch.savePostings]] it with the high-water
    * batchId — a restart replays unacknowledged source batches and a
    * replayed append duplicates rows, same recovery contract as the
    * BM25 writer). Re-fit on drift stays a deliberate separate event
    * ([[AnnSearch.fitIndex]] + full rebuild), exactly as in the batch
    * lifecycle. */
  def ivfAppendWriter(embStream: DataFrame, initial: DataFrame,
                      vecCol: String, idCol: String, dim: Int,
                      centroids: Array[Double])
                     (onUpdate: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val state = new java.util.concurrent.atomic.AtomicReference(
      initial.localCheckpoint())
    embStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val next = AnnSearch.ivfAppendPostings(state.get(), batch,
        vecCol, idCol, dim, centroids).localCheckpoint()
      state.set(next)
      onUpdate(next, batchId)
    }
  }

  /** Streaming semantic near-dup flagging — the online face of
    * [[graft.pipeline.Dedup.semDedupIncrementalPairs]]: arriving
    * embeddings assign to the pinned centroids and flag against the
    * UNCHANGING stored [[graft.pipeline.Dedup.semDedupState]] on the
    * cell key (corpus wins; batch/corpus ids disjoint by the batch
    * operator's contract). The state frame is checkpointed once on the
    * caller thread; appending accepted batches and restarting on the new
    * snapshot is the caller's nightly cycle, same as
    * [[graft.streaming.DocStreams.nearDupWriter]]. Sink contract as
    * everywhere: consume the frame inside the callback — each
    * micro-batch's barriers live in a per-batch
    * [[graft.util.MatchScope]] and are released when the sink
    * returns. */
  def semanticNearDupWriter(stream: DataFrame, corpusState: DataFrame,
                            vecCol: String, idCol: String,
                            centroidsMicro: Array[Long], dim: Int, nCells: Int,
                            threshold: Double,
                            maxCellPairs: Long = 4_000_000L)
                           (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val statePrepared = corpusState.localCheckpoint()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.semDedupIncrementalPairs(batch, statePrepared,
          vecCol, idCol, centroidsMicro, dim, nCells, threshold, maxCellPairs),
          batchId)
      }
    }
  }
}
