package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-ingest operators — the streaming faces of the batch
  * chunk-dedup family ([[graft.pipeline.Dedup.chunkDedup]]).
  */
object DocStreams {

  /** Streaming chunk-level exact dedup: each arriving document explodes
    * into non-overlapping `chunkTokens`-token chunks (the same stateless
    * projection as the batch operator), and a chunk whose digest already
    * passed within the watermark horizon is dropped — the sink receives
    * only first-occurrence passages, in arrival order.
    *
    * State is keyed by the 16-byte chunk digest (never the chunk text)
    * and bounded by the watermark: the streaming analog of the batch
    * keep-first rule, where "first" is arrival time rather than
    * (id, index) order. Output: (id, ts, chunk_index, chunk_md5,
    * chunk_text). */
  def chunkDedupStream(docs: DataFrame, textCol: String, idCol: String,
                       tsCol: String, chunkTokens: Int,
                       watermark: String = "2 hours"): DataFrame = {
    graft.pipeline.Curation.chunkStream(docs, textCol,
        Seq(col(idCol), col(tsCol)), chunkTokens, overlap = 0)
      .drop("n_total")
      .withColumn("chunk_md5", graft.pipeline.Curation.chunkDigest)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("chunk_md5")
  }

  /** Streaming NEAR-dup flagging against a stored corpus state — the
    * online face of [[graft.pipeline.Dedup.minhashIncrementalPairs]]
    * (flag arriving documents that near-duplicate the existing corpus,
    * on ingest). Each micro-batch runs the cross-side banded join + exact
    * shingle-jaccard verify against the UNCHANGING
    * [[graft.pipeline.Dedup.minhashState]] frame, which is materialized
    * once before the stream starts (`localCheckpoint` — micro-batches
    * scan the checkpointed blocks, nothing upstream re-executes). Batch
    * ids live in the stream's id space; corpus ids in the state's —
    * disjoint by the same contract as the batch operator. The sink
    * receives (id_a = arriving doc, id_b = corpus doc, jaccard) rows.
    *
    * State growth across batches is the caller's policy (append each
    * accepted batch's [[graft.pipeline.Dedup.minhashState]] to storage
    * and restart the stream on the new snapshot, the same nightly cycle
    * the batch operator documents) — a stream cannot mutate its own
    * static side mid-flight.
    *
    * Sink contract: the sink MUST consume its frame (write/collect)
    * before returning — each micro-batch's barriers live in a per-batch
    * [[graft.util.MatchScope]] and are released when the sink returns, so
    * a deferred action on a stashed frame would read unpersisted
    * blocks. */
  def nearDupWriter(docs: DataFrame, corpusState: DataFrame,
                    textCol: String, idCol: String,
                    shingleLen: Int = 3, numBands: Int = 16,
                    rowsPerBand: Int = 4, threshold: Double = 0.7,
                    maxBucketPairs: Long = 4_000_000L)
                   (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val statePrepared = corpusState.localCheckpoint()
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // per-batch MatchScope: minhashIncrementalPairs barriers the batch's
      // minhash state (Materialize); without a scope on the
      // stream-execution thread those blocks would accumulate for the app
      // lifetime on an unbounded stream — the FuzzyMatchStream leak, same
      // fix. statePrepared is checkpointed on the CALLER thread above and
      // survives across batches.
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.minhashIncrementalPairs(batch, statePrepared,
          textCol, idCol, shingleLen, numBands, rowsPerBand, threshold,
          maxBucketPairs), batchId)
      }
    }
  }

  /** Streaming duplicated-span removal on ingest — the online face of
    * [[graft.pipeline.Dedup.spanRewriteAgainst]]: every micro-batch is
    * rewritten against the UNCHANGING stored corpus census
    * ([[graft.pipeline.Dedup.ngramFrequency]] with `n = spanLen`,
    * `minDocs = 1`), so an arriving document sheds every passage the
    * corpus already contains before it reaches the sink. The census is
    * materialized once before the stream starts (`localCheckpoint`);
    * refreshing it is the caller's nightly cycle, same contract as
    * [[nearDupWriter]]. Within-batch duplication is not examined —
    * micro-batches are small and the nightly full
    * [[graft.pipeline.Dedup.spanRewrite]] sweep owns that case. Same
    * sink contract as [[nearDupWriter]]: consume the frame inside the
    * callback — its barriers are released when the sink returns. */
  def spanRewriteWriter(docs: DataFrame, census: DataFrame,
                        textCol: String, idCol: String, spanLen: Int)
                       (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val censusPrepared = census.select(col("ngram")).localCheckpoint()
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // per-batch MatchScope: spanRewriteAgainst barriers its words frame
      // (Materialize/localCheckpoint); without a scope on the
      // stream-execution thread every micro-batch's blocks would live for
      // the app lifetime — the FuzzyMatchStream leak, same fix. The census
      // checkpoint above is taken on the CALLER thread, outside any
      // per-batch scope, so it survives across batches.
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.spanRewriteAgainst(batch, censusPrepared,
          textCol, idCol, spanLen), batchId)
      }
    }
  }

  /** Streaming hamming near-dup flagging over a PRECOMPUTED 64-bit hash
    * column — the online face of
    * [[graft.pipeline.Dedup.hashPairsAgainst]]: arriving rows (carrying
    * a SimHash / perceptual dHash computed upstream) match against the
    * UNCHANGING stored corpus hashes at hamming <= `maxHamming`
    * (pigeonhole blocking, batch-chunk × corpus-chunk — per-trigger work
    * is O(batch × colliding corpus)). The re-encoded-recrawl detector on
    * ingest: a lossy re-encode of a stored asset lands within a few bits
    * of its original's dHash and flags here before it enters the corpus.
    * Appending accepted batch hashes to the store and restarting on the
    * new snapshot is the caller's nightly cycle, same contract as
    * [[nearDupWriter]]. Emits (id_a = batch row, id_b = corpus row,
    * hamming) per trigger; per-batch barriers live in a MatchScope and
    * release when the sink returns. */
  def hammingNearDupWriter(stream: DataFrame, corpusHashes: DataFrame,
                           streamHashCol: String, streamIdCol: String,
                           corpusHashCol: String, corpusIdCol: String,
                           maxHamming: Int = 3,
                           maxBucketPairs: Long = 4_000_000L)
                          (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // the chunk-exploded corpus + its bucket stats materialize ONCE here
    // on the caller thread (outside any per-batch scope) — per trigger
    // only the batch side is chunked and counted, keeping the documented
    // O(batch × colliding corpus) per-trigger cost honest (re-deriving
    // the corpus state per batch would be two corpus-wide passes per
    // trigger)
    val state = graft.pipeline.Dedup.hammingState(
      corpusHashes, col(corpusHashCol), corpusIdCol, maxHamming)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.hashPairsAgainstState(
          batch, col(streamHashCol), streamIdCol, state, maxBucketPairs),
          batchId)
      }
    }
  }

  /** [[hammingNearDupWriter]] against a STORED bucket-partitioned state
    * ([[graft.pipeline.Dedup.saveHammingState]]) — the corpus-scale
    * form: each micro-batch's chunk keys prune the corpus scan to the
    * `bucket=N/` directories they actually touch, so per-trigger corpus
    * I/O is proportional to the touched buckets rather than the store
    * (the in-memory writer scans its whole checkpointed corpus per
    * trigger — fine at 10⁵ hashes, gigabytes per trigger at 10⁸).
    * Refreshing the store (append accepted batches, rewrite touched
    * buckets) and restarting on the new snapshot is the caller's
    * nightly cycle. */
  def hammingNearDupWriterStored(stream: DataFrame, statePath: String,
                                 streamHashCol: String, streamIdCol: String,
                                 maxBucketPairs: Long = 4_000_000L)
                                (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val stored = graft.pipeline.Dedup.loadHammingState(
      stream.sparkSession, statePath)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.hashPairsAgainstStored(
          batch, col(streamHashCol), streamIdCol, stored, maxBucketPairs),
          batchId)
      }
    }
  }

  /** Streaming near-dup flagging against a SAVED MinHash store
    * ([[graft.pipeline.Dedup.saveMinhashState]]) — the text-shingle twin
    * of [[hammingNearDupWriterStored]], same contract end to end: the
    * store resolves to its highest committed generation ONCE at writer
    * construction (re-open the writer after a nightly refresh to adopt
    * the new corpus), per-trigger corpus I/O prunes to the batch's
    * touched band/hset buckets, each micro-batch's barriers live in a
    * per-batch [[graft.util.MatchScope]], and an idempotent sink
    * (overwrite per batchId) makes at-least-once replay converge. */
  def minhashNearDupWriterStored(stream: DataFrame, statePath: String,
                                 textCol: String, idCol: String,
                                 threshold: Double = 0.7,
                                 maxBucketPairs: Long = 4_000_000L)
                                (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val stored = graft.pipeline.Dedup.loadMinhashState(
      stream.sparkSession, statePath)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.minhashPairsAgainstStored(
          batch, textCol, idCol, stored, threshold, maxBucketPairs),
          batchId)
      }
    }
  }

  /** [[minhashNearDupWriterStored]]'s lifted-passage sibling: each
    * micro-batch flags its documents against a SAVED
    * [[graft.pipeline.Dedup.saveWinnowState]] store
    * ([[graft.pipeline.Dedup.winnowPairsAgainstStored]]) — per-trigger
    * corpus I/O prunes to the batch's touched fingerprint buckets, the
    * store handle resolves its live generation at writer build time
    * (re-open after a nightly refresh), and the same per-batch
    * [[graft.util.MatchScope]] / idempotent-sink contract applies. */
  def winnowNearDupWriterStored(stream: DataFrame, statePath: String,
                                textCol: String, idCol: String,
                                minShared: Long = 8L,
                                maxFingerprintPairs: Long = 4_000_000L)
                               (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val stored = graft.pipeline.Dedup.loadWinnowState(
      stream.sparkSession, statePath)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.winnowPairsAgainstStored(
          batch, textCol, idCol, stored, minShared, maxFingerprintPairs),
          batchId)
      }
    }
  }
}
