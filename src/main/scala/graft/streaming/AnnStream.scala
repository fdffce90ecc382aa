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
    * embeddings assigns to the FROZEN quantizer and lands as one
    * O(batch) checkpointed delta segment in a
    * [[graft.pipeline.IvfSegmentState]]; the served postings are the
    * lazy union of base + ≤ compactEvery deltas, segments fold into a
    * new base every `compactEvery` triggers, and superseded segments
    * are explicitly released one trigger later — bounded resident
    * blocks on an unbounded stream, never a full-postings copy per
    * trigger (IndexSegmentsSpec pins both; AnnStreamSpec pins the
    * result equal to a one-shot assignment over the union). `onUpdate`
    * receives each generation as a lazy view — valid until one trigger
    * after the next compaction (the serving-swap grace; see
    * [[graft.pipeline.IndexSegments]]); hand it to [[ivfTopKWriter]]'s
    * nightly refresh. For crash recovery use
    * [[ivfAppendWriterRecoverable]] — a bare restart replays
    * unacknowledged source batches and a replayed append duplicates
    * rows. Re-fit on drift stays a deliberate separate event
    * ([[AnnSearch.fitIndex]] + full rebuild), exactly as in the batch
    * lifecycle. */
  def ivfAppendWriter(embStream: DataFrame, initial: DataFrame,
                      vecCol: String, idCol: String, dim: Int,
                      centroids: Array[Double], compactEvery: Int = 16)
                     (onUpdate: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val state = new graft.pipeline.IvfSegmentState(initial, vecCol, idCol,
      dim, centroids, compactEvery)
    embStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onUpdate(state.fold(batch), batchId)
    }
  }

  /** CRASH-RECOVERABLE [[ivfAppendWriter]]: segments live as
    * batchId-keyed parquet directories under `indexPath`
    * ([[graft.pipeline.DurableIvfSegmentState]]) — the fold survives JVM
    * death, and a replayed batch after restart is recognized by
    * `batchId <= highWater` and skipped, so no postings row ever
    * duplicates (RecoverableWriterSpec). `initial` bootstraps an empty
    * store and is not evaluated on reopen. Same `checkpointLocation`
    * across restarts, as with any stateful sink. */
  def ivfAppendWriterRecoverable(embStream: DataFrame, indexPath: String,
                                 vecCol: String, idCol: String, dim: Int,
                                 centroids: Array[Double],
                                 initial: => DataFrame,
                                 compactEvery: Int = 16)
                                (onUpdate: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val state = graft.pipeline.DurableIvfSegmentState.openOrCreate(
      embStream.sparkSession, indexPath, vecCol, idCol, dim, centroids,
      initial, compactEvery)
    embStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      onUpdate(state.fold(batch, batchId), batchId)
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
  /** DRIFT MONITOR on ingest — the streaming half of the refit-on-drift
    * policy ([[graft.pipeline.AnnSearch.refitOnDrift]]): each
    * micro-batch folds its quantized centroid aggregates
    * ([[graft.pipeline.Embeddings.centroidAggregates]]) into bounded
    * driver state (groups × dims longs; EXACT integer merge, so the
    * accumulated state equals one batch aggregate over every row seen),
    * and each trigger emits the exact
    * [[graft.pipeline.Embeddings.centroidDrift]] of the accumulated
    * stream corpus against the FROZEN `baseline` — the corpus the
    * serving quantizer was fitted on. Per-trigger cost: one O(batch)
    * aggregate + a groups×dims-row join; nothing rescans. When a
    * group's `l2_move` crosses your tau, schedule
    * [[graft.pipeline.AnnSearch.refitOnDrift]] from the maintenance
    * job — the refit stays a deliberate separate event, exactly as in
    * the batch lifecycle (this writer is the trigger, never the
    * rebuild). State is exceeded-capacity-guarded: more than
    * `maxGroupDims` accumulated (group, dim) aggregate rows is a hard
    * error, not silent truncation (a drift monitor that silently drops
    * groups reports "no drift" for exactly the groups that changed).
    * AnnStreamSpec pins stream == batch: the drift emitted after N
    * batches equals `centroidDrift(baseline, union of the N batches)`
    * bit-for-bit. Replayed batches (same source checkpoint, in-JVM
    * restart) are skipped by a high-water check — but THIS variant's
    * state lives in driver memory only, so a PROCESS restart starts the
    * accumulation over; on a checkpointed production stream use
    * [[centroidDriftWriterRecoverable]], which persists the bounded
    * aggregate state per batch and reloads it on open. */
  /** Shared accumulator behind the drift writers: the (group..., dim) ->
    * (n, quantized sum) map, its replay high-water, and the capacity
    * guard. Replays (batchId <= highWater) are skipped, so an in-JVM
    * writer restart over the same source checkpoint never double-folds;
    * the capacity check runs AFTER the fold so the documented bound is
    * enforced on the state that actually exists (at most one batch of
    * overshoot is resident when it fires). */
  private final class DriftAccumulator(keyLen: Int, maxGroupDims: Int,
                                       writerName: String) {
    val state = scala.collection.mutable.HashMap.empty[Seq[Any], (Long, Long)]
    var highWater: Long = -1L
    /** @return true if the batch was folded, false for a replay */
    def fold(rows: Array[Row], batchId: Long): Boolean = {
      if (batchId <= highWater) return false
      rows.foreach { r =>
        val k = (0 until keyLen).map(r.get)
        val (n0, s0) = state.getOrElse(k, (0L, 0L))
        state(k) = (n0 + r.getAs[Long]("n_vectors"), s0 + r.getAs[Long]("__sum"))
      }
      highWater = batchId
      require(state.size <= maxGroupDims,
        s"$writerName: accumulated (group, dim) aggregates " +
          s"(${state.size}) exceed maxGroupDims=$maxGroupDims — a silently " +
          "truncated monitor would report no drift for the dropped groups; " +
          "raise the cap or coarsen the grouping")
      true
    }
    def accRows: Seq[Row] = state.toSeq.map { case (k, (n, s)) =>
      Row.fromSeq(k ++ Seq(n, s)) }
  }

  def centroidDriftWriter(embStream: DataFrame, baseline: DataFrame,
                          groupCols: Seq[String], vecCol: String,
                          quantScale: Double = 1e6,
                          maxGroupDims: Int = 1_000_000)
                         (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    driftWriterImpl(embStream, baseline, groupCols, vecCol, quantScale,
      maxGroupDims, persistTo = None)(sink)

  /** CRASH-RECOVERABLE [[centroidDriftWriter]]: the accumulated
    * aggregates persist under `statePath` keyed by micro-batch id
    * (`state_<batchId>/agg` parquet + the engine's commit marker,
    * [[graft.pipeline.DurableIndex.commit]]), so the monitor survives
    * JVM death — on restart the highest complete state reloads,
    * replayed batches are skipped by the high-water check, and the
    * emitted drift still covers EVERY row the stream ever delivered.
    * The plain [[centroidDriftWriter]] keeps its state in driver memory
    * only: correct across in-JVM restarts (same high-water skip) but a
    * process restart starts the accumulation over, which on a
    * checkpointed production stream silently shrinks the monitored
    * corpus — use this variant there. Per-trigger durable cost is one
    * groups×dims parquet write (the whole state is bounded by
    * `maxGroupDims` rows; superseded state dirs are deleted after the
    * new one commits). */
  def centroidDriftWriterRecoverable(embStream: DataFrame, baseline: DataFrame,
                                     groupCols: Seq[String], vecCol: String,
                                     statePath: String,
                                     quantScale: Double = 1e6,
                                     maxGroupDims: Int = 1_000_000)
                                    (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    driftWriterImpl(embStream, baseline, groupCols, vecCol, quantScale,
      maxGroupDims, persistTo = Some(statePath))(sink)

  private def driftWriterImpl(embStream: DataFrame, baseline: DataFrame,
                              groupCols: Seq[String], vecCol: String,
                              quantScale: Double, maxGroupDims: Int,
                              persistTo: Option[String])
                             (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import graft.pipeline.{DurableIndex, Embeddings}
    val spark = baseline.sparkSession
    val baseCents = Embeddings.centroids(baseline, groupCols, vecCol, quantScale)
      .localCheckpoint()
    // aggregate-row schema fixed up front (from the baseline's shape) so
    // an empty first batch still emits a well-typed (empty) drift frame
    val aggSchema = Embeddings.centroidAggregates(
      baseline.limit(0), groupCols, vecCol, quantScale).schema
    val acc = new DriftAccumulator(groupCols.length + 1, maxGroupDims,
      if (persistTo.isDefined) "centroidDriftWriterRecoverable"
      else "centroidDriftWriter")

    val store = persistTo.map { path =>
      val (fs, root) = DurableIndex.qualified(spark, path)
      // resolve: keep the highest COMPLETE state dir, sweep crash debris
      val dirs = DurableIndex.listDirs(fs, root, "state_")
      val complete = dirs.filter(DurableIndex.isComplete(fs, _))
      dirs.filterNot(complete.contains).foreach(fs.delete(_, true))
      if (complete.nonEmpty) {
        val live = complete.maxBy(_.getName.stripPrefix("state_").toLong)
        complete.filterNot(_ == live).foreach(fs.delete(_, true))
        acc.highWater = live.getName.stripPrefix("state_").toLong
        spark.read.parquet(
            new org.apache.hadoop.fs.Path(live, "agg").toString)
          .collect().foreach { r =>
            acc.state((0 until groupCols.length + 1).map(r.get)) =
              (r.getAs[Long]("n_vectors"), r.getAs[Long]("__sum"))
          }
      }
      (fs, root)
    }

    embStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val rows = Embeddings.centroidAggregates(batch, groupCols, vecCol, quantScale)
        .limit(maxGroupDims + 1).collect()
      val folded = acc.fold(rows, batchId)
      if (folded) store.foreach { case (fs, root) =>
        val dir = new org.apache.hadoop.fs.Path(root, s"state_$batchId")
        spark.createDataFrame(
            spark.sparkContext.parallelize(acc.accRows, 1), aggSchema)
          .write.mode("overwrite")
          .parquet(new org.apache.hadoop.fs.Path(dir, "agg").toString)
        DurableIndex.commit(fs, dir)
        // superseded states deleted only after the new one committed
        DurableIndex.listDirs(fs, root, "state_")
          .filterNot(_ == dir).foreach(fs.delete(_, true))
      }
      val accDf = Embeddings.centroidsFromAggregates(
        spark.createDataFrame(
          spark.sparkContext.parallelize(acc.accRows, 1), aggSchema),
        quantScale)
      sink(Embeddings.driftFromCentroids(baseCents, accDf, groupCols, quantScale),
        batchId)
    }
  }

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

  /** [[semanticNearDupWriter]] against a SAVED
    * [[graft.pipeline.Dedup.saveSemDedupState]] store: per-trigger corpus
    * I/O reads only the batch's touched `cell=N/` directories instead of
    * localCheckpoint-ing the whole state frame into executor memory —
    * the production shape when the corpus outgrows the cache (the
    * [[graft.streaming.DocStreams.minhashNearDupWriterStored]] contract:
    * the store handle resolves its live generation at writer BUILD time;
    * after a nightly refresh, restart the writer to pick up the new
    * generation). Centroids/dim/nCells come from the store's metadata. */
  def semanticNearDupWriterStored(stream: DataFrame, statePath: String,
                                  vecCol: String, idCol: String,
                                  threshold: Double,
                                  maxCellPairs: Long = 4_000_000L)
                                 (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val stored = graft.pipeline.Dedup.loadSemDedupState(
      stream.sparkSession, statePath)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.util.MatchScope.withMatchScope {
        sink(graft.pipeline.Dedup.semDedupPairsAgainstStored(
          batch, vecCol, idCol, stored, threshold, maxCellPairs), batchId)
      }
    }
  }
}
