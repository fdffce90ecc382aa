package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Materialize

/** Base + bounded delta segments for the streaming index-append writers
  * — the LSM restatement of [[TextAnalysis.bm25Append]] /
  * [[AnnSearch.ivfAppendPostings]].
  *
  * The flat append operators are the right shape for a NIGHTLY fold (one
  * batch, then many searches amortize the O(index) re-materialization),
  * but a continuous ingest stream calling them per trigger pays O(index)
  * wall per micro-batch and leaves every superseded generation's blocks
  * to driver GC (measured at sf10: a bm25Append fold in the all-tokens-
  * touched regime costs about as much as a full rebuild — SCALE.md "BM25
  * append vs rebuild"). The segmented state machines here restore the
  * cost a log-structured index gives:
  *
  *  - each trigger materializes ONE O(batch) delta segment;
  *  - the served index is a lazy view over ≤ compactEvery+1 checkpointed
  *    segments (union + a per-token df merge for BM25 — segment-local
  *    statistics compose exactly, see [[Bm25Segment]]);
  *  - every compactEvery deltas the segments fold into one base segment
  *    (the only O(index) step — amortized 1/compactEvery per trigger);
  *  - superseded segments are EXPLICITLY released
  *    ([[Materialize.release]]) `graceTriggers` triggers after the
  *    compaction that replaced them (default 1), so live
  *    checkpointed-RDD count is bounded by
  *    ~2·(compactEvery+1)·(graceTriggers+1) forever ([[graft.pipeline]]
  *    IndexSegmentsSpec pins this across thousands of folds,
  *    negative-tested against the flat-append shape).
  *
  * Generation validity contract: the frame/index a fold returns stays
  * readable until `graceTriggers` TRIGGERS AFTER the first compaction
  * that supersedes its segments — a serving thread gets that many full
  * trigger intervals to adopt the newer generation before the old one's
  * blocks die (size `graceTriggers` to the slowest reader in a
  * multi-reader deployment; a reader holding a generation PAST the
  * window fails loudly on released blocks, never silently-wrong).
  * Holding generations longer than that is the one thing the old
  * GC-based retention allowed that this does not (and is exactly the
  * unbounded-memory behavior it existed to remove).
  */
object IndexSegments {

  /** One BM25 index segment: the postings rows of the documents that
    * arrived in this segment's batches, WITHOUT the global df column —
    * `(idCol, token, tf, dl)` — plus this segment's own per-token
    * document frequency `(token, df)` and its two scalar contributions.
    *
    * Why this decomposition composes exactly: tf and dl are per-document
    * facts (each document lives in exactly one segment — batch ids are
    * disjoint from indexed ids, the same contract as
    * [[TextAnalysis.bm25Append]]), and df / nDocs / totalTokens are pure
    * SUMS of segment-local counts, so the merged view's arithmetic is
    * bit-identical to a [[TextAnalysis.bm25Index]] built over the unioned
    * corpus (spec-pinned, scores and all). The flat append operator has
    * to rewrite old rows because it stores df DENORMALIZED onto every
    * posting; keeping df in its own frame is what makes the delta
    * O(batch). Segments must be UNGATED (no maxDf), like every
    * incremental BM25 mutation (TUNING.md §3e).
    *
    * `totalTokens` here is the RAW token sum (0 for an empty segment) —
    * the finiteness clamp the flat index applies lands once, in the
    * merged view. */
  final case class Bm25Segment(rows: DataFrame, df: DataFrame,
                               nDocs: Long, totalTokens: Long)

  /** Build one segment from a document batch: the [[TextAnalysis.bm25Index]]
    * corpus pass with the df join SKIPPED — two O(batch) checkpoints
    * (rows, per-token df); the transient tf/dl barriers are released
    * before returning, so a segment holds exactly two checkpointed
    * frames. */
  def bm25Segment(batch: DataFrame, textCol: String, idCol: String): Bm25Segment = {
    val (tf, dl, docFreq, nDocs, totTok) =
      TextAnalysis.bm25Corpus(batch, textCol, idCol, Long.MaxValue, _.localCheckpoint())
    val rows = tf.join(dl, Seq(idCol)).localCheckpoint()
    val df = docFreq.localCheckpoint()
    Materialize.release(tf)
    Materialize.release(dl)
    // bm25Corpus clamps an empty corpus's token sum to 1 (build-path
    // finiteness guard); a segment carries the raw 0 and the view clamps
    Bm25Segment(rows, df, nDocs, if (nDocs == 0) 0L else totTok)
  }

  /** Convert a flat [[TextAnalysis.Bm25Index]] into a base segment: one
    * O(index) copy (rows without df, distinct per-token df), paid ONCE at
    * stream start — after which the stream never re-materializes the
    * base until its compaction turn. The copy (rather than wrapping the
    * caller's postings lazily) is what makes segment ownership uniform:
    * everything in the state machine is release-able without touching
    * the caller's frame. Ungated indexes only. */
  def bm25SegmentFromIndex(ix: TextAnalysis.Bm25Index): Bm25Segment = {
    val rows = ix.postings
      .select(col(ix.idCol), col("token"), col("tf"), col("dl"))
      .localCheckpoint()
    val df = ix.postings.select(col("token"), col("df")).distinct().localCheckpoint()
    Bm25Segment(rows, df, ix.nDocs, if (ix.nDocs == 0) 0L else ix.totalTokens)
  }

  /** The merged read view: postings = union of segment rows joined with
    * the per-token df SUM across segments. With a single (compacted or
    * base-only) segment the df merge is skipped — segment df frames are
    * per-token unique by construction, so the view then costs exactly
    * what the flat index's search costs; between compactions a search
    * additionally pays one aggregate over ≤ compactEvery+1 segment
    * vocabularies (the classic LSM read amplification, bounded by
    * `compactEvery`). */
  def bm25View(segments: Seq[Bm25Segment], idCol: String,
               k1: Double, b: Double): TextAnalysis.Bm25Index = {
    require(segments.nonEmpty, "bm25View needs at least one segment")
    val rowsAll = segments.map(_.rows).reduce(_.unionByName(_))
    val dfAll =
      if (segments.sizeIs == 1) segments.head.df
      else segments.map(_.df).reduce(_.unionByName(_))
        .groupBy(col("token")).agg(sum(col("df")).as("df"))
    TextAnalysis.Bm25Index(rowsAll.join(dfAll, Seq("token")), idCol,
      segments.map(_.nDocs).sum,
      math.max(segments.map(_.totalTokens).sum, 1L), k1, b)
  }

  /** Fold a segment list into one segment: the single O(index) step of
    * the lifecycle. The inputs' blocks are still LIVE when this returns
    * (they fed the compaction and may be serving an older generation) —
    * the caller releases them once the new generation is adopted. */
  def bm25Compact(segments: Seq[Bm25Segment]): Bm25Segment = {
    require(segments.nonEmpty, "bm25Compact needs at least one segment")
    val rowsAll = segments.map(_.rows).reduce(_.unionByName(_)).localCheckpoint()
    val dfAll = segments.map(_.df).reduce(_.unionByName(_))
      .groupBy(col("token")).agg(sum(col("df")).as("df")).localCheckpoint()
    Bm25Segment(rowsAll, dfAll, segments.map(_.nDocs).sum,
      segments.map(_.totalTokens).sum)
  }

  def releaseBm25(segment: Bm25Segment): Unit = {
    Materialize.release(segment.rows)
    Materialize.release(segment.df)
  }
}

/** Driver-side segmented-index state machine behind
  * [[graft.streaming.RetrievalStream.bm25AppendWriter]] — separable from
  * the stream so batch callers (a nightly driver loop) and specs can
  * drive thousands of folds directly. Thread-safe: folds serialize on
  * the state (foreachBatch already does), [[view]] may be read
  * concurrently. */
final class Bm25SegmentState(initial: TextAnalysis.Bm25Index, textCol: String,
                             compactEvery: Int = 16,
                             graceTriggers: Int = 1) {
  require(compactEvery >= 1, s"compactEvery must be >= 1 (got $compactEvery)")
  require(graceTriggers >= 1, s"graceTriggers must be >= 1 (got $graceTriggers)")
  import IndexSegments._

  private var segs: Vector[Bm25Segment] = Vector(bm25SegmentFromIndex(initial))
  /** Superseded generations awaiting release: (foldNumberSuperseded, segs).
    * A generation superseded at fold N is released at fold
    * N + `graceTriggers` — a serving thread gets `graceTriggers` full
    * trigger intervals to adopt a newer generation; a view held LONGER
    * fails loudly on released blocks, never silently-wrong. */
  private var deferred: Vector[(Long, Vector[Bm25Segment])] = Vector.empty
  private var folds: Long = 0L

  /** Fold one document batch: release generations superseded
    * `graceTriggers` folds ago, checkpoint one O(batch) delta, compact
    * if `compactEvery` deltas have accumulated. Returns the new
    * generation's index view. */
  def fold(batch: DataFrame): TextAnalysis.Bm25Index = synchronized {
    folds += 1
    val (expired, kept) = deferred.partition(_._1 + graceTriggers <= folds)
    expired.foreach(_._2.foreach(releaseBm25))
    deferred = kept
    segs = segs :+ bm25Segment(batch, textCol, initial.idCol)
    if (segs.size > compactEvery) {
      val compacted = bm25Compact(segs)
      deferred = deferred :+ (folds -> segs)
      segs = Vector(compacted)
    }
    view
  }

  def view: TextAnalysis.Bm25Index = synchronized(
    bm25View(segs, initial.idCol, initial.k1, initial.b))

  /** Live segment count (base + pending deltas), visible for specs. */
  def segmentCount: Int = synchronized(segs.size)

  /** Checkpointed frames currently held (live + deferred-release) —
    * bounded by 2·(compactEvery+1)·(graceTriggers+1) by construction. */
  def barrierCount: Int = synchronized(
    2 * (segs.size + deferred.map(_._2.size).sum))

  /** Release everything (end of stream). The last generation's view dies
    * with it — callers that keep serving after the stream stops simply
    * don't close, and hold the documented O(index + compactEvery·batch)
    * bounded footprint instead. */
  def close(): Unit = synchronized {
    (deferred.flatMap(_._2) ++ segs).foreach(releaseBm25)
    deferred = Vector.empty
    segs = Vector.empty
  }
}

/** The IVF twin of [[Bm25SegmentState]], simpler because postings rows
  * are independent facts under a frozen quantizer (no cross-segment
  * statistic to merge — [[AnnSearch.ivfForgetPostings]] makes the same
  * observation): a segment is just a checkpointed postings frame, the
  * view is their union, compaction is one union-checkpoint. */
final class IvfSegmentState(initial: DataFrame, vecCol: String, idCol: String,
                            dim: Int, centroids: Array[Double],
                            compactEvery: Int = 16,
                            graceTriggers: Int = 1) {
  require(compactEvery >= 1, s"compactEvery must be >= 1 (got $compactEvery)")
  require(graceTriggers >= 1, s"graceTriggers must be >= 1 (got $graceTriggers)")

  private var segs: Vector[DataFrame] = Vector(initial.localCheckpoint())
  private var deferred: Vector[(Long, Vector[DataFrame])] = Vector.empty
  private var folds: Long = 0L

  /** Fold one embedding batch: O(batch) assignment + checkpoint; compact
    * every `compactEvery` deltas; `graceTriggers`-fold deferred release,
    * exactly as [[Bm25SegmentState.fold]]. Returns the new generation's
    * postings view. */
  def fold(batch: DataFrame): DataFrame = synchronized {
    folds += 1
    val (expired, kept) = deferred.partition(_._1 + graceTriggers <= folds)
    expired.foreach(_._2.foreach(Materialize.release))
    deferred = kept
    segs = segs :+ AnnSearch.ivfPostings(batch, vecCol, idCol, dim, centroids)
      .localCheckpoint()
    if (segs.size > compactEvery) {
      val compacted = segs.reduce(_.unionByName(_)).localCheckpoint()
      deferred = deferred :+ (folds -> segs)
      segs = Vector(compacted)
    }
    view
  }

  def view: DataFrame = synchronized(segs.reduce(_.unionByName(_)))

  def segmentCount: Int = synchronized(segs.size)

  /** Checkpointed frames currently held (live + deferred-release). */
  def barrierCount: Int = synchronized(
    segs.size + deferred.map(_._2.size).sum)

  def close(): Unit = synchronized {
    (deferred.flatMap(_._2) ++ segs).foreach(Materialize.release)
    deferred = Vector.empty
    segs = Vector.empty
  }
}
