package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, RESTART-IDEMPOTENT segment stores for the streaming
  * index-append writers — the crash-recovery half of
  * [[IndexSegments]]: segments live as parquet directories keyed by the
  * micro-batch id that produced them, so the fold survives JVM death and
  * a REPLAYED batch (Structured Streaming re-delivers any batch whose
  * foreachBatch didn't return before the crash) is detected by its id
  * and skipped instead of double-counted — the "persist the index with
  * its high-water batchId" contract the in-memory writers document,
  * shipped ([[graft.streaming.RetrievalStream.bm25AppendWriterRecoverable]]
  * / [[graft.streaming.AnnStream.ivfAppendWriterRecoverable]];
  * RecoverableWriterSpec kills a stream mid-fold and pins the restarted
  * result equal to a clean one-shot build).
  *
  * Layout under `path`:
  * {{{
  *   epoch=E/base/...            compacted through base.meta.high_water
  *   epoch=E/delta_<batchId>/... one O(batch) segment per folded trigger
  * }}}
  * Each directory is immutable once written; the segment's `meta` table
  * is written after the data files, and the engine's OWN
  * `_graft_commit` marker after meta — so the marker means COMPLETE
  * regardless of whether the deployment disabled parquet `_SUCCESS`
  * files (see [[isComplete]]). Compaction
  * writes `epoch=E+1/base` from the current view, then deletes epoch E
  * — one trigger later (the same serving-swap grace as the in-memory
  * states). Every crash window is covered at open():
  *
  *  - crash mid-segment-write → dir lacks `meta/_SUCCESS` → deleted,
  *    the stream checkpoint replays the batch (it never committed);
  *  - crash after segment write, before stream commit → replay arrives
  *    with `batchId <= highWater` → fold skipped, nothing double-counts;
  *  - crash between new-base commit and old-epoch delete → two complete
  *    epochs → the HIGHEST wins, lower ones deleted.
  *
  * Per-trigger durable cost is O(batch) parquet writes (compaction:
  * O(index), amortized 1/compactEvery) — and unlike the in-memory
  * states nothing here holds executor blocks at all: views read the
  * immutable segment files, which IS the fault-tolerant storage (the
  * Reliable-checkpoint analogue for index state). */
object DurableIndex {

  private[graft] def qualified(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  /** A segment directory is complete iff its OWN commit marker exists —
    * written by [[commit]] strictly after the meta table, which is
    * itself written last of the data files. The engine's own marker
    * (not parquet's `_SUCCESS`) on purpose: deployments commonly
    * disable success files
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`), and a
    * completeness probe that silently returns false for every
    * fully-written epoch would make [[resolve]] wipe a healthy store.
    * Legacy stores written before the marker existed are recognized by
    * their `meta/_SUCCESS`. */
  private[graft] def isComplete(fs: FileSystem, segDir: Path): Boolean =
    fs.exists(new Path(segDir, "_graft_commit")) ||
      fs.exists(new Path(segDir, "meta/_SUCCESS"))

  /** Mark `segDir` complete (write LAST, after every data file). */
  private[graft] def commit(fs: FileSystem, segDir: Path): Unit =
    fs.create(new Path(segDir, "_graft_commit"), true).close()

  private[graft] def listDirs(fs: FileSystem, dir: Path, prefix: String): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(prefix))

  private[pipeline] def epochId(p: Path): Long = p.getName.stripPrefix("epoch=").toLong
  private[pipeline] def deltaId(p: Path): Long = p.getName.stripPrefix("delta_").toLong

  /** Resolve the store to its single live epoch: pick the highest
    * COMPLETE epoch, delete every other epoch dir (lower = superseded by
    * a compaction whose cleanup didn't finish; incomplete higher = a
    * compaction that died mid-write), delete incomplete delta dirs, and
    * return (epoch dir, complete delta dirs sorted by batch id) — or
    * None for an empty/uninitialized store. */
  private[pipeline] def resolve(fs: FileSystem, root: Path): Option[(Path, Seq[Path])] = {
    val epochs = listDirs(fs, root, "epoch=")
    val complete = epochs.filter(e => isComplete(fs, new Path(e, "base")))
    if (complete.isEmpty) {
      epochs.foreach(fs.delete(_, true)) // nothing usable — clean slate
      None
    } else {
      val live = complete.maxBy(epochId)
      epochs.filterNot(_ == live).foreach(fs.delete(_, true))
      val (good, bad) = listDirs(fs, live, "delta_").partition(isComplete(fs, _))
      bad.foreach(fs.delete(_, true))
      Some((live, good.sortBy(deltaId)))
    }
  }
}

/** Durable BM25 segment store (see [[DurableIndex]]). Construct via
  * [[DurableBm25SegmentState.openOrCreate]]; drive with [[fold]] from a
  * foreachBatch (or a nightly driver loop — batchIds just have to be
  * monotone and stable under replay). Ungated indexes only. */
final class DurableBm25SegmentState private (
    spark: SparkSession, fs: FileSystem, root: Path,
    textCol: String, idCol: String, k1: Double, b: Double,
    compactEvery: Int) {
  require(compactEvery >= 1, s"compactEvery must be >= 1 (got $compactEvery)")
  import IndexSegments.Bm25Segment

  private var epoch: Long = _
  private var baseSeg: Bm25Segment = _
  private var baseHighWater: Long = _
  private var deltas: Vector[(Long, Bm25Segment)] = Vector.empty
  private var deferredDelete: Option[Path] = None

  /** Highest batch id folded into durable state; replays at or below it
    * are skipped. -1 on a freshly bootstrapped store. */
  def highWater: Long = synchronized(
    (baseHighWater +: deltas.map(_._1)).max)

  def deltaCount: Int = synchronized(deltas.size)

  private def loadSegment(dir: Path): (Long, Bm25Segment) = {
    val m = spark.read.parquet(new Path(dir, "meta").toString).head()
    (m.getAs[Long]("batch_id"),
      Bm25Segment(spark.read.parquet(new Path(dir, "rows").toString),
        spark.read.parquet(new Path(dir, "df").toString),
        m.getAs[Long]("n_docs"), m.getAs[Long]("total_tokens")))
  }

  /** Write one segment dir: rows, df, meta, then the commit marker LAST
    * ([[DurableIndex.commit]] — the completeness probe [[DurableIndex
    * .isComplete]] reads). Returns the parquet-backed reload. */
  private def writeSegment(dir: Path, seg: Bm25Segment, batchId: Long): Bm25Segment = {
    seg.rows.write.mode("overwrite").parquet(new Path(dir, "rows").toString)
    seg.df.write.mode("overwrite").parquet(new Path(dir, "df").toString)
    import spark.implicits._
    Seq((idCol, seg.nDocs, seg.totalTokens, k1, b, batchId))
      .toDF("id_col", "n_docs", "total_tokens", "k1", "b", "batch_id")
      .coalesce(1).write.mode("overwrite").parquet(new Path(dir, "meta").toString)
    DurableIndex.commit(fs, dir)
    loadSegment(dir)._2
  }

  private[pipeline] def init(resolved: Option[(Path, Seq[Path])],
                             initial: => TextAnalysis.Bm25Index): Unit =
    resolved match {
      case Some((live, deltaDirs)) =>
        epoch = DurableIndex.epochId(live)
        val (hw, seg) = loadSegment(new Path(live, "base"))
        baseHighWater = hw
        baseSeg = seg
        deltas = deltaDirs.map(loadSegment).toVector
      case None =>
        epoch = 0L
        baseHighWater = -1L
        val ix = initial
        // one O(index) bootstrap write, then released — durable state
        // never holds executor blocks
        val seg = IndexSegments.bm25SegmentFromIndex(ix)
        baseSeg = writeSegment(new Path(root, "epoch=0/base"), seg, -1L)
        IndexSegments.releaseBm25(seg)
    }

  /** Fold one document batch under its micro-batch id. Replays
    * (batchId <= [[highWater]]) return the current view untouched —
    * the restart-idempotency contract. */
  def fold(batch: DataFrame, batchId: Long): TextAnalysis.Bm25Index = synchronized {
    deferredDelete.foreach(fs.delete(_, true))
    deferredDelete = None
    if (batchId <= highWater) return view
    val mem = IndexSegments.bm25Segment(batch, textCol, idCol)
    val dir = new Path(root, s"epoch=$epoch/delta_$batchId")
    deltas = deltas :+ ((batchId, writeSegment(dir, mem, batchId)))
    IndexSegments.releaseBm25(mem)
    if (deltas.size >= compactEvery) compact(batchId)
    view
  }

  /** Fold every segment into the next epoch's base, then schedule the
    * old epoch's deletion for the next fold (serving-swap grace). */
  private def compact(throughBatch: Long): Unit = {
    val segs = baseSeg +: deltas.map(_._2)
    val rowsAll = segs.map(_.rows).reduce(_.unionByName(_))
    val dfAll = segs.map(_.df).reduce(_.unionByName(_))
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val merged = Bm25Segment(rowsAll, dfAll,
      segs.map(_.nDocs).sum, segs.map(_.totalTokens).sum)
    val oldDir = new Path(root, s"epoch=$epoch")
    epoch += 1
    baseSeg = writeSegment(new Path(root, s"epoch=$epoch/base"), merged, throughBatch)
    baseHighWater = throughBatch
    deltas = Vector.empty
    deferredDelete = Some(oldDir)
  }

  /** The served index: base + deltas merged through
    * [[IndexSegments.bm25View]], every frame parquet-backed. Valid until
    * one fold after the next compaction deletes its epoch. */
  def view: TextAnalysis.Bm25Index = synchronized(
    IndexSegments.bm25View(baseSeg +: deltas.map(_._2), idCol, k1, b))
}

object DurableBm25SegmentState {
  /** Open the store at `path`, or bootstrap it from `initial` (evaluated
    * only when the store is empty — pass the expensive build by name). */
  def openOrCreate(spark: SparkSession, path: String, textCol: String,
                   initial: => TextAnalysis.Bm25Index,
                   compactEvery: Int = 16): DurableBm25SegmentState = {
    val (fs, root) = DurableIndex.qualified(spark, path)
    // resolve ONCE (it lists the store and sweeps crash debris) and hand
    // the result to init — a second resolve would re-list the whole
    // store, a real cost on object stores
    val resolved = DurableIndex.resolve(fs, root)
    // evaluated at most once, shared between the param probe and init
    lazy val boot = initial
    // idCol/k1/b: from the live store's base meta when present, else
    // from the bootstrap index
    val (idCol, k1, b) = resolved match {
      case Some((live, _)) =>
        val m = spark.read.parquet(new Path(live, "base/meta").toString).head()
        (m.getAs[String]("id_col"), m.getAs[Double]("k1"), m.getAs[Double]("b"))
      case None =>
        (boot.idCol, boot.k1, boot.b)
    }
    val st = new DurableBm25SegmentState(spark, fs, root, textCol, idCol, k1, b, compactEvery)
    st.init(resolved, boot)
    st
  }
}

/** Durable IVF postings segment store — the vector twin of
  * [[DurableBm25SegmentState]] (see [[DurableIndex]] for the layout and
  * crash matrix). Simpler because postings rows are independent facts
  * under the frozen quantizer: a segment is one postings table, the view
  * is their union, compaction one union rewrite. */
final class DurableIvfSegmentState private (
    spark: SparkSession, fs: FileSystem, root: Path,
    vecCol: String, idCol: String, dim: Int, centroids: Array[Double],
    compactEvery: Int) {
  require(compactEvery >= 1, s"compactEvery must be >= 1 (got $compactEvery)")

  private var epoch: Long = _
  private var basePostings: DataFrame = _
  private var baseHighWater: Long = _
  private var deltas: Vector[(Long, DataFrame)] = Vector.empty
  private var deferredDelete: Option[Path] = None

  def highWater: Long = synchronized((baseHighWater +: deltas.map(_._1)).max)
  def deltaCount: Int = synchronized(deltas.size)

  private def loadSegment(dir: Path): (Long, DataFrame) = {
    val m = spark.read.parquet(new Path(dir, "meta").toString).head()
    (m.getAs[Long]("batch_id"),
      spark.read.parquet(new Path(dir, "postings").toString))
  }

  /** Quantizer identity — [[java.util.Arrays.hashCode]] over the
    * flattened centroids (spec-defined over doubleToLongBits, so stable
    * across JVMs). Persisted in every segment meta and REQUIRED to match
    * on reopen: postings cells are only meaningful under the quantizer
    * that assigned them, and reopening a store with different centroids
    * (e.g. after a [[AnnSearch.refitOnDrift]] swap, against the
    * pre-refit store path) would silently mix two quantizers' cell
    * spaces — wrong-cell probing, unbounded recall loss, no error. */
  private val centroidHash: Int = java.util.Arrays.hashCode(centroids)

  private def writeSegment(dir: Path, postings: DataFrame, batchId: Long): DataFrame = {
    postings.write.mode("overwrite").parquet(new Path(dir, "postings").toString)
    import spark.implicits._
    Seq((batchId, dim, centroidHash)).toDF("batch_id", "dim", "centroid_hash")
      .coalesce(1).write.mode("overwrite").parquet(new Path(dir, "meta").toString)
    DurableIndex.commit(fs, dir)
    loadSegment(dir)._2
  }

  private[pipeline] def init(resolved: Option[(Path, Seq[Path])],
                             initial: => DataFrame): Unit =
    resolved match {
      case Some((live, deltaDirs)) =>
        epoch = DurableIndex.epochId(live)
        val base = new Path(live, "base")
        val m = spark.read.parquet(new Path(base, "meta").toString).head()
        if (m.schema.fieldNames.contains("centroid_hash"))
          require(m.getAs[Int]("dim") == dim &&
              m.getAs[Int]("centroid_hash") == centroidHash,
            s"durable IVF store at $root was written under a DIFFERENT " +
              s"quantizer (stored dim=${m.getAs[Int]("dim")}, " +
              s"hash=${m.getAs[Int]("centroid_hash")}; caller dim=$dim, " +
              s"hash=$centroidHash). After a quantizer refit, rebuild " +
              "into a NEW store path — existing postings' cell " +
              "assignments are only valid under the centroids that made them")
        baseHighWater = m.getAs[Long]("batch_id")
        basePostings = spark.read.parquet(new Path(base, "postings").toString)
        deltas = deltaDirs.map(loadSegment).toVector
      case None =>
        epoch = 0L
        baseHighWater = -1L
        basePostings = writeSegment(new Path(root, "epoch=0/base"), initial, -1L)
    }

  /** Fold one embedding batch under its micro-batch id; replays are
    * skipped (restart idempotency). */
  def fold(batch: DataFrame, batchId: Long): DataFrame = synchronized {
    deferredDelete.foreach(fs.delete(_, true))
    deferredDelete = None
    if (batchId <= highWater) return view
    val dir = new Path(root, s"epoch=$epoch/delta_$batchId")
    deltas = deltas :+ ((batchId, writeSegment(dir,
      AnnSearch.ivfPostings(batch, vecCol, idCol, dim, centroids), batchId)))
    if (deltas.size >= compactEvery) {
      val merged = (basePostings +: deltas.map(_._2)).reduce(_.unionByName(_))
      val oldDir = new Path(root, s"epoch=$epoch")
      epoch += 1
      basePostings = writeSegment(new Path(root, s"epoch=$epoch/base"), merged, batchId)
      baseHighWater = batchId
      deltas = Vector.empty
      deferredDelete = Some(oldDir)
    }
    view
  }

  /** The served postings: union of parquet-backed segments. Valid until
    * one fold after the next compaction deletes its epoch. */
  def view: DataFrame = synchronized(
    (basePostings +: deltas.map(_._2)).reduce(_.unionByName(_)))
}

object DurableIvfSegmentState {
  def openOrCreate(spark: SparkSession, path: String,
                   vecCol: String, idCol: String, dim: Int,
                   centroids: Array[Double], initial: => DataFrame,
                   compactEvery: Int = 16): DurableIvfSegmentState = {
    val (fs, root) = DurableIndex.qualified(spark, path)
    val st = new DurableIvfSegmentState(spark, fs, root, vecCol, idCol, dim,
      centroids, compactEvery)
    st.init(DurableIndex.resolve(fs, root), initial)
    st
  }
}
