package graft.streaming

import graft.SparkSpec
import graft.pipeline.{AnnSearch, DurableIvfSegmentState, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash recovery for the durable index-append writers: a stream killed
  * MID-FOLD (segment durable, stream commit not) restarts from its
  * checkpoint, the replayed batch is skipped by the high-water check,
  * and the final index equals a clean one-shot build — no duplicated
  * statistics. Plus the crash-window cleanup matrix of
  * [[graft.pipeline.DurableIndex]].
  */
class RecoverableWriterSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** One pinned-order parquet file per micro-batch. */
  private def stage(batches: Seq[org.apache.spark.sql.DataFrame],
                    name: String): java.nio.file.Path = {
    val flat = java.nio.file.Files.createTempDirectory(name)
    batches.zipWithIndex.foreach { case (b, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"$name$i")
      b.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    flat
  }

  test("bm25AppendWriterRecoverable: kill mid-fold (after the segment " +
    "committed, before the stream did), restart from checkpoint — the " +
    "replayed batch is skipped and the result equals a clean build") {
    val arriving = docs.where($"doc_id" % 3 =!= 0).select($"doc_id", $"text")
    val flat = stage(Seq(arriving.where($"doc_id" % 3 === 1),
      arriving.where($"doc_id" % 3 === 2)), "rec_bm25")
    val ckpt = java.nio.file.Files.createTempDirectory("rec_bm25_ckpt").toString
    val ixPath = java.nio.file.Files.createTempDirectory("rec_bm25_ix").toString

    def stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    // run 1: the sink dies ON batch 1, AFTER the fold made the segment
    // durable but BEFORE foreachBatch returned — the stream checkpoint
    // never commits batch 1, so a restart must replay it.
    // compactEvery=2 makes that very fold also a compaction, so the
    // crash lands in the worst window: new epoch committed, old epoch's
    // deferred delete still pending.
    var bootstraps = 0
    val q1 = RetrievalStream.bm25AppendWriterRecoverable(stream, ixPath, "text",
      { bootstraps += 1
        TextAnalysis.bm25Index(docs.where($"doc_id" % 3 === 0), "text", "doc_id") },
      compactEvery = 2) { (_, batchId) =>
      if (batchId == 1) throw new RuntimeException("injected crash after fold")
    }.option("checkpointLocation", ckpt).start()
    val died = intercept[Exception] { q1.awaitTermination() }
    assert(died.getMessage.contains("injected crash")
      || died.getCause != null, s"expected the injected crash, got $died")
    assert(bootstraps == 1)

    // run 2: same checkpoint, same store — batch 1 is REPLAYED by the
    // source; the store recognizes it (batchId <= highWater) and must
    // not double-count. The bootstrap index must not be rebuilt either.
    @volatile var last: TextAnalysis.Bm25Index = null
    val replayed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = RetrievalStream.bm25AppendWriterRecoverable(stream, ixPath, "text",
      { bootstraps += 1; sys.error("store exists — bootstrap must not run") },
      compactEvery = 2) { (ix, batchId) =>
      replayed.synchronized { replayed += batchId }
      last = ix
    }.option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(bootstraps == 1, "reopen must not evaluate the bootstrap index")
    assert(replayed.contains(1L), s"batch 1 should have been replayed, got $replayed")

    val rebuilt = TextAnalysis.bm25Index(docs, "text", "doc_id")
    assert(last.nDocs == rebuilt.nDocs && last.totalTokens == rebuilt.totalTokens,
      s"scalars diverge: ${(last.nDocs, last.totalTokens)} vs " +
        s"${(rebuilt.nDocs, rebuilt.totalTokens)} — a double-counted replay?")
    def posting(p: org.apache.spark.sql.DataFrame) =
      p.select("doc_id", "token", "tf", "dl", "df")
        .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(posting(last.postings) == posting(rebuilt.postings),
      "recovered postings diverge from a clean one-shot build")
  }

  test("ivfAppendWriterRecoverable: restart after a clean stop picks up " +
    "new batches; the final postings equal a one-shot assignment") {
    val cents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 2))
    val arriving = emb.where($"vec_id" % 4 =!= 0).select($"vec_id", $"embedding")
    val twoBatches = Seq(arriving.where($"vec_id" % 4 === 1),
      arriving.where($"vec_id" % 4 === 2))
    val flat = stage(twoBatches, "rec_ivf")
    val ckpt = java.nio.file.Files.createTempDirectory("rec_ivf_ckpt").toString
    val ixPath = java.nio.file.Files.createTempDirectory("rec_ivf_ix").toString

    def start() = {
      val stream = spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", "1").parquet(flat.toString)
      AnnStream.ivfAppendWriterRecoverable(stream, ixPath, "embedding",
        "vec_id", 64, cents,
        AnnSearch.ivfPostings(emb.where($"vec_id" % 4 === 0), "embedding",
          "vec_id", 64, cents),
        compactEvery = 2) { (_, _) => () }
        .option("checkpointLocation", ckpt).start()
    }
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // a third batch arrives while the writer is DOWN (JVM restart)
    val extra = arriving.where($"vec_id" % 4 === 3)
    val part = java.nio.file.Files.createTempDirectory("rec_ivf3")
    extra.coalesce(1).write.mode("overwrite").parquet(part.toString)
    val src = java.nio.file.Files.list(part)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dst = flat.resolve("02.parquet")
    java.nio.file.Files.copy(src, dst)
    dst.toFile.setLastModified(1030000L)

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val state = DurableIvfSegmentState.openOrCreate(spark, ixPath,
      "embedding", "vec_id", 64, cents,
      sys.error("store exists — bootstrap must not run"))
    assert(state.highWater == 2L, s"expected batches 0..2 folded, got ${state.highWater}")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("corpus_id"), col("__cell"))
      .as[(Long, Int)].collect().toSet
    val rebuilt = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, cents)
    assert(key(state.view) == key(rebuilt),
      "restarted folds must equal a one-shot assignment over the union")
  }

  test("durable store replay + crash-window cleanup: a repeated batchId " +
    "is a no-op, incomplete segment dirs and stale epochs are swept at open") {
    val cents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 1))
    val ixPath = java.nio.file.Files.createTempDirectory("rec_state_ix").toString
    val b0 = emb.where($"vec_id" % 3 === 0).select($"vec_id", $"embedding")
    val b1 = emb.where($"vec_id" % 3 === 1).select($"vec_id", $"embedding")

    val st = DurableIvfSegmentState.openOrCreate(spark, ixPath,
      "embedding", "vec_id", 64, cents, b0.limit(0)
        .transform(d => AnnSearch.ivfPostings(d, "embedding", "vec_id", 64, cents)),
      compactEvery = 10)
    st.fold(b0, 0L)
    val afterFirst = st.view.count()
    // a REPLAY of batch 0 (same id, same rows) must not double anything
    st.fold(b0, 0L)
    assert(st.view.count() == afterFirst && st.highWater == 0L,
      "replayed batchId must be a no-op")
    st.fold(b1, 1L)
    val full = st.view.count()
    assert(full > afterFirst)

    // simulate two crash windows on disk: an epoch directory whose base
    // never committed (compaction died mid-write) and a delta directory
    // without its meta commit (fold died mid-write)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(ixPath))
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "epoch=99/base/rows"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "epoch=0/delta_7/postings"))

    val reopened = DurableIvfSegmentState.openOrCreate(spark, ixPath,
      "embedding", "vec_id", 64, cents,
      sys.error("store exists — bootstrap must not run"), compactEvery = 10)
    assert(reopened.highWater == 1L && reopened.view.count() == full,
      "reopen must restore exactly the committed folds")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "epoch=99")),
      "an uncommitted epoch must be swept at open")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "epoch=0/delta_7")),
      "an uncommitted delta must be swept at open")
  }

  test("durable store guards: completeness survives disabled _SUCCESS " +
    "files, and reopening under a different quantizer is a hard error") {
    val cents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 1))
    val ixPath = java.nio.file.Files.createTempDirectory("rec_guard_ix").toString
    val b0 = emb.where($"vec_id" % 3 === 0).select($"vec_id", $"embedding")
    val st = DurableIvfSegmentState.openOrCreate(spark, ixPath,
      "embedding", "vec_id", 64, cents,
      AnnSearch.ivfPostings(b0.limit(0), "embedding", "vec_id", 64, cents))
    st.fold(b0, 0L)
    val n = st.view.count()

    // many deployments disable parquet _SUCCESS files
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false); the
    // store's completeness probe must NOT depend on them, or resolve()
    // would classify every healthy epoch incomplete and wipe the store.
    // Simulate: delete every _SUCCESS under the store, reopen.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(ixPath))
    val it = fs.listFiles(root, true)
    val toDelete = Iterator.continually(it).takeWhile(_.hasNext)
      .map(_.next().getPath).filter(_.getName == "_SUCCESS").toList
    assert(toDelete.nonEmpty, "expected parquet _SUCCESS files to exist")
    toDelete.foreach(fs.delete(_, false))
    val reopened = DurableIvfSegmentState.openOrCreate(spark, ixPath,
      "embedding", "vec_id", 64, cents,
      sys.error("store exists — bootstrap must not run (store was wiped?)"))
    assert(reopened.highWater == 0L && reopened.view.count() == n,
      "store must survive _SUCCESS-less deployments intact")

    // postings cells are only meaningful under the quantizer that
    // assigned them: reopening with different centroids must fail loudly
    // instead of silently mixing two cell spaces
    val otherCents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 2, seed = 7L))
    val e = intercept[IllegalArgumentException] {
      DurableIvfSegmentState.openOrCreate(spark, ixPath,
        "embedding", "vec_id", 64, otherCents,
        sys.error("must fail before bootstrap"))
    }
    assert(e.getMessage.contains("DIFFERENT"), e.getMessage)
  }
}
