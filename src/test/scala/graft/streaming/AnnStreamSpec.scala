package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static ANN enrich ([[AnnStream]]) equals the batch operators,
  * across micro-batch boundaries.
  */
class AnnStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("streaming radius and top-k equal the batch answers over all batches") {
    // stage query vectors as two single-file micro-batches
    val queries = emb.where($"vec_id" < 10).select($"vec_id", $"embedding")
    val flat = java.nio.file.Files.createTempDirectory("ann_stream")
    Seq($"vec_id" < 5, $"vec_id" >= 5).zipWithIndex.foreach { case (p, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"ann_part$i")
      queries.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L) // pin batch order
    }
    val schema = queries.schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    // collected-buffer sink: foreachBatch hands us each batch's frame
    val radiusRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q1 = AnnStream.radiusWriter(stream, emb, "embedding", "vec_id", 0.2, 64) {
      (out, _) =>
        radiusRows.synchronized {
          radiusRows ++= out.select("query_id", "corpus_id", "cosine")
            .as[(Long, Long, Double)].collect()
        }
    }.start()
    try q1.processAllAvailable() finally q1.stop()

    val batchRadius = graft.pipeline.AnnSearch
      .bruteForceRadius(queries, emb, "embedding", "vec_id", 0.2)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(radiusRows.toSet == batchRadius,
      s"stream radius ${radiusRows.size} rows vs batch ${batchRadius.size}")
    assert(batchRadius.nonEmpty, "fixture should produce pairs at tau=0.2")

    val topkRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q2 = AnnStream.topKWriter(stream, emb, "embedding", "vec_id", 5, 64) {
      (out, _) =>
        topkRows.synchronized {
          topkRows ++= out.select("query_id", "corpus_id", "rank")
            .as[(Long, Long, Int)].collect()
        }
    }.start()
    try q2.processAllAvailable() finally q2.stop()

    val batchTopK = graft.pipeline.AnnSearch
      .bruteForceTopK(queries, emb, "embedding", "vec_id", 5)
      .select("query_id", "corpus_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(topkRows.toSet == batchTopK,
      s"stream top-k ${topkRows.size} rows vs batch ${batchTopK.size}")

    // stored-index writer: full probe of persisted postings equals the
    // same exact answer, across the same micro-batch boundaries
    val cents = graft.pipeline.AnnSearch.kmeansFit(emb, "embedding",
      dim = 64, k = 4, iters = 2)
    val flatC = graft.pipeline.AnnSearch.normalizeCentroids(cents)
    val posts = graft.pipeline.AnnSearch.ivfPostings(emb, "embedding",
      "vec_id", 64, flatC)
    val ivfRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q3 = AnnStream.ivfTopKWriter(stream, posts, "embedding", "vec_id",
        5, 64, flatC, nProbe = 4) { (out, _) =>
      ivfRows.synchronized {
        ivfRows ++= out.select("query_id", "corpus_id", "rank")
          .as[(Long, Long, Int)].collect()
      }
    }.start()
    try q3.processAllAvailable() finally q3.stop()
    assert(ivfRows.toSet == batchTopK,
      s"stream ivf ${ivfRows.size} rows vs batch ${batchTopK.size}")
  }

  test("streaming semantic near-dup equals the batch incremental operator " +
    "across micro-batches") {
    val cents = graft.pipeline.DemoModels.SemCentroids
    // corpus = ids not divisible by 10; arriving batch = the rest, split
    // across two micro-batches (the same split dedup_semantic_inc uses)
    val state = graft.pipeline.Dedup.semDedupState(
      emb.where($"vec_id" % 10 =!= 0), "embedding", "vec_id", cents, 64, 8)
    val batchDocs = emb.where($"vec_id" % 10 === 0)
      .select($"vec_id", $"embedding")
    val flat = java.nio.file.Files.createTempDirectory("sem_stream")
    Seq($"vec_id" % 20 === 0, $"vec_id" % 20 =!= 0).zipWithIndex.foreach {
      case (p, i) =>
        val part = java.nio.file.Files.createTempDirectory(s"sem_part$i")
        batchDocs.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val dst = flat.resolve(f"$i%02d.parquet")
        java.nio.file.Files.copy(src, dst)
        dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val q = AnnStream.semanticNearDupWriter(stream, state, "embedding",
        "vec_id", cents, 64, 8, threshold = 0.35) { (out, _) =>
      got.synchronized {
        got ++= out.select("id_a", "id_b").as[(Long, Long)].collect()
      }
    }.start()
    try q.processAllAvailable() finally q.stop()
    // per-batch MatchScope released every micro-batch's barriers
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore + 1,
      "per-batch semantic state leaked")
    val expect = graft.pipeline.Dedup.semDedupIncrementalPairs(
        batchDocs, state, "embedding", "vec_id", cents, 64, 8, 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.toSet == expect && expect.nonEmpty,
      s"stream ${got.size} pairs vs batch ${expect.size}")
  }

  test("ivfAppendWriter: a two-batch embedding stream folds into the " +
    "postings a one-shot assignment over the union would produce") {
    import graft.pipeline.AnnSearch
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 2)
    val flat = AnnSearch.normalizeCentroids(cents)
    val base = emb.where($"vec_id" % 3 === 0)
    val arriving = emb.where($"vec_id" % 3 =!= 0).select($"vec_id", $"embedding")

    val dir = java.nio.file.Files.createTempDirectory("ivf_append_stream")
    Seq($"vec_id" % 3 === 1, $"vec_id" % 3 === 2).zipWithIndex.foreach { case (p, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"ivf_ap$i")
      arriving.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

    val gens = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var last: org.apache.spark.sql.DataFrame = null
    val q = AnnStream.ivfAppendWriter(stream,
      AnnSearch.ivfPostings(base, "embedding", "vec_id", 64, flat),
      "embedding", "vec_id", 64, flat) { (posts, batchId) =>
      gens.synchronized { gens += batchId }
      last = posts
    }.start()
    try q.processAllAvailable() finally q.stop()

    assert(gens.size == 2, s"expected 2 generations, got $gens")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("corpus_id"), col("__cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val rebuilt = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat)
    assert(key(last) == key(rebuilt),
      "streamed folds must equal a one-shot assignment over the union")
  }

  test("centroidDriftWriter: accumulated stream drift equals batch " +
    "centroidDrift over the union, bit-for-bit, at every trigger") {
    import graft.pipeline.Embeddings
    val baseline = emb.where($"vec_id" % 2 === 0)
    // three single-file micro-batches of "new" vectors
    val incoming = emb.where($"vec_id" % 2 === 1)
      .select($"label", $"vec_id", $"embedding")
    val preds = Seq($"vec_id" % 3 === 0, $"vec_id" % 3 === 1, $"vec_id" % 3 === 2)
    val flatDir = java.nio.file.Files.createTempDirectory("drift_stream")
    preds.zipWithIndex.foreach { case (p, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"drift_part$i")
      incoming.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flatDir.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(flatDir.toString)

    def driftSet(df: org.apache.spark.sql.DataFrame) = df
      .select("label", "n_old", "n_new", "n_dims", "l2_move")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val perTrigger = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long, Double)])]
    val q = AnnStream.centroidDriftWriter(stream, baseline,
        Seq("label"), "embedding") { (out, batchId) =>
      perTrigger.synchronized { perTrigger += ((batchId, driftSet(out))) }
    }.start()
    try q.processAllAvailable() finally q.stop()

    assert(perTrigger.size == 3, s"expected 3 triggers, got ${perTrigger.size}")
    // EVERY trigger's emitted drift equals the batch operator over the
    // union of all batches seen so far — exact quantized-integer
    // arithmetic on both sides, so equality is bit-for-bit
    val sorted = perTrigger.sortBy(_._1)
    preds.indices.foreach { i =>
      val seenSoFar = incoming.where(preds.take(i + 1).reduce(_ || _))
      val batchDrift = driftSet(
        Embeddings.centroidDrift(baseline, seenSoFar, Seq("label"), "embedding"))
      assert(sorted(i)._2 == batchDrift,
        s"trigger $i drift diverged from batch over the first ${i + 1} batches")
      assert(batchDrift.nonEmpty)
    }
  }

  test("centroidDriftWriterRecoverable: a process restart reloads the " +
    "accumulated state — final drift covers every row ever delivered") {
    import graft.pipeline.Embeddings
    val baseline = emb.where($"vec_id" % 2 === 0)
    val incoming = emb.where($"vec_id" % 2 === 1)
      .select($"label", $"vec_id", $"embedding")
    val preds = Seq($"vec_id" % 3 === 0, $"vec_id" % 3 === 1, $"vec_id" % 3 === 2)
    val flatDir = java.nio.file.Files.createTempDirectory("driftrec_stream")
    def stageBatch(i: Int): Unit = {
      val part = java.nio.file.Files.createTempDirectory(s"driftrec_part$i")
      incoming.where(preds(i)).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flatDir.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val statePath = java.nio.file.Files.createTempDirectory("driftrec_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("driftrec_ckpt").toString
    def stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(flatDir.toString)
    def driftSet(df: org.apache.spark.sql.DataFrame) = df
      .select("label", "n_old", "n_new", "n_dims", "l2_move")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long, Long, Long, Double)])]
    def run(): Unit = {
      // a FRESH writer each time — the in-memory accumulator starts
      // empty, as after a process restart; only statePath + the stream
      // checkpoint survive
      val q = AnnStream.centroidDriftWriterRecoverable(stream, baseline,
          Seq("label"), "embedding", statePath) { (out, batchId) =>
        emitted.synchronized { emitted += ((batchId, driftSet(out))) }
      }.option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    stageBatch(0); stageBatch(1)
    run()
    assert(emitted.size == 2, s"expected 2 triggers, got ${emitted.size}")
    // "restart": new writer object, same statePath + checkpoint
    stageBatch(2)
    run()
    val last = emitted.sortBy(_._1).last._2
    val expected = driftSet(Embeddings.centroidDrift(baseline,
      incoming, Seq("label"), "embedding"))
    assert(last == expected,
      "post-restart drift must cover all three batches, not just the third")
    // exactly one live state dir remains (superseded ones deleted)
    val dirs = new java.io.File(statePath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("state_"))
    assert(dirs.length == 1, s"expected 1 live state dir, got ${dirs.toSeq}")
  }
}
