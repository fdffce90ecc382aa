package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming chunk dedup ([[DocStreams.chunkDedupStream]]) against the
  * batch chunk-dedup digests, across micro-batch boundaries.
  */
class DocStreamsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** ONE copy of the micro-batch staging idiom: write each frame as a
    * single parquet file into a flat dir with PINNED mtimes
    * (FileStreamSource orders by mtime with listing-order ties —
    * back-to-back copies can tie at ms resolution) so
    * `maxFilesPerTrigger=1` yields exactly one micro-batch per frame,
    * in order. */
  private def stageMicroBatches(
      batches: Seq[org.apache.spark.sql.DataFrame]): java.nio.file.Path = {
    val flat = java.nio.file.Files.createTempDirectory("stream_batches")
    batches.zipWithIndex.foreach { case (df, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"stream_b$i")
      df.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val listing = java.nio.file.Files.list(part)
      val src =
        try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    flat
  }

  test("stateless text gates are stream-native: blocklistFlags runs " +
    "unchanged on a streaming frame and equals the batch answer") {
    // no writer, no foreachBatch, no state: a pure-projection gate
    // (blocklist, gopher flags, quality components) applies to a
    // readStream frame exactly as written — the contract that lets
    // ingest filters run inline in any streaming pipeline
    val flat = stageMicroBatches(Seq(
      Seq((1L, "clean prose here"), (2L, "buy gold now thing")).toDF("doc_id", "text"),
      Seq((3L, "spam spam"), (4L, "also fine")).toDF("doc_id", "text")))
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val phrases = Seq("buy gold now", "spam")
    val q = graft.pipeline.TextAnalysis.blocklistFlags(
        stream, "text", "doc_id", phrases)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("blk_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("blk_stream")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_blocked_hits"),
        r.getAs[Int]("blocked"))).toSet
    val batch = graft.pipeline.TextAnalysis.blocklistFlags(
        spark.read.parquet(flat.toString), "text", "doc_id", phrases)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_blocked_hits"),
        r.getAs[Int]("blocked"))).toSet
    assert(got == batch && got.size == 4, s"stream $got vs batch $batch")
    assert(got.contains((2L, 1L, 1)) && got.contains((3L, 2L, 1)))
  }

  test("dsirScore is stream-native: a fitted model scores a streaming " +
    "frame unchanged and equals the batch answer") {
    // the DSIR apply half is a pure projection over a literal ratio
    // table — same stateless-gate contract as blocklistFlags above, so
    // a nightly ingest can importance-score documents inline
    val fitRaw = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha alpha beta")).toDF("doc_id", "text")
    val fitTgt = Seq(Tuple1("alpha beta")).toDF("text")
    val model = graft.pipeline.Curation.dsirFit(fitRaw, "text", fitTgt, "text",
      buckets = 256)
    val flat = stageMicroBatches(Seq(
      Seq((10L, "alpha beta new"), (11L, "unrelated words here")).toDF("doc_id", "text"),
      Seq((12L, "beta gamma"), (13L, "")).toDF("doc_id", "text")))
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = graft.pipeline.Curation.dsirScore(stream, "text", "doc_id", model)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dsir_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsir_stream")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val batch = graft.pipeline.Curation.dsirScore(
        spark.read.parquet(flat.toString), "text", "doc_id", model)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == batch && got.size == 3, s"stream $got vs batch $batch")
    // the empty doc dropped (no tokens), per the LM-family contract
    assert(!got.exists(_._1 == 13L))
  }

  test("cross-micro-batch chunk dedup emits each distinct chunk once") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:10:00")
    // batch 1: docs 1-2 share "a b c d"; batch 2: doc 3 repeats it and
    // adds a new chunk
    val flat = stageMicroBatches(Seq(
      Seq((1L, t0, "a b c d w x y z"), (2L, t0, "a b c d p q r s"))
        .toDF("doc_id", "ts", "text"),
      Seq((3L, t1, "a b c d n e w c h u n k!"))
        .toDF("doc_id", "ts", "text")))

    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = DocStreams.chunkDedupStream(stream, "text", "doc_id", "ts", 4)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("chunk_dedup_stream").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("chunk_dedup_stream")
      .select("doc_id", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // every distinct chunk exactly once
    assert(out.map(_._2).toSeq.sorted ===
      out.map(_._2).distinct.sorted)
    val batchDigests = graft.pipeline.Dedup.chunkDedup(
        spark.read.parquet(flat.toString), "text", "doc_id", 4)
      .select("chunk_md5").collect().map(_.getString(0)).toSet
    val streamDigests = spark.table("chunk_dedup_stream")
      .select("chunk_md5").collect().map(_.getString(0)).toSet
    assert(streamDigests === batchDigests)
    // the shared passage was claimed in batch 1 — doc 3 contributes only
    // its novel chunks
    assert(out.filter(_._1 == 3L).forall(c => !c._2.startsWith("a b c d")))
  }

  test("streaming near-dup flags arriving docs against the corpus state") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val corpus = Seq(
      (100L, base),
      (101L, "completely unrelated text about sailing ships at dawn today"))
      .toDF("doc_id", "text")
    val state = graft.pipeline.Dedup.minhashState(corpus, "text", "doc_id")
      .localCheckpoint()
    // batch 1: one near-dup (one word changed); batch 2: one exact copy,
    // one novel doc
    val b1 = Seq((1L, base.replace("lazy", "sleepy"))).toDF("doc_id", "text")
    val b2 = Seq((2L, base), (3L, "nothing in common with anything here at all"))
      .toDF("doc_id", "text")
    val flat = stageMicroBatches(Seq(b1, b2))
    val schema = b1.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    // the writer's own static-state checkpoint happens at construction;
    // count AFTER it so the assertion sees only per-batch barriers
    val writer = DocStreams.nearDupWriter(stream, state, "text", "doc_id",
        threshold = 0.5) { (out, _) =>
      rows.synchronized {
        rows ++= out.select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect()
      }
    }
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val q = writer.start()
    try q.processAllAvailable() finally q.stop()
    // per-batch barriers must release with their micro-batch scope — an
    // unbounded stream may not accumulate executor blocks
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
      "micro-batch barriers leaked past their scope")

    val batch = graft.pipeline.Dedup.minhashIncrementalPairs(
        b1.unionByName(b2), state, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows.toSet == batch,
      s"stream ${rows.toSet} vs batch $batch")
    // the near-dup and the exact copy are flagged against corpus doc 100
    assert(batch.map(p => (p._1, p._2)) == Set((1L, 100L), (2L, 100L)), s"got $batch")
  }

  test("streaming hamming near-dup flags arriving hashes against the " +
    "stored corpus hashes, micro-batch split invisible") {
    // corpus of stored 64-bit perceptual hashes; arriving rows carry a
    // precomputed hash (dHash/simhash computed upstream)
    val corpus = Seq((100L, 0x00FFL), (101L, 0x0F0F0F0F0F0F0F0FL))
      .toDF("asset_id", "h64")
    // batch 1: a 2-bit re-encode of corpus 100; batch 2: an exact copy of
    // 100 and an unrelated hash
    val b1 = Seq((1L, 0x00FCL)).toDF("doc_id", "h64")
    val b2 = Seq((2L, 0x00FFL), (3L, -1L)).toDF("doc_id", "h64")
    val flat = stageMicroBatches(Seq(b1, b2))
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val writer = DocStreams.hammingNearDupWriter(stream, corpus,
        "h64", "doc_id", "h64", "asset_id", maxHamming = 3) { (out, _) =>
      rows.synchronized {
        rows ++= out.select("id_a", "id_b", "hamming")
          .as[(Long, Long, Int)].collect()
      }
    }
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val q = writer.start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
      "micro-batch barriers leaked past their scope")

    val batch = graft.pipeline.Dedup.hashPairsAgainst(
        b1.unionByName(b2), col("h64"), "doc_id",
        corpus, col("h64"), "asset_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(rows.toSet == batch, s"stream ${rows.toSet} vs batch $batch")
    // re-encode and exact copy flag against asset 100; the novel hash
    // flags nothing
    assert(batch == Set((1L, 100L, 2), (2L, 100L, 0)), s"got $batch")
  }

  test("streaming span rewrite cuts corpus passages from arriving docs, " +
    "micro-batch split invisible") {
    val corpus = Seq((100L, "alpha beta gamma delta end")).toDF("doc_id", "text")
    val census = graft.pipeline.Dedup.ngramFrequency(corpus, "text", "doc_id", 3, 1L)
    val b1 = Seq((1L, "x alpha beta gamma delta y")).toDF("doc_id", "text")
    val b2 = Seq((2L, "fresh words entirely"),
      (3L, "alpha beta gamma again")).toDF("doc_id", "text")
    val flat = stageMicroBatches(Seq(b1, b2))
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val writer = DocStreams.spanRewriteWriter(stream, census, "text", "doc_id", 3) {
      (out, _) =>
        rows.synchronized {
          rows ++= out.select("doc_id", "text_clean", "n_removed")
            .as[(Long, String, Long)].collect()
        }
    }
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val q = writer.start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
      "per-batch words barriers leaked past their scope")

    val batch = graft.pipeline.Dedup.spanRewriteAgainst(
        b1.unionByName(b2), census, "text", "doc_id", 3)
      .select("doc_id", "text_clean", "n_removed")
      .as[(Long, String, Long)].collect().toSet
    assert(rows.toSet == batch, s"stream ${rows.toSet} vs batch $batch")
    assert(batch == Set((1L, "x y", 4L), (2L, "fresh words entirely", 0L),
      (3L, "again", 3L)), s"got $batch")
  }
}
