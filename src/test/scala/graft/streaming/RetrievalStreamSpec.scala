package graft.streaming

import graft.SparkSpec
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static BM25 ([[RetrievalStream]]) equals the batch operator,
  * across micro-batch boundaries, against a prebuilt index.
  */
class RetrievalStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("streaming bm25 equals the batch answer over all batches") {
    val queries = docs.where($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        expr("concat_ws(' ', slice(split(trim(lower(text)), '\\\\s+'), 1, 5))").as("qtext"))
    val flat = java.nio.file.Files.createTempDirectory("bm25_stream")
    Seq($"query_id" < 25, $"query_id" >= 25).zipWithIndex.foreach { case (p, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"bm25_part$i")
      queries.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L) // pin batch order
    }
    val schema = queries.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    // index built once, used by every micro-batch
    val ix = TextAnalysis.bm25Index(docs, "text", "doc_id")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = RetrievalStream.bm25Writer(stream, ix, "qtext", "query_id", 5) {
      (out, _) =>
        rows.synchronized {
          rows ++= out.select("query_id", "doc_id", "score", "rank")
            .as[(Long, Long, Double, Int)].collect()
        }
    }.start()
    try q.processAllAvailable() finally q.stop()

    val batch = TextAnalysis.bm25TopK(docs, "text", "doc_id",
        queries, "qtext", "query_id", k = 5)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(batch.nonEmpty, "fixture should produce rankings")
    assert(rows.toSet == batch,
      s"stream bm25 ${rows.size} rows vs batch ${batch.size}")
  }

  test("bm25AppendWriter: a two-batch document stream folds into the " +
    "index one batch-API build over the union would produce") {
    val base = docs.where($"doc_id" % 3 === 0)
    val arriving = docs.where($"doc_id" % 3 =!= 0)
      .select($"doc_id", $"text")
    // two pinned-order file batches of arriving documents
    val flat = java.nio.file.Files.createTempDirectory("bm25_append_stream")
    Seq($"doc_id" % 3 === 1, $"doc_id" % 3 === 2).zipWithIndex.foreach { case (p, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"bm25_ap$i")
      arriving.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    val gens = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    @volatile var last: TextAnalysis.Bm25Index =
      TextAnalysis.bm25Index(base, "text", "doc_id")
    val q = RetrievalStream.bm25AppendWriter(stream, last, "text") {
      (ix, batchId) =>
        gens.synchronized { gens += ((batchId, ix.nDocs)) }
        last = ix
    }.start()
    try q.processAllAvailable() finally q.stop()

    assert(gens.size == 2, s"expected 2 generations, got $gens")
    // monotone growth across generations
    assert(gens.map(_._2).toSeq == gens.map(_._2).toSeq.sorted)
    // final generation == one batch build over the whole corpus
    val rebuilt = TextAnalysis.bm25Index(docs, "text", "doc_id")
    assert(last.nDocs == rebuilt.nDocs &&
      last.totalTokens == rebuilt.totalTokens)
    val ap = last.postings.select("doc_id", "token", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val rp = rebuilt.postings.select("doc_id", "token", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(ap == rp, s"postings diverge after streaming folds: " +
      s"${ap.diff(rp).take(3)} / ${rp.diff(ap).take(3)}")
  }

  test("saved index reloads and searches identically") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_ix").toString
    val queries = docs.where($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        expr("concat_ws(' ', slice(split(trim(lower(text)), '\\\\s+'), 1, 5))").as("qtext"))
    val ix = TextAnalysis.bm25Index(docs, "text", "doc_id", maxDf = 500L)
    TextAnalysis.saveBm25Index(ix, dir)
    val loaded = TextAnalysis.loadBm25Index(spark, dir)
    assert(loaded.idCol == "doc_id" && loaded.nDocs == ix.nDocs
      && loaded.totalTokens == ix.totalTokens
      && loaded.k1 == ix.k1 && loaded.b == ix.b)
    val a = TextAnalysis.bm25TopKWithIndex(ix, queries, "qtext", "query_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val b = TextAnalysis.bm25TopKWithIndex(loaded, queries, "qtext", "query_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("token-bucketed stored search: identical answer, PRUNED postings " +
    "scan (PartitionFilters with a strict bucket subset)") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_bkt").toString
    val queries = docs.where($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        expr("concat_ws(' ', slice(split(trim(lower(text)), '\\\\s+'), 1, 5))").as("qtext"))
    val ix = TextAnalysis.bm25Index(docs, "text", "doc_id")
    TextAnalysis.saveBm25Index(ix, dir, nBuckets = 64)
    val six = TextAnalysis.loadBm25StoredIndex(spark, dir)
    assert(six.nBuckets == 64 && six.nDocs == ix.nDocs
      && six.totalTokens == ix.totalTokens)
    // identical arithmetic to the in-memory index search
    val a = TextAnalysis.bm25TopKWithIndex(ix, queries, "qtext", "query_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val stored = TextAnalysis.bm25TopKStored(six, queries, "qtext", "query_id", 5)
    val b = stored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(a == b && a.nonEmpty)
    // the postings scan must carry the bucket partition filter — the
    // storage layer does the lexical index lookup (same contract as
    // IvfSpec's cell-partitioned postings)
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("bucket#") || plan.contains("cast(bucket")),
      s"bucket filter did not reach partition pruning:\n$plan")
    // and it is a STRICT subset: a one-term query's bucket filter keeps
    // one of the 64 directories, so the pruned scan covers a fraction
    // of the stored postings
    val one = queries.limit(1)
      .select($"query_id", expr("split(qtext, ' ')[0]").as("qtext"))
    val oneScan = TextAnalysis.bm25TopKStored(six, one, "qtext", "query_id", 5)
    assert(oneScan.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val oneBucket = one.select(
        pmod(xxhash64(col("qtext")), lit(64L)).as("b")).head().getLong(0)
    val full = spark.read.parquet(s"$dir/postings").count()
    val inBucket = spark.read.parquet(s"$dir/postings")
      .where(col("bucket") === oneBucket).count()
    assert(inBucket > 0 && inBucket < full / 4,
      s"bucket $oneBucket holds $inBucket of $full postings — not a subset")
  }

  test("bm25StoredWriter: per-micro-batch pruned search equals the batch " +
    "answer") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_bkt_stream").toString
    val queries = docs.where($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        expr("concat_ws(' ', slice(split(trim(lower(text)), '\\\\s+'), 1, 5))").as("qtext"))
    TextAnalysis.saveBm25Index(
      TextAnalysis.bm25Index(docs, "text", "doc_id"), dir)
    val six = TextAnalysis.loadBm25StoredIndex(spark, dir)
    val flat = java.nio.file.Files.createTempDirectory("bm25_bkt_flat")
    Seq($"query_id" < 25, $"query_id" >= 25).zipWithIndex.foreach { case (p, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"bm25_bkt_part$i")
      queries.where(p).coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
    val q = RetrievalStream.bm25StoredWriter(stream, six, "qtext", "query_id", 5) {
      (out, _) =>
        rows.synchronized {
          rows ++= out.select("query_id", "doc_id", "score", "rank")
            .as[(Long, Long, Double, Int)].collect()
        }
    }.start()
    try q.processAllAvailable() finally q.stop()
    val batch = TextAnalysis.bm25TopK(docs, "text", "doc_id",
        queries, "qtext", "query_id", k = 5)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(batch.nonEmpty && rows.toSet == batch,
      s"stored-stream bm25 ${rows.size} rows vs batch ${batch.size}")
  }
}
