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
}
