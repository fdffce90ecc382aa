package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 operators on empty / degenerate inputs: a 100 TB pipeline WILL
  * see an empty partition-day, an all-blank document batch, or a query set
  * filtered to nothing — none of these may throw or return wrong shapes.
  */
class EmptyInputSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val emptyVecs =
    Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("chunk dedup family on empty and blank input") {
    assert(Dedup.chunkDedup(emptyDocs, "text", "doc_id", 16).count() === 0L)
    assert(Dedup.chunkDedupRebuild(emptyDocs, "text", "doc_id", 16).count() === 0L)
    // a whitespace-only document still yields its (single, empty) chunk
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Dedup.chunkDedup(blank, "text", "doc_id", 16).count() === 1L)
  }

  test("split and batch assignment on empty input") {
    val s = Curation.splitByHash(emptyDocs, "doc_id", Seq(("train", 1.0)))
    assert(s.columns.contains("split") && s.count() === 0L)
    val b = Curation.lengthBucketBatches(emptyDocs, "doc_id", "text", 32, 16)
    assert(b.count() === 0L)
  }

  test("olap wrappers on empty input") {
    val docs = Seq.empty[(String, String, Long)].toDF("lang", "source", "n_chars")
    // Spark's rollup emits NO rows on empty input (ANSI engines emit a
    // grand-total row) — pinned here, documented on the operator
    assert(Olap.rollupProfile(docs, Seq("lang", "source"), "n_chars").count() === 0L)
    assert(Olap.pivotCounts(docs, "source", "lang", Seq("en")).count() === 0L)
  }

  test("z-order writer handles an empty frame (empty table, no throw)") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val dir = s"/tmp/graft_zorder_empty_${System.nanoTime()}"
    val bounds = graft.util.ZOrder.writeClustered(empty, dir, "a", "b", 4)
    assert(bounds === ((0L, 0L, 0L, 0L)))
    assert(spark.read.parquet(dir).count() === 0L)
  }

  test("int8 and projection search paths on empty sides") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(AnnSearch.int8TopK(emptyVecs, emb, "embedding", "vec_id", 5).count() === 0L)
    assert(AnnSearch.int8TopK(emb.limit(3), emptyVecs, "embedding", "vec_id", 5).count() === 0L)
    assert(Embeddings.randomProject(emptyVecs, "embedding", 64, 8).count() === 0L)
    // zero-length vectors quantize to zero-length arrays, excluded by norm
    val zeroDim = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    assert(AnnSearch.int8TopK(zeroDim, zeroDim, "embedding", "vec_id", 5).count() === 0L)
  }
}
