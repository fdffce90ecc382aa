package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunk-level exact dedup ([[Dedup.chunkDedup]]): keep-first semantics,
  * partition coverage, and the cross-document repeated-passage case that
  * whole-document dedup cannot see.
  */
class ChunkDedupSpec extends AnyFunSuite with SparkSpec {

  test("keeps the first (id, chunk_index) occurrence per distinct chunk") {
    import spark.implicits._
    // docs 1 and 2 share the passage "a b c d"; doc 2 also repeats it
    // internally; doc 3 is unrelated
    val docs = Seq(
      (1L, "a b c d w x y z"),
      (2L, "a b c d a b c d"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "text", "doc_id", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // "a b c d" occurs 3 times (doc1#0, doc2#0, doc2#1): survivor doc1#0
    assert(out.toSet === Set((1L, 0L, 3L), (1L, 1L, 1L), (3L, 0L, 1L)))
  }

  test("non-overlapping chunks exactly partition each document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Curation.chunkTokens(docs, "text", "doc_id", 16, 0)
    // re-concatenating the chunk stream in index order reproduces the doc
    val ordered = chunks
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("chunk_index"),
        col("chunk_text")))), s => s.getField("chunk_text")), " ").as("recon"))
    val bad = docs.select(col("doc_id"), lower(trim(col("text"))).as("want"))
      .join(ordered, Seq("doc_id"))
      .where(not(col("recon") === regexp_replace(col("want"), "\\s+", " ")))
      .count()
    assert(bad === 0L)
    assert(ordered.count() === docs.count())
  }

  test("rebuild prunes claimed chunks and drops fully-duplicated documents") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d w x y z"),
      (2L, "a b c d p q r s"),   // loses its first chunk to doc 1
      (3L, "a b c d w x y z")    // exact duplicate of doc 1: vanishes
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRebuild(docs, "text", "doc_id", 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((2L, 2L, "a b c d w x y z")))
    assert(out(2L) === ((2L, 1L, "p q r s")))
  }

  test("rebuild with no duplicates reproduces every document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val out = Dedup.chunkDedupRebuild(docs, "text", "doc_id", 1_000_000)
    // chunk width beyond any doc length -> one chunk per doc, no cross-doc
    // duplicates in this slice -> rebuild is the identity (lowercased)
    val bad = out.join(docs, Seq("doc_id"))
      .where(col("text_rebuilt") =!= lower(trim(regexp_replace(col("text"), "\\s+", " "))))
      .count()
    assert(bad === 0L)
    assert(out.count() === 50L)
  }

  test("incremental chunk dedup: corpus-known and in-batch-duplicate chunks drop") {
    import spark.implicits._
    val corpus = Seq((100L, "k n o w n p a s s a g e!")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "k n o w fresh stuff here"),       // first chunk known to corpus
      (2L, "x y z w fresh stuff here"),       // tail repeats doc 1's tail
      (3L, "all new content entirely here")).toDF("doc_id", "text")
    val out = Dedup.incrementalChunkDedup(batch,
        Dedup.chunkDigests(corpus, "text", "doc_id", 4), "text", "doc_id", 4)
      .select("doc_id", "chunk_index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc1: "k n o w" claimed by corpus, "fresh stuff here" survives
    // doc2: its tail chunk duplicates doc1's (in-batch keep-first: doc1
    //       wins); its head chunk is new
    // doc3: both chunks survive
    assert(out === Set((1L, 1L), (2L, 0L), (3L, 0L), (3L, 1L)))
  }

  test("whole-document dedup misses the shared passage chunk dedup catches") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared passage here now u n i q u e o n e"),
      (2L, "shared passage here now d i f f e r e n t")).toDF("doc_id", "text")
    assert(Dedup.exactDedup(docs, "text", "doc_id")
      .where(col("dup_count") > 1).count() === 0L)
    val dup = Dedup.chunkDedup(docs, "text", "doc_id", 4)
      .where(col("dup_count") > 1).collect()
    assert(dup.length === 1 && dup.head.getLong(0) === 1L && dup.head.getLong(1) === 0L)
  }
}
