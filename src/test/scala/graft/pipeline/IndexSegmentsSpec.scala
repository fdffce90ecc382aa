package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Segmented index-append state machines ([[IndexSegments]]): per-fold
  * cost O(batch), compaction correctness, the one-fold serving grace,
  * and — the unbounded-stream property — resident checkpointed-RDD
  * count BOUNDED across many folds, negative-tested against the flat
  * append shape that grew O(generations).
  */
class IndexSegmentsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("segmented BM25 folds (with compactions) equal a flat rebuild " +
    "over the union — postings, scalars, and search scores") {
    val base = docs.where($"doc_id" % 5 === 0)
    val state = new Bm25SegmentState(
      TextAnalysis.bm25Index(base, "text", "doc_id"), "text", compactEvery = 2)
    (1 to 4).foreach { i =>
      state.fold(docs.where($"doc_id" % 5 === i).select($"doc_id", $"text"))
    }
    // 4 folds at compactEvery=2 => two compactions exercised
    val ix = state.view
    val rebuilt = TextAnalysis.bm25Index(docs, "text", "doc_id")
    assert(ix.nDocs == rebuilt.nDocs && ix.totalTokens == rebuilt.totalTokens)
    def posting(p: org.apache.spark.sql.DataFrame) =
      p.select("doc_id", "token", "tf", "dl", "df")
        .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(posting(ix.postings) == posting(rebuilt.postings),
      "segmented postings view diverges from the flat rebuild")
    val queries = docs.where($"doc_id" % 10 === 0)
      .select($"doc_id".as("query_id"),
        expr("concat_ws(' ', slice(split(trim(lower(text)), '\\\\s+'), 1, 5))").as("qtext"))
    def search(i: TextAnalysis.Bm25Index) =
      TextAnalysis.bm25TopKWithIndex(i, queries, "qtext", "query_id", 5)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val a = search(ix)
    assert(a.nonEmpty && a == search(rebuilt),
      "segmented search diverges from the flat index")
    state.close()
  }

  test("a generation stays readable for one fold after the compaction " +
    "that supersedes it, then its blocks are released") {
    val cents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 1))
    val batches = (1 to 3).map(i =>
      emb.where($"vec_id" % 4 === i).select($"vec_id", $"embedding"))
    val state = new IvfSegmentState(
      AnnSearch.ivfPostings(emb.where($"vec_id" % 4 === 0), "embedding",
        "vec_id", 64, cents),
      "embedding", "vec_id", 64, cents, compactEvery = 2)
    val gen1 = state.fold(batches(0)) // segs: base+d1
    val gen2 = state.fold(batches(1)) // size 3 > 2 => compacted; gen1/gen2's segments deferred
    assert(state.segmentCount == 1 && state.barrierCount > 1,
      "compaction should leave one live segment plus deferred ones")
    // the serving grace: the PRE-compaction generation is still readable
    assert(gen1.count() > 0 && gen2.count() > 0)
    val gen3 = state.fold(batches(2)) // deferred release happens here
    assert(state.barrierCount == 2, "deferred segments must be released on the next fold")
    assert(gen3.count() > 0)
    // gen1 ran over now-released checkpoint blocks: reading it must fail
    // (dead blocks, not silent recompute) — the MatchScope contract
    val e = intercept[Exception] { gen1.count() }
    assert(e.getMessage != null, s"expected dead-block failure, got $e")
    state.close()
  }

  test("graceTriggers=2: a superseded generation survives TWO folds " +
    "after its compaction, then fails loudly once released") {
    val cents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 1))
    val batches = (1 to 4).map(i =>
      emb.where($"vec_id" % 5 === i).select($"vec_id", $"embedding"))
    val state = new IvfSegmentState(
      AnnSearch.ivfPostings(emb.where($"vec_id" % 5 === 0), "embedding",
        "vec_id", 64, cents),
      "embedding", "vec_id", 64, cents, compactEvery = 2, graceTriggers = 2)
    val gen1 = state.fold(batches(0)) // segs: base+d1
    state.fold(batches(1)) // fold 2: compaction — gen1's segments deferred
    val gen3 = state.fold(batches(2)) // fold 3: within the 2-fold grace
    // the widened grace: gen1 is still readable one fold LATER than the
    // default-1 window (the previous test pins that default releases here)
    assert(gen1.count() > 0, "graceTriggers=2 should keep the superseded " +
      "generation readable two folds past its compaction")
    state.fold(batches(3)) // fold 4: 2 + graceTriggers <= 4 — released now
    val e = intercept[Exception] { gen1.count() }
    assert(e.getMessage != null, s"expected dead-block failure, got $e")
    // the generation superseded by fold 4's compaction is still serving
    assert(gen3.count() > 0)
    state.close()
  }

  test("resident checkpointed RDDs stay BOUNDED across many folds " +
    "(negative-tested against the flat-append shape)") {
    val sc = spark.sparkContext
    val cents = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 1))
    val tiny = emb.limit(4).select($"vec_id", $"embedding").localCheckpoint()

    // NEGATIVE control first — the pre-round-13 writer shape: every
    // generation a full localCheckpoint, retained (an onUpdate that
    // holds references, or just driver GC lag). Count grows with folds.
    val before0 = sc.getPersistentRDDs.keySet
    var flat = AnnSearch.ivfPostings(tiny, "embedding", "vec_id", 64, cents)
      .localCheckpoint()
    val held = scala.collection.mutable.ArrayBuffer(flat)
    (1 to 8).foreach { _ =>
      flat = AnnSearch.ivfAppendPostings(flat, tiny, "embedding", "vec_id", 64, cents)
        .localCheckpoint()
      held += flat
    }
    val grewBy = (sc.getPersistentRDDs.keySet -- before0).size
    assert(grewBy >= 8,
      s"flat-append control should retain one generation per fold, grew by $grewBy")
    held.foreach(graft.util.Materialize.release)

    // POSITIVE: the segmented state across 30 folds (10 compaction
    // cycles at compactEvery=3) — count never exceeds the structural
    // bound and ends where it stood mid-run (flat, not growing)
    val before = sc.getPersistentRDDs.keySet
    val state = new IvfSegmentState(
      AnnSearch.ivfPostings(tiny.limit(0), "embedding", "vec_id", 64, cents),
      "embedding", "vec_id", 64, cents, compactEvery = 3)
    val counts = (1 to 30).map { _ =>
      state.fold(tiny)
      (sc.getPersistentRDDs.keySet -- before).size
    }
    // structural bound: live segments + deferred-release segments
    // (each one checkpointed frame), ≤ 2*(compactEvery+1)
    val bound = 2 * (3 + 1)
    assert(counts.max <= bound,
      s"segmented state exceeded its block bound: $counts (bound $bound)")
    // same compaction phase, 6 cycles apart — identical footprint
    assert(counts(11) == counts(29),
      s"footprint should be periodic, not growing: $counts")
    state.close()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "close() must release every segment")
  }

  test("BM25 state: bounded barriers across folds, and fold cost is " +
    "O(batch) segments (two checkpointed frames per delta)") {
    val sc = spark.sparkContext
    val tiny = docs.limit(6).select($"doc_id", $"text").localCheckpoint()
    // the initial index's own build barriers are CALLER-owned (the state
    // copies, never adopts them) — snapshot after building it
    val initIx = TextAnalysis.bm25Index(tiny.limit(0), "text", "doc_id")
    val before = sc.getPersistentRDDs.keySet
    val state = new Bm25SegmentState(initIx, "text", compactEvery = 3)
    val counts = (1 to 12).map { i =>
      state.fold(tiny.withColumn("doc_id", $"doc_id" + lit(1000L * i)))
      (sc.getPersistentRDDs.keySet -- before).size
    }
    // two frames per segment, live + deferred
    val bound = 2 * 2 * (3 + 1)
    assert(counts.max <= bound, s"bm25 state exceeded bound: $counts (bound $bound)")
    assert(counts(5) == counts(11), s"footprint should be periodic: $counts")
    state.close()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
