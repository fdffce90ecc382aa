package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class NearDupClusterSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("connected components: chains, cliques, singletons") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val comps = NearDupCluster.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(comps) == Seq(1L, 1L, 1L, 1L))
    assert(Seq(10L, 11L).map(comps) == Seq(10L, 10L))
    assert(Seq(20L, 21L, 22L).map(comps) == Seq(20L, 20L, 20L))
  }

  test("long chain converges within the log bound (pointer jumping)") {
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    val comps = NearDupCluster.connectedComponents(chain, maxIterations = 12)
      .as[(Long, Long)].collect().toMap
    assert(comps.values.toSet == Set(0L))
  }

  test("non-convergence raises instead of returning split components") {
    val chain = (0L until 64L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      NearDupCluster.connectedComponents(chain, maxIterations = 2)
    }
  }

  test("string ids cluster with natural ordering (no silent long cast)") {
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val comps = NearDupCluster.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(comps.values.toSet == Set("doc-a"))
  }

  test("dedupByPairs keeps min-id representative and untouched rows") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "a''"), (5L, "solo")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = NearDupCluster.dedupByPairs(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L))
  }

  test("dedupByPairsKeepBest keeps the highest-score member, ties to min id") {
    val docs = Seq((1L, "a", 5L), (2L, "a'", 9L), (3L, "a''", 9L), (5L, "solo", 1L))
      .toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = NearDupCluster.dedupByPairsKeepBest(docs, pairs, "doc_id",
        org.apache.spark.sql.functions.col("quality"))
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3}: 2 and 3 tie at 9 -> 2 wins; untouched 5 stays
    assert(kept == Set(2L, 5L))
  }

  test("end-to-end: minhash pairs -> clusters -> deduplicated documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
    val deduped = NearDupCluster.dedupByPairs(docs, pairs, "doc_id")
    val n = docs.count()
    val k = deduped.count()
    assert(k < n, "expected some near-dup clusters in testdata")
    // idempotent: running again on the deduped corpus removes nothing new
    val pairs2 = Dedup.ngramJaccardPairs(deduped, "text", "doc_id", 3, 0.5)
    val deduped2 = NearDupCluster.dedupByPairs(deduped, pairs2, "doc_id")
    assert(deduped2.count() == k)
  }

  test("clusterLabels: the family learns its size, best score, and rep label") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "en", 10L), (2L, "de", 50L), (3L, "fr", 30L), // one family
      (4L, "zh", 7L))                                     // singleton
      .toDF("doc_id", "lang", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = NearDupCluster.clusterLabels(docs, pairs, "doc_id",
      "n_chars", Seq("lang"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Long]("best_n_chars"), r.getAs[String]("rep_lang")))).toMap
    // every family member inherits: cluster 1, size 3, best 50 (doc 2's),
    // rep label = doc 1's lang (min id)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) === ((1L, 3L, 50L, "en")), s"doc $id")
    }
    // the singleton is its own family of one
    assert(got(4L) === ((4L, 1L, 7L, "zh")))
  }
}
