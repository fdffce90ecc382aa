package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-filtered vector search: [[AnnSearch.filteredTopK]] (exact
  * pre-filter) and [[AnnSearch.ivfTopKFromPostingsFiltered]] (search-time
  * semi-join against a stored, unfiltered index). */
class FilteredAnnSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pre-filter is exact: equals brute force restricted to allowed rows") {
    val queries = emb.where(col("vec_id") < 5)
    val got = AnnSearch.filteredTopK(queries, emb, "embedding", "vec_id", 5,
      col("label") % 2 === 0)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val expected = AnnSearch.bruteForceTopK(queries,
      emb.where(col("label") % 2 === 0), "embedding", "vec_id", 5)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("a predicate that empties the corpus returns no rows, not an error") {
    val res = AnnSearch.filteredTopK(emb.where(col("vec_id") < 3), emb,
      "embedding", "vec_id", 5, col("label") === -1)
    assert(res.count() == 0)
  }

  test("full-probe filtered IVF equals the exact filtered search") {
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 2)
    val flat = AnnSearch.normalizeCentroids(cents)
    val posts = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat)
    val allowed = emb.where(col("label") % 2 === 0).select("vec_id")
    val ivf = AnnSearch.ivfTopKFromPostingsFiltered(emb.where(col("vec_id") < 5),
      posts, "embedding", "vec_id", 5, 64, flat, nProbe = 4, allowed)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    val exact = AnnSearch.filteredTopK(emb.where(col("vec_id") < 5), emb,
      "embedding", "vec_id", 5, col("label") % 2 === 0)
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)]
      .collect().toSet
    assert(ivf == exact && ivf.nonEmpty)
  }

  test("hard negatives: same-label rows never appear; equal to filtering " +
    "the per-anchor predicate") {
    val anchors = emb.where(col("vec_id") < 5)
    val got = AnnSearch.hardNegatives(anchors, emb, "embedding", "vec_id",
      "label", 5)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.select("query_id", "corpus_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, c) => labels(q) != labels(c) })
    // per-anchor equivalence with an explicitly filtered exact search
    val a0 = anchors.where(col("vec_id") === 0).head()
    val l0 = a0.getAs[Int]("label")
    val expect = AnnSearch.filteredTopK(anchors.where(col("vec_id") === 0), emb,
      "embedding", "vec_id", 5, col("label") =!= l0)
      .select("corpus_id").as[Long].collect().toSet
    val got0 = rows.collect { case (0L, c) => c }.toSet
    assert(got0 == expect)
  }

  test("labelNoise flags exactly the planted mislabel in a clean corpus") {
    // two tight, well-separated clusters; row 5 sits in cluster A but
    // carries cluster B's label
    def v(x: Double, y: Double) = Seq.tabulate(4)(i => if (i == 0) x.toFloat
      else if (i == 1) y.toFloat else 0.0f)
    val rows = Seq(
      (0L, v(1.0, 0.00), 0), (1L, v(1.0, 0.01), 0), (2L, v(1.0, -0.01), 0),
      (3L, v(0.0, 1.00), 1), (4L, v(0.01, 1.0), 1), (5L, v(1.0, 0.02), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val noisy = AnnSearch.labelNoise(df, "embedding", "vec_id", "label", 3)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("label"),
        r.getAs[Long]("label_pred")))
    assert(noisy.toSeq == Seq((5L, 1L, 0L)), s"got ${noisy.toSeq}")
  }

  test("ivfForgetPostings equals a kept-corpus rebuild exactly, and the " +
    "forgotten ids never surface in a search") {
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 2)
    val flat = AnnSearch.normalizeCentroids(cents)
    val posts = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat)
    val forgetDf = emb.where(col("vec_id") % 5 === 2).select("vec_id")
    val forgotten = forgetDf.as[Long].collect().toSet
    assert(forgotten.nonEmpty)
    // postings-level contract: anti-join == assign-only-the-kept-rows
    // (frozen quantizer => surviving cells identical)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("corpus_id"), col("__cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val viaForget = AnnSearch.ivfForgetPostings(posts, forgetDf, "vec_id")
    val viaRebuild = AnnSearch.ivfPostings(
      emb.where(col("vec_id") % 5 =!= 2), "embedding", "vec_id", 64, flat)
    assert(key(viaForget) == key(viaRebuild))
    // search-level contract: no forgotten id in any result at full probe
    val got = AnnSearch.ivfTopKFromPostings(emb.where(col("vec_id") < 5),
      viaForget, "embedding", "vec_id", 5, 64, flat, nProbe = 4)
      .select("corpus_id").as[Long].collect()
    assert(got.nonEmpty && got.forall(id => !forgotten.contains(id)))
    // empty forget list is the identity
    assert(key(AnnSearch.ivfForgetPostings(posts, forgetDf.limit(0), "vec_id"))
      == key(posts))
  }

  test("partial-probe filtered recall: results are a subset of the exact " +
    "filtered ranking's candidate pool and never violate the predicate") {
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 2)
    val flat = AnnSearch.normalizeCentroids(cents)
    val posts = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat)
    val allowedDf = emb.where(col("label") % 2 === 0).select("vec_id")
    val allowed = allowedDf.as[Long].collect().toSet
    val got = AnnSearch.ivfTopKFromPostingsFiltered(emb.where(col("vec_id") < 5),
      posts, "embedding", "vec_id", 5, 64, flat, nProbe = 1, allowedDf)
      .select("corpus_id").as[Long].collect()
    assert(got.forall(allowed.contains))
  }
}
