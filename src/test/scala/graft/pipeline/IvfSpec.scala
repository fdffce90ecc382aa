package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** IVF top-k: exhaustive probing must EQUAL brute force (a corpus row
  * lives in exactly one cell, so nProbe = nCells meets every pair once);
  * partial probing must keep recall.
  */
class IvfSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("full-probe IVF equals brute-force top-k exactly") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(org.apache.spark.sql.functions.col("vec_id") < 20)
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val ivf = AnnSearch.ivfTopK(queries, emb, "embedding", "vec_id", 10, dim = 64,
        nCells = 8, nProbe = 8, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(brute.nonEmpty)
    assert(ivf == brute)
  }

  test("partial-probe IVF keeps recall, monotone in nProbe") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(org.apache.spark.sql.functions.col("vec_id") < 20)
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val ivf = AnnSearch.ivfTopK(queries, emb, "embedding", "vec_id", 10, dim = 64,
          nCells = 8, nProbe = nProbe, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(brute).size.toDouble / brute.size
    }
    val r2 = recallAt(2)
    val r5 = recallAt(5)
    // tiny (~tens of vectors per cell) unclustered fixture: the absolute
    // bound is a smoke check; the monotone improvement is the contract
    assert(r5 >= 0.7, s"IVF recall $r5 at nProbe=5 below 0.7")
    assert(r5 >= r2, s"recall not monotone in nProbe: $r2 -> $r5")
  }

  test("nearestCells degrades gracefully on all-NaN query vectors") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val dim = 4
    val centroids = Array.tabulate(3 * dim)(i => (i % dim + 1).toDouble)
    // every dot product is NaN: must still emit nProbe distinct cells
    // (lowest untaken indices) instead of ArrayIndexOutOfBoundsException
    val nan = ArrayData.toArrayData(Array.fill(dim)(Float.NaN))
    val cells = graft.fuzzy.VectorKernels.nearestCells(nan, centroids, dim, 2)
    assert(cells.numElements() == 2)
    assert(cells.toIntArray().toSet == Set(0, 1))
  }
}
