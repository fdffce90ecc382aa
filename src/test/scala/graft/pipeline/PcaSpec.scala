package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Embeddings.pcaFit]]/[[Embeddings.projectWith]] — the data-aware
  * compression path next to JL ([[Embeddings.randomProject]]): fitted
  * directions must be orthonormal, and the project-search-rerank
  * composition must keep recall against the full-dimension ground truth.
  */
class PcaSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val dim = 64
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fitted directions are orthonormal") {
    val k = 8
    val planes = Embeddings.pcaFit(emb, "embedding", dim, k)
    assert(planes.length == k * dim)
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until dim).map(d => planes(i * dim + d) * planes(j * dim + d)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-6, s"direction pair ($i,$j) dot=$dot")
    }
  }

  test("PCA-space candidate search + full-dim re-rank keeps recall") {
    val k = 16
    val planes = Embeddings.pcaFit(emb, "embedding", dim, k)
    val projected = Embeddings.projectWith(emb, "embedding", planes, dim, k)
      .select(col("vec_id"), col("pvec"))
    val queries = projected.where(col("vec_id") < 20)

    // candidates in 16-dim PCA space (over-fetch 4x), exact re-rank at 64
    val cand = AnnSearch.bruteForceTopK(queries, projected, "pvec", "vec_id", 40)
      .select(col("query_id"), col("corpus_id"))
    val full = emb.select(col("vec_id"), col("embedding"))
    val rescored = cand
      .join(full.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("embedding", "__qf"), Seq("query_id"))
      .join(full.withColumnRenamed("vec_id", "corpus_id")
        .withColumnRenamed("embedding", "__cf"), Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        Dedup.cosineSimilarity(col("__qf"), col("__cf")).as("cosine"))
    val reranked = rescored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))))
      .where(col("rank") <= 10)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet

    val truth = AnnSearch.bruteForceTopK(emb.where(col("vec_id") < 20), emb,
        "embedding", "vec_id", 10)
      .select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet

    val recall = (reranked & truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall@10 via 16-dim PCA candidates = $recall")
  }

  test("centroidDrift: identical snapshots move 0, a shifted group moves " +
    "by exactly the shift") {
    val a = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.2f), 0),
      (3L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val same = Embeddings.centroidDrift(a, a, Seq("label"), "embedding")
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Double]("l2_move")).toMap
    assert(same == Map(0 -> 0.0, 1 -> 0.0))
    // shift label-1's single vector by (0.3, -0.4): centroid moves 0.5
    val b = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.2f), 0),
      (3L, Seq(0.3f, 0.6f), 1)).toDF("vec_id", "embedding", "label")
    val moved = Embeddings.centroidDrift(a, b, Seq("label"), "embedding")
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_old"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_dims"), r.getAs[Double]("l2_move")))
      .toMap
    assert(moved(0) == (2L, 2L, 2L, 0.0))
    assert(moved(1) == (1L, 1L, 2L, 0.5))
    // dimensionality mismatch between snapshots: n_dims exposes that only
    // the overlap was compared (the caller's gate before trusting l2_move)
    val short = Seq((3L, Seq(0.0f), 1)).toDF("vec_id", "embedding", "label")
    val mixed = Embeddings.centroidDrift(a, short, Seq("label"), "embedding")
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("n_dims")).toMap
    assert(mixed == Map(1 -> 1L))
  }

  test("projectWith validates the plane shape") {
    intercept[IllegalArgumentException] {
      Embeddings.projectWith(emb, "embedding", Array(1.0, 2.0), dim, 8)
    }
  }

  test("quantizeDirections: 1e-6 grid, sign canonicalized to the " +
    "largest-|component|") {
    // direction 0 already canonical; direction 1's largest |component|
    // is negative, so the whole direction flips
    val planes = Array(0.5, -0.25, 0.1, -0.9, 0.3, 0.0)
    val q = Embeddings.quantizeDirections(planes, 3, 2)
    assert(q.toSeq == Seq(500000L, -250000L, 100000L, 900000L, -300000L, 0L))
  }

  test("projectQuantized: exact integer dot (floor(v*4096) x micro plane)") {
    val df = Seq((1L, Seq(0.5f, -0.25f))).toDF("vec_id", "v")
    // floor(0.5*4096)=2048, floor(-0.25*4096)=-1024
    val out = Embeddings.projectQuantized(df, "v", Array(1000000L, -2000000L), 2, 1)
      .select(col("pvecq")).as[Seq[Long]].head()
    assert(out == Seq(2048L * 1000000L + (-1024L) * (-2000000L)))
  }

  test("pinned DemoModels.PcaDirections dequantize to near-orthonormal " +
    "directions (a REAL fit, not filler)") {
    val k = 8
    val p = DemoModels.PcaDirections.map(_ / 1e6)
    assert(p.length == k * dim)
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until dim).map(d => p(i * dim + d) * p(j * dim + d)).sum
      val expect = if (i == j) 1.0 else 0.0
      // grid error: 64 components x ~5e-7 each — 1e-3 is generous
      assert(math.abs(dot - expect) < 1e-3, s"pinned pair ($i,$j) dot=$dot")
    }
  }

  test("pinned directions are eigen-ORDERED on their fit corpus: captured " +
    "variance strictly decreases (a property filler constants cannot have)") {
    // the fit corpus (sf0.01) — by construction of an eigendecomposition
    // the sample variance along direction p strictly exceeds that along
    // p+1, and the 1e-6 grid perturbs each direction far less than any
    // eigenvalue gap; near-isotropic synthetic embeddings make a recall
    // bar meaningless at k=8, but ordering is exact on the fit data
    val fitCorpus = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val p = DemoModels.PcaDirections.map(_ / 1e6)
    val projected = Embeddings.projectWith(fitCorpus, "embedding", p, dim, 8)
    val vars = projected
      .select((0 until 8).map(i => var_samp(col("pvec")(i)).as(s"v$i")): _*)
      .head()
    val vs = (0 until 8).map(i => vars.getDouble(i))
    (0 until 7).foreach { i =>
      assert(vs(i) > vs(i + 1),
        s"variance not decreasing at $i: ${vs.mkString(", ")}")
    }
  }
}
