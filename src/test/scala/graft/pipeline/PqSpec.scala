package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization search: kernel identities, the provable
  * full-rerank-equals-brute-force configuration, and recall of the
  * production k-means-codebook path. */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pq kernels: encode is the L2 argmin, adc sums the coded LUT entries") {
    import spark.implicits._
    val dim = 8; val m = 2; val ksub = 4; val dsub = dim / m
    val cb = AnnSearch.pqCodebookMd5Int(dim, m, ksub)
    val vec = Seq(0.5f, -0.25f, 0.125f, 1.0f, -1.0f, 0.75f, 0.0f, -0.5f)
    val df = Seq((1L, vec)).toDF("id", "v")
    val row = df.select(
      graft.fuzzy.vectorFunctions.pq_encode_int(col("v"), cb, m, ksub, dim).as("codes"),
      graft.fuzzy.vectorFunctions.pq_lut_int(col("v"), cb, m, ksub, dim).as("lut"))
      .head()
    val codes = row.getAs[Array[Byte]](0).map(_ & 0xff)
    val lut = row.getSeq[Long](1)
    // hand-recompute on the same 4096 grid
    val q = vec.map(x => math.floor(x.toDouble * 4096.0).toLong)
    for (s <- 0 until m) {
      val dists = (0 until ksub).map { j =>
        (0 until dsub).map { t =>
          val d = q(s * dsub + t) - cb((s * ksub + j) * dsub + t); d * d
        }.sum
      }
      assert(codes(s) == dists.indexOf(dists.min),
        s"subspace $s: code ${codes(s)}, dists $dists")
      for (j <- 0 until ksub) {
        val dot = (0 until dsub).map(t =>
          q(s * dsub + t) * cb((s * ksub + j) * dsub + t)).sum
        assert(lut(s * ksub + j) == dot, s"lut($s, $j)")
      }
    }
    // adc = sum of the coded entries
    val adc = df.select(graft.fuzzy.vectorFunctions.pq_adc_int(
        graft.fuzzy.vectorFunctions.pq_encode_int(col("v"), cb, m, ksub, dim),
        graft.fuzzy.vectorFunctions.pq_lut_int(col("v"), cb, m, ksub, dim),
        ksub)).head().getLong(0)
    assert(adc == (0 until m).map(s => lut(s * ksub + codes(s))).sum)
  }

  test("full rerank equals float brute force exactly (int and kmeans codebooks)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 10)
    val n = emb.count().toInt
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pqInt = AnnSearch.pqTopKInt(queries, emb, "embedding", "vec_id", 10,
        dim = 64, m = 8, ksub = 16, rerank = n)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty && pqInt === brute)
    val cb = AnnSearch.pqFitCodebook(emb, "embedding", dim = 64, m = 8,
      ksub = 16, iters = 2)
    val pqF = AnnSearch.pqTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, codebook = cb, m = 8, ksub = 16, rerank = n)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pqF === brute)
  }

  test("kmeans codebook beats noise: production recall at bounded rerank") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cb = AnnSearch.pqFitCodebook(emb, "embedding", dim = 64, m = 16,
      ksub = 16, iters = 2)
    val got = AnnSearch.pqTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, codebook = cb, m = 16, ksub = 16, rerank = 40)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"kmeans-PQ recall@10 = $recall")
    // every returned pair must be a genuine cosine ranking within its
    // shortlist: determinism across two runs
    val again = AnnSearch.pqTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, codebook = cb, m = 16, ksub = 16, rerank = 40)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === again)
  }

  test("ivf-pq at working settings: partial probe + bounded rerank recall") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 2)
    val flat = cents.flatMap { v =>
      val n = math.sqrt(v.map(x => x * x).sum); if (n == 0) v else v.map(_ / n)
    }
    val cb = AnnSearch.pqFitCodebook(emb, "embedding", dim = 64, m = 16,
      ksub = 16, iters = 2)
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = AnnSearch.ivfPqTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, flat, nProbe = 4, codebook = cb, m = 16, ksub = 16, rerank = 40)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"ivf-pq recall@10 = $recall at nProbe 4/8, rerank 40")
    // full probe + full rerank must equal brute force exactly
    val n = emb.count().toInt
    val exact = AnnSearch.ivfPqTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, flat, nProbe = 8, codebook = cb, m = 16, ksub = 16, rerank = n)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == brute)
  }

  test("label assignment: knn and nearest-centroid recover separable clusters") {
    import spark.implicits._
    val dim = 8
    // three tight clusters around orthogonal axes, slight per-row jitter
    def cluster(label: Int, axis: Int, n: Int, base: Long) =
      (0 until n).map { i =>
        val v = Array.fill(dim)(0.01f * ((i + label) % 3))
        v(axis) = 1.0f
        (base + i, v.toSeq, label)
      }
    val rows = cluster(0, 0, 8, 0L) ++ cluster(1, 3, 8, 100L) ++
      cluster(2, 6, 8, 200L)
    val emb = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val truth = rows.map(r => r._1 -> r._3.toLong).toMap
    val knn = AnnSearch.knnLabel(emb, emb, "embedding", "vec_id", "label", 5)
      .select($"query_id", $"label_pred").as[(Long, Long)].collect().toMap
    assert(knn.size == rows.size)
    assert(knn.forall { case (id, p) => truth(id) == p },
      s"knn mislabeled: ${knn.filter { case (id, p) => truth(id) != p }}")
    val cent = AnnSearch.nearestCentroidLabel(emb, "embedding", "vec_id",
        "label", dim)
      .select($"vec_id", $"label_pred").as[(Long, Long)].collect().toMap
    assert(cent.forall { case (id, p) => truth(id) == p },
      s"centroid mislabeled: ${cent.filter { case (id, p) => truth(id) != p }}")
    // deterministic across runs
    val again = AnnSearch.nearestCentroidLabel(emb, "embedding", "vec_id",
        "label", dim)
      .select($"vec_id", $"label_pred").as[(Long, Long)].collect().toMap
    assert(cent == again)
  }

  test("codes are m BYTES — the 32x-at-dim-64 compression unit") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
    val cb = AnnSearch.pqCodebookMd5Int(64, 8, 16)
    val codes = emb.select(graft.fuzzy.vectorFunctions.pq_encode_int(
        col("embedding"), cb, 8, 16, 64).as("c"))
      .collect().map(_.getAs[Array[Byte]](0).map(_ & 0xff))
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
  }

  test("refitPqOnDrift: quiet monitor keeps the serving pair untouched; " +
    "real drift refits atomically; a gate-rejected refit is kept out") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val servingCb = AnnSearch.pqFitCodebook(emb, "embedding", dim = 64,
      m = 8, ksub = 16, iters = 2)
    val servingCodes = AnnSearch.pqEncodeCorpus(emb, "embedding", "vec_id",
      64, servingCb, 8, 16)
    val gate = emb.where(col("vec_id") < 10)

    // arm 1 — monitor quiet (old == new): no fit, no encode, no gate
    val same = AnnSearch.refitPqOnDrift(servingCb, servingCodes, emb, emb,
      "embedding", "vec_id", dim = 64, m = 8, ksub = 16, iters = 2,
      groupCols = Seq("label"), driftTau = 1.0,
      gateQueries = gate, gateK = 10, gateRerank = 1000000, minMeanRecall = 0.99)
    assert(!same.drifted && !same.swapped && same.l2Move == 0.0)
    assert(same.gateRecall == -1.0, "gate must not run when the monitor is quiet")
    assert(same.codebook eq servingCb, "serving codebook must be returned as-is")
    assert(same.codes eq servingCodes, "serving codes must be returned as-is")

    // planted covariate shift: exact float +0.25 per component (the
    // oracled ann_drift_refit_pq fixture) -> per-label drift ~2.0
    val shifted = emb.withColumn("embedding",
      transform(col("embedding"), v => v + lit(0.25f)))
    val shiftedGate = shifted.where(col("vec_id") < 10)

    // arm 2 — drift + exhaustive gate: refit accepted; the served state
    // (new codebook + new-corpus codes, swapped atomically) at full
    // rerank equals brute force over the new corpus
    val ok = AnnSearch.refitPqOnDrift(servingCb, servingCodes, emb, shifted,
      "embedding", "vec_id", dim = 64, m = 8, ksub = 16, iters = 2,
      groupCols = Seq("label"), driftTau = 1.0,
      gateQueries = shiftedGate, gateK = 10, gateRerank = 1000000,
      minMeanRecall = 0.99)
    assert(ok.drifted && ok.swapped && ok.l2Move > 1.9 && ok.l2Move < 2.1,
      s"drift=${ok.l2Move}")
    assert(ok.gateRecall == 1.0, s"full rerank must gate at exactly 1.0: ${ok.gateRecall}")
    assert(!(ok.codebook eq servingCb) && !(ok.codes eq servingCodes),
      "swap must serve the refit pair, not the old one")
    val served = AnnSearch.pqTopKFromCodes(shiftedGate, ok.codes, shifted,
        "embedding", "vec_id", 10, 64, ok.codebook, 8, 16, rerank = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = AnnSearch.bruteForceTopK(shiftedGate, shifted,
        "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == brute)

    // arm 3 — drift but the refit cannot EARN the swap (recall bar above
    // what any index can score): serving pair kept, refit discarded
    val rejected = AnnSearch.refitPqOnDrift(servingCb, servingCodes, emb, shifted,
      "embedding", "vec_id", dim = 64, m = 8, ksub = 16, iters = 2,
      groupCols = Seq("label"), driftTau = 1.0,
      gateQueries = shiftedGate, gateK = 10, gateRerank = 1000000,
      minMeanRecall = 1.01)
    assert(rejected.drifted && !rejected.swapped)
    assert(rejected.gateRecall >= 0.0 && rejected.gateRecall <= 1.0)
    assert(rejected.codebook eq servingCb)
    assert(rejected.codes eq servingCodes)

    // arm 4 — empty gate set must hard-error (a 0-scored gate would
    // reject every refit forever, silently)
    val e = intercept[IllegalArgumentException] {
      AnnSearch.refitPqOnDrift(servingCb, servingCodes, emb, shifted,
        "embedding", "vec_id", dim = 64, m = 8, ksub = 16, iters = 2,
        groupCols = Seq("label"), driftTau = 1.0,
        gateQueries = shiftedGate.where(col("vec_id") < 0),
        gateK = 10, gateRerank = 1000000, minMeanRecall = 0.99)
    }
    assert(e.getMessage.contains("gateQueries"), e.getMessage)
  }
}
