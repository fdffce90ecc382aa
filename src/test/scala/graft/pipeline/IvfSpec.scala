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

  test("fit-once centroids reused across searches match the fit-per-call path") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 3)
    val flat = AnnSearch.normalizeCentroids(cents)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val q1 = emb.where(col("vec_id") < 20)
    val q2 = emb.where(col("vec_id") >= 20 && col("vec_id") < 40)
    // two searches against ONE fitted quantizer ≡ the fit-per-call results
    assert(key(AnnSearch.ivfTopKWithCentroids(q1, emb, "embedding", "vec_id", 10, 64, flat, 8)) ==
      key(AnnSearch.ivfTopK(q1, emb, "embedding", "vec_id", 10, 64, nCells = 8, nProbe = 8, iters = 3)))
    assert(key(AnnSearch.ivfTopKWithCentroids(q2, emb, "embedding", "vec_id", 10, 64, flat, 8)) ==
      key(AnnSearch.ivfTopK(q2, emb, "embedding", "vec_id", 10, 64, nCells = 8, nProbe = 8, iters = 3)))
  }

  test("persisted quantizer round-trips and searches identically") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 3)
    val flat = AnnSearch.normalizeCentroids(cents)
    val path = java.nio.file.Files.createTempDirectory("ivf_index")
      .resolve("centroids").toString
    AnnSearch.saveCentroids(spark, path, flat, 64)
    val (loaded, dim) = AnnSearch.loadCentroids(spark, path)
    assert(dim == 64)
    assert(loaded.toSeq == flat.toSeq, "centroids must round-trip bit-exactly")
    val q = emb.where(col("vec_id") < 20)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(key(AnnSearch.ivfTopKWithCentroids(q, emb, "embedding", "vec_id", 10, dim, loaded, 8)) ==
      key(AnnSearch.ivfTopKWithCentroids(q, emb, "embedding", "vec_id", 10, 64, flat, 8)))
  }

  test("sampled fit keeps recall parity with the full fit") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallWith(cap: Long): Double = {
      val flat = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 3,
          fitSampleCap = cap)
        .flatMap { v =>
          val n = math.sqrt(v.map(x => x * x).sum); if (n == 0) v else v.map(_ / n)
        }
      val ivf = AnnSearch.ivfTopKWithCentroids(queries, emb, "embedding", "vec_id",
          10, 64, flat, nProbe = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(brute).size.toDouble / brute.size
    }
    // cap >= corpus: the sampled path must be bit-inert (exact legacy fit);
    // cap = 200 of 800: iterations fit on ~1/4 of the corpus + one full
    // re-centering pass — recall must hold within noise of the full fit
    val full = recallWith(1_000_000L)
    val sampled = recallWith(200L)
    assert(full >= 0.7, s"full-fit recall $full below the fixture floor")
    assert(sampled >= full - 0.1,
      s"sampled-fit recall $sampled fell more than 0.1 below full-fit $full")
  }

  test("sampled fit is deterministic across invocations") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def fit() = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 2,
      fitSampleCap = 200L).map(_.toSeq).toSeq
    assert(fit() == fit())
  }

  test("postings append against a frozen quantizer equals a from-scratch build") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = AnnSearch.kmeansFit(emb.where(col("vec_id") >= 250), "embedding",
      dim = 64, k = 8, iters = 2)
    val flat = AnnSearch.normalizeCentroids(cents)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("corpus_id"), col("__cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val base = AnnSearch.ivfPostings(emb.where(col("vec_id") >= 250),
      "embedding", "vec_id", 64, flat)
    val appended = AnnSearch.ivfAppendPostings(base,
      emb.where(col("vec_id") < 250), "embedding", "vec_id", 64, flat)
    val scratch = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat)
    // frozen centroids: appending a batch must yield the identical cell
    // assignment a full rebuild would — union order is the only difference
    assert(cells(appended) == cells(scratch))
    // and a partial-probe search from the appended postings equals the
    // same search through the one-shot API with the same centroids
    val viaPostings = AnnSearch.ivfTopKFromPostings(
        emb.where(col("vec_id") < 5), appended, "embedding", "vec_id", 10,
        dim = 64, flat, nProbe = 2)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = AnnSearch.ivfTopKWithCentroids(
        emb.where(col("vec_id") < 5), emb, "embedding", "vec_id", 10,
        dim = 64, flat, nProbe = 2)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaPostings.nonEmpty && viaPostings == direct)
  }

  test("persisted postings: cell partitioning prunes the probe scan") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 2)
    val flat = AnnSearch.normalizeCentroids(cents)
    val path = java.nio.file.Files.createTempDirectory("postings").toString
    AnnSearch.savePostings(
      AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat), path)
    val loaded = AnnSearch.loadPostings(spark, path)
    // round trip preserves the assignment
    val orig = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat)
      .select(col("corpus_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val back = loaded.select(col("corpus_id"), col("__cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(back == orig)
    // a probe that filters cells must PRUNE partitions at the scan — the
    // storage layer does the inverted-file lookup
    val probe = loaded.where(col("__cell").isin(1, 3))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("cell#") || plan.contains("cast(cell")),
      s"probe filter did not reach partition pruning:\n$plan")
    // and the search through loaded postings equals the in-memory one
    val q = emb.where(col("vec_id") < 5)
    val a = AnnSearch.ivfTopKFromPostings(q, loaded, "embedding", "vec_id",
        10, 64, flat, nProbe = 2)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = AnnSearch.ivfTopKFromPostings(q,
        AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, flat),
        "embedding", "vec_id", 10, 64, flat, nProbe = 2)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a.nonEmpty && a == b)
  }

  test("refitOnDrift: no drift keeps the serving state untouched; real " +
    "drift refits; a refit that fails the ranking gate is rejected") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val servingFlat = AnnSearch.normalizeCentroids(
      AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 2))
    val servingPosts = AnnSearch.ivfPostings(emb, "embedding", "vec_id", 64, servingFlat)
    val gate = emb.where(col("vec_id") < 10)

    // arm 1 — monitor quiet (old == new): nothing runs, state unchanged
    val same = AnnSearch.refitOnDrift(servingFlat, servingPosts, emb, emb,
      "embedding", "vec_id", dim = 64, nCells = 8, iters = 2,
      groupCols = Seq("label"), driftTau = 1.0,
      gateQueries = gate, gateK = 10, gateNProbe = 8, minMeanRecall = 0.99)
    assert(!same.drifted && !same.swapped && same.l2Move == 0.0)
    assert(same.gateRecall == -1.0, "gate must not run when the monitor is quiet")
    assert(same.centroids eq servingFlat, "serving centroids must be returned as-is")
    assert(same.postings eq servingPosts, "serving postings must be returned as-is")

    // planted covariate shift: exact float +0.25 per component (the
    // oracled ann_drift_refit fixture) -> per-label drift ~2.0
    val shifted = emb.withColumn("embedding",
      transform(col("embedding"), v => v + lit(0.25f)))
    val shiftedGate = shifted.where(col("vec_id") < 10)

    // arm 2 — drift + full-probe gate: refit accepted, served result over
    // the NEW corpus equals brute force over it
    val ok = AnnSearch.refitOnDrift(servingFlat, servingPosts, emb, shifted,
      "embedding", "vec_id", dim = 64, nCells = 8, iters = 2,
      groupCols = Seq("label"), driftTau = 1.0,
      gateQueries = shiftedGate, gateK = 10, gateNProbe = 8, minMeanRecall = 0.99)
    assert(ok.drifted && ok.swapped && ok.l2Move > 1.9 && ok.l2Move < 2.1,
      s"drift=${ok.l2Move}")
    assert(ok.gateRecall == 1.0, s"full probe must gate at exactly 1.0: ${ok.gateRecall}")
    val served = AnnSearch.ivfTopKFromPostings(shiftedGate, ok.postings,
        "embedding", "vec_id", 10, 64, ok.centroids, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = AnnSearch.bruteForceTopK(shiftedGate, shifted,
        "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == brute)

    // arm 3 — drift but the refit cannot EARN the swap: a 1-cell probe
    // against an impossible recall bar keeps the old serving state
    val rejected = AnnSearch.refitOnDrift(servingFlat, servingPosts, emb, shifted,
      "embedding", "vec_id", dim = 64, nCells = 8, iters = 2,
      groupCols = Seq("label"), driftTau = 1.0,
      gateQueries = shiftedGate, gateK = 10, gateNProbe = 1, minMeanRecall = 0.99)
    assert(rejected.drifted && !rejected.swapped,
      s"recall=${rejected.gateRecall} must be below the 0.99 bar")
    assert(rejected.gateRecall >= 0.0 && rejected.gateRecall < 0.99)
    assert(rejected.centroids eq servingFlat)
    assert(rejected.postings eq servingPosts)

    // arm 4 — an EMPTY gate set would score 0 and reject every refit
    // forever; must hard-error instead of silently keeping a stale index
    val e = intercept[IllegalArgumentException] {
      AnnSearch.refitOnDrift(servingFlat, servingPosts, emb, shifted,
        "embedding", "vec_id", dim = 64, nCells = 8, iters = 2,
        groupCols = Seq("label"), driftTau = 1.0,
        gateQueries = shiftedGate.where(col("vec_id") < 0),
        gateK = 10, gateNProbe = 8, minMeanRecall = 0.99)
    }
    assert(e.getMessage.contains("gateQueries"), e.getMessage)
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
