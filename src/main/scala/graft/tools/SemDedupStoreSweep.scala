package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{AnnSearch, Dedup}

/** nCells × batch-size pricing sweep for the cell-partitioned stored
  * SemDeDup state — the [[HammingStoreSweep]]/[[MinhashStoreSweep]]
  * recipe applied to the embedding near-dup store, so the TUNING.md row
  * for `saveSemDedupState` carries measured numbers.
  *
  * The dimension that matters here is nCells: the store prunes reads to
  * the batch's TOUCHED cells, so its win over the in-memory form (which
  * scans the whole state frame per trigger) is ~touched/nCells — with
  * the demo's 8 cells a 1000-row batch touches everything and the store
  * can only lose (by its read indirection); with nCells sized like an
  * IVF index (≈ √corpus and up) the batch touches a small fraction.
  * This sweep makes that crossover measurable instead of asserted.
  *
  * Corpus: sf0.1 embeddings replicated with the [[ScaleGen]] sign-flip
  * (within-replica cosine structure preserved, cross-replica similarity
  * destroyed) to `replicas × 2000` vectors. For nCells ∈ {8, 64, 256}
  * the sweep k-means-fits that many centroids (sampled fit), times
  * [[Dedup.saveSemDedupState]] once, and
  * [[Dedup.semDedupPairsAgainstStored]] min-of-3 at batch ∈ {10, 100,
  * 1000}, against the in-memory [[Dedup.semDedupState]] +
  * [[Dedup.semDedupIncrementalPairs]] baseline on the SAME centroids.
  * Batch rows are corpus vectors re-keyed past the id range (same
  * values), so every row has a guaranteed cosine-1.0 partner and the
  * exact-cosine verify half does real work.
  *
  * Output: one JSON line per (form, nCells, batchRows) with build/query
  * seconds.
  *
  * Usage: runMain graft.tools.SemDedupStoreSweep [replicas=100] [nCells=8,64,256]
  */
object SemDedupStoreSweep {

  /** [[ScaleGen.signFlip]] (private there) with the replica index as a
    * COLUMN, so any replica count is one explode instead of an N-way
    * union: flips a deterministic, replica-dependent sign pattern onto
    * the vector. Unlike ScaleGen, replica 0 is ALSO sign-flipped here
    * (no r==0 special case — half its dimensions negate), so no replica
    * equals the raw sf0.1 vectors; only cross-replica decorrelation
    * matters for the sweep, and within-replica cosine structure is
    * preserved exactly. */
  private def signFlip(vec: Column, r: Column): Column =
    transform(vec, (x, i) =>
      x * when((((i + 1) * (r + 1)) % 101 % 2) === 0, lit(-1.0f)).otherwise(lit(1.0f)))

  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(100)
    val cellTiers = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 64, 256))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = base
      .withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("vec_id") + col("r") * 10_000_000L).as("vec_id"),
        signFlip(col("embedding"), col("r")).as("embedding"))
      .repartition(32).localCheckpoint()
    val corpusRows = corpus.count()
    System.err.println(s"[sweep] corpus rows: $corpusRows")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def batch(n: Int): DataFrame = corpus.limit(n)
      .select((col("vec_id") + lit(2_000_000_000_000L)).as("vec_id"),
        col("embedding"))
      .localCheckpoint()
    val batchSizes = Seq(10, 100, 1000)
    val batches = batchSizes.map(n => n -> batch(n)).toMap
    val thr = 0.85

    for (nCells <- cellTiers) {
      val (cents, fitSec) = timed(Dedup.quantizeCentroidsMicro(
        AnnSearch.kmeansFit(corpus, "embedding", dim = 64, k = nCells,
          iters = 2)))

      // in-memory baseline: state build (semDedupState materializes
      // internally — a chained localCheckpoint would double-pay the
      // build and inflate memBuildSec) + incremental query scanning the
      // WHOLE state per call
      val (mem, memBuildSec) = timed(Dedup.semDedupState(
        corpus, "embedding", "vec_id", cents, dim = 64, nCells = nCells))
      for (n <- batchSizes) {
        val runs = (1 to 3).map { _ =>
          timed(Dedup.semDedupIncrementalPairs(batches(n), mem,
            "embedding", "vec_id", cents, dim = 64, nCells = nCells,
            threshold = thr).count())
        }
        println(s"""{"form":"memory","n_cells":$nCells,"corpus_rows":$corpusRows,""" +
          s""""fit_sec":${f"$fitSec%.2f"},"build_sec":${f"$memBuildSec%.2f"},""" +
          s""""batch_rows":$n,"pairs":${runs.head._1},""" +
          s""""query_sec":${runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")}}""")
      }

      val path = java.nio.file.Files
        .createTempDirectory(s"sem_sweep_$nCells").toString
      val (_, saveSec) = timed(Dedup.saveSemDedupState(
        corpus, "embedding", "vec_id", path, cents, dim = 64,
        nCells = nCells))
      val stored = Dedup.loadSemDedupState(spark, path)
      for (n <- batchSizes) {
        val runs = (1 to 3).map { _ =>
          timed(Dedup.semDedupPairsAgainstStored(batches(n), "embedding",
            "vec_id", stored, threshold = thr).count())
        }
        println(s"""{"form":"stored","n_cells":$nCells,"corpus_rows":$corpusRows,""" +
          s""""fit_sec":${f"$fitSec%.2f"},"build_sec":${f"$saveSec%.2f"},""" +
          s""""batch_rows":$n,"pairs":${runs.head._1},""" +
          s""""query_sec":${runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")}}""")
      }
      mem.unpersist()
    }
    spark.stop()
  }
}
