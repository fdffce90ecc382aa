package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** nBuckets × batch-size pricing sweep for the bucket-partitioned stored
  * MinHash state — the [[HammingStoreSweep]] recipe applied to the text
  * near-dup store, so the TUNING.md row for `saveMinhashState` carries
  * measured numbers instead of "same intuition as hamming".
  *
  * Corpus: the cipher-replica sf1 documents (`/tmp/graft_sf1`, 10
  * bijective-cipher replicas of sf0.1 = 50k docs whose cross-replica
  * similarity is destroyed — [[ScaleGen]]); regenerated from sf0.1 when
  * missing. For nBuckets ∈ {16, 64, 256} the sweep times
  * [[Dedup.saveMinhashState]] once and
  * [[Dedup.minhashPairsAgainstStored]] min-of-3 at batch ∈ {10, 100,
  * 1000}, against the in-memory [[Dedup.minhashState]] +
  * [[Dedup.minhashIncrementalPairs]] baseline at the same batch sizes.
  * Batch rows are corpus docs re-keyed past the id range (same text), so
  * every row has a guaranteed jaccard-1.0 partner and the verify half
  * does real work.
  *
  * Output: one JSON line per (form, nBuckets, batchRows) with
  * build/query seconds.
  *
  * Usage: runMain graft.tools.MinhashStoreSweep [corpusDir=/tmp/graft_sf1]
  * (pass /tmp/graft_sf10 for the 500k-doc tier — generate it first with
  * ScaleGen from /tmp/graft_sf1 at 10 replicas)
  */
object MinhashStoreSweep {
  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (corpusDir == "/tmp/graft_sf1" &&
      !new java.io.File(s"$corpusDir/documents.parquet").exists())
      ScaleGen.generate(spark, "/root/testdata/sf0.1", corpusDir, 10)
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val corpusRows = corpus.count()
    System.err.println(s"[sweep] corpus rows: $corpusRows")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def batch(n: Int): DataFrame = corpus.limit(n)
      .select((col("doc_id") + lit(2_000_000_000_000L)).as("doc_id"), col("text"))
      .localCheckpoint()
    val batchSizes = Seq(10, 100, 1000)
    val batches = batchSizes.map(n => n -> batch(n)).toMap
    val (bands, rows) = (16, 4)

    // in-memory baseline: state build (checkpointed, as a nightly job
    // holds it) + incremental query
    val (mem, memBuildSec) = timed(Dedup.minhashState(
      corpus, "text", "doc_id", shingleLen = 3, k = bands * rows)
      .localCheckpoint())
    for (n <- batchSizes) {
      val runs = (1 to 3).map { _ =>
        timed(Dedup.minhashIncrementalPairs(batches(n), mem, "text", "doc_id",
          shingleLen = 3, numBands = bands, rowsPerBand = rows,
          threshold = 0.7).count())
      }
      println(s"""{"form":"memory","n_buckets":0,"corpus_rows":$corpusRows,""" +
        s""""build_sec":${f"$memBuildSec%.2f"},"batch_rows":$n,""" +
        s""""pairs":${runs.head._1},"query_sec":${runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")}}""")
    }

    for (nBuckets <- Seq(16, 64, 256)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"mh_sweep_$nBuckets").toString
      val (_, saveSec) = timed(Dedup.saveMinhashState(
        corpus, "text", "doc_id", path, shingleLen = 3,
        numBands = bands, rowsPerBand = rows, nBuckets = nBuckets))
      val stored = Dedup.loadMinhashState(spark, path)
      for (n <- batchSizes) {
        val runs = (1 to 3).map { _ =>
          timed(Dedup.minhashPairsAgainstStored(batches(n), "text", "doc_id",
            stored, threshold = 0.7).count())
        }
        println(s"""{"form":"stored","n_buckets":$nBuckets,"corpus_rows":$corpusRows,""" +
          s""""build_sec":${f"$saveSec%.2f"},"batch_rows":$n,""" +
          s""""pairs":${runs.head._1},"query_sec":${runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")}}""")
      }
    }
    spark.stop()
  }
}
