package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** nBuckets × batch-size pricing sweep for the bucket-partitioned stored
  * hamming state (VERDICT r13 item 6): the round-13 measurement showed
  * 500×4 chunk keys touching ~all 64 default buckets — pruning only pays
  * when nBuckets ≫ touched keys — but measured only one store size and
  * one bucket count. This sweep builds a ~500k-hash corpus (the sf0.1
  * documents replicated with per-replica hash salts: the store only sees
  * (id, hash64) rows, so salted replicas ARE the 100× corpus), then for
  * nBuckets ∈ {64, 256, 1024} times [[Dedup.saveHammingState]] once and
  * [[Dedup.hashPairsAgainstStored]] min-of-3 at batch ∈ {5, 50, 500,
  * 5000}, against the in-memory [[Dedup.hammingState]] baseline at the
  * same batch sizes. Each batch row is a corpus twin with one flipped
  * bit, so the verify half does real work and emits ≥1 pair per row.
  * (Touched-bucket pruning itself is spec-asserted via PartitionFilters;
  * this sweep prices it.)
  *
  * Output: one JSON line per (form, nBuckets, batchRows) with save/query
  * seconds — the TUNING.md sizing-rule table.
  *
  * Usage: runMain graft.tools.HammingStoreSweep [replicas=100]
  */
object HammingStoreSweep {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // 100 salted replicas of 5k docs = 500k (id, hash) rows; xxhash64 of
    // (text, salt) decorrelates replicas, exactly like a real perceptual-
    // hash corpus at that scale
    val corpus = docs.crossJoin(
        spark.range(replicas).select(col("id").as("__r")))
      .select((col("doc_id") * replicas + col("__r")).as("asset_id"),
        xxhash64(col("text"), col("__r")).as("h64"))
      .localCheckpoint()
    val corpusRows = corpus.count()
    System.err.println(s"[sweep] corpus rows: $corpusRows")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // batch: corpus sample re-keyed past the id range, one bit flipped —
    // every row has a guaranteed hamming-1 twin
    def batch(n: Int): DataFrame = corpus.limit(n)
      .select((col("asset_id") + lit(2_000_000_000_000L)).as("doc_id"),
        col("h64").bitwiseXOR(lit(1L << 11)).as("h64"))
      .localCheckpoint()
    val batchSizes = Seq(5, 50, 500, 5000)
    val batches = batchSizes.map(n => n -> batch(n)).toMap

    // in-memory baseline
    val (mem, memBuildSec) = timed(
      Dedup.hammingState(corpus, col("h64"), "asset_id", maxHamming = 3))
    for (n <- batchSizes) {
      val runs = (1 to 3).map { _ =>
        timed(Dedup.hashPairsAgainstState(batches(n), col("h64"), "doc_id", mem)
          .count())
      }
      println(s"""{"form":"memory","n_buckets":0,"corpus_rows":$corpusRows,""" +
        s""""build_sec":${f"$memBuildSec%.2f"},"batch_rows":$n,""" +
        s""""pairs":${runs.head._1},"query_sec":${runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")}}""")
    }

    for (nBuckets <- Seq(64, 256, 1024)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"ham_sweep_$nBuckets").toString
      val (_, saveSec) = timed(Dedup.saveHammingState(
        corpus, col("h64"), "asset_id", path, maxHamming = 3,
        nBuckets = nBuckets))
      val stored = Dedup.loadHammingState(spark, path)
      for (n <- batchSizes) {
        val runs = (1 to 3).map { _ =>
          timed(Dedup.hashPairsAgainstStored(batches(n), col("h64"), "doc_id",
            stored).count())
        }
        println(s"""{"form":"stored","n_buckets":$nBuckets,"corpus_rows":$corpusRows,""" +
          s""""build_sec":${f"$saveSec%.2f"},"batch_rows":$n,""" +
          s""""pairs":${runs.head._1},"query_sec":${runs.map(r => f"${r._2}%.2f").mkString("[", ",", "]")}}""")
      }
    }
    spark.stop()
  }
}
