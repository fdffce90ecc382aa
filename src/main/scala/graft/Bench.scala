package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.fuzzy.{FuzzyAlgorithm, FuzzyMapping, FuzzyMatcher, MatchOptions}
import graft.pipeline.{AnnSearch, Dedup}

/** Headline benchmarks mirroring BASELINE.md's measured rows.
  *
  * The reference's benchmark workload is a single levenshtein@75 mapping
  * over unique name strings (BASELINE.md); the comparable unique-string
  * columns in the driver testdata are customer/part names, subset by key
  * ranges to reproduce the baseline's cardinalities:
  *   - exact_80m  : 10k x 8k  forced cross join   (baseline 18.67 s)
  *   - exact_150m : 15k x 10k forced cross join   (baseline 40.82 s)
  *   - auto_150m  : 15k x 10k auto -> ANN         (baseline 1.45 s)
  *   - auto_300m  : 15k x 20k auto -> ANN (above 1e8 crossover)
  * plus the pipeline operators' scale demos on documents/embeddings.
  */
object Bench {

  /** Single levenshtein mapping like the baseline workload. Threshold 90 on
    * the 18-char synthetic names means "differ in at most one character" —
    * ~0.4% match rate, comparable to the reference's typo'd-name corpora
    * (threshold 75 on this data degenerately matches EVERY pair). */
  private def lev90(left: DataFrame, right: DataFrame, lc: String, rc: String,
                    opts: MatchOptions): DataFrame =
    FuzzyMatcher.matchDfs(left, right,
      Seq(FuzzyMapping(lc, rc, 90.0, FuzzyAlgorithm.Levenshtein)), opts)

  def benchQueries(sfDir: String): Map[String, SparkSession => DataFrame] = Map(
    "fuzzy_exact_80m" -> (s => {
      val c = s.read.parquet(s"$sfDir/customer.parquet").where(col("c_custkey") < 10000)
      val c2 = s.read.parquet(s"$sfDir/customer.parquet").where(col("c_custkey") < 8000)
      lev90(c, c2, "c_name", "c_name", MatchOptions(useApproxNearestNeighbor = Some(false)))
    }),
    "fuzzy_exact_225m" -> (s => {
      val c = s.read.parquet(s"$sfDir/customer.parquet")
      lev90(c, c, "c_name", "c_name", MatchOptions(useApproxNearestNeighbor = Some(false)))
    }),
    "fuzzy_auto_225m" -> (s => {
      val c = s.read.parquet(s"$sfDir/customer.parquet")
      lev90(c, c, "c_name", "c_name", MatchOptions())
    }),
    "dedup_minhash_docs" -> (s =>
      Dedup.minhashLshPairs(s.read.parquet(s"$sfDir/documents.parquet"),
        "text", "doc_id", shingleLen = 3, numBands = 16, rowsPerBand = 4, threshold = 0.4)),
    "dedup_exact_docs" -> (s =>
      Dedup.exactDedup(s.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id")),
    "ann_topk_embeddings" -> (s => {
      val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
      AnnSearch.bruteForceTopK(emb.where(col("vec_id") < 100), emb, "embedding", "vec_id", 10)
    }),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JIT/codegen warmup at the smallest scale factor: identical plans and
    // generated code, negligible data — measured runs then reflect steady
    // state instead of first-query compilation noise.
    benchQueries("/root/testdata/sf0.001").toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark).count() catch { case _: Throwable => }
    }

    val results = benchQueries(sfDir).toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $sec%8.2f s  rows=$n")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
