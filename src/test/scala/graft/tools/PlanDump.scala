package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.fuzzy.{FuzzyAlgorithm, FuzzyMatcher, MatchOptions}

/** Commit-able `.explain("formatted")` capture for the optimization rounds:
  * writes `plans/<round>/<name>_<tag>.txt` for the bench's fuzzy rows and
  * for the scoring-join core they share.
  *
  * The fuzzy bench rows MATERIALIZE their per-pass match frames while the
  * query is being BUILT (checkpoint barriers), so the tail explain of a
  * full `matchDfs` shows only the assembly joins over checkpoint scans.
  * The plan that actually carries the runtime — candidate generation +
  * the scored cross join — is therefore captured separately via the same
  * public entry points the matcher uses (`freshCandidates` +
  * `scoreValuePairs`). Everything runs at sf0.001: plan SHAPE is
  * scale-independent, and dumping must not take bench-scale minutes.
  *
  * Usage: Test/runMain graft.tools.PlanDump <tag> [round]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val round = if (args.length > 1) args(1) else "r19"
    val outDir = Paths.get(s"/root/repo/plans/$round")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"

    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$tag.txt"),
        (s"-- $name @$sfDir ($tag)\n" + txt).getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$tag.txt (${txt.length} chars)")
    }

    val c = spark.read.parquet(s"$sfDir/customer.parquet")

    // ---- the scoring-join core (exact path): distinct values -> projected
    // sides -> cross join -> bounded kernel (+ mask gate after r19) ----
    val l = c.select(col("c_name"))
    val r = c.select(col("c_name").as("r_name"))
    // the path the matcher actually takes since r20: the fused broadcast
    // sweep (freshScoredValuePairs) — before-plans show the BNLJ shape it
    // replaced (freshCandidates + scoreValuePairs)
    dump("scoring_join_exact",
      FuzzyMatcher.freshScoredValuePairs(l, r,
        graft.fuzzy.FuzzyMapping("c_name", "r_name", 90.0,
          FuzzyAlgorithm.Levenshtein),
        MatchOptions(useApproxNearestNeighbor = Some(false)))._1)

    // ---- the LSH candidate pipeline core (band join -> dedup -> jaccard
    // gate -> topN) + its scored verify join ----
    val opts = MatchOptions(lshNumBands = 12, lshRowsPerBand = 5,
      useApproxNearestNeighbor = Some(true))
    val lshCands = FuzzyMatcher.freshCandidates(l, r, "c_name", "r_name", opts, 0.1)
    dump("lsh_candidates", lshCands)
    dump("scoring_join_lsh",
      FuzzyMatcher.scoreValuePairs(lshCands, "c_name", "r_name",
        FuzzyAlgorithm.Levenshtein, 0.1))

    // ---- full bench queries (tail assembly plans; barriers make these
    // short, captured for completeness) ----
    val bq = graft.Bench.benchQueries(sfDir)
    Seq("fuzzy_exact_225m", "fuzzy_annf_3g_lsh", "text_bm25_docs").foreach { n =>
      dump(n, bq(n)(spark))
    }
    spark.stop()
  }
}
