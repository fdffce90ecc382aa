package graft.fuzzy

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence pin for the r20 broadcast-sweep scoring path: for exact
  * levenshtein passes, [[SweepScore]]/[[LevSweep]] must reproduce the BNLJ
  * candidate + mask-gate + bounded-kernel shape pair-for-pair and
  * score-for-score. The BNLJ reference path is forced by
  * `broadcastDistinctLimit = 0` (the sweep requires a broadcast-sized
  * side — the same condition under which the old shape broadcast it).
  */
class SweepSpec extends AnyFunSuite with SparkSpec {

  private def matchAll(left: DataFrame, right: DataFrame, opts: MatchOptions,
                       threshold: Double = 80.0): Seq[(String, String, Double)] = {
    import spark.implicits._
    FuzzyMatcher.matchDfs(left, right,
        Seq(FuzzyMapping("a", "b", threshold, FuzzyAlgorithm.Levenshtein)), opts)
      .select(col("a"), col("b"), col("a_vs_b_levenshtein"))
      .as[(String, String, Double)].collect().toSeq.sorted
  }

  private def corpus: (DataFrame, DataFrame) = {
    import spark.implicits._
    // mixed shapes: shared prefixes (strip path), case differences (lower
    // must match Spark's), non-ASCII values (generic-kernel tail + mask-0
    // gate disable), empty strings, equal values, length outliers (band
    // skip), and near-threshold pairs on both sides of the cutoff
    val base = Seq(
      "customer#0001", "customer#0002", "Customer#0001", "CUSTOMER#00x2",
      "alpha beta gamma", "alpha beta gamm", "alpha beta gamme",
      "übermensch", "ubermensch", "Übermensch!", "",
      "short", "shrt", "a", "b", "ab",
      "the quick brown fox", "the quick brown fix", "the quick brawn fox",
      "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx", "yyyy",
      "naïve approach", "naive approach", "données", "donnees")
    val l = base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "a")
    val r = (base.map(v => if (v.nonEmpty) v.dropRight(1) + "z" else "z") ++ base)
      .distinct.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "b")
    (l, r)
  }

  test("sweep path reproduces the BNLJ path: pairs and scores, thresholds 70-100") {
    val (l, r) = corpus
    for (t <- Seq(70.0, 80.0, 90.0, 100.0)) {
      val sweep = matchAll(l, r, MatchOptions(useApproxNearestNeighbor = Some(false)), t)
      val bnlj = matchAll(l, r,
        MatchOptions(useApproxNearestNeighbor = Some(false), broadcastDistinctLimit = 0L), t)
      assert(sweep == bnlj, s"sweep vs BNLJ mismatch at threshold $t")
      assert(sweep.nonEmpty, s"degenerate test corpus at threshold $t")
    }
  }

  test("sweep plan: Generate over the value frame, no join on the pair stream") {
    val (l, r) = corpus
    val lIdx = FuzzyMatcher.addIndexColumn(l, "__left_index")
    val rIdx = FuzzyMatcher.addIndexColumn(r, "__right_index")
    val (scored, usedLsh) = FuzzyMatcher.freshScoredValuePairs(lIdx, rIdx,
      FuzzyMapping("a", "b", 90.0, FuzzyAlgorithm.Levenshtein),
      MatchOptions(useApproxNearestNeighbor = Some(false)))
    assert(!usedLsh)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("lev_sweep"), s"sweep generator missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"sweep plan still carries the BNLJ:\n$plan")
  }

  test("non-levenshtein passes keep the BNLJ shape") {
    val (l, r) = corpus
    val lIdx = FuzzyMatcher.addIndexColumn(l, "__left_index")
    val rIdx = FuzzyMatcher.addIndexColumn(r, "__right_index")
    val (scored, _) = FuzzyMatcher.freshScoredValuePairs(lIdx, rIdx,
      FuzzyMapping("a", "b", 80.0, FuzzyAlgorithm.JaroWinkler),
      MatchOptions(useApproxNearestNeighbor = Some(false)))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("lev_sweep"), s"sweep must be levenshtein-only:\n$plan")
  }
}
