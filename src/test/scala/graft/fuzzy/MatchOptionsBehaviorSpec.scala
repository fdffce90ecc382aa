package graft.fuzzy

import java.nio.file.Files

import graft.SparkSpec
import graft.util.CheckpointStrategy
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 behavioral guarantees: checkpoint-strategy parity, forced-ANN
  * routing, and deterministic LSH top-N.
  */
class MatchOptionsBehaviorSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def multiPass(opts: MatchOptions): Set[(Long, Long)] = {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    FuzzyMatcher.matchDfs(c, c,
        Seq(
          FuzzyMapping("c_name", "c_name", 80.0, FuzzyAlgorithm.Levenshtein),
          FuzzyMapping("c_mktsegment", "c_mktsegment", 80.0, FuzzyAlgorithm.JaroWinkler)),
        opts)
      .select("c_custkey", "c_custkey_right")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
  }

  test("Reliable checkpoint strategy yields identical multi-pass results") {
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val local = multiPass(MatchOptions(useApproxNearestNeighbor = Some(false)))
    val reliable = multiPass(MatchOptions(useApproxNearestNeighbor = Some(false),
      checkpoint = CheckpointStrategy.Reliable(tmp)))
    assert(local.nonEmpty)
    assert(reliable == local)
  }

  test("eager entry point returns the same rows as the lazy one") {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val s = spark.read.parquet(s"$dir/supplier.parquet")
    val maps = Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein))
    val lazyRows = FuzzyMatcher.matchDfs(c, s, maps).collect().toSet
    val eagerRows = FuzzyMatcher.matchDfsEager(c, s, maps).collect().toSet
    assert(eagerRows == lazyRows)
    assert(eagerRows.nonEmpty)
  }

  test("Persist strategy yields identical single-pass results") {
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val s = spark.read.parquet(s"$dir/supplier.parquet")
    def run(opts: MatchOptions): Long =
      FuzzyMatcher.matchDfs(c, s,
        Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein)), opts).count()
    val local = run(MatchOptions(useApproxNearestNeighbor = Some(false)))
    val persisted = run(MatchOptions(useApproxNearestNeighbor = Some(false),
      checkpoint = CheckpointStrategy.Persist))
    assert(persisted == local)
  }

  test("Reliable checkpoint strategy yields identical results through the LSH path") {
    val tmp = Files.createTempDirectory("graft-ckpt-lsh").toString
    def run(opts: MatchOptions): Set[(Long, Long)] = {
      val c = spark.read.parquet(s"$dir/customer.parquet")
      val s = spark.read.parquet(s"$dir/supplier.parquet")
      FuzzyMatcher.matchDfs(c, s,
          Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein)), opts)
        .select("c_custkey", "s_suppkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val local = run(MatchOptions(useApproxNearestNeighbor = Some(true)))
    val reliable = run(MatchOptions(useApproxNearestNeighbor = Some(true),
      checkpoint = CheckpointStrategy.Reliable(tmp)))
    assert(local.nonEmpty)
    assert(reliable == local)
  }

  test("forced ANN never routes to the exact cross join, even on degenerate data") {
    import spark.implicits._
    // shared 10-char prefix + low diversity: the degeneracy probe WOULD
    // fall back in auto mode
    val vals = (0 until 200).map(i => (i.toLong, f"commonpref$i%03d"))
    val left = vals.toDF("lid", "k")
    val right = vals.toDF("rid", "g")
    val res = FuzzyMatcher.matchDfs(left, right,
      Seq(FuzzyMapping("k", "g", 90.0, FuzzyAlgorithm.Levenshtein)),
      MatchOptions(useApproxNearestNeighbor = Some(true), runPreprocess = false))
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "forced-ANN plan contains a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "forced-ANN plan contains a broadcast nested-loop (cross) join")
    // sanity: identical values must still match via LSH buckets
    assert(res.count() >= 200)
  }

  test("LSH top-N ranks unique pairs deterministically across runs") {
    import spark.implicits._
    // values designed to collide in MANY bands: long shared cores with a
    // one-char suffix tweak, so every pair surfaces from multiple bands
    val core = "abcdefghijklmnopqrstuvwxyz0123456789"
    val left = (0 until 8).map(i => s"$core-left$i").toDF("k")
    val right = (0 until 40).map(i => s"$core-rgt$i").toDF("g")
    val opts = MatchOptions(topNForNewMatches = 5, lshStopGramFraction = 1.1)
    def run(): Seq[(String, String)] =
      AnnJoin.candidates(left, right, "k", "g", opts, reversedThreshold = 0.3)
        .select("k", "g").collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    val a = run()
    val b = run()
    assert(a == b, "candidate set not stable across runs")
    // no pair may appear twice, and no left value may exceed top-N slots
    assert(a.distinct == a)
    a.groupBy(_._1).foreach { case (k, g) =>
      assert(g.size <= 5, s"left value $k got ${g.size} > topN slots")
    }
  }
}
