package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Oracle: the naive cross+filter join the binned plan must reproduce. */
  private def naive(points: Seq[(String, Long, Long)],
                    intervals: Seq[(String, Long, Long, Long)],
                    keyed: Boolean): Set[(Long, Long)] =
    (for {
      (pk, ts, pid) <- points
      (ik, s, e, iid) <- intervals
      if (!keyed || pk == ik) && s <= ts && ts <= e
    } yield (pid, iid)).toSet

  private def run(points: Seq[(String, Long, Long)],
                  intervals: Seq[(String, Long, Long, Long)],
                  keys: Seq[String], binWidth: Long,
                  maxBins: Int = 4096): Set[(Long, Long)] =
    RangeJoin.pointInInterval(
        points.toDF("k", "ts", "pid"),
        intervals.toDF("k", "s", "e", "iid").withColumnRenamed("k", "k2")
          .withColumnRenamed("k2", if (keys.isEmpty) "k_unused" else "k"),
        keys, "ts", "s", "e", Seq("iid"), binWidth, maxBins)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  private val rnd = new Random(42)
  private val randPoints = Seq.tabulate(300) { i =>
    (s"k${rnd.nextInt(4)}", rnd.nextLong() % 1000L, i.toLong) // negatives included
  }
  private val randIntervals = Seq.tabulate(80) { i =>
    val s = rnd.nextLong() % 1000L
    (s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(120).toLong, 1000L + i)
  }

  test("keyed containment matches the naive cross+filter oracle (negatives included)") {
    for (w <- Seq(1L, 7L, 64L, 10000L))
      assert(run(randPoints, randIntervals, Seq("k"), w) ===
        naive(randPoints, randIntervals, keyed = true), s"binWidth=$w")
  }

  test("keyless (global intervals) matches the naive oracle at several bin widths") {
    for (w <- Seq(13L, 100L))
      assert(run(randPoints, randIntervals, Seq.empty, w) ===
        naive(randPoints, randIntervals, keyed = false), s"binWidth=$w")
  }

  test("bounds are inclusive on both ends and empty intervals match nothing") {
    val pts = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 15L, 3L), ("a", 9L, 4L),
      ("a", 21L, 5L))
    val ivs = Seq(("a", 10L, 20L, 100L), ("a", 30L, 25L, 101L)) // second: start > end
    assert(run(pts, ivs, Seq("k"), 8L) === Set((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("each qualifying pair emerges exactly once (no dedup pass needed)") {
    val pts = Seq(("a", 50L, 1L))
    val ivs = Seq(("a", 0L, 100L, 100L)) // spans many bins at width 7
    val rows = RangeJoin.pointInInterval(pts.toDF("k", "ts", "pid"),
      ivs.toDF("k", "s", "e", "iid"), Seq("k"), "ts", "s", "e", Seq("iid"), 7L)
      .collect()
    assert(rows.length === 1)
  }

  test("point columns pass through; payload attaches; internal columns dropped") {
    val out = RangeJoin.pointInInterval(
      Seq(("a", 5L, 1L)).toDF("k", "ts", "pid"),
      Seq(("a", 0L, 9L, 7L)).toDF("k", "s", "e", "iid"),
      Seq("k"), "ts", "s", "e", Seq("iid"), 4L)
    assert(out.columns.toSeq === Seq("k", "ts", "pid", "iid"))
  }

  test("plan has no nested-loop or cartesian join (the whole point)") {
    // parquet-backed so the optimized plan is real (a local relation folds)
    val dir = java.nio.file.Files.createTempDirectory("rj").toString
    Seq(("a", 5L, 1L)).toDF("k", "ts", "pid").write.mode("overwrite")
      .parquet(s"$dir/p")
    Seq(("a", 0L, 9L, 7L)).toDF("k", "s", "e", "iid").write.mode("overwrite")
      .parquet(s"$dir/i")
    for (keys <- Seq(Seq("k"), Seq.empty[String])) {
      val plan = RangeJoin.pointInInterval(spark.read.parquet(s"$dir/p"),
          spark.read.parquet(s"$dir/i"), keys, "ts", "s", "e", Seq("iid"), 4L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"keys=$keys:\n$plan")
    }
  }

  test("runaway interval fails inside the projection with a clear message") {
    val err = intercept[Exception] {
      run(Seq(("a", 5L, 1L)), Seq(("a", 0L, 1000000L, 9L)), Seq("k"),
        binWidth = 1L, maxBins = 100)
    }
    assert(err.getMessage.contains("bins"), err.getMessage)
  }

  test("interval overlap matches the naive oracle, once per pair, negatives included") {
    val ls = Seq.tabulate(60) { i =>
      val s = rnd.nextLong() % 500L; (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(90).toLong, i.toLong)
    }
    val rs = Seq.tabulate(60) { i =>
      val s = rnd.nextLong() % 500L; (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(90).toLong, 500L + i)
    }
    val expect = (for {
      (lk, l0, l1, lid) <- ls; (rk, r0, r1, rid) <- rs
      if lk == rk && l0 <= r1 && r0 <= l1
    } yield (lid, rid)).toSet
    for (w <- Seq(16L, 128L)) {
      val got = RangeJoin.intervalOverlap(
          ls.toDF("k", "l0", "l1", "lid"), rs.toDF("k", "r0", "r1", "rid"),
          Seq("k"), "l0", "l1", "r0", "r1", Seq("rid"), w)
        .select($"lid", $"rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet === expect, s"binWidth=$w")
    }
  }
}
