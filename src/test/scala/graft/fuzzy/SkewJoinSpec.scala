package graft.fuzzy

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The one 100x-scale risk the round-5 audit would not sign off: the
  * exact-path row-expansion joins key on the RAW VALUE column
  * (FuzzyMatcher.processFuzzyMapping, fresh-pass arm) — a single hyper-hot
  * value (a default string, an empty-ish name surviving the null filter)
  * lands every one of its row ids in ONE reducer partition. The designed
  * mitigation is AQE skew-join splitting; this spec pins that the real
  * matchDfs path actually GETS the split (an AQEShuffleRead with partial
  * reducer partitions) on a 30%-hot corpus, rather than assuming it.
  *
  * Thresholds are scaled down in-session (512 KB / factor 2) because the
  * fixture is MBs, not the 100x-scale GBs where the production defaults
  * (256 MB / factor 5) fire on their own; the mechanism under test — skew
  * stats flow from the barrier'd LogicalRDD shuffle into
  * OptimizeSkewedJoin — is identical.
  */
class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val HotValue = "hot corporation intl aa"
  private val HotTypo = "hot corporation intl ab"

  test("30%-hot value: row-expansion join splits the skewed partition under AQE") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap

    val plans = ArrayBuffer.empty[org.apache.spark.sql.execution.SparkPlan]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }

    try {
      // simulate at-scale conditions: the scored frame exceeds any broadcast
      // threshold (-1 forces SMJ, as at 100x) and the skew thresholds are
      // scaled to the fixture's MB sizes
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // sizes here are COMPRESSED shuffle bytes: 30k identical hot strings
      // lz4 down to a few KB, so the thresholds must sit in KB territory
      // for the fixture (production keeps 256MB/5.0 — at 100x a hot key is
      // GBs even compressed)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1024")
      spark.listenerManager.register(listener)

      // 100k left rows, 30% sharing ONE value; 199 far-apart filler values
      val left = spark.range(100000).select(
        when(col("id") % 10 < 3, lit(HotValue))
          .otherwise(udfFreeFiller(col("id") % 199, "left")).as("name"))
      // right: one typo'd hot row (so the hot key survives scoring and the
      // expansion is real) + 20k unique values that match nothing
      val right = spark.range(20000).select(
        when(col("id") === 0, lit(HotTypo))
          .otherwise(udfFreeFiller(col("id"), "right")).as("name_t"))

      val out = FuzzyMatcher.matchDfs(left, right,
        Seq(FuzzyMapping("name", "name_t", 90.0, FuzzyAlgorithm.Levenshtein)),
        MatchOptions(useApproxNearestNeighbor = Some(false)))
      val rows = out.count()

      // every hot left row expands against the one matching right row
      assert(rows == 30000L, s"expected 30000 hot row pairs, got $rows")

      // the expansion joins run inside barrier jobs, so search EVERY plan
      // the session executed; listener delivery is async -> poll
      // query stages are LEAF nodes, so a plain collect never sees inside
      // them — descend through QueryStageExec.plan (and nested adaptive
      // roots) explicitly
      def allNodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case x => x }.flatMap {
          case q: QueryStageExec => q +: allNodes(q.plan)
          case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
          case other => Seq(other)
        }
      def skewedReads(): Int = plans.synchronized {
        plans.flatMap(allNodes)
          .collect { case r: AQEShuffleReadExec if r.hasSkewedPartition => r }
          .size
      }
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var n = skewedReads()
      while (n == 0 && System.nanoTime() < deadline) { Thread.sleep(200); n = skewedReads() }
      if (n == 0) plans.synchronized {
        plans.zipWithIndex.foreach { case (p, i) =>
          val s = (p match { case a: AdaptiveSparkPlanExec => a.executedPlan; case o => o }).toString
          if (s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"))
            System.err.println(s"=== plan $i ===\n$s\n")
        }
      }
      assert(n > 0,
        s"no AQEShuffleRead with skewed partitions in any of ${plans.size} executed plans — " +
          "the hot-value row expansion ran through a single reducer")
    } finally {
      spark.listenerManager.unregister(listener)
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  /** Codegen-only filler generator (no Scala UDF): three transforms of the
    * id padded into a fixed-width string. */
  private def udfFreeFiller(i: org.apache.spark.sql.Column,
                            side: String): org.apache.spark.sql.Column = {
    val p = if (side == "left") Seq("u", "v", "w", "x") else Seq("r", "s", "t", "y")
    concat(lit(p(0)), lpad(i.cast("string"), 5, "0"),
      lit(" " + p(1)), lpad(i.cast("string"), 5, "0"),
      lit(" " + p(2)), lpad(i.cast("string"), 5, "0"),
      lit(" " + p(3)))
  }
}
