package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Date-partitioned layout ([[PartitionedTables]]): partition pruning must
  * reach the scan (PartitionFilters) and pruned days must not be read.
  */
class PartitionedTablesSpec extends AnyFunSuite with SparkSpec {

  test("day-partitioned write prunes directories on a date-range read") {
    val ev = graft.util.EventTs.loadEvents(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("ts"))
    val dir = s"/tmp/graft_daypart_${System.nanoTime()}"
    PartitionedTables.writeDayPartitioned(ev, dir, "ts")

    val days = ev.select(PartitionedTables.epochDay(col("ts")).as("d"))
      .distinct().orderBy("d").collect().map(_.getLong(0))
    assert(days.length > 3, s"fixture spans ${days.length} days; need > 3 for pruning")
    val (from, to) = (days(1), days(1))

    val q = PartitionedTables.readDayRange(spark, dir, from, to)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_day"),
      s"partition filter not pushed to directory pruning:\n$plan")
    // the scan's selected partition count must be 1 of N days
    assert(plan.contains("(1)") || q.inputFiles.length < days.length,
      s"expected a single day's files, got ${q.inputFiles.length} of ${days.length} days")

    // correctness: the pruned read equals the filtered full read
    val want = ev.where(PartitionedTables.epochDay(col("ts")) === from).count()
    assert(q.count() === want && want > 0)
  }

  test("epochDay is exact integral division at nano magnitudes beyond 2^53") {
    import spark.implicits._
    // one nano BEFORE midnight of day k: double arithmetic rounds the
    // ~1.7e18 dividend (ulp 256 ns) onto midnight and buckets it into
    // day k; integral div must yield k-1
    val k = 19700L
    val ts = k * 86_400_000_000_000L - 1L
    val got = Seq(ts).toDF("ts")
      .select(PartitionedTables.epochDay(col("ts")).as("d")).head().getLong(0)
    assert(got === k - 1, s"epochDay($ts) = $got, want ${k - 1}")
  }

  test("epochDay floors (not truncates) pre-1970 negative timestamps") {
    import spark.implicits._
    val day = 86_400_000_000_000L
    // 1 ns before epoch lives in day -1 (floor), not day 0 (truncate);
    // exact negative-midnight stays on its own day; positive path unchanged
    val got = Seq(-1L, -day, -day - 1L, 0L, day - 1L).toDF("ts")
      .select(PartitionedTables.epochDay(col("ts")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(-1L, -1L, -2L, 0L, 0L), s"floor-division mismatch: $got")
  }

  test("one file per day (no small-file explosion from parallel writers)") {
    val ev = graft.util.EventTs.loadEvents(spark, "/root/testdata/sf0.001")
      .repartition(8) // simulate many upstream tasks
      .select(col("event_id"), col("ts"))
    val dir = s"/tmp/graft_daypart2_${System.nanoTime()}"
    PartitionedTables.writeDayPartitioned(ev, dir, "ts")
    val out = spark.read.parquet(dir)
    val nDays = out.select("event_day").distinct().count()
    // repartition(col) before partitionBy => files ~= days, not days x tasks
    assert(out.inputFiles.length <= nDays + 1,
      s"${out.inputFiles.length} files for $nDays days — small-file explosion")
  }
}
