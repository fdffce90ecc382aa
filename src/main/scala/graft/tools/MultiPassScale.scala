package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.fuzzy.{FuzzyAlgorithm, FuzzyMapping, FuzzyMatcher, MatchOptions}

/** Load test for the multi-pass fold at the 100× tier (VERDICT round 8
  * task 3): the pass-2 filtered path claims its cost is bounded by
  * pass-1 SURVIVORS, not the cartesian — a claim in the family that
  * sf10 falsified twice in round 8 (CapMetrics gate, BNLJ deferred
  * eval), so it gets measured, not assumed.
  *
  * Protocol (one JVM): phase A runs the single selective mapping
  * (c_name levenshtein@90 — ~2.25e10-pair cartesian on the sf1 cipher
  * customer table, auto-routed); phase B runs the full two-mapping fold
  * (same pass 1, then c_mktsegment jaro_winkler@80 over pass-1
  * survivors only). Pass-2 incremental cost = B − A in both wall time
  * and shuffle volume, captured by a stage-level listener
  * (bytes/records written are THE filtered path's data motion: the
  * survivors' value pairs + the re-attach joins).
  *
  * Reference semantics: matcher.py:188-238 (filter-existing pass),
  * 507-577 (fold).
  */
object MultiPassScale {

  final class ShuffleAcc extends SparkListener {
    val writeBytes = new AtomicLong
    val writeRecords = new AtomicLong
    val readBytes = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        writeBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        writeRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        readBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def snapshot(): (Long, Long, Long) =
      (writeBytes.get(), writeRecords.get(), readBytes.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel("graft",
      org.apache.logging.log4j.Level.INFO)
    val acc = new ShuffleAcc
    spark.sparkContext.addSparkListener(acc)

    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val nameMap = FuzzyMapping("c_name", "c_name", 90.0, FuzzyAlgorithm.Levenshtein)
    val segMap = FuzzyMapping("c_mktsegment", "c_mktsegment", 80.0,
      FuzzyAlgorithm.JaroWinkler)

    def phase(label: String)(body: => Long): (Double, Long) = {
      val (b0, r0, rd0) = acc.snapshot()
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      val (b1, r1, rd1) = acc.snapshot()
      println(f"""{"phase":"$label","sec":$sec%.1f,"rows":$rows,""" +
        s""""shuffle_write_bytes":${b1 - b0},"shuffle_write_records":${r1 - r0},""" +
        s""""shuffle_read_bytes":${rd1 - rd0}}""")
      (sec, rows)
    }

    // JIT/codegen warmup on the smallest tier: identical plan shapes,
    // negligible data — without it phase A absorbs compilation cost and
    // the B−A subtraction can go negative on small corpora
    val w = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    FuzzyMatcher.matchDfs(w, w, Seq(nameMap, segMap), MatchOptions()).count()

    val (aSec, aRows) = phase("pass1_only") {
      FuzzyMatcher.matchDfs(c, c, Seq(nameMap), MatchOptions()).count()
    }
    val (bSec, bRows) = phase("two_pass_fold") {
      FuzzyMatcher.matchDfs(c, c, Seq(nameMap, segMap), MatchOptions()).count()
    }
    println(f"""{"metric":"multi_pass_sf_fold","sf":"$sfDir",""" +
      f""""pass1_sec":$aSec%.1f,"pass1_rows":$aRows,""" +
      f""""fold_sec":$bSec%.1f,"fold_rows":$bRows,""" +
      f""""pass2_incremental_sec":${bSec - aSec}%.1f}""")
    spark.stop()
  }
}
