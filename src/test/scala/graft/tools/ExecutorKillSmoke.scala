package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fuzzy.{FuzzyAlgorithm, FuzzyMapping, FuzzyMatcher, MatchOptions}
import graft.util.CheckpointStrategy

/** Executor-loss recovery exercise (VERDICT r13 item 3): [[LocalClusterSmoke]]
  * proved the headline paths compute identically across process
  * boundaries, but never KILLED one of those processes mid-query —
  * `CheckpointStrategy.Reliable` exists precisely so a long multi-pass
  * job survives executor loss (the cluster restatement of the
  * reference's caller-owned temp dir, matcher.py:580-658), and that
  * claim had only ever been design-verified.
  *
  * This tool runs the exact fuzzy join and the forced-LSH join under
  * `Reliable` barriers on `local-cluster[2,8,3072]` (2 worker processes,
  * executors in separate JVMs), SIGKILLs one executor JVM the moment the
  * consuming query has an active stage, and requires:
  *  - the SparkListener saw a real executor removal during the query,
  *  - the job COMPLETES anyway (standalone relaunches the executor;
  *    lost tasks re-run; reliable checkpoint files re-read from disk),
  *  - the fingerprint equals the clean un-killed run bit-for-bit.
  *
  * A third arm runs the same exact join under the default LOCAL
  * checkpoint as an honesty control: `localCheckpoint()` truncates
  * lineage into executor-resident blocks, so losing an executor mid-
  * consume is EXPECTED unrecoverable there (the documented reason
  * Reliable exists). The control's outcome is reported either way —
  * Spark occasionally wins by having every needed block on the
  * surviving executor — but a Reliable-arm failure fails the tool.
  *
  * Launch:
  * {{{
  *   SPARK_HOME=/opt/spark sbt -batch \
  *     "Test/runMain graft.tools.ExecutorKillSmoke /root/testdata/sf0.01"
  * }}}
  */
object ExecutorKillSmoke {

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder().master(master).appName("graft-killsmoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    if (master.startsWith("local-cluster")) {
      val cp = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
        .map(p => new java.io.File(p).getAbsolutePath).mkString(":")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      b.config("spark.executor.extraClassPath", cp)
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", "2g")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def fingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.toSeq.map(c => col(c).cast("string"))
    val row = df.select(
      count(lit(1)).as("n"),
      coalesce(sum(pmod(xxhash64(concat_ws("|", cols: _*)), lit(1000000007L))),
        lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** PIDs of live CoarseGrainedExecutorBackend JVMs belonging to THIS
    * run: candidates come from `ProcessHandle.current().descendants()`
    * (local-cluster's workers and executors are forked under this JVM),
    * never from a bare /proc sweep — on a shared host a cmdline-only
    * match could SIGKILL an executor of an unrelated Spark app. */
  private[tools] def executorPids(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala
      .filter { h =>
        try {
          val cmd = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/${h.pid()}/cmdline")), "UTF-8")
          cmd.contains("CoarseGrainedExecutorBackend")
        } catch { case _: Exception => false }
      }
      .map(_.pid()).toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ckptBase = java.nio.file.Files.createTempDirectory("graft_kill_ckpt")
    def reliable(tag: String) =
      CheckpointStrategy.Reliable(ckptBase.resolve(tag).toString)

    def exactJoin(ck: CheckpointStrategy)(s: SparkSession): DataFrame =
      FuzzyMatcher.matchDfs(
          s.read.parquet(s"$sfDir/customer.parquet"),
          s.read.parquet(s"$sfDir/supplier.parquet"),
          Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein)),
          MatchOptions(useApproxNearestNeighbor = Some(false), checkpoint = ck))
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("c_name_vs_s_name_levenshtein"), 6).as("score"))
    def lshJoin(ck: CheckpointStrategy)(s: SparkSession): DataFrame =
      FuzzyMatcher.matchDfs(
          s.read.parquet(s"$sfDir/customer.parquet"),
          s.read.parquet(s"$sfDir/supplier.parquet"),
          Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein)),
          MatchOptions(useApproxNearestNeighbor = Some(true), checkpoint = ck))
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("c_name_vs_s_name_levenshtein"), 6).as("score"))

    val spark = session("local-cluster[2,8,3072]")
    val removed = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet()
        println(s"[killsmoke] executor removed: ${e.executorId} (${e.reason})")
      }
    })

    // clean (un-killed) cluster fingerprints first — the ground truth,
    // and a JIT/classload warmup so kill-run timings measure recovery
    val cleanExact = fingerprint(exactJoin(reliable("clean_exact"))(spark))
    val cleanLsh = fingerprint(lshJoin(reliable("clean_lsh"))(spark))
    println(s"[killsmoke] clean exact=$cleanExact lsh=$cleanLsh")

    /** Run `f`, SIGKILLing one executor JVM as soon as a stage is
      * active; returns (fingerprintOrNull, killedPid, wallSec). */
    def runWithKill(name: String, f: SparkSession => DataFrame):
        (Option[(Long, Long)], Long, Double) = {
      val before = removed.get()
      val killedPid = new AtomicLong(-1L)
      val killer = new Thread(() => {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (killedPid.get() == -1L && System.nanoTime() < deadline) {
          if (spark.sparkContext.statusTracker.getActiveStageIds.nonEmpty) {
            executorPids().headOption.foreach { pid =>
              ProcessHandle.of(pid).ifPresent { h =>
                if (h.destroyForcibly()) {
                  killedPid.set(pid)
                  println(s"[killsmoke] $name: SIGKILLed executor pid=$pid mid-stage")
                }
              }
            }
          }
          Thread.sleep(50)
        }
      }, s"killer-$name")
      killer.setDaemon(true)
      val t0 = System.nanoTime()
      killer.start()
      val fp = try Some(fingerprint(f(spark)))
      catch {
        case e: Exception =>
          println(s"[killsmoke] $name: query FAILED after kill: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          None
      }
      val wall = (System.nanoTime() - t0) / 1e9
      killer.join(5000)
      // wait (bounded) for the removal event to land before asserting
      val evDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (removed.get() == before && killedPid.get() != -1L &&
        System.nanoTime() < evDeadline) Thread.sleep(100)
      (fp, killedPid.get(), wall)
    }

    var failed = false

    // arm 1 + 2: Reliable barriers must survive the loss with identical
    // fingerprints
    for ((name, f, clean) <- Seq(
      ("exact_reliable", exactJoin(reliable("kill_exact")) _, cleanExact),
      ("lsh_reliable", lshJoin(reliable("kill_lsh")) _, cleanLsh))) {
      val (fp, pid, wall) = runWithKill(name, f)
      if (pid == -1L) {
        println(s"[killsmoke] FAIL $name: no executor was killed (query too fast?)")
        failed = true
      } else if (!fp.contains(clean)) {
        println(s"[killsmoke] FAIL $name: got $fp, clean was $clean")
        failed = true
      } else
        println(f"[killsmoke] PASS $name: killed pid=$pid, job completed in " +
          f"$wall%.1f s with the clean fingerprint $clean")
    }

    // arm 3 (control, reported not gated): local checkpoint + executor
    // loss — expected unrecoverable (truncated lineage, executor-resident
    // blocks), the documented reason Reliable exists
    val (ctlFp, ctlPid, ctlWall) = runWithKill("exact_local_control",
      exactJoin(CheckpointStrategy.Local) _)
    println(f"[killsmoke] control (Local ckpt + kill, pid=$ctlPid): " +
      (if (ctlFp.isEmpty) "FAILED as documented (lineage truncated to lost blocks)"
       else if (ctlFp.contains(cleanExact)) f"survived (blocks happened to live on the survivor) in $ctlWall%.1f s"
       else s"completed with WRONG fingerprint ${ctlFp.get} — investigate") )
    if (ctlFp.exists(_ != cleanExact)) failed = true

    if (removed.get() == 0) {
      println("[killsmoke] FAIL: no executor-removed event was ever observed")
      failed = true
    }
    spark.stop()
    if (failed) sys.exit(1)
    println("[killsmoke] Reliable barriers survived executor loss with " +
      "identical fingerprints")
  }
}
