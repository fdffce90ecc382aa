package graft.tools

import java.lang.management.ManagementFactory

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for the reproducible COLD-FIRST-SAMPLE anomaly
  * (BENCH r9/r10: `fuzzy_auto_225m` first sample 31.6/51.2 s vs ~4 s
  * steady, `fuzzy_annf_3g_exact` 97.8 s vs 41 s — each beside a HEALTHY
  * interleaved probe, so not host contention).
  *
  * Runs ONE bench query N times on a deliberately cold JVM (no sf0.001
  * warmup pass, unlike [[graft.Bench]]) and prints, per sample:
  *   - wall seconds,
  *   - delta JIT compilation time (ms) — C2 compiles on background
  *     threads but execution runs interpreted/C1 meanwhile, so a first
  *     sample with a large JIT delta IS the warmup cost,
  *   - delta GC time (ms),
  *   - every Spark JOB that ran inside the sample with its duration and
  *     call site — the matcher's pipeline surfaces as one job per action
  *     (index checkpoint, distinct-value materialize, degeneracy probe
  *     collect, final count), so the slow stage names itself.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.ColdAttribution <benchQuery> [iters] [warm]
  * `warm` replays graft.Bench's sf0.001 warmup pass for this query first,
  * isolating "cold JVM" from "cold fixtures".
  */
object ColdAttribution {

  private case class JobRow(id: Int, site: String, start: Long, var end: Long = -1L)

  def main(args: Array[String]): Unit = {
    val query = args(0)
    // `[iters]` and `[warm]` are both optional in either order: the
    // first purely-numeric trailing arg is the iteration count.
    val iters = args.drop(1).find(a => a.nonEmpty && a.forall(_.isDigit))
      .map(_.toInt).getOrElse(3)
    val warm = args.contains("warm")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer.empty[JobRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs += JobRow(js.jobId, site, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == je.jobId).foreach(_.end = je.time)
      }
    })

    val fn = graft.Bench.benchQueries(sfDir).getOrElse(query, {
      val names = graft.Bench.benchQueries(sfDir).keys.toSeq.sorted.mkString(", ")
      println(s"[cold] unknown query '$query'. Available: $names")
      spark.stop()
      sys.exit(2)
    })
    if (warm) {
      println(s"[cold] warmup pass at sf0.001 for $query")
      try graft.Bench.benchQueries("/root/testdata/sf0.001")(query)(spark).count()
      catch { case e: Throwable => println(s"[cold] warmup failed: ${e.getMessage}") }
    }

    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

    (1 to iters).foreach { i =>
      val mark = jobs.synchronized(jobs.length)
      val (jit0, gc0) = (jitMs, gcMs)
      val t0 = System.nanoTime()
      val rows = fn(spark).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val (jit1, gc1) = (jitMs, gcMs)
      println(f"[cold] sample $i: $dt%8.2f s  rows=$rows  jit+${jit1 - jit0}%6d ms  gc+${gc1 - gc0}%5d ms")
      // Listener events are delivered async; give the bus a moment so the
      // slowest job's onJobEnd (the one this tool exists to attribute)
      // has landed before the snapshot.
      Thread.sleep(300)
      val mine = jobs.synchronized(jobs.drop(mark).toVector)
      mine.sortBy(j => -(j.end - j.start)).foreach { j =>
        if (j.end < 0)
          println(f"[cold]   job ${j.id}%4d   no end event  ${j.site}")
        else {
          val d = (j.end - j.start) / 1e3
          if (d > 0.2) println(f"[cold]   job ${j.id}%4d ${d}%8.2f s  ${j.site}")
        }
      }
    }
    spark.stop()
  }
}
