package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end crash exercise for the COMPOSED ingest pipeline (VERDICT
  * r15 item 2): the stored-state writers survive executor loss
  * ([[IngestKillSmoke]]) and driver death ([[StreamCrashSmoke]]) in
  * isolation, but the new streaming SOURCE had never been crash-tested
  * composed with them. This drives the exact pipeline the e2e spec
  * builds — `warc landing stream → stored-minhash dedup → tfrecord
  * training shards` — through both fault modes:
  *
  *  - **executor arm** (in-process, `local-cluster[2,4,2048]`): a
  *    killer thread SIGKILLs one executor JVM mid-trigger while waves
  *    land; the stream must drain to shards fingerprint-identical to
  *    the clean batch computation. The tfrecord writes inside
  *    `foreachBatch` exercise the temp-file + rename task-commit path
  *    under real task loss.
  *  - **driver arm** (forked children): the crash child halts the JVM
  *    inside `foreachBatch` on batch 1 — AFTER the tfrecord shard
  *    commit, BEFORE the stream commit (the worst window). The resume
  *    child restarts from the same checkpoint with a new wave landed;
  *    the warc offset contract must SKIP wave00 (processed+committed),
  *    REPLAY wave01 (uncommitted — the idempotent per-batchId
  *    overwrite sink converges), and ingest wave02. Final shards must
  *    fingerprint equal to the clean run.
  *
  * Launch (same env notes as the sibling smokes):
  * {{{
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 sbt -batch \
  *     "Test/runMain graft.tools.WarcPipelineKillSmoke /root/testdata/sf0.01"
  * }}}
  * Prints PASS/FAIL per arm, exits nonzero on any divergence. */
object WarcPipelineKillSmoke {

  private val CrashExit = 137
  private val Threshold = 0.5

  private def session(name: String): SparkSession = {
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
    val s = SparkSession.builder().master("local-cluster[2,4,2048]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.executor.memory", "1536m")
      .getOrCreate()
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

  private def docs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))

  /** Wave i of the arriving crawl: re-keyed corpus docs (exact dups of
    * the stored state, must be dropped) plus three novel docs (must
    * survive into the shards). Id spaces disjoint per wave. */
  private def wave(s: SparkSession, sfDir: String, i: Int): DataFrame = {
    import s.implicits._
    val novel = Seq(
      (9000001L + i * 10, s"completely novel wave $i arrival text one with enough words to shingle"),
      (9000002L + i * 10, s"another genuinely new wave $i document body that matches nothing stored"),
      (9000003L + i * 10, s"third unseen wave $i arrival paragraph with original content entirely"))
    docs(s, sfDir).where(col("doc_id") % 3 === i.toLong)
      .select((col("doc_id") + 1000000L * (i + 1)).as("doc_id"), col("text"))
      .unionByName(novel.toDF("doc_id", "text"))
  }

  /** Export wave i as a single WARC file at `stageDir/wave0i.warc`
    * (built once by the parent; landed progressively by the drivers). */
  private def stageWave(s: SparkSession, sfDir: String, i: Int,
                        stageDir: String): Unit = {
    val src = java.nio.file.Files.createTempDirectory(s"wpk_wave$i")
    graft.sources.Warc.write(wave(s, sfDir, i).coalesce(1).select(
      concat(lit("urn:doc:"), col("doc_id")).as("record_id"),
      lit("resource").as("warc_type"),
      concat(lit("https://example.com/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("payload")), src.toString)
    val f = new java.io.File(src.toString).listFiles()
      .find(_.getName.endsWith(".warc")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stageDir))
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(stageDir, f"wave$i%02d.warc"))
  }

  private def land(stageDir: String, landDir: String, i: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landDir))
    val name = f"wave$i%02d.warc"
    val dst = java.nio.file.Paths.get(landDir, name)
    if (!dst.toFile.exists())
      java.nio.file.Files.copy(java.nio.file.Paths.get(stageDir, name), dst)
  }

  /** The pipeline under test — identical to the e2e spec's, with the
    * documented idempotent sink (one overwritten tfrecord dir per
    * batchId, so an at-least-once replay converges). `record` carries
    * doc_id + text so the fingerprint pins content AND identity. */
  private def pipelineWriter(s: SparkSession, landDir: String, store: String,
                             shards: String, ckpt: String)
                            (onBatch: Long => Unit) = {
    val stored = graft.pipeline.Dedup.loadMinhashState(s, store)
    s.readStream.format("warc").load(landDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        graft.util.MatchScope.withMatchScope {
          val batchDocs = b.select(
            expr("CAST(substr(record_id, 9) AS BIGINT)").as("doc_id"),
            decode(col("payload"), "UTF-8").as("text")).localCheckpoint()
          val dupIds = graft.pipeline.Dedup.minhashPairsAgainstStored(
              batchDocs, "text", "doc_id", stored, threshold = Threshold,
              maxBucketPairs = Long.MaxValue)
            .select(col("id_a").as("doc_id")).distinct()
          batchDocs.join(dupIds, Seq("doc_id"), "left_anti")
            .select(encode(concat(lpad(col("doc_id").cast("string"), 20, "0"),
              col("text")), "UTF-8").as("record"))
            .write.format("tfrecord").mode("overwrite")
            .save(s"$shards/batch=$batchId")
          onBatch(batchId)
        }
        ()
      }
  }

  private def shardsFrame(s: SparkSession, shards: String): DataFrame =
    s.read.format("tfrecord").option("recursive", "true").load(shards)
      .select(decode(col("record"), "UTF-8").as("r"))
      .select(substring(col("r"), 1, 20).cast("long").as("doc_id"),
        expr("substr(r, 21)").as("text"))

  /** What a correct pipeline ships: per wave, the batch dedup operator's
    * survivors — computed with NO streaming and NO faults. */
  private def cleanFingerprint(s: SparkSession, sfDir: String,
                               store: String, waves: Int): (Long, Long) = {
    val stored = graft.pipeline.Dedup.loadMinhashState(s, store)
    fingerprint((0 until waves).map { i =>
      val w = wave(s, sfDir, i).localCheckpoint()
      val dupIds = graft.pipeline.Dedup.minhashPairsAgainstStored(
          w, "text", "doc_id", stored, threshold = Threshold,
          maxBucketPairs = Long.MaxValue)
        .select(col("id_a").as("doc_id")).distinct()
      w.join(dupIds, Seq("doc_id"), "left_anti")
    }.reduce(_ unionByName _).select(col("doc_id"), col("text")))
  }

  // -------------------------------------------------------------- child

  /** args: child <phase:crash|resume> <sfDir> <workDir> */
  private def childMain(phase: String, sfDir: String, work: String): Unit = {
    val s = session(s"wpk-child-$phase")
    val landDir = s"$work/land_driver"
    val writer = pipelineWriter(s, landDir, s"$work/store",
      s"$work/shards_driver", s"$work/ckpt_driver") { batchId =>
      if (phase == "crash" && batchId == 1L) {
        System.err.println(s"[wpk-child] halting JVM on batch $batchId " +
          "(shards committed, stream offset NOT)")
        Runtime.getRuntime.halt(CrashExit)
      }
    }
    if (phase == "crash") {
      // wave00 processed and committed, then wave01 lands and batch 1
      // halts after the shard write
      land(s"$work/waves", landDir, 0)
      val q = writer.start()
      q.processAllAvailable()
      land(s"$work/waves", landDir, 1)
      q.processAllAvailable() // halts inside batch 1
      sys.error("crash child survived batch 1 — halt did not fire")
    } else {
      // restart from the same checkpoint with wave02 also landed:
      // wave00 must be SKIPPED (committed), wave01 REPLAYED, wave02 new
      land(s"$work/waves", landDir, 2)
      val q = writer.start()
      q.processAllAvailable(); q.stop()
      val fp = fingerprint(shardsFrame(s, s"$work/shards_driver"))
      // batch dirs pin the replay shape: 0 (clean), 1 (replayed), 2 (new)
      val batchDirs = new java.io.File(s"$work/shards_driver").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted.toSeq
      println(s"[wpk-fp] ${fp._1} ${fp._2} batches=${batchDirs.mkString(",")}")
      s.stop()
    }
    Runtime.getRuntime.halt(0)
  }

  private def fork(phase: String, sfDir: String, work: String): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin, "-Xmx3g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path")) ++ addOpens ++
      Seq("graft.tools.WarcPipelineKillSmoke", "child", phase, sfDir, work))
    val out = java.nio.file.Files.createTempFile(s"wpk_$phase", ".log")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(out.toFile)
    val t0 = System.nanoTime()
    val p = pb.start()
    val done = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!done) { p.destroyForcibly(); sys.error(s"child $phase hung") }
    val log = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    println(f"[wpk] child $phase%-7s exit=${p.exitValue()}%4d " +
      f"${(System.nanoTime() - t0) / 1e9}%5.1f s")
    (p.exitValue(), log)
  }

  // ------------------------------------------------------------- parent

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("child")) {
      childMain(args(1), args(2), args(3))
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = java.nio.file.Files.createTempDirectory("graft_wpk").toString
    val spark = session("wpk-parent")
    val removed = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet()
        println(s"[wpk] executor removed: ${e.executorId} (${e.reason})")
      }
    })

    // fixtures: the stored corpus state + three staged waves
    graft.pipeline.Dedup.saveMinhashState(docs(spark, sfDir), "text", "doc_id",
      s"$work/store", shingleLen = 3, numBands = 24, rowsPerBand = 1,
      nBuckets = 8)
    (0 until 3).foreach(i => stageWave(spark, sfDir, i, s"$work/waves"))
    val clean = cleanFingerprint(spark, sfDir, s"$work/store", 3)
    println(s"[wpk] clean fingerprint=$clean")

    var failed = false

    // ---- arm 1: executor SIGKILL mid-trigger, in-process
    {
      val landDir = s"$work/land_exec"
      val writer = pipelineWriter(spark, landDir, s"$work/store",
        s"$work/shards_exec", s"$work/ckpt_exec") { _ => () }
      val killedPid = new AtomicLong(-1L)
      val before = removed.get()
      val killer = new Thread(() => {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (killedPid.get() == -1L && System.nanoTime() < deadline) {
          if (spark.sparkContext.statusTracker.getActiveStageIds.nonEmpty) {
            ExecutorKillSmoke.executorPids().headOption.foreach { pid =>
              ProcessHandle.of(pid).ifPresent { h =>
                if (h.destroyForcibly()) {
                  killedPid.set(pid)
                  println(s"[wpk] SIGKILLed executor pid=$pid mid-trigger")
                }
              }
            }
          }
          Thread.sleep(20)
        }
      }, "wpk-killer")
      killer.setDaemon(true)
      killer.start()
      land(s"$work/waves", landDir, 0)
      val q = writer.start()
      q.processAllAvailable()
      land(s"$work/waves", landDir, 1)
      q.processAllAvailable()
      land(s"$work/waves", landDir, 2)
      q.processAllAvailable()
      q.stop()
      killer.join(5000)
      val evDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (removed.get() == before && killedPid.get() != -1L &&
        System.nanoTime() < evDeadline) Thread.sleep(100)
      val fp = fingerprint(shardsFrame(spark, s"$work/shards_exec"))
      if (killedPid.get() == -1L) {
        println("[wpk] FAIL executor arm: no executor was killed (stream too fast?)")
        failed = true
      } else if (fp != clean) {
        println(s"[wpk] FAIL executor arm: got $fp, clean was $clean")
        failed = true
      } else
        println(s"[wpk] PASS executor arm: killed pid=${killedPid.get()} " +
          s"mid-trigger, shards drained to the clean fingerprint $fp")
    }
    spark.stop()

    // ---- arm 2: driver JVM death mid-foreachBatch, forked children
    {
      val (crashExit, crashLog) = fork("crash", sfDir, work)
      val died = crashExit == CrashExit &&
        crashLog.contains("halting JVM on batch 1")
      if (!died) {
        println(s"[wpk] FAIL driver arm: crash child did not die as told " +
          s"(exit=$crashExit)\n${crashLog.takeRight(2000)}")
        failed = true
      } else {
        val (resumeExit, resumeLog) = fork("resume", sfDir, work)
        val fp = resumeLog.linesIterator.find(_.startsWith("[wpk-fp] "))
          .map(_.stripPrefix("[wpk-fp] "))
        val want = s"${clean._1} ${clean._2} batches=batch=0,batch=1,batch=2"
        if (resumeExit != 0 || !fp.contains(want)) {
          println(s"[wpk] FAIL driver arm: resume exit=$resumeExit fp=$fp " +
            s"want=($want)\n${resumeLog.takeRight(2000)}")
          failed = true
        } else
          println("[wpk] PASS driver arm: JVM died after the batch-1 shard " +
            "commit; restart skipped wave00, replayed wave01 idempotently, " +
            s"ingested wave02, converged to the clean fingerprint ($fp)")
      }
    }

    if (failed) sys.exit(1)
    println("[wpk] composed warc->stored-dedup->tfrecord pipeline survived " +
      "executor SIGKILL and driver death with identical shards")
  }
}
