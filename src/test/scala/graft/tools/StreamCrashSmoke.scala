package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JVM-death recovery exercise for the recoverable streaming writers
  * (VERDICT r13 item 4): RecoverableWriterSpec kills the QUERY inside a
  * live JVM; this tool kills the PROCESS — each phase runs in a forked
  * child JVM whose driver dies via `Runtime.halt` mid-`foreachBatch`
  * (after the durable fold, before the stream commit: the worst crash
  * window), and whose executors are separate JVMs
  * (`local-cluster[2,4,2048]`). A second child restarts from the same
  * stream checkpoint; the merged view it prints must fingerprint equal
  * to a clean one-shot build computed by the parent.
  *
  * Arms:
  *  - `bm25`  — [[graft.streaming.RetrievalStream.bm25AppendWriterRecoverable]]
  *  - `ivf`   — [[graft.streaming.AnnStream.ivfAppendWriterRecoverable]]
  *    (centroids persisted by the parent and LOADED by both children, so
  *    cross-process float-order variance in the fit cannot masquerade as
  *    a recovery defect)
  *  - `hamming` — [[graft.streaming.DocStreams.hammingNearDupWriterStored]]
  *    with the documented idempotent sink (overwrite per batchId): the
  *    replayed batch overwrites its own output, so at-least-once replay
  *    converges to the exact clean result
  *
  * Launch:
  * {{{
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 sbt -batch \
  *     "Test/runMain graft.tools.StreamCrashSmoke /root/testdata/sf0.001"
  * }}}
  * The parent prints PASS/FAIL per arm and exits nonzero on any
  * divergence (or if a crash child failed to die where told).
  */
object StreamCrashSmoke {

  private val CrashExit = 137

  private def session(name: String, master: String): SparkSession = {
    val b = SparkSession.builder().master(master).appName(name)
      .config("spark.sql.shuffle.partitions", "8")
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
        .config("spark.executor.memory", "1536m")
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

  // ------------------------------------------------------------ fixtures

  private def docs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
  private def emb(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/embeddings.parquet")

  /** Arriving hash rows: each batch row is its corpus twin's 64-bit hash
    * with <= 2 bits flipped, so every row has a guaranteed hamming<=3
    * partner in the stored state. */
  private def hammingBatch(s: SparkSession, sfDir: String, mod: Long,
                           flip: Long): DataFrame =
    docs(s, sfDir).where(col("doc_id") % 3 === mod)
      .select((col("doc_id") + 100000L).as("doc_id"),
        xxhash64(col("text")).bitwiseXOR(lit(flip)).as("h64"))

  /** One pinned-order parquet file per micro-batch under a flat dir. */
  private def stage(batches: Seq[DataFrame], dir: java.nio.file.Path): Unit = {
    batches.zipWithIndex.foreach { case (b, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"crash_stage$i")
      b.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
  }

  // -------------------------------------------------------------- child

  /** args: child <arm> <phase:crash|resume> <sfDir> <workDir> */
  private def childMain(arm: String, phase: String, sfDir: String,
                        work: String): Unit = {
    val s = session(s"crash-child-$arm-$phase", "local-cluster[2,4,2048]")
    val crash = phase == "crash"
    def maybeHalt(batchId: Long): Unit =
      if (crash && batchId == 1L) {
        System.err.println(s"[crash-child] halting JVM on batch $batchId")
        Runtime.getRuntime.halt(CrashExit)
      }
    val ckpt = s"$work/ckpt_$arm"
    arm match {
      case "bm25" =>
        val d = docs(s, sfDir)
        val stream = s.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$work/in_bm25")
        @volatile var last: graft.pipeline.TextAnalysis.Bm25Index = null
        val q = graft.streaming.RetrievalStream.bm25AppendWriterRecoverable(
          stream, s"$work/ix_bm25", "text",
          graft.pipeline.TextAnalysis.bm25Index(
            d.where(col("doc_id") % 3 === 0), "text", "doc_id"),
          compactEvery = 2) { (ix, batchId) =>
          last = ix
          maybeHalt(batchId)
        }.option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
        val fp = fingerprint(last.postings
          .select(col("doc_id"), col("token"), col("tf"), col("dl"), col("df")))
        println(s"[crash-fp] $arm ${fp._1} ${fp._2} ${last.nDocs} ${last.totalTokens}")
      case "ivf" =>
        val e = emb(s, sfDir)
        val (cents, dim) = graft.pipeline.AnnSearch.loadCentroids(s, s"$work/cents")
        val stream = s.readStream.schema(e.select(col("vec_id"), col("embedding")).schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$work/in_ivf")
        @volatile var view: DataFrame = null
        val q = graft.streaming.AnnStream.ivfAppendWriterRecoverable(
          stream, s"$work/ix_ivf", "embedding", "vec_id", dim, cents,
          graft.pipeline.AnnSearch.ivfPostings(
            e.where(col("vec_id") % 3 === 0), "embedding", "vec_id", dim, cents),
          compactEvery = 2) { (v, batchId) =>
          view = v
          maybeHalt(batchId)
        }.option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
        val fp = fingerprint(view.select(col("corpus_id"), col("__cell")))
        println(s"[crash-fp] $arm ${fp._1} ${fp._2}")
      case "hamming" =>
        val schema = hammingBatch(s, sfDir, 1L, 1L).schema
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$work/in_hamming")
        val q = graft.streaming.DocStreams.hammingNearDupWriterStored(
          stream, s"$work/state_hamming", "h64", "doc_id") { (pairs, batchId) =>
          // the documented idempotent sink: one overwritten dir per
          // batchId, so a replay converges instead of duplicating
          pairs.select(col("id_a"), col("id_b"), col("hamming"))
            .write.mode("overwrite").parquet(s"$work/out_hamming/batch=$batchId")
          maybeHalt(batchId)
        }.option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
        val fp = fingerprint(s.read.parquet(s"$work/out_hamming")
          .select(col("id_a"), col("id_b"), col("hamming")))
        println(s"[crash-fp] $arm ${fp._1} ${fp._2}")
      case other => sys.error(s"unknown arm $other")
    }
    s.stop()
    // halt instead of exit: local-cluster's shutdown hooks can hang on
    // executors we already confirmed done; the work is printed
    Runtime.getRuntime.halt(0)
  }

  /** Fork a child JVM for (arm, phase); returns (exitCode, stdout). */
  private def fork(arm: String, phase: String, sfDir: String,
                   work: String): (Int, String) = {
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
      Seq("graft.tools.StreamCrashSmoke", "child", arm, phase, sfDir, work))
    val out = java.nio.file.Files.createTempFile(s"crash_${arm}_$phase", ".log")
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(out.toFile)
    val t0 = System.nanoTime()
    val p = pb.start()
    val done = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
    if (!done) { p.destroyForcibly(); sys.error(s"child $arm/$phase hung") }
    val log = new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
    println(f"[crash-smoke] child $arm%-8s $phase%-7s exit=${p.exitValue()}%4d " +
      f"${(System.nanoTime() - t0) / 1e9}%5.1f s")
    (p.exitValue(), log)
  }

  // ------------------------------------------------------------- parent

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("child")) {
      childMain(args(1), args(2), args(3), args(4))
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = java.nio.file.Files.createTempDirectory("graft_crash_smoke")
    val s = session("crash-smoke-parent", "local[8]")

    // stage inputs + shared fixtures + CLEAN one-shot fingerprints
    val d = docs(s, sfDir)
    val e = emb(s, sfDir)
    java.nio.file.Files.createDirectories(work.resolve("in_bm25"))
    stage(Seq(d.where(col("doc_id") % 3 === 1), d.where(col("doc_id") % 3 === 2)),
      work.resolve("in_bm25"))
    java.nio.file.Files.createDirectories(work.resolve("in_ivf"))
    stage(Seq(e.where(col("vec_id") % 3 === 1).select(col("vec_id"), col("embedding")),
      e.where(col("vec_id") % 3 === 2).select(col("vec_id"), col("embedding"))),
      work.resolve("in_ivf"))
    val hb = Seq(hammingBatch(s, sfDir, 1L, 1L),
      hammingBatch(s, sfDir, 2L, (1L << 5) | (1L << 37)),
      hammingBatch(s, sfDir, 0L, 1L << 63))
    java.nio.file.Files.createDirectories(work.resolve("in_hamming"))
    stage(hb, work.resolve("in_hamming"))

    val cents = graft.pipeline.AnnSearch.normalizeCentroids(
      graft.pipeline.AnnSearch.kmeansFit(
        e.where(col("vec_id") % 3 === 0), "embedding", dim = 64, k = 4, iters = 1))
    graft.pipeline.AnnSearch.saveCentroids(s, s"$work/cents", cents, 64)
    graft.pipeline.Dedup.saveHammingState(
      d.select(col("doc_id").as("asset_id"), xxhash64(col("text")).as("h64")),
      col("h64"), "asset_id", s"$work/state_hamming", maxHamming = 3)

    val cleanBm25 = {
      val ix = graft.pipeline.TextAnalysis.bm25Index(d, "text", "doc_id")
      val fp = fingerprint(ix.postings
        .select(col("doc_id"), col("token"), col("tf"), col("dl"), col("df")))
      s"${fp._1} ${fp._2} ${ix.nDocs} ${ix.totalTokens}"
    }
    val cleanIvf = {
      val fp = fingerprint(graft.pipeline.AnnSearch.ivfPostings(
          e, "embedding", "vec_id", 64, cents)
        .select(col("corpus_id"), col("__cell")))
      s"${fp._1} ${fp._2}"
    }
    val cleanHamming = {
      val stored = graft.pipeline.Dedup.loadHammingState(s, s"$work/state_hamming")
      val all = hb.map(b => graft.pipeline.Dedup.hashPairsAgainstStored(
          b, col("h64"), "doc_id", stored)
        .select(col("id_a"), col("id_b"), col("hamming")))
        .reduce(_ unionByName _)
      val fp = fingerprint(all)
      s"${fp._1} ${fp._2}"
    }
    println(s"[crash-smoke] clean bm25=($cleanBm25) ivf=($cleanIvf) " +
      s"hamming=($cleanHamming)")
    s.stop()

    var failed = false
    for (arm <- Seq("bm25", "ivf", "hamming")) {
      val (crashExit, crashLog) = fork(arm, "crash", sfDir, work.toString)
      val died = crashExit == CrashExit &&
        crashLog.contains("halting JVM on batch 1")
      if (!died) {
        println(s"[crash-smoke] FAIL $arm: crash child did not die as told " +
          s"(exit=$crashExit)\n${crashLog.takeRight(2000)}")
        failed = true
      } else {
        val (resumeExit, resumeLog) = fork(arm, "resume", sfDir, work.toString)
        val fp = resumeLog.linesIterator
          .find(_.startsWith(s"[crash-fp] $arm "))
          .map(_.stripPrefix(s"[crash-fp] $arm "))
        val clean = arm match {
          case "bm25" => cleanBm25
          case "ivf" => cleanIvf
          case _ => cleanHamming
        }
        if (resumeExit != 0 || !fp.contains(clean)) {
          println(s"[crash-smoke] FAIL $arm: resume exit=$resumeExit " +
            s"fp=$fp clean=($clean)\n${resumeLog.takeRight(2000)}")
          failed = true
        } else
          println(s"[crash-smoke] PASS $arm: JVM killed mid-fold, restart " +
            s"converged to the clean one-shot fingerprint ($clean)")
      }
    }
    if (failed) sys.exit(1)
    println("[crash-smoke] all recoverable writers survived JVM death " +
      "across process boundaries")
  }
}
