package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss exercise for the STREAMING INGEST writers (VERDICT r14
  * item 5): [[ExecutorKillSmoke]] kills an executor under the batch
  * fuzzy joins, [[StreamCrashSmoke]] kills the DRIVER under the
  * recoverable writers — the untested square of the matrix is an
  * EXECUTOR dying mid-trigger inside a writer's fold, where Spark task
  * retry interleaves with the writer's durable/idempotent state
  * machinery ([[graft.pipeline.DurableIvfSegmentState]] batchId
  * high-water skips, the stored hamming state's touched-bucket reads).
  *
  * Arms, all on `local-cluster[2,4,2048]` (executors in separate JVMs):
  *  - `hamming` — [[graft.streaming.DocStreams.hammingNearDupWriterStored]]
  *    over a saved hamming store, idempotent per-batchId overwrite sink;
  *  - `ivf` — [[graft.streaming.AnnStream.ivfAppendWriterRecoverable]]
  *    folding embedding batches into a durable segmented index;
  *  - `minhash` — [[graft.streaming.DocStreams.minhashNearDupWriterStored]]
  *    over a saved MinHash store (its pruned reads collect the touched
  *    bucket lists mid-trigger, so a task retry interleaves with TWO
  *    driver-side collects per batch — the shape the other arms lack);
  *  - `semdedup` — [[graft.streaming.AnnStream.semanticNearDupWriterStored]]
  *    over a saved SemDeDup store (one touched-cell collect per batch,
  *    the pruned corpus vector read joining a retried assignment stage);
  *  - `winnow` — [[graft.streaming.DocStreams.winnowNearDupWriterStored]]
  *    over a saved winnow store (touched-bucket collect + the cross hot
  *    gate's driver aggregate both mid-trigger).
  *
  * A killer thread SIGKILLs one executor JVM (descendants of this
  * process only) the moment a trigger has an active stage; the stream
  * must then drain to completion (standalone relaunches the executor,
  * lost tasks re-run) and the final output/index must fingerprint equal
  * to the clean un-killed computation.
  *
  * Launch (SPARK_SCALA_VERSION matters: the in-process Worker launches
  * executor JVMs through Spark's command builder WITHOUT
  * load-spark-env.sh, and on a release layout the builder's scala-
  * version probe throws "Cannot find any build directories" unless the
  * env var pins it):
  * {{{
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 sbt -batch \
  *     "Test/runMain graft.tools.IngestKillSmoke /root/testdata/sf0.01"
  * }}}
  */
object IngestKillSmoke {

  private def session(): SparkSession = {
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
      .appName("graft-ingestkill")
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
  private def emb(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/embeddings.parquet")

  /** Arriving hash rows with guaranteed hamming<=3 partners in the
    * stored corpus (the StreamCrashSmoke fixture recipe). */
  private def hammingBatch(s: SparkSession, sfDir: String, mod: Long,
                           flip: Long): DataFrame =
    docs(s, sfDir).where(col("doc_id") % 3 === mod)
      .select((col("doc_id") + 100000L).as("doc_id"),
        xxhash64(col("text")).bitwiseXOR(lit(flip)).as("h64"))

  /** One pinned-order parquet file per micro-batch under a flat dir. */
  private def stage(batches: Seq[DataFrame], dir: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dir)
    batches.zipWithIndex.foreach { case (b, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"ingest_stage$i")
      b.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = dir.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = java.nio.file.Files.createTempDirectory("graft_ingest_kill")
    val spark = session()
    val removed = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet()
        println(s"[ingestkill] executor removed: ${e.executorId} (${e.reason})")
      }
    })

    // ---- fixtures (built BEFORE any killer is armed)
    val d = docs(spark, sfDir)
    val e = emb(spark, sfDir)
    val hb = Seq(hammingBatch(spark, sfDir, 1L, 1L),
      hammingBatch(spark, sfDir, 2L, (1L << 5) | (1L << 37)),
      hammingBatch(spark, sfDir, 0L, 1L << 63))
    stage(hb, work.resolve("in_hamming"))
    graft.pipeline.Dedup.saveHammingState(
      d.select(col("doc_id").as("asset_id"), xxhash64(col("text")).as("h64")),
      col("h64"), "asset_id", s"$work/state_hamming", maxHamming = 3)
    val embBatches = (1 to 3).map(i =>
      e.where(col("vec_id") % 4 === i).select(col("vec_id"), col("embedding")))
    stage(embBatches, work.resolve("in_ivf"))
    // minhash arm: corpus = all docs; batches are re-keyed doc subsets
    // (same text -> guaranteed jaccard-1.0 partners in the store)
    val mhBatches = (0 until 3).map(i =>
      d.where(col("doc_id") % 3 === i)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
    stage(mhBatches, work.resolve("in_minhash"))
    graft.pipeline.Dedup.saveMinhashState(d, "text", "doc_id",
      s"$work/state_minhash", shingleLen = 3, numBands = 16, rowsPerBand = 1,
      nBuckets = 8)
    val cents = graft.pipeline.AnnSearch.normalizeCentroids(
      graft.pipeline.AnnSearch.kmeansFit(
        e.where(col("vec_id") % 4 === 0), "embedding", dim = 64, k = 4, iters = 1))
    // semdedup arm: corpus = all embeddings; batches are re-keyed subsets
    // (same vectors -> guaranteed cosine-1.0 partners in the store)
    val sdBatches = (0 until 3).map(i =>
      e.where(col("vec_id") % 3 === i)
        .select((col("vec_id") + 300000L).as("vec_id"), col("embedding")))
    stage(sdBatches, work.resolve("in_semdedup"))
    graft.pipeline.Dedup.saveSemDedupState(e, "embedding", "vec_id",
      s"$work/state_semdedup", graft.pipeline.DemoModels.SemCentroids,
      dim = 64, nCells = 8)
    // winnow arm: corpus = all docs; batches re-keyed doc subsets
    // (same text -> every fingerprint shared with the stored partner)
    val wnBatches = (0 until 3).map(i =>
      d.where(col("doc_id") % 3 === i)
        .select((col("doc_id") + 400000L).as("doc_id"), col("text")))
    stage(wnBatches, work.resolve("in_winnow"))
    graft.pipeline.Dedup.saveWinnowState(d, "text", "doc_id",
      s"$work/state_winnow", k = 5, window = 4, useMd5 = false, nBuckets = 8)

    // clean expectations (no kill): the batch operators over the same data
    val cleanHamming = {
      val stored = graft.pipeline.Dedup.loadHammingState(spark, s"$work/state_hamming")
      fingerprint(hb.map(b => graft.pipeline.Dedup.hashPairsAgainstStored(
          b, col("h64"), "doc_id", stored)
        .select(col("id_a"), col("id_b"), col("hamming"))).reduce(_ unionByName _))
    }
    val cleanIvf = fingerprint(graft.pipeline.AnnSearch.ivfPostings(
        e, "embedding", "vec_id", 64, cents)
      .select(col("corpus_id"), col("__cell")))
    val cleanMinhash = {
      val stored = graft.pipeline.Dedup.loadMinhashState(spark, s"$work/state_minhash")
      fingerprint(mhBatches.map(b =>
        graft.pipeline.Dedup.minhashPairsAgainstStored(b, "text", "doc_id",
            stored, threshold = 0.5, maxBucketPairs = Long.MaxValue)
          .select(col("id_a"), col("id_b"),
            org.apache.spark.sql.functions.round(col("jaccard"), 9).as("j")))
        .reduce(_ unionByName _))
    }
    val cleanSemdedup = {
      val stored = graft.pipeline.Dedup.loadSemDedupState(spark, s"$work/state_semdedup")
      fingerprint(sdBatches.map(b =>
        graft.pipeline.Dedup.semDedupPairsAgainstStored(b, "embedding", "vec_id",
            stored, threshold = 0.85, maxCellPairs = Long.MaxValue)
          .select(col("id_a"), col("id_b"),
            org.apache.spark.sql.functions.round(col("cosine"), 9).as("c")))
        .reduce(_ unionByName _))
    }
    val cleanWinnow = {
      val stored = graft.pipeline.Dedup.loadWinnowState(spark, s"$work/state_winnow")
      fingerprint(wnBatches.map(b =>
        graft.pipeline.Dedup.winnowPairsAgainstStored(b, "text", "doc_id",
          stored, minShared = 10L)).reduce(_ unionByName _))
    }
    println(s"[ingestkill] clean hamming=$cleanHamming ivf=$cleanIvf " +
      s"minhash=$cleanMinhash semdedup=$cleanSemdedup winnow=$cleanWinnow")

    /** Arm a killer that SIGKILLs one executor as soon as a stage is
      * active, run `body`, and report (killedPid, removal events seen). */
    def withKill[T](name: String)(body: => T): (T, Long) = {
      val before = removed.get()
      val killedPid = new AtomicLong(-1L)
      val killer = new Thread(() => {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (killedPid.get() == -1L && System.nanoTime() < deadline) {
          if (spark.sparkContext.statusTracker.getActiveStageIds.nonEmpty) {
            ExecutorKillSmoke.executorPids().headOption.foreach { pid =>
              ProcessHandle.of(pid).ifPresent { h =>
                if (h.destroyForcibly()) {
                  killedPid.set(pid)
                  println(s"[ingestkill] $name: SIGKILLed executor pid=$pid mid-trigger")
                }
              }
            }
          }
          Thread.sleep(20)
        }
      }, s"killer-$name")
      killer.setDaemon(true)
      killer.start()
      val out = body
      killer.join(5000)
      val evDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (removed.get() == before && killedPid.get() != -1L &&
        System.nanoTime() < evDeadline) Thread.sleep(100)
      (out, killedPid.get())
    }

    var failed = false

    // ---- arm 1: stored-hamming writer, executor killed mid-trigger
    {
      val schema = hb.head.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in_hamming")
      val writer = graft.streaming.DocStreams.hammingNearDupWriterStored(
        stream, s"$work/state_hamming", "h64", "doc_id") { (pairs, batchId) =>
        pairs.select(col("id_a"), col("id_b"), col("hamming"))
          .write.mode("overwrite").parquet(s"$work/out_hamming/batch=$batchId")
      }.option("checkpointLocation", s"$work/ckpt_hamming")
      val (_, pid) = withKill("hamming") {
        val q = writer.start()
        q.processAllAvailable(); q.stop()
      }
      val fp = fingerprint(spark.read.parquet(s"$work/out_hamming")
        .select(col("id_a"), col("id_b"), col("hamming")))
      if (pid == -1L) {
        println("[ingestkill] FAIL hamming: no executor was killed (stream too fast?)")
        failed = true
      } else if (fp != cleanHamming) {
        println(s"[ingestkill] FAIL hamming: got $fp, clean was $cleanHamming")
        failed = true
      } else
        println(s"[ingestkill] PASS hamming: killed pid=$pid mid-trigger, " +
          s"stream drained to the clean fingerprint $fp")
    }

    // ---- arm 2: durable IVF append writer, executor killed mid-fold
    {
      val stream = spark.readStream
        .schema(e.select(col("vec_id"), col("embedding")).schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in_ivf")
      @volatile var view: DataFrame = null
      val writer = graft.streaming.AnnStream.ivfAppendWriterRecoverable(
        stream, s"$work/ix_ivf", "embedding", "vec_id", 64, cents,
        graft.pipeline.AnnSearch.ivfPostings(
          e.where(col("vec_id") % 4 === 0), "embedding", "vec_id", 64, cents),
        compactEvery = 2) { (v, _) => view = v }
        .option("checkpointLocation", s"$work/ckpt_ivf")
      val (_, pid) = withKill("ivf") {
        val q = writer.start()
        q.processAllAvailable(); q.stop()
      }
      val fp = fingerprint(view.select(col("corpus_id"), col("__cell")))
      if (pid == -1L) {
        println("[ingestkill] FAIL ivf: no executor was killed (stream too fast?)")
        failed = true
      } else if (fp != cleanIvf) {
        println(s"[ingestkill] FAIL ivf: got $fp, clean was $cleanIvf")
        failed = true
      } else
        println(s"[ingestkill] PASS ivf: killed pid=$pid mid-fold, durable " +
          s"index converged to the clean fingerprint $fp")
    }

    // ---- arm 3: stored-minhash writer, executor killed mid-trigger
    // (two bounded driver collects per batch interleave with task retry)
    {
      val schema = mhBatches.head.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in_minhash")
      val writer = graft.streaming.DocStreams.minhashNearDupWriterStored(
        stream, s"$work/state_minhash", "text", "doc_id",
        threshold = 0.5, maxBucketPairs = Long.MaxValue) { (pairs, batchId) =>
        pairs.select(col("id_a"), col("id_b"),
            org.apache.spark.sql.functions.round(col("jaccard"), 9).as("j"))
          .write.mode("overwrite").parquet(s"$work/out_minhash/batch=$batchId")
      }.option("checkpointLocation", s"$work/ckpt_minhash")
      val (_, pid) = withKill("minhash") {
        val q = writer.start()
        q.processAllAvailable(); q.stop()
      }
      val fp = fingerprint(spark.read.parquet(s"$work/out_minhash")
        .select(col("id_a"), col("id_b"), col("j")))
      if (pid == -1L) {
        println("[ingestkill] FAIL minhash: no executor was killed (stream too fast?)")
        failed = true
      } else if (fp != cleanMinhash) {
        println(s"[ingestkill] FAIL minhash: got $fp, clean was $cleanMinhash")
        failed = true
      } else
        println(s"[ingestkill] PASS minhash: killed pid=$pid mid-trigger, " +
          s"stream drained to the clean fingerprint $fp")
    }

    // ---- arm 4: stored-semdedup writer, executor killed mid-trigger
    // (the pruned cell read joins a retried batch-assignment stage)
    {
      val schema = sdBatches.head.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in_semdedup")
      val writer = graft.streaming.AnnStream.semanticNearDupWriterStored(
        stream, s"$work/state_semdedup", "embedding", "vec_id",
        threshold = 0.85, maxCellPairs = Long.MaxValue) { (pairs, batchId) =>
        pairs.select(col("id_a"), col("id_b"),
            org.apache.spark.sql.functions.round(col("cosine"), 9).as("c"))
          .write.mode("overwrite").parquet(s"$work/out_semdedup/batch=$batchId")
      }.option("checkpointLocation", s"$work/ckpt_semdedup")
      val (_, pid) = withKill("semdedup") {
        val q = writer.start()
        q.processAllAvailable(); q.stop()
      }
      val fp = fingerprint(spark.read.parquet(s"$work/out_semdedup")
        .select(col("id_a"), col("id_b"), col("c")))
      if (pid == -1L) {
        println("[ingestkill] FAIL semdedup: no executor was killed (stream too fast?)")
        failed = true
      } else if (fp != cleanSemdedup) {
        println(s"[ingestkill] FAIL semdedup: got $fp, clean was $cleanSemdedup")
        failed = true
      } else
        println(s"[ingestkill] PASS semdedup: killed pid=$pid mid-trigger, " +
          s"stream drained to the clean fingerprint $fp")
    }

    // ---- arm 5: stored-winnow writer, executor killed mid-trigger
    // (touched-bucket collect + gate driver aggregate interleave retry)
    {
      val schema = wnBatches.head.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in_winnow")
      val writer = graft.streaming.DocStreams.winnowNearDupWriterStored(
        stream, s"$work/state_winnow", "text", "doc_id",
        minShared = 10L) { (pairs, batchId) =>
        pairs.write.mode("overwrite").parquet(s"$work/out_winnow/batch=$batchId")
      }.option("checkpointLocation", s"$work/ckpt_winnow")
      val (_, pid) = withKill("winnow") {
        val q = writer.start()
        q.processAllAvailable(); q.stop()
      }
      val fp = fingerprint(spark.read.parquet(s"$work/out_winnow")
        .select(col("id_a"), col("id_b"), col("n_shared")))
      if (pid == -1L) {
        println("[ingestkill] FAIL winnow: no executor was killed (stream too fast?)")
        failed = true
      } else if (fp != cleanWinnow) {
        println(s"[ingestkill] FAIL winnow: got $fp, clean was $cleanWinnow")
        failed = true
      } else
        println(s"[ingestkill] PASS winnow: killed pid=$pid mid-trigger, " +
          s"stream drained to the clean fingerprint $fp")
    }

    if (removed.get() == 0) {
      println("[ingestkill] FAIL: no executor-removed event was ever observed")
      failed = true
    }
    spark.stop()
    if (failed) sys.exit(1)
    println("[ingestkill] ingest writers survived executor loss mid-trigger " +
      "with identical results")
  }
}
