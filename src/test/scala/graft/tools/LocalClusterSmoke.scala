package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fuzzy.{FuzzyAlgorithm, FuzzyMapping, FuzzyMatcher, MatchOptions}
import graft.util.CheckpointStrategy

/** Multi-process smoke of the headline paths (VERDICT r12 item 2):
  * everything in this repo had only ever executed inside ONE JVM
  * (local[32]), where broadcast, kernel/static-forwarder serialization,
  * `Reliable` checkpoint read-back from another executor, and
  * executor-side classloading are all design-verified but never crossed a
  * process boundary. This tool runs the headline paths on
  * `local-cluster[2,8,3072]` — a real standalone master + 2 worker
  * processes, each executor a separate JVM reached over RPC — and
  * compares row counts + order-insensitive value checksums against the
  * same queries on in-process local[8].
  *
  * Paths covered (the round-12 verdict's list, via the SAME SparkEntry /
  * Bench code paths the oracles pin):
  *  - exact fuzzy join (codegen'd kernel inside the join stage,
  *    broadcast small side)      — SparkEntry.queries("fuzzy_join_levenshtein")
  *  - exact fuzzy join with RELIABLE checkpoints (files written by one
  *    executor process, lineage read back by others)
  *  - LSH auto join (banded MinHash candidates, planner gates live)
  *  - IVF top-k FROM STORED POSTINGS (centroid fit, postings,
  *    partition-pruned probe)    — SparkEntry.queries("ann_cosine_ivf")
  *  - BM25 stored-index lifecycle (save/load parquet buckets,
  *    partition-pruned search)   — SparkEntry.queries("text_bm25_stored")
  *
  * Launch (SPARK_HOME is required by the worker's executor launcher):
  * {{{
  *   SPARK_HOME=/opt/spark sbt -batch \
  *     "Test/runMain graft.tools.LocalClusterSmoke /root/testdata/sf0.01"
  * }}}
  * Prints one PASS/FAIL line per path and exits nonzero on any drift or
  * if the cluster session failed to get real (>= 2) remote executors.
  */
object LocalClusterSmoke {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder().master(master).appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    if (master.startsWith("local-cluster")) {
      // executors are forked `java` processes: they need our compiled
      // classes on their classpath and the JDK17 module opens explicitly
      // (build.sbt's javaOptions only cover the driver fork)
      val cp = Seq("target/scala-2.13/classes", "target/scala-2.13/test-classes")
        .map(p => new java.io.File(p).getAbsolutePath).mkString(":")
      b.config("spark.executor.extraClassPath", cp)
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", "2g")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** (rows, order-insensitive value checksum) — columns sorted by name,
    * values cast to string, xxhash64 per row modded into a sum that
    * cannot overflow ANSI long arithmetic. */
  private def fingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.toSeq.map(c => col(c).cast("string"))
    val row = df.select(
      count(lit(1)).as("n"),
      coalesce(sum(pmod(xxhash64(concat_ws("|", cols: _*)), lit(1000000007L))),
        lit(0L)).as("h")).head()
    (row.getLong(0), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ckptBase = java.nio.file.Files.createTempDirectory("graft_smoke_ckpt")

    val paths: Seq[(String, SparkSession => DataFrame)] = Seq(
      "exact_fuzzy" -> (s => graft.SparkEntry.queries("fuzzy_join_levenshtein")(s, sfDir)),
      "exact_fuzzy_reliable" -> (s => {
        // per-master subdir ("localcluster" vs "local") so the two runs'
        // reliable-checkpoint files never share a directory
        val dir = ckptBase.resolve(s.sparkContext.master.filter(_.isLetter))
        FuzzyMatcher.matchDfs(
            s.read.parquet(s"$sfDir/customer.parquet"),
            s.read.parquet(s"$sfDir/supplier.parquet"),
            Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein)),
            MatchOptions(useApproxNearestNeighbor = Some(false),
              checkpoint = CheckpointStrategy.Reliable(dir.toString)))
          .select(col("c_custkey"), col("s_suppkey"),
            round(col("c_name_vs_s_name_levenshtein"), 6).as("score"))
      }),
      "lsh_auto_fuzzy" -> (s =>
        FuzzyMatcher.matchDfs(
            s.read.parquet(s"$sfDir/customer.parquet"),
            s.read.parquet(s"$sfDir/supplier.parquet"),
            Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein)),
            MatchOptions(useApproxNearestNeighbor = Some(true)))
          .select(col("c_custkey"), col("s_suppkey"),
            round(col("c_name_vs_s_name_levenshtein"), 6).as("score"))),
      "ivf_from_postings" -> (s => graft.SparkEntry.queries("ann_cosine_ivf")(s, sfDir)),
      "bm25_stored" -> (s => graft.SparkEntry.queries("text_bm25_stored")(s, sfDir)),
      // the durable segmented store: bootstrap, two O(batch) folds, serve
      // the merged view — segment parquet written by executor processes,
      // meta + commit markers resolved by the driver, postings cells
      // assigned in executor JVMs
      "durable_ivf_folds" -> (s => {
        import graft.pipeline.{AnnSearch, DurableIvfSegmentState}
        val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
        val cents = AnnSearch.normalizeCentroids(
          AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 4, iters = 1))
        val path = java.nio.file.Files.createTempDirectory("smoke_divf").toString
        val st = DurableIvfSegmentState.openOrCreate(s, path,
          "embedding", "vec_id", 64, cents,
          AnnSearch.ivfPostings(emb.where(col("vec_id") % 3 === 0),
            "embedding", "vec_id", 64, cents))
        st.fold(emb.where(col("vec_id") % 3 === 1).select(col("vec_id"), col("embedding")), 0L)
        st.fold(emb.where(col("vec_id") % 3 === 2).select(col("vec_id"), col("embedding")), 1L)
        st.view.select(col("corpus_id"), col("__cell"))
      }),
    )

    def runAll(master: String): (Map[String, (Long, Long)], Int) = {
      val s = session(master)
      try {
        val fps = paths.map { case (name, f) =>
          val t0 = System.nanoTime()
          val fp = fingerprint(f(s))
          println(f"[smoke] $master%-24s $name%-22s rows=${fp._1}%6d " +
            f"chk=${fp._2}%20d ${(System.nanoTime() - t0) / 1e9}%6.1f s")
          name -> fp
        }.toMap
        // AFTER the work: executor registration is async, so probing at
        // session start undercounts — by now every executor that ran a
        // task has registered with the status tracker
        (fps, s.sparkContext.statusTracker.getExecutorInfos.length)
      } finally s.stop()
    }

    val (clusterFp, nExec) = runAll("local-cluster[2,8,3072]")
    // statusTracker counts the driver too: 2 remote executors => 3
    val realCluster = nExec >= 3
    println(s"[smoke] cluster executors (incl. driver): $nExec")
    val (localFp, _) = runAll("local[8]")

    var failed = !realCluster
    if (!realCluster)
      println("[smoke] FAIL: local-cluster session did not get 2 remote executors")
    for ((name, _) <- paths) {
      val ok = clusterFp(name) == localFp(name)
      if (!ok) failed = true
      println(s"[smoke] ${if (ok) "PASS" else "FAIL"} $name " +
        s"cluster=${clusterFp(name)} local=${localFp(name)}")
    }
    if (failed) sys.exit(1)
    println("[smoke] all headline paths agree across process boundaries")
  }
}
