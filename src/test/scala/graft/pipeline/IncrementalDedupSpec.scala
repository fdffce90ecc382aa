package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // corpus: 100-102; batch: 1-5
  private def corpus = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "completely different corpus content about query planning"),
    (102L, "the quick brown fox jumps over the lazy dog")   // corpus-internal dup
  ).toDF("doc_id", "text")

  private def batch = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 100/102
    (2L, "the quick brown fox jumps over the lazy cat"),     // near dup (j = 0.75)
    (3L, "totally novel text that matches nothing at all"),  // clean
    (4L, "completely different corpus content about query planning"), // exact of 101
    (5L, "the quick brown fox jumps over the lazy cat")      // near dup, same as 2
  ).toDF("doc_id", "text")

  private def run() =
    Dedup.incrementalDedup(batch, corpus, "text", "doc_id",
      n = 3, threshold = 0.5, maxShinglePairs = Long.MaxValue)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap

  test("exact dups attach the min corpus id; near dups their best match") {
    val m = run()
    assert(m.keySet == Set(1L, 2L, 4L, 5L), s"got $m")
    assert(m(1L) == (("exact", 100L, 1.0)), "exact match takes the MIN corpus id")
    assert(m(4L) == (("exact", 101L, 1.0)))
    // 9 tokens -> 7 shingles, 6 shared, union 8 -> 0.75; ties (100 vs 102
    // have identical text, hence identical jaccard) break to the min id
    assert(m(2L)._1 == "near" && m(2L)._2 == 100L && math.abs(m(2L)._3 - 0.75) < 1e-12)
    assert(m(5L) == m(2L), "identical batch docs get identical verdicts")
  }

  test("clean batch docs are absent; within-side dups are not reported") {
    val m = run()
    assert(!m.contains(3L), "doc sharing nothing with the corpus is clean")
    // batch docs 2 and 5 are identical to each other -> still only
    // reported against the CORPUS, never against each other
    assert(m.values.forall(v => v._2 >= 100L), "matches must be corpus ids")
  }

  test("one row per duplicated batch doc (near arm is deterministic top-1)") {
    val out = Dedup.incrementalDedup(batch, corpus, "text", "doc_id",
      n = 3, threshold = 0.5, maxShinglePairs = Long.MaxValue)
    assert(out.groupBy("doc_id").count().where($"count" > 1).count() == 0)
  }

  test("minhash incremental equals exact cross pairs on stored state (no corpus text)") {
    // 24x1 bands: a shared shingle collides with near-certainty, so the
    // LSH candidate stage finds every >= 0.5 pair on this fixture and the
    // exact cross-jaccard operator is the ground truth
    val exact = Dedup.ngramJaccardCrossPairs(batch, corpus, "text", "doc_id",
        n = 3, threshold = 0.5, maxShinglePairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val state = Dedup.minhashState(corpus, "text", "doc_id", shingleLen = 3, k = 24)
      .select("doc_id", "__sig", "__hset") // corpus TEXT never enters below
    val mh = Dedup.minhashIncrementalPairs(batch, state, "text", "doc_id",
        shingleLen = 3, numBands = 24, rowsPerBand = 1, threshold = 0.5,
        maxBucketPairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty && mh === exact)
    // cross-side only: ids oriented batch -> corpus even though batch 2/5
    // (and corpus 100/102) are internal duplicate pairs
    assert(mh.forall { case (a, b, _) => a < 100L && b >= 100L })
  }

  test("minhash state is append-only: state(A union B) == state(A) union state(B)") {
    val whole = Dedup.minhashState(corpus.unionByName(batch), "text", "doc_id",
        shingleLen = 3, k = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSet
    val parts = Dedup.minhashState(corpus, "text", "doc_id", shingleLen = 3, k = 8)
      .unionByName(Dedup.minhashState(batch, "text", "doc_id", shingleLen = 3, k = 8))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toSet
    assert(whole === parts)
  }

  test("stored minhash state: identical answer to the in-memory form, " +
    "PRUNED banded and hset scans, generation-flipped refresh") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpusDf = docs
    val batchDf = docs.where($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("mh_store").toString
    Dedup.saveMinhashState(corpusDf, "text", "doc_id", dir, shingleLen = 3,
      numBands = 16, rowsPerBand = 1, nBuckets = 16)
    val stored = Dedup.loadMinhashState(spark, dir)
    assert(stored.shingleLen == 3 && stored.numBands == 16 &&
      stored.rowsPerBand == 1 && stored.nBuckets == 16)

    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    // the banded/stats reads execute inside the operator's EAGER
    // candidate materialization, so they never appear in the returned
    // frame's plan — capture every plan executed during the call via a
    // QueryExecutionListener and assert the pruning there
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val viaStored =
      try Dedup.minhashPairsAgainstStored(batchDf, "text", "doc_id",
        stored, threshold = 0.5, maxBucketPairs = Long.MaxValue)
      finally ()
    val inMemory = pairSet(Dedup.minhashIncrementalPairs(batchDf,
      Dedup.minhashState(corpusDf, "text", "doc_id", shingleLen = 3, k = 16),
      "text", "doc_id", shingleLen = 3, numBands = 16, rowsPerBand = 1,
      threshold = 0.5, maxBucketPairs = Long.MaxValue))
    assert(pairSet(viaStored) == inMemory && inMemory.nonEmpty,
      s"stored=${pairSet(viaStored).size} inMemory=${inMemory.size}")

    // both stored reads must carry their bucket filter INSIDE the
    // PartitionFilters list (same non-vacuous assertion as the hamming
    // store spec): banded/stats prune on `bucket`, hsets on `hbucket`
    // (?<!h)bucket: 'hbucket' contains the substring 'bucket', so an
    // unanchored pattern would let the hsets scan satisfy BOTH asserts
    // and a lost banded/stats pushdown would ship undetected. Listener
    // callbacks are async — poll briefly for the materialization plan.
    val bandPrune = "PartitionFilters: \\[[^\\]]*(?<!h)bucket".r
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    import scala.jdk.CollectionConverters._
    while (!plans.asScala.exists(p => bandPrune.findFirstIn(p).isDefined) &&
      System.nanoTime() < deadline) Thread.sleep(50)
    spark.listenerManager.unregister(listener)
    assert(plans.asScala.exists(p => bandPrune.findFirstIn(p).isDefined),
      "band-bucket filter did not reach partition pruning in any plan " +
        s"executed during the call:\n${plans.asScala.mkString("\n---\n")}")
    // the hsets scan IS in the returned frame's plan (verify join side)
    val plan = viaStored.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*hbucket".r.findFirstIn(plan).isDefined,
      s"hset-bucket filter did not reach partition pruning:\n$plan")

    // a refresh flips generations (shared writeGenerationFlipped harness
    // — grace/crash behavior is pinned by the hamming store spec)
    Dedup.saveMinhashState(corpusDf, "text", "doc_id", dir, shingleLen = 3,
      numBands = 16, rowsPerBand = 1, nBuckets = 16)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted
    assert(gens.contains("gen=1") && gens.contains("gen=0"),
      s"refresh did not flip generations with grace: ${gens.toSeq}")
    assert(pairSet(Dedup.minhashPairsAgainstStored(batchDf, "text", "doc_id",
      Dedup.loadMinhashState(spark, dir), threshold = 0.5,
      maxBucketPairs = Long.MaxValue)) == inMemory)

    // empty batch: zero pairs, no touched buckets, no failure
    assert(Dedup.minhashPairsAgainstStored(batchDf.limit(0), "text", "doc_id",
      stored, threshold = 0.5).count() == 0L)
  }

  test("stored minhash: capped buckets only remove pairs, never invent them") {
    val dir = java.nio.file.Files.createTempDirectory("mh_store_cap").toString
    Dedup.saveMinhashState(corpus, "text", "doc_id", dir, shingleLen = 3,
      numBands = 24, rowsPerBand = 1, nBuckets = 8)
    val stored = Dedup.loadMinhashState(spark, dir)
    def at(cap: Long) = Dedup.minhashPairsAgainstStored(batch, "text", "doc_id",
        stored, threshold = 0.5, maxBucketPairs = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = at(Long.MaxValue)
    assert(full.nonEmpty && at(1L).subsetOf(full))
  }

  test("minhash incremental: capped buckets only remove pairs, never invent them") {
    val state = Dedup.minhashState(corpus, "text", "doc_id", shingleLen = 3, k = 24)
    def at(cap: Long) = Dedup.minhashIncrementalPairs(batch, state, "text", "doc_id",
        shingleLen = 3, numBands = 24, rowsPerBand = 1, threshold = 0.5,
        maxBucketPairs = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = at(Long.MaxValue)
    val capped = at(1L) // every multi-pair bucket over budget
    assert(capped.subsetOf(full))
  }

  test("containment cross pairs equal the cross-side slice of the self-join " +
    "operator, and catch the asymmetric quote jaccard misses") {
    import spark.implicits._
    val quoted = corpus.unionByName(Seq(
      // corpus doc 103 embeds batch doc 6's full text inside much more:
      // containment 1.0, jaccard diluted far below any useful threshold
      (103L, "prefix filler words here the quick brown fox jumps over the " +
        "lazy dog and then a very long suffix of unrelated filler content " +
        "that keeps the jaccard of this pair tiny indeed")).toDF("doc_id", "text"))
    val qBatch = batch.unionByName(
      Seq((6L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
    val whole = Dedup.containmentPairs(qBatch.unionByName(quoted),
        "text", "doc_id", 3, 0.9, maxShinglePairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val expect = whole.collect { case (a, b, c) if a < 100L && b >= 100L => (a, b, c) }
    val got = Dedup.containmentCrossPairs(qBatch, quoted, "text", "doc_id",
        3, 0.9, maxShinglePairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(got === expect && got.nonEmpty)
    // the quote pair survives the 0.9 bar cross-side...
    assert(got.exists { case (a, b, _) => a == 6L && b == 103L })
    // ...while its jaccard is nowhere near it (the signal this op exists for)
    val j = Dedup.ngramJaccardCrossPairs(qBatch, quoted, "text", "doc_id",
        3, 0.0001, maxShinglePairs = Long.MaxValue)
      .where($"id_a" === 6L && $"id_b" === 103L)
      .select("jaccard").collect()
    assert(j.nonEmpty && j.head.getDouble(0) < 0.5)
  }

  test("stored containment state: identical answer to the in-memory form, " +
    "PRUNED shingles/stats/hsets scans, generation-flipped refresh") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpusDf = docs
    val batchDf = docs.where($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("ct_store").toString
    Dedup.saveContainmentState(corpusDf, "text", "doc_id", dir, n = 3,
      nBuckets = 16)
    val stored = Dedup.loadContainmentState(spark, dir)
    assert(stored.n == 3 && stored.nBuckets == 16)

    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    // the gate's stats read executes inside the call (driver aggregate);
    // capture via a QueryExecutionListener like the winnow/minhash specs
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // real cap (default) so the cross gate actually prices from stats
    val viaStored = Dedup.containmentPairsAgainstStored(batchDf, "text",
      "doc_id", stored, threshold = 0.5)
    val inMemory = pairSet(Dedup.containmentCrossPairs(batchDf, corpusDf,
      "text", "doc_id", 3, 0.5))
    assert(pairSet(viaStored) == inMemory && inMemory.nonEmpty,
      s"stored=${pairSet(viaStored).size} inMemory=${inMemory.size}")

    // stats scan AND shingles scan execute INSIDE the call (the gate's
    // driver aggregate; the materialized pairs frame for the touched-id
    // collect) — both prunes must appear in listener-captured plans,
    // path-anchored so one scan can't satisfy the other's assert
    import scala.jdk.CollectionConverters._
    def pruned(path: String, part: String, extra: Seq[String] = Nil) =
      (plans.asScala.toSeq ++ extra).exists(p =>
        p.contains(path) &&
          s"PartitionFilters: \\[[^\\]]*$part".r.findFirstIn(p).isDefined)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!(pruned("/stats", "bucket") && pruned("/shingles", "bucket")) &&
      System.nanoTime() < deadline) Thread.sleep(50)
    spark.listenerManager.unregister(listener)
    assert(pruned("/stats", "bucket"),
      "stats bucket filter did not reach partition pruning in any plan " +
        s"executed during the call:\n${plans.asScala.mkString("\n---\n")}")
    assert(pruned("/shingles", "bucket"),
      "shingles bucket filter did not reach partition pruning in any plan " +
        s"executed during the call:\n${plans.asScala.mkString("\n---\n")}")
    // the hsets verify scan IS in the returned frame's plan (join side)
    val plan = viaStored.queryExecution.executedPlan.toString
    assert(pruned("/hsets", "hbucket", Seq(plan)),
      s"hsets hbucket filter did not reach partition pruning:\n$plan")

    // a refresh flips generations (shared writeGenerationFlipped harness)
    Dedup.saveContainmentState(corpusDf, "text", "doc_id", dir, n = 3,
      nBuckets = 16)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted
    assert(gens.contains("gen=1") && gens.contains("gen=0"),
      s"refresh did not flip generations with grace: ${gens.toSeq}")
    assert(pairSet(Dedup.containmentPairsAgainstStored(batchDf, "text",
      "doc_id", Dedup.loadContainmentState(spark, dir),
      threshold = 0.5)) == inMemory)

    // empty batch: zero pairs, no touched buckets, no failure
    assert(Dedup.containmentPairsAgainstStored(batchDf.limit(0), "text",
      "doc_id", stored, threshold = 0.5).count() == 0L)

    // a never-saved path names the writer to run, loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.loadContainmentState(spark,
        java.nio.file.Files.createTempDirectory("ct_none").toString)
    }
    assert(e.getMessage.contains("saveContainmentState"))
  }

  test("stored containment: capped shingles only remove pairs, never invent them") {
    val dir = java.nio.file.Files.createTempDirectory("ct_store_cap").toString
    Dedup.saveContainmentState(corpus, "text", "doc_id", dir, n = 3, nBuckets = 8)
    val stored = Dedup.loadContainmentState(spark, dir)
    def at(cap: Long) = Dedup.containmentPairsAgainstStored(batch, "text",
        "doc_id", stored, threshold = 0.1, maxShinglePairs = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = at(Long.MaxValue)
    val capped = at(1L)
    assert(full.nonEmpty && capped.subsetOf(full),
      s"capped=$capped full=$full")
  }

  test("winnow cross pairs equal the cross-side slice of the self-join operator") {
    // ground truth: run the whole-corpus operator on the union and keep
    // only batch-x-corpus rows (ids disjoint: batch < 100, corpus >= 100)
    val union = batch.unionByName(corpus)
    val whole = Dedup.winnowOverlapPairs(union, "text", "doc_id",
        k = 3, window = 4, minShared = 1L, maxFingerprintPairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = whole.collect { case (a, b, n) if a < 100L && b >= 100L => (a, b, n) }
    val got = Dedup.winnowCrossPairs(batch,
        Dedup.winnowState(corpus, "text", "doc_id", k = 3, window = 4),
        "text", "doc_id", k = 3, window = 4, minShared = 1L,
        maxFingerprintPairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect && got.nonEmpty)
    // cross-side only: batch 2/5 (identical text) never pair each other
    assert(got.forall { case (a, b, _) => a < 100L && b >= 100L })
  }

  test("stored winnow state: identical answer to the in-memory form, " +
    "PRUNED fps and stats scans, generation-flipped refresh") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val corpusDf = docs
    val batchDf = docs.where($"doc_id" % 5 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("wn_store").toString
    Dedup.saveWinnowState(corpusDf, "text", "doc_id", dir, k = 5,
      window = 4, useMd5 = false, nBuckets = 16)
    val stored = Dedup.loadWinnowState(spark, dir)
    assert(stored.k == 5 && stored.window == 4 && !stored.useMd5 &&
      stored.nBuckets == 16)

    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "n_shared")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the gate's stats read executes inside the call (driver aggregate);
    // capture it via a QueryExecutionListener like the minhash spec
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // real cap (default) so the cross gate actually prices from stats
    val viaStored = Dedup.winnowPairsAgainstStored(batchDf, "text", "doc_id",
      stored, minShared = 10L)
    val inMemory = pairSet(Dedup.winnowCrossPairs(batchDf,
      Dedup.winnowState(corpusDf, "text", "doc_id", k = 5, window = 4),
      "text", "doc_id", k = 5, window = 4, minShared = 10L))
    assert(pairSet(viaStored) == inMemory && inMemory.nonEmpty,
      s"stored=${pairSet(viaStored).size} inMemory=${inMemory.size}")

    // the stats scan (executed during the gate) must prune on bucket:
    // look for a plan that reads the /stats path WITH a bucket
    // PartitionFilters entry — path-anchored so the fps scan can't
    // satisfy this assert. Listener callbacks are async: poll briefly.
    import scala.jdk.CollectionConverters._
    def statsPruned = plans.asScala.exists(p =>
      p.contains("/stats") &&
        "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (!statsPruned && System.nanoTime() < deadline) Thread.sleep(50)
    spark.listenerManager.unregister(listener)
    assert(statsPruned,
      "stats bucket filter did not reach partition pruning in any plan " +
        s"executed during the call:\n${plans.asScala.mkString("\n---\n")}")
    // the fps scan IS in the returned frame's plan (join side)
    val plan = viaStored.queryExecution.executedPlan.toString
    assert(plan.contains("/fps") &&
      "PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"fps bucket filter did not reach partition pruning:\n$plan")

    // a refresh flips generations (shared writeGenerationFlipped harness)
    Dedup.saveWinnowState(corpusDf, "text", "doc_id", dir, k = 5,
      window = 4, useMd5 = false, nBuckets = 16)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted
    assert(gens.contains("gen=1") && gens.contains("gen=0"),
      s"refresh did not flip generations with grace: ${gens.toSeq}")
    assert(pairSet(Dedup.winnowPairsAgainstStored(batchDf, "text", "doc_id",
      Dedup.loadWinnowState(spark, dir), minShared = 10L)) == inMemory)

    // empty batch: zero pairs, no touched buckets, no failure
    assert(Dedup.winnowPairsAgainstStored(batchDf.limit(0), "text", "doc_id",
      stored, minShared = 10L).count() == 0L)

    // a never-saved path names the writer to run, loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.loadWinnowState(spark,
        java.nio.file.Files.createTempDirectory("wn_none").toString)
    }
    assert(e.getMessage.contains("saveWinnowState"))
  }

  test("stored winnow: capped fingerprints only remove pairs, never invent them") {
    val dir = java.nio.file.Files.createTempDirectory("wn_store_cap").toString
    Dedup.saveWinnowState(corpus, "text", "doc_id", dir, k = 3, window = 4,
      nBuckets = 8)
    val stored = Dedup.loadWinnowState(spark, dir)
    def at(cap: Long) = Dedup.winnowPairsAgainstStored(batch, "text", "doc_id",
        stored, minShared = 1L, maxFingerprintPairs = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = at(Long.MaxValue)
    assert(full.nonEmpty && at(1L).subsetOf(full))
  }
}
