package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL / KMV sketch invariants the value oracles cannot see: the merge
  * contract (shard-merge == whole-corpus, EXACTLY), estimate accuracy
  * against exact distinct counts, and the degenerate set relations.
  */
class SketchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def events = graft.util.EventTs.loadEvents(spark, dir)

  test("hll: merging per-shard registers equals sketching the whole corpus, exactly") {
    val whole = Profile.hllDistinct(events, "user_id", Seq("event_type"), p = 12)
    val a = Profile.hllRegisters(events.where(col("event_id") % 2 === 0),
      "user_id", Seq("event_type"), p = 12)
    val b = Profile.hllRegisters(events.where(col("event_id") % 2 =!= 0),
      "user_id", Seq("event_type"), p = 12)
    val merged = Profile.hllEstimate(
      Profile.hllMerge(a, b, Seq("event_type")), Seq("event_type"), p = 12)
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq ===
      whole.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq)
  }

  test("hll: estimates within 5% of exact distinct at p=12") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Profile.hllDistinct(events, "user_id", Seq("event_type"), p = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    exact.foreach { case (g, d) =>
      val rel = math.abs(est(g) - d) / d.toDouble
      assert(rel < 0.05, s"group $g: exact $d, est ${est(g)} (rel err $rel)")
    }
  }

  test("kmv: per-group size estimates within 15% at k=128; under-k groups exact") {
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = Profile.kmvPairStats(
      Profile.kmvSketch(events, "user_id", Seq("event_type"), k = 128),
      "event_type", k = 128).collect()
    stats.foreach { r =>
      val (ga, gb) = (r.getString(0), r.getString(1))
      assert(math.abs(r.getDouble(2) - exact(ga)) / exact(ga) < 0.15, s"$ga size")
      assert(math.abs(r.getDouble(3) - exact(gb)) / exact(gb) < 0.15, s"$gb size")
    }
    // under-k: a 3-distinct synthetic group reports exactly 3
    import spark.implicits._
    val tiny = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 1L),
      ("g2", 9L)).toDF("g", "v")
    val p = Profile.kmvPairStats(
      Profile.kmvSketch(tiny, "v", Seq("g"), k = 128), "g", k = 128)
      .collect().head
    assert(p.getDouble(2) === 3.0 && p.getDouble(3) === 1.0)
  }

  test("kmv: identical sets give jaccard 1, disjoint sets give 0") {
    import spark.implicits._
    val vals = (1L to 300L)
    val df = (vals.map(("a", _)) ++ vals.map(("b", _)) ++
      vals.map(v => ("c", v + 10000L))).toDF("g", "v")
    val stats = Profile.kmvPairStats(
      Profile.kmvSketch(df, "v", Seq("g"), k = 64), "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(6))).toMap
    assert(stats(("a", "b"))._1 === 1.0)              // identical: J = 1
    assert(stats(("a", "c"))._1 === 0.0)              // disjoint: J = 0
    assert(stats(("a", "c"))._2 === 0.0)              // and so is the intersection
    // identical sets: intersection estimate == the size estimate
    val sizeA = stats(("a", "b"))._2
    assert(math.abs(sizeA - 300.0) / 300.0 < 0.3)     // k=64: loose but sane
  }

  test("cms: estimates never undercount, and are exact sans collisions") {
    import spark.implicits._
    val vals = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("v")
    val counters = Profile.cmsCounters(vals, "v", d = 4, w = 2048)
    val est = Profile.cmsLookup(counters,
      Seq("a", "b", "c", "never-seen").toDF("v"), "v", d = 4, w = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 values in 2048 slots x 4 rows: no collisions, all exact
    assert(est === Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "never-seen" -> 0L))
    // one-sided bound under forced collisions (w = 2): est >= true count
    val tiny = Profile.cmsLookup(Profile.cmsCounters(vals, "v", d = 2, w = 2),
      Seq("a", "b", "c").toDF("v"), "v", d = 2, w = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny("a") >= 7L && tiny("b") >= 3L && tiny("c") >= 1L)
  }

  test("cms: merging per-shard counters equals sketching the whole corpus, exactly") {
    val toks = events.select(col("event_id"),
      col("event_type").as("v"))
    val whole = Profile.cmsCounters(toks, "v", d = 4, w = 512)
    val merged = Profile.cmsMerge(
      Profile.cmsCounters(toks.where(col("event_id") % 2 === 0), "v", d = 4, w = 512),
      Profile.cmsCounters(toks.where(col("event_id") % 2 =!= 0), "v", d = 4, w = 512))
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq ===
      whole.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq)
    // and the counter frame is bounded by d x w
    assert(whole.count() <= 4L * 512L)
  }

  test("hdr: quantile bands bracket the exact percentile within the relative bound") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = Profile.hdrQuantiles(
      Profile.hdrBuckets(docs, "n_chars", Seq("lang"), subBits = 5),
      Seq("lang"), Seq(500000L, 900000L, 990000L))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val vals = docs.select(col("lang"), col("n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    for ((l, sortedVs) <- vals; qm <- Seq(500000L, 900000L, 990000L)) {
      // exact discrete upper quantile: the ceil(q*n)-th smallest value
      val rank = ((sortedVs.length * qm + 999999L) / 1000000L).toInt
      val exact = sortedVs(rank - 1)
      val (lo, hi) = got((l, qm))
      assert(lo <= exact && exact <= hi, s"$l q$qm: $exact not in [$lo, $hi]")
      // band width respects the 2^-subBits relative bound
      assert(hi - lo <= math.max(1L, lo >> 5), s"$l q$qm band too wide: [$lo, $hi]")
    }
  }

  test("hdr: negative values are excluded, never sign-extended into ghost buckets") {
    import spark.implicits._
    val df = Seq(("a", 5L), ("a", -3L), ("a", 0L)).toDF("g", "v")
    val hist = Profile.hdrBuckets(df, "v", Seq("g"), subBits = 5)
    assert(hist.agg(sum(col("cnt"))).collect()(0).getLong(0) === 2L)
    assert(hist.where(col("bucket") < 0).count() === 0L)
  }

  test("hdr: merging per-shard histograms equals sketching the whole corpus, exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val whole = Profile.hdrBuckets(docs, "n_chars", Seq("lang"), subBits = 5)
    val merged = Profile.hdrMerge(
      Profile.hdrBuckets(docs.where(col("doc_id") % 2 === 0), "n_chars", Seq("lang"), subBits = 5),
      Profile.hdrBuckets(docs.where(col("doc_id") % 2 =!= 0), "n_chars", Seq("lang"), subBits = 5),
      Seq("lang"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._2, t._1)).toSeq
    assert(canon(merged) === canon(whole))
    // state bound: buckets per group <= 64 * 2^subBits
    assert(whole.groupBy("lang").count().where(col("count") > 64L * 32L).count() === 0L)
  }

  test("sketch sizes are bounded: <= m registers, <= k keys") {
    val regs = Profile.hllRegisters(events, "user_id", Seq("event_type"), p = 8)
    assert(regs.groupBy("event_type").count()
      .where(col("count") > 256).count() === 0L)
    val sk = Profile.kmvSketch(events, "user_id", Seq("event_type"), k = 16)
    assert(sk.where(size(col("sketch")) > 16).count() === 0L)
    // and the sketch arrays arrive sorted ascending
    assert(sk.where(expr(
      "exists(sequence(1, size(sketch) - 1), i -> sketch[i - 1] >= sketch[i])"))
      .count() === 0L)
  }
}
