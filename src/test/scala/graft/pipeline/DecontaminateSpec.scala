package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // eval doc shares an exact 5-gram run with corpus docs 1 and 2; doc 3 is
  // clean; doc 4 shares words but never 5 consecutive ones
  private def evalSet = Seq(
    (100L, "the quick brown fox jumps over a lazy dog tonight")).toDF("id", "text")
  private def corpus = Seq(
    (1L, "intro text the quick brown fox jumps and leaves"),
    (2L, "the quick brown fox jumps over a lazy dog tonight exactly"),
    (3L, "completely unrelated content about spark partitioning"),
    (4L, "quick fox brown the jumps dog lazy a over tonight")).toDF("id", "text")

  test("contaminated flags exactly the documents sharing a word 5-gram") {
    val hits = Decontaminate.contaminated(corpus, evalSet, "text", "id", 5)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet == Set(1L, 2L), s"got $hits")
    assert(hits(1L) == 1L, "doc 1 shares exactly one eval 5-gram")
    // doc 2 contains the eval text verbatim -> every one of its first
    // 6 shingles aligns with an eval shingle
    assert(hits(2L) == 6L, s"got ${hits(2L)}")
  }

  test("decontaminated returns the clean complement with full schema") {
    val clean = Decontaminate.decontaminated(corpus, evalSet, "text", "id", 5)
    assert(clean.select("id").as[Long].collect().toSet == Set(3L, 4L))
    assert(clean.columns.toSeq == corpus.columns.toSeq)
  }

  test("short documents fall back to whole-text shingles") {
    val ev = Seq((9L, "tiny doc")).toDF("id", "text")
    val cp = Seq((1L, "tiny doc"), (2L, "tiny doc extended beyond")).toDF("id", "text")
    val hits = Decontaminate.contaminated(cp, ev, "text", "id", 5)
      .as[(Long, Long)].collect().toMap
    // doc 1 == eval text (both < 5 words -> identical whole-text shingle);
    // doc 2's whole-text shingle differs -> clean
    assert(hits == Map(1L -> 1L))
  }

  test("contamination stats report the fraction over the doc's grams") {
    val stats = Decontaminate.contaminationStats(corpus, evalSet, "text", "id", 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 2: 11 tokens -> 7 distinct 5-grams, 6 of them eval-aligned
    assert(stats(2L)._1 == 6L && stats(2L)._2 == 7L)
    assert(math.abs(stats(2L)._3 - 6.0 / 7) < 1e-12)
    assert(stats(1L) == ((1L, 5L, 0.2)))
  }

  test("bloom arm is bit-identical to the exact path") {
    val exact = Decontaminate.contaminated(corpus, evalSet, "text", "id", 5)
      .as[(Long, Long)].collect().toSet
    // generous fpp: false positives MUST flow through the confirm join
    // without changing the answer
    val bloom = Decontaminate.contaminatedBloom(corpus, evalSet, "text", "id", 5,
        fpp = 0.5)
      .as[(Long, Long)].collect().toSet
    assert(bloom === exact)
    // and at a tight fpp too
    val tight = Decontaminate.contaminatedBloom(corpus, evalSet, "text", "id", 5,
        fpp = 0.001, expectedEvalGrams = 16L)
      .as[(Long, Long)].collect().toSet
    assert(tight === exact)
  }

  test("bloom probe never false-negatives a real eval gram") {
    // every contaminated doc the exact path finds must survive the bloom
    // prefilter on sf0.001 documents (one-sided error, by construction)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalSide = Curation.md5Bucket(col("doc_id")) < 100000L
    val ev = docs.where(evalSide)
    val cp = docs.where(!evalSide)
    val exact = Decontaminate.contaminated(cp, ev, "text", "doc_id", 5)
      .as[(Long, Long)].collect().toSet
    val bloom = Decontaminate.contaminatedBloom(cp, ev, "text", "doc_id", 5,
        fpp = 0.2).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must actually contaminate something")
    assert(bloom === exact)
  }

  test("bloom plan: codegen'd probe before the confirm join, no eval-gram broadcast") {
    val res = Decontaminate.contaminatedBloom(corpus, evalSet, "text", "id", 5)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from the plan:\n$plan")
    // the confirm is the shuffled semi-join (this arm exists for eval sets
    // too big to broadcast; Catalyst may still pick broadcast at this tiny
    // fixture size, so assert only that the filter sits in the scan stage)
    assert(res.as[(Long, Long)].collect().nonEmpty)
  }

  test("plan shape: the eval-gram side joins as a broadcast") {
    val plan = Decontaminate.contaminated(corpus, evalSet, "text", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle on the gram key:\n$plan")
  }

  test("contaminationSpans: attributes the leak to the eval doc at the exact offset") {
    // corpus doc 10 embeds eval 100's opening 5-gram starting at token 2;
    // doc 11 is a 3-token doc equal to eval 101's whole text (short-doc
    // whole-text gram at offset 0); doc 12 shares words but no 5-gram run
    val ev = Seq(
      (100L, "the quick brown fox jumps over a lazy dog"),
      (101L, "tiny eval snippet")).toDF("id", "text")
    val corp = Seq(
      (10L, "well then the quick brown fox jumps right out"),
      (11L, "tiny eval snippet"),
      (12L, "the brown dog jumps the fox")).toDF("id", "text")
    val got = Decontaminate.contaminationSpans(corp, ev, "text", "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(got((10L, 100L)) === ((1L, 2)))
    assert(got((11L, 101L)) === ((1L, 0)))
    assert(got.keySet === Set((10L, 100L), (11L, 101L)))
    // and the flag set agrees with contaminated() on the same inputs
    val flagged = Decontaminate.contaminated(corp, ev, "text", "id", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.keySet.map(_._1) === flagged)
  }
}
