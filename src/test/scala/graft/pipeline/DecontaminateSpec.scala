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

  test("plan shape: the eval-gram side joins as a broadcast") {
    val plan = Decontaminate.contaminated(corpus, evalSet, "text", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle on the gram key:\n$plan")
  }
}
