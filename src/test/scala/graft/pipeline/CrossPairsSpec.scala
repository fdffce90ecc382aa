package graft.pipeline

import graft.SparkSpec
import graft.util.CapMetrics
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.ngramJaccardCrossPairs]] gate behavior — the hot-shingle rules
  * the DuckDB-oracled `dedup_cross_pairs` entry cannot cover (oracled
  * entries disable the cap by convention):
  *  - a shingle hot on BOTH sides (dfL*dfR over the cap) is dropped from
  *    pair generation; pairs whose every shared shingle is hot disappear,
  *    pairs sharing any surviving shingle keep their EXACT score;
  *  - a shingle heavy on ONE side only stays (its cross product is small);
  *  - a shingle absent from one side contributes nothing and is never
  *    counted hot (the df stats inner-join skips it);
  *  - drop accounting lands in CapMetrics stage `dedup_ngram_cross`.
  */
class CrossPairsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // word-trigram shingles: "h h h" is one shingle; "h h h q q q" has four
  private val batch = Seq(
    (1L, "h h h"),          // hot shingle only
    (2L, "h h h q q q"),    // hot + three unique-ish shingles shared with 102
    (3L, "h h h"),          // hot shingle only
    (4L, "o o o"), (5L, "o o o"), (6L, "o o o"), (7L, "o o o"), // heavy LEFT only
    (8L, "z z z")           // shingle absent from the corpus side
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    (101L, "h h h"),        // hot shingle only
    (102L, "h h h q q q"),
    (103L, "o o o")         // single right doc under the one-sided-heavy shingle
  ).toDF("doc_id", "text")

  private def pairs(cap: Long): Set[(Long, Long)] =
    Dedup.ngramJaccardCrossPairs(batch, corpus, "text", "doc_id",
        n = 3, threshold = 0.1, maxShinglePairs = cap)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("uncapped: every cross-side pair sharing a shingle, no same-side pairs") {
    val got = pairs(Long.MaxValue)
    val hotPairs = for (a <- Seq(1L, 2L, 3L); b <- Seq(101L, 102L)) yield (a, b)
    val oneSided = Seq(4L, 5L, 6L, 7L).map(a => (a, 103L))
    assert(got === (hotPairs ++ oneSided).toSet)
    // cap == Long.MaxValue short-circuits the gate entirely: no df stats
    // job runs and no CapMetrics stage is recorded — that's the contract
    // of the oracled entries (zero gate overhead when disabled)
  }

  test("capped: hot-on-both shingle drops its pairs; survivors keep exact scores") {
    // "h h h": dfL=3, dfR=2 -> 6 > 4 -> hot. "o o o": dfL=4, dfR=1 -> 4 <= 4
    // -> kept. "z z z": batch-only, no stats row, never hot.
    val got = pairs(4L)
    val survivors = Set((2L, 102L)) ++ Seq(4L, 5L, 6L, 7L).map(a => (a, 103L))
    assert(got === survivors,
      "only the pair sharing non-hot shingles and the one-sided-heavy pairs survive")
    val s = CapMetrics.lastMetrics("dedup_ngram_cross").get
    assert(s.droppedBuckets === 1L, "exactly the hot-on-both shingle is dropped")
    assert(s.droppedPairs === 6L, "3 left x 2 right candidate pairs accounted")

    // survivor score is the EXACT jaccard over the FULL sets (identical
    // texts -> 1.0), not a score over gated shingles
    val j = Dedup.ngramJaccardCrossPairs(batch, corpus, "text", "doc_id",
        n = 3, threshold = 0.1, maxShinglePairs = 4L)
      .where($"id_a" === 2L && $"id_b" === 102L)
      .select("jaccard").head().getDouble(0)
    assert(j === 1.0)
  }
}
