package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer: kernel merge order, learner determinism/compression,
  * and the distributed vocab apply. */
class BpeSpec extends AnyFunSuite with SparkSpec {

  private val merges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "e" -> "n", "o" -> "r", "in" -> "g")

  test("kernel merges leftmost lowest-rank pair repeatedly") {
    import spark.implicits._
    def enc(w: String): Seq[String] =
      Seq(w).toDF("w")
        .select(graft.fuzzy.vectorFunctions.bpe_tokens(col("w"), merges))
        .head().getSeq[String](0)
    // 'the': t+h (rank 0) -> th; th+e (rank 1) -> the
    assert(enc("the") == Seq("the"))
    // 'thin': t+h -> th, then i+n (rank 2): [th, in]
    assert(enc("thin") == Seq("th", "in"))
    // 'string': i+n first (rank 2) -> [s,t,r,in,g]; then in+g (rank 9)
    assert(enc("string") == Seq("s", "t", "r", "ing"))
    // 'error': e+r (rank 3) beats o+r (rank 8); leftmost e+r first:
    // [er,r,o,r] -> remaining o+r merges -> [er,r,or]
    assert(enc("error") == Seq("er", "r", "or"))
    // no mergeable pair: stays characters
    assert(enc("xyz") == Seq("x", "y", "z"))
    // reconstruction invariant: concatenation recovers the word
    for (w <- Seq("the", "thin", "string", "error", "northern", "interring"))
      assert(enc(w).mkString == w, s"round trip of $w")
    assert(enc("") == Seq.empty)
  }

  test("learner: deterministic, compresses its own corpus, apply round-trips") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val learned = TextAnalysis.bpeLearn(docs, "text", numMerges = 30)
    assert(learned.size == 30, s"got ${learned.size} merges")
    assert(learned == TextAnalysis.bpeLearn(docs, "text", numMerges = 30))
    // applying the learned merges must shrink the token stream vs chars
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
    val stats = words.select(
        length(col("w")).cast("long").as("chars"),
        size(graft.fuzzy.vectorFunctions.bpe_tokens(col("w"), learned))
          .cast("long").as("toks"))
      .agg(sum(col("chars")), sum(col("toks"))).head()
    assert(stats.getLong(1) < stats.getLong(0) * 8 / 10,
      s"learned merges barely compress: ${stats.getLong(1)} toks vs ${stats.getLong(0)} chars")
    // round trip on real words
    val bad = words.distinct().limit(200)
      .select(col("w"), concat_ws("", graft.fuzzy.vectorFunctions.bpe_tokens(col("w"), learned)).as("r"))
      .where(col("w") =!= col("r")).count()
    assert(bad == 0L, s"$bad words failed reconstruction")
  }

  test("bpe_tokens and cdc_chunks are SQL-registered") {
    val toks = spark.sql(
      "SELECT bpe_tokens('the', 't h', 'th e') AS t")
      .head().getSeq[String](0)
    assert(toks == Seq("the"))
    val chunks = spark.sql(
      "SELECT cdc_chunks(array('a', 'b', 'c'), 1) AS c")
      .head().getSeq[String](0)
    // avg = 1: every token's hash is divisible by 1 -> one chunk each
    assert(chunks == Seq("a", "b", "c"))
  }

  test("bpeVocab: weighted by word frequency, distinct-word encode") {
    import spark.implicits._
    val docs = Seq((1L, "the the thin"), (2L, "the")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeVocab(docs, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'the' x3 -> token 'the' x3; 'thin' x1 -> 'th', 'in'
    assert(got == Map("the" -> 3L, "th" -> 1L, "in" -> 1L), s"got $got")
  }
}
