package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.spanRewrite]] — the Lee-et-al duplicated-span removal rewrite.
  * The invariants under test: the globally-first occurrence (smallest
  * (doc, pos)) survives, every other occurrence is cut, overlapping
  * duplicated windows merge through the covered-position set, matching is
  * case-insensitive while surviving words keep their case, and the output
  * canonicalizes whitespace without inventing or reordering words.
  */
class SpanRewriteSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], spanLen: Int,
                  minCount: Long = 2L): Map[Long, (String, Long)] =
    Dedup.spanRewrite(docs.toDF("doc_id", "text"), "text", "doc_id", spanLen, minCount)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_removed")))
      .toMap

  test("first occurrence survives, later copies are cut, overlaps merge") {
    // the 4-word passage spans two overlapping 3-grams; their covered
    // positions must merge into one clean cut
    val res = run(Seq(
      (1L, "intro alpha beta gamma delta end"),
      (2L, "start alpha beta gamma delta tail"),
      (3L, "ALPHA BETA GAMMA DELTA solo")), spanLen = 3)
    assert(res(1L) == ("intro alpha beta gamma delta end", 0L))
    assert(res(2L) == ("start tail", 4L))
    // case-insensitive match; doc 1 is the (doc, pos) minimum even though
    // doc 3's copy starts at position 0
    assert(res(3L) == ("solo", 4L))
  }

  test("a passage repeated within ONE document loses its second copy") {
    val res = run(Seq((7L, "alpha beta gamma filler alpha beta gamma")), spanLen = 3)
    assert(res(7L) == ("alpha beta gamma filler", 3L))
  }

  test("short, empty, null and ragged-whitespace docs pass through canonicalized") {
    val res = run(Seq(
      (1L, "too short"),
      (2L, ""),
      (3L, "  spaced \t out\n doc  "),
      (4L, null.asInstanceOf[String])), spanLen = 3)
    assert(res(1L) == ("too short", 0L))
    assert(res(2L) == ("", 0L))
    assert(res(3L) == ("spaced out doc", 0L))
    // a NULL text row survives as an empty clean text, never null/dropped
    assert(res(4L) == ("", 0L))
  }

  test("minCount gates the census: 2 copies survive minCount=3, 3 do not") {
    val two = Seq((1L, "p q r s"), (2L, "p q r s"))
    val resTwo = run(two, spanLen = 4, minCount = 3L)
    assert(resTwo(1L) == ("p q r s", 0L) && resTwo(2L) == ("p q r s", 0L))
    val three = two :+ (3L, "p q r s")
    val resThree = run(three, spanLen = 4, minCount = 3L)
    assert(resThree(1L) == ("p q r s", 0L))
    assert(resThree(2L) == ("", 4L) && resThree(3L) == ("", 4L))
  }

  test("incremental form cuts every batch occurrence of a corpus window " +
    "and never ranks within the batch") {
    val corpus = Seq((0L, "alpha beta gamma delta end")).toDF("doc_id", "text")
    val census = Dedup.ngramFrequency(corpus, "text", "doc_id", 3, 1L)
    val batch = Seq(
      // both overlapping corpus 3-grams present twice — ALL cut (no
      // first-occurrence survivor inside the batch)
      (1L, "x alpha beta gamma delta y alpha beta gamma delta"),
      (2L, "fresh words entirely"),
      (3L, "al pha")).toDF("doc_id", "text")
    val res = Dedup.spanRewriteAgainst(batch, census, "text", "doc_id", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_removed")))
      .toMap
    assert(res(1L) == ("x y", 8L))
    assert(res(2L) == ("fresh words entirely", 0L))
    assert(res(3L) == ("al pha", 0L))
  }

  test("matches an in-memory reference on a collision-heavy random corpus") {
    val L = 3
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 40L).map { id =>
      val n = rnd.nextInt(13)
      id -> Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }

    val words = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toVector
    }
    val occ = for {
      (id, ws) <- words
      p <- 0 to ws.length - L
      if ws.length >= L
    } yield (id, p, ws.slice(p, p + L).map(_.toLowerCase).mkString(" "))
    val removed = occ.groupBy(_._3).values.filter(_.size >= 2)
      .flatMap(_.sortBy(o => (o._1, o._2)).tail)
    val covByDoc = removed.groupBy(_._1).map { case (id, rs) =>
      id -> rs.flatMap(r => r._2 until r._2 + L).toSet
    }
    val expected = words.map { case (id, ws) =>
      val cov = covByDoc.getOrElse(id, Set.empty[Int])
      id -> (ws.zipWithIndex.collect { case (w, i) if !cov(i) => w }.mkString(" "),
        cov.size.toLong)
    }.toMap

    assert(run(docs, L) == expected)

    // the 8-byte-fingerprint shuffle diet must be output-identical on a
    // corpus with heavy genuine gram collisions
    val hashed = Dedup.spanRewrite(docs.toDF("doc_id", "text"), "text",
        "doc_id", L, 2L, hashGrams = true)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_removed")))
      .toMap
    assert(hashed == expected)
  }

  test("lineDedupRewrite: first line survives with original bytes, blanks " +
    "are never keys, case-insensitive match") {
    val docs = Seq(
      (1L, "Keep Me\n\nSHARED FOOTER  \nunique one"),
      (2L, "other stuff\nshared footer\n\nmore here"),
      (3L, "shared footer")).toDF("doc_id", "text")
    val res = Dedup.lineDedupRewrite(docs, "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_removed")))
      .toMap
    // doc 1 holds the first occurrence — ORIGINAL bytes (trailing spaces,
    // case) survive; its blank line is untouched
    assert(res(1L) == ("Keep Me\n\nSHARED FOOTER  \nunique one", 0L))
    assert(res(2L) == ("other stuff\n\nmore here", 1L))
    assert(res(3L) == ("", 1L))
  }

  test("explainPair: membership flags reconstruct jaccard's numerator " +
    "and denominators") {
    import org.apache.spark.sql.functions.{col, sum}
    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val ev = Dedup.explainPair(docs, "text", "doc_id", 1L, 2L, 3)
    val rows = ev.collect().map(r => r.getAs[String]("ngram") ->
      (r.getAs[Long]("in_a"), r.getAs[Long]("in_b"))).toMap
    assert(rows == Map(
      "a b c" -> (1L, 0L), "b c d" -> (1L, 1L),
      "c d e" -> (0L, 1L)))
    val agg = ev.agg(sum(col("in_a") * col("in_b")), sum(col("in_a")),
      sum(col("in_b"))).head()
    // jaccard 1/3, containment 1/2 — straight from the evidence frame
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) == ((1L, 2L, 2L)))
  }

  test("plan shape: the rebuild never sort-merge-joins the token stream") {
    // the words frame must meet the covered arrays through a broadcast
    // (covered is per-doc bounded), and nothing may explode tokens for
    // the rebuild — the plan claims in the scaladoc and SCALE.md
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.spanRewrite(src, "text", "doc_id", 5, 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly the census aggregate's exchanges; a token-level rebuild
    // shuffle would add an Exchange keyed by doc over exploded words
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("hashed incremental form agrees with the string-keyed one") {
    val corpus = Seq((0L, "alpha beta gamma delta end")).toDF("doc_id", "text")
    val census = Dedup.ngramFrequency(corpus, "text", "doc_id", 3, 1L)
    val batch = Seq((1L, "x alpha beta gamma delta y"),
      (2L, "fresh words entirely")).toDF("doc_id", "text")
    def collect(hash: Boolean) =
      Dedup.spanRewriteAgainst(batch, census, "text", "doc_id", 3,
          hashGrams = hash)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text_clean"), r.getAs[Long]("n_removed")))
        .toMap
    assert(collect(hash = true) == collect(hash = false))
  }
}
