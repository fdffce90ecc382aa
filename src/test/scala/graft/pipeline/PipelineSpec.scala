package graft.pipeline

import graft.SparkSpec
import graft.util.CapMetrics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val docsDir = "/root/testdata/sf0.001/documents.parquet"
  private lazy val docs = spark.read.parquet(docsDir)

  test("exact dedup keeps min id per distinct text") {
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val res = Dedup.exactDedup(d, "text", "doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("keep_id"), r.getAs[Long]("dup_count"))).toSet
    assert(res == Set(("a b c", 1L, 2L), ("x y z", 3L, 1L)))
    assert(Dedup.exactDedupRows(d, "text", "doc_id").select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("word shingles: distinct n-grams, short docs collapse to one") {
    val d = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(d, "text", "doc_id", 3).as[(Long, String)].collect().toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d"), (2L, "a b")))
  }

  test("duplicationStats: doc and chunk tiers from a hand-built corpus") {
    val text16 = (1 to 16).map(i => s"w$i").mkString(" ")
    val other16 = (1 to 16).map(i => s"x$i").mkString(" ")
    val d = Seq(
      (1L, text16),                       // chunk A
      (2L, text16),                       // exact dup of 1 (chunk A again)
      (3L, other16),                      // unique chunk B
      (4L, text16 + " " + other16)        // chunks A and B again
    ).toDF("doc_id", "text")
    val r = Dedup.duplicationStats(d, "text", "doc_id", 16).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_distinct_texts") == 3L)
    assert(r.getAs[Long]("dup_doc_rows") == 1L)
    // chunk instances: 1 + 1 + 1 + 2 = 5; distinct digests: A, B = 2;
    // both digests repeat, so every instance is in a duplicated class
    assert(r.getAs[Long]("n_chunk_instances") == 5L)
    assert(r.getAs[Long]("n_distinct_chunks") == 2L)
    assert(r.getAs[Long]("dup_chunk_instances") == 5L)
  }

  test("ngramFrequency counts document frequency; boilerplateFlags exposure") {
    val d = Seq(
      (1L, "the quick brown fox jumps"),   // "the quick brown" etc.
      (2L, "the quick brown dog sits"),    // shares "the quick brown"
      (3L, "completely different words here"),
      (4L, "the quick brown fox runs")     // shares two trigrams with 1
    ).toDF("doc_id", "text")
    val freq = Dedup.ngramFrequency(d, "text", "doc_id", 3, 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(freq == Set(("the quick brown", 3L, 1L), ("quick brown fox", 2L, 1L)))
    val flags = Dedup.boilerplateFlags(d, "text", "doc_id", 3, 2L)
      .select($"doc_id".as[Long], $"hot_ngrams".as[Long], $"boiler_frac".as[Double])
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 3 has no hot trigram -> absent; docs 1/4 carry both hot grams,
    // doc 2 carries one; each doc has 3 distinct trigrams
    assert(!flags.contains(3L))
    assert(flags(1L) == ((2L, 0.666667)) && flags(4L) == ((2L, 0.666667)))
    assert(flags(2L) == ((1L, 0.333333)))
    // census with minDocs=1 degenerates to the full distinct-gram census:
    // docs 1/2/4 have 3 trigrams, doc 3 (4 words) has 2; "the quick brown"
    // appears 3x and "quick brown fox" 2x -> 11 instances, 8 distinct
    val all = Dedup.ngramFrequency(d, "text", "doc_id", 3, 1L).count()
    assert(all == 8, s"expected 8 distinct trigrams, got $all")
    // the census-reuse (incremental) shape is definitionally identical
    // when handed the same census
    val viaCensus = Dedup.boilerplateFlagsAgainst(d,
        Dedup.ngramFrequency(d, "text", "doc_id", 3, 2L), "text", "doc_id", 3)
      .select($"doc_id".as[Long], $"hot_ngrams".as[Long], $"boiler_frac".as[Double])
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaCensus == flags)
    // census maintenance: merging the UNTHRESHOLDED censuses of two
    // disjoint halves equals the whole-corpus census at any threshold —
    // including the cross-batch gram ("quick brown fox": once in docs
    // 1-2's half, once in 3-4's) a pre-thresholded merge would lose
    val half1 = Dedup.ngramFrequency(d.where($"doc_id" <= 2), "text", "doc_id", 3, 1L)
    val half2 = Dedup.ngramFrequency(d.where($"doc_id" >= 3), "text", "doc_id", 3, 1L)
    val merged = Dedup.mergeCensus(half1, half2, 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(merged == freq)
  }

  test("native word_shingles kernel matches the HOF construction on real documents") {
    // the kernel replaced split+transform+slice+concat_ws+array_distinct;
    // token/edge semantics (regex-boundary empties, short-doc collapse,
    // first-occurrence distinct order) must be byte-identical
    val tokens = split(lower(trim(col("text"))), "\\s+")
    val hof = array_distinct(
      when(size(tokens) < 3, array(concat_ws(" ", tokens)))
        .otherwise(transform(sequence(lit(0), size(tokens) - lit(3)),
          i => concat_ws(" ", slice(tokens, i + 1, lit(3))))))
    val edgy = Seq((9001L, "  a\tb \n c  a b c"), (9002L, "x"), (9003L, "Ä ß b c"))
      .toDF("doc_id", "text")
    val both = docs.select(col("doc_id"), col("text")).unionByName(edgy)
      .select(col("doc_id"), hof.as("h"),
        graft.fuzzy.vectorFunctions.word_shingles(lower(trim(col("text"))), 3).as("n"))
    assert(both.where(not(col("h") === col("n"))).count() == 0)
  }

  test("word_shingles matches the HOF construction on randomized text (fuzz)") {
    // adversarial alphabet: runs of mixed whitespace (regex-boundary empty
    // tokens), unicode letters, punctuation, digits — every n the callers use
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "ab YZ\t\näß.,0 "
    def doc(): String =
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0 until 300).map(i => (i.toLong, doc())).toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val tokens = split(lower(trim(col("text"))), "\\s+")
      val hof = array_distinct(
        when(size(tokens) < n, array(concat_ws(" ", tokens)))
          .otherwise(transform(sequence(lit(0), size(tokens) - lit(n)),
            i => concat_ws(" ", slice(tokens, i + 1, lit(n))))))
      val mismatches = docs.select(hof.as("h"),
          graft.fuzzy.vectorFunctions.word_shingles(lower(trim(col("text"))), n).as("k"))
        .where(not(col("h") === col("k"))).count()
      assert(mismatches == 0, s"kernel diverges from HOF at n=$n")
    }
  }

  test("hashed_shingle_set = sorted distinct xxhash64 of word_shingles") {
    val viaBuiltins = sort_array(array_distinct(transform(
      graft.fuzzy.vectorFunctions.word_shingles(lower(trim(col("text"))), 3),
      s => xxhash64(s))))
    val mismatches = docs.select(viaBuiltins.as("h"),
        graft.fuzzy.vectorFunctions.hashed_shingle_set(lower(trim(col("text"))), 3).as("k"))
      .where(not(col("h") === col("k"))).count()
    assert(mismatches == 0)
  }

  test("sorted_intersect_count merges sorted sets correctly") {
    val d = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L), 2),
      (Array(1L, 2L), Array(3L, 4L), 0),
      (Array.empty[Long], Array(1L), 0),
      (Array(7L), Array(7L), 1)).toDF("a", "b", "want")
    val bad = d.where(
      graft.fuzzy.vectorFunctions.sorted_intersect_count(col("a"), col("b")) =!= col("want"))
    assert(bad.count() == 0)
  }

  test("hot-shingle df gate bounds a 10k-doc boilerplate shingle (drops logged)") {
    // 10,000 docs all sharing one boilerplate trigram -> ungated, that one
    // shingle key alone would emit ~5e7 pairs out of a single reducer. With
    // the default budget the hot shingles are dropped from blocking
    // (accounted), while a small clique sharing RARE shingles survives with
    // its EXACT full-set jaccard.
    val boiler = "all rights reserved"
    // 20002 extends 20001 by one trailing token: 6 vs 7 distinct shingles,
    // 6 common (incl. the hot boilerplate trigram) -> jaccard 6/7
    val d = ((0 until 10000).map(i => (i.toLong, s"unique$i token$i $boiler")) ++
      Seq((20001L, s"shared rare payload alpha beta $boiler"),
          (20002L, s"shared rare payload alpha beta $boiler extracoda"))).toDF("doc_id", "text")
    // budget 1000 pairs -> maxDf ~ 45; boilerplate shingles (df ~ 10k) drop
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5,
      maxShinglePairs = 1000L).collect()
    val s = CapMetrics.lastMetrics("dedup_ngram")
      .getOrElse(fail("no cap metrics recorded for dedup_ngram"))
    assert(s.droppedBuckets > 0, "boilerplate shingle should trip the df cap")
    assert(s.droppedPairs > 1_000_000L, "dropped-pair estimate should reflect the 10k-doc shingle")
    // the rare-shingle pair survives, and its jaccard counts the FULL sets
    // (including the dropped boilerplate shingles). Reference value: the
    // ungated run restricted to just those two docs (their pairwise jaccard
    // is independent of the rest of the corpus).
    val ungated = Dedup.ngramJaccardPairs(d.where(col("doc_id") >= 20000L),
      "text", "doc_id", 3, 0.5, maxShinglePairs = Long.MaxValue)
      .where(col("id_a") === 20001L && col("id_b") === 20002L)
      .select("jaccard").collect().map(_.getDouble(0))
    val gatedPair = pairs.filter(r => r.getAs[Long]("id_a") == 20001L && r.getAs[Long]("id_b") == 20002L)
    assert(gatedPair.length == 1, "rare-shingle clique must survive the gate")
    assert(ungated.length == 1 && gatedPair.head.getAs[Double]("jaccard") == ungated.head,
      "surviving pairs must keep their exact ungated jaccard")
  }

  test("winnow overlap pairs catch a lifted passage whole-doc jaccard misses") {
    val passage = "the five boxing wizards jump quickly over seventeen lazy dogs " * 4
    val d = Seq(
      (1L, s"totally original introduction about storage engines. $passage and an original ending about compaction."),
      (2L, s"unrelated musings on garden soil quality. $passage closing remarks on winter mulch."),
      (3L, "a document with no shared content at all, talking about sailing.")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(d, "text", "doc_id", minShared = 8L,
      maxFingerprintPairs = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got $pairs")
    assert(pairs((1L, 2L)) >= 8L)
    // the same pair is invisible to whole-document trigram jaccard at 0.5
    val jac = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5,
      maxShinglePairs = Long.MaxValue).count()
    assert(jac == 0L, "whole-doc jaccard should dilute the lifted passage below 0.5")
  }

  test("ngram jaccard pairs against hand-computed values") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),   // differs in last word
      (3L, "completely different text with no overlap at all")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    // 9 tokens -> 7 shingles each; 6 shared -> jaccard 6/8 = 0.75
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(math.abs(r.getAs[Double]("jaccard") - 0.75) < 1e-12)
  }

  test("evalPairs: micro P/R/F1 on a hand-built confusion; sentinels on empty") {
    // normalizes to {(1,2),(3,4),(5,6)}: reversed + duplicate collapse,
    // self-pair drops
    val pred = Seq((1L, 2L), (3L, 4L), (6L, 5L), (5L, 6L), (7L, 7L)).toDF("id_a", "id_b")
    val truth = Seq((2L, 1L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val r = Dedup.evalPairs(pred, truth).head()
    assert(r.getAs[Long]("n_pred") == 3L && r.getAs[Long]("n_truth") == 3L
      && r.getAs[Long]("n_hit") == 2L)
    assert(r.getAs[Double]("precision") == 0.666667)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(r.getAs[Double]("f1") == 0.666667)
    // empty predicted: exact zeros, never null/NaN
    val r2 = Dedup.evalPairs(pred.limit(0), truth).head()
    assert(r2.getAs[Long]("n_pred") == 0L && r2.getAs[Double]("precision") == 0.0
      && r2.getAs[Double]("recall") == 0.0 && r2.getAs[Double]("f1") == 0.0)
  }

  test("containment pairs surface a quoted subset jaccard misses") {
    val big = (1 to 40).map(i => s"w$i").mkString(" ")       // 38 trigrams
    val quote = (10 to 16).map(i => s"w$i").mkString(" ")    // 5 trigrams, all in big
    val d = Seq(
      (1L, big),
      (2L, quote),
      (3L, "entirely unrelated words about sailing boats here")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(d, "text", "doc_id", 3, 0.9).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    // every quote shingle is in big -> common = min -> containment exactly 1.0
    assert(r.getAs[Double]("containment") == 1.0)
    // the same pair is invisible to jaccard even at 0.5: 5/38 ~ 0.13
    assert(Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5).count() == 0L)
  }

  test("containment equals jaccard when the sets are identical") {
    val d = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(d, "text", "doc_id", 3, 0.5).collect()
    val j = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5).collect()
    assert(c.length == 1 && j.length == 1)
    assert(c.head.getAs[Double]("containment") == 1.0)
    assert(j.head.getAs[Double]("jaccard") == 1.0)
  }

  test("minhash LSH recall vs exact jaccard on real documents") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashLshPairs(docs, "text", "doc_id",
        shingleLen = 3, numBands = 16, rowsPerBand = 4, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "expected some near-dup pairs in testdata")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall < 0.8 (|exact|=${exact.size}, |approx|=${approx.size})")
  }

  test("simhash: identical docs collide, hamming blocking finds near pairs") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "totally unrelated content zebra walrus xylophone")).toDF("doc_id", "text")
    val hashes = d.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    val pairs = Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((3L, 1L)) ||
      java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) > 16)
  }

  test("embedding cosine pairs: brute force matches LSH-verified pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingCosinePairs(emb, "embedding", "vec_id", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.cosineLshPairs(emb, "embedding", "vec_id", 0.35,
        dim = 64, planes = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH verifies with exact cosine -> subset; recall depends on banding
    assert((lsh -- exact).isEmpty)
    if (exact.nonEmpty) {
      val recall = exact.intersect(lsh).size.toDouble / exact.size
      assert(recall >= 0.7, s"cosine LSH recall $recall (|exact|=${exact.size})")
    }
  }
}

class AnnSearchSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bitext margin mining: the ratio margin discounts hubness — a " +
    "dedicated partner beats a globally-popular hub with higher raw cosine") {
    // src s1, s2 orthogonal; tgt: hub h with cos ~0.69 to BOTH srcs,
    // partners p1, p2 with cos ~0.65 to their own src only. Raw cosine
    // ranks the hub first for every src; the margin must not.
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),        // s1 (src: even ids)
      (2L, Array(0f, 1f, 0f, 0f)),        // s2
      (1L, Array(0.6f, 0.6f, 0.2f, 0f)),  // h  (tgt: odd ids)
      (3L, Array(0.65f, 0f, 0.76f, 0f)),  // p1
      (5L, Array(0f, 0.65f, 0f, 0.76f)))  // p2
      .toDF("vec_id", "embedding")
    val mined = AnnSearch.bitextMarginMine(
        rows.where($"vec_id" % 2 === 0), rows.where($"vec_id" % 2 === 1),
        "embedding", "vec_id", k = 2)
      .collect().map(r => r.getAs[Long]("src_id") ->
        ((r.getAs[Long]("tgt_id"), r.getAs[Double]("margin"),
          r.getAs[Double]("qcosine")))).toMap
    assert(mined.keySet == Set(0L, 2L), "one mined pair per src")
    assert(mined(0L)._1 == 3L, s"s1 must mine p1, got ${mined(0L)}")
    assert(mined(2L)._1 == 5L, s"s2 must mine p2, got ${mined(2L)}")
    // the hub really does have the higher raw cosine — the margin, not
    // the cosine, made the pick
    val fwd = AnnSearch.int8TopK(rows.where($"vec_id" % 2 === 0),
        rows.where($"vec_id" % 2 === 1), "embedding", "vec_id", 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("corpus_id")).toMap
    assert(fwd(0L) == 1L && fwd(2L) == 1L,
      s"fixture broken: hub should top raw cosine for both srcs, got $fwd")
    mined.values.foreach { case (_, margin, qc) =>
      assert(margin > 1.0 && qc > 0.5, s"implausible margin/cos: $margin/$qc")
    }
  }

  test("bitext margin mining: overlapping id spaces pair (i, i); " +
    "degenerate all-non-positive penalties floor instead of nulling") {
    // src and tgt are DIFFERENT corpora that both number rows 0..n — the
    // self-pair filter of single-corpus search must NOT apply, or the
    // true translation (i, i) becomes unminable
    val src = Seq((0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((0L, Array(0.95f, 0f, 0.31f, 0f)), (1L, Array(0f, 0.95f, 0f, 0.31f)))
      .toDF("vec_id", "embedding")
    val mined = AnnSearch.bitextMarginMine(src, tgt, "embedding", "vec_id", k = 2)
      .collect().map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    assert(mined == Map(0L -> 0L, 1L -> 1L), s"equal-id pairs unminable: $mined")

    // all tgt neighbors orthogonal or anti-aligned: mean penalties <= 0,
    // which would null the ratio (and rankTopK silently DROPS null
    // scores) — the micro-unit floor keeps one finite row per src
    val s2 = Seq((0L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val t2 = Seq((10L, Array(0f, 1f, 0f, 0f)), (11L, Array(-1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val deg = AnnSearch.bitextMarginMine(s2, t2, "embedding", "vec_id", k = 2)
      .collect()
    assert(deg.length == 1, s"degenerate src dropped: ${deg.toSeq}")
    val m = deg(0).getAs[Double]("margin")
    assert(!m.isNaN && !m.isInfinite, s"margin not finite: $m")

    // the IVF arm shares the cross-corpus contract: (i, i) minable too
    // (nProbe = nCells = exhaustive, so routing can't hide a miss)
    val srcN = (0L until 8L).map(i =>
      (i, Array.tabulate(4)(d => if (d == (i % 4).toInt) 1f else 0.05f * i)))
      .toDF("vec_id", "embedding")
    val tgtN = (0L until 8L).map(i =>
      (i, Array.tabulate(4)(d => if (d == (i % 4).toInt) 0.9f else 0.05f * i)))
      .toDF("vec_id", "embedding")
    val ivfMined = AnnSearch.bitextMarginMineIvf(srcN, tgtN, "embedding",
        "vec_id", k = 2, dim = 4, nCells = 2, nProbe = 2)
      .collect().map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id"))
    assert(ivfMined.exists { case (s, t) => s == t },
      s"IVF arm can't mine any equal-id pair: ${ivfMined.toSeq}")
  }

  test("bitext union-rerank: equals the brute arm at full probe, and at " +
    "partial probe its margins can only SHRINK vs the plain IVF arm") {
    val src = emb.where($"vec_id" % 2 === 0)
    val tgt = emb.where($"vec_id" % 2 === 1)
    def tuples(df: org.apache.spark.sql.DataFrame) = df
      .select($"src_id", $"tgt_id",
        org.apache.spark.sql.functions.round($"margin", 9).as("m"))
      .as[(Long, Long, Double)].collect().toSet
    // full probe: union top-k collapses to the exact kNN lists — the
    // whole path equals the brute arm (this is why the oracle is shared)
    val brute = tuples(AnnSearch.bitextMarginMine(src, tgt, "embedding", "vec_id", 4))
    val full = tuples(AnnSearch.bitextMarginMineIvfRerank(src, tgt, "embedding",
      "vec_id", 4, dim = 64, nCells = 4, nProbe = 4))
    assert(brute == full && brute.nonEmpty, s"${brute.size} vs ${full.size}")
    // partial probe: the union penalty list is a top-k over a SUPERSET
    // of the plain arm's own-direction list, so each side's penalty mean
    // can only rise and each pair's margin can only fall — the
    // margin-inflation mitigation as an invariant, not just a measurement
    def margins(df: org.apache.spark.sql.DataFrame) = df
      .select($"src_id", $"tgt_id", $"margin").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val ivf = margins(AnnSearch.bitextMarginMineIvf(src, tgt, "embedding",
      "vec_id", 4, dim = 64, nCells = 8, nProbe = 2))
    val rr = margins(AnnSearch.bitextMarginMineIvfRerank(src, tgt, "embedding",
      "vec_id", 4, dim = 64, nCells = 8, nProbe = 2))
    val common = ivf.keySet & rr.keySet
    assert(common.nonEmpty, "no common mined pairs at partial probe")
    common.foreach { p =>
      assert(rr(p) <= ivf(p) + 1e-9, s"pair $p: rerank ${rr(p)} > ivf ${ivf(p)}")
    }
  }

  test("brute-force top-k is deterministic and correctly ranked") {
    val queries = emb.where($"vec_id" < 5)
    val res = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
    val rows = res.collect()
    assert(rows.length == 5 * 10)
    // per query: ranks 1..10, cosine non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("topK with a known query count routes without any Spark action") {
    // a poisoned query frame: ANY action over it throws. Routing with the
    // count hint must stay lazy (plan built, nothing evaluated); routing
    // without the hint pays a probe action and blows up on this frame.
    val poisoned = emb.where($"vec_id" < 5)
      .where(assert_true(lit(false)).isNull)
    val routed = AnnSearch.topK(poisoned, emb, "embedding", "vec_id", 5, dim = 64,
      queryCount = Some(5L))
    assert(routed.columns.toSeq == Seq("query_id", "corpus_id", "cosine", "rank"))
    intercept[Exception] {
      AnnSearch.topK(poisoned, emb, "embedding", "vec_id", 5, dim = 64)
    }
    // the hint routes correctly: small count -> brute-force results
    val queries = emb.where($"vec_id" < 5)
    val viaHint = AnnSearch.topK(queries, emb, "embedding", "vec_id", 5, dim = 64,
        queryCount = Some(5L))
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(viaHint == brute)
  }

  test("LSH top-k finds a reasonable fraction of true neighbors") {
    val queries = emb.where($"vec_id" < 20)
    val exact = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = AnnSearch.lshTopK(queries, emb, "embedding", "vec_id", 5,
        dim = 64, planes = 16, bands = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN search recall $recall")
  }

  test("radius search: every returned pair clears tau; LSH arm is a subset") {
    val tau = 0.2
    val queries = emb.where($"vec_id" < 20)
    val exact = AnnSearch.bruteForceRadius(queries, emb, "embedding", "vec_id", tau)
    val rows = exact.collect()
    assert(rows.nonEmpty, "fixture should have some pairs above tau=0.2")
    assert(rows.forall(_.getAs[Double]("cosine") >= tau))
    // brute radius == brute top-k with unbounded k, filtered at tau
    val viaTopK = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id",
        k = emb.count().toInt)
      .where($"cosine" >= tau)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exactSet = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(exactSet == viaTopK, "radius must equal threshold-filtered exhaustive top-k")
    // LSH arm: same scoring on the banded candidate set -> subset with recall
    val approx = AnnSearch.lshRadius(queries, emb, "embedding", "vec_id", tau,
        dim = 64, planes = 16, bands = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exactSet),
      "LSH radius must never emit a pair below tau or outside the exact set")
    val recall = approx.size.toDouble / exactSet.size
    assert(recall >= 0.5, s"LSH radius recall $recall")
  }

  test("radius auto-router stays lazy with a count hint, routes small to exact") {
    val poisoned = emb.where($"vec_id" < 5)
      .where(assert_true(lit(false)).isNull)
    // hinted routing must not evaluate the frame
    val routed = AnnSearch.radius(poisoned, emb, "embedding", "vec_id", 0.2,
      dim = 64, queryCount = Some(5L))
    assert(routed.columns.toSeq == Seq("query_id", "corpus_id", "cosine"))
    intercept[Exception] {
      AnnSearch.radius(poisoned, emb, "embedding", "vec_id", 0.2, dim = 64)
    }
    val queries = emb.where($"vec_id" < 20)
    val viaHint = AnnSearch.radius(queries, emb, "embedding", "vec_id", 0.2,
        dim = 64, queryCount = Some(20L))
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val brute = AnnSearch.bruteForceRadius(queries, emb, "embedding", "vec_id", 0.2)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(viaHint == brute)
  }

  test("IVF radius at full probe equals brute radius; partial probe is a subset") {
    val queries = emb.where($"vec_id" < 20)
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = 8, iters = 2)
    val flat = cents.flatMap { v =>
      val n = math.sqrt(v.map(x => x * x).sum); if (n == 0) v else v.map(_ / n)
    }
    val exact = AnnSearch.bruteForceRadius(queries, emb, "embedding", "vec_id", 0.2)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val full = AnnSearch.ivfRadiusWithCentroids(queries, emb, "embedding", "vec_id",
        0.2, dim = 64, flat, nProbe = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(full == exact, "nProbe = nCells must equal brute-force radius")
    val partial = AnnSearch.ivfRadiusWithCentroids(queries, emb, "embedding", "vec_id",
        0.2, dim = 64, flat, nProbe = 2)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(partial.subsetOf(exact))
  }

  test("radius search scores zero-norm vectors 0.0 — excluded by positive tau") {
    val zero = Seq((9999L, Array.fill(64)(0.0f).toSeq)).toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(zero)
    // zero-norm cosine is defined as 0.0 (VectorKernels.cosineF), never
    // NaN — so any positive tau excludes it deterministically...
    val out = AnnSearch.bruteForceRadius(emb.where($"vec_id" < 5), corpus,
      "embedding", "vec_id", 0.01)
    assert(!out.where($"corpus_id" === 9999L).collect().exists(_ => true))
    // ...and a zero/negative tau includes it with a well-defined score
    val at0 = AnnSearch.bruteForceRadius(emb.where($"vec_id" < 5), corpus,
      "embedding", "vec_id", 0.0).where($"corpus_id" === 9999L).collect()
    assert(at0.length == 5 && at0.forall(_.getAs[Double]("cosine") == 0.0))
    // zero-norm QUERY: all its scores are 0.0, present only at tau <= 0
    assert(AnnSearch.bruteForceRadius(zero, emb, "embedding", "vec_id", 0.01).count() == 0)
    assert(AnnSearch.bruteForceRadius(zero, emb, "embedding", "vec_id", 0.0)
      .count() == emb.count())
  }
}

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("entropyProfile: hand-computed char/token entropies, every doc " +
    "emits one row, null/empty -> zeros") {
    val docs = Seq(
      (1L, "aabb"),        // char H = ln 2; one token -> token H = 0
      (2L, "aaaa"),        // char H = 0
      (3L, "x y x y"),     // token H = ln 2 (x:2, y:2)
      (4L, ""),            // empty -> all zeros
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.entropyProfile(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Double]("char_entropy"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("token_entropy")))).toMap
    assert(got.size == 5)
    val ln2 = BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 4L && math.abs(got(1L)._2 - ln2) < 2e-6, s"${got(1L)}")
    assert(got(1L)._3 == 1L && got(1L)._4 == 0.0, s"${got(1L)}")
    assert(got(2L)._2 == 0.0, s"${got(2L)}")
    assert(got(3L)._3 == 4L && math.abs(got(3L)._4 - ln2) < 2e-6, s"${got(3L)}")
    assert(got(4L) == ((0L, 0.0, 0L, 0.0)), s"${got(4L)}")
    assert(got(5L) == ((0L, 0.0, 0L, 0.0)), s"${got(5L)}")
  }

  test("codeScore: code-shaped text scores high, prose low, counts exact") {
    val code = "def f(x) {\n  val y = g(x);\n  return y[0];\n}"
    val prose = "The committee reviewed the plan and approved it after discussion"
    // \x0B doc: the explicit whitespace class treats vertical tab as
    // whitespace (Java-\s semantics, spelled out so RE2/DuckDB agrees)
    val vtab = "x=1;\u000By=2;"
    val docs = Seq((1L, code), (2L, prose), (3L, null.asInstanceOf[String]),
        (4L, vtab))
      .toDF("doc_id", "text")
    val got = TextAnalysis.codeScore(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_indent_lines"),
          r.getAs[Long]("n_code_symbols"), r.getAs[Double]("code_score")))).toMap
    // code: 4 lines, 2 indented, symbols ( ) { = ( ) ; [ ] ; } = 11
    assert(got(1L)._1 == 4L && got(1L)._2 == 2L, s"${got(1L)}")
    assert(got(1L)._3 == 11L, s"${got(1L)}")
    assert(got(1L)._4 > 0.8, s"code scored ${got(1L)._4}")
    assert(got(2L)._4 == 0.0, s"prose scored ${got(2L)._4}")
    assert(got(3L) == ((1L, 0L, 0L, 0.0)), s"${got(3L)}")
    // \x0B is whitespace: 1 line (no \n), 4 symbols (= ; = ;), and the
    // vertical tab must NOT count toward n_nonspace (8, not 9); sym_ratio
    // 4/8 caps the symbol term -> score 0.5
    assert(got(4L) == ((1L, 0L, 4L, 0.5)), s"${got(4L)}")
    val nonspace4 = TextAnalysis.codeScore(docs, "text", "doc_id")
      .where($"doc_id" === 4L).head().getAs[Long]("n_nonspace")
    assert(nonspace4 == 8L, s"\\x0B counted as non-space: $nonspace4")
  }

  test("scriptProfile: counts per code-point range, dominant letter " +
    "script with alphabetical tie-break, digits excluded, null/empty " +
    "-> none") {
    val docs = Seq(
      (1L, "hello world"),                       // pure latin
      (2L, "привет мир"),                        // pure cyrillic
      (3L, "日本語のテキスト"),                   // cjk (kana + kanji)
      (4L, "abc привет 123"),                    // mixed; digits not dominant
      (5L, "42 + 17 = 59"),                      // digits only -> none
      (6L, null.asInstanceOf[String]),           // null -> none
      (7L, "ab пр")                              // 2 vs 2 tie -> cyrillic (alphabetical)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("dominant_script"), r.getAs[Double]("dominant_ratio"),
          r.getAs[Long]("n_latin"), r.getAs[Long]("n_cyrillic"),
          r.getAs[Long]("n_cjk"), r.getAs[Long]("n_digit")))).toMap
    assert(got(1L) == (("latin", 1.0, 10L, 0L, 0L, 0L)), s"${got(1L)}")
    assert(got(2L) == (("cyrillic", 1.0, 0L, 9L, 0L, 0L)), s"${got(2L)}")
    assert(got(3L)._1 == "cjk" && got(3L)._2 == 1.0 && got(3L)._5 == 8L, s"${got(3L)}")
    // doc 4: 3 latin vs 6 cyrillic, 3 digits ignored for dominance
    assert(got(4L)._1 == "cyrillic" && got(4L)._4 == 6L && got(4L)._6 == 3L, s"${got(4L)}")
    assert(got(5L) == (("none", 0.0, 0L, 0L, 0L, 6L)), s"${got(5L)}")
    assert(got(6L) == (("none", 0.0, 0L, 0L, 0L, 0L)), s"${got(6L)}")
    assert(got(7L)._1 == "cyrillic" && got(7L)._2 == 0.5, s"${got(7L)}")
  }

  test("blocklist: multi-word phrases match contiguously only, " +
    "normalization folds case/spacing, counts are exact") {
    val docs = Seq(
      (1L, "buy GOLD now and win"),          // "buy gold now" as a 3-gram
      (2L, "gold buy now"),                  // reordered -> NO phrase match
      (3L, "spam spam spam"),                // 3 occurrences of 1 phrase
      (4L, "clean text entirely"),           // nothing
      (5L, "Buy   Gold   Now")               // case+spacing normalize
    ).toDF("doc_id", "text")
    val phrases = Seq("Buy  Gold Now", "spam", "win")
    val got = TextAnalysis.blocklistFlags(docs, "text", "doc_id", phrases)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_blocked_hits"), r.getAs[Long]("n_blocked_phrases"),
          r.getAs[Int]("blocked")))).toMap
    assert(got(1L) == ((2L, 2L, 1)), s"doc 1: ${got(1L)}") // phrase + "win"
    assert(got(2L) == ((0L, 0L, 0)), s"doc 2 (reordered): ${got(2L)}")
    assert(got(3L) == ((3L, 1L, 1)), s"doc 3 (occurrences vs distinct): ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0)))
    assert(got(5L) == ((1L, 1L, 1)), s"doc 5 (normalization): ${got(5L)}")

    // apostrophes in phrases must escape into valid SQL literals
    val sql = TextAnalysis.blocklistOracleSql("documents", "text", "doc_id",
      Seq("o'brien's list", "plain"))
    assert(sql.contains("'o''brien''s list'"), s"unescaped quote in:\n$sql")
  }

  test("token counts") {
    val d = Seq("one two three", "  padded   spaces  ", "single").toDF("text")
    val counts = d.select(TextAnalysis.tokenCount($"text")).as[Int].collect().toSeq
    assert(counts == Seq(3, 2, 1))
  }

  test("quality score bounded and sensible") {
    val d = Seq(
      "the quick brown fox jumps over the lazy dog and runs away fast",  // good
      "x",                                                                // bad
    ).toDF("text")
    val scores = d.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("langId picks the language with most marker hits (all 14 languages)") {
    val samples = Seq(
      "en" -> "the cat and the dog in the house",
      "es" -> "el perro y la casa de la familia que vive",
      "fr" -> "le chat est dans les maisons pour les amis",
      "de" -> "der hund und die katze ist nicht mit ein mann",
      "it" -> "il gatto che non dorme per la casa con del pane sono gli amici",
      "pt" -> "não era uma casa em que os gatos do bairro são mais vistos como",
      "nl" -> "het huis van een kat die niet weg wil maar ook voor dat raam",
      "sv" -> "och huset som är på kullen att det inte var för stort med",
      "da" -> "og huset er ikke til at se som jeg troede på med",
      "no" -> "og han er ikke på huset som det var til jeg kom av",
      "pl" -> "nie wiem czy to jest dobre ale tak się wydaje przez jego upor tylko jak",
      "tr" -> "bir ev ve bu bahçe için ile gibi daha çok ama kadar",
      "id" -> "yang rumah dan di kota itu dengan taman untuk kita tidak ini dari akan",
      "ru" -> "и в доме не было никого на что это как его но по",
      "und" -> "zzz qqq www")
    val d = samples.map(_._2).toDF("text")
    val langs = d.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(langs == samples.map(_._1),
      s"got ${langs.mkString(",")} expected ${samples.map(_._1).mkString(",")}")
  }

  test("tfIdf computes smoothed weights with exact tf/df counts") {
    val d = Seq(
      (1L, "cat dog cat"),
      (2L, "cat bird"),
      (3L, "fish")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    def w(tf: Long, df: Long) =
      BigDecimal(tf * (math.log(4.0 / (df + 1.0)) + 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, "cat")) == ((2L, 2L, w(2, 2))))
    assert(got((2L, "cat")) == ((1L, 2L, w(1, 2))))
    assert(got((1L, "dog")) == ((1L, 1L, w(1, 1))))
    assert(got((3L, "fish")) == ((1L, 1L, w(1, 1))))
    assert(got.size == 5)
    // minDf drops rare tokens; totalDocs hint skips the count job
    val filtered = TextAnalysis.tfIdf(d, "text", "doc_id", minDf = 2L, totalDocs = Some(3L))
      .select("token").as[String].collect().toSet
    assert(filtered == Set("cat"))
  }

  test("stripMarkup: tags, entity decode order, glue prevention") {
    val d = Seq(
      "<p>Hello</p><p>World</p>",                  // adjacent tags must not glue
      "a &amp;lt; b &lt; c",                       // double-escape decodes ONCE
      "x &quot;q&quot; &#39;a&#39; &gt; y",
      "plain text stays put",
      "<div class=\"a b\" data-x='1'>inner</div>").toDF("text")
    val out = d.select(TextAnalysis.stripMarkup($"text")).as[String].collect().toSeq
    assert(out == Seq(
      "Hello World",
      "a &lt; b < c",
      "x \"q\" 'a' > y",
      "plain text stays put",
      "inner"), s"got $out")
  }

  test("outlinks + normalizeUrl: extraction filter and every " +
    "normalization arm") {
    val d = Seq(
      // uppercase scheme/host lowered, :80 stripped, path case kept,
      // fragment dropped -> equal to the dup link -> ONE output
      "<a href=\"HTTP://Ex.COM:80/Path?Q=1#f\">a</a>" +
        "<a href='http://ex.com/Path?Q=1'>dup</a>",
      // :443 stripped on https; NON-default port kept
      "<img src=\"https://CDN.Ex.com:443/i.png\"/>" +
        "<a href=\"https://ex.com:8443/k\">b</a>",
      // relative, mailto (quoted OR unquoted) and javascript links skipped
      "<a href=\"/rel\">r</a><a href=mailto:a@b.c>m</a>" +
        "<a href=\"javascript:void(0)\">j</a>",
      // :80 on https and :443 on http are NOT default -> kept
      "<a href=\"https://ex.com:80/x\">s</a><a href=\"http://ex.com:443/y\">t</a>",
      // legacy UNQUOTED attribute values extract too (r17 item 2): value
      // ends at whitespace or '>'; unquoted relative still filtered
      "<a href=http://EX.com:80/unq?x=1 class=z>u</a><img src=/rel/skip>")
      .toDF("html")
    val out = d.select(TextAnalysis.outlinks($"html")).as[Seq[String]]
      .collect().toSeq
    assert(out == Seq(
      Seq("http://ex.com/Path?Q=1"),
      Seq("https://cdn.ex.com/i.png", "https://ex.com:8443/k"),
      Seq.empty,
      Seq("https://ex.com:80/x", "http://ex.com:443/y"),
      Seq("http://ex.com/unq?x=1")), s"got $out")
    // bare-host edge: the port strip works with no path at all
    val bare = Seq("http://EX.com:80", "https://ex.com:443", "http://ex.com:8080")
      .toDF("u").select(TextAnalysis.normalizeUrl($"u")).as[String].collect().toSeq
    assert(bare == Seq("http://ex.com", "https://ex.com", "http://ex.com:8080"),
      s"got $bare")
  }

  test("robotsMeta + outlinksFollow: meta directives gate with token " +
    "boundaries; nofollow anchors drop from the followed set; the " +
    "attribute walk ignores attribute-looking text inside values") {
    val rows = Seq(
      (0L, "<meta name=\"robots\" content=\"noindex,nofollow\">" +
        "<a href=\"https://ex.com/a\">x</a>"),
      (1L, "<META NAME=ROBOTS CONTENT=\"NOFOLLOW\">" +
        "<a rel=\"external nofollow\" href=\"https://ex.com/a\">x</a>" +
        "<a href=https://ex.com/b rel=\"me\">y</a>"),
      // decoys: robotsx name, noindex inside a NON-robots meta, a rel
      // value merely CONTAINING the letters (nofollowed != nofollow),
      // and 'none' as a directive VALUE (max-image-preview:none), not
      // a standalone token
      (3L, "<meta name=\"robotsx\" content=\"noindex\">" +
        "<meta name=\"description\" content=\"noindex nofollow\">" +
        "<meta name=\"robots\" content=\"max-image-preview:none\">" +
        "<a rel=\"nofollowed\" href=\"https://ex.com/c\">z</a>"),
      // 'none' directive = noindex,nofollow by convention
      (4L, "<meta name=\"robots\" content=\"none\">" +
        "<a href=\"https://ex.com/d\">w</a>"),
      // the review's adversarial modes: rel= inside the href VALUE
      // stays followed; 'name=robots noindex' inside another
      // attribute's value never gates; unquoted rel never scans into
      // the neighboring href
      (5L, "<meta content=\"see name=robots noindex docs\">" +
        "<a href=\"https://ex.com/e?rel=nofollow\">v</a>" +
        "<a rel=me href=https://ex.com/f-nofollow>u</a>"))
      .toDF("id", "html")
    val got = rows.select($"id",
        TextAnalysis.robotsMeta($"html").as("m"),
        TextAnalysis.outlinksFollow($"html").as("f"))
      .as[(Long, (Boolean, Boolean), Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == (((true, true), Seq("https://ex.com/a"))), got(0L))
    assert(got(1L) == (((false, true), Seq("https://ex.com/b"))), got(1L))
    assert(got(3L) == (((false, false), Seq("https://ex.com/c"))), got(3L))
    assert(got(4L) == (((true, true), Seq("https://ex.com/d"))), got(4L))
    assert(got(5L) == (((false, false),
      Seq("https://ex.com/e?rel=nofollow", "https://ex.com/f-nofollow"))),
      got(5L))
  }

  test("property: outlinks roundtrip — random URLs embedded quoted or " +
    "unquoted among noise extract exactly, in quoted-then-unquoted order") {
    val rnd = new scala.util.Random(7L)
    def seg() =
      Array.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (0 until 200).map { i =>
      // pre-normalized form (lowercase, no default port, no fragment) so
      // normalizeUrl is the identity and the roundtrip is exact
      val urls = (0 until 1 + rnd.nextInt(4)).map(j =>
        s"https://${seg()}.com/${seg()}?x=$j")
      val html = urls.zipWithIndex.map { case (u, j) =>
        if (j % 2 == 0) s"""<a href="$u">q</a>""" else s"<img src=$u >"
      }.mkString(s"<html>${seg()} ", " ", s" ${seg()}</html>")
      // extraction order: quoted matches in doc order, then unquoted
      val want = (urls.zipWithIndex.collect { case (u, j) if j % 2 == 0 => u }
        ++ urls.zipWithIndex.collect { case (u, j) if j % 2 == 1 => u }).distinct
      (i.toLong, html, want)
    }
    val got = rows.map(r => (r._1, r._2)).toDF("id", "html")
      .select($"id", TextAnalysis.outlinks($"html").as("u"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
  }

  test("property: sitemapEntries roundtrip — random entity-escaped, " +
    "whitespace-padded locs decode back exactly, lastmod optional") {
    val rnd = new scala.util.Random(11L)
    val urlChars = "abAB12&<>\"'"
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;").replace("'", "&apos;")
    val pads = Seq("", " ", "\n", "\n  ", "\t")
    val rows = (0 until 200).map { i =>
      val entries = (0 until 1 + rnd.nextInt(4)).map { j =>
        val raw = s"https://ex.com/" + Array.fill(1 + rnd.nextInt(8))(
          urlChars(rnd.nextInt(urlChars.length))).mkString + s"/$j"
        val lm = if (rnd.nextBoolean()) s"2026-0${1 + rnd.nextInt(9)}-01" else ""
        val lmXml = if (lm.isEmpty) ""
          else s"<lastmod>${pads(rnd.nextInt(pads.length))}$lm</lastmod>"
        val xml = s"<url><loc>${pads(rnd.nextInt(pads.length))}${esc(raw)}" +
          s"${pads(rnd.nextInt(pads.length))}</loc>$lmXml</url>"
        ((raw, lm), xml)
      }
      (i.toLong, s"<urlset>${entries.map(_._2).mkString}</urlset>",
        entries.map(_._1))
    }
    val got = rows.map(r => (r._1, r._2)).toDF("id", "xml")
      .select($"id", TextAnalysis.sitemapEntries($"xml").as("e"))
      .as[(Long, Seq[(String, String)])].collect().toMap
    rows.foreach { case (id, _, want) =>
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
  }

  test("sitemapEntries: urlset + sitemapindex blocks, entity decode, " +
    "optional lastmod, whitespace trim, non-http locs filtered") {
    val urlset = "<?xml version=\"1.0\"?><urlset " +
      "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
      "<url><loc>https://ex.com/a?x=1&amp;y=&quot;2&quot;</loc>" +
      "<lastmod> 2026-01-02 </lastmod></url>" +
      "<url>\n<loc>\n https://ex.com/b \n</loc>\n</url>" +
      "<url><loc>ftp://ex.com/no</loc></url></urlset>"
    val index = "<sitemapindex><sitemap><loc>HTTPS://ex.com/m1.xml</loc>" +
      "<lastmod>2025-12-31</lastmod></sitemap></sitemapindex>"
    val out = Seq(urlset, index).toDF("x")
      .select(TextAnalysis.sitemapEntries($"x"))
      .as[Seq[(String, String)]].collect().toSeq
    assert(out == Seq(
      Seq(("https://ex.com/a?x=1&y=\"2\"", "2026-01-02"),
        ("https://ex.com/b", "")),
      Seq(("HTTPS://ex.com/m1.xml", "2025-12-31"))), s"got $out")
    val urls = Seq(urlset).toDF("x")
      .select(TextAnalysis.sitemapUrls($"x")).as[Seq[String]].collect().head
    assert(urls == Seq("https://ex.com/a?x=1&y=\"2\"", "https://ex.com/b"),
      s"got $urls")
  }

  test("stripTrackingParams: blocklist params drop, order and '?' " +
    "semantics hold") {
    val d = Seq(
      "https://x.com/p?utm_source=a&id=7&fbclid=b",  // survivors keep order
      "https://x.com/p?utm_campaign=c&gclid=g",      // all stripped: no '?'
      "https://x.com/p?a=1&b=2",                     // untouched
      "https://x.com/p",                             // no query at all
      "https://x.com/p?UTM_Source=a&x=1",            // case-insensitive
      "https://x.com/p?utmost=keep&gclid=g")         // utm_ prefix only
      .toDF("u")
    val out = d.select(TextAnalysis.stripTrackingParams($"u")).as[String]
      .collect().toSeq
    assert(out == Seq(
      "https://x.com/p?id=7",
      "https://x.com/p",
      "https://x.com/p?a=1&b=2",
      "https://x.com/p",
      "https://x.com/p?x=1",
      "https://x.com/p?utmost=keep"), s"got $out")
  }

  test("bm25TopK against hand-computed scores") {
    val corpus = Seq(
      (1L, "cat dog cat"),        // tf(cat)=2, dl=3
      (2L, "cat bird"),           // tf(cat)=1, dl=2
      (3L, "fish fish fish")).toDF("doc_id", "text")   // N=3, sum(dl)=8
    val qs = Seq((100L, "cat"), (200L, "fish zebra")).toDF("query_id", "qtext")
    val got = TextAnalysis.bm25TopK(corpus, "text", "doc_id", qs, "qtext", "query_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // the operator's exact arithmetic: per-term contribution quantized to
    // the 1e-6 grid before the sum
    def contrib(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log((3L - df + 0.5) / (df + 0.5) + 1.0)
      val lenNorm = 1.0 - 0.75 + 0.75 * (dl.toDouble * 3.0 / 8.0)
      math.round(idf * (tf * 2.2) / (tf + 1.2 * lenNorm) * 1e6) / 1e6
    }
    // doc 1 outranks doc 2 on "cat" (higher tf); "zebra" is out of
    // vocabulary and contributes nothing
    assert(got == Set(
      (100L, 1L, contrib(2, 2, 3), 1),
      (100L, 2L, contrib(1, 2, 2), 2),
      (200L, 3L, contrib(3, 1, 3), 1)))
    // empty corpus: no rows, no crash
    assert(TextAnalysis.bm25TopK(corpus.limit(0), "text", "doc_id",
      qs, "qtext", "query_id").count() == 0L)
  }

  test("bm25TopK ties break by doc id; maxDf gates stopword postings") {
    val twin = Seq((10L, "same words here"), (11L, "same words here"),
      (12L, "unrelated stuff entirely")).toDF("doc_id", "text")
    val q = Seq((1L, "same")).toDF("query_id", "qtext")
    val ranked = TextAnalysis.bm25TopK(twin, "text", "doc_id", q, "qtext", "query_id", k = 5)
      .orderBy(col("rank")).collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(ranked == Seq((10L, 1), (11L, 2)), s"got $ranked")

    val corpus = Seq((1L, "the cat"), (2L, "the dog"), (3L, "the fish")).toDF("doc_id", "text")
    val qs = Seq((1L, "the cat")).toDF("query_id", "qtext")
    val res = TextAnalysis.bm25TopK(corpus, "text", "doc_id", qs, "qtext", "query_id",
        k = 5, maxDf = 2L)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    // "the" (df 3) is gated out of scoring; only "cat" scores -> doc 1 alone
    assert(res == Seq((1L, 1)), s"got $res")
  }

  test("bm25Forget equals a fresh index built on the kept corpus") {
    val corpus = Seq(
      (1L, "cat dog cat"), (2L, "cat bird"), (3L, "fish fish fish"),
      (4L, "dog dog bird"), (5L, "cat fish dog")).toDF("doc_id", "text")
    val forget = Seq(2L, 5L).toDF("doc_id")
    val qs = Seq((1L, "cat dog"), (2L, "fish bird")).toDF("query_id", "qtext")

    val decremented = TextAnalysis.bm25Forget(
      TextAnalysis.bm25Index(corpus, "text", "doc_id"), forget)
    val rebuilt = TextAnalysis.bm25Index(
      corpus.where(!col("doc_id").isin(2L, 5L)), "text", "doc_id")

    // the scalars the score depends on must decrement exactly
    assert(decremented.nDocs == rebuilt.nDocs &&
      decremented.totalTokens == rebuilt.totalTokens)
    // postings agree row-for-row, corrected df included
    val dp = decremented.postings.select("doc_id", "token", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val rp = rebuilt.postings.select("doc_id", "token", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(dp == rp, s"postings diverge: ${dp.diff(rp)} / ${rp.diff(dp)}")
    // and so do search results, scores and all
    def results(ix: TextAnalysis.Bm25Index) =
      TextAnalysis.bm25TopKWithIndex(ix, qs, "qtext", "query_id", k = 5)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(results(decremented) == results(rebuilt))
  }

  test("bm25Append equals a fresh index built on the unioned corpus") {
    val base = Seq(
      (1L, "cat dog cat"), (2L, "cat bird"), (3L, "fish fish fish"))
      .toDF("doc_id", "text")
    // batch shares tokens with the base (df correction on old rows),
    // brings a new token (swan: no old df to add), and a new doc for an
    // old token (fish: new row gets old df added)
    val batch = Seq((4L, "dog dog swan"), (5L, "cat fish"))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "cat dog"), (2L, "fish swan")).toDF("query_id", "qtext")

    val appended = TextAnalysis.bm25Append(
      TextAnalysis.bm25Index(base, "text", "doc_id"), batch, "text")
    val rebuilt = TextAnalysis.bm25Index(
      base.unionByName(batch), "text", "doc_id")

    assert(appended.nDocs == rebuilt.nDocs &&
      appended.totalTokens == rebuilt.totalTokens)
    val ap = appended.postings.select("doc_id", "token", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val rp = rebuilt.postings.select("doc_id", "token", "tf", "dl", "df")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(ap == rp, s"postings diverge: ${ap.diff(rp)} / ${rp.diff(ap)}")
    def results(ix: TextAnalysis.Bm25Index) =
      TextAnalysis.bm25TopKWithIndex(ix, qs, "qtext", "query_id", k = 5)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(results(appended) == results(rebuilt))
    // empty batch is the identity
    val idIx = TextAnalysis.bm25Append(
      TextAnalysis.bm25Index(base, "text", "doc_id"), batch.limit(0), "text")
    assert(idIx.nDocs == 3L && results(idIx) == results(
      TextAnalysis.bm25Index(base, "text", "doc_id")))
    // empty BASE bootstrap (streaming from-scratch start): the empty
    // build's totTok clamp must not leak into the appended scalars
    val bootIx = TextAnalysis.bm25Append(
      TextAnalysis.bm25Index(base.limit(0), "text", "doc_id"), base, "text")
    val baseIx = TextAnalysis.bm25Index(base, "text", "doc_id")
    assert(bootIx.nDocs == baseIx.nDocs &&
      bootIx.totalTokens == baseIx.totalTokens,
      s"bootstrap scalars ${bootIx.nDocs}/${bootIx.totalTokens} vs " +
        s"build ${baseIx.nDocs}/${baseIx.totalTokens}")
    assert(results(bootIx) == results(baseIx))
  }

  test("sessionization: gap starts a new session, ties break on event id") {
    val M = 60L * 1000000 // one minute in micros
    val ev = Seq(
      // user 1: events at 0, 10, 45, 50 min with a 30-min gap rule ->
      // sessions {0,10} and {45,50}
      (1L, 0 * M, 100L, 1.0), (1L, 10 * M, 101L, 2.0),
      (1L, 45 * M, 102L, 4.0), (1L, 50 * M, 103L, 8.0),
      // user 2: two events exactly 30 min apart — the boundary case: an
      // exactly-threshold gap stays in the SAME session (break requires
      // gap > threshold)
      (2L, 0 * M, 200L, 1.0), (2L, 30 * M, 201L, 1.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val res = Sessionize.sessionStats(ev, "user_id", "ts_us", "event_id", "value",
        gapMicros = 30 * M)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(res.size == 3)
    assert(res((1L, 1L)) == ((2L, 0 * M, 10 * M, 3.0)))
    assert(res((1L, 2L)) == ((2L, 45 * M, 50 * M, 12.0)))
    assert(res((2L, 1L)) == ((2L, 0 * M, 30 * M, 2.0)))
  }

  test("repetition fractions: duplicate lines and tokens") {
    val d = Seq(
      (1L, "a b\na b\nc d"),       // 3 lines, 1 dup; 6 tokens, 2 dup
      (2L, "x y z"),               // no repetition
      (3L, "w w w w")).toDF("doc_id", "text") // 1 line; 4 tokens, 3 dup
    val res = d.select(col("doc_id"),
        TextAnalysis.dupLineFraction(col("text")).as("l"),
        TextAnalysis.dupTokenFraction(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(res(1L)._1 - 1.0 / 3) < 1e-12 && math.abs(res(1L)._2 - 2.0 / 6) < 1e-12)
    assert(res(2L) == ((0.0, 0.0)))
    assert(res(3L)._1 == 0.0 && math.abs(res(3L)._2 - 0.75) < 1e-12)
  }

  test("fingerprint invariant to word order and duplication") {
    val d = Seq("b a c", "c b a", "a a b c c").toDF("text")
    val fps = d.select(TextAnalysis.fingerprintMd5($"text")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("winnow fingerprints: shared window minima for shared substrings") {
    val d = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789",
      "abcdefghijklmnopqrstuvwxyz9876543210").toDF("text")
    val fps = d.select(TextAnalysis.winnowFingerprints($"text")).as[Seq[Long]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
    assert(fps(0).toSet != fps(1).toSet)
  }

  test("normalizeText strips controls, collapses whitespace, trims, lowers") {
    val d = Seq(
      (1L, "  Hello\t\tWorld\u0007 \n test  "),
      (2L, "already clean"),
      (3L, "\u0001\u0002")).toDF("id", "text")
    val m = d.select($"id", TextAnalysis.normalizeText($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "hello world test", s"got '${m(1L)}'")
    assert(m(2L) == "already clean")
    assert(m(3L) == "", "control-only text normalizes to empty")
    val keepCase = d.where($"id" === 1L)
      .select(TextAnalysis.normalizeText($"text", lowercase = false)).as[String].head()
    assert(keepCase == "Hello World test")
  }

  test("unigram log-prob matches the hand-computed corpus LM") {
    // freqs: a=3, b=1, c=1, total=5
    val d = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = TextAnalysis.unigramLogProb(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val lpA = math.log(3.0 / 5); val lpRare = math.log(1.0 / 5)
    assert(m(1L)._1 == 3L && math.abs(m(1L)._2 - (2 * lpA + lpRare)) < 3e-6)
    assert(m(2L)._1 == 2L && math.abs(m(2L)._2 - (lpA + lpRare)) < 3e-6)
    assert(math.abs(m(2L)._3 - (lpA + lpRare) / 2) < 3e-6)
    // the garbled doc scores lower per token than the fluent one
    assert(m(2L)._3 < m(1L)._3)
  }

  test("langId margin: runner-up distance, zero on ties and no-match") {
    val d = Seq(
      (1L, "the and is the of"),       // strongly en
      (2L, "the der el xyzzy"),        // 1-hit tie across languages
      (3L, "zz qq xx")                 // no markers at all
    ).toDF("doc_id", "text")
    val m = d.select($"doc_id", TextAnalysis.langIdMargin($"text").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) > 0L)
    assert(m(2L) === 0L && m(3L) === 0L)
  }

  test("bigram log-prob matches the hand-computed corpus LM") {
    // bigrams: (a b)x2, (b a)x1, (a c)x1; histories: a->3, b->1
    val d = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val m = TextAnalysis.bigramLogProb(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val lpAB = math.log(2.0 / 3); val lpBA = math.log(1.0)
    val lpAC = math.log(1.0 / 3)
    assert(m(1L)._1 == 3L && math.abs(m(1L)._2 - (lpAB + lpBA + lpAC)) < 3e-6)
    assert(m(2L)._1 == 1L && math.abs(m(2L)._2 - lpAB) < 3e-6)
    // single-token docs have no bigrams and drop out
    assert(!m.contains(3L))
    // the doc with the rare continuation scores lower per bigram
    assert(m(1L)._3 < m(2L)._3)
  }

  test("common-token ratio against the top-N vocabulary") {
    // corpus freqs: "the"x4, "cat"x3, "sat"x2, rest x1 -> top2 = {the, cat}
    val d = Seq(
      (1L, "the cat sat"),
      (2L, "the the cat sat"),
      (3L, "the cat dog elephant")).toDF("doc_id", "text")
    val m = TextAnalysis.commonTokenRatio(d, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(1L) == ((3L, 2L, 2.0 / 3)))
    assert(m(2L) == ((4L, 3L, 0.75)))
    assert(m(3L) == ((4L, 2L, 0.5)))
  }

  test("embedding centroids: exact quantized means per group") {
    val d = Seq(
      (1L, Seq(1.0f, 0.0f), "a"),
      (2L, Seq(0.0f, 1.0f), "a"),
      (3L, Seq(0.5f, 0.5f), "b")).toDF("vec_id", "embedding", "label")
    val rows = Embeddings.centroids(d, Seq("label"), "embedding")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(("a", 1L)) == ((2L, 0.5)) && rows(("a", 2L)) == ((2L, 0.5)))
    assert(rows(("b", 1L)) == ((1L, 0.5)) && rows(("b", 2L)) == ((1L, 0.5)))
  }

  test("PII redaction: sequential patterns, url swallows its email") {
    val df = Seq(
      (1L, "mail a@b.com or see http://x.io/u?e=c@d.com from 10.0.0.1 ok"),
      (2L, "no pii here"),
      (3L, "two mails a@b.org b@c.net and 999.1.1.1 is still ip-shaped")
    ).toDF("id", "text")
    val red = df.select($"id", TextAnalysis.redact($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(red(1L) == "mail <EMAIL> or see <URL> from <IP> ok",
      s"got ${red(1L)}")
    assert(red(2L) == "no pii here")
    // dotted-quad pattern is shape-based (1-3 digits), not value-validated
    assert(red(3L) == "two mails <EMAIL> <EMAIL> and <IP> is still ip-shaped")
    val counts = TextAnalysis.redactionCounts(df, "text")
      .select($"id", $"n_urls", $"n_emails", $"n_ips")
      .as[(Long, Int, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // the email inside the url counts as part of the URL, not as an email
    assert(counts(1L) == ((1, 1, 1)), s"got ${counts(1L)}")
    assert(counts(2L) == ((0, 0, 0)))
    assert(counts(3L) == ((0, 2, 1)))
  }

  test("gopher flags: each rule fails on its own pathology, clean doc passes") {
    val good = (1 to 60).map(i => if (i <= 8)
      Seq("the", "be", "to", "of", "and", "that", "have", "with")(i - 1)
      else "word").mkString(" ")
    val docs = Seq(
      1L -> good,                                   // passes all 7
      2L -> "too short",                            // r_word_count
      3L -> ((1 to 60).map(_ => "a").mkString(" ") + " the be"), // r_mean_word_len (mean < 3)
      4L -> good.replaceAll("word", "wo#rd"),       // r_symbol_ratio (52 '#' / 60 words)
      5L -> (1 to 10).map(_ => "- " + good).mkString("\n"), // r_bullet_lines (10/10 bulleted)
      6L -> (1 to 10).map(_ => good + " ...").mkString("\n"), // r_ellipsis_lines
      7L -> good.replaceAll("word", "1234"),        // r_alpha_words (only 8/60 alphabetic)
      8L -> (1 to 60).map(_ => "word").mkString(" ") // r_stopwords (zero stop words)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long): Seq[Long] = (2 to 8).map(got(id).getLong)
    assert(got(1L).getAs[Long]("pass") == 1L, s"clean doc failed: ${got(1L)}")
    val ruleIdx = Map(2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3, 6L -> 4, 7L -> 5, 8L -> 6)
    for ((id, idx) <- ruleIdx) {
      assert(flags(id)(idx) == 0L, s"doc $id should fail rule $idx: ${flags(id)}")
      assert(got(id).getAs[Long]("pass") == 0L, s"doc $id should fail overall")
    }
    // empty text: zero words, fails word count, never divides by zero
    val empty = TextAnalysis.gopherFlags(Seq(9L -> "").toDF("doc_id", "text"),
      "text", "doc_id").collect().head
    assert(empty.getAs[Long]("n_words") == 0L && empty.getAs[Long]("pass") == 0L)
  }

  test("hashed linear classifier: exact integer sums, scale-by-repetition") {
    val docs = Seq(1L -> "alpha", 2L -> "alpha alpha alpha", 3L -> "").toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(docs, "text", "doc_id")
      .select($"doc_id", $"n_tokens", $"w_sum", $"score", $"label")
      .as[(Long, Long, Long, Double, Long)].collect().map(t => t._1 -> t).toMap
    // same token k times: w_sum scales by k, the per-token average (and
    // so the score) is invariant
    assert(got(2L)._3 == 3 * got(1L)._3, s"${got(1L)} vs ${got(2L)}")
    assert(got(1L)._4 == got(2L)._4)
    assert(got(1L)._4 > 0.0 && got(1L)._4 < 1.0)
    assert(got(1L)._5 == (if (got(1L)._3 > 0) 1L else 0L))
    // empty doc: neutral score, zero label, no NaN
    assert(got(3L) == ((3L, 0L, 0L, 0.5, 0L)))
    // the weight formula is the documented double-md5: recompute slot 1's
    // weight by hand for the token "alpha"
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16) % 1000000L
    }
    val slot = md5Long("alpha") % 2048L
    val w = md5Long("w:" + slot) % 2001L - 1000L
    assert(got(1L)._3 == w, s"w_sum ${got(1L)._3} != hand-computed $w")
  }

  test("ppl buckets: tercile order respected, short docs drop, near-balanced") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.pplBuckets(docs, "text", "doc_id")
      .select($"doc_id", $"n_bigrams", $"avg_lp_milli", $"bucket")
      .as[(Long, Long, Long, String)].collect()
    val byBucket = out.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"), s"${byBucket.keySet}")
    // value ranges must be ordered: every tail <= every middle <= every head
    assert(byBucket("tail").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("head").min)
    // terciles: no bucket smaller than a quarter or larger than half
    val n = out.length
    for ((b, vs) <- byBucket)
      assert(vs.length >= n / 4 && vs.length <= n / 2 + 1, s"$b has ${vs.length}/$n")
    // docs with < 2 tokens have no bigrams and must be absent
    val short = TextAnalysis.pplBuckets(
      Seq(1L -> "one", 2L -> "two words here").toDF("doc_id", "text"), "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(short == Set(2L), s"got $short")
  }
}

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val bin = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, Array.fill[Byte](2500)(42)),
    (3L, Array.emptyByteArray)).toDF("id", "payload")

  test("binary metadata: byte length + magic header") {
    val res = Multimodal.binaryMeta(bin, "payload")
      .select("id", "n_bytes", "magic_hex").as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(res(1L) == ((11L, "68656C6C")))
    assert(res(2L) == ((2500L, "2A2A2A2A")))
  }

  // hand-assembled GDV1 payload: 4x4 (one block), 3 frames —
  // literal(0..15), skip, solid(7). Pins the DECODER alone, byte-level
  // (the round-trip tests below can't catch an encoder/decoder bug pair).
  private def gdvHandcrafted: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write('G'); bos.write('D'); bos.write('V'); bos.write('1')
    w16(4); w16(4); w16(3)
    val base = 10 + 12
    w32(base); w32(base + 17); w32(base + 18)  // lit: 1+16, skip: 1, solid: 1+1
    bos.write(2); (0 until 16).foreach(bos.write)      // frame 0: literal 0..15
    bos.write(0)                                        // frame 1: skip
    bos.write(1); bos.write(7)                          // frame 2: solid 7
    bos.toByteArray
  }

  test("GDV1 decoder, byte-level: literal / skip-carries-state / solid") {
    val df = Seq((9L, gdvHandcrafted)).toDF("id", "payload")
    val rows = Multimodal.decodeGdvFrames(df, "payload", "id")
      .select("frame_index", "luma_sum", "n_skip", "n_solid", "n_literal")
      .as[(Int, Long, Int, Int, Int)].collect().sortBy(_._1)
    // frame 0: sum 0+..+15 = 120; frame 1 SKIP must carry frame 0's
    // content (inter-frame state, not a re-zeroed buffer); frame 2: 16*7
    assert(rows.toSeq == Seq((0, 120L, 0, 0, 1), (1, 120L, 1, 0, 0),
      (2, 112L, 0, 1, 0)), rows.toSeq.toString)
  }

  test("GDV1: a multi-hop skip chain carries frame-0 content to the end") {
    // 4x4, 4 frames: literal then three skips
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write('G'); bos.write('D'); bos.write('V'); bos.write('1')
    w16(4); w16(4); w16(4)
    val base = 10 + 16
    w32(base); w32(base + 17); w32(base + 18); w32(base + 19)
    bos.write(2); (10 until 26).foreach(bos.write)
    bos.write(0); bos.write(0); bos.write(0)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val sums = Multimodal.decodeGdvFrames(df, "payload", "id")
      .select("frame_index", "luma_sum").as[(Int, Long)].collect().sortBy(_._1)
    val expect = (10 until 26).sum.toLong
    assert(sums.toSeq == (0 until 4).map(f => (f, expect)), sums.toSeq.toString)
  }

  test("GDV1: frame-0 skip reads the implicit zero frame; malformed " +
    "payloads sentinel") {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write('G'); bos.write('D'); bos.write('V'); bos.write('1')
    w16(4); w16(4); w16(1); w32(14)
    bos.write(0) // frame 0: skip -> all zeros by definition
    val zero = Multimodal.decodeGdvFrames(
        Seq((1L, bos.toByteArray)).toDF("id", "payload"), "payload", "id")
      .select("frame_index", "luma_sum").as[(Int, Long)].collect().toSeq
    assert(zero == Seq((0, 0L)), zero.toString)
    // malformed: wrong magic, truncated ops, bad dims, offset past end,
    // truncated literal payload — each a single all--1 sentinel row
    val good = gdvHandcrafted
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val truncated = good.take(good.length - 5)
    val badDims = good.clone(); badDims(4) = 3  // width 3: not mult of 4
    val badOff = good.clone(); badOff(10) = 200.toByte
    val bad = Seq((1L, badMagic), (2L, truncated), (3L, badDims),
      (4L, badOff), (5L, "AVI nonsense".getBytes("UTF-8")))
      .toDF("id", "payload")
    val rows = Multimodal.decodeGdvFrames(bad, "payload", "id")
      .select("id", "frame_index", "luma_sum", "n_skip", "n_solid", "n_literal")
      .as[(Long, Int, Long, Int, Int, Int)].collect()
    assert(rows.length == 5 &&
      rows.forall(r => r._2 == -1 && r._3 == -1L && r._4 == -1 && r._5 == -1 && r._6 == -1),
      rows.toSeq.toString)
  }

  test("GDV1 round trip: the demo fixture decodes to the generator's " +
    "exact sums and op counts, all three ops exercised") {
    val ids = Seq(0L, 1L, 2L, 17L, 100L).toDF("doc_id")
    val rows = Multimodal.decodeGdvFrames(
        Multimodal.encodeGdvDemo(ids, "doc_id"), "payload", "doc_id")
      .select("id", "frame_index", "luma_sum", "n_skip", "n_solid", "n_literal")
      .as[(Long, Int, Long, Int, Int, Int)].collect()
    assert(rows.length == 5 * 4)
    def pix(id: Long, f: Int, blk: Int, p: Int): Long =
      math.floorMod(id + blk, 3L) match {
        case 0 => math.floorMod(id * 31 + blk * 17 + p, 256L)
        case 1 => math.floorMod(id * 13 + blk * 7 + f * 41L, 256L)
        case _ => math.floorMod(id * 7 + blk * 29 + f * 53L + p * 3, 256L)
      }
    rows.foreach { case (id, f, sum, nSkip, nSolid, nLit) =>
      val expect = (0 until 4).map(b => (0 until 16).map(p => pix(id, f, b, p)).sum).sum
      assert(sum == expect, s"id=$id f=$f: $sum != $expect")
      // encoder rules on the formulas: mode 0 skips after frame 0,
      // mode 1 is solid every frame, mode 2 literal every frame
      val modes = (0 until 4).map(b => math.floorMod(id + b, 3L))
      val eSkip = if (f == 0) 0 else modes.count(_ == 0)
      val eSolid = modes.count(_ == 1)
      val eLit = if (f == 0) modes.count(_ != 1) else modes.count(_ == 2)
      assert((nSkip, nSolid, nLit) == ((eSkip, eSolid, eLit)),
        s"id=$id f=$f ops ($nSkip,$nSolid,$nLit) != ($eSkip,$eSolid,$eLit)")
    }
    // every op occurs somewhere in the fixture
    assert(rows.exists(_._4 > 0) && rows.exists(_._5 > 0) && rows.exists(_._6 > 0))
  }

  test("binary chunking produces ceil(n/chunk) rows with exact byte split") {
    val res = Multimodal.chunkBinary(bin, "payload", "id", 1024)
      .groupBy($"id").agg(count(lit(1)).as("n"), sum($"chunk_bytes").as("bytes"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(res(1L) == ((1L, 11L)))
    assert(res(2L) == ((3L, 2500L)))   // 1024 + 1024 + 452
  }


  test("real PNG decode: round trip reports encoded dims; garbage gets sentinels") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val pngs = Multimodal.encodePngDemo(ids, "doc_id")
    // magic bytes prove these are genuine PNG payloads, not fakes
    val magic = Multimodal.binaryMeta(pngs, "payload")
      .select($"magic_hex").as[String].collect()
    assert(magic.forall(_ == "89504E47"), s"not PNG payloads: ${magic.toSeq}")

    val meta = Multimodal.decodeImageMeta(pngs, "payload", "doc_id")
      .as[(Long, Int, Int, Int, Long)].collect().map(t => t._1 -> t).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val (_, w, h, c, nb) = meta(id)
      assert(w == (id % 13 + 1).toInt && h == (id % 7 + 1).toInt,
        s"doc $id decoded ${w}x$h")
      assert(c == 3, s"doc $id channels $c")
      assert(nb > 8, "payload shorter than a PNG signature")
    }

    // an undecodable payload must sentinel, not throw or null
    val garbage = Seq((7L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val g = Multimodal.decodeImageMeta(garbage, "payload", "doc_id")
      .as[(Long, Int, Int, Int, Long)].head()
    assert(g == ((7L, -1, -1, 0, 19L)))
  }

  test("real WAV decode: round trip reports encoded format; garbage gets sentinels") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val wavs = Multimodal.encodeWavDemo(ids, "doc_id")
    // RIFF magic proves these are genuine WAV containers, not fakes
    val magic = Multimodal.binaryMeta(wavs, "payload")
      .select($"magic_hex").as[String].collect()
    assert(magic.forall(_ == "52494646"), s"not RIFF payloads: ${magic.toSeq}")

    val meta = Multimodal.decodeWavMeta(wavs, "payload", "doc_id")
      .as[(Long, Int, Int, Int, Long, Long)].collect().map(t => t._1 -> t).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val (_, rate, ch, bits, frames, nb) = meta(id)
      assert(rate == (8000 + id % 5 * 2000).toInt, s"doc $id rate $rate")
      assert(ch == (id % 2 + 1).toInt, s"doc $id channels $ch")
      assert(bits == 16, s"doc $id bits $bits")
      assert(frames == id % 50 + 1, s"doc $id frames $frames")
      assert(nb > frames * ch * 2, "payload no bigger than its raw PCM data")
    }

    // an undecodable payload must sentinel, not throw or null
    val garbage = Seq((7L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val g = Multimodal.decodeWavMeta(garbage, "payload", "doc_id")
      .as[(Long, Int, Int, Int, Long, Long)].head()
    assert(g == ((7L, -1, 0, 0, -1L, 20L)))
  }

  test("real AVI header parse: round trip reports avih fields; junk sentinels") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val avis = Multimodal.encodeAviDemo(ids, "doc_id")
    val magic = Multimodal.binaryMeta(avis, "payload")
      .select($"magic_hex").as[String].collect()
    assert(magic.forall(_ == "52494646"), s"not RIFF payloads: ${magic.toSeq}")

    val meta = Multimodal.decodeAviMeta(avis, "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val (_, usec, frames, w, h, streams, nb) = meta(id)
      assert(usec == 1000000L / (id % 5 + 10), s"doc $id usec $usec")
      assert(frames == id % 60 + 1, s"doc $id frames $frames")
      assert(w == id % 32 * 8 + 16 && h == id % 18 * 8 + 16, s"doc $id ${w}x$h")
      assert(streams == 1 && nb == 88L)
    }

    // the walker must skip unknown/odd-sized chunks (RIFF word alignment)
    // before hdrl, not just parse the fixture's exact layout
    val avi = avis.where($"doc_id" === 5L).select($"payload")
      .as[Array[Byte]].head()
    // odd-sized JUNK chunk (3 data bytes + 1 alignment pad) between
    // "AVI " and LIST/hdrl
    val junk = Array[Byte]('J', 'U', 'N', 'K', 3, 0, 0, 0, 1, 2, 3, 0)
    val padded = java.nio.ByteBuffer.allocate(avi.length + junk.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    padded.put(avi, 0, 12).put(junk).put(avi, 12, avi.length - 12)
    // fix up the outer size: RIFF content grew by the junk chunk
    padded.putInt(4, avi.length - 8 + junk.length)
    val parsed = Multimodal.parseAviHeader(padded.array())
    // doc 5: fps = 5%5+10 = 10, frames = 6, 56x56, 1 stream
    assert(parsed.contains((100000L, 6L, 56L, 56L, 1L)),
      s"junk-chunk AVI parsed as $parsed")

    // malformed payloads sentinel, never throw: wrong magic, truncated
    val g = Multimodal.decodeAviMeta(
        Seq((7L, "RIFFxxxxNOPE".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(g == ((7L, -1L, -1L, -1L, -1L, -1L, 12L)))
    val trunc = Multimodal.decodeAviMeta(
        Seq((8L, avi.take(30))).toDF("doc_id", "payload"), "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(trunc._2 == -1L, s"truncated AVI must sentinel: $trunc")
  }

  test("image pixel decode: channel sums match the fixture formula; garbage sentinels") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val pngs = Multimodal.encodePngDemo(ids, "doc_id")
    val stats = Multimodal.decodeImagePixels(pngs, "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val w = (id % 13 + 1).toInt; val h = (id % 7 + 1).toInt
      val vs = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + x * 7 + y * 131) & 0xffffff)
      val (_, np, sr, sg, sb, ml) = stats(id)
      assert(np == w.toLong * h)
      assert(sr == vs.map(v => v >> 16).sum, s"doc $id sum_r")
      assert(sg == vs.map(v => (v >> 8) & 0xff).sum, s"doc $id sum_g")
      assert(sb == vs.map(v => v & 0xff).sum, s"doc $id sum_b")
      assert(ml == vs.map(v => (299L * (v >> 16) + 587L * ((v >> 8) & 0xff)
        + 114L * (v & 0xff)) / 1000L).max, s"doc $id max_luma")
    }
    val g = Multimodal.decodeImagePixels(
        Seq((7L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(g == ((7L, -1L, -1L, -1L, -1L, -1L)))
  }

  test("PCM sample decode: exact integer stats match the fixture formula") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val wavs = Multimodal.encodeWavDemo(ids, "doc_id")
    val stats = Multimodal.decodeWavSamples(wavs, "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val n = ((id % 50) + 1) * ((id % 2) + 1)
      val samples = (0L until n).map { j =>
        val lo = (id * 31 + (2 * j) * 7) % 256
        val hi = (id * 31 + (2 * j + 1) * 7) % 256
        val u = lo + 256 * hi
        if (u >= 32768) u - 65536 else u
      }
      val (_, ns, sa, pk, sq) = stats(id)
      assert(ns == n, s"doc $id n_samples $ns != $n")
      assert(sa == samples.map(math.abs).sum, s"doc $id sum_abs")
      assert(pk == samples.map(math.abs).max, s"doc $id peak")
      assert(sq == samples.map(v => v * v).sum, s"doc $id sum_sq")
    }
    // non-PCM16 / garbage payloads sentinel, never throw
    val g = Multimodal.decodeWavSamples(
        Seq((7L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(g == ((7L, -1L, -1L, -1L, -1L)))
  }

  test("spectral profile: DC reality, pure-tone concentration, silence, sentinel") {
    // hand-built 16-bit little-endian WAVs: a pure bin-3 cosine, silence
    def wav(samples: Seq[Int]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, j) =>
        data(2 * j) = (s & 0xff).toByte; data(2 * j + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val tone = (0 until 64).map(n => math.round(10000.0 * math.cos(2 * math.Pi * 3 * n / 64)).toInt)
    val df = Seq((1L, wav(tone)), (2L, wav(Seq.fill(64)(0))),
      (3L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.wavSpectralProfile(df, "payload", "doc_id", bins = 8, window = 64)
      .as[(Long, Int, Long, Long, Double)].collect()
    val byKey = out.map(t => (t._1, t._2) -> t).toMap
    // DC bin of any real signal: im_q exactly 0 (sin(0) = 0 on the grid)
    assert(byKey((1L, 0))._4 === 0L)
    // the pure bin-3 tone concentrates: its band energy dominates every
    // other bin by orders of magnitude
    val energies = (0 until 8).map(k => byKey((1L, k))._5)
    assert(energies(3) > 100.0 * (energies.patch(3, Nil, 1).max max 1e-9),
      s"tone not concentrated: $energies")
    // silence: every sum exactly zero
    (0 until 8).foreach { k =>
      assert(byKey((2L, k)) === ((2L, k, 0L, 0L, 0.0)))
    }
    // garbage payloads sentinel, never throw
    assert(byKey((3L, -1)) === ((3L, -1, -1L, -1L, -1.0)))
  }

  test("raw-frame decode: sampling, stride strip, bottom-up orientation") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val avis = Multimodal.encodeAviFramesDemo(ids, "doc_id")
    val rows = Multimodal.decodeAviFrames(avis, "payload", "doc_id", every = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val nf = (id % 10) + 1
      val w = ((id % 5) + 1) * 3
      val h = ((id % 4) + 1) * 3
      val expectFrames = (0L until nf).filter(_ % 2 == 0)
      assert(rows(id).map(_._2).toSeq == expectFrames, s"doc $id sampled frames")
      for ((_, fi, np, ps, pm, trs) <- rows(id)) {
        def pix(x: Long, y: Long) = (id * 31 + fi * 17 + y * 131 + x * 7) % 256
        val all = for (y <- 0L until h; x <- 0L until w) yield pix(x, y)
        assert(np == w * h, s"doc $id frame $fi n_pixels $np (stride not stripped?)")
        assert(ps == all.sum, s"doc $id frame $fi pix_sum")
        assert(pm == all.max, s"doc $id frame $fi pix_max")
        assert(trs == (0L until w).map(pix(_, 0L)).sum,
          s"doc $id frame $fi top_row_sum (bottom-up order mishandled?)")
      }
    }
    // compressed / non-8-bit streams must sentinel (strf gate), as must junk
    val g = Multimodal.decodeAviFrames(
        Seq((7L, "RIFFxxxxNOPE".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(g == ((7L, -1L, -1L, -1L, -1L, -1L)))
    // a header-only AVI (the meta fixture) has no strf/movi -> sentinel
    val headerOnly = Multimodal.encodeAviDemo(Seq(5L).toDF("doc_id"), "doc_id")
    val ho = Multimodal.decodeAviFrames(headerOnly, "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(ho._2 == -1L, s"frame decode of a frameless AVI must sentinel: $ho")
  }

  test("MJPEG frame decode: real JDK JPEG codec per sampled frame, " +
    "decoded dims + lossy-fidelity bound; codec gates both ways") {
    val ids = Seq(5L, 14L, 91L).toDF("doc_id")
    val avis = Multimodal.encodeMjpegAviDemo(ids, "doc_id")
    val rows = Multimodal.decodeMjpegFrames(avis, "payload", "doc_id", every = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for (id <- Seq(5L, 14L, 91L)) {
      val nf = (id % 6) + 1
      val w = ((id % 5) + 1) * 16
      val h = ((id % 4) + 1) * 16
      val expectFrames = (0L until nf).filter(_ % 2 == 0)
      assert(rows(id).map(_._2).toSeq == expectFrames, s"doc $id sampled frames")
      for ((_, fi, dw, dh, np, luma) <- rows(id)) {
        // dimensions come from the DECODED JPEG, not the container header
        assert(dw == w && dh == h && np == w * h,
          s"doc $id frame $fi decoded dims ${(dw, dh, np)}")
        // uniform-gray frame: JPEG's lossy round trip must stay within a
        // couple of gray levels of the encoded level
        val g = (id * 37 + fi * 29) % 200 + 20
        val mean = luma.toDouble / np
        assert(math.abs(mean - g) <= 3.0,
          s"doc $id frame $fi decoded mean $mean vs encoded gray $g")
      }
    }
    // the raw-DIB decoder must reject MJPEG (biCompression != 0) and the
    // MJPEG decoder must reject raw-DIB (biCompression != 'MJPG')
    val rawOnMjpeg = Multimodal.decodeAviFrames(avis, "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rawOnMjpeg.forall(_._2 == -1L), "raw decoder must sentinel on MJPEG")
    val dib = Multimodal.encodeAviFramesDemo(ids, "doc_id")
    val mjpegOnRaw = Multimodal.decodeMjpegFrames(dib, "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(mjpegOnRaw.forall(_._2 == -1L), "MJPEG decoder must sentinel on raw DIB")
    // junk bytes sentinel too
    val junk = Multimodal.decodeMjpegFrames(
        Seq((7L, "RIFFxxxxNOPE".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        "payload", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(junk == ((7L, -1L, -1L, -1L, -1L, -1L)))
  }

  test("area-average resize: block means over full blocks only, " +
    "zero-dim results for sub-factor sources, sentinel on junk") {
    // id 1 -> 2x2 PNG (w = 1%13+1 = 2, h = 1%7+1 = 2): one output pixel,
    // channel mean = sum of the 4 fixture pixels / 4 (integer division)
    val one = Multimodal.resizeImageStats(
        Multimodal.encodePngDemo(Seq(1L).toDF("doc_id"), "doc_id"),
        "payload", "doc_id", factor = 2).collect().head
    def ch(v: Long, shift: Int): Long = (v >> shift) & 0xff
    val vs = for (y <- 0 to 1; x <- 0 to 1) yield (1L * 31 + x * 7 + y * 131) & 0xffffff
    val (mr, mg, mb) = (vs.map(ch(_, 16)).sum / 4, vs.map(ch(_, 8)).sum / 4,
      vs.map(ch(_, 0)).sum / 4)
    assert(one.getAs[Long]("out_w") == 1 && one.getAs[Long]("out_h") == 1)
    assert(one.getAs[Long]("sum_r") == mr && one.getAs[Long]("sum_g") == mg &&
      one.getAs[Long]("sum_b") == mb)
    assert(one.getAs[Long]("max_luma") == (299 * mr + 587 * mg + 114 * mb) / 1000)

    // id 0 -> 1x1 source: smaller than the factor -> (0, 0) dims, zero sums
    val z = Multimodal.resizeImageStats(
        Multimodal.encodePngDemo(Seq(0L).toDF("doc_id"), "doc_id"),
        "payload", "doc_id", factor = 2).collect().head
    assert(z.getAs[Long]("out_w") == 0 && z.getAs[Long]("out_h") == 0 &&
      z.getAs[Long]("sum_r") == 0 && z.getAs[Long]("max_luma") == 0)

    val junk = Multimodal.resizeImageStats(
        Seq((7L, "notapng".getBytes("UTF-8"))).toDF("doc_id", "payload"),
        "payload", "doc_id", factor = 2).collect().head
    assert(junk.getAs[Long]("out_w") == -1L && junk.getAs[Long]("max_luma") == -1L)
  }

  test("G.711 expansion matches the JDK's own ULAW/ALAW converters on " +
    "all 256 codes; decode round-trips the fixture; non-G711 sentinels") {
    // independent ground truth: javax.sound's converter expands each
    // one-byte code to a 16-bit little-endian PCM sample
    def jdkExpand(enc: javax.sound.sampled.AudioFormat.Encoding,
                  code: Int): Int = {
      val src = new javax.sound.sampled.AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array(code.toByte)), src, 1L)
      val out = javax.sound.sampled.AudioSystem.getAudioInputStream(dst, in)
      val b = out.readAllBytes()
      ((b(1) << 8) | (b(0) & 0xff)).toShort.toInt
    }
    (0 until 256).foreach { c =>
      val ju = jdkExpand(javax.sound.sampled.AudioFormat.Encoding.ULAW, c)
      val ja = jdkExpand(javax.sound.sampled.AudioFormat.Encoding.ALAW, c)
      // the JDK table is the CCITT sample scaled by... it should be
      // identical to the reference formula; pin exact equality
      assert(Multimodal.ulawExpand(c) == ju, s"ulaw($c): ${Multimodal.ulawExpand(c)} vs JDK $ju")
      assert(Multimodal.alawExpand(c) == ja, s"alaw($c): ${Multimodal.alawExpand(c)} vs JDK $ja")
    }

    val ids = Seq(4L, 7L, 100L).toDF("doc_id")
    val decoded = Multimodal.decodeG711Samples(
        Multimodal.encodeG711Demo(ids, "doc_id"), "payload", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("codec"), r.getAs[Long]("n_samples"),
          r.getAs[Long]("sum_abs"), r.getAs[Long]("peak"),
          r.getAs[Long]("sum_sq")))).toMap
    for (id <- Seq(4L, 7L, 100L)) {
      val fmt7 = id % 2 == 0
      val n = (id % 50) + 1
      val samples = (0L until n).map { i =>
        val code = ((id * 13 + i * 11) % 256).toInt
        if (fmt7) Multimodal.ulawExpand(code) else Multimodal.alawExpand(code)
      }
      val expect = (if (fmt7) "ulaw" else "alaw", n,
        samples.map(s => math.abs(s.toLong)).sum,
        samples.map(s => math.abs(s.toLong)).max,
        samples.map(s => s.toLong * s).sum)
      assert(decoded(id) == expect, s"doc $id: ${decoded(id)} vs $expect")
    }
    // a PCM WAV is NOT G.711 -> sentinel (and vice versa is already
    // pinned: decodeWavSamples sentinels on non-PCM)
    val pcm = Multimodal.decodeG711Samples(
        Multimodal.encodeWavDemo(Seq(5L).toDF("doc_id"), "doc_id"),
        "payload", "doc_id")
      .collect().head
    assert(pcm.getAs[String]("codec") == "none" && pcm.getAs[Long]("n_samples") == -1L)
  }

  test("dHash: gradient/flat invariants, grid sentinel, and the " +
    "perceptual property — the hash survives lossy JPEG re-encoding") {
    def png(f: java.awt.image.BufferedImage => Unit, w: Int = 36, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      f(img)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def fill(img: java.awt.image.BufferedImage)(g: (Int, Int) => Int): Unit =
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val v = g(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
    // strictly increasing left->right: every adjacent-mean bit set = -1L
    val grad = png(fill(_)((x, _) => 40 + x * 5))
    // flat: no bit set = 0
    val flat = png(fill(_)((_, _) => 128))
    val rows = Multimodal.imageDHash(
        Seq((1L, grad), (2L, flat), (3L, "junk".getBytes("UTF-8")))
          .toDF("doc_id", "payload"), "payload", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("dhash"), r.getAs[Long]("n_pixels")))).toMap
    assert(rows(1L) == ((-1L, 36L * 32)), s"gradient: ${rows(1L)}")
    assert(rows(2L) == ((0L, 36L * 32)), s"flat: ${rows(2L)}")
    assert(rows(3L) == ((0L, -1L)), s"junk sentinel: ${rows(3L)}")
    // smaller than the 9x8 grid -> sentinel
    val tiny = Multimodal.imageDHash(
        Seq((4L, png(fill(_)((x, y) => (x * 7 + y * 13) % 256), 8, 8)))
          .toDF("doc_id", "payload"), "payload", "doc_id").collect().head
    assert(tiny.getAs[Long]("n_pixels") == -1L)

    // perceptual: a textured image re-encoded as LOSSY JPEG keeps a
    // close hash (hamming <= 8 of 64) while a different image is far
    val texture = png(fill(_)((x, y) => ((x * 37 + y * 11) % 200) + 20))
    val other = png(fill(_)((x, y) => ((x * 5 + (31 - y) * 29) % 200) + 20))
    val jpegOfTexture = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(texture))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val h = Multimodal.imageDHash(
        Seq((10L, texture), (11L, jpegOfTexture), (12L, other))
          .toDF("doc_id", "payload"), "payload", "doc_id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("dhash")).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(10L), h(11L)) <= 8,
      s"lossy re-encode moved the hash ${hamming(h(10L), h(11L))} bits")
    assert(hamming(h(10L), h(12L)) > 16,
      s"different images implausibly close: ${hamming(h(10L), h(12L))}")
  }

  test("hashPairs: hamming-radius pairs over a precomputed 64-bit hash " +
    "column, including the top (uncovered-remainder) bit") {
    val df = Seq((1L, 0L), (2L, 3L), (3L, 0xFFL), (4L, Long.MinValue))
      .toDF("id", "h")
    val got = Dedup.hashPairs(df, col("h"), "id", maxHamming = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    // hamming(0, 3) = 2; hamming(0, 1<<63) = 1 — bit 63 lies outside the
    // 3 x 21-bit pigeonhole chunks, so this pins the remainder-bit
    // completeness argument; every other pair differs by > 2 bits
    assert(got == Set((1L, 2L, 2), (1L, 4L, 1)), got.toString)
    val e = intercept[IllegalArgumentException] {
      Dedup.hashPairs(df, col("h"), "id", maxHamming = 32)
    }
    assert(e.getMessage.contains("maxHamming"), e.getMessage)
    // a hex-STRING hash column would cast('long') to all-null keys and
    // return zero pairs with no error — must be rejected up front
    val e2 = intercept[IllegalArgumentException] {
      Dedup.hashPairs(df.withColumn("hx", expr("lpad(hex(h), 16, '0')")),
        col("hx"), "id", maxHamming = 2)
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
  }

  test("hashPairs completeness property: blocked pairs equal brute force " +
    "over clustered random hashes at every radius") {
    // seeded corpus with PLANTED near-pairs: 40 base hashes, each with 4
    // perturbed copies at 1..12 flipped bits (uniform random longs alone
    // almost never land within hamming 12 of each other, so they would
    // test nothing); brute force over all 200 is the ground truth
    val rnd = new scala.util.Random(1234L)
    val hashes = (0 until 40).flatMap { i =>
      val base = rnd.nextLong()
      (base, i * 5L) +: (1 to 4).map { j =>
        val flips = 1 + rnd.nextInt(12)
        val perturbed = (1 to flips).foldLeft(base)((h, _) => h ^ (1L << rnd.nextInt(64)))
        (perturbed, i * 5L + j)
      }
    }
    val df = hashes.map { case (h, id) => (id, h) }.toDF("id", "h")
    val byId = hashes.map { case (h, id) => id -> h }.toMap
    for (r <- Seq(0, 1, 3, 8, 12)) {
      val expected = (for {
        a <- byId.keys; b <- byId.keys if a < b
        d = java.lang.Long.bitCount(byId(a) ^ byId(b)) if d <= r
      } yield (a, b, d)).toSet
      val got = Dedup.hashPairs(df, col("h"), "id", maxHamming = r)
        .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"),
          x.getAs[Int]("hamming"))).toSet
      assert(got == expected,
        s"r=$r: got ${got.size} pairs, expected ${expected.size}; " +
          s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
      if (r >= 3) assert(expected.nonEmpty, s"fixture degenerate at r=$r")
      // r = 0 must BLOCK on the full 64-bit hash (one bucket per distinct
      // hash), not collapse every row into one bucket — the (1L << 64) - 1
      // == 0 JVM shift trap would make it a silent cartesian-with-verify
      if (r == 0) {
        val r0Buckets = graft.util.CapMetrics.lastMetrics("dedup_hamming")
          .getOrElse(fail("no cap metrics for dedup_hamming")).totalBuckets
        assert(r0Buckets > 100,
          s"r=0 blocking must bucket per distinct hash, got $r0Buckets buckets")
      }
    }

    // incremental form over the same fixture: batch = every 3rd id vs the
    // full corpus — batch-side orientation (id_a from batch), self pairs
    // excluded, both orientations when both ids are batched
    val batchIds = byId.keys.filter(_ % 3 == 0).toSet
    for (r <- Seq(3, 8)) {
      val expectedX = (for {
        a <- batchIds; b <- byId.keys if a != b
        d = java.lang.Long.bitCount(byId(a) ^ byId(b)) if d <= r
      } yield (a, b, d)).toSet
      val gotX = Dedup.hashPairsAgainst(
          df.where(col("id") % 3 === 0), col("h"), "id", df, col("h"), "id",
          maxHamming = r)
        .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"),
          x.getAs[Int]("hamming"))).toSet
      assert(gotX == expectedX,
        s"incremental r=$r: got ${gotX.size}, expected ${expectedX.size}; " +
          s"missing=${(expectedX -- gotX).take(3)} extra=${(gotX -- expectedX).take(3)}")
      assert(expectedX.nonEmpty)
    }
  }

  test("stored hamming state: identical answer, PRUNED corpus scan " +
    "(PartitionFilters with a strict bucket subset)") {
    // same planted-near-pair generator as the completeness property test
    val rnd = new scala.util.Random(99L)
    val hashes = (0 until 40).flatMap { i =>
      val base = rnd.nextLong()
      (base, i * 5L) +: (1 to 4).map { j =>
        val flips = 1 + rnd.nextInt(6)
        val p = (1 to flips).foldLeft(base)((h, _) => h ^ (1L << rnd.nextInt(64)))
        (p, i * 5L + j)
      }
    }
    val corpus = hashes.map { case (h, id) => (id, h) }.toDF("id", "h")
    val dir = java.nio.file.Files.createTempDirectory("ham_store").toString
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3, nBuckets = 16)
    val stored = Dedup.loadHammingState(spark, dir)
    assert(stored.maxHamming == 3 && stored.nBuckets == 16)

    val batch = corpus.where(col("id") % 3 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    val inline = pairSet(Dedup.hashPairsAgainst(batch, col("h"), "id",
      corpus, col("h"), "id", maxHamming = 3))
    val viaStored = Dedup.hashPairsAgainstStored(batch, col("h"), "id", stored)
    assert(pairSet(viaStored) == inline && inline.nonEmpty,
      s"stored=${pairSet(viaStored).size} inline=${inline.size}")
    // the corpus scan must carry the bucket filter INSIDE the
    // PartitionFilters list — "plan contains PartitionFilters" alone is
    // vacuous (FileSourceScanExec always prints the key, even empty),
    // and a bucket filter that regressed to a post-scan data filter
    // would still mention bucket# elsewhere in the plan
    val plan = viaStored.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket filter did not reach partition pruning:\n$plan")
    // strict subset: a single-row batch touches at most chunks (4) of
    // the 16 bucket directories
    val one = corpus.limit(1)
    val oneStored = Dedup.hashPairsAgainstStored(one, col("h"), "id", stored)
    oneStored.count()
    val full = spark.read.parquet(s"$dir/gen=0/chunked").count()
    val touched = one.select(col("h")).collect().head.getLong(0)
    val oneBuckets = (0 until 4).map { c =>
      val ckey = (touched >>> (c * 16)) & 0xFFFFL
      spark.read.parquet(s"$dir/gen=0/chunked")
        .where(col("__chunk") === c && col("__ckey") === ckey).count()
    }.sum
    assert(oneBuckets > 0 && oneBuckets < full / 2,
      s"one row's chunk keys cover $oneBuckets of $full chunk rows — not a subset")

    // crash-window guard: a refresh that died mid-write leaves an
    // UNCOMMITTED generation; load must refuse when no committed
    // generation exists (a store mixing generations silently misses
    // pairs otherwise)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      fs.makeQualified(new org.apache.hadoop.fs.Path(dir)), "gen=0/_graft_commit")
    assert(fs.delete(marker, false), "expected a commit marker to delete")
    val e = intercept[IllegalArgumentException] {
      Dedup.loadHammingState(spark, dir)
    }
    assert(e.getMessage.contains("no committed generation"), e.getMessage)
    // a re-run of the save restores loadability under a FRESH generation
    // (in-place refresh would let a concurrent reader mix generations)
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3, nBuckets = 16)
    assert(pairSet(Dedup.hashPairsAgainstStored(batch, col("h"), "id",
      Dedup.loadHammingState(spark, dir))) == inline)
    val gens = fs.listStatus(fs.makeQualified(new org.apache.hadoop.fs.Path(dir)))
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted
    assert(gens.last != "gen=0", s"refresh did not flip generations: ${gens.toSeq}")

    // generation grace: a reader that resolved the PREVIOUS live gen
    // before a refresh keeps a consistent view (the superseded dir is
    // kept for one save), and the refreshed store still answers
    val before = Dedup.loadHammingState(spark, dir)
    Dedup.saveHammingState(corpus.where(col("id") < 100), col("h"), "id", dir,
      maxHamming = 3, nBuckets = 16)
    assert(pairSet(Dedup.hashPairsAgainstStored(batch, col("h"), "id", before))
      == inline, "in-flight reader on the superseded generation broke mid-refresh")
    val after = Dedup.loadHammingState(spark, dir)
    assert(pairSet(Dedup.hashPairsAgainstStored(batch, col("h"), "id", after))
      == pairSet(Dedup.hashPairsAgainst(batch, col("h"), "id",
        corpus.where(col("id") < 100), col("h"), "id", maxHamming = 3)))

    // graceGens=2: a reader pinned TWO generations back survives two
    // refreshes; at the default graceGens=1 the same lag fails LOUDLY
    // (deleted files -> task failure), never silently-wrong
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3,
      nBuckets = 16)
    val pinned = Dedup.loadHammingState(spark, dir)
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3,
      nBuckets = 16, graceGens = 2)
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3,
      nBuckets = 16, graceGens = 2)
    assert(pairSet(Dedup.hashPairsAgainstStored(batch, col("h"), "id", pinned))
      == inline,
      "a reader two generations back must survive refreshes at graceGens=2")
    val pinned1 = Dedup.loadHammingState(spark, dir)
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3,
      nBuckets = 16) // graceGens=1: keeps only pinned1's gen...
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3,
      nBuckets = 16) // ...and this save deletes it
    val lagging = intercept[Exception] {
      Dedup.hashPairsAgainstStored(batch, col("h"), "id", pinned1).count()
    }
    assert(lagging.getMessage != null,
      s"expected a loud deleted-generation failure, got $lagging")
  }

  test("loadHammingState names the legacy root-level layout explicitly, " +
    "and a save migrates it to the gen= scheme") {
    val dir = java.nio.file.Files.createTempDirectory("ham_legacy").toString
    val corpus = Seq((1L, 7L), (2L, 7L ^ 3L)).toDF("id", "h")
    // fabricate the pre-generation layout: root-level chunked/ + commit
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    corpus.write.mode("overwrite").parquet(s"$dir/chunked")
    fs.create(new org.apache.hadoop.fs.Path(root, "_graft_commit"), true).close()
    val e = intercept[IllegalArgumentException] {
      Dedup.loadHammingState(spark, dir)
    }
    assert(e.getMessage.contains("legacy"), e.getMessage)
    // the migration path the error names: re-save, which must also GC the
    // legacy dirs so they never shadow the gen= scheme
    Dedup.saveHammingState(corpus, col("h"), "id", dir, maxHamming = 3,
      nBuckets = 4)
    val stored = Dedup.loadHammingState(spark, dir)
    assert(Dedup.hashPairsAgainstStored(corpus, col("h"), "id", stored)
      .count() == 2L) // (1,2) and (2,1) at hamming 2
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "chunked")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(root, "_graft_commit")),
      "legacy root-level layout must be cleaned up by the migrating save")
  }

  test("curateByDHashImages: hamming clustering catches a near-duplicate " +
    "copy (re-encode / light edit) that exact hash equality misses") {
    def png(g: (Int, Int) => Int, w: Int = 36, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // the recrawl case: the same texture with a brightened band — a
    // deterministic stand-in for a lossy re-encode (this JDK's
    // default-quality JPEG round trip happens to keep the dHash
    // bit-identical, which exact equality already handles; the dHash
    // spec above pins lossy re-encodes within 8 bits, so the edit's
    // hamming-4 copy is inside the same contract)
    def tex(x: Int, y: Int): Int = ((x * 37 + y * 11) % 200) + 20
    val texture = png(tex)
    val edited = png((x, y) => if (x < 4) math.min(tex(x, y) + 35, 255) else tex(x, y))
    val other = png((x, y) => ((x * 5 + (31 - y) * 29) % 200) + 20)
    val images = Seq((10L, texture), (11L, edited), (12L, other))
      .toDF("img_key", "payload")
    // pin the premise: 0 < hamming(texture, edited) <= 8, unrelated far
    val h = Multimodal.imageDHash(images, "payload", "img_key")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("dhash")).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(10L), h(11L)) > 0 && hamming(h(10L), h(11L)) <= 8,
      s"edit premise: ${hamming(h(10L), h(11L))} bits")
    assert(hamming(h(10L), h(12L)) > 8, s"unrelated: ${hamming(h(10L), h(12L))}")

    val docs = Seq((100L, 10L), (101L, 10L), (102L, 11L), (103L, 12L))
      .toDF("doc_id", "img_key")
    def run(r: Int) = Multimodal.curateByDHashImages(
        docs, "doc_id", "img_key", images, "payload", maxHamming = r)
      .collect().map(x => (x.getAs[Long]("keep_doc_id"),
        x.getAs[Long]("n_in_bucket"))).toSet
    // exact equality: the edited copy's hash differs by a few bits, so
    // it survives as its own bucket — the miss the hamming mode closes
    assert(run(0) == Set((100L, 2L), (102L, 1L), (103L, 1L)), run(0).toString)
    // hamming <= 8: the near-dup copy joins its original's cluster; the
    // unrelated image does not
    assert(run(8) == Set((100L, 3L), (103L, 1L)), run(8).toString)
  }

  test("IMA ADPCM: hand-computed nibble steps, clamp engagement, " +
    "per-block state reseed, and malformed sentinels") {
    // published-algorithm spot values from state (pred=0, index=0, step=7):
    // nibble 0x0 -> diff = 7>>3 = 0, pred stays 0, index -1 -> clamps to 0
    assert(Multimodal.imaStep(0, 0, 0x0) == ((0, 0)))
    // nibble 0x7 -> diff = 0 + 1 + 3 + 7 = 11, pred 11, index +8
    assert(Multimodal.imaStep(0, 0, 0x7) == ((11, 8)))
    // sign bit subtracts: nibble 0xF from (0, 0) -> pred -11
    assert(Multimodal.imaStep(0, 0, 0xF) == ((-11, 8)))
    // top-of-table clamp: step 32767, nibble 0x7 from pred 0 ->
    // diff = 4095 + 8191 + 16383 + 32767 = 61436 -> clamps to 32767;
    // index 88 + 8 clamps to 88
    assert(Multimodal.imaStep(0, 88, 0x7) == ((32767, 88)))

    val decoded = Multimodal.decodeImaAdpcmSamples(
        Multimodal.encodeImaAdpcmDemo(Seq(3L, 88L, 1000L).toDF("doc_id"), "doc_id"),
        "payload", "doc_id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("codec"), r.getAs[Long]("n_samples")))).toMap
    for (id <- Seq(3L, 88L, 1000L)) {
      val nb = (id % 40) + 1
      assert(decoded(id) == (("ima_adpcm", 1 + 2 * nb)),
        s"doc $id: ${decoded(id)}")
    }

    // two-block payload: the second block header RESEEDS the state (the
    // splittability contract) — decode equals two independent blocks
    def block(pred: Int, idx: Int, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putShort(pred.toShort).put(idx.toByte).put(0.toByte).put(data)
      bb.array()
    }
    def wav(ba: Int, blocks: Array[Byte]*): Array[Byte] = {
      val data = blocks.flatten.toArray
      val total = 12 + (8 + 16) + (8 + data.length)
      val bb = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(0x11).putShort(1).putInt(8000).putInt(4000)
        .putShort(ba.toShort).putShort(4)
      bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    val b1 = block(100, 5, Array(0x70.toByte, 0x21.toByte))
    val b2 = block(-200, 30, Array(0x0F.toByte, 0x93.toByte))
    val two = Multimodal.decodeImaAdpcmSamples(
        Seq((1L, wav(6, b1, b2))).toDF("doc_id", "payload"),
        "payload", "doc_id").collect().head
    val each = Seq((1L, wav(6, b1)), (2L, wav(6, b2)))
      .toDF("doc_id", "payload")
    val parts = Multimodal.decodeImaAdpcmSamples(each, "payload", "doc_id")
      .collect().map(r => (r.getAs[Long]("n_samples"), r.getAs[Long]("sum_abs"),
        r.getAs[Long]("sum_sq")))
    assert(two.getAs[Long]("n_samples") == parts.map(_._1).sum)
    assert(two.getAs[Long]("sum_abs") == parts.map(_._2).sum)
    assert(two.getAs[Long]("sum_sq") == parts.map(_._3).sum)

    // malformed: step index > 88 and a PCM WAV both sentinel
    val badIdx = Multimodal.decodeImaAdpcmSamples(
        Seq((9L, wav(6, block(0, 90, Array(0x11.toByte, 0x22.toByte)))))
          .toDF("doc_id", "payload"), "payload", "doc_id").collect().head
    assert(badIdx.getAs[String]("codec") == "none")
    // duplicated fmt chunks: the FIRST fmt wins for BOTH the format tag
    // and the block stride — a PCM-first payload sentinels even when a
    // second fmt claims ADPCM (format/stride can never come from
    // different chunks)
    val dupFmt = {
      val data = block(0, 5, Array(0x12.toByte))
      val total = 12 + (8 + 16) * 2 + (8 + data.length)
      val bb = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)            // PCM fmt first
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(0x11).putShort(1).putInt(8000).putInt(4000)
        .putShort(5).putShort(4)             // ADPCM fmt second (ignored)
      bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    val df2 = Multimodal.decodeImaAdpcmSamples(
        Seq((11L, dupFmt)).toDF("doc_id", "payload"), "payload", "doc_id")
      .collect().head
    assert(df2.getAs[String]("codec") == "none", s"dup-fmt: $df2")
    val pcm = Multimodal.decodeImaAdpcmSamples(
        Multimodal.encodeWavDemo(Seq(5L).toDF("doc_id"), "doc_id"),
        "payload", "doc_id").collect().head
    assert(pcm.getAs[String]("codec") == "none")
  }

  test("container walkers survive adversarial bytes: seeded mutations of " +
    "valid AVIs and pure noise always sentinel or degrade, never throw") {
    // a corrupt payload in a 100 TB crawl must not fail the stage — the
    // chunk-size fields are attacker-controlled ints, so every indexing
    // path gets fuzzed: valid containers with 1-8 mutated bytes
    // (lengths, fourCCs, JPEG internals alike) plus unstructured noise
    val rnd = new scala.util.Random(17)
    val valid = (Multimodal.encodeMjpegAviDemo(Seq(3L, 10L).toDF("doc_id"), "doc_id")
        .collect().map(_.getAs[Array[Byte]]("payload")) ++
      Multimodal.encodeAviFramesDemo(Seq(3L, 10L).toDF("doc_id"), "doc_id")
        .collect().map(_.getAs[Array[Byte]]("payload"))).toSeq
    val mutated = (1 to 300).map { i =>
      val base = valid(i % valid.size).clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
      }
      (i.toLong, base)
    }
    val noise = (301 to 400).map { i =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      (i.toLong, b)
    }
    val payloads = (mutated ++ noise).toDF("doc_id", "payload")
    // throws (index-out-of-bounds, negative allocation, codec crashes)
    // would fail these actions; sentinels and partial output are both fine
    assert(Multimodal.decodeMjpegFrames(payloads, "payload", "doc_id").count() >= 400L)
    assert(Multimodal.decodeAviFrames(payloads, "payload", "doc_id").count() >= 400L)
    assert(Multimodal.decodeAviMeta(payloads, "payload", "doc_id").count() == 400L)
    assert(Multimodal.decodeImageMeta(payloads, "payload", "doc_id").count() == 400L)
    assert(Multimodal.decodeWavMeta(payloads, "payload", "doc_id").count() == 400L)
    assert(Multimodal.decodeWavSamples(payloads, "payload", "doc_id").count() >= 400L)
    assert(Multimodal.decodeG711Samples(payloads, "payload", "doc_id").count() == 400L)
    assert(Multimodal.decodeImaAdpcmSamples(payloads, "payload", "doc_id").count() == 400L)
    assert(Multimodal.resizeImageStats(payloads, "payload", "doc_id", 2).count() == 400L)
  }
}
