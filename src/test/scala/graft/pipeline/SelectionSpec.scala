package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Moore–Lewis ([[TextAnalysis.mooreLewisScore]]) and DSIR
  * ([[Curation.dsirSelect]]) invariants the DuckDB value oracles cannot
  * see: that the scores actually SELECT the domain (enrichment), the
  * OOV/no-smoothing contract, and selection determinism.
  */
class SelectionSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("moore-lewis: in-domain docs have full vocab coverage and out-rank the rest") {
    val scored = TextAnalysis.mooreLewisScore(docs, "text", "doc_id",
        docs.where(col("lang") === "en"), "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    // exemplar docs' tokens ARE the in-domain vocab: nothing OOV
    assert(scored.where(col("lang") === "en")
      .where(col("n_scored") =!= col("n_tokens")).count() === 0L)
    // the signal selects: mean avg_score of en docs beats the others'
    val Array(enAvg, restAvg) = scored
      .groupBy((col("lang") === "en").as("g")).agg(avg(col("avg_score")).as("a"))
      .orderBy(col("g").desc).collect().map(_.getDouble(1))
    assert(enAvg > restAvg,
      s"expected en mean avg_score $enAvg > non-en $restAvg")
  }

  test("moore-lewis: all-OOV docs score 0 with n_scored 0, not -inf") {
    import spark.implicits._
    val raw = Seq((1L, "aaa bbb aaa"), (2L, "zzz yyy"), (3L, "aaa zzz"))
      .toDF("doc_id", "text")
    val inDom = Seq(Tuple1("aaa bbb")).toDF("text")
    val out = TextAnalysis.mooreLewisScore(raw, "text", "doc_id", inDom, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(2L) === ((2L, 0L, 0.0, 0.0)))      // nothing in-domain: neutral
    assert(out(3L)._2 === 1L)                     // one scoreable token
    assert(out(1L)._2 === 3L && out(1L)._3 > 0.0) // pure in-domain: positive
  }

  test("dsir: exact-k deterministic selection, enriched for the target language") {
    val sel = Curation.dsirSelect(docs, "text", "doc_id",
      docs.where(col("lang") === "en"), "text", k = 100, buckets = 4096)
    val rows = sel.collect()
    assert(rows.length === 100)
    assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to 100))
    // enrichment: en share among selected > en share overall
    val enAll = docs.where(col("lang") === "en").count().toDouble / docs.count()
    val enSel = sel.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .where(col("lang") === "en").count().toDouble / 100.0
    assert(enSel > enAll,
      s"expected selected en share $enSel > corpus share $enAll")
    // deterministic: same picks and ranks on a re-run
    val again = Curation.dsirSelect(docs, "text", "doc_id",
      docs.where(col("lang") === "en"), "text", k = 100, buckets = 4096)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1).toSeq ===
      again.map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1).toSeq)
  }

  test("dsir: save/load round-trips the model and scores bit-identically") {
    val model = Curation.dsirFit(docs, "text",
      docs.where(col("lang") === "en"), "text", buckets = 4096)
    val path = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Curation.saveDsirModel(model, path, spark)
    val loaded = Curation.loadDsirModel(spark, path)
    assert(loaded.buckets === model.buckets)
    assert(loaded.ratiosMicro.toSeq === model.ratiosMicro.toSeq)
    val a = Curation.dsirScore(docs, "text", "doc_id", model)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    val b = Curation.dsirScore(docs, "text", "doc_id", loaded)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("unimax: allocations respect the budget, the epoch cap, and the equal-share rule") {
    // 800 rows / 2 epochs on this corpus: four languages' full 2-epoch
    // corpora fit their fair share (capped), en shares the remainder
    val out = Curation.unimaxSample(docs, "doc_id", "lang",
      budget = 800L, maxEpochs = 2)
    val alloc = out.groupBy("lang").agg(
        max(col("budget_alloc")).as("b"), count(lit(1)).as("n"),
        sum(col("n_copies")).as("copies"), max(col("n_copies")).as("maxc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val totalAlloc = alloc.values.map(_._1).sum
    // budget conserved up to the floor-division remainder (< #strata)
    assert(totalAlloc <= 800L && totalAlloc > 800L - alloc.size)
    alloc.foreach { case (lang, (b, n, copies, maxc)) =>
      assert(b <= n * 2, s"$lang over the epoch cap")     // c = n * maxEpochs
      assert(maxc <= 2L, s"$lang rows over maxEpochs copies")
      // realized copies land in [epochs*n, epochs*n + n] by construction
      val epochs = b / n
      assert(copies >= epochs * n && copies <= (epochs + 1) * n, s"$lang copies $copies vs b $b")
    }
    // capped strata contribute their whole corpus at the cap; uncapped
    // strata all share one theta — and both classes exist at this budget
    val capped = alloc.filter { case (_, (b, n, _, _)) => b == n * 2 }
    val uncapped = alloc.filter { case (_, (b, n, _, _)) => b != n * 2 }
    assert(capped.nonEmpty && uncapped.nonEmpty)
    assert(uncapped.values.map(_._1).toSet.size === 1)
  }

  test("unimax allocation properties over 2000 random stratum tables") {
    // seeded generation, the KernelsSpec idiom — no scalatest-scalacheck
    // bridge needed for a pure function
    val rnd = new scala.util.Random(1234)
    (0 until 2000).foreach { trial =>
      val k = 1 + rnd.nextInt(12)
      val counts = (0 until k).map(i =>
        (if (rnd.nextInt(20) == 0) None else Some(s"s$i")) ->
          (1L + rnd.nextInt(10000)))
      val epochs = 1 + rnd.nextInt(4)
      val totalC = counts.map(_._2 * epochs).sum
      val budget = 1L + (rnd.nextLong(totalC * 2) max 1L)
      val alloc = Curation.unimaxAllocations(counts, budget, epochs)
      val bs = alloc.map(_._3)
      val ctx = s"trial $trial: counts=$counts budget=$budget epochs=$epochs alloc=$alloc"
      // epoch cap: nobody exceeds their full corpus at maxEpochs
      alloc.foreach { case (_, n, b) => assert(b <= n * epochs && b >= 0, ctx) }
      // budget conservation: never overspent; fully spent up to the
      // floor remainder unless the whole corpus fits
      assert(bs.sum <= budget, ctx)
      if (budget <= totalC) assert(bs.sum > budget - k, ctx)
      else assert(bs.sum === totalC, ctx)
      // every uncapped stratum shares one theta
      val uncapped = alloc.filter { case (_, n, b) => b != n * epochs }
      assert(uncapped.map(_._3).distinct.size <= 1, ctx)
      // monotone: a stratum with more capped capacity never gets less
      val byC = alloc.sortBy { case (_, n, _) => n * epochs }.map(_._3)
      assert(byC.zip(byC.drop(1)).forall { case (a, b) => a <= b }, ctx)
    }
  }

  test("unimax: a budget above the epoch-capped corpus keeps everything at the cap") {
    val out = Curation.unimaxSample(docs, "doc_id", "lang",
      budget = 10000L, maxEpochs = 3)
    assert(out.where(col("n_copies") =!= 3L).count() === 0L)
  }

  test("unimax by size: expected char budget lands within one doc of the allocation") {
    val out = Curation.unimaxSampleBySize(docs, "doc_id", "lang",
      "n_chars", budget = 200000L, maxEpochs = 2)
    val perLang = out.groupBy("lang").agg(
        max(col("budget_alloc")).as("b"), sum(col("n_chars")).as("sz"),
        sum(col("n_copies") * col("n_chars")).as("got"),
        max(col("n_copies")).as("maxc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    perLang.foreach { case (lang, (b, sz, got, maxc)) =>
      assert(b <= sz * 2, s"$lang over the size epoch cap")
      assert(maxc <= 2L, s"$lang rows over maxEpochs")
      // realized chars land within [epochs*sz, epochs*sz + sz] around b
      val epochs = b / sz
      assert(got >= epochs * sz && got <= (epochs + 1) * sz,
        s"$lang realized $got vs alloc $b (sz $sz)")
    }
    // zero-size strata allocate and emit nothing (guarded divisions)
    import spark.implicits._
    val zs = Seq((1L, "a", 0L), (2L, "a", 0L), (3L, "b", 10L))
      .toDF("doc_id", "lang", "n_chars")
    val z = Curation.unimaxSampleBySize(zs, "doc_id", "lang", "n_chars",
      budget = 100L, maxEpochs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(z(1L) === 0L && z(2L) === 0L && z(3L) === 2L)
  }

  test("unimax: high-cardinality stratum column fails fast with the guard") {
    val e = intercept[IllegalArgumentException] {
      Curation.unimaxSample(docs, "doc_id", "doc_id",
        budget = 100L, maxEpochs = 1, maxStrata = 10)
    }
    assert(e.getMessage.contains("broadcast-join"))
  }

  test("weighted exact-n: size-proportional, exact count, weight-gated") {
    val out = Curation.weightedSampleExactN(docs, "doc_id",
      col("n_chars").cast("double"), n = 100)
    assert(out.count() === 100L)
    assert(out.select("sample_rank").collect().map(_.getInt(0)).sorted.toSeq
      === (1 to 100))
    // probability ∝ length: the sample's mean length beats the corpus mean
    val meanAll = docs.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val meanSel = out.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(meanSel > meanAll, s"weighted sample mean $meanSel <= corpus mean $meanAll")
    // zero/negative/null weights never sampled
    import spark.implicits._
    val mixed = Seq((1L, 10.0), (2L, 0.0), (3L, -5.0), (4L, 1.0))
      .toDF("doc_id", "w")
    val picked = Curation.weightedSampleExactN(mixed, "doc_id", col("w"), n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(picked === Set(1L, 4L))
  }

  test("kneser-ney: hand-computed probabilities, smoothing, and the OOV contract") {
    import spark.implicits._
    // train bigrams: (a,b), (a,c) -> h(a)=2, N1+(a.)=2, cont(b)=cont(c)=1, tot=2
    val train = Seq(Tuple1("a b"), Tuple1("a c")).toDF("text")
    val score = Seq(
      (1L, "a b"),   // seen: P = (1-.75)/2 + .75*2/2*(1/2) = 0.5
      (2L, "x b"),   // unseen history: P = cont(b)/tot = 0.5
      (3L, "a z"),   // z never a continuation: skipped, n_oov
      (4L, "a b c")) // (a,b) seen 0.5; (b,c): b unseen history -> cont(c)/tot = 0.5
      .toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLogProb(score, "text", "doc_id", train, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ln05 = math.round(math.log(0.5) * 1e6) / 1e6
    assert(out(1L) === ((1L, 1L, ln05)))
    assert(out(2L) === ((1L, 1L, ln05)))
    assert(out(3L) === ((1L, 0L, 0.0)))          // skipped, not -inf
    assert(out(4L)._2 === 2L && math.abs(out(4L)._3 - 2 * ln05) < 1e-9)
    // interpolated KN normalizes: P(b|a) + P(c|a) = 1
  }

  test("kneser-ney on the corpus: train docs fully scored, log-probs non-positive") {
    val out = TextAnalysis.knBigramLogProb(docs, "text", "doc_id",
      docs.where(col("doc_id") % 2 === 0), "text")
    // every train-split bigram is in the LM: nothing skipped there
    assert(out.where(col("doc_id") % 2 === 0)
      .where(col("n_scored") =!= col("n_bigrams")).count() === 0L)
    // probabilities are probabilities
    assert(out.where(col("avg_logprob") > 0).count() === 0L)
    // and smoothing scores held-out bigrams the MLE table does not have:
    // some odd doc scores MORE bigrams than it has exact train matches
    val mle = TextAnalysis.bigramLogProb(
      docs.where(col("doc_id") % 2 === 0), "text", "doc_id")
    assert(out.agg(sum(col("n_scored"))).collect()(0).getLong(0) >
      mle.agg(sum(col("n_bigrams"))).collect()(0).getLong(0))
  }

  test("dsir: feature count is unigrams + adjacent bigrams") {
    import spark.implicits._
    val raw = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val out = Curation.dsirSelect(raw, "text", "doc_id", raw, "text",
      k = 2, buckets = 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 5L) // 3 unigrams + 2 bigrams
    assert(out(2L) === 1L) // 1 unigram, no bigram
  }
}
