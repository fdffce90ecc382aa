package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share word
  * n-grams with a held-out evaluation set, the standard pre-training
  * hygiene step (an LLM scoring well on a benchmark it memorized verbatim
  * is measurement error, so contaminated documents are dropped or
  * redacted before training).
  *
  * Plan shape at 100 TB: the evaluation side is small by construction
  * (benchmarks are MBs, the corpus is TBs), so its distinct n-gram set is
  * BROADCAST by default and the whole operator is one map-side semi-join
  * over the corpus scan plus one hash-aggregate on doc id — no corpus
  * shuffle on the n-gram key at all. The broadcast is an explicit hint
  * (planner size estimates over an exploded-distinct subtree are
  * unreliable), so for an eval side too big for executor memory pass
  * `broadcastEval = false` to let Catalyst plan a shuffled join on the
  * gram key instead — still keyed and skew-safe (grams are near-unique
  * at n ≥ 5). Measured crossover (sf10 scale run): at ~5M distinct eval
  * grams the shuffled path beat the forced broadcast 5.6 s vs 24.7 s —
  * flip the flag somewhere below 10^6-10^7 eval grams.
  *
  * Shingles come from the same codegen'd [[graft.fuzzy.WordShingles]]
  * kernel as the dedup family (distinct lowercase word n-grams; documents
  * shorter than n collapse to one whole-text shingle), so one oracle SQL
  * family covers both.
  */
object Decontaminate {

  /** Distinct word n-grams of the evaluation frame: (`__shingle`). */
  def evalGrams(eval: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    Dedup.wordShingles(eval, textCol, idCol, n).select(col("__shingle")).distinct()

  /** Contaminated corpus documents: (idCol, n_hits) where `n_hits` is the
    * number of DISTINCT eval n-grams the document contains (≥ 1). Callers
    * typically anti-join the result against the corpus to drop, or gate on
    * `n_hits` for a softer fraction-based policy. */
  def contaminated(corpus: DataFrame, eval: DataFrame, textCol: String,
                   idCol: String, n: Int,
                   broadcastEval: Boolean = true): DataFrame = {
    val g = evalGrams(eval, textCol, idCol, n)
    val grams = if (broadcastEval) broadcast(g) else g
    Dedup.wordShingles(corpus, textCol, idCol, n)
      .join(grams, Seq("__shingle"), "left_semi")
      // shingles are distinct per document already (kernel contract), so a
      // plain count IS the distinct-gram hit count
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** [[contaminated]] plus the document's total distinct-gram count and
    * the contaminated FRACTION — the gate for threshold policies ("drop
    * when > 20% of the document overlaps the eval set" rather than
    * drop-on-any-hit). Same broadcast plan plus one narrow per-doc gram
    * count; the fraction divides exact integers. */
  def contaminationStats(corpus: DataFrame, eval: DataFrame, textCol: String,
                         idCol: String, n: Int,
                         broadcastEval: Boolean = true): DataFrame = {
    // ONE corpus shingle pass: left-join the exploded grams to the
    // broadcast eval set and count hits conditionally (the two-pass
    // shape — contaminated() + a separate size aggregate — shingles the
    // corpus twice for the same answer)
    val g = evalGrams(eval, textCol, idCol, n).withColumn("__hit", lit(1))
    val grams = if (broadcastEval) broadcast(g) else g
    Dedup.wordShingles(corpus, textCol, idCol, n)
      .join(grams, Seq("__shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .where(col("n_hits") > 0)
      .select(col(idCol), col("n_hits"), col("n_grams"),
        (col("n_hits") / col("n_grams")).as("contaminated_frac"))
  }

  /** Span-level contamination REPORT — not just "is this doc
    * contaminated" ([[contaminated]]) but WHICH eval document leaked into
    * it and WHERE: one row per (corpus doc, eval doc) pair sharing at
    * least one word n-gram, with the shared-gram count and the earliest
    * token offset of any shared gram. The audit view a decontamination
    * rollout needs (review the overlap before dropping; attribute a
    * benchmark regression to the exact eval item).
    *
    * Gram semantics mirror the [[graft.fuzzy.WordShingles]] kernel
    * (distinct per doc; documents shorter than `n` tokens contribute
    * their whole text as one gram at offset 0), with positions attached:
    * the corpus side keeps each gram's FIRST token offset. The eval gram
    * table broadcasts like [[contaminated]]; the corpus side is one
    * positioned-gram pass (token array materialized as a column first —
    * the HOF-lambda contract). */
  def contaminationSpans(corpus: DataFrame, eval: DataFrame, textCol: String,
                         idCol: String, n: Int,
                         broadcastEval: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1 (got $n)")
    val w = col("__w")
    val whole = array(struct(lit(0).cast("int").as("pos"),
      array_join(w, " ").as("gram")))
    val many = transform(sequence(lit(1), size(w) - (n - 1)), i =>
      struct((i - 1).cast("int").as("pos"),
        concat_ws(" ", slice(w, i, lit(n))).as("gram")))
    val posGrams = corpus
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__w"))
      .select(col(idCol),
        explode(when(size(w) < n, whole).otherwise(many)).as("__pg"))
      .select(col(idCol), col("__pg.pos").as("__pos"), col("__pg.gram").as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("__pos")).as("__pos"))
    val eg = Dedup.wordShingles(eval, textCol, idCol, n)
      .select(col(idCol).as("eval_id"), col("__shingle").as("__g"))
    val evalSide = if (broadcastEval) broadcast(eg) else eg
    posGrams.join(evalSide, Seq("__g"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_matched"), min(col("__pos")).as("first_pos"))
  }

  /** [[contaminated]]'s EXACT semantics on a Bloom-prefiltered plan — the
    * scale arm for eval sets too big to broadcast as an exact gram set.
    *
    * The broadcast-eval default ships every distinct eval gram STRING to
    * every executor (fine for MB-scale benchmarks); `broadcastEval=false`
    * shuffles the full corpus gram stream on the gram key instead — at
    * 100 TB that shuffle is the whole cost, and almost all of it is
    * grams that hit nothing. This arm compresses the eval side to a Bloom
    * filter (~10 bits/gram at 1% fpp vs ~50 bytes/gram of UTF-8 — a 40x
    * smaller broadcast), prunes the corpus gram stream map-side with a
    * codegen'd [[graft.fuzzy.BloomMightContain]] probe, and exact-confirms
    * the survivors (true hits + ~fpp of the rest) with the shuffled
    * semi-join. The result is bit-identical to [[contaminated]] — the
    * bloom only prunes, the join decides — so the exact oracle covers
    * this arm too; the shuffle shrinks by roughly the non-hit fraction
    * (a decontamination pass is ~all misses by construction).
    *
    * `expectedEvalGrams` sizes the filter; pass it when known (the
    * census/profile family measures it) to skip the sizing count job.
    * The broadcast is released after the action via task-completion GC —
    * same lifecycle as every Spark broadcast. */
  def contaminatedBloom(corpus: DataFrame, eval: DataFrame, textCol: String,
                        idCol: String, n: Int,
                        fpp: Double = 0.01,
                        expectedEvalGrams: Long = -1L): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val g = evalGrams(eval, textCol, idCol, n)
    val expected =
      if (expectedEvalGrams > 0) expectedEvalGrams
      else math.max(g.count(), 64L)
    // distributed build (one aggregate over the eval grams), driver holds
    // only the finished bits, executors get them once via TorrentBroadcast
    val bf = g.stat.bloomFilter("__shingle", expected, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    Dedup.wordShingles(corpus, textCol, idCol, n)
      .where(graft.fuzzy.vectorFunctions.bloom_might_contain(col("__shingle"), bc))
      .join(g, Seq("__shingle"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The clean corpus: every row of `corpus` sharing no word n-gram with
    * `eval`. Same broadcast plan, anti-join at the end. */
  def decontaminated(corpus: DataFrame, eval: DataFrame, textCol: String,
                     idCol: String, n: Int,
                     broadcastEval: Boolean = true): DataFrame =
    corpus.join(
      contaminated(corpus, eval, textCol, idCol, n, broadcastEval).select(col(idCol)),
      Seq(idCol), "left_anti")
}
