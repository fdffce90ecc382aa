package graft.fuzzy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.{CapMetrics, Materialize}

/** Approximate candidate generation for huge cartesian spaces.
  *
  * The reference shells out to polars-simed (`ps.join_sim`,
  * matcher.py:99-161): collect both sides to the driver, chunk the left side
  * 10k rows at a time, take the top-N most similar right values per left
  * value. That design is single-node by construction. The Spark-native
  * re-expression is banded MinHash LSH over character n-gram sets:
  *
  *   distinct values -> char n-grams -> IDF stop-gram removal -> k minhashes
  *   (native codegen'd expressions) -> band keys -> capped bucket equi-join
  *   -> true n-gram-Jaccard verify -> per-left-value top-N.
  *
  * Implemented directly on DataFrames (not spark.ml's MinHashLSH) for one
  * load-bearing reason: BUCKET-SIZE CAPPING. On adversarial inputs where
  * many values share most n-grams (e.g. a common 13-char prefix), every
  * hash bucket contains nearly every value and an uncapped LSH join
  * degenerates to a skewed cartesian product on a single reducer —
  * measured as a >25-minute single-threaded stage at sf0.1. Buckets whose
  * candidate count exceeds `lshMaxBucketPairs` are dropped (the standard
  * web-scale LSH mitigation), bounding per-bucket work regardless of key
  * distribution. Drops are counted and logged per stage via
  * [[graft.util.CapMetrics]] — the cap is a recall trade, never a silent one.
  *
  * Auto mode additionally probes whether the corpus is LSH-friendly AT ALL:
  * when most values keep too few discriminative grams, bucket blocking
  * cannot separate them and the LSH path costs more than the exact cross
  * join while losing recall — [[candidatesOrExactFallback]] then returns
  * None so the caller runs exact (if the cartesian permits). The probe runs
  * on a ≤`lshProbeSampleSize` uniform sample: corpus-wide gram statistics
  * would cost more than the exact join the probe is trying to avoid
  * (measured: ~25 s of pure probe overhead at sf0.1 before sampling).
  */
object AnnJoin {

  /** Candidate generation with degenerate-input detection. Returns None
    * when the corpus is LSH-hostile and the cartesian is within
    * `lshExactFallbackCartesianCap` — the caller should run the exact
    * cross join instead.
    *
    * The probe estimates the degenerate-value fraction from a uniform
    * sample: gram document frequencies are proportional under uniform
    * sampling, so "gram present in more than `lshStopGramFraction` of all
    * values" is estimated by the same fraction of the sample, and the
    * per-value kept-gram counts follow. Total probe cost is O(sample), not
    * O(corpus) — auto-mode-with-fallback now costs ≈ the exact join. */
  def candidatesOrExactFallback(leftValues: DataFrame, rightValues: DataFrame,
                                leftCol: String, rightCol: String,
                                opts: MatchOptions, reversedThreshold: Double,
                                totalValues: Long, cartesian: Double): Option[DataFrame] = {
    val n = opts.lshNgramSize

    if (cartesian <= opts.lshExactFallbackCartesianCap && opts.lshExactFallbackCartesianCap > 0) {
      val frac = math.min(1.0, opts.lshProbeSampleSize.toDouble / math.max(totalValues, 1L))
      val sampled = leftValues.select(col(leftCol).as("__v"))
        .unionByName(rightValues.select(col(rightCol).as("__v")))
        .sample(withReplacement = false, frac, seed = 42L)
      // tiny (≤ ~10k values × ~20 grams); checkpointed because it feeds two
      // aggregations plus a count
      val sampleGrams = Materialize(
        sampled.select(col("__v"),
          explode(array_distinct(vectorFunctions.char_ngrams(lower(col("__v")), n))).as("__g")),
        opts.checkpoint)
      val nSample = sampleGrams.select(col("__v")).distinct().count()
      if (nSample > 0) {
        val sampleStop = sampleGrams.groupBy(col("__g"))
          .agg(count(lit(1)).as("__df"))
          .where(col("__df") > opts.lshStopGramFraction * nSample)
          .select(col("__g"))
        // sampled values whose kept-gram count clears the bar; values whose
        // grams are ALL stopped vanish from the anti-join and count as
        // degenerate
        val okValues = sampleGrams.join(sampleStop, Seq("__g"), "left_anti")
          .groupBy(col("__v")).agg(count(lit(1)).as("__kept"))
          .where(col("__kept") >= opts.lshMinKeptGrams)
          .count()
        val degenerateFraction = 1.0 - okValues.toDouble / nSample
        if (degenerateFraction > opts.lshDegenerateFraction) return None
      }
    }
    Some(candidates(leftValues, rightValues, leftCol, rightCol, opts,
      reversedThreshold, totalValues))
  }

  /** Approximate candidate pairs between two distinct-value frames (no
    * degeneracy probe — always builds the LSH join). */
  def candidates(leftValues: DataFrame, rightValues: DataFrame,
                 leftCol: String, rightCol: String,
                 opts: MatchOptions, reversedThreshold: Double = 1.0,
                 totalValues: Long = -1L): DataFrame = {
    val n = opts.lshNgramSize
    val total =
      if (totalValues > 0) totalValues
      else leftValues.count() + rightValues.count()
    def gramsOf(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol).as("__v"),
        explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"))
    val allGrams = Materialize(
      gramsOf(leftValues, leftCol).unionByName(gramsOf(rightValues, rightCol)),
      opts.checkpoint)
    val stopGrams = allGrams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") > opts.lshStopGramFraction * total)
      .select(col("__g"))
    build(leftValues, rightValues, leftCol, rightCol, opts, reversedThreshold, stopGrams)
  }

  private def build(leftValues: DataFrame, rightValues: DataFrame,
                    leftCol: String, rightCol: String,
                    opts: MatchOptions, reversedThreshold: Double,
                    stopGrams: DataFrame): DataFrame = {
    val n = opts.lshNgramSize
    val bands = opts.lshNumBands
    val rows = opts.lshRowsPerBand
    val k = bands * rows

    def gramsOf(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol).as("__v"),
        explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"))

    // Signatures are minhashed over the DISCRIMINATIVE grams; a value with
    // too few surviving grams falls back to its full gram set (tiny or
    // asymmetric kept sets make MinHash recall collapse).
    def keptGrams(df: DataFrame, vCol: String): DataFrame = {
      val kept = gramsOf(df, vCol)
        .join(stopGrams, Seq("__g"), "left_anti")
        .groupBy(col("__v")).agg(collect_list(col("__g")).as("__grams"))
        .withColumnRenamed("__v", vCol)
      df.join(kept, Seq(vCol), "left")
        .withColumn("__grams",
          when(col("__grams").isNull || size(col("__grams")) < opts.lshMinKeptGrams,
            vectorFunctions.char_ngrams(lower(col(vCol)), n))
            .otherwise(col("__grams")))
    }

    // The lowered value rides along from here on: computed once per value,
    // reused by the jaccard gate (per-pair lower() allocations dominated
    // the gate cost) and by the downstream scorer.
    def banded(df: DataFrame, vCol: String): DataFrame =
      keptGrams(df, vCol).select(
          col(vCol),
          lower(col(vCol)).as(FuzzyMatcher.lowerName(vCol)),
          posexplode(
            vectorFunctions.lsh_band_keys(
              vectorFunctions.minhash_signature(col("__grams"), k),
              bands, rows)))
        .withColumnRenamed("pos", "__band")
        .withColumnRenamed("col", "__bkey")

    val lb = Materialize(banded(leftValues, leftCol), opts.checkpoint)
    val rb = Materialize(banded(rightValues, rightCol), opts.checkpoint)
    val lLow = FuzzyMatcher.lowerName(leftCol)
    val rLow = FuzzyMatcher.lowerName(rightCol)

    // Bucket capping: drop (band, key) buckets whose left x right candidate
    // count exceeds the cap — they are non-selective and would concentrate
    // quadratic work on single reducers. Drop counts are observed and
    // logged (CapMetrics), so capped recall loss is visible per stage.
    val bucketStats = lb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__lc"))
      .join(rb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__rc")),
        Seq("__band", "__bkey"))
    val overCap = col("__lc") * col("__rc") > opts.lshMaxBucketPairs
    val allowed = CapMetrics.accountBucketCap(bucketStats, "fuzzy_lsh",
        overCap, col("__lc") * col("__rc"), opts.checkpoint)
      .where(!overCap)
      .select(col("__band"), col("__bkey"))

    // Jaccard gate: a single edit changes at most `n` grams, so a pair
    // within normalized edit distance f has gram-Jaccard distance at most
    // ~2nf/(1 + nf) (long-string limit). Gate at 1.4x that bound (margin
    // for end effects / short strings), capped by the configured ceiling.
    val f = reversedThreshold
    val adaptiveGate = math.min(
      math.max(1.4 * (2.0 * n * f) / (1.0 + n * f), 0.25),
      opts.lshJaccardDistanceThreshold)

    // Verify on the (duplicated) join stream — the jaccard kernel is cheap
    // codegen'd compute — then DEDUP, then rank: ranking the band-duplicated
    // stream would let a pair surfacing from b bands eat b top-N slots and
    // make the rank boundary nondeterministic. The gated stream is already
    // small (the jaccard filter passed), so the pair-level dedup shuffle is
    // bounded by ~2x the candidate set.
    val gated = lb.join(allowed, Seq("__band", "__bkey"))
      .join(rb, Seq("__band", "__bkey"))
      .select(col(leftCol), col(lLow), col(rightCol), col(rLow))
      .withColumn("__jaccard_dist",
        vectorFunctions.ngram_jaccard_dist(col(lLow), col(rLow), n))
      .where(col("__jaccard_dist") <= adaptiveGate)
      .dropDuplicates(leftCol, rightCol)

    val w = Window.partitionBy(col(leftCol)).orderBy(col("__jaccard_dist").asc, col(rightCol).asc)
    gated
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= opts.topNForNewMatches)
      .drop("__rn", "__jaccard_dist")
  }
}
