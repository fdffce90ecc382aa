package graft.fuzzy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate candidate generation for huge cartesian spaces.
  *
  * The reference shells out to polars-simed (`ps.join_sim`,
  * matcher.py:99-161): collect both sides to the driver, chunk the left side
  * 10k rows at a time, take the top-N most similar right values per left
  * value. That design is single-node by construction. The Spark-native
  * re-expression is banded MinHash LSH over character n-gram sets:
  *
  *   distinct values -> char n-grams -> k=bands*rows minhashes (native
  *   codegen'd expression) -> band keys -> bucket equi-join -> true
  *   n-gram-Jaccard verify -> per-left-value top-N.
  *
  * Implemented directly on DataFrames (not spark.ml's MinHashLSH) for one
  * load-bearing reason: BUCKET-SIZE CAPPING. On adversarial inputs where
  * many values share most n-grams (e.g. a common 13-char prefix), every
  * hash bucket contains nearly every value and an uncapped LSH join
  * degenerates to a skewed cartesian product on a single reducer —
  * measured as a >25-minute single-threaded stage at sf0.1. Buckets whose
  * candidate count exceeds `lshMaxBucketPairs` are dropped (the standard
  * web-scale LSH mitigation): a bucket that un-selective carries almost no
  * signal, and the pairs it would contribute are mostly rejected by the
  * final threshold anyway. The cap bounds per-bucket work, so the join
  * scales horizontally no matter how degenerate the key distribution is.
  */
object AnnJoin {

  /** Approximate candidate pairs between two distinct-value frames.
    *
    * @param leftValues  distinct left values (single column `leftCol`)
    * @param rightValues distinct right values (single column `rightCol`)
    * @return (leftCol, rightCol) pairs restricted to approximate neighbors —
    *         a subset of the exact cross join's schema.
    */
  /** Like [[candidates]], but detects LSH-hostile inputs and declines.
    *
    * The stop-gram statistics double as an effectiveness probe: when most
    * values keep fewer than `lshMinKeptGrams` discriminative grams (e.g.
    * all values share a long common prefix and differ only in a few
    * characters), n-gram buckets cannot separate them — the LSH path then
    * costs MORE than the exact cross join while losing recall. Returns
    * None in that case if the cartesian is within
    * `lshExactFallbackCartesianCap`, signalling the caller to run exact.
    */
  def candidatesOrExactFallback(leftValues: DataFrame, rightValues: DataFrame,
                                leftCol: String, rightCol: String,
                                opts: MatchOptions, reversedThreshold: Double,
                                totalValues: Long, cartesian: Double): Option[DataFrame] = {
    if (cartesian <= opts.lshExactFallbackCartesianCap) {
      val n = opts.lshNgramSize
      val minKept = opts.lshMinKeptGrams
      def keptCounts(df: DataFrame, vCol: String): DataFrame =
        df.select(explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"),
          col(vCol).as("__v"))
      val grams = keptCounts(leftValues, leftCol).unionByName(keptCounts(rightValues, rightCol))
        .localCheckpoint()
      val stop = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
        .where(col("__df") > opts.lshStopGramFraction * totalValues).select(col("__g"))
      // countDistinct: in a self-join the same value arrives from BOTH
      // sides of the union — a plain count would double the kept-gram
      // tally and mask degeneracy
      val degenerate = grams.join(stop, Seq("__g"), "left_anti")
        .groupBy(col("__v")).agg(countDistinct(col("__g")).as("__kept"))
        .agg(avg(when(col("__kept") < minKept, 1.0).otherwise(0.0)).as("__frac"))
        .head().getDouble(0)
      // values with NO kept grams at all are missing from the aggregation;
      // conservatively treat the gap as degenerate too
      if (degenerate > opts.lshDegenerateFraction) return None
    }
    Some(candidates(leftValues, rightValues, leftCol, rightCol, opts, reversedThreshold, totalValues))
  }

  def candidates(leftValues: DataFrame, rightValues: DataFrame,
                 leftCol: String, rightCol: String,
                 opts: MatchOptions, reversedThreshold: Double = 1.0,
                 totalValues: Long = -1L): DataFrame = {
    val n = opts.lshNgramSize
    val bands = opts.lshNumBands
    val rows = opts.lshRowsPerBand
    val k = bands * rows

    // IDF-style stop-gram removal: an n-gram present in more than
    // `lshStopGramFraction` of ALL values (both sides) carries no blocking
    // signal — e.g. a shared 13-char prefix puts every value in every
    // bucket. Signatures are minhashed over the DISCRIMINATIVE grams only;
    // a value whose grams are all stopped falls back to its full gram set.
    // Relational end-to-end: gram doc-frequencies via one aggregation, the
    // stop list applied with a join — no driver collection.
    def gramsOf(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol).as("__v"),
        explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"))

    val total =
      if (totalValues > 0) totalValues
      else leftValues.count() + rightValues.count()
    val allGrams = gramsOf(leftValues, leftCol).unionByName(gramsOf(rightValues, rightCol))
      .localCheckpoint()
    val stopGrams = allGrams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") > opts.lshStopGramFraction * total)
      .select(col("__g"))

    def keptGrams(df: DataFrame, vCol: String): DataFrame = {
      val kept = gramsOf(df, vCol)
        .join(stopGrams, Seq("__g"), "left_anti")
        .groupBy(col("__v")).agg(collect_list(col("__g")).as("__grams"))
        .withColumnRenamed("__v", vCol)
      // Fall back to the FULL gram set when too few discriminative grams
      // survive: tiny kept sets make MinHash high-variance, and asymmetric
      // kept sets (one side stops grams the other keeps) destroy recall.
      df.join(kept, Seq(vCol), "left")
        .withColumn("__grams",
          when(col("__grams").isNull || size(col("__grams")) < opts.lshMinKeptGrams,
            vectorFunctions.char_ngrams(lower(col(vCol)), n))
            .otherwise(col("__grams")))
    }

    // The lowered value rides along from here on: computed once per value,
    // reused by the jaccard gate (per-pair lower() allocations dominated the
    // gate cost) and by the downstream scorer.
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

    val lb = banded(leftValues, leftCol).localCheckpoint()
    val rb = banded(rightValues, rightCol).localCheckpoint()
    val lLow = FuzzyMatcher.lowerName(leftCol)
    val rLow = FuzzyMatcher.lowerName(rightCol)

    // Bucket capping: drop (band, key) buckets whose left x right candidate
    // count exceeds the cap — they are non-selective and would concentrate
    // quadratic work on single reducers.
    val allowed = lb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__lc"))
      .join(rb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__rc")),
        Seq("__band", "__bkey"))
      .where(col("__lc") * col("__rc") <= opts.lshMaxBucketPairs)
      .select(col("__band"), col("__bkey"))

    // Jaccard gate: a single edit changes at most `n` grams, so a pair
    // within normalized edit distance f has gram-Jaccard distance at most
    // ~2nf/(1 + nf) (long-string limit). Gate at 1.4x that bound (margin
    // for end effects / short strings), capped by the configured ceiling —
    // on selective mappings this cuts the candidate stream by orders of
    // magnitude before the expensive shuffle stages.
    val f = reversedThreshold
    val adaptiveGate = math.min(
      math.max(1.4 * (2.0 * n * f) / (1.0 + n * f), 0.25),
      opts.lshJaccardDistanceThreshold)

    // Verify on the (duplicated) join stream — the jaccard kernel is cheap
    // codegen'd compute — then rank, THEN dedup. A pair surfaces from ~2
    // bands on average, so deduping the full gated stream is a large
    // shuffle that removes little; ranking first caps the stream at
    // top-N per left value and the dedup shuffle runs on the small
    // remainder. (Duplicates briefly consume rank slots, so the effective
    // top-N is topN/duplication-factor — acceptable for an approximate
    // candidate cap; the reference's top_n is equally approximate.)
    val gated = lb.join(allowed, Seq("__band", "__bkey"))
      .join(rb, Seq("__band", "__bkey"))
      .select(col(leftCol), col(lLow), col(rightCol), col(rLow))
      .withColumn("__jaccard_dist",
        vectorFunctions.ngram_jaccard_dist(col(lLow), col(rLow), n))
      .where(col("__jaccard_dist") <= adaptiveGate)

    val w = Window.partitionBy(col(leftCol)).orderBy(col("__jaccard_dist").asc, col(rightCol).asc)
    gated
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= opts.topNForNewMatches)
      .drop("__rn", "__jaccard_dist")
      .dropDuplicates(leftCol, rightCol)
  }
}
