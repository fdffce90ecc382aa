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
  * distribution.
  *
  * The same gram statistics double as an LSH-effectiveness probe: when
  * most values keep too few discriminative grams, bucket blocking cannot
  * separate them and the LSH path costs more than the exact cross join
  * while losing recall — [[candidatesOrExactFallback]] then returns None
  * so the caller runs exact (if the cartesian permits).
  */
object AnnJoin {

  /** Candidate generation with degenerate-input detection. Returns None
    * when the corpus is LSH-hostile and the cartesian is within
    * `lshExactFallbackCartesianCap` — the caller should run the exact
    * cross join instead. Gram statistics are computed once and shared by
    * the probe and the join build. */
  def candidatesOrExactFallback(leftValues: DataFrame, rightValues: DataFrame,
                                leftCol: String, rightCol: String,
                                opts: MatchOptions, reversedThreshold: Double,
                                totalValues: Long, cartesian: Double): Option[DataFrame] = {
    val n = opts.lshNgramSize

    def gramsOf(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol).as("__v"),
        explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"))

    // IDF-style stop grams: an n-gram present in more than
    // `lshStopGramFraction` of ALL values carries no blocking signal.
    // Relational end-to-end — one aggregation, no driver collection.
    val allGrams = gramsOf(leftValues, leftCol).unionByName(gramsOf(rightValues, rightCol))
      .localCheckpoint()
    val stopGrams = allGrams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") > opts.lshStopGramFraction * totalValues)
      .select(col("__g"))
    // distinct (value -> kept-gram count); values whose grams are ALL
    // stopped do not appear here and count as degenerate below
    val keptCounts = allGrams.join(stopGrams, Seq("__g"), "left_anti")
      .groupBy(col("__v")).agg(countDistinct(col("__g")).as("__kept"))
      .localCheckpoint()

    if (cartesian <= opts.lshExactFallbackCartesianCap && opts.lshExactFallbackCartesianCap > 0) {
      val totalDistinct = allGrams.select(col("__v")).distinct().count()
      val okValues = keptCounts.where(col("__kept") >= opts.lshMinKeptGrams).count()
      // values missing from keptCounts (zero kept grams) are degenerate
      val degenerateFraction =
        if (totalDistinct == 0) 0.0 else 1.0 - okValues.toDouble / totalDistinct
      if (degenerateFraction > opts.lshDegenerateFraction) return None
    }
    Some(build(leftValues, rightValues, leftCol, rightCol, opts, reversedThreshold, stopGrams))
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
    val allGrams = gramsOf(leftValues, leftCol).unionByName(gramsOf(rightValues, rightCol))
      .localCheckpoint()
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
    // for end effects / short strings), capped by the configured ceiling.
    val f = reversedThreshold
    val adaptiveGate = math.min(
      math.max(1.4 * (2.0 * n * f) / (1.0 + n * f), 0.25),
      opts.lshJaccardDistanceThreshold)

    // Verify on the (duplicated) join stream — the jaccard kernel is cheap
    // codegen'd compute — then rank, THEN dedup: a pair surfaces from ~2
    // bands on average, so deduping the full gated stream is a large
    // shuffle that removes little; ranking first caps the stream at top-N
    // per left value and the dedup runs on the small remainder.
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
