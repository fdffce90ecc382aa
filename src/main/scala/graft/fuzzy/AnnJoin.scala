package graft.fuzzy

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate candidate generation for huge cartesian spaces.
  *
  * The reference shells out to polars-simed (`ps.join_sim`,
  * matcher.py:99-161): collect both sides to the driver, chunk the left side
  * 10k rows at a time, and take the top-N most similar right values per left
  * value. That design is single-node by construction. The Spark-native
  * re-expression is MinHash-LSH over character n-gram sets:
  *
  *   value-level frame -> lowercase char n-grams -> binary HashingTF ->
  *   MinHashLSH.approxSimilarityJoin (bucketed, distributed, no driver
  *   collect) -> per-left-value top-N by true Jaccard distance.
  *
  * Everything stays a DataFrame: at 1000 executors the LSH join shuffles by
  * hash bucket instead of building any cartesian product, and the top-N
  * window is partitioned by left value (no global sort).
  */
object AnnJoin {

  /** Char-ngram array column; strings shorter than n collapse to one gram so
    * MinHash never sees an empty set. */
  private def ngrams(c: org.apache.spark.sql.Column, n: Int) =
    when(length(c) < n, array(c))
      .otherwise(transform(sequence(lit(1), length(c) - lit(n - 1)), i => c.substr(i, lit(n))))

  /** Approximate candidate pairs between two distinct-value frames.
    *
    * @param leftValues  distinct left values (single column `leftCol`)
    * @param rightValues distinct right values (single column `rightCol`)
    * @return (leftCol, rightCol) pairs restricted to approximate neighbors —
    *         same schema as an exact cross join of the inputs.
    */
  def candidates(leftValues: DataFrame, rightValues: DataFrame,
                 leftCol: String, rightCol: String,
                 opts: MatchOptions): DataFrame = {
    val n = opts.lshNgramSize

    val leftGrams = leftValues.withColumn("__grams", ngrams(lower(col(leftCol)), n))
    val rightGrams = rightValues.withColumn("__grams", ngrams(lower(col(rightCol)), n))

    val tf = new HashingTF()
      .setInputCol("__grams").setOutputCol("__features")
      .setNumFeatures(opts.lshFeatureDim).setBinary(true)
    val leftFeat = tf.transform(leftGrams).drop("__grams")
    val rightFeat = tf.transform(rightGrams).drop("__grams")

    val lsh = new MinHashLSH()
      .setInputCol("__features").setOutputCol("__hashes")
      .setNumHashTables(opts.lshNumHashTables)
      .setSeed(42L)
    val model = lsh.fit(leftFeat)

    val joined = model
      .approxSimilarityJoin(leftFeat, rightFeat, opts.lshJaccardDistanceThreshold, "__jaccard_dist")
      .select(
        col(s"datasetA.$leftCol").as(leftCol),
        col(s"datasetB.$rightCol").as(rightCol),
        col("__jaccard_dist"))
      // a pair can surface from several hash buckets — dedup before ranking
      .dropDuplicates(leftCol, rightCol)

    // Reference keeps only top_n approximate neighbors per left item
    // (matcher.py:106,150). Window partitioned by left value — distributed,
    // no global ordering.
    val w = Window.partitionBy(col(leftCol)).orderBy(col("__jaccard_dist").asc, col(rightCol).asc)
    joined
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= opts.topNForNewMatches)
      .drop("__rn", "__jaccard_dist")
  }
}
