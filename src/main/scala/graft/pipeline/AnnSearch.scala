package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.spread

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, mirroring the fuzzy matcher's exact/LSH split:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The (small) query set is broadcast against the corpus so the corpus
  *    never shuffles; ranking is a per-query-key window.
  *  - [[lshTopK]]: sign-LSH bucketed candidates re-ranked exactly — the
  *    scale path when the query set is large. Probes all buckets sharing
  *    any band with the query, so recall degrades gracefully with band
  *    count instead of falling off a cliff.
  */
object AnnSearch {

  /** Exact top-k neighbors per query vector by cosine similarity.
    * Deterministic: ties broken by corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    // the corpus side drives the cross join's parallelism
    val c = spread(corpus).select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Dedup.cosineSimilarity(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** Sign-LSH bucketed top-k: candidates = corpus vectors sharing at least
    * one of `bands` signature bands with the query; exact cosine re-rank.
    * Bounded work per query even against a 100 TB corpus. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              vecCol: String, idCol: String, k: Int,
              dim: Int, planes: Int = 16, bands: Int = 4, seed: Long = 42L,
              maxBucketPairs: Long = 4_000_000L): DataFrame = {
    val hp = Dedup.hyperplanes(dim, planes, seed)
    def bits(v: org.apache.spark.sql.Column) =
      graft.fuzzy.vectorFunctions.sign_lsh_bits(v, hp.flatten, dim)

    val perBand = planes / bands
    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(id), col(vec), bits(col(vec)).as("__bits"))
        .select(col(id), col(vec),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            c => call_function("shiftright", col("__bits"), c.cast("int") * perBand).bitwiseAND(lit((1L << perBand) - 1)))))
        .withColumnRenamed("pos", "__band")
        .withColumnRenamed("col", "__bkey")

    val qb = banded(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")), "query_id", "__qv")
    val cb = banded(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv")), "corpus_id", "__cv")

    // skew guard: drop degenerate buckets (same rationale as the fuzzy
    // LSH join - an uncapped bucket join concentrates quadratic work on
    // single reducers)
    val allowed = qb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__qc"))
      .join(cb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__cc")),
        Seq("__band", "__bkey"))
      .where(col("__qc") * col("__cc") <= maxBucketPairs)
      .select(col("__band"), col("__bkey"))

    val cand = qb.join(allowed, Seq("__band", "__bkey")).join(cb, Seq("__band", "__bkey"))
      .where(col("query_id") =!= col("corpus_id"))
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", Dedup.cosineSimilarity(col("__qv"), col("__cv")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rank"))
  }
}
