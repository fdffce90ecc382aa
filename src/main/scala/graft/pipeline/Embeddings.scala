package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column analytics for corpus curation: per-group centroids
  * (class prototypes, language/source cartography, drift monitoring).
  */
object Embeddings {

  /** Element-wise centroid of `vecCol` per group: one row per
    * (groupCols, dim) with the mean component and the group size.
    *
    * Components are quantized to `1/quantScale` resolution and summed as
    * LONGS, so the aggregation is EXACT integer arithmetic — the result
    * is bit-identical regardless of partitioning or combine order (a
    * float sum is run-order-dependent, which at cluster scale means a
    * non-reproducible centroid) and mirrorable by any engine. One
    * narrow posexplode projection + one hash-agg shuffle on
    * (group, dim); map-side partial aggregation applies.
    *
    * Overflow headroom: |component| * quantScale * groupSize must stay
    * under 2^63 — at the default 1e6 scale that allows ~9e12 unit-norm
    * vectors per group. */
  def centroids(df: DataFrame, groupCols: Seq[String], vecCol: String,
                quantScale: Double = 1e6): DataFrame = {
    require(groupCols.nonEmpty, "centroids needs at least one group column")
    val g = groupCols.map(col)
    df.select(g :+ posexplode(col(vecCol)): _*)
      .select(g ++ Seq(
        (col("pos") + 1).cast("long").as("dim"),
        round(col("col").cast("double") * quantScale).cast("long").as("__q")): _*)
      .groupBy(g :+ col("dim"): _*)
      .agg(count(lit(1)).as("n_vectors"), sum(col("__q")).as("__sum"))
      .withColumn("centroid", col("__sum") / lit(quantScale) / col("n_vectors"))
      .drop("__sum")
  }
}
