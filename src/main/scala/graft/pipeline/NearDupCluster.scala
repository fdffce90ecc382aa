package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING: from a pair list (id_a, id_b) to connected
  * components, and from components to a deduplicated corpus (keep the
  * minimum id per cluster).
  *
  * A real dedup pipeline needs this step after any pair generator
  * ([[Dedup.ngramJaccardPairs]], [[Dedup.minhashLshPairs]],
  * [[Dedup.simhashPairs]], [[Dedup.embeddingCosinePairs]]): near-dup is not
  * transitive, but dedup policy usually treats it as such (MinHash dedup in
  * large corpus curation drops everything but one representative per
  * component).
  *
  * Algorithm: iterative minimum-label propagation over the edge list —
  * the standard large-graph connected-components-on-MapReduce approach.
  * Each iteration is two hash joins + an aggregation, all shuffles keyed by
  * vertex id; iterations needed = O(component diameter), with a
  * configurable cap (near-dup clusters are dense, so diameters are small
  * in practice). No driver-side union-find, no collected edges — scales
  * to billions of edges.
  */
object NearDupCluster {

  /** (id, component) for every vertex appearing in `pairs`; the component
    * label is the minimum id reachable within `maxIterations` hops. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                          maxIterations: Int = 10): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .unionByName(pairs.select(col(idB).cast("long").as("src"), col(idA).cast("long").as("dst")))
      .localCheckpoint()

    // labels start as each vertex's own id
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()

    var iteration = 0
    var converged = false
    while (iteration < maxIterations && !converged) {
      // candidate label for each vertex: min of its own and its neighbors'
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("comp", "__nc"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("__nc")).as("__minN"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .withColumn("comp", least(col("comp"), coalesce(col("__minN"), col("comp"))))
        .select(col("id"), col("comp"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("comp", "__old"), Seq("id"))
        .where(col("comp") =!= col("__old")).limit(1).count()
      labels = next
      converged = changed == 0
      iteration += 1
    }
    labels
  }

  /** Deduplicated corpus: every row of `docs` except non-representative
    * members of near-dup clusters (representative = min id per component).
    * Rows not mentioned in `pairs` are untouched. */
  def dedupByPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                   maxIterations: Int = 10): DataFrame = {
    val comps = connectedComponents(pairs, maxIterations = maxIterations)
    val drop = comps.where(col("id") =!= col("comp"))
      .select(col("id").cast("long").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
