package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.{CheckpointStrategy, Materialize}

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
  * Algorithm: iterative minimum-label propagation with POINTER JUMPING —
  * each round takes the min over (own label, neighbors' labels, label's
  * label). The extra hop doubles propagation distance per round, so
  * convergence needs O(log(diameter)) rounds; the default cap of 15 covers
  * any component a curation job will meet. Every step is hash joins +
  * aggregations keyed by vertex id — no driver-side union-find, no
  * collected edges; ids keep their natural type (string ids work, ordered
  * lexicographically).
  */
object NearDupCluster {

  /** (id, comp) for every vertex appearing in `pairs`; `comp` is the
    * minimum reachable id. Throws if the iteration cap is hit before
    * convergence rather than silently returning split components. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                          maxIterations: Int = 15,
                          checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val edges = Materialize(
      pairs.select(col(idA).as("src"), col(idB).as("dst"))
        .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst"))),
      checkpoint)

    var labels = Materialize(
      edges.select(col("src").as("id")).distinct().withColumn("comp", col("id")),
      checkpoint)

    var iteration = 0
    var converged = labels.isEmpty
    while (iteration < maxIterations && !converged) {
      // min over neighbors' labels
      val viaNeighbors = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("__nc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("__nc")).as("__minN"))
      // pointer jumping: the label of my label
      val viaLabel = labels.select(col("id").as("__lid"), col("comp").as("__lc"))
      val next = labels
        .join(viaNeighbors, Seq("id"), "left")
        .join(viaLabel.select(col("__lid").as("comp"), col("__lc")), Seq("comp"), "left")
        .select(col("id"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("__minN"), col("comp")),
            coalesce(col("__lc"), col("comp"))).as("comp"))
      val checkpointed = Materialize(next, checkpoint)
      converged = checkpointed.where(col("comp") =!= col("__old")).isEmpty
      labels = checkpointed.select(col("id"), col("comp"))
      iteration += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations " +
          "(raise maxIterations; diameter of the pair graph is unusually large)")
    labels
  }

  /** Deduplicated corpus: every row of `docs` except non-representative
    * members of near-dup clusters (representative = min id per component).
    * Rows not mentioned in `pairs` are untouched. */
  def dedupByPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                   maxIterations: Int = 15,
                   checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val comps = connectedComponents(pairs, maxIterations = maxIterations, checkpoint = checkpoint)
    val drop = comps.where(col("id") =!= col("comp")).select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** [[dedupByPairs]] with a QUALITY-AWARE keep rule: the representative
    * of each cluster is its highest-`score` member (ties to the smallest
    * id) instead of the smallest id — "keep the best copy", the policy
    * real corpus curation wants when near-duplicates differ in length or
    * quality. One extra per-cluster window over the clustered ids only
    * (clusters are a small fraction of the corpus); rows not mentioned in
    * `pairs` are untouched. */
  def dedupByPairsKeepBest(docs: DataFrame, pairs: DataFrame, idCol: String,
                           score: org.apache.spark.sql.Column,
                           maxIterations: Int = 15,
                           checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val comps = connectedComponents(pairs, maxIterations = maxIterations, checkpoint = checkpoint)
    val scored = comps.join(
      docs.select(col(idCol).as("id"), score.as("__score")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp")).orderBy(col("__score").desc, col("id").asc)
    val drop = scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") =!= 1).select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Label propagation across near-dup clusters — instead of DROPPING
    * duplicates, every row learns about its duplicate family: the
    * cluster id, its size, the family max of `bestCol` (annotate one
    * copy, every copy inherits — the "label once per family" workflow),
    * and the representative's (min id's) `labelCols` values. Singleton
    * rows (unmentioned in `pairs`) are their own family of one.
    *
    * Plan shape: the CC labels join back once; family stats are one
    * hash-agg on the component key; representative labels attach by an
    * id equi-join (AQE broadcasts the rep side — one row per family).
    * Emits every input row + (cluster_id, cluster_size,
    * best_<bestCol>, rep_<labelCol>...). */
  def clusterLabels(docs: DataFrame, pairs: DataFrame, idCol: String,
                    bestCol: String, labelCols: Seq[String],
                    maxIterations: Int = 15,
                    checkpoint: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val comps = connectedComponents(pairs, maxIterations = maxIterations,
      checkpoint = checkpoint)
    val withComp = docs
      .join(comps.select(col("id").as(idCol), col("comp")), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col(idCol))).drop("comp")
    val stats = withComp.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        max(col(bestCol)).as(s"best_$bestCol"),
        min(col(idCol)).as("__rep"))
    val reps = docs.select(col(idCol).as("__rep") +:
      labelCols.map(c => col(c).as(s"rep_$c")): _*)
    withComp.join(stats, Seq("cluster_id"))
      .join(reps, Seq("__rep"))
      .drop("__rep")
  }
}
