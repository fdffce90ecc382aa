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
  /** Symmetric per-vector int8 quantization: adds `qCol` (array<tinyint>,
    * `floor(v_i * 127 / max|v|)`) and `scaleCol` (the dequantization factor
    * `max|v| / 127`, so `v_i ~= q_i * scale` within one quantization step).
    *
    * This is the storage/shuffle compression step for corpus-scale vector
    * search: 4x smaller than float32 at a bounded cosine error (see
    * [[AnnSearch.int8TopK]] for searching the quantized corpus directly).
    * A narrow codegen projection — no shuffle, no action; at 100 TB the
    * quantized corpus is what you persist and the float source is what
    * you archive. */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   qCol: String = "qvec", scaleCol: String = "scale"): DataFrame =
    df.withColumn(qCol, graft.fuzzy.vectorFunctions.i8vec_quantize(col(vecCol)))
      .withColumn(scaleCol,
        coalesce(array_max(transform(col(vecCol), x => abs(x.cast("double")))), lit(0.0))
          / lit(127.0))

  /** Johnson-Lindenstrauss random projection: adds `outCol` — the vector
    * projected onto `outDim` seeded gaussian directions (scaled
    * `1/sqrt(outDim)`), as floats.
    *
    * The dimensionality-reduction scale path for vector search: pairwise
    * cosines are approximately preserved (JL), so search runs against an
    * `outDim/dim`-sized corpus and only the surviving candidates re-rank
    * against the full-dimension vectors (see RandomProjectSpec for the
    * composition). The plane matrix is a driver-held `outDim x dim` array
    * shipped as a literal — no shuffle, no fit step, reproducible from the
    * seed alone. One narrow codegen projection. */
  def randomProject(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
                    outCol: String = "rpvec", seed: Long = 42L): DataFrame = {
    require(outDim >= 1 && outDim <= dim, s"outDim must be in [1, dim] (got $outDim, dim=$dim)")
    df.withColumn(outCol, graft.fuzzy.vectorFunctions.random_project(
      col(vecCol), Dedup.hyperplanes(dim, outDim, seed).flatten, dim, outDim))
  }

  /** Oracle-reproducible [[randomProject]] variant: `floor(v * 4096)`
    * quantization x md5-derived INTEGER planes — every component is an
    * exact BIGINT sum a SQL engine recomputes bit-for-bit (same scheme as
    * the sign-LSH oracles). The seeded gaussian [[randomProject]] stays the
    * production path. */
  def randomProjectMd5Int(df: DataFrame, vecCol: String, dim: Int, outDim: Int,
                          outCol: String = "rpq"): DataFrame = {
    require(outDim >= 1 && outDim <= dim, s"outDim must be in [1, dim] (got $outDim, dim=$dim)")
    df.withColumn(outCol, graft.fuzzy.vectorFunctions.random_project_int(
      col(vecCol), Dedup.hyperplanesMd5Int(dim, outDim), dim, outDim))
  }

  /** Data-aware PCA directions — the fitted complement of
    * [[randomProject]]'s data-oblivious JL planes: fit once per corpus
    * version (MLlib `PCA` over the embedding column, the same
    * fit-on-MLlib / apply-in-engine seam as
    * [[graft.pipeline.QualityModel]]), ship the `outDim x dim`
    * principal-direction matrix as a driver-held flat array, and project
    * with the SAME codegen kernel JL uses ([[projectWith]]). For search,
    * compose exactly like RandomProjectSpec's JL pipeline: candidate
    * search in `outDim`, exact re-rank in full dimension — PCA directions
    * capture more variance per kept dimension than random ones, so recall
    * at fixed `outDim` is at least JL's on real (anisotropic) corpora.
    * Fit cost is one corpus pass (Gramian aggregate) + a `dim x dim`
    * driver eigendecomposition; sample the frame first if even one pass
    * is too dear. */
  def pcaFit(df: DataFrame, vecCol: String, dim: Int, outDim: Int): Array[Double] = {
    require(outDim >= 1 && outDim <= dim, s"outDim must be in [1, dim] (got $outDim, dim=$dim)")
    val vecs = df.select(org.apache.spark.ml.functions.array_to_vector(
      col(vecCol).cast("array<double>")).as("__v"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(outDim).setInputCol("__v").setOutputCol("__p").fit(vecs)
    val pc = model.pc // dim x outDim, column-major; column j = direction j
    require(pc.numRows == dim,
      s"PCA saw ${pc.numRows}-dim vectors, expected $dim")
    (0 until outDim).flatMap(j => pc.values.slice(j * dim, (j + 1) * dim)).toArray
  }

  /** Project onto ANY flat row-major `outDim x dim` direction matrix —
    * [[pcaFit]] output, stored planes loaded from parquet, or
    * [[Dedup.hyperplanes]]. The one codegen projection kernel shared
    * with [[randomProject]] (which bakes in seeded gaussian planes). */
  def projectWith(df: DataFrame, vecCol: String, planes: Array[Double],
                  dim: Int, outDim: Int, outCol: String = "pvec"): DataFrame = {
    require(planes.length == dim * outDim,
      s"planes length ${planes.length} != dim*outDim = ${dim * outDim}")
    df.withColumn(outCol, graft.fuzzy.vectorFunctions.random_project(
      col(vecCol), planes, dim, outDim))
  }

  /** Snap fitted directions onto the 1e-6 integer grid — the same
    * export seam [[ModelExport.quantize]] uses for the learned
    * classifiers: quantization error <= 5e-7 per component (far below
    * fit noise), in exchange for a projection any engine replays
    * bit-for-bit as BIGINT arithmetic. Each direction's sign is
    * canonicalized first (largest-|component| positive) because an
    * eigendecomposition's sign is arbitrary — re-fitting on another
    * host may flip it, and pinned constants must not depend on which
    * flip this fit happened to return. */
  def quantizeDirections(planes: Array[Double], dim: Int, outDim: Int,
                         gridScale: Long = 1000000L): Array[Long] = {
    require(planes.length == dim * outDim,
      s"planes length ${planes.length} != dim*outDim = ${dim * outDim}")
    val out = new Array[Long](planes.length)
    var p = 0
    while (p < outDim) {
      val off = p * dim
      var big = 0; var d = 1
      while (d < dim) {
        if (math.abs(planes(off + d)) > math.abs(planes(off + big))) big = d
        d += 1
      }
      val sign = if (planes(off + big) < 0) -1.0 else 1.0
      d = 0
      while (d < dim) {
        out(off + d) = math.round(planes(off + d) * sign * gridScale)
        d += 1
      }
      p += 1
    }
    out
  }

  /** Exact-integer projection onto micro-grid directions (the apply
    * half of the PCA export): component p = Σ_d floor(v_d·4096)·P[p,d],
    * a BIGINT sum both engines compute identically — the [[randomProjectMd5Int]]
    * arithmetic with FITTED directions instead of md5 planes. The
    * production float path stays [[projectWith]]; this is the
    * oracle-reproducible twin (see [[projectQuantizedOracleSql]]). */
  def projectQuantized(df: DataFrame, vecCol: String, planesMicro: Array[Long],
                       dim: Int, outDim: Int, outCol: String = "pvecq"): DataFrame = {
    require(planesMicro.length == dim * outDim,
      s"planes length ${planesMicro.length} != dim*outDim = ${dim * outDim}")
    df.withColumn(outCol, graft.fuzzy.vectorFunctions.random_project_int(
      col(vecCol), planesMicro, dim, outDim))
  }

  /** DuckDB replay of [[projectQuantized]] — the direction matrix rides
    * the SQL as literal rows (single-sourced from the same pinned
    * constants the Spark plan consumes, so impl and oracle cannot
    * drift), the vector quantizes to floor(v·4096), and every output
    * component is one exact BIGINT list_sum. Output shape: one row per
    * (id, 1-based output dim, component). */
  def projectQuantizedOracleSql(table: String, idCol: String, vecCol: String,
                                planesMicro: Array[Long], dim: Int, outDim: Int,
                                outDimName: String = "pc_dim"): String = {
    require(planesMicro.length == dim * outDim,
      s"planes length ${planesMicro.length} != dim*outDim = ${dim * outDim}")
    val rows = (0 until outDim).map { p =>
      s"(${p.toLong}, [${planesMicro.slice(p * dim, (p + 1) * dim).mkString("::BIGINT, ")}::BIGINT])"
    }.mkString(",\n                ")
    s"""WITH pv(p, pc) AS (VALUES
                $rows),
         qn AS (SELECT $idCol,
                  list_transform(range(1, ${dim + 1}), i -> CAST(floor($vecCol[i]::DOUBLE * 4096) AS BIGINT)) AS qv
                FROM $table)
         SELECT $idCol, CAST(p + 1 AS BIGINT) AS $outDimName,
                CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> qv[i] * pc[i])) AS BIGINT) AS component
         FROM qn CROSS JOIN pv"""
  }

  /** Embedding-space drift between two snapshots: per group, the L2
    * distance its [[centroids]] moved — the monitoring twin of
    * [[graft.pipeline.Profile.drift]] for the vector side ("did
    * re-embedding / re-sampling move the class prototypes"). Exact and
    * engine-mirrorable end to end: both centroids ride the quantized
    * integer sums, the per-dimension delta re-quantizes to the same grid,
    * and the squared sum is exact LONG arithmetic — no float summation
    * order anywhere (a naive sqrt(sum((a-b)^2)) over double deltas is
    * partition-order dependent). Groups present in only one snapshot are
    * dropped (inner join) — [[graft.pipeline.Profile.drift]] on the group
    * column is the tool for appear/disappear, and the emitted `n_dims`
    * (dimensions actually compared) is the honesty check for a
    * DIMENSIONALITY mismatch between snapshots: re-embedding at a
    * different dim makes the join silently compare only the overlap, so
    * gate on `n_dims == expected dim` before trusting `l2_move`.
    * Overflow headroom: |delta| × quantScale must stay under
    * sqrt(2⁶³ / dim) per dimension (~3.8e8 at dim 64 — a long sum of
    * dim squared deltas, not one square), far above any normalized
    * embedding at the 1e6 default. */
  def centroidDrift(oldDf: DataFrame, newDf: DataFrame, groupCols: Seq[String],
                    vecCol: String, quantScale: Double = 1e6): DataFrame =
    driftFromCentroids(centroids(oldDf, groupCols, vecCol, quantScale),
      centroids(newDf, groupCols, vecCol, quantScale), groupCols, quantScale)

  /** The drift tail of [[centroidDrift]] over PRECOMPUTED [[centroids]]
    * frames — for callers that maintain the centroid aggregates
    * incrementally instead of owning both raw snapshots (the streaming
    * monitor [[graft.streaming.AnnStream.centroidDriftWriter]] folds
    * per-batch quantized sums and re-derives the new-side frame each
    * trigger). Both inputs must be [[centroids]]-shaped:
    * (groupCols..., dim, n_vectors, centroid). */
  def driftFromCentroids(oldCents: DataFrame, newCents: DataFrame,
                         groupCols: Seq[String],
                         quantScale: Double = 1e6): DataFrame = {
    val key = groupCols :+ "dim"
    val o = oldCents
      .withColumnRenamed("centroid", "__co").withColumnRenamed("n_vectors", "n_old")
    val n = newCents
      .withColumnRenamed("centroid", "__cn").withColumnRenamed("n_vectors", "n_new")
    o.join(n, key)
      .withColumn("__dq", round((col("__cn") - col("__co")) * quantScale).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("n_old")).as("n_old"), max(col("n_new")).as("n_new"),
        count(lit(1)).as("n_dims"),
        sum(col("__dq") * col("__dq")).as("__ss"))
      .select(groupCols.map(col) ++ Seq(col("n_old"), col("n_new"), col("n_dims"),
        round(sqrt(col("__ss").cast("double")) / quantScale, 6).as("l2_move")): _*)
  }

  def centroids(df: DataFrame, groupCols: Seq[String], vecCol: String,
                quantScale: Double = 1e6): DataFrame =
    centroidsFromAggregates(centroidAggregates(df, groupCols, vecCol, quantScale),
      quantScale)

  /** The mergeable half of [[centroids]]: (groupCols..., dim, n_vectors,
    * __sum) with `__sum` the EXACT quantized-long component sum —
    * aggregates from disjoint slices merge by plain addition into the
    * whole's aggregate (no float order anywhere), which is what the
    * streaming drift monitor folds per micro-batch. */
  private[graft] def centroidAggregates(df: DataFrame, groupCols: Seq[String],
                                        vecCol: String,
                                        quantScale: Double = 1e6): DataFrame = {
    require(groupCols.nonEmpty, "centroids needs at least one group column")
    val g = groupCols.map(col)
    df.select(g :+ posexplode(col(vecCol)): _*)
      .select(g ++ Seq(
        (col("pos") + 1).cast("long").as("dim"),
        round(col("col").cast("double") * quantScale).cast("long").as("__q")): _*)
      .groupBy(g :+ col("dim"): _*)
      .agg(count(lit(1)).as("n_vectors"), sum(col("__q")).as("__sum"))
  }

  /** Finish [[centroidAggregates]] into the [[centroids]] shape. */
  private[graft] def centroidsFromAggregates(agg: DataFrame,
                                             quantScale: Double = 1e6): DataFrame =
    agg.withColumn("centroid", col("__sum") / lit(quantScale) / col("n_vectors"))
      .drop("__sum")
}
