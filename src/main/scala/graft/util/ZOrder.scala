package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for two-dimensional data skipping.
  *
  * A single-column sort gives parquet row-group min/max stats that prune
  * predicates on that column only; writing in z-value order clusters each
  * output file into a compact rectangle of BOTH key spaces, so selective
  * predicates on EITHER column skip most files (the layout trick behind
  * Delta/Iceberg Z-ORDER, restated on plain parquet).
  *
  * The two keys are first normalized to a 16-bit grid between their
  * observed min/max — interleaving RAW keys lets the wider-ranged column's
  * high bits dominate the curve and degenerates to a plain sort on it
  * (spec-demonstrated). Normalization costs one tiny min/max aggregate.
  */
object ZOrder {

  /** Morton z-value of two non-negative 31-bit keys (codegen'd kernel).
    * RAW interleave: bits above 31 are silently ignored, so 64-bit ids
    * (snowflake-style) MUST go through [[gridKey]] (or any reduction to
    * 31 bits) first or distinct keys will share z-values.
    * [[writeClustered]] does this normalization itself. */
  def zValue(a: Column, b: Column): Column =
    graft.fuzzy.vectorFunctions.z_value(a, b)

  /** `x` scaled to the `bits`-bit grid between known bounds (floor of the
    * proportional position; constant endpoints collapse to 0). */
  def gridKey(x: Column, minV: Long, maxV: Long, bits: Int = 16): Column =
    if (maxV <= minV) lit(0L)
    else floor((x - lit(minV)).cast("double") * lit(((1L << bits) - 1).toDouble)
      / lit((maxV - minV).toDouble)).cast("long")

  /** Writes `df` as parquet at `path`, z-order-clustered on
    * (`colA`, `colB`) into `numFiles` range partitions, each sorted by the
    * z-value. Returns the (minA, maxA, minB, maxB) bounds used for the
    * grid, which a reader can reuse to compute the probe's z-range. */
  def writeClustered(df: DataFrame, path: String, colA: String, colB: String,
                     numFiles: Int): (Long, Long, Long, Long) = {
    val b = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long"),
      count(lit(1)), count(col(colA)), count(col(colB))).head()
    val (nRows, nA, nB) = (b.getLong(4), b.getLong(5), b.getLong(6))
    if (nRows == 0L) {
      // an empty partition-day must write an empty table, not abort
      df.write.mode("overwrite").parquet(path)
      return (0L, 0L, 0L, 0L)
    }
    // min/max SKIP nulls, so partially-null keys would otherwise slip
    // through with a NULL __z and silently land in a nulls-first range
    // partition; count(col) vs count(*) catches every null, not just the
    // all-null column case
    require(nA == nRows && nB == nRows,
      s"z-order keys must be non-null ($colA: ${nRows - nA} nulls, $colB: ${nRows - nB} nulls)")
    val (minA, maxA, minB, maxB) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    require(minA >= 0 && minB >= 0, s"z-order keys must be non-negative")
    df.withColumn("__z", zValue(gridKey(col(colA), minA, maxA),
        gridKey(col(colB), minB, maxB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    (minA, maxA, minB, maxB)
  }
}
