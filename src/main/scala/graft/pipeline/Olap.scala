package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchical / wide-format OLAP aggregation over the pipeline tables:
  * rollup profiles (per-group + subtotal + grand-total in ONE pass) and
  * explicit-value pivots. Thin, deliberately declarative wrappers: Spark
  * plans a rollup as a single Expand + hash-aggregate (one shuffle for
  * every level at once, map-side combine applies), which at 100 TB beats
  * a union of per-level aggregates by the number of levels.
  */
object Olap {

  /** Count + sum profile at every rollup level of `groupCols` (leaf rows,
    * each prefix subtotal, grand total). NULL group cells from the rollup
    * are relabeled `totalLabel` so downstream consumers (and hash-based
    * comparisons) never see NULLs; `level` is the grouping_id bitmask
    * (0 = leaf, bit set = that column rolled up, first column = MSB) which
    * also disambiguates a genuine `totalLabel` group value from a
    * subtotal row.
    *
    * Empty-input caveat: Spark's rollup emits NO rows for an empty frame
    * (ANSI engines emit one grand-total row with count 0) — don't rely on
    * the total row existing when a partition-day is empty. */
  def rollupProfile(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    totalLabel: String = "ALL"): DataFrame = {
    require(groupCols.nonEmpty, "rollupProfile needs at least one group column")
    // relabel on the GROUPING BIT, not on NULL-ness: a genuine NULL group
    // value in the data must stay NULL on its leaf row (a coalesce would
    // conflate it with the subtotal rows and diverge from ANSI GROUPING
    // semantics / the DuckDB oracle)
    def cell(n: String, i: Int) = {
      val bit = shiftright(col("level"), groupCols.length - 1 - i).bitwiseAND(lit(1L))
      when(bit === 1L, lit(totalLabel)).otherwise(col(n)).as(n)
    }
    df.rollup(groupCols.map(col): _*)
      .agg(grouping_id().cast("long").as("level"),
        count(lit(1)).as("n_rows"),
        sum(col(valueCol)).cast("long").as("sum_value"))
      .select(groupCols.zipWithIndex.map { case (n, i) => cell(n, i) } ++
        Seq(col("level"), col("n_rows"), col("sum_value")): _*)
  }

  /** [[rollupProfile]] over EVERY subset of `groupCols` (the full cube:
    * 2^k grouping sets), same one-Expand-one-shuffle plan — Spark's
    * Expand multiplies the scan by 2^k before the map-side combine, so
    * this is for small k (≤ ~4; the scan cost is 2^k× rollup's k+1×).
    * Same NULL-vs-subtotal relabeling and `level` bitmask contract. */
  def cubeProfile(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  totalLabel: String = "ALL"): DataFrame = {
    require(groupCols.nonEmpty, "cubeProfile needs at least one group column")
    def cell(n: String, i: Int) = {
      val bit = shiftright(col("level"), groupCols.length - 1 - i).bitwiseAND(lit(1L))
      when(bit === 1L, lit(totalLabel)).otherwise(col(n)).as(n)
    }
    df.cube(groupCols.map(col): _*)
      .agg(grouping_id().cast("long").as("level"),
        count(lit(1)).as("n_rows"),
        sum(col(valueCol)).cast("long").as("sum_value"))
      .select(groupCols.zipWithIndex.map { case (n, i) => cell(n, i) } ++
        Seq(col("level"), col("n_rows"), col("sum_value")): _*)
  }

  /** Per-key occurrence counts of `catCol`, pivoted wide with an EXPLICIT
    * category list, planned as conditional aggregation (`count(when(cat =
    * v)))` per category) rather than Spark's `pivot`: the built-in plans
    * TWO shuffles (a (key, cat) pre-aggregate, then a pivotfirst
    * re-aggregate) — and without an explicit list it additionally runs an
    * eager corpus-wide distinct job to discover categories. This shape is
    * ONE hash-agg shuffle with map-side combine (spec-asserted), with a
    * fixed output schema regardless of which categories appear in the
    * data. Empty cells are 0, not NULL. */
  def pivotCounts(df: DataFrame, keyCol: String, catCol: String,
                  values: Seq[String], prefix: String = "n_"): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs an explicit category list")
    val aggs = values.map(v => count(when(col(catCol) === v, 1)).as(prefix + v))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
