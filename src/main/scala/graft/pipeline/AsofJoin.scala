package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, attach the nearest
  * right row with the same key: the most recent at-or-before one
  * ([[backward]]) or the earliest at-or-after one ([[forward]]), with an
  * optional tolerance bound. The classic time-series operator Spark lacks
  * natively (DuckDB: `ASOF JOIN`; pandas: `merge_asof`):
  * click-to-last-impression, trade-to-quote, session-to-config-snapshot.
  *
  * Spark-first plan: NO range join and NO per-row backward scan. Both
  * sides union into one frame tagged by side, and a single window
  * `last(payload, ignoreNulls)` over `(key ORDER BY ts, side)` carries the
  * nearest right payload onto every left row. Cost is exactly one shuffle
  * on the key plus a per-partition sort — the same plan shape as any
  * windowed aggregation, so it scales like groupBy, not like an interval
  * join (a range-condition join re-scans right rows per left row and
  * explodes on hot keys). Right rows sort BEFORE left rows at equal
  * timestamps in both directions, giving the inclusive semantics of
  * `ASOF JOIN` (`>=` / `<=`).
  *
  * Requirement: at most one right row per (keys, rightTs) — the caller
  * deduplicates (e.g. keep the max id), which is also what makes the
  * operator deterministic in ANY engine; with duplicates, "the" nearest
  * row is ill-defined. A left row with no qualifying right row keeps null
  * payload columns (left-join semantics).
  */
object AsofJoin {

  /** Most recent right row at or before each left row's timestamp.
    *
    * @param left        probe side; all its columns pass through
    * @param right       reference side; must be unique per (keys, rightTs)
    * @param keys        equi-join key columns (present on both sides)
    * @param leftTs      left timestamp column (any orderable type)
    * @param rightTs     right timestamp column (same type as `leftTs`)
    * @param payloadCols right columns to attach (each becomes nullable);
    *                    names must not clash with left's columns
    * @param tolerance   optional max distance: a match further than this
    *                    from the left timestamp (|leftTs - rightTs| >
    *                    tolerance) is discarded (row kept, payload null).
    *                    The timestamp type must support `-` (numeric types
    *                    here; convert timestamps to epoch micros first).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               tolerance: Option[Column] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payloadCols, tolerance,
      descending = false)

  /** Earliest right row at or after each left row's timestamp — the same
    * single-shuffle window plan scanning time descending. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payloadCols: Seq[String],
              tolerance: Option[Column] = None): DataFrame =
    join(left, right, keys, leftTs, rightTs, payloadCols, tolerance,
      descending = true)

  /** Nearest right row in EITHER direction (ties to the at-or-before
    * side) — `merge_asof(direction='nearest')`. Same single shuffle; the
    * ascending and descending scans are two sorts over one exchange. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payloadCols: Seq[String],
              tolerance: Option[Column] = None): DataFrame = {
    val (unioned, leftCols) = buildUnion(left, right, keys, leftTs, rightTs, payloadCols)
    val wB = windowOver(keys, descending = false)
    val wF = windowOver(keys, descending = true)
    val back = last(col(pay), ignoreNulls = true).over(wB)
    val fwd = last(col(pay), ignoreNulls = true).over(wF)
    val bDist = col(ts) - col(s"$payB.$rts")
    val fDist = col(s"$payF.$rts") - col(ts)
    val chosen =
      when(col(payB).isNull, col(payF))
        .when(col(payF).isNull, col(payB))
        .when(bDist <= fDist, col(payB))
        .otherwise(col(payF))
    val matched = unioned
      .withColumn(payB, back).withColumn(payF, fwd)
      .where(col(side) === 1)
      .withColumn(pay, chosen)
    finish(matched, leftCols, payloadCols, tolerance,
      dist = abs(col(ts) - col(s"$pay.$rts")))
  }

  private val ts = "__asof_ts"; private val side = "__asof_side"
  private val pay = "__asof_pay"; private val lpay = "__asof_left"
  private val rts = "__asof_rts"
  private val payB = "__asof_pay_b"; private val payF = "__asof_pay_f"

  /** Tag + union the two sides: one struct per side so a single window
    * expression carries the whole payload (N last() calls would
    * sort-and-scan the frame N times); the matched right timestamp rides
    * along for the tolerance check. */
  private def buildUnion(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTs: String, rightTs: String,
                         payloadCols: Seq[String]): (DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload columns clash with left columns: $clash")
    val leftCols = left.columns.toSeq
    val r0 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as(ts), lit(0).as(side),
        struct(col(rightTs).as(rts) +: payloadCols.map(col): _*).as(pay)): _*)
    val l0 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as(ts), lit(1).as(side),
        struct(leftCols.map(col): _*).as(lpay)): _*)
    (r0.withColumn(lpay, lit(null).cast(l0.schema(lpay).dataType))
       .unionByName(l0.withColumn(pay, lit(null).cast(r0.schema(pay).dataType))),
     leftCols)
  }

  private def windowOver(keys: Seq[String], descending: Boolean) = {
    val order = if (descending) col(ts).desc else col(ts).asc
    Window.partitionBy(keys.map(col): _*)
      .orderBy(order, col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  private def finish(matched: DataFrame, leftCols: Seq[String],
                     payloadCols: Seq[String], tolerance: Option[Column],
                     dist: Column): DataFrame = {
    val within = tolerance match {
      case Some(tol) => matched.withColumn(pay, when(dist <= tol, col(pay)))
      case None => matched
    }
    within.select(leftCols.map(c => col(s"$lpay.$c").as(c)) ++
      payloadCols.map(c => col(s"$pay.$c").as(c)): _*)
  }

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payloadCols: Seq[String],
                   tolerance: Option[Column], descending: Boolean): DataFrame = {
    val (unioned, leftCols) = buildUnion(left, right, keys, leftTs, rightTs, payloadCols)
    val w = windowOver(keys, descending)
    val matched = unioned
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .where(col(side) === 1)
    val dist =
      if (descending) col(s"$pay.$rts") - col(ts) else col(ts) - col(s"$pay.$rts")
    finish(matched, leftCols, payloadCols, tolerance, dist)
  }
}
