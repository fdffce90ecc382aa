package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — each point row pairs with every
  * interval that contains its timestamp (`start <= ts <= end`, both ends
  * inclusive: SQL `BETWEEN` semantics). Click-inside-attribution-window,
  * event-inside-incident, reading-inside-maintenance-window.
  *
  * Spark-first plan: Spark has no native interval join. A raw
  * `points.join(intervals, ts.between(start, end))` with no equi-key plans
  * as BroadcastNestedLoopJoin — O(points x intervals) comparisons, the
  * classic scale cliff (with an equi-key it degrades more quietly: every
  * hot key re-scans all its intervals per point). This operator TILES the
  * time axis instead: every interval explodes to the `binWidth`-sized bins
  * it covers, every point computes its single bin, and the pair-up is an
  * ordinary equi-join on (keys..., bin) — shuffle-partitioned, AQE-skew-
  * splittable, no nested loop anywhere. The containment predicate then
  * filters exact matches inside the join's codegen stage.
  *
  * Each qualifying pair emerges EXACTLY once (a point has one bin and an
  * interval covers that bin at most once), so no dedup pass is needed.
  *
  * Cost model: interval replication is `span/binWidth + 1` rows, join
  * volume per bin is points-in-bin x intervals-overlapping-bin. Pick
  * `binWidth` near the TYPICAL interval span: much smaller explodes the
  * interval side, much larger degrades toward per-bin cross products.
  * `maxBinsPerInterval` is the runaway guard — one pathological
  * year-long interval against a 1 s bin would otherwise quietly emit 31 M
  * replicas; the guard fails the job inside the projection (no extra
  * driver-side pre-scan job, the check rides the same codegen stage).
  *
  * Reference had nothing comparable (its joins are equality/fuzzy only);
  * this is part of the large-pipeline extension surface, same family as
  * [[AsofJoin]].
  */
object RangeJoin {

  /** The tiling plans add internal working columns; caller frames must not
    * already use those names (a silent collision would corrupt the join
    * predicate). */
  private def requireNoReserved(df: DataFrame, side: String, reserved: Seq[String]): Unit = {
    val bad = df.columns.toSet.intersect(reserved.toSet)
    require(bad.isEmpty,
      s"$side columns clash with internal working names: ${bad.mkString(", ")}")
  }

  /** True floor division for possibly-negative longs — Column `/` would
    * route through double (loses exactness past 2^53, nano timestamps
    * exceed that) and `div` truncates toward zero (pre-epoch timestamps
    * would bin one slot too high). Same correction as
    * [[graft.util.PartitionedTables.epochDay]]. */
  private def floorDiv(x: Column, w: Long): Column = {
    val q = call_function("div", x, lit(w))
    when((x % w) =!= 0L && x < 0L, q - 1L).otherwise(q)
  }

  /** Pairs each `points` row with every containing `intervals` row.
    *
    * @param points      probe side; all its columns pass through
    * @param intervals   interval side; `startCol <= endCol` rows match
    *                    points in `[start, end]` (inclusive); rows with
    *                    `start > end` match nothing (empty interval)
    * @param keys        optional equi-key columns present on BOTH sides
    *                    (empty = global intervals)
    * @param tsCol       point timestamp column (integral; convert
    *                    timestamps to epoch micros/nanos first)
    * @param startCol    interval start column (same unit as `tsCol`)
    * @param endCol      interval end column (same unit as `tsCol`)
    * @param payloadCols interval columns to attach to each matched pair;
    *                    names must not clash with point columns
    * @param binWidth    time-axis tile size (same unit); near the typical
    *                    interval span is right
    * @param maxBinsPerInterval fail (inside the executors, per offending
    *                    row) if any interval would replicate into more
    *                    bins than this
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], tsCol: String,
                      startCol: String, endCol: String,
                      payloadCols: Seq[String], binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive (got $binWidth)")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive (got $maxBinsPerInterval)")
    val clash = payloadCols.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty, s"payload columns clash with point columns: $clash")
    requireNoReserved(points, "point", Seq("__bin", "__start", "__end"))
    requireNoReserved(intervals, "interval", Seq("__bin", "__start", "__end"))

    val b0 = floorDiv(col(startCol), binWidth)
    val b1 = floorDiv(col(endCol), binWidth)
    val nBins = b1 - b0 + 1L
    // Column-API error expression: interpolating raw caller column names
    // into an expr() string breaks on names needing backticks
    val binsGuarded =
      when(nBins > maxBinsPerInterval.toLong,
        raise_error(concat(
          lit("interval spans "),
          (col(endCol) - col(startCol) + lit(1L)).cast("string"),
          lit(s" time units = more than $maxBinsPerInterval bins of " +
            s"$binWidth; widen binWidth or raise maxBinsPerInterval")))
          .cast("array<long>"))
        .otherwise(sequence(b0, b1))
    val tiled = intervals
      .where(col(startCol) <= col(endCol))
      .select((keys.map(col) :+ col(startCol).as("__start") :+ col(endCol).as("__end"))
        ++ payloadCols.map(col) :+ explode(binsGuarded).as("__bin"): _*)

    points.withColumn("__bin", floorDiv(col(tsCol), binWidth))
      .join(tiled, keys :+ "__bin")
      .where(col(tsCol) >= col("__start") && col(tsCol) <= col("__end"))
      .drop("__bin", "__start", "__end")
  }

  /** Interval-overlap join: pairs every `left` interval with every `right`
    * interval it overlaps (`lStart <= rEnd && rStart <= lEnd`, inclusive).
    * Same tiling plan; here BOTH sides replicate into their covered bins,
    * so a pair can collide in every shared bin — it is kept only in the
    * FIRST bin the two intervals share (`max(lBin0, rBin0)`), a pure
    * predicate instead of a dedup shuffle. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      payloadCols: Seq[String], binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive (got $binWidth)")
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload columns clash with left columns: $clash")
    val reserved = Seq("__bin", "__lb0", "__rb0", "__rs", "__re", "__pay")
    requireNoReserved(left, "left", reserved)
    requireNoReserved(right, "right", reserved)

    def tile(df: DataFrame, s: String, e: String, cols: Seq[Column],
             binName: String, firstName: String): DataFrame = {
      val b0 = floorDiv(col(s), binWidth)
      val b1 = floorDiv(col(e), binWidth)
      val guarded =
        when(b1 - b0 + 1L > maxBinsPerInterval.toLong,
          raise_error(lit(s"interval spans more than $maxBinsPerInterval bins " +
            s"of $binWidth; widen binWidth or raise maxBinsPerInterval"))
            .cast("array<long>"))
          .otherwise(sequence(b0, b1))
      df.where(col(s) <= col(e))
        .select(cols :+ b0.as(firstName) :+ explode(guarded).as(binName): _*)
    }

    val l = tile(left, lStart, lEnd,
      keys.map(col) ++ left.columns.filterNot(keys.contains).map(col),
      "__bin", "__lb0")
    val r = tile(right, rStart, rEnd,
      keys.map(col) :+ col(rStart).as("__rs") :+ col(rEnd).as("__re")
        :+ struct(payloadCols.map(col): _*).as("__pay"),
      "__bin", "__rb0")

    l.join(r, keys :+ "__bin")
      .where(col(lStart) <= col("__re") && col("__rs") <= col(lEnd) &&
        col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .select(left.columns.map(col) ++
        payloadCols.map(p => col(s"__pay.$p").as(p)): _*)
  }
}
