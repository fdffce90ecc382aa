package graft.fuzzy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{approx_count_distinct, col, count, lit}
import org.slf4j.LoggerFactory

/** Driver-side planning statistics + heuristics.
  *
  * Re-expresses the reference's `pre_process.py` pipeline on Spark:
  * approx-distinct stats come from one `approx_count_distinct` scan per side
  * (HLL, same sketch family the reference uses via `approx_n_unique`,
  * pre_process.py:12-28), the uniqueness formula and the dedup heuristic use
  * the reference's exact constants (pre_process.py:45,149).
  */
object PreProcess {

  private val log = LoggerFactory.getLogger(getClass)

  final case class Plan(left: DataFrame, right: DataFrame, maps: Seq[FuzzyMapping],
                        leftLen: Long, rightLen: Long)

  /** Log the processing order of the mappings with their uniqueness scores
    * (`report_on_order_of_fuzzy_maps`, pre_process.py:174-197): the most
    * selective mapping runs first, and this makes that decision visible. */
  def reportOnOrder(maps: Seq[FuzzyMapping]): Unit = {
    log.info("Fuzzy mappings sorted by uniqueness")
    maps.zipWithIndex.foreach { case (m, i) =>
      log.info(s"$i. Fuzzy mapping: ${m.leftCol} -> ${m.rightCol} Uniqueness: ${m.percUnique}")
    }
  }

  /** One scan per side computing approx distinct for every requested column. */
  def approxUniqueness(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    if (cols.isEmpty) return Map.empty
    val distinctCols = cols.distinct
    val row = df.select(distinctCols.map(c => approx_count_distinct(col(c)).as(c)): _*).head()
    distinctCols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** Fused planning-stats scan: exact row count + approx distinct per
    * mapping column in ONE aggregate job (the count rides the HLL scan
    * instead of a second pass over the side — guide §1.2: don't pay two
    * passes for values one pass produces). Same numbers as
    * `df.count()` + [[approxUniqueness]]. */
  def statScan(df: DataFrame, cols: Seq[String]): (Long, Map[String, Long]) = {
    val distinctCols = cols.distinct
    val aggs = count(lit(1)).as("__n") +:
      distinctCols.map(c => approx_count_distinct(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    (row.getLong(0),
      distinctCols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) }.toMap)
  }

  /** Combined uniqueness score — exact formula from pre_process.py:45,
    * golden-tested against tests/test_pre_process.py:113-117. */
  def calculateUniqueness(a: Double, b: Double): Double =
    (math.pow(a + 0.5, 2) + math.pow(b + 0.5, 2)) / 2 - math.pow(0.5, 2) + 0.5 * math.abs(a - b)

  def fillPercUnique(left: DataFrame, right: DataFrame, maps: Seq[FuzzyMapping],
                     leftLen: Long, rightLen: Long): Seq[FuzzyMapping] =
    fillPercUniqueFromStats(
      approxUniqueness(left, maps.map(_.leftCol)),
      approxUniqueness(right, maps.map(_.rightCol)),
      maps, leftLen, rightLen)

  /** Stats-injection variant of [[fillPercUnique]]: both sides' approx
    * distinct counts are supplied by the caller, so filling the mappings
    * triggers NO Spark action. The stream-static path precomputes the
    * static side's stats once and re-derives only the batch side's. */
  def fillPercUniqueFromStats(leftStats: Map[String, Long], rightStats: Map[String, Long],
                              maps: Seq[FuzzyMapping],
                              leftLen: Long, rightLen: Long): Seq[FuzzyMapping] =
    maps.map { m =>
      val a = if (leftLen == 0) 0.0 else leftStats(m.leftCol).toDouble / leftLen
      val b = if (rightLen == 0) 0.0 else rightStats(m.rightCol).toDouble / rightLen
      m.copy(percUnique = calculateUniqueness(a, b))
    }

  /** Most selective mapping first (pre_process.py:106-119). Stable sort. */
  def orderMaps(maps: Seq[FuzzyMapping]): Seq[FuzzyMapping] = maps.sortBy(-_.percUnique)

  def uniquenessRate(maps: Seq[FuzzyMapping]): Double = maps.map(_.percUnique).sum

  /** Dedup inputs iff the join keys are low-uniqueness AND the cartesian is
    * big enough to hurt (constants from pre_process.py:149). */
  def needsAggregation(rate: Double, cartesianSize: Double): Boolean =
    rate < 1.2 && cartesianSize > 1_000_000L

  def aggregateOutput(left: DataFrame, right: DataFrame, maps: Seq[FuzzyMapping]): (DataFrame, DataFrame) =
    (left.dropDuplicates(maps.map(_.leftCol).distinct),
     right.dropDuplicates(maps.map(_.rightCol).distinct))

  /** Full preprocessing: stats -> order -> conditional dedup -> renames ->
    * output names (pre_process.py:281-327). When `runStats` is false only
    * the structurally required steps (rename + naming) run — the mid-level
    * API semantics of the reference. */
  def run(left: DataFrame, right: DataFrame, maps: Seq[FuzzyMapping],
          runStats: Boolean = true): Plan = {
    var l = left
    var r = right
    var ms = maps
    var leftLen = -1L
    var rightLen = -1L
    if (runStats) {
      // Both sides' fused count+HLL scans run CONCURRENTLY (guide §2.6):
      // they are independent jobs, and serializing them only added their
      // fixed scheduling latencies. Values are identical to the serial
      // count() + approxUniqueness() pair.
      val ((ll, lStats), (rl, rStats)) = graft.util.Par.run2(
        statScan(l, maps.map(_.leftCol)), statScan(r, maps.map(_.rightCol)))
      leftLen = ll
      rightLen = rl
      // Empty side: stats/ordering/dedup are skipped, but — deliberate
      // deviation from pre_process.py:309-310, which returns before the
      // renames — the rename + naming steps below STILL run, so the
      // output schema is identical for empty and non-empty inputs.
      // SURVEY §8 deviation 5 has the full rationale (polars auto-suffixes
      // colliding names at join time; Spark would emit duplicate columns
      // that fail on parquet write).
      if (leftLen > 0 && rightLen > 0) {
        ms = fillPercUniqueFromStats(lStats, rStats, ms, leftLen, rightLen)
        ms = orderMaps(ms)
        reportOnOrder(ms)
        val rate = uniquenessRate(ms)
        val cartesian = leftLen.toDouble * rightLen.toDouble
        if (needsAggregation(rate, cartesian)) {
          log.info(f"Low uniqueness rate ($rate%.3f) on a $cartesian%.3g cartesian — " +
            "deduplicating both sides on the mapping columns before matching")
          val agg = aggregateOutput(l, r, ms)
          l = agg._1
          r = agg._2
        }
      }
    }
    // Mid-level API semantics (runStats=false): the reference's constructor
    // default `fuzzy_score_{left}_{right}` survives because
    // set_name_in_fuzzy_mappings only runs inside preprocessing
    // (models.py:87-89, pre_process.py:326). The fallback is resolved from
    // the ORIGINAL column names, BEFORE the structural right-side renames —
    // exactly when the reference's constructor runs.
    if (!runStats)
      ms = ms.map(m => m.copy(outputColumnName = Some(m.resolvedOutputName)))
    val renames = NameUtils.renameRightColumns(l.columns.toSeq, r.columns.toSeq)
    ms = NameUtils.renameMappingRightCols(ms, renames)
    if (runStats) ms = NameUtils.setNamesInMappings(ms)
    val rRenamed = renames.foldLeft(r) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
    Plan(l, rRenamed, ms, leftLen, rightLen)
  }
}
