package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality census every ingest step
  * of a large pipeline runs before trusting a new corpus drop: row count,
  * null count, distinct count, and min/max per column, as ROWS (one per
  * column) so the profile of a 1000-column table is itself a queryable
  * frame.
  *
  * Scale shape: ONE aggregate over the input — no per-column jobs, no
  * driver loop. min/max aggregate in the column's native type and cast to
  * string afterwards, so numeric comparison semantics are preserved and
  * the output schema is uniform.
  *
  * Reference had nothing comparable; extension surface, same family as
  * Curation.corpusStats.
  */
object Profile {

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * deequ-style profiling step after [[columns]] (is quality score
    * correlated with length? does value drift with time-of-day?).
    *
    * Cross-engine exactness follows the quantized-exact-sum recipe: each
    * column lands on an integer grid first (`round(x·scale)` as long, so
    * e.g. scale=100 profiles money/ratio columns in cents), and the ONE
    * aggregate pass accumulates n, Σx, Σx², Σxy as exact wide-decimal
    * integers — order-independent under any partitioning, unlike naive
    * double sums (order-dependent past 2⁵³). The final Pearson formula
    * `corr = (n·Σxy − ΣxΣy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))` runs
    * once per pair on doubles cast FROM those exact integers (identical
    * rounding in any engine), rounded to 6 decimals. Zero-variance pairs
    * emit the 0.0 sentinel, never null/NaN. Contract: quantized
    * magnitudes must keep n·Σ(xq·yq) below 10³⁸ (wide-decimal range) and
    * each per-row product below 2⁶³ — satisfied by any |xq| ≤ 3·10⁹ at
    * any row count a real cluster sees.
    *
    * Output: one row per unordered pair in `cols` order —
    * (col_a, col_b, n, corr). Null rows: rows where ANY profiled column
    * is null are excluded from every pair (single listwise-complete
    * pass; pairwise-complete would need per-pair counts — run twice with
    * different `cols` if that matters). */
  def correlations(df: DataFrame, cols: Seq[String],
                   scale: Long = 100L): DataFrame = {
    require(cols.size >= 2, s"need at least two columns (got ${cols.size})")
    require(scale > 0, s"scale must be positive (got $scale)")
    val base = df
      .where(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c => round(col(c) * scale).cast("long").as(s"__q_$c")): _*)
    val dec = "decimal(38,0)"
    val sumAggs = cols.flatMap { c =>
      Seq(sum(col(s"__q_$c").cast(dec)).as(s"__s_$c"),
        sum((col(s"__q_$c") * col(s"__q_$c")).cast(dec)).as(s"__ss_$c"))
    }
    val pairNames = for {
      (a, ai) <- cols.zipWithIndex; (b, bi) <- cols.zipWithIndex if ai < bi
    } yield (a, b)
    val prodAggs = pairNames.map { case (a, b) =>
      sum((col(s"__q_$a") * col(s"__q_$b")).cast(dec)).as(s"__sp_${a}_$b")
    }
    val aggs = (count(lit(1)).cast(dec).as("__n") +: (sumAggs ++ prodAggs))
    val aggRow = base.agg(aggs.head, aggs.tail: _*)
    val pairStructs = pairNames.map { case (a, b) =>
      val n = col("__n")
      val cov = (n * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
        .cast("double")
      val vx = (n * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")).cast("double")
      val vy = (n * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")).cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").cast("long").as("n"),
        when(vx > 0.0 && vy > 0.0, round(cov / sqrt(vx * vy), 6))
          .otherwise(0.0).as("corr"))
    }
    aggRow.select(explode(array(pairStructs: _*)).as("__p")).select(col("__p.*"))
  }

  /** Exact profile of `cols`: one output row per column with
    * (col_name, n_rows, n_nulls, n_distinct, min_s, max_s). `n_distinct`
    * counts distinct NON-null values (SQL `COUNT(DISTINCT c)`). min/max
    * of an all-null column surface as '' (sentinel — the driver-side
    * result hash must not see engine-specific null renderings).
    *
    * Exact multi-distinct compiles to Spark's standard Expand plan
    * (scan rows multiply by ~#cols+1 before the partial agg) — fine for
    * a handful of columns; wide tables use [[columnsApprox]]. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, c => count_distinct(col(c)))

  /** Column-stats drift between two corpus snapshots — the nightly
    * monitoring twin of [[graft.pipeline.Curation.corpusDiff]] (that one
    * answers "which rows changed", this one "did the data's SHAPE move"):
    * one row per profiled column with both sides' row/null/distinct
    * counts and min/max, so a collapsed null rate, a cardinality cliff or
    * a runaway max surfaces as a number a policy can threshold. Pure
    * compose of two [[columns]] profiles joined on col_name — each side
    * is one aggregate scan; the join is #cols rows. Policy (what counts
    * as drift) stays with the caller: this emits the evidence, not the
    * verdict. */
  def drift(oldDf: DataFrame, newDf: DataFrame, cols: Seq[String]): DataFrame =
    driftFromProfiles(columns(oldDf, cols), columns(newDf, cols))

  /** [[drift]] over ALREADY-PROFILED sides ([[columns]] output) — the
    * stored-baseline form: profile the reference corpus once, persist the
    * tiny frame, and compare any number of later snapshots (or arriving
    * micro-batches — [[graft.streaming.ProfileStream]]) against it
    * without rescanning the reference. The join is FULL OUTER: a column
    * profiled on only one side still gets a report row, with the missing
    * side's counts at the -1 sentinel and min/max at '' — a monitoring
    * report that silently dropped a one-sided column would look healthy
    * while not monitoring it at all. */
  def driftFromProfiles(oldProfile: DataFrame, newProfile: DataFrame): DataFrame = {
    def side(p: DataFrame, suffix: String) =
      p.select(col("col_name"),
        col("n_rows").as(s"n_rows_$suffix"),
        col("n_nulls").as(s"n_nulls_$suffix"),
        col("n_distinct").as(s"n_distinct_$suffix"),
        col("min_s").as(s"min_$suffix"),
        col("max_s").as(s"max_$suffix"))
    val joined = side(oldProfile, "old")
      .join(side(newProfile, "new"), Seq("col_name"), "full_outer")
    val sentinels = Seq("n_rows", "n_nulls", "n_distinct").flatMap(m =>
      Seq(s"${m}_old", s"${m}_new").map(c => coalesce(col(c), lit(-1L)).as(c))) ++
      Seq("min_old", "min_new", "max_old", "max_new").map(c =>
        coalesce(col(c), lit("")).as(c))
    joined.select(col("col_name") +: sentinels: _*)
  }

  /** The wide-table scale path: `approx_count_distinct` (HyperLogLog++,
    * `rsd` relative error) instead of exact distinct — NO Expand, so a
    * 1000-column profile still scans the corpus exactly once at 1x row
    * volume. Same output schema; n_distinct is approximate (not oracle-
    * comparable — spec-checked against the exact profile within rsd). */
  def columnsApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profile(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Top-`k` most frequent values per column — the skew census that
    * decides salting/broadcast strategy before a 100 TB join: a key
    * whose top value owns 10% of rows needs AQE skew handling or a salt;
    * one whose top value owns 0.01% doesn't. Output one row per
    * (column, hot value): (col_name, value_s, n_rows) — values cast to
    * string for a uniform schema, NULLs excluded (they are counted by
    * [[columns]]), ties broken by value ascending so top-k is
    * deterministic in any engine.
    *
    * Scale shape: one (col_name, value) exploded projection (row volume
    * x #cols, same factor the exact profile's Expand pays), ONE hash-agg
    * shuffle with map-side combine, and a top-k window over the tiny
    * (col, value) count frame. */
  def heavyHitters(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val pairs = df.select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value_s"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .where(col("value_s").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"))
      .orderBy(col("n_rows").desc, col("value_s").asc)
    pairs.groupBy(col("col_name"), col("value_s"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Exact quantiles of numeric columns — the distribution census behind
    * length-bucketing, winsorize bounds, and sequence-packing budgets:
    * one output row per (column, probability) with (col_name, p, q),
    * `q` the linearly-interpolated quantile (SQL `percentile` /
    * `quantile_cont` semantics: index p*(n-1) into the sorted values,
    * linear between neighbors — identical across engines). Nulls are
    * ignored per column, like every SQL quantile.
    *
    * Scale shape: ONE aggregate over the input for ALL columns and ALL
    * probabilities. Exact percentile buffers each column's value
    * multiset (hash map of distinct value -> count) on the agg side —
    * fine for bounded-cardinality numerics (lengths, counts, scores); a
    * 100 TB high-cardinality column should use [[numericQuantilesApprox]],
    * whose sketch is fixed-size at any cardinality. */
  /** A declarative data-quality check (deequ/Great-Expectations family):
    * evaluated over the frame in ONE aggregate pass by [[expectations]]. */
  sealed trait Expectation {
    /** Stable check label in the report. */
    def name: String
    /** Column the check reads ('' for table-level checks). */
    def column: String
  }
  /** No NULLs in `column`. */
  case class ExpectNotNull(column: String) extends Expectation { val name = "not_null" }
  /** `column` values are unique (nulls excluded, like SQL UNIQUE). */
  case class ExpectUnique(column: String) extends Expectation { val name = "unique" }
  /** Every non-null value of `column` (as string) is in `values`. */
  case class ExpectValuesIn(column: String, values: Seq[String]) extends Expectation {
    val name = "values_in"
  }
  /** min(column) >= lo (long-typed columns; vacuous on empty/all-null). */
  case class ExpectMinGe(column: String, lo: Long) extends Expectation { val name = "min_ge" }
  /** max(column) <= hi (long-typed columns; vacuous on empty/all-null). */
  case class ExpectMaxLe(column: String, hi: Long) extends Expectation { val name = "max_le" }
  /** Row count in [lo, hi]. */
  case class ExpectRowCount(lo: Long, hi: Long) extends Expectation {
    val name = "row_count"; val column = ""
  }
  /** Every non-null value of `column` matches `regex` (Java ∩ RE2 subset,
    * same contract as the redaction patterns — keeps SQL oracles literal). */
  case class ExpectRegex(column: String, regex: String) extends Expectation {
    val name = "regex"
  }

  /** Evaluate a check suite in ONE scan: every expectation compiles to an
    * aggregate expression over the same pass (violation counts, extremes,
    * row count), and the single result row explodes to one report row per
    * check — (check, col_name, passed, violations). At 100 TB this costs
    * exactly one parquet scan regardless of suite size; there is no
    * per-check job and no driver loop. `violations` is the check's
    * witness count (out-of-range rows, duplicate surplus, regex misses);
    * for row_count it is the distance to the nearest bound. Uniqueness
    * uses exact count(DISTINCT) — the Expand-plan cost note on
    * [[columns]] applies when several Unique checks stack. */
  def expectations(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
      case (e, i) =>
        val a = e match {
          case ExpectNotNull(c) => count(lit(1)) - count(col(c))
          case ExpectUnique(c) => count(col(c)) - count_distinct(col(c))
          case ExpectValuesIn(c, vs) =>
            sum(when(col(c).isNotNull &&
              !col(c).cast("string").isin(vs: _*), 1L).otherwise(0L))
          case ExpectMinGe(c, lo) =>
            sum(when(col(c).isNotNull && col(c).cast("long") < lo, 1L).otherwise(0L))
          case ExpectMaxLe(c, hi) =>
            sum(when(col(c).isNotNull && col(c).cast("long") > hi, 1L).otherwise(0L))
          case ExpectRowCount(_, _) => count(lit(1))
          case ExpectRegex(c, re) =>
            sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
        }
        coalesce(a.cast("long"), lit(0L)).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val reports = checks.zipWithIndex.map { case (e, i) =>
      val viol = e match {
        case ExpectRowCount(lo, hi) =>
          when(col(s"__v$i") < lo, lit(lo) - col(s"__v$i"))
            .when(col(s"__v$i") > hi, col(s"__v$i") - lit(hi))
            .otherwise(0L)
        case _ => col(s"__v$i")
      }
      struct(lit(e.name).as("check"), lit(e.column).as("col_name"),
        when(viol === 0L, 1L).otherwise(0L).as("passed"),
        viol.cast("long").as("violations"))
    }
    one.select(explode(array(reports: _*)).as("r"))
      .select(col("r.check"), col("r.col_name"), col("r.passed"), col("r.violations"))
  }

  def numericQuantiles(df: DataFrame, cols: Seq[String],
                       probs: Seq[Double]): DataFrame =
    quantiles(df, cols, probs,
      (c, ps) => percentile(col(c), array(ps.map(lit): _*)))

  /** [[numericQuantiles]] on the `approx_percentile` sketch (bounded
    * memory at ANY value cardinality; `accuracy` trades error for sketch
    * size). Same output schema; values are approximate — spec-checked
    * against the exact profile, not oracle-compared. */
  def numericQuantilesApprox(df: DataFrame, cols: Seq[String],
                             probs: Seq[Double],
                             accuracy: Int = 10000): DataFrame =
    quantiles(df, cols, probs,
      (c, ps) => approx_percentile(col(c), array(ps.map(lit): _*), lit(accuracy))
        .cast("array<double>"))

  private def quantiles(df: DataFrame, cols: Seq[String], probs: Seq[Double],
                        agg: (String, Seq[Double]) => Column): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probabilities must be in [0, 1]: $probs")
    require(cols.nonEmpty, "quantile profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val aggs = cols.map(c => agg(c, probs).as(s"__q_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.flatMap { c =>
        probs.zipWithIndex.map { case (p, i) =>
          struct(lit(c).as("col_name"), lit(p).as("p"),
            element_at(col(s"__q_$c"), i + 1).as("q"))
        }
      }: _*)).as("r"))
      .select(col("r.*"))
  }

  private def profile(df: DataFrame, cols: Seq[String],
                      distinctAgg: String => Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: $missing")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"),
          coalesce(col(s"__min_$c"), lit("")).as("min_s"),
          coalesce(col(s"__max_$c"), lit("")).as("max_s"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }

  // ---------------------------------------------------- HyperLogLog sketch

  /** HLL register width in suffix bits: 10 hex chars of the md5 after the
    * bucket prefix. 40 bits keeps the scaled harmonic sum (≤ m·2^41)
    * inside a BIGINT for every supported p, and a 40-bit hash space is
    * collision-free for any group cardinality this sketch is sized for
    * (the standard large-range correction is deliberately omitted and
    * would kick in at ~2^38 distinct). */
  private[graft] val HllW = 40

  /** Per-(group, bucket) HLL registers — the MERGEABLE half of the
    * sketch (Flajolet et al. 2007). Deterministic and engine-replayable
    * by construction: the hash is the md5 hex of the value's string
    * rendering (first p/4 hex chars = bucket, next 10 = a 40-bit
    * suffix), and the register is the suffix's leading-zero rank
    * `w − bitlength + 1` computed from `length(bin(h))` — pure integer
    * ops, no floats anywhere in the register path.
    *
    * This is the 100 TB distinct-count shape: one hash-aggregate
    * (map-side combined max) producing ≤ m rows per group, shippable as
    * a per-shard parquet and merged with [[hllMerge]] — counting
    * distinct users per key across shards without ever re-scanning or
    * shuffling raw values. `p` must be a multiple of 4 (whole hex chars)
    * in [8, 16]. */
  def hllRegisters(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   p: Int = 12): DataFrame = {
    require(p % 4 == 0 && p >= 8 && p <= 16, s"p must be a multiple of 4 in [8,16] (got $p)")
    val hx = md5(col(valueCol).cast("string"))
    val suf = conv(substring(hx, p / 4 + 1, HllW / 4), 16, 10).cast("long")
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        conv(substring(hx, 1, p / 4), 16, 10).cast("long").as("bucket") :+
        when(suf === 0L, HllW + 1)
          .otherwise(lit(HllW + 1) - length(bin(suf))).cast("int").as("register"): _*)
      .groupBy(col("bucket") +: groupCols.map(col): _*)
      .agg(max(col("register")).as("register"))
  }

  /** Scala-side twin of [[hllEstimate]] over a dense register array —
    * IDENTICAL arithmetic, op for op (exact scaled BIGINT harmonic sum,
    * then the same IEEE chain), so a streaming state holder
    * ([[graft.streaming.ProfileStream.hllDistinctStream]]) emits the
    * same estimate the batch frame would, bit for bit (spec-pinned).
    * Returns (touched registers, estimate rounded to 4dp). */
  def hllEstimateLocal(registers: Array[Byte], p: Int): (Long, Double) = {
    require(p % 4 == 0 && p >= 8 && p <= 16, s"p must be a multiple of 4 in [8,16] (got $p)")
    val m = 1L << p
    require(registers.length == m, s"expected $m registers (got ${registers.length})")
    val alpha = 0.7213 / (1.0 + 1.079 / m.toDouble)
    val scale = math.pow(2.0, HllW + 1)
    var touched = 0L
    var sTouched = 0L
    var i = 0
    while (i < registers.length) {
      val r = registers(i)
      if (r > 0) { touched += 1; sTouched += 1L << (HllW + 1 - r) }
      i += 1
    }
    val s = (m - touched) * scale.toLong + sTouched
    val eRaw = alpha * m.toDouble * m.toDouble * scale / s.toDouble
    val v = m - touched
    val est = if (eRaw <= 2.5 * m && v > 0L)
      m.toDouble * math.log(m.toDouble / v.toDouble)
    else eRaw
    (touched, BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  /** Merge two register frames (same p): per-(group, bucket) max — the
    * lossless sketch union. Merging shards then estimating equals
    * estimating the concatenated input EXACTLY (spec-pinned), which is
    * what makes the sketch safe to precompute per ingest batch. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket") +: groupCols.map(col): _*)
      .agg(max(col("register")).as("register"))

  /** Distinct-count estimate from a register frame: the harmonic-mean
    * formula `α_m·m²/Σ2^−M_j` with the small-range linear-counting
    * correction (`E ≤ 2.5m` → `m·ln(m/V)`, V = zero registers).
    *
    * Exactness: the harmonic sum is computed SCALED BY 2^(w+1) so every
    * term `2^(w+1−M_j)` is an exact BIGINT — the sum is
    * order-independent integer arithmetic (a raw Σ2^−M_j of doubles is
    * not), and untouched registers contribute `(m − touched)·2^(w+1)`
    * in closed form. The final α_m·m²·2^(w+1)/S division and the ln of
    * the correction are single IEEE ops from exact integers, identical
    * in any engine. Output: group cols + n_registers + estimate
    * (rounded to 4dp). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  p: Int = 12): DataFrame = {
    require(p % 4 == 0 && p >= 8 && p <= 16, s"p must be a multiple of 4 in [8,16] (got $p)")
    val m = 1L << p
    // α_m for m ≥ 128 (p ≥ 8 guarantees it)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / m.toDouble)
    val scale = math.pow(2.0, HllW + 1) // 2^41, exact
    val grouped = registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_registers"),
        sum(expr(s"CAST(power(2, ${HllW + 1} - register) AS BIGINT)")).as("__s_touched"))
      .withColumn("__s",
        (lit(m) - col("n_registers")) * lit(scale.toLong) + col("__s_touched"))
      .withColumn("__e_raw",
        alpha * m.toDouble * m.toDouble * lit(scale) / col("__s").cast("double"))
      .withColumn("__v", lit(m) - col("n_registers"))
    grouped.select(groupCols.map(col) :+ col("n_registers") :+
      round(when(col("__e_raw") <= lit(2.5 * m) && col("__v") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v").cast("double")))
        .otherwise(col("__e_raw")), 4).as("estimate"): _*)
  }

  /** One-shot per-group approximate distinct count via the HLL sketch —
    * [[hllRegisters]] → [[hllEstimate]] fused. */
  def hllDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  p: Int = 12): DataFrame =
    hllEstimate(hllRegisters(df, valueCol, groupCols, p), groupCols, p)

  // ---------------------------------------------------- KMV (bottom-k) sketch

  /** KMV / bottom-k sketch per group: the k smallest 52-bit md5 keys of
    * the DISTINCT values, as a sorted array (Bar-Yossef et al. 2002; the
    * theta-sketch family's exact-arithmetic core). 52 bits so every key
    * is exact in the heap's double score. Distinct-first (a hash
    * aggregate) so duplicated values cannot occupy two heap slots.
    * Output: group cols + `sketch` (array<bigint>, ascending). When a
    * group had < k distinct values the sketch IS the value set —
    * `size(sketch) < k` detects that case and `size(sketch)` is then the
    * exact distinct count. */
  def kmvSketch(df: DataFrame, valueCol: String, groupCols: Seq[String],
                k: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val key = conv(substring(md5(col(valueCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    df.where(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ key.as("__h"): _*)
      .groupBy(groupCols.map(col) :+ col("__h"): _*).agg(count(lit(1)).as("__c"))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.fuzzy.vectorFunctions.topk_pairs(
        -col("__h").cast("double"), col("__h"), k).as("__tk"))
      .select(groupCols.map(col) :+
        transform(col("__tk"), e => e.getField("id")).as("sketch"): _*)
  }

  // ---------------------------------------------------- count-min sketch

  /** Count-min sketch counters (Cormode & Muthukrishnan 2005): `d`
    * independent md5 hash rows × `w` slots, each (row, slot) holding the
    * exact count of values hashing there. The mergeable frequency
    * sketch next to [[hllRegisters]] (distinct) and [[kmvSketch]]
    * (overlap): per-shard counter frames are ≤ d·w rows regardless of
    * corpus size and merge by SUM ([[cmsMerge]]) — "how often does this
    * token/URL/user appear, corpus-wide" without keeping the full
    * value→count table. Pure integer arithmetic end to end, so every
    * estimate replays exactly in any engine. */
  def cmsCounters(df: DataFrame, valueCol: String,
                  d: Int = 4, w: Int = 2048): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"need 1 <= d <= 16, w >= 2 (got $d, $w)")
    df.where(col(valueCol).isNotNull)
      .select(posexplode(array((0 until d).map(i =>
        conv(substring(md5(concat(lit(s"cms$i:"), col(valueCol).cast("string"))),
          1, 15), 16, 10).cast("long") % w): _*)))
      .select(col("pos").cast("int").as("row"), col("col").as("slot"))
      .groupBy(col("row"), col("slot")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge counter frames (same d, w): per-(row, slot) sum — lossless,
    * so shard-merge-then-lookup equals whole-corpus lookup EXACTLY
    * (spec-pinned). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("slot")).agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for the DISTINCT values of `queries`:
    * `est(v) = min over rows of counter[row, slot_row(v)]` — the classic
    * one-sided bound (est ≥ true count, overshoot ≤ εN with probability
    * 1−δ for w = e/ε, d = ln 1/δ). The d probes build as one small
    * explode over the query set and join the counter frame on
    * (row, slot) — counters a query never hits default to 0 via the
    * left join. */
  def cmsLookup(counters: DataFrame, queries: DataFrame, valueCol: String,
                d: Int = 4, w: Int = 2048): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"need 1 <= d <= 16, w >= 2 (got $d, $w)")
    queries.where(col(valueCol).isNotNull).select(col(valueCol)).distinct()
      .select(col(valueCol), posexplode(array((0 until d).map(i =>
        conv(substring(md5(concat(lit(s"cms$i:"), col(valueCol).cast("string"))),
          1, 15), 16, 10).cast("long") % w): _*)))
      .select(col(valueCol), col("pos").cast("int").as("row"), col("col").as("slot"))
      .join(broadcast(counters), Seq("row", "slot"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // --------------------------------------------- PSI distribution drift

  /** Population Stability Index between two count frames — THE standard
    * production drift score ("did the lang/source/length mix move"),
    * completing the monitoring family next to [[drift]]'s per-column
    * counts: `PSI = Σ_buckets (p_new − p_old)·ln(p_new/p_old)`, < 0.1
    * conventionally stable, > 0.25 shifted.
    *
    * Deterministic contract: probabilities are add-one smoothed over the
    * UNION key set (`p = (c + 1)/(n + k)`), so empty-on-one-side buckets
    * contribute finitely and both engines see the same rationals; each
    * bucket's contribution snaps to the 1e-9 BIGINT grid BEFORE summing,
    * so the total is exact integer arithmetic (a raw double Σ is
    * order-dependent). Input frames are (keyCols..., cnt) — from a
    * groupBy count, an [[hdrBuckets]] histogram, or a persisted nightly
    * profile. NULL keys: exclude or canonicalize them upstream — the
    * full-outer equi-join keeps each side's NULL rows separate, which
    * double-counts a "null category" ([[psiCategorical]] filters them;
    * [[hdrBuckets]] cannot produce them). Output: one row per union key
    * with both counts and the grid contribution; sum `psi_contrib` for
    * the index. */
  def psiFromCounts(oldCounts: DataFrame, newCounts: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "psiFromCounts needs at least one key column")
    val joined = oldCounts.select(keyCols.map(col) :+ col("cnt").as("__co"): _*)
      .join(newCounts.select(keyCols.map(col) :+ col("cnt").as("__cn"): _*),
        keyCols, "full_outer")
      .select(keyCols.map(col) :+ coalesce(col("__co"), lit(0L)).as("__co") :+
        coalesce(col("__cn"), lit(0L)).as("__cn"): _*)
    val totals = joined.agg(sum(col("__co")).as("__no"),
      sum(col("__cn")).as("__nn"), count(lit(1)).as("__k"))
    joined.crossJoin(broadcast(totals))
      .withColumn("__po", (col("__co") + 1L) / (col("__no") + col("__k")))
      .withColumn("__pn", (col("__cn") + 1L) / (col("__nn") + col("__k")))
      .select(keyCols.map(col) :+ col("__co").as("n_old") :+
        col("__cn").as("n_new") :+
        (round((col("__pn") - col("__po")) * log(col("__pn") / col("__po")) * 1e9)
          .cast("long") / 1e9).as("psi_contrib"): _*)
  }

  /** Categorical PSI: value-count both sides, then [[psiFromCounts]]. */
  def psiCategorical(oldDf: DataFrame, newDf: DataFrame,
                     valueCol: String): DataFrame = {
    def counts(df: DataFrame) = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
    psiFromCounts(counts(oldDf), counts(newDf), Seq(valueCol))
  }

  /** Numeric PSI over [[hdrBuckets]] histograms — magnitude-adaptive
    * buckets with NO corpus sort and no quantile fitting, so the same
    * bucketing serves any two snapshots (a quantile-bucketed PSI needs
    * one side to define the edges). */
  def psiHdr(oldDf: DataFrame, newDf: DataFrame, numCol: String,
             subBits: Int = 5): DataFrame = {
    def hist(df: DataFrame) = hdrBuckets(df, numCol, Seq.empty, subBits)
      .select(col("bucket"), col("cnt"))
    psiFromCounts(hist(oldDf), hist(newDf), Seq("bucket"))
  }

  // ------------------------------------------------ robust outliers (MAD)

  /** Median-absolute-deviation outlier flags per group — the robust
    * companion to z-scores (one wild value corrupts a mean/stddev
    * threshold; the median/MAD pair shrugs it off) and the FLAGGING twin
    * of [[graft.pipeline.Curation.winsorize]] (that one clamps, this one
    * reports). Two tiny percentile aggregates (median, then median of
    * |x − med|) broadcast back onto the rows; a NULL group is its own
    * group (null-safe joins, the winsorize contract). `mad = 0`
    * (a majority-constant group) flags ANY deviation from the median —
    * strictest consistent reading of the rule. Emits every input row +
    * (med, mad, is_outlier on `|x − med| > k·mad`). */
  def madOutliers(df: DataFrame, groupCol: String, numCol: String,
                  k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val med = df.groupBy(col(groupCol).as("__grp"))
      .agg(percentile(col(numCol), lit(0.5)).as("med"))
    val withMed = df.join(med, col(groupCol) <=> col("__grp")).drop("__grp")
    val mad = withMed.groupBy(col(groupCol).as("__grp"))
      .agg(percentile(abs(col(numCol) - col("med")), lit(0.5)).as("mad"))
    withMed.join(mad, col(groupCol) <=> col("__grp")).drop("__grp")
      .withColumn("is_outlier", abs(col(numCol) - col("med")) > lit(k) * col("mad"))
  }

  // ------------------------------------------------ HDR quantile sketch

  /** HDR-histogram quantile sketch (Tene's HdrHistogram bucketing):
    * non-negative longs land in `(exponent, mantissa)` buckets — the
    * bit-length of the value picks a power-of-two band, the top
    * `subBits` bits after the leading one pick a linear sub-bucket — so
    * the bucket WIDTH tracks the value's magnitude and any quantile
    * reads back with relative error ≤ 2^−subBits. The mergeable
    * QUANTILE sketch completing the family ([[hllRegisters]] distinct,
    * [[kmvSketch]] overlap, [[cmsCounters]] frequency): per-shard
    * histograms are ≤ 64·2^subBits rows per group, merge by SUM, and
    * "p99 doc length across 100 TB" never sorts the corpus — where the
    * exact [[numericQuantiles]] is a sort-based aggregate that cannot
    * pre-aggregate per shard.
    *
    * Bucketing is PURE INTEGER (bit-length via `length(bin())`, shifts
    * as integer division by a power-of-two literal — no ln at bucket
    * boundaries), so every engine buckets identically. Negative values
    * are EXCLUDED (like NULLs) — `bin()` sign-extends them into
    * meaningless buckets, so quantize signed/fractional columns onto a
    * non-negative grid first; the exclusion is explicit so the two
    * engines can never disagree on what a negative hashed to. */
  def hdrBuckets(df: DataFrame, valueCol: String, groupCols: Seq[String],
                 subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 8, s"subBits must be in [1,8] (got $subBits)")
    // unified index, all integer: with e = bitlength(v) and
    // shift = max(0, e-1-subBits),
    //   bucket = max(0, e-subBits-1)·2^subBits + (v >> shift)
    // — values of ≤ subBits+1 bits (including 0) sit in their own
    // exact-value bucket (shift 0), wider bands keep the top subBits+1
    // bits; strictly monotone across bands
    val sb = subBits
    val idx = expr(
      s"""greatest(0L, length(bin(__v)) - $sb - 1) * ${1L << sb}
         | + shiftright(__v, greatest(0, length(bin(__v)) - 1 - $sb))""".stripMargin)
    df.where(col(valueCol).isNotNull && col(valueCol) >= 0)
      .select(groupCols.map(col) :+ col(valueCol).cast("long").as("__v"): _*)
      .select(groupCols.map(col) :+ col("__v") :+ idx.as("bucket"): _*)
      .groupBy(col("bucket") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), min(col("__v")).as("lo"), max(col("__v")).as("hi"))
  }

  /** Merge histogram frames (same subBits): per-(group, bucket) sum of
    * counts, min/max of the observed bounds — lossless, shard-merge ==
    * whole spec-pinned exact. */
  def hdrMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(col("bucket") +: groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), min(col("lo")).as("lo"), max(col("hi")).as("hi"))

  /** Quantile estimates from a histogram frame: for each probability q,
    * the first bucket (ascending index) whose cumulative count reaches
    * `ceil(q·n)`, reported as that bucket's observed [lo, hi] band with
    * `est` = hi (the discrete upper quantile; exact when the bucket
    * holds one distinct value, ≤ 2^−subBits relative otherwise). The
    * window runs over the HISTOGRAM (≤ 64·2^subBits rows per group),
    * never the corpus — the [[graft.pipeline.TextAnalysis.pplBuckets]]
    * histogram trick. `qMicros` are probabilities on the 1e-6 grid
    * (500000 = median) so the rank threshold `ceil(q·n)` is exact
    * integer arithmetic: `(n·qm + 999999) div 1e6`. */
  def hdrQuantiles(hist: DataFrame, groupCols: Seq[String],
                   qMicros: Seq[Long]): DataFrame = {
    require(qMicros.nonEmpty && qMicros.forall(q => q > 0L && q <= 1000000L),
      s"qMicros must be in (0, 1e6] (got $qMicros)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("__cum", sum(col("cnt")).over(w))
    val totals = hist.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("__n"))
    val qs = qMicros.sorted.map(lit(_))
    cum.join(totals, groupCols)
      .select(groupCols.map(col) :+ col("bucket") :+ col("lo") :+ col("hi") :+
        col("__cum") :+ col("__n") :+
        explode(array(qs: _*)).as("q_micro"): _*)
      .withColumn("__rank", expr("(__n * q_micro + 999999L) div 1000000L"))
      .where(col("__cum") >= col("__rank"))
      .groupBy(groupCols.map(col) :+ col("q_micro"): _*)
      .agg(min_by(struct(col("lo"), col("hi")), col("bucket")).as("__band"))
      .select(groupCols.map(col) :+ col("q_micro") :+
        col("__band.lo").as("band_lo") :+ col("__band.hi").as("band_hi") :+
        col("__band.hi").as("est"): _*)
  }

  /** Set-relationship estimates between every unordered PAIR of groups,
    * from their KMV sketches alone — |A|, |B|, Jaccard, |A∪B|, |A∩B| with
    * no join over the raw values (the "how much do these two shards'
    * user sets overlap" question at 100 TB: sketches are k longs per
    * group, the pairwise stage is a broadcast self-join of a tiny table).
    *
    * Estimators (exact integer/rational arithmetic into single IEEE
    * divisions): per-group distinct `(k−1)·2^52/h_k` when the sketch is
    * full, else the exact size; union via the combined bottom-k of the
    * two sketch arrays; Jaccard = |K(k) ∩ A ∩ B| / k over that combined
    * bottom-k; intersection = J · |A∪B|-estimate. */
  def kmvPairStats(sketches: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val two52 = math.pow(2.0, 52) // exact
    def est(sk: Column): Column =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(two52) /
          element_at(sk, k).cast("double"))
    val a = sketches.select(col(groupCol).as("group_a"), col("sketch").as("__ska"))
    val b = sketches.select(col(groupCol).as("group_b"), col("sketch").as("__skb"))
    val merged = array_sort(array_union(col("__ska"), col("__skb")))
    val unionK = when(size(merged) < k, merged).otherwise(slice(merged, 1, k))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("__uk", unionK)
      .withColumn("__common",
        size(array_intersect(array_intersect(col("__uk"), col("__ska")), col("__skb"))))
      .withColumn("__j",
        col("__common").cast("double") / least(size(col("__uk")), lit(k)).cast("double"))
      .withColumn("__u", est(col("__uk")))
      .select(col("group_a"), col("group_b"),
        round(est(col("__ska")), 4).as("est_a"),
        round(est(col("__skb")), 4).as("est_b"),
        round(col("__j"), 6).as("jaccard"),
        round(col("__u"), 4).as("est_union"),
        round(col("__j") * col("__u"), 4).as("est_intersect"))
  }
}
