package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, per-group selection, vocabulary building, and sequence
  * packing.
  *
  * Design rules shared by every operator here:
  *  - determinism first: sampling keys off md5 of the row key, never RNG
  *    state, so a 100 TB run is reproducible, resumable, and auditable
  *    row-by-row (and mirrorable bit-for-bit by the DuckDB oracle);
  *  - narrow where possible: the samplers are pure projections + filters
  *    (no shuffle at all); the group operators shuffle exactly once on
  *    their natural key;
  *  - no global ordering: anything needing order (packing) is sharded
  *    first so parallelism scales with the shard count, not 1.
  */
object Curation {

  /** Deterministic bucket in [0, 1e6) from the md5 of the key's string
    * rendering. Reproducible across engines: DuckDB computes the same
    * value as `('0x' || substring(md5(key::VARCHAR), 1, 15))::BIGINT %
    * 1000000` (15 hex chars = 60 bits, fits a signed 64-bit int;
    * non-negative, so Spark's % and SQL's % agree). */
  def md5Bucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 1000000L

  /** Keep a deterministic `fraction` of rows, selected by key hash — the
    * same rows on every run and every engine. A pure filter: no shuffle,
    * pushes down past column pruning like any predicate. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1] (got $fraction)")
    // round, not truncate: 0.000249 * 1e6 = 248.99999... would truncate
    // one bucket low and diverge from any engine that rounds the literal
    df.where(md5Bucket(col(keyCol)) < math.round(fraction * 1e6))
  }

  /** EXACT-n deterministic global sample: the n rows with the smallest
    * md5 order key (52-bit prefix, ties by id) — [[hashSample]] with an
    * exact row count instead of an expected fraction. Selection runs
    * through the [[graft.fuzzy.BoundedTopK]] heap aggregate: each
    * partition's partial keeps at most n (key, id) entries, so the final
    * merge sees n × partitions FIXED-SIZE entries on one executor
    * reducer — unlike `orderBy(key).limit(n)`, whose TakeOrdered merge
    * happens on the DRIVER (n rows per partition collected there: the
    * difference between drawing 10⁶ ids from a 100 TB corpus and a
    * driver OOM). Sampled rows re-attach by an id equi-join (AQE
    * broadcasts the n-row side). Sized for n up to ~10⁶; for
    * corpus-fraction-scale samples use [[hashSample]] — a pure filter
    * with no aggregate at all. Requires a long-castable unique id (the
    * cast happens here — BoundedTopK type-checks its id child as exactly
    * LongType, so an INT id column would otherwise fail analysis). Emits
    * the original row plus `sample_rank` (1-based md5 order). */
  def sampleExactN(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    // 13 hex chars = 52 bits: exact in the heap's double score (negated
    // for ascending order), so the order reproduces in any engine
    val key = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val picked = df
      .select(col(idCol).cast("long").as(idCol), (-key.cast("double")).as("__negkey"))
      .groupBy(lit(1).as("__g"))
      .agg(graft.fuzzy.vectorFunctions.topk_pairs(col("__negkey"), col(idCol), n)
        .as("__tk"))
      .select(posexplode(col("__tk")))
      .select(col("col.id").as(idCol), (col("pos") + 1).cast("int").as("sample_rank"))
    df.join(picked, Seq(idCol))
  }

  /** WEIGHTED exact-n sampling without replacement (Efraimidis &
    * Spirakis 2006): the n rows with the largest `u^(1/w)` — drawn with
    * probability proportional to weight at every step, the exact-count
    * companion to [[weightedHashSample]]'s per-row coin flips and the
    * general-weights form of [[dsirSelect]]'s Gumbel-top-k. Ranking uses
    * the equivalent log key `ln(u)/w` (u = the id's md5 uniform,
    * strictly inside (0,1); ln quantized to the 1e-6 grid first so the
    * key is ONE IEEE division from exact integers — reproducible in any
    * engine), through the [[graft.fuzzy.BoundedTopK]] heap: map-side
    * partials of n fixed-size entries, never a corpus sort. Rows with
    * NULL or non-positive weight are excluded by contract (their key is
    * undefined). Emits the original row plus `sample_rank`. */
  def weightedSampleExactN(df: DataFrame, idCol: String, weight: Column,
                           n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val u = (conv(substring(md5(concat(lit("aes:"), col(idCol).cast("string"))),
      1, 15), 16, 10).cast("long") % 1000000L + lit(0.5)) / 1e6
    val key = round(log(u) * 1e6).cast("long").cast("double") / weight.cast("double")
    val picked = df
      .where(weight.isNotNull && weight > 0)
      .select(col(idCol).cast("long").as(idCol), key.as("__key"))
      .groupBy(lit(1).as("__g"))
      .agg(graft.fuzzy.vectorFunctions.topk_pairs(col("__key"), col(idCol), n)
        .as("__tk"))
      .select(posexplode(col("__tk")))
      .select(col("col.id").as(idCol), (col("pos") + 1).cast("int").as("sample_rank"))
    df.join(picked, Seq(idCol))
  }

  /** Per-stratum EXACT-n sample — quota sampling for balanced eval sets
    * (n docs per language/source regardless of stratum skew): the n
    * smallest md5 order keys WITHIN each stratum, the [[sampleExactN]]
    * heap keyed by the stratum column instead of a global constant. One
    * hash aggregate shuffled on the stratum (each map-side partial holds
    * at most n fixed-size entries per stratum it sees — never a window
    * function's per-stratum sort over the corpus), then the id equi-join
    * re-attach. NULL strata form their own stratum (groupBy keeps them;
    * the re-attach joins on the id alone, so no null-key join anywhere).
    * Stratum cardinality is UNBOUNDED — state is n entries per stratum,
    * not a driver-side table, so a million strata is fine where
    * [[temperatureSample]]'s rate-table collect must refuse. Emits the
    * original row plus `sample_rank` (1-based md5 order within the
    * stratum). */
  def sampleExactNPerStratum(df: DataFrame, idCol: String, strataCol: String,
                             n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val key = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val picked = df
      .select(col(strataCol).as("__st"), col(idCol).cast("long").as(idCol),
        (-key.cast("double")).as("__negkey"))
      .groupBy(col("__st"))
      .agg(graft.fuzzy.vectorFunctions.topk_pairs(col("__negkey"), col(idCol), n)
        .as("__tk"))
      .select(posexplode(col("__tk")))
      .select(col("col.id").as(idCol), (col("pos") + 1).cast("int").as("sample_rank"))
    df.join(picked, Seq(idCol))
  }

  /** Temperature (α) resampling across strata — the multilingual
    * rebalancing step of XLM-R-style corpus assembly: with stratum
    * shares p_s, the keep rate is `(p_s / p_min)^(α-1)` — the RAREST
    * stratum keeps everything and dominant strata downsample toward the
    * flattened α-distribution (α = 1 keeps all; α → 0 equalizes).
    * Rates snap to the 1e-6 md5-bucket grid (round-6) so the filter is
    * the same deterministic pure-filter shape as [[hashSample]].
    *
    * One count aggregate over the stratum column (tiny — collected to
    * the driver like every rate table here), then a CASE-expression
    * filter: no join, no shuffle, scan-speed at 100 TB. Returns the
    * kept rows plus the applied `keep_rate`. NULL strata are their own
    * stratum (groupBy keeps them; the CASE's null branch applies
    * their rate).
    *
    * The driver-side rate table is CARDINALITY-GUARDED: the collect is
    * bounded at `maxStrata + 1` rows and fails fast past the cap — a
    * user pointing this at a high-cardinality column (a doc id, a URL)
    * would otherwise OOM the driver and compile a pathological CASE
    * chain. Intended strata (language, source) are dozens of values;
    * for genuinely many strata, compute the rate table as a frame and
    * broadcast-join it on the stratum column instead. */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        alpha: Double, maxStrata: Int = 1000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1] (got $alpha)")
    require(maxStrata >= 1, s"maxStrata must be >= 1 (got $maxStrata)")
    val rows = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .limit(maxStrata + 1).collect()
    require(rows.length <= maxStrata,
      s"temperatureSample: over $maxStrata distinct values in stratum " +
        s"column '$strataCol' — a driver-side rate table is for " +
        "low-cardinality strata (language, source). For high-cardinality " +
        "strata compute the per-stratum rates as a DataFrame and " +
        "broadcast-join them on the stratum column instead.")
    val counts = rows.map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureSample needs a non-empty frame")
    val minN = counts.values.min.toDouble
    val rates = counts.map { case (s, n) =>
      s -> BigDecimal(math.pow(n / minN, alpha - 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rate = rates.foldLeft(lit(Double.NaN)) { case (acc, (s, r)) =>
      s match {
        case Some(v) => when(col(strataCol) === v, r).otherwise(acc)
        case None => when(col(strataCol).isNull, r).otherwise(acc)
      }
    }
    df.withColumn("keep_rate", rate)
      .where(md5Bucket(col(keyCol)) <
        (col("keep_rate") * 1e6 + lit(0.5)).cast("long"))
  }

  /** DuckDB replay of [[temperatureSample]], GENERATED from the same
    * alpha (single source — the exponent cannot drift from the query):
    * per-stratum shares, rate = round((n/n_min)^(alpha-1), 6), the same
    * md5-grid filter. The rate join is null-safe (`IS NOT DISTINCT
    * FROM`) because NULL strata are their own stratum on the
    * implementation side too. */
  def temperatureOracleSql(table: String, keyCol: String, strataCol: String,
                           alpha: Double): String = {
    // `table` may be a plain name OR a parenthesized subquery (how the
    // composed curate_clean_mix oracle feeds the blocklist-filtered
    // corpus in); it is bound ONCE in a leading CTE so a subquery's
    // text — and its evaluation — doesn't duplicate across the two
    // consumers
    s"""WITH src AS (SELECT * FROM $table AS s0),
       |c AS (SELECT $strataCol, count(*) AS n FROM src GROUP BY $strataCol),
       |mn AS (SELECT min(n) AS mn FROM c),
       |r AS (SELECT $strataCol, round(pow(CAST(n AS DOUBLE) / mn, ${alpha - 1.0}), 6) AS rate
       |      FROM c CROSS JOIN mn)
       |SELECT d.$keyCol, d.$strataCol, r.rate AS keep_rate
       |FROM src AS d JOIN r ON d.$strataCol IS NOT DISTINCT FROM r.$strataCol
       |WHERE ('0x' || substring(md5(CAST(d.$keyCol AS VARCHAR)), 1, 15))::BIGINT % 1000000 <
       |      CAST(round(r.rate * 1000000) AS BIGINT)""".stripMargin
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): distribute a total row `budget` across strata so
    * every stratum gets an equal share EXCEPT those whose entire corpus
    * at `maxEpochs` repetitions is smaller — they contribute everything
    * they have and the freed budget redistributes. The epoch cap is the
    * paper's fix for temperature sampling's tail-language over-repetition.
    *
    * Computed via the water-filling CLOSED FORM rather than the paper's
    * sequential loop, in EXACT integer arithmetic so the oracle replays
    * it with window functions: sort strata ascending by capped size
    * `c = n·maxEpochs` (ties by stratum string, NULL last — DuckDB's
    * default; the string tie-break compares Scala UTF-16 vs the oracle's
    * binary UTF-8, identical for ASCII strata — size-tied NON-ASCII
    * strata with supplementary-plane characters could order differently,
    * a documented limit of the replay, not of the allocation),
    * stratum i is capped iff
    * `c_i·(k−i+1) ≤ budget − (cum_i − c_i)` AND every smaller stratum
    * is capped (the prefix-AND makes the predicate monotone); uncapped
    * strata get `θ = (budget − Σ capped c) div (#uncapped)` — floor
    * division, the ≤ #strata remainder rows deliberately unallocated.
    *
    * Per-stratum allocation `b` becomes per-row copies: `epochs = b div
    * n` full copies for everyone, plus one more for rows whose md5
    * bucket clears `((b mod n)·10⁶) div n` — so expected copies = b/n
    * and every row's fate is deterministic in its key. Emits every input
    * row with (`n_copies` — 0 = dropped, `budget_alloc` — the stratum's
    * b). Same driver-side rate-table shape and cardinality guard as
    * [[temperatureSample]]. */
  /** The pure allocation math of [[unimaxSample]] — (stratum, n, b) per
    * stratum from the water-filling closed form, extracted so the
    * invariants (budget conservation, epoch cap, one θ, monotonicity in
    * stratum size) are property-testable without a Spark job. EXACTLY
    * the arithmetic the oracle's window functions replay. */
  private[pipeline] def unimaxAllocations(
      counts: Seq[(Option[String], Long)], budget: Long,
      maxEpochs: Int): Seq[(Option[String], Long, Long)] = {
    // ascending by c with DuckDB's tie order (value asc, NULL last)
    val sorted = counts.map { case (s, n) => (s, n, n * maxEpochs) }
      .sortWith { case ((sa, _, ca), (sb, _, cb)) =>
        if (ca != cb) ca < cb
        else (sa, sb) match {
          case (Some(a), Some(b)) => a < b
          case (Some(_), None) => true
          case _ => false
        }
      }
    val k = sorted.length
    var cum = 0L
    var allCapped = true
    val capped = sorted.zipWithIndex.map { case ((_, _, c), i0) =>
      cum += c
      allCapped = allCapped && c * (k - i0) <= budget - (cum - c)
      allCapped
    }
    val p = capped.count(identity)
    val cumP = sorted.zip(capped).collect { case ((_, _, c), true) => c }.sum
    val theta = if (p < k) (budget - cumP) / (k - p) else 0L
    sorted.zip(capped).map { case ((s, n, c), isCapped) =>
      (s, n, if (isCapped) c else theta)
    }
  }

  def unimaxSample(df: DataFrame, keyCol: String, strataCol: String,
                   budget: Long, maxEpochs: Int,
                   maxStrata: Int = 1000): DataFrame =
    unimaxImpl(df, keyCol, strataCol, count(lit(1)), budget, maxEpochs, maxStrata)

  /** [[unimaxSample]] with the budget in SIZE units (tokens, chars,
    * bytes) instead of rows — the paper's own accounting: per-stratum
    * capacity is `Σ sizeCol · maxEpochs`, allocations are size amounts,
    * and each row's copy count makes the stratum's EXPECTED size equal
    * its allocation (`epochs = b div S` copies for everyone plus one
    * more below the `((b mod S)·10⁶) div S` md5 threshold). Rows keep
    * whole — the budget rounds to document boundaries, which is how a
    * real pipeline consumes it. A stratum whose sizes sum to 0 allocates
    * and emits 0 copies. */
  def unimaxSampleBySize(df: DataFrame, keyCol: String, strataCol: String,
                         sizeCol: String, budget: Long, maxEpochs: Int,
                         maxStrata: Int = 1000): DataFrame =
    unimaxImpl(df, keyCol, strataCol,
      coalesce(sum(col(sizeCol)), lit(0L)).cast("long"), budget, maxEpochs,
      maxStrata)

  private def unimaxImpl(df: DataFrame, keyCol: String, strataCol: String,
                         sizeAgg: Column, budget: Long, maxEpochs: Int,
                         maxStrata: Int): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1 (got $maxEpochs)")
    require(maxStrata >= 1, s"maxStrata must be >= 1 (got $maxStrata)")
    val rows = df.groupBy(col(strataCol)).agg(sizeAgg.as("n"))
      .limit(maxStrata + 1).collect()
    require(rows.length <= maxStrata,
      s"unimaxSample: over $maxStrata distinct values in stratum column " +
        s"'$strataCol' — a driver-side allocation table is for " +
        "low-cardinality strata (language, source). For high-cardinality " +
        "strata compute the allocations as a DataFrame and broadcast-join " +
        "them on the stratum column instead.")
    require(rows.nonEmpty, "unimaxSample needs a non-empty frame")
    val alloc = unimaxAllocations(
      rows.map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)),
      budget, maxEpochs)
    def chain(f: ((Option[String], Long, Long)) => Long): Column =
      alloc.foldLeft(lit(-1L)) { case (acc, row @ (s, _, _)) =>
        s match {
          case Some(v) => when(col(strataCol) === v, f(row)).otherwise(acc)
          case None => when(col(strataCol).isNull, f(row)).otherwise(acc)
        }
      }
    // zero-size strata (possible under a size aggregate) allocate nothing
    val epochs = chain { case (_, n, b) => if (n == 0L) 0L else b / n }
    val thr = chain { case (_, n, b) => if (n == 0L) 0L else (b % n) * 1000000L / n }
    val bAlloc = chain { case (_, _, b) => b }
    df.withColumn("budget_alloc", bAlloc)
      .withColumn("n_copies",
        epochs + when(md5Bucket(col(keyCol)) < thr, 1L).otherwise(0L))
  }

  /** DuckDB replay of [[unimaxSample]], GENERATED from the same budget /
    * epoch cap (single source): the identical closed form — ascending
    * (c, stratum) order, prefix-AND capped predicate over exact
    * integers, floor-division θ and per-row copy counts off the same
    * md5 grid. Null-safe stratum join like [[temperatureOracleSql]]. */
  def unimaxOracleSql(table: String, keyCol: String, strataCol: String,
                      budget: Long, maxEpochs: Int,
                      sizeSql: String = "count(*)"): String = {
    s"""WITH src AS (SELECT * FROM $table AS s0),
       |cs AS (SELECT $strataCol, COALESCE($sizeSql, 0) AS n,
       |         COALESCE($sizeSql, 0) * $maxEpochs AS c
       |       FROM src GROUP BY $strataCol),
       |srt AS (SELECT $strataCol, n, c,
       |          row_number() OVER (ORDER BY c, $strataCol) AS i,
       |          sum(c) OVER (ORDER BY c, $strataCol
       |            ROWS UNBOUNDED PRECEDING) AS cum,
       |          count(*) OVER () AS k
       |        FROM cs),
       |cap AS (SELECT *,
       |          min(CASE WHEN c * (k - i + 1) <= $budget - (cum - c)
       |                   THEN 1 ELSE 0 END)
       |            OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) = 1 AS capped
       |        FROM srt),
       |tot AS (SELECT sum(CASE WHEN capped THEN c ELSE 0 END) AS cump,
       |          sum(CASE WHEN capped THEN 1 ELSE 0 END) AS p,
       |          max(k) AS k FROM cap),
       |al AS (SELECT cap.$strataCol, cap.n,
       |         CASE WHEN cap.capped THEN cap.c
       |              ELSE ($budget - tot.cump) // NULLIF(tot.k - tot.p, 0)
       |         END AS b
       |       FROM cap CROSS JOIN tot),
       |r AS (SELECT $strataCol, n, b,
       |        CASE WHEN n = 0 THEN 0 ELSE b // n END AS epochs,
       |        CASE WHEN n = 0 THEN 0 ELSE ((b % n) * 1000000) // n END AS thr
       |      FROM al)
       |SELECT d.$keyCol, d.$strataCol, CAST(r.b AS BIGINT) AS budget_alloc,
       |  CAST(r.epochs + CASE WHEN
       |    ('0x' || substring(md5(CAST(d.$keyCol AS VARCHAR)), 1, 15))::BIGINT % 1000000 < r.thr
       |    THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |FROM src AS d JOIN r ON d.$strataCol IS NOT DISTINCT FROM r.$strataCol""".stripMargin
  }

  /** Per-stratum deterministic sampling — the quota-mixing step of corpus
    * assembly (e.g. downsample web text, keep all books). `rates` maps
    * stratum value -> keep fraction; anything unlisted keeps
    * `defaultRate`. Still a pure filter: the rate table compiles into a
    * CASE expression (sorted for determinism), no join, no shuffle.
    * Same cardinality guard as [[temperatureSample]]: a rate map is a
    * QUOTA table (dozens of entries) — past 1000 entries the CASE chain
    * is pathological, so fail fast and name the broadcast-join path. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    require(rates.size <= 1000,
      s"stratifiedHashSample: ${rates.size} rate entries — a CASE-compiled " +
        "rate table is for low-cardinality strata (<= 1000). For " +
        "high-cardinality strata put the rates in a DataFrame and " +
        "broadcast-join them on the stratum column instead.")
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1] (got $r)"))
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultRate * 1e6))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(math.round(rate * 1e6))).otherwise(acc)
    }
    df.where(md5Bucket(col(keyCol)) < threshold)
  }

  /** Deterministic weighted split assignment (train/valid/test): adds
    * `splitCol` with the FIRST label whose cumulative weight bucket
    * contains the row's md5 bucket. Same guarantees as [[hashSample]]:
    * pure projection (no shuffle, no RNG), reproducible across runs and
    * engines, and NESTED under weight changes the way hash sampling is —
    * growing a split's weight only moves rows in from the next split's
    * range, never reshuffles the whole assignment. */
  def splitByHash(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splitByHash needs at least one (label, weight)")
    splits.foreach { case (_, w) => require(w >= 0.0, s"weights must be >= 0 (got $w)") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1 (got ${splits.map(_._2).sum})")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val bucket = md5Bucket(col(keyCol))
    val label = splits.zip(cum).dropRight(1).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      when(bucket < math.round(hi * 1e6), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** LEAKAGE-SAFE split: all rows of a duplicate group land in the SAME
    * split, so a near-copy of a training document can never sit in the
    * eval set ([[splitByHash]] on the raw id happily splits duplicate
    * pairs across train/test — the classic contamination bug this
    * operator exists to prevent). The group key is the EXACT-duplicate
    * class here (min id per md5(text) digest — one hash-agg + one
    * digest-keyed join-back, both 16-byte keys, scale-safe); for
    * NEAR-duplicate safety feed [[assignSplitByGroup]] a cluster frame
    * from [[NearDupCluster]] instead — same split rule, any grouping. */
  def splitByDupGroup(df: DataFrame, textCol: String, idCol: String,
                      splits: Seq[(String, Double)],
                      splitCol: String = "split"): DataFrame = {
    // NULL text digests to a sentinel, not NULL: the groupBy side keeps
    // a null group but a non-null-safe equi-join would silently DROP
    // those rows from the join-back. All null-text rows form one
    // duplicate class (same convention as [[dupWeights]]).
    val digest = coalesce(md5(col(textCol)), lit("__null_text__"))
    val groups = df.groupBy(digest.as("__digest"))
      .agg(min(col(idCol)).as("__grp"))
    assignSplitByGroup(
      df.withColumn("__digest", digest)
        .join(groups, Seq("__digest")).drop("__digest"),
      "__grp", splits, splitCol).drop("__grp")
  }

  /** SOFT dedup: every row kept, weighted 1/n by its exact-duplicate
    * class size — duplicated CONTENT contributes once in expectation
    * under weighted sampling/loss, while provenance, ordering, and
    * per-copy metadata survive (the alternative to [[graft.pipeline.Dedup
    * .exactDedupRows]]'s hard drop when copies carry signal — e.g.
    * duplication frequency as a quality prior). Adds (n_copies, weight
    * = round(1/n, 6)). Plan: one 16-byte-digest hash-agg + one digest
    * join-back — the [[splitByDupGroup]] shape, scale-safe. For
    * NEAR-duplicate weighting feed [[weightsByGroup]] a cluster frame
    * from [[NearDupCluster]] instead. */
  def dupWeights(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // sentinel digest for NULL text — "every row kept" must include
    // null-text rows, which a non-null-safe join on md5(text) (NULL)
    // would silently drop; they form one duplicate class together
    val digest = coalesce(md5(col(textCol)), lit("__null_text__"))
    val counts = docs.groupBy(digest.as("__digest"))
      .agg(count(lit(1)).as("n_copies"))
    docs.withColumn("__digest", digest)
      .join(counts, Seq("__digest")).drop("__digest")
      .withColumn("weight", round(lit(1.0) / col("n_copies"), 6))
  }

  /** [[dupWeights]] keyed on an arbitrary GROUP column (near-dup cluster
    * id, domain, source): every member of a group weighs 1/|group|.
    * NULL-group rows form one group of their own (null-safe join-back —
    * a plain equi-join would silently drop them while the groupBy side
    * counted them). */
  def weightsByGroup(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_copies"))
      .withColumnRenamed(groupCol, "__grpkey")
    df.join(counts, col(groupCol) <=> col("__grpkey")).drop("__grpkey")
      .withColumn("weight", round(lit(1.0) / col("n_copies"), 6))
  }

  /** Split assignment keyed on an arbitrary GROUP column (cluster id,
    * domain, source shard): the whole group hashes to one split. The
    * composable half of [[splitByDupGroup]] — pair it with
    * [[NearDupCluster.keepOne]]'s cluster ids for near-dup-safe splits,
    * or a domain column for domain-held-out evals. */
  def assignSplitByGroup(df: DataFrame, groupCol: String,
                         splits: Seq[(String, Double)],
                         splitCol: String = "split"): DataFrame =
    splitByHash(df, groupCol, splits, splitCol)

  /** Length-bucketed batch assignment for padded inference/training:
    * documents group into buckets of similar token count
    * (`bucketWidth`-token bands), and each bucket's rows batch in
    * deterministic md5 order, `batchSize` per batch. Batching within a
    * length band bounds padding waste: a batch pads to ITS OWN max
    * length, so the pad fraction is < bucketWidth / bucketFloor rather
    * than corpus-max / doc-length. Returns (row, length bucket, batch
    * index, batch key). One shuffle on the bucket key; parallelism =
    * bucket count x downstream batch partitioning, no global sort. */
  def lengthBucketBatches(df: DataFrame, idCol: String, textCol: String,
                          bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0,
      s"bucketWidth and batchSize must be positive (got $bucketWidth, $batchSize)")
    val w = Window.partitionBy(col("length_bucket"))
      .orderBy(md5Bucket(col(idCol)).asc, col(idCol).asc)
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      // floor of an exact small-int ratio — integer-division semantics in
      // both engines (all values far below 2^53)
      .withColumn("length_bucket", floor(col("n_tokens") / bucketWidth).cast("long"))
      .withColumn("batch_index",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
  }

  /** Quality-WEIGHTED deterministic sampling: each row keeps with its own
    * probability `weightCol` (in [0, 1]) — the importance-sampling step of
    * mixture curation ("keep high-quality docs more often"), still a pure
    * md5-keyed filter: no RNG state, reproducible row-by-row, and a row's
    * fate is monotone in its weight (raising a doc's quality can only
    * keep it). */
  def weightedHashSample(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    // clamp to [0, 1e6] so out-of-range weights behave as drop-all /
    // keep-all instead of silently comparing against garbage; a NULL
    // weight drops the row (NULL comparison is never-true) by contract
    val thresh = least(greatest(round(weight * 1e6).cast("long"), lit(0L)), lit(1000000L))
    df.where(md5Bucket(col(keyCol)) < thresh)
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): select the k raw-corpus documents whose HASHED
    * n-gram profile looks most like a target domain, by importance
    * weights under two bag-of-hashed-ngrams models.
    *
    *  1. Features: unigrams (`u:w`) and adjacent bigrams (`b:w1 w2`),
    *     md5-hashed into `buckets` slots — the fixed-size feature space
    *     is the paper's trick AND the scale contract: both models are
    *     `buckets`-row tables no matter the corpus (where
    *     [[graft.pipeline.TextAnalysis.mooreLewisScore]]'s exact-vocab
    *     LMs grow with distinct tokens).
    *  2. Weights: `log p_target(doc) − log p_raw(doc)` under add-one
    *     smoothed multinomials, per-slot log-ratio snapped to the 1e-6
    *     BIGINT grid so each doc's weight is an exact integer sum of
    *     slot counts × ratios (order-independent, oracle-mirrorable).
    *  3. Resampling: Gumbel-top-k — rank by `weight + Gumbel(0,1)` with
    *     the Gumbel drawn from the doc id's md5 uniform (deterministic,
    *     per-row reproducible), which samples k docs WITHOUT replacement
    *     with probability ∝ exp(weight), the paper's sampled-not-argmax
    *     step that keeps selection diverse instead of clustering on the
    *     target mode. Ranking runs through the [[graft.fuzzy.BoundedTopK]]
    *     heap (map-side partials of k fixed-size entries), never a
    *     corpus-wide sort.
    *
    * Docs with no tokens have no features and drop out (LM-family
    * contract). Raw-model counts come from `df` itself, so every doc
    * feature has a raw-count row; slots the target never saw smooth to
    * `ln(1/(Tt+buckets))`. Emits (idCol, n_features, weight, rank),
    * rank 1 = first pick.
    *
    * Scale shape: the count pass is one explode into a map-side-combined
    * hash-agg on `buckets` keys (shuffle volume = partitions × buckets,
    * never token volume); the fitted log-ratio table — BOUNDED at
    * `buckets` longs by construction, the documented driver-side-table
    * exception like [[temperatureSample]]'s rate table — is then
    * compiled into a LITERAL array, so the scoring pass is a pure
    * codegen projection (one `aggregate` over each doc's own tokens; no
    * join, no second shuffle). Measured 4.8× over the join-the-features
    * formulation at 100× docs (SCALE.md round-10).
    *
    * Lifecycle split (the [[graft.pipeline.ModelExport]] shape):
    * [[dsirFit]] fits once per corpus version (save/load via
    * [[saveDsirModel]]/[[loadDsirModel]]); [[dsirScore]] is the
    * STATELESS APPLY half — a pure projection that runs unchanged on a
    * `readStream` frame (the stateless-gate contract, spec-pinned
    * stream==batch); this method composes fit → score → Gumbel-top-k. */
  def dsirSelect(df: DataFrame, textCol: String, idCol: String,
                 target: DataFrame, targetTextCol: String,
                 k: Int, buckets: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val model = dsirFit(df, textCol, target, targetTextCol, buckets)
    val scored = dsirScore(df, textCol, idCol, model)
      // md5 uniform strictly inside (0,1): (bucket + 0.5) / 1e6
      .withColumn("__u",
        (md5Long60x(concat(lit("dsir:"), col(idCol).cast("string"))) % 1000000L
          + lit(0.5)) / 1e6)
      .withColumn("__key_q",
        col("__w_q") + round(-log(-log(col("__u"))) * 1e6).cast("long"))
    val picked = scored
      .select(col(idCol).cast("long").as(idCol), col("__key_q").cast("double").as("__key"))
      .groupBy(lit(1).as("__g"))
      .agg(graft.fuzzy.vectorFunctions.topk_pairs(col("__key"), col(idCol), k).as("__tk"))
      .select(posexplode(col("__tk")))
      .select(col("col.id").as(idCol), (col("pos") + 1).cast("int").as("rank"))
    scored.join(picked, Seq(idCol))
      .select(col(idCol), col("n_features"),
        round(col("__w_q") / 1e6, 6).as("weight"), col("rank"))
  }

  /** Fitted DSIR importance model: per-slot log-ratio on the 1e-6 grid,
    * slot-indexed over the full `buckets` space. */
  final case class DsirModel(ratiosMicro: Array[Long], buckets: Int)

  private def md5Long60x(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def dsirTokens(tCol: String): Column =
    filter(graft.pipeline.TextAnalysis.tokens(col(tCol)), w => length(w) > 0)

  /** Fit the DSIR importance model: hashed-feature counts of the raw and
    * target corpora → add-one smoothed log-ratio per slot (see
    * [[dsirSelect]]). One distributed count pass per corpus, one bounded
    * collect (≤ `buckets` rows). */
  def dsirFit(df: DataFrame, textCol: String,
              target: DataFrame, targetTextCol: String,
              buckets: Int = 4096): DsirModel = {
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    require(buckets <= (1 << 16),
      s"buckets must be <= 65536 (got $buckets): the fitted ratio table is " +
        "collected and compiled into the scoring projection")
    val m = buckets.toLong
    def featSlots(src: DataFrame, tCol: String): DataFrame = {
      // materialize the token array as a column FIRST: lambdas that
      // reference the raw split expression re-tokenize the text per
      // ELEMENT (measured 14x on the bigram explode — SCALE.md round-10)
      val base = src.select(dsirTokens(tCol).as("__wl"))
      val wlc = col("__wl")
      val bgIdx = when(size(wlc) >= 2, sequence(lit(1), size(wlc) - 1))
        .otherwise(array().cast("array<int>"))
      val uni = base.select(explode(wlc).as("__w"))
        .select(concat(lit("u:"), col("__w")).as("__f"))
      val bi = base.select(explode(transform(bgIdx, i =>
          concat(lit("b:"), element_at(wlc, i.cast("int")), lit(" "),
            element_at(wlc, (i + 1).cast("int"))))).as("__f"))
      uni.union(bi).select((md5Long60x(col("__f")) % m).as("__slot"))
    }
    val rawCnt = featSlots(df, textCol)
      .groupBy(col("__slot")).agg(count(lit(1)).as("__rc"))
    val tgtCnt = featSlots(target, targetTextCol)
      .groupBy(col("__slot")).agg(count(lit(1)).as("__tc"))
    // ONE job and ONE collect (≤ buckets rows); totals derive from the
    // same rows driver-side, so the corpus count passes run once, not
    // once per aggregate. Slots neither corpus hit keep the
    // all-smoothing constant so the array covers the full space
    val cnt = rawCnt.join(tgtCnt, Seq("__slot"), "full").collect()
      .map(r => (r.getLong(0).toInt,
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
    val rt = cnt.map(_._2).sum
    val tt = cnt.map(_._3).sum
    val lrArr = Array.fill(buckets)(
      math.round((math.log(1.0 / (tt + m)) - math.log(1.0 / (rt + m))) * 1e6))
    cnt.foreach { case (slot, rc, tc) =>
      lrArr(slot) = math.round(
        (math.log((tc + 1L).toDouble / (tt + m)) -
          math.log((rc + 1L).toDouble / (rt + m))) * 1e6)
    }
    DsirModel(lrArr, buckets)
  }

  /** The STATELESS apply half: importance weight per document under a
    * fitted [[DsirModel]] — one codegen projection that re-derives the
    * hashed feature slots from the doc's own token array (materialized
    * as a column FIRST, so the lambdas index it O(1) instead of
    * re-splitting per element) and sums the literal ratio table's
    * entries (exact BIGINT arithmetic, order-independent). No shuffle,
    * no state: applies to a `readStream` frame as written. Emits
    * (idCol, n_features, weight, __w_q) — `__w_q` is the exact micro
    * sum downstream selection ranks on. */
  def dsirScore(df: DataFrame, textCol: String, idCol: String,
                model: DsirModel): DataFrame = {
    require(model.ratiosMicro.length == model.buckets,
      s"model has ${model.ratiosMicro.length} ratios for ${model.buckets} buckets")
    val m = model.buckets.toLong
    val lrLit = lit(model.ratiosMicro)
    def slotAt(f: Column): Column = md5Long60x(f) % m
    val wlc = col("__wl")
    val uniSum = aggregate(wlc, lit(0L), (acc, w) =>
      acc + element_at(lrLit, (slotAt(concat(lit("u:"), w)) + 1L).cast("int")))
    val bgIdx = when(size(wlc) >= 2, sequence(lit(1), size(wlc) - 1))
      .otherwise(array().cast("array<int>"))
    val biSum = aggregate(bgIdx, lit(0L), (acc, i) =>
      acc + element_at(lrLit, (slotAt(concat(lit("b:"),
        element_at(wlc, i.cast("int")), lit(" "),
        element_at(wlc, (i + 1).cast("int")))) + 1L).cast("int")))
    df.select(col(idCol), dsirTokens(textCol).as("__wl"))
      .where(size(wlc) > 0)
      .select(col(idCol), (uniSum + biSum).as("__w_q"),
        (size(wlc) + (size(wlc) - 1)).cast("long").as("n_features"))
      .withColumn("weight", round(col("__w_q") / 1e6, 6))
      .select(col(idCol), col("n_features"), col("weight"), col("__w_q"))
  }

  /** Persist / reload a fitted [[DsirModel]] (the
    * [[graft.pipeline.ModelExport]] parquet shape): the saved grid
    * longs ARE the model, so a reload scores bit-identically. */
  def saveDsirModel(model: DsirModel, path: String,
                    spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    Seq((model.ratiosMicro.toSeq, model.buckets))
      .toDF("ratios_micro", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadDsirModel(spark: org.apache.spark.sql.SparkSession,
                    path: String): DsirModel = {
    val r = spark.read.parquet(path).head()
    // collection.Seq: Row.getAs hands back mutable ArraySeq wrappers
    DsirModel(r.getAs[scala.collection.Seq[Long]]("ratios_micro").toArray,
      r.getAs[Int]("buckets"))
  }

  /** Winsorize `numCol` within each group: values clamp to the group's
    * [pLo, pHi] exact interpolated percentiles — per-group outlier
    * trimming that keeps row count (unlike a filter). One tiny percentile
    * aggregate broadcast back onto the rows. */
  def winsorize(df: DataFrame, groupCol: String, numCol: String,
                pLo: Double, pHi: Double,
                outCol: String = "winsorized"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1 (got $pLo, $pHi)")
    val pct = df.groupBy(col(groupCol).as("__grp")).agg(
      percentile(col(numCol), lit(pLo)).as("__lo"),
      percentile(col(numCol), lit(pHi)).as("__hi"))
    // null-safe join like aboveGroupPercentile: a NULL group is still a
    // group (an equi-join would silently delete its rows and break the
    // row-count-preserving contract)
    df.join(broadcast(pct), col(groupCol) <=> col("__grp"))
      // greatest/least SKIP null arguments, so an unguarded NULL
      // measurement would winsorize to __lo; NULL in stays NULL out
      .withColumn(outCol,
        when(col(numCol).isNotNull,
          least(greatest(col(numCol).cast("double"), col("__lo")), col("__hi"))))
      .drop("__grp", "__lo", "__hi")
  }

  /** Fixed-range histogram of `numCol` per group: `nBuckets` equal-width
    * buckets over [lo, hi), under/overflow clamped to the edge buckets —
    * the distribution profile of corpusStats as exact integer bucketing
    * (one hash-agg; floor arithmetic every engine reproduces). */
  def histogram(df: DataFrame, groupCol: String, numCol: String,
                nBuckets: Int, lo: Double, hi: Double): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"need nBuckets > 0 and hi > lo (got $nBuckets, $lo, $hi)")
    val raw = floor((col(numCol).cast("double") - lit(lo)) * nBuckets / lit(hi - lo))
    // NULL measurements are dropped explicitly: greatest/least SKIP null
    // arguments, so an unfiltered NULL would silently tally as bucket 0
    df.where(col(numCol).isNotNull)
      .select(col(groupCol),
        least(greatest(raw, lit(0.0)), lit((nBuckets - 1).toDouble)).cast("long").as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top `k` rows per group by `score` (descending), deterministic ties by
    * `tie` (ascending) — "best N documents per language/domain". One
    * shuffle on the group key; the rank filter cuts inside the window
    * stage, so only k rows per group survive the exchange. */
  def topKPerGroup(df: DataFrame, groupCol: String, score: Column, k: Int,
                   tie: Column): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val w = Window.partitionBy(col(groupCol)).orderBy(score.desc, tie.asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Corpus vocabulary: whitespace tokens with document-wide frequency >=
    * `minCount`. One hash-aggregate shuffle with map-side partial
    * aggregation — the canonical scalable word count; empty tokens (blank
    * documents) are dropped. */
  def vocabulary(df: DataFrame, textCol: String, minCount: Long): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minCount)

  /** Offset-based sequence packing: assign each document to a pack of
    * ~`budgetTokens` tokens for training-batch assembly. Documents are
    * sharded deterministically (md5 of the id), ordered by id within the
    * shard, and a document starting at running offset `off` lands in pack
    * `floor(off / budget)`; `pack_id = shard * 2^31 + packInShard` is
    * globally unique.
    *
    * Semantics: contiguous fill without splitting documents, so a pack can
    * exceed the budget by at most one document's overhang (the standard
    * approximation when exact bin packing isn't worth a sequential scan).
    * Scale: parallelism = `numShards` — each shard's window is an
    * independent sort of corpus/numShards rows, so at 100 TB you raise
    * `numShards` until a shard fits an executor (there is no global sort
    * and no single-partition window anywhere). */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
                    budgetTokens: Long, numShards: Int): DataFrame = {
    require(budgetTokens > 0 && numShards > 0,
      s"budgetTokens and numShards must be positive (got $budgetTokens, $numShards)")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", md5Bucket(col(idCol)) % numShards)
      .withColumn("__tok", tokenCount.cast("long"))
      .withColumn("pack_off", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("pack_id",
        col("shard") * lit(2147483648L) + floor(col("pack_off") / budgetTokens))
      .drop("__tok")
  }

  /** Corpus-wide adjacent-token-pair counts — the inner step of BPE/
    * WordPiece tokenizer training (each merge round picks the most
    * frequent pair; at 100 TB this count IS the distributed bottleneck).
    * Counts OCCURRENCES (not distinct-per-doc): one narrow projection +
    * explode + a single map-side-combined hash-agg, the same plan as
    * [[vocabulary]]. */
  def bpePairCounts(df: DataFrame, textCol: String, minCount: Long = 1L): DataFrame = {
    // token array materialized as a column first — a lambda referencing
    // the raw split re-tokenizes per ELEMENT (the dsirSelect 14x trap)
    val toks = col("__t")
    // guard: Spark's sequence(1, 0) runs DESCENDING instead of empty
    val pairs = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    df.select(split(lower(trim(col(textCol))), "\\s+").as("__t"))
      .select(explode(pairs).as("pair"))
      .where(length(col("pair")) > 1) // both tokens non-empty
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minCount)
  }

  /** EXACTLY `n` rows per group (fewer if the group is smaller), chosen
    * deterministically by md5 of the key — the quota form of
    * [[hashSample]] ("keep 10k docs per domain"), reproducible across
    * runs and engines with no RNG state. One shuffle on the group key;
    * the rank filter cuts inside the window stage (WindowGroupLimit), so
    * only ~n rows per group survive to the output. */
  def hashSampleN(df: DataFrame, keyCol: String, groupCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= n)
      .drop("__rk")
  }

  /** Split each document into overlapping token windows — the standard
    * train-prep chunker (context-window-sized pieces, `overlap` tokens of
    * continuity between neighbors). Chunks start every
    * `chunkTokens - overlap` tokens; the last chunk may be short.
    *
    * One narrow codegen'd projection (split → slice per chunk) + explode:
    * no shuffle at all, parallelism is the scan's. Returns (idCol,
    * chunk_index, n_chunk_tokens, chunk_text). */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
                  chunkTokens: Int, overlap: Int): DataFrame =
    chunkStream(df, textCol, Seq(col(idCol)), chunkTokens, overlap)
      .select(col(idCol), col("chunk_index"),
        size(split(col("chunk_text"), "\\s+")).cast("long").as("n_chunk_tokens"),
        col("chunk_text"))

  /** THE chunk construction, shared by every chunk operator (batch
    * chunking, chunk dedup + rebuild, streaming chunk dedup) so their
    * canonicalization (trim/lower/split) and slice semantics can never
    * drift apart — digest parity between the batch and streaming dedup
    * depends on byte-identical chunks. `passThrough` columns ride the
    * explode; output adds (n_total, chunk_index, chunk_text). */
  private[graft] def chunkStream(df: DataFrame, textCol: String,
                                 passThrough: Seq[Column],
                                 chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens (got $chunkTokens, $overlap)")
    val stride = chunkTokens - overlap
    // Tokenize ONCE per document into a materialized attribute. Writing
    // `split(...)` directly inside the transform lambda inlines the regex
    // split into the lambda body, re-splitting the FULL text once per
    // chunk — O(doc_len * n_chunks): a 5 MB document took minutes in a
    // single task. The token array is referenced more than once below
    // (size + lambda), so CollapseProject keeps it a real attribute and
    // the split runs once per row; chunk text bytes are unchanged
    // (digest parity with the streaming dedup preserved).
    val tokCol = "__graft_toks"
    val base = df.select((passThrough :+
      split(lower(trim(col(textCol))), "\\s+").as(tokCol)): _*)
    val keep = base.columns.filter(_ != tokCol).map(col)
    val nChunks = floor((size(col(tokCol)) - 1) / stride) + 1
    // n_total is computed BEFORE the explode so the token array does not
    // ride through the Generate output (it is pruned there instead of
    // being copied into every chunk row)
    val staged = base.select((keep :+ nChunks.cast("long").as("n_total")) :+ col(tokCol): _*)
    staged.select(keep ++ Seq(col("n_total"),
        posexplode(transform(
          sequence(lit(0L), col("n_total") - 1),
          i => concat_ws(" ", slice(col(tokCol), (i * stride + 1).cast("int"),
            lit(chunkTokens)))))): _*)
      .withColumn("chunk_index", col("pos").cast("long"))
      .withColumnRenamed("col", "chunk_text")
      .drop("pos")
  }

  /** 128-bit digest of a chunk row's text — the shuffle/state key of the
    * chunk-dedup family (one definition, same reason as [[chunkStream]]). */
  private[graft] def chunkDigest: Column = md5(encode(col("chunk_text"), "UTF-8"))

  /** Deterministic sampling to a TOKEN budget ("train on ~N tokens"):
    * documents take a stable md5 order and accumulate until the budget
    * is reached — but the order and the running sum live WITHIN md5
    * shards, each owning `budget / shards` tokens, so the plan is one
    * shard-keyed exchange plus per-shard windows (the [[shuffleShard]]
    * scale shape) and never a corpus-wide sort. A row is kept while its
    * shard's running total BEFORE it is under the shard budget, so
    * shards overshoot by at most one document — the budget is
    * approximate by ±(shards × max doc tokens), which is the price of
    * not sorting the world; tighten with more shards only if documents
    * are small. Deterministic for a fixed corpus and budget. */
  def sampleToTokenBudget(df: DataFrame, textCol: String, idCol: String,
                          budgetTokens: Long, shards: Int = 64): DataFrame = {
    require(budgetTokens > 0 && shards > 0, "budget and shards must be positive")
    val perShard = math.max(1L, budgetTokens / shards)
    val toks = size(filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__shard", md5Bucket(col(idCol)) % shards)
      .withColumn("__ord", md5(concat(lit("tb:"), col(idCol).cast("string"))))
      .withColumn("__n", toks)
      .withColumn("__before", coalesce(sum(col("__n")).over(w), lit(0L)))
      .where(col("__before") < perShard)
      .drop("__ord", "__n", "__before")
      .withColumnRenamed("__shard", "token_budget_shard")
  }

  /** Content-defined chunking (CDC): boundaries fall after tokens whose
    * hash is divisible by `avgTokens` ([[graft.fuzzy.VectorKernels
    * .cdcChunks]]), so an edit shifts NO chunk boundary downstream of
    * itself — where the fixed-window [[chunkStream]] re-cuts every
    * chunk after an insertion, CDC keeps them byte-identical, which is
    * what makes chunk-digest dedup ([[graft.pipeline.Dedup.chunkDedup]])
    * stable across document versions. One narrow projection + one
    * explode; expected chunk length ~`avgTokens` tokens. Emits
    * (id, chunk_index, n_tokens, chunk_md5) — digests, not text, like
    * the incremental-dedup state tables. */
  def cdcChunkDocs(df: DataFrame, textCol: String, idCol: String,
                   avgTokens: Int): DataFrame = {
    require(avgTokens > 0, s"avgTokens must be positive (got $avgTokens)")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    df.select(col(idCol),
        posexplode(graft.fuzzy.vectorFunctions.cdc_chunks(toks, avgTokens)))
      .select(col(idCol), col("pos").cast("long").as("chunk_index"),
        size(split(col("col"), " ")).cast("long").as("n_tokens"),
        md5(encode(col("col"), "UTF-8")).as("chunk_md5"))
  }

  /** Keep rows at or above their group's p-th percentile of `numCol` —
    * relative statistical filtering ("drop the shortest half per
    * language"), which adapts to each group's distribution where a
    * global threshold over- or under-prunes small languages. The
    * per-group EXACT percentile table is tiny (one row per group) and
    * broadcast back; cost is the one groupBy shuffle. */
  def aboveGroupPercentile(df: DataFrame, groupCol: String, numCol: String,
                           p: Double): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"p must be in [0,1] (got $p)")
    val thr = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($numCol, $p)").as("__thr"))
      .withColumnRenamed(groupCol, "__grp")
    // null-safe join: a NULL group is still a group (groupBy keeps it, an
    // equi-join would silently delete its rows from the output)
    df.join(broadcast(thr), col(groupCol) <=> col("__grp"))
      .where(col(numCol) >= col("__thr"))
      .drop("__grp", "__thr")
  }

  /** Deterministic global shuffle + shard assignment for training-data
    * export: every row gets a `shard` in [0, numShards) and a contiguous
    * 1-based `shard_pos` within its shard, ordered by the md5 of the key
    * — the "shuffle the corpus, write N shard files, stream them in
    * order" step at the end of every curation pipeline.
    *
    * Scale design: there is NO global sort and no single-reducer
    * bottleneck. The shard is a pure md5 projection (uniform across
    * shards by construction), and the position is a per-shard
    * `row_number` — one shuffle on the shard key, parallelism =
    * numShards. Each shard's sort buffers only corpus/numShards rows;
    * size numShards so a shard fits an executor (at 100 TB and 10k
    * shards that is 10 GB/shard — spill-safe). Reproducible across runs,
    * engines and partitionings: the order key is
    * (md5(key), key) — a total order, so `shard_pos` is unique even
    * under md5 collisions. */
  def shuffleShard(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive (got $numShards)")
    val hex = md5(col(keyCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(hex.asc, col(keyCol).asc)
    df.withColumn("shard", (md5Bucket(col(keyCol)) % numShards).cast("long"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** Materialize [[shuffleShard]] as the final training-export layout:
    * one parquet directory per shard (`shard=N/`), ONE file per shard,
    * rows inside each file in `shard_pos` (md5-shuffle) order — so a
    * trainer streams `shard=K` front-to-back and sees the deterministic
    * global shuffle with zero read-time work. `repartition(col)` before
    * `partitionBy` keeps parallel writers from splintering a shard
    * across task files (same discipline as
    * [[graft.util.PartitionedTables.writeDayPartitioned]]);
    * `sortWithinPartitions` is a partition-local sort of corpus/numShards
    * rows, never a global one. */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int,
                  path: String): Unit =
    shuffleShard(df, keyCol, numShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** Deterministic weighted interleave for the final training order:
    * rows from each source appear in every shard's stream at a rate
    * proportional to `weights(source)` — the mixture SCHEDULE, where
    * [[stratifiedHashSample]] is the mixture QUOTA. Classic stride
    * scheduling: within (shard, source) rows take md5-ordered sequence
    * numbers, each row's stride is `seq / weight`, and the shard's
    * stream orders by stride — a source with twice the weight lands
    * twice as often in any prefix. Sources absent from `weights` are
    * EXCLUDED (the schedule mixes exactly what it was given).
    *
    * Scale design: same skeleton as [[shuffleShard]] — shard is a pure
    * md5 projection, both windows partition by the shard (x source), so
    * parallelism is numShards and no global sort exists. Deterministic
    * across engines: stride is one IEEE division of exact small ints,
    * ties break on (source, md5, key) — a total order. */
  def interleaveShards(df: DataFrame, keyCol: String, sourceCol: String,
                       weights: Map[String, Double], numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive (got $numShards)")
    require(weights.nonEmpty, "interleaveShards needs at least one (source, weight)")
    weights.foreach { case (s, w) =>
      require(w > 0.0, s"weights must be > 0 (source $s got $w)") }
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (s, wt)) => when(col(sourceCol) === s, lit(wt)).otherwise(acc)
    }
    val hex = md5(col(keyCol).cast("string"))
    val seqW = Window.partitionBy(col("shard"), col(sourceCol))
      .orderBy(hex.asc, col(keyCol).asc)
    val posW = Window.partitionBy(col("shard"))
      .orderBy(col("__stride").asc, col(sourceCol).asc, hex.asc, col(keyCol).asc)
    df.where(col(sourceCol).isin(weights.keySet.toSeq: _*))
      .withColumn("shard", (md5Bucket(col(keyCol)) % numShards).cast("long"))
      .withColumn("__stride", row_number().over(seqW).cast("double") / w)
      .withColumn("interleave_pos", row_number().over(posW).cast("long"))
      .drop("__stride")
  }

  /** Per-group corpus profile: row count, total and mean size, and EXACT
    * p50/p90 of `numCol` — the summary a curation run publishes per
    * (language, source) slice before and after each filter stage.
    *
    * Exact `percentile` (not `percentile_approx`): group cardinality here
    * is languages × sources (tiny), while group SIZE is what grows with
    * the corpus — and exact percentile is a single sort-based aggregation
    * per group, the same shuffle the count/sum already pay. Both engines
    * interpolate at `p * (n-1)`, so the oracle compares bit-for-bit after
    * rounding. For high-cardinality grouping (per-domain over the whole
    * web) switch to `percentile_approx`, which trades the per-group sort
    * for a fixed-size sketch. */
  def corpusStats(df: DataFrame, groupCols: Seq[String], numCol: String): DataFrame = {
    require(groupCols.nonEmpty, "corpusStats needs at least one group column")
    val n = col(numCol)
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(n).cast("long").as("total"),
      round(avg(n), 4).as("mean"),
      round(expr(s"percentile($numCol, 0.5)"), 4).as("p50"),
      round(expr(s"percentile($numCol, 0.9)"), 4).as("p90"),
      min(n).cast("long").as("min_v"),
      max(n).cast("long").as("max_v"))
  }

  /** Row-level diff between two corpus versions (the nightly question
    * "what changed since the last snapshot?"): one row per id present in
    * either side with `status` ∈ added / removed / changed / unchanged,
    * judged by an md5 digest over `payloadCols` (concat_ws on a U+0001
    * separator so adjacent columns cannot alias; both engines skip nulls
    * identically). Two caveats a caller with adversarial payloads should
    * know: a value CONTAINING U+0001 can still alias across the column
    * boundary, and a null column is indistinguishable from an absent one
    * (concat_ws skips both) — pre-escape or add a presence column if
    * either matters for the corpus at hand. `idCol` is assumed unique
    * per snapshot (the corpus contract everywhere in this library); a
    * duplicated id fans out the full outer join into multiple, possibly
    * conflicting, status rows for that id — dedup first if the snapshot
    * may be dirty.
    *
    * Scale design: each side reduces to `(id, 16-byte digest)` BEFORE the
    * join, so the payload never crosses an exchange and the full outer
    * join shuffles two narrow frames on the id key — the layout
    * [[graft.util.BucketedTables]] makes exchange-free when both
    * snapshots are bucketed by id. Text comparison is digest equality:
    * constant-width regardless of document size. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "corpusDiff needs at least one payload column")
    def digested(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol),
        md5(concat_ws("\u0001", payloadCols.map(col): _*)).as(name))
    digested(oldDf, "__od").join(digested(newDf, "__nd"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__od").isNull, lit("added"))
          .when(col("__nd").isNull, lit("removed"))
          .when(col("__od") === col("__nd"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Right-to-be-forgotten cascade audit: given a parent corpus, a forget
    * list of parent ids, and the derived artifacts that reference parents
    * by foreign key (chunk tables, embedding tables, index postings…),
    * reports per artifact how many rows the cascade deletes and how many
    * remain — plus `orphans`, the remaining child rows whose parent no
    * longer exists after the delete (MUST be 0 when the forget list and
    * the cascade are consistent; a nonzero row is the audit catching an
    * artifact that was not rebuilt). Row-level deletion itself is
    * [[forget]]; this is the audit frame a compliance job persists.
    *
    * Scale: per artifact one LEFT SEMI membership probe against the forget
    * list (broadcast — forget lists are bounded) aggregated to exact
    * counts, and for the orphan check one left anti join of the remaining
    * children against remaining parents on the id key. Nothing wide ever
    * shuffles. */
  def forgetAudit(parent: DataFrame, idCol: String, forgetIds: DataFrame,
                  children: Seq[(String, DataFrame, String)]): DataFrame = {
    val fids = broadcast(forgetIds.select(col(idCol)).distinct())
    val keptParents = parent.join(fids, Seq(idCol), "left_anti")
      .select(col(idCol)).distinct()

    def audit(name: String, df: DataFrame, fk: String,
              checkOrphans: Boolean): DataFrame = {
      val flagged = df.select(col(fk).as(idCol))
        .join(fids.withColumn("__forget", lit(1)), Seq(idCol), "left")
      // coalesce: sum over an EMPTY artifact is null, and total - null
      // would poison the remaining column of the persisted audit
      val counts = flagged.agg(
        count(lit(1)).as("total"),
        coalesce(sum(when(col("__forget").isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("forgotten"))
      val orphans =
        if (!checkOrphans) counts.withColumn("__orphans", lit(0L))
        else {
          val o = df.select(col(fk).as(idCol))
            .join(fids, Seq(idCol), "left_anti")
            .join(keptParents, Seq(idCol), "left_anti")
            .agg(count(lit(1)).as("__orphans"))
          counts.crossJoin(broadcast(o))
        }
      orphans.select(lit(name).as("artifact"), col("total"),
        col("forgotten"), (col("total") - col("forgotten")).as("remaining"),
        col("__orphans").as("orphans"))
    }

    val parentAudit = audit("__parent__", parent, idCol, checkOrphans = false)
    children.foldLeft(parentAudit) { case (acc, (name, df, fk)) =>
      acc.unionByName(audit(name, df, fk, checkOrphans = true))
    }
  }

  /** The cascade itself: parent and every child with forget-listed parents
    * removed, as left anti joins on the (broadcast) forget list.
    *
    * Artifact classes — what an anti-join can and cannot clean:
    * ROW-KEYED artifacts (chunk tables, embedding rows, minhash state,
    * IVF postings) carry one row per parent and are fully cleaned here.
    * AGGREGATE artifacts bake cross-document statistics into their rows
    * and need a REBUILD from the kept corpus instead: a BM25 index row
    * holds df and the corpus dl/N, an n-gram census holds doc_count and
    * first_doc — anti-joining their rows by id (or not at all) leaves
    * statistics that still count the forgotten documents. The audit
    * cannot see that staleness; schedule index/census rebuilds with the
    * forget batch. Exception: the BM25 index decrements EXACTLY from its
    * own deleted rows — [[graft.pipeline.TextAnalysis.bm25Forget]] — so
    * route it there instead of rebuilding. */
  def forget(parent: DataFrame, idCol: String, forgetIds: DataFrame,
             children: Seq[(String, DataFrame, String)]): (DataFrame, Seq[(String, DataFrame)]) = {
    val fids = broadcast(forgetIds.select(col(idCol)).distinct())
    (parent.join(fids, Seq(idCol), "left_anti"),
      children.map { case (name, df, fk) =>
        name -> df.join(fids.withColumnRenamed(idCol, fk), Seq(fk), "left_anti")
      })
  }

  /** Domain-granular robots.txt compliance gate (VERDICT r17 item 1) —
    * the production shape of [[Robots.allowed]]: a crawl stream carries
    * MILLIONS of paths per domain, and the per-row expression re-parses
    * the same robots.txt for every one of them. This gate parses each
    * domain's robots.txt ONCE — [[Robots.rules]] runs on the
    * deduplicated `(domain, robots_txt)` side — and joins the
    * pre-parsed `(pattern, allow)` rule arrays back to the page
    * stream, where [[Robots.rulesAllowed]] is just the RFC 9309
    * longest-pattern walk (no parse, no group selection) per row.
    *
    * Returns `pages` with an `allowed` BOOLEAN column appended. Pages
    * whose domain has no robots row are allowed (RFC 9309 §2.3.1:
    * unreachable/absent robots.txt = allow-all) — the left-join miss
    * yields a null rule array, which the walk treats as allow-all.
    *
    * Scale: the robots side dedups to one row per domain (a rule array
    * of a few hundred bytes), so even a full-web crawl's ~1e8 domains
    * broadcast in low GBs; `broadcastRobots = false` falls back to a
    * domain-keyed shuffle join for robots frames past broadcast size
    * (the page stream then shuffles on domain — co-locate by bucketing
    * pages on `domainCol` to keep that one-sided).
    *
    * Feed ONE canonical fetch per domain. If the frame carries several
    * DIFFERENT texts for a domain (stale + re-fetch), the gate picks the
    * lexicographic max — an arbitrary but DETERMINISTIC choice, so the
    * same input always yields the same verdicts (an unordered "first"
    * would flip verdicts run to run under shuffle nondeterminism);
    * resolve multi-fetch frames upstream (e.g. latest by fetch time). */
  def robotsGate(pages: DataFrame, robots: DataFrame, agent: String,
                 domainCol: String = "domain", pathCol: String = "path",
                 robotsTxtCol: String = "robots_txt",
                 broadcastRobots: Boolean = true): DataFrame = {
    val rulesCol = "__robots_rules"
    val parsed = robots
      .groupBy(col(domainCol))
      .agg(Robots.rules(max(col(robotsTxtCol)), lit(agent)).as(rulesCol))
    val dim = if (broadcastRobots) broadcast(parsed) else parsed
    pages.join(dim, Seq(domainCol), "left")
      .withColumn("allowed", Robots.rulesAllowed(col(rulesCol), col(pathCol)))
      .drop(rulesCol)
  }
}
