package graft.fuzzy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native fuzzy join.
  *
  * Same observable semantics as the reference's `fuzzy_match_dfs`
  * (matcher.py:661-722): for an ordered list of [[FuzzyMapping]]s, return
  * every (left row, right row) pair whose per-mapping similarity meets each
  * mapping's threshold, with the full payload of both sides plus one score
  * column per mapping, in column order `left ++ right(renamed) ++ scores`.
  *
  * The execution design is Spark-first rather than a translation:
  *
  *  - row identity via `monotonically_increasing_id` + `localCheckpoint`
  *    (the reference caches indexed frames to Arrow IPC, matcher.py:395-416;
  *    checkpointing freezes the id assignment and cuts lineage);
  *
  *  - "score each distinct string pair exactly once" — the reference's key
  *    algorithmic optimization — is realized RELATIONALLY: score the
  *    distinct-value cartesian/LSH candidates, then hash-join the surviving
  *    (value, value, score) pairs back to the row sides. The reference
  *    instead aggregates row-id lists per value and double-explodes them
  *    after scoring (process.py:59-111,150-155); that shape materializes a
  *    per-value-pair cross product of id lists, which is quadratic in group
  *    size and blows up on low-cardinality keys. Joins keep every
  *    intermediate bounded by the true output size and scale horizontally;
  *
  *  - scoring runs as a codegen'd Catalyst expression inside the candidate
  *    join, so the cartesian stream is filtered inside WholeStageCodegen and
  *    never materialized;
  *
  *  - strategy selection (exact cross join vs MinHash-LSH candidates) from
  *    the distinct-value cartesian estimate, constants preserved from
  *    matcher.py:250,322;
  *
  *  - multi-pass fold where pass N's matches gate pass N+1's candidates
  *    (matcher.py:507-577), each pass checkpointed because it is consumed
  *    at least twice (next pass + final combine).
  */
object FuzzyMatcher {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val LeftIdx = "__left_index"
  private val RightIdx = "__right_index"

  /** Full fuzzy join (the reference's `fuzzy_match_dfs`). Lazy result. */
  def matchDfs(left: DataFrame, right: DataFrame, maps: Seq[FuzzyMapping],
               opts: MatchOptions = MatchOptions.default): DataFrame = {
    require(maps.nonEmpty, "at least one FuzzyMapping is required")
    val plan = PreProcess.run(left, right, maps, runStats = opts.runPreprocess)
    val outputOrder: Seq[String] =
      plan.left.columns.toSeq ++ plan.right.columns.toSeq ++ plan.maps.map(_.resolvedOutputName)

    // The two index materializations are independent jobs — run them
    // concurrently (guide §2.6); ids stay per-side deterministic because
    // each side's checkpoint freezes its own assignment exactly as before.
    val (leftIdx, rightIdx) = graft.util.Par.run2(
      addIndexColumn(plan.left, LeftIdx, opts.checkpoint),
      addIndexColumn(plan.right, RightIdx, opts.checkpoint))

    val matchFrames = performAllFuzzyMatches(leftIdx, rightIdx, plan.maps, opts)
    // single mapping: no combine join needed (matcher.py:642-647)
    val allMatches =
      if (matchFrames.size == 1) matchFrames.head else combineMatches(matchFrames)

    leftIdx.join(allMatches, LeftIdx)
      .join(rightIdx, RightIdx)
      .drop(LeftIdx, RightIdx)
      .select(outputOrder.map(col): _*)
  }

  /** Static-side preparation for repeated matching against a fixed corpus —
    * the stream-static shape (one reference frame, many small batches).
    *
    * Everything `matchDfs` derives from the right side alone runs ONCE here:
    * the structural `_right` renames (computed against the caller's fixed
    * left schema), row-id assignment + materialization under
    * `opts.checkpoint`, the row count, and the per-mapping-column
    * approx-distinct (HLL) statistics. [[matchDfsWithPreparedRight]] then
    * spends per-call Spark actions only on the left side; the right side is
    * consumed exclusively through the materialized barrier.
    *
    * `rightIdxDeduped` backs the aggregation heuristic for batches whose
    * joint uniqueness triggers it: built lazily on first use and reused by
    * every later batch (in the one-shot path the dedup runs before
    * indexing; here it runs on the indexed frame — same surviving value
    * set, and which duplicate row survives is arbitrary in both engines).
    */
  final case class PreparedRight private[fuzzy] (
      rightIdx: DataFrame,
      rightLen: Long,
      rightDistinct: Map[String, Long],
      renames: Map[String, String],
      leftCols: Seq[String],
      maps: Seq[FuzzyMapping],
      opts: MatchOptions) {
    lazy val rightIdxDeduped: DataFrame = graft.util.Materialize(
      rightIdx.dropDuplicates(maps.map(_.rightCol).distinct), opts.checkpoint)
  }

  /** Build a [[PreparedRight]]. `leftCols` is the (fixed) schema of the
    * batches that will be matched — the structural renames depend on it.
    * Stats (count + HLL scan) run only when `opts.runPreprocess` is set;
    * the count lands on the already-materialized frame. */
  def prepareRight(leftCols: Seq[String], right: DataFrame, maps: Seq[FuzzyMapping],
                   opts: MatchOptions = MatchOptions.default): PreparedRight = {
    require(maps.nonEmpty, "at least one FuzzyMapping is required")
    // mid-level fallback names resolve from the ORIGINAL columns, before the
    // structural renames (same order as PreProcess.run)
    var ms = maps
    if (!opts.runPreprocess)
      ms = ms.map(m => m.copy(outputColumnName = Some(m.resolvedOutputName)))
    val renames = NameUtils.renameRightColumns(leftCols, right.columns.toSeq)
    ms = NameUtils.renameMappingRightCols(ms, renames)
    val rRenamed = renames.foldLeft(right) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
    val rightIdx = addIndexColumn(rRenamed, RightIdx, opts.checkpoint)
    val (len, stats) =
      if (opts.runPreprocess)
        PreProcess.statScan(rightIdx, ms.map(_.rightCol))
      else (-1L, Map.empty[String, Long])
    PreparedRight(rightIdx, len, stats, renames, leftCols.toVector, ms, opts)
  }

  /** [[matchDfs]] against a [[PreparedRight]]: identical observable
    * semantics (spec-asserted), but per-call work on the right side is zero
    * — stats come injected, the row index is frozen, and every scan hits
    * the materialization barrier instead of the source. */
  def matchDfsWithPreparedRight(left: DataFrame, prepared: PreparedRight): DataFrame = {
    val opts = prepared.opts
    require(left.columns.toSet == prepared.leftCols.toSet,
      s"left schema ${left.columns.mkString(",")} does not match the schema " +
        s"the right side was prepared against (${prepared.leftCols.mkString(",")})")
    var l = left
    var ms = prepared.maps
    var rightIdx = prepared.rightIdx
    if (opts.runPreprocess) {
      // one fused count+HLL scan over the batch (PreProcess.statScan) —
      // the per-batch planning cost is a single small job
      val (leftLen, leftStats) = PreProcess.statScan(l, ms.map(_.leftCol))
      if (leftLen > 0 && prepared.rightLen > 0) {
        ms = PreProcess.fillPercUniqueFromStats(leftStats, prepared.rightDistinct,
          ms, leftLen, prepared.rightLen)
        ms = PreProcess.orderMaps(ms)
        PreProcess.reportOnOrder(ms)
        val cartesian = leftLen.toDouble * prepared.rightLen.toDouble
        if (PreProcess.needsAggregation(PreProcess.uniquenessRate(ms), cartesian)) {
          log.info("Low uniqueness rate on a large cartesian — deduplicating " +
            "the batch and routing to the deduplicated static side")
          l = l.dropDuplicates(ms.map(_.leftCol).distinct)
          rightIdx = prepared.rightIdxDeduped
        }
      }
      ms = NameUtils.setNamesInMappings(ms)
    }
    val outputOrder: Seq[String] = l.columns.toSeq ++
      prepared.rightIdx.columns.toSeq.filterNot(_ == RightIdx) ++ ms.map(_.resolvedOutputName)

    val leftIdx = addIndexColumn(l, LeftIdx, opts.checkpoint)
    val matchFrames = performAllFuzzyMatches(leftIdx, rightIdx, ms, opts)
    val allMatches =
      if (matchFrames.size == 1) matchFrames.head else combineMatches(matchFrames)
    leftIdx.join(allMatches, LeftIdx)
      .join(rightIdx, RightIdx)
      .drop(LeftIdx, RightIdx)
      .select(outputOrder.map(col): _*)
  }

  /** Eager variant of [[matchDfs]] — the reference's `fuzzy_match_dfs`
    * COLLECTS its result (matcher.py:717); the Spark analog materializes the
    * join under the configured checkpoint strategy so every downstream
    * consumer reuses the computed result instead of re-running the
    * multi-pass plan. */
  def matchDfsEager(left: DataFrame, right: DataFrame, maps: Seq[FuzzyMapping],
                    opts: MatchOptions = MatchOptions.default): DataFrame =
    graft.util.Materialize(matchDfs(left, right, maps, opts), opts.checkpoint)

  /** Scoped barrier lifecycle — the reference's `fuzzy_match_temp_dir`
    * context manager (matcher.py:725-750) restated for Spark: every
    * materialization barrier taken inside `body` (pass checkpoints, index
    * frames, the eager result) is released when `body` exits — local
    * blocks unpersist, reliable checkpoint files delete. Consume the
    * result inside the scope (write/collect), exactly as the reference
    * requires you to copy results out of its temp dir before the context
    * closes. See [[graft.util.MatchScope]]. */
  def withMatchScope[A](body: => A): A =
    graft.util.MatchScope.withMatchScope(body)

  /** [[withMatchScope]] plus a managed temp checkpoint directory: hands
    * `body` a [[graft.util.CheckpointStrategy.Reliable]] rooted in a fresh
    * temp dir (put it in `MatchOptions.checkpoint`) and deletes the whole
    * directory on exit — full `fuzzy_match_temp_dir` parity including the
    * `shutil.rmtree` (matcher.py:725-750). */
  def withTempMatchDir[A](parent: String = System.getProperty("java.io.tmpdir"))
                         (body: graft.util.CheckpointStrategy.Reliable => A): A =
    graft.util.MatchScope.withTempMatchDir(parent)(body)

  /** Inject a stable row id. Checkpointed immediately: like the reference's
    * IPC cache (matcher.py:416) this freezes the id assignment so every
    * downstream consumer sees the same values. Checkpointing (not
    * `persist`) is deliberate — it cuts lineage at the RDD level, so the
    * many dependent intermediates of a multi-pass match never build a
    * dependent-cache graph in CacheManager (whose rebuild path breaks when
    * sequential queries share cached sub-plans). The strategy picks local
    * blocks (fast, no fault tolerance) vs a reliable checkpoint dir. */
  def addIndexColumn(df: DataFrame, name: String,
                     checkpoint: graft.util.CheckpointStrategy =
                       graft.util.CheckpointStrategy.Local): DataFrame =
    graft.util.Materialize(df.withColumn(name, monotonically_increasing_id()), checkpoint)

  /** Distinct non-null values of the match column (the unit of scoring). */
  def distinctValues(df: DataFrame, valueCol: String): DataFrame =
    df.where(col(valueCol).isNotNull).select(col(valueCol)).distinct()

  /** Score candidate value pairs: lowercase both sides, keep pairs whose
    * normalized distance is within the (truncated) reversed threshold, flip
    * distance to similarity (calculate_fuzzy_score, process.py:8-56).
    * Input and output are value-level: (leftVal, rightVal) -> + score `s`.
    *
    * Performance shape: lowercasing happens in projections BEFORE the
    * candidate join (once per distinct value, not once per pair), and the
    * kernel is the thresholded [[BoundedFuzzyDistance]] — length-bound
    * pruning plus a banded DP, exact for every surviving pair. */
  def scoreValuePairs(candidates: DataFrame, leftCol: String, rightCol: String,
                      algo: FuzzyAlgorithm, reversedThreshold: Double): DataFrame = {
    val ll = lowerName(leftCol)
    val rl = lowerName(rightCol)
    val withLower = candidates
      .withColumn(ll, if (candidates.columns.contains(ll)) col(ll) else lower(col(leftCol)))
      .withColumn(rl, if (candidates.columns.contains(rl)) col(rl) else lower(col(rightCol)))
    val kernel: Column =
      functions.fuzzy_dist_bounded(col(ll), col(rl), algo, reversedThreshold)
    // Mask pre-gate (levenshtein only): when the candidate frame carries
    // per-value char masks + lengths (projected once per distinct value by
    // exactCandidates), pairs provably beyond the threshold short-circuit
    // on xor + popcount instead of entering the DP kernel —
    // bitCount(maskA ^ maskB) <= 2 * distance (VectorKernels.charMask), so
    // bitCount > 2k => distance > k. Mask 0 (non-ASCII/empty) disables the
    // gate for that pair; the kernel result is unchanged either way, the
    // gate only replaces a subset of over-threshold results with 2.0 —
    // indistinguishable under the `<= reversedThreshold` filter.
    val lm = maskName(leftCol)
    val rm = maskName(rightCol)
    val lm2 = mask2Name(leftCol)
    val rm2 = mask2Name(rightCol)
    val lLen = lenName(leftCol)
    val rLen = lenName(rightCol)
    val canGate = algo == FuzzyAlgorithm.Levenshtein &&
      Seq(lm, rm, lm2, rm2, lLen, rLen).forall(withLower.columns.contains)
    val dist: Column =
      if (!canGate) kernel
      else {
        val kPair = floor(lit(reversedThreshold) *
          greatest(col(lLen), col(rLen))).cast("long")
        // unigram bound: one edit moves the char SET by <= 2; bigram
        // bound: one edit touches <= 2 bigrams (remove <= 2, add <= 2).
        // Either bound exceeded => distance > k, skip the kernel.
        val pruned =
          (col(lm) =!= 0L && col(rm) =!= 0L &&
            bit_count(col(lm).bitwiseXOR(col(rm))) > lit(2L) * kPair) ||
          (col(lm2) =!= 0L && col(rm2) =!= 0L &&
            bit_count(col(lm2).bitwiseXOR(col(rm2))) > lit(4L) * kPair)
        when(pruned, lit(2.0)).otherwise(kernel)
      }
    withLower
      .withColumn("s", dist)
      .where(col("s") <= reversedThreshold)
      .withColumn("s", lit(1.0) - col("s"))
      .drop(ll, rl, lm, rm, lm2, rm2, lLen, rLen)
  }

  private[fuzzy] def lowerName(c: String): String = s"__lower__$c"
  private[fuzzy] def maskName(c: String): String = s"__mask__$c"
  private[fuzzy] def mask2Name(c: String): String = s"__mask2__$c"
  private[fuzzy] def lenName(c: String): String = s"__len__$c"

  /** Candidate value pairs for a fresh pass: strategy pick by distinct-value
    * cartesian estimate (cross_join_no_existing_fuzzy_results,
    * matcher.py:241-340). Legacy candidate-frame surface (tests/tools);
    * the matcher itself goes through [[freshScoredValuePairs]], which can
    * fuse candidate generation and scoring into the [[LevSweep]] form. */
  def freshCandidates(leftIdxDf: DataFrame, rightIdxDf: DataFrame,
                      leftCol: String, rightCol: String,
                      opts: MatchOptions, reversedThreshold: Double = 1.0): DataFrame =
    planFreshPairs(leftIdxDf, rightIdxDf, leftCol, rightCol, opts,
      reversedThreshold, sweepFor = None)._1 match {
      case Left(candidates) => candidates
      case Right(_) => throw new IllegalStateException(
        "unreachable: sweep disabled")
    }

  /** Fresh-pass scored value pairs `(leftCol, rightCol, s)`, post-threshold:
    * the strategy pick of [[freshCandidates]] plus scoring, fused into the
    * [[LevSweep]] broadcast sweep when the pass is an exact levenshtein
    * cross join with a broadcast-sized side (identical pair set and scores
    * — see LevSweep's equivalence note). Returns the scored frame and
    * whether the LSH candidate path (and so its BoundedTopK ranking) is in
    * the plan, so the caller can scope the ObjectHashAggregate fallback
    * conf around the pass's materialization. */
  def freshScoredValuePairs(
      leftIdxDf: DataFrame, rightIdxDf: DataFrame, fuzzyMap: FuzzyMapping,
      opts: MatchOptions): (DataFrame, Boolean) = {
    val (planned, usedLsh) = planFreshPairs(leftIdxDf, rightIdxDf,
      fuzzyMap.leftCol, fuzzyMap.rightCol, opts,
      fuzzyMap.reversedThresholdScore, sweepFor = Some(fuzzyMap.fuzzyType))
    planned match {
      case Right(scored) => (scored, usedLsh)
      case Left(candidates) =>
        (scoreValuePairs(candidates, fuzzyMap.leftCol, fuzzyMap.rightCol,
          fuzzyMap.fuzzyType, fuzzyMap.reversedThresholdScore), usedLsh)
    }
  }

  /** Shared fresh-pass planner. Returns `Left(candidates)` (to be scored by
    * [[scoreValuePairs]]) or `Right(scored)` (the fused sweep), plus a flag
    * for "the LSH candidate pipeline is in the plan". `sweepFor` carries
    * the pass algorithm when fusion is allowed; None preserves the
    * candidate-frame contract of [[freshCandidates]]. */
  private def planFreshPairs(leftIdxDf: DataFrame, rightIdxDf: DataFrame,
                      leftCol: String, rightCol: String,
                      opts: MatchOptions, reversedThreshold: Double,
                      sweepFor: Option[FuzzyAlgorithm]): (Either[DataFrame, DataFrame], Boolean) = {
    // Checkpointed: each value frame is consumed twice (count + join).
    // The two sides' materialize+count chains are independent — run them
    // concurrently (guide §2.6): same barriers, same counts, half the
    // serial fixed-cost floor of the four driver actions.
    def valsOf(df: DataFrame, c: String): (DataFrame, Long) = {
      val v = graft.util.Materialize(distinctValues(df, c), opts.checkpoint)
      (v, v.count())
    }
    val ((lv0, lc0), (rv0, rc0)) = graft.util.Par.run2(
      valsOf(leftIdxDf, leftCol), valsOf(rightIdxDf, rightCol))
    var leftVals = lv0
    var rightVals = rv0
    var lCount = lc0
    var rCount = rc0
    var lCol = leftCol
    var rCol = rightCol

    // Larger side "left" (process_fuzzy_frames swap, process.py:104-108):
    // for the LSH path this fixes which side the top-N cap applies to.
    if (lCount < rCount) {
      val (fv, fc, fn) = (leftVals, lCount, lCol)
      leftVals = rightVals; lCount = rCount; lCol = rCol
      rightVals = fv; rCount = fc; rCol = fn
    }

    val cartesian = lCount.toDouble * rCount.toDouble
    if (cartesian > opts.hardCartesianCap)
      throw new IllegalStateException(
        s"The cartesian product of the two dataframes is too large to process: $cartesian")

    // Exact cartesian of DISTINCT values, each side pre-projected with
    // its lowercased value (computed once per value, not per pair).
    // Broadcast the smaller value frame when it is clearly broadcastable
    // so the big side never shuffles; otherwise leave the pick to AQE.
    def exactCandidates(): DataFrame = {
      // The stream side sets the cross join's parallelism, and AQE happily
      // coalesces a small distinct-value frame to ONE partition — which
      // serializes the entire O(n*m) scoring loop onto a single core
      // (measured: 225M pairs ran single-threaded). Spread the stream side
      // across the cluster before fanning out.
      val spark = leftVals.sparkSession
      val parallelism = spark.sparkContext.defaultParallelism
      val lSpread =
        if (leftVals.queryExecution.toRdd.getNumPartitions < parallelism)
          leftVals.repartition(parallelism)
        else leftVals
      // Per-value mask + length columns feed scoreValuePairs' pre-gate:
      // 12 bytes per DISTINCT value buys a 3-instruction per-PAIR filter
      // in front of the DP kernel (see scoreValuePairs).
      def proj(vals: DataFrame, c: String): DataFrame = {
        val lo = lowerName(c)
        vals.withColumn(lo, lower(col(c)))
          .withColumn(maskName(c), vectorFunctions.char_mask(col(lo)))
          .withColumn(mask2Name(c), vectorFunctions.bigram_mask(col(lo)))
          .withColumn(lenName(c), length(col(lo)).cast("long"))
      }
      val lProj = proj(lSpread, lCol)
      val rProj = proj(rightVals, rCol)
      if (rCount <= opts.broadcastDistinctLimit) lProj.crossJoin(broadcast(rProj))
      else lProj.crossJoin(rProj)
    }

    val stats = f"$lCol x $rCol: $lCount x $rCount distinct values (cartesian $cartesian%.3g)"

    // Exact-path result: the fused LevSweep when the pass algorithm is
    // levenshtein and the small side is broadcast-sized (the same condition
    // under which exactCandidates would broadcast it); the BNLJ candidate
    // frame otherwise. Same pair set and scores either way.
    def exactEither(how: String): Either[DataFrame, DataFrame] =
      if (sweepFor.contains(FuzzyAlgorithm.Levenshtein) &&
          rCount <= opts.broadcastDistinctLimit) {
        log.info(s"[graft.pass] $stats -> exact broadcast sweep ($how)")
        Right(SweepScore.sweepScoredPairs(leftVals, rightVals, lCol, rCol,
          reversedThreshold))
      } else {
        log.info(s"[graft.pass] $stats -> exact cross join ($how)")
        Left(exactCandidates())
      }

    val useApprox = opts.useApproxNearestNeighbor.getOrElse(cartesian > opts.crossOverForApprox)
    if (useApprox) {
      // The degeneracy fallback applies to AUTO mode only: a user-forced LSH
      // join (Some(true)) must never silently become an exact cross join of
      // up to hardCartesianCap pairs.
      if (opts.useApproxNearestNeighbor.contains(true)) {
        log.info(s"[graft.pass] $stats -> LSH candidates (user-forced)")
        (Left(AnnJoin.candidates(leftVals, rightVals, lCol, rCol, opts,
          reversedThreshold, lCount + rCount)), true)
      } else
        AnnJoin.candidatesOrExactFallback(leftVals, rightVals, lCol, rCol, opts,
            reversedThreshold, lCount + rCount, cartesian) match {
          case Some(cands) =>
            log.info(s"[graft.pass] $stats -> LSH candidates (auto)")
            (Left(cands), true)
          case None =>
            (exactEither("auto: corpus is LSH-hostile, cartesian within " +
              "the fallback cap"), false)
        }
    } else {
      (exactEither(if (opts.useApproxNearestNeighbor.isEmpty) "auto: below crossover"
        else "user-forced"), false)
    }
  }

  /** One pass (process_fuzzy_mapping, matcher.py:419-504). Returns the
    * per-pass match frame `(score-as-output-name, leftIdx, rightIdx)`,
    * one row per surviving row pair. */
  def processFuzzyMapping(leftIdxDf: DataFrame, rightIdxDf: DataFrame,
                          fuzzyMap: FuzzyMapping, existing: Option[DataFrame],
                          opts: MatchOptions): DataFrame = {
    val leftCol = fuzzyMap.leftCol
    val rightCol = fuzzyMap.rightCol
    val (matched, usedLsh) = existing match {
      case Some(ex) =>
        // Pass >= 2 (cross_join_filter_existing_fuzzy_results,
        // matcher.py:188-238): attach values to the surviving pairs, score
        // each DISTINCT value pair once, inner-join the scores back — the
        // join both re-attaches scores and drops below-threshold pairs.
        val pairs = ex.select(LeftIdx, RightIdx)
          .join(leftIdxDf.select(col(LeftIdx), col(leftCol)), LeftIdx)
          .join(rightIdxDf.select(col(RightIdx), col(rightCol)), RightIdx)
        val distinctPairs = pairs.select(col(leftCol), col(rightCol)).distinct()
        val scored = scoreValuePairs(distinctPairs, leftCol, rightCol,
          fuzzyMap.fuzzyType, fuzzyMap.reversedThresholdScore)
        (pairs.join(scored, Seq(leftCol, rightCol))
          .select(col("s"), col(LeftIdx), col(RightIdx)), false)
      case None =>
        // Fresh pass: scored distinct value pairs (strategy pick + scoring,
        // fused where possible), then expand to row pairs by joining each
        // side back on its value.
        val (scored, lsh) = freshScoredValuePairs(leftIdxDf, rightIdxDf,
          fuzzyMap, opts)
        (scored
          .join(leftIdxDf.select(col(LeftIdx), col(leftCol)), Seq(leftCol))
          .join(rightIdxDf.select(col(RightIdx), col(rightCol)), Seq(rightCol))
          .select(col("s"), col(LeftIdx), col(RightIdx)), lsh)
    }
    // No dropDuplicates needed (reference: .unique(), matcher.py:501-504):
    // every shape above yields each (leftIdx, rightIdx) at most once —
    // candidates are distinct value pairs and ids are unique per row.
    // Checkpointed: consumed by the next pass, the combine AND the assembly.
    // An LSH pass ranks through BoundedTopK (ObjectHashAggregate): scope
    // the sort-based-fallback threshold around the pass materialization so
    // the heap aggregate is not demoted to a per-partition sort at 128
    // groups — engine-owned now, instead of a bench-harness conf
    // (VERDICT r19 item 4).
    val out = AnnJoin.withTopKHeapConf(leftIdxDf.sparkSession, usedLsh) {
      graft.util.Materialize(
        matched.withColumnRenamed("s", fuzzyMap.resolvedOutputName),
        opts.checkpoint)
    }
    // counting the materialized barrier is a metadata-cheap job and gives
    // the per-pass diagnostics the reference logs throughout matcher.py
    log.info(s"[graft.pass] ${fuzzyMap.leftCol} -> ${fuzzyMap.rightCol} " +
      s"(${fuzzyMap.fuzzyType.name}, threshold ${fuzzyMap.thresholdScore}, " +
      s"pass=${if (existing.isDefined) "filter-existing" else "fresh"}): " +
      s"${out.count()} surviving row pairs")
    out
  }

  /** Fold over mappings; pass N's matches gate pass N+1
    * (perform_all_fuzzy_matches, matcher.py:507-577). */
  def performAllFuzzyMatches(leftIdxDf: DataFrame, rightIdxDf: DataFrame,
                             maps: Seq[FuzzyMapping], opts: MatchOptions): Seq[DataFrame] = {
    var existing: Option[DataFrame] = None
    val out = Seq.newBuilder[DataFrame]
    maps.foreach { m =>
      val matched = processFuzzyMapping(leftIdxDf, rightIdxDf, m, existing, opts)
      existing = Some(matched)
      out += matched
    }
    out.result()
  }

  /** Inner-join every per-mapping frame on the index pair — final pairs
    * satisfy ALL thresholds, one score column each (combine_matches,
    * matcher.py:388-392). */
  def combineMatches(frames: Seq[DataFrame]): DataFrame = {
    val base = frames.last.select(LeftIdx, RightIdx)
    frames.foldLeft(base)((acc, f) => acc.join(f, Seq(LeftIdx, RightIdx)))
  }
}
