package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.{CheckpointStrategy, Materialize}

/** URL-graph weighting for crawl curation — the step after
  * [[TextAnalysis.outlinks]]: given the extracted link edges, rank
  * domains/pages by PageRank so the curation pipeline can weight (or
  * cut) by authority. This is the simplified PageRank (the public
  * formulation every Spark tutorial and the original paper's power
  * iteration use): fixed iteration count, damping 0.85, dangling-node
  * mass DROPPED by default rather than redistributed (at crawl scale
  * the dangling set is huge and redistribution costs an extra global
  * aggregate per iteration for a constant shift that rarely changes
  * curation decisions). `danglingRedistribute = true` buys the
  * conserved variant — each iteration adds the dangling nodes' per-node
  * mass share back before damping, at the priced cost of one extra
  * keyed aggregate per iteration — for callers comparing rank
  * magnitudes ACROSS graphs with different dangling fractions.
  *
  * EXACT integer arithmetic: ranks live on a fixed-point grid
  * (`scale` = total initial mass, default 1e12), per-edge
  * contributions are truncating integer divisions and the damping
  * multiply-divide runs AFTER the integer sum — so the result is
  * bit-identical under any partitioning (a double-sum PageRank is
  * not) and the DuckDB oracle replays it verbatim
  * ([[pageRankOracleSql]] unrolls the same loop as chained CTEs).
  *
  * Scale shape: the edge frame materializes once with its out-degrees
  * attached; each iteration is ONE keyed shuffle join (edges ⋈ ranks
  * on src) + ONE keyed aggregation (contributions by dst) + a left
  * join back to the node set, with ranks barrier'd per iteration
  * (flat lineage, AQE-sized shuffles) under the caller's
  * [[graft.util.CheckpointStrategy]] — `Local` (default) for
  * single-job speed, `Reliable(dir)` when a lost executor at the
  * 100 TB tier must not recompute iterations, `Persist` to keep
  * lineage. Intermediates release eagerly: iteration i's ranks are
  * freed once iteration i+1 materializes, and the graph-sized inputs
  * (edges, nodes, out-degrees) are freed after the loop — only the
  * returned ranks frame retains storage. The edge side never
  * RE-shuffles across iterations: the eDeg barrier carries the
  * hash-partitioning of the join that built it, so each iteration
  * exchanges only the node-sized ranks (measured: exactly 2 exchanges
  * per iteration — ranks + the contribution aggregate — at 4.8M edges,
  * SCALE.md round-18). At the 100 TB tier, bucket the EDGE TABLE by
  * `src` ([[graft.util.BucketedTables]]) to also make the one-time
  * e/eDeg build exchange-free.
  */
object WebGraph {

  /** PageRank over `edges` (self-loops and duplicate edges dropped).
    * Returns `(node, rank)` — LONG fixed-point ranks summing to ≤
    * `scale` (exactly `scale` up to truncation remainders when
    * `danglingRedistribute` is on; decaying by the dangling fraction
    * per iteration when off). Damping is fixed at 85/100 so the
    * integer arithmetic is unambiguous on both engines. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 8,
               scale: Long = 1000000000000L,
               strategy: CheckpointStrategy = CheckpointStrategy.Local,
               danglingRedistribute: Boolean = false): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    // upper bound: the damping products (85 * cin, cin <= scale) and the
    // base product (scale * 15) must stay inside Long — past it the Spark
    // side would silently wrap while the oracle's HUGEINT intermediates
    // would not, a divergence instead of a loud error (ADVICE r17)
    require(scale >= 1 && scale <= Long.MaxValue / 100,
      s"pageRank: scale must be in [1, ${Long.MaxValue / 100}] " +
        s"(the 85x damping product must not overflow Long), got $scale")
    // every live barrier registers here: the happy path releases all but
    // the returned ranks (ADVICE r17 — leaking them retained graph-sized
    // cached RDDs per CALL for the app lifetime, including every
    // `SELECT * FROM pagerank(...)` statement), and the catch-all below
    // releases them on ANY failure too (the empty-graph require, a task
    // failure mid-iteration) so an aborted call cannot leak either
    val live = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def mat(df: DataFrame): DataFrame = {
      val m = Materialize(df, strategy); live += m; m
    }
    def release(df: DataFrame): Unit = { live -= df; Materialize.release(df) }
    try {
      val e = mat(
        edges.select(col(srcCol).cast("long").as("src"),
            col(dstCol).cast("long").as("dst"))
          .where(col("src") =!= col("dst")).distinct())
      val nodes = mat(
        e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node"))).distinct())
      val n = nodes.count()
      require(n > 0, "pageRank: empty graph")
      // out-degrees attached to the edges ONCE — the per-iteration join
      // then carries (src, dst, outdeg) against the current ranks
      val eDeg = mat(
        e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"))
      // nodes with no out-edge: their mass either decays (default) or is
      // shared back per iteration (conserved arm)
      val dangling = if (danglingRedistribute)
        mat(nodes.join(e.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti"))
      else null
      // exact integer order pinned for the oracle: (scale*15/100)/n
      val base = scale * 15 / 100 / n
      var ranks = nodes.select(col("node"), lit(scale / n).as("rank"))
      var prev: org.apache.spark.sql.DataFrame = null
      var i = 0
      while (i < iterations) {
        // conserved arm: the dangling nodes' total mass, shared per node
        // (truncating, same order as the oracle's `//`) — a bounded driver
        // read of ONE long, priced as the extra per-iteration aggregate
        val dShare = if (danglingRedistribute)
          ranks.join(dangling, Seq("node"))
            .agg(coalesce(sum(col("rank")), lit(0L)).as("d"))
            .collect()(0).getLong(0) / n
        else 0L
        val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
          .select(eDeg("dst").as("node"), expr("rank div outdeg").as("c"))
          .groupBy("node").agg(sum(col("c")).as("cin"))
        ranks = mat(
          nodes.join(contribs, Seq("node"), "left")
            .select(col("node"), expr(
              s"$base + (85 * (coalesce(cin, CAST(0 AS BIGINT)) + $dShare)) div 100")
              .cast("long").as("rank")))
        // iteration i's ranks feed ONLY iteration i+1, which has now
        // materialized — release eagerly instead of retaining all K
        // node-sized intermediates for the scope/app lifetime
        if (prev != null) release(prev)
        prev = ranks
        i += 1
      }
      // the returned ranks frame is itself a barrier and no longer
      // depends on the graph-sized inputs — release everything else
      live.filter(_ ne ranks).toList.foreach(release)
      ranks
    } catch {
      case t: Throwable =>
        live.toList.foreach { f =>
          try Materialize.release(f)
          catch { case r: Throwable => t.addSuppressed(r) }
        }
        throw t
    }
  }

  /** String-keyed front door for [[pageRank]] — the production link
    * graph is keyed by domain/URL STRINGS (`warc_link_domains` feeds
    * it), and the LONG walk needs a dictionary. This builds one:
    * distinct node keys, sorted, dense ids via `zipWithIndex` (keeps
    * the sort's full parallelism — a global `dense_rank()` window would
    * single-partition; the id values themselves are irrelevant to the
    * ranks, PageRank being graph-isomorphic, so any bijection works as
    * long as it is consistent within the run), edges mapped through two
    * keyed joins, the exact fixed-point walk, keys joined back. Returns
    * `(node_key STRING, rank LONG)`. Null-keyed edge endpoints drop
    * (they cannot name a node). The dictionary and the intermediate
    * ranks release before return — only the returned frame retains
    * storage, as with [[pageRank]]. */
  def pageRankKeys(edges: DataFrame, srcCol: String, dstCol: String,
                   iterations: Int = 8,
                   scale: Long = 1000000000000L,
                   strategy: CheckpointStrategy = CheckpointStrategy.Local,
                   danglingRedistribute: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    // the sorted key set materializes FIRST: zipWithIndex runs an eager
    // offset-counting job and the dict materialization runs another —
    // without the barrier that is two full passes over the
    // union→distinct→sort lineage, and (worse) job 1's offsets would
    // apply to job 2's recomputation of a possibly-nondeterministic
    // input (round-18 review finding)
    val keys = Materialize(
      edges.select(col(srcCol).cast("string").as("key"))
        .unionByName(edges.select(col(dstCol).cast("string").as("key")))
        .where(col("key").isNotNull)
        .distinct().sort("key"),
      strategy)
    // under Persist the dict frame's LINEAGE still reads keys (persist
    // truncates nothing), so an early keys release would let a later
    // executor loss recompute dict partitions through the uncached —
    // possibly nondeterministic — key lineage with job-1 zipWithIndex
    // offsets (third-review finding): keys must outlive dict there.
    // Local/Reliable truncate, so the early release stays.
    val keysEarlyRelease = strategy != CheckpointStrategy.Persist
    val dict =
      try {
        val dictRdd = keys.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), i)
        }
        val dictSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("key",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("nid",
            org.apache.spark.sql.types.LongType, nullable = false)))
        Materialize(spark.createDataFrame(dictRdd, dictSchema), strategy)
      } finally if (keysEarlyRelease) Materialize.release(keys)
    try {
      val idEdges = edges
        .select(col(srcCol).cast("string").as("sk"),
          col(dstCol).cast("string").as("dk"))
        .join(dict.select(col("key").as("sk"), col("nid").as("src")), "sk")
        .join(dict.select(col("key").as("dk"), col("nid").as("dst")), "dk")
        .select(col("src"), col("dst"))
      val ranks = pageRank(idEdges, "src", "dst", iterations, scale,
        strategy, danglingRedistribute)
      try
        Materialize(
          ranks.join(dict, ranks("node") === dict("nid"))
            .select(dict("key").as("node_key"), ranks("rank")),
          strategy)
      finally Materialize.release(ranks)
    } finally {
      Materialize.release(dict)
      if (!keysEarlyRelease) Materialize.release(keys)
    }
  }

  /** The DuckDB mirror of [[pageRankKeys]]: the same dictionary
    * (row_number over sorted distinct keys — the id VALUES don't affect
    * ranks, only the bijection's consistency), the generated LONG walk
    * over mapped edges, keys joined back. */
  def pageRankKeysOracleSql(edgesSql: String, iterations: Int,
                            scale: Long = 1000000000000L,
                            danglingRedistribute: Boolean = false): String = {
    val inner = pageRankOracleSql(
      s"""SELECT s.nid AS src, d.nid AS dst
         FROM ($edgesSql) ed
         JOIN dict s ON s.key = CAST(ed.src AS VARCHAR)
         JOIN dict d ON d.key = CAST(ed.dst AS VARCHAR)""",
      iterations, scale, danglingRedistribute)
    s"""WITH dict AS (SELECT key,
         CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS nid
       FROM (SELECT CAST(src AS VARCHAR) AS key FROM ($edgesSql)
             UNION SELECT CAST(dst AS VARCHAR) FROM ($edgesSql)) ks
       WHERE key IS NOT NULL)
       SELECT d.key AS node_key, g.rank FROM ($inner) g
       JOIN dict d ON d.nid = g.node"""
  }

  /** The DuckDB mirror of [[pageRank]], GENERATED with the same
    * constants and the same fixed-point arithmetic order: the fixed
    * iteration loop unrolls into chained CTEs (`r0..rK`), each step the
    * same join-aggregate-join as the Spark iteration (plus, under
    * `danglingRedistribute`, the same dangling-mass aggregate `d1..dK`).
    * `edgesSql` must select `src` and `dst`. */
  def pageRankOracleSql(edgesSql: String, iterations: Int,
                        scale: Long = 1000000000000L,
                        danglingRedistribute: Boolean = false): String = {
    val steps = (1 to iterations).map { i =>
      val dCte = if (danglingRedistribute)
        s"""d$i AS (SELECT CAST(COALESCE(SUM(rank), 0)
           // (SELECT cnt FROM ncnt) AS BIGINT) AS ds
           FROM r${i - 1} WHERE node NOT IN (SELECT src FROM dg)),
           """
      else ""
      val dTerm = if (danglingRedistribute) s" + (SELECT ds FROM d$i)" else ""
      s"""${dCte}r$i AS (SELECT n.node,
         CAST((SELECT ($scale * 15 // 100) // cnt FROM ncnt)
           + (85 * (COALESCE(c.s, 0)$dTerm)) // 100 AS BIGINT) AS rank
         FROM nodes n LEFT JOIN (
           SELECT e.dst AS node,
             CAST(SUM(p.rank // dg.outdeg) AS BIGINT) AS s
           FROM r${i - 1} p
           JOIN dg ON dg.src = p.node
           JOIN e ON e.src = p.node
           GROUP BY e.dst) c ON c.node = n.node)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesSql) WHERE src <> dst),
       nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       ncnt AS (SELECT count(*) AS cnt FROM nodes),
       dg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       r0 AS (SELECT node, (SELECT $scale // cnt FROM ncnt) AS rank FROM nodes),
       $steps
       SELECT node, rank FROM r$iterations"""
  }
}
