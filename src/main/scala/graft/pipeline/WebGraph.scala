package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL-graph weighting for crawl curation — the step after
  * [[TextAnalysis.outlinks]]: given the extracted link edges, rank
  * domains/pages by PageRank so the curation pipeline can weight (or
  * cut) by authority. This is the simplified PageRank (the public
  * formulation every Spark tutorial and the original paper's power
  * iteration use): fixed iteration count, damping 0.85, dangling-node
  * mass DROPPED rather than redistributed (documented choice — at
  * crawl scale the dangling set is huge and redistribution costs an
  * extra global aggregate per iteration for a constant shift that
  * rarely changes curation decisions; callers who need the conserved
  * variant can add the dangling sum back per iteration).
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
  * join back to the node set, with ranks localCheckpointed per
  * iteration (flat lineage, AQE-sized shuffles). At the 100 TB tier,
  * bucket the edge table by `src` ([[graft.util.BucketedTables]]) and
  * the per-iteration join stops shuffling the edge side entirely.
  */
object WebGraph {

  /** PageRank over `edges` (self-loops and duplicate edges dropped).
    * Returns `(node, rank)` — LONG fixed-point ranks summing to ≤
    * `scale` (dangling mass decays). Damping is fixed at 85/100 so the
    * integer arithmetic is unambiguous on both engines. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 8,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    require(scale > 0, s"pageRank: scale must be positive, got $scale")
    val e = graft.util.Materialize(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src") =!= col("dst")).distinct(),
      graft.util.CheckpointStrategy.Local)
    val nodes = graft.util.Materialize(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct(),
      graft.util.CheckpointStrategy.Local)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    // out-degrees attached to the edges ONCE — the per-iteration join
    // then carries (src, dst, outdeg) against the current ranks
    val eDeg = graft.util.Materialize(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"),
      graft.util.CheckpointStrategy.Local)
    // exact integer order pinned for the oracle: (scale*15/100)/n
    val base = scale * 15 / 100 / n
    var ranks = nodes.select(col("node"), lit(scale / n).as("rank"))
    var prev: org.apache.spark.sql.DataFrame = null
    var i = 0
    while (i < iterations) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(eDeg("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cin"))
      ranks = graft.util.Materialize(
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"), expr(
            s"$base + (85 * coalesce(cin, CAST(0 AS BIGINT))) div 100")
            .cast("long").as("rank")),
        graft.util.CheckpointStrategy.Local)
      // iteration i's ranks feed ONLY iteration i+1, which has now
      // materialized — release eagerly instead of retaining all K
      // node-sized intermediates for the scope/app lifetime
      if (prev != null) graft.util.Materialize.release(prev)
      prev = ranks
      i += 1
    }
    ranks
  }

  /** The DuckDB mirror of [[pageRank]], GENERATED with the same
    * constants and the same fixed-point arithmetic order: the fixed
    * iteration loop unrolls into chained CTEs (`r0..rK`), each step the
    * same join-aggregate-join as the Spark iteration. `edgesSql` must
    * select `src` and `dst`. */
  def pageRankOracleSql(edgesSql: String, iterations: Int,
                        scale: Long = 1000000000000L): String = {
    val steps = (1 to iterations).map { i =>
      s"""r$i AS (SELECT n.node,
         CAST((SELECT ($scale * 15 // 100) // cnt FROM ncnt)
           + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
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
