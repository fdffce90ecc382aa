package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.WebGraph

/** Pure-SQL front door for URL-graph authority weighting
  * ([[graft.pipeline.WebGraph.pageRank]]) — registered by
  * [[graft.GraftExtensions]] next to the other ten TVFs, so a
  * Thrift / Spark Connect / notebook-SQL client ranks domains with no
  * driver code:
  *
  * {{{
  *   SELECT * FROM pagerank(
  *     'edges_view',        -- rows carrying (src_col, dst_col)
  *     'src', 'dst'
  *     [, 'iterations', 8   -- fixed power-iteration count
  *      , 'scale', 1000000000000])  -- fixed-point grid (total mass)
  * }}}
  *
  * Output is the operator's documented `(node, rank)` — LONG
  * fixed-point ranks, exact under any partitioning. The iteration
  * loop RUNS AT ANALYSIS TIME (each iteration materializes — the same
  * fit-per-statement shape as `ann_topk`'s ivf arm; a production
  * scheduler should call the Scala API and persist the ranks). All
  * arguments must be foldable literals; the table name resolves in
  * the session catalog. */
object PageRankTable {

  val Name = "pagerank"

  private val usage =
    "pagerank('edges_table', 'src_col', 'dst_col', then optional " +
      "('iterations', int | 'scale', long) pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 3)
    val spark = SparkSession.active
    val edges = spark.table(A.str(args(0), "edges table name"))
    val srcCol = A.str(args(1), "src column")
    val dstCol = A.str(args(2), "dst column")
    var iterations = 8
    var scale = 1000000000000L
    A.options(args, 3) { (k, v) => k match {
      case "iterations" =>
        iterations = A.int(v, "iterations value")
        if (iterations < 1) A.bad("iterations must be >= 1", iterations)
      case "scale" =>
        scale = A.long(v, "scale value")
        if (scale < 1) A.bad("scale must be >= 1", scale)
      case other => A.bad("unknown option", other)
    }}
    WebGraph.pageRank(edges, srcCol, dstCol, iterations, scale)
      .queryExecution.analyzed
  }
}
