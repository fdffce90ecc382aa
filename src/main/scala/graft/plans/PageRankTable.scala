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
  *      , 'scale', 1000000000000  -- fixed-point grid (total mass)
  *      , 'checkpoint_dir', '/jobs/pr'  -- Reliable iteration barriers
  *      , 'dangling', 'redistribute'])  -- conserved-mass variant
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
      "('iterations', int | 'scale', long | 'checkpoint_dir', string | " +
      "'dangling', 'redistribute'|'drop') pairs)"

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
    var strategy: graft.util.CheckpointStrategy =
      graft.util.CheckpointStrategy.Local
    var dangling = false
    A.options(args, 3) { (k, v) => k match {
      case "iterations" =>
        iterations = A.int(v, "iterations value")
        if (iterations < 1) A.bad("iterations must be >= 1", iterations)
      case "scale" =>
        scale = A.long(v, "scale value")
        // same bound the operator enforces — fail at ANALYSIS time with
        // the TVF's usage string instead of inside the iteration loop
        if (scale < 1 || scale > Long.MaxValue / 100)
          A.bad(s"scale must be in [1, ${Long.MaxValue / 100}]", scale)
      case "checkpoint_dir" =>
        strategy = graft.util.CheckpointStrategy.Reliable(
          A.str(v, "checkpoint_dir value"))
      case "dangling" =>
        A.str(v, "dangling value") match {
          case "redistribute" => dangling = true
          case "drop" => dangling = false
          case other => A.bad("dangling must be 'redistribute' or 'drop'", other)
        }
      case other => A.bad("unknown option", other)
    }}
    WebGraph.pageRank(edges, srcCol, dstCol, iterations, scale,
        strategy, dangling)
      .queryExecution.analyzed
  }
}
