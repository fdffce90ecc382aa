package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.AnnSearch

/** Pure-SQL front door for embedding top-k similarity search — the
  * retrieval face of the pipeline ([[graft.pipeline.AnnSearch]]),
  * previously reachable only from Scala. Registered by
  * [[graft.GraftExtensions]] next to [[FuzzyMatchTable]] /
  * [[CurateDHashTable]], so a Thrift / Spark Connect / notebook-SQL
  * client can run cosine retrieval with no driver code:
  *
  * {{{
  *   SELECT * FROM ann_topk(
  *     'queries_view',   -- rows carrying (id_col, vec_col)
  *     'corpus_view',    -- same shape; the side that scales
  *     'embedding', 'vec_id', 10
  *     [, 'mode', 'brute' | 'ivf'   -- exact (default) or IVF-pruned
  *      , 'dim', 64                 -- vector dimensionality (ivf; default 64)
  *      , 'n_cells', 64             -- IVF quantizer cells
  *      , 'n_probe', 8              -- cells probed per query
  *      , 'exclude_self', true])    -- drop query_id == corpus_id pairs
  * }}}
  *
  * Output is the operators' documented (query_id, corpus_id, cosine,
  * rank). `mode='brute'` is the recall-1.0 arm (broadcast queries x
  * corpus scan through the BoundedTopK heap aggregate — no Window, no
  * driver TakeOrdered); `mode='ivf'` fits a k-means quantizer over the
  * corpus AT ANALYSIS TIME (the fit-per-statement shape — production
  * serving should fit once via [[AnnSearch.fitIndex]] and search with
  * the Scala API; this TVF is the ad-hoc/exploration front door) and
  * prunes to `n_probe` cells per query. All arguments must be foldable
  * literals; table names resolve in the session catalog. */
object AnnTopKTable {

  val Name = "ann_topk"

  private val usage =
    "ann_topk('queries_table', 'corpus_table', 'vec_col', 'id_col', k, " +
      "then optional ('mode', 'brute'|'ivf' | 'dim', int | 'n_cells', int " +
      "| 'n_probe', int | 'exclude_self', bool) pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 5)
    val spark = SparkSession.active
    val queries = spark.table(A.str(args(0), "queries table name"))
    val corpus = spark.table(A.str(args(1), "corpus table name"))
    val vecCol = A.str(args(2), "vector column")
    val idCol = A.str(args(3), "id column")
    val k = A.int(args(4), "k")
    if (k < 1) A.bad("k must be >= 1", k)

    var mode = "brute"
    var dim = 64
    var nCells = 64
    var nProbe = 8
    var excludeSelf = true
    val ivfOnlySet = scala.collection.mutable.ListBuffer.empty[String]
    A.options(args, 5) { (kk, v) => kk match {
      case "mode" => A.str(v, "mode value") match {
        case m @ ("brute" | "ivf") => mode = m
        case other => A.bad("mode must be 'brute' or 'ivf'", other)
      }
      case "dim" => dim = A.int(v, "dim value"); ivfOnlySet += "dim"
      case "n_cells" => nCells = A.int(v, "n_cells value"); ivfOnlySet += "n_cells"
      case "n_probe" => nProbe = A.int(v, "n_probe value"); ivfOnlySet += "n_probe"
      case "exclude_self" => excludeSelf = A.bool(v, "exclude_self value")
      case other => A.bad("unknown option", other)
    }}
    val result = mode match {
      case "brute" =>
        // the IVF-only knobs must never be SILENTLY ignored — a caller
        // passing n_probe without 'mode','ivf' believes they benchmarked
        // IVF pruning while running an exact scan; same loud treatment
        // as the contradictory exclude_self=false below
        if (ivfOnlySet.nonEmpty)
          A.bad(s"option(s) ${ivfOnlySet.mkString(", ")} only apply with " +
            "mode 'ivf' (add 'mode', 'ivf' or drop them)", mode)
        // bruteForceTopK always excludes self-pairs; the knob exists on
        // the ivf arm, so reject a contradictory ask rather than ignore it
        if (!excludeSelf)
          A.bad("exclude_self=false is only supported with mode 'ivf'", false)
        AnnSearch.bruteForceTopK(queries, corpus, vecCol, idCol, k)
      case _ =>
        AnnSearch.ivfTopK(queries, corpus, vecCol, idCol, k, dim,
          nCells = nCells, nProbe = nProbe, excludeSelf = excludeSelf)
    }
    result.queryExecution.analyzed
  }
}
