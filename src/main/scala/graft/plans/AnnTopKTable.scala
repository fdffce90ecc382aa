package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

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

  private def bad(what: String, got: Any): Nothing =
    throw new IllegalArgumentException(
      s"$Name: $what, got '$got'. Usage: $usage")

  private def lit(e: Expression, what: String): Any = {
    if (!e.foldable) bad(s"$what must be a literal", e.sql)
    e.eval()
  }

  private def str(e: Expression, what: String): String = lit(e, what) match {
    case s: UTF8String => s.toString
    case other => bad(s"$what must be a string literal", other)
  }

  private def int(e: Expression, what: String): Int = lit(e, what) match {
    case n: Number if n.doubleValue() == n.longValue() &&
      n.longValue() >= Int.MinValue && n.longValue() <= Int.MaxValue =>
      n.intValue()
    case other => bad(s"$what must be an integer literal", other)
  }

  private def bool(e: Expression, what: String): Boolean = lit(e, what) match {
    case b: java.lang.Boolean => b.booleanValue()
    case other => bad(s"$what must be a boolean literal", other)
  }

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.length < 5 || (args.length - 5) % 2 != 0)
      throw new IllegalArgumentException(
        s"$Name: got ${args.length} arguments. Usage: $usage")
    val spark = SparkSession.active
    val queries = spark.table(str(args(0), "queries table name"))
    val corpus = spark.table(str(args(1), "corpus table name"))
    val vecCol = str(args(2), "vector column")
    val idCol = str(args(3), "id column")
    val k = int(args(4), "k")
    if (k < 1) bad("k must be >= 1", k)

    var mode = "brute"
    var dim = 64
    var nCells = 64
    var nProbe = 8
    var excludeSelf = true
    args.drop(5).grouped(2).foreach {
      case Seq(kk, v) => str(kk, "option name") match {
        case "mode" => str(v, "mode value") match {
          case m @ ("brute" | "ivf") => mode = m
          case other => bad("mode must be 'brute' or 'ivf'", other)
        }
        case "dim" => dim = int(v, "dim value")
        case "n_cells" => nCells = int(v, "n_cells value")
        case "n_probe" => nProbe = int(v, "n_probe value")
        case "exclude_self" => excludeSelf = bool(v, "exclude_self value")
        case other => bad("unknown option", other)
      }
      case odd => throw new IllegalStateException(
        s"$Name: internal option-pair grouping error on $odd")
    }
    val result = mode match {
      case "brute" =>
        val raw = AnnSearch.bruteForceTopK(queries, corpus, vecCol, idCol, k)
        // bruteForceTopK always excludes self-pairs; the knob exists on
        // the ivf arm, so reject a contradictory ask rather than ignore it
        if (!excludeSelf)
          bad("exclude_self=false is only supported with mode 'ivf'", false)
        raw
      case _ =>
        AnnSearch.ivfTopK(queries, corpus, vecCol, idCol, k, dim,
          nCells = nCells, nProbe = nProbe, excludeSelf = excludeSelf)
    }
    result.queryExecution.analyzed
  }
}
