package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.TextAnalysis

/** Pure-SQL front door for BM25 lexical retrieval — the sparse twin of
  * [[AnnTopKTable]] ([[graft.pipeline.TextAnalysis.bm25TopK]]: query
  * terms join tf first, df/dl attach to the matched subset only, ranking
  * through the BoundedTopK heap aggregate — no Window, no driver
  * TakeOrdered). Registered by [[graft.GraftExtensions]]:
  *
  * {{{
  *   SELECT * FROM bm25_topk(
  *     'corpus_view', 'queries_view',
  *     'text', 'doc_id',      -- corpus text + id columns
  *     'qtext', 'query_id',   -- query text + id columns
  *     10                     -- k
  *     [, 'k1', 1.2, 'b', 0.75   -- BM25 shape parameters
  *      , 'max_df', N])           -- stop-token gate (build-path only)
  * }}}
  *
  * Output is the operator's documented (query_id col, doc_id col, score,
  * rank) under the caller's own column names. This is the ONE-SHOT
  * search (index built per statement); production serving builds a
  * stored index once ([[TextAnalysis.saveBm25Index]]) and searches it
  * with the Scala API — this TVF is the ad-hoc/exploration front door,
  * exactly like [[AnnTopKTable]]'s ivf mode. */
object Bm25TopKTable {

  val Name = "bm25_topk"

  private val usage =
    "bm25_topk('corpus_table', 'queries_table', 'text_col', 'id_col', " +
      "'query_text_col', 'query_id_col', k, then optional " +
      "('k1', double | 'b', double | 'max_df', long) pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 7)
    val spark = SparkSession.active
    val corpus = spark.table(A.str(args(0), "corpus table name"))
    val queries = spark.table(A.str(args(1), "queries table name"))
    val textCol = A.str(args(2), "text column")
    val idCol = A.str(args(3), "id column")
    val queryTextCol = A.str(args(4), "query text column")
    val queryIdCol = A.str(args(5), "query id column")
    val k = A.int(args(6), "k")
    if (k < 1) A.bad("k must be >= 1", k)

    var k1 = 1.2
    var b = 0.75
    var maxDf = Long.MaxValue
    A.options(args, 7) { (key, v) => key match {
      case "k1" => k1 = A.dbl(v, "k1 value")
      case "b" => b = A.dbl(v, "b value")
      case "max_df" => maxDf = A.long(v, "max_df value")
      case other => A.bad("unknown option", other)
    }}

    TextAnalysis.bm25TopK(corpus, textCol, idCol, queries, queryTextCol,
        queryIdCol, k, k1, b, maxDf)
      .queryExecution.analyzed
  }
}
