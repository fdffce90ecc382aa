package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.Dedup
import graft.util.CheckpointStrategy

/** Pure-SQL front door for querying a SAVED SemDeDup state
  * ([[graft.pipeline.Dedup.saveSemDedupState]] — the cell-partitioned
  * embedding near-dup index): the batch embeddings' semantic near-dup
  * pairs against the stored corpus, the stored vector scan PRUNED to the
  * batch's touched `cell=N/` directories. The embedding-space sibling of
  * [[MinhashPairsStoredTable]] / [[HammingPairsStoredTable]], registered
  * by [[graft.GraftExtensions]]:
  *
  * {{{
  *   SELECT * FROM semdedup_pairs_stored(
  *     'batch_view',          -- arriving rows: (id_col, vec_col)
  *     'embedding', 'vec_id',
  *     '/stores/semdedup',    -- saveSemDedupState root (gen= scheme)
  *     0.85                   -- exact-cosine pair bar
  *     [, 'max_cell_pairs', N       -- per-cell cap (CapMetrics-logged)
  *      , 'checkpoint_dir', '/p'])  -- reliable barriers (cluster jobs)
  * }}}
  *
  * Output is the operator's documented (id_a, id_b, cosine) with id_a
  * always the batch row and cosine the EXACT float cosine (cells only
  * generate candidates). Dimension, cell count and the assignment
  * centroids come from the STORE's own metadata — they are baked into
  * the layout at save time, not query-time knobs. */
object SemDedupPairsStoredTable {

  val Name = "semdedup_pairs_stored"

  private val usage =
    "semdedup_pairs_stored('batch_table', 'vec_col', 'id_col', " +
      "'state_path', threshold, then optional " +
      "('max_cell_pairs', long | 'checkpoint_dir', 'path') pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 5)
    val spark = SparkSession.active
    val batch = spark.table(A.str(args(0), "batch table name"))
    val vecCol = A.str(args(1), "vector column")
    val idCol = A.str(args(2), "id column")
    val statePath = A.str(args(3), "state path")
    if (statePath.isEmpty) A.bad("state path must be non-empty", statePath)
    val threshold = A.dbl(args(4), "threshold value")

    var maxCellPairs = 4_000_000L
    var checkpoint: CheckpointStrategy = CheckpointStrategy.Local
    A.options(args, 5) { (k, v) => k match {
      case "max_cell_pairs" => maxCellPairs = A.long(v, "max_cell_pairs value")
      case "checkpoint_dir" => A.str(v, "checkpoint_dir value") match {
        case d if d.nonEmpty => checkpoint = CheckpointStrategy.Reliable(d)
        case other => A.bad("checkpoint_dir must be a non-empty directory", other)
      }
      case other => A.bad("unknown option", other)
    }}

    val stored = Dedup.loadSemDedupState(spark, statePath)
    Dedup.semDedupPairsAgainstStored(batch, vecCol, idCol, stored,
        threshold, maxCellPairs, checkpoint)
      .queryExecution.analyzed
  }
}
