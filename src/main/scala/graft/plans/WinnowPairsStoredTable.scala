package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.Dedup
import graft.util.CheckpointStrategy

/** Pure-SQL front door for querying a SAVED winnow state
  * ([[graft.pipeline.Dedup.saveWinnowState]] — the fingerprint-bucketed
  * lifted-passage index): the batch documents' shared-passage flags
  * against the stored corpus, both stored reads PRUNED to the batch's
  * touched fingerprint buckets. The passage-overlap sibling of
  * [[MinhashPairsStoredTable]], registered by [[graft.GraftExtensions]]:
  *
  * {{{
  *   SELECT * FROM winnow_pairs_stored(
  *     'batch_view',          -- arriving rows: (id_col, text_col)
  *     'text', 'doc_id',
  *     '/stores/winnow'       -- saveWinnowState root (gen= scheme)
  *     [, 'min_shared', 8            -- shared-fingerprint bar
  *      , 'max_fingerprint_pairs', N -- cross hot-fp cap (CapMetrics-logged)
  *      , 'checkpoint_dir', '/p'])   -- reliable barriers (cluster jobs)
  * }}}
  *
  * Output is the operator's documented (id_a, id_b, n_shared) with id_a
  * always the batch row. The sketch parameters (k, window, use_md5)
  * come from the STORE's own metadata — they define the layout at save
  * time; `min_shared` stays a query-time knob. */
object WinnowPairsStoredTable {

  val Name = "winnow_pairs_stored"

  private val usage =
    "winnow_pairs_stored('batch_table', 'text_col', 'id_col', " +
      "'state_path', then optional ('min_shared', long | " +
      "'max_fingerprint_pairs', long | 'checkpoint_dir', 'path') pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 4)
    val spark = SparkSession.active
    val batch = spark.table(A.str(args(0), "batch table name"))
    val textCol = A.str(args(1), "text column")
    val idCol = A.str(args(2), "id column")
    val statePath = A.str(args(3), "state path")
    if (statePath.isEmpty) A.bad("state path must be non-empty", statePath)

    var minShared = 8L
    var maxFingerprintPairs = 4_000_000L
    var checkpoint: CheckpointStrategy = CheckpointStrategy.Local
    A.options(args, 4) { (k, v) => k match {
      case "min_shared" => minShared = A.long(v, "min_shared value")
      case "max_fingerprint_pairs" =>
        maxFingerprintPairs = A.long(v, "max_fingerprint_pairs value")
      case "checkpoint_dir" => A.str(v, "checkpoint_dir value") match {
        case d if d.nonEmpty => checkpoint = CheckpointStrategy.Reliable(d)
        case other => A.bad("checkpoint_dir must be a non-empty directory", other)
      }
      case other => A.bad("unknown option", other)
    }}

    val stored = Dedup.loadWinnowState(spark, statePath)
    Dedup.winnowPairsAgainstStored(batch, textCol, idCol, stored,
        minShared, maxFingerprintPairs, checkpoint = checkpoint)
      .queryExecution.analyzed
  }
}
