package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

import graft.pipeline.Dedup
import graft.util.CheckpointStrategy

/** Pure-SQL front door for querying a SAVED hamming state
  * ([[graft.pipeline.Dedup.saveHammingState]]'s bucket-partitioned,
  * generation-flipped store — the 10⁸-hash production shape): the
  * batch's hamming-radius near-duplicate pairs against the stored
  * corpus, with the per-trigger scan PRUNED to the batch's touched
  * `bucket=N/` directories. Registered by [[graft.GraftExtensions]]:
  *
  * {{{
  *   SELECT * FROM hamming_pairs_stored(
  *     'batch_view',          -- arriving rows: (id_col, hash_col)
  *     'h64', 'doc_id',       -- 64-bit integral hash + id columns
  *     '/stores/hamming'      -- saveHammingState root (gen= scheme)
  *     [, 'max_bucket_pairs', N     -- pigeonhole cap (CapMetrics-logged)
  *      , 'checkpoint_dir', '/p'])  -- reliable barriers (cluster jobs)
  * }}}
  *
  * Output is the operator's documented (id_a, id_b, hamming) with id_a
  * always the batch row; the hamming radius comes from the STORE's own
  * metadata (it is baked into the chunk layout at save time, not a
  * query-time knob). The store is resolved to its highest committed
  * generation at analysis time — the same consistency contract as the
  * Scala reader ([[Dedup.loadHammingState]]), including the loud
  * legacy-layout and never-saved diagnostics. */
object HammingPairsStoredTable {

  val Name = "hamming_pairs_stored"

  private val usage =
    "hamming_pairs_stored('batch_table', 'hash_col', 'id_col', " +
      "'state_path', then optional ('max_bucket_pairs', long | " +
      "'checkpoint_dir', 'path') pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 4)
    val spark = SparkSession.active
    val batch = spark.table(A.str(args(0), "batch table name"))
    val hashCol = A.str(args(1), "hash column")
    val idCol = A.str(args(2), "id column")
    val statePath = A.str(args(3), "state path")
    if (statePath.isEmpty) A.bad("state path must be non-empty", statePath)

    var maxBucketPairs = 4_000_000L
    var checkpoint: CheckpointStrategy = CheckpointStrategy.Local
    A.options(args, 4) { (k, v) => k match {
      case "max_bucket_pairs" => maxBucketPairs = A.long(v, "max_bucket_pairs value")
      case "checkpoint_dir" => A.str(v, "checkpoint_dir value") match {
        case d if d.nonEmpty => checkpoint = CheckpointStrategy.Reliable(d)
        case other => A.bad("checkpoint_dir must be a non-empty directory", other)
      }
      case other => A.bad("unknown option", other)
    }}

    val stored = Dedup.loadHammingState(spark, statePath)
    Dedup.hashPairsAgainstStored(batch, col(hashCol), idCol, stored,
        maxBucketPairs, checkpoint)
      .queryExecution.analyzed
  }
}
