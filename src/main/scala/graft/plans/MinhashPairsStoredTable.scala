package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.Dedup
import graft.util.CheckpointStrategy

/** Pure-SQL front door for querying a SAVED MinHash state
  * ([[graft.pipeline.Dedup.saveMinhashState]] — the band-bucket-
  * partitioned text near-dup index): the batch documents' near-duplicate
  * flags against the stored corpus, both stored reads PRUNED to the
  * batch's touched bucket directories. The text-shingle twin of
  * [[HammingPairsStoredTable]], registered by [[graft.GraftExtensions]]:
  *
  * {{{
  *   SELECT * FROM minhash_pairs_stored(
  *     'batch_view',          -- arriving rows: (id_col, text_col)
  *     'text', 'doc_id',
  *     '/stores/minhash'      -- saveMinhashState root (gen= scheme)
  *     [, 'threshold', 0.7          -- exact-jaccard verify bar
  *      , 'max_bucket_pairs', N     -- band-bucket cap (CapMetrics-logged)
  *      , 'checkpoint_dir', '/p'])  -- reliable barriers (cluster jobs)
  * }}}
  *
  * Output is the operator's documented (id_a, id_b, jaccard) with id_a
  * always the batch row and jaccard the EXACT shingle jaccard (the
  * banding only generates candidates). Shingle length and banding come
  * from the STORE's own metadata — they are baked into the layout at
  * save time, not query-time knobs. */
object MinhashPairsStoredTable {

  val Name = "minhash_pairs_stored"

  private val usage =
    "minhash_pairs_stored('batch_table', 'text_col', 'id_col', " +
      "'state_path', then optional ('threshold', double | " +
      "'max_bucket_pairs', long | 'checkpoint_dir', 'path') pairs)"

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

    var threshold = 0.7
    var maxBucketPairs = 4_000_000L
    var checkpoint: CheckpointStrategy = CheckpointStrategy.Local
    A.options(args, 4) { (k, v) => k match {
      case "threshold" => threshold = A.dbl(v, "threshold value")
      case "max_bucket_pairs" => maxBucketPairs = A.long(v, "max_bucket_pairs value")
      case "checkpoint_dir" => A.str(v, "checkpoint_dir value") match {
        case d if d.nonEmpty => checkpoint = CheckpointStrategy.Reliable(d)
        case other => A.bad("checkpoint_dir must be a non-empty directory", other)
      }
      case other => A.bad("unknown option", other)
    }}

    val stored = Dedup.loadMinhashState(spark, statePath)
    Dedup.minhashPairsAgainstStored(batch, textCol, idCol, stored,
        threshold, maxBucketPairs, checkpoint)
      .queryExecution.analyzed
  }
}
