package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.pipeline.Multimodal

/** Pure-SQL front door for the perceptual image curation operator
  * ([[graft.pipeline.Multimodal.curateByDHashImages]]) — the strongest
  * multimodal curation arm (hamming-clustered dHash: a re-encoded /
  * resized copy lands in its original's bucket), previously reachable
  * only from Scala. Registered by [[graft.GraftExtensions]] next to
  * [[FuzzyMatchTable]], so a Thrift / Spark Connect / notebook-SQL
  * client can run the full decode → quality-gate → dHash → cluster →
  * keep-min pipeline with no driver code:
  *
  * {{{
  *   SELECT * FROM curate_dhash(
  *     'docs_view',      -- rows to curate: carries id_col + img_key_col
  *     'images_view',    -- one row per distinct img_key: the raw bytes
  *     'doc_id', 'img_key', 'payload'
  *     [, 'max_hamming', 2          -- 0 (default) = exact-hash buckets;
  *                                  -- > 0 = perceptual clusters
  *      , 'min_max_luma', 34        -- quality gate on decoded max luma
  *      , 'max_bucket_pairs', N     -- pigeonhole cap (CapMetrics-logged)
  *      , 'checkpoint_dir', '/p'])  -- reliable barriers (cluster jobs)
  * }}}
  *
  * Output is the operator's documented (keep_doc_id, dhash_hex,
  * n_in_bucket). All arguments must be foldable literals; table names
  * resolve in the session catalog. Same analysis-time eagerness note as
  * [[FuzzyMatchTable]]: the operator materializes the asset-hash frame
  * when `max_hamming > 0`, which here happens while the enclosing
  * statement analyzes — the contract a Scala caller observes too. */
object CurateDHashTable {

  val Name = "curate_dhash"

  private val usage =
    "curate_dhash('docs_table', 'images_table', 'id_col', 'img_key_col', " +
      "'payload_col', then optional ('min_max_luma', int | 'max_hamming', " +
      "int | 'max_bucket_pairs', long | 'checkpoint_dir', 'path') pairs)"

  private val A = new TvfArgs(Name, usage)

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    A.arity(args, 5)
    val spark = SparkSession.active
    val docs = spark.table(A.str(args(0), "docs table name"))
    val images = spark.table(A.str(args(1), "images table name"))
    val idCol = A.str(args(2), "id column")
    val imgKeyCol = A.str(args(3), "image key column")
    val payloadCol = A.str(args(4), "payload column")

    var minMaxLuma = 34L
    var maxHamming = 0
    var maxBucketPairs = 4_000_000L
    var checkpoint: graft.util.CheckpointStrategy =
      graft.util.CheckpointStrategy.Local
    A.options(args, 5) { (k, v) => k match {
      case "min_max_luma" => minMaxLuma = A.long(v, "min_max_luma value")
      case "max_hamming" =>
        maxHamming = A.int(v, "max_hamming value")
        if (maxHamming < 0 || maxHamming > 31)
          A.bad("max_hamming must be in [0, 31]", maxHamming)
      case "max_bucket_pairs" => maxBucketPairs = A.long(v, "max_bucket_pairs value")
      case "checkpoint_dir" => A.str(v, "checkpoint_dir value") match {
        case d if d.nonEmpty =>
          checkpoint = graft.util.CheckpointStrategy.Reliable(d)
        case other => A.bad("checkpoint_dir must be a non-empty directory", other)
      }
      case other => A.bad("unknown option", other)
    }}
    Multimodal.curateByDHashImages(docs, idCol, imgKeyCol, images, payloadCol,
      minMaxLuma, maxHamming, checkpoint, maxBucketPairs)
      .queryExecution.analyzed
  }
}
