package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

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

  private def bad(what: String, got: Any): Nothing =
    throw new IllegalArgumentException(
      s"curate_dhash: $what, got '$got'. Usage: $usage")

  private def lit(e: Expression, what: String): Any = {
    if (!e.foldable) bad(s"$what must be a literal", e.sql)
    e.eval()
  }

  private def str(e: Expression, what: String): String = lit(e, what) match {
    case s: UTF8String => s.toString
    case other => bad(s"$what must be a string literal", other)
  }

  private def long(e: Expression, what: String): Long = lit(e, what) match {
    // accept only exactly-integral numerics: `curate_dhash(..., 'max_hamming',
    // 2.9)` must fail like every other malformed argument here, not silently
    // truncate to 2 via Number.longValue()
    case n: Number if n.doubleValue() == n.longValue() => n.longValue()
    case other => bad(s"$what must be an integer literal", other)
  }

  /** TVF builder registered by [[graft.GraftExtensions]]. */
  def build(args: Seq[Expression]): LogicalPlan = {
    if (args.length < 5 || (args.length - 5) % 2 != 0)
      throw new IllegalArgumentException(
        s"curate_dhash: got ${args.length} arguments. Usage: $usage")
    val spark = SparkSession.active
    val docs = spark.table(str(args(0), "docs table name"))
    val images = spark.table(str(args(1), "images table name"))
    val idCol = str(args(2), "id column")
    val imgKeyCol = str(args(3), "image key column")
    val payloadCol = str(args(4), "payload column")

    var minMaxLuma = 34L
    var maxHamming = 0
    var maxBucketPairs = 4_000_000L
    var checkpoint: graft.util.CheckpointStrategy =
      graft.util.CheckpointStrategy.Local
    args.drop(5).grouped(2).foreach {
      case Seq(k, v) => str(k, "option name") match {
        case "min_max_luma" => minMaxLuma = long(v, "min_max_luma value")
        case "max_hamming" =>
          val h = long(v, "max_hamming value")
          if (h < 0 || h > 31) bad("max_hamming must be in [0, 31]", h)
          maxHamming = h.toInt
        case "max_bucket_pairs" => maxBucketPairs = long(v, "max_bucket_pairs value")
        case "checkpoint_dir" => str(v, "checkpoint_dir value") match {
          case d if d.nonEmpty =>
            checkpoint = graft.util.CheckpointStrategy.Reliable(d)
          case other => bad("checkpoint_dir must be a non-empty directory", other)
        }
        case other => bad("unknown option", other)
      }
      case odd => throw new IllegalStateException(
        s"curate_dhash: internal option-pair grouping error on $odd")
    }
    Multimodal.curateByDHashImages(docs, idCol, imgKeyCol, images, payloadCol,
      minMaxLuma, maxHamming, checkpoint, maxBucketPairs)
      .queryExecution.analyzed
  }
}
