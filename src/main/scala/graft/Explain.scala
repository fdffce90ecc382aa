package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for representative queries so
  * plan regressions (lost pushdown, lost codegen, unexpected shuffles) are
  * visible. Run: `sbt "runMain graft.Explain [queryName ...]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // events.parquet stores TIMESTAMP(NANOS); read as raw long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "fuzzy_join_levenshtein", "text_stats", "dedup_ngram_jaccard", "ann_cosine_topk",
      "events_asof", "text_decontaminate", "dedup_incremental", "curate_chunks",
      "ann_cosine_int8", "dedup_chunk_exact", "corpus_rollup", "events_pivot",
      "curate_batches", "ann_radius_lsh", "curate_shard", "curate_interleave",
      "text_ngram_freq", "dedup_boilerplate",
      // round-16 surface: the warc HTTP split must stay a pruned
      // single-scan, and warc_to_text a zero-exchange scan -> project
      // (both now also pinned in PlanHygieneSpec); round-17: the charset
      // decode and outlink extraction share the same shape
      "source_warc_http", "warc_to_text", "source_warc_http_text",
      "warc_links")
    names.foreach { name =>
      println(s"\n================ $name ================")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
