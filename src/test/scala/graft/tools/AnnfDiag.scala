package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fuzzy._

/** End-to-end timing for the ANN-friendly bench workload through the real
  * AnnJoin path (document-substring values with injected typos). */
object AnnfDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val sfDir = "/root/testdata/sf0.1"
    def docValues(offsets: Seq[Int], out: String): DataFrame =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), explode(array(offsets.map(lit): _*)).as("__off"), col("text"))
        .where(length(col("text")) >= col("__off") + 30)
        .select(expr(s"substring(text, __off, 30)").as(out))
        .where(length(col(out)) === 30)
        .distinct()
    def injectTypo(df: DataFrame, in: String, out: String): DataFrame =
      df.select(expr(
        s"concat(substring($in, 1, cast(pmod(xxhash64($in), length($in) - 4) + 2 as int) - 1), " +
          s"substring($in, cast(pmod(xxhash64($in), length($in) - 4) + 2 as int) + 1, length($in)))"
      ).as(out)).distinct()

    val opts = MatchOptions(lshNumBands = 12, lshRowsPerBand = 5)
    val lv = t("left values ckpt")(docValues(1 to 271 by 10, "name").localCheckpoint())
    val rv = t("right values ckpt")(
      injectTypo(docValues(1 to 211 by 30, "src"), "src", "name_t").localCheckpoint())
    val lc = lv.count(); val rc = rv.count()
    println(s"left=$lc right=$rc cartesian=${lc.toDouble * rc}")

    val cand = t("candidates TOTAL")(
      AnnJoin.candidates(lv, rv, "name", "name_t", opts,
        reversedThreshold = 0.1, totalValues = lc + rc).localCheckpoint())
    println("candidates=" + cand.count())

    // stage breakdown of the new build
    val n = opts.lshNgramSize; val bands = opts.lshNumBands; val rows = opts.lshRowsPerBand
    val k = bands * rows
    def gramsOf(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol).as("__v"),
        explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"))
    val stops = t("stop grams collect")(
      gramsOf(lv, "name").unionByName(gramsOf(rv, "name_t"))
        .groupBy(col("__g")).agg(count(lit(1)).as("__df"))
        .where(col("__df") > opts.lshStopGramFraction * (lc + rc)).select(col("__g"))
        .collect().map(_.getString(0)))
    println("stops=" + stops.length)
    def banded(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol), lower(col(vCol)).as(s"__l__$vCol"),
          posexplode(vectorFunctions.lsh_band_keys(
            vectorFunctions.minhash_signature(
              vectorFunctions.kept_grams(lower(col(vCol)), n, stops, opts.lshMinKeptGrams), k),
            bands, rows)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bkey")
    val lb = banded(lv, "name"); val rb = banded(rv, "name_t")
    println("banded rows=" + t("banding (count only)")(lb.count() + rb.count()))
    val bucketStats = lb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__lc"))
      .join(rb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__rc")),
        Seq("__band", "__bkey"))
    val overCap = col("__lc") * col("__rc") > opts.lshMaxBucketPairs
    val stats = t("bucket stats ckpt")(bucketStats.localCheckpoint())
    println("buckets=" + stats.count() +
      " joinPairs=" + stats.agg(sum(col("__lc") * col("__rc"))).head().getLong(0))
    val allowed = stats.where(!overCap).select(col("__band"), col("__bkey"))
    val gated = t("join+gate+dedup ckpt")(
      lb.join(allowed, Seq("__band", "__bkey")).join(rb, Seq("__band", "__bkey"))
        .select(col("name"), col("__l__name"), col("name_t"), col("__l__name_t"))
        .withColumn("__jd", vectorFunctions.ngram_jaccard_dist(col("__l__name"), col("__l__name_t"), n))
        .where(col("__jd") <= 0.646)
        .dropDuplicates("name", "name_t")
        .localCheckpoint())
    println("gated+deduped rows=" + gated.count())
    spark.stop()
  }
}
