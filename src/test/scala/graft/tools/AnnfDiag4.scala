package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fuzzy._

/** Incremental stage timings inside the REAL AnnJoin.build shape (driver-side
  * bucket gate + jaccard + single-window dedup/rank) to locate the hot stage
  * of fuzzy_annf_3g_lsh. */
object AnnfDiag4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
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
    val n = opts.lshNgramSize; val bands = opts.lshNumBands; val rows = opts.lshRowsPerBand
    val k = bands * rows
    val lv = docValues(1 to 271 by 10, "name").localCheckpoint()
    val rv = injectTypo(docValues(1 to 211 by 30, "src"), "src", "name_t").localCheckpoint()
    val lc = lv.count(); val rc = rv.count()
    println(s"left=$lc right=$rc")

    // warmup: run everything once so JIT/codegen costs are paid
    t("WARMUP candidates")(AnnJoin.candidates(lv, rv, "name", "name_t", opts,
      reversedThreshold = 0.1, totalValues = lc + rc).count())

    val stops: Array[String] = t("stop grams (sampled collect)") {
      val sampleFrac = math.min(1.0, opts.lshProbeSampleSize.toDouble / (lc + rc))
      lv.select(col("name").as("__v")).unionByName(rv.select(col("name_t").as("__v")))
        .sample(withReplacement = false, sampleFrac, seed = 42L)
        .select(explode(array_distinct(vectorFunctions.char_ngrams(lower(col("__v")), n))).as("__g"))
        .groupBy(col("__g")).agg(count(lit(1)).as("__df"))
        .where(col("__df") > opts.lshStopGramFraction * ((lc + rc) * sampleFrac))
        .select(col("__g")).collect().map(_.getString(0))
    }
    def banded(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol), lower(col(vCol)).as(s"__lower__$vCol"),
          posexplode(vectorFunctions.lsh_band_keys(
            vectorFunctions.minhash_signature(
              vectorFunctions.kept_grams(lower(col(vCol)), n, stops, opts.lshMinKeptGrams), k),
            bands, rows)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bkey")
    val lb = banded(lv, "name"); val rb = banded(rv, "name_t")
    t("banding count (minhash cost x2)")(lb.count() + rb.count())

    val bucketStats = lb.select(col("__band"), col("__bkey"), lit(1L).as("__l"), lit(0L).as("__r"))
      .unionByName(rb.select(col("__band"), col("__bkey"), lit(0L).as("__l"), lit(1L).as("__r")))
      .groupBy(col("__band"), col("__bkey"))
      .agg(sum(col("__l")).as("__lc"), sum(col("__r")).as("__rc"))
      .where(col("__lc") > 0 && col("__rc") > 0)
    val sortedKeys: Array[Long] = t("bucket stats -> sorted keys") {
      bucketStats.where(!(col("__lc") * col("__rc") > opts.lshMaxBucketPairs))
        .select(col("__band"), col("__bkey"))
        .collect().map(r => r.getInt(0).toLong << 56 ^ r.getLong(1) & 0x00FFFFFFFFFFFFFFL).sorted
    }
    println("allowed buckets=" + sortedKeys.length)
    // NOTE: key packing here is only for sizing diagnostics; the real path
    // uses CapMetrics.gate's packing. Stage timings below use the real gate.
    val gate = graft.util.CapMetrics.gate(bucketStats, "diag", "__band", "__bkey",
      col("__lc") * col("__rc") > opts.lshMaxBucketPairs, col("__lc") * col("__rc"),
      graft.util.CheckpointStrategy.Local)
    val joined = gate match {
      case Right(keys) =>
        val keep = (df: DataFrame) =>
          df.where(vectorFunctions.bucket_allowed(col("__band"), col("__bkey"), keys))
        keep(lb).join(keep(rb), Seq("__band", "__bkey"))
      case Left(allowed) =>
        lb.join(allowed, Seq("__band", "__bkey")).join(rb, Seq("__band", "__bkey"))
    }
    t("A join only (count)")(joined.count())

    val gated = joined
      .select(col("name"), col("__lower__name"),
        col("name_t"), col("__lower__name_t"))
      .withColumn("__jd", vectorFunctions.ngram_jaccard_dist(
        col("__lower__name"), col("__lower__name_t"), n))
      .where(col("__jd") <= 0.646)
    t("B join+jaccard (count)")(gated.count())

    val w = Window.partitionBy(col("name")).orderBy(col("__jd").asc, col("name_t").asc)
    val isDup = coalesce(col("name_t") === lag(col("name_t"), 1).over(w) &&
      col("__jd") === lag(col("__jd"), 1).over(w), lit(false))
    val ranked = gated.withColumn("__dup", isDup)
      .withColumn("__rnk", sum(when(col("__dup"), 0L).otherwise(1L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(!col("__dup") && col("__rnk") <= opts.topNForNewMatches)
    t("C join+jaccard+window (count)")(ranked.count())

    val scored = FuzzyMatcher.scoreValuePairs(
      ranked.drop("__dup", "__rnk", "__jd"), "name", "name_t",
      FuzzyAlgorithm.Levenshtein, 0.1)
    t("D full candidates+score (count)")(scored.count())
    spark.stop()
  }
}
