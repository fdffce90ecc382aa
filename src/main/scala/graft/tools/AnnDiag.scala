package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fuzzy._

/** One-off stage diagnostics for the ANN candidate path at sf0.1. */
object AnnDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val opts = MatchOptions()
    val c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val vals = FuzzyMatcher.distinctValues(c.withColumn("__left_index", monotonically_increasing_id()), "c_name").localCheckpoint()
    val n = opts.lshNgramSize; val bands = opts.lshNumBands; val rows = opts.lshRowsPerBand
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    val banded = t("band") {
      vals.select(col("c_name"), posexplode(
        vectorFunctions.lsh_band_keys(
          vectorFunctions.minhash_signature(
            vectorFunctions.char_ngrams(lower(col("c_name")), n), bands*rows), bands, rows)))
        .withColumnRenamed("pos","__band").withColumnRenamed("col","__bkey").localCheckpoint()
    }
    println("banded rows=" + banded.count())
    val allowed = t("bucket stats") {
      banded.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__lc"))
        .join(banded.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__rc")), Seq("__band","__bkey"))
        .where(col("__lc")*col("__rc") <= opts.lshMaxBucketPairs).select("__band","__bkey").localCheckpoint()
    }
    println("allowed buckets=" + allowed.count())
    val rawPairs = t("bucket join count") {
      banded.as("a").join(allowed, Seq("__band","__bkey"))
        .join(banded.as("b").withColumnRenamed("c_name","c_name_r"), Seq("__band","__bkey")).count()
    }
    println("raw candidate stream=" + rawPairs)
    val gated = t("gate count") {
      banded.as("a").join(allowed, Seq("__band","__bkey"))
        .join(banded.withColumnRenamed("c_name","c_name_r"), Seq("__band","__bkey"))
        .withColumn("__jd", vectorFunctions.ngram_jaccard_dist(lower(col("c_name")), lower(col("c_name_r")), n))
        .where(col("__jd") <= 0.6).count()
    }
    println("gated stream=" + gated)
    spark.stop()
  }
}
