package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fuzzy._

/** Mirrors AnnJoin.candidates stage-by-stage with timing. */
object AnnDiag2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val opts = MatchOptions()
    val n = opts.lshNgramSize; val bands = opts.lshNumBands; val rows = opts.lshRowsPerBand
    val k = bands * rows
    val c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val lv = c.select(col("c_name")).distinct().localCheckpoint()
    val rv = c.select(col("c_name").as("c_name_right")).distinct().localCheckpoint()
    val total = lv.count() + rv.count()

    def gramsOf(df: DataFrame, vCol: String): DataFrame =
      df.select(col(vCol).as("__v"),
        explode(array_distinct(vectorFunctions.char_ngrams(lower(col(vCol)), n))).as("__g"))

    val allGrams = t("allGrams ckpt")(
      gramsOf(lv, "c_name").unionByName(gramsOf(rv, "c_name_right")).localCheckpoint())
    val stopGrams = allGrams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > opts.lshStopGramFraction * total).select(col("__g"))
    println("stop grams=" + t("stop grams count")(stopGrams.count()))

    def keptGrams(df: DataFrame, vCol: String): DataFrame = {
      val kept = gramsOf(df, vCol).join(stopGrams, Seq("__g"), "left_anti")
        .groupBy(col("__v")).agg(collect_list(col("__g")).as("__grams"))
        .withColumnRenamed("__v", vCol)
      df.join(kept, Seq(vCol), "left")
        .withColumn("__grams",
          when(col("__grams").isNull || size(col("__grams")) < opts.lshMinKeptGrams,
            vectorFunctions.char_ngrams(lower(col(vCol)), n)).otherwise(col("__grams")))
    }
    def banded(df: DataFrame, vCol: String): DataFrame =
      keptGrams(df, vCol).select(col(vCol), lower(col(vCol)).as("__low_" + vCol),
        posexplode(vectorFunctions.lsh_band_keys(
          vectorFunctions.minhash_signature(col("__grams"), k), bands, rows)))
        .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bkey")

    val lb = t("band left ckpt")(banded(lv, "c_name").localCheckpoint())
    val rb = t("band right ckpt")(banded(rv, "c_name_right").localCheckpoint())
    val allowed = t("allowed ckpt")(
      lb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__lc"))
        .join(rb.groupBy(col("__band"), col("__bkey")).agg(count(lit(1)).as("__rc")), Seq("__band", "__bkey"))
        .where(col("__lc") * col("__rc") <= opts.lshMaxBucketPairs)
        .select(col("__band"), col("__bkey")).localCheckpoint())
    println("allowed=" + allowed.count())
    val gate = 0.646
    val verified = t("join+gate+dedup ckpt")(
      lb.join(allowed, Seq("__band", "__bkey")).join(rb, Seq("__band", "__bkey"))
        .select(col("c_name"), col("__low_c_name"), col("c_name_right"), col("__low_c_name_right"))
        .withColumn("__jd", vectorFunctions.ngram_jaccard_dist(col("__low_c_name"), col("__low_c_name_right"), n))
        .where(col("__jd") <= gate)
        .dropDuplicates("c_name", "c_name_right").localCheckpoint())
    println("verified=" + verified.count())
    val w = Window.partitionBy(col("c_name")).orderBy(col("__jd").asc, col("c_name_right").asc)
    val top = t("window ckpt")(
      verified.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= opts.topNForNewMatches).drop("__rn", "__jd").localCheckpoint())
    println("top=" + top.count())
    spark.stop()
  }
}
