package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fuzzy._

/** Stage diagnostics for the ANN match path at sf0.1. */
object AnnDiag {
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
    val c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val leftIdx = t("index left")(FuzzyMatcher.addIndexColumn(c, "__left_index"))
    val rightIdx = t("index right")(FuzzyMatcher.addIndexColumn(
      c.columns.foldLeft(c)((df, cn) => df.withColumnRenamed(cn, cn + "_right")), "__right_index"))
    val lv = t("left distinct")(FuzzyMatcher.distinctValues(leftIdx, "c_name").localCheckpoint())
    val rv = t("right distinct")(FuzzyMatcher.distinctValues(rightIdx, "c_name_right").localCheckpoint())
    t("counts")((lv.count(), rv.count()))
    val cand = t("ann candidates (lazy)")(
      AnnJoin.candidates(lv, rv, "c_name", "c_name_right", opts, 0.1, 30000).localCheckpoint())
    println("candidates=" + t("ann candidates count")(cand.count()))
    val scored = t("score (lazy)")(FuzzyMatcher.scoreValuePairs(cand, "c_name", "c_name_right",
      FuzzyAlgorithm.Levenshtein, 0.1).localCheckpoint())
    println("scored=" + t("score count")(scored.count()))
    val back = t("join back")(
      scored.join(leftIdx.select(col("__left_index"), col("c_name")), Seq("c_name"))
        .join(rightIdx.select(col("__right_index"), col("c_name_right")), Seq("c_name_right"))
        .select(col("s"), col("__left_index"), col("__right_index")).count())
    println("rows=" + back)
    spark.stop()
  }
}
