package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.fuzzy._

object ExactDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val lv = c.select(col("c_name")).distinct().withColumn("__ll", lower(col("c_name"))).localCheckpoint()
    val rv = c.select(col("c_name").as("r_name")).distinct().withColumn("__rl", lower(col("r_name"))).localCheckpoint()
    // raw cross join + bounded kernel + filter, nothing else
    val n1 = t("crossjoin+kernel+filter count") {
      lv.crossJoin(broadcast(rv))
        .withColumn("s", functions.fuzzy_dist_bounded(col("__ll"), col("__rl"), FuzzyAlgorithm.Levenshtein, 0.1))
        .where(col("s") <= 0.1).count()
    }
    println("pairs=" + n1)
    // kernel-free baseline: how much is join+row overhead alone?
    val n2 = t("crossjoin only count") {
      lv.crossJoin(broadcast(rv)).count()
    }
    println("rows=" + n2)
    // pure kernel throughput on driver: 225M bounded lev calls single-thread
    val a = org.apache.spark.unsafe.types.UTF8String.fromString("customer#000001234")
    val b = org.apache.spark.unsafe.types.UTF8String.fromString("customer#000005678")
    t("10M kernel calls (1 thread)") {
      var i = 0; var acc = 0.0
      while (i < 10000000) { acc += Kernels.distBounded(0, a, b, 0.1); i += 1 }
      acc
    }
    spark.stop()
  }
}
