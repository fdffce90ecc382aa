package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.{AnnSearch, Dedup}

/** One-time generator for [[graft.pipeline.DemoModels.SemCentroids]]:
  * fits the k-means coarse quantizer for [[Dedup.semDedup]] on the
  * sf0.01 embeddings fixture ([[AnnSearch.kmeansFit]]), unit-normalizes
  * each centroid and snaps it onto the 1e-6 integer grid
  * ([[Dedup.quantizeCentroidsMicro]]), and prints the Scala source to
  * paste. As with [[FitPcaDirections]], the PASTED constants are the
  * library artifact: the pinned grid values are the truth both the
  * Spark assignment plan and the DuckDB oracle consume.
  */
object FitSemCentroids {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = AnnSearch.kmeansFit(emb, "embedding", dim = 64, k = k, iters = 4)
    val micro = Dedup.quantizeCentroidsMicro(cents)
    println("  // fitted by graft.tools.FitSemCentroids on " + sfDir +
      s" (64-dim embeddings, k=$k, 4 iters), unit-normalized, 1e-6 grid")
    println("  val SemCentroids: Array[Long] = Array[Long](")
    (0 until k).foreach { p =>
      val row = micro.slice(p * 64, (p + 1) * 64).map(_ + "L").mkString(", ")
      println(s"    $row" + (if (p < k - 1) "," else ""))
    }
    println("  )")
    spark.stop()
  }
}
