package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.Embeddings

/** One-time generator for [[graft.pipeline.DemoModels.PcaDirections]]:
  * fits the 64→8 PCA on the sf0.01 embeddings fixture
  * ([[Embeddings.pcaFit]] — MLlib Gramian + driver eigendecomposition),
  * sign-canonicalizes and snaps the directions onto the 1e-6 integer
  * grid ([[Embeddings.quantizeDirections]]), and prints the Scala
  * source to paste. As with [[FitDemoModels]], the PASTED constants are
  * the library artifact: re-running on a different host may shift low
  * bits of the eigendecomposition, and the pinned grid values are the
  * truth both the Spark apply plan and the DuckDB oracle consume.
  */
object FitPcaDirections {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val planes = Embeddings.pcaFit(emb, "embedding", 64, 8)
    val micro = Embeddings.quantizeDirections(planes, 64, 8)
    println("  // fitted by graft.tools.FitPcaDirections on " + sfDir +
      " (64-dim embeddings, k=8), 1e-6 grid, sign-canonicalized")
    println("  val PcaDirections: Array[Long] = Array[Long](")
    (0 until 8).foreach { p =>
      val row = micro.slice(p * 64, (p + 1) * 64).map(_ + "L").mkString(", ")
      println(s"    $row" + (if (p < 7) "," else ""))
    }
    println("  )")
    spark.stop()
  }
}
