package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.WebGraph

/** PageRank scale diagnostic: (a) does the per-iteration join re-shuffle
  * the EDGE side, or does the materialized eDeg barrier carry its
  * hash-partitioning across iterations? (b) wall clock for a
  * few-million-edge graph at 8 iterations, dropped vs conserved arms.
  *
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     sbt -batch "Test/runMain graft.tools.PageRankDiag /root/testdata/sf0.1"
  */
object PageRankDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~4.8M raw edges over ~1.5M nodes: sf0.1 lineitem key pairs x8
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        explode(org.apache.spark.sql.functions.sequence(lit(0), lit(7)))
          .as("k"))
      .select(
        ((col("l_orderkey") * 8 + col("k")) % 1500000).as("src"),
        ((col("l_partkey") * 7919 + col("l_suppkey") * 31 + col("k") * 997)
          % 1500000).as("dst"))
      .localCheckpoint()
    val nEdges = edges.count()

    // does the PER-ITERATION join re-shuffle the edge side? eDeg's
    // checkpoint barrier carries the hash-partitioning of the join that
    // built it, so the iteration join should exchange ONLY the
    // node-sized ranks side
    {
      val e = graft.util.Materialize(
        edges.where(col("src") =!= col("dst")).distinct(),
        graft.util.CheckpointStrategy.Local)
      val eDeg = graft.util.Materialize(
        e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"),
        graft.util.CheckpointStrategy.Local)
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .localCheckpoint()
      val ranks = nodes.select(col("node"), lit(1000L).as("rank"))
      val iterPlan = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(eDeg("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cin"))
        .queryExecution.executedPlan.toString
      val exchanges = iterPlan.linesIterator.count(_.contains("Exchange"))
      println(s"[pr_diag] per-iteration exchanges: $exchanges " +
        "(ranks side + contribution agg expected; edge side must reuse " +
        "its barrier partitioning)")
      if (exchanges > 2) println(iterPlan)
      graft.util.Materialize.release(eDeg)
      graft.util.Materialize.release(e)
    }

    def time(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pr_diag] $label%-22s $dt%7.2f s  (rows=$n)")
      dt
    }
    // warmup (codegen + parquet cache)
    WebGraph.pageRank(edges.limit(50000), "src", "dst", iterations = 2).count()

    val dropped = time(s"pageRank 8it ${nEdges}e") {
      val r = WebGraph.pageRank(edges, "src", "dst", iterations = 8)
      val n = r.count(); graft.util.Materialize.release(r); n
    }
    val conserved = time("conserved 8it") {
      val r = WebGraph.pageRank(edges, "src", "dst", iterations = 8,
        danglingRedistribute = true)
      val n = r.count(); graft.util.Materialize.release(r); n
    }
    println(f"[pr_diag] conserved overhead: ${(conserved / dropped - 1) * 100}%.0f%%")
    spark.stop()
  }
}
