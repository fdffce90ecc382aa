package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Robots}

/** sf0.1 A/B of the domain-granular robots gate (VERDICT r17 item 1)
  * against the per-row `robots_allowed` expression, on the realistic
  * crawl shape: FEW domains, MILLIONS of paths each, a realistically
  * sized robots.txt (dozens of groups/rules). The per-row arm re-parses
  * the same text for every path; the gate parses once per domain and
  * walks pre-parsed rules per row.
  *
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     sbt -batch "Test/runMain graft.tools.RobotsGateAb /root/testdata/sf0.1"
  */
object RobotsGateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a realistically hairy robots.txt: 40 groups, ~6 rules each
    val txt = (0 until 40).map { g =>
      s"User-agent: bot$g\nDisallow: /g$g/private/\nAllow: /g$g/private/ok/\n" +
        s"Disallow: *.tmp$$\nCrawl-delay: ${g % 9}\nAllow: /g$g/pub"
    }.mkString("", "\n\n", "\n\nUser-agent: *\nDisallow: /blocked/\nAllow: /\n")

    // sf0.1 lineitem keys (~600k paths; ~7M at sf1) over 64 domains
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val pages = li.select(
      concat(lit("d"), expr("CAST(l_orderkey % 64 AS STRING)"), lit(".example"))
        .as("domain"),
      expr("""CASE CAST(l_partkey % 4 AS INT)
        WHEN 0 THEN concat('/blocked/', l_partkey)
        WHEN 1 THEN concat('/g3/private/', l_partkey)
        WHEN 2 THEN concat('/g3/private/ok/', l_partkey)
        ELSE concat('/data/', l_partkey, '.tmp') END""").as("path"))
      .localCheckpoint() // isolate fixture build from the measured scans
    val nRows = pages.count()
    val robots = spark.range(64).select(
      concat(lit("d"), col("id").cast("string"), lit(".example")).as("domain"),
      lit(txt).as("robots_txt"))

    def time(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[robots_ab] $label%-12s $dt%7.2f s  ($nRows rows, $n allowed)")
      dt
    }
    // warmup both plans once (codegen compile)
    Curation.robotsGate(pages.limit(1000), robots, "bot3").where(col("allowed")).count()
    pages.limit(1000).join(broadcast(robots), Seq("domain"), "left")
      .where(Robots.allowed(col("robots_txt"), lit("bot3"), col("path"))).count()

    val perRow = (1 to 3).map { _ => time("per-row") {
      pages.join(broadcast(robots), Seq("domain"), "left")
        .where(Robots.allowed(col("robots_txt"), lit("bot3"), col("path")))
        .count()
    }}.min
    val gate = (1 to 3).map { _ => time("gate") {
      Curation.robotsGate(pages, robots, "bot3").where(col("allowed")).count()
    }}.min
    println(f"[robots_ab] speedup: ${perRow / gate}%.1fx (per-row $perRow%.2f s -> gate $gate%.2f s)")
    spark.stop()
  }
}
