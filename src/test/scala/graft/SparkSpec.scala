package graft

import org.apache.spark.sql.SparkSession

/** Shared session for all suites (one JVM-wide session, local[4]). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // exercise the production wiring: all graft SQL functions arrive via
      // session extensions, exactly as a cluster user would enable them
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // events.parquet stores TIMESTAMP(NANOS); read as long + convert
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.spark
}
