package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState anomaly flags ([[Anomaly.valueAnomalies]]) vs an
  * in-memory Welford fold, batch and streaming, across micro-batch
  * boundaries (state must carry between batches).
  */
class AnomalySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def reference(rows: Seq[(Long, Long, Long, Double)], k: Double, minN: Long) =
    rows.groupBy(_._1).flatMap { case (_, rs) =>
      var (n, mean, m2) = (0L, 0.0, 0.0)
      rs.sortBy(r => (r._3, r._2)).map { case (u, e, ts, v) =>
        val sigma = if (n >= 2) math.sqrt(m2 / (n - 1)) else 0.0
        val z = if (n >= minN && sigma > 0) (v - mean) / sigma else 0.0
        val flagged = n >= minN && sigma > 0 && math.abs(z) > k
        val n1 = n + 1; val d = v - mean; val mean1 = mean + d / n1
        n = n1; m2 = m2 + d * (v - mean1); mean = mean1
        (e, math.round(z * 1e9), flagged)
      }
    }.toSet

  private def fixture: Seq[(Long, Long, Long, Double)] = {
    val rnd = new scala.util.Random(7L)
    val steady = for (u <- 0L until 4L; i <- 0L until 30L)
      yield (u, u * 1000 + i, i * 10L, 50.0 + rnd.nextGaussian())
    // one 20-sigma spike per user, late in the stream
    val spikes = (0L until 4L).map(u => (u, u * 1000 + 900, 310L, 80.0))
    steady ++ spikes
  }

  // transformWithState requires a multi-column-family state store
  // (RocksDB); the default HDFSBacked provider rejects it
  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("single-batch stream matches the in-memory Welford fold, flags the spikes") {
    withRocksDb {
      val dir = java.nio.file.Files.createTempDirectory("anomaly_one")
        .resolve("data").toString
      fixture.toDF("user_id", "event_id", "ts_us", "value")
        .coalesce(1).write.parquet(dir)
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema).parquet(dir)
      val q = Anomaly.valueAnomalies(stream, k = 5.0, minN = 10L)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("anomaly_one").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("anomaly_one")
        .collect().map(r => (r.getAs[Long]("event_id"),
          math.round(r.getAs[Double]("zscore") * 1e9), r.getAs[Boolean]("flagged"))).toSet
      assert(got === reference(fixture, 5.0, 10L))
      assert(got.filter(_._3).map(_._1) === Set(900L, 1900L, 2900L, 3900L))
    }
  }

  test("a state TTL selects ProcessingTime mode (TimeMode.None rejects TTL'd state)") {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode}
    assert(Anomaly.timeModeFor(TTLConfig.NONE) === TimeMode.None())
    assert(Anomaly.timeModeFor(TTLConfig(java.time.Duration.ofHours(1)))
      === TimeMode.ProcessingTime())
  }

  test("streaming across micro-batches carries state and flags identically") { withRocksDb {
    val dir = java.nio.file.Files.createTempDirectory("anomaly_stream")
    val (early, late) = fixture.partition(_._3 < 200L)
    early.toDF("user_id", "event_id", "ts_us", "value")
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    late.toDF("user_id", "event_id", "ts_us", "value")
      .coalesce(1).write.parquet(dir.resolve("b2").toString)
    val flat = java.nio.file.Files.createTempDirectory("anomaly_flat")
    Seq("b1", "b2").zipWithIndex.foreach { case (b, i) =>
      val src = java.nio.file.Files.list(dir.resolve(b))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      // FileStreamSource orders by mtime with listing-order ties —
      // back-to-back copies can tie at ms resolution; pin the order
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val schema = spark.read.parquet(flat.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = Anomaly.valueAnomalies(stream, k = 5.0, minN = 10L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("anomaly_stream").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("anomaly_stream")
      .collect().map(r => (r.getAs[Long]("event_id"),
        math.round(r.getAs[Double]("zscore") * 1e9), r.getAs[Boolean]("flagged"))).toSet
    // the spike arrives in batch 2; its baseline (batch 1 state) must
    // have carried over for the flag to fire
    assert(got === reference(fixture, 5.0, 10L))
    assert(got.count(_._3) === 4)
  } }
}
