package graft.streaming

import graft.SparkSpec
import graft.pipeline.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming expectations equal the batch suite per micro-batch, and the
  * monitor's cumulative counts are the per-batch sums. */
class ExpectationsStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("per-batch reports match the batch operator; cumulative sums hold") {
    // two micro-batches with known pathologies
    val b0 = Seq[(java.lang.Long, String)]((1L, "ok"), (2L, null), (2L, "ok2"))
      .toDF("id", "s") // 1 null, 1 dup id
    val b1 = Seq[(java.lang.Long, String)]((null, "x"), (5L, "ok"), (6L, "ok"))
      .toDF("id", "s") // 1 null id
    val flat = java.nio.file.Files.createTempDirectory("expect_stream")
    Seq(b0, b1).zipWithIndex.foreach { case (df, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"expect_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val checks = Seq(
      Profile.ExpectNotNull("id"), Profile.ExpectNotNull("s"),
      Profile.ExpectUnique("id"), Profile.ExpectRowCount(1L, 100L))
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    val perBatch = scala.collection.mutable.Map.empty[Long, Map[(String, String), (Long, Long)]]
    val (w, monitor) = ExpectationsStream.writer(stream, checks) { (report, id) =>
      perBatch.synchronized {
        perBatch(id) = report.collect()
          .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
          .toMap
      }
    }
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val q = w.start()
    try q.processAllAvailable() finally q.stop()

    // per-batch report barriers release with their scope — a monitoring
    // stream may not leak one block per micro-batch
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
      "per-batch report barriers leaked")
    assert(monitor.batchCount == 2L)
    // each batch's report equals the batch operator run on that chunk
    for ((df, id) <- Seq(b0 -> 0L, b1 -> 1L)) {
      val expect = Profile.expectations(df, checks).collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(perBatch(id) == expect, s"batch $id: ${perBatch(id)} vs $expect")
    }
    // cumulative: sums of the per-batch violation counts, unique flagged
    // as batch-scope
    val cum = monitor.cumulative.map { case (n, c, v, bs) => (n, c) -> ((v, bs)) }.toMap
    assert(cum(("not_null", "id")) == ((1L, false)))
    assert(cum(("not_null", "s")) == ((1L, false)))
    assert(cum(("unique", "id")) == ((1L, true)))
    assert(cum(("row_count", "")) == ((0L, false)))
  }
}
