package graft.streaming

import graft.SparkSpec
import graft.pipeline.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ProfileStream.driftWriter]] — per-batch drift reports equal the
  * batch operator against the same baseline, and the null-rate shift the
  * monitor exists for is visible in the report. */
class ProfileStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("per-batch drift vs a stored baseline equals the batch operator") {
    val baselineDf = Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr"))
      .toDF("id", "lang")
    val baseline = Profile.columns(baselineDf, Seq("id", "lang"))

    // batch 0 looks like the baseline; batch 1 collapses lang to null
    val b0 = Seq((10L, "en"), (11L, "de")).toDF("id", "lang")
    val b1 = Seq((12L, null.asInstanceOf[String]),
      (13L, null.asInstanceOf[String])).toDF("id", "lang")
    val flat = java.nio.file.Files.createTempDirectory("drift_stream")
    Seq(b0, b1).zipWithIndex.foreach { case (df, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"dr_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(1000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)

    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Seq[Any]]]
    val writer = ProfileStream.driftWriter(stream, baseline, Seq("id", "lang")) {
      (report, id) =>
        perBatch.synchronized {
          perBatch(id) = report.collect().map(_.toSeq).toSet
        }
    }
    val rddsBefore = spark.sparkContext.getPersistentRDDs.size
    val q = writer.start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.sparkContext.getPersistentRDDs.size <= rddsBefore,
      "per-batch drift reports leaked")

    for ((df, id) <- Seq(b0 -> 0L, b1 -> 1L)) {
      val expect = Profile.drift(baselineDf, df, Seq("id", "lang"))
        .collect().map(_.toSeq).toSet
      assert(perBatch(id) == expect, s"batch $id")
    }
    // the monitor's reason to exist: batch 1's null collapse is visible
    val langRow = perBatch(1L).find(_.head == "lang").get
    val iNullsNew = Profile.drift(baselineDf, b1, Seq("id", "lang"))
      .columns.indexOf("n_nulls_new")
    assert(langRow(iNullsNew) == 2L)
  }
}
