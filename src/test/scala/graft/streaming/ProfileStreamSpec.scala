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

  test("streaming PSI monitor: per-batch reports equal the batch operator, " +
    "and a distribution flip lights up") {
    val baselineDf = (Seq.fill(40)("en") ++ Seq.fill(40)("de"))
      .zipWithIndex.map(_.swap).toDF("id", "lang")
    val baseCounts = baselineDf.groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"))
    // batch 0 matches the baseline mix; batch 1 is all-zh
    val b0 = Seq((100L, "en"), (101L, "de")).toDF("id", "lang")
    val b1 = Seq((102L, "zh"), (103L, "zh")).toDF("id", "lang")
    val flat = java.nio.file.Files.createTempDirectory("psi_stream")
    Seq(b0, b1).zipWithIndex.foreach { case (df, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"psi_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(3000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val perBatch = scala.collection.mutable.Map.empty[Long, Map[String, Double]]
    val q = ProfileStream.psiWriter(stream, baseCounts, "lang") { (report, id) =>
      perBatch.synchronized {
        perBatch(id) = report.collect()
          .map(r => r.getString(0) -> r.getAs[Double]("psi_contrib")).toMap
      }
    }.start()
    try q.processAllAvailable() finally q.stop()
    for ((df, id) <- Seq(b0 -> 0L, b1 -> 1L)) {
      val expect = graft.pipeline.Profile.psiFromCounts(baseCounts,
          df.groupBy(col("lang")).agg(count(lit(1)).as("cnt")), Seq("lang"))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("psi_contrib")).toMap
      assert(perBatch(id) === expect, s"batch $id")
    }
    // the monitor's reason to exist: the flip batch crosses the 0.25 bar,
    // the in-mix batch stays well under it
    assert(perBatch(1L).values.sum > 0.25)
    assert(perBatch(0L).values.sum < 0.1)
  }

  test("streaming HLL monitor: the running estimate after the last batch " +
    "equals the batch sketch over everything, bit for bit") {
    val events = graft.util.EventTs.loadEvents(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("user_id"))
    // three micro-batches by event_id residue
    val parts = (0 to 2).map(r => events.where(col("event_id") % 3 === r))
    val flat = java.nio.file.Files.createTempDirectory("hll_stream")
    parts.zipWithIndex.foreach { case (df, i) =>
      val part = java.nio.file.Files.createTempDirectory(s"hll_part$i")
      df.coalesce(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = flat.resolve(f"$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      dst.toFile.setLastModified(2000000L + i * 10000L)
    }
    val stream = spark.readStream.schema(parts.head.schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.toString)
    val q = ProfileStream.hllDistinctStream(stream, "user_id", "event_type", p = 8)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("hll_mon").start()
    try q.processAllAvailable() finally q.stop()
    // memory sink in Update mode appends every emission: the LAST row per
    // group is the monitor's final running state
    val last = spark.table("hll_mon").collect()
      .zipWithIndex
      .groupBy(_._1.getString(0))
      .map { case (g, rs) =>
        val r = rs.maxBy(_._2)._1; g -> (r.getLong(1), r.getDouble(2)) }
    val batch = Profile.hllDistinct(events, "user_id", Seq("event_type"), p = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(last === batch, s"stream $last vs batch $batch")
    // and the monitor actually accumulated: a mid-stream emission differs
    assert(spark.table("hll_mon").count() > batch.size)
  }
}
