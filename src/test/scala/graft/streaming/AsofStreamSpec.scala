package graft.streaming

import graft.SparkSpec
import graft.pipeline.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static as-of enrichment must produce EXACTLY the batch
  * operator's result for the same rows — end-to-end through a real file
  * source + AvailableNow trigger, like FuzzyMatchStreamSpec. */
class AsofStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("stream-static asof equals the batch operator") {
    // reference: per-key config snapshots; stream: events to enrich
    val reference = Seq(
      ("A", 10L, 900L), ("A", 30L, 901L), ("B", 20L, 902L)
    ).toDF("k", "rts", "cfg_id")
    val eventsDf = Seq(
      ("A", 5L, 1L), ("A", 10L, 2L), ("A", 25L, 3L), ("A", 99L, 4L),
      ("B", 19L, 5L), ("B", 21L, 6L), ("C", 50L, 7L)
    ).toDF("k", "ts", "event_id")

    val dir = java.nio.file.Files.createTempDirectory("asof_stream")
    eventsDf.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(eventsDf.schema).parquet(dir.toString)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = AsofStream.enrichWriter(stream, reference, Seq("k"),
        "ts", "rts", Seq("cfg_id")) { (enriched, _) =>
      got.synchronized {
        got ++= enriched.select($"event_id", $"cfg_id")
          .as[(Long, Option[Long])].collect()
      }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("asof_ckpt").toString)
      .start()
    assert(q.awaitTermination(120000L), "streaming query did not drain in time")

    val expected = AsofJoin.backward(eventsDf, reference, Seq("k"),
        "ts", "rts", Seq("cfg_id"))
      .select($"event_id", $"cfg_id").as[(Long, Option[Long])]
      .collect().toSeq.sorted
    assert(expected.nonEmpty)
    assert(got.synchronized(got.toSeq.sorted) == expected)
    // spot-check the semantics end-to-end, not just self-consistency
    val m = got.synchronized(got.toMap)
    assert(m(1L).isEmpty && m(2L).contains(900L) && m(3L).contains(900L)
      && m(4L).contains(901L) && m(5L).isEmpty && m(6L).contains(902L)
      && m(7L).isEmpty)
  }
}
