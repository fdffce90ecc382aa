package graft.streaming

import graft.SparkSpec
import graft.fuzzy.{FuzzyAlgorithm, FuzzyMapping, FuzzyMatcher}
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static fuzzy matching must produce EXACTLY the batch matcher's
  * result for the same rows — foreachBatch runs the full batch algorithm
  * per micro-batch, so this is an end-to-end identity check through a real
  * streaming query (file source, AvailableNow trigger). */
class FuzzyMatchStreamSpec extends AnyFunSuite with SparkSpec {

  private val custPath = "/root/testdata/sf0.001/customer.parquet"
  private val suppPath = "/root/testdata/sf0.001/supplier.parquet"

  test("stream-static match equals the batch matcher") {
    val dir = java.nio.file.Files.createTempDirectory("cust_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(custPath),
      dir.resolve("customer.parquet"))
    val schema = spark.read.parquet(custPath).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val reference = spark.read.parquet(suppPath)
    val maps = Seq(FuzzyMapping("c_name", "s_name", 70.0, FuzzyAlgorithm.Levenshtein))

    // multiset compare (sorted seq, not a set): a duplicate-emitting
    // regression in the streaming path must fail this spec
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = FuzzyMatchStream.matchWriter(stream, reference, maps) { (matched, _) =>
      got.synchronized {
        got ++= matched.select("c_custkey", "s_suppkey")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("fms_ckpt").toString)
      .start()
    assert(q.awaitTermination(180000L), "streaming query did not drain in time")

    val expected = FuzzyMatcher.matchDfs(spark.read.parquet(custPath), reference, maps)
      .select("c_custkey", "s_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(expected.nonEmpty)
    assert(got.synchronized(got.toSeq.sorted) == expected)
  }
}
