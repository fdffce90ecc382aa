package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic split assignment ([[Curation.splitByHash]]) and
  * length-bucketed batching ([[Curation.lengthBucketBatches]]).
  */
class SplitBatchSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("splits are exhaustive, deterministic, and ~weight-proportioned") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val s1 = Curation.splitByHash(docs, "doc_id",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
    val counts = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum === n.toLong)
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts("valid") / n > 0.03 && counts("test") / n > 0.03)
    // re-running assigns identically
    val s2 = Curation.splitByHash(docs, "doc_id",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
    assert(s1.select("doc_id", "split").except(s2.select("doc_id", "split")).count() === 0L)
  }

  test("growing a split only moves rows in from the adjacent range") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val narrow = Curation.splitByHash(docs, "doc_id",
      Seq(("train", 0.7), ("valid", 0.15), ("test", 0.15)))
    val wide = Curation.splitByHash(docs, "doc_id",
      Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
    // every narrow-train row is still train in the wide assignment
    val lost = narrow.where(col("split") === "train").select("doc_id")
      .except(wide.where(col("split") === "train").select("doc_id")).count()
    assert(lost === 0L)
  }

  test("length-bucketed batches are full-sized and padding-bounded") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b = Curation.lengthBucketBatches(docs, "doc_id", "text", 32, 16)
    // batch sizes: every batch but possibly the bucket's last has 16 rows
    val sizes = b.groupBy("length_bucket", "batch_index").count()
    val maxBatch = b.groupBy("length_bucket")
      .agg(max("batch_index").as("last"))
    val short = sizes.join(maxBatch, Seq("length_bucket"))
      .where(col("count") =!= 16 && col("batch_index") =!= col("last")).count()
    assert(short === 0L)
    // padding bound: within a batch, max - min token count < bucket width
    val pad = b.groupBy("length_bucket", "batch_index")
      .agg((max("n_tokens") - min("n_tokens")).as("spread"))
      .where(col("spread") >= 32).count()
    assert(pad === 0L)
  }
}
