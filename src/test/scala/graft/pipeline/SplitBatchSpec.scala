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

  test("weighted sampling keeps ~weight fraction, monotone in weight") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) 0.9 else 0.1))
      .toDF("id", "w")
    val kept = Curation.weightedHashSample(df, "id", col("w"))
    val hi = kept.where(col("w") === 0.9).count().toDouble / 2000
    val lo = kept.where(col("w") === 0.1).count().toDouble / 2000
    assert(hi > 0.85 && hi < 0.95, s"high-weight keep rate $hi")
    assert(lo > 0.05 && lo < 0.15, s"low-weight keep rate $lo")
    // monotone: every row kept at w stays kept at w' > w
    val bumped = Curation.weightedHashSample(df.withColumn("w", col("w") + 0.05), "id", col("w"))
    assert(kept.select("id").except(bumped.select("id")).count() === 0L)
  }

  test("winsorize clamps to group percentiles and preserves row count") {
    import spark.implicits._
    val df = ((1 to 99).map(i => ("a", i.toLong)) :+ (("a", 100000L)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val w = Curation.winsorize(df, "g", "v", 0.05, 0.95)
    assert(w.count() === 100L)
    val mx = w.agg(max(col("winsorized"))).head().getDouble(0)
    // the outlier clamps to ~p95 of 1..100000-skewed data, far below 100000
    assert(mx < 1000.0, s"outlier not clamped: $mx")
    assert(w.where(col("winsorized") > col("v")).count() > 0, "low tail clamped up")
  }

  test("winsorize keeps NULL-group rows (null-safe join)") {
    import spark.implicits._
    val df = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 99L),
      (3L, Option.empty[String], 1L)).toDF("id", "g", "v")
    val w = Curation.winsorize(df, "g", "v", 0.05, 0.95)
    assert(w.count() === 3L, "NULL-group rows must survive winsorization")
    assert(w.where(col("g").isNull).count() === 2L)
  }

  test("histogram drops NULL measurements instead of counting them in bucket 0") {
    import spark.implicits._
    val df = Seq(("a", Option(5L)), ("a", Option.empty[Long])).toDF("g", "v")
    val h = Curation.histogram(df, "g", "v", 10, 0.0, 1000.0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(h === Map(0L -> 1L))
  }

  test("histogram buckets exactly and clamps edges") {
    import spark.implicits._
    val df = Seq(("a", -5L), ("a", 0L), ("a", 99L), ("a", 100L), ("a", 999L), ("a", 2000L))
      .toDF("g", "v")
    val h = Curation.histogram(df, "g", "v", 10, 0.0, 1000.0)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // -5 and 0 and 99 -> bucket 0; 100 -> 1; 999 -> 9; 2000 clamps -> 9
    assert(h === Map(0L -> 3L, 1L -> 1L, 9L -> 2L))
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
