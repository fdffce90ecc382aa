package graft.pipeline

import graft.SparkSpec
import graft.util.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables must join with NO shuffle exchange on either side —
  * the persisted co-location is the point. A plan regression here still
  * returns correct rows, just with the full join shuffle back. */
class BucketedTablesSpec extends AnyFunSuite with SparkSpec {

  test("nightly chunk dedup against a bucketed digest table: corpus never reshuffles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bkt = Curation.md5Bucket(col("doc_id"))
    val corpus = docs.where(bkt >= 100000L)
    val batch = docs.where(bkt < 100000L)
    // persist the corpus digest state bucketed on the join key (the
    // TUNING.md nightly-ingest recipe)
    BucketedTables.writeBucketed(
      Dedup.chunkDigests(corpus, "text", "doc_id", 16),
      "bt_chunk_digests", buckets = 4, keys = Seq("chunk_md5"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Dedup.incrementalChunkDedup(batch,
        spark.table("bt_chunk_digests"), "text", "doc_id", 16)
      val unbucketed = Dedup.incrementalChunkDedup(batch,
        Dedup.chunkDigests(corpus, "text", "doc_id", 16), "text", "doc_id", 16)
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString.linesIterator
          .count(l => l.contains("Exchange") && !l.contains("Reused"))
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"digest scan not bucket-aware:\n$plan")
      // the bucketed digest side needs no Exchange; the unbucketed
      // version must shuffle it (strictly more exchanges)
      assert(exchanges(out) < exchanges(unbucketed),
        s"bucketing saved no shuffle: ${exchanges(out)} vs ${exchanges(unbucketed)}\n$plan")
      // correctness unchanged vs the unbucketed frame
      val want = unbucketed.select("doc_id", "chunk_index").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = out.select("doc_id", "chunk_index").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bt_chunk_digests")
    }
  }

  test("same-bucketed tables join exchange-free, values correct") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
    BucketedTables.writeBucketed(c, "bt_customer", buckets = 4, keys = Seq("c_custkey"))
    BucketedTables.writeBucketed(o, "bt_orders", buckets = 4, keys = Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // tiny test tables would broadcast (hiding the bucket layout the
      // spec is about — at the sizes bucketing targets, broadcast is off
      // the table anyway); force the SortMergeJoin path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.bucketJoin(spark, "bt_customer", "bt_orders",
        Seq("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // correctness: row count matches the plain join
      assert(joined.count() == c.join(o, Seq("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bt_customer")
      spark.sql("DROP TABLE IF EXISTS bt_orders")
    }
  }
}
