package graft.pipeline

import graft.SparkSpec
import graft.util.BucketedTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables must join with NO shuffle exchange on either side —
  * the persisted co-location is the point. A plan regression here still
  * returns correct rows, just with the full join shuffle back. */
class BucketedTablesSpec extends AnyFunSuite with SparkSpec {

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
