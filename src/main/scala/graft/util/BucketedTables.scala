package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free repeated joins.
  *
  * A fuzzy-match / dedup pipeline that joins the same large tables on the
  * same keys every run (e.g. nightly incremental matching against a
  * reference corpus) should not pay the join shuffle every time: writing
  * both sides bucketed by the join key lets Spark plan a SortMergeJoin
  * with NO Exchange on either side — the co-location is persisted in the
  * table layout, and at 100 TB the saved shuffle dominates the join cost.
  * This is the Spark-native analog of pre-partitioned table layouts in
  * warehouse engines.
  */
object BucketedTables {

  /** Write `df` as a bucketed (+ sorted) managed table. `buckets` should
    * roughly match the cluster's target partition count for the table's
    * size; both join sides must use the SAME bucket count and keys for the
    * exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. With matching
    * bucket specs Spark elides both shuffle exchanges (and with sorted
    * buckets, both sorts). */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
