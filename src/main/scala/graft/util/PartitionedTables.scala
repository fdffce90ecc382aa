package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style date-partitioned parquet layout — the third leg of the
  * physical-layout story next to [[BucketedTables]] (shuffle-free repeated
  * joins) and [[ZOrder]] (2-D in-file clustering): coarse partition
  * pruning by directory, so a date-bounded query never opens files outside
  * its range (`PartitionFilters` on the scan, spec-asserted).
  */
object PartitionedTables {

  /** Integer epoch-day from a raw nano timestamp column — true FLOOR
    * division in long arithmetic. `div` alone is wrong twice over:
    * Column `/` routes two longs through double (2026-era nano
    * timestamps ~1.8e18 exceed double's 2^53 exact range, so a timestamp
    * within ~128 ns of midnight could round into the wrong day), and
    * `div` truncates toward zero while DuckDB's `//` floors — a pre-1970
    * (negative) timestamp would bucket into the day AFTER its real one.
    * The sign correction (subtract 1 when negative with a remainder)
    * makes it floorDiv exactly; Spark's `%` takes the dividend's sign,
    * so `ts % d =!= 0 && ts < 0` is precisely the truncate≠floor case.
    * No timezone dependence. */
  def epochDay(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = lit(86_400_000_000_000L)
    val q = call_function("div", tsNanos, d)
    when((tsNanos % d) =!= 0L && tsNanos < 0L, q - 1L).otherwise(q)
  }

  /** Writes `df` partitioned by the epoch-day of `tsNanosCol` (directory
    * per day). Days arrive in few large files each because the frame is
    * repartitioned on the partition column first — without that, every
    * task writes a sliver into every day and a year of data becomes
    * 365 x tasks tiny files (the classic small-file explosion). */
  def writeDayPartitioned(df: DataFrame, path: String, tsNanosCol: String): Unit =
    df.withColumn("event_day", epochDay(col(tsNanosCol)))
      .repartition(col("event_day"))
      .write.partitionBy("event_day").mode("overwrite").parquet(path)

  /** Reads back a day range with directory-level pruning (the filter on
    * the partition column resolves against directory names — pruned days
    * are never listed, opened, or scanned). */
  def readDayRange(spark: SparkSession, path: String,
                   fromDay: Long, toDay: Long): DataFrame =
    spark.read.parquet(path)
      .where(col("event_day") >= fromDay && col("event_day") <= toDay)
}
