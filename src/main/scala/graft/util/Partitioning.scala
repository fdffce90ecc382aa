package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy narrow stages.
  *
  * Small inputs (one parquet file, an AQE-coalesced aggregate) arrive in
  * 1-2 partitions; any expensive per-row computation chained on top then
  * runs effectively single-threaded — and cross joins inherit the stream
  * side's partitioning, serializing the whole O(n*m) loop. `spread`
  * repartitions up to the cluster's default parallelism only when the
  * input is under-partitioned, so it is a no-op on real large inputs.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // toRdd reads the physical plan's partitioning without the extra
    // row-conversion RDD that `df.rdd` would build
    if (df.queryExecution.toRdd.getNumPartitions < parallelism) df.repartition(parallelism)
    else df
  }
}
