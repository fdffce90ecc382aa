package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization-barrier strategy for multi-pass plans.
  *
  * The engine cuts lineage wherever an intermediate is consumed more than
  * once (pass N+1, the combine join, the final assembly — see
  * [[graft.fuzzy.FuzzyMatcher]]). The reference hands the caller a temp
  * directory for the same purpose (matcher.py:580-658 + the
  * `fuzzy_match_temp_dir` context manager, matcher.py:725-750); on Spark the
  * right abstraction is a checkpoint strategy:
  *
  *  - [[CheckpointStrategy.Local]] (default): `localCheckpoint()` —
  *    executor-local blocks, fastest, but NOT fault-tolerant: losing one
  *    executor mid-job kills the lineage. Right for local mode and
  *    short-lived jobs.
  *  - [[CheckpointStrategy.Reliable]]: `checkpoint()` into a caller-owned
  *    HDFS-compatible directory — survives executor loss, the setting for
  *    long multi-pass jobs on a real cluster (the 100 TB path).
  *  - [[CheckpointStrategy.Persist]]: `persist(MEMORY_AND_DISK)` + an eager
  *    count. Recomputable on executor loss (lineage kept) but Spark 4.1's
  *    CacheManager can NPE rebuilding caches shared across sequential
  *    queries — use only for single-action jobs.
  */
sealed trait CheckpointStrategy extends Serializable

object CheckpointStrategy {
  case object Local extends CheckpointStrategy
  final case class Reliable(dir: String) extends CheckpointStrategy
  case object Persist extends CheckpointStrategy
}

object Materialize {
  /** Materialize `df` under the given strategy and return the barrier'd
    * frame. Every strategy is EAGER (the frame is computed here), matching
    * `localCheckpoint()`'s default — callers rely on the barrier freezing
    * nondeterministic columns such as `monotonically_increasing_id`. */
  def apply(df: DataFrame, strategy: CheckpointStrategy): DataFrame = strategy match {
    case CheckpointStrategy.Local => df.localCheckpoint()
    case CheckpointStrategy.Reliable(dir) =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint()
    case CheckpointStrategy.Persist =>
      val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.count()
      persisted
  }
}
