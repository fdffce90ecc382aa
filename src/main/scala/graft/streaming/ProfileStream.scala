package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Profile
import graft.util.{CheckpointStrategy, Materialize, MatchScope}

/** Streaming column-stats drift against a stored baseline — the online
  * face of [[Profile.drift]] and the third leg of the monitoring family
  * ([[ExpectationsStream]] gates per-batch rule violations; this watches
  * the SHAPE of arriving data move away from a reference profile: null
  * rates, cardinality, min/max range).
  */
object ProfileStream {

  /** A `DataStreamWriter` emitting, per micro-batch, the
    * [[Profile.driftFromProfiles]] report of the batch against
    * `baselineProfile` ([[Profile.columns]] output for the reference
    * corpus — computed once, typically loaded from the nightly job's
    * persisted profile; it is localCheckpointed here on the caller
    * thread and survives across batches). One aggregate scan per batch;
    * the report is #cols rows. Same sink contract as the other writers:
    * consume the frame inside the callback — its per-batch barrier is
    * released when the sink returns. */
  def driftWriter(stream: DataFrame, baselineProfile: DataFrame,
                  cols: Seq[String])
                 (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val base = baselineProfile.localCheckpoint()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      MatchScope.withMatchScope {
        val report = Materialize(
          Profile.driftFromProfiles(base, Profile.columns(batch, cols)),
          CheckpointStrategy.Local)
        sink(report, batchId)
      }
    }
  }

  /** Streaming PSI monitor — per micro-batch, the
    * [[Profile.psiFromCounts]] drift of the batch's `valueCol`
    * distribution against a STORED baseline count frame (persisted from
    * the reference corpus's groupBy-count; checkpointed once on the
    * caller thread). The report is one row per union key plus the
    * summable `psi_contrib`; the distribution leg of the monitoring
    * family next to [[driftWriter]] (per-column stats) and
    * [[ExpectationsStream]] (rule gates). Same sink contract: consume
    * the frame inside the callback. */
  def psiWriter(stream: DataFrame, baselineCounts: DataFrame,
                valueCol: String)
               (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    import org.apache.spark.sql.functions._
    val base = baselineCounts.localCheckpoint()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      MatchScope.withMatchScope {
        val batchCounts = batch.where(col(valueCol).isNotNull)
          .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
        val report = Materialize(
          Profile.psiFromCounts(base, batchCounts, Seq(valueCol)),
          CheckpointStrategy.Local)
        sink(report, batchId)
      }
    }
  }

  /** Streaming distinct-count monitor — the online face of
    * [[Profile.hllDistinct]], with GENUINELY accumulating state: the
    * per-group HLL register array (2^p bytes — a register is ≤ w+1 = 41)
    * lives in engine state via `mapGroupsWithState`, each micro-batch
    * folds its rows in by register max (the lossless [[Profile.hllMerge]]
    * union), and every batch emits the group's running
    * (n_registers, estimate). Because the merge is exact and the
    * estimator arithmetic is [[Profile.hllEstimateLocal]] — the op-level
    * twin of the batch [[Profile.hllEstimate]] — the emission after the
    * last micro-batch EQUALS the batch query over all data so far, bit
    * for bit (spec-pinned). State per group is a fixed 2^p bytes forever:
    * the monitor never grows with the stream, the property that makes
    * "distinct users per key, live" viable on an unbounded stream.
    * Register rows build in a stateless codegen projection upstream, so
    * only (group, bucket, register) ints reach the state operator.
    * Output mode: Update. */
  def hllDistinctStream(stream: DataFrame, valueCol: String,
                        groupCol: String, p: Int = 12)
      : org.apache.spark.sql.Dataset[(String, Long, Double)] = {
    require(p % 4 == 0 && p >= 8 && p <= 16, s"p must be a multiple of 4 in [8,16] (got $p)")
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val hx = md5(col(valueCol).cast("string"))
    val suf = conv(substring(hx, p / 4 + 1, Profile.HllW / 4), 16, 10).cast("long")
    val regs = stream.where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        conv(substring(hx, 1, p / 4), 16, 10).cast("int").as("bucket"),
        when(suf === 0L, Profile.HllW + 1).otherwise(lit(Profile.HllW + 1) - length(bin(suf)))
          .cast("int").as("register"))
      .as[(String, Int, Int)]
    regs.groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Long, Double)](
        GroupStateTimeout.NoTimeout) { (g, rows, state) =>
        val arr = state.getOption.getOrElse(new Array[Byte](1 << p))
        rows.foreach { case (_, b, r) => if (r > arr(b)) arr(b) = r.toByte }
        state.update(arr)
        val (touched, est) = Profile.hllEstimateLocal(arr, p)
        (g, touched, est)
      }
      .toDF("group", "n_registers", "estimate")
      .as[(String, Long, Double)]
  }
}
