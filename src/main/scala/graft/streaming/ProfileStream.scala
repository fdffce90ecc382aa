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
}
