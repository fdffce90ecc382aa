package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.pipeline.Profile
import graft.util.{CheckpointStrategy, Materialize, MatchScope}

/** Streaming data-quality monitoring: run a [[Profile.expectations]]
  * check suite on every micro-batch of an ingest stream — the online
  * gate that catches a bad upstream drop (nulls, schema drift into
  * out-of-domain values, runaway row counts) WHILE it is landing,
  * instead of in tomorrow's batch profile.
  *
  * Shape: `foreachBatch` like the other stream-static operators. Each
  * batch pays one aggregate scan of that batch (the suite compiles to a
  * single agg — Profile.expectations' contract), and the per-batch
  * report rows go to `sink` tagged with the batch id. A driver-side
  * monitor accumulates CUMULATIVE violation counts for the
  * batch-decomposable checks (violations of not-null / values-in /
  * bounds / regex / row-count simply add across batches). `unique` is
  * NOT decomposable — a duplicate spanning two batches is invisible to
  * per-batch checks — so its cumulative row reports only the
  * within-batch violations and the monitor marks it `batch_scope` =
  * true; cross-batch dedup is [[DocStreams]]' stateful job, not a
  * monitoring aggregate. */
object ExpectationsStream {

  /** Cumulative violation state, updated per micro-batch; thread-safe. */
  final class Monitor(checks: Seq[Profile.Expectation]) extends Serializable {
    private val totals = scala.collection.mutable.LinkedHashMap.from(
      checks.map(e => (e.name, e.column) -> 0L))
    private var batches = 0L
    private[ExpectationsStream] def update(report: Array[Row]): Unit = synchronized {
      batches += 1
      report.foreach { r =>
        val key = (r.getString(0), r.getString(1))
        totals.updateWith(key)(v => Some(v.getOrElse(0L) + r.getLong(3)))
      }
    }
    /** (check, column, cumulative violations, batch_scope) per check. */
    def cumulative: Seq[(String, String, Long, Boolean)] = synchronized {
      totals.map { case ((n, c), v) => (n, c, v, n == "unique") }.toSeq
    }
    def batchCount: Long = synchronized(batches)
  }

  /** A `DataStreamWriter` running `checks` on each micro-batch:
    * `sink(report, batchId)` receives the per-batch
    * (check, col_name, passed, violations) frame; the returned
    * [[Monitor]] (second element) tracks cumulative counts.
    *
    * Sink contract (same as the DocStreams writers): consume the report
    * inside the callback — its barrier lives in a per-batch MatchScope
    * and is released when the sink returns, so a stashed frame read
    * after the trigger would hit unpersisted blocks. (Earlier versions
    * leaked the barrier for the app lifetime, which incidentally kept
    * deferred reads alive — that was the leak, not a contract.) */
  def writer(stream: DataFrame, checks: Seq[Profile.Expectation])
            (sink: (DataFrame, Long) => Unit): (DataStreamWriter[Row], Monitor) = {
    val monitor = new Monitor(checks)
    val w = stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // per-batch MatchScope + Materialize (NOT a raw localCheckpoint,
      // which would never register for release): the report barrier is
      // tiny, but an unbounded stream may not accumulate one block per
      // micro-batch. Same consume-inside-the-callback sink contract as
      // the DocStreams writers.
      MatchScope.withMatchScope {
        val report = Materialize(Profile.expectations(batch, checks),
          CheckpointStrategy.Local)
        monitor.update(report.collect())
        sink(report, batchId)
      }
    }
    (w, monitor)
  }
}
