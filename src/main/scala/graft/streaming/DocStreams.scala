package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document-ingest operators — the streaming faces of the batch
  * chunk-dedup family ([[graft.pipeline.Dedup.chunkDedup]]).
  */
object DocStreams {

  /** Streaming chunk-level exact dedup: each arriving document explodes
    * into non-overlapping `chunkTokens`-token chunks (the same stateless
    * projection as the batch operator), and a chunk whose digest already
    * passed within the watermark horizon is dropped — the sink receives
    * only first-occurrence passages, in arrival order.
    *
    * State is keyed by the 16-byte chunk digest (never the chunk text)
    * and bounded by the watermark: the streaming analog of the batch
    * keep-first rule, where "first" is arrival time rather than
    * (id, index) order. Output: (id, ts, chunk_index, chunk_md5,
    * chunk_text). */
  def chunkDedupStream(docs: DataFrame, textCol: String, idCol: String,
                       tsCol: String, chunkTokens: Int,
                       watermark: String = "2 hours"): DataFrame = {
    graft.pipeline.Curation.chunkStream(docs, textCol,
        Seq(col(idCol), col(tsCol)), chunkTokens, overlap = 0)
      .drop("n_total")
      .withColumn("chunk_md5", graft.pipeline.Curation.chunkDigest)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("chunk_md5")
  }
}
