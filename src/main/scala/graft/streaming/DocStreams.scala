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
    require(chunkTokens > 0, s"chunkTokens must be positive (got $chunkTokens)")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val nChunks = floor((size(toks) - 1) / chunkTokens) + 1
    docs
      .select(col(idCol), col(tsCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(toks, i * chunkTokens + 1, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("chunk_md5", md5(encode(col("chunk_text"), "UTF-8")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("chunk_md5")
  }
}
