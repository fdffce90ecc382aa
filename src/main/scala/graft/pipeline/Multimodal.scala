package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side structure — schema, partitioning, batch boundaries — is
  * real and tested; the actual media decode kernels are STUBBED with
  * deterministic fakes (`fakeDecodeMeta`) because no image/audio libraries
  * ship in this container. Swapping in a real decoder changes only the
  * body of [[decodeBatch]], not the pipeline shape.
  */
object Multimodal {

  /** Generic binary metadata (no decode): byte length + leading magic
    * bytes, the cheap scan-time projection for format routing. */
  def binaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("magic_hex", substring(upper(hex(col(binCol))), 1, 8))

  /** STUB decode: deterministic pseudo-metadata derived from the bytes
    * (stands in for image width/height/channel extraction). Pure
    * expressions so the "decode" runs inside codegen like a real native
    * kernel would. */
  def fakeDecodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val h = xxhash64(col(binCol))
    df.withColumn("width", (abs(h) % 1920 + 1).cast("int"))
      .withColumn("height", (abs(shiftright(h, 16)) % 1080 + 1).cast("int"))
      .withColumn("channels", (abs(shiftright(h, 32)) % 3 + 1).cast("int"))
  }

  /** Fixed-size chunking of a binary payload (frame/sample extraction
    * shape): one output row per `chunkSize`-byte slice, with its index.
    * This is the explode pattern a video frame-sampler uses; partition
    * count scales with input rows, each row's work bounded by payload
    * size. */
  def chunkBinary(df: DataFrame, binCol: String, idCol: String, chunkSize: Int): DataFrame = {
    val n = ceil(octet_length(col(binCol)).cast("double") / chunkSize).cast("int")
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), greatest(n, lit(1)) - 1),
          i => col(binCol).substr(i * chunkSize + 1, lit(chunkSize)))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "chunk")
      .withColumn("chunk_bytes", octet_length(col("chunk")))
  }

  // top-level visibility required: Catalyst's generated projections
  // instantiate these reflectively
  case class BinRow(id: Long, payload: Array[Byte])
  case class DecodedRow(id: Long, n_bytes: Int, feature: Double)

  /** Batch-decode boundary: the `mapPartitions` shape a Pandas-UDF /
    * native-library decoder needs — per-partition iterator, library handle
    * initialized once per partition (not per row), rows processed in
    * batches. The decode body is a deterministic stub. */
  def decodeBatch(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[BinRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[BinRow]
    ds.mapPartitions { it =>
      // a real implementation opens the codec/library handle HERE, once
      it.map { row =>
        val bytes = row.payload
        // STUB: stand-in for a decoded feature (e.g. mean luminance)
        val feature =
          if (bytes.isEmpty) 0.0
          else bytes.iterator.map(b => (b & 0xff).toDouble).sum / bytes.length / 255.0
        DecodedRow(row.id, bytes.length, feature)
      }
    }.toDF()
  }
}
