package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side structure — schema, partitioning, batch boundaries — is
  * real and tested. Two modalities are decoded for real with JDK-bundled
  * parsers: IMAGE via `javax.imageio` ([[decodeImageMeta]], PNG/JPEG/GIF/
  * BMP) and AUDIO via `javax.sound.sampled` ([[decodeWavMeta]], WAV/AIFF/
  * AU headers); [[encodePngDemo]]/[[encodeWavDemo]] are their
  * deterministic encode-half fixtures. VIDEO container METADATA is decoded
  * for real by a pure byte-level RIFF/AVI chunk walker ([[decodeAviMeta]] —
  * the same header-only depth as the WAV path; no JDK codec exists for
  * FRAME decode, so pixel-level work stays behind [[decodeBatch]]'s
  * documented fake, whose body is the only thing a real codec swap
  * changes).
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

  case class ImgRow(id: Long, payload: Array[Byte])
  case class ImgMeta(id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** REAL image decode (`javax.imageio`, JDK-bundled readers — PNG, JPEG,
    * GIF, BMP): header/raster metadata per payload, inside the same
    * `mapPartitions` batch boundary as [[decodeBatch]]. Undecodable
    * payloads yield the (-1, -1, 0) sentinel instead of nulls (the
    * engine-wide no-nullable-output convention) — a corrupt image in a
    * 100 TB crawl must not fail the whole stage.
    *
    * `ImageIO.setUseCache(false)` keeps the readers on heap arrays —
    * the default disk-backed cache would write a temp file per row. */
  def decodeImageMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[ImgRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[ImgRow]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        // NonFatal, not just IOException: imageio readers throw
        // RuntimeExceptions (ArrayIndexOutOfBounds, NegativeArraySize,
        // IllegalArgument) on malformed/truncated headers
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImgMeta(row.id, -1, -1, 0, row.payload.length.toLong)
        else ImgMeta(row.id, img.getWidth, img.getHeight,
          img.getRaster.getNumBands, row.payload.length.toLong)
      }
    }.toDF()
  }

  case class WavRow(id: Long, payload: Array[Byte])
  case class WavMeta(id: Long, sample_rate: Int, channels: Int, bits: Int,
                     frames: Long, n_bytes: Long)

  /** REAL audio decode (`javax.sound.sampled`, JDK-bundled WAV/AIFF/AU
    * parsers): container-header metadata — sample rate, channel count,
    * sample size, frame count — per payload, inside the same
    * `mapPartitions` batch boundary as [[decodeImageMeta]]. Undecodable
    * payloads yield the (-1, 0, 0, -1) sentinel instead of nulls: a
    * corrupt clip in a 100 TB crawl must not fail the stage (NonFatal —
    * the javax parsers also throw RuntimeExceptions on truncated
    * headers). Only the header is parsed; PCM data is not pulled through
    * the decoder, so cost per row is O(1), not O(duration). */
  def decodeWavMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[WavRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[WavRow]
    ds.mapPartitions { it =>
      it.map { row =>
        val meta =
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(row.payload))
            try {
              val f = in.getFormat
              WavMeta(row.id, f.getSampleRate.round, f.getChannels,
                f.getSampleSizeInBits, in.getFrameLength, row.payload.length.toLong)
            } finally in.close()
          } catch {
            case scala.util.control.NonFatal(_) =>
              WavMeta(row.id, -1, 0, 0, -1L, row.payload.length.toLong)
          }
        meta
      }
    }.toDF()
  }

  /** Deterministic WAV fixture generator for [[decodeWavMeta]]: one real
    * RIFF/WAVE container per row (16-bit signed PCM little-endian, written
    * by the JDK's own `AudioSystem.write`), format parameters pure
    * functions of the id — sample rate = 8000 + (id mod 5) * 2000,
    * channels = (id mod 2) + 1, frames = (id mod 50) + 1 — and sample
    * bytes seeded by (id, i). The encode half of the round trip the
    * `multimodal_decode_wav` oracle checks: the oracle recomputes the
    * parameter formulas, the decode is the real JDK WAV parser over real
    * WAV bytes. */
  def encodeWavDemo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val rate = (8000 + math.floorMod(id, 5L) * 2000).toInt
        val channels = (math.floorMod(id, 2L) + 1).toInt
        val frames = (math.floorMod(id, 50L) + 1).toInt
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true /* signed */, false /* little-endian */)
        val data = new Array[Byte](frames * channels * 2)
        var i = 0
        while (i < data.length) {
          data(i) = ((id * 31 + i * 7) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        WavRow(id, bos.toByteArray)
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  case class AviRow(id: Long, payload: Array[Byte])
  case class AviMeta(id: Long, usec_per_frame: Long, total_frames: Long,
                     width: Long, height: Long, n_streams: Long, n_bytes: Long)

  /** Real VIDEO container metadata: parse the RIFF/AVI `avih` main header
    * (µs per frame, frame count, dimensions, stream count) with a pure
    * byte-level chunk walker — RIFF is length-prefixed chunks, so header
    * metadata needs no codec, exactly like the WAV path (WAV is RIFF
    * too). Walks top-level chunks for `LIST/hdrl`, then its sub-chunks
    * for `avih`; anything malformed (wrong magic, truncated, missing
    * header) yields the all--1 sentinel row — a corrupt clip in a 100 TB
    * crawl must not fail the stage. Header-only: O(1) per row regardless
    * of clip size, and frame PIXEL decode (which would need a codec this
    * container doesn't ship) stays behind [[decodeBatch]]. */
  def decodeAviMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[AviRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[AviRow]
    ds.mapPartitions { it =>
      it.map { row =>
        parseAviHeader(row.payload) match {
          case Some((usec, frames, w, h, streams)) =>
            AviMeta(row.id, usec, frames, w, h, streams, row.payload.length.toLong)
          case None =>
            AviMeta(row.id, -1L, -1L, -1L, -1L, -1L, row.payload.length.toLong)
        }
      }
    }.toDF()
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    if (off < 0 || off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (µsPerFrame, totalFrames, width, height, streams) from the first
    * `avih` chunk inside `LIST/hdrl`, or None if the payload is not a
    * well-formed AVI. Defensive on every length: chunk sizes are attacker
    * data in a crawl. */
  private[pipeline] def parseAviHeader(
      b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    if (b.length < 24 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "AVI ") return None
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    var off = 12L
    while (off + 8 <= riffEnd) {
      val id = fourCC(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      if (size < 0) return None
      if (id == "LIST" && fourCC(b, off.toInt + 8) == "hdrl") {
        val listEnd = math.min(riffEnd, off + 8 + size)
        var sub = off + 12
        while (sub + 8 <= listEnd) {
          val sid = fourCC(b, sub.toInt)
          val ssize = u32le(b, sub.toInt + 4)
          if (ssize < 0) return None
          if (sid == "avih" && ssize >= 40 && sub + 8 + 40 <= b.length) {
            val p = sub.toInt + 8
            return Some((u32le(b, p), u32le(b, p + 16),
              u32le(b, p + 32), u32le(b, p + 36), u32le(b, p + 24)))
          }
          sub += 8 + ssize + (ssize & 1L) // RIFF chunks are word-aligned
        }
        return None
      }
      off += 8 + size + (size & 1L)
    }
    None
  }

  /** Deterministic AVI fixture generator for [[decodeAviMeta]]: one
    * minimal well-formed RIFF/AVI container per row — RIFF(AVI ) >
    * LIST(hdrl) > avih with the 14-field main header — parameters pure
    * functions of the id: fps = (id mod 5) + 10 so µsPerFrame =
    * 1000000 / fps, frames = (id mod 60) + 1, width = (id mod 32) * 8 +
    * 16, height = (id mod 18) * 8 + 16, one stream. 88 bytes total, the
    * encode half of the `multimodal_decode_avi` round-trip oracle (the
    * oracle recomputes the parameter formulas; the decode is the real
    * chunk walker over real container bytes). */
  def encodeAviDemo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val fps = math.floorMod(id, 5L) + 10
        val usec = 1000000L / fps
        val frames = math.floorMod(id, 60L) + 1
        val w = math.floorMod(id, 32L) * 8 + 16
        val h = math.floorMod(id, 18L) * 8 + 16
        val bb = java.nio.ByteBuffer.allocate(88)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(80) // 4 + 12 + 8 + 56
          .put("AVI ".getBytes("US-ASCII"))
        bb.put("LIST".getBytes("US-ASCII")).putInt(68) // 4 + 8 + 56
          .put("hdrl".getBytes("US-ASCII"))
        bb.put("avih".getBytes("US-ASCII")).putInt(56)
        bb.putInt(usec.toInt)    // dwMicroSecPerFrame
          .putInt(0)             // dwMaxBytesPerSec
          .putInt(0)             // dwPaddingGranularity
          .putInt(0)             // dwFlags
          .putInt(frames.toInt)  // dwTotalFrames
          .putInt(0)             // dwInitialFrames
          .putInt(1)             // dwStreams
          .putInt(0)             // dwSuggestedBufferSize
          .putInt(w.toInt)       // dwWidth
          .putInt(h.toInt)       // dwHeight
          .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
        AviRow(id, bb.array())
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** Deterministic PNG fixture generator for [[decodeImageMeta]]: one real
    * RGB PNG per row, dimensions derived from the id (width = id mod maxW
    * + 1, height = id mod maxH + 1), pixels seeded by (id, x, y). Runs in
    * the same per-partition boundary — this is the encode half of the
    * round trip the `multimodal_decode_png` oracle checks (the oracle
    * recomputes the dimension formulas; the decode itself is the real
    * JDK PNG reader over real PNG bytes). */
  def encodePngDemo(df: DataFrame, idCol: String,
                    maxW: Int = 13, maxH: Int = 7): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (math.floorMod(id, maxW.toLong) + 1).toInt
        val h = (math.floorMod(id, maxH.toLong) + 1).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 31 + x * 7 + y * 131) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        ImgRow(id, bos.toByteArray)
      }
    }.toDF().withColumnRenamed("id", idCol)
  }
}
