package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.util.{CheckpointStrategy, Materialize}

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side structure — schema, partitioning, batch boundaries — is
  * real and tested, and all three modalities decode REAL bytes with
  * JDK-bundled (or pure byte-level) parsers at two depths:
  *
  *  - headers (O(1)/row): IMAGE via `javax.imageio` ([[decodeImageMeta]],
  *    PNG/JPEG/GIF/BMP), AUDIO via `javax.sound.sampled`
  *    ([[decodeWavMeta]]), VIDEO via the RIFF/AVI chunk walker
  *    ([[decodeAviMeta]]);
  *  - payload samples (O(payload)/row): IMAGE rasters through the JDK
  *    decoder ([[decodeImagePixels]] — channel sums + max luma), AUDIO
  *    PCM frames ([[decodeWavSamples]]), and VIDEO raw-DIB frame pixels
  *    ([[decodeAviFrames]] — stride/bottom-up-aware, frame-sampled).
  *
  * [[encodePngDemo]]/[[encodeWavDemo]]/[[encodeAviDemo]]/
  * [[encodeAviFramesDemo]]/[[encodeMjpegAviDemo]] are the deterministic
  * encode-half fixtures of each round-trip oracle. COMPRESSED frames are
  * real too where the JDK ships the codec: [[decodeMjpegFrames]] decodes
  * MJPEG-in-AVI (JPEG per frame via `javax.imageio`) — structurally
  * oracled (sampled index, decoded dimensions), pixel fidelity spec-gated
  * because JPEG is lossy. INTER-FRAME decode is real as of round 10:
  * [[decodeGdvFrames]] decodes GDV1 (this library's open minimal delta
  * format — spec at its definition), with true cross-frame block state.
  * Foreign inter-frame codecs (H.264 et al) have no pure-JVM decoder
  * here by design: their payloads fail [[decodeGdvFrames]]'s validation
  * and get the all--1 sentinel row, the same corrupt-payload contract
  * every decoder in this file follows — no stand-in decode remains.
  */
object Multimodal {

  /** Generic binary metadata (no decode): byte length + leading magic
    * bytes, the cheap scan-time projection for format routing. */
  def binaryMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("magic_hex", substring(upper(hex(col(binCol))), 1, 8))

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

  case class ImgRow(id: Long, payload: Array[Byte])
  case class ImgMeta(id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** REAL image decode (`javax.imageio`, JDK-bundled readers — PNG, JPEG,
    * GIF, BMP): header/raster metadata per payload, inside the same
    * `mapPartitions` batch boundary as [[decodeGdvFrames]]. Undecodable
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

  /** The `AudioFileReader` SPIs resolved ONCE per partition and tried in
    * MAGIC-SNIFFED order instead of `AudioSystem.getAudioInputStream`:
    * the front door probes every provider in registry order, and each
    * wrong-format probe pays a thrown-and-stack-filled
    * `UnsupportedAudioFileException` — measured 43.7 µs/call for a tiny
    * WAV (three failing probes before the Wave reader) vs 4.5 µs with
    * the matching reader tried first, a 10× decode-stage difference at
    * the 500k-clip tier (SCALE.md round-10). Sniffing the 4-byte
    * container magic (`RIFF`/`FORM`/`.snd`) preserves the full SPI
    * fallback contract — unknown magics just probe in registry order
    * like the JDK does. */
  private def audioReaders(): List[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader],
        classOf[javax.sound.sampled.AudioSystem].getClassLoader)
      .iterator()
    val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def openAudio(readers: List[javax.sound.sampled.spi.AudioFileReader],
                        payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val magic =
      if (payload.length >= 4)
        new String(payload, 0, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      else ""
    def preferred(name: String): Int =
      if (magic == "RIFF" && name.startsWith("Wave")) 0
      else if (magic == "FORM" && name.startsWith("Aiff")) 0
      else if (magic == ".snd" && name.startsWith("Au")) 0
      else 1
    var rest = readers.sortBy(r => preferred(r.getClass.getSimpleName))
    while (rest.nonEmpty) {
      try return rest.head.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      rest = rest.tail
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no installed AudioFileReader accepts the payload")
  }

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
      val readers = audioReaders()
      it.map { row =>
        val meta =
          try {
            val in = openAudio(readers, row.payload)
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
      // writer SPI resolved once per partition — AudioSystem.write's
      // front door re-probes the provider registry per call (the
      // openAudio story on the encode side)
      val wavType = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val writerIt = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter],
          classOf[javax.sound.sampled.AudioSystem].getClassLoader)
        .iterator()
      var writer: javax.sound.sampled.spi.AudioFileWriter = null
      while (writer == null && writerIt.hasNext) {
        val w = writerIt.next()
        if (w.isFileTypeSupported(wavType)) writer = w
      }
      require(writer != null, "no installed AudioFileWriter supports WAVE")
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
        writer.write(ais, wavType, bos)
        WavRow(id, bos.toByteArray)
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  case class WavStats(id: Long, n_samples: Long, sum_abs: Long, peak: Long,
                      sum_sq: Long)

  /** REAL audio SAMPLE decode: pull the PCM frames through the JDK decoder
    * (`AudioInputStream.read`, not just the header) and reduce them to
    * exact integer statistics — sample count, Σ|s|, max |s|, Σs² — the
    * inputs to RMS/peak-level audio quality filters. 16-bit signed PCM
    * only (the dominant crawl WAV layout); anything else — compressed,
    * 8/24-bit, undecodable — yields the all--1 sentinel row instead of
    * failing the stage. Integer outputs keep the whole decode bit-exact
    * (no float summation order to disagree about), which is what lets a
    * SQL oracle reproduce it. O(duration) per row by nature — this is the
    * sample-level tier above the O(1) [[decodeWavMeta]] header scan; at
    * 100 TB you run the header pass first and pull samples only for rows
    * that survive format routing. */
  def decodeWavSamples(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[WavRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[WavRow]
    ds.mapPartitions { it =>
      val readers = audioReaders()
      it.map { row =>
        try {
          val in = openAudio(readers, row.payload)
          try {
            val f = in.getFormat
            val enc = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            if (f.getEncoding != enc || f.getSampleSizeInBits != 16 ||
                in.getFrameLength < 0)
              WavStats(row.id, -1L, -1L, -1L, -1L)
            else {
              val pcm = in.readAllBytes()
              val big = f.isBigEndian
              val n = pcm.length / 2
              var j = 0; var sumAbs = 0L; var peak = 0L; var sumSq = 0L
              while (j < n) {
                val lo = pcm(2 * j + (if (big) 1 else 0)) & 0xff
                val hi = pcm(2 * j + (if (big) 0 else 1)) & 0xff
                val s = ((hi << 8) | lo).toShort.toInt
                val a = math.abs(s.toLong)
                sumAbs += a; if (a > peak) peak = a; sumSq += s.toLong * s
                j += 1
              }
              WavStats(row.id, n.toLong, sumAbs, peak, sumSq)
            }
          } finally in.close()
        } catch {
          case scala.util.control.NonFatal(_) =>
            WavStats(row.id, -1L, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** Quantized DFT basis for [[wavSpectralProfile]]: cos/sin of
    * 2πkn/window on the 1e-6 integer grid, flattened `k·window + n` —
    * ONE source for the Scala kernel and the generated oracle, so the
    * basis cannot drift between engines. */
  def dftTablesMicro(bins: Int, window: Int): (Array[Long], Array[Long]) = {
    val cos = new Array[Long](bins * window)
    val sin = new Array[Long](bins * window)
    var k = 0
    while (k < bins) {
      var n = 0
      while (n < window) {
        val a = 2.0 * math.Pi * k * n / window
        cos(k * window + n) = math.round(math.cos(a) * 1e6)
        sin(k * window + n) = math.round(math.sin(a) * 1e6)
        n += 1
      }
      k += 1
    }
    (cos, sin)
  }

  case class SpectralBin(id: Long, bin: Int, re_q: Long, im_q: Long,
                         energy: Double)

  /** Spectral-energy profile of 16-bit PCM audio — the first
    * FREQUENCY-domain feature of the multimodal family (the quality
    * signals above are all time-domain): an exact quantized DFT over the
    * first `window` samples, one row per (id, bin) with the EXACT
    * integer basis sums `re_q = Σ s_n·cos_q[k,n]`, `im_q = −Σ
    * s_n·sin_q[k,n]` and the derived band energy. Detects silence, pure
    * tones, DC-stuck clips — the audio analog of the dHash/resize tier.
    *
    * Exactness: the basis is the 1e-6-grid [[dftTablesMicro]] (pinned,
    * single-sourced with the oracle generator); samples are ints, so
    * every per-bin sum is exact BIGINT arithmetic (|s|·|c_q|·window ≤
    * 2^45 at window = 256) and only the final energy touches IEEE —
    * the same two-op chain in both engines. Bounded per row:
    * `bins·window` multiply-adds regardless of clip length (clips
    * shorter than the window just stop early). Undecodable / non-16-bit
    * payloads sentinel as one (id, -1, -1, -1, -1.0) row, the
    * [[decodeWavSamples]] contract. */
  def wavSpectralProfile(df: DataFrame, binCol: String, idCol: String,
                         bins: Int = 8, window: Int = 64): DataFrame = {
    require(bins >= 1 && window >= 1 && bins <= window,
      s"need 1 <= bins <= window (got $bins, $window)")
    val (cosQ, sinQ) = dftTablesMicro(bins, window)
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[WavRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[WavRow]
    ds.mapPartitions { it =>
      val readers = audioReaders()
      it.flatMap { row =>
        try {
          val in = openAudio(readers, row.payload)
          try {
            val f = in.getFormat
            val enc = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            if (f.getEncoding != enc || f.getSampleSizeInBits != 16 ||
                in.getFrameLength < 0)
              Seq(SpectralBin(row.id, -1, -1L, -1L, -1.0))
            else {
              val pcm = in.readAllBytes()
              val big = f.isBigEndian
              val m = math.min(pcm.length / 2, window)
              (0 until bins).map { k =>
                var re = 0L; var im = 0L; var j = 0
                while (j < m) {
                  val lo = pcm(2 * j + (if (big) 1 else 0)) & 0xff
                  val hi = pcm(2 * j + (if (big) 0 else 1)) & 0xff
                  val s = ((hi << 8) | lo).toShort.toLong
                  re += s * cosQ(k * window + j)
                  im -= s * sinQ(k * window + j)
                  j += 1
                }
                val rd = re / 1e6; val id2 = im / 1e6
                // NO decimal rounding: at these magnitudes 4dp is below
                // the double's ulp and engines' decimal renderings
                // disagree — the RAW double is bit-identical by
                // construction (exact ints through the same IEEE chain)
                SpectralBin(row.id, k, re, im, rd * rd + id2 * id2)
              }
            }
          } finally in.close()
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(SpectralBin(row.id, -1, -1L, -1L, -1.0))
        }
      }
    }.toDF()
  }

  /** DuckDB replay of [[wavSpectralProfile]] over the [[encodeWavDemo]]
    * fixture: samples recomputed from the generator formula, basis =
    * the SAME [[dftTablesMicro]] grid values as list literals, exact
    * BIGINT sums, the same two-IEEE-op energy. */
  def wavSpectralOracleSql(table: String, idCol: String,
                           bins: Int, window: Int): String = {
    val (cosQ, sinQ) = dftTablesMicro(bins, window)
    def lst(a: Array[Long]) = a.mkString("[", ", ", "]::BIGINT[]")
    s"""WITH p AS (SELECT $idCol,
                (($idCol % 50) + 1) * (($idCol % 2) + 1) AS n FROM $table),
         s AS (SELECT $idCol, least(n, $window) AS m,
                 list_transform(range(0, least(n, $window)), j ->
                   CASE WHEN (($idCol*31 + (2*j)*7) % 256) + 256 * (($idCol*31 + (2*j+1)*7) % 256) >= 32768
                        THEN (($idCol*31 + (2*j)*7) % 256) + 256 * (($idCol*31 + (2*j+1)*7) % 256) - 65536
                        ELSE (($idCol*31 + (2*j)*7) % 256) + 256 * (($idCol*31 + (2*j+1)*7) % 256) END) AS sm
               FROM p),
         b AS (SELECT CAST(k.k AS INT) AS bin FROM range(0, $bins) k(k)),
         c AS (SELECT ${lst(cosQ)} AS cq, ${lst(sinQ)} AS sq),
         e AS (SELECT s.$idCol, b.bin,
                 CAST(list_sum(list_transform(range(0, s.m), j ->
                   sm[j+1] * cq[b.bin * $window + j + 1])) AS BIGINT) AS re_q,
                 -CAST(list_sum(list_transform(range(0, s.m), j ->
                   sm[j+1] * sq[b.bin * $window + j + 1])) AS BIGINT) AS im_q
               FROM s CROSS JOIN b CROSS JOIN c)
         SELECT $idCol, bin, re_q, im_q,
           (re_q / 1e6) * (re_q / 1e6) + (im_q / 1e6) * (im_q / 1e6) AS energy
         FROM e"""
  }

  case class ImgStats(id: Long, n_pixels: Long, sum_r: Long, sum_g: Long,
                      sum_b: Long, max_luma: Long)

  /** REAL image PIXEL decode: pull the full raster through the JDK
    * decoder (`BufferedImage.getRGB`, not just the header) and reduce it
    * to exact integer statistics — pixel count, per-channel sums, max
    * luma (the integer ITU-R 601 approximation `(299R + 587G + 114B) /
    * 1000` in integer arithmetic) — the inputs to brightness/solid-color
    * image quality filters. Completes the sample-depth tier for the
    * image modality next to [[decodeWavSamples]] (audio) and
    * [[decodeAviFrames]] (video). Undecodable payloads sentinel with
    * all--1. O(pixels) per row — run the O(1) [[decodeImageMeta]] header
    * pass first at crawl scale and pull rasters only for survivors. */
  def decodeImagePixels(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[ImgRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[ImgRow]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImgStats(row.id, -1L, -1L, -1L, -1L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L; var ml = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sr += r; sg += g; sb += b
              val luma = (299L * r + 587L * g + 114L * b) / 1000L
              if (luma > ml) ml = luma
              x += 1
            }
            y += 1
          }
          ImgStats(row.id, w.toLong * h, sr, sg, sb, ml)
        }
      }
    }.toDF()
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
    * of clip size; frame PIXEL decode is [[decodeAviFrames]] /
    * [[decodeMjpegFrames]] / [[decodeGdvFrames]] per codec. */
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

  case class FrameStats(id: Long, frame_index: Long, n_pixels: Long,
                        pix_sum: Long, pix_max: Long, top_row_sum: Long)

  /** REAL video FRAME decode for uncompressed streams: walk `LIST/movi`
    * for `00db` (raw DIB) chunks, sample every `every`-th frame, and
    * decode each sampled frame's actual pixel bytes — honoring the DIB
    * layout (4-byte-aligned row stride, bottom-up row order, 8-bit depth
    * from the `strf` BITMAPINFOHEADER) — into exact integer statistics:
    * pixel count, Σpixel, max pixel, and the sum of the TOP image row
    * (which lives in the LAST stored row — a decoder that ignores
    * bottom-up order or stride padding gets this wrong, which is exactly
    * what the round-trip oracle checks). No codec is needed because the
    * frames are uncompressed (`biCompression = 0`); compressed streams,
    * non-8-bit depths, or malformed containers yield one all--1 sentinel
    * row. Frame sampling bounds the per-row cost to O(frames/every ·
    * w·h); at 100 TB the `every` knob is the compute dial. */
  def decodeAviFrames(df: DataFrame, binCol: String, idCol: String,
                      every: Int = 2): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[AviRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[AviRow]
    ds.mapPartitions { it =>
      it.flatMap { row =>
        val out = decodeRawFrames(row.payload, row.id, every)
        if (out.isEmpty) Seq(FrameStats(row.id, -1L, -1L, -1L, -1L, -1L))
        else out
      }
    }.toDF()
  }

  /** Per-frame pixel statistics from a raw-DIB AVI, or empty on anything
    * malformed/compressed. Separated from the Dataset plumbing so specs
    * can hit the byte-walker directly. */
  private[pipeline] def decodeRawFrames(
      b: Array[Byte], id: Long, every: Int): Seq[FrameStats] = {
    val dims = parseAviHeader(b) match {
      case Some((_, _, w, h, _)) if w > 0 && h > 0 && w * h <= Int.MaxValue =>
        (w.toInt, h.toInt)
      case _ => return Seq.empty
    }
    val (w, h) = dims
    // strf (BITMAPINFOHEADER) must declare 8-bit uncompressed; find it
    // inside LIST/hdrl > LIST/strl
    if (!hasUncompressed8BitStrf(b)) return Seq.empty
    val stride = (w + 3) & ~3
    val frameBytes = stride * h
    // locate LIST/movi among top-level chunks
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    var off = 12L
    var moviStart = -1L; var moviEnd = -1L
    while (off + 8 <= riffEnd && moviStart < 0) {
      val cid = fourCC(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      if (size < 0) return Seq.empty
      if (cid == "LIST" && fourCC(b, off.toInt + 8) == "movi") {
        moviStart = off + 12
        moviEnd = math.min(riffEnd, off + 8 + size)
      }
      off += 8 + size + (size & 1L)
    }
    if (moviStart < 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[FrameStats]
    var sub = moviStart
    var frameIdx = 0L
    while (sub + 8 <= moviEnd) {
      val sid = fourCC(b, sub.toInt)
      val ssize = u32le(b, sub.toInt + 4)
      if (ssize < 0) return out.toSeq
      if (sid == "00db" || sid == "00dc") {
        if (frameIdx % every == 0) {
          if (ssize != frameBytes || sub + 8 + ssize > b.length) return out.toSeq
          val base = sub.toInt + 8
          var pixSum = 0L; var pixMax = 0L; var topRowSum = 0L
          var y = 0
          while (y < h) {
            // image row y (top-down) is stored row h-1-y (DIB bottom-up)
            val rowOff = base + (h - 1 - y) * stride
            var x = 0
            while (x < w) {
              val p = (b(rowOff + x) & 0xff).toLong
              pixSum += p; if (p > pixMax) pixMax = p
              if (y == 0) topRowSum += p
              x += 1
            }
            y += 1
          }
          out += FrameStats(id, frameIdx, w.toLong * h, pixSum, pixMax, topRowSum)
        }
        frameIdx += 1
      }
      sub += 8 + ssize + (ssize & 1L)
    }
    out.toSeq
  }

  /** Payload offset of the first `strf` (BITMAPINFOHEADER, >= 40 bytes)
    * under `LIST/hdrl > LIST/strl`, or -1 when absent/malformed. ONE
    * copy of the hostile-input offset walk — both codec predicates
    * consume it, so a bounds-check fix can never apply to one and not
    * the other. */
  private def firstStrfOffset(b: Array[Byte]): Int = {
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    var off = 12L
    while (off + 8 <= riffEnd) {
      val cid = fourCC(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      if (size < 0) return -1
      if (cid == "LIST" && fourCC(b, off.toInt + 8) == "hdrl") {
        val listEnd = math.min(riffEnd, off + 8 + size)
        var sub = off + 12
        while (sub + 8 <= listEnd) {
          val sid = fourCC(b, sub.toInt)
          val ssize = u32le(b, sub.toInt + 4)
          if (ssize < 0) return -1
          if (sid == "LIST" && fourCC(b, sub.toInt + 8) == "strl") {
            val strlEnd = math.min(listEnd, sub + 8 + ssize)
            var s2 = sub + 12
            while (s2 + 8 <= strlEnd) {
              val s2id = fourCC(b, s2.toInt)
              val s2size = u32le(b, s2.toInt + 4)
              if (s2size < 0) return -1
              if (s2id == "strf" && s2size >= 40 && s2 + 8 + 40 <= b.length)
                return s2.toInt + 8
              s2 += 8 + s2size + (s2size & 1L)
            }
          }
          sub += 8 + ssize + (ssize & 1L)
        }
        return -1
      }
      off += 8 + size + (size & 1L)
    }
    -1
  }

  /** True iff the first `strf` under `LIST/hdrl > LIST/strl` declares an
    * 8-bit uncompressed DIB (biBitCount = 8, biCompression = 0). */
  private def hasUncompressed8BitStrf(b: Array[Byte]): Boolean = {
    val p = firstStrfOffset(b)
    // biBitCount at +14 (u16), biCompression at +16 (u32)
    p >= 0 && (((b(p + 14) & 0xff) | ((b(p + 15) & 0xff) << 8)) == 8) &&
      u32le(b, p + 16) == 0L
  }

  /** Deterministic frame-bearing AVI fixture for [[decodeAviFrames]]: a
    * fully-structured container — RIFF(AVI ) > LIST(hdrl){avih,
    * LIST(strl){strh 'vids'/'DIB ', strf BITMAPINFOHEADER 8-bit
    * uncompressed}} > LIST(movi){`00db` raw frames} — with parameters
    * pure functions of the id: frames = (id mod 10) + 1, width =
    * ((id mod 5) + 1) * 3, height = ((id mod 4) + 1) * 3 (widths
    * deliberately NOT 4-aligned so row padding is exercised), and pixel
    * (x, y) of frame f = (id*31 + f*17 + y*131 + x*7) mod 256, written
    * bottom-up with zeroed stride padding like a real DIB. The encode
    * half of the `multimodal_frame_pixels` round-trip oracle. */
  def encodeAviFramesDemo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val nf = (math.floorMod(id, 10L) + 1).toInt
        val w = ((math.floorMod(id, 5L) + 1) * 3).toInt
        val h = ((math.floorMod(id, 4L) + 1) * 3).toInt
        val stride = (w + 3) & ~3
        val fsz = stride * h
        val hdrlContent = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
        val moviContent = 4 + nf * (8 + fsz)
        val total = 12 + (8 + hdrlContent) + (8 + moviContent)
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
          .put("AVI ".getBytes("US-ASCII"))
        bb.put("LIST".getBytes("US-ASCII")).putInt(hdrlContent)
          .put("hdrl".getBytes("US-ASCII"))
        bb.put("avih".getBytes("US-ASCII")).putInt(56)
        bb.putInt(100000)       // dwMicroSecPerFrame
          .putInt(0).putInt(0).putInt(0)
          .putInt(nf)           // dwTotalFrames
          .putInt(0)
          .putInt(1)            // dwStreams
          .putInt(fsz)          // dwSuggestedBufferSize
          .putInt(w).putInt(h)
          .putInt(0).putInt(0).putInt(0).putInt(0)
        bb.put("LIST".getBytes("US-ASCII")).putInt(4 + (8 + 56) + (8 + 40))
          .put("strl".getBytes("US-ASCII"))
        bb.put("strh".getBytes("US-ASCII")).putInt(56)
        bb.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
          .putInt(0)            // dwFlags
          .putShort(0).putShort(0) // wPriority, wLanguage
          .putInt(0)            // dwInitialFrames
          .putInt(1)            // dwScale
          .putInt(10)           // dwRate (10 fps)
          .putInt(0)            // dwStart
          .putInt(nf)           // dwLength
          .putInt(fsz)          // dwSuggestedBufferSize
          .putInt(-1)           // dwQuality
          .putInt(0)            // dwSampleSize
          .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
        bb.put("strf".getBytes("US-ASCII")).putInt(40)
        bb.putInt(40)           // biSize
          .putInt(w).putInt(h)  // biWidth, biHeight (positive = bottom-up)
          .putShort(1)          // biPlanes
          .putShort(8)          // biBitCount
          .putInt(0)            // biCompression = BI_RGB
          .putInt(fsz)          // biSizeImage
          .putInt(0).putInt(0).putInt(0).putInt(0)
        bb.put("LIST".getBytes("US-ASCII")).putInt(moviContent)
          .put("movi".getBytes("US-ASCII"))
        var f = 0
        while (f < nf) {
          bb.put("00db".getBytes("US-ASCII")).putInt(fsz)
          var r = 0
          while (r < h) {
            val y = h - 1 - r // stored bottom-up
            var x = 0
            while (x < stride) {
              val p = if (x < w) ((id * 31 + f * 17 + y * 131 + x * 7) & 0xff).toInt
                      else 0
              bb.put(p.toByte)
              x += 1
            }
            r += 1
          }
          f += 1
        }
        AviRow(id, bb.array())
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** G.711 µ-law expansion (CCITT reference formula): one compressed
    * byte → one 14-bit-range linear sample. Pure integer arithmetic —
    * the whole codec is oracle-replayable, and G711Spec pins all 256
    * codes against the JDK's own ULAW converter. */
  private[pipeline] def ulawExpand(code: Int): Int = {
    val u = (~code) & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (CCITT reference formula), 13-bit range. */
  private[pipeline] def alawExpand(code: Int): Int = {
    val a = code ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** (formatCode, dataOffset, dataLen) of a canonical RIFF/WAVE payload,
    * or None when malformed — the manual walk the G.711 path needs
    * (format codes 6/7 are what `javax.sound`'s PCM-centric front door
    * routes through converters; decoding them ourselves keeps the math
    * bit-exact and SQL-replayable). */
  private def parseWavChunks(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 12 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "WAVE")
      return None
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    var off = 12L
    var fmt = -1
    var dataOff = -1L; var dataLen = -1L
    while (off + 8 <= riffEnd) {
      val cid = fourCC(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      if (size < 0) return None
      // FIRST fmt wins — must agree with [[wavBlockAlign]]'s pick, or a
      // duplicated-fmt payload would decode with the format tag from one
      // chunk and the block stride from another
      if (cid == "fmt " && size >= 16 && off + 8 + 16 <= b.length && fmt < 0)
        fmt = u16le(b, off.toInt + 8)
      else if (cid == "data" && dataOff < 0) {
        dataOff = off + 8
        dataLen = math.min(size, b.length - dataOff)
      }
      off += 8 + size + (size & 1L)
    }
    if (fmt < 0 || dataOff < 0) None
    else Some((fmt, dataOff.toInt, dataLen.toInt))
  }

  case class ResizeStats(id: Long, out_w: Long, out_h: Long, sum_r: Long,
                         sum_g: Long, sum_b: Long, max_luma: Long)

  /** REAL image RESIZE (the thumbnail/feature-extraction step of a
    * multimodal pipeline): integer-factor AREA-AVERAGE downscale —
    * target pixel (X, Y) = the per-channel mean (integer division) of
    * the factor×factor source block — reduced to exact integer
    * statistics over the RESIZED raster. Area averaging over full
    * blocks only (out dims = floor(w/f), floor(h/f); edge remainders
    * drop, documented), so every output value is integer arithmetic
    * over decoded bytes and the oracle can replay the whole resize
    * from the fixture formula. A zero-dimension result (source smaller
    * than the factor) emits (0, 0) dims with zero sums; undecodable
    * payloads sentinel with all--1. O(pixels) per row like
    * [[decodeImagePixels]] — header-route first at crawl scale. */
  def resizeImageStats(df: DataFrame, binCol: String, idCol: String,
                       factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[ImgRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[ImgRow]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ResizeStats(row.id, -1L, -1L, -1L, -1L, -1L, -1L)
        else {
          val ow = img.getWidth / factor; val oh = img.getHeight / factor
          var sr = 0L; var sg = 0L; var sb = 0L; var ml = 0L
          var yy = 0
          while (yy < oh) {
            var xx = 0
            while (xx < ow) {
              var br = 0L; var bg = 0L; var bb = 0L
              var dy = 0
              while (dy < factor) {
                var dx = 0
                while (dx < factor) {
                  val rgb = img.getRGB(xx * factor + dx, yy * factor + dy)
                  br += (rgb >> 16) & 0xff; bg += (rgb >> 8) & 0xff; bb += rgb & 0xff
                  dx += 1
                }
                dy += 1
              }
              val area = factor.toLong * factor
              val mr = br / area; val mg = bg / area; val mb = bb / area
              sr += mr; sg += mg; sb += mb
              val luma = (299L * mr + 587L * mg + 114L * mb) / 1000L
              if (luma > ml) ml = luma
              xx += 1
            }
            yy += 1
          }
          ResizeStats(row.id, ow.toLong, oh.toLong, sr, sg, sb,
            if (ow == 0 || oh == 0) 0L else ml)
        }
      }
    }.toDF()
  }

  case class DHashStats(id: Long, dhash: Long, n_pixels: Long)

  /** Composed curation pipeline over an image-keyed corpus: encode the
    * DISTINCT `imgKeyCol` fixture (materialized ONCE — the quality gate
    * and the hash branch both read the same encoded frame, bounded at
    * distinct-asset cardinality), then [[curateByDHashImages]]. All
    * pixel work rides the distinct-asset side and broadcasts onto the
    * corpus — decode cost ∝ distinct assets, never ∝ corpus rows
    * (measured FLAT across 1×/10×/100× tiers, SCALE.md).
    * Single-sourced on purpose: the `multimodal_curate` /
    * `multimodal_curate_hamming` queries, the ScaleBench twin, and the
    * plan-hygiene spec all call THIS, so the pinned plan is the
    * production plan. */
  def curateByDHash(docs: DataFrame, idCol: String, imgKeyCol: String,
                    maxW: Int = 24, maxH: Int = 20,
                    minMaxLuma: Long = 34, maxHamming: Int = 0,
                    checkpoint: CheckpointStrategy = CheckpointStrategy.Local,
                    maxBucketPairs: Long = 4_000_000L): DataFrame = {
    val images = Materialize(
      encodePngDemo(docs.select(col(imgKeyCol)).distinct(), imgKeyCol, maxW, maxH),
      checkpoint)
    curateByDHashImages(docs, idCol, imgKeyCol, images, "payload",
      minMaxLuma, maxHamming, checkpoint, maxBucketPairs)
  }

  /** Core of [[curateByDHash]], taking the caller's OWN image bytes (one
    * row per distinct `imgKeyCol`, payload in `payloadCol`) — the entry
    * point a real corpus uses, where assets are crawled bytes rather
    * than a fixture. decode → max-luma quality gate → [[imageDHash]]
    * (images under the 9×8 grid drop as un-curatable), then keep-min
    * `idCol` per perceptual bucket.
    *
    * `maxHamming` picks the bucket rule:
    *  - 0 (default): EXACT hash equality — one hash-aggregate, no pair
    *    stage at all.
    *  - > 0: perceptual CLUSTERS at hamming <= maxHamming:
    *    [[Dedup.hashPairs]] pigeonhole blocking over the asset hashes
    *    (pair work ∝ distinct assets, capped + drop-accounted), then
    *    [[NearDupCluster.connectedComponents]] — so a re-encoded /
    *    resized copy (the dHash spec pins lossy JPEG re-encodes within
    *    8 bits) lands in its original's bucket even though the hashes
    *    differ, and A~B~C chains merge transitively. `dhash_hex` in the
    *    output is the cluster representative's (min asset key's) hash.
    *
    * Output: (keep_doc_id, dhash_hex, n_in_bucket) either way. */
  def curateByDHashImages(docs: DataFrame, idCol: String, imgKeyCol: String,
                          images: DataFrame, payloadCol: String,
                          minMaxLuma: Long = 34, maxHamming: Int = 0,
                          checkpoint: CheckpointStrategy = CheckpointStrategy.Local,
                          // forwarded to Dedup.hashPairs — mass
                          // near-duplicate asset sets can overflow one
                          // pigeonhole bucket; drops are CapMetrics-logged,
                          // raise (or Long.MaxValue) to trade work for
                          // cluster completeness
                          maxBucketPairs: Long = 4_000_000L): DataFrame = {
    val quality = decodeImagePixels(images, payloadCol, imgKeyCol)
      .where(col("max_luma") >= minMaxLuma)
      .select(col("id").as(imgKeyCol))
    val hashes = imageDHash(images, payloadCol, imgKeyCol)
      .where(col("n_pixels") =!= -1L)
      .select(col("id").as(imgKeyCol), col("dhash"),
        expr("lpad(hex(dhash), 16, '0')").as("dhash_hex"))
    if (maxHamming == 0) {
      docs.join(quality, imgKeyCol).join(hashes.drop("dhash"), imgKeyCol)
        .groupBy(col("dhash_hex"))
        .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_in_bucket"))
        .select(col("keep_doc_id"), col("dhash_hex"), col("n_in_bucket"))
    } else {
      // cluster the SURVIVING assets (gate ∩ valid hash) at hamming <=
      // maxHamming; everything here is bounded by distinct-asset
      // cardinality, so the corpus-sized side never sees pair work
      val assets = Materialize(quality.join(hashes, Seq(imgKeyCol)), checkpoint)
      val pairs = Dedup.hashPairs(assets, col("dhash"), imgKeyCol, maxHamming,
        maxBucketPairs, checkpoint = checkpoint, metricName = "multimodal_dhash")
      val comps = NearDupCluster.connectedComponents(pairs, checkpoint = checkpoint)
        .withColumnRenamed("id", imgKeyCol)
      // singleton assets (no near pair) are their own cluster
      val labeled = assets.join(comps, Seq(imgKeyCol), "left")
        .select(col(imgKeyCol), coalesce(col("comp"), col(imgKeyCol)).as("__comp"))
      val repHash = assets.select(col(imgKeyCol).as("__comp"), col("dhash_hex"))
      docs.join(labeled, imgKeyCol)
        .groupBy(col("__comp"))
        .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_in_bucket"))
        .join(repHash, Seq("__comp"))
        .select(col("keep_doc_id"), col("dhash_hex"), col("n_in_bucket"))
    }
  }

  /** Perceptual image hash (difference hash / dHash): decode, reduce to
    * a 9×8 grid of integer luminance block sums (block boundaries
    * `floor(c·w/9)` / `floor(r·h/8)` — exact integers any engine
    * reproduces), then 64 bits, bit r·8+c set iff block mean (r, c) <
    * block mean (r, c+1) — compared CROSS-MULTIPLIED
    * (`sumA·cntB < sumB·cntA`) so unequal block sizes never pass
    * through a rounded division. The raw-byte image near-dup primitive:
    * hamming distance between dhashes survives re-encode/resize/light
    * edits, and the pair generation reuses the 64-bit pigeonhole
    * blocking machinery unchanged ([[Dedup.hashPairs]]). Images smaller
    * than the grid (w < 9 or h < 8) or undecodable sentinel with
    * n_pixels = -1. Everything after the codec is integer arithmetic,
    * so the oracle replays grid, comparisons and hash exactly. */
  def imageDHash(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[ImgRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[ImgRow]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth < 9 || img.getHeight < 8)
          DHashStats(row.id, 0L, -1L)
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = Array.ofDim[Long](8, 9)
          val cnts = Array.ofDim[Long](8, 9)
          var y = 0
          while (y < h) {
            val r = math.min(y * 8 / h, 7)
            var x = 0
            while (x < w) {
              val c = math.min(x * 9 / w, 8)
              val rgb = img.getRGB(x, y)
              val luma = (299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)) / 1000L
              sums(r)(c) += luma; cnts(r)(c) += 1
              x += 1
            }
            y += 1
          }
          var hash = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (sums(r)(c) * cnts(r)(c + 1) < sums(r)(c + 1) * cnts(r)(c))
                hash |= 1L << (r * 8 + c)
              c += 1
            }
            r += 1
          }
          DHashStats(row.id, hash, w.toLong * h)
        }
      }
    }.toDF()
  }

  case class G711Stats(id: Long, codec: String, n_samples: Long,
                       sum_abs: Long, peak: Long, sum_sq: Long)

  /** REAL compressed-AUDIO decode: G.711 µ-law (WAV format code 7) and
    * A-law (code 6) payloads expand through the exact CCITT integer
    * formulas to linear samples, reduced to the same exact statistics
    * as [[decodeWavSamples]] — and because the codec IS integer
    * arithmetic, the DuckDB oracle replays the entire decompression,
    * which no lossy-float codec (JPEG) allows. Anything non-G.711 or
    * malformed yields the ("none", -1...) sentinel row. */
  def decodeG711Samples(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[WavRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[WavRow]
    ds.mapPartitions { it =>
      it.map { row =>
        parseWavChunks(row.payload) match {
          case Some((fmt, off, len)) if fmt == 6 || fmt == 7 =>
            val expand: Int => Int = if (fmt == 7) ulawExpand else alawExpand
            var i = 0; var sumAbs = 0L; var peak = 0L; var sumSq = 0L
            while (i < len) {
              val s = expand(row.payload(off + i) & 0xff)
              val a = math.abs(s.toLong)
              sumAbs += a; if (a > peak) peak = a; sumSq += s.toLong * s
              i += 1
            }
            G711Stats(row.id, if (fmt == 7) "ulaw" else "alaw",
              len.toLong, sumAbs, peak, sumSq)
          case _ => G711Stats(row.id, "none", -1L, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** Deterministic G.711 WAV fixture: even ids µ-law (format 7), odd
    * A-law (format 6); mono 8 kHz, (id mod 50) + 1 samples, byte i =
    * (id*13 + i*11) mod 256 — every field a pure function of the id so
    * the oracle rebuilds payload AND expansion analytically. */
  def encodeG711Demo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val fmt = if (math.floorMod(id, 2L) == 0L) 7 else 6
        val n = (math.floorMod(id, 50L) + 1).toInt
        val total = 12 + (8 + 16) + (8 + n + (n & 1))
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(fmt.toShort)   // wFormatTag: 7 = µ-law, 6 = A-law
          .putShort(1)             // mono
          .putInt(8000)            // nSamplesPerSec
          .putInt(8000)            // nAvgBytesPerSec (1 byte/sample)
          .putShort(1)             // nBlockAlign
          .putShort(8)             // wBitsPerSample
        bb.put("data".getBytes("US-ASCII")).putInt(n)
        var i = 0
        while (i < n) {
          bb.put(((id * 13 + i * 11) & 0xff).toByte)
          i += 1
        }
        if ((n & 1) == 1) bb.put(0.toByte) // RIFF word alignment
        WavRow(id, bb.array())
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** IMA/DVI ADPCM quantizer tables (the published reference constants;
    * single source for BOTH the Scala decoder and the generated DuckDB
    * oracle, so the two can never drift). */
  private[pipeline] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private[pipeline] val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble step: (pred, index) -> (pred', index'). The
    * published algorithm verbatim — diff = step/8 (+step/4 if bit0)
    * (+step/2 if bit1) (+step if bit2), sign from bit3, both state
    * variables clamped. */
  private[pipeline] def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val ix = math.max(0, math.min(88, index + ImaIndexTable(nibble & 7)))
    (p, ix)
  }

  /** REAL STATEFUL compressed-audio decode: IMA/DVI ADPCM (WAV format
    * code 0x11, mono 4-bit) — each nibble updates a (predictor, step
    * index) state machine, so unlike the memoryless G.711 expansion the
    * decode order IS the codec. Blocks decode independently (each block
    * header re-seeds the state: s16 predictor + step index + reserved,
    * then two samples per data byte, low nibble first), which is what
    * makes the format splittable at block boundaries on a cluster.
    * Emits the same exact integer stats as [[decodeG711Samples]]; the
    * header predictor counts as each block's first sample. Non-ADPCM or
    * malformed payloads (bad magic, step index > 88) sentinel. The
    * DuckDB oracle replays the full state machine as a recursive CTE
    * generated from the SAME table constants ([[imaAdpcmOracleSql]]). */
  def decodeImaAdpcmSamples(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[WavRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[WavRow]
    ds.mapPartitions { it =>
      it.map { row =>
        val b = row.payload
        parseWavChunks(b) match {
          case Some((fmt, off, len)) if fmt == 0x11 =>
            // blockAlign from the fmt chunk is required to walk blocks;
            // re-locate fmt for it (parseWavChunks keeps its contract small)
            val ba = wavBlockAlign(b)
            if (ba < 5) G711Stats(row.id, "none", -1L, -1L, -1L, -1L)
            else {
              var o = off
              val end = off + len
              var n = 0L; var sumAbs = 0L; var peak = 0L; var sumSq = 0L
              var bad = false
              def add(s: Int): Unit = {
                val a = math.abs(s.toLong)
                n += 1; sumAbs += a; if (a > peak) peak = a
                sumSq += s.toLong * s
              }
              while (!bad && o + 4 <= end) {
                var pred = ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort.toInt
                var idx = b(o + 2) & 0xff
                if (idx > 88) bad = true
                else {
                  add(pred)
                  val dataEnd = math.min(o + ba, end)
                  var i = o + 4
                  while (i < dataEnd) {
                    val byte = b(i) & 0xff
                    val (p1, ix1) = imaStep(pred, idx, byte & 0x0f)
                    add(p1)
                    val (p2, ix2) = imaStep(p1, ix1, byte >> 4)
                    add(p2)
                    pred = p2; idx = ix2
                    i += 1
                  }
                  o += ba
                }
              }
              if (bad || n == 0) G711Stats(row.id, "none", -1L, -1L, -1L, -1L)
              else G711Stats(row.id, "ima_adpcm", n, sumAbs, peak, sumSq)
            }
          case _ => G711Stats(row.id, "none", -1L, -1L, -1L, -1L)
        }
      }
    }.toDF()
  }

  /** nBlockAlign from the first fmt chunk, or -1. */
  private def wavBlockAlign(b: Array[Byte]): Int = {
    if (b.length < 12 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "WAVE")
      return -1
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    var off = 12L
    while (off + 8 <= riffEnd) {
      val cid = fourCC(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      if (size < 0) return -1
      if (cid == "fmt " && size >= 16 && off + 8 + 16 <= b.length)
        return u16le(b, off.toInt + 8 + 12)
      off += 8 + size + (size & 1L)
    }
    -1
  }

  /** Deterministic single-block IMA ADPCM fixture: mono 8 kHz, format
    * 0x11, blockAlign = 4 + nbytes where nbytes = (id mod 40) + 1,
    * header predictor = ((id*97) mod 2048) - 1024, header step index =
    * id mod 89 (the full table range, so the high-step clamp paths get
    * exercised), data byte i = (id*7 + i*3) mod 256. Every field a pure
    * function of the id — the oracle rebuilds payload AND the state
    * machine analytically. */
  def encodeImaAdpcmDemo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val nb = (math.floorMod(id, 40L) + 1).toInt
        val ba = 4 + nb
        val pred = (math.floorMod(id * 97, 2048L) - 1024).toInt
        val idx = math.floorMod(id, 89L).toInt
        val dataLen = ba
        val total = 12 + (8 + 20) + (8 + dataLen + (dataLen & 1))
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
          .put("WAVE".getBytes("US-ASCII"))
        bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
          .putShort(0x11)          // wFormatTag: IMA ADPCM
          .putShort(1)             // mono
          .putInt(8000)
          .putInt(4000)            // approx byte rate (uninterpreted here)
          .putShort(ba.toShort)    // nBlockAlign
          .putShort(4)             // wBitsPerSample
          .putShort(2)             // cbSize
          .putShort((1 + 2 * nb).toShort) // wSamplesPerBlock
        bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
        bb.putShort(pred.toShort).put(idx.toByte).put(0.toByte)
        var i = 0
        while (i < nb) {
          bb.put(((id * 7 + i * 3) & 0xff).toByte)
          i += 1
        }
        if ((dataLen & 1) == 1) bb.put(0.toByte)
        WavRow(id, bb.array())
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** DuckDB replay of [[decodeImaAdpcmSamples]] over the
    * [[encodeImaAdpcmDemo]] fixture: the full nibble state machine as a
    * recursive CTE — step/index tables ride as list literals generated
    * from the SAME Scala constants, diff assembled from the published
    * shift formula, both clamps as greatest/least — then the exact
    * sample statistics. */
  def imaAdpcmOracleSql(table: String, idCol: String): String = {
    val steps = ImaStepTable.mkString("[", ", ", "]")
    val ixs = ImaIndexTable.mkString("[", ", ", "]")
    s"""WITH RECURSIVE
       |p AS (SELECT $idCol AS id, ($idCol % 40) + 1 AS nb,
       |             (($idCol * 97) % 2048) - 1024 AS pred0, $idCol % 89 AS idx0
       |      FROM $table),
       |rec(id, nb, k, pred, idx) AS (
       |  SELECT id, nb, -1, pred0, idx0 FROM p
       |  UNION ALL
       |  SELECT id, nb, k + 1,
       |    greatest(-32768, least(32767,
       |      CASE WHEN nib >= 8 THEN pred - diff ELSE pred + diff END)),
       |    greatest(0, least(88, idx + list_extract($ixs, (nib % 8) + 1)))
       |  FROM (
       |    SELECT id, nb, k, pred, idx, nib,
       |      (stp // 8) + CASE WHEN nib % 2 = 1 THEN stp // 4 ELSE 0 END
       |        + CASE WHEN (nib // 2) % 2 = 1 THEN stp // 2 ELSE 0 END
       |        + CASE WHEN (nib // 4) % 2 = 1 THEN stp ELSE 0 END AS diff
       |    FROM (
       |      SELECT id, nb, k, pred, idx,
       |        CASE WHEN (k + 1) % 2 = 0 THEN bt % 16 ELSE bt // 16 END AS nib,
       |        list_extract($steps, idx + 1) AS stp
       |      FROM (
       |        SELECT id, nb, k, pred, idx,
       |          (id * 7 + ((k + 1) // 2) * 3) % 256 AS bt
       |        FROM rec WHERE k + 1 <= 2 * nb - 1))))
       |SELECT id AS $idCol, 'ima_adpcm' AS codec,
       |  CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(abs(pred)) AS BIGINT) AS sum_abs,
       |  CAST(max(abs(pred)) AS BIGINT) AS peak,
       |  CAST(sum(pred * pred) AS BIGINT) AS sum_sq
       |FROM rec GROUP BY id""".stripMargin
  }

  case class MjpegFrame(id: Long, frame_index: Long, width: Long,
                        height: Long, n_pixels: Long, luma_sum: Long)

  /** True iff the first `strf` under `LIST/hdrl > LIST/strl` declares
    * MJPEG (biCompression = 'MJPG' little-endian). Shares
    * [[firstStrfOffset]]'s walk with [[hasUncompressed8BitStrf]]. */
  private def hasMjpegStrf(b: Array[Byte]): Boolean = {
    val p = firstStrfOffset(b)
    p >= 0 && u32le(b, p + 16) == 0x47504A4DL
  }

  /** REAL compressed-frame video decode for MJPEG streams: walk
    * `LIST/movi` for `00dc` chunks, sample every `every`-th frame, and
    * decode each sampled frame's JPEG bytes with the JDK's own codec
    * (`javax.imageio` — initialized per partition, the
    * [[decodeGdvFrames]]-shared boundary). Emits the DECODED dimensions
    * (not the container header's — a frame that fails JPEG decode can't
    * fake them), pixel count, and the exact integer luminance sum of the
    * decoded raster. Anything non-MJPEG, malformed, or undecodable
    * yields one all--1 sentinel row (the no-nullable-output convention).
    *
    * Oracle split: structure (sampled frame index, width, height,
    * n_pixels) is DuckDB-checkable against the
    * [[encodeMjpegAviDemo]] formulas — matching dimensions prove every
    * sampled frame really went through the JPEG decoder; `luma_sum` is
    * spec-gated (JPEG is lossy, so no analytic replay exists —
    * MjpegSpec pins fidelity on uniform frames instead). Frame sampling
    * bounds per-row cost exactly like [[decodeAviFrames]]. */
  def decodeMjpegFrames(df: DataFrame, binCol: String, idCol: String,
                        every: Int = 2): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[AviRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[AviRow]
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val out = decodeMjpegChunks(row.payload, row.id, every)
        if (out.isEmpty) Seq(MjpegFrame(row.id, -1L, -1L, -1L, -1L, -1L))
        else out
      }
    }.toDF()
  }

  /** Per-frame decoded stats from an MJPEG AVI, or empty on anything
    * malformed/non-MJPEG. Separated from the Dataset plumbing so specs
    * can hit the byte-walker directly. */
  private[pipeline] def decodeMjpegChunks(
      b: Array[Byte], id: Long, every: Int): Seq[MjpegFrame] = {
    if (b.length < 12 || fourCC(b, 0) != "RIFF" || fourCC(b, 8) != "AVI ")
      return Seq.empty
    if (!hasMjpegStrf(b)) return Seq.empty
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    var off = 12L
    var moviStart = -1L; var moviEnd = -1L
    while (off + 8 <= riffEnd && moviStart < 0) {
      val cid = fourCC(b, off.toInt)
      val size = u32le(b, off.toInt + 4)
      if (size < 0) return Seq.empty
      if (cid == "LIST" && fourCC(b, off.toInt + 8) == "movi") {
        moviStart = off + 12
        moviEnd = math.min(riffEnd, off + 8 + size)
      }
      off += 8 + size + (size & 1L)
    }
    if (moviStart < 0) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[MjpegFrame]
    var sub = moviStart
    var frameIdx = 0L
    while (sub + 8 <= moviEnd) {
      val sid = fourCC(b, sub.toInt)
      val ssize = u32le(b, sub.toInt + 4)
      if (ssize < 0) return out.toSeq
      if (sid == "00dc" || sid == "00db") {
        if (frameIdx % every == 0) {
          if (sub + 8 + ssize > b.length) return out.toSeq
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              b, sub.toInt + 8, ssize.toInt))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) return out.toSeq
          val w = img.getWidth; val h = img.getHeight
          var lumaSum = 0L
          val raster = img.getRaster
          if (raster.getNumBands == 1) {
            // grayscale JPEG: RAW raster samples — getRGB would route the
            // linear-gray ColorSpace through sRGB color management and
            // gamma-shift every value (~205 reads back as ~232)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                lumaSum += raster.getSample(x, y, 0).toLong
                x += 1
              }
              y += 1
            }
          } else {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
                val bl = rgb & 0xff
                lumaSum += (299L * r + 587L * g + 114L * bl) / 1000L
                x += 1
              }
              y += 1
            }
          }
          out += MjpegFrame(id, frameIdx, w.toLong, h.toLong,
            w.toLong * h, lumaSum)
        }
        frameIdx += 1
      }
      sub += 8 + ssize + (ssize & 1L)
    }
    out.toSeq
  }

  /** Deterministic MJPEG-in-AVI fixture for [[decodeMjpegFrames]]: the
    * same fully-structured container as [[encodeAviFramesDemo]] but with
    * `strh 'vids'/'MJPG'`, `strf biCompression = 'MJPG'` (biBitCount 24,
    * the MJPEG convention), and each `00dc` chunk a REAL JPEG — a
    * uniform-gray frame of level (id*37 + f*29) mod 200 + 20 encoded by
    * the JDK's own writer. Parameters are pure functions of the id:
    * frames = (id mod 6) + 1, width = ((id mod 5) + 1) * 16, height =
    * ((id mod 4) + 1) * 16 (whole JPEG MCU blocks, so the lossy
    * round-trip on a uniform frame stays within a couple of gray
    * levels — what MjpegSpec pins). Structure is oracle-checkable; the
    * JPEG byte lengths are codec-dependent and deliberately absent from
    * the oracled columns. */
  def encodeMjpegAviDemo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val nf = (math.floorMod(id, 6L) + 1).toInt
        val w = ((math.floorMod(id, 5L) + 1) * 16).toInt
        val h = ((math.floorMod(id, 4L) + 1) * 16).toInt
        val jpegs = (0 until nf).map { f =>
          val g = (math.floorMod(id * 37 + f * 29, 200L) + 20).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gfx = img.createGraphics()
          gfx.setColor(new java.awt.Color(g, g, g))
          gfx.fillRect(0, 0, w, h)
          gfx.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpeg", bos)
          bos.toByteArray
        }
        val hdrlContent = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
        val moviContent = 4 +
          jpegs.map(j => 8 + j.length + (j.length & 1)).sum
        val total = 12 + (8 + hdrlContent) + (8 + moviContent)
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
          .put("AVI ".getBytes("US-ASCII"))
        bb.put("LIST".getBytes("US-ASCII")).putInt(hdrlContent)
          .put("hdrl".getBytes("US-ASCII"))
        bb.put("avih".getBytes("US-ASCII")).putInt(56)
        bb.putInt(100000)       // dwMicroSecPerFrame
          .putInt(0).putInt(0).putInt(0)
          .putInt(nf)           // dwTotalFrames
          .putInt(0)
          .putInt(1)            // dwStreams
          .putInt(jpegs.map(_.length).max) // dwSuggestedBufferSize
          .putInt(w).putInt(h)
          .putInt(0).putInt(0).putInt(0).putInt(0)
        bb.put("LIST".getBytes("US-ASCII")).putInt(4 + (8 + 56) + (8 + 40))
          .put("strl".getBytes("US-ASCII"))
        bb.put("strh".getBytes("US-ASCII")).putInt(56)
        bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
          .putInt(0)            // dwFlags
          .putShort(0).putShort(0) // wPriority, wLanguage
          .putInt(0)            // dwInitialFrames
          .putInt(1)            // dwScale
          .putInt(10)           // dwRate (10 fps)
          .putInt(0)            // dwStart
          .putInt(nf)           // dwLength
          .putInt(jpegs.map(_.length).max) // dwSuggestedBufferSize
          .putInt(-1)           // dwQuality
          .putInt(0)            // dwSampleSize
          .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
        bb.put("strf".getBytes("US-ASCII")).putInt(40)
        bb.putInt(40)           // biSize
          .putInt(w).putInt(h)  // biWidth, biHeight
          .putShort(1)          // biPlanes
          .putShort(24)         // biBitCount (MJPEG convention)
          .put("MJPG".getBytes("US-ASCII")) // biCompression
          .putInt(0)            // biSizeImage (codec-dependent; 0 legal)
          .putInt(0).putInt(0).putInt(0).putInt(0)
        bb.put("LIST".getBytes("US-ASCII")).putInt(moviContent)
          .put("movi".getBytes("US-ASCII"))
        jpegs.foreach { j =>
          bb.put("00dc".getBytes("US-ASCII")).putInt(j.length)
          bb.put(j)
          if ((j.length & 1) == 1) bb.put(0.toByte) // RIFF word alignment
        }
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

  // --------------------------------------- GDV1 inter-frame delta video

  /* GDV1 — an open, deliberately minimal INTER-FRAME video format
   * defined by this library, closing the last decode stand-in: the JDK
   * ships no inter-frame codec (H.264/VP9 are out of scope for a pure
   * JVM), so rather than fake one, the format below has real inter-frame
   * semantics (blocks reference the previous frame, transitively across
   * skip chains) while every byte is specified here:
   *
   *   magic 'G''D''V''1'
   *   u16le width, u16le height      (each a positive multiple of 4)
   *   u16le nFrames                  (>= 1)
   *   u32le frameOffset[nFrames]     (absolute offset of each frame
   *                                   record — the random-access index,
   *                                   like a container's idx1)
   *   per frame: nBlocks op bytes (blocks row-major, 4x4 gray8 pixels;
   *     op 0 = SKIP: copy this block from the previous frame (frame 0's
   *       implicit previous frame is all-zero),
   *     op 1 = SOLID, op 2 = LITERAL),
   *   then one byte per SOLID block (in block order),
   *   then 16 row-major bytes per LITERAL block (in block order).
   *
   * Payload offsets inside a frame are therefore pure prefix sums over
   * the op table — the layout is deliberately replayable by a SQL engine
   * without recursion, unlike a rate-adaptive bitstream (the ADPCM
   * oracle needed a recursive CTE; GDV1 was DESIGNED not to). */

  case class GdvFrameRow(id: Long, frame_index: Int, luma_sum: Long,
                         n_skip: Int, n_solid: Int, n_literal: Int)

  /** Decode a GDV1 clip to per-frame integer statistics: luma_sum (the
    * exact Σ of the decoded frame's pixels — integer, so the oracle
    * compare has no float anywhere) plus the op counts. True inter-frame
    * state: the frame buffer persists across frames and a skip chain
    * carries frame-0 content arbitrarily far. Malformed payloads (bad
    * magic, non-multiple-of-4 dims, truncated op table or payloads,
    * offsets out of range) yield the single all--1 sentinel row — the
    * crawl-scale contract every decoder here follows. Runs behind the
    * same `mapPartitions` boundary as the JDK codecs. */
  def decodeGdvFrames(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[BinRow] = graft.util.Partitioning.spread(
      df.select(col(idCol).cast("long").as("id"), col(binCol).as("payload"))).as[BinRow]
    ds.mapPartitions { it =>
      it.flatMap { row =>
        val b = row.payload
        def sentinel = Seq(GdvFrameRow(row.id, -1, -1L, -1, -1, -1))
        if (b.length < 10 || b(0) != 'G' || b(1) != 'D' || b(2) != 'V' || b(3) != '1')
          sentinel
        else {
          val w = u16le(b, 4); val h = u16le(b, 6); val nFrames = u16le(b, 8)
          if (w <= 0 || h <= 0 || w % 4 != 0 || h % 4 != 0 || nFrames < 1 ||
              b.length < 10 + 4 * nFrames) sentinel
          else {
            val bw = w / 4; val bh = h / 4; val nBlocks = bw * bh
            val buf = new Array[Byte](w * h) // implicit all-zero frame -1
            val out = scala.collection.mutable.ArrayBuffer.empty[GdvFrameRow]
            var f = 0
            var ok = true
            while (f < nFrames && ok) {
              val off = u32le(b, 10 + 4 * f)
              if (off < 0 || off + nBlocks > b.length) ok = false
              else {
                val ops = java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + nBlocks)
                if (ops.exists(o => o < 0 || o > 2)) ok = false
                else {
                  val nSolid = ops.count(_ == 1)
                  val nLit = ops.count(_ == 2)
                  val solidBase = off.toInt + nBlocks
                  val litBase = solidBase + nSolid
                  if (litBase + 16 * nLit > b.length) ok = false
                  else {
                    var si = 0; var li = 0; var blk = 0
                    while (blk < nBlocks) {
                      val by = blk / bw; val bx = blk % bw
                      ops(blk) match {
                        case 0 => // skip: buffer already holds prev content
                        case 1 =>
                          val v = b(solidBase + si); si += 1
                          var py = 0
                          while (py < 4) {
                            var px = 0
                            while (px < 4) {
                              buf((by * 4 + py) * w + bx * 4 + px) = v; px += 1
                            }
                            py += 1
                          }
                        case 2 =>
                          var py = 0
                          while (py < 4) {
                            var px = 0
                            while (px < 4) {
                              buf((by * 4 + py) * w + bx * 4 + px) =
                                b(litBase + 16 * li + py * 4 + px)
                              px += 1
                            }
                            py += 1
                          }
                          li += 1
                      }
                      blk += 1
                    }
                    var s = 0L; var i = 0
                    while (i < buf.length) { s += (buf(i) & 0xff); i += 1 }
                    out += GdvFrameRow(row.id, f, s, nBlocks - nSolid - nLit,
                      nSolid, nLit)
                  }
                }
              }
              f += 1
            }
            if (!ok) sentinel else out.toSeq
          }
        }
      }
    }.toDF()
  }

  /** Deterministic GDV1 fixture: one 8x8, 4-frame clip per id whose
    * pixels follow SQL-expressible formulas chosen so every op occurs —
    * per block `b` (row-major 0..3), mode = (id + b) % 3:
    * STATIC (mode 0, literal at frame 0 then a 3-hop skip chain):
    * pixel = (id·31 + b·17 + p) % 256; SOLID-CYCLE (mode 1, a solid op
    * every frame): (id·13 + b·7 + f·41) % 256; NOISY (mode 2, a literal
    * every frame): (id·7 + b·29 + f·53 + p·3) % 256, with p = py·4+px.
    * The encoder applies the canonical rules — skip iff identical to the
    * previous frame, else solid iff uniform, else literal — so the
    * decoded per-frame sums and op counts are pure functions of these
    * formulas, which is exactly what the DuckDB oracle recomputes (the
    * round-trip oracle pattern of [[encodePngDemo]]; the decoder alone
    * is additionally pinned byte-level in PipelineSpec). */
  def encodeGdvDemo(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val W = 8; val H = 8; val NF = 4
    val bw = W / 4; val nBlocks = (W / 4) * (H / 4)
    val ids = df.select(col(idCol).cast("long").as("id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        def pix(f: Int, blk: Int, p: Int): Int =
          (math.floorMod(id + blk, 3L).toInt match {
            case 0 => math.floorMod(id * 31 + blk * 17 + p, 256L)
            case 1 => math.floorMod(id * 13 + blk * 7 + f * 41L, 256L)
            case _ => math.floorMod(id * 7 + blk * 29 + f * 53L + p * 3, 256L)
          }).toInt
        val frames = (0 until NF).map { f =>
          (0 until nBlocks).map { blk =>
            val cur = (0 until 16).map(p => pix(f, blk, p))
            val same = f > 0 && (0 until 16).forall(p => pix(f - 1, blk, p) == cur(p))
            if (same) (0.toByte, Array.empty[Byte])
            else if (cur.forall(_ == cur.head)) (1.toByte, Array(cur.head.toByte))
            else (2.toByte, cur.map(_.toByte).toArray)
          }
        }
        val bos = new java.io.ByteArrayOutputStream()
        def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
        bos.write('G'); bos.write('D'); bos.write('V'); bos.write('1')
        w16(W); w16(H); w16(NF)
        // frame offsets: header 10 + 4*NF, then cumulative record sizes
        var off = 10 + 4 * NF
        frames.foreach { blocks =>
          (0 until 4).foreach(i => bos.write((off >> (8 * i)) & 0xff))
          off += nBlocks + blocks.map(_._2.length).sum
        }
        frames.foreach { blocks =>
          blocks.foreach { case (op, _) => bos.write(op) }
          blocks.foreach { case (op, pay) => if (op == 1) bos.write(pay) }
          blocks.foreach { case (op, pay) => if (op == 2) bos.write(pay) }
        }
        BinRow(id, bos.toByteArray)
      }
    }.toDF().withColumnRenamed("id", idCol)
  }
}
