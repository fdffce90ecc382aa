package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Intra-file parallelism for giant `.warc.gz` files (VERDICT r15 item
  * 7). One task per file is the right default — neither bare WARC nor a
  * whole-file gzip stream can re-align mid-split — but Common Crawl's
  * record-per-member layout CAN: every record is its own gzip member,
  * and a member boundary is a re-alignment point. A single 50 GB
  * segment then no longer bounds a stage at one core:
  *
  *  1. PROBE (driver, plan time): at each multiple of `split_size`,
  *     read a small window and search for a validated member boundary —
  *     gzip magic `1f 8b 08` whose inflated output starts with
  *     `WARC/`. Both checks must pass, so a false positive needs a
  *     compressed-data coincidence that also inflates cleanly to the
  *     record magic (and even then the loser range fails LOUDLY at its
  *     own header parse, never silently duplicates). A window with no
  *     boundary — e.g. whole-file gzip, where no interior member exists
  *     — simply yields no split there, so non-member layouts degrade to
  *     the one-task contract instead of breaking.
  *  2. DECODE (executors): each range decompresses members starting at
  *     its boundary and STOPS pulling new members once a member would
  *     start at/after its end offset (finishing the straddling member
  *     it already started — ranges partition members exactly).
  *
  * [[GzipMemberStream]] is the member-walking decoder: java.util.zip's
  * GZIPInputStream hides member boundaries, so this reimplements the
  * member loop over a raw Inflater with exact raw-offset accounting,
  * verifying each member's CRC32 + ISIZE trailer (same
  * loud-on-corruption posture as the tfrecord reader). */
private[graft] object WarcSplit {

  /** Validated member boundaries near each multiple of `splitSize` in
    * `[1, len)`, sorted ascending. Driver-side cost: one positional
    * `window`-byte read per split point, only for files large enough to
    * split at all. */
  def probeBoundaries(fs: FileSystem, file: Path, len: Long, splitSize: Long,
                      window: Int = 4 << 20): Seq[Long] = {
    val targets =
      Iterator.iterate(splitSize)(_ + splitSize).takeWhile(_ < len).toSeq
    if (targets.isEmpty) return Seq.empty
    val in = fs.open(file)
    try targets.flatMap { t =>
      val w = new Array[Byte](math.min(window.toLong, len - t).toInt)
      in.readFully(t, w)
      findBoundary(w, t)
    }.distinct.sorted
    finally in.close()
  }

  /** First offset in `w` that both looks like a gzip header and inflates
    * to the `WARC/` record magic; absolute (base + index). */
  def findBoundary(w: Array[Byte], base: Long): Option[Long] = {
    var i = 0
    while (i + 2 < w.length) {
      if (w(i) == 0x1f.toByte && w(i + 1) == 0x8b.toByte && w(i + 2) == 8 &&
        validates(w, i)) return Some(base + i)
      i += 1
    }
    None
  }

  private val WarcMagic = "WARC/".getBytes("US-ASCII")

  private def validates(w: Array[Byte], off: Int): Boolean =
    try {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(w, off, w.length - off), 1 << 13)
      val head = new Array[Byte](WarcMagic.length)
      var read = 0
      while (read < head.length) {
        val n = gz.read(head, read, head.length - read)
        if (n < 0) return false
        read += n
      }
      java.util.Arrays.equals(head, WarcMagic)
    } catch { case _: Exception => false }
}

/** Decompressed view of the gzip members of ONE split range: `raw` must
  * be positioned at `startOffset` (a member boundary); members are
  * decoded in sequence and the stream reports EOF instead of starting a
  * member at/after `endOffset`. CRC32 and ISIZE trailers are verified
  * per member. NOT thread-safe (one reader per partition, like every
  * [[org.apache.spark.sql.connector.read.PartitionReader]]). */
private[sources] final class GzipMemberStream(raw: java.io.InputStream,
                                              startOffset: Long,
                                              endOffset: Long,
                                              file: String,
                                              fileLength: Long)
  extends java.io.InputStream {

  /** Legacy shape for unsplit whole-file reads: the range IS the file,
    * so its end is the file tail. */
  def this(raw: java.io.InputStream, startOffset: Long, endOffset: Long,
           file: String) = this(raw, startOffset, endOffset, file, endOffset)

  private val inf = new java.util.zip.Inflater(true)
  private val inBuf = new Array[Byte](1 << 16)
  private var inLen = 0
  private var inPos = 0
  private var rawFetched = 0L
  private val crc = new java.util.zip.CRC32()
  private var inMember = false
  private var done = false
  private val oneByte = new Array[Byte](1)

  /** Absolute raw offset of the next unconsumed byte — exact whenever
    * the inflater holds no buffered input (i.e. at member boundaries,
    * the only place it gates). */
  private def absConsumed: Long = startOffset + rawFetched - (inLen - inPos)

  private def fill(): Boolean = {
    if (inPos < inLen) return true
    val n = raw.read(inBuf, 0, inBuf.length)
    if (n <= 0) return false
    inPos = 0; inLen = n; rawFetched += n
    true
  }

  private def readByte(): Int =
    if (!fill()) -1
    else { val b = inBuf(inPos) & 0xff; inPos += 1; b }

  private def bad(what: String): Nothing =
    throw new java.io.IOException(
      s"warc: $what at raw offset ~$absConsumed of $file")

  /** Parse one member's gzip header (RFC 1952); false = clean EOF at a
    * boundary, or the range's end offset reached. */
  private def startMember(): Boolean = {
    if (absConsumed >= endOffset) return false
    val m1 = readByte()
    if (m1 < 0) return false
    // a non-gzip first byte at a member boundary is trailing non-gzip
    // content (archiver padding), which GZIPInputStream — and therefore
    // every unsplit read of the same file — treats as EOF; match that
    // instead of failing the last range of a split read. The padding
    // rationale only holds at the FILE tail: an interior range hitting a
    // non-gzip byte before its end offset is mid-file corruption whose
    // silent-EOF would truncate the range's remaining records, so that
    // path stays LOUD (ADVICE r17). A matching first byte with a corrupt
    // rest is always loud (corruption, not padding).
    if (m1 != 0x1f) {
      if (endOffset >= fileLength) return false
      bad(f"non-gzip byte $m1%02x at a member boundary inside an " +
        "interior split range (mid-file corruption, not tail padding)")
    }
    val m2 = readByte(); val cm = readByte(); val flg = readByte()
    if (m2 != 0x8b) bad(f"bad gzip member magic $m1%02x${math.max(m2, 0)}%02x")
    if (cm != 8) bad(s"unsupported gzip compression method $cm")
    if (flg < 0) bad("eof in gzip member header")
    var i = 0
    while (i < 6) { if (readByte() < 0) bad("eof in gzip member header"); i += 1 }
    if ((flg & 4) != 0) { // FEXTRA
      val lo = readByte(); val hi = readByte()
      if (lo < 0 || hi < 0) bad("eof in gzip FEXTRA")
      var n = lo | (hi << 8)
      while (n > 0) { if (readByte() < 0) bad("eof in gzip FEXTRA"); n -= 1 }
    }
    if ((flg & 8) != 0) { // FNAME, zero-terminated
      var b = readByte()
      while (b > 0) b = readByte()
      if (b < 0) bad("eof in gzip FNAME")
    }
    if ((flg & 16) != 0) { // FCOMMENT
      var b = readByte()
      while (b > 0) b = readByte()
      if (b < 0) bad("eof in gzip FCOMMENT")
    }
    if ((flg & 2) != 0) { // FHCRC
      if (readByte() < 0 || readByte() < 0) bad("eof in gzip FHCRC")
    }
    inf.reset()
    crc.reset()
    inMember = true
    true
  }

  /** Verify the 8-byte trailer and release the inflater's buffered
    * tail back to our buffer (exact raw accounting). */
  private def endMember(): Unit = {
    inPos -= inf.getRemaining
    var i = 0; var c = 0L; var sz = 0L
    while (i < 4) {
      val b = readByte(); if (b < 0) bad("eof in gzip trailer")
      c |= b.toLong << (8 * i); i += 1
    }
    i = 0
    while (i < 4) {
      val b = readByte(); if (b < 0) bad("eof in gzip trailer")
      sz |= b.toLong << (8 * i); i += 1
    }
    if (c != crc.getValue) bad("gzip member crc mismatch")
    if (sz != (inf.getBytesWritten & 0xffffffffL)) bad("gzip member isize mismatch")
    inMember = false
  }

  override def read(): Int = {
    val n = read(oneByte, 0, 1)
    if (n < 0) -1 else oneByte(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    // InputStream contract: len == 0 returns 0 (inflate() would also
    // produce 0, which the loop below reads as a stall)
    if (len == 0) return 0
    if (done) return -1
    if (!inMember && !startMember()) { done = true; return -1 }
    var produced = 0
    while (produced == 0) {
      if (inf.needsInput) {
        if (!fill()) bad("eof inside gzip member")
        inf.setInput(inBuf, inPos, inLen - inPos)
        inPos = inLen
      }
      produced = inf.inflate(b, off, len)
      if (produced == 0 && inf.finished()) {
        endMember()
        if (!startMember()) { done = true; return -1 }
      } else if (produced == 0 && !inf.needsInput)
        bad("gzip inflater stalled")
    }
    crc.update(b, off, produced)
    produced
  }

  override def close(): Unit = {
    inf.end()
    raw.close()
  }
}
