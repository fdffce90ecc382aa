package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** WARC (ISO 28500 / Common Crawl) [[TableProvider]] — the crawl INGEST
  * format, so a 100 TB web-corpus pipeline starts inside this library:
  *
  * {{{
  *   spark.read.format("warc").load("/crawl/segments")
  *     // (record_id, warc_type, target_uri, date, content_type,
  *     //  content_length, payload BINARY,
  *     //  http_status INT, http_content_type, http_body BINARY,
  *     //  http_headers MAP<STRING,STRING>)
  *   spark.readStream.format("warc").load("/crawl/landing")   // streaming
  * }}}
  *
  * The `http_*` columns split the HTTP response message inside
  * `response`-record payloads ([[HttpPayload]]): status, the HTTP
  * Content-Type header, the body with headers stripped, chunked
  * transfer coding decoded and gzip content coding decompressed
  * (`.option("http_gunzip", "false")` keeps gzip bodies raw), and the
  * full header map (lowercased names, repeated fields ", "-combined
  * per RFC 9110 — the crawl-filtering keys: content-language,
  * last-modified, x-robots-tag). They are computed only when the
  * projection requires them (the map's per-record allocation only when
  * `http_headers` itself is selected), null for non-HTTP records, and
  * null-with-a-counted-warning for malformed messages — the first
  * thing every Common Crawl user does is text extraction, and without
  * this split they get status line + headers glued to the HTML.
  *
  * Implemented from the public spec, from scratch: records are a
  * `WARC/1.x` version line, CRLF-separated named headers (UTF-8 values,
  * spec-legal folded continuation lines), an empty line, exactly
  * `Content-Length` payload bytes, and a CRLF CRLF separator. Unknown
  * headers are skipped; malformed framing is a loud error naming file
  * and record ordinal. `.gz` files are decompressed with multi-member
  * gzip (Common Crawl's record-per-member layout and whole-file gzip
  * both work — java.util.zip reads concatenated members transparently).
  * Filesystems resolve from the SESSION's Hadoop configuration
  * (spark.hadoop.* object-store credentials reach the reader).
  *
  * Scale shape: ONE TASK PER FILE by default — mid-file splits cannot
  * re-align on bare WARC (no sync marker) or whole-file gzip, so
  * file-level parallelism is the format's contract and the
  * industry-standard layout (~1 GB segment files) feeds a
  * 1000-executor cluster evenly. The EXCEPTION is the record-per-member
  * `.warc.gz` layout (Common Crawl's), whose gzip member boundaries ARE
  * re-alignment points: batch AND streaming reads range-split such files
  * larger than `split_size` (default 512 MiB, 0 disables) at probed
  * member boundaries ([[WarcSplit]], probed concurrently on a bounded
  * driver pool), so one 50 GB segment no longer bounds a stage — or a
  * trigger — at one core. Column pruning is pushed into the reader: a query
  * that never touches `payload` (e.g. a header census) still streams
  * the bytes but never materializes them on the heap — at crawl scale
  * that is the difference between a metadata scan and an OOM.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object WarcSource {
  val Schema: StructType = StructType(Seq(
    StructField("record_id", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    // the HTTP layer inside `response` payloads ([[HttpPayload]]): null
    // for non-HTTP records and for malformed messages (counted, loud at
    // reader close — never a crash). Parsed only when one of the three
    // is actually required, so non-HTTP workloads pay nothing.
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("http_body", BinaryType, nullable = true),
    // the full header list (lowercased names, repeats ", "-combined per
    // RFC 9110) — the crawl-filtering columns users grep for next:
    // content-language, last-modified, x-robots-tag
    StructField("http_headers", MapType(StringType, StringType), nullable = true)))

  // column ordinals shared by the reader's precomputed projection
  private[sources] val ColRecordId = 0
  private[sources] val ColWarcType = 1
  private[sources] val ColTargetUri = 2
  private[sources] val ColDate = 3
  private[sources] val ColContentType = 4
  private[sources] val ColContentLength = 5
  private[sources] val ColPayload = 6
  private[sources] val ColHttpStatus = 7
  private[sources] val ColHttpContentType = 8
  private[sources] val ColHttpBody = 9
  private[sources] val ColHttpHeaders = 10
  private[sources] def ordinalOf(name: String): Int = name match {
    case "record_id" => ColRecordId
    case "warc_type" => ColWarcType
    case "target_uri" => ColTargetUri
    case "date" => ColDate
    case "content_type" => ColContentType
    case "content_length" => ColContentLength
    case "payload" => ColPayload
    case "http_status" => ColHttpStatus
    case "http_content_type" => ColHttpContentType
    case "http_body" => ColHttpBody
    case "http_headers" => ColHttpHeaders
    case other => throw new IllegalStateException(s"unknown warc column $other")
  }

  /** `http_gunzip` option (default true): decode `Content-Encoding:
    * gzip` bodies when splitting the HTTP layer. */
  private[sources] def httpGunzipOpt(props: Map[String, String]): Boolean =
    props.get("http_gunzip") match {
      case None => true
      case Some(v) if v.equalsIgnoreCase("true") => true
      case Some(v) if v.equalsIgnoreCase("false") => false
      case Some(other) => throw new IllegalArgumentException(
        s"warc source: http_gunzip must be 'true' or 'false', got '$other'")
    }

  /** `split_size` option (bytes; default 512 MiB; 0 disables): a batch
    * `.warc.gz` larger than this is range-split at PROBED gzip member
    * boundaries ([[WarcSplit]]) so one giant segment file no longer
    * bounds a stage at one core. Only the record-per-member layout has
    * interior boundaries; other layouts degrade to one task per file. */
  private[sources] val DefaultSplitSize: Long = 512L << 20

  /** Bounded driver-side pool for plan-time boundary probing: hundreds
    * of giant segments probed serially was minutes of driver wall before
    * the first task launched (one 4 MB positional read per split point);
    * Hadoop FS clients are thread-safe, so files probe concurrently. */
  private[sources] val ProbeParallelism = 8

  /** Shared batch/streaming partition planner: range-split oversize
    * `.warc.gz` files at probed member boundaries ([[WarcSplit]]), one
    * partition per file otherwise. A probed file with no interior
    * boundary (whole-file gzip) keeps the UNSPLIT reader — not a
    * one-range member walk, whose stricter framing would reject files
    * with trailing non-gzip bytes that GZIPInputStream (and therefore
    * every previous read of the same file) silently treats as EOF. */
  private[graft] def planPartitions(conf: org.apache.hadoop.conf.Configuration,
      files: Seq[(String, Long)], splitSize: Long): Array[InputPartition] = {
    val probed: Map[String, Seq[Long]] = {
      val targets = files.filter { case (f, len) =>
        f.endsWith(".gz") && splitSize > 0 && len > splitSize }
      if (targets.isEmpty) Map.empty
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(ProbeParallelism, targets.size))
        try {
          import scala.jdk.CollectionConverters._
          val tasks: Seq[java.util.concurrent.Callable[(String, Seq[Long])]] =
            targets.map { case (f, len) =>
              () => {
                val fp = new Path(f)
                f -> WarcSplit.probeBoundaries(
                  SourceFiles.fs(fp, conf), fp, len, splitSize)
              }
            }
          pool.invokeAll(tasks.asJava).asScala.map { fut =>
            try fut.get()
            catch { // keep probe failures as loud as the serial path's
              case e: java.util.concurrent.ExecutionException => throw e.getCause
            }
          }.toMap
        } finally pool.shutdown()
      }
    }
    files.flatMap { case (f, len) =>
      probed.get(f) match {
        case Some(bounds) if bounds.nonEmpty =>
          ((0L +: bounds) :+ len).distinct.sorted.sliding(2).collect {
            case Seq(s, e) if e > s =>
              WarcFilePartition(f, len, s, e, split = true): InputPartition
          }.toSeq
        case _ => Seq(WarcFilePartition(f, len, 0L, len): InputPartition)
      }
    }.toArray
  }
  private[sources] def splitSizeOpt(props: Map[String, String]): Long =
    props.get("split_size") match {
      case None => DefaultSplitSize
      case Some(v) =>
        val n = try v.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"warc source: split_size must be a byte count, got '$v'")
        }
        if (n < 0) throw new IllegalArgumentException(
          s"warc source: split_size must be >= 0 (0 disables), got $n")
        n
    }
}

private[sources] class WarcTable(props: Map[String, String])
  extends Table with SupportsRead {

  override def name(): String = s"warc:${SourceFiles.pathOf(props, "warc")}"
  override def schema(): StructType = WarcSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(SourceFiles.pathOf(props, "warc"),
      SourceFiles.recursiveOpt(props, "warc"),
      WarcSource.httpGunzipOpt(props),
      WarcSource.splitSizeOpt(props))
}

private[sources] class WarcScanBuilder(path: String, recursive: Boolean,
                                       httpGunzip: Boolean, splitSize: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new WarcScan(path, required, recursive, httpGunzip, splitSize)
}

private[sources] class WarcScan(path: String, required: StructType,
                                recursive: Boolean, httpGunzip: Boolean,
                                splitSize: Long)
  extends Scan with Batch {
  // captured at scan construction (driver): the session's Hadoop conf
  private val conf = SourceFiles.hadoopConf()

  override def readSchema(): StructType = required
  override def description(): String =
    s"WarcScan($path, cols=${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    WarcSource.planPartitions(conf.value,
      SourceFiles.listForBatch(SourceFiles.fs(p, conf.value), p, recursive, "warc"),
      splitSize)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames
    val c = conf
    val gz = httpGunzip
    (partition: InputPartition) =>
      new WarcPartitionReader(partition.asInstanceOf[WarcFilePartition], cols, c, gz)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // the stream's offset is the highest processed FILE NAME; recursive
    // listings have no unique-name guarantee, so the landing dir must be
    // flat — reject rather than silently mis-order
    if (recursive) throw new IllegalArgumentException(
      "warc streaming does not support recursive listings: the offset " +
        "contract orders by file name in a FLAT landing directory")
    new WarcMicroBatchStream(path, required, conf, httpGunzip, splitSize)
  }
}

/** Streaming face of the warc source — `spark.readStream.format("warc")`
  * over a LANDING DIRECTORY, so crawl segments flow straight into the
  * streaming near-dup writers without a staging hop.
  *
  * Offset contract: files must land with LEXICOGRAPHICALLY INCREASING
  * names and be immutable once visible (the crawler-segment convention —
  * write to a dotfile or another directory, then rename into place; `_`
  * and `.` prefixed names are invisible to the listing). The offset IS
  * the highest file name processed, so Spark's checkpoint alone
  * reconstructs any batch: restart-safe, no source-side state files. A
  * file sorting at or below the committed watermark is never picked up
  * — that is the documented trade for a stateless, replayable offset
  * (Spark's own FileStreamSource instead persists a seen-files log),
  * and a producer violating it gets a loud per-file warning (see
  * `warnLateFiles`) instead of silent data loss. */
private[sources] class WarcMicroBatchStream(path: String, required: StructType,
                                            conf: SerializableConfiguration,
                                            httpGunzip: Boolean,
                                            splitSize: Long)
  extends MicroBatchStream {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val startedAtMs = System.currentTimeMillis()
  // highest file name this RUN has committed — feeds the late-file
  // diagnostic only (the authoritative watermark lives in Spark's offset
  // log; on restart this re-arms from the first commit)
  @volatile private var committedWatermark: String = ""
  // Late-file diagnostic state — ALL BOUNDED (an earlier design kept
  // every file name ever listed, which on a long-running stream over an
  // accumulating landing dir retained the whole history on the driver
  // heap forever, solely for this diagnostic):
  //  - pendingSeen: names seen while still ABOVE the committed watermark
  //    (bounded by the landing backlog; evicted as commits pass them)
  //  - commitLog: ascending (watermark, commitTimeMs) ring — answers
  //    "when did the watermark first cover name n". Capped; names older
  //    than the retained log judge against the OLDEST retained entry's
  //    time, which can only UNDER-warn (a later bound), never false-warn
  //  - warnedNames: bounded LRU dedup so a late file warns once
  private val pendingSeen =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val commitLog =
    scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  private val CommitLogCap = 4096
  private val warnedNames = java.util.Collections.newSetFromMap(
    new java.util.LinkedHashMap[String, java.lang.Boolean](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
        size() > 8192
    })

  // listDataFiles sorts by file name — that order IS the offset contract
  private def files(): Seq[(String, Long)] = {
    val p = new Path(path)
    SourceFiles.listDataFiles(SourceFiles.fs(p, conf.value), p)
  }

  /** The offset contract drops any file whose name sorts at or below the
    * committed watermark — correct for monotonic producers, silent data
    * loss for a misconfigured one (clock-named file landing late, a
    * backfill into a live landing dir). This makes that loss LOUD: a
    * name at/below the watermark that was never seen pending, whose
    * mtime postdates the COMMIT that first covered it (and this stream's
    * start), can never be planned and gets one named warning.
    * Pre-existing files a restarted stream already processed (mtime
    * before start) stay quiet, as do files this run ingested normally
    * (their mtime predates their own batch's commit). */
  private def warnLateFiles(listing: Seq[(String, Long, Long)]): Unit = {
    val wm = committedWatermark
    listing.foreach { case (f, _, mtime) =>
      val n = new Path(f).getName
      if (wm.isEmpty || n > wm) pendingSeen.add(n)
      else if (!pendingSeen.contains(n) && mtime > startedAtMs) {
        // binary search (entries ascend by watermark): an accumulating
        // landing dir re-lists every processed file every trigger, so
        // this lookup runs listing-size times per trigger — a linear
        // scan over the ring would be O(listing x ring) per trigger
        val coveredAt = commitLog.synchronized {
          var lo = 0
          var hi = commitLog.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (commitLog(mid)._1 >= n) hi = mid else lo = mid + 1
          }
          if (lo < commitLog.length) Some(commitLog(lo)) else None
        }
        if (coveredAt.exists(mtime > _._2) &&
          warnedNames.synchronized(warnedNames.add(n)))
          log.warn(s"[graft.warc] landing file $n sorts at/below the " +
            s"committed watermark '$wm' but appeared after the commit " +
            "that covered it — it will NEVER be ingested. The warc " +
            "stream's offset contract requires lexicographically " +
            "increasing, immutable file names; rename the file above " +
            "the watermark or replay it through a fresh landing directory.")
      }
    }
  }

  // test hooks: the late-file diagnostic's only production output is a
  // log line, so its state transitions are asserted directly
  private[sources] def exposeWarnLate(listing: Seq[(String, Long, Long)]): Unit =
    warnLateFiles(listing)
  private[sources] def pendingSeenSize: Int = pendingSeen.size()
  private[sources] def warnedCount: Int =
    warnedNames.synchronized(warnedNames.size())

  override def initialOffset(): Offset = WarcOffset("")

  override def latestOffset(): Offset = {
    // ONE listing serves both the offset and the late-file diagnostic —
    // a second LIST per trigger is real money on an object store
    val p = new Path(path)
    val listing = SourceFiles.listDataFilesWithMtime(
      SourceFiles.fs(p, conf.value), p)
    warnLateFiles(listing)
    WarcOffset(if (listing.isEmpty) "" else new Path(listing.last._1).getName)
  }

  override def deserializeOffset(json: String): Offset =
    WarcOffset(WarcOffset.parse(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WarcOffset].lastFile
    val hi = end.asInstanceOf[WarcOffset].lastFile
    // same range-splitting as the batch face: one 50 GB member-per-record
    // segment landing in the stream must not bound a trigger at one core
    WarcSource.planPartitions(conf.value,
      files().filter { case (f, _) =>
        val n = new Path(f).getName
        n > lo && n <= hi
      }, splitSize)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames
    val c = conf
    val gz = httpGunzip
    (partition: InputPartition) =>
      new WarcPartitionReader(partition.asInstanceOf[WarcFilePartition], cols, c, gz)
  }

  override def commit(end: Offset): Unit = {
    val wm = end.asInstanceOf[WarcOffset].lastFile
    if (wm > committedWatermark) {
      committedWatermark = wm
      commitLog.synchronized {
        commitLog += ((wm, System.currentTimeMillis()))
        if (commitLog.size > CommitLogCap)
          commitLog.remove(0, commitLog.size - CommitLogCap)
      }
      // names now covered by the watermark leave the pending set — the
      // bound that keeps the diagnostic's memory at backlog size
      pendingSeen.removeIf(n => n <= wm)
    }
  }
  override def stop(): Unit = ()
}

private[sources] case class WarcOffset(lastFile: String) extends Offset {
  // file names never contain quotes/backslashes worth escaping here, but
  // escape anyway so the offset log is always valid JSON
  override def json(): String =
    s"""{"last":"${lastFile.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
}

private[sources] object WarcOffset {
  private val P = """\{"last":"(.*)"\}""".r
  def parse(json: String): String = json match {
    case P(v) => v.replace("\\\"", "\"").replace("\\\\", "\\")
    case other => throw new IllegalArgumentException(
      s"warc: unparseable stream offset '$other'")
  }
}

private[sources] case class WarcFilePartition(file: String, length: Long,
                                               start: Long = 0L,
                                               end: Long = Long.MaxValue,
                                               split: Boolean = false)
  extends InputPartition

private[sources] class WarcPartitionReader(part: WarcFilePartition,
                                           cols: Array[String],
                                           conf: SerializableConfiguration,
                                           httpGunzip: Boolean)
  extends PartitionReader[InternalRow] {

  import WarcSource._

  // precomputed projection: required-column ordinals, resolved once (a
  // per-record string match over the column names showed up in the
  // 500k-record pricing run)
  private val colOrdinals: Array[Int] = cols.map(ordinalOf)
  private val needHttpHeaders = colOrdinals.contains(ColHttpHeaders)
  private val needHttp = needHttpHeaders || colOrdinals.exists(o =>
    o == ColHttpStatus || o == ColHttpContentType || o == ColHttpBody)
  // the HTTP split needs the payload bytes even when `payload` itself is
  // pruned out; a query touching neither still streams past them
  private val needPayload = colOrdinals.contains(ColPayload) || needHttp
  // malformed-HTTP records: null columns + ONE loud line at close(),
  // never a crash — a broken server response costs one row's columns
  private var malformedHttp = 0L

  private val in: java.io.InputStream = {
    val p = new Path(part.file)
    val raw = SourceFiles.fs(p, conf.value).open(p)
    if (part.split) {
      // range of a member-split .warc.gz: decode members from this
      // range's boundary, stop at the next range's (GzipMemberStream
      // buffers its own raw reads; the outer buffer serves readLine's
      // byte-at-a-time decompressed reads)
      raw.seek(part.start)
      new java.io.BufferedInputStream(
        new GzipMemberStream(raw, part.start, part.end, part.file,
          part.length), 1 << 16)
    } else {
      val buffered = new java.io.BufferedInputStream(raw, 1 << 16)
      if (part.file.endsWith(".gz"))
        new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(buffered, 1 << 16), 1 << 16)
      else buffered
    }
  }
  private var ordinal = 0L
  private var row: InternalRow = _
  // reused across records: a per-record allocation here costs ~64 KB x
  // rows of churn and made the PRUNED scan slower than the full one
  private val skipBuf = new Array[Byte](1 << 16)
  private val lineBuf = new java.io.ByteArrayOutputStream(128)

  /** One CRLF-terminated header line decoded as UTF-8 (the spec's header
    * encoding — a per-byte toChar would mojibake non-ASCII URIs); None
    * at clean EOF before a record. */
  private def readLine(atRecordStart: Boolean): Option[String] = {
    lineBuf.reset()
    var c = in.read()
    if (c < 0 && atRecordStart) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') lineBuf.write(c)
      c = in.read()
    }
    if (c < 0 && lineBuf.size() == 0 && atRecordStart) None
    else Some(lineBuf.toString("UTF-8"))
  }

  private def bad(what: String): Nothing =
    throw new java.io.IOException(
      s"warc: $what in ${part.file} at record #$ordinal")

  override def next(): Boolean = {
    // skip inter-record blank lines (the CRLF CRLF separator)
    var first: Option[String] = None
    var done = false
    while (!done) {
      first = readLine(atRecordStart = true)
      done = first.forall(_.nonEmpty)
    }
    first match {
      case None => false
      case Some(version) if version.startsWith("WARC/") =>
        var recordId: String = null
        var warcType: String = null
        var targetUri: String = null
        var date: String = null
        var contentType: String = null
        var contentLength = -1L
        var line = readLine(atRecordStart = false).getOrElse(bad("eof in headers"))
        while (line.nonEmpty) {
          // spec-legal header folding: continuation lines start with
          // SP/HTAB and extend the previous value
          var next = readLine(atRecordStart = false).getOrElse(bad("eof in headers"))
          while (next.nonEmpty && (next.charAt(0) == ' ' || next.charAt(0) == '\t')) {
            line = line + " " + next.trim
            next = readLine(atRecordStart = false).getOrElse(bad("eof in headers"))
          }
          val i = line.indexOf(':')
          if (i <= 0) bad(s"malformed header '$line'")
          val name = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          name match {
            case "warc-record-id" => recordId = value
            case "warc-type" => warcType = value
            case "warc-target-uri" => targetUri = value
            case "warc-date" => date = value
            case "content-type" => contentType = value
            case "content-length" =>
              contentLength = try value.toLong catch {
                case _: NumberFormatException => bad(s"bad Content-Length '$value'")
              }
            case _ => () // per spec: readers skip headers they don't know
          }
          line = next
        }
        if (contentLength < 0) bad("missing Content-Length")
        val payload: Array[Byte] =
          if (needPayload) {
            val data = new Array[Byte](
              if (contentLength > Int.MaxValue - 16)
                bad(s"payload over 2 GiB ($contentLength)")
              else contentLength.toInt)
            var read = 0
            while (read < data.length) {
              val n = in.read(data, read, data.length - read)
              if (n < 0) bad("eof in payload")
              read += n
            }
            data
          } else {
            // pruned: stream past the bytes without materializing them
            var remaining = contentLength
            while (remaining > 0) {
              val n = in.read(skipBuf, 0,
                math.min(remaining, skipBuf.length.toLong).toInt)
              if (n < 0) bad("eof in payload")
              remaining -= n
            }
            null
          }
        ordinal += 1
        // the HTTP layer: split only records announcing an HTTP response
        // and only when the projection asks for it
        val http: HttpPayload.Parsed =
          if (needHttp && HttpPayload.isHttpResponse(contentType)) {
            val p = HttpPayload.parse(payload, httpGunzip, needHttpHeaders)
            if (!p.ok) malformedHttp += 1
            p
          } else HttpPayload.Malformed // shared instance: no per-record alloc
        val values = new Array[Any](colOrdinals.length)
        var vi = 0
        while (vi < colOrdinals.length) {
          values(vi) = colOrdinals(vi) match {
            case ColRecordId => if (recordId == null) null else UTF8String.fromString(recordId)
            case ColWarcType => if (warcType == null) null else UTF8String.fromString(warcType)
            case ColTargetUri => if (targetUri == null) null else UTF8String.fromString(targetUri)
            case ColDate => if (date == null) null else UTF8String.fromString(date)
            case ColContentType => if (contentType == null) null else UTF8String.fromString(contentType)
            case ColContentLength => contentLength
            case ColPayload => payload
            case ColHttpStatus => if (http.ok) http.status else null
            case ColHttpContentType =>
              if (http.ok && http.contentType != null)
                UTF8String.fromString(http.contentType)
              else null
            case ColHttpBody => if (http.ok) http.body else null
            case ColHttpHeaders =>
              if (http.ok && http.headers != null)
                new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(
                    http.headers.map(h => UTF8String.fromString(h._1): Any).toArray),
                  new org.apache.spark.sql.catalyst.util.GenericArrayData(
                    http.headers.map(h => UTF8String.fromString(h._2): Any).toArray))
              else null
          }
          vi += 1
        }
        row = new GenericInternalRow(values)
        true
      case Some(other) => bad(s"expected WARC/ version line, got '$other'")
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = {
    if (malformedHttp > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"[graft.warc] ${part.file}: $malformedHttp record(s) announced " +
          "an HTTP response payload that did not parse (bad status line, " +
          "chunk framing, or gzip body) — their http_* columns are null")
    in.close()
  }
}

/** WARC EXPORT helper — writes one `.warc` (or `.warc.gz`) file per
  * partition of `df`, the fixture/export half of [[WarcSource]] (reading
  * is the DataSource; corpora are normally written by crawlers, so the
  * writer is a library function rather than a full sink). Expected
  * columns: `record_id`, `warc_type`, `date` (non-null strings),
  * `target_uri`, `content_type` (strings, null = header omitted) and
  * `payload` (binary). Header values must be CR/LF-free (validated — a
  * newline in a value would inject headers and corrupt the framing).
  * Tasks write to a dot-prefixed temp name (invisible to the readers'
  * listing) and rename into place on success; a failed task deletes its
  * temp file, so retries leave no partial files behind, and the final
  * name is attempt-free so first-publish-wins arbitrates duplicate
  * attempts (speculation / zombie tasks) instead of publishing both —
  * a destination that already exists when a task STARTS is a stale
  * file from an earlier job and fails loudly (each job needs a fresh
  * directory); one that appears while the task runs is a sibling
  * attempt and loses quietly. Rows land in the file of whatever
  * partition they live in — partition the frame first to control
  * shard sizes. */
object Warc {
  /** `memberPerRecord` (with `gzip`) emits ONE GZIP MEMBER PER RECORD —
    * the Common Crawl segment layout, and the layout that makes a giant
    * `.warc.gz` SPLITTABLE on read (the reader's `split_size` boundary
    * probe finds member starts; a whole-file gzip stream has none). */
  def write(df: DataFrame, dir: String, gzip: Boolean = false,
            memberPerRecord: Boolean = false): Unit = {
    require(!memberPerRecord || gzip,
      "Warc.write: memberPerRecord requires gzip=true (bare WARC has no members)")
    val cols = Seq("record_id", "warc_type", "target_uri", "date",
      "content_type", "payload")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Warc.write: missing columns $missing")
    val ordered = df.selectExpr(cols: _*)
    val conf = SourceFiles.hadoopConf()
    // DRIVER-side freshness gate, once per job: pre-existing part files
    // are STALE output of an earlier job — proceeding would silently keep
    // the old data (rename-onto-existing loses on HDFS/s3a) or silently
    // replace it (local rename overwrites). Inside the job, by contrast,
    // an existing destination can only be a sibling/zombie attempt of
    // the same partition and is a benign skip — the split belongs here,
    // where the two cases are actually distinguishable.
    locally {
      val dirPath = new Path(dir)
      val stale = SourceFiles.listDataFiles(
          SourceFiles.fs(dirPath, conf.value), dirPath)
        .map { case (f, _) => new Path(f).getName }
        .filter(n => n.startsWith("part-") &&
          (n.endsWith(".warc") || n.endsWith(".warc.gz")))
      if (stale.nonEmpty) throw new IllegalArgumentException(
        s"Warc.write: output directory $dir is not fresh — it already " +
          s"holds ${stale.size} part file(s) from an earlier job (e.g. " +
          s"${stale.head}); each write job needs its own directory")
    }
    ordered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        // the FINAL name carries no attempt id — first-rename-wins is the
        // output-commit arbitration: with speculative execution (or a
        // zombie attempt finishing after a retry) the loser's rename onto
        // an existing destination fails, and since every attempt of a
        // partition writes identical bytes, the loser just discards its
        // temp instead of silently doubling the partition's records
        val name = f"part-${tc.partitionId()}%05d" +
          (if (gzip) ".warc.gz" else ".warc")
        val tmp = new Path(dir, s".$name.a${tc.taskAttemptId()}.inprogress")
        val fin = new Path(dir, name)
        val fs = SourceFiles.fs(tmp, conf.value)
        // the driver's freshness gate ran before the job, so a
        // destination existing NOW is a previous/sibling attempt of THIS
        // partition that already published — this attempt has nothing to
        // add (identical record set) and skips without writing (plain
        // conditional: a `return` in a Spark closure throws
        // NonLocalReturnControl on the executor)
        if (!fs.exists(fin)) {
        val raw = fs.create(tmp, true)
        val base = new java.io.BufferedOutputStream(raw, 1 << 16)
        val out = new java.io.BufferedOutputStream(
          if (gzip && !memberPerRecord)
            new java.util.zip.GZIPOutputStream(base, 1 << 16)
          else base,
          1 << 16)
        val crlf = "\r\n".getBytes("US-ASCII")
        def record(to: java.io.OutputStream, r: org.apache.spark.sql.Row): Unit = {
          def header(n: String, v: String): Unit = {
            if (v == null) throw new IllegalArgumentException(
              s"Warc.write: null value for required header $n")
            if (v.indexOf('\r') >= 0 || v.indexOf('\n') >= 0)
              throw new IllegalArgumentException(
                s"Warc.write: CR/LF in header $n value '$v' would corrupt framing")
            to.write(s"$n: $v".getBytes("UTF-8")); to.write(crlf)
          }
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          to.write("WARC/1.0".getBytes("US-ASCII")); to.write(crlf)
          header("WARC-Record-ID", r.getAs[String]("record_id"))
          header("WARC-Type", r.getAs[String]("warc_type"))
          header("WARC-Date", r.getAs[String]("date"))
          Option(r.getAs[String]("target_uri")).foreach(header("WARC-Target-URI", _))
          Option(r.getAs[String]("content_type")).foreach(header("Content-Type", _))
          header("Content-Length", payload.length.toString)
          to.write(crlf)
          to.write(payload)
          to.write(crlf); to.write(crlf)
        }
        // member-per-record machinery: ONE reused Deflater + manual
        // member framing — a GZIPOutputStream per record allocates a
        // native zlib stream each time and measured 3 MB/s on the
        // 500k-record pricing corpus; this form runs at deflate speed
        val deflater =
          if (memberPerRecord)
            new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          else null
        val memberCrc = new java.util.zip.CRC32()
        val recBuf = new java.io.ByteArrayOutputStream(1 << 16)
        val defBuf = new Array[Byte](1 << 16)
        def leInt(v: Int): Unit = {
          out.write(v & 0xff); out.write((v >>> 8) & 0xff)
          out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
        }
        def writeMember(bytes: Array[Byte], len: Int): Unit = {
          // RFC 1952 header: magic, deflate, no flags, mtime 0, OS unknown
          out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
          leInt(0); out.write(0); out.write(255)
          deflater.reset()
          deflater.setInput(bytes, 0, len)
          deflater.finish()
          while (!deflater.finished()) {
            val n = deflater.deflate(defBuf)
            if (n > 0) out.write(defBuf, 0, n)
          }
          memberCrc.reset()
          memberCrc.update(bytes, 0, len)
          leInt(memberCrc.getValue.toInt)
          leInt(len)
        }
        try {
          rows.foreach { r =>
            if (memberPerRecord) {
              recBuf.reset()
              record(recBuf, r)
              writeMember(recBuf.toByteArray, recBuf.size())
            } else record(out, r)
          }
          out.close()
          // a destination appearing NOW (it did not exist at task start)
          // is a sibling attempt that won — benign on every filesystem,
          // including local ones whose rename overwrites instead of
          // failing (check-then-skip keeps first-wins there too, modulo
          // an unavoidable tiny window; both attempts carry the same
          // record set either way)
          if (fs.exists(fin)) { fs.delete(tmp, false); () }
          else if (!fs.rename(tmp, fin)) {
            if (fs.exists(fin)) { fs.delete(tmp, false); () } // raced: benign
            else throw new java.io.IOException(
              s"Warc.write: rename $tmp -> $fin failed")
          }
        } catch {
          case t: Throwable =>
            try { out.close() } catch { case _: Throwable => () }
            try { fs.delete(tmp, false) } catch { case _: Throwable => () }
            throw t
        } finally {
          if (deflater != null) deflater.end() // native zlib resource
        }
        } // fin-exists skip (duplicate attempt already published)
      }
    }
  }
}
