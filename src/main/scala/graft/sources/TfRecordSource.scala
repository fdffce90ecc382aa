package graft.sources

import java.util.zip.CRC32C

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** TFRecord [[TableProvider]] — the training-shard EXPORT (and re-read)
  * format, so the curate → pack → shard pipeline ends in files a
  * training job consumes directly, without leaving this library.
  *
  * {{{
  *   df.select($"payload")                       // exactly one BINARY col
  *     .write.format("tfrecord").mode("append").save("/shards/train")
  *   spark.read.format("tfrecord").load("/shards/train")   // (record BINARY)
  * }}}
  *
  * Format (public TensorFlow spec, implemented from scratch): each
  * record is `uint64 length (LE) | uint32 masked_crc32c(length bytes) |
  * data[length] | uint32 masked_crc32c(data)` with
  * `masked_crc = rotr15(crc32c) + 0xa282ead8`. Both CRCs are VERIFIED
  * on read — a flipped byte is a loud corrupt-record error naming file
  * and offset, never silently-wrong training data.
  *
  * Scale shape: one task per file on read (TFRecord has no sync marker,
  * so mid-file splits cannot re-align — file-level parallelism is the
  * format's contract; size shards accordingly, e.g. the `curate_shard`
  * operator's output partitioning), one file per task on write under
  * the normal Spark task-retry contract: tasks stream into invisible
  * `.`-prefixed temp files and rename on task commit, the driver commit
  * deletes any orphan of this write (a task that renamed but whose
  * commit message was lost to an executor death) and publishes a
  * `_SUCCESS` marker. Readers of uncommitted directories see whatever
  * tasks committed — same semantics as Spark's file sources.
  * `mode("overwrite")` truncates the directory at commit.
  */
class TfRecordSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tfrecord"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TfRecordSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new TfRecordTable(properties.asScala.toMap)
}

object TfRecordSource {
  val Schema: StructType = StructType(Seq(StructField("record", BinaryType, nullable = false)))

  private[sources] val MaskDelta = 0xa282ead8

  /** Masked CRC32C of `bytes` per the TFRecord spec. */
  private[sources] def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C()
    c.update(bytes)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + MaskDelta
  }

  private[sources] def leLong(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  private[sources] def readLeLong(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(i).toLong & 0xff) << (8 * i); i += 1 }
    v
  }

  private[sources] def leInt(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private[sources] def readLeInt(b: Array[Byte]): Int =
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)

}

private[sources] class TfRecordTable(props: Map[String, String])
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"tfrecord:${SourceFiles.pathOf(props, "tfrecord")}"
  override def schema(): StructType = TfRecordSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new TfRecordScan(SourceFiles.pathOf(props, "tfrecord"),
      SourceFiles.recursiveOpt(props, "tfrecord"))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.length == 1 && s.head.dataType == BinaryType,
      s"tfrecord sink expects exactly one BINARY column, got ${s.simpleString}")
    new TfRecordWriteBuilder(SourceFiles.pathOf(props, "tfrecord"), truncate = false)
  }
}

private[sources] class TfRecordScan(path: String, recursive: Boolean)
  extends Scan with Batch {
  // captured at scan construction (driver): the session's Hadoop conf
  private val conf = SourceFiles.hadoopConf()

  override def readSchema(): StructType = TfRecordSource.Schema
  override def description(): String = s"TfRecordScan($path)"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    SourceFiles.listForBatch(SourceFiles.fs(p, conf.value), p, recursive,
        "tfrecord")
      .map { case (f, len) => TfRecordFilePartition(f, len): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val c = conf
    (partition: InputPartition) =>
      new TfRecordPartitionReader(partition.asInstanceOf[TfRecordFilePartition], c)
  }
}

private[sources] case class TfRecordFilePartition(file: String, length: Long)
  extends InputPartition

private[sources] class TfRecordPartitionReader(part: TfRecordFilePartition,
                                               conf: SerializableConfiguration)
  extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(part.file)
    new java.io.DataInputStream(new java.io.BufferedInputStream(
      SourceFiles.fs(p, conf.value).open(p), 1 << 16))
  }
  private var offset = 0L
  private var current: Array[Byte] = _

  override def next(): Boolean = {
    val header = new Array[Byte](12)
    val first = in.read(header, 0, 1)
    if (first < 0) return false
    in.readFully(header, 1, 11)
    val lenBytes = header.slice(0, 8)
    val length = TfRecordSource.readLeLong(lenBytes)
    if (TfRecordSource.readLeInt(header.slice(8, 12)) != TfRecordSource.maskedCrc(lenBytes))
      throw new java.io.IOException(
        s"tfrecord: corrupt length crc in ${part.file} at offset $offset")
    if (length < 0 || length > Int.MaxValue - 16)
      throw new java.io.IOException(
        s"tfrecord: implausible record length $length in ${part.file} at offset $offset")
    val data = new Array[Byte](length.toInt)
    in.readFully(data)
    val dataCrc = new Array[Byte](4)
    in.readFully(dataCrc)
    if (TfRecordSource.readLeInt(dataCrc) != TfRecordSource.maskedCrc(data))
      throw new java.io.IOException(
        s"tfrecord: corrupt data crc in ${part.file} at offset $offset")
    offset += 16 + length
    current = data
    true
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](current))
  override def close(): Unit = in.close()
}

private[sources] class TfRecordWriteBuilder(path: String, truncate: Boolean)
  extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder = new TfRecordWriteBuilder(path, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new TfRecordBatchWrite(path, truncate)
  }
}

private[sources] class TfRecordBatchWrite(path: String, truncate: Boolean)
  extends BatchWrite {

  private val conf = SourceFiles.hadoopConf()
  private val writeId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TfRecordWriterFactory(path, writeId, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = SourceFiles.fs(dir, conf.value)
    val mine = messages.collect { case TfRecordCommit(f) =>
      new Path(f).getName }.toSet
    SourceFiles.listDataFiles(fs, dir).foreach { case (f, _) =>
      val n = new Path(f).getName
      // truncate: drop every pre-existing data file this write did not
      // produce. Append: still drop ORPHANS of this write (uuid in the
      // name, absent from the commit messages) — an executor killed
      // after its task-local rename but before the commit message lands
      // must not leave a duplicate shard behind a _SUCCESS marker.
      if (!mine.contains(n) && (truncate || n.contains(writeId)))
        fs.delete(new Path(f), false)
    }
    fs.mkdirs(dir)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = SourceFiles.fs(dir, conf.value)
    messages.collect { case TfRecordCommit(f) => fs.delete(new Path(f), false) }
  }
}

private[sources] case class TfRecordCommit(file: String) extends WriterCommitMessage

private[sources] class TfRecordWriterFactory(path: String, writeId: String,
                                             conf: SerializableConfiguration)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TfRecordDataWriter(path, writeId, partitionId, taskId, conf)
}

private[sources] class TfRecordDataWriter(path: String, writeId: String,
                                          partitionId: Int, taskId: Long,
                                          conf: SerializableConfiguration)
  extends DataWriter[InternalRow] {

  // tasks stream into a '.'-prefixed temp name (invisible to
  // listDataFiles) and rename on task commit: an executor killed
  // mid-write (abort never runs) leaves only an invisible temp behind,
  // never a truncated data file a later read would choke on
  private val file = new Path(path,
    f"part-$partitionId%05d-$writeId-t$taskId.tfrecord")
  private val tmp = new Path(path, s".${file.getName}.inprogress")
  private val fs = SourceFiles.fs(file, conf.value)
  private val out = new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
  private var written = 0L

  override def write(record: InternalRow): Unit = {
    if (record.isNullAt(0))
      throw new java.io.IOException(
        s"tfrecord: null record value at row $written of $file — a null " +
          "cannot be framed; filter or coalesce the column first")
    val data = record.getBinary(0)
    written += 1
    val lenBytes = TfRecordSource.leLong(data.length.toLong)
    out.write(lenBytes)
    out.write(TfRecordSource.leInt(TfRecordSource.maskedCrc(lenBytes)))
    out.write(data)
    out.write(TfRecordSource.leInt(TfRecordSource.maskedCrc(data)))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (!fs.rename(tmp, file)) throw new java.io.IOException(
      s"tfrecord: rename $tmp -> $file failed")
    TfRecordCommit(file.toString)
  }

  override def abort(): Unit = {
    // close() flushes and can itself throw (broken stream, disk full) —
    // the deletes must still run so no partial file survives the abort
    try out.close() catch { case _: Throwable => () }
    fs.delete(tmp, false)
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
