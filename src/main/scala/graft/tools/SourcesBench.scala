package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput pricing for the two file-format connectors
  * ([[graft.sources.WarcSource]], [[graft.sources.TfRecordSource]]) —
  * the SCALE.md row behind the "one task per file feeds a cluster
  * evenly" claim. Builds a ~2 GB synthetic corpus (sf0.1 documents,
  * payloads inflated ×`repeatText`, replicated ×`replicas`, one file
  * per partition), then times: WARC export (plain + gzip), full WARC
  * read, a header census on the PRUNED read (payload never
  * materialized), TFRecord export, and TFRecord read-back. One JSON
  * line per op with bytes, seconds, MB/s.
  *
  * Usage: runMain graft.tools.SourcesBench [replicas=100] [repeatText=8]
  */
object SourcesBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(100)
    val repeatText = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs
      .withColumn("r", explode(sequence(lit(0), lit(replicas - 1))))
      .select((col("doc_id") + col("r") * 10_000_000L).as("doc_id"),
        concat_ws(" ", (0 until repeatText).map(_ => col("text")): _*).as("text"))
      .repartition(32).localCheckpoint()
    val rows = corpus.count()
    val payloadBytes = corpus.agg(sum(length(col("text")))).head().getLong(0)
    System.err.println(s"[srcbench] rows=$rows payload_bytes=$payloadBytes")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def emit(op: String, sec: Double, bytes: Long, extra: String = ""): Unit =
      println(f"""{"op":"$op","rows":$rows,"bytes":$bytes,"sec":$sec%.2f,""" +
        f""""mb_per_sec":${bytes / 1e6 / sec}%.0f$extra}""")
    def dirBytes(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    }

    val warcFrame = corpus.select(
      concat(lit("urn:doc:"), col("doc_id")).as("record_id"),
      lit("resource").as("warc_type"),
      concat(lit("https://example.com/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("payload"))

    for (gz <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"srcb_warc_$gz").toString
      val (_, wSec) = timed(graft.sources.Warc.write(warcFrame, dir, gzip = gz))
      val onDisk = dirBytes(dir)
      emit(if (gz) "warc_write_gz" else "warc_write", wSec, payloadBytes,
        s""","disk_bytes":$onDisk""")
      val (n1, rSec) = timed(
        spark.read.format("warc").load(dir).where(length(col("payload")) > 0).count())
      require(n1 == rows, s"read $n1 != $rows")
      emit(if (gz) "warc_read_gz" else "warc_read", rSec, payloadBytes)
      val (n2, cSec) = timed(
        spark.read.format("warc").load(dir)
          .groupBy(col("warc_type")).agg(sum(col("content_length"))).count())
      require(n2 == 1L)
      emit(if (gz) "warc_census_gz" else "warc_census", cSec, payloadBytes)
    }

    // intra-file parallelism A/B (VERDICT r15 item 7): the same corpus
    // as ONE giant member-per-record .warc.gz — unsplit read (the old
    // one-task bound) vs member-boundary range split across 32 tasks
    val giantDir = java.nio.file.Files.createTempDirectory("srcb_warc_giant").toString
    val (_, gwSec) = timed(graft.sources.Warc.write(
      warcFrame.coalesce(1), giantDir, gzip = true, memberPerRecord = true))
    val gLen = dirBytes(giantDir)
    emit("warc_giant_write_mpr", gwSec, payloadBytes,
      s""","disk_bytes":$gLen""")
    val (n1t, oneSec) = timed(
      spark.read.format("warc").option("split_size", "0").load(giantDir)
        .where(length(col("payload")) > 0).count())
    require(n1t == rows, s"unsplit giant read $n1t != $rows")
    emit("warc_giant_read_1task", oneSec, payloadBytes)
    val splitDf = spark.read.format("warc")
      .option("split_size", math.max(gLen / 32, 1L).toString).load(giantDir)
    System.err.println(s"[srcbench] giant split ranges: ${splitDf.rdd.getNumPartitions}")
    val (nsp, splSec) = timed(splitDf.where(length(col("payload")) > 0).count())
    require(nsp == rows, s"split giant read $nsp != $rows")
    emit("warc_giant_read_split", splSec, payloadBytes,
      s""","ranges":${splitDf.rdd.getNumPartitions}""")

    // plan-time boundary probing A/B (VERDICT r16 item 4): a batch of 8
    // giant member-per-record files (hard links — the probe only reads).
    // Serial = the pre-r17 planner's file-at-a-time loop; parallel = the
    // shared planner's bounded pool. The probe is one 4 MB positional
    // read per split point, so the win is I/O-wait overlap.
    val multiDir = java.nio.file.Files.createTempDirectory("srcb_warc_multi").toString
    val giantFile = new java.io.File(giantDir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    for (i <- 0 until 8)
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(multiDir, f"seg$i%02d.warc.gz"), giantFile.toPath)
    val mConf = new org.apache.hadoop.conf.Configuration()
    val mFiles = new java.io.File(multiDir).listFiles().sortBy(_.getName)
      .map(f => (f.getPath, f.length())).toSeq
    val probeSplit = math.max(gLen / 32, 1L)
    val (serialBounds, serSec) = timed(mFiles.map { case (f, len) =>
      val fp = new org.apache.hadoop.fs.Path(f)
      graft.sources.WarcSplit.probeBoundaries(
        fp.getFileSystem(mConf), fp, len, probeSplit).size
    }.sum)
    emit("warc_probe_serial", serSec, 8 * gLen,
      s""","files":8,"bounds":$serialBounds""")
    val (parParts, parSec) = timed(graft.sources.WarcSource.planPartitions(
      mConf, mFiles, probeSplit).length)
    emit("warc_probe_parallel", parSec, 8 * gLen,
      s""","files":8,"ranges":$parParts,"speedup":${(serSec / parSec).round}""")
    require(parParts == serialBounds + 8,
      s"parallel planner ranges $parParts != serial bounds $serialBounds + 8 files")

    // the HTTP layer: the same corpus re-framed as response records
    // (every third chunked at 4 KB, server-style), split back by the
    // reader's http_* columns — prices status/header parsing + chunk
    // decoding against the raw payload read above
    val httpDir = java.nio.file.Files.createTempDirectory("srcb_warc_http").toString
    val httpFrame = corpus.select(
      concat(lit("urn:doc:"), col("doc_id")).as("record_id"),
      lit("response").as("warc_type"),
      concat(lit("https://example.com/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("application/http; msgtype=response").as("content_type"),
      expr(
        """encode(concat('HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n',
             CASE WHEN doc_id % 3 = 0 AND char_length(text) > 0
               THEN concat('Transfer-Encoding: chunked\r\n\r\n',
                 array_join(transform(
                   sequence(0, CAST(ceil(char_length(text) / 4096.0) AS INT) - 1),
                   i -> concat(lower(hex(octet_length(substring(text, i * 4096 + 1, 4096)))),
                               '\r\n', substring(text, i * 4096 + 1, 4096), '\r\n')), ''),
                 '0\r\n\r\n')
               ELSE concat('Content-Length: ', CAST(octet_length(text) AS STRING),
                 '\r\n\r\n', text)
             END), 'UTF-8')""").as("payload"))
    val (_, hwSec) = timed(graft.sources.Warc.write(httpFrame, httpDir))
    emit("warc_http_write", hwSec, payloadBytes,
      s""","disk_bytes":${dirBytes(httpDir)}""")
    val (bodyBytes, hSec) = timed(
      spark.read.format("warc").load(httpDir)
        .agg(sum(length(col("http_body")))).head().getLong(0))
    require(bodyBytes == payloadBytes,
      s"http bodies $bodyBytes != payload $payloadBytes")
    emit("warc_http_split", hSec, payloadBytes)
    // round-17: charset-sniffing text decode priced on top of the split
    // (this corpus is ASCII under a declared charset, so the row prices
    // the LADDER — param parse, BOM/meta checks — plus the String
    // decode, not exotic charsets; chars==bytes pins correctness)
    val (textChars, htSec) = timed(
      spark.read.format("warc").load(httpDir)
        .agg(sum(length(graft.sources.HttpText.decode(
          col("http_body"), col("http_content_type"))))).head().getLong(0))
    require(textChars == payloadBytes,
      s"decoded chars $textChars != payload bytes $payloadBytes")
    emit("warc_http_text", htSec, payloadBytes)

    val tfDir = java.nio.file.Files.createTempDirectory("srcb_tfr").toString
    val (_, twSec) = timed(
      corpus.select(encode(col("text"), "UTF-8").as("record"))
        .write.format("tfrecord").mode("overwrite").save(tfDir))
    emit("tfrecord_write", twSec, payloadBytes,
      s""","disk_bytes":${dirBytes(tfDir)}""")
    val (n3, trSec) = timed(
      spark.read.format("tfrecord").load(tfDir)
        .where(length(col("record")) > 0).count())
    require(n3 == rows, s"read $n3 != $rows")
    emit("tfrecord_read", trSec, payloadBytes)

    spark.stop()
  }
}
