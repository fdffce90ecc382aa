package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two file-format connectors ([[TfRecordSource]], [[WarcSource]]):
  * byte-exact round trips, corruption detection, gzip member handling,
  * payload pruning, and overwrite semantics — the format-level
  * invariants the DuckDB value oracles (which compare decoded CONTENT)
  * cannot see. */
class SourcesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("tfrecord: round trip is byte-exact, including empty records") {
    val dir = tmp("tfr_rt")
    val recs = Seq(Array[Byte](), Array[Byte](1, 2, 3), Array.fill[Byte](70000)(42),
      "snowman ☃".getBytes("UTF-8"))
    recs.toDF("record").repartition(2)
      .write.format("tfrecord").mode("append").save(dir)
    val back = spark.read.format("tfrecord").load(dir)
      .collect().map(_.getAs[Array[Byte]]("record").toSeq).sortBy(_.length)
    assert(back.toSeq == recs.map(_.toSeq).sortBy(_.length))
    // _SUCCESS published on commit
    assert(new java.io.File(dir, "_SUCCESS").exists())
  }

  test("tfrecord: overwrite truncates prior data files; append accumulates") {
    val dir = tmp("tfr_ow")
    Seq(Array[Byte](1)).toDF("record").write.format("tfrecord")
      .mode("append").save(dir)
    Seq(Array[Byte](2)).toDF("record").write.format("tfrecord")
      .mode("append").save(dir)
    assert(spark.read.format("tfrecord").load(dir).count() == 2)
    Seq(Array[Byte](3)).toDF("record").write.format("tfrecord")
      .mode("overwrite").save(dir)
    val back = spark.read.format("tfrecord").load(dir).collect()
      .map(_.getAs[Array[Byte]]("record").toSeq)
    assert(back.toSeq == Seq(Seq(3.toByte)))
  }

  test("tfrecord: a flipped payload byte is a loud crc error, not bad data") {
    val dir = tmp("tfr_crc")
    Seq("hello world".getBytes("UTF-8")).toDF("record")
      .coalesce(1).write.format("tfrecord").mode("append").save(dir)
    val f = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith(".tfrecord")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(12 + 3) = (bytes(12 + 3) ^ 0x01).toByte // inside the payload
    java.nio.file.Files.write(f.toPath, bytes)
    // the local FS wrote a Hadoop .crc sidecar that would catch this
    // corruption one layer down — remove it so the test exercises the
    // FORMAT's own crc (object stores have no sidecar layer)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("tfrecord").load(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("corrupt data crc")))
  }

  test("tfrecord sink rejects a malformed input frame loudly") {
    // two columns: Spark's own DSv2 schema validation fires first
    // (arity mismatch against the table's single `record` column)
    val e = intercept[Exception] {
      Seq(("a", 1)).toDF("s", "i").write.format("tfrecord")
        .mode("append").save(tmp("tfr_schema"))
    }
    assert(e.getMessage.contains("record") || e.getMessage.contains("BINARY"),
      s"not a schema diagnostic: ${e.getMessage}")
  }

  private def warcFrame = spark.range(0, 50).select(
    concat(lit("urn:doc:"), col("id")).as("record_id"),
    lit("resource").as("warc_type"),
    concat(lit("https://example.com/"), col("id")).as("target_uri"),
    lit("2026-01-01T00:00:00Z").as("date"),
    lit("text/plain").as("content_type"),
    encode(concat(lit("payload body "), col("id")), "UTF-8").as("payload"))

  test("warc: round trip preserves headers and payload bytes, plain and gzip") {
    for (gz <- Seq(false, true)) {
      val dir = tmp(s"warc_rt_$gz")
      Warc.write(warcFrame.repartition(3), dir, gzip = gz)
      val back = spark.read.format("warc").load(dir)
      assert(back.count() == 50)
      val r = back.where(col("record_id") === "urn:doc:7").collect().head
      assert(r.getAs[String]("warc_type") == "resource")
      assert(r.getAs[String]("target_uri") == "https://example.com/7")
      assert(r.getAs[String]("content_type") == "text/plain")
      assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "payload body 7")
      assert(r.getAs[Long]("content_length") == "payload body 7".length.toLong)
    }
  }

  test("warc: multi-member gzip (the Common Crawl record-per-member layout)") {
    val dir = tmp("warc_members")
    // two single-record gzip files concatenated byte-wise into ONE .warc.gz
    val a = tmp("warc_m_a"); val b = tmp("warc_m_b")
    Warc.write(warcFrame.where(col("record_id") === "urn:doc:1").coalesce(1), a, gzip = true)
    Warc.write(warcFrame.where(col("record_id") === "urn:doc:2").coalesce(1), b, gzip = true)
    def only(d: String) = new java.io.File(d).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get.toPath
    val joined = java.nio.file.Files.readAllBytes(only(a)) ++
      java.nio.file.Files.readAllBytes(only(b))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "members.warc.gz"), joined)
    val back = spark.read.format("warc").load(dir)
    assert(back.select("record_id").as[String].collect().sorted.toSeq ==
      Seq("urn:doc:1", "urn:doc:2"))
  }

  test("warc: payload pruning reaches the scan (a header census never " +
    "materializes bodies)") {
    val dir = tmp("warc_prune")
    Warc.write(warcFrame, dir)
    val q = spark.read.format("warc").load(dir)
      .groupBy("warc_type").agg(sum("content_length").as("bytes"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WarcScan") && plan.contains("cols="))
    assert(!"cols=[^)]*payload".r.findFirstIn(plan).isDefined,
      s"payload survived pruning:\n$plan")
    assert(q.collect().head.getAs[Long]("bytes") ==
      (0 until 50).map(i => s"payload body $i".length).sum.toLong)
    // and the full read still returns payloads
    val full = spark.read.format("warc").load(dir)
    assert(full.queryExecution.executedPlan.toString.contains("payload"))
  }

  test("warc: non-ASCII header values round-trip as UTF-8 (no mojibake)") {
    val dir = tmp("warc_utf8")
    val uri = "https://example.com/café/日本語"
    Warc.write(warcFrame.limit(1).withColumn("target_uri", lit(uri)), dir)
    val r = spark.read.format("warc").load(dir).collect().head
    assert(r.getAs[String]("target_uri") == uri)
  }

  test("warc write: CR/LF in a header value and null required headers " +
    "are loud errors, never corrupted framing") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val e1 = intercept[Exception] {
      Warc.write(warcFrame.limit(1)
        .withColumn("target_uri", lit("x\r\nContent-Length: 0")), tmp("warc_inj"))
    }
    assert(msgs(e1).exists(m => m != null && m.contains("CR/LF in header")))
    val e2 = intercept[Exception] {
      Warc.write(warcFrame.limit(1)
        .withColumn("record_id", lit(null).cast("string")), tmp("warc_nullid"))
    }
    assert(msgs(e2).exists(m => m != null && m.contains("null value for required header")))
    // a failed task leaves NO visible partial file behind
    assert(!new java.io.File(tmp("warc_inj")).listFiles().exists(
      _.getName.endsWith(".warc")))
  }

  test("tfrecord sink: a null record value is a loud error, never a " +
    "silently-skipped or corrupt frame") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    val e = intercept[Exception] {
      spark.range(2).select(
          when(col("id") === 0, encode(lit("x"), "UTF-8")).as("record"))
        .coalesce(1).write.format("tfrecord").mode("append").save(tmp("tfr_null"))
    }
    // Spark's plan-level non-nullable assert fires first (the table
    // schema declares `record` non-nullable); the writer's own check
    // ("null record value") is the backstop for paths that bypass it
    assert(msgs(e).exists(m => m != null &&
      (m.contains("NOT_NULL_ASSERT_VIOLATION") || m.contains("null record value"))))
  }

  test("warc: spec-legal folded headers (continuation lines) parse") {
    val dir = tmp("warc_fold")
    val body = "abc".getBytes("US-ASCII")
    val rec = ("WARC/1.1\r\n" +
      "WARC-Record-ID: urn:doc:9\r\n" +
      "WARC-Type: resource\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "WARC-Target-URI: https://example.com/a\r\n" +
      "\t/very/long/path\r\n" +                         // folded continuation
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes("US-ASCII") ++ body ++ "\r\n\r\n".getBytes("US-ASCII")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "fold.warc"), rec)
    val r = spark.read.format("warc").load(dir).collect().head
    assert(r.getAs[String]("target_uri") == "https://example.com/a /very/long/path")
    assert(new String(r.getAs[Array[Byte]]("payload"), "US-ASCII") == "abc")
  }

  test("warc: malformed framing is a loud error naming the file") {
    val dir = tmp("warc_bad")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.warc"),
      "NOT-A-WARC\r\n\r\n".getBytes("US-ASCII"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("warc").load(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null &&
      m.contains("expected WARC/ version line") && m.contains("bad.warc")))
  }

  test("warc streaming: lexicographic landing-dir ingest, checkpoint " +
    "restart skips processed files") {
    val land = tmp("warc_stream")
    val ckpt = tmp("warc_stream_ckpt")

    // stage a wave under a controlled, increasing file name
    def wave(n: Int, ids: Seq[Int]): Unit = {
      val src = tmp(s"warc_wave$n")
      Warc.write(warcFrame.where(col("record_id")
        .isin(ids.map(i => s"urn:doc:$i"): _*)).coalesce(1), src)
      val f = new java.io.File(src).listFiles().find(_.getName.endsWith(".warc")).get
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(land, f"wave$n%02d.warc"))
    }

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(): Unit = {
      val q = spark.readStream.format("warc").load(land)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized {
            seen ++= b.select("record_id").collect().map(_.getString(0))
          }
          ()
        }.start()
      q.processAllAvailable(); q.stop()
    }

    wave(1, Seq(1, 2))
    run()
    assert(seen.sorted.toSeq == Seq("urn:doc:1", "urn:doc:2"))
    wave(2, Seq(3))
    run() // restart from the checkpoint: wave1 is behind the offset
    assert(seen.sorted.toSeq == Seq("urn:doc:1", "urn:doc:2", "urn:doc:3"))
    // payload pruning holds on the streaming scan too: a census stream
    // never materializes bodies (same reader, cols from the scan builder)
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("warc").load(land)
      .groupBy("warc_type").count()
      .writeStream.outputMode("complete")
      .option("checkpointLocation", tmp("warc_stream_ckpt2"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        counts.synchronized { counts ++= b.collect().map(_.getAs[Long]("count")) }
        ()
      }.start()
    q2.processAllAvailable(); q2.stop()
    assert(counts.lastOption.contains(3L))
  }

  test("end to end: warc landing stream -> stored-minhash dedup -> " +
    "tfrecord training shards") {
    import graft.pipeline.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the accumulated corpus, saved once as the stored near-dup state
    val store = tmp("e2e_minhash_store")
    Dedup.saveMinhashState(docs, "text", "doc_id", store,
      shingleLen = 3, numBands = 24, rowsPerBand = 1, nBuckets = 8)

    // arriving crawl: re-keyed corpus docs (exact dups, must be dropped)
    // plus three novel docs (must survive into the shards)
    val novel = Seq(
      (9000001L, "completely novel arrival text one with enough words to shingle"),
      (9000002L, "another genuinely new document body that matches nothing stored"),
      (9000003L, "third unseen arrival paragraph with original content entirely"))
    val arriving = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(novel.toDF("doc_id", "text"))
    val land = tmp("e2e_landing")
    val src = tmp("e2e_wave")
    Warc.write(arriving.coalesce(1).select(
      concat(lit("urn:doc:"), col("doc_id")).as("record_id"),
      lit("resource").as("warc_type"),
      concat(lit("https://example.com/"), col("doc_id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("content_type"),
      encode(col("text"), "UTF-8").as("payload")), src)
    val f = new java.io.File(src).listFiles().find(_.getName.endsWith(".warc")).get
    java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(land, "wave00.warc"))

    val shards = tmp("e2e_shards")
    val stored = Dedup.loadMinhashState(spark, store)
    val q = spark.readStream.format("warc").load(land)
      .writeStream.option("checkpointLocation", tmp("e2e_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.util.MatchScope.withMatchScope {
          val batchDocs = b.select(
            expr("CAST(substr(record_id, 9) AS BIGINT)").as("doc_id"),
            decode(col("payload"), "UTF-8").as("text")).localCheckpoint()
          val dupIds = Dedup.minhashPairsAgainstStored(batchDocs, "text",
              "doc_id", stored, threshold = 0.5, maxBucketPairs = Long.MaxValue)
            .select(col("id_a").as("doc_id")).distinct()
          batchDocs.join(dupIds, Seq("doc_id"), "left_anti")
            .select(encode(col("text"), "UTF-8").as("record"))
            .write.format("tfrecord").mode("append").save(shards)
        }
        ()
      }.start()
    q.processAllAvailable(); q.stop()

    val shipped = spark.read.format("tfrecord").load(shards)
      .select(decode(col("record"), "UTF-8").as("text"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(shipped == novel.map(_._2).sorted,
      s"shards hold ${shipped.size} docs; expected the ${novel.size} novel ones")
  }

  test("nested layouts: silent-zero traps are loud, recursive reads them") {
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    // a Common Crawl-ish nested layout: root/segA/warc/*.warc
    val root = tmp("warc_nested")
    val seg = java.nio.file.Paths.get(root, "segA", "warc")
    java.nio.file.Files.createDirectories(seg)
    val src = tmp("warc_nested_src")
    Warc.write(warcFrame.limit(5).coalesce(1), src)
    val f = new java.io.File(src).listFiles().find(_.getName.endsWith(".warc")).get
    java.nio.file.Files.copy(f.toPath, seg.resolve("seg.warc"))
    // flat read of the root: NOT silently empty
    val e1 = intercept[Exception] {
      spark.read.format("warc").load(root).count()
    }
    assert(msgs(e1).exists(m => m != null && m.contains("recursive")))
    // recursive read finds the nested file
    assert(spark.read.format("warc").option("recursive", "true")
      .load(root).count() == 5)
    // a missing path is loud too (was a silent empty frame)
    val e2 = intercept[Exception] {
      spark.read.format("warc").load(s"$root/does_not_exist").count()
    }
    assert(msgs(e2).exists(m => m != null && m.contains("does not exist")))
    // the stream rejects recursive: its offset orders flat file names
    val e3 = intercept[Exception] {
      spark.readStream.format("warc").option("recursive", "true").load(root)
        .writeStream.option("checkpointLocation", tmp("warc_nested_ckpt"))
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start().processAllAvailable()
    }
    assert(msgs(e3).exists(m => m != null && m.contains("FLAT landing directory")))
  }

  test("warc: one input partition per file (the format's parallelism contract)") {
    val dir = tmp("warc_parts")
    Warc.write(warcFrame.repartition(4), dir)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc"))
    assert(files == 4)
    val parts = spark.read.format("warc").load(dir).rdd.getNumPartitions
    assert(parts == files)
  }

  test("warc gz split: a member-per-record file range-splits at probed " +
    "boundaries with content identical to the unsplit read") {
    val dir = tmp("warc_split")
    // 400 records as ONE .warc.gz with one gzip member per record
    val frame = spark.range(0, 400).select(
      concat(lit("urn:doc:"), col("id")).as("record_id"),
      lit("resource").as("warc_type"),
      concat(lit("https://example.com/"), col("id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("content_type"),
      encode(concat(lit("body of record number "), col("id"),
        lit(" with some padding text to compress")), "UTF-8").as("payload"))
    Warc.write(frame.coalesce(1), dir, gzip = true, memberPerRecord = true)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 1)
    val fileLen = files.head.length()

    def read(splitSize: Long) = spark.read.format("warc")
      .option("split_size", splitSize.toString).load(dir)
    // split roughly in 8: every range re-aligns on a member boundary
    val split = read(fileLen / 8)
    assert(split.rdd.getNumPartitions > 4,
      s"expected >4 ranges, got ${split.rdd.getNumPartitions}")
    val unsplit = read(0)
    assert(unsplit.rdd.getNumPartitions == 1)
    def content(df: org.apache.spark.sql.DataFrame) = df
      .select(col("record_id"), decode(col("payload"), "UTF-8").as("t"),
        col("content_length"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(content(split) == content(unsplit) && content(split).size == 400)
    // counts agree too (no dropped or doubled boundary records)
    assert(split.count() == 400)
  }

  test("warc gz split: whole-file gzip has no interior boundaries and " +
    "stays one partition (graceful degrade, not corruption)") {
    val dir = tmp("warc_nosplit")
    Warc.write(warcFrame.coalesce(1), dir, gzip = true) // single member
    val len = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get.length()
    val df = spark.read.format("warc")
      .option("split_size", (len / 4).toString).load(dir)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == warcFrame.count())
  }

  test("warc gz split: a big whole-file gzip with trailing non-gzip bytes " +
    "still reads (no-boundary fallback keeps the tolerant unsplit path)") {
    val dir = tmp("warc_trailing")
    Warc.write(warcFrame.coalesce(1), dir, gzip = true) // single member
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    // archiver-style padding after the gzip stream
    val fos = new java.io.FileOutputStream(f, true)
    fos.write(new Array[Byte](512)); fos.close()
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    // force the split path decision (len > split_size) — no interior
    // boundary exists, so the read must fall back to the unsplit reader
    // that treats trailing garbage as EOF (the pre-split behavior)
    val df = spark.read.format("warc")
      .option("split_size", (f.length() / 4).toString).load(dir)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == warcFrame.count())
  }

  test("warc gz split: the STREAMING face range-splits an oversize " +
    "member-per-record landing file (r16 item 3), byte-identical results") {
    val land = tmp("warc_stream_split")
    val src = tmp("warc_stream_split_src")
    val frame = spark.range(0, 300).select(
      concat(lit("urn:doc:"), col("id")).as("record_id"),
      lit("resource").as("warc_type"),
      concat(lit("https://example.com/"), col("id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("content_type"),
      encode(concat(lit("streamed record number "), col("id"),
        lit(" with some padding text to compress")), "UTF-8").as("payload"))
    Warc.write(frame.coalesce(1), src, gzip = true, memberPerRecord = true)
    val f = new java.io.File(src).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(land, "wave00.warc.gz"))

    // the planner itself: the planned batch must hold >1 range partition
    val stream = new WarcScan(land, WarcSource.Schema, recursive = false,
      httpGunzip = true, splitSize = f.length() / 6)
      .toMicroBatchStream(tmp("warc_ss_ckpt0"))
    val parts = stream.planInputPartitions(
      WarcOffset(""), WarcOffset("wave00.warc.gz"))
    assert(parts.length > 3,
      s"streaming face planned ${parts.length} partition(s) for an " +
        "oversize member-per-record file — expected range splits")
    assert(parts.forall(_.asInstanceOf[WarcFilePartition].split))

    // end to end through a real query: identical content to the batch read
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = spark.readStream.format("warc")
      .option("split_size", (f.length() / 6).toString).load(land)
      .select(col("record_id"), decode(col("payload"), "UTF-8").as("t"))
      .writeStream.option("checkpointLocation", tmp("warc_ss_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r => (r.getString(0), r.getString(1)))
        }
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    val batch = spark.read.format("warc").load(land)
      .select(col("record_id"), decode(col("payload"), "UTF-8").as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq)
    assert(got.size == 300)
  }

  test("warc gz split: a member-per-record file with trailing non-gzip " +
    "bytes reads them as EOF (GZIPInputStream semantics), split or not") {
    val dir = tmp("warc_member_trailing")
    val frame = spark.range(0, 200).select(
      concat(lit("urn:doc:"), col("id")).as("record_id"),
      lit("resource").as("warc_type"),
      concat(lit("https://example.com/"), col("id")).as("target_uri"),
      lit("2026-01-01T00:00:00Z").as("date"),
      lit("text/plain").as("content_type"),
      encode(concat(lit("record "), col("id"),
        lit(" padded with compressible filler text")), "UTF-8").as("payload"))
    Warc.write(frame.coalesce(1), dir, gzip = true, memberPerRecord = true)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    // archiver-style zero padding after the last member
    val fos = new java.io.FileOutputStream(f, true)
    fos.write(new Array[Byte](256)); fos.close()
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val split = spark.read.format("warc")
      .option("split_size", (f.length() / 5).toString).load(dir)
    assert(split.rdd.getNumPartitions > 2)
    assert(split.count() == 200) // last range EOFs at the padding, loudly-not
    val unsplit = spark.read.format("warc").option("split_size", "0").load(dir)
    assert(unsplit.count() == 200)
  }

  test("warc gz split: non-gzip bytes at a member boundary are silent EOF " +
    "only at the FILE tail — an interior range fails loudly (ADVICE r17)") {
    def member(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val m1 = member("WARC/1.0 first")
    val bytes = m1 ++ new Array[Byte](64) ++ member("WARC/1.0 second")
    def readAll(endOffset: Long, fileLength: Long): String = {
      val ms = new GzipMemberStream(
        new java.io.ByteArrayInputStream(bytes), 0L, endOffset, "mem",
        fileLength)
      try new String(ms.readAllBytes(), "UTF-8") finally ms.close()
    }
    // tail range (end == file length): padding-as-EOF, first member only
    assert(readAll(m1.length + 64, m1.length + 64) == "WARC/1.0 first")
    // interior range (the file continues past endOffset): the same bytes
    // are mid-file corruption and must not silently truncate the range
    val e = intercept[java.io.IOException] {
      readAll(m1.length + 64, bytes.length.toLong + 4096)
    }
    assert(e.getMessage.contains("interior"), e.getMessage)
  }

  test("warc gz split: GzipMemberStream honors the len=0 InputStream " +
    "contract") {
    val dir = tmp("warc_len0")
    Warc.write(warcFrame.coalesce(1), dir, gzip = true, memberPerRecord = true)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".warc.gz")).get
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val raw = fs.open(new org.apache.hadoop.fs.Path(f.getPath))
    val ms = new GzipMemberStream(raw, 0L, f.length(), f.getPath)
    try {
      val buf = new Array[Byte](64)
      assert(ms.read(buf, 0, 0) == 0) // zero-length read returns 0, no stall
      assert(ms.read(buf, 0, 64) > 0) // and the stream still decodes after
    } finally ms.close()
  }

  test("warc streaming: late-file diagnostic warns once and its state " +
    "stays bounded by the backlog") {
    val stream = new WarcScan(tmp("warc_late"), WarcSource.Schema,
      recursive = false, httpGunzip = true, splitSize = 0)
      .toMicroBatchStream(tmp("warc_late_ckpt"))
      .asInstanceOf[WarcMicroBatchStream]
    Thread.sleep(5) // so t0 strictly postdates the stream's start
    val t0 = System.currentTimeMillis()
    // normal life cycle: listed pending, then committed strictly later
    stream.exposeWarnLate(Seq(("/land/wave01.warc", 1L, t0)))
    Thread.sleep(30)
    stream.commit(WarcOffset("wave01.warc"))
    // the pending set is EVICTED at commit (the bound under test)
    assert(stream.pendingSeenSize == 0)
    // the same file re-listed after its commit: quiet (its mtime predates
    // the covering commit — the normal-ingest signature)
    stream.exposeWarnLate(Seq(("/land/wave01.warc", 1L, t0)))
    assert(stream.warnedCount == 0)
    // a file landing BELOW the watermark after the covering commit: late
    val lateMtime = System.currentTimeMillis() + 5000
    stream.exposeWarnLate(Seq(("/land/wave00.warc", 1L, lateMtime)))
    assert(stream.warnedCount == 1)
    // re-listed every trigger: still ONE warning
    stream.exposeWarnLate(Seq(("/land/wave00.warc", 1L, lateMtime)))
    assert(stream.warnedCount == 1)
    // pre-start files stay quiet even below the watermark
    stream.exposeWarnLate(Seq(("/land/wave00a.warc", 1L, t0 - 60000)))
    assert(stream.warnedCount == 1)
  }

  test("warc write: memberPerRecord without gzip is rejected loudly") {
    val e = intercept[Exception] {
      Warc.write(warcFrame, tmp("warc_mpr"), gzip = false, memberPerRecord = true)
    }
    assert(e.getMessage.contains("memberPerRecord"))
  }

  test("tfrecord writer: uncommitted output is an invisible temp file; " +
    "commit renames, abort (even with a broken stream) leaves nothing") {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    // committed task: temp invisible while open, final visible after
    val d1 = tmp("tfr_dw_commit")
    val w1 = new TfRecordDataWriter(d1, "w1", 0, 7L, conf)
    w1.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](Array[Byte](1, 2, 3))))
    val mid = new java.io.File(d1).listFiles().map(_.getName)
    assert(mid.forall(_.startsWith(".")), s"mid-write files visible: ${mid.toSeq}")
    w1.commit()
    val after = new java.io.File(d1).listFiles().map(_.getName)
    assert(after.exists(n => n.endsWith(".tfrecord") && !n.startsWith(".")))
    assert(!after.exists(_.endsWith(".inprogress")))
    // aborted task: close() throwing must not skip the temp delete
    val d2 = tmp("tfr_dw_abort")
    val w2 = new TfRecordDataWriter(d2, "w2", 0, 8L, conf)
    w2.write(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](Array[Byte](9))))
    // sabotage the stream underneath so close()'s flush throws
    new java.io.File(d2).listFiles().foreach(_.delete())
    new java.io.File(d2).delete()
    w2.abort() // must not throw, and must not resurrect a partial file
    assert(!new java.io.File(d2).exists() ||
      new java.io.File(d2).listFiles().isEmpty)
  }

  test("warc write: attempt-free final names; a stale destination is a " +
    "loud not-fresh error, never a silent drop or overwrite") {
    val dir = tmp("warc_arb")
    // local-FS Hadoop .crc sidecars are not part of the contract
    def visible() = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".")).sorted.toSeq
    Warc.write(warcFrame.repartition(2), dir)
    assert(visible() == Seq("part-00000.warc", "part-00001.warc"))
    // a SECOND JOB into the same directory would collide with the first
    // job's published files — that must fail loudly at task start (the
    // old behavior silently kept the stale data), and the published
    // files must survive untouched
    val before = visible().map(n =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, n)).toSeq)
    val e = intercept[IllegalArgumentException] {
      Warc.write(warcFrame.repartition(2), dir)
    }
    assert(e.getMessage.contains("not fresh"))
    assert(visible() == Seq("part-00000.warc", "part-00001.warc"))
    val after = visible().map(n =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, n)).toSeq)
    assert(after == before, "published files must be byte-identical")
    assert(spark.read.format("warc").load(dir).count() == warcFrame.count())
  }
}
