package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP layer inside WARC `response` payloads ([[HttpPayload]] +
  * the `http_status`/`http_content_type`/`http_body` columns of
  * [[WarcSource]]): message splitting, chunked transfer decoding
  * (extensions, trailers), gzip content decoding and its off switch,
  * the malformed-never-crashes contract, and non-response gating —
  * framing-level behavior the DuckDB oracle (which compares decoded
  * content) cannot see. */
class HttpWarcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ascii(s: String) = s.getBytes("ISO-8859-1")

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  /** body chunked at `n` bytes with an extension on the first chunk and
    * a trailer header after the terminator — the full RFC 9112 shape. */
  private def chunk(body: Array[Byte], n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var first = true
    while (i < body.length) {
      val len = math.min(n, body.length - i)
      val ext = if (first) ";x=\"quoted\"" else ""
      out.write(ascii(f"$len%x$ext\r\n"))
      out.write(body, i, len)
      out.write(ascii("\r\n"))
      i += len
      first = false
    }
    out.write(ascii("0\r\nX-Trailer: ignored\r\n\r\n"))
    out.toByteArray
  }

  private def msg(head: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ascii(head))
    out.write(body)
    out.toByteArray
  }

  test("parse: identity body, status and content-type split out") {
    val body = "<html>hello &amp; world</html>".getBytes("UTF-8")
    val p = HttpPayload.parse(msg(
      "HTTP/1.1 200 OK\r\nServer: x\r\nContent-Type: text/html; charset=UTF-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n", body), gunzip = true)
    assert(p.ok && p.status == 200)
    assert(p.contentType == "text/html; charset=UTF-8")
    assert(p.body.toSeq == body.toSeq)
  }

  test("parse: multi-word reason phrases and folded headers") {
    val p = HttpPayload.parse(msg(
      "HTTP/1.0 301 Moved Permanently\r\nContent-Type: text/plain;\r\n" +
        " charset=latin-1\r\n\r\n", ascii("moved")), gunzip = true)
    assert(p.ok && p.status == 301)
    assert(p.contentType == "text/plain; charset=latin-1")
    assert(new String(p.body, "ISO-8859-1") == "moved")
  }

  test("parse: chunked transfer coding with extensions and trailers") {
    val body = ("0123456789" * 41 + "tail").getBytes("UTF-8") // 414 bytes
    for (sz <- Seq(1, 7, 64, 1000)) {
      val p = HttpPayload.parse(msg(
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n",
        chunk(body, sz)), gunzip = true)
      assert(p.ok, s"chunk size $sz")
      assert(p.body.toSeq == body.toSeq, s"chunk size $sz")
    }
  }

  test("parse: gzip content coding decodes; http_gunzip=false keeps raw bytes") {
    val body = "compressed page content".getBytes("UTF-8")
    val raw = gzip(body)
    val m = msg("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/html\r\n\r\n", raw)
    val dec = HttpPayload.parse(m, gunzip = true)
    assert(dec.ok && dec.body.toSeq == body.toSeq)
    val kept = HttpPayload.parse(m, gunzip = false)
    assert(kept.ok && kept.body.toSeq == raw.toSeq)
  }

  test("parse: chunked THEN gzip content coding composes") {
    val body = "chunked and gzipped".getBytes("UTF-8")
    val p = HttpPayload.parse(msg(
      "HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n", chunk(gzip(body), 5)),
      gunzip = true)
    assert(p.ok && p.body.toSeq == body.toSeq)
  }

  test("parse: malformed messages report not-ok, never throw") {
    val bad = Seq(
      "no HTTP at all".getBytes("UTF-8"), // no CRLF CRLF, no status
      msg("HTTP/1.1 20 OK\r\n\r\n", ascii("x")), // 2-digit status
      msg("HTTP/1.1 2001 OK\r\n\r\n", ascii("x")), // 4-digit: not a 200
      msg("HTTP/1.1 20x OK\r\n\r\n", ascii("x")), // non-digit in status
      msg("ICY 200 OK\r\n\r\n", ascii("x")), // not an HTTP/ version
      msg("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n",
        ascii("zz\r\nnot hex\r\n0\r\n\r\n")), // bad chunk size
      msg("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n",
        ascii("ff\r\ntoo short")), // chunk overruns payload
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n",
        ascii("not gzip bytes"))) // corrupt gzip body
    bad.foreach { b =>
      val p = HttpPayload.parse(b, gunzip = true)
      assert(!p.ok, new String(b.take(30), "ISO-8859-1"))
    }
  }

  test("isHttpResponse gates on the WARC Content-Type, not the payload") {
    assert(HttpPayload.isHttpResponse("application/http; msgtype=response"))
    assert(HttpPayload.isHttpResponse("application/http;msgtype=response"))
    assert(HttpPayload.isHttpResponse("application/http")) // no msgtype: assume response
    assert(!HttpPayload.isHttpResponse("application/http; msgtype=request"))
    assert(!HttpPayload.isHttpResponse("text/plain"))
    assert(!HttpPayload.isHttpResponse(null))
  }

  /** a tiny crawl: responses (one chunked, one gzipped, one broken), a
    * request capture, and a plain resource record */
  private def crawlDir(): String = {
    val dir = tmp("warc_http")
    val rows = Seq(
      ("urn:r:0", "response", "application/http; msgtype=response",
        msg("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          "X-Tag: one\r\nX-Tag: two\r\nLast-Modified: yesterday\r\n" +
          "Content-Length: 12\r\n\r\n", ascii("<p>plain</p>"))),
      ("urn:r:1", "response", "application/http; msgtype=response",
        msg("HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n" +
          "Transfer-Encoding: chunked\r\n\r\n", chunk(ascii("gone away"), 4))),
      ("urn:r:2", "response", "application/http; msgtype=response",
        msg("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
          "Content-Encoding: gzip\r\n\r\n", gzip(ascii("<p>zipped</p>")))),
      ("urn:r:3", "response", "application/http; msgtype=response",
        ascii("HTTP/1.1 garbage status line\r\n\r\nbody")),
      ("urn:r:4", "request", "application/http; msgtype=request",
        ascii("GET / HTTP/1.1\r\nHost: example.com\r\n\r\n")),
      ("urn:r:5", "resource", "text/plain", ascii("not http at all")))
    rows.toDF("record_id", "warc_type", "content_type", "payload")
      .withColumn("target_uri", concat(lit("https://x.example/"), col("record_id")))
      .withColumn("date", lit("2026-01-01T00:00:00Z"))
      .coalesce(1)
      .transform(df => { Warc.write(df, dir); df })
    dir
  }

  test("warc read: http_* columns split responses, null everything else") {
    val got = spark.read.format("warc").load(crawlDir())
      .select("record_id", "http_status", "http_content_type", "http_body")
      .collect().map(r => r.getAs[String]("record_id") ->
        ((Option(r.get(1)), Option(r.getAs[String]("http_content_type")),
          Option(r.getAs[Array[Byte]]("http_body")).map(new String(_, "UTF-8")))))
      .toMap
    assert(got("urn:r:0") == ((Some(200), Some("text/html; charset=utf-8"), Some("<p>plain</p>"))))
    assert(got("urn:r:1") == ((Some(404), Some("text/plain"), Some("gone away"))))
    assert(got("urn:r:2") == ((Some(200), Some("text/html"), Some("<p>zipped</p>"))))
    assert(got("urn:r:3") == ((None, None, None))) // malformed: nulls, no crash
    assert(got("urn:r:4") == ((None, None, None))) // request capture
    assert(got("urn:r:5") == ((None, None, None))) // not http
  }

  test("warc read: http_gunzip=false surfaces the raw gzip body") {
    val r = spark.read.format("warc").option("http_gunzip", "false")
      .load(crawlDir())
      .where(col("record_id") === "urn:r:2")
      .select("http_body").collect().head.getAs[Array[Byte]](0)
    assert(r.length >= 2 && (r(0) & 0xff) == 0x1f && (r(1) & 0xff) == 0x8b,
      "expected raw gzip magic")
  }

  test("warc read: http_headers map — lowercased names, repeats combined " +
    "with ', ', null for non-responses and malformed") {
    val got = spark.read.format("warc").load(crawlDir())
      .select("record_id", "http_headers")
      .collect().map(r => r.getAs[String]("record_id") ->
        Option(r.getAs[Map[String, String]]("http_headers"))).toMap
    val h0 = got("urn:r:0").get
    assert(h0("content-type") == "text/html; charset=utf-8")
    assert(h0("x-tag") == "one, two") // repeated field: RFC 9110 combine
    assert(h0("last-modified") == "yesterday")
    assert(h0("content-length") == "12")
    assert(got("urn:r:1").get("transfer-encoding") == "chunked")
    assert(got("urn:r:3").isEmpty) // malformed
    assert(got("urn:r:4").isEmpty) // request capture
    assert(got("urn:r:5").isEmpty) // not http
  }

  test("warc streaming: http_* columns flow through the micro-batch reader") {
    val src = crawlDir()
    val land = tmp("warc_http_land")
    val f = new java.io.File(src).listFiles().find(_.getName.endsWith(".warc")).get
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(land, "wave00.warc"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val q = spark.readStream.format("warc").load(land)
      .select(col("http_status"), decode(col("http_body"), "UTF-8").as("t"))
      .where(col("http_status").isNotNull)
      .writeStream.option("checkpointLocation", tmp("warc_http_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => seen.add((r.getInt(0), r.getString(1))))
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet ==
      Set((200, "<p>plain</p>"), (404, "gone away"), (200, "<p>zipped</p>")))
  }

  test("warc streaming: the full frontier extraction chain (http_text -> " +
    "outlinks -> strip tracking params -> explode) runs stateless on the " +
    "micro-batch reader, identical to the batch read") {
    import graft.pipeline.TextAnalysis
    val src = tmp("warc_frontier_src")
    val page = "<html><a href=\"https://Ex.COM/a?utm_source=x&id=1\">a</a> " +
      "<a href=HTTP://ex.com:80/unq>u</a> <a href=\"/rel\">r</a></html>"
    Seq(("urn:f:0", "response", "application/http; msgtype=response",
        msg("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n",
          page.getBytes("UTF-8"))))
      .toDF("record_id", "warc_type", "content_type", "payload")
      .withColumn("target_uri", lit("https://ex.com/f0"))
      .withColumn("date", lit("2026-01-01T00:00:00Z"))
      .coalesce(1).transform(df => { Warc.write(df, src); df })
    val land = tmp("warc_frontier_land")
    val f = new java.io.File(src).listFiles().find(_.getName.endsWith(".warc")).get
    java.nio.file.Files.copy(f.toPath,
      java.nio.file.Paths.get(land, "wave00.warc"))
    def chain(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(org.apache.spark.sql.functions.transform(
        TextAnalysis.outlinks(HttpText.decode(
          col("http_body"), col("http_content_type"))),
        u => TextAnalysis.stripTrackingParams(u))).as("link"))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = chain(spark.readStream.format("warc").load(land))
      .writeStream.option("checkpointLocation", tmp("warc_frontier_ckpt"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => seen.add(r.getString(0)))
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    import scala.jdk.CollectionConverters._
    val batch = chain(spark.read.format("warc").load(land))
      .collect().map(_.getString(0)).toSet
    assert(seen.asScala.toSet == batch &&
      batch == Set("https://ex.com/a?id=1", "http://ex.com/unq"), s"got $batch")
  }

  test("warc read: a projection without http_* columns never parses http " +
    "(and one with only http_body works with payload pruned out)") {
    val dir = crawlDir()
    // only metadata: the pruned reader path (payload skipped) still works
    // with broken-http records present — proof no parsing happened
    val metaCount = spark.read.format("warc").load(dir)
      .select("record_id", "content_length").count()
    assert(metaCount == 6)
    // only http_body: payload is pruned from the output but the split
    // still has the bytes it needs
    val bodies = spark.read.format("warc").load(dir)
      .select("http_body").where(col("http_body").isNotNull).count()
    assert(bodies == 3)
  }

  test("isHttpResponse: whitespace/quoted msgtype parameters still gate " +
    "request captures") {
    assert(!HttpPayload.isHttpResponse("application/http; msgtype = request"))
    assert(!HttpPayload.isHttpResponse("application/http; msgtype=\"request\""))
    assert(!HttpPayload.isHttpResponse("application/http; MsgType=Request"))
    assert(HttpPayload.isHttpResponse("application/http; msgtype=\"response\""))
  }

  // ---- the charset decode ladder (HttpText): BOM > Content-Type charset
  // > <meta charset> prescan > UTF-8, latin-1 family as cp1252, lossy
  // replace, never a throw

  private def dec(bytes: Array[Byte], ct: String): String = {
    val u = HttpText.decodeKernel(bytes,
      if (ct == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(ct))
    if (u == null) null else u.toString
  }

  test("http_text: transport charset parameter decides; quotes and " +
    "whitespace around the name are tolerated") {
    assert(dec("héllo".getBytes("UTF-8"), "text/html; charset=utf-8") == "héllo")
    assert(dec("héllo".getBytes("UTF-8"), "text/html; charset=\"UTF-8\"") == "héllo")
    assert(dec("héllo".getBytes("UTF-8"), "text/html; charset = utf-8") == "héllo")
  }

  test("http_text: declared latin-1 family decodes as windows-1252 — the " +
    "0x80-0x9f bytes real pages carry are cp1252, not C1 controls") {
    // € = 0x80, left/right curly quotes = 0x93/0x94 in cp1252
    val b = Array[Byte](0x80.toByte, ' ', 0x93.toByte, 'x', 0x94.toByte)
    assert(dec(b, "text/html; charset=iso-8859-1") == "€ “x”")
    assert(dec(b, "text/html; charset=latin1") == "€ “x”")
    assert(dec(b, "text/plain; charset=US-ASCII") == "€ “x”")
    assert(dec(b, "text/html; charset=windows-1252") == "€ “x”")
  }

  test("http_text: a BOM wins over a WRONG declared charset and is consumed") {
    val utf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "déjà".getBytes("UTF-8")
    assert(dec(utf8, "text/html; charset=iso-8859-1") == "déjà")
    val utf16le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ "déjà".getBytes("UTF-16LE")
    assert(dec(utf16le, "text/html; charset=utf-8") == "déjà")
    val utf16be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ "déjà".getBytes("UTF-16BE")
    assert(dec(utf16be, null) == "déjà")
  }

  test("http_text: UTF-16LE content starting with U+0000 decodes as " +
    "UTF-16LE — the sniff has no UTF-32 arm to steal the FF FE prefix " +
    "(WHATWG convention, ADVICE r17)") {
    // bytes: FF FE (BOM) 00 00 (U+0000) 61 00 ('a') — a UTF-32LE sniff
    // would read FF FE 00 00 as its BOM and decode garbage
    val b = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 0, 0x61, 0)
    assert(dec(b, null) == "\u0000a")
  }

  test("http_text: <meta charset> prescan decides when the header is " +
    "silent — but only within the first 1024 bytes") {
    val near = ("<head><meta charset='windows-1252'></head>é body")
      .getBytes("windows-1252")
    assert(dec(near, "text/html") == "<head><meta charset='windows-1252'></head>é body")
    val far = (" " * 1100 +
      "<meta charset=\"windows-1252\">").getBytes("ISO-8859-1") ++
      Array[Byte](0xe9.toByte) // lone 0xe9 is malformed UTF-8
    // declaration out of the prescan window -> default UTF-8, lossy replace
    assert(dec(far, "text/html").endsWith("�"))
    // http-equiv form: charset= inside the content attribute
    val equiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\">déjà €")
      .getBytes("windows-1252")
    assert(dec(equiv, null).endsWith("déjà €"))
  }

  test("http_text: unknown charsets and malformed bytes fall back to " +
    "UTF-8 with replacement, never a throw") {
    assert(dec("plain".getBytes("UTF-8"), "text/html; charset=x-unknown-999") == "plain")
    val broken = Array[Byte]('a', 0xc3.toByte) // truncated UTF-8 sequence
    assert(dec(broken, null) == "a�")
    assert(dec(Array.empty[Byte], "text/html") == "")
  }

  test("http_text: an extended-JVM charset (Shift_JIS) declared in the " +
    "header decodes when the runtime has it") {
    assume(java.nio.charset.Charset.isSupported("Shift_JIS"))
    val b = "東京タワー".getBytes("Shift_JIS")
    assert(dec(b, "text/html; charset=Shift_JIS") == "東京タワー")
    assert(dec(b, "text/html; charset=shift_jis") == "東京タワー")
  }

  test("http_text expression: null body -> null, null content type still " +
    "decodes; works from DataFrame and SQL (codegen path)") {
    val rows = Seq(
      (0L, "héllo €".getBytes("windows-1252"), "text/html; charset=iso-8859-1"),
      (1L, null, "text/html"),
      (2L, "plain".getBytes("UTF-8"), null))
    val df = rows.toDF("id", "body", "ct")
    val got = df.select(col("id"),
        HttpText.decode(col("body"), col("ct")).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("t"))).toMap
    assert(got(0L).contains("héllo €"))
    assert(got(1L).isEmpty)
    assert(got(2L).contains("plain"))
    df.createOrReplaceTempView("http_text_spec")
    val sql = spark.sql(
      "SELECT id, http_text(body, ct) AS t FROM http_text_spec")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("t"))).toMap
    assert(sql == got)
  }
}
