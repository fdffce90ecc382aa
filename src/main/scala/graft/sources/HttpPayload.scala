package graft.sources

/** HTTP/1.x response-message parser for WARC `response` payloads — the
  * layer between `format("warc")` and usable text. Common Crawl
  * `response` records carry a full HTTP message (status line, headers,
  * body) as the WARC payload; without this split every downstream text
  * operator sees status line + headers glued to the HTML. Implemented
  * from the public message framing (RFC 9112): status line
  * `HTTP/1.x SP 3DIGIT SP reason`, CRLF-separated headers (obsolete
  * line folding honored, same as the WARC header layer), empty line,
  * body. `Transfer-Encoding: chunked` is decoded (hex sizes, chunk
  * extensions ignored, trailer section consumed); `Content-Encoding:
  * gzip` is optionally decompressed (multi-member, like the file
  * layer). Malformed messages NEVER throw — the reader substitutes
  * null columns and counts the record, so one broken server response
  * in a 100 TB crawl costs one row's columns, not the job.
  *
  * Reference behavior pinned: the reference engine has no crawl-ingest
  * layer at all (pl_fuzzy_frame_match/ is matcher-only); this follows
  * the WARC/HTTP conventions of the public crawl-processing stacks. */
private[sources] object HttpPayload {

  /** Parse outcome: `ok=false` means "not a well-formed HTTP response"
    * (the caller nulls the http_* columns and bumps its counter). A
    * well-formed message with an undecodable body (bad chunk framing,
    * corrupt gzip) also reports ok=false — status alone is not worth
    * surfacing if the body bytes cannot be trusted. `headers` is null
    * unless the caller asked for header collection (the reader requests
    * it only when the `http_headers` column is in the projection):
    * lowercased names in arrival order, repeated fields combined with
    * ", " (RFC 9110 list semantics). */
  final case class Parsed(ok: Boolean, status: Int, contentType: String,
                          body: Array[Byte],
                          headers: Seq[(String, String)] = null)
  /** Shared not-ok instance — also the reader's per-record placeholder
    * for non-HTTP records (a fresh allocation there is per-record GC
    * churn on the scan hot path). */
  val Malformed: Parsed = Parsed(ok = false, -1, null, null)

  /** True when a WARC record's Content-Type announces an HTTP RESPONSE
    * payload (`application/http` with no msgtype, or msgtype=response —
    * request captures must not be parsed as responses). */
  private val MsgTypeRequest = java.util.regex.Pattern.compile(
    """msgtype\s*=\s*"?\s*request""", java.util.regex.Pattern.CASE_INSENSITIVE)

  def isHttpResponse(warcContentType: String): Boolean = {
    if (warcContentType == null) return false
    val ct = warcContentType.toLowerCase
    // regex, not substring: writers emit the parameter with whitespace
    // or quotes ('msgtype = request', msgtype="request") — an exact
    // substring match would mis-gate those as responses
    ct.contains("application/http") && !MsgTypeRequest.matcher(ct).find()
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Split and decode one HTTP response message.
    * @param gunzip decode a `Content-Encoding: gzip` body (the reader's
    *               `http_gunzip` option; identity/unknown codings pass
    *               the bytes through untouched either way)
    * @param collectHeaders also return the full header list (skipped by
    *               default — it allocates per record, and only the
    *               `http_headers` column needs it) */
  def parse(payload: Array[Byte], gunzip: Boolean,
            collectHeaders: Boolean = false): Parsed = {
    if (payload == null) return Malformed
    val sep = indexOfCrlfCrlf(payload)
    if (sep < 0) return Malformed
    // the head is ASCII-compatible by spec; ISO-8859-1 decodes any byte
    // (a UTF-8 decode could replace stray bytes and corrupt offsets)
    val head = new String(payload, 0, sep, "ISO-8859-1")
    val lines = head.split("\r\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return Malformed
    val sp1 = lines(0).indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > lines(0).length) return Malformed
    val statusStr = lines(0).substring(sp1 + 1, sp1 + 4)
    // RFC 9112: exactly 3DIGIT, then SP + reason (or end of line) — a
    // longer token like '2001' must not truncate-parse as a real 200
    if (!statusStr.forall(_.isDigit)) return Malformed
    if (sp1 + 4 < lines(0).length && lines(0).charAt(sp1 + 4) != ' ')
      return Malformed
    val status = statusStr.toInt

    var contentType: String = null
    var chunked = false
    var gzipped = false
    // arrival-ordered, lowercased names; repeats combine with ", "
    val collected =
      if (collectHeaders) new java.util.LinkedHashMap[String, String]() else null
    var i = 1
    while (i < lines.length) {
      var line = lines(i)
      // obsolete header folding: SP/HTAB-led lines extend the previous
      while (i + 1 < lines.length && lines(i + 1).nonEmpty &&
        (lines(i + 1).charAt(0) == ' ' || lines(i + 1).charAt(0) == '\t')) {
        line = line + " " + lines(i + 1).trim
        i += 1
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val name = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        if (collected != null)
          collected.merge(name, value, (a: String, b: String) => a + ", " + b)
        name match {
          case "content-type" => contentType = value
          // per RFC 9112 chunked must be the FINAL coding; matching the
          // last token keeps e.g. "gzip, chunked" correct
          case "transfer-encoding" =>
            chunked = value.toLowerCase.split(',').lastOption
              .exists(_.trim == "chunked")
          case "content-encoding" =>
            gzipped = value.toLowerCase.split(',').lastOption
              .exists(v => v.trim == "gzip" || v.trim == "x-gzip")
          case _ => ()
        }
      }
      i += 1
    }

    val rawBody =
      try {
        val afterHead = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
        if (chunked) decodeChunked(afterHead) else afterHead
      } catch { case _: Exception => return Malformed }
    val body =
      if (gzipped && gunzip)
        try gunzipAll(rawBody) catch { case _: Exception => return Malformed }
      else rawBody
    val headers =
      if (collected == null) null
      else {
        import scala.jdk.CollectionConverters._
        collected.entrySet().asScala.map(e => (e.getKey, e.getValue)).toSeq
      }
    Parsed(ok = true, status, contentType, body, headers)
  }

  /** Chunked transfer coding: `hexsize[;ext] CRLF data CRLF`, terminated
    * by a zero-size chunk; the trailer section (if any) is consumed and
    * discarded. Bad framing throws — callers map that to Malformed. */
  private def decodeChunked(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos + 1 < b.length && !(b(pos) == '\r' && b(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= b.length)
        throw new java.io.IOException("chunk line without CRLF")
      val s = new String(b, start, pos - start, "ISO-8859-1")
      pos += 2
      s
    }
    var done = false
    while (!done) {
      val sizeLine = readLine()
      val semi = sizeLine.indexOf(';') // chunk extensions: ignored
      val hexStr = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      if (hexStr.isEmpty || !hexStr.forall(c => Character.digit(c, 16) >= 0))
        throw new java.io.IOException(s"bad chunk size '$hexStr'")
      val size = java.lang.Long.parseLong(hexStr, 16)
      if (size < 0 || size > Int.MaxValue - 16 || pos + size > b.length)
        throw new java.io.IOException(s"chunk size $size overruns payload")
      if (size == 0) {
        // trailer section: header lines until an empty line (or clean end)
        var trailing = true
        while (trailing && pos < b.length) {
          if (readLine().isEmpty) trailing = false
        }
        done = true
      } else {
        out.write(b, pos, size.toInt)
        pos += size.toInt
        if (pos + 2 > b.length || b(pos) != '\r' || b(pos + 1) != '\n')
          throw new java.io.IOException("chunk data without trailing CRLF")
        pos += 2
      }
    }
    out.toByteArray
  }

  /** Multi-member gzip decode (java.util.zip reads concatenated members
    * transparently, same as the .warc.gz file layer). */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b), 1 << 14)
    val out = new java.io.ByteArrayOutputStream(math.max(b.length * 3, 64))
    val buf = new Array[Byte](1 << 14)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }
}
