package graft.ext

/** WARC (ISO 28500 / the public warc-specifications) record parsing —
  * THE web-crawl archive format: Common-Crawl-style corpora arrive as
  * WARC response records wrapping raw HTTP messages, and a 100 TB
  * text pipeline's first real operator is exactly this walk:
  * record → HTTP split → HTML body → text features. Implemented from
  * the spec:
  *
  *  - the `WARC/1.0` version line and CRLF-terminated named headers;
  *  - `Content-Length`-driven payload framing (bodies are BINARY and
  *    freely contain blank lines and `WARC/` look-alikes — the walk
  *    is length-driven, never delimiter-scanning);
  *  - the mandatory two CRLFs after every payload;
  *  - HTTP-response payload split (status line + headers + body) for
  *    `response` records; `warcinfo`/`request`/other records carry
  *    through with their type and no HTTP fields.
  *
  * Scale shape: partition-local blob parsing behind the
  * [[Multimodal]] seam; one row per record crosses the exchange.
  * In production the same walk runs per WARC split (the format is
  * record-concatenated gzip, each member independently inflatable —
  * the property that makes WARC splittable at all; the gzip layer
  * here is [[Multimodal.syntheticGzip]]'s seam).
  */
object Warc {

  final case class WarcRecord(warc_type: String, target_uri: String,
                              http_status: Long, content_type: String,
                              body: String)

  /** Parse a concatenated-record WARC blob. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def line(): String = {
      val nl = indexOfCrlf(bytes, pos)
      require(nl >= 0, "WARC: truncated header line")
      val s = new String(bytes, pos, nl - pos, "ISO-8859-1")
      pos = nl + 2
      s
    }
    while (pos < bytes.length) {
      val version = line()
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"WARC: unsupported version line '$version'")
      var wtype = ""
      var uri = ""
      var clen = -1L
      var h = line()
      while (h.nonEmpty) {
        val sep = h.indexOf(':')
        require(sep > 0, s"WARC: malformed header '$h'")
        val k = h.substring(0, sep).trim.toLowerCase
        val v = h.substring(sep + 1).trim
        k match {
          case "warc-type" => wtype = v
          case "warc-target-uri" => uri = v
          case "content-length" => clen = v.toLong
          case _ => ()
        }
        h = line()
      }
      require(clen >= 0, "WARC: record without Content-Length")
      require(pos + clen <= bytes.length, "WARC: truncated payload")
      val payload = new String(bytes, pos, clen.toInt, "ISO-8859-1")
      pos += clen.toInt
      require(pos + 4 <= bytes.length &&
        bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        "WARC: missing record-terminating CRLFCRLF")
      pos += 4
      if (wtype == "response") {
        val headEnd = payload.indexOf("\r\n\r\n")
        require(headEnd >= 0, "WARC: HTTP payload without header end")
        val head = payload.substring(0, headEnd)
        val body = payload.substring(headEnd + 4)
        val lines = head.split("\r\n")
        val status = lines.head.split(" ")
        require(status.length >= 2 && status(0).startsWith("HTTP/"),
          s"WARC: malformed HTTP status line '${lines.head}'")
        val ct = lines.tail.collectFirst {
          case l if l.toLowerCase.startsWith("content-type:") =>
            l.substring(l.indexOf(':') + 1).trim
        }.getOrElse("")
        out += WarcRecord(wtype, uri, status(1).toLong, ct, body)
      } else out += WarcRecord(wtype, uri, 0L, "", payload)
    }
    out.toSeq
  }

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Build one record (the encoder half, used by the gate writer). */
  def record(wtype: String, uri: String,
             payload: String): Array[Byte] = {
    val p = payload.getBytes("ISO-8859-1")
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(wtype).append("\r\n")
    if (uri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    sb.append("WARC-Record-ID: <urn:uuid:0>\r\n")
    sb.append("Content-Length: ").append(p.length).append("\r\n")
    sb.append("\r\n")
    sb.toString.getBytes("ISO-8859-1") ++ p ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  /** An HTTP response payload wrapping `body`. */
  def httpResponse(status: Int, contentType: String,
                   body: String): String =
    s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body"
}
