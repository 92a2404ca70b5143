package graft.multimodal

import java.util.Locale

/** WARC (ISO 28500 / WARC 1.1) container walk — the crawl-ingestion
  * front door: every public web corpus (CommonCrawl WARC/WET) ships as
  * concatenated gzip members, one WARC record per member, and the first
  * pipeline step is turning that byte stream into the
  * (url, fetch_ts, mime, payload) table the curation chain eats
  * (reference corpus loaders read line-delimited exports the same way,
  * dag.py:369-406; the WARC leg is the crawl-scale analog).
  *
  * Three layers, each degrading like the other binary walks
  * ([[Binary.gzipMeta]]'s RFC 1952 discipline, mp3Meta's partial
  * counts): a torn tail keeps every record fully parsed before the
  * tear and reports `truncated = true` — never a throw, never a
  * half-parsed record.
  *
  *  - [[gzipMembers]]: concatenated gzip members, full RFC 1951
  *    deflate (Huffman-coded AND stored blocks) via the pure-JDK
  *    `java.util.zip.Inflater` — the same dependency
  *    [[Binary.pngDecode]] rides — with CRC32/ISIZE verified per
  *    member and an inflation budget (zip-bomb guard) that degrades
  *    instead of OOMing.
  *  - [[walk]]: the WARC record walk — version line, named headers
  *    (case-insensitive per the spec), blank line, Content-Length-
  *    bounded payload slice, CRLF CRLF record separator.
  *  - [[httpResponse]]: the `application/http; msgtype=response`
  *    payload split (status line, headers, body) that turns a crawl
  *    `response` record into (status, mime, body), de-chunking a
  *    `Transfer-Encoding: chunked` body (RFC 9112 §7.1) byte-exactly.
  *
  * Scale: all three are per-value byte walks inside a partition map —
  * zero shuffle; the downstream table operators own distribution. */
object Warc {

  /** One parsed WARC record. `date` is the raw WARC-Date header value
    * (ISO 8601); [[dateEpochSec]] converts without a formatter. */
  final case class Record(warcType: String, targetUri: String,
                          date: String, contentType: String,
                          contentLength: Long, payload: Array[Byte])

  /** Raw (uncompressed) WARC stream walk. Returns (records, truncated):
    * a malformed version line, torn header block, payload overrunning
    * the buffer, or missing CRLF CRLF separator stops the walk and
    * keeps the records parsed so far with truncated = true. A record
    * missing Content-Length cannot be skipped over (the field IS the
    * framing), so it also stops the walk. */
  def walk(bytes: Array[Byte], maxRecords: Int = 100000):
      (Seq[Record], Boolean) = {
    val out = scala.collection.mutable.ArrayBuffer[Record]()
    var p = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (p < bytes.length && out.size < maxRecords) {
      val e0 = lineEnd(p)
      if (e0 < 0) return (out.toSeq, true)
      val ver = new String(bytes, p, e0 - p, "US-ASCII")
      if (!ver.startsWith("WARC/")) return (out.toSeq, true)
      p = e0 + 2
      var wtype = ""; var uri = ""; var date = ""; var ctype = ""
      var clen = -1L
      var headersDone = false
      while (!headersDone) {
        val e = lineEnd(p)
        if (e < 0) return (out.toSeq, true)
        if (e == p) { headersDone = true; p += 2 }
        else {
          val line = new String(bytes, p, e - p, "UTF-8")
          val ci = line.indexOf(':')
          if (ci > 0) {
            val v = line.substring(ci + 1).trim
            line.substring(0, ci).trim.toLowerCase(Locale.ROOT) match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-date" => date = v
              case "content-type" => ctype = v
              case "content-length" =>
                clen = try v.toLong
                  catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          p = e + 2
        }
      }
      if (clen < 0 || clen > Int.MaxValue - 4 ||
        p + clen + 4 > bytes.length) return (out.toSeq, true)
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + clen.toInt)
      p += clen.toInt
      if (!(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
        bytes(p + 2) == '\r' && bytes(p + 3) == '\n'))
        return (out.toSeq, true)
      p += 4
      out += Record(wtype, uri, date, ctype, clen, payload)
    }
    (out.toSeq, false)
  }

  /** Inflation budget per member — a zip-bomb guard: a member whose
    * inflated size would exceed this degrades (None → truncated), it
    * never OOMs an executor. CommonCrawl members are ~1 MB; 256 MiB is
    * far past any legitimate record. */
  val MaxInflatedPerMember: Int = 256 << 20

  /** Thread-local codec instances, `reset()` per use — a fresh
    * Deflater/Inflater is a JNI allocation, and the member walks run
    * per ROW; pooling cut the q401/q402 sweep cost measurably. Never
    * `end()` these. */
  private[multimodal] val inflaterPool =
    new ThreadLocal[java.util.zip.Inflater] {
      override def initialValue() = new java.util.zip.Inflater(true)
    }
  private[multimodal] val deflaterPool =
    new ThreadLocal[java.util.zip.Deflater] {
      // BEST_SPEED: the deflater only writes SYNTH fixtures — the level
      // changes nothing about what the decode path must handle (level-1
      // output is still genuinely Huffman-coded), it just stops the
      // fixture WRITE from dominating the container-walk sweeps.
      override def initialValue() = new java.util.zip.Deflater(
        java.util.zip.Deflater.BEST_SPEED, true)
    }

  /** One gzip member starting at `off`: (inflated payload, end offset
    * past the footer). Full RFC 1951 deflate — Huffman-coded (fixed and
    * dynamic) and stored blocks alike — via `java.util.zip.Inflater`
    * in raw (nowrap) mode, the pure-JDK path [[Binary.pngDecode]]
    * already rides. None on a malformed header, a deflate stream that
    * errors or tears before its final block, an inflated size past
    * [[MaxInflatedPerMember]], or a CRC32/ISIZE footer that contradicts
    * the recomputed values — the member walk is an integrity check, not
    * an echo (Binary.gzipMeta discipline, here keeping the payload
    * instead of just counting it). */
  private def gzipMember(bytes: Array[Byte], off: Int):
      Option[(Array[Byte], Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (off + 18 > bytes.length) return None
    if (u8(off) != 0x1f || u8(off + 1) != 0x8b || u8(off + 2) != 8)
      return None
    val flg = u8(off + 3)
    var p = off + 10
    if ((flg & 4) != 0) {
      if (p + 2 > bytes.length) return None
      p += 2 + le16(p)
    }
    if ((flg & 8) != 0) {
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) return None
      p += 1
    }
    if ((flg & 16) != 0) {
      while (p < bytes.length && bytes(p) != 0) p += 1
      if (p >= bytes.length) return None
      p += 1
    }
    if ((flg & 2) != 0) p += 2
    if (p >= bytes.length) return None
    val inf = inflaterPool.get() // raw deflate, pooled
    try {
      inf.reset()
      inf.setInput(bytes, p, bytes.length - p)
      val body = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 << 10)
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) {
          if (body.size() + n > MaxInflatedPerMember) return None
          body.write(buf, 0, n)
        } else if (!inf.finished()) {
          // needsInput with nothing left, or a dictionary demand:
          // the stream tore before its final block.
          return None
        }
      }
      val consumed = (bytes.length - p) - inf.getRemaining
      val fEnd = p + consumed
      if (fEnd + 8 > bytes.length) return None
      val payload = body.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      if (le32(fEnd) != crc.getValue ||
        le32(fEnd + 4) != (payload.length & 0xffffffffL)) return None
      Some((payload, fEnd + 8))
    } finally inf.reset()
  }

  /** Concatenated gzip members → inflated payloads in stream order;
    * a torn or malformed tail keeps the complete members with
    * truncated = true (partial-count degradation). */
  def gzipMembers(bytes: Array[Byte], maxMembers: Int = 100000):
      (Seq[Array[Byte]], Boolean) = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var p = 0
    while (p < bytes.length && out.size < maxMembers) {
      gzipMember(bytes, p) match {
        case Some((payload, end)) => out += payload; p = end
        case None => return (out.toSeq, true)
      }
    }
    (out.toSeq, false)
  }

  /** The crawl-file shape: a `.warc.gz` of concatenated members is
    * inflated member by member, the complete members' payloads
    * concatenated (a record MAY span members; CommonCrawl writes one
    * per member) and walked as one WARC stream. Truncated if either
    * layer tears. */
  def walkGz(bytes: Array[Byte], maxRecords: Int = 100000):
      (Seq[Record], Boolean) = {
    val (members, tornGz) = gzipMembers(bytes, maxRecords)
    val raw = new java.io.ByteArrayOutputStream()
    members.foreach(m => raw.write(m, 0, m.length))
    val (recs, tornWarc) = walk(raw.toByteArray, maxRecords)
    (recs, tornGz || tornWarc)
  }

  /** `application/http; msgtype=response` payload split: status code
    * from the status line, Content-Type header (verbatim value), body
    * bytes after the blank line. A `Transfer-Encoding: chunked` body
    * (RFC 9112 §7.1) is reassembled byte-exactly — hex size lines
    * (chunk extensions after `;` ignored), per-chunk CRLF, the
    * 0-terminator, trailer fields skipped up to their blank line. None
    * when the payload is not an HTTP response (a WET conversion
    * record's plain text, for example) or a chunked body tears
    * mid-chunk / mid-framing — degrade whole, never a half body. */
  def httpResponse(payload: Array[Byte]): Option[(Int, String, Array[Byte])] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < payload.length &&
        !(payload(i) == '\r' && payload(i + 1) == '\n')) i += 1
      if (i + 1 < payload.length) i else -1
    }
    val e0 = lineEnd(0)
    if (e0 < 0) return None
    val status = new String(payload, 0, e0, "US-ASCII")
    if (!status.startsWith("HTTP/")) return None
    val parts = status.split(" ")
    if (parts.length < 2) return None
    val code = try parts(1).toInt
      catch { case _: NumberFormatException => return None }
    var p = e0 + 2
    var ctype = ""
    var chunked = false
    while (true) {
      val e = lineEnd(p)
      if (e < 0) return None
      if (e == p) {
        val raw = java.util.Arrays.copyOfRange(payload, p + 2, payload.length)
        return if (!chunked) Some((code, ctype, raw))
          else dechunk(raw).map(b => (code, ctype, b))
      }
      val line = new String(payload, p, e - p, "UTF-8")
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase(Locale.ROOT)
        val v = line.substring(ci + 1).trim
        if (key == "content-type") ctype = v
        else if (key == "transfer-encoding")
          chunked = v.toLowerCase(Locale.ROOT).split(",")
            .exists(_.trim == "chunked")
      }
      p = e + 2
    }
    None // unreachable
  }

  /** RFC 9112 §7.1 chunked-body reassembly: None on any framing tear
    * (unparseable size line, chunk overrunning the buffer, missing
    * CRLC, torn trailer) — the caller degrades the whole split. */
  private def dechunk(raw: Array[Byte]): Option[Array[Byte]] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < raw.length &&
        !(raw(i) == '\r' && raw(i + 1) == '\n')) i += 1
      if (i + 1 < raw.length) i else -1
    }
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    while (true) {
      val e = lineEnd(p)
      if (e < 0) return None
      val sizeTok = new String(raw, p, e - p, "US-ASCII")
        .takeWhile(_ != ';').trim
      val size = try java.lang.Long.parseLong(sizeTok, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > Int.MaxValue) return None
      p = e + 2
      if (size == 0L) {
        // trailer section: header lines until a blank line
        var done = false
        while (!done) {
          val t = lineEnd(p)
          if (t < 0) return None
          if (t == p) done = true
          p = t + 2
        }
        return Some(out.toByteArray)
      }
      if (p + size.toInt + 2 > raw.length) return None
      out.write(raw, p, size.toInt)
      p += size.toInt
      if (!(raw(p) == '\r' && raw(p + 1) == '\n')) return None
      p += 2
    }
    None // unreachable
  }

  /** WARC-Date (ISO 8601 instant) → epoch seconds; -1 if unparseable —
    * the caller's NULL sentinel, matching the other decoders. */
  def dateEpochSec(date: String): Long =
    try java.time.Instant.parse(date).getEpochSecond
    catch { case _: RuntimeException => -1L }

  // ------------------------------------------------------------------
  // Deterministic fixtures (the q155/q373 round-trip discipline: every
  // synthesized field is caller-arithmetic, so the oracle replays
  // parse(synth(p)) == p without touching bytes).

  /** One gzip member (FLG 0, MTIME 0) wrapping `payload` in STORED
    * deflate blocks of `blockSize`, real CRC32/ISIZE footer. */
  def gzipStored(payload: Array[Byte], blockSize: Int = 0xffff): Array[Byte] = {
    require(blockSize >= 1 && blockSize <= 0xffff,
      "blockSize must be 1..65535")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8 & 0xff) }
    def le32(v: Long): Unit = { le16((v & 0xffff).toInt)
      le16((v >> 16 & 0xffff).toInt) }
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
    le32(0L); out.write(0); out.write(255)
    var off = 0
    var wrote = false
    while (off < payload.length || !wrote) {
      val len = math.min(blockSize, payload.length - off)
      val fin = off + len >= payload.length
      out.write(if (fin) 1 else 0)
      le16(len); le16(~len & 0xffff)
      out.write(payload, off, len)
      off += len
      wrote = true
    }
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    le32(crc.getValue)
    le32(payload.length.toLong)
    out.toByteArray
  }

  /** One gzip member (FLG 0, MTIME 0) wrapping `payload` in genuinely
    * Huffman-coded deflate via `java.util.zip.Deflater` (default
    * compression, raw mode), real CRC32/ISIZE footer — the shape real
    * `.warc.gz` writers emit. */
  def gzipDeflated(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write((v >> 8 & 0xff).toInt)
      out.write((v >> 16 & 0xff).toInt); out.write((v >> 24 & 0xff).toInt)
    }
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
    le32(0L); out.write(0); out.write(255)
    val def_ = deflaterPool.get()
    try {
      def_.reset()
      def_.setInput(payload)
      def_.finish()
      val buf = new Array[Byte](64 << 10)
      while (!def_.finished()) {
        val n = def_.deflate(buf)
        out.write(buf, 0, n)
      }
    } finally def_.reset()
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    le32(crc.getValue)
    le32(payload.length & 0xffffffffL)
    out.toByteArray
  }

  /** One raw WARC record with the standard named headers; `uri` empty
    * omits WARC-Target-URI (warcinfo has none). */
  def synthRecord(warcType: String, uri: String, epochSec: Long,
                  contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (uri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    sb.append("WARC-Date: ")
      .append(java.time.Instant.ofEpochSecond(epochSec).toString)
      .append("\r\n")
    sb.append("WARC-Record-ID: <urn:graft:").append(warcType).append(":")
      .append(epochSec).append(">\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(payload, 0, payload.length)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** HTTP/1.1 200 response wrapping an HTML body — the payload of a
    * crawl `response` record. */
  def synthHttpHtml(html: String): Array[Byte] = {
    val body = html.getBytes("UTF-8")
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** HTTP/1.1 200 chunked response wrapping an HTML body — the
    * Transfer-Encoding: chunked twin of [[synthHttpHtml]]: body bytes
    * split into `chunkSize`-byte chunks (lowercase hex size lines, the
    * second chunk carrying an extension to exercise the `;` strip),
    * 0-terminator, one trailer field. */
  def synthHttpChunked(html: String, chunkSize: Int): Array[Byte] = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    val body = html.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = {
      val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length)
    }
    ascii("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n")
    var off = 0
    var idx = 0
    while (off < body.length) {
      val len = math.min(chunkSize, body.length - off)
      ascii(java.lang.Long.toHexString(len.toLong) +
        (if (idx == 1) ";ext=1" else "") + "\r\n")
      out.write(body, off, len)
      ascii("\r\n")
      off += len
      idx += 1
    }
    ascii("0\r\nX-Trailer: done\r\n\r\n")
    out.toByteArray
  }

  /** The CommonCrawl member shape for one captured page: three records
    * (warcinfo, response carrying the HTML over HTTP, conversion
    * carrying the extracted plain text — the WET twin), each its own
    * gzip member, concatenated. Members are genuinely Huffman-coded
    * ([[gzipDeflated]]) by default; `stored = true` writes STORED
    * blocks instead (the degradation-grid twin). */
  def synthWarcGz(uri: String, epochSec: Long, html: String,
                  wetText: String, stored: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def add(rec: Array[Byte]): Unit = {
      val m = if (stored) gzipStored(rec) else gzipDeflated(rec)
      out.write(m, 0, m.length)
    }
    add(synthRecord("warcinfo", "", epochSec, "application/warc-fields",
      "software: graft-synth\r\n".getBytes("US-ASCII")))
    add(synthRecord("response", uri, epochSec,
      "application/http; msgtype=response", synthHttpHtml(html)))
    add(synthRecord("conversion", uri, epochSec, "text/plain",
      wetText.getBytes("UTF-8")))
    out.toByteArray
  }
}
