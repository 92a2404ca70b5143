package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Degradation grid for the WARC container walk (no Spark session —
  * the walk is pure byte arithmetic; the q401/q402 oracle keys cover
  * the Spark plumbing). */
class WarcSpec extends AnyFunSuite {
  import Warc._

  private val html = "<html><body><p>hello warc</p></body></html>"
  private val full = synthWarcGz("https://ex.org/d/1", 1600000123L,
    html, "hello warc")

  test("round trip: three records, fields verbatim, payloads intact") {
    val (recs, torn) = walkGz(full)
    assert(!torn && recs.size == 3)
    assert(recs.map(_.warcType) == Seq("warcinfo", "response", "conversion"))
    val resp = recs(1)
    assert(resp.targetUri == "https://ex.org/d/1")
    assert(dateEpochSec(resp.date) == 1600000123L)
    assert(resp.contentType == "application/http; msgtype=response")
    assert(resp.contentLength == resp.payload.length.toLong)
    val Some((code, mime, body)) = httpResponse(resp.payload)
    assert(code == 200 && mime == "text/html; charset=utf-8")
    assert(new String(body, "UTF-8") == html)
    assert(new String(recs(2).payload, "UTF-8") == "hello warc")
    assert(recs(0).targetUri.isEmpty) // warcinfo has no Target-URI
  }

  test("raw walk parses a multi-record uncompressed stream") {
    val raw = synthRecord("resource", "https://a/1", 1L, "text/plain",
      "aa".getBytes) ++ synthRecord("resource", "https://a/2", 2L,
      "text/plain", "bb".getBytes)
    val (recs, torn) = walk(raw)
    assert(!torn && recs.size == 2)
    assert(recs.map(_.targetUri) == Seq("https://a/1", "https://a/2"))
  }

  test("header names are case-insensitive") {
    val rec = synthRecord("response", "https://x", 5L, "t/p", "zz".getBytes)
    val lowered = new String(rec, "ISO-8859-1")
      .replace("WARC-Target-URI:", "warc-target-uri:")
      .replace("Content-Length:", "CONTENT-LENGTH:")
      .getBytes("ISO-8859-1")
    val (recs, torn) = walk(lowered)
    assert(!torn && recs.size == 1 && recs.head.targetUri == "https://x")
  }

  test("tear grid: every cut keeps complete members and flags truncated") {
    val (all, _) = gzipMembers(full)
    assert(all.size == 3)
    // cut points: mid footer / mid payload of the last member
    Seq(4, 12, 40).foreach { back =>
      val (recs, torn) = walkGz(full.take(full.length - back))
      assert(torn, s"cut $back bytes should flag truncation")
      assert(recs.size < 3 && recs.size >= 1)
      // whatever survived is fully parsed, not a half record
      assert(recs.forall(r => r.contentLength == r.payload.length.toLong))
    }
    // a prefix too short for even one member: zero records, torn
    assert(walkGz(full.take(4)) == (Seq(), true))
  }

  test("malformed inputs degrade, never throw") {
    assert(walk(Array.emptyByteArray) == (Seq(), false))
    assert(walk("HTTP/1.1 200 OK\r\n\r\n".getBytes)._2) // not WARC
    assert(gzipMembers("not gzip".getBytes) == (Seq(), true))
    // bad footer CRC: flip a payload byte (CRC recompute must catch it)
    val m = gzipStored("payload".getBytes)
    m(15) = (m(15) ^ 1).toByte
    assert(gzipMembers(m)._2)
  }

  test("content-length overrun and missing separator stop the walk") {
    val rec = synthRecord("resource", "https://a", 1L, "t/p",
      "abc".getBytes)
    val grown = new String(rec, "ISO-8859-1")
      .replace("Content-Length: 3", "Content-Length: 9999")
      .getBytes("ISO-8859-1")
    assert(walk(grown) == (Seq(), true))
    val noSep = rec.dropRight(4) ++ "XXXX".getBytes
    assert(walk(noSep) == (Seq(), true))
  }

  test("multi-block stored members reassemble") {
    val payload = Array.tabulate[Byte](300)(i => (i % 97).toByte)
    val (ms, torn) = gzipMembers(gzipStored(payload, blockSize = 64))
    assert(!torn && ms.size == 1 && ms.head.toSeq == payload.toSeq)
  }

  test("httpResponse rejects non-HTTP payloads") {
    assert(httpResponse("plain text, no status line".getBytes).isEmpty)
    assert(httpResponse(Array.emptyByteArray).isEmpty)
    assert(httpResponse("HTTP/1.1\r\n\r\n".getBytes).isEmpty) // no code
  }

  test("deflated members: Huffman-coded round trip, genuinely compressed") {
    val payload = ("repetition compresses " * 200).getBytes("UTF-8")
    val m = gzipDeflated(payload)
    assert(m.length < payload.length / 2, "default deflate must compress")
    // not stored blocks: byte 10 (first deflate block header) BTYPE != 0
    assert(((m(10) >> 1) & 3) != 0)
    val (ms, torn) = gzipMembers(m)
    assert(!torn && ms.size == 1 && ms.head.toSeq == payload.toSeq)
  }

  test("mixed stored/deflated member concatenation walks in order") {
    val a = "first stored".getBytes("UTF-8")
    val b = ("second deflated " * 50).getBytes("UTF-8")
    val c = "third stored".getBytes("UTF-8")
    val stream = gzipStored(a) ++ gzipDeflated(b) ++ gzipStored(c)
    val (ms, torn) = gzipMembers(stream)
    assert(!torn && ms.size == 3)
    assert(ms.map(_.toSeq) == Seq(a.toSeq, b.toSeq, c.toSeq))
  }

  test("deflated degradation grid: torn mid-member, bad CRC, bad ISIZE") {
    val payload = ("abcdef " * 100).getBytes("UTF-8")
    val m = gzipDeflated(payload)
    // torn mid-deflate-stream: every cut inside the member degrades
    Seq(1, 8, 9, m.length - 12).foreach { keep =>
      val (ms, torn) = gzipMembers(m.take(m.length - keep))
      assert(torn && ms.isEmpty, s"cut $keep")
    }
    // bad CRC footer byte
    val badCrc = m.clone(); badCrc(m.length - 8) =
      (badCrc(m.length - 8) ^ 0x5a).toByte
    assert(gzipMembers(badCrc) == (Seq(), true))
    // bad ISIZE footer byte
    val badIsize = m.clone(); badIsize(m.length - 4) =
      (badIsize(m.length - 4) ^ 1).toByte
    assert(gzipMembers(badIsize) == (Seq(), true))
    // an intact deflated member followed by a torn one keeps the first
    val (ms2, torn2) = gzipMembers(m ++ m.take(m.length - 5))
    assert(torn2 && ms2.size == 1 && ms2.head.toSeq == payload.toSeq)
  }

  test("synthWarcGz default is Huffman-coded; stored twin still walks") {
    val defl = synthWarcGz("https://ex.org/d/2", 1L, html, "wet")
    val stor = synthWarcGz("https://ex.org/d/2", 1L, html, "wet",
      stored = true)
    assert(walkGz(defl)._1.map(_.warcType) ==
      walkGz(stor)._1.map(_.warcType))
    assert(!walkGz(defl)._2 && !walkGz(stor)._2)
  }

  test("chunked transfer-encoding reassembles byte-exactly") {
    val doc = "chunked body with ünïcödé and <tags> 0123456789"
    for (cs <- Seq(1, 3, 7, 1000)) {
      val Some((code, mime, body)) = httpResponse(synthHttpChunked(doc, cs))
      assert(code == 200 && mime == "text/html; charset=utf-8")
      assert(new String(body, "UTF-8") == doc, s"chunkSize $cs")
    }
    // case-insensitive header, list form
    val p = new String(synthHttpChunked(doc, 5), "ISO-8859-1")
      .replace("Transfer-Encoding: chunked",
        "transfer-encoding: gzip, Chunked").getBytes("ISO-8859-1")
    assert(httpResponse(p).exists(r => new String(r._3, "UTF-8") == doc))
  }

  test("chunked degradation: torn framing degrades whole, never half") {
    val doc = "0123456789abcdef" * 4
    val full = synthHttpChunked(doc, 10)
    // tears: inside trailer, at the 0-terminator, mid-chunk, mid-size-line
    Seq(5, 20, 30, full.length - 40).foreach { back =>
      assert(httpResponse(full.take(full.length - back)).isEmpty,
        s"cut $back")
    }
    // garbage size line
    val bad = new String(full, "ISO-8859-1").replaceFirst("\r\na\r\n",
      "\r\nzz\r\n").getBytes("ISO-8859-1")
    assert(httpResponse(bad).isEmpty)
  }
}
