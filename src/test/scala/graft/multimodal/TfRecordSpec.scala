package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Degradation grid for the TFRecord framing + protobuf wire walk. */
class TfRecordSpec extends AnyFunSuite {
  import TfRecord._

  private val recs = (0 until 5).map(j =>
    Avro.Record(1000L + j, s"rec_$j", j * 7L))

  test("round trip: framing CRCs verify, proto fields decode exactly") {
    val file = synth(recs)
    val (payloads, torn) = walk(file)
    assert(!torn && payloads.size === 5)
    assert(payloads.flatMap(decodeRecord) === recs)
  }

  test("masked CRC32C matches the published TFRecord test vector shape") {
    // mask(crc32c(x)) must differ from crc32c(x) and invert: the mask
    // is (crc >>> 15 | crc << 17) + 0xa282ead8 — pin one fixed value
    // so a refactor can't silently change the mask constant.
    val b = "hello world".getBytes("UTF-8")
    val c = new java.util.zip.CRC32C(); c.update(b, 0, b.length)
    val crc = c.getValue.toInt
    assert(maskedCrc(b, 0, b.length) ===
      ((crc >>> 15) | (crc << 17)) + 0xa282ead8)
  }

  test("tears and CRC corruption keep complete records only") {
    val file = synth(recs)
    // tail tears: any cut keeps a prefix of whole records
    for (back <- Seq(1, 5, 12, 30)) {
      val (p, torn) = walk(file.take(file.length - back))
      assert(torn, s"back=$back")
      assert(p.size < 5)
      assert(p.flatMap(decodeRecord) === recs.take(p.size))
    }
    // corrupt the final data CRC → exactly the last record drops
    val bad = file.clone()
    bad(file.length - 1) = (bad(file.length - 1) ^ 1).toByte
    val (p1, t1) = walk(bad)
    assert(t1 && p1.size === 4)
    // corrupt a LENGTH crc early → nothing survives past it
    val bad2 = file.clone()
    bad2(9) = (bad2(9) ^ 0x40).toByte
    val (p2, t2) = walk(bad2)
    assert(t2 && p2.isEmpty)
    assert(walk(Array.emptyByteArray) === ((Seq(), false)))
    assert(walk("short".getBytes)._2)
  }

  test("protoFields: wire types, unknown fields skipped, groups degrade") {
    val out = new java.io.ByteArrayOutputStream()
    def vi(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    vi((1L << 3) | 0); vi(300L)            // field 1 varint
    vi((9L << 3) | 1); (1 to 8).foreach(_ => out.write(0)) // I64 skip
    vi((2L << 3) | 2); vi(2L); out.write('h'); out.write('i') // LEN
    vi((7L << 3) | 5); (1 to 4).foreach(_ => out.write(0)) // I32 skip
    val fs = protoFields(out.toByteArray).get
    assert(fs.map(f => (f.fieldNo, f.wireType)) ===
      Seq((1, 0), (9, 1), (2, 2), (7, 5)))
    assert(fs.head.varint === 300L)
    assert(new String(fs(2).bytes, "UTF-8") === "hi")
    // deprecated group wire type degrades the whole walk
    val g = new java.io.ByteArrayOutputStream()
    g.write(((1 << 3) | 3))
    assert(protoFields(g.toByteArray).isEmpty)
    // LEN overrunning the buffer degrades
    val o = new java.io.ByteArrayOutputStream()
    o.write((2 << 3) | 2); o.write(60); o.write('x')
    assert(protoFields(o.toByteArray).isEmpty)
    // a mistyped required field fails decodeRecord, not the wire walk
    val m = new java.io.ByteArrayOutputStream()
    m.write((1 << 3) | 2); m.write(1); m.write('z')
    assert(protoFields(m.toByteArray).isDefined)
    assert(decodeRecord(m.toByteArray).isEmpty)
  }
}
