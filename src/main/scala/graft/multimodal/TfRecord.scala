package graft.multimodal

/** TFRecord container walk + minimal protobuf wire-format field walk —
  * the TensorFlow-ecosystem training-data shape next to [[Avro]]'s OCF:
  *
  * TFRecord framing (the TensorFlow core format spec): each record is
  *   uint64 length (LE) · uint32 masked-crc32c(length bytes) ·
  *   data[length] · uint32 masked-crc32c(data)
  * with the leveldb/snappy CRC mask
  *   masked = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  * over CRC32C (Castagnoli — `java.util.zip.CRC32C`, pure JDK). Both
  * CRCs are VERIFIED per record; a mismatch or torn tail keeps every
  * complete record and flags truncated (the [[Warc]] discipline).
  *
  * Record payloads are protobuf messages; [[protoFields]] walks the
  * wire format (tag = field_no << 3 | wire_type): VARINT (0) and LEN
  * (2) wire types — what scalar ints/strings/nested messages actually
  * ship as — plus I64 (1) and I32 (5) skipped structurally. Groups
  * (3/4, deprecated) degrade the walk. [[decodeRecord]] reads the
  * synth writer's flat message {1: id varint, 2: name string,
  * 3: score varint} — a wire-format demonstration on the same record
  * triple as the Avro walk, not a general protobuf runtime.
  *
  * Scale: per-value byte walks inside a partition map — zero shuffle. */
object TfRecord {

  final case class Field(fieldNo: Int, wireType: Int, varint: Long,
                         bytes: Array[Byte])

  /** leveldb-masked CRC32C over `bytes[off, off+len)`. */
  def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def le64(bytes: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (bytes(off + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def le32(bytes: Array[Byte], off: Int): Int = {
    var v = 0
    var i = 0
    while (i < 4) { v |= (bytes(off + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  /** Framing walk: (payloads of CRC-clean complete records, truncated).
    * Stops at the first torn frame or CRC mismatch. */
  def walk(bytes: Array[Byte], maxRecords: Int = 1000000):
      (Seq[Array[Byte]], Boolean) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = 0
    while (p < bytes.length && out.size < maxRecords) {
      if (p + 12 > bytes.length) return (out.toSeq, true)
      val len = le64(bytes, p)
      if (len < 0 || len > Int.MaxValue - 16) return (out.toSeq, true)
      if (le32(bytes, p + 8) != maskedCrc(bytes, p, 8))
        return (out.toSeq, true)
      val dataOff = p + 12
      if (dataOff + len + 4 > bytes.length) return (out.toSeq, true)
      if (le32(bytes, dataOff + len.toInt) !=
        maskedCrc(bytes, dataOff, len.toInt)) return (out.toSeq, true)
      out += java.util.Arrays.copyOfRange(bytes, dataOff,
        dataOff + len.toInt)
      p = dataOff + len.toInt + 4
    }
    (out.toSeq, false)
  }

  /** Protobuf wire walk: fields in wire order; None on any tear,
    * malformed varint, or deprecated group wire type. VARINT fields
    * carry `varint`; LEN fields carry `bytes`; I64/I32 are skipped
    * structurally (varint = 0, bytes = null). */
  def protoFields(bytes: Array[Byte]): Option[Seq[Field]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Field]
    var p = 0
    def varint(off: Int): (Long, Int) = {
      var v = 0L; var shift = 0; var q = off
      while (q < bytes.length && shift <= 63) {
        val b = bytes(q) & 0xff
        v |= (b & 0x7fL) << shift
        q += 1
        if ((b & 0x80) == 0) return (v, q)
        shift += 7
      }
      (0L, -1)
    }
    while (p < bytes.length) {
      val (tag, p1) = varint(p)
      if (p1 < 0) return None
      val fieldNo = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (fieldNo <= 0) return None
      wire match {
        case 0 =>
          val (v, p2) = varint(p1)
          if (p2 < 0) return None
          out += Field(fieldNo, 0, v, null)
          p = p2
        case 2 =>
          val (len, p2) = varint(p1)
          if (p2 < 0 || len < 0 || len > Int.MaxValue - 8 ||
            p2 + len > bytes.length) return None
          out += Field(fieldNo, 2, 0L,
            java.util.Arrays.copyOfRange(bytes, p2, p2 + len.toInt))
          p = p2 + len.toInt
        case 1 =>
          if (p1 + 8 > bytes.length) return None
          out += Field(fieldNo, 1, 0L, null)
          p = p1 + 8
        case 5 =>
          if (p1 + 4 > bytes.length) return None
          out += Field(fieldNo, 5, 0L, null)
          p = p1 + 4
        case _ => return None // groups (3/4) or reserved
      }
    }
    Some(out.toSeq)
  }

  /** The synth writer's flat message: {1: id varint, 2: name string,
    * 3: score varint}; None when the wire walk tears or a field is
    * missing/mistyped. */
  def decodeRecord(payload: Array[Byte]): Option[Avro.Record] =
    protoFields(payload).flatMap { fs =>
      val id = fs.find(f => f.fieldNo == 1 && f.wireType == 0)
      val nm = fs.find(f => f.fieldNo == 2 && f.wireType == 2)
      val sc = fs.find(f => f.fieldNo == 3 && f.wireType == 0)
      (id, nm, sc) match {
        case (Some(i), Some(n), Some(s)) =>
          Some(Avro.Record(i.varint, new String(n.bytes, "UTF-8"),
            s.varint))
        case _ => None
      }
    }

  private def writeVarint(out: java.io.ByteArrayOutputStream,
                          v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  /** One flat proto message for `r` (nonnegative ids/scores — plain
    * varints, not zigzag: proto int64 semantics). */
  def synthProto(r: Avro.Record): Array[Byte] = {
    require(r.id >= 0 && r.score >= 0,
      "synthProto writes plain varints — nonnegative fields only")
    val out = new java.io.ByteArrayOutputStream()
    writeVarint(out, (1L << 3) | 0); writeVarint(out, r.id)
    val nb = r.name.getBytes("UTF-8")
    writeVarint(out, (2L << 3) | 2); writeVarint(out, nb.length.toLong)
    out.write(nb, 0, nb.length)
    writeVarint(out, (3L << 3) | 0); writeVarint(out, r.score)
    out.toByteArray
  }

  /** One TFRecord file of the records' proto messages. */
  def synth(records: Seq[Avro.Record]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val data = synthProto(r)
      val head = new Array[Byte](8)
      var i = 0
      var v = data.length.toLong
      while (i < 8) { head(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
      out.write(head, 0, 8)
      def le32w(x: Int): Unit = {
        out.write(x & 0xff); out.write((x >> 8) & 0xff)
        out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
      }
      le32w(maskedCrc(head, 0, 8))
      out.write(data, 0, data.length)
      le32w(maskedCrc(data, 0, data.length))
    }
    out.toByteArray
  }
}
