package graft.multimodal

/** Avro Object Container File walk (the Avro 1.11 spec's OCF layout) —
  * the remaining mainstream data-interchange container next to the
  * WARC/tar/zip walks: magic `Obj\x01`, a metadata map carrying the
  * writer schema JSON and codec, a 16-byte sync marker, then blocks of
  * (record count, byte size, payload, sync) until EOF. Longs ride the
  * zigzag varint binary encoding (7-bit little-endian groups, high-bit
  * continuation, (n<<1)^(n>>63) mapping), strings are length-prefixed
  * UTF-8 — decoded here with the same pure byte arithmetic as the rest
  * of the binary family.
  *
  * Codec support mirrors the WARC walk: `null` (raw) and `deflate`
  * (RAW RFC 1951 streams per the Avro spec, inflated through the same
  * pure-JDK `Inflater` path as [[Warc.gzipMembers]], with the same
  * inflation budget). An unknown codec keeps the parsed header and
  * degrades the block walk (records = 0, truncated = true) — honest,
  * never a guess.
  *
  * The record decoder is schema-fixed to the synth writer's
  * {id: long, name: string, score: long} record — this is a container
  * WALK demonstrating the wire format, not a general Avro runtime; the
  * schema JSON is surfaced so a caller can gate on it ([[walk]] checks
  * it names the three expected fields in order).
  *
  * Degradation discipline (the [[Warc]] rule): a torn tail, a sync
  * mismatch, a payload that over- or under-runs its declared record
  * count, or a varint running past the buffer keeps every record from
  * COMPLETE blocks and reports truncated = true — never a throw, never
  * a half record.
  *
  * Scale: per-value byte walk inside a partition map — zero shuffle. */
object Avro {

  final case class Record(id: Long, name: String, score: Long)

  final case class Result(schemaJson: String, codec: String,
                          schemaOk: Boolean, records: Seq[Record],
                          truncated: Boolean)

  /** The synth writer's schema — fields (id long, name string,
    * score long), also what [[walk]]'s schemaOk verifies. */
  val SchemaJson: String =
    """{"type":"record","name":"graft_rec","fields":[""" +
      """{"name":"id","type":"long"},""" +
      """{"name":"name","type":"string"},""" +
      """{"name":"score","type":"long"}]}"""

  /** Deterministic sync marker (16 bytes, md5 of a fixed seed — no RNG,
    * the synth-fixture rule). */
  def syncMarker(seed: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(("graft-avro-sync:" + seed).getBytes("UTF-8"))

  def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  private def writeVarint(out: java.io.ByteArrayOutputStream,
                          v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeLong(out: java.io.ByteArrayOutputStream,
                        n: Long): Unit = writeVarint(out, zigzag(n))

  private def writeString(out: java.io.ByteArrayOutputStream,
                          s: String): Unit = {
    val b = s.getBytes("UTF-8")
    writeLong(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  /** (value, next offset); next = -1 on a varint running past the
    * buffer or past 10 groups (a long never needs more). */
  private def readVarint(bytes: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = off
    while (p < bytes.length && shift <= 63) {
      val b = bytes(p) & 0xff
      v |= (b & 0x7fL) << shift
      p += 1
      if ((b & 0x80) == 0) return (v, p)
      shift += 7
    }
    (0L, -1)
  }

  private def readLong(bytes: Array[Byte], off: Int): (Long, Int) = {
    val (u, p) = readVarint(bytes, off)
    if (p < 0) (0L, -1) else (unzigzag(u), p)
  }

  private def readString(bytes: Array[Byte], off: Int): (String, Int) = {
    val (len, p) = readLong(bytes, off)
    if (p < 0 || len < 0 || len > Int.MaxValue - 8 ||
      p + len > bytes.length) ("", -1)
    else (new String(bytes, p, len.toInt, "UTF-8"), p + len.toInt)
  }

  /** One OCF with the fixed schema: `records` split into blocks of
    * `blockRecords`, `codec` ∈ {"null", "deflate"} (anything else is
    * written verbatim into the header with null-codec payloads — the
    * unknown-codec degradation fixture). */
  def synth(records: Seq[Record], blockRecords: Int, codec: String,
            syncSeed: String): Array[Byte] = {
    require(blockRecords >= 1, "blockRecords must be >= 1")
    val out = new java.io.ByteArrayOutputStream()
    val sync = syncMarker(syncSeed)
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    // metadata map: one block of 2 entries, then the 0 terminator
    writeLong(out, 2L)
    writeString(out, "avro.schema")
    writeString(out, SchemaJson)
    writeString(out, "avro.codec")
    writeString(out, codec)
    writeLong(out, 0L)
    out.write(sync, 0, sync.length)
    records.grouped(blockRecords).foreach { blk =>
      val body = new java.io.ByteArrayOutputStream()
      blk.foreach { r =>
        writeLong(body, r.id)
        writeString(body, r.name)
        writeLong(body, r.score)
      }
      val raw = body.toByteArray
      val payload = if (codec == "deflate") {
        val d = Warc.deflaterPool.get()
        try {
          d.reset()
          d.setInput(raw); d.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 << 10)
          while (!d.finished()) o.write(buf, 0, d.deflate(buf))
          o.toByteArray
        } finally d.reset()
      } else raw
      writeLong(out, blk.length.toLong)
      writeLong(out, payload.length.toLong)
      out.write(payload, 0, payload.length)
      out.write(sync, 0, sync.length)
    }
    out.toByteArray
  }

  /** Walk one OCF; see the degradation discipline above. */
  def walk(bytes: Array[Byte], maxRecords: Int = 1000000): Result = {
    def torn(schema: String, codec: String, ok: Boolean,
             recs: Seq[Record]) = Result(schema, codec, ok, recs, true)
    if (bytes.length < 4 || bytes(0) != 'O' || bytes(1) != 'b' ||
      bytes(2) != 'j' || bytes(3) != 1)
      return torn("", "", false, Seq.empty)
    var p = 4
    var schema = ""
    var codec = "null"
    // metadata map: count-prefixed blocks until the 0 count
    var mapDone = false
    while (!mapDone) {
      val (cnt, p1) = readLong(bytes, p)
      if (p1 < 0 || cnt < 0) return torn(schema, codec, false, Seq.empty)
      p = p1
      if (cnt == 0L) mapDone = true
      else {
        var i = 0L
        while (i < cnt) {
          val (k, p2) = readString(bytes, p)
          if (p2 < 0) return torn(schema, codec, false, Seq.empty)
          val (v, p3) = readString(bytes, p2)
          if (p3 < 0) return torn(schema, codec, false, Seq.empty)
          p = p3
          if (k == "avro.schema") schema = v
          if (k == "avro.codec") codec = v
          i += 1
        }
      }
    }
    val schemaOk = schema.contains("\"name\":\"id\"") &&
      schema.contains("\"name\":\"name\"") &&
      schema.contains("\"name\":\"score\"")
    if (p + 16 > bytes.length) return torn(schema, codec, schemaOk, Seq.empty)
    val sync = java.util.Arrays.copyOfRange(bytes, p, p + 16)
    p += 16
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    if (codec != "null" && codec != "deflate")
      return torn(schema, codec, schemaOk, Seq.empty)
    while (p < bytes.length && out.size < maxRecords) {
      val (cnt, p1) = readLong(bytes, p)
      if (p1 < 0 || cnt < 0 || cnt > maxRecords)
        return torn(schema, codec, schemaOk, out.toSeq)
      val (sz, p2) = readLong(bytes, p1)
      if (p2 < 0 || sz < 0 || sz > Int.MaxValue - 8 ||
        p2 + sz + 16 > bytes.length)
        return torn(schema, codec, schemaOk, out.toSeq)
      val payload0 = java.util.Arrays.copyOfRange(bytes, p2, p2 + sz.toInt)
      val payload = if (codec == "deflate") {
        val inf = Warc.inflaterPool.get()
        try {
          inf.reset()
          inf.setInput(payload0)
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 << 10)
          var bad = false
          while (!inf.finished() && !bad) {
            val n = try inf.inflate(buf)
              catch { case _: java.util.zip.DataFormatException =>
                bad = true; 0 }
            if (n > 0) {
              if (o.size() + n > Warc.MaxInflatedPerMember) bad = true
              else o.write(buf, 0, n)
            } else if (!inf.finished()) bad = true
          }
          if (bad) return torn(schema, codec, schemaOk, out.toSeq)
          o.toByteArray
        } finally inf.reset()
      } else payload0
      // decode exactly cnt records, consuming the payload exactly
      var q = 0
      var i = 0L
      val blockRecs = scala.collection.mutable.ArrayBuffer.empty[Record]
      while (i < cnt) {
        val (rid, q1) = readLong(payload, q)
        if (q1 < 0) return torn(schema, codec, schemaOk, out.toSeq)
        val (nm, q2) = readString(payload, q1)
        if (q2 < 0) return torn(schema, codec, schemaOk, out.toSeq)
        val (sc, q3) = readLong(payload, q2)
        if (q3 < 0) return torn(schema, codec, schemaOk, out.toSeq)
        blockRecs += Record(rid, nm, sc)
        q = q3
        i += 1
      }
      if (q != payload.length) // payload over-run: corrupt block
        return torn(schema, codec, schemaOk, out.toSeq)
      val blockSync = java.util.Arrays.copyOfRange(bytes,
        p2 + sz.toInt, p2 + sz.toInt + 16)
      if (!java.util.Arrays.equals(blockSync, sync))
        return torn(schema, codec, schemaOk, out.toSeq)
      out ++= blockRecs
      p = p2 + sz.toInt + 16
    }
    Result(schema, codec, schemaOk, out.toSeq, false)
  }
}
