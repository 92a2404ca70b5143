package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside, processed batch-at-a-time per
  * partition (the JVM analog of `mapInPandas`-style batched UDFs).
  *
  * The Spark-side contract — schema, encoders, partition-wise batching,
  * deterministic outputs — is real and tested. IMAGE dimensions are a REAL
  * header-level decode: BMP, PNG and JPEG dimensions are read straight
  * from the container header, pure JDK, no codec dependency
  * ([[imageHeaderDims]]).
  * Payloads that aren't a recognized container — and the audio/video
  * modalities, whose codecs aren't available in this environment — fall
  * back to deterministic digest-derived pseudo-metadata ([[digestMeta]]),
  * keeping the whole typed path oracle-checkable. A full pixel/sample
  * decoder swaps into [[decode]]/[[fakeFrames]]; every plan around it is
  * unchanged.
  */
object Binary {

  final case class MediaRecord(media_id: Long, modality: String,
                               bytes: Array[Byte], source: String)
  final case class MediaMeta(media_id: Long, modality: String,
                             size_bytes: Long, width: Int, height: Int,
                             n_frames: Int, digest: String)
  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Header-level image dimensions, pure JDK — the three containers whose
    * headers are self-describing without a pixel codec:
    *  - PNG: 8-byte signature, then the IHDR chunk (always first, by spec);
    *    big-endian int32 width/height at byte offsets 16/20.
    *  - BMP: "BM" file header (14 bytes) + DIB header. BITMAPINFOHEADER
    *    and successors (size ≥ 40) carry little-endian int32 width at 18,
    *    height at 22 (negative height = top-down row order → abs); the
    *    legacy BITMAPCOREHEADER (size 12) carries uint16 dims at 18/20.
    *  - JPEG: SOI then a marker-segment walk to the first SOF frame
    *    header ([[jpegDims]]) — baseline (SOF0), progressive (SOF2) and
    *    the other SOFn variants, with metadata segments (JFIF APP0, EXIF
    *    APP1, comments, quant/Huffman tables) skipped by their declared
    *    lengths.
    * Returns None when the payload is none of these (caller falls back). */
  private[multimodal] def imageHeaderDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val isPng = bytes.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
      u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'
    // Real DIB header sizes only (CORE/INFO/V2/V3/V4/V5) — "BM"-prefixed
    // TEXT payloads can't false-positive: a valid size's upper bytes are
    // NUL, which printable text never contains.
    val dibSizes = Set(12, 40, 52, 56, 108, 124)
    if (isPng) Some((be32(16), be32(20)))
    else if (bytes.length >= 22 && u8(0) == 'B' && u8(1) == 'M') {
      val dibSize = if (bytes.length >= 18) le32(14) else 0
      if (dibSize == 12) Some((le16(18), le16(20)))
      else if (dibSizes.contains(dibSize) && bytes.length >= 26)
        Some((le32(18), math.abs(le32(22))))
      else None
    } else jpegDims(bytes)
  }

  /** JPEG frame dimensions via the marker-segment walk (ISO/IEC 10918-1
    * Annex B): after SOI (FFD8), each segment is FF <marker> <len:be16>
    * <payload>, where len counts itself. The FIRST SOF marker — C0..CF
    * minus C4 (DHT), C8 (JPG extension), CC (DAC) — carries the frame
    * header: precision(1), height(be16), width(be16). That one rule
    * covers baseline (C0), progressive (C2) and the rare SOFn variants,
    * and EXIF files need no special case: APP1 is just another
    * length-skipped segment. The walk stops (→ None, digest fallback) on
    * desync, SOS/EOI before any SOF, or a truncated header — a malformed
    * payload degrades, never throws. */
  private[multimodal] def jpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 1 < bytes.length) {
      if (u8(i) != 0xff) return None // marker desync
      var j = i + 1 // skip FF fill bytes before the marker id
      while (j + 1 < bytes.length && u8(j) == 0xff) j += 1
      val m = u8(j)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i = j + 1 // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI / entropy data: no SOF seen
      else {
        if (j + 3 >= bytes.length) return None
        val len = be16(j + 1)
        if (len < 2) return None
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (j + 8 > bytes.length) return None // truncated frame header
          return Some((be16(j + 6), be16(j + 4))) // (width, height)
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** Digest-derived pseudo-metadata — the deterministic fallback for
    * unrecognized payloads and for modalities whose codecs aren't present:
    * width/height/frames come from md5 hex nibbles, so any engine can
    * recompute them (the q35 oracle does, in SQL). */
  private[multimodal] def digestMeta(r: MediaRecord, hex: String): MediaMeta = {
    def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
    MediaMeta(r.media_id, r.modality, r.bytes.length.toLong,
      width = nib(0) * 16 + nib(1) + 1, height = nib(2) * 16 + nib(3) + 1,
      n_frames = if (r.modality == "video") nib(4) + 2 else 1,
      digest = hex)
  }

  /** Decode one record: real BMP/PNG header parse for images, digest
    * fallback otherwise. A full codec call belongs here (per partition, so
    * any native library handle is initialized once per task, not per
    * row). */
  private[multimodal] def decode(r: MediaRecord): MediaMeta = {
    val hex = java.security.MessageDigest.getInstance("MD5").digest(r.bytes)
      .map("%02x".format(_)).mkString
    val headerDims =
      if (r.modality == "image") imageHeaderDims(r.bytes) else None
    headerDims match {
      case Some((w, h)) =>
        MediaMeta(r.media_id, r.modality, r.bytes.length.toLong,
          width = w, height = h, n_frames = 1, digest = hex)
      case None => digestMeta(r, hex)
    }
  }

  /** Feature-extraction pass: one partition-wise sweep, codec init per
    * partition, no shuffle. */
  def extractMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of codec state happens here
      it.map(decode)
    }
  }

  /** STUB frame sampler: every `step`-th fixed-size chunk of the payload
    * stands in for decoded frames. */
  private[multimodal] def fakeFrames(r: MediaRecord, step: Int): Iterator[Frame] =
    r.bytes.grouped(256).zipWithIndex.collect {
      case (chunk, i) if i % step == 0 => Frame(r.media_id, i, chunk)
    }

  /** Frame sampling fan-out (video → frames): flatMap keeps it narrow; the
    * fan-out ratio is bounded by `step`. */
  def sampleFrames(media: Dataset[MediaRecord], step: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").mapPartitions(_.flatMap(fakeFrames(_, step)))
  }

  /** STUB resize — truncation stands in for a pixel-space resize; the
    * output re-enters the pipeline as a first-class binary payload. */
  private[multimodal] def fakeResize(r: MediaRecord, maxBytes: Int): MediaRecord =
    r.copy(bytes = r.bytes.take(maxBytes))

  /** Batched media transform — the `mapInPandas` batch shape on the JVM:
    * rows are processed `batchSize` at a time inside each partition, so a
    * vectorized/native codec can amortize per-call overhead across the
    * batch (exactly how Arrow-batched Python UDFs consume record
    * batches). No shuffle; batch size bounds peak decode memory. */
  def resizeBatched(media: Dataset[MediaRecord], maxBytes: Int,
                    batchSize: Int = 64): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap { batch =>
      // a real impl hands `batch` to the codec as one vectorized call
      batch.map(fakeResize(_, maxBytes))
    })
  }

  /** Typed metadata join-back: enrich the media table with extracted
    * metadata without materializing bytes twice (select drops the payload
    * before the shuffle). */
  def withMeta(media: Dataset[MediaRecord]): DataFrame = {
    val meta = extractMeta(media).toDF()
    media.toDF().select("media_id", "modality", "source")
      .join(meta.drop("modality"), Seq("media_id"))
  }
}
