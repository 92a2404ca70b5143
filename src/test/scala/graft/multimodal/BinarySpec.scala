package graft.multimodal

import graft.SparkSpec

class BinarySpec extends SparkSpec {
  import spark.implicits._
  import Binary._

  private def media = Seq(
    MediaRecord(1L, "image", Array.fill[Byte](1000)(7), "cam0"),
    MediaRecord(2L, "video", Array.fill[Byte](4096)(3), "cam1"),
    MediaRecord(3L, "audio", Array.fill[Byte](128)(1), "mic0")).toDS()

  test("extractMeta is deterministic and schema-typed") {
    val a = extractMeta(media).collect().sortBy(_.media_id)
    val b = extractMeta(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.width > 0 && m.height > 0 && m.size_bytes > 0))
    assert(a.find(_.media_id == 2L).get.n_frames > 1)  // video fans out
    assert(a.find(_.media_id == 1L).get.n_frames == 1) // image is single-frame
  }

  test("sampleFrames fans out only video, every step-th chunk") {
    val frames = sampleFrames(media, step = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_id == 2L))
    assert(frames.map(_.frame_no).forall(_ % 2 == 0))
    assert(frames.length == 8) // 4096/256 = 16 chunks, every 2nd
  }

  test("resizeBatched processes in bounded batches and caps payload size") {
    val out = resizeBatched(media, maxBytes = 512, batchSize = 2).collect()
    assert(out.length === 3)
    assert(out.forall(_.bytes.length <= 512))
    assert(out.find(_.media_id == 3L).get.bytes.length === 128) // under cap: intact
  }

  test("withMeta joins metadata back without byte payloads") {
    val df = withMeta(media)
    assert(df.count() == 3)
    assert(!df.columns.contains("bytes"))
    assert(df.columns.toSet.contains("digest"))
  }

  // --- real header-level image decode ---

  /** Minimal PNG prefix: signature + IHDR length/type + big-endian dims. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array[Int](0, 0, 0, 13, 'I', 'H', 'D', 'R')
    def be(v: Int) = Array[Int](v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    (sig ++ ihdr ++ be(w) ++ be(h) ++ Array(8, 2, 0, 0, 0)).map(_.toByte)
  }

  /** Minimal BMP prefix: "BM" file header + BITMAPINFOHEADER dims
    * (little-endian; negative height = top-down row order). */
  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    def le(v: Int) = Array[Int](v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)
    (Array[Int]('B', 'M') ++ le(122) ++ le(0) ++ le(54) ++
      le(40) ++ le(w) ++ le(h) ++ Array(1, 0, 24, 0)).map(_.toByte)
  }

  test("decode reads real dimensions from PNG and BMP headers") {
    val imgs = Seq(
      MediaRecord(10L, "image", pngBytes(640, 480), "s"),
      MediaRecord(11L, "image", bmpBytes(1920, 1080), "s"),
      MediaRecord(12L, "image", bmpBytes(32, -64), "s"), // top-down BMP
      MediaRecord(13L, "image", "BM is a text prefix, not a bitmap".getBytes("UTF-8"), "s")).toDS()
    val out = extractMeta(imgs).collect().map(m => m.media_id -> m).toMap
    assert((out(10L).width, out(10L).height) === (640, 480))
    assert((out(11L).width, out(11L).height) === (1920, 1080))
    assert((out(12L).width, out(12L).height) === (32, 64))
    // unrecognized container → digest fallback (bounded nibble dims)
    assert(out(13L).width <= 256 && out(13L).height <= 256)
    assert(out.values.forall(_.n_frames == 1))
  }

  test("non-image modalities never header-parse (digest fallback even for container bytes)") {
    val vids = Seq(MediaRecord(20L, "video", pngBytes(640, 480), "s")).toDS()
    val m = extractMeta(vids).collect().head
    assert(m.n_frames >= 2)            // video frame count from digest
    assert(m.width <= 256)             // not the PNG's 640
  }

  // --- JPEG: marker-segment walk to the first SOF frame header ---

  /** One JPEG marker segment: FF <marker> <len:be16> <payload> (len
    * counts itself). */
  private def seg(marker: Int, payload: Array[Int]): Array[Int] = {
    val len = payload.length + 2
    Array(0xff, marker, len >>> 8, len & 0xff) ++ payload
  }

  /** SOFn payload: precision, height:be16, width:be16, 3 components. */
  private def sofPayload(w: Int, h: Int): Array[Int] =
    Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)

  private def jpegBytes(w: Int, h: Int, sofMarker: Int,
                        extraApp1: Boolean = false): Array[Byte] = {
    val soi = Array(0xff, 0xd8)
    val app0 = seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // EXIF files lead with an APP1 segment — just another length-skip.
    val app1 = if (extraApp1)
      seg(0xe1, Array('E', 'x', 'i', 'f', 0, 0) ++ Array.fill(40)(0x42))
    else Array.empty[Int]
    val dqt = seg(0xdb, Array(0) ++ Array.fill(64)(16))
    val dht = seg(0xc4, Array.fill(19)(1)) // DHT: a C-range marker that is NOT a SOF
    val sof = seg(sofMarker, sofPayload(w, h))
    val sos = seg(0xda, Array(3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0))
    (soi ++ app0 ++ app1 ++ dqt ++ dht ++ sof ++ sos ++
      Array(0x12, 0x34) ++ Array(0xff, 0xd9)).map(_.toByte)
  }

  test("decode reads real dimensions from JPEG SOF headers") {
    val imgs = Seq(
      MediaRecord(30L, "image", jpegBytes(800, 600, sofMarker = 0xc0), "s"),
      MediaRecord(31L, "image", jpegBytes(1024, 768, sofMarker = 0xc2), "s"),
      MediaRecord(32L, "image", jpegBytes(320, 240, sofMarker = 0xc0,
        extraApp1 = true), "s"),
      // SOI then garbage: marker desync → digest fallback, no throw
      MediaRecord(33L, "image",
        Array[Int](0xff, 0xd8, 0x00, 0x13, 0x37).map(_.toByte), "s"),
      // truncated mid-segment: walk runs off the end → fallback
      MediaRecord(34L, "image",
        jpegBytes(800, 600, sofMarker = 0xc0).take(8), "s")).toDS()
    val out = extractMeta(imgs).collect().map(m => m.media_id -> m).toMap
    assert((out(30L).width, out(30L).height) === (800, 600))   // baseline
    assert((out(31L).width, out(31L).height) === (1024, 768))  // progressive
    assert((out(32L).width, out(32L).height) === (320, 240))   // EXIF-prefixed
    assert(out(33L).width <= 256 && out(33L).height <= 256)
    assert(out(34L).width <= 256 && out(34L).height <= 256)
    assert(out.values.forall(_.n_frames == 1))
  }
}
