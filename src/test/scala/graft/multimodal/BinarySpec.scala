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

  // --- GIF: Logical Screen Descriptor dims ---

  private def gifBytes(w: Int, h: Int, v87: Boolean = false): Array[Byte] =
    (("GIF8" + (if (v87) "7" else "9") + "a").map(_.toInt).toArray ++
      Array(w & 0xff, w >>> 8, h & 0xff, h >>> 8, 0x91, 0, 0)).map(_.toByte)

  test("decode reads real dimensions from GIF logical screen descriptors") {
    val imgs = Seq(
      MediaRecord(40L, "image", gifBytes(500, 300), "s"),
      MediaRecord(41L, "image", gifBytes(77, 99, v87 = true), "s"),
      // "GIF" text prefix without the version tag → fallback, no parse
      MediaRecord(42L, "image", "GIF is a file format".getBytes("UTF-8"), "s")).toDS()
    val out = extractMeta(imgs).collect().map(m => m.media_id -> m).toMap
    assert((out(40L).width, out(40L).height) === (500, 300))
    assert((out(41L).width, out(41L).height) === (77, 99))
    assert(out(42L).width <= 256 && out(42L).height <= 256)
  }

  // --- WAV: RIFF chunk walk to fmt + data ---

  test("wavMeta round-trips every field synthWav wrote") {
    for ((rate, ch, bits, n) <- Seq((8000, 1, 8, 1000L), (16000, 2, 16, 4410L),
                                    (44100, 2, 24, 1L), (24000, 1, 16, 0L)))
      assert(wavMeta(synthWav(rate, ch, bits, n)) === Some((rate, ch, bits, n)),
        s"round-trip broke for ($rate,$ch,$bits,$n)")
  }

  test("wavMeta skips unknown chunks and survives malformed payloads") {
    val base = synthWav(22050, 2, 16, 500L)
    // splice a LIST metadata chunk (odd size → padded) between WAVE and fmt
    val listPayload = "INFOIART".map(_.toInt.toByte).toArray :+ 0x41.toByte
    val list = "LIST".map(_.toInt.toByte).toArray ++
      Array(listPayload.length, 0, 0, 0).map(_.toByte) ++ listPayload ++
      Array(0.toByte) // pad to even
    val spliced = base.take(12) ++ list ++ base.drop(12)
    assert(wavMeta(spliced) === Some((22050, 2, 16, 500L)))
    // malformed: not RIFF / not WAVE / truncated fmt / zero blockAlign
    assert(wavMeta("RIFFxxxxAIFF".getBytes("UTF-8")) === None)
    assert(wavMeta(base.take(20)) === None)
    val zeroBlock = base.clone(); zeroBlock(32) = 0; zeroBlock(33) = 0
    assert(wavMeta(zeroBlock) === None)
  }

  // --- MP4: ISO BMFF box walk to mvhd + tkhd ---

  test("mp4Meta round-trips dims and floors duration to integer ms") {
    assert(mp4Meta(synthMp4(640, 480, 1200, 600)) === Some((640, 480, 2000L)))
    assert(mp4Meta(synthMp4(1920, 1080, 1001, 600)) === Some((1920, 1080, 1668L)))
    assert(mp4Meta(synthMp4(16, 9, 0, 600)) === Some((16, 9, 0L)))
  }

  test("mp4Meta degrades on malformed containers, never throws") {
    val good = synthMp4(640, 480, 1200, 600)
    assert(mp4Meta("not an mp4 at all".getBytes("UTF-8")) === None)
    assert(mp4Meta(good.take(30)) === None) // torn moov
    val badSize = good.clone()
    badSize(0) = 0x7f // ftyp box claims an absurd size → walk rejects
    assert(mp4Meta(badSize) === None)
  }

  test("extractVideoMeta: real decode for MP4 payloads, digest fallback otherwise") {
    val rows = Seq(
      MediaRecord(60L, "video", synthMp4(1280, 720, 3000, 600), "cam0"),
      MediaRecord(61L, "video", "not a video".getBytes("UTF-8"), "cam0")).toDS()
    val out = extractVideoMeta(rows).collect().map(m => m.media_id -> m).toMap
    assert((out(60L).width, out(60L).height, out(60L).duration_ms) ===
      (1280, 720, 5000L))
    val fb = out(61L)
    assert(fb.width % 4 === 0 && fb.height % 3 === 0 && fb.duration_ms % 1000 === 0)
  }

  test("extractAudioMeta: real decode for WAV payloads, digest fallback otherwise") {
    val rows = Seq(
      MediaRecord(50L, "audio", synthWav(16000, 2, 16, 8000L), "mic0"),
      MediaRecord(51L, "audio", "not a wav".getBytes("UTF-8"), "mic0")).toDS()
    val out = extractAudioMeta(rows).collect().map(m => m.media_id -> m).toMap
    val real = out(50L)
    assert((real.sample_rate, real.channels, real.bits_per_sample,
      real.n_samples) === (16000, 2, 16, 8000L))
    assert(real.duration_ms === 500L) // 8000 samples at 16 kHz
    assert(real.size_bytes === 44L + 8000 * 4)
    val fb = out(51L)
    assert(fb.sample_rate % 8000 === 0 && fb.channels >= 1 && fb.n_samples > 0)
    // deterministic: same input, same pseudo-metadata
    assert(extractAudioMeta(rows).collect().sortBy(_.media_id).toSeq ===
      out.values.toSeq.sortBy(_.media_id))
  }

  test("flacMeta round-trips every field synthFlac wrote, incl. bit-field extremes") {
    val cases = Seq(
      (8000, 1, 8, 0L), (44100, 2, 16, 123456L), (96000, 8, 24, 7L),
      (192000, 2, 32, (1L << 36) - 1), // max 36-bit sample count
      ((1 << 20) - 1, 1, 1, 1L)) // max 20-bit rate, min widths
    for ((r, c, b, n) <- cases) {
      val parsed = Binary.flacMeta(Binary.synthFlac(r, c, b, n))
      assert(parsed === Some((r, c, b, n)), s"case ($r,$c,$b,$n)")
    }
  }

  test("flacMeta walks leading padding blocks and degrades on malformed input") {
    val good = Binary.synthFlac(22050, 2, 16, 999L)
    // splice a PADDING block (type 1, not last) between magic and STREAMINFO
    val pad = Array[Byte](0x01, 0, 0, 4, 0, 0, 0, 0)
    val spliced = good.take(4) ++ pad ++ good.drop(4)
    assert(Binary.flacMeta(spliced) === Some((22050, 2, 16, 999L)))
    assert(Binary.flacMeta("fLaX".getBytes ++ good.drop(4)) === None)
    assert(Binary.flacMeta(good.take(20)) === None) // truncated STREAMINFO
    assert(Binary.flacMeta(Array[Byte]()) === None)
    // a stream whose last block is not STREAMINFO parses to nothing
    val lastPad = good.take(4) ++ Array[Byte](0x81.toByte, 0, 0, 0)
    assert(Binary.flacMeta(lastPad) === None)
  }

  test("extractAudioMeta dispatches WAV, FLAC and OGG by magic in one sweep") {
    import spark.implicits._
    val rows = Seq(
      Binary.MediaRecord(1L, "audio", Binary.synthWav(8000, 1, 16, 100), "s"),
      Binary.MediaRecord(2L, "audio", Binary.synthFlac(48000, 2, 24, 4800L), "s"),
      Binary.MediaRecord(3L, "audio", "not audio".getBytes, "s"),
      Binary.MediaRecord(4L, "audio", Binary.synthOgg(1, 44100, 2, 4410L), "s"),
      Binary.MediaRecord(5L, "audio", Binary.synthOgg(2, 48000, 1, 960L), "s"))
      .toDS()
    val out = extractAudioMeta(rows).collect().map(m => m.media_id -> m).toMap
    assert((out(1L).sample_rate, out(1L).n_samples) === ((8000, 100L)))
    assert((out(2L).sample_rate, out(2L).channels, out(2L).bits_per_sample,
      out(2L).n_samples, out(2L).duration_ms) === ((48000, 2, 24, 4800L, 100L)))
    assert(out(3L).bits_per_sample === 16) // digest fallback shape
    assert((out(4L).sample_rate, out(4L).channels, out(4L).bits_per_sample,
      out(4L).n_samples, out(4L).duration_ms) === ((44100, 2, 0, 4410L, 100L)))
    assert((out(5L).sample_rate, out(5L).channels, out(5L).n_samples,
      out(5L).duration_ms) === ((48000, 1, 960L, 20L)))
  }

  test("oggMeta round-trips Vorbis and Opus id headers from synthOgg") {
    // Vorbis: rate from the id header, granule = sample count verbatim
    for ((r, c, n) <- Seq((44100, 2, 123456L), (8000, 1, 0L),
      (192000, 6, 1L << 40)))
      assert(Binary.oggMeta(Binary.synthOgg(1, r, c, n)) ===
        Some((1, r, c, n)), s"vorbis ($r,$c,$n)")
    // Opus: 48 kHz granule rate regardless of the informational input
    // rate; pre-skip subtracts from the last granule
    for ((r, c, n, ps) <- Seq((48000, 2, 960L, 312), (16000, 1, 0L, 0),
      (24000, 2, 98765L, 3840)))
      assert(Binary.oggMeta(Binary.synthOgg(2, r, c, n, ps)) ===
        Some((2, 48000, c, n)), s"opus ($r,$c,$n,$ps)")
  }

  test("oggMeta degrades on malformed containers, never throws") {
    val good = Binary.synthOgg(1, 44100, 2, 4410L)
    assert(Binary.oggMeta(Array[Byte]()) === None)
    assert(Binary.oggMeta("OggX".getBytes ++ good.drop(4)) === None)
    assert(Binary.oggMeta(good.take(20)) === None) // torn first page
    assert(Binary.oggMeta(good.dropRight(3)) === None) // torn last page
    assert(Binary.oggMeta(good ++ "junk".getBytes) === None) // trailing bytes
    // BOS payload that is neither codec id header
    val alien = good.clone(); alien(28) = 'x'.toByte
    assert(Binary.oggMeta(alien) === None)
    // vorbis_version != 0 is spec-invalid
    val badVer = good.clone()
    val p0 = 27 + good(26) // header 27 + nsegs(=1) lacing bytes
    badVer(p0 + 7) = 9
    assert(Binary.oggMeta(badVer) === None)
    // a granule of −1 on the data page means "no packet ends": duration
    // falls back to the last page that finished one (the BOS page, 0)
    val noEnd = Binary.synthOgg(1, 44100, 2, 4410L)
    val gOff = noEnd.length - (27 + 1 + 1) + 6 // last page granule field
    (0 until 8).foreach(k => noEnd(gOff + k) = 0xff.toByte)
    assert(Binary.oggMeta(noEnd) === Some((1, 44100, 2, 0L)))
  }
  test("zipMeta walks EOCD + central directory of a JDK-written archive") {
    assert(Binary.zipMeta(Binary.synthZip(5, 128)) === Some((5, 640L, 640L)))
    assert(Binary.zipMeta(Binary.synthZip(1, 0)) === Some((1, 0L, 0L)))
    // degradation: truncation, bogus magic, severed central directory
    val good = Binary.synthZip(3, 64)
    assert(Binary.zipMeta(Array[Byte]()) === None)
    assert(Binary.zipMeta(good.take(20)) === None)
    assert(Binary.zipMeta(good.dropRight(1)) === None) // EOCD torn
    val bad = good.clone()
    // corrupt the first CD signature: EOCD still found, CD walk fails
    val cdOff = {
      def le32(i: Int): Int = (good(i) & 0xff) | ((good(i + 1) & 0xff) << 8) |
        ((good(i + 2) & 0xff) << 16) | ((good(i + 3) & 0xff) << 24)
      le32(good.length - 22 + 16)
    }
    bad(cdOff + 2) = 9
    assert(Binary.zipMeta(bad) === None)
  }

  test("tarMeta hops ustar headers by declared size, counting regular members") {
    assert(Binary.tarMeta(Binary.synthTar(4, 300)) === Some((4, 1200L)))
    assert(Binary.tarMeta(Binary.synthTar(1, 0)) === Some((1, 0L)))
    assert(Binary.tarMeta(new Array[Byte](1024)) === Some((0, 0L))) // empty
    // EOF-terminated (GNU-tolerant): strip the terminator blocks
    val good = Binary.synthTar(2, 512)
    assert(Binary.tarMeta(good.dropRight(1024)) === Some((2, 1024L)))
    // degradation: bad magic, mid-block tear
    val bad = good.clone(); bad(257) = 'x'.toByte
    assert(Binary.tarMeta(bad) === None)
    assert(Binary.tarMeta(good.dropRight(1030)) === None)
  }

  test("synthBmp round-trips dims and pixel formulas through the decoder") {
    val b = Binary.synthBmp(10, 7, seed = 42)
    assert(Binary.imageDims(b) === Some((10, 7)))
    for ((x, y) <- Seq((0, 0), (9, 6), (3, 5)))
      assert(Binary.bmpPixel(b, x, y) === Some((
        (7 * x + 13 * y + 42) % 256,
        (3 * x + 5 * y + 11 * 42) % 256,
        (x + y + 42) % 256)), s"pixel ($x,$y)")
    assert(Binary.bmpPixel(b, 10, 0) === None)
  }

  test("bmpResizeNearest maps every output pixel to its floor-source") {
    val src = Binary.synthBmp(16, 12, seed = 7)
    val out = Binary.bmpResizeNearest(src, 8, 6).get
    assert(Binary.imageDims(out) === Some((8, 6)))
    for (x <- 0 until 8; y <- 0 until 6)
      assert(Binary.bmpPixel(out, x, y) ===
        Binary.bmpPixel(src, x * 16 / 8, y * 12 / 6), s"pixel ($x,$y)")
    // non-integer ratio: still exact floor mapping
    val odd = Binary.bmpResizeNearest(Binary.synthBmp(13, 9, 3), 5, 4).get
    for (x <- 0 until 5; y <- 0 until 4)
      assert(Binary.bmpPixel(odd, x, y) ===
        Binary.bmpPixel(Binary.synthBmp(13, 9, 3), x * 13 / 5, y * 9 / 4))
    // a non-BMP payload refuses (caller falls back)
    assert(Binary.bmpResizeNearest("png-ish".getBytes, 4, 4) === None)
  }

  test("wavEnergy computes exact sample statistics") {
    val b = Binary.synthWavPcm16(8000, nSamples = 3, seed = 5L)
    def s(k: Long) = ((31 * k + 7 + 5) % 65536) - 32768
    val want = (3L, (0L until 3L).map(k => math.abs(s(k))).max,
      (0L until 3L).map(k => s(k) * s(k)).sum)
    assert(Binary.wavEnergy(b) === Some(want))
    // zero samples: silence stats, not a crash
    assert(Binary.wavEnergy(Binary.synthWavPcm16(8000, 0, 0L)) ===
      Some((0L, 0L, 0L)))
    // stereo/8-bit (the silent synthWav) is refused, not misread
    assert(Binary.wavEnergy(Binary.synthWav(8000, 2, 8, 10)) === None)
    assert(Binary.wavEnergy("noise".getBytes) === None)
  }

  test("synthPng round-trips pixel formulas through inflate + all five unfilters") {
    // height 9 with seed 0 encodes rows with filters 0,1,2,3,4,0,1,2,3 —
    // every filter type exercised; seed 3 shifts the rotation.
    for (seed <- Seq(0, 3, 17); (w, h) <- Seq((7, 9), (16, 5), (1, 6))) {
      val png = Binary.synthPng(w, h, seed)
      val (dw, dh, px) = Binary.pngDecode(png).getOrElse(
        fail(s"decode failed for ${w}x$h seed=$seed"))
      assert((dw, dh) === ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val p = (y * w + x) * 3
        assert((px(p) & 0xff) === (x + y + seed) % 256, s"R($x,$y) seed=$seed")
        assert((px(p + 1) & 0xff) === (3 * x + 5 * y + 11 * seed) % 256)
        assert((px(p + 2) & 0xff) === (7 * x + 13 * y + seed) % 256)
      }
      // header-dims reader agrees with the full decode
      assert(Binary.imageDims(png) === Some((w, h)))
    }
  }

  test("pngDecode degrades to None on malformed or out-of-profile input") {
    val good = Binary.synthPng(6, 6, 1)
    assert(Binary.pngDecode(good).isDefined)
    // truncated IDAT stream
    assert(Binary.pngDecode(good.take(good.length - 20)).isEmpty)
    // corrupt zlib body: flip bytes inside the IDAT payload
    val corrupt = good.clone()
    val idatAt = (8 until corrupt.length - 4).find(i =>
      corrupt(i) == 'I' && corrupt(i + 1) == 'D' && corrupt(i + 2) == 'A').get
    (idatAt + 6 until idatAt + 12).foreach(i => corrupt(i) = 0x55)
    assert(Binary.pngDecode(corrupt).isEmpty)
    // out-of-profile: grayscale color type in IHDR
    val gray = good.clone()
    gray(8 + 8 + 9) = 0 // IHDR color-type byte
    assert(Binary.pngDecode(gray).isEmpty)
    // not a PNG at all
    assert(Binary.pngDecode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Binary.pngDecode(Binary.synthBmp(4, 4, 0)).isEmpty)
  }

  test("pngResizeNearest maps every output pixel to its floor-source") {
    val src = Binary.synthPng(12, 10, 5)
    val out = Binary.pngResizeNearest(src, 5, 4).get
    val (w, h, px) = Binary.pngDecode(out).get
    assert((w, h) === ((5, 4)))
    for (y <- 0 until 4; x <- 0 until 5) {
      val sx = x * 12 / 5; val sy = y * 10 / 4
      val p = (y * 5 + x) * 3
      assert((px(p) & 0xff) === (sx + sy + 5) % 256, s"($x,$y)")
      assert((px(p + 1) & 0xff) === (3 * sx + 5 * sy + 11 * 5) % 256)
      assert((px(p + 2) & 0xff) === (7 * sx + 13 * sy + 5) % 256)
    }
    // resizeImages routes PNG payloads through the real path
    import spark.implicits._
    val media = Seq(Binary.MediaRecord(1L, "image", src, "s")).toDS()
    val resized = Binary.resizeImages(media, 5, 4).collect()(0)
    assert(Binary.pngDecode(resized.bytes).map(t => (t._1, t._2)) ===
      Some((5, 4)))
  }

  test("aHash64: container-agnostic, brightness-invariant, edit-local") {
    // same formula image rendered as PNG and BMP hashes identically
    // (decodePixels normalizes both to top-down RGB)
    val png = Binary.synthPng(16, 12, 5)
    val hp = Binary.aHash64(png).get
    // BMP's synth uses the same formulas but bottom-up y — build the
    // equivalent top-down image manually via pngEncode for a controlled
    // comparison instead
    val (w, h, px) = Binary.pngDecode(png).get
    assert(Binary.aHash64(Binary.pngEncode(w, h, px)).get === hp)
    // brightness shift: +40 on every channel (clamped away from wrap)
    val bright = px.map(b => ((b & 0xff) min 200).toByte)
      .map(b => ((b & 0xff) + 40).toByte)
    val hb = Binary.aHash64(Binary.pngEncode(w, h, bright)).get
    assert(java.lang.Long.bitCount(hp ^ hb) <= 8,
      "aHash must be nearly brightness-invariant")
    // a small local edit flips few bits; a different structure flips many
    val edited = px.clone()
    edited(0) = 255.toByte; edited(1) = 255.toByte; edited(2) = 255.toByte
    val he = Binary.aHash64(Binary.pngEncode(w, h, edited)).get
    assert(java.lang.Long.bitCount(hp ^ he) <= 4)
    val other = Binary.synthPng(16, 12, 0)
    val transposed = Binary.pngDecode(other).get._3.reverse
    val ho = Binary.aHash64(Binary.pngEncode(w, h, transposed)).get
    assert(java.lang.Long.bitCount(hp ^ ho) > 16,
      s"reversed gradient must differ: ${java.lang.Long.bitCount(hp ^ ho)}")
    // BMP payloads route through the same hash path
    assert(Binary.aHash64(Binary.synthBmp(16, 12, 5)).isDefined)
    // undecodable payloads degrade to None
    assert(Binary.aHash64(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("synthJpeg: a real marker walk reads dims and the DQT back") {
    val j = Binary.synthJpeg(33, 21, 75)
    // the existing SOF walk reads the frame header of the synth file
    assert(Binary.imageHeaderDims(j) === Some((33, 21)))
    // mid-range qualities invert exactly through the integer formula:
    // q=50 → S=100 → (200−100)/2 = 50; q=75 → S=50 → 75, etc.
    for (q <- Seq(30, 40, 50, 60, 75, 80, 90)) {
      val est = Binary.jpegDqtQuality(Binary.synthJpeg(8, 8, q)).get
      assert(math.abs(est - q) <= 1, s"quality $q estimated $est")
    }
    // extremes clamp (entries floor at 1 / cap at 255): estimate stays
    // ordered even where it can't be exact
    val e5 = Binary.jpegDqtQuality(Binary.synthJpeg(8, 8, 5)).get
    val e95 = Binary.jpegDqtQuality(Binary.synthJpeg(8, 8, 95)).get
    assert(e5 < 30 && e95 > 85, s"e5=$e5 e95=$e95")
  }

  test("synthGif/gifFrameCount: frame walk counts image descriptors") {
    for (n <- Seq(1, 2, 5, 20)) {
      val g = Binary.synthGif(16, 12, n)
      // the existing dims reader still sees the canvas
      assert(Binary.imageHeaderDims(g) === Some((16, 12)))
      assert(Binary.gifFrameCount(g) === Some(n))
    }
    // a GCT-flagged GIF skips the table correctly: splice the flag in
    // and append 6 bytes (2-entry table) after the LSD
    val base = Binary.synthGif(8, 8, 3)
    val withGct = base.take(10) ++ Array[Byte](0x80.toByte) ++
      base.slice(11, 13) ++ Array.fill(6)(0x11.toByte) ++ base.drop(13)
    assert(Binary.gifFrameCount(withGct) === Some(3))
  }

  test("gifFrameCount degrades to None off the happy path") {
    assert(Binary.gifFrameCount(Array[Byte](1, 2, 3)).isEmpty)
    assert(Binary.gifFrameCount(Binary.synthPng(8, 8, 1)).isEmpty)
    // truncated mid-frame: no trailer seen
    val g = Binary.synthGif(8, 8, 4)
    assert(Binary.gifFrameCount(g.dropRight(3)).isEmpty)
    // desynced block introducer
    val bad = g.clone(); bad(13) = 0x7f
    assert(Binary.gifFrameCount(bad).isEmpty)
  }

  test("jpegDqtQuality degrades to None off the happy path") {
    assert(Binary.jpegDqtQuality(Array[Byte](1, 2, 3)).isEmpty)
    // a JPEG with no DQT before SOS: truncate the synth to SOI+SOF only
    val j = Binary.synthJpeg(8, 8, 50)
    val noDqt = j.take(2) ++ j.drop(2 + 4 + 65) // strip the DQT segment
    assert(Binary.jpegDqtQuality(noDqt).isEmpty)
    // a PNG is not a JPEG
    assert(Binary.jpegDqtQuality(Binary.synthPng(8, 8, 1)).isEmpty)
    // truncated mid-DQT
    assert(Binary.jpegDqtQuality(j.take(20)).isEmpty)
  }
  test("synthMp3Id3/id3Tags: synchsafe size and frame walk round-trip") {
    val b = Binary.synthMp3Id3("Titl", "Art", padBytes = 200,
      audioBytes = 32)
    // tag body: TIT2 (10+1+4) + TPE1 (10+1+3) + 200 pad = 229 > 127,
    // so the synchsafe size genuinely spans two 7-bit bytes.
    assert(Binary.id3Tags(b) === Some(("Titl", "Art", 229L)))
    // zero-length pad still walks (frames end exactly at the tag end)
    val b0 = Binary.synthMp3Id3("T", "A", padBytes = 0, audioBytes = 0)
    assert(Binary.id3Tags(b0) === Some(("T", "A", 24L)))
  }

  test("id3Tags degrades to None off the happy path") {
    val good = Binary.synthMp3Id3("T", "A", 0, 8)
    assert(Binary.id3Tags("MP3junk".getBytes) === None)
    // non-synchsafe size byte (bit 7 set) → the corruption the encoding
    // exists to forbid
    val bad = good.clone(); bad(6) = 0x80.toByte
    assert(Binary.id3Tags(bad) === None)
    // declared size past the buffer → truncation
    val short = java.util.Arrays.copyOf(good, 20)
    assert(Binary.id3Tags(short) === None)
  }

  test("exifTags round-trips BOTH TIFF byte orders") {
    val dt = "2024:03:09 14:25:36"
    for (le <- Seq(true, false)) {
      val bytes = Binary.synthExifJpeg(6, dt, littleEndian = le)
      assert(Binary.exifTags(bytes) === Some((6L, dt)),
        s"littleEndian=$le")
    }
    // every orientation value survives the SHORT slot packing
    for (o <- 1 to 8) {
      assert(Binary.exifTags(Binary.synthExifJpeg(o, dt,
        littleEndian = o % 2 == 0)) === Some((o.toLong, dt)))
    }
  }

  test("exifTags degrades to None off the happy path") {
    val good = Binary.synthExifJpeg(3, "2024:01:01 00:00:00",
      littleEndian = true)
    assert(Binary.exifTags("notajpeg".getBytes) === None)
    // truncation inside the IFD
    assert(Binary.exifTags(java.util.Arrays.copyOf(good, 24)) === None)
    // corrupt the TIFF byte-order mark
    val bad = good.clone(); bad(12) = 'X'.toByte
    assert(Binary.exifTags(bad) === None)
    // a JPEG with no APP1 at all (straight to EOI)
    assert(Binary.exifTags(Array(0xff, 0xd8, 0xff, 0xd9)
      .map(_.toByte)) === None)
  }

  test("webpDims round-trips all three container variants") {
    for (v <- 0 to 2; (w, h) <- Seq((1, 1), (16, 9), (0x3fff, 0x3fff))) {
      assert(Binary.webpDims(Binary.synthWebp(w, h, v)) === Some((w, h)),
        s"variant $v dims ($w,$h)")
    }
    // the generic image-dims path recognizes WebP too
    assert(Binary.imageHeaderDims(Binary.synthWebp(320, 240, 1))
      === Some((320, 240)))
  }

  test("webpDims degrades to None off the happy path") {
    assert(Binary.webpDims("RIFFxxxxWAVE".getBytes ++
      new Array[Byte](20)) === None) // RIFF but not WEBP
    val lossy = Binary.synthWebp(16, 9, 0)
    lossy(23) = 0x00 // corrupt the VP8 start code
    assert(Binary.webpDims(lossy) === None)
    val lossless = Binary.synthWebp(16, 9, 1)
    lossless(20) = 0x30 // corrupt the VP8L signature byte
    assert(Binary.webpDims(lossless) === None)
    assert(Binary.webpDims(Binary.synthWebp(16, 9, 2).take(28)) === None)
    assert(Binary.webpDims("not a webp at all".getBytes) === None)
  }

  test("mp3Meta walks CBR frames, honors ID3v2 prefixes and VBR sums") {
    // 5 frames at 128 kbps / 44100: flen = 144*128000/44100 = 417
    assert(Binary.mp3Meta(Binary.synthMp3(9, 0, 5))
      === Some((5, 44100, 128, 5 * 1152L)))
    // behind an ID3v2 prefix the walk lands on the same frames
    assert(Binary.mp3Meta(Binary.synthMp3(9, 0, 5, id3Bytes = 200))
      === Some((5, 44100, 128, 5 * 1152L)))
    // VBR: headline bitrate reads frame 1, sample total sums all frames
    val vbr = Binary.synthMp3(9, 0, 2) ++ Binary.synthMp3(14, 0, 3)
    assert(Binary.mp3Meta(vbr) === Some((5, 44100, 128, 5 * 1152L)))
    // every (brIdx, srIdx) cell round-trips
    for (br <- 1 to 14; sr <- 0 to 2) {
      val want = Seq(44100, 48000, 32000)(sr)
      val kbps = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        224, 256, 320)(br)
      assert(Binary.mp3Meta(Binary.synthMp3(br, sr, 3))
        === Some((3, want, kbps, 3 * 1152L)))
    }
    // ID3v2.4 FOOTER flag (header flags bit 4): the syncsafe size
    // excludes the 10-byte footer too — without the extra hop the first
    // sync probe lands inside the "3DI" footer and the walk returns None
    assert(Binary.mp3Meta(Binary.synthMp3(9, 0, 5, id3Bytes = 200,
      id3Footer = true)) === Some((5, 44100, 128, 5 * 1152L)))
  }

  test("mp3VbrMeta reads Xing frame counts; CBR files without a tag return None") {
    // stereo + mono side-info offsets, all three sample rates
    for (sr <- 0 to 2; mono <- Seq(false, true)) {
      val want = Seq(44100, 48000, 32000)(sr)
      assert(Binary.mp3VbrMeta(Binary.synthXingMp3(sr, 12345L, mono))
        === Some((12345L, want, 12345L * 1152 * 1000 / want)),
        s"sr=$sr mono=$mono")
    }
    // behind a footered ID3v2 prefix the tag still resolves
    val id3 = {
      val b = new java.io.ByteArrayOutputStream()
      b.write('I'); b.write('D'); b.write('3')
      b.write(4); b.write(0); b.write(0x10) // v2.4, footer flag
      Seq(21, 14, 7, 0).foreach(s => b.write((64 >> s) & 0x7f))
      b.write(new Array[Byte](64))
      b.write('3'); b.write('D'); b.write('I') // the 10-byte footer
      b.write(4); b.write(0); b.write(0x10)
      Seq(21, 14, 7, 0).foreach(s => b.write((64 >> s) & 0x7f))
      b.toByteArray
    }
    assert(Binary.mp3VbrMeta(id3 ++ Binary.synthXingMp3(0, 7L))
      .map(_._1) === Some(7L))
    // a plain CBR frame has no tag: None (callers fall back to mp3Meta)
    assert(Binary.mp3VbrMeta(Binary.synthMp3(9, 0, 3)) === None)
    assert(Binary.mp3VbrMeta(Array[Byte](1, 2, 3)) === None)
  }

  test("avifDims walks ftyp→meta→iprp→ipco→ispe for avif and heic brands") {
    for (brand <- Seq("avif", "heic", "mif1");
         (w, h) <- Seq((1, 1), (640, 480), (8192, 4320))) {
      assert(Binary.avifDims(Binary.synthAvif(w, h, brand)) === Some((w, h)),
        s"$brand ${w}x$h")
    }
    // non-image ISO-BMFF brand (mp4) is refused — mp4Meta territory
    assert(Binary.avifDims(Binary.synthMp4(64, 48, 600)) === None)
    // torn box: truncated payload is a clean None
    val good = Binary.synthAvif(100, 50)
    assert(Binary.avifDims(good.dropRight(6)) === None)
  }

  test("tiffDims round-trips both byte orders and mixed value types") {
    for (be <- Seq(false, true); (w, h) <- Seq((1, 1), (640, 480), (70000, 2))) {
      assert(Binary.tiffDims(Binary.synthTiff(w, h, be)) === Some((w, h)),
        s"bigEndian=$be dims ($w,$h)")
    }
    // the generic dispatch recognizes standalone TIFF too
    assert(Binary.imageHeaderDims(Binary.synthTiff(320, 240, true))
      === Some((320, 240)))
  }

  test("tiffDims degrades to None off the happy path") {
    assert(Binary.tiffDims("not a tiff".getBytes) === None)
    assert(Binary.tiffDims(Array[Byte]('I', 'I', 42, 0)) === None) // truncated
    val t = Binary.synthTiff(16, 9, false)
    t(3) = 1 // corrupt the magic
    assert(Binary.tiffDims(t) === None)
    // IFD offset pointing past the buffer
    val far = Binary.synthTiff(16, 9, false)
    far(4) = 0xf0.toByte
    assert(Binary.tiffDims(far) === None)
  }

  test("mp3Meta degrades to None / partial off the happy path") {
    assert(Binary.mp3Meta("no sync here".getBytes) === None)
    assert(Binary.mp3Meta(Array[Byte]()) === None)
    // truncated INSIDE the third header (2 of 4 bytes): frames before
    // the cut still count. flen = 144*128000/44100 = 417.
    val cut = Binary.synthMp3(9, 0, 3).take(2 * 417 + 2)
    assert(Binary.mp3Meta(cut) === Some((2, 44100, 128, 2 * 1152L)))
    // garbage after valid frames: partial walk, not a throw
    val tail = Binary.synthMp3(9, 0, 2) ++ "garbage".getBytes
    assert(Binary.mp3Meta(tail) === Some((2, 44100, 128, 2 * 1152L)))
  }

  test("gzipMeta round-trips the stored-block fixture") {
    // 600 bytes at blockSize 256 → 3 stored blocks; fname "abc.bin".
    val g = Binary.synthGzip(600, 123456789L, 256, "abc.bin")
    assert(Binary.gzipMeta(g) === Some((123456789L, 7, 3, 600L, true)))
    // zero-length payload still writes one (final, empty) block
    assert(Binary.gzipMeta(Binary.synthGzip(0, 5L, 256)) ===
      Some((5L, 10, 1, 0L, true)))
    // exact multiple of the block size: no phantom trailing block
    assert(Binary.gzipMeta(Binary.synthGzip(512, 0L, 256)) ===
      Some((0L, 10, 2, 512L, true)))
  }

  test("gzipMeta reads the JDK's own level-0 writer") {
    // GZIPOutputStream with NO_COMPRESSION emits stored deflate blocks
    // — the walk must parse a REAL zlib stream, not just our fixture.
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(java.util.zip.Deflater.NO_COMPRESSION)
    }
    val payload = Array.tabulate[Byte](1000)(k => (k % 251).toByte)
    gz.write(payload); gz.close()
    val got = Binary.gzipMeta(bos.toByteArray)
    assert(got.isDefined)
    val (mtime, fname, blocks, isize, crcOk) = got.get
    assert(mtime === 0L && fname === 0 && blocks >= 1 &&
      isize === 1000L && crcOk)
  }

  test("gzipMeta degrades off the happy path") {
    val g = Binary.synthGzip(300, 7L, 256)
    // corrupt footer CRC: parses, but the integrity check fails
    val bad = g.clone(); bad(bad.length - 8) = (bad(bad.length - 8) ^ 1).toByte
    assert(Binary.gzipMeta(bad).map(_._5) === Some(false))
    // corrupt payload byte: recomputed CRC disagrees with the footer
    val flip = g.clone(); flip(flip.length - 20) =
      (flip(flip.length - 20) ^ 0x40).toByte
    assert(Binary.gzipMeta(flip).map(_._5) === Some(false))
    // truncated footer / torn block / bad magic / compressed blocks
    assert(Binary.gzipMeta(g.dropRight(4)) === None)
    assert(Binary.gzipMeta(g.take(30)) === None)
    assert(Binary.gzipMeta("not a gzip at all".getBytes) === None)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos) // default compression
    gz.write(Array.fill[Byte](4096)('a')); gz.close()
    assert(Binary.gzipMeta(bos.toByteArray) === None)
  }

  test("svgDims reads explicit sizes, the viewBox fallback, and degrades") {
    assert(Binary.svgDims(Binary.synthSvg(640, 480, explicit = true)) ===
      Some((640, 480)))
    assert(Binary.svgDims(Binary.synthSvg(24, 24, explicit = false)) ===
      Some((24, 24)))
    // px units accepted; physical units refused; commas in viewBox ok
    def svg(s: String) = s.getBytes("UTF-8")
    assert(Binary.svgDims(svg("""<svg width="10px" height="20px">""")) ===
      Some((10, 20)))
    assert(Binary.svgDims(svg("""<svg width="10mm" height="20mm">""")) ===
      None)
    assert(Binary.svgDims(svg("""<svg viewBox="0, 0, 30, 40">x""")) ===
      Some((30, 40)))
    assert(Binary.svgDims(svg("<html>no vector here</html>")) === None)
    assert(Binary.svgDims(svg("<svg width=\"5\"")) === None) // unclosed tag
  }

  test("pdfMeta round-trips fixtures and validates the xref pointer") {
    assert(Binary.pdfMeta(Binary.synthPdf(1, 7, 5)) ===
      Some((1, 7, 5, true)))
    assert(Binary.pdfMeta(Binary.synthPdf(2, 0, 1)) ===
      Some((2, 0, 1, true)))
    // corrupt the startxref offset: still parses, xref check fails
    val good = Binary.synthPdf(1, 4, 3)
    val s = new String(good, "ISO-8859-1")
    val bad = s.replaceAll("startxref\n\\d+", "startxref\n17")
      .getBytes("ISO-8859-1")
    assert(Binary.pdfMeta(bad) === Some((1, 4, 3, false)))
    // the /Pages tree node is never counted as a page
    assert(Binary.pdfMeta(Binary.synthPdf(1, 5, 0)) ===
      Some((1, 5, 0, true)))
    assert(Binary.pdfMeta("%PDF-".getBytes) === None) // torn header
    assert(Binary.pdfMeta("not a pdf".getBytes) === None)
  }

  test("webmMeta round-trips the EBML fixture and degrades") {
    assert(Binary.webmMeta(Binary.synthWebm("webm", 90000L, 640, 360, 2))
      === Some(("webm", 90000L, 1, 2, 640, 360)))
    assert(Binary.webmMeta(Binary.synthWebm("matroska", 1L, 4, 4, 0))
      === Some(("matroska", 1L, 1, 0, 4, 4)))
    val good = Binary.synthWebm("webm", 5000L, 320, 240, 1)
    assert(Binary.webmMeta(good.take(20)) === None)   // torn element
    assert(Binary.webmMeta("RIFFxxxx".getBytes) === None) // wrong magic
    assert(Binary.webmMeta(Array[Byte]()) === None)
    // header without a Segment is not a playable container
    val headerOnly = good.take(
      4 + 8 + 14) // EBML header element only
    assert(Binary.webmMeta(headerOnly) === None)
  }

  test("icoMeta walks the directory, honors the 0-means-256 quirk, degrades") {
    assert(Binary.icoMeta(Binary.synthIco(Seq((16, 16), (32, 48)))) ===
      Some((2, 32, 48)))
    assert(Binary.icoMeta(Binary.synthIco(Seq((256, 256), (64, 64)))) ===
      Some((2, 256, 256)))
    val good = Binary.synthIco(Seq((16, 16), (24, 24)))
    assert(Binary.icoMeta(good.take(20)) === None) // torn entry table
    assert(Binary.icoMeta(good.dropRight(4)) === None) // payload overrun
    val cur = good.clone(); cur(2) = 2 // type 2 = CUR, not ICO
    assert(Binary.icoMeta(cur) === None)
    assert(Binary.icoMeta(Array[Byte]()) === None)
  }
}
