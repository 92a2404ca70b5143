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
}
