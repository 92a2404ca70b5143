package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata alongside, processed batch-at-a-time per
  * partition (the JVM analog of `mapInPandas`-style batched UDFs).
  *
  * The Spark-side contract — schema, encoders, partition-wise batching,
  * deterministic outputs — is real and tested. The actual pixel/sample
  * decode is STUBBED (`fakeDecode`): codec libraries aren't available in
  * this environment, so the stub derives deterministic pseudo-metadata
  * from the bytes. Swapping in a real decoder only changes the body of
  * [[fakeDecode]]/[[fakeFrames]]; every plan around it is unchanged.
  */
object Binary {

  final case class MediaRecord(media_id: Long, modality: String,
                               bytes: Array[Byte], source: String)
  final case class MediaMeta(media_id: Long, modality: String,
                             size_bytes: Long, width: Int, height: Int,
                             n_frames: Int, digest: String)
  final case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** STUB decode — deterministic pseudo-metadata derived from the payload
    * DIGEST (md5), so the whole typed decode path is oracle-checkable:
    * any engine can recompute width/height/frames from the same hex
    * nibbles. A real implementation calls the codec here (per partition,
    * so any native library handle is initialized once per task, not per
    * row). */
  private[multimodal] def fakeDecode(r: MediaRecord): MediaMeta = {
    val hex = java.security.MessageDigest.getInstance("MD5").digest(r.bytes)
      .map("%02x".format(_)).mkString
    def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
    MediaMeta(r.media_id, r.modality, r.bytes.length.toLong,
      width = nib(0) * 16 + nib(1) + 1, height = nib(2) * 16 + nib(3) + 1,
      n_frames = if (r.modality == "video") nib(4) + 2 else 1,
      digest = hex)
  }

  /** Feature-extraction pass: one partition-wise sweep, codec init per
    * partition, no shuffle. */
  def extractMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init of (stubbed) codec state happens here
      it.map(fakeDecode)
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
