package graft.sources

import graft.SparkSpec
import graft.streaming.BranchIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class BranchIngestSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"

  private def readIds(dir: String, ref: Option[String]): Seq[Long] = {
    val r = spark.read.format(Fmt).option("path", dir)
    ref.foreach(n => r.option("ref", n))
    r.load().select("id").as[Long].collect().sorted.toSeq
  }

  test("continuous branch fold: invisible to main, exactly-once, promotable") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_bring").toString
    // seed the table and fork the ingest branch
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.createBranch(dir, "ingest")
    val src = MemoryStream[(Long, String)]
    val q = BranchIngest.start(src.toDF().toDF("id", "v"), dir, "ingest",
      s"$dir-ckpt")
    try {
      src.addData((10L, "x"), (11L, "y"))
      q.processAllAvailable()
      src.addData((12L, "z"))
      q.processAllAvailable()
    } finally q.stop()
    // two epochs folded into the branch; main untouched
    assert(readIds(dir, None) === Seq(1L, 2L))
    assert(readIds(dir, Some("ingest")) === Seq(1L, 2L, 10L, 11L, 12L))
    // exactly-once: a redelivered epoch is a detected no-op
    val head = WarehouseSink.readRef(dir, "ingest").get.version
    val epoch = WarehouseSink.readManifestAt(dir, head).get.epoch
    BranchIngest.foldBatch(dir, "ingest")(
      Seq((12L, "z")).toDF("id", "v"), epoch)
    assert(WarehouseSink.readRef(dir, "ingest").get.version === head)
    assert(readIds(dir, Some("ingest")) === Seq(1L, 2L, 10L, 11L, 12L))
    // each staged epoch is individually time-travelable before promotion
    val afterFirst = WarehouseSink.readManifestAt(dir, head - 1).get
    assert(afterFirst.op === "branch-append")
    // promote: main now sees every folded epoch
    WarehouseSink.fastForward(dir, "ingest")
    assert(readIds(dir, None) === Seq(1L, 2L, 10L, 11L, 12L))
  }

  test("checkpoint restart resumes the fold without duplication") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_bring2").toString
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.createBranch(dir, "b")
    val src = MemoryStream[(Long, String)]
    val ckpt = s"$dir-ckpt"
    val q1 = BranchIngest.start(src.toDF().toDF("id", "v"), dir, "b", ckpt)
    try {
      src.addData((10L, "x"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the same checkpoint; new data only
    val q2 = BranchIngest.start(src.toDF().toDF("id", "v"), dir, "b", ckpt)
    try {
      src.addData((11L, "y"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(readIds(dir, Some("b")) === Seq(1L, 10L, 11L))
  }
}
