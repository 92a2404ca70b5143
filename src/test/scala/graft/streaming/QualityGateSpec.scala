package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  test("gate routes clean rows and labeled violations across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("qgate").toString
    val src = MemoryStream[(Long, Double, String)]
    val q = QualityGate.start(
      src.toDF().toDF("id", "price", "status"),
      Seq(InRange("price", 0.0, 100.0), OneOf("status", Seq("OK"))),
      s"$dir/clean", s"$dir/quarantine", s"$dir/ckpt")
    try {
      src.addData((1L, 50.0, "OK"), (2L, 500.0, "OK"))
      q.processAllAvailable()
      src.addData((3L, 60.0, "BAD"), (4L, 70.0, "OK"),
        (5L, 999.0, "BAD"))
      q.processAllAvailable()
    } finally q.stop()
    val clean = spark.read.parquet(s"$dir/clean")
      .as[(Long, Double, String)].collect().map(_._1).toSet
    assert(clean === Set(1L, 4L))
    val quar = spark.read.parquet(s"$dir/quarantine")
      .selectExpr("id", "violated").as[(Long, String)].collect().toMap
    assert(quar === Map(
      2L -> "in_range:price",
      3L -> "one_of:status",
      5L -> "in_range:price,one_of:status"))
  }

  test("exactly-once gate: no duplicate publishes across a checkpoint-resume replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("qgate2").toString
    val src = MemoryStream[(Long, Double, String)]
    val rules = Seq(InRange("price", 0.0, 100.0), OneOf("status", Seq("OK")))
    def startGate() = QualityGate.startExactlyOnce(
      src.toDF().toDF("id", "price", "status"), rules,
      s"$dir/clean", s"$dir/quarantine", s"$dir/ckpt")
    def published(): Seq[Long] =
      spark.read.format("graft.sources.WarehouseSink")
        .option("path", s"$dir/clean").load()
        .select("id").as[Long].collect().sorted.toSeq
    val (c1, q1) = startGate()
    try {
      src.addData((1L, 50.0, "OK"), (2L, 500.0, "OK"))
      c1.processAllAvailable(); q1.processAllAvailable()
      src.addData((3L, 60.0, "BAD"), (4L, 70.0, "OK"))
      c1.processAllAvailable(); q1.processAllAvailable()
    } finally { c1.stop(); q1.stop() }
    assert(published() === Seq(1L, 4L))
    // Checkpoint resume: the restarted clean query picks up the committed
    // cursor and publishes only NEW rows — nothing re-published.
    val (c2, q2) = startGate()
    try {
      src.addData((5L, 80.0, "OK"), (6L, -3.0, "OK"))
      c2.processAllAvailable(); q2.processAllAvailable()
    } finally { c2.stop(); q2.stop() }
    assert(published() === Seq(1L, 4L, 5L))
    // Forced redelivery of the LAST committed epoch (the crash window a
    // clean restart can't reproduce on demand): commit on an epoch the
    // manifest has already folded must be a detected no-op.
    val (epoch, version) = graft.sources.WarehouseTestAccess
      .manifestCursor(s"$dir/clean")
    assert(epoch >= 0)
    graft.sources.WarehouseTestAccess.replayEpoch(s"$dir/clean",
      spark.read.format("graft.sources.WarehouseSink")
        .option("path", s"$dir/clean").load().schema, epoch)
    assert(published() === Seq(1L, 4L, 5L))
    assert(graft.sources.WarehouseTestAccess
      .manifestCursor(s"$dir/clean")._2 === version)
    // quarantine kept its evidence (at-least-once leg)
    val quar = spark.read.parquet(s"$dir/quarantine")
      .select("id").as[Long].collect().toSet
    assert(quar === Set(2L, 3L, 6L))
  }
}
