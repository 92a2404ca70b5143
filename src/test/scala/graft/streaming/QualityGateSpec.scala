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
}
