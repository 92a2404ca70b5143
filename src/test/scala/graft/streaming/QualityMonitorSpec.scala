package graft.streaming

import graft.SparkSpec
import graft.ml.Eval
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class QualityMonitorSpec extends SparkSpec {
  import spark.implicits._

  // (epoch-second, score on [0,100], label)
  private val rows = Seq(
    (0L, 10L, 0L), (30L, 95L, 1L), (59L, 55L, 1L),   // window [0, 60)
    (60L, 20L, 0L), (90L, 80L, 1L), (119L, 85L, 0L)) // window [60, 120)

  private def scored(df: org.apache.spark.sql.DataFrame) =
    df.toDF("sec", "s", "y")
      .withColumn("ts", timestamp_seconds(col("sec")))

  test("windowed calibration matches the batch operator per window") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, Long)]
    val q = QualityMonitor.windowedCalibration(scored(src.toDF()),
      "ts", "s", "y", windowDur = "1 minute", watermark = "0 seconds",
      bins = 4, scale = 100L)
      .writeStream.format("memory").queryName("qmon")
      .outputMode("complete").start()
    try {
      src.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("qmon")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("bin"), col("n_docs"), col("mean_score_ppm"),
        col("pos_rate_ppm"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // batch parity: run Eval.calibration on each window's rows
    val want = rows.groupBy(_._1 / 60).toSeq.flatMap { case (w, rs) =>
      Eval.calibration(rs.map(r => (r._2, r._3)).toDF("s", "y"),
        "s", "y", bins = 4, scale = 100L)
        .as[(Long, Long, Long, Long)].collect().toSeq
        .map { case (bin, n, ms, pr) =>
          (f"00:0${w}", bin, n, ms, pr)
        }
    }.toSet
    assert(got === want)
  }

  test("state is bin-bounded: one row per (window, occupied bin)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Long, Long)]
    val q = QualityMonitor.windowedCalibration(scored(src.toDF()),
      "ts", "s", "y", "1 minute", "0 seconds", bins = 4, scale = 100L)
      .writeStream.format("memory").queryName("qmon2")
      .outputMode("complete").start()
    try {
      src.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val n = spark.table("qmon2").count()
    assert(n <= 2L * 4L && n > 0L)
  }
}
