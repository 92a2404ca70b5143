package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch parity for the streaming twin of q117 (daily volume anomaly
  * screen): finalized day stats through [[AnomalyScreen.screenOf]] must
  * equal [[Analytics.dailyAnomalies]] row-for-row on a replayed source. */
class AnomalyScreenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dayStatsStream + screenOf equals batch dailyAnomalies on a replayed source") {
    implicit val sqlCtx = spark.sqlContext
    // 9 observed days of 'view' with a spike on day 8; a second sparse
    // type exercises the below-minHistory gate
    val days = Seq(5L, 5L, 6L, 7L, 4L, 6L, 5L, 30L, 5L)
    val rows = days.zipWithIndex.flatMap { case (n, i) =>
      (0L until n).map(k =>
        ("view", ts(f"2024-01-${i + 1}%02d 0${(k % 9) + 1}:00:00")))
    } ++ Seq(("rare", ts("2024-01-02 10:00:00")),
      ("rare", ts("2024-01-05 10:00:00")))
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val stats = AnomalyScreen.dayStatsStream(
      stream.toDF().toDF("event_type", "ts_t"),
      "event_type", "ts_t", trailing = 4, watermark = "0 seconds")
    val q = stats.writeStream.format("memory").queryName("as_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      // sentinel batches: advance the watermark past every real day,
      // then let the finalization timers fire
      stream.addData(("zz", ts("2024-03-01 00:00:00"))); q.processAllAvailable()
      stream.addData(("zz", ts("2024-03-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("as_sink").filter(col("etype") =!= "zz")
    val got = AnomalyScreen.screenOf(sink, minHistory = 3)
      .orderBy("etype", "day")
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    val batch = Analytics.dailyAnomalies(
      rows.toDF("event_type", "ts_t"), "event_type", "ts_t",
      trailing = 4, minHistory = 3)
      .orderBy("etype", "day")
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    assert(got === batch, s"stream=$got batch=$batch")
    assert(got.nonEmpty)
    // the planted spike day is flagged with a large positive z
    val spike = got.find(_._2 == "2024-01-08").get
    assert(spike._6 > 3.0, s"spike z = ${spike._6}")
    // each (type, day) finalized exactly once
    assert(sink.groupBy("etype", "dayMs").count()
      .filter(col("count") > 1).count() === 0L)
  }

  test("out-of-order arrivals inside the allowance land in their own day") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val stats = AnomalyScreen.dayStatsStream(
      stream.toDF().toDF("event_type", "ts_t"),
      "event_type", "ts_t", trailing = 4, watermark = "5 days")
    val q = stats.writeStream.format("memory").queryName("as_sink2")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(("view", ts("2024-01-03 10:00:00")))
      q.processAllAvailable()
      // an earlier-day event arrives late but inside the 5-day allowance
      stream.addData(("view", ts("2024-01-01 10:00:00")),
        ("view", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      stream.addData(("zz", ts("2024-02-01 00:00:00"))); q.processAllAvailable()
      stream.addData(("zz", ts("2024-02-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("as_sink2").filter(col("etype") === "view")
      .select(date_format(timestamp_millis(col("dayMs")), "yyyy-MM-dd"),
        col("n_events"), col("n_hist"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // Jan-01 closed with BOTH late events and feeds Jan-03's baseline
    assert(got === Seq(("2024-01-01", 2L, 0L), ("2024-01-03", 1L, 1L)))
  }
}
