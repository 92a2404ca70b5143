package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The continuous Page-Hinkley drift monitor: finalized per-day PH
  * readings must equal the reference recursion fold day-for-day, and a
  * planted level shift must alarm. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("phStream equals the replay fold and alarms on a level shift") {
    implicit val sqlCtx = spark.sqlContext
    // 6 flat days at 5/day, then 4 shifted days at 25/day
    val days = Seq(5L, 5L, 5L, 5L, 5L, 5L, 25L, 25L, 25L, 25L)
    val rows = days.zipWithIndex.flatMap { case (n, i) =>
      (0L until n).map(k =>
        ("view", ts(f"2024-01-${i + 1}%02d 0${(k % 9) + 1}:00:00")))
    }
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val out = DriftMonitor.phStream(
      stream.toDF().toDF("event_type", "ts_t"), "event_type", "ts_t",
      deltaMicro = 500000L, lambdaMicro = 10000000L,
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("ph_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      stream.addData(("zz", ts("2024-03-01 00:00:00"))); q.processAllAvailable()
      stream.addData(("zz", ts("2024-03-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ph_sink").filter(col("etype") === "view")
      .orderBy("dayMs")
      .select("n_events", "ph_micro", "alarm")
      .as[(Long, Long, Boolean)].collect().toSeq
    val want = DriftMonitor.replay(days, 500000L, 10000000L)
    assert(got.map(_._1) === days)
    assert(got.map(r => (r._2, r._3)) === want,
      s"stream=$got replay=$want")
    // flat prefix quiet, the shift alarms and STAYS alarmed
    assert(!got.take(6).exists(_._3))
    assert(got.drop(7).forall(_._3), s"post-shift readings: $got")
    // each (type, day) finalized exactly once
    assert(spark.table("ph_sink").groupBy("etype", "dayMs").count()
      .filter(col("count") > 1).count() === 0L)
  }

  test("the recursion's hand-computed first steps hold") {
    // x=[10, 10, 22], δ=0.5: day1 inc = 10 − 10 − 0.5 = −0.5 →
    // m=−0.5, min=−0.5, ph=0. day2 same → ph=0. day3: mean=14,
    // inc = 22 − 14 − 0.5 = 7.5 → m=6.5, ph = 6.5 − (−1) = 7.5.
    val got = DriftMonitor.replay(Seq(10L, 10L, 22L), 500000L, 5000000L)
    assert(got === Seq((0L, false), (0L, false), (7500000L, true)))
  }
}
