package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch parity for the streaming twin of q321 (running-distinct growth
  * curve): replay the same rows through the first-seen gate; the
  * finalized stream rolled up by [[DistinctCurve.curveOf]] must equal
  * [[Analytics.runningDistinct]] row-for-row. */
class DistinctCurveSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("firstSeenStream + curveOf equals batch runningDistinct on a replayed source") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("view", 1L, ts("2024-01-01 09:00:00")),
      ("view", 1L, ts("2024-01-03 09:00:00")), // repeat: not new
      ("view", 2L, ts("2024-01-01 12:00:00")),
      ("view", 3L, ts("2024-01-02 08:00:00")),
      ("buy", 1L, ts("2024-01-02 10:00:00")),
      ("buy", 4L, ts("2024-01-04 10:00:00")),
      ("view", 4L, ts("2024-01-04 23:00:00")))
    val stream = MemoryStream[(String, Long, java.sql.Timestamp)]
    val fs = DistinctCurve.firstSeenStream(
      stream.toDF().toDF("event_type", "user_id", "ts_t"),
      "event_type", "ts_t", "user_id", watermark = "0 seconds")
    val q = fs.writeStream.format("memory").queryName("fs_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      // sentinel batches: advance the watermark past every real day,
      // then let the finalization timers fire
      stream.addData(("zz", 99L, ts("2024-03-01 00:00:00"))); q.processAllAvailable()
      stream.addData(("zz", 99L, ts("2024-03-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("fs_sink").filter(col("grp") =!= "zz")
    val got = DistinctCurve.curveOf(sink, "event_type")
      .orderBy("event_type", "d")
      .as[(String, String, Long, Long)].collect().toSeq
    val batch = Analytics.runningDistinct(
      rows.toDF("event_type", "user_id", "ts_t"),
      "event_type", "ts_t", "user_id")
      .orderBy("event_type", "d")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === batch, s"stream=$got batch=$batch")
    // each key finalized exactly once per group
    val perKey = sink.groupBy("grp", "key").count()
      .filter(col("count") > 1).count()
    assert(perKey === 0L)
  }

  test("an out-of-order EARLIER day revises the candidate before finalization") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, java.sql.Timestamp)]
    val fs = DistinctCurve.firstSeenStream(
      stream.toDF().toDF("event_type", "user_id", "ts_t"),
      "event_type", "ts_t", "user_id", watermark = "10 days")
    val q = fs.writeStream.format("memory").queryName("fs_sink2")
      .outputMode(OutputMode.Append()).start()
    try {
      // first arrival says Jan-05; the TRUE first day Jan-02 arrives out
      // of order in a later batch, within the 10-day allowance
      stream.addData(("view", 7L, ts("2024-01-05 10:00:00")))
      q.processAllAvailable()
      stream.addData(("view", 7L, ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      // watermark march: two sentinel batches finalize the verdict
      stream.addData(("zz", 99L, ts("2024-02-01 00:00:00"))); q.processAllAvailable()
      stream.addData(("zz", 99L, ts("2024-02-02 00:00:00"))); q.processAllAvailable()
      stream.addData(("zz", 99L, ts("2024-02-03 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("fs_sink2").filter(col("grp") === "view")
      .select(date_format(timestamp_millis(col("dayMs")), "yyyy-MM-dd"),
        col("key"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("2024-01-02", 7L)),
      s"expected the revised earlier day, got $got")
  }
}
