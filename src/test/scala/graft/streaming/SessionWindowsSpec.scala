package graft.streaming

import graft.SparkSpec
import graft.operators.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch parity for the native-session_window streaming twin of q38:
  * replaying the same events must yield the same (user, session-start,
  * event-count) set the batch gaps-and-islands plan produces. */
class SessionWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streamed session_window stats equal batch sessionize on a replayed source") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: two morning events 10 min apart (one session), then a
    // third 80 min later (second session); user 2: a single event.
    // All gaps are far from the 30-min boundary (see SessionWindows
    // boundary note).
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 11:30:00")),
      (2L, ts("2024-01-01 10:05:00")))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = SessionWindows.sessionStats(
      stream.toDF().toDF("user_id", "ts_t"), "user_id", "ts_t",
      gap = "30 minutes", watermark = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_s")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      // Sentinels advance the watermark past every open session's close.
      stream.addData((99L, ts("2024-02-01 00:00:00"))); q.processAllAvailable()
      stream.addData((99L, ts("2024-02-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_s")
      .filter(col("user_id") =!= 99L) // sentinel sessions close too
      .select(col("user_id"), expr("unix_micros(session_start)"),
        col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val batch = Sessions.sessionize(
      rows.toDF("user_id", "ts_t")
        .withColumn("ts_us", expr("unix_micros(ts_t)"))
        .withColumn("event_id", col("ts_us")),
      "user_id", "ts_us", "event_id", gapUs = 30L * 60 * 1000000)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === batch, s"stream=$got batch=$batch")
    // And the end bound follows session_window's end-exclusive
    // convention: last event + gap.
    val ends = spark.table("sess_s")
      .filter(col("user_id") === 1L)
      .select(expr("unix_micros(session_end)")).as[Long].collect().toSet
    assert(ends === Set(
      ts("2024-01-01 10:40:00").getTime * 1000L,
      ts("2024-01-01 12:00:00").getTime * 1000L))
  }
}
