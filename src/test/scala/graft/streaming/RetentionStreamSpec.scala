package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch-parity for the streaming twins of q94 (weekly churn) and q95
  * (rolling active): replay the same rows through the stream and the
  * batch plan; the finalized streaming output must agree. */
class RetentionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("weeklyChurnStream equals the batch anti-join on a replayed source") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: wk Jan-01 + Jan-08 (churns in Jan-08's week);
    // user 2: wk Jan-01 only (churns immediately);
    // user 3: wk Jan-01 and Jan-15 — a GAP: churns in Jan-01's week,
    //         then again in Jan-15's (reactivation then silence).
    val rows = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-04 10:00:00")), (3L, ts("2024-01-16 10:00:00")))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val churn = Retention.weeklyChurnStream(
      stream.toDF().toDF("user_id", "ts_t"), "user_id", "ts_t",
      watermark = "0 seconds")
    val q = churn.writeStream.format("memory").queryName("churn_s")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      // Two sentinel batches: the first advances the watermark past every
      // real user's churn deadline, the second lets the timeouts fire.
      stream.addData((99L, ts("2024-03-01 00:00:00"))); q.processAllAvailable()
      stream.addData((99L, ts("2024-03-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("churn_s")
      .select(date_format(timestamp_millis(col("weekStartMs")), "yyyy-MM-dd")
        .as("wk"), col("user"))
      .as[(String, Long)].collect().toSet
    // Batch q94 shape on the same rows (the final activity week of every
    // user trivially churns — no successor week exists).
    val wu = rows.toDF("user_id", "ts_t")
      .select(date_trunc("week", col("ts_t")).cast("date").as("wk"), col("user_id"))
      .distinct()
    val nxt = wu.select(col("wk").as("wk2"), col("user_id").as("uid2"))
    val batch = wu.join(nxt, wu("user_id") === nxt("uid2") &&
        date_add(wu("wk"), 7) === nxt("wk2"), "left_anti")
      .select(date_format(col("wk"), "yyyy-MM-dd"), col("user_id"))
      .as[(String, Long)].collect().toSet
    assert(got === batch, s"stream=$got batch=$batch")
  }

  test("churn verdicts wait for the watermark: a late intermediate week averts the gap churn") {
    implicit val sqlCtx = spark.sqlContext
    // user 7: weeks Jan-01 and Jan-15 arrive first — an apparent gap at
    // Jan-08 — then the Jan-08 event arrives OUT OF ORDER in a later
    // micro-batch, well inside the 30-day watermark allowance. Emitting
    // the gap churn on sight would publish an append-mode row that the
    // late event falsifies; the buffered verdict must wait and never
    // emit it. Only the final-week churn (Jan-15, silence after) stands.
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val churn = Retention.weeklyChurnStream(
      stream.toDF().toDF("user_id", "ts_t"), "user_id", "ts_t",
      watermark = "30 days")
    val q = churn.writeStream.format("memory").queryName("churn_late")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData((7L, ts("2024-01-02 10:00:00")),
        (7L, ts("2024-01-16 10:00:00"))); q.processAllAvailable()
      stream.addData((7L, ts("2024-01-09 10:00:00"))); q.processAllAvailable()
      // Sentinels push the watermark past every verdict boundary.
      stream.addData((99L, ts("2024-06-01 00:00:00"))); q.processAllAvailable()
      stream.addData((99L, ts("2024-06-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("churn_late")
      .select(date_format(timestamp_millis(col("weekStartMs")), "yyyy-MM-dd")
        .as("wk"), col("user"))
      .as[(String, Long)].collect().toSet
    assert(got === Set(("2024-01-15", 7L)), s"got=$got")
  }

  test("rollingActiveStream equals batch rollingActiveUsers on observed days") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-03 08:00:00")), (3L, ts("2024-01-05 08:00:00")),
      (1L, ts("2024-01-12 08:00:00")))
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val rolling = Retention.rollingActiveStream(
      stream.toDF().toDF("user_id", "ts_t"), "user_id", "ts_t",
      windowDays = 7, watermarkDays = 0)
    val q = rolling.writeStream.format("memory").queryName("roll_s")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      stream.addData((99L, ts("2024-03-01 00:00:00"))); q.processAllAvailable()
      stream.addData((99L, ts("2024-03-02 00:00:00"))); q.processAllAvailable()
    } finally q.stop()
    val batch = Analytics.rollingActiveUsers(rows.toDF("user_id", "ts_t"),
      "user_id", "ts_t", 7)
      .as[(String, Long)].collect().toMap
    // The stream emits every day in any 7-day window; the batch metric
    // reports observed days only — agreement is on that subset.
    val got = spark.table("roll_s").as[(String, Long)].collect().toMap
      .view.filterKeys(batch.contains).toMap
    assert(got === batch, s"stream=$got batch=$batch")
  }
}
