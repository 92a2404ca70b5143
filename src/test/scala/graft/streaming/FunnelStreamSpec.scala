package graft.streaming

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Steps = Seq("view", "cart", "purchase")
  private val HourUs = 3600L * 1000000L
  private def ts(s: Long) = new java.sql.Timestamp((86400 + s) * 1000)
  private def us(s: Long) = (86400 + s) * 1000000L

  test("completions match the batch windowedFunnel's final stage") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // u1 completes in order; u2 skips cart; u3 buys outside the window;
    // u4 never views; u5 completes. Arrival is scrambled across batches
    // and within them — the watermark fold must not care. The lateness
    // allowance (2h) exceeds the scramble's worst-case event-time skew
    // (u3's +4000s purchase can land in batch 1), so no row drops late.
    val rows = Seq(
      (1L, "view", ts(0)), (1L, "cart", ts(60)), (1L, "purchase", ts(120)),
      (2L, "view", ts(0)), (2L, "purchase", ts(60)),
      (3L, "view", ts(0)), (3L, "cart", ts(30)), (3L, "purchase", ts(4000)),
      (4L, "cart", ts(0)), (4L, "purchase", ts(10)),
      (5L, "view", ts(0)), (5L, "cart", ts(100)), (5L, "purchase", ts(200)))
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = FunnelStream.completions(
      stream.toDF().toDF("user_id", "event_type", "ts_t"),
      "user_id", "ts_t", "event_type", Steps, HourUs, "2 hours")
      .writeStream.format("memory").queryName("funnel_par")
      .outputMode("append").start()
    try {
      val scrambled = new scala.util.Random(7).shuffle(rows)
      val (b1, b2) = scrambled.splitAt(6)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      // push the watermark far past every event so all verdicts finalize
      stream.addData((99L, "view", ts(20000))); q.processAllAvailable()
      stream.addData((99L, "view", ts(30000))); q.processAllAvailable()
      val got = spark.table("funnel_par").as[FunnelStream.Completion]
        .collect().map(c => c.user -> (c.startUs, c.endUs)).toMap
      assert(got.keySet === Set(1L, 5L))
      assert(got(1L) === ((us(0), us(120))))
      assert(got(5L) === ((us(0), us(200))))
      // batch parity: the final funnel stage holds exactly these users
      val batch = Analytics.windowedFunnel(
        rows.toDF("user_id", "event_type", "ts_t")
          .select(col("user_id"), unix_micros(col("ts_t")).as("ts_us"),
            col("event_type")),
        "user_id", "ts_us", "event_type", Steps, HourUs)
        .filter(col("step_idx") === 3).select("n_users").as[Long].head()
      assert(batch === got.size.toLong)
    } finally q.stop()
  }

  test("a late in-order step within the lateness allowance still completes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = FunnelStream.completions(
      stream.toDF().toDF("user_id", "event_type", "ts_t"),
      "user_id", "ts_t", "event_type", Steps, HourUs, "30 minutes")
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("append").start()
    try {
      stream.addData((1L, "view", ts(0)), (1L, "purchase", ts(120)))
      q.processAllAvailable()
      // the cart event arrives AFTER the purchase, in a later batch,
      // but its event time slots between view and purchase — the
      // buffered fold orders by event time, so the funnel completes
      stream.addData((1L, "cart", ts(60))); q.processAllAvailable()
      stream.addData((99L, "view", ts(10000))); q.processAllAvailable()
      stream.addData((99L, "view", ts(20000))); q.processAllAvailable()
      val got = spark.table("funnel_late").as[FunnelStream.Completion]
        .collect()
      assert(got.map(_.user).toSeq === Seq(1L))
      assert(got.head.startUs === us(0) && got.head.endUs === us(120))
    } finally q.stop()
  }

  test("an expired funnel evicts and the user re-enters fresh") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = FunnelStream.completions(
      stream.toDF().toDF("user_id", "event_type", "ts_t"),
      "user_id", "ts_t", "event_type", Steps, HourUs, "10 minutes")
      .writeStream.format("memory").queryName("funnel_reentry")
      .outputMode("append").start()
    try {
      // first funnel: view only, then silence past the window close
      stream.addData((1L, "view", ts(0))); q.processAllAvailable()
      stream.addData((99L, "view", ts(10000))); q.processAllAvailable()
      stream.addData((99L, "view", ts(11000))); q.processAllAvailable()
      // second episode, well past the first window: completes on its
      // own anchor — the re-entrant semantic the batch min-anchor
      // cannot express
      stream.addData((1L, "view", ts(12000)), (1L, "cart", ts(12060)),
        (1L, "purchase", ts(12120)))
      q.processAllAvailable()
      stream.addData((99L, "view", ts(30000))); q.processAllAvailable()
      stream.addData((99L, "view", ts(40000))); q.processAllAvailable()
      val got = spark.table("funnel_reentry")
        .as[FunnelStream.Completion].collect().filter(_.user == 1L)
      assert(got.map(c => (c.startUs, c.endUs)).toSeq ===
        Seq((us(12000), us(12120))))
    } finally q.stop()
  }
}
