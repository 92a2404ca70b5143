package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream-stream attribution joins within the gap, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.attributedPairs(
      clicks.toDF().toDF("user_id", "ts_t"),
      purchases.toDF().toDF("user_id", "ts_t"),
      "user_id", "ts_t", maxGap = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attr_s")
      .outputMode(OutputMode.Append()).start()
    try {
      // Click arrives first; its purchase arrives in a LATER micro-batch —
      // the join state must hold the click until then.
      clicks.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      purchases.addData(
        (1L, ts("2024-01-01 10:30:00")), // in window
        (1L, ts("2024-01-01 11:30:00")), // past maxGap — no pair
        (2L, ts("2024-01-01 09:59:00"))) // before the click — no pair
      q.processAllAvailable()
      // Arrival order is independent of event order: a click arriving
      // AFTER its purchase (and still above the watermark) must pair
      // against the purchase held in join state.
      clicks.addData((2L, ts("2024-01-01 09:45:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_s")
      .select(col("user_id"), expr("unix_micros(click_ts)"),
        expr("unix_micros(purchase_ts)"))
      .as[(Long, Long, Long)].collect().toSet
    def us(s: String) = ts(s).getTime * 1000L
    assert(got === Set(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:30:00")),
      (2L, us("2024-01-01 09:45:00"), us("2024-01-01 09:59:00"))))
  }

  test("parity: replayed stream pairs equal the batch range join") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 08:20:00")),
      (1L, ts("2024-01-01 09:50:00")), (3L, ts("2024-01-01 12:00:00")))
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.attributedPairs(
      clicks.toDF().toDF("user_id", "ts_t"),
      purchases.toDF().toDF("user_id", "ts_t"),
      "user_id", "ts_t", maxGap = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attr_par")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(rows: _*); purchases.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attr_par")
      .select(col("user_id"), expr("unix_micros(click_ts)"),
        expr("unix_micros(purchase_ts)"))
      .as[(Long, Long, Long)].collect().toSet
    val df = rows.toDF("user_id", "ts_t")
    val batch = df.select(col("user_id"), col("ts_t").as("click_ts"))
      .join(df.select(col("user_id"), col("ts_t").as("purchase_ts")),
        Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 hour"))
      .select(col("user_id"), expr("unix_micros(click_ts)"),
        expr("unix_micros(purchase_ts)"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === batch)
  }

  test("left-outer: unmatched clicks emit NULL rows only after the " +
    "watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.attributedPairsOuter(
      clicks.toDF().toDF("user_id", "ts_t"),
      purchases.toDF().toDF("user_id", "ts_t"),
      "user_id", "ts_t", maxGap = "1 hour", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")))
      purchases.addData((1L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      // The matched pair is out already; user 2's NULL row must NOT be —
      // its window is still open (a purchase could still arrive).
      val early = spark.table("attr_outer")
        .select("user_id", "unconverted")
        .as[(Long, Boolean)].collect().toSet
      assert(early === Set((1L, false)))
      // Advance BOTH watermarks far past click+maxGap: user 2's window
      // provably closed → exactly one watermark-closed NULL row.
      clicks.addData((9L, ts("2024-01-01 23:00:00")))
      purchases.addData((9L, ts("2024-01-01 23:00:00")))
      q.processAllAvailable()
      // one more cycle so the watermark advance evicts state
      clicks.addData((9L, ts("2024-01-01 23:30:00")))
      q.processAllAvailable()
    } finally q.stop()
    val late = spark.table("attr_outer")
      .filter(col("user_id") === 2L)
      .select("user_id", "unconverted").as[(Long, Boolean)].collect().toSeq
    assert(late === Seq((2L, true)))
  }
}
