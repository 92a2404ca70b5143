package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val clickRows = Seq(
    (1L, 100L, ts("2024-01-01 10:00:00")),
    (1L, 101L, ts("2024-01-01 12:00:00")),
    (2L, 102L, ts("2024-01-01 10:30:00")))
  private val purchaseRows = Seq(
    (1L, 900L, ts("2024-01-01 10:40:00"), 9.99),  // ← click 100 (40 min before)
    (1L, 901L, ts("2024-01-01 14:00:00"), 5.00),  // no click within 1h
    (2L, 902L, ts("2024-01-01 10:35:00"), 1.00))  // ← click 102

  private val expected = Set((900L, 100L), (902L, 102L))

  test("purchase attribution joins within the window (batch parity)") {
    val out = Joins.purchaseAttribution(
      clickRows.toDF("user_id", "click_id", "click_ts"),
      purchaseRows.toDF("user_id", "purchase_id", "purchase_ts", "amount"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(out === expected)
  }

  test("multi-touch: every qualifying click emits a row; last-touch is a batch dedup") {
    val clicks = Seq((1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 10:20:00")),
      (1L, 102L, ts("2024-01-01 10:40:00"))).toDF("user_id", "click_id", "click_ts")
    val purchases = Seq((1L, 900L, ts("2024-01-01 10:50:00"), 9.99))
      .toDF("user_id", "purchase_id", "purchase_ts", "amount")
    val touches = Joins.purchaseAttribution(clicks, purchases)
    assert(touches.count() === 3) // one row per touch, by contract
    val lastTouch = touches // the documented downstream policy
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("purchase_id")
          .orderBy(col("click_ts").desc)))
      .filter(col("rn") === 1)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(lastTouch === Set((900L, 102L)))
  }

  test("stream-stream attribution join matches batch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val joined = Joins.purchaseAttribution(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts", "amount"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(clickRows: _*)
      purchases.addData(purchaseRows.head)
      q.processAllAvailable()
      purchases.addData(purchaseRows.tail: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib").select("purchase_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("streaming dedup emits first arrival per key, dups dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = Joins.dedupStream(
      events.toDF().toDF("event_id", "ts", "payload"), "ts", "10 minutes",
      "event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_s")
      .outputMode(OutputMode.Append()).start()
    try {
      events.addData((1L, ts("2024-01-01 10:00:00"), "a"),
        (1L, ts("2024-01-01 10:00:30"), "a-dup"))
      q.processAllAvailable()
      events.addData((1L, ts("2024-01-01 10:01:00"), "a-dup2"),
        (2L, ts("2024-01-01 10:02:00"), "b"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_s").select("event_id", "payload")
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "b")))
  }
}
