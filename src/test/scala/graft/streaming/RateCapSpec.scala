package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class RateCapSpec extends SparkSpec {
  import spark.implicits._

  // offset well past epoch: an epoch-0 window start collides with the
  // initial watermark's inclusive late filter
  private def ts(s: Long) = new java.sql.Timestamp((86400 + s) * 1000)

  test("per-key window cap admits k, labels the rest, state carries batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp, Long)]
    val labeled = RateCap.label(
      stream.toDF().toDF("src", "ts", "id"),
      "src", "ts", "id", windowDur = "1 hour", lateness = "2 hours",
      maxPerWindow = 2)
    val q = labeled.writeStream.format("memory")
      .queryName("ratecap").outputMode("append").start()
    try {
      // batch 1: key a sends 3 rows in one window -> 2 admitted (lowest
      // (ts, id) first), 1 capped; key b sends 1 -> admitted
      stream.addData(("a", ts(100), 3L), ("a", ts(50), 1L),
        ("a", ts(60), 2L), ("b", ts(70), 4L))
      q.processAllAvailable()
      // batch 2: same window, key a again -> the counter CARRIED, all
      // capped; a new window admits afresh
      stream.addData(("a", ts(200), 5L), ("a", ts(3700), 6L))
      q.processAllAvailable()
      val rows = spark.table("ratecap")
        .as[RateCap.Capped].collect().sortBy(r => (r.key, r.rowId)).toSeq
      val byId = rows.map(r => r.rowId -> r.admitted).toMap
      assert(byId(1L) === true && byId(2L) === true,
        "lowest (ts, id) rows admitted")
      assert(byId(3L) === false, "third row in the window capped")
      assert(byId(4L) === true, "other key unaffected")
      assert(byId(5L) === false, "counter must carry across batches")
      assert(byId(6L) === true, "new window admits afresh")
    } finally q.stop()
  }

  test("replayed micro-batch admits the same rows (in-batch total order)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same data in scrambled arrival order within one batch: the
    // (ts, id) sort makes the admitted set identical
    def run(data: Seq[(String, java.sql.Timestamp, Long)]): Map[Long, Boolean] = {
      val stream = MemoryStream[(String, java.sql.Timestamp, Long)]
      val name = "ratecap_" + math.abs(data.hashCode)
      val q = RateCap.label(stream.toDF().toDF("src", "ts", "id"),
        "src", "ts", "id", "1 hour", "2 hours", maxPerWindow = 1)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        stream.addData(data: _*); q.processAllAvailable()
        spark.table(name).as[RateCap.Capped].collect()
          .map(r => r.rowId -> r.admitted).toMap
      } finally q.stop()
    }
    val a = run(Seq(("x", ts(10), 1L), ("x", ts(20), 2L), ("x", ts(30), 3L)))
    val b = run(Seq(("x", ts(30), 3L), ("x", ts(10), 1L), ("x", ts(20), 2L)))
    assert(a === b)
    assert(a(1L) === true && a(2L) === false && a(3L) === false)
  }

  test("event-time timer evicts closed-window counters") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = RateCap.label(stream.toDF().toDF("src", "ts", "id"),
      "src", "ts", "id", "1 hour", "1 hour", maxPerWindow = 1)
      .writeStream.format("memory").queryName("ratecap_evict")
      .outputMode("append").start()
    def stateRows: Long = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    try {
      stream.addData(("a", ts(10), 1L)); q.processAllAvailable()
      val before = stateRows
      assert(before >= 1L, "window counter must be live")
      // jump the watermark far past W0's close; the eviction timer for
      // W0 fires on the following batch and clear()s its counter
      stream.addData(("a", ts(20000), 2L)); q.processAllAvailable()
      stream.addData(("a", ts(40000), 3L)); q.processAllAvailable()
      stream.addData(("a", ts(60000), 4L)); q.processAllAvailable()
      // windows seen: 4; evicted: at least W0 (and W1 by the last
      // watermark) — live state must be strictly below the window count
      assert(stateRows < 4L,
        s"closed-window counters never evicted: $stateRows rows")
      // behavior unaffected: every window admitted exactly its first row
      val admitted = spark.table("ratecap_evict")
        .as[RateCap.Capped].collect().filter(_.admitted).map(_.rowId).toSet
      assert(admitted === Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
