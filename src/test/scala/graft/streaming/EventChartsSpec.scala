package graft.streaming

import graft.SparkSpec
import graft.operators.Etl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventChartsSpec extends SparkSpec {
  import spark.implicits._
  import EventCharts._

  test("streaming weekly agg matches the batch weeklyAgg on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      ("click", java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1.0),
      ("click", java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 2.0),
      ("view",  java.sql.Timestamp.valueOf("2024-01-09 10:00:00"), 5.0))
    val stream = MemoryStream[(String, java.sql.Timestamp, Double)]
    stream.addData(rows: _*)
    val streaming = weeklyAggStream(
      stream.toDF().toDF("event_type", "ts_t", "value"), "ts_t", "event_type", "value")
    val q = streaming.writeStream.format("memory").queryName("wk_agg")
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("wk_agg")
      .select("wk", "event_type", "n", "sum_v", "avg_v")
      .as[(String, String, Long, Double, Double)].collect().toSet
    val batch = Etl.weeklyAgg(rows.toDF("event_type", "ts_t", "value"),
      "ts_t", "event_type", "value")
      .select("wk", "event_type", "n", "sum_v", "avg_v")
      .as[(String, String, Long, Double, Double)].collect().toSet
    assert(got == batch)
    assert(got.map(_._1) == Set("2024-01-01", "2024-01-08"))
  }

  test("session_window sessionization runs in append-mode streaming") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = graft.operators.Sessions.sessionWindowAgg(
      stream.toDF().toDF("user_id", "ts_t").withWatermark("ts_t", "1 hour"),
      "user_id", "ts_t", "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_s")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00")),  // same session
        (1L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"))) // new session
      q.processAllAvailable()
      // Advance the watermark past the sessions so append mode emits them.
      stream.addData((99L, java.sql.Timestamp.valueOf("2024-01-01 23:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_s")
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .filter(_._1 == 1L).toSet
    assert(got === Set((1L, 2L), (1L, 1L)))
  }

  test("stateful streaks: consecutive weeks accumulate, gaps reset") {
    val weekly = Seq(
      WeeklyScore(1L, 10L, 5.0), WeeklyScore(1L, 11L, 5.0), WeeklyScore(1L, 12L, 5.0),
      WeeklyScore(2L, 10L, 5.0), WeeklyScore(2L, 12L, 5.0)) // gap at 11
      .toDS()
    val got = streaks(weekly).collect().map(s => (s.entity, s.weekNum) -> s.streak).toMap
    assert(got((1L, 12L)) == 3)
    assert(got((2L, 12L)) == 1) // reset by the gap
  }

  test("stateful streaks carry state across streaming micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[WeeklyScore]
    val q = streaks(stream.toDS()).writeStream.format("memory")
      .queryName("streaks_t").outputMode(OutputMode.Append()).start()
    try {
      stream.addData(WeeklyScore(7L, 100L, 1.0)); q.processAllAvailable()
      stream.addData(WeeklyScore(7L, 101L, 1.0)); q.processAllAvailable()
      stream.addData(WeeklyScore(7L, 103L, 1.0)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("streaks_t").as[Streak].collect()
      .map(s => s.weekNum -> s.streak).toMap
    assert(got == Map(100L -> 1, 101L -> 2, 103L -> 1))
  }

  test("stateful streaks run identically on the RocksDB state store") {
    // The GraftSession.tune posture: per-entity state at 100 TB cardinality
    // must live off-heap. The suite session runs RocksDB by default (the
    // V2 stateful API needs its multi-column-family store); this test
    // pins that the progress metrics prove RocksDB actually held state.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[WeeklyScore]
    val q = streaks(stream.toDS()).writeStream.format("memory")
      .queryName("streaks_rocks").outputMode(OutputMode.Append()).start()
    try {
      stream.addData(WeeklyScore(7L, 100L, 1.0)); q.processAllAvailable()
      stream.addData(WeeklyScore(7L, 101L, 1.0)); q.processAllAvailable()
      stream.addData(WeeklyScore(7L, 103L, 1.0)); q.processAllAvailable()
      val metrics = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray[AnyRef](Array.empty[AnyRef]))
      assert(metrics.exists(_.toString.startsWith("rocksdb")),
        s"expected rocksdb state metrics, got: $metrics")
    } finally q.stop()
    val got = spark.table("streaks_rocks").as[Streak].collect()
      .map(s => s.weekNum -> s.streak).toMap
    assert(got == Map(100L -> 1, 101L -> 2, 103L -> 1))
  }

  test("declarative TTL evicts dormant streak state without a timeout callback") {
    // The V2-API payoff: state eviction is a PROPERTY of the state
    // variable, enforced by the store — no timer the processor could
    // forget to arm. With a TTL configured, maintenance micro-batches
    // keep the query from ever quiescing (processAllAvailable hangs), so
    // the spec polls the sink, SpendGuardSpec-style.
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[WeeklyScore]
    val q = streaks(stream.toDS(), ttl = Some(java.time.Duration.ofSeconds(2)))
      .writeStream.format("memory").queryName("streaks_ttl")
      .outputMode(OutputMode.Append()).start()
    def sink(): Map[Long, Int] = spark.table("streaks_ttl").as[Streak]
      .collect().map(s => s.weekNum -> s.streak).toMap
    def await(expected: Map[Long, Int]): Unit = {
      val deadline = System.nanoTime() + 90L * 1000000000L
      var cur = sink()
      while (cur != expected && System.nanoTime() < deadline) {
        Thread.sleep(200L); cur = sink()
      }
      assert(cur === expected)
    }
    try {
      stream.addData(WeeklyScore(9L, 200L, 1.0))
      await(Map(200L -> 1))
      stream.addData(WeeklyScore(9L, 201L, 1.0))
      await(Map(200L -> 1, 201L -> 2)) // live state: streak grows
      // go dormant past the TTL, then return with the CONSECUTIVE week:
      // a surviving state row would emit streak 3 — eviction means the
      // entity restarts at 1 even though 202 == 201 + 1
      Thread.sleep(3000L)
      stream.addData(WeeklyScore(9L, 202L, 1.0))
      await(Map(200L -> 1, 201L -> 2, 202L -> 1))
      // and the store itself reports the state row gone: a maintenance
      // batch after expiry counts zero live rows for the operator
      val deadline = System.nanoTime() + 90L * 1000000000L
      def zeroRows = q.recentProgress.lastOption.toSeq
        .flatMap(_.stateOperators.toSeq).exists(_.numRowsTotal == 0L)
      while (!zeroRows && System.nanoTime() < deadline) Thread.sleep(250L)
      assert(zeroRows, "state row count never dropped to zero after TTL")
    } finally q.stop()
  }
}
