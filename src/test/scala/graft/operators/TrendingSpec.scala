package graft.operators

import graft.SparkSpec

class TrendingSpec extends SparkSpec {
  import spark.implicits._

  test("decayedEngagement: integer hyperbolic decay off the snapshot max") {
    val day = 86400000000L // µs
    val t0 = 1700000000000000L
    // Ages floor to whole days: 0.5d → 0 (full weight), 1d → 500000,
    // 3d → 250000.
    val events = Seq(
      ("a", t0), ("a", t0 - day / 2),
      ("b", t0 - day), ("b", t0 - 3 * day)).toDF("event_type", "ts_us")
    val got = Analytics.decayedEngagement(events, "event_type", "ts_us")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got("a") === ((2L, 2000000L)))
    assert(got("b") === ((2L, 750000L)))
  }

  test("decayedEngagement is invariant to input partitioning") {
    val events = (1L to 100L)
      .map(i => (s"t${i % 3}", 1700000000000000L - i * 7200000000L))
      .toDF("event_type", "ts_us")
    val a = Analytics.decayedEngagement(events, "event_type", "ts_us")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Analytics.decayedEngagement(events.repartition(7),
      "event_type", "ts_us")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
