package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000 // one minute in µs

  test("sessionize splits on inactivity gaps and aggregates bounds") {
    // user 1: events at 0, 10, 20 min (one session with gap=30m), then 90 min.
    val ev = Seq(
      (1L, 0 * M, 1L), (1L, 10 * M, 2L), (1L, 20 * M, 3L), (1L, 90 * M, 4L),
      (2L, 5 * M, 5L)
    ).toDF("user_id", "ts_us", "event_id")
    val out = Sessions.sessionize(ev, "user_id", "ts_us", "event_id", 30 * M)
      .orderBy("user_id", "session_idx")
      .collect()
    assert(out.length === 3)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") === 3)
    assert(s1.getAs[Long]("duration_us") === 20 * M)
    assert(out(1).getAs[Long]("n_events") === 1)
    assert(out(2).getAs[Long]("user_id") === 2L)
  }

  test("sessionize gap boundary: exactly `gap` keeps the session open") {
    val ev = Seq((1L, 0L, 1L), (1L, 30 * M, 2L), (1L, 30 * M + 30 * M + 1, 3L))
      .toDF("user_id", "ts_us", "event_id")
    val out = Sessions.sessionize(ev, "user_id", "ts_us", "event_id", 30 * M)
    assert(out.count() === 2) // 2nd event continues; 3rd (gap+1µs) starts anew
  }

  test("rolling avg over a RANGE window is exact fixed-point math") {
    val ev = Seq(
      (1L, 0 * M, 1L, 10.00), (1L, 3 * M, 2L, 20.00), (1L, 100 * M, 3L, 40.00)
    ).toDF("user_id", "ts_us", "event_id", "value")
    val out = Sessions.rollingAvg(ev, "user_id", "ts_us", "event_id", "value",
      windowUs = 5 * M)
      .orderBy("ts_us").select("roll_avg", "roll_n").as[(Double, Long)].collect()
    assert(out(0) === ((10.0, 1L)))
    assert(out(1) === ((15.0, 2L))) // event 1 is within 5 min
    assert(out(2) === ((40.0, 1L))) // window slid past both
  }

  test("native session_window agrees with gaps-and-islands sessionize") {
    val rnd = new scala.util.Random(11)
    // Random event times over ~6 hours; gap 30 min → several sessions/user.
    // Sub-second jitter keeps deltas off the exact-gap boundary, where the
    // two forms may legitimately differ (sessionize keeps delta == gap
    // in-session; session_window's interval end is exclusive).
    val rows = (1 to 300).map { i =>
      val us = rnd.nextInt(6 * 3600) * 1000000L + rnd.nextInt(999983)
      (rnd.nextInt(4).toLong, us, i.toLong)
    }
    val df = rows.toDF("user_id", "ts_us", "event_id")
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
    val gapUs = 30 * M
    val viaIslands = Sessions.sessionize(df, "user_id", "ts_us", "event_id", gapUs)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaWindow = Sessions.sessionWindowAgg(df, "user_id", "ts_t", "30 minutes")
      .select(col("user_id"),
        unix_micros(col("session_start")),
        unix_micros(col("session_end")) - lit(gapUs),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaWindow === viaIslands)
  }

  test("transitionCounts: bigrams per user in time order, id tiebreak") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      // same-ts tie: id order decides view→click, not click→view
      (2L, ts("2024-01-01 11:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 6L, "view")) // singleton: no bigram
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.transitionCounts(events, "user_id", "ts", "event_id",
      "event_type").as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("view", "click", 2L),
      ("click", "purchase", 1L)))
  }

  test("binned range join matches the naive O(n²) pair count") {
    val rnd = new scala.util.Random(7)
    val ev = (1 to 200).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong * M / 10, i.toLong)
    }
    val df = ev.toDF("user_id", "ts_us", "event_id")
    val w = 13 * M
    val binned = Sessions.rangeJoinPairCounts(df, "user_id", "ts_us", "event_id", w)
      .as[(Long, Long)].collect().toMap
    val naive = (for {
      a <- ev; b <- ev
      if a._1 == b._1 && a._3 < b._3 && math.abs(a._2 - b._2) <= w
    } yield a._1).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(binned === naive)
  }

  test("sessionPaths truncates at k and splits sessions on the gap") {
    import spark.implicits._
    val ev = Seq(
      // u1 session 1: three events in order; session 2 after the gap
      (1L, 0L, 1L, "view"), (1L, 60L, 2L, "click"), (1L, 120L, 3L, "purchase"),
      (1L, 100000L, 4L, "view"),
      // u2: one two-event session
      (2L, 0L, 5L, "view"), (2L, 50L, 6L, "click"),
      // u3: four events within the gap → path truncated to first 3
      (3L, 0L, 7L, "a"), (3L, 10L, 8L, "b"), (3L, 20L, 9L, "c"),
      (3L, 30L, 10L, "d"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Sessions.sessionPaths(ev, "user_id", "ts_us", "event_id",
      "event_type", gapUs = 1000L, k = 3, topN = 10)
      .collect().map(r => r.getAs[String]("path") ->
        r.getAs[Long]("n_sessions")).toMap
    assert(out === Map("view>click>purchase" -> 1L, "view" -> 1L,
      "view>click" -> 1L, "a>b>c" -> 1L))
  }

  test("lastTouchAttribution credits the latest prior view inside the window") {
    // (user, ts_us, id, type): u1 converts twice — once attributed to the
    // LATER of two prior views (gap 2M), once outside the window; u2
    // converts with no prior view; u3's view ties the purchase timestamp
    // (earlier id → counts, gap 0).
    val W = 10L * M
    val events = Seq(
      (1L, 0L * M, 1L, "view"), (1L, 3L * M, 2L, "view"),
      (1L, 5L * M, 3L, "purchase"),               // attributed, gap 2m
      (1L, 40L * M, 4L, "purchase"),              // gap 37m > 10m window
      (2L, 1L * M, 5L, "purchase"),               // no prior view
      (3L, 7L * M, 6L, "view"), (3L, 7L * M, 7L, "purchase")) // tie, gap 0
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val r = Sessions.lastTouchAttribution(events, "user_id", "ts_us",
      "event_id", "event_type", "view", "purchase", W).head()
    assert(r.getAs[Long]("n_conversions") === 4L)
    assert(r.getAs[Long]("n_attributed") === 2L)
    assert(r.getAs[Long]("attr_ppm") === 500000L)
    assert(r.getAs[Long]("avg_gap_us") === 1L * M) // (2m + 0) / 2
  }

  test("linearAttribution splits credit equally among in-window touches") {
    val D = 86400L * 1000000L
    // u1: views 1d and 3d before the purchase → 500000 ppm each;
    // u2: one view 10d before (outside 7d window) → no credit;
    // u3: three views same day → 333333 ppm each (floor).
    val events = Seq(
      (1L, 10L * D, 1L, "view"), (1L, 12L * D, 2L, "view"),
      (1L, 13L * D, 3L, "purchase"),
      (2L, 0L * D, 4L, "view"), (2L, 10L * D, 5L, "purchase"),
      (3L, 20L * D, 6L, "view"), (3L, 20L * D + 1L, 7L, "view"),
      (3L, 20L * D + 2L, 8L, "view"), (3L, 20L * D + 3L, 9L, "purchase"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.linearAttribution(events, "user_id", "ts_us",
      "event_id", "event_type", "view", "purchase", 7L * D)
      .collect().map(r => r.getAs[Long]("age_days") ->
        ((r.getAs[Long]("n_touches"), r.getAs[Long]("credit_ppm_sum")))).toMap
    // age 0: u3's three same-day views (3 × 333333); age 1: u1's 1d view;
    // age 3: u1's 3d view; u2 absent entirely.
    assert(got === Map(0L -> ((3L, 999999L)), 1L -> ((1L, 500000L)),
      3L -> ((1L, 500000L))))
  }

  test("lastTouchAttribution: zero conversions yields NULL rates") {
    val events = Seq((1L, 0L, 1L, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val r = Sessions.lastTouchAttribution(events, "user_id", "ts_us",
      "event_id", "event_type", "view", "purchase", 1000L).head()
    assert(r.getAs[Long]("n_conversions") === 0L)
    assert(r.isNullAt(r.fieldIndex("attr_ppm")))
    assert(r.isNullAt(r.fieldIndex("avg_gap_us")))
  }

  test("peakConcurrency: sweep finds the k-way overlap and its instant") {
    import org.apache.spark.sql.functions._
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 15L), (1L, 10L, 20L))
      .toDF("k", "st", "en")
    val got = Sessions.peakConcurrency(iv, col("k"), "st", "en").head()
    // runs: t0→1, t5→2, t10 (end first)→1 then 2, t15→1, t20→0;
    // peak 2 first attained at t=5
    assert(got.getAs[Long]("peak_concurrency") === 2L)
    assert(got.getAs[Long]("peak_at_us") === 5L)
    assert(got.getAs[Long]("n_intervals") === 3L)
  }

  test("peakConcurrency: back-to-back intervals never double-count") {
    import org.apache.spark.sql.functions._
    val iv = Seq((1L, 0L, 10L), (1L, 10L, 20L)).toDF("k", "st", "en")
    val got = Sessions.peakConcurrency(iv, col("k"), "st", "en").head()
    assert(got.getAs[Long]("peak_concurrency") === 1L)
    // partitioning invariance: integer sweep, any shard layout
    val re = Sessions.peakConcurrency(iv.repartition(7), col("k"),
      "st", "en").head()
    assert(re.getAs[Long]("peak_concurrency") === 1L)
    assert(re.getAs[Long]("peak_at_us") === got.getAs[Long]("peak_at_us"))
  }

  test("timeToConversion: day-quantized deltas, exact quartiles, rate") {
    val day = 86400L * 1000000L
    // users 1..4 view at day 0; users 1..3 purchase at days 1/2/9 (first
    // qualifying purchase counts — user 1 has a later one ignored, and a
    // pre-view purchase that must NOT count); user 4 never converts.
    val events = Seq(
      (1L, "view", 0L), (2L, "view", 0L), (3L, "view", 0L), (4L, "view", 0L),
      (1L, "purchase", -day),       // before the first view: ignored
      (1L, "purchase", 1L * day), (1L, "purchase", 5L * day),
      (2L, "purchase", 2L * day), (3L, "purchase", 9L * day),
      (5L, "purchase", 3L * day))   // converted but never viewed
      .toDF("user_id", "event_type", "ts_us")
    val r = Sessions.timeToConversion(events, "user_id", "ts_us",
      "event_type", "view", "purchase").collect()(0)
    assert(r.getAs[Long]("n_from") === 4L)
    assert(r.getAs[Long]("n_converted") === 3L)
    assert(r.getAs[Long]("conv_ppm") === 750000L)
    // deltas {1, 2, 9}: p50 = 2, p25 = 1.5, p75 = 5.5, p90 = 7.6
    assert(r.getAs[Double]("p50_days") === 2.0)
    assert(r.getAs[Double]("p25_days") === 1.5)
    assert(r.getAs[Double]("p75_days") === 5.5)
    assert(r.getAs[Double]("p90_days") === 7.6)
  }

  test("markovAttribution: hand-solved removal effects and shares") {
    // START→{view .5, click .5}; view→{CONV .5, NULL .5}; click→CONV 1.
    // Base absorption = .5·.5 + .5·1 = .75. Removing view: START→.5 NULL
    // →.5 click → .5; d=.25 → removal 333333 ppm, share 333333.
    // Removing click: START→.5 view→.5·.5 = .25; d=.5 → removal 666666,
    // share 666666.
    val ev = Seq(
      (1L, 0L, 10L, "view"), (1L, 1L, 11L, "purchase"),
      (2L, 0L, 20L, "view"),
      (3L, 0L, 30L, "click"), (3L, 1L, 31L, "purchase"),
      (4L, 0L, 40L, "click"), (4L, 1L, 41L, "purchase"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.markovAttribution(ev, "user_id", "ts_us",
      "event_id", "event_type", convChannel = "purchase", iters = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("base_conv_ppm"), r.getAs[Long]("removal_ppm"),
          r.getAs[Long]("share_ppm")))).toMap
    assert(got === Map(
      "view" -> ((750000L, 333333L, 333333L)),
      "click" -> ((750000L, 666666L, 666666L))))
    // events AFTER the first conversion are a converted user's afterlife:
    // appending a post-purchase click to u1 changes nothing
    val got2 = Sessions.markovAttribution(
      ev.unionByName(Seq((1L, 2L, 12L, "click"))
        .toDF("user_id", "ts_us", "event_id", "event_type")),
      "user_id", "ts_us", "event_id", "event_type",
      convChannel = "purchase", iters = 8)
      .collect().map(r => r.getString(0) ->
        r.getAs[Long]("removal_ppm")).toMap
    assert(got2 === Map("view" -> 333333L, "click" -> 666666L))
  }
  test("sequentialPairs: gap-tolerant order, repeats, session isolation") {
    // gap=100. u1: v@10,c@20,v@30 | p@200 (new session). u2: v@10,p@20.
    // Pairs: v>v (1<3), v>c (1<2), c>v (2<3), v>p (u2). p from u1's 2nd
    // session must NOT pair with session-1 types. Antecedent sessions:
    // v:2, c:1, p:2.
    val events = Seq(
      (1L, 10L, 1L, "v"), (1L, 20L, 2L, "c"), (1L, 30L, 3L, "v"),
      (1L, 200L, 4L, "p"), (2L, 10L, 5L, "v"), (2L, 20L, 6L, "p"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.sequentialPairs(events, "user_id", "ts_us",
      "event_id", "event_type", gapUs = 100L, minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_sessions"), r.getAs[Long]("conf_ppm"))).toSet
    assert(got === Set(("v", "v", 1L, 500000L), ("v", "c", 1L, 500000L),
      ("c", "v", 1L, 1000000L), ("v", "p", 1L, 500000L)))
  }

  test("entryExit: hand-built sessions, bounces, and exit-only types") {
    // user 1: [view, click] one session; [buy] a second (bounce);
    // user 2: [view] bounce — so entries view×2/buy×1, exits
    // click/buy/view ×1, click has entries 0 (exit-only type reports)
    val ev = Seq(
      (1L, 0L, 1L, "view"), (1L, 600L * 1000000, 2L, "click"),
      (1L, 7200L * 1000000, 3L, "buy"),
      (2L, 0L, 4L, "view"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val got = Sessions.entryExit(ev, "user_id", "ts_us", "event_id",
      "event_type", gapUs = 1800L * 1000000)
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got === Array(
      ("buy", 1L, 1L, 1L, 1000000L),
      ("click", 0L, 1L, 0L, 0L),
      ("view", 2L, 1L, 1L, 500000L)))
  }

  test("nextEventEval fits on even days, scores odd days, NULLs unseen froms") {
    val day = 86400L * 1000000L
    // user 1 on day 0 (even, TRAIN): a->b, b->a, a->b  → argmax(a)=b, argmax(b)=a
    // user 2 on day 1 (odd, EVAL): a->b (hit), b->c (miss)
    // user 3 on day 1: z->c — 'z' never trained → NULL prediction
    val ev = Seq(
      (1L, day * 0 + 1L, 1L, "a"), (1L, day * 0 + 2L, 2L, "b"),
      (1L, day * 0 + 3L, 3L, "a"), (1L, day * 0 + 4L, 4L, "b"),
      (2L, day * 1 + 1L, 5L, "a"), (2L, day * 1 + 2L, 6L, "b"),
      (2L, day * 1 + 3L, 7L, "c"),
      (3L, day * 1 + 1L, 8L, "z"), (3L, day * 1 + 2L, 9L, "c"))
      .toDF("u", "ts_us", "id", "ty")
    val got = Sessions.nextEventEval(ev, "u", "ts_us", "id", "ty")
      .orderBy("from_type").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === Seq(
      ("a", 2L, "b", 1L, 1L),   // trained a->b twice; eval hit
      ("b", 1L, "a", 1L, 0L),   // trained b->a; eval b->c missed
      ("z", 0L, "-", 1L, 0L)))  // never trained: NULL prediction
  }

  test("intervalOverlapJoin: exactly-once pairs, half-open endpoints, gate") {
    val a = Seq((1L, 0L, 25L), (2L, 30L, 35L), (3L, 5L, 6L))
      .toDF("id", "st", "en")
    val b = Seq((10L, 20L, 40L), (11L, 25L, 30L)).toDF("id", "st", "en")
    val got = Sessions.intervalOverlapJoin(a, "id", "st", "en",
      b, "id", "st", "en", binUs = 10L)
      .as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // A1 shares TWO candidate bins with B10 but lands once; the
    // A1/B11 endpoint touch at 25 is NOT an overlap (half-open)
    assert(got === Seq((1L, 10L, 5L, "overlaps"),
      (2L, 10L, 5L, "during")))
    // the nine-way Allen classification on hand-built shapes
    val shapes = Seq((20L, 0L, 10L), (21L, 0L, 4L), (22L, 0L, 20L),
      (23L, 6L, 10L), (24L, -2L, 10L), (25L, 3L, 7L), (26L, -5L, 15L),
      (27L, -5L, 5L), (28L, 5L, 15L)).toDF("id", "st", "en")
    val base = Seq((0L, 0L, 10L)).toDF("id", "st", "en")
    val rel = Sessions.intervalOverlapJoin(shapes, "id", "st", "en",
      base, "id", "st", "en", binUs = 10L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(rel === Map(20L -> "equals", 21L -> "starts",
      22L -> "started_by", 23L -> "finishes", 24L -> "finished_by",
      25L -> "during", 26L -> "contains", 27L -> "overlaps",
      28L -> "overlapped_by"))
    // an interval wider than maxBins bins refuses loudly
    intercept[Exception] {
      Sessions.intervalOverlapJoin(
        Seq((9L, 0L, 200L)).toDF("id", "st", "en"), "id", "st", "en",
        b, "id", "st", "en", binUs = 10L, maxBins = 10L).collect()
    }
  }
}
