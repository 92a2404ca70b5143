package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val sales = Seq(
    ("A", "x", 10.0), ("A", "x", 20.0), ("A", "y", 30.0), ("B", "x", 40.0)
  ).toDF("d1", "d2", "v")

  test("rollup2 emits leaf, subtotal and grand-total rows with ALL markers") {
    val out = Analytics.rollup2(sales, "d1", "d2", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out.contains(("A", "x", 2L, 30.0)))   // leaf
    assert(out.contains(("A", "ALL", 3L, 60.0))) // subtotal per d1
    assert(out.contains(("ALL", "ALL", 4L, 100.0))) // grand total
    assert(out.size === 6) // 3 leaves + 2 d1 subtotals + 1 grand total
  }

  test("pivotWeekly produces a zero-filled count column per declared category") {
    val ev = Seq(("2024-01-01", "click"), ("2024-01-01", "click"),
      ("2024-01-08", "view")).toDF("wk0", "event_type")
    val out = Analytics.pivotWeekly(ev, col("wk0"), "event_type",
      Seq("click", "view", "error"))
      .orderBy("wk").collect()
    assert(out(0).getAs[Long]("n_click") === 2L)
    assert(out(0).getAs[Long]("n_error") === 0L) // absent combo → 0, not null
    assert(out(1).getAs[Long]("n_view") === 1L)
  }

  test("quartiles interpolate linearly (quantile_cont semantics)") {
    val df = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4)).toDF("grp", "m")
    val r = Analytics.quartiles(df, "grp", "m").collect()(0)
    // sorted [1,2,3,4]: p25 at index 0.75 → 1.75; p50 → 2.5; p75 → 3.25
    assert(r.getAs[Double]("p25") === 1.75)
    assert(r.getAs[Double]("p50") === 2.5)
    assert(r.getAs[Double]("p75") === 3.25)
  }

  test("approx distinct tracks exact within rsd on realistic cardinality") {
    val ev = (1 to 5000).map(i => ("2024-01-01 00:00:00", (i % 937).toLong))
      .toDF("ts0", "user").withColumn("ts", col("ts0").cast("timestamp"))
    val exact = Analytics.weeklyActive(ev, "ts", "user")
      .select("n_active").as[Long].head()
    val approx = Analytics.weeklyActiveApprox(ev, "ts", "user", rsd = 0.02)
      .select("n_active").as[Long].head()
    assert(exact === 937L)
    assert(math.abs(approx - exact).toDouble / exact < 0.1) // rsd 2%, 5σ slack
  }

  test("approx quartiles bound rank error vs exact") {
    val df = (1 to 10000).map(i => ("g", i)).toDF("grp", "m")
    val ex = Analytics.quartiles(df, "grp", "m").collect()(0)
    val ap = Analytics.quartilesApprox(df, "grp", "m", accuracy = 1000).collect()(0)
    // rank error <= n/accuracy = 10 positions ~ 10 units here
    Seq("p25", "p50", "p75").foreach { c =>
      assert(math.abs(ap.getAs[Double](c) - ex.getAs[Double](c)) <= 15.0)
    }
  }

  test("count-min term-frequency sketch never undercounts, overcounts within eps·N") {
    val docs = (1 to 400).map { i =>
      // heavy hitter "alpha" everywhere, "beta" in half, tail terms unique
      val tail = s"tail$i uniq${i * 7}"
      if (i % 2 == 0) (s"alpha beta $tail") else (s"alpha $tail")
    }.toDF("text")
    val cms = Analytics.termFreqSketch(docs, "text", eps = 0.001, conf = 0.99)
    val est = Analytics.estimateTermCounts(spark, cms,
      Seq("alpha", "beta", "tail7", "absent"))
      .as[(String, Long)].collect().toMap
    val n = 400 * 3 + 200 // total token occurrences
    assert(est("alpha") >= 400L && est("alpha") <= 400L + n / 1000 + 1)
    assert(est("beta") >= 200L && est("beta") <= 200L + n / 1000 + 1)
    assert(est("tail7") >= 1L)
    assert(est("absent") <= n / 1000 + 1) // pure collision noise
  }

  test("topTerms counts tokens globally with deterministic tiebreak") {
    val docs = Seq("the cat the dog", "THE Cat", "").toDF("text")
    val out = Analytics.topTerms(docs, "text", 3)
      .as[(String, Long)].collect().toList
    assert(out === List(("the", 3L), ("cat", 2L), ("dog", 1L)))
  }

  test("rollingActiveUsers: trailing window over observed days only") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")),
      (2L, ts("2024-03-01 11:00:00")),
      (1L, ts("2024-03-02 10:00:00")),
      (3L, ts("2024-03-05 10:00:00")), // gap days 3-4 unobserved: no rows
      (1L, ts("2024-03-09 10:00:00"))) // day 1-2 users outside 7d window
      .toDF("user_id", "ts")
    val got = Analytics.rollingActiveUsers(events, "user_id", "ts", 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "2024-03-01" -> 2L, // users 1,2
      "2024-03-02" -> 2L, // users 1,2 (day 1 within [02-29, 03-02])
      "2024-03-05" -> 1L, // only user 3 (days 1-2 outside [03-03, 03-05])
      "2024-03-09" -> 1L)) // only user 1's day-9 event
  }

  test("profileNumeric: nulls, exact distincts, min/max; approx within rsd") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, 5.0), (2.0, null), (3.0, 5.0))
      .toDF("a", "b")
    val got = Analytics.profileNumeric(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a") === ((0L, 3L, 1.0, 3.0)))
    assert(got("b") === ((2L, 1L, 5.0, 5.0)))
    val approx = Analytics.profileNumericApprox(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx("a") === 3L && approx("b") === 1L) // tiny cardinality: exact
  }

  test("winsorizedStats clamps the spike into the p95 bound") {
    val df = (Seq.tabulate(19)(i => ("s", (i + 1).toDouble)) :+ ("s", 1000.0))
      .toDF("g", "v")
    val Array(r) = Analytics.winsorizedStats(df.toDF("g", "v"), "g", "v",
      0.05, 0.95).collect()
    val (n, lo, hi, wmean) =
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n === 20L)
    assert(lo > 1.0 && hi < 1000.0)
    // the spike contributes hi (≈68, the 19→1000 interpolation), not 1000:
    // the winsorized mean stays near the body vs the raw mean of 59.5
    assert(wmean < 14.0 && wmean > 9.0)
  }

  test("labelBalance: shares sum to 1, cumulative is monotone desc-count order") {
    val df = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq.fill(1)("z"))
      .toDF("label")
    val rows = Analytics.labelBalance(df, "label")
      .orderBy(col("cum_share"))
      .as[(String, Long, Double, Double)].collect().toList
    assert(rows.map(_._1) === List("x", "y", "z"))
    assert(rows.map(_._3) === List(0.6, 0.3, 0.1))
    assert(rows.map(_._4) === List(0.6, 0.9, 1.0))
  }

  test("labelBalance raises in-plan when cardinality exceeds maxLabels") {
    val df = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq.fill(1)("z"))
      .toDF("label")
    val ex = intercept[Exception] {
      Analytics.labelBalance(df, "label", maxLabels = 2L).collect()
    }
    assert(ex.getMessage.contains("not a label")
      || ex.getCause != null && ex.getCause.getMessage.contains("not a label"))
    // at the bound it must NOT fire
    assert(Analytics.labelBalance(df, "label", maxLabels = 3L)
      .count() === 3L)
  }

  test("madOutliers flags only the spike; degenerate (MAD=0) group flags nothing") {
    val df = (Seq.tabulate(20)(i => ("a", i.toLong, 100.0 + i)) :+
      ("a", 99L, 10000.0)) ++ // spike
      Seq.tabulate(10)(i => ("b", 200L + i, 5.0)) :+ // constant: MAD 0
      ("b", 299L, 50.0)
    val got = Analytics.madOutliers(df.toDF("g", "id", "v"), "g", "id", "v", 3.0)
      .select("id").as[Long].collect().toSet
    assert(got === Set(99L))
  }

  test("cohortRetention counts distinct users per cohort week and offset") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday wk0 cohort
      (1L, ts("2024-01-09 10:00:00")), // wk1
      (1L, ts("2024-01-10 11:00:00")), // wk1 again (distinct-counted once)
      (2L, ts("2024-01-03 10:00:00")), // wk0 cohort
      (3L, ts("2024-01-08 10:00:00"))) // cohorts in wk1
      .toDF("user_id", "ts")
    val got = Analytics.cohortRetention(events, "user_id", "ts")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L), // users 1,2 in their first week
      ("2024-01-01", 1L, 1L), // user 1 retained
      ("2024-01-08", 0L, 1L))) // user 3's own cohort
  }

  test("dimStats: exact fixed-point stats per dimension, including a dead dim") {
    // dim1 varies, dim2 is constant (dead), dim3 has negative values.
    val d = Seq(
      (1L, Array(0.1f, 0.5f, -0.2f)),
      (2L, Array(0.3f, 0.5f, -0.4f)),
      (3L, Array(0.2f, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val got = Analytics.dimStats(d, "embedding")
      .orderBy("dim")
      .select("dim", "n", "sum_q", "min_q", "max_q", "mean_milli", "var_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // quantized: dim1 (100,300,200), dim2 (500,500,500), dim3 (-200,-400,0)
    assert(got === Seq(
      (1L, 3L, 600L, 100L, 300L, 200L, 6667L),   // var = 20000/3 → 6667
      (2L, 3L, 1500L, 500L, 500L, 500L, 0L),     // dead dim: zero variance
      (3L, 3L, -600L, -400L, 0L, -200L, 26667L)))
  }

  test("sourceOverlap: identical vocab = 1.0, partial computes, disjoint absent") {
    val docs = Seq(
      ("a", "red green blue"), ("a", "red green"),
      ("b", "red green blue"),               // same vocab as a
      ("c", "red purple"),                   // 1 of 4 union terms with a
      ("d", "x9 y9")).toDF("source", "text") // disjoint vocab
    val got = Analytics.sourceOverlap(docs, "source", "text")
      .select("s1", "s2", "jaccard").as[(String, String, Double)]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    // disjoint pairs produce NO row (sparse matrix — same as the oracle)
    assert(got === Seq(("a", "b", 1.0), ("a", "c", 0.25), ("b", "c", 0.25)))
  }

  test("corrMatrix: perfect linear, anti-linear, and self-consistent pairs") {
    // b = 2a (r=+1), c = -a (r=-1); a-vs-d matches a hand-computed Pearson.
    val df = Seq(
      (1.0, 2.0, -1.0, 1.0),
      (2.0, 4.0, -2.0, 3.0),
      (3.0, 6.0, -3.0, 2.0),
      (4.0, 8.0, -4.0, 5.0))
      .toDF("a", "b", "c", "d")
    val m = Analytics.corrMatrix(df, Seq("a", "b", "c", "d"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(m(("a", "b")) === 1.0)
    assert(m(("a", "c")) === -1.0)
    assert(m(("b", "c")) === -1.0)
    // quantization is ×100, so these exact decimals are preserved; compare
    // against scala-side Pearson on the same values.
    val xs = Seq(1.0, 2.0, 3.0, 4.0); val ds = Seq(1.0, 3.0, 2.0, 5.0)
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ds.sum)
    val sxy = xs.zip(ds).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum; val syy = ds.map(y => y * y).sum
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(m(("a", "d")) - expected) < 1e-6)
    assert(m.size === 6)
  }

  test("userConcentration resolves marginal-level ties arithmetically") {
    // counts: one user at 10, four at 4, five at 1 → N=10 users, 31 events
    val events = (Seq.fill(10)(1L) ++
      (2L to 5L).flatMap(u => Seq.fill(4)(u)) ++
      (6L to 10L).map(identity)).toDF("user_id")
    val out = Analytics.userConcentration(events, "user_id",
      Seq(0.10, 0.30, 1.0))
      .collect().map(r => (r.getAs[Double]("pct"),
        (r.getAs[Long]("top_users"), r.getAs[Long]("top_events"),
          r.getAs[Long]("total_events"), r.getAs[Double]("share")))).toMap
    assert(out(0.10) === ((1L, 10L, 31L, 0.3226))) // whole top level
    // k=3 lands inside the c=4 level (4 tied users): 26 − (5−3)·4 = 18
    assert(out(0.30) === ((3L, 18L, 31L, 0.5806)))
    assert(out(1.0) === ((10L, 31L, 31L, 1.0)))
  }

  test("stickiness averages active days over the 7-day week") {
    // one ISO week: u1 active 3 distinct days (one day twice), u2 one day
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-03 10:00:00"),
      (2L, "2024-01-04 10:00:00"))
      .toDF("user_id", "ts0").select(col("user_id"),
        col("ts0").cast("timestamp").as("ts"))
    val r = Analytics.stickiness(ev, "user_id", "ts").collect()(0)
    assert(r.getAs[String]("week") === "2024-01-01")
    assert(r.getAs[Long]("wau") === 2L)
    assert(r.getAs[Long]("active_days") === 4L)
    assert(r.getAs[Double]("avg_days") === 2.0)
    assert(r.getAs[Double]("stickiness") === 0.2857) // 4 / 14
  }

  test("lexicalDiversity counts types, tokens and hapax per source") {
    val docs = Seq(("s1", "a a b"), ("s1", "a c"), ("s2", "x y"))
      .toDF("source", "text")
    val m = Analytics.lexicalDiversity(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Double]("ttr"))).toMap
    assert(m("s1") === ((5L, 3L, 2L, 0.6))) // a×3, b×1, c×1
    assert(m("s2") === ((2L, 2L, 2L, 1.0)))
  }

  test("windowedFunnel enforces step order AND the window from step one") {
    val week = 7L * 86400 * 1000000
    val ev = Seq(
      (1L, 0L, "signup"), (1L, 1000L, "click"), (1L, 2000L, "purchase"),
      (2L, 0L, "signup"), (2L, week + 1L, "click"), // click outside window
      (3L, 0L, "signup"), (3L, 500L, "click"), (3L, 400L, "purchase"),
      (4L, 0L, "click")) // no signup → never enters
      .toDF("user_id", "ts_us", "event_type")
    val out = Analytics.windowedFunnel(ev, "user_id", "ts_us", "event_type",
      Seq("signup", "click", "purchase"), week)
      .collect().map(r => r.getAs[String]("step") ->
        ((r.getAs[Long]("n_users"), r.getAs[Double]("conv")))).toMap
    assert(out("signup") === ((3L, 1.0)))
    assert(out("click") === ((2L, 0.6667)))   // u2's click is too late
    assert(out("purchase") === ((1L, 0.3333))) // u3 purchased before click
  }

  test("dailyAnomalies z-scores against the trailing observed days only") {
    // type x: days 1-8 alternate 1/2 events, day 9 spikes to 50
    val perDay = Seq(1, 2, 1, 2, 1, 2, 1, 2, 50)
    val ev = perDay.zipWithIndex.flatMap { case (n, i) =>
      (0 until n).map(j => (f"2024-01-${i + 1}%02d 10:00:${j % 60}%02d", "x"))
    }.toDF("ts0", "event_type")
      .select(col("ts0").cast("timestamp").as("ts"), col("event_type"))
    val rows = Analytics.dailyAnomalies(ev, "event_type", "ts",
      trailing = 28, minHistory = 7)
      .collect().map(r => r.getAs[String]("day") -> r).toMap
    assert(!rows.contains("2024-01-07")) // only 6 days of history
    val spike = rows("2024-01-09") // hist: [1,2]×4 → mean 1.5, sd 0.5
    assert(spike.getAs[Long]("n_hist") === 8L)
    assert(spike.getAs[Double]("mean_hist") === 1.5)
    assert(spike.getAs[Double]("z") === 97.0) // (50 − 1.5) / 0.5
  }

  test("columnHygiene counts nulls, distincts and flags constants per column") {
    val df = Seq((1L, Some("a"), "x"), (2L, None, "x"), (3L, Some("b"), "x"))
      .toDF("id", "s", "c")
    val got = Analytics.columnHygiene(df, Seq("id", "s", "c"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("id", 0L, 3L, 0L), // unique key: no nulls, all distinct
      ("s", 1L, 2L, 0L),  // one null; distinct counts non-null values
      ("c", 0L, 1L, 1L))) // constant column flagged
  }

  test("columnHygiene survives column names that need identifier quoting") {
    val df = Seq((1L, "p"), (2L, "p")).toDF("order-date", "a b")
    val got = Analytics.columnHygiene(df, Seq("order-date", "a b"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("order-date", 0L, 2L, 0L), ("a b", 0L, 1L, 1L)))
  }

  test("featureDrift bins both slices, clamps edges, accumulates exact L1") {
    // ref: 5→b0, 15,15→b1, 25→b2, 100→clamped b3 (refTot 5)
    // cur: 5,5→b0, -2→clamped b0, 35→b3 (curTot 4)
    val df = Seq((5.0, "r"), (15.0, "r"), (15.0, "r"), (25.0, "r"),
      (100.0, "r"), (5.0, "c"), (5.0, "c"), (35.0, "c"), (-2.0, "c"))
      .toDF("v", "side")
    val got = Analytics.featureDrift(df, "v",
      col("side") === "r", col("side") === "c", lo = 0.0, hi = 40.0, bins = 4)
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 1L, 3L, 0.2, 0.75, 0.55),
      (1L, 2L, 0L, 0.4, 0.0, 0.95),
      (2L, 1L, 0L, 0.2, 0.0, 1.15),
      (3L, 1L, 1L, 0.2, 0.25, 1.2)))
    // final cum_l1 is the full L1 distance: Σ|cur_frac − ref_frac| = 1.2
  }

  test("eventCooccurrence computes lift from distinct user-type pairs") {
    // u1: {a,b}, u2: {a,b}, u3: {a} → n_a=3, n_b=2, n_ab=2, N=3
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a")).toDF("user_id", "event_type")
    val r = Analytics.eventCooccurrence(ev, "user_id", "event_type")
      .collect()(0)
    assert((r.getAs[String]("t1"), r.getAs[String]("t2")) === (("a", "b")))
    assert(r.getAs[Long]("n_both") === 2L)
    assert(r.getAs[Double]("lift") === 1.0) // 2·3/(3·2)
  }

  test("kAnonymityRisk surfaces only groups under k") {
    import org.apache.spark.sql.functions.col
    // (us, gold) has 3 rows = safe at k=3; (us, free) 1 row and (de, gold)
    // 2 rows are risky.
    val df = Seq(("us", "gold"), ("us", "gold"), ("us", "gold"),
      ("us", "free"), ("de", "gold"), ("de", "gold"))
      .toDF("country", "tier")
    val got = Analytics.kAnonymityRisk(df, Seq(col("country"), col("tier")),
        Seq("c", "t"), 3L)
      .collect().map(r => (r.getAs[String]("c"), r.getAs[String]("t")) ->
        r.getAs[Long]("n_rows")).toMap
    assert(got === Map(("us", "free") -> 1L, ("de", "gold") -> 2L))
  }

  test("vocabGrowth counts vocabulary by first appearance at each prefix") {
    // doc 1: a b; doc 2: b c; doc 5: c d e — vocab at 1 → {a,b}=2,
    // at 2 → {a,b,c}=3, at 10 → {a,b,c,d,e}=5; tokens cumulate 2,4,7.
    val docs = Seq((1L, "a b"), (2L, "b c"), (5L, "c d e"))
      .toDF("doc_id", "text")
    val got = Analytics.vocabGrowth(docs, "doc_id", "text",
        checkpoints = Seq(1L, 2L, 10L))
      .orderBy("checkpoint")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 2L, 2L), (2L, 2L, 4L, 3L),
      (10L, 3L, 7L, 5L)))
    // a repeated-vocab corpus flattens: same words in every doc
    val flat = Seq((1L, "x y"), (2L, "x y"), (3L, "y x"))
      .toDF("doc_id", "text")
    val g2 = Analytics.vocabGrowth(flat, "doc_id", "text", Seq(1L, 3L))
      .orderBy("checkpoint").as[(Long, Long, Long, Long)].collect()
    assert(g2.map(_._4).toSeq === Seq(2L, 2L), "recycled corpus: vocab flat")
  }

  test("rfmSegments grades exact metrics into tie-broken tiers") {
    import org.apache.spark.sql.functions._
    // 4 users, 2 tiles: u1 recent+frequent+big, u4 stale+rare+small.
    val D = 86400L * 1000000L
    val events = Seq(
      (1L, 10L * D, 100.0), (1L, 11L * D, 100.0), (1L, 12L * D, 300.0),
      (2L, 9L * D, 50.0), (2L, 10L * D, 50.0),
      (3L, 5L * D, 20.0),
      (4L, 1L * D, 1.0))
      .toDF("user_id", "ts_us", "value")
    val out = Analytics.rfmSegments(events, "user_id", "ts_us", "value",
      refTsUs = 14L * D, tiles = 2)
      .collect().map(r => (r.getAs[Long]("r"), r.getAs[Long]("f"),
        r.getAs[Long]("m")) -> r.getAs[Long]("n_users")).toMap
    // ntile(2) over 4 users: ranks 1-2 → tier 1, ranks 3-4 → tier 2 on
    // every metric — u1,u2 grade (1,1,1) and u3,u4 grade (2,2,2).
    assert(out.values.sum === 4L)
    assert(out(((1L, 1L, 1L))) === 2L, s"best cell must hold u1,u2: $out")
    assert(out(((2L, 2L, 2L))) === 2L, s"worst cell must hold u3,u4: $out")
    // recency day arithmetic is exact floor division
    val row = Analytics.rfmSegments(events, "user_id", "ts_us", "value",
      refTsUs = 14L * D, tiles = 2)
      .filter(col("r") === 2 && col("f") === 2 && col("m") === 2).head()
    assert(row.getAs[Long]("max_recency_days") === 13L)
  }

  test("heavyHitters: MG bound holds under any partitioning, never overcounts") {
    import org.apache.spark.sql.functions._
    // N = 1000 tokens: "hot" x300, "warm" x150, 55 fillers x10 each.
    val words = Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 55).flatMap(i => Seq.fill(10)(s"f$i"))
    assert(words.size === 1000)
    val k = 9
    val bound = words.size / (k + 1) // = 100
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 3, 7)) {
      val docs = scala.util.Random.shuffle(words).grouped(40)
        .map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(parts)
      val got = Analytics.heavyHitters(docs, "text", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= k)
      // deterministic guarantees: anything above the bound IS present...
      for ((t, c) <- truth if c > bound)
        assert(got.contains(t), s"parts=$parts: $t (true $c) missing")
      // ...estimates never overcount and undercount by at most the bound
      for ((t, est) <- got) {
        assert(est <= truth(t), s"parts=$parts: $t overcounted")
        assert(est >= truth(t) - bound, s"parts=$parts: $t est $est < ${truth(t) - bound}")
      }
    }
  }

  test("varianceDecomposition: planted extremes hit eta2 ~ 1e6 and ~ 0") {
    // grouping explains EVERYTHING: constant within groups, distinct across
    val full = (Seq.fill(10)(("a", 1.0)) ++ Seq.fill(10)(("b", 9.0)))
      .toDF("g", "v")
    val r1 = Analytics.varianceDecomposition(full, "g", "v").collect()(0)
    assert(r1.getAs[Long]("n_groups") === 2L)
    assert(math.abs(r1.getAs[Long]("eta2_ppm") - 1000000L) <= 1L)
    // grouping explains NOTHING: identical distribution in both groups
    val none = (Seq.tabulate(10)(i => ("a", i.toDouble)) ++
      Seq.tabulate(10)(i => ("b", i.toDouble))).toDF("g", "v")
    val r2 = Analytics.varianceDecomposition(none, "g", "v").collect()(0)
    assert(math.abs(r2.getAs[Long]("eta2_ppm")) <= 2L,
      s"identical groups must explain ~0: ${r2.getAs[Long]("eta2_ppm")}")
    // degenerate: one group -> NULL readouts, not a crash
    val one = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val r3 = Analytics.varianceDecomposition(one, "g", "v").collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("eta2_ppm")))
    assert(r3.isNullAt(r3.fieldIndex("f_milli")))
  }

  test("chiSquare: planted dependence and independence extremes") {
    // perfectly dependent: a determines b -> chi2/N ~ (min(r,c)-1) = 1
    val dep = (Seq.fill(10)(("x", "1")) ++ Seq.fill(10)(("y", "2")))
      .toDF("a", "b")
    val r1 = Analytics.chiSquare(dep, "a", "b").collect()(0)
    assert(r1.getAs[Long]("dof") === 1L)
    // chi2 = N exactly here -> milli = 20 * 1000
    assert(math.abs(r1.getAs[Long]("chi2_milli") - 20000L) <= 4L)
    // perfectly independent: identical b-distribution for both a's
    val ind = (for (a <- Seq("x", "y"); b <- Seq("1", "2"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val r2 = Analytics.chiSquare(ind, "a", "b").collect()(0)
    assert(math.abs(r2.getAs[Long]("chi2_milli")) <= 4L)
    // single level: NULL screen
    val one = Seq(("x", "1"), ("x", "2")).toDF("a", "b")
    val r3 = Analytics.chiSquare(one, "a", "b").collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("chi2_milli")))
  }

  test("ksTest: identical distributions score 0, disjoint score 1e6") {
    import org.apache.spark.sql.functions._
    val same = (Seq.tabulate(20)(i => (true, i.toDouble)) ++
      Seq.tabulate(20)(i => (false, i.toDouble))).toDF("s", "value")
    val r1 = Analytics.ksTest(same, col("s"), "value").collect()(0)
    assert(r1.getAs[Long]("ks_ppm") === 0L)
    val disjoint = (Seq.tabulate(10)(i => (true, i.toDouble)) ++
      Seq.tabulate(10)(i => (false, 100.0 + i))).toDF("s", "value")
    val r2 = Analytics.ksTest(disjoint, col("s"), "value").collect()(0)
    assert(r2.getAs[Long]("ks_ppm") === 1000000L)
    // hand-computed middle case: A={1,2}, B={2,3}: D = 1/2
    val mid = Seq((true, 1.0), (true, 2.0), (false, 2.0), (false, 3.0))
      .toDF("s", "value")
    val r3 = Analytics.ksTest(mid, col("s"), "value").collect()(0)
    assert(r3.getAs[Long]("ks_ppm") === 500000L)
    // one empty side: NULL, not a crash
    val onesided = Seq((true, 1.0)).toDF("s", "value")
    val r4 = Analytics.ksTest(onesided, col("s"), "value").collect()(0)
    assert(r4.isNullAt(r4.fieldIndex("ks_ppm")))
  }

  test("theilSenSlope shrugs off the outlier that corrupts least squares") {
    val D = 86400L * 1000000L
    // series "s": one event on day d for d in 0..9 (slope 0 per day),
    // except day 9 carries a 500-event spike.
    val events = ((0L until 9L).map(d => ("s", d * D)) ++
      Seq.fill(500)(("s", 9L * D)))
      .toDF("event_type", "ts_us")
    val ls = Analytics.trendSlope(events, "event_type", "ts_us")
      .collect()(0).getAs[Long]("slope_ppm")
    val ts = Analytics.theilSenSlope(events, "event_type", "ts_us")
      .collect()(0)
    assert(ts.getAs[Long]("n_pairs") === 45L)
    // least squares is dragged far positive; the pairwise median is 0
    assert(ls > 10000000L, s"LS should chase the spike: $ls")
    assert(ts.getAs[Long]("median_slope_ppm") === 0L)
  }

  test("ksTest and rfmSegments are invariant to input partitioning") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val vals = (1L to 200L).map(i =>
      (i % 2 == 0, rnd.nextInt(500) / 100.0)).toDF("s", "value")
    val a = Analytics.ksTest(vals, col("s"), "value").collect()(0)
    val b = Analytics.ksTest(vals.repartition(9), col("s"), "value")
      .collect()(0)
    assert(a.getAs[Long]("ks_ppm") === b.getAs[Long]("ks_ppm"))
    val ev = (1L to 100L).map(i =>
      (i % 17, i * 1000000L, rnd.nextInt(300) / 100.0))
      .toDF("user_id", "ts_us", "value")
    def seg(df: org.apache.spark.sql.DataFrame) =
      Analytics.rfmSegments(df, "user_id", "ts_us", "value",
        refTsUs = 200000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          r.getAs[Long]("n_users")).toMap
    assert(seg(ev) === seg(ev.repartition(5)))
  }

  test("basketPairs: hand-computed support and lift, dedup within basket") {
    // baskets: {A,B}, {A,B}, {A,C}, {B} plus a duplicated line (A twice
    // in basket 1 must count once).
    val lines = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B")).toDF("basket", "item")
    val got = Analytics.basketPairs(lines, "basket", "item",
      minSupport = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // N=4 baskets; f(A)=3, f(B)=3, f(C)=1
    // (A,B): support 2, lift 2*4e6/(3*3) = 888888
    // (A,C): support 1, lift 1*4e6/(3*1) = 1333333
    assert(got === Map(("A", "B") -> ((2L, 888888L)),
      ("A", "C") -> ((1L, 1333333L))))
    // the support floor prunes the rare pair
    val floored = Analytics.basketPairs(lines, "basket", "item",
      minSupport = 2L, k = 10).collect().map(r =>
        (r.getString(0), r.getString(1))).toSet
    assert(floored === Set(("A", "B")))
  }

  test("spearman: planted monotone, anti-monotone, and tied extremes") {
    import org.apache.spark.sql.functions._
    val mono = (1 to 30).map(i => (i.toLong, (i * i).toLong)).toDF("x", "y")
    assert(Analytics.spearman(mono, "x", "y").collect()(0)
      .getAs[Double]("rho") === 1.0)
    val anti = (1 to 30).map(i => (i.toLong, (100 - i).toLong)).toDF("x", "y")
    assert(Analytics.spearman(anti, "x", "y").collect()(0)
      .getAs[Double]("rho") === -1.0)
    // constant column: undefined, NULL not crash
    val const = (1 to 10).map(i => (i.toLong, 5L)).toDF("x", "y")
    assert(Analytics.spearman(const, "x", "y").collect()(0)
      .isNullAt(1))
    // ties: midranks keep rho within [-1, 1] and partitioning-invariant
    val rnd = new scala.util.Random(41)
    val tied = (1 to 100).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(5).toLong)).toDF("x", "y")
    val a = Analytics.spearman(tied, "x", "y").collect()(0).getAs[Double]("rho")
    val b = Analytics.spearman(tied.repartition(7), "x", "y")
      .collect()(0).getAs[Double]("rho")
    assert(a === b && math.abs(a) <= 1.0)
  }

  test("spearman: null rows are excluded, not midrank-inflating") {
    import org.apache.spark.sql.functions._
    val clean = (1 to 20).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val noisy = clean.unionByName(Seq(
      (Option.empty[Long], Option(3L)), (Option(7L), Option.empty[Long]),
      (Option.empty[Long], Option.empty[Long]))
      .toDF("x", "y"))
    val a = Analytics.spearman(clean, "x", "y").collect()(0)
    val b = Analytics.spearman(noisy, "x", "y").collect()(0)
    assert(a.getAs[Long]("n_rows") === b.getAs[Long]("n_rows"))
    assert(a.getAs[Double]("rho") === b.getAs[Double]("rho"))
    assert(b.getAs[Double]("rho") === 1.0)
  }

  test("spearman: over-cardinality input errors instead of sorting") {
    val wide = (1 to 500).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val ex = intercept[Exception] {
      Analytics.spearman(wide, "x", "y", maxDistinct = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("quantize the metric")))
  }

  test("seasonalBacktest: exact weekly pattern scores zero seasonal MAE") {
    import org.apache.spark.sql.functions._
    val day = 86400L * 1000000L
    // series "w": y(d) = 10 + 5*(d%7) for d in 0..27 — perfectly weekly.
    // naive forecast (previous day) is wrong on every step of the ramp.
    val rows = for (d <- 0 until 28; r <- 0 until (10 + 5 * (d % 7)))
      yield ("w", d * day + r)
    val ev = rows.toDF("event_type", "ts_us")
    val got = Analytics.seasonalBacktest(ev, "event_type", "ts_us", k = 3)
      .collect()(0)
    // first forecastable day per dow = the 4th same-dow occurrence (d>=21),
    // 7 days; prev always present there
    assert(got.getAs[Long]("n_days") === 7L)
    assert(got.getAs[Long]("mae_milli_seasonal") === 0L)
    assert(got.getAs[Long]("mae_milli_naive") > 0L)
    // partitioning invariance: exact integers, any shard layout
    val re = Analytics.seasonalBacktest(ev.repartition(13), "event_type",
      "ts_us", k = 3).collect()(0)
    assert(re.getAs[Long]("mae_milli_naive") ===
      got.getAs[Long]("mae_milli_naive"))
  }

  test("acf: alternating series gives the hand-computed lag pattern") {
    val day = 86400L * 1000000L
    // y alternates 1,3 over days 0..9: dev = 10y-20 = ∓10; den = 1000.
    // lag1: 9 pairs × -100 = -900 → -0.9; lag2: 8 × +100 → 0.8;
    // lag3: 7 × -100 → -0.7.
    val rows = for (d <- 0 until 10; r <- 0 until (if (d % 2 == 0) 1 else 3))
      yield ("a", d * day + r)
    val got = Analytics.acf(rows.toDF("event_type", "ts_us"),
        "event_type", "ts_us", maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(got(1L) === ((9L, -0.9)))
    assert(got(2L) === ((8L, 0.8)))
    assert(got(3L) === ((7L, -0.7)))
  }

  test("acf: calendar gaps break pairs instead of misaligning them") {
    val day = 86400L * 1000000L
    // observed days 0,1,3: lag-1 pairs = {(0,1)} only — a row-lag
    // formulation would wrongly pair (1,3).
    val rows = Seq(0L, 1L, 3L).flatMap(d =>
      (0 until (d.toInt + 1)).map(r => ("a", d * day + r)))
    val got = Analytics.acf(rows.toDF("event_type", "ts_us"),
        "event_type", "ts_us", maxLag = 1).collect()(0)
    assert(got.getAs[Long]("n_pairs") === 1L)
    assert(got.getAs[Long]("n_days") === 3L)
  }

  test("cusumChangepoint: level shift lands on the pre-shift day, exact ppm") {
    val day = 86400L * 1000000L
    // y = 10 on days 0..3, 20 on days 4..7: cusum of 8y-120 peaks at
    // |−160| on day 3; ppm = 160e6 / 960 = 166666 (floor).
    val rows = for (d <- 0 until 8; r <- 0 until (if (d < 4) 10 else 20))
      yield ("a", d * day + r)
    val got = Analytics.cusumChangepoint(rows.toDF("event_type", "ts_us"),
      "event_type", "ts_us").collect()(0)
    assert(got.getAs[Long]("changepoint_day") === 3L)
    assert(got.getAs[Long]("cusum_ppm") === 166666L)
    assert(got.getAs[Long]("n_days") === 8L)
  }

  test("cusumSegments: two planted level shifts localize at both breaks") {
    val day = 86400L * 1000000L
    // rates 10 (days 0..5), 30 (days 6..11), 60 (days 12..17): the
    // global argmax lands at the stronger later break (day 11), the left
    // segment re-finds the earlier break (day 5); the right segment
    // (constant 60) still reports ITS argmax with a near-zero ppm.
    val rows = for {
      d <- 0 until 18
      rate = if (d < 6) 10 else if (d < 12) 30 else 60
      r <- 0 until rate
    } yield ("a", d * day + r)
    val got = Analytics.cusumSegments(rows.toDF("event_type", "ts_us"),
      "event_type", "ts_us").collect()(0)
    assert(got.getAs[Long]("changepoint_day") === 11L)
    assert(got.getAs[Long]("left_day") === 5L)
    assert(got.getAs[Long]("cusum_ppm") > got.getAs[Long]("right_ppm"))
    assert(got.getAs[Long]("left_ppm") > got.getAs[Long]("right_ppm"))
  }

  test("cusumSegments: a single-day side yields NULL sub-break") {
    val day = 86400L * 1000000L
    // 3 days, rates 10/10/50: break at day 1 → left side {0,1}, right
    // side {2} (one day → NULL right sub-break).
    val rows = for {
      d <- 0 until 3
      rate = if (d < 2) 10 else 50
      r <- 0 until rate
    } yield ("a", d * day + r)
    val got = Analytics.cusumSegments(rows.toDF("event_type", "ts_us"),
      "event_type", "ts_us").collect()(0)
    assert(got.getAs[Long]("changepoint_day") === 1L)
    assert(got.isNullAt(got.fieldIndex("right_day")))
    assert(got.getAs[Long]("left_day") >= 0L) // two-day side still reports
  }

  test("fanoFactor: constant series reads 0, planted burst inflates") {
    val day = 86400L * 1000000L
    // series "flat": 5 every day for 8 days → Var 0 → F = 0.
    // series "burst": {1,1,1,1,1,1,1,25}: n=8, S=32, Q=632 →
    // F = (8·632 − 1024)·1e6 // (8·32) = 4032e6 // 256 = 15750000.
    val rows =
      (0 until 8).flatMap(d => Seq.fill(5)(("flat", d * day))) ++
      (0 until 7).map(d => ("burst", d * day)) ++
      Seq.fill(25)(("burst", 7L * day))
    val got = Analytics.fanoFactor(rows.toDF("event_type", "ts_us"),
        "event_type", "ts_us")
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("fano_ppm")).toMap
    assert(got("flat") === 0L)
    assert(got("burst") === 15750000L)
  }

  test("logRankCore: identical cohorts give exactly zero z") {
    // Same lifetime multiset in both groups: at every event time
    // n1 = n0 and d1 = d0, so O1 = E1 EXACTLY and z = 0.
    val life = Seq(
      (1L, 0L, 1L), (3L, 0L, 1L), (5L, 1L, 1L),
      (1L, 0L, 0L), (3L, 0L, 0L), (5L, 1L, 0L))
      .toDF("t", "cens", "g1")
    val r = Analytics.logRankCore(life).collect()(0)
    assert(r.getAs[Long]("o1_events") === 2L)
    assert(r.getAs[Long]("e1_micro") === 2000000L)
    assert(r.getAs[Long]("z_milli") === 0L)
    assert(r.getAs[Long]("significant_05") === 0L)
  }

  test("logRankCore: hand-computed risk table, early-death cohort flags") {
    // g1 subjects all die at t=1 (×12); g0 all die at t=9 (×12).
    // t=1: n1=n0=12, d=12 → E-share 6, V = 12·144·12/(24²·23) = 1.565...
    // t=9: only g0 at risk → contributes 0 to O−E and V (n1 = 0).
    val life = (1 to 12).map(_ => (1L, 0L, 1L)) ++
      (1 to 12).map(_ => (9L, 0L, 0L))
    val r = Analytics.logRankCore(life.toDF("t", "cens", "g1")).collect()(0)
    assert(r.getAs[Long]("o1_events") === 12L)
    assert(r.getAs[Long]("e1_micro") === 6000000L) // E1 = 6 exactly
    // V = 12·12·12·12/(24·24·23) = 20736/13248 = 1.565217...
    assert(r.getAs[Long]("v_micro") === 1565217L)
    // z = (12 − 6)/sqrt(1.565217) = 4.7958 → 4796 milli, significant
    assert(r.getAs[Long]("z_milli") === 4796L)
    assert(r.getAs[Long]("significant_05") === 1L)
  }

  test("logRank: no events (all censored) yields NULL z") {
    val day = 86400L * 1000000L
    // every user active on the final day → all censored at censorDays=7
    val rows = (1L to 10L).flatMap(u => Seq((u, 0L), (u, 5L * day)))
    val r = Analytics.logRank(rows.toDF("user_id", "ts_us"),
      "user_id", "ts_us", censorDays = 7).collect()(0)
    assert(r.getAs[Long]("n_event_times") === 0L)
    assert(r.isNullAt(r.fieldIndex("z_milli")))
  }

  test("ols2: planted exact relation recovers integer coefficients") {
    val day = 86400L * 1000000L
    // daily x (views) = d+1, z (clicks) = (d*3) % 7 + 1,
    // y (purchases) = 2x + 3z + 5 exactly, 12 days.
    val rows = (0 until 12).flatMap { d =>
      val x = d + 1
      val z = (d * 3) % 7 + 1
      val y = 2 * x + 3 * z + 5
      Seq.fill(x)(("view", d * day)) ++ Seq.fill(z)(("click", d * day)) ++
        Seq.fill(y)(("purchase", d * day))
    }
    val r = Analytics.ols2(rows.toDF("event_type", "ts_us"),
      "ts_us", "event_type", "purchase", "view", "click").collect()(0)
    assert(r.getAs[Long]("n_days") === 12L)
    assert(r.getAs[Long]("beta_x_ppm") === 2000000L)
    assert(r.getAs[Long]("beta_z_ppm") === 3000000L)
    assert(r.getAs[Long]("intercept_milli") === 5000L)
  }

  test("ols2: collinear covariates yield NULL, never a fabricated fit") {
    val day = 86400L * 1000000L
    // z = 2x exactly on every day → det = 0.
    val rows = (0 until 6).flatMap { d =>
      val x = d + 1
      Seq.fill(x)(("view", d * day)) ++ Seq.fill(2 * x)(("click", d * day)) ++
        Seq.fill(3)(("purchase", d * day))
    }
    val r = Analytics.ols2(rows.toDF("event_type", "ts_us"),
      "ts_us", "event_type", "purchase", "view", "click").collect()(0)
    assert(r.isNullAt(r.fieldIndex("beta_x_ppm")))
    assert(r.isNullAt(r.fieldIndex("beta_z_ppm")))
    assert(r.isNullAt(r.fieldIndex("intercept_milli")))
  }

  test("kmvOverlap: exact when the union fits in k; tracks true Jaccard") {
    // Small vocabularies (union < k): the estimate IS exact Jaccard.
    // a: {x1..x6}, b: {x4..x9} → inter 3, union 9 → 333333 ppm.
    val docs = Seq(
      ("a", (1 to 6).map(i => s"x$i").mkString(" ")),
      ("b", (4 to 9).map(i => s"x$i").mkString(" ")))
      .toDF("source", "text")
    val r = Analytics.kmvOverlap(docs, "source", "text", k = 64)
      .collect()(0)
    assert(r.getAs[String]("s1") === "a" && r.getAs[String]("s2") === "b")
    assert(r.getAs[Long]("k_used") === 9L)
    assert(r.getAs[Long]("n_both") === 3L)
    assert(r.getAs[Long]("jaccard_est_ppm") === 333333L)
    // Large vocabularies: sketch estimate within KMV error of truth.
    // 600 shared + 200 each unique → J = 600/1000 = 0.6.
    val big = Seq(
      ("a", ((1 to 600).map(i => s"s$i") ++ (1 to 200).map(i => s"a$i"))
        .mkString(" ")),
      ("b", ((1 to 600).map(i => s"s$i") ++ (1 to 200).map(i => s"b$i"))
        .mkString(" ")))
      .toDF("source", "text")
    val e = Analytics.kmvOverlap(big, "source", "text", k = 64)
      .collect()(0)
    assert(e.getAs[Long]("k_used") === 64L)
    val est = e.getAs[Long]("jaccard_est_ppm")
    assert(est > 400000L && est < 800000L, s"estimate $est vs true 600000")
  }

  test("zipfProfile: exact log2 buckets with deterministic witnesses") {
    // freqs: "a"×1, "b"×2, "c"×3, "d"×8 → buckets 0, 1, 1, 3.
    val text = "a " + "b b " + "c c c " + ("d " * 8)
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Analytics.zipfProfile(docs, "text")
      .orderBy("bucket")
      .select("bucket", "n_terms", "n_occurrences", "min_term")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (0L, 1L, 1L, "a"),   // f = 1
      (1L, 2L, 5L, "b"),   // f in [2, 4): b(2) + c(3)
      (3L, 1L, 8L, "d")))  // f = 8 lands exactly on the 2^3 threshold
  }

  test("kendallTau: perfect order, reversal, and tie handling") {
    val mono = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("x", "y")
    val up = Analytics.kendallTau(mono, "x", "y").collect()(0)
    assert(up.getAs[Long]("n_pairs") === 6L)
    assert(up.getAs[Long]("concordant") === 6L)
    assert(up.getAs[Double]("tau_b") === 1.0)
    val down = Analytics.kendallTau(
      mono.withColumn("y", -col("y")), "x", "y").collect()(0)
    assert(down.getAs[Double]("tau_b") === -1.0)
    // one x-tie: C=2, D=0, Tx=1 → tau_b = 2/(sqrt(2)*sqrt(3))
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val t = Analytics.kendallTau(tied, "x", "y").collect()(0)
    assert(t.getAs[Long]("concordant") === 2L)
    assert(t.getAs[Long]("discordant") === 0L)
    assert(t.getAs[Double]("tau_b") ===
      BigDecimal(2.0 / (math.sqrt(2.0) * math.sqrt(3.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("kendallTau: over-cardinality input errors instead of pairing") {
    val wide = (1 to 300).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val ex = intercept[Exception] {
      Analytics.kendallTau(wide, "x", "y", maxRows = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("bounded substrate")))
  }

  test("timeWeightedAvg: trapezoid weighs holds by duration") {
    // 1.00 for 10s then 3.00 for 20s: integral avg = 80/30 = 2.66 (floor
    // centi) — a plain AVG of the three samples says 2.33.
    val ev = Seq(("g", 0L, 1L, 1.0), ("g", 10000000L, 2L, 3.0),
      ("g", 30000000L, 3L, 3.0)).toDF("s", "t", "id", "v")
    val got = Analytics.timeWeightedAvg(ev, "s", "t", "id", "v").collect()(0)
    assert(got.getAs[Long]("n_events") === 3L)
    assert(got.getAs[Long]("span_us") === 30000000L)
    assert(got.getAs[Long]("twa_centi") === 266L)
    // zero span → NULL, not a division error
    val one = Seq(("h", 5L, 1L, 2.0)).toDF("s", "t", "id", "v")
    val z = Analytics.timeWeightedAvg(one, "s", "t", "id", "v").collect()(0)
    assert(z.isNullAt(z.fieldIndex("twa_centi")))
  }

  test("seasonalAnomaly: only the planted spike flags on a weekly-cyclic series") {
    val day = 86400L * 1000000L
    // perfect weekly shape 10 + 5·dow for 6 weeks, except day 30 spikes
    // 4×. A raw daily screen would flag every high-dow day; the
    // seasonal-adjusted screen must flag ONLY the spike.
    val rows = for {
      d <- 0 until 42
      base = 10 + 5 * (d % 7)
      y = if (d == 30) base * 4 else base
      r <- 0 until y
    } yield ("w", d * day + r)
    val got = Analytics.seasonalAnomaly(rows.toDF("event_type", "ts_us"),
      "event_type", "ts_us", k = 3, madK = 3.0).collect()
    // day 30 is the spike itself; day 37 (same weekday, one week later)
    // flags because the spike CONTAMINATES its trailing forecast window —
    // the echo a seasonal screen is expected to show. No clean high-dow
    // day flags, which is the point vs a raw daily screen.
    assert(got.map(_.getAs[Long]("day")).toSeq.sorted === Seq(30L, 37L))
    val spike = got.find(_.getAs[Long]("day") == 30L).get
    assert(spike.getAs[Long]("expected") === 10L + 5 * (30 % 7))
    assert(spike.getAs[Long]("residual") > 0)
    assert(got.find(_.getAs[Long]("day") == 37L).get
      .getAs[Long]("residual") < 0)
  }

  test("cohortLtv: hand-computed cumulative centi-value per cohort") {
    val wk = 7 * 86400L * 1000000L
    // u1 joins week 0 (spends 1.00 then 2.00 in week 1); u2 joins week 1
    // (spends 10.00). Cohort 0: week0 100c, week1 cum 300c over 1 user;
    // cohort 1: 1000c over 1 user.
    val ev = Seq((1L, 0L, 1.0), (1L, wk, 2.0), (2L, wk, 10.0))
      .toDF("user_id", "ts_us", "value")
    val got = Analytics.cohortLtv(ev, "user_id", "ts_us", "value")
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("weeks_since")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("cum_cents"),
          r.getAs[Long]("ltv_centi_per_user")))).toMap
    assert(got === Map(
      (0L, 0L) -> ((1L, 100L, 100L)),
      (0L, 1L) -> ((1L, 300L, 300L)),
      (1L, 0L) -> ((1L, 1000L, 1000L))))
  }

  test("lDiversityRisk: homogeneous group flags at full share; diverse passes") {
    // group A: 4 rows, one sensitive value (k-anonymous at k=4, still
    // leaks); group B: 4 rows, 3 distinct values (passes l=3)
    val rows = Seq(("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L),
      ("B", 1L), ("B", 2L), ("B", 3L), ("B", 3L))
      .toDF("grp", "sv")
    val got = Analytics.lDiversityRisk(rows, Seq(col("grp")), Seq("g"),
      col("sv"), l = 3L).collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "A")
    assert(got(0).getAs[Long]("n_rows") === 4L)
    assert(got(0).getAs[Long]("n_sensitive") === 1L)
    assert(got(0).getAs[Long]("top_share_ppm") === 1000000L)
  }

  test("tClosenessRisk: cleared-denominator EMD flags the skewed group only") {
    // bands {1,2}; global = 7:1. A (n=2) splits 1:1 → |0.5-0.875| =
    // 0.375; B (n=6) is all band-1 → |1-0.875| = 0.125. Integral:
    // A |1·8-7·2| = 6 → 6e6 div (2·8·1) = 375000; B |6·8-7·6| = 6 →
    // 6e6 div (6·8·1) = 125000.
    val rows = (Seq(("A", 1L), ("A", 2L)) ++
      Seq.fill(6)(("B", 1L))).toDF("grp", "band")
    val got = Analytics.tClosenessRisk(rows, Seq(col("grp")), Seq("g"),
      col("band"), tPpm = 200000L).collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("g") === "A")
    assert(got(0).getAs[Long]("n_rows") === 2L)
    assert(got(0).getAs[Long]("emd_ppm") === 375000L)
    val all = Analytics.tClosenessRisk(rows, Seq(col("grp")), Seq("g"),
      col("band"), tPpm = -1L).collect().map(r =>
        r.getAs[String]("g") -> r.getAs[Long]("emd_ppm")).toMap
    assert(all === Map("A" -> 375000L, "B" -> 125000L))
  }

  test("ljungBox: hand-computed Q; degenerate and short series NULL") {
    val day = 86400L * 1000000L
    // "g" counts (1,2,1,2,1): dev = (-2,3,-2,3,-2), den = 30,
    // rho = (-0.8, 0.566667, -0.4) after round-6.
    val g = for ((c, d) <- Seq(1, 2, 1, 2, 1).zipWithIndex; r <- 0 until c)
      yield ("g", d * day + r)
    // "h" constant → zero denominator → NULL; "s" only 3 days → NULL.
    val h = for (d <- 0 until 4) yield ("h", d * day)
    val sShort = for ((c, d) <- Seq(1, 2, 1).zipWithIndex; r <- 0 until c)
      yield ("s", d * day + r)
    val got = Analytics.ljungBox((g ++ h ++ sShort)
      .toDF("event_type", "ts_us"), "event_type", "ts_us", maxLag = 3)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    val raw = 5L * 7L *
      (0.8 * 0.8 / 4 + 0.566667 * 0.566667 / 3 + 0.4 * 0.4 / 2)
    val expected = new java.math.BigDecimal(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    assert(got("g") === expected)
    assert(got("h") === null)
    assert(got("s") === null)
  }

  test("kruskalWallis: hand-computed midrank H and tie-corrected H") {
    // A={1,2,3}, B={2,3,4}: r2 = (2,5,9,12); S_A=16, S_B=26;
    // st = 256 div 3 + 676 div 3 = 310; H = 3000·310 div 42 − 21000
    // = 1142; ties Σ(t³−t)=12, N³−N=210 → Hc = 1142·210 div 198 = 1211.
    val rows = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 2.0), ("B", 3.0), ("B", 4.0)).toDF("grp", "v")
    val got = Analytics.kruskalWallis(rows, "grp", "v").collect()(0)
    assert(got.getAs[Long]("n_rows") === 6L)
    assert(got.getAs[Long]("n_groups") === 2L)
    assert(got.getAs[Long]("h_milli") === 1142L)
    assert(got.getAs[Long]("hc_milli") === 1211L)
  }

  test("kruskalWallis: fully-tied input clamps H at 0, Hc is NULL") {
    val rows = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0))
      .toDF("grp", "v")
    val got = Analytics.kruskalWallis(rows, "grp", "v").collect()(0)
    assert(got.getAs[Long]("h_milli") === 0L)
    assert(got.isNullAt(got.fieldIndex("hc_milli")))
  }

  test("ewmaBacktest: hand-computed dyadic forecast; gaps unscore days") {
    val day = 86400L * 1000000L
    // window=2: S_t = y_{t-1}·2 + y_{t-2}, fc = S div 3.
    // "g": days 0,1,2,3 with y = 3,6,9,3.
    //   day2: S=6·2+3=15, fc=5, |9-5|=4; naive |9-6|=3
    //   day3: S=9·2+6=24, fc=8, |3-8|=5; naive |3-9|=6
    //   MAE milli: ewma (4+5)*1000 div 2 = 4500; naive (3+6)*1000 div 2 = 4500
    val g = for (dy <- Seq((0, 3), (1, 6), (2, 9), (3, 3)); r <- 0 until dy._2)
      yield ("g", dy._1 * day + r)
    // "h" has a GAP at day 1: days 0,2,3 → only day 3 scores (lags = days
    // 2 and 0 by OBSERVED order): S=4·2+2=10, fc=3, |8-3|=5
    val h = for (dy <- Seq((0, 2), (2, 4), (3, 8)); r <- 0 until dy._2)
      yield ("h", dy._1 * day + r)
    val got = Analytics.ewmaBacktest((g ++ h).toDF("event_type", "ts_us"),
      "event_type", "ts_us", window = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("mae_milli_ewma"),
          r.getAs[Long]("mae_milli_naive")))).toMap
    assert(got("g") === ((2L, 4500L, 4500L)))
    assert(got("h") === ((1L, 5000L, 4000L)))
  }

  test("mannKendall: monotone series scores maximal S; constant gives NULL z") {
    val day = 86400L * 1000000L
    // "up": y = d+1 over 10 days → S = C(10,2) = 45, no ties.
    // "flat": y = 3 every day → all pairs tie, var18 = 0 → NULL z.
    val rows =
      (for (d <- 0 until 10; r <- 0 until (d + 1)) yield ("up", d * day + r)) ++
      (for (d <- 0 until 10; r <- 0 until 3) yield ("flat", d * day + r))
    val got = Analytics.mannKendall(rows.toDF("event_type", "ts_us"),
      "event_type", "ts_us")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("up").getAs[Long]("s_stat") === 45L)
    assert(got("up").getAs[Double]("z_corrected") > 3.0)
    assert(got("flat").getAs[Long]("s_stat") === 0L)
    assert(got("flat").isNullAt(got("flat").fieldIndex("z_corrected")))
  }

  test("kaplanMeier: censoring-correct product limit with per-step ppm floor") {
    val day = 86400L * 1000000L
    // Lifetimes (last−first): u1 t=10 CENSORED (last=10, within 2 of max),
    // u2 t=3 ev, u3 t=3 ev, u4 t=1 ev, u5 t=1 CENSORED (last=10), u6 t=0 ev.
    // Life table: t=0 risk 6 ev 1 → S=833333; t=1 risk 5 ev 1 cens 1 →
    // S=833333*4 div 5=666666; t=3 risk 3 ev 2 → 222222; t=10 risk 1
    // cens 1 → S unchanged (no event).
    val ev = Seq(("u1", 0L), ("u1", 10L), ("u2", 0L), ("u2", 3L),
      ("u3", 2L), ("u3", 5L), ("u4", 5L), ("u4", 6L),
      ("u5", 9L), ("u5", 10L), ("u6", 0L))
      .map { case (u, d) => (u, d * day) }.toDF("user_id", "ts_us")
    val got = Analytics.kaplanMeier(ev, "user_id", "ts_us", censorDays = 2)
      .orderBy("t_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === Array(
      (0L, 6L, 1L, 0L, 833333L),
      (1L, 5L, 1L, 1L, 666666L),
      (3L, 3L, 2L, 0L, 222222L),
      (10L, 1L, 0L, 1L, 222222L)))
  }

  test("timeWeightedAvg: negative values fail loudly (floor-parity guard)") {
    val ev = Seq(("g", 0L, 1L, -1.0), ("g", 10L, 2L, 3.0))
      .toDF("s", "t", "id", "v")
    val ex = intercept[Exception] {
      Analytics.timeWeightedAvg(ev, "s", "t", "id", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("floor-division parity")))
  }

  test("bitmapDistinct: exactly COUNT(DISTINCT), negatives and dups safe") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ =>
      (if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(200).toLong - 100L)) // negatives exercise the shift
    val df = rows.toDF("g", "k")
    val got = Analytics.bitmapDistinct(df, "g", "k").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(got === want)
    // merge path: partials OR-combine identically under any layout
    val re = Analytics.bitmapDistinct(df.repartition(13), "g", "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re === want)
  }

  test("runningDistinct: first-day marking, cumulative curve, flat days absent") {
    // u1 first on d1; u2 first on d1; u1 AGAIN on d2 (not new); u3 on d3.
    // d2 has no new keys → no row (flat curve, documented).
    val ev = Seq(
      ("click", "2024-01-01 10:00:00", 1L),
      ("click", "2024-01-01 11:00:00", 2L),
      ("click", "2024-01-02 10:00:00", 1L),
      ("click", "2024-01-03 10:00:00", 3L),
      ("view", "2024-01-02 09:00:00", 1L))
      .map { case (t, s, u) => (t, java.sql.Timestamp.valueOf(s), u) }
      .toDF("event_type", "ts_t", "user_id")
    val got = Analytics.runningDistinct(ev, "event_type", "ts_t", "user_id")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      ("click", "2024-01-01", 2L, 2L),
      ("click", "2024-01-03", 1L, 3L),
      ("view", "2024-01-02", 1L, 1L)))
  }

  test("BitmapDistinctAgg: array→bitmap promotion, negatives, kryo round-trip, merge aliasing") {
    // Container mechanics straight through the Aggregator interface:
    // push one block past the 4096 promotion threshold, keep another
    // sparse, and a negative block — cardinality is exact throughout.
    val agg = new BitmapDistinctAgg
    var b = agg.zero
    (0L until 5000L).foreach(v => b = agg.reduce(b, v))         // promotes
    (0L until 5000L).foreach(v => b = agg.reduce(b, v))         // idempotent
    Seq(70000L, 70007L).foreach(v => b = agg.reduce(b, v))      // sparse block
    Seq(-1L, -65537L).foreach(v => b = agg.reduce(b, v))        // negative blocks
    assert(agg.finish(b) === 5004L)
    // merge with a state sharing some blocks and bringing new ones
    var b2 = agg.zero
    (4000L until 6000L).foreach(v => b2 = agg.reduce(b2, v))
    b2 = agg.reduce(b2, -1L)
    assert(agg.finish(agg.merge(b, b2)) === 6004L)
    // kryo round-trip (what a shuffle/state boundary does to the buffer)
    val enc = agg.bufferEncoder
    val ser = new org.apache.spark.serializer.KryoSerializer(
      spark.sparkContext.getConf).newInstance()
    val back = ser.deserialize[BitmapDistinct.State](
      ser.serialize(b2))
    assert(agg.finish(back) === 2001L)
  }

  test("BitmapDistinctAgg: in-place reduce ≥2× the immutable-Map fold at 1e6 keys/group") {
    // The r10-verdict A/B: the previous buffer was an immutable
    // Map[Long,Long] word map, re-allocated per input row. Same key
    // stream (an LCG permutation of [0, 1e6) — dense domain, random
    // order), best-of-3 wall time each, after a JIT warmup pass.
    val n = 1000000
    def keys(f: Long => Unit): Unit = {
      var i = 0L
      while (i < n) { f((i * 882377L + 100003L) % n); i += 1 }
    }
    val agg = new BitmapDistinctAgg
    def runNew(): Long = {
      val b = agg.zero
      keys(b.add)
      val c = b.cardinality
      assert(c === n.toLong)
      c
    }
    def runOld(): Long = {
      var m = Map.empty[Long, Long]
      keys { v =>
        val bucket = v >> 6
        m = m.updated(bucket, m.getOrElse(bucket, 0L) | (1L << (v & 63L).toInt))
      }
      val c = m.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum
      assert(c === n.toLong)
      c
    }
    def best3(f: () => Long): Long = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f(); System.nanoTime() - t0
    }.min
    runNew(); runOld() // warmup
    val tNew = best3(() => runNew())
    val tOld = best3(() => runOld())
    assert(tNew * 2 <= tOld,
      s"roaring reduce ${tNew / 1000000}ms not 2x faster than map fold ${tOld / 1000000}ms")
  }

  test("funnelDropoff: pairwise conversions with Wilson closed forms") {
    // 4 users complete a→b (c=n → Wilson [n/(n+z²), 1]); none reach c
    // (c=0 → Wilson [0, z²/(n+z²)]) — the wilsonArms extremes replayed
    // on funnel stage counts.
    val ev = (1L to 4L).flatMap(u => Seq((u, 1L, "a"), (u, 2L, "b")))
      .toDF("user_id", "ts_us", "event_type")
    val got = Analytics.funnelDropoff(ev, "user_id", "ts_us",
      "event_type", Seq("a", "b", "c"), windowUs = 100L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6),
        if (r.isNullAt(7)) -1L else r.getLong(7)))
    assert(got(0) === ((1L, "a", "b", 4L, 4L, 1000000L, 510100L,
      1000000L)))
    assert(got(1) === ((2L, "b", "c", 4L, 0L, 0L, 0L, 489900L)))
  }

  test("featureLabelTable: strict temporal split, no label leakage") {
    val day = 86400L * 1000000L
    val cutoff = 100L * day
    val ev = Seq(
      (1L, 5L * day, 1.0), (1L, 50L * day, 2.0), (1L, 105L * day, 9.0),
      (2L, 99L * day, 1.0), (2L, 99L * day + 1L, 1.0),
      (2L, 130L * day, 5.0), // beyond the label window: invisible
      (3L, 101L * day, 7.0)) // label-window only: no features, excluded
      .toDF("user_id", "ts_us", "value")
    val got = Analytics.featureLabelTable(ev, "user_id", "ts_us", "value",
      cutoffUs = cutoff, labelWindowUs = 14L * day).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === Set(1L, 2L))
    // u1: label-window event contributes ONLY the label, never features
    assert(got(1L) === ((2L, 2L, 300L, 50L, 1L)))
    // u2: same-day events collapse to one active day; recency floors to
    // 0 (under a full day elapsed); the day-130 event is beyond the
    // window so the label stays 0
    assert(got(2L) === ((2L, 1L, 200L, 0L, 0L)))
  }

  test("quantileCi: hand-computed order-statistic bounds, ties collapse") {
    // n=81 distinct centi values 1..81: rank 41 is the median; ranks
    // L = ⌊40.5 − 1.96·4.5⌋ = 31 and U = ⌈49.32⌉ + 1 = 51 bound it.
    val rows = (1 to 81).map(i => ("m", i * 0.01)).toDF("g", "v")
    val got = Analytics.quantileCi(rows, "g", "v", qMilli = 500L)
      .collect()(0)
    assert(got.getAs[Long]("n_rows") === 81L)
    assert(got.getAs[Long]("q_centi") === 41L)
    assert(got.getAs[Long]("ci_lo_centi") === 31L)
    assert(got.getAs[Long]("ci_hi_centi") === 51L)
    // a constant column: all three readouts collapse onto the value
    val tied = (1 to 9).map(i => ("t", 5.0)).toDF("g", "v")
    val t = Analytics.quantileCi(tied, "g", "v", qMilli = 500L)
      .collect()(0)
    assert(t.getAs[Long]("q_centi") === 500L)
    assert(t.getAs[Long]("ci_lo_centi") === 500L)
    assert(t.getAs[Long]("ci_hi_centi") === 500L)
  }

  test("goodTuring: hand spectrum — p0, adjusted counts, spectrum hole") {
    // tokens: a×3, b×2, c,d,e singletons → spectrum n1=3, n2=1, n3=1,
    // N=8. p0 = 3/8 = 375000 ppm; r*(1) = 2·1·1000/3 = 666 milli;
    // r*(2) = 3·1·1000/1 = 3000; r*(3) = 0 (hole at n4).
    val docs = Seq((1L, "a a a b"), (2L, "b c d e"))
      .toDF("doc_id", "text")
    val got = Analytics.goodTuring(docs, "text", gramN = 1, maxR = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got(1L) === ((3L, 666L, 375000L)))
    assert(got(2L) === ((1L, 3000L, 375000L)))
    assert(got(3L) === ((1L, 0L, 375000L)))
    assert(!got.contains(4L)) // absent spectrum rows stay absent
  }

  test("crossCorrelation: a planted one-day lead reads 1.0 at lag +1") {
    // Series a on days 0,1,2 with counts 1,2,3; series b echoes it one
    // day later (days 1,2,3 with counts 1,2,3). Lag +1 pairs match
    // perfectly; lag −1 has a single pair → NULL by the n<2 guard.
    val day = 86400L * 1000000L
    def burst(s: String, d: Long, n: Int) =
      (1 to n).map(i => (s, d * day + i))
    val ev = (burst("a", 0, 1) ++ burst("a", 1, 2) ++ burst("a", 2, 3) ++
      burst("b", 1, 1) ++ burst("b", 2, 2) ++ burst("b", 3, 3))
      .toDF("event_type", "ts_us")
    val byLag = Analytics.crossCorrelation(ev, "event_type", "ts_us",
      "a", "b", maxLag = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(byLag(1L) === ((3L, Some(1.0))))
    assert(byLag(-1L) === ((1L, None)))
    assert(byLag(0L)._1 === 2L) // days 1,2 overlap
  }

  test("friedman: hand-computed agreeing blocks, ties, incomplete blocks") {
    // Two complete blocks agreeing on the treatment order a<b<c:
    // doubled ranks (2,4,6) each, D=(4,8,12), n(k+1)=8 →
    // χ² = 2·(16+0+16)/16 = 4 exactly. Block 9 lacks treatment c and
    // must be excluded (its values would otherwise flip the order).
    val rows = Seq(
      (1L, "a", 1.0), (1L, "b", 2.0), (1L, "c", 3.0),
      (2L, "a", 10.0), (2L, "b", 20.0), (2L, "c", 30.0),
      (9L, "a", 99.0), (9L, "b", 1.0))
      .toDF("user_id", "event_type", "value")
    val got = Analytics.friedman(rows, "user_id", "event_type", "value",
      Seq("a", "b", "c")).collect()(0)
    assert(got.getAs[Long]("n_blocks") === 2L)
    assert(got.getAs[Long]("k_treatments") === 3L)
    assert(got.getAs[Long]("chi2_milli") === 4000L)
  }

  test("friedman: fully tied blocks yield NULL; cell values are sums") {
    val tied = Seq(
      (1L, "a", 5.0), (1L, "b", 5.0),
      (2L, "a", 7.0), (2L, "b", 7.0))
      .toDF("user_id", "event_type", "value")
    val r = Analytics.friedman(tied, "user_id", "event_type", "value",
      Seq("a", "b")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2_milli")))
    // repeated events SUM into the cell before ranking: block 1's two
    // a-events (3+3=6) outrank b's single 5 → perfect disagreement with
    // block 2 (a=1 < b=5) → χ² = 0
    val summed = Seq(
      (1L, "a", 3.0), (1L, "a", 3.0), (1L, "b", 5.0),
      (2L, "a", 1.0), (2L, "b", 5.0))
      .toDF("user_id", "event_type", "value")
    val s = Analytics.friedman(summed, "user_id", "event_type", "value",
      Seq("a", "b")).collect()(0)
    assert(s.getAs[Long]("chi2_milli") === 0L)
  }

  test("welchT: hand-computed textbook case and degenerate guards") {
    // A = {1,2,3}, B = {5,7}: means 2 vs 6, sA²=1, sB²=2 →
    // t² = 16/(1/3 + 1) = 12.0, Welch df = (4/3)²/((1/3)²/2 + 1) ≈ 1.684
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "v")
    val r = Analytics.welchT(df, "g", "v", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("mean_diff_micro") === -400000000L) // −4.0 centi·µ
    assert(r.getAs[Long]("t2_milli") === 12000L)
    assert(r.getAs[Long]("df_milli") === 1684L)
    // all-tied values: variance degenerates → NULL statistics
    val tied = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val t = Analytics.welchT(tied, "g", "v", "a", "b").collect()(0)
    assert(t.isNullAt(t.fieldIndex("t2_milli")))
    assert(t.isNullAt(t.fieldIndex("df_milli")))
    // a singleton group cannot carry a variance → NULL
    val lone = Seq(("a", 1.0), ("b", 2.0), ("b", 9.0)).toDF("g", "v")
    val l = Analytics.welchT(lone, "g", "v", "a", "b").collect()(0)
    assert(l.isNullAt(l.fieldIndex("t2_milli")))
  }

  test("holtBacktest: hand-folded two-day series") {
    // y = [10, 13], α=0.3 β=0.1: init l=10·10⁶ b=0; step: pred=10·10⁶,
    // l'=(300·13·10⁶+700·10·10⁶)/1000=10.9·10⁶, b'=100·0.9·10⁶/1000=9·10⁴,
    // sae=saen=3·10⁶ over 1 forecast.
    val base = 86400L * 1000000L
    val ev = (Seq.fill(10)(base * 10 + 1L) ++ Seq.fill(13)(base * 11 + 1L))
      .map(ts => ("a", ts)).toDF("etype", "ts_us")
    val r = Analytics.holtBacktest(ev, "etype", "ts_us",
      alphaMilli = 300L, betaMilli = 100L).collect()(0)
    assert(r.getAs[Long]("n_days") === 2L)
    assert(r.getAs[Long]("level_micro") === 10900000L)
    assert(r.getAs[Long]("trend_micro") === 90000L)
    assert(r.getAs[Long]("mae_micro_holt") === 3000000L)
    assert(r.getAs[Long]("mae_micro_naive") === 3000000L)
    // single-day series: no forecast to score → NULL MAEs, level = y₁
    val one = Seq(("b", base * 10 + 1L)).toDF("etype", "ts_us")
    val s = Analytics.holtBacktest(one, "etype", "ts_us").collect()(0)
    assert(s.getAs[Long]("level_micro") === 1000000L)
    assert(s.isNullAt(s.fieldIndex("mae_micro_holt")))
  }

  test("wilcoxonSignedRank replays the hand-ranked fixture") {
    // d = {+3, −3, +3, +5, 0}: the zero drops (Wilcoxon's convention),
    // |3| ties at midrank 2 (doubled 4), |5| ranks 4 (doubled 8) →
    // 2W⁺ = 4+4+8 = 16, tie = 3³−3 + 0 = 24,
    // z = (8 − 5) / sqrt(4·5·9/24 − 24/48) = 3/sqrt(7) = 1.133893.
    val pairs = Seq((13L, 10L), (7L, 10L), (103L, 100L), (15L, 10L),
      (42L, 42L)).toDF("x", "y")
    val r = Analytics.wilcoxonSignedRank(pairs, "x", "y").collect()(0)
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Long]("two_w_plus") === 16L)
    assert(r.getAs[Long]("tie_term") === 24L)
    assert(math.abs(r.getAs[Double]("z") - 1.133893) < 1e-9)
    // all differences zero → nothing to rank, NULL z
    val zero = Seq((5L, 5L), (9L, 9L)).toDF("x", "y")
    val z = Analytics.wilcoxonSignedRank(zero, "x", "y").collect()(0)
    assert(z.getAs[Long]("n_pairs") === 0L)
    assert(z.isNullAt(z.fieldIndex("z")))
  }

  test("jarqueBera replays hand-computed moments and guards its gate") {
    // [1,2,3,4]: floor mean 2, centered [−1,0,1,2] → S=(2,6,8,18);
    // M2=20, M3=0, M4=656 → skew 0, exkurt 656/400−3 = −1.36,
    // jb = round(4/6·(0 + 1.8496/4), 6) = 0.308267.
    val a = Seq.tabulate(4)(i => ("a", (i + 1).toLong)) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L)) // n=3 → NULL stats
    val got = Analytics.jarqueBera(a.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
    val ra = got(0)
    assert(ra.getAs[Long]("n") === 4L)
    assert(ra.getAs[Double]("skew") === 0.0)
    assert(math.abs(ra.getAs[Double]("exkurt") - (-1.36)) < 1e-9)
    assert(math.abs(ra.getAs[Double]("jb") - 0.308267) < 1e-9)
    val rb = got(1)
    assert(rb.getAs[Long]("n") === 3L)
    assert(rb.isNullAt(rb.fieldIndex("skew")))
    assert(rb.isNullAt(rb.fieldIndex("jb")))
    // magnitude gate: a 2e6 deviation must fail loudly, not overflow
    val wide = Seq(("c", 0L), ("c", 4000000L), ("c", 10L), ("c", 20L))
    intercept[Exception] {
      Analytics.jarqueBera(wide.toDF("g", "v"), "g", "v").collect()
    }
  }

  test("cvmTest: zero on identical samples, hand-computed on disjoint") {
    // A = {1, 2}, B = {10, 20}: gaps (.5, 1, .5, 0) → T = 1.5·(4/16)
    // = 0.375 → 375000 ppm.
    val dis = Seq((true, 1.0), (true, 2.0), (false, 10.0), (false, 20.0))
      .toDF("s", "v")
    val r = Analytics.cvmTest(dis, col("s"), "v").collect()(0)
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("cvm_ppm") === 375000L)
    // identical samples on both sides → exactly zero
    val same = Seq((true, 3.0), (false, 3.0), (true, 7.0), (false, 7.0))
      .toDF("s", "v")
    assert(Analytics.cvmTest(same, col("s"), "v").collect()(0)
      .getAs[Long]("cvm_ppm") === 0L)
  }

  test("pettittTest finds the hand-computed break and flags a real one") {
    val base = 86400L * 1000000L
    // [1,1,1,5,5,5] over days 1..6: U_t = (−3,−6,−9,−6,−3) → K = 9
    // at t = 3 (day 3), far from the 5% line (6·81 < 3.6889·252).
    def day(d: Long, k: Int) = Seq.fill(k)(("a", base * d + 1L))
    val ev = (day(1, 1) ++ day(2, 1) ++ day(3, 1) ++
      day(4, 5) ++ day(5, 5) ++ day(6, 5)).toDF("etype", "ts_us")
    val r = Analytics.pettittTest(ev, "etype", "ts_us").collect()(0)
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[Long]("k_stat") === 9L)
    assert(r.getAs[Long]("change_day") === 3L)
    assert(r.getAs[Long]("significant_05") === 0L)
    // a hard level shift over 20 days must flag significant
    val big = ((1L to 10L).map(d => day(d, 1)) ++
      (11L to 20L).map(d => day(d, 60))).flatten.toDF("etype", "ts_us")
    val rb = Analytics.pettittTest(big, "etype", "ts_us").collect()(0)
    assert(rb.getAs[Long]("change_day") === 10L)
    assert(rb.getAs[Long]("significant_05") === 1L)
  }

  test("dbscan2d separates blobs, attaches borders, flags noise") {
    // Two 3×3 blobs at (10..12)² and (20..22)², one isolated point,
    // one point duplicated 5× (a weighted singleton core cluster).
    // eps=1, minPts=4: blob cores are the 5-point crosses, corners are
    // borders, the singleton's weight alone makes it core.
    val blob = for (x <- 10L to 12L; y <- 10L to 12L) yield (x, y)
    val blob2 = blob.map { case (x, y) => (x + 10L, y + 10L) }
    val pts = (blob ++ blob2 ++ Seq((40L, 40L)) ++
      Seq.fill(5)((50L, 50L))).toDF("x", "y")
    val got = Analytics.dbscan2d(pts, "x", "y", eps = 1L, minPts = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    val c = 1L << 31
    assert(got === Seq(
      (-1L, 1L, 0L, 1L, 40L, 40L),            // noise
      (10L * c + 11L, 9L, 5L, 9L, 10L, 12L),  // blob 1: min core (10,11)
      (20L * c + 21L, 9L, 5L, 9L, 20L, 22L),  // blob 2
      (50L * c + 50L, 5L, 5L, 1L, 50L, 50L))) // weighted singleton core
    // coordinate gate fires loudly
    intercept[Exception] {
      Analytics.dbscan2d(Seq((-1L, 0L)).toDF("x", "y"), "x", "y", 1L, 1L)
        .collect()
    }
  }

  test("haarEnergy replays hand-computed dyadic energies") {
    val base = 86400L * 1000000L
    // Counts [1,2,3,4] over 4 observed days, levels=2:
    //   level 1: (1−2)² + (3−4)² = 2;  level 2: ((1+2)−(3+4))² = 16.
    def day(d: Long, k: Int) = Seq.fill(k)(("a", base * d + 1L))
    val ev = (day(1, 1) ++ day(2, 2) ++ day(3, 3) ++ day(4, 4))
      .toDF("etype", "ts_us")
    val got = Analytics.haarEnergy(ev, "etype", "ts_us", levels = 2)
      .orderBy("level")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 1L, 16L)))
    // observed-day semantics: a gap relabels indices, never zero-fills
    val gap = (day(1, 1) ++ day(2, 2) ++ day(9, 3) ++ day(10, 4))
      .toDF("etype", "ts_us")
    val g2 = Analytics.haarEnergy(gap, "etype", "ts_us", levels = 2)
      .orderBy("level")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g2.toSeq === got.toSeq)
    // a series short of the dyadic window produces no row
    val short3 = (day(1, 1) ++ day(2, 2) ++ day(3, 3)).toDF("etype", "ts_us")
    assert(Analytics.haarEnergy(short3, "etype", "ts_us", 2).count() === 0L)
  }

  test("mahalanobis2d replays hand-cleared distances and guards degeneracy") {
    // Square corners + center: A = B = 20, C = 0, det = 400; corners
    // d² = 2.5 (2500 milli), center exactly 0.
    val pts = Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 0L, 2L), (4L, 2L, 2L),
      (5L, 1L, 1L)).toDF("id", "x", "y")
    val got = Analytics.mahalanobis2d(pts, "id", "x", "y", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === Seq((1L, 2500L), (2L, 2500L), (3L, 2500L),
      (4L, 2500L), (5L, 0L)))
    // perfectly collinear cloud: det = 0 → no rows, no blowup
    val line = Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 2L, 2L))
      .toDF("id", "x", "y")
    assert(Analytics.mahalanobis2d(line, "id", "x", "y", 3).count() === 0L)
    // magnitude gate fires loudly (non-degenerate cloud, wide x)
    intercept[Exception] {
      Analytics.mahalanobis2d(Seq((1L, 0L, 0L), (2L, 50000L, 1L),
        (3L, 0L, 1L), (4L, 50000L, 0L))
        .toDF("id", "x", "y"), "id", "x", "y", 4).collect()
    }
  }

  test("diversityPanel: hand-computed Simpson and Chao1") {
    // "x x y": p2 = 2, simpson = 1e6 − 2e6 div 6 = 666667; no
    //   singleton pair mass → chao1 = S·1000 = 2000.
    // "p q r r": f1 = 2, f2 = 1 → chao1 = 3000 + 2·1·1000 div 4 = 3500.
    val docs = Seq(("a", "x x y"), ("b", "p q r r")).toDF("src", "text")
    val got = Analytics.diversityPanel(docs, "src", "text")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(("a", 3L, 2L, 666667L, 2000L),
      ("b", 4L, 3L, 833334L, 3500L)))
    // single-token source: Simpson undefined (NULL), Chao1 = S
    val one = Analytics.diversityPanel(
      Seq(("c", "solo")).toDF("src", "text"), "src", "text").collect()(0)
    assert(one.isNullAt(3) && one.getLong(4) === 1000L)
  }

  test("sourceOverlapAuto dispatches exact below the threshold, sketch above") {
    val docs = Seq(
      ("a", "red blue green"), ("b", "red blue yellow"),
      ("c", "green purple")).toDF("src", "text")
    // 3 sources ≤ threshold → the exact matrix, column-for-column
    val exact = Analytics.sourceOverlapAuto(docs, "src", "text",
      exactMaxSources = 3)
    assert(exact.columns.toSeq ==
      Seq("s1", "s2", "n1", "n2", "inter", "jaccard"))
    val ab = exact.filter(col("s1") === "a" && col("s2") === "b")
      .collect()(0)
    assert(ab.getLong(4) === 2L) // red + blue
    assert(exact.collect().toSeq ==
      Analytics.sourceOverlap(docs, "src", "text").collect().toSeq)
    // forcing the threshold below the cardinality routes to the sketch
    val sketch = Analytics.sourceOverlapAuto(docs, "src", "text",
      exactMaxSources = 2, kmvK = 8)
    assert(sketch.columns.toSeq ==
      Seq("s1", "s2", "k_used", "n_both", "jaccard_est_ppm"))
    // at k ≥ |union| the KMV estimate IS the exact Jaccard
    val sab = sketch.filter(col("s1") === "a" && col("s2") === "b")
      .collect()(0)
    assert(sab.getLong(4) === 2L * 1000000L / 4L)
  }
}
