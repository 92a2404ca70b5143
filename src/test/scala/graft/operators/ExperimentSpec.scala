package graft.operators

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // md5 first hex digit of the decimal user id string decides the arm:
  // < '8' → A. Verified per-id below rather than assumed.
  private def armOf(u: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    if ((((d(0) >> 4) & 0xf)) < 8) "A" else "B"
  }

  test("abLift counts exposure, thresholded conversion, and exact ppm") {
    // Users 1..8: all view-exposed; conversions planted per arm.
    val users = (1L to 8L)
    val (as, bs) = users.partition(armOf(_) == "A")
    assert(as.nonEmpty && bs.nonEmpty) // fixture sanity
    // Every A user converts (value 60 > 50); B users don't (value 10,
    // or a conversion-type event filtered by the threshold).
    val events =
      users.map(u => (u, "view", 0.0)) ++
        as.map(u => (u, "purchase", 60.0)) ++
        bs.map(u => (u, "purchase", 10.0)) ++
        Seq((999L, "purchase", 500.0)) // converted but never exposed
    val got = Experiment.abLift(events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._1 === as.size.toLong && got._2 === as.size.toLong)
    assert(got._3 === 1000000L)              // A converts fully
    assert(got._4 === bs.size.toLong && got._5 === 0L)
    assert(got._6 === 0L)                    // B: thresholded out
    assert(got._7 === 0L)                    // lift 0/1M
  }

  test("abLift deduplicates repeat events per user") {
    val u = (1L to 20L).find(armOf(_) == "A").get
    val v = (1L to 20L).find(armOf(_) == "B").get
    val events = Seq(
      (u, "view", 0.0), (u, "view", 0.0), (u, "purchase", 99.0),
      (u, "purchase", 99.0), (v, "view", 0.0))
    val got = Experiment.abLift(events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._1 === 1L && got._2 === 1L && got._3 === 1000000L)
    assert(got._4 === 1L && got._5 === 0L)
  }

  test("abLift degenerate arm: zero A conversions yields NULL lift, counts intact") {
    val u = (1L to 20L).find(armOf(_) == "A").get
    val v = (1L to 20L).find(armOf(_) == "B").get
    // A exposed but never converts; B converts — rate_ppm_a = 0, so
    // lift_ppm must be NULL (documented contract), never an exception or
    // a fabricated number.
    val events = Seq((u, "view", 0.0), (v, "view", 0.0), (v, "purchase", 99.0))
    val row = Experiment.abLift(events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0).head()
    assert(row.getLong(row.fieldIndex("n_users_a")) === 1L)
    assert(row.getLong(row.fieldIndex("n_conv_a")) === 0L)
    assert(row.getLong(row.fieldIndex("rate_ppm_a")) === 0L)
    assert(row.getLong(row.fieldIndex("rate_ppm_b")) === 1000000L)
    assert(row.isNullAt(row.fieldIndex("lift_ppm")))
  }

  // cuped fixtures: (user_id, event_type, value, ts_us), cut at 1000.
  private def cupedDf(rows: Seq[(Long, String, Double, Long)]) =
    rows.toDF("user_id", "event_type", "value", "ts_us")

  test("cuped: a perfectly explanatory covariate zeroes the adjusted diff") {
    // Every user's post-period value equals their pre-period value, so
    // y = x exactly: θ_ppm = 10⁶, and the adjusted mean of EVERY arm
    // collapses to the global pre-period mean — the arm difference in raw
    // means (arms see different users) must vanish entirely.
    val users = (1L to 12L)
    assert(users.exists(armOf(_) == "A") && users.exists(armOf(_) == "B"))
    val events = users.flatMap(u => Seq(
      (u, "purchase", u.toDouble, 500L),   // pre: x_u = u
      (u, "purchase", u.toDouble, 1500L))) // post: y_u = u
    val row = Experiment.cuped(cupedDf(events), "user_id", "event_type",
      "value", "ts_us", "purchase", cutTsUs = 1000L).head()
    assert(row.getLong(row.fieldIndex("theta_ppm")) === 1000000L)
    assert(row.getLong(row.fieldIndex("adj_diff_ppm")) === 0L)
    // raw means differ across arms (different user sets) — the point of
    // the adjustment; guard the fixture against accidental equality.
    assert(row.getLong(row.fieldIndex("raw_ppm_a"))
      !== row.getLong(row.fieldIndex("raw_ppm_b")))
  }

  test("cuped: zero pre-period variance falls back to raw means") {
    // All users share x = 5 → Var(x) = 0 → θ NULL, adjusted = raw.
    val users = (1L to 8L)
    val events = users.flatMap(u => Seq(
      (u, "purchase", 5.0, 500L),
      (u, "purchase", u.toDouble * 2, 1500L)))
    val row = Experiment.cuped(cupedDf(events), "user_id", "event_type",
      "value", "ts_us", "purchase", cutTsUs = 1000L).head()
    assert(row.isNullAt(row.fieldIndex("theta_ppm")))
    assert(row.getLong(row.fieldIndex("adj_ppm_a"))
      === row.getLong(row.fieldIndex("raw_ppm_a")))
    assert(row.getLong(row.fieldIndex("adj_ppm_b"))
      === row.getLong(row.fieldIndex("raw_ppm_b")))
  }

  test("cuped: raw means are exact centi-ppm floor divisions") {
    val a = (1L to 20L).find(armOf(_) == "A").get
    val b = (1L to 20L).find(armOf(_) == "B").get
    // A: post 3.50 → 350 centi; B: post 1.25 → 125 centi; no pre events.
    val events = Seq((a, "purchase", 3.5, 1500L), (b, "purchase", 1.25, 1500L))
    val row = Experiment.cuped(cupedDf(events), "user_id", "event_type",
      "value", "ts_us", "purchase", cutTsUs = 1000L).head()
    assert(row.getLong(row.fieldIndex("raw_ppm_a")) === 350L * 1000000L)
    assert(row.getLong(row.fieldIndex("raw_ppm_b")) === 125L * 1000000L)
    // x ≡ 0 → Var(x) = 0 → θ NULL → adjusted = raw.
    assert(row.isNullAt(row.fieldIndex("theta_ppm")))
  }

  test("jackknifeCore: hand-computed two-bucket replicates and variance") {
    // A: g0 {100, 300}, g1 {200}; B: g0 {400}, g1 {500, 700} (centi).
    // d_0 = 1200e6/2 − 200e6/1 = 4e8; d_1 = 400e6/1 − 400e6/2 = 2e8.
    // var_num = 1·(2·2e17 − (6e8)²) = 4e16 → se = sqrt(4e16)/2 = 1e8.
    // diff = 1600e6 div 3 − 600e6 div 3 = 333333333.
    // z = 333333333·2/sqrt(4e16)·1000 = 3333.33 → 3333 milli.
    val perUser = Seq(
      (100L, "A", 0L), (300L, "A", 0L), (200L, "A", 1L),
      (400L, "B", 0L), (500L, "B", 1L), (700L, "B", 1L))
      .toDF("y", "graft_arm", "graft_g")
    val r = Experiment.jackknifeCore(perUser, buckets = 2).collect()(0)
    assert(r.getAs[Long]("n_users_a") === 3L)
    assert(r.getAs[Long]("n_users_b") === 3L)
    assert(r.getAs[Long]("mean_a_micro") === 200000000L)
    assert(r.getAs[Long]("mean_b_micro") === 533333333L)
    assert(r.getAs[Long]("diff_micro") === 333333333L)
    assert(r.getAs[Long]("n_valid_buckets") === 2L)
    assert(r.getAs[Long]("se_micro") === 100000000L)
    assert(r.getAs[Long]("z_milli") === 3333L)
  }

  test("jackknifeCore: a replicate emptying an arm NULLs the variance") {
    // All of arm A sits in bucket 0 — deleting g0 leaves A empty.
    val perUser = Seq(
      (100L, "A", 0L), (300L, "A", 0L),
      (400L, "B", 0L), (500L, "B", 1L))
      .toDF("y", "graft_arm", "graft_g")
    val r = Experiment.jackknifeCore(perUser, buckets = 2).collect()(0)
    assert(r.getAs[Long]("n_valid_buckets") === 1L)
    assert(r.isNullAt(r.fieldIndex("se_micro")))
    assert(r.isNullAt(r.fieldIndex("z_milli")))
    // the point estimate is still there
    assert(r.getAs[Long]("diff_micro") === 450000000L - 200000000L)
  }

  test("diffInDiff: hand-computed cells, DiD and placebo in milli-cents") {
    val uA = (1L to 20L).find(armOf(_) == "A").get
    val uB = (1L to 20L).find(armOf(_) == "B").get
    // placeboCut=100, cut=200. A: 1.00@50, 1.00@150, 2.00@250 →
    // m_a_pre=200000, m_a_post=200000, pl1=pl2=100000.
    // B: 1.00@50, 2.00@150, 5.00@250 → m_b_pre=300000, m_b_post=500000,
    // pl1=100000, pl2=200000. DiD=(500000-300000)-(0)=200000;
    // placebo=(200000-100000)-(100000-100000)=100000.
    val events = Seq(
      (uA, "m", 1.0, 50L), (uA, "m", 1.0, 150L), (uA, "m", 2.0, 250L),
      (uB, "m", 1.0, 50L), (uB, "m", 2.0, 150L), (uB, "m", 5.0, 250L),
      (uA, "other", 99.0, 250L))
      .toDF("user_id", "event_type", "value", "ts_us")
    val r = Experiment.diffInDiff(events, "user_id", "event_type", "value",
      "ts_us", "m", cutTsUs = 200L, placeboCutUs = 100L).collect()(0)
    assert(r.getAs[Long]("n_a_pre") === 1L && r.getAs[Long]("n_b_post") === 1L)
    assert(r.getAs[Long]("m_a_pre") === 200000L)
    assert(r.getAs[Long]("m_b_post") === 500000L)
    assert(r.getAs[Long]("did_milli") === 200000L)
    assert(r.getAs[Long]("placebo_did_milli") === 100000L)
  }

  test("diffInDiff: an empty cell NULLs the estimate, placebo survives") {
    val uA = (1L to 20L).find(armOf(_) == "A").get
    val uB = (1L to 20L).find(armOf(_) == "B").get
    val events = Seq( // A has no post-period activity
      (uA, "m", 1.0, 50L), (uA, "m", 1.0, 150L),
      (uB, "m", 1.0, 50L), (uB, "m", 2.0, 150L), (uB, "m", 5.0, 250L))
      .toDF("user_id", "event_type", "value", "ts_us")
    val r = Experiment.diffInDiff(events, "user_id", "event_type", "value",
      "ts_us", "m", cutTsUs = 200L, placeboCutUs = 100L).collect()(0)
    assert(r.isNullAt(r.fieldIndex("m_a_post")))
    assert(r.isNullAt(r.fieldIndex("did_milli")))
    assert(r.getAs[Long]("placebo_did_milli") === 100000L)
  }

  test("cemAtt: matched-stratum effect, pruned off-support treated") {
    val as = (1L to 50L).filter(armOf(_) == "A").take(2)
    val bs = (1L to 50L).filter(armOf(_) == "B").take(2)
    val (uA1, uA2, uB1, uB2) = (as(0), as(1), bs(0), bs(1))
    // cut=1000. Stratum (b1=0,b2=1): uA1 (y=100), uA2 (y=300), uB1
    // (y=400) → m_t=400000, m_c=200000, contrib=200000. uB2 has pc=2 →
    // stratum (1,1), no control → pruned.
    val events = Seq(
      (uA1, "e", 0.0, 10L), (uA1, "purchase", 1.0, 2000L),
      (uA2, "e", 0.0, 20L), (uA2, "purchase", 3.0, 2000L),
      (uB1, "e", 0.0, 30L), (uB1, "purchase", 4.0, 2000L),
      (uB2, "e", 0.0, 40L), (uB2, "e", 0.0, 50L),
      (uB2, "purchase", 9.0, 2000L))
      .toDF("user_id", "event_type", "value", "ts_us")
    val r = Experiment.cemAtt(events, "user_id", "event_type", "value",
      "ts_us", "purchase", cutTsUs = 1000L).collect()(0)
    assert(r.getAs[Long]("n_strata_matched") === 1L)
    assert(r.getAs[Long]("n_treated_matched") === 1L)
    assert(r.getAs[Long]("n_treated_pruned") === 1L)
    assert(r.getAs[Long]("n_control_matched") === 2L)
    assert(r.getAs[Long]("n_control_pruned") === 0L)
    assert(r.getAs[Long]("att_num_milli") === 200000L)
    assert(r.getAs[Double]("att_milli") === 200000.0)
  }

  test("cemAtt: no common support yields NULL effect, full pruning") {
    val uA = (1L to 20L).find(armOf(_) == "A").get
    val uB = (1L to 20L).find(armOf(_) == "B").get
    val events = Seq( // disjoint strata: pc=1 vs pc=2
      (uA, "e", 0.0, 10L), (uB, "e", 0.0, 20L), (uB, "e", 0.0, 30L))
      .toDF("user_id", "event_type", "value", "ts_us")
    val r = Experiment.cemAtt(events, "user_id", "event_type", "value",
      "ts_us", "purchase", cutTsUs = 1000L).collect()(0)
    assert(r.getAs[Long]("n_strata_matched") === 0L)
    assert(r.getAs[Long]("n_treated_pruned") === 1L)
    assert(r.getAs[Long]("n_control_pruned") === 1L)
    assert(r.isNullAt(r.fieldIndex("att_milli")))
  }

  test("upliftCurve: hand-computed two-bucket Qini") {
    val as = (1L to 50L).filter(armOf(_) == "A").take(2)
    val bs = (1L to 50L).filter(armOf(_) == "B").take(2)
    val (uA1, uA2, uB1, uB2) = (as(0), as(1), bs(0), bs(1))
    // scores (pre counts): uB1=4 (converts), uA1=3, uB2=2, uA2=1
    // (converts). Bucket1 = {uB1,uA1}: qini = 1·1000 − 0 = 1000.
    // Bucket2 cum: ct=1, cc=1, nt=2, nc=2 → 1000 − 1000·2 div 2 = 0.
    val events =
      (1 to 4).map(i => (uB1, "e", 0.0, i.toLong)) ++
        Seq((uB1, "purchase", 1.0, 2000L)) ++
        (1 to 3).map(i => (uA1, "e", 0.0, i.toLong)) ++
        (1 to 2).map(i => (uB2, "e", 0.0, i.toLong)) ++
        Seq((uA2, "e", 0.0, 1L), (uA2, "purchase", 1.0, 2000L))
    val got = Experiment.upliftCurve(events
      .toDF("user_id", "event_type", "value", "ts_us"),
      "user_id", "event_type", "value", "ts_us", "purchase",
      cutTsUs = 1000L, buckets = 2)
      .collect().map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("cum_n_t"), r.getAs[Long]("cum_n_c"),
          r.getAs[Long]("cum_conv_t"), r.getAs[Long]("cum_conv_c"),
          r.getAs[Long]("qini_milli")))).toMap
    assert(got(1L) === ((1L, 1L, 1L, 0L, 1000L)))
    assert(got(2L) === ((2L, 2L, 1L, 1L, 0L)))
  }

  test("jackknifeDiff: deterministic across partitioning; buckets cover") {
    val events = (1L to 120L).map(u =>
      (u, "purchase", (u % 7).toDouble + 1.0))
    val df = events.toDF("user_id", "event_type", "value")
    val a = Experiment.jackknifeDiff(df, "user_id", "event_type", "value",
      "purchase", buckets = 4).collect()(0)
    val b = Experiment.jackknifeDiff(df.repartition(13), "user_id",
      "event_type", "value", "purchase", buckets = 4).collect()(0)
    assert(a === b)
    assert(a.getAs[Long]("n_users_a") + a.getAs[Long]("n_users_b") === 120L)
    assert(a.getAs[Long]("n_valid_buckets") === 4L)
  }

  test("srmCheck: exact chi-square against the designed split") {
    // Pick 6 A users and 2 B users (verified per-id) — a gross 75/25
    // observed split against a 50/50 design. n=8, O_A=6:
    // χ²·1000 = (1000·6 − 8·500)²·1000 / (8·500·500) = 2000.
    val as = (1L to 200L).filter(armOf(_) == "A").take(6)
    val bs = (1L to 200L).filter(armOf(_) == "B").take(2)
    val ev = (as ++ bs).map(u => (u, "view", 1.0)) ++
      Seq((9999L, "purchase", 1.0)) // non-exposure event ignored
    val got = Experiment.srmCheck(ev.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "view", designMilliA = 500L).head()
    assert(got.getAs[Long]("n_exposed") === 8L)
    assert(got.getAs[Long]("n_a") === 6L)
    assert(got.getAs[Long]("n_b") === 2L)
    assert(got.getAs[Long]("expected_a") === 4L)
    assert(got.getAs[Long]("chi2_milli") === 2000L)
    assert(got.getAs[Long]("srm") === 0L) // 2.0 < 3.841: noisy, not SRM
  }

  test("wilsonArms: hand-computed score intervals at the rate extremes") {
    // 4 A users all convert, 4 B users none: Wilson at c=n and c=0 has
    // closed forms (the sqrt term collapses to 0.98) —
    // A: [n/(n+z²), 1] = [510100, 1000000] ppm; B: [0, z²/(n+z²)] =
    // [0, 489900] ppm. The naive Wald interval would read [1,1]/[0,0].
    val as = (1L to 200L).filter(armOf(_) == "A").take(4)
    val bs = (1L to 200L).filter(armOf(_) == "B").take(4)
    val events = (as ++ bs).map(u => (u, "view", 0.0)) ++
      as.map(u => (u, "purchase", 60.0))
    val got = Experiment.wilsonArms(
      events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("A") === ((4L, 4L, 1000000L, 510100L, 1000000L)))
    assert(got("B") === ((4L, 0L, 0L, 0L, 489900L)))
  }

  test("cochranArmitage: hand-computed rising dose-response") {
    // doses 0/1/2, n=4 each, positives 0/2/4: numc = 48,
    // var = 6·6·(12·20 − 144) = 3456, z = 48·√12/√3456 = 2.8284.
    val rows =
      (1 to 4).map(i => (0L, 0L)) ++
        (1 to 2).map(i => (1L, 1L)) ++ (1 to 2).map(i => (1L, 0L)) ++
        (1 to 4).map(i => (2L, 1L))
    val got = Experiment.cochranArmitage(rows.toDF("dose", "outcome"),
      "dose", "outcome").collect()(0)
    assert(got.getAs[Long]("n_levels") === 3L)
    assert(got.getAs[Long]("n_subjects") === 12L)
    assert(got.getAs[Long]("n_positive") === 6L)
    assert(got.getAs[Long]("z_milli") === 2828L)
    assert(got.getAs[Long]("significant_05") === 1L)
  }

  test("cochranArmitage: flat trend reads 0; one-class outcome NULLs") {
    val flat = Seq((0L, 1L), (0L, 0L), (1L, 1L), (1L, 0L),
      (2L, 1L), (2L, 0L))
    val f = Experiment.cochranArmitage(flat.toDF("dose", "outcome"),
      "dose", "outcome").collect()(0)
    assert(f.getAs[Long]("z_milli") === 0L)
    assert(f.getAs[Long]("significant_05") === 0L)
    val ones = Seq((0L, 1L), (1L, 1L), (2L, 1L))
    val o = Experiment.cochranArmitage(ones.toDF("dose", "outcome"),
      "dose", "outcome").collect()(0)
    assert(o.isNullAt(o.fieldIndex("z_milli")))
    assert(o.isNullAt(o.fieldIndex("significant_05")))
  }

  test("srmCheck flags a drastic imbalance and NULLs the empty case") {
    // 40 A users, 0 B users: χ² = n = 40 → 40000 milli, well past 3841.
    val as = (1L to 500L).filter(armOf(_) == "A").take(40)
    val got = Experiment.srmCheck(
      as.map(u => (u, "view", 1.0)).toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "view", designMilliA = 500L).head()
    assert(got.getAs[Long]("chi2_milli") === 40000L)
    assert(got.getAs[Long]("srm") === 1L)
    val empty = Experiment.srmCheck(
      Seq((1L, "purchase", 1.0)).toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "view", designMilliA = 500L).head()
    assert(empty.getAs[Long]("n_exposed") === 0L)
    assert(empty.isNullAt(empty.fieldIndex("chi2_milli")))
    assert(empty.isNullAt(empty.fieldIndex("srm")))
  }

  test("poissonBootstrap: exact Scala replay of the hash multiplicities") {
    // 8 rows, one group — small enough to replay every md5 draw by hand
    // and fold the identical integer arithmetic.
    val rows = (1 to 8).map(i => ("g", i * 1.5, i.toLong))
    val df = rows.toDF("grp", "v", "id")
    val b = 8
    val got = Experiment.poissonBootstrap(df, "grp", "v", "id",
      replicas = b).head()
    // the same CDF thresholds as the operator, as unsigned 32-bit ints
    val cdf = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
      "ff1025f5", "ffd90f3b", "fffa8b71", "ffff540c", "ffffed1f")
      .map(java.lang.Long.parseLong(_, 16))
    def mult(id: Long, rep: Int): Long = {
      // one digest per 4 replicates: quarter q = rep/4, slice = rep%4
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#${rep / 4}".getBytes("UTF-8"))
      val hex = d.map(x => f"${x & 0xff}%02x").mkString
        .substring(8 * (rep % 4), 8 * (rep % 4) + 8)
      val u = java.lang.Long.parseLong(hex, 16)
      val k = cdf.indexWhere(u < _)
      if (k < 0) 9L else k.toLong
    }
    val cents = rows.map { case (_, v, id) =>
      id -> math.floor(v * 100.0 + 0.5).toLong }.toMap
    val reps = (0 until b).map { rep =>
      val ms = rows.map { case (_, _, id) => (mult(id, rep), cents(id)) }
      (ms.map(_._1).sum, ms.map { case (m, c) => m * c }.sum)
    }.filter(_._1 > 0L)
    val means = reps.map { case (n, s) =>
      BigInt(s) / BigInt(n) } // decimal floor div, nonneg here
    val bl = means.length.toLong
    val sm = means.sum
    val sm2 = means.map(m => m * m).sum
    val wantVar = ((BigInt(bl) * sm2 - sm * sm) /
      (BigInt(bl) * BigInt(bl - 1))).toLong
    assert(got.getAs[Long]("n_rows") === 8L)
    assert(got.getAs[Long]("mean_centi") ===
      cents.values.sum / 8L)
    assert(got.getAs[Long]("b_live") === bl)
    assert(got.getAs[Long]("boot_var_centi2") === wantVar)
    // partitioning invariance: the replicate weights are content hashes
    val re = Experiment.poissonBootstrap(df.repartition(5), "grp", "v",
      "id", replicas = b).head()
    assert(re.getAs[Long]("boot_var_centi2") === wantVar)
  }

  test("poissonBootstrap: variance tracks sigma^2/n on a planted sample") {
    // 2000 iid-ish values with std 10 (deterministic LCG): the bootstrap
    // variance of the mean must land near sigma^2/n = 0.05 — i.e.
    // 500 centi^2 — within a loose factor-2 band (deterministic draw,
    // so the band cannot flake).
    val rows = (1 to 2000).map { i =>
      val u = ((i * 882377L + 100003L) % 1000).toDouble / 1000.0
      ("g", 100.0 + (u - 0.5) * 34.64, i.toLong) // uniform, std ~ 10
    }
    val got = Experiment.poissonBootstrap(rows.toDF("grp", "v", "id"),
      "grp", "v", "id", replicas = 32).head()
    val v = got.getAs[Long]("boot_var_centi2")
    assert(v > 250L && v < 1000L, s"boot var $v centi2 not near 500")
    assert(got.getAs[Long]("b_live") === 32L)
  }

  test("bootstrapMedian: exact point median, CI brackets it, degenerate collapses") {
    // 1..199 (median 100): the lower median is exact; a deterministic
    // 95% bootstrap CI must bracket it and stay tight-ish.
    val rows = (1 to 199).map(i => ("g", i.toDouble, i.toLong))
    val got = Experiment.bootstrapMedian(rows.toDF("grp", "v", "id"),
      "grp", "v", "id", replicas = 32).head()
    assert(got.getAs[Long]("median_centi") === 10000L)
    assert(got.getAs[Long]("b_live") === 32L)
    val (lo, hi) = (got.getAs[Long]("ci_lo_centi"),
      got.getAs[Long]("ci_hi_centi"))
    assert(lo <= 10000L && 10000L <= hi, s"CI [$lo, $hi] misses the median")
    assert(hi - lo < 6000L, s"CI [$lo, $hi] implausibly wide")
    // single-valued group: every replicate median IS that value
    val one = Seq.tabulate(20)(i => ("c", 7.0, i.toLong))
    val gc = Experiment.bootstrapMedian(one.toDF("grp", "v", "id"),
      "grp", "v", "id").head()
    assert(gc.getAs[Long]("median_centi") === 700L)
    assert(gc.getAs[Long]("ci_lo_centi") === 700L)
    assert(gc.getAs[Long]("ci_hi_centi") === 700L)
    // deterministic under partitioning
    val re = Experiment.bootstrapMedian(
      rows.toDF("grp", "v", "id").repartition(7),
      "grp", "v", "id", replicas = 32).head()
    assert(re.toSeq === got.toSeq)
  }

  test("multipleTesting: textbook BH/Holm/Bonferroni decisions") {
    import spark.implicits._
    // m=4, α=5%: p = {0.005, 0.011, 0.02, 0.04}
    // Bonferroni (p·4 ≤ .05): only .005, .011 (.044 ≤ .05) → ranks 1,2
    // Holm: .005 ≤ .05/4 ✓, .011 ≤ .05/3=.0166 ✓, .02 ≤ .05/2=.025 ✓,
    //       .04 ≤ .05 ✓ → all four
    // BH: p(k) ≤ k·.05/4 → .005≤.0125 ✓ .011≤.025 ✓ .02≤.0375 ✓
    //       .04≤.05 ✓ → all four
    val t = Seq((1L, 11000L), (2L, 5000L), (3L, 40000L), (4L, 20000L))
      .map { case (id, p) => ("f", id, p) }.toDF("fam", "id", "p")
    val got = Experiment.multipleTesting(t, "fam", "id", "p", 50000L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rank"), r.getAs[Boolean]("bonferroni_rej"),
          r.getAs[Boolean]("holm_rej"), r.getAs[Boolean]("bh_rej"))))
      .toMap
    assert(got(2L) === ((1L, true, true, true)))
    assert(got(1L) === ((2L, true, true, true)))
    assert(got(4L) === ((3L, false, true, true))) // p=.02 ranks 3rd
    assert(got(3L) === ((4L, false, true, true))) // p=.04 ranks 4th
    // Holm stops at the FIRST failure even if later ps would pass:
    // p = {0.04, 0.041, 0.0001}: rank1 .0001 ≤ .05/3 ✓,
    // rank2 .04 > .05/2 ✗ stops; rank3 .041 ≤ .05 but NOT rejected.
    val t2 = Seq(("f", 1L, 40000L), ("f", 2L, 41000L), ("f", 3L, 100L))
      .toDF("fam", "id", "p")
    val g2 = Experiment.multipleTesting(t2, "fam", "id", "p", 50000L)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Boolean]("holm_rej")).toMap
    assert(g2 === Map(3L -> true, 1L -> false, 2L -> false))
    // BH with NOTHING passing: kmax absent → nothing rejected
    val t3 = Seq(("f", 1L, 900000L), ("f", 2L, 990000L))
      .toDF("fam", "id", "p")
    val g3 = Experiment.multipleTesting(t3, "fam", "id", "p", 50000L)
      .collect().map(_.getAs[Boolean]("bh_rej"))
    assert(g3.forall(_ == false))
    // families are independent panels
    val t4 = Seq(("a", 1L, 1000L), ("b", 1L, 1000L))
      .toDF("fam", "id", "p")
    val g4 = Experiment.multipleTesting(t4, "fam", "id", "p", 50000L)
      .collect().map(r => r.getAs[Long]("m"))
    assert(g4.toSeq === Seq(1L, 1L))
  }
}
