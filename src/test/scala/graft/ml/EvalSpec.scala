package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // (score, label) fixtures; scores already integer-quantized.
  private def df(rows: Seq[(Long, Long)]) = rows.toDF("s", "y")

  test("rocAuc: perfect separation scores 1.0, inverted scores 0.0") {
    val perfect = df(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)))
    val p = Eval.rocAuc(perfect, "s", "y")
      .select("auc_ppm", "gini_ppm").as[(Long, Long)].head()
    assert(p === ((1000000L, 1000000L)))
    val inverted = df(Seq((1L, 1L), (2L, 1L), (9L, 0L), (10L, 0L)))
    val i = Eval.rocAuc(inverted, "s", "y")
      .select("auc_ppm", "gini_ppm").as[(Long, Long)].head()
    assert(i === ((0L, -1000000L)))
  }

  test("rocAuc: all-tied scores give exactly 0.5 via midranks") {
    val tied = df(Seq((5L, 1L), (5L, 1L), (5L, 0L), (5L, 0L), (5L, 0L)))
    val got = Eval.rocAuc(tied, "s", "y")
      .select("n_pos", "n_neg", "auc_ppm").as[(Long, Long, Long)].head()
    assert(got === ((2L, 3L, 500000L)))
  }

  test("rocAuc: hand-computed mixed case with a tie") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs (3,2):1 (3,1):1 (2,2):0.5 (2,1):1 → U = 3.5 of 4 → 0.875
    val m = df(Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L)))
    val got = Eval.rocAuc(m, "s", "y").select("auc_ppm").as[Long].head()
    assert(got === 875000L)
  }

  test("rocAuc: single-class input yields NULL auc") {
    val one = df(Seq((3L, 1L), (2L, 1L)))
    val row = Eval.rocAuc(one, "s", "y").collect()(0)
    assert(row.getAs[Long]("n_pos") === 2L && row.getAs[Long]("n_neg") === 0L)
    assert(row.isNullAt(row.fieldIndex("auc_ppm")))
  }

  test("calibration: exact bin means and rates, top edge folded down") {
    // scale 100, 2 bins: scores 10,30 → bin 0; 60 → bin 1; 100 → bin 1
    // (folded). bin0: n=2, mean=(10+30)/2=20% → 200000 ppm, pos 1/2.
    val d = df(Seq((10L, 0L), (30L, 1L), (60L, 1L), (100L, 1L)))
    val got = Eval.calibration(d, "s", "y", bins = 2, scale = 100L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 2L, 200000L, 500000L),
      (1L, 2L, 800000L, 1000000L)))
  }

  test("thresholdSweep: exact confusion counts and ppm rates") {
    // pos at {8, 3}, neg at {6, 1}; threshold 5: tp=1 fp=1 fn=1 tn=1
    val d = df(Seq((8L, 1L), (3L, 1L), (6L, 0L), (1L, 0L)))
    val r5 = Eval.thresholdSweep(d, "s", "y", Seq(5L)).collect()(0)
    assert(r5.getAs[Long]("tp") === 1L && r5.getAs[Long]("fp") === 1L)
    assert(r5.getAs[Long]("fn") === 1L && r5.getAs[Long]("tn") === 1L)
    assert(r5.getAs[Long]("precision_ppm") === 500000L)
    assert(r5.getAs[Long]("recall_ppm") === 500000L)
    assert(r5.getAs[Long]("f1_ppm") === 500000L)
    // threshold above every score: nothing predicted → precision NULL,
    // recall 0, f1 NULL.
    val r9 = Eval.thresholdSweep(d, "s", "y", Seq(9L)).collect()(0)
    assert(r9.isNullAt(r9.fieldIndex("precision_ppm")))
    assert(r9.getAs[Long]("recall_ppm") === 0L)
    assert(r9.isNullAt(r9.fieldIndex("f1_ppm")))
  }

  test("rocAuc equals the quadratic all-pairs definition on random data") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val data = Seq.fill(40 + trial * 7)(
        (rnd.nextInt(12).toLong, rnd.nextInt(2).toLong))
      val pos = data.filter(_._2 == 1L).map(_._1)
      val neg = data.filter(_._2 == 0L).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        // 2U = #(p > n)·2 + #(p == n) over all pos × neg pairs
        val num2 = (for (p <- pos; n <- neg) yield
          if (p > n) 2L else if (p == n) 1L else 0L).sum
        val want = num2 * 1000000L / (2L * pos.size * neg.size)
        val got = Eval.rocAuc(df(data), "s", "y")
          .select("auc_ppm").as[Long].head()
        assert(got === want, s"trial $trial")
      }
    }
  }

  test("thresholdSweep: counts conserve across thresholds") {
    val d = df(Seq((8L, 1L), (3L, 1L), (6L, 0L), (1L, 0L), (6L, 1L)))
    Eval.thresholdSweep(d, "s", "y", Seq(2L, 5L, 7L)).collect().foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === 3L)
      assert(r.getAs[Long]("fp") + r.getAs[Long]("tn") === 2L)
    }
  }

  test("guard: over-cardinality scores fail loudly, not silently sort") {
    spark.conf.set(Eval.MaxDistinctConfKey, "50")
    try {
      val wide = df((1L to 200L).map(i => (i, i % 2)))
      val ex = intercept[Exception] {
        Eval.rocAuc(wide, "s", "y").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("quantize scoreCol")))
      // within the bound the same pipeline runs fine
      val ok = df((1L to 40L).map(i => (i, i % 2)))
      assert(Eval.rocAuc(ok, "s", "y").collect().length === 1)
    } finally spark.conf.unset(Eval.MaxDistinctConfKey)
  }

  test("isotonicCalibration: PAV pooling by hand; monotone input unchanged") {
    import spark.implicits._
    // rates 0.5, 0.0, 1.0 — PAV pools the violating first two to 2/8
    val rows =
      (1 to 2).map(_ => (0L, 1L)) ++ (1 to 2).map(_ => (0L, 0L)) ++
      (1 to 4).map(_ => (1L, 0L)) ++
      (1 to 4).map(_ => (2L, 1L))
    val got = Eval.isotonicCalibration(rows.toDF("s", "y"), "s", "y")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      0L -> ((4L, 2L, 500000L, 250000L)),
      1L -> ((4L, 0L, 0L, 250000L)),
      2L -> ((4L, 4L, 1000000L, 1000000L))))
    // already-monotone rates come back untouched
    val mono =
      (1 to 1).map(_ => (0L, 1L)) ++ (1 to 3).map(_ => (0L, 0L)) ++
      (1 to 2).map(_ => (1L, 1L)) ++ (1 to 2).map(_ => (1L, 0L)) ++
      (1 to 3).map(_ => (2L, 1L)) ++ (1 to 1).map(_ => (2L, 0L))
    val m = Eval.isotonicCalibration(mono.toDF("s", "y"), "s", "y")
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(m === Map(0L -> ((250000L, 250000L)),
      1L -> ((500000L, 500000L)), 2L -> ((750000L, 750000L))))
    // the points gate fails loudly on an unquantized axis
    val wide = (1L to 600L).map(i => (i, i % 2)).toDF("s", "y")
    val ex = intercept[Exception] {
      Eval.isotonicCalibration(wide, "s", "y", maxPoints = 256L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("coarser calibration axis")))
  }

  test("agreementStats: hand-computed kappa, balanced accuracy") {
    // tp=2 fp=1 fn=1 tn=2 at threshold 5 → po=2/3, pe=1/2, kappa=1/3
    val d = df(Seq((8L, 1L), (6L, 1L), (7L, 0L), (3L, 1L), (2L, 0L),
      (1L, 0L)))
    val r = Eval.agreementStats(d, "s", "y", threshold = 5L).collect()(0)
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("fp") === 1L &&
      r.getAs[Long]("fn") === 1L && r.getAs[Long]("tn") === 2L)
    assert(r.getAs[Long]("accuracy_ppm") === 666666L)
    assert(r.getAs[Long]("balanced_accuracy_ppm") === 666666L)
    assert(r.getAs[Long]("kappa_ppm") === 333333L)
  }

  test("agreementStats: negative kappa truncates toward zero") {
    // tp=0 fp=2 fn=2 tn=1 → kappa = -8/12: truncation gives -666666
    // (a floor would give -666667 — this case pins the div semantics)
    val d = df(Seq((8L, 0L), (6L, 0L), (3L, 1L), (2L, 1L), (1L, 0L)))
    val r = Eval.agreementStats(d, "s", "y", threshold = 5L).collect()(0)
    assert(r.getAs[Long]("kappa_ppm") === -666666L)
    assert(r.getAs[Long]("accuracy_ppm") === 200000L)
  }

  test("brierDecomposition: hand-computed Murphy terms at scale 10") {
    // predictions .2,.2,.8 vs labels 0,1,1:
    //   Brier = (4+64+4)/300            → 240000 ppm
    //   REL   = (36/2 + 4/1)/300 = 22/300 → 73333 ppm
    //   RES   = (10⁶+500000)//3 − 4·10⁶//9 = 500000−444444 → 55556 ppm
    //   UNC   = 2·1·10⁶//9              → 222222 ppm
    //   gap   = 240000 − (73333−55556+222222) = 1 (floor drift)
    val d = df(Seq((2L, 0L), (2L, 1L), (8L, 1L)))
    val r = Eval.brierDecomposition(d, "s", "y", scale = 10L).collect()(0)
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("brier_ppm") === 240000L)
    assert(r.getAs[Long]("reliability_ppm") === 73333L)
    assert(r.getAs[Long]("resolution_ppm") === 55556L)
    assert(r.getAs[Long]("uncertainty_ppm") === 222222L)
    assert(r.getAs[Long]("decomp_gap_ppm") === 1L)
  }

  test("brierDecomposition: perfect forecast scores zero everywhere") {
    // p ∈ {0,1} matching labels exactly: Brier 0, REL 0, RES = UNC.
    val d = df(Seq((0L, 0L), (0L, 0L), (10L, 1L), (10L, 1L)))
    val r = Eval.brierDecomposition(d, "s", "y", scale = 10L).collect()(0)
    assert(r.getAs[Long]("brier_ppm") === 0L)
    assert(r.getAs[Long]("reliability_ppm") === 0L)
    assert(r.getAs[Long]("resolution_ppm") ===
      r.getAs[Long]("uncertainty_ppm"))
    assert(r.getAs[Long]("uncertainty_ppm") === 250000L)
    assert(r.getAs[Long]("decomp_gap_ppm") === 0L)
  }

  test("conformalCore: q̂ is the exact ceil((n+1)(1−α)) order statistic") {
    import spark.implicits._
    // cal residuals 1..9 (n=9), α=10% → k = ceil(10·0.9) = 9 → q̂ = 9.
    // test residuals {5, 10}: one covered → 500000 ppm.
    val base = ((1 to 9).map(r => (r.toLong, 1)) ++
      Seq((5L, 0), (10L, 0))).toDF("r", "graft_cal")
    val row = Eval.conformalCore(base, alphaPpm = 100000L).collect()(0)
    assert(row.getAs[Long]("n_cal") === 9L)
    assert(row.getAs[Long]("n_test") === 2L)
    assert(row.getAs[Long]("qhat") === 9L)
    assert(row.getAs[Long]("coverage_ppm") === 500000L)
    assert(row.getAs[Long]("target_ppm") === 900000L)
    // α=50% → k = ceil(10·0.5) = 5 → q̂ = 5 → both test rows split
    val r2 = Eval.conformalCore(base, alphaPpm = 500000L).collect()(0)
    assert(r2.getAs[Long]("qhat") === 5L)
    assert(r2.getAs[Long]("coverage_ppm") === 500000L)
  }

  test("conformalCore: k beyond n_cal means an infinite interval — NULLs") {
    import spark.implicits._
    // n_cal = 2, α = 10% → k = ceil(3·0.9) = 3 > 2.
    val base = Seq((1L, 1), (2L, 1), (1L, 0)).toDF("r", "graft_cal")
    val row = Eval.conformalCore(base, alphaPpm = 100000L).collect()(0)
    assert(row.getAs[Long]("n_cal") === 2L)
    assert(row.isNullAt(row.fieldIndex("qhat")))
    assert(row.isNullAt(row.fieldIndex("coverage_ppm")))
  }

  test("conformalCoverage: held-out coverage meets the 90% guarantee") {
    import spark.implicits._
    // Exchangeable synthetic scores: pred = i mod 100, actual = pred +
    // deterministic pseudo-noise in [-10, 10]. Marginal coverage on the
    // md5-test half must be ≥ 0.9 − small-sample slack.
    val rows = (1L to 2000L).map { i =>
      val noise = (i * 2654435761L % 21L) - 10L
      (i, i % 100L, i % 100L + noise)
    }.toDF("id", "pred", "actual")
    val r = Eval.conformalCoverage(rows, "id", "pred", "actual",
      alphaPpm = 100000L).collect()(0)
    assert(r.getAs[Long]("coverage_ppm") >= 870000L,
      s"coverage ${r.getAs[Long]("coverage_ppm")}")
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") === 2000L)
  }

  test("calibrationError: hand-computed ECE/MCE, cancelled denominators") {
    // scale 10, 2 bins (edges at 5). Bin 0: scores {2×3 rows, 1 pos} →
    // |Σs − pos·10| = |6 − 10| = 4. Bin 1: {8×2 rows, 2 pos} →
    // |16 − 20| = 4. ECE = (4+4)·10⁶ // (5·10) = 160000.
    // MCE: bin0 4e6//30=133333, bin1 4e6//20=200000 → 200000.
    val d = df(Seq((2L, 1L), (2L, 0L), (2L, 0L), (8L, 1L), (8L, 1L)))
    val r = Eval.calibrationError(d, "s", "y", bins = 2, scale = 10L)
      .collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("n_bins_used") === 2L)
    assert(r.getAs[Long]("ece_ppm") === 160000L)
    assert(r.getAs[Long]("mce_ppm") === 200000L)
  }

  test("calibrationError: a perfectly calibrated table reads zero") {
    // score 2/10 with exactly 20% positives; 8/10 with 80%.
    val d = df(
      Seq.fill(1)((2L, 1L)) ++ Seq.fill(4)((2L, 0L)) ++
      Seq.fill(4)((8L, 1L)) ++ Seq.fill(1)((8L, 0L)))
    val r = Eval.calibrationError(d, "s", "y", bins = 2, scale = 10L)
      .collect()(0)
    assert(r.getAs[Long]("ece_ppm") === 0L)
    assert(r.getAs[Long]("mce_ppm") === 0L)
  }

  test("mcnemar: hand-computed discordant counts and statistic") {
    import spark.implicits._
    // label always 1. p1 right/p2 wrong ×6 (b), p1 wrong/p2 right ×1 (c),
    // both right ×2, both wrong ×1 → stat = (|5|−1)²·1000/7 = 2285.
    val preds =
      Seq.fill(6)((1L, 0L, 1L)) ++ Seq.fill(1)((0L, 1L, 1L)) ++
      Seq.fill(2)((1L, 1L, 1L)) ++ Seq.fill(1)((0L, 0L, 1L))
    val r = Eval.mcnemar(preds.toDF("p1", "p2", "y"), "p1", "p2", "y")
      .collect()(0)
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("b") === 6L && r.getAs[Long]("c") === 1L)
    assert(r.getAs[Long]("stat_milli") === 2285L)
    assert(r.getAs[Long]("significant_05") === 0L)
  }

  test("mcnemar: edges — no discordance NULLs, strong asymmetry flags") {
    import spark.implicits._
    // identical classifiers: b = c = 0 → NULL statistic.
    val same = Seq.fill(5)((1L, 1L, 1L))
    val r0 = Eval.mcnemar(same.toDF("p1", "p2", "y"), "p1", "p2", "y")
      .collect()(0)
    assert(r0.isNullAt(r0.fieldIndex("stat_milli")))
    assert(r0.isNullAt(r0.fieldIndex("significant_05")))
    // b=10, c=0 → (9)²·1000/10 = 8100 > 3841 → significant.
    val strong = Seq.fill(10)((1L, 0L, 1L))
    val r1 = Eval.mcnemar(strong.toDF("p1", "p2", "y"), "p1", "p2", "y")
      .collect()(0)
    assert(r1.getAs[Long]("stat_milli") === 8100L)
    assert(r1.getAs[Long]("significant_05") === 1L)
    // |b−c| ≤ 1: correction clamps to zero, never negative.
    val tied = Seq((1L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L))
    val r2 = Eval.mcnemar(tied.toDF("p1", "p2", "y"), "p1", "p2", "y")
      .collect()(0)
    assert(r2.getAs[Long]("stat_milli") === 0L)
  }

  test("operatingPoint: hand-computed J and F1 argmax with tiebreaks") {
    // pos at {8, 6, 3}; neg at {7, 2, 1}. Candidate cuts (desc):
    //  t=8: tp1 fp0 → J = 1/3 + 1 − 1 = 1/3;      F1 = 2/(2+0+2) = .5
    //  t=7: tp1 fp1 → J = 1/3 − 1/3 = 0;           F1 = 2/5 = .4
    //  t=6: tp2 fp1 → J = 2/3 + 2/3 − 1 = 1/3;     F1 = 4/6 = .666
    //  t=3: tp3 fp1 → J = 1 + 2/3 − 1 = 2/3;       F1 = 6/7 = .857
    //  t=2: tp3 fp2 → J = 1/3;                      F1 = 6/8 = .75
    //  t=1: tp3 fp3 → J = 0;                        F1 = 6/9 = .666
    val d = df(Seq((8L, 1L), (6L, 1L), (3L, 1L), (7L, 0L), (2L, 0L),
      (1L, 0L)))
    val r = Eval.operatingPoint(d, "s", "y").collect()(0)
    assert(r.getAs[Long]("n_thresholds") === 6L)
    assert(r.getAs[Long]("best_j_threshold") === 3L)
    assert(r.getAs[Long]("best_j_ppm") === 666666L)
    assert(r.getAs[Long]("best_f1_threshold") === 3L)
    assert(r.getAs[Long]("best_f1_ppm") === 857142L)
    // J ties at 1/3 (t=8 and t=6 and t=2) would break to the LOWEST
    // threshold; verify via a single-class-J fixture below instead.
  }

  test("operatingPoint: one-class input NULLs J but keeps F1") {
    val onlyPos = df(Seq((5L, 1L), (3L, 1L)))
    val r = Eval.operatingPoint(onlyPos, "s", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("best_j_threshold")))
    assert(r.getAs[Long]("best_f1_threshold") === 3L) // include both
    assert(r.getAs[Long]("best_f1_ppm") === 1000000L)
  }

  test("targetEncode: out-of-fold means exclude the row's own fold") {
    import spark.implicits._
    // Force known folds by picking ids whose md5 4-hex prefix lands in
    // each quarter — verified below rather than assumed.
    def foldOf(id: Long, folds: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      (0 until folds - 1).count(i => h16 >= (i + 1) * 65536 / folds) match {
        case c => c
      }
    }
    // two folds: find ids for fold 0 and fold 1
    val f0 = (1L to 100L).filter(foldOf(_, 2) == 0).take(2)
    val f1 = (1L to 100L).filter(foldOf(_, 2) == 1).take(2)
    assert(f0.size == 2 && f1.size == 2)
    // category "a": fold0 labels {1, 1}, fold1 labels {0, 0}
    val rows = f0.map(id => (id, "a", 1L)) ++ f1.map(id => (id, "a", 0L))
    val got = Eval.targetEncode(rows.toDF("id", "cat", "y"),
        "id", "cat", "y", folds = 2)
      .collect().map(r => r.getAs[Long]("fold") ->
        r.getAs[Long]("encoding_ppm")).toMap
    // fold 0 rows are encoded by fold 1's mean (0) and vice versa (1e6)
    assert(got === Map(0L -> 0L, 1L -> 1000000L))
  }

  test("targetEncode: a single-fold category gets NULL, prior intact") {
    import spark.implicits._
    val rows = Seq((1L, "solo", 1L), (1L, "solo", 0L))
    val r = Eval.targetEncode(rows.toDF("id", "cat", "y"),
      "id", "cat", "y", folds = 2).collect()
    assert(r.length === 1)
    assert(r(0).isNullAt(r(0).fieldIndex("encoding_ppm")))
    assert(r(0).getAs[Long]("prior_ppm") === 500000L)
  }

  test("agreementStats: degenerate marginals yield NULL kappa") {
    // all positive, all predicted positive: N² = E
    val d = df(Seq((9L, 1L), (8L, 1L), (7L, 1L)))
    val r = Eval.agreementStats(d, "s", "y", threshold = 5L).collect()(0)
    assert(r.getAs[Long]("accuracy_ppm") === 1000000L)
    assert(r.isNullAt(r.fieldIndex("balanced_accuracy_ppm")))
    assert(r.isNullAt(r.fieldIndex("kappa_ppm")))
  }

  test("rocAucBy: per-slice AUC surfaces what the global number hides") {
    // slice "good": perfect separation; slice "bad": inverted; slice
    // "one": single class → NULL. Global AUC would read ~0.5 and hide
    // all three stories.
    val rows = Seq(
      ("good", 9L, 1L), ("good", 8L, 1L), ("good", 2L, 0L),
      ("bad", 9L, 0L), ("bad", 2L, 1L),
      ("one", 5L, 1L), ("one", 6L, 1L))
      .toDF("slice", "s", "y")
    val got = Eval.rocAucBy(rows, "slice", "s", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got("good") === ((2L, 1L, Some(1000000L))))
    assert(got("bad") === ((1L, 1L, Some(0L))))
    assert(got("one") === ((2L, 0L, None)))
  }

  test("mcc: perfect = 1, inverted = -1, majority-degenerate = NULL") {
    val perfect = df(Seq((9L, 1L), (8L, 1L), (2L, 0L), (1L, 0L)))
    val p = Eval.mcc(perfect, "s", "y", thresholdScore = 5L).collect()(0)
    assert(p.getAs[Long]("mcc_micro") === 1000000L)
    assert(p.getAs[Long]("accuracy_ppm") === 1000000L)
    val inverted = df(Seq((9L, 0L), (8L, 0L), (2L, 1L), (1L, 1L)))
    val i = Eval.mcc(inverted, "s", "y", thresholdScore = 5L).collect()(0)
    assert(i.getAs[Long]("mcc_micro") === -1000000L)
    // all predicted positive: tn + fn marginal empty → undefined
    val deg = Eval.mcc(df(Seq((9L, 1L), (8L, 0L))), "s", "y",
      thresholdScore = 5L).collect()(0)
    assert(deg.isNullAt(deg.fieldIndex("mcc_micro")))
    assert(deg.getAs[Long]("accuracy_ppm") === 500000L)
  }

  test("mcc: imbalance-honest where accuracy flatters") {
    // 9 negatives + 1 positive; classifier predicts the positive right
    // but also flags 3 negatives: accuracy 700000 looks fine, MCC is
    // the honest √(1·7/(4·10·... )) readout. tp=1 fp=3 fn=0 tn=6:
    // mcc = (6-0)/√(4·1·9·6) = 6/√216 ≈ 0.408248
    val d = df(Seq((9L, 1L)) ++ (1 to 3).map(i => (8L, 0L))
      ++ (1 to 6).map(i => (2L, 0L)))
    val r = Eval.mcc(d, "s", "y", thresholdScore = 5L).collect()(0)
    assert(r.getAs[Long]("n_tp") === 1L && r.getAs[Long]("n_fp") === 3L)
    assert(r.getAs[Long]("n_fn") === 0L && r.getAs[Long]("n_tn") === 6L)
    assert(r.getAs[Long]("accuracy_ppm") === 700000L)
    assert(r.getAs[Long]("mcc_micro") === 408248L)
  }

  test("conformalCore: empty test split keeps n_cal and q̂ (facts" +
    " known regardless of the split)") {
    import spark.implicits._
    val base = (1 to 9).map(r => (r.toLong, 1)).toDF("r", "graft_cal")
    val row = Eval.conformalCore(base, alphaPpm = 100000L).collect()(0)
    assert(row.getAs[Long]("n_cal") === 9L)
    assert(row.getAs[Long]("qhat") === 9L)
    assert(row.getAs[Long]("n_test") === 0L)
    assert(row.isNullAt(row.fieldIndex("coverage_ppm")))
  }

  test("passAtK: exact beyond the LONG fold's range (n=1000, k=10)") {
    import spark.implicits._
    // c = n − 1 wrong... use c=1 correct of n=1000: the falling
    // factorials telescope — num/den = (n−k−c+…)… = 990/1000 exactly,
    // so pass@10 = 10000 ppm. A LONG fold wraps at n≈300 for k=10;
    // the DECIMAL(38,0) fold must stay exact.
    val attempts = (1L to 1000L).map(i => ("t1", i == 1L))
      .toDF("task", "ok")
    val r = Eval.passAtK(attempts, "task", org.apache.spark.sql.functions.col("ok"), Seq(10))
      .collect()(0)
    assert(r.getAs[Long]("k") === 10L)
    assert(r.getAs[Long]("n_tasks") === 1L)
    assert(r.getAs[Long]("mean_pass_ppm") === 10000L)
  }

  test("passAtK: per-k exactness gate rejects n beyond 10^(32/k)") {
    import spark.implicits._
    val attempts = (1L to 1600L).map(i => ("t1", false))
      .toDF("task", "ok")
    val ex = intercept[Exception] {
      Eval.passAtK(attempts, "task", org.apache.spark.sql.functions.col("ok"), Seq(10)).collect()
    }
    assert(ex.getMessage.contains("exactness bound") ||
      Option(ex.getCause).exists(_.getMessage.contains("exactness bound")))
  }
}
