package graft.ml

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("fleissKappa: perfect agreement is 1.0; hand-computed negative" +
    " case truncates toward zero") {
    // perfect: 4 items × 2 raters, categories balanced across items
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "A"), (4L, "B"), (4L, "B")).toDF("item", "cat")
    val p = Agreement.fleissKappa(perfect, "item", "cat").collect()(0)
    assert(p.getAs[Long]("pbar_ppm") === 1000000L)
    assert(p.getAs[Long]("pe_ppm") === 500000L)
    assert(p.getAs[Long]("kappa_ppm") === 1000000L)
    // 2 items × 2 raters: (A,A) and (A,B) → P̄=1/2, P̄e=10/16,
    // kappa = −1/3 → −333333 by truncation (a floor would give −333334)
    val mixed = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val m = Agreement.fleissKappa(mixed, "item", "cat").collect()(0)
    assert(m.getAs[Long]("pbar_ppm") === 500000L)
    assert(m.getAs[Long]("pe_ppm") === 625000L)
    assert(m.getAs[Long]("kappa_ppm") === -333333L)
    // single observed category: no chance correction → NULL
    val one = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
      .toDF("item", "cat")
    val o = Agreement.fleissKappa(one, "item", "cat").collect()(0)
    assert(o.isNullAt(o.fieldIndex("kappa_ppm")))
  }

  test("fleissKappa: unequal rater counts fail loudly") {
    val bad = Seq((1L, "A"), (1L, "A"), (2L, "A"))
      .toDF("item", "cat")
    val ex = intercept[Exception] {
      Agreement.fleissKappa(bad, "item", "cat").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("same rater count")))
  }

  test("krippendorffAlpha: hand case α = 0 (observed = expected" +
    " disagreement); perfect agreement α = 1") {
    // (A,A) + (A,B): Do = 2/4, De = 6/12 → α = 0 exactly
    val mixed = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val m = Agreement.krippendorffAlpha(mixed, "item", "cat").collect()(0)
    assert(m.getAs[Long]("do_ppm") === 500000L)
    assert(m.getAs[Long]("de_ppm") === 500000L)
    assert(m.getAs[Long]("alpha_ppm") === 0L)
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
      .toDF("item", "cat")
    val p = Agreement.krippendorffAlpha(perfect, "item", "cat")
      .collect()(0)
    assert(p.getAs[Long]("do_ppm") === 0L)
    assert(p.getAs[Long]("alpha_ppm") === 1000000L)
    // all one category: De = 0 → NULL (not 1.0 — nothing to disagree on)
    val one = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
      .toDF("item", "cat")
    val o = Agreement.krippendorffAlpha(one, "item", "cat").collect()(0)
    assert(o.isNullAt(o.fieldIndex("alpha_ppm")))
  }

  test("matchLeaderboard: Copeland from head-to-heads, one-sided pairs") {
    val matches = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "b")).toDF("w", "l")
    val got = Agreement.matchLeaderboard(matches, "w", "l")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("a") === ((3L, 1L, 750000L, 2L)))
    assert(got("b") === ((1L, 3L, 250000L, -2L)))
    assert(got("c") === ((1L, 1L, 500000L, 0L)))
  }
}
