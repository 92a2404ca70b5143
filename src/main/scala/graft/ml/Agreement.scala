package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-rater annotation analytics — the label-quality gate an RLHF /
  * supervised-data pipeline runs before trusting human (or judge-model)
  * ratings, kept EXACT (integer vote counts, decimal(38,0) rationals,
  * floor-ppm; the [[Eval]] discipline — no libm anywhere):
  *
  *  - [[fleissKappa]] (Fleiss 1971): chance-corrected agreement for N
  *    items × n raters over k nominal categories.
  *  - [[krippendorffAlpha]] (Krippendorff 1970, nominal metric):
  *    disagreement-based 1 − Do/De with the sampling-without-
  *    replacement expected disagreement (T−1 denominator) — the number
  *    annotation platforms quote next to kappa.
  *  - [[matchLeaderboard]]: the tournament readout of pairwise
  *    preference matches — per-model win rates and the Copeland score
  *    (head-to-head beats minus beaten-bys), the Elo-free leaderboard
  *    that needs no logistic fit and stays integer-exact.
  *
  * Both agreement statistics REQUIRE the equal-raters-per-item design
  * (Fleiss' assumption; it also makes Krippendorff's per-item
  * denominators uniform, keeping the rational exact) and assert it
  * loudly rather than silently mis-averaging. Negative kappa/alpha
  * truncate toward zero (the agreementStats div semantics, identical
  * in DuckDB). Scale: one (item, cat) reduction, one category rollup,
  * 1-row reports; the leaderboard is |models|²-bounded. */
object Agreement {

  private val dec = "decimal(38,0)"

  /** Per-item category counts + the equal-n gate; returns (perItem
    * [item, sumSq, n], perCat [cat, total]). */
  private def substrate(votes: DataFrame, itemCol: String,
                        catCol: String): (DataFrame, DataFrame) = {
    val cells = votes
      .groupBy(col(itemCol).as("graft_it"), col(catCol).as("graft_c"))
      .agg(count(lit(1)).as("graft_nc"))
    val perItem = cells.groupBy("graft_it")
      .agg(sum(expr("graft_nc * graft_nc")).cast(dec).as("graft_ssq"),
        sum("graft_nc").cast(dec).as("graft_n"))
    val perCat = cells.groupBy("graft_c")
      .agg(sum("graft_nc").cast(dec).as("graft_t"))
    (perItem, perCat)
  }

  /** Fleiss' kappa over (item, category) votes. One row:
    * n_items, n_raters, pbar_ppm, pe_ppm, kappa_ppm (NULL when
    * P̄e = 1 — a single observed category has no chance correction). */
  def fleissKappa(votes: DataFrame, itemCol: String,
                  catCol: String): DataFrame = {
    val (perItem, perCat) = substrate(votes, itemCol, catCol)
    val items = perItem.agg(
      count(lit(1)).cast(dec).as("graft_ni"),
      min("graft_n").cast("long").as("graft_nmin"),
      max("graft_n").cast("long").as("graft_nmax"),
      sum(expr("graft_ssq - graft_n")).cast(dec).as("graft_a"))
    val cats = perCat.agg(
      sum(expr("graft_t * graft_t")).cast(dec).as("graft_b"))
    items.crossJoin(broadcast(cats))
      .filter(assert_true(col("graft_nmin") === col("graft_nmax") &&
        col("graft_nmin") >= 2L,
        lit("fleissKappa: every item needs the same rater count (>= 2)" +
          " — the Fleiss design")).isNull)
      // N·n ≤ 1e9 and n ≤ 1e3 ⇒ the kappa numerator A·(Nn)²·10⁶ ≤
      // (Nn·n)·(Nn)²·10⁶ < 10³⁰·10³·10⁶ < 10³⁸ — provably exact.
      .filter(assert_true(expr("graft_ni * graft_nmax <= 1000000000" +
        " AND graft_nmax <= 1000"),
        lit("fleissKappa: N*n beyond the exactness gate — sample items"))
        .isNull)
      .select(
        col("graft_ni").cast("long").as("n_items"),
        col("graft_nmax").as("n_raters"),
        expr("CAST(graft_a * 1000000 div (graft_ni * graft_nmax" +
          " * (graft_nmax - 1)) AS BIGINT)").as("pbar_ppm"),
        expr("CAST(graft_b * 1000000 div (graft_ni * graft_nmax" +
          " * graft_ni * graft_nmax) AS BIGINT)").as("pe_ppm"),
        expr("CASE WHEN graft_b = graft_ni * graft_nmax * graft_ni" +
          " * graft_nmax THEN CAST(NULL AS BIGINT) ELSE" +
          " CAST((graft_a * graft_ni * graft_nmax * graft_ni * graft_nmax" +
          "   - graft_b * graft_ni * graft_nmax * (graft_nmax - 1))" +
          "  * 1000000 div (graft_ni * graft_nmax * (graft_nmax - 1)" +
          "   * (graft_ni * graft_nmax * graft_ni * graft_nmax - graft_b))" +
          " AS BIGINT) END").as("kappa_ppm"))
  }

  /** Krippendorff's alpha (nominal metric) over (item, category)
    * votes, equal raters per item. One row: n_items, n_ratings,
    * do_ppm, de_ppm, alpha_ppm (NULL when De = 0). */
  def krippendorffAlpha(votes: DataFrame, itemCol: String,
                        catCol: String): DataFrame = {
    val (perItem, perCat) = substrate(votes, itemCol, catCol)
    val items = perItem.agg(
      count(lit(1)).cast(dec).as("graft_ni"),
      min("graft_n").cast("long").as("graft_nmin"),
      max("graft_n").cast("long").as("graft_nmax"),
      sum("graft_ssq").cast(dec).as("graft_ssq_all"))
    val cats = perCat.agg(
      sum(expr("graft_t * graft_t")).cast(dec).as("graft_tsq"))
    items.crossJoin(broadcast(cats))
      .filter(assert_true(col("graft_nmin") === col("graft_nmax") &&
        col("graft_nmin") >= 2L,
        lit("krippendorffAlpha: every item needs the same rater count" +
          " (>= 2) — unequal designs break the exact rational")).isNull)
      // same bound as fleissKappa: alpha's numerator is two products of
      // (≤ Nn·n)·(≤ (Nn)²) terms — ×10⁶ stays under 10³⁸ at Nn ≤ 1e9.
      .filter(assert_true(expr("graft_ni * graft_nmax <= 1000000000" +
        " AND graft_nmax <= 1000"),
        lit("krippendorffAlpha: N*n beyond the exactness gate — sample"))
        .isNull)
      // T = N·n; Do = (N·n² − Σssq)/(N·n·(n−1)); De = (T² − ΣT²)/(T(T−1))
      .select(
        col("graft_ni").cast("long").as("n_items"),
        expr("CAST(graft_ni * graft_nmax AS BIGINT)").as("n_ratings"),
        expr("CAST((graft_ni * graft_nmax * graft_nmax - graft_ssq_all)" +
          " * 1000000 div (graft_ni * graft_nmax * (graft_nmax - 1))" +
          " AS BIGINT)").as("do_ppm"),
        expr("CAST((graft_ni * graft_nmax * graft_ni * graft_nmax" +
          " - graft_tsq) * 1000000 div (graft_ni * graft_nmax" +
          " * (graft_ni * graft_nmax - 1)) AS BIGINT)").as("de_ppm"),
        expr("CASE WHEN graft_ni * graft_nmax * graft_ni * graft_nmax" +
          " = graft_tsq THEN CAST(NULL AS BIGINT) ELSE" +
          " CAST((" +
          "  (graft_ni * graft_nmax * (graft_nmax - 1))" +
          "   * (graft_ni * graft_nmax * graft_ni * graft_nmax - graft_tsq)" +
          "  - (graft_ni * graft_nmax * graft_nmax - graft_ssq_all)" +
          "   * (graft_ni * graft_nmax * (graft_ni * graft_nmax - 1))" +
          " ) * 1000000 div (" +
          "  (graft_ni * graft_nmax * (graft_nmax - 1))" +
          "   * (graft_ni * graft_nmax * graft_ni * graft_nmax - graft_tsq)" +
          " ) AS BIGINT) END").as("alpha_ppm"))
  }

  /** Pairwise-match leaderboard: per model the match record and the
    * Copeland score = (#opponents it beats head-to-head) − (#opponents
    * beating it), ties contributing zero. */
  def matchLeaderboard(matches: DataFrame, winnerCol: String,
                       loserCol: String): DataFrame = {
    val pc = matches
      .groupBy(col(winnerCol).as("graft_a"), col(loserCol).as("graft_b"))
      .agg(count(lit(1)).as("graft_w"))
    // both orientations, with zero-count fill for one-sided pairs
    val sym = pc
      .join(pc.select(col("graft_a").as("graft_b"),
        col("graft_b").as("graft_a"), col("graft_w").as("graft_wr")),
        Seq("graft_a", "graft_b"), "full_outer")
      .select(col("graft_a"), col("graft_b"),
        coalesce(col("graft_w"), lit(0L)).as("graft_w"),
        coalesce(col("graft_wr"), lit(0L)).as("graft_wr"))
    val cope = sym.groupBy(col("graft_a").as("model"))
      .agg(sum(when(col("graft_w") > col("graft_wr"), 1L)
        .when(col("graft_w") < col("graft_wr"), -1L).otherwise(0L))
        .cast("long").as("copeland"),
        sum(col("graft_w")).cast("long").as("n_wins"),
        sum(col("graft_wr")).cast("long").as("n_losses"))
    cope.select(col("model"), col("n_wins"), col("n_losses"),
      expr("CASE WHEN n_wins + n_losses = 0 THEN CAST(NULL AS BIGINT)" +
        " ELSE n_wins * 1000000 div (n_wins + n_losses) END")
        .as("win_rate_ppm"),
      col("copeland"))
  }
}
