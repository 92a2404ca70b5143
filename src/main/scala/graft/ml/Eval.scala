package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact model-evaluation metrics over a scored table — the offline-eval
  * leg the training-data pipeline needs next to its training operators
  * (reference analog: the sklearn metric calls in ml_training_dag.py and
  * the notebooks' accuracy readouts, re-expressed as distributed exact
  * aggregates instead of driver-side sklearn).
  *
  * Contract: `scoreCol` is an INTEGER-quantized score (callers quantize a
  * probability/heuristic to a fixed scale, e.g. 1e4) and `labelCol` is
  * 0/1. Quantization is what makes every metric here an exact integer
  * computation: counts and rank sums are integers, rates are floor-divided
  * parts-per-million — bit-identical across engines, so each readout
  * hash-checks against an ANSI-SQL oracle (unlike double-valued AUC from
  * an ML library, which is accumulation-order-dependent).
  *
  * Scale posture (100 TB): every metric first collapses the corpus to a
  * per-distinct-score table — ONE hash shuffle on the score, cardinality
  * bounded by the quantization scale (≤ scale+1 rows, e.g. 10 001), NOT
  * by the corpus. The rank/cumulative window that follows runs on that
  * bounded table (single-partition window over ≤ scale rows is O(scale),
  * independent of corpus size). Threshold sweeps broadcast the threshold
  * list onto the same bounded table. Nothing corpus-sized is collected,
  * sorted globally, or joined pairwise.
  */
object Eval {

  /** Hard ceiling on distinct quantized scores: far above any honest
    * quantization scale (the contract suggests 1e4), far below a raw
    * double column's cardinality. Overridable per session via
    * [[MaxDistinctConfKey]]. */
  private[graft] val MaxDistinctScores: Long = 1L << 20
  val MaxDistinctConfKey = "graft.eval.maxDistinctScores"

  /** Per-distinct-score (p = positives, n = negatives) counts as
    * decimal(38,0) — the shared substrate of every metric here.
    *
    * The quantized-score contract is ENFORCED, not assumed: a lazy
    * in-plan gate (a global count over this already-bounded table,
    * asserted inside a Filter so column pruning can't drop it) raises at
    * execution when distinct-score cardinality exceeds
    * [[MaxDistinctScores]] — an unquantized caller fails loudly instead
    * of silently single-partition-sorting a corpus-cardinality table. */
  private def perScore(scored: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val maxDistinct = scored.sparkSession.conf
      .get(MaxDistinctConfKey, MaxDistinctScores.toString).toLong
    scored
      .select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s")
      .agg(sum("y").cast("decimal(38,0)").as("p"),
        (count(lit(1)) - sum("y")).cast("decimal(38,0)").as("n"))
      .withColumn("graft_card", count(lit(1)).over(wAll))
      .filter(assert_true(col("graft_card") <= lit(maxDistinct),
        lit(s"Eval: more than $maxDistinct distinct scores — " +
          "quantize scoreCol to a fixed integer scale before calling " +
          "(the documented contract)")).isNull)
      .drop("graft_card")
  }

  /** Exact ROC-AUC via the Mann-Whitney rank formulation with midrank tie
    * handling, in integer arithmetic throughout:
    *
    *   2·U = Σ_s p_s · (2·N_<s + n_s)        (per distinct score s)
    *   AUC = U / (P·N)  →  auc_ppm = 2U·10⁶ div (2·P·N)
    *
    * where N_<s = negatives with a strictly lower score. The `2·` keeps
    * the tie midrank (each tied pair contributes ½) integral. Returns ONE
    * row: (n_pos, n_neg, auc_ppm, gini_ppm); auc_ppm is NULL when either
    * class is empty (AUC undefined — same CASE in the oracle).
    *
    * The cumulative window runs over the per-score table (≤ scale rows),
    * so the single partition it implies is a bounded constant, not a
    * corpus-sized sort. */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    perScore(scored, scoreCol, labelCol)
      .withColumn("nlt",
        coalesce(sum("n").over(w), lit(0).cast("decimal(38,0)")))
      .agg(sum(expr("p * (2 * nlt + n)")).as("num2"),
        // coalesce: SQL SUM of an EMPTY input is NULL — an empty scored
        // table must read as zero counts, not a null report row
        coalesce(sum("p"), lit(0).cast("decimal(38,0)")).as("pos"),
        coalesce(sum("n"), lit(0).cast("decimal(38,0)")).as("neg"))
      .select(col("pos").cast("long").as("n_pos"),
        col("neg").cast("long").as("n_neg"),
        expr("CASE WHEN pos = 0 OR neg = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE num2 * 1000000 div (2 * pos * neg) END").as("auc_ppm"))
      .withColumn("gini_ppm", expr("2 * auc_ppm - 1000000"))
  }

  /** Exact AVERAGE PRECISION (the area under the precision-recall
    * curve by the step definition) — the ranking readout that matters
    * when positives are rare and ROC-AUC flatters (the class-imbalance
    * regime every quality-classifier gate lives in): AP = (1/P) Σ over
    * positives of precision@its-rank. Tied scores make "its rank"
    * ambiguous, so BOTH deterministic bounds report — `ap_pess_ppm`
    * places every tied negative BEFORE the tied positives (the
    * conservative bound), `ap_opt_ppm` places them after — and a
    * tie-free ranking lies between them (equal when no block mixes
    * classes). Arithmetic: per tied block with p positives, n
    * negatives, P/R positives/rows retrieved before it, the j-th
    * positive contributes (P+j)·10⁹ div (R[+n]+j); each term floors at
    * the 10⁹ fixed point (the one documented rounding, mirrored by the
    * oracle) and the sum divides once by 1000·P into ppm. The explode
    * is one row per POSITIVE (Σp = P, corpus-bounded); the cumulative
    * window runs over the [[perScore]] table with its cardinality gate.
    * Returns ONE row: (n_pos, n_neg, ap_pess_ppm, ap_opt_ppm); NULL AP
    * when no positive exists. */
  def averagePrecision(scored: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val per = perScore(scored, scoreCol, labelCol)
    val cum = per
      .withColumn("graft_P",
        coalesce(sum("p").over(w), lit(0).cast("decimal(38,0)")))
      .withColumn("graft_R",
        coalesce(sum(expr("p + n")).over(w), lit(0).cast("decimal(38,0)")))
    val terms = cum
      .filter(col("p") > 0)
      .select(col("n"), col("graft_P"), col("graft_R"),
        explode(expr("sequence(CAST(1 AS BIGINT), CAST(p AS BIGINT))"))
          .as("j"))
      .select(
        // decimal re-cast: the per-term quotient is a long, but the sum
        // over 10¹⁰ positives at the 10⁹ fixed point outgrows it
        expr("CAST((graft_P + j) * 1000000000 div (graft_R + j)" +
          " AS DECIMAL(38,0))").as("t_opt"),
        expr("CAST((graft_P + j) * 1000000000 div (graft_R + n + j)" +
          " AS DECIMAL(38,0))").as("t_pess"))
    val tot = per.agg(
      coalesce(sum("p"), lit(0).cast("decimal(38,0)")).as("pos"),
      coalesce(sum("n"), lit(0).cast("decimal(38,0)")).as("neg"))
    terms
      .agg(coalesce(sum("t_opt"), lit(0L)).as("graft_so"),
        coalesce(sum("t_pess"), lit(0L)).as("graft_sp"))
      .crossJoin(broadcast(tot))
      .select(col("pos").cast("long").as("n_pos"),
        col("neg").cast("long").as("n_neg"),
        expr("CASE WHEN pos = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE graft_sp div (1000 * pos) END").as("ap_pess_ppm"),
        expr("CASE WHEN pos = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE graft_so div (1000 * pos) END").as("ap_opt_ppm"))
  }

  /** Per-SLICE ROC-AUC — the model-card readout a single global AUC
    * hides: a scorer can rank well in aggregate while failing an entire
    * language/source/segment (aggregation masking), and per-slice AUC
    * is the standard fairness/robustness check before shipping.
    * Identical Mann-Whitney midrank arithmetic to [[rocAuc]], with the
    * per-distinct-score substrate and the cumulative window both
    * PARTITIONED BY the slice — one hash shuffle on (slice, score),
    * per-slice windows over ≤ scale rows each, never a global sort.
    * Slices with one class read NULL (AUC undefined there — exactly the
    * slices the report exists to surface). */
  def rocAucBy(scored: DataFrame, sliceCol: String, scoreCol: String,
               labelCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val maxDistinct = scored.sparkSession.conf
      .get(MaxDistinctConfKey, MaxDistinctScores.toString).toLong
    val per = scored
      .select(col(sliceCol).as("graft_g"),
        col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .filter(col("graft_g").isNotNull)
      .groupBy("graft_g", "s")
      .agg(sum("y").cast("decimal(38,0)").as("p"),
        (count(lit(1)) - sum("y")).cast("decimal(38,0)").as("n"))
      .withColumn("graft_card", count(lit(1)).over(wAll))
      .filter(assert_true(col("graft_card") <= lit(maxDistinct),
        lit("rocAucBy: more than the configured distinct (slice, score)" +
          " pairs — quantize the score first")).isNull)
    val w = Window.partitionBy("graft_g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("nlt",
        coalesce(sum("n").over(w), lit(0).cast("decimal(38,0)")))
      .groupBy(col("graft_g").as(sliceCol))
      .agg(sum(expr("p * (2 * nlt + n)")).as("num2"),
        coalesce(sum("p"), lit(0).cast("decimal(38,0)")).as("pos"),
        coalesce(sum("n"), lit(0).cast("decimal(38,0)")).as("neg"))
      .select(col(sliceCol), col("pos").cast("long").as("n_pos"),
        col("neg").cast("long").as("n_neg"),
        expr("CASE WHEN pos = 0 OR neg = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE num2 * 1000000 div (2 * pos * neg) END").as("auc_ppm"))
  }

  /** Reliability (calibration) table: scores on [0, scale] fall into
    * `bins` equal-width bins (top edge folded into the last bin); per bin
    * the row count, exact mean score in ppm-of-scale, and the empirical
    * positive rate in ppm. A well-calibrated scorer has
    * mean_score_ppm ≈ pos_rate_ppm per bin. One corpus shuffle (the
    * per-score collapse); the binning is arithmetic on the bounded
    * table. */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int, scale: Long): DataFrame = {
    require(bins > 0 && scale > 0, "bins and scale must be positive")
    perScore(scored, scoreCol, labelCol)
      .withColumn("bin",
        least(expr(s"s * $bins div ${scale}L"), lit(bins - 1L)))
      .groupBy("bin")
      .agg(sum(expr("p + n")).as("cnt"),
        sum(expr("s * (p + n)")).as("sum_s"),
        sum("p").as("pos"))
      .select(col("bin"),
        col("cnt").cast("long").as("n_docs"),
        expr(s"sum_s * 1000000 div (cnt * ${scale}L)").as("mean_score_ppm"),
        expr("pos * 1000000 div cnt").as("pos_rate_ppm"))
      .orderBy("bin")
  }

  /** Confusion counts + precision/recall/F1 at each threshold (predict
    * positive iff score ≥ t). The per-score table joins the broadcast
    * |thresholds|-row list — fan-out ≤ scale·|thresholds|, corpus-free.
    * Rates are floor-ppm; precision is NULL when nothing is predicted
    * positive, F1 NULL when precision+recall = 0 (same CASEs in the
    * oracle). */
  def thresholdSweep(scored: DataFrame, scoreCol: String, labelCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = scored.sparkSession
    import spark.implicits._
    val ts = broadcast(thresholds.toDF("t"))
    perScore(scored, scoreCol, labelCol)
      .crossJoin(ts)
      .groupBy("t")
      .agg(sum(when(col("s") >= col("t"), col("p")).otherwise(lit(0)))
        .as("tp"),
        sum(when(col("s") >= col("t"), col("n")).otherwise(lit(0))).as("fp"),
        sum(when(col("s") < col("t"), col("p")).otherwise(lit(0))).as("fn"),
        sum(when(col("s") < col("t"), col("n")).otherwise(lit(0))).as("tn"))
      .select(col("t").as("threshold"),
        col("tp").cast("long").as("tp"), col("fp").cast("long").as("fp"),
        col("fn").cast("long").as("fn"), col("tn").cast("long").as("tn"),
        expr("CASE WHEN tp + fp = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE tp * 1000000 div (tp + fp) END").as("precision_ppm"),
        expr("CASE WHEN tp + fn = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE tp * 1000000 div (tp + fn) END").as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("CASE WHEN coalesce(precision_ppm, 0) + coalesce(recall_ppm, 0)" +
          " = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE 2 * coalesce(precision_ppm, 0) * coalesce(recall_ppm, 0)" +
          " div (coalesce(precision_ppm, 0) + coalesce(recall_ppm, 0)) END"))
      .orderBy("threshold")
  }

  /** Cumulative gains / lift chart — "if we act on the top 10%/20%/…
    * by score, what share of the positives do we capture, and how much
    * better than random": the campaign-targeting readout next to
    * [[rocAuc]]'s single number. Buckets are GROUPS-ATOMIC: each
    * distinct score is assigned whole to the bucket its first row's
    * cumulative position lands in (bucket = ⌊cumBefore·tiles/total⌋+1),
    * so heavy score ties never split nondeterministically across
    * buckets — bucket populations may be uneven under ties, which is
    * the honest, engine-replayable contract (a row-split rule would
    * depend on an arbitrary within-score order no engine can replay).
    *
    * Exactness: cum_pos/cum_rows accumulate the decimal per-score
    * counts; gain_ppm = cum_pos·10⁶ div totalPos and
    * lift_ppm = cum_pos·total·10⁶ div (cum_rows·totalPos) are single
    * nonnegative floor divisions. Perfect targeting ⇒ gain hits 10⁶
    * within the positive-rate fraction; random ⇒ lift ≈ 10⁶ everywhere.
    *
    * Scale: one corpus shuffle (the per-score collapse, cardinality
    * gate enforced); every window runs over the bounded score/bucket
    * tables. */
  def gainsChart(scored: DataFrame, scoreCol: String, labelCol: String,
                 tiles: Int = 10): DataFrame = {
    require(tiles > 1, "need at least two buckets")
    val wAll = Window.partitionBy()
    val before = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumB = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    perScore(scored, scoreCol, labelCol)
      .withColumn("t", expr("p + n"))
      .withColumn("graft_cb",
        coalesce(sum("t").over(before), lit(0).cast("decimal(38,0)")))
      .withColumn("graft_total", sum("t").over(wAll))
      .withColumn("graft_tp", sum("p").over(wAll))
      .withColumn("bucket",
        expr(s"CAST(graft_cb * $tiles div graft_total AS BIGINT) + 1"))
      .groupBy("bucket")
      .agg(sum("t").as("graft_t"), sum("p").as("graft_p"),
        max("graft_total").as("graft_total"), max("graft_tp").as("graft_tp"))
      .withColumn("graft_ct", sum("graft_t").over(cumB))
      .withColumn("graft_cp", sum("graft_p").over(cumB))
      .select(col("bucket"),
        col("graft_t").cast("long").as("n_rows"),
        col("graft_p").cast("long").as("n_pos"),
        col("graft_ct").cast("long").as("cum_rows"),
        col("graft_cp").cast("long").as("cum_pos"),
        expr("CASE WHEN graft_tp = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE graft_cp * 1000000 div graft_tp END").as("gain_ppm"),
        expr("CASE WHEN graft_tp = 0 OR graft_ct = 0" +
          " THEN CAST(NULL AS BIGINT)" +
          " ELSE graft_cp * graft_total * 1000000" +
          " div (graft_ct * graft_tp) END").as("lift_ppm"))
  }

  /** Chance-corrected agreement at one operating threshold — the readout
    * [[thresholdSweep]]'s raw precision/recall can fake under class
    * imbalance (predict-all-majority scores 99% accuracy on a 99/1
    * corpus): balanced accuracy averages the per-class recalls, and
    * Cohen's kappa subtracts the agreement a label-marginal-preserving
    * random classifier would get.
    *
    * Exactness: every metric is a RATIONAL in the confusion counts, so
    * each is one truncated division — kappa clears its denominators:
    *
    *   kappa = (po − pe)/(1 − pe)
    *         = (N·(tp+tn) − E) / (N² − E),
    *   E = (tp+fp)(tp+fn) + (fn+tn)(fp+tn)
    *
    * Truncation (not floor) matters for once here: kappa can be NEGATIVE
    * (systematic disagreement), and Spark `div` / DuckDB `//` both
    * truncate toward zero — parity holds on negative operands too.
    * Balanced accuracy is the mean of the two floored recalls (documented
    * floor-of-floors). kappa is NULL when N² = E (a degenerate marginal:
    * either side all one class); balanced accuracy NULL when a true class
    * is empty.
    *
    * Scale: decimal(38,0) end-to-end — N ≤ 10¹² keeps N²·10⁶ ≤ 10³⁰ well
    * inside 38 digits (and HUGEINT on the oracle side). One corpus
    * shuffle (the per-score collapse), then a one-row aggregate. */
  def agreementStats(scored: DataFrame, scoreCol: String, labelCol: String,
                     threshold: Long): DataFrame = {
    perScore(scored, scoreCol, labelCol)
      .agg(sum(when(col("s") >= threshold, col("p")).otherwise(lit(0)))
        .cast("decimal(38,0)").as("gtp"),
        sum(when(col("s") >= threshold, col("n")).otherwise(lit(0)))
          .cast("decimal(38,0)").as("gfp"),
        sum(when(col("s") < threshold, col("p")).otherwise(lit(0)))
          .cast("decimal(38,0)").as("gfn"),
        sum(when(col("s") < threshold, col("n")).otherwise(lit(0)))
          .cast("decimal(38,0)").as("gtn"))
      .select(lit(threshold).as("threshold"),
        col("gtp").cast("long").as("tp"), col("gfp").cast("long").as("fp"),
        col("gfn").cast("long").as("fn"), col("gtn").cast("long").as("tn"),
        expr("CASE WHEN gtp + gfp + gfn + gtn = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE (gtp + gtn) * 1000000 div (gtp + gfp + gfn + gtn) END")
          .as("accuracy_ppm"),
        expr("CASE WHEN gtp + gfn = 0 OR gtn + gfp = 0"
          + " THEN CAST(NULL AS BIGINT)"
          + " ELSE (gtp * 1000000 div (gtp + gfn)"
          + "     + gtn * 1000000 div (gtn + gfp)) div 2 END")
          .as("balanced_accuracy_ppm"),
        expr("CASE WHEN (gtp + gfp + gfn + gtn) * (gtp + gfp + gfn + gtn)"
          + "   - ((gtp + gfp) * (gtp + gfn) + (gfn + gtn) * (gfp + gtn)) = 0"
          + " THEN CAST(NULL AS BIGINT)"
          + " ELSE ((gtp + gfp + gfn + gtn) * (gtp + gtn)"
          + "     - ((gtp + gfp) * (gtp + gfn) + (gfn + gtn) * (gfp + gtn)))"
          + "   * 1000000"
          + "   div ((gtp + gfp + gfn + gtn) * (gtp + gfp + gfn + gtn)"
          + "     - ((gtp + gfp) * (gtp + gfn) + (gfn + gtn) * (gfp + gtn)))"
          + " END").as("kappa_ppm"))
  }

  /** Split-conformal prediction interval + held-out coverage — the
    * distribution-free calibration guarantee (Vovk; Angelopoulos &
    * Bates 2021 §2): with exchangeable data, the interval
    * pred ± q̂ — where q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest
    * calibration nonconformity |actual − pred| — covers the truth with
    * probability ≥ 1−α, NO model or distribution assumptions. This
    * operator computes q̂ exactly and then MEASURES the coverage on the
    * disjoint test split, the audit a shipped interval needs.
    *
    * Exactness: q̂ is an ORDER STATISTIC, not an interpolated quantile —
    * k = ⌈(n+1)(10⁶−α_ppm)/10⁶⌉ in pure integers, q̂ = the smallest
    * residual whose cumulative count reaches k; when k > n_cal the
    * conformal interval is infinite — q̂ and coverage surface as NULL
    * rather than a fabricated number. Coverage is one floor-ppm.
    *
    * Scale: the cal/test split is the md5 nibble rule (pure function of
    * the id — engine/partitioning/retry stable); residuals collapse to a
    * per-distinct-value table (ONE shuffle, gated by the same
    * cardinality bound as [[MaxDistinctScores]] — residuals of
    * quantized predictions are quantized too), the cumulative window
    * runs over that bounded table, and the test side is one aggregate
    * against the broadcast 1-row q̂. */
  def conformalCoverage(rows: DataFrame, idCol: String, predCol: String,
                        actualCol: String, alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      "alphaPpm must be inside (0, 1e6)")
    val base = rows.select(
      abs(col(actualCol).cast("long") - col(predCol).cast("long")).as("r"),
      (substring(md5(col(idCol).cast("string")), 1, 1) < "8")
        .cast("int").as("graft_cal"))
    conformalCore(base, alphaPpm)
  }

  /** The q̂/coverage assembly over a pre-split (r, graft_cal) table —
    * split out so specs can drive it with hand-assigned splits. */
  private[graft] def conformalCore(base: DataFrame,
                                   alphaPpm: Long): DataFrame = {
    val wAll = Window.partitionBy()
    val maxDistinct = base.sparkSession.conf
      .get(MaxDistinctConfKey, MaxDistinctScores.toString).toLong
    val wCum = Window.orderBy("r")
      .rowsBetween(Window.unboundedPreceding, 0)
    val calCum = base.filter(col("graft_cal") === 1)
      .groupBy("r").agg(count(lit(1)).as("cnt"))
      .withColumn("graft_card", count(lit(1)).over(wAll))
      .filter(assert_true(col("graft_card") <= lit(maxDistinct),
        lit("conformalCoverage: residual cardinality exceeds the bound —" +
          " quantize predCol/actualCol")).isNull)
      .withColumn("cum", sum("cnt").over(wCum))
    val nCal = calCum.agg(coalesce(sum("cnt"), lit(0L)).as("ncal"))
      .select(col("ncal"),
        expr(s"((ncal + 1) * ${1000000L - alphaPpm} + 999999)"
          + " div 1000000").as("k"))
    val qhat = calCum.crossJoin(broadcast(nCal))
      .filter(col("cum") >= col("k"))
      .agg(min("r").as("graft_qh"))
    // Aggregate the test side ALONE, then crossJoin the 1-row nCal and
    // q-hat frames after: n_cal/k/qhat are calibration facts known
    // regardless of the test split, so they must survive an EMPTY test
    // split (first() over zero rows would null them out).
    val test = base.filter(col("graft_cal") === 0)
      .crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("ntest"),
        coalesce(sum(when(col("r") <= col("graft_qh"), 1L)
          .otherwise(0L)), lit(0L)).as("covered"))
      .crossJoin(broadcast(nCal)).crossJoin(broadcast(qhat))
    test.select(
      col("ncal").cast("long").as("n_cal"),
      col("ntest").cast("long").as("n_test"),
      expr("CASE WHEN k > ncal THEN CAST(NULL AS BIGINT)"
        + " ELSE graft_qh END").as("qhat"),
      expr("CASE WHEN k > ncal OR ntest = 0 THEN CAST(NULL AS BIGINT)"
        + " ELSE covered * 1000000 div ntest END").as("coverage_ppm"),
      lit(1000000L - alphaPpm).as("target_ppm"))
  }

  /** Expected + maximum calibration error — [[calibration]]'s table as
    * the two numbers a model card quotes. The usual float pipeline
    * (per-bin |confidence − accuracy| means) collapses here to ONE exact
    * rational: with conf_b = Σs_b/(n_b·scale) and acc_b = o_b/n_b,
    *
    *   ECE = Σ_b n_b·|conf_b − acc_b| / N
    *       = Σ_b |Σs_b − o_b·scale| / (scale·N)
    *
    * — the n_b denominators cancel, so ece_ppm is a single floor
    * division over integer bin sums (no per-bin floors at all). MCE
    * takes the max of per-bin floor-ppm errors; floor is monotone, so
    * max-of-floors = floor-of-max — still exactly floor(10⁶·true MCE).
    * Same equal-width binning as [[calibration]] (top edge folded).
    * One gated per-score collapse, a ≤bins-row aggregate, a one-row
    * report. */
  def calibrationError(scored: DataFrame, scoreCol: String,
                       labelCol: String, bins: Int,
                       scale: Long): DataFrame = {
    require(bins > 0 && scale > 0, "bins and scale must be positive")
    perScore(scored, scoreCol, labelCol)
      .withColumn("bin",
        least(expr(s"s * $bins div ${scale}L"), lit(bins - 1L)))
      .groupBy("bin")
      .agg(sum(expr("p + n")).as("cnt"),
        sum(expr("s * (p + n)")).as("sum_s"),
        sum("p").as("pos"))
      .agg(sum("cnt").as("nn"),
        count(lit(1)).as("n_bins_used"),
        sum(expr(s"abs(sum_s - pos * ${scale}L)")).as("gap"),
        max(expr(s"abs(sum_s - pos * ${scale}L) * 1000000"
          + s" div (cnt * ${scale}L)")).as("mce"))
      .select(col("nn").cast("long").as("n"),
        col("n_bins_used").cast("long").as("n_bins_used"),
        expr(s"CASE WHEN nn = 0 THEN CAST(NULL AS BIGINT)"
          + s" ELSE gap * 1000000 div (nn * ${scale}L) END").as("ece_ppm"),
        col("mce").cast("long").as("mce_ppm"))
  }

  /** McNemar's paired test — "is classifier 1 actually better than
    * classifier 2 on THE SAME examples": two accuracies compared without
    * pairing overstate significance (shared examples correlate the
    * errors); McNemar looks only at the DISCORDANT pairs — b = rows only
    * classifier 1 gets right, c = rows only classifier 2 gets right —
    * and asks whether b/(b+c) deviates from the coin flip the
    * no-difference null implies.
    *
    * Exact integers: the continuity-corrected statistic
    * (|b−c|−1)²/(b+c) is one rational — emitted as floor-milli, clamped
    * to 0 when |b−c| ≤ 1 (the correction would go negative), NULL when
    * no discordant pairs exist. `significant_05` compares the milli
    * statistic against the χ²₁ 5% critical value 3.841: integers ≥ 3842
    * exceed the true 3.8415 cutoff and 3841 falls below it, so the
    * integer compare is exactly the real test at this resolution.
    *
    * One row-local projection, one one-row aggregate — no shuffle at
    * all beyond the final reduce. */
  def mcnemar(preds: DataFrame, pred1Col: String, pred2Col: String,
              labelCol: String): DataFrame = {
    preds.select(
        (col(pred1Col).cast("long") === col(labelCol).cast("long"))
          .cast("long").as("r1"),
        (col(pred2Col).cast("long") === col(labelCol).cast("long"))
          .cast("long").as("r2"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN r1 = 1 AND r2 = 0 THEN 1L ELSE 0L END"))
          .as("b"),
        sum(expr("CASE WHEN r1 = 0 AND r2 = 1 THEN 1L ELSE 0L END"))
          .as("c"))
      .select(col("n"), col("b"), col("c"),
        expr("CASE WHEN b + c = 0 THEN CAST(NULL AS BIGINT)"
          + " WHEN abs(b - c) <= 1 THEN 0L"
          + " ELSE (abs(b - c) - 1) * (abs(b - c) - 1) * 1000"
          + "   div (b + c) END").as("stat_milli"))
      .withColumn("significant_05",
        expr("CASE WHEN stat_milli IS NULL THEN CAST(NULL AS BIGINT)"
          + " WHEN stat_milli > 3841 THEN 1L ELSE 0L END"))
  }

  /** Brier score + Murphy decomposition — the PROPER-scoring-rule readout
    * for a probabilistic score (thresholdSweep evaluates a decision;
    * this evaluates the probabilities themselves), split into the three
    * Murphy terms: Brier = REL − RES + UNC, where reliability is
    * calibration error (q168's table as one number), resolution is how
    * much the forecast separates outcomes, and uncertainty is the
    * irreducible label entropy.
    *
    * Exactness: with p_i = s_i/scale, every term is rational —
    *   Brier·N·scale² = Σ_s [n_s·s² − 2·scale·s·o_s + scale²·o_s]  (integer)
    *   REL·N·scale²  = Σ_s (s·n_s − o_s·scale)²/n_s
    *   RES·N         = Σ_s o_s²/n_s − O²/N
    * The per-score /n_s quotients are split EXACTLY into quotient +
    * remainder (t = q·n_s + r), and only the remainder part takes a
    * per-score floored micro division (r·10⁶ div n_s < 10⁶, so nothing
    * ever needs more than decimal(38,0) even at N = 10¹² rows) — total
    * floor drift < |distinct scores| micro, surfaced honestly as
    * `decomp_gap_ppm` = brier − (rel − res + unc), which a correct
    * implementation keeps within a few ppm of zero. Resolution subtracts
    * two floors so it can read −1 ppm when true RES = 0; documented
    * truncation, replayed identically by the oracle.
    *
    * One corpus shuffle (the gated per-score collapse), one one-row
    * aggregate over the bounded table. */
  def brierDecomposition(scored: DataFrame, scoreCol: String,
                         labelCol: String, scale: Long): DataFrame = {
    require(scale >= 1, "scale must be positive")
    val d = perScore(scored, scoreCol, labelCol)
      .select(col("s"), col("p"), (col("p") + col("n")).as("ns"))
      .select(col("s"), col("p"), col("ns"),
        expr(s"CAST(s AS DECIMAL(38,0)) * ns - p * $scale").as("tlin"),
        expr("p * p").as("psq"))
    val e = d.agg(
      sum("ns").as("nn"), sum("p").as("oo"),
      sum(expr("ns * CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))"))
        .as("a"),
      sum(expr("CAST(s AS DECIMAL(38,0)) * p")).as("b"),
      sum(expr("CAST((tlin * tlin) div ns AS DECIMAL(38,0))")).as("relq"),
      sum(expr("((tlin * tlin - ((tlin * tlin) div ns) * ns) * 1000000)"
        + " div ns")).as("relr"),
      sum(expr("CAST(psq div ns AS DECIMAL(38,0))")).as("resq"),
      sum(expr("((psq - (psq div ns) * ns) * 1000000) div ns")).as("resr"))
    e.select(
      expr("CAST(nn AS BIGINT)").as("n"),
      expr(s"CASE WHEN nn = 0 THEN CAST(NULL AS BIGINT)"
        + s" ELSE (a - 2 * $scale * b + $scale * $scale * oo) * 1000000"
        + s"   div (nn * $scale * $scale) END").as("brier_ppm"),
      expr(s"CASE WHEN nn = 0 THEN CAST(NULL AS BIGINT)"
        + s" ELSE (relq * 1000000 + relr) div (nn * $scale * $scale) END")
        .as("reliability_ppm"),
      expr("CASE WHEN nn = 0 THEN CAST(NULL AS BIGINT)"
        + " ELSE (resq * 1000000 + resr) div nn"
        + "   - (oo * oo * 1000000) div (nn * nn) END")
        .as("resolution_ppm"),
      expr("CASE WHEN nn = 0 THEN CAST(NULL AS BIGINT)"
        + " ELSE (oo * (nn - oo) * 1000000) div (nn * nn) END")
        .as("uncertainty_ppm"))
      .withColumn("decomp_gap_ppm",
        expr("brier_ppm - (reliability_ppm - resolution_ppm"
          + " + uncertainty_ppm)"))
  }

  /** EXACT isotonic calibration — the PAV (pool-adjacent-violators) fit,
    * computed without PAV: by the minimax identity, the isotonic
    * regression of empirical positive rates over the score axis is
    *
    *   fit_i = max_{j ≤ i} min_{k ≥ i} rate(j..k),
    *   rate(j..k) = positives(j..k) / total(j..k)
    *
    * — a closed form over interval sums, which IS SQL: prefix sums over
    * the bounded per-score table, an O(points²) pair join of that table
    * with itself, one running-min window (per start, descending end) and
    * one max aggregate per point. The sequential pooling algorithm
    * becomes a replayable relational plan, so the fit HASH-CHECKS
    * against a DuckDB oracle — no ML-library float path could.
    *
    * Exactness of the micro-quantization: rates floor to 10⁻⁶ BEFORE the
    * min/max, and floor commutes with both (floor is monotone, so
    * min∘floor = floor∘min and max∘floor = floor∘max) — the output is
    * exactly floor(10⁶ · true isotonic fit), not an approximation.
    *
    * Scale: the pair join is O(maxPoints²) on a BOUNDED table — a
    * calibration map wants coarse score points anyway (re-quantize
    * before calling; the gate fails loudly past `maxPoints`). Output per
    * score point: raw counts, raw rate, and the monotone fitted rate —
    * the lookup table a serving layer applies. */
  def isotonicCalibration(scored: DataFrame, scoreCol: String,
                          labelCol: String,
                          maxPoints: Long = 4096L): DataFrame = {
    require(maxPoints >= 1, "maxPoints must be positive")
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy("s")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val base = perScore(scored, scoreCol, labelCol)
      .withColumn("graft_pts", count(lit(1)).over(wAll))
      .filter(assert_true(col("graft_pts") <= lit(maxPoints),
        lit(s"isotonicCalibration: more than $maxPoints score points — " +
          "re-quantize to a coarser calibration axis (the pair join is " +
          "quadratic in points by design)")).isNull)
      .withColumn("cp", sum("p").over(wCum))
      .withColumn("ct", sum(expr("p + n")).over(wCum))
    val starts = base.select(col("s").as("graft_j"),
      expr("cp - p").as("graft_p0"), expr("ct - p - n").as("graft_t0"))
    val ends = base.select(col("s").as("graft_k"), col("p"), col("n"),
      col("cp"), col("ct"))
    val wRunMin = Window.partitionBy("graft_j")
      .orderBy(col("graft_k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    starts.join(ends, starts("graft_j") <= ends("graft_k"))
      .withColumn("graft_rate",
        expr("(cp - graft_p0) * 1000000 div (ct - graft_t0)"))
      .withColumn("graft_rm", min("graft_rate").over(wRunMin))
      .groupBy(col("graft_k").as("score"))
      .agg(max(expr("p + n")).cast("long").as("n_docs"),
        max("p").cast("long").as("n_pos"),
        max(expr("p * 1000000 div (p + n)")).cast("long").as("raw_ppm"),
        max("graft_rm").cast("long").as("fitted_ppm"))
  }

  /** Operating-point picker — the threshold a deployed classifier
    * actually ships: scans EVERY distinct score as a candidate cut
    * (predict positive iff s ≥ t) and returns the argmax of Youden's
    * J = recall + specificity − 1 (the balanced choice, independent of
    * class prevalence) and of F1 (the precision-weighted choice) —
    * [[thresholdSweep]] evaluates thresholds you name; this finds them.
    *
    * Exact: cumulative tp/fp from one descending window over the gated
    * per-score table; J_ppm = tp·10⁶ div P + tn·10⁶ div N − 10⁶ (two
    * floors at fixed points) and F1_ppm = 2·tp·10⁶ div (2tp+fp+fn) (ONE
    * rational); argmax deterministic (metric desc, threshold asc).
    * NULL J when either class is empty; NULL F1 when no positives. */
  def operatingPoint(scored: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame = {
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val cum = perScore(scored, scoreCol, labelCol)
      .withColumn("tp", sum("p").over(wDesc))
      .withColumn("fp", sum("n").over(wDesc))
      .withColumn("pt", sum("p").over(wAll))
      .withColumn("nt", sum("n").over(wAll))
      .select(col("s"), col("tp"), col("fp"), col("pt"), col("nt"),
        expr("CASE WHEN pt = 0 OR nt = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE tp * 1000000 div pt"
          + "   + (nt - fp) * 1000000 div nt - 1000000 END").as("j_ppm"),
        expr("CASE WHEN pt = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE 2 * tp * 1000000"
          + "   div (2 * tp + fp + (pt - tp)) END").as("f1_ppm"))
    // argmax as a struct max — (metric, −threshold) orders metric desc
    // then threshold asc, deterministic on ties, and a fully-degenerate
    // input yields NULLs instead of an empty frame.
    cum.agg(count(lit(1)).as("n_thresholds"),
        max(when(col("j_ppm").isNotNull,
          struct(col("j_ppm"), (-col("s")).as("graft_ns")))).as("graft_bj"),
        max(when(col("f1_ppm").isNotNull,
          struct(col("f1_ppm"), (-col("s")).as("graft_ns")))).as("graft_bf"))
      .select(col("n_thresholds"),
        expr("-graft_bj.graft_ns").cast("long").as("best_j_threshold"),
        col("graft_bj.j_ppm").cast("long").as("best_j_ppm"),
        expr("-graft_bf.graft_ns").cast("long").as("best_f1_threshold"),
        col("graft_bf.f1_ppm").cast("long").as("best_f1_ppm"))
  }

  /** Out-of-fold target encoding — the leakage-free way to turn a
    * categorical column into a numeric feature (a naive per-category
    * target mean leaks each row's OWN label into its feature; the
    * K-fold construction encodes every row with the mean computed from
    * the OTHER folds — the standard competition/production recipe).
    *
    * Folds are md5 buckets of the row id (pure function of content —
    * stable across engines/partitioning/retries, the hash-split
    * discipline), and the encoding table is EXACT: for category c and
    * fold f, enc = (s_c − s_cf)·10⁶ div (n_c − n_cf) over the INTEGER
    * target (0/1 labels or a pre-quantized value, the [[perScore]]
    * contract). A category seen only inside one fold has no out-of-fold
    * evidence — its encoding is NULL (callers back off to the global
    * prior, also emitted), never a leaked self-mean.
    *
    * Output is the (category × fold) ENCODING TABLE — |cats|·K rows, a
    * broadcast-sized artifact the training pipeline map-side-joins onto
    * the corpus; building it costs ONE (cat, fold)-keyed aggregate. */
  def targetEncode(rows: DataFrame, idCol: String, catCol: String,
                   targetCol: String, folds: Int = 5): DataFrame = {
    require(folds >= 2 && folds <= 65536, "folds must be in 2..65536")
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val fold = (1 until folds).foldLeft(lit(0)) { (acc, i) =>
      acc + when(h >= lit(f"${i * 65536 / folds}%04x"), 1).otherwise(0)
    }
    val perCf = rows.select(col(catCol).as("category"),
        fold.cast("long").as("fold"),
        col(targetCol).cast("long").as("graft_y"))
      .groupBy("category", "fold")
      .agg(count(lit(1)).as("graft_n"), sum("graft_y").as("graft_s"))
    val perC = perCf.groupBy("category")
      .agg(sum("graft_n").as("graft_nt"), sum("graft_s").as("graft_st"))
    val prior = perC.agg(sum("graft_nt").as("graft_na"),
      sum("graft_st").as("graft_sa"))
    perCf.join(perC, Seq("category"))
      .crossJoin(broadcast(prior))
      .select(col("category"), col("fold"),
        (col("graft_nt") - col("graft_n")).as("n_out"),
        expr("CASE WHEN graft_nt - graft_n = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE (graft_st - graft_s) * 1000000"
          + "   div (graft_nt - graft_n) END").as("encoding_ppm"),
        expr("CASE WHEN graft_na = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_sa * 1000000 div graft_na END").as("prior_ppm"))
  }

  /** Matthews correlation coefficient at a fixed decision threshold —
    * the single-number confusion summary that stays honest under CLASS
    * IMBALANCE (accuracy and F1 both reward the majority-class
    * degenerate classifier; MCC = 0 for it, and only ±1 when both
    * classes are classified well — Chicco/Jurman, BMC Genomics 2020).
    * MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)) · √((tn+fp)(tn+fn)),
    * emitted in round-6 micro units: the four counts and both pair
    * products are exact DECIMAL(38,0) (each product caps at n², inside
    * 38 digits past int64), and the finish is a PINNED chain of
    * correctly-rounded IEEE ops (two casts, two sqrts, one multiply,
    * one divide, round) — the q280 determinism argument. A zero
    * marginal (all-positive/all-negative predictions or labels) makes
    * MCC undefined → NULL, never a sentinel. `accuracy_ppm` rides along
    * for the dashboard.
    *
    * Scale: ONE conditional aggregate over the corpus (map-side
    * combinable, no shuffle beyond the 1-row fold) — cheaper than the
    * [[perScore]] substrate, which a single fixed threshold doesn't
    * need. */
  def mcc(scored: DataFrame, scoreCol: String, labelCol: String,
          thresholdScore: Long): DataFrame = {
    def cnt(pred: Column, lab: Column): Column =
      coalesce(sum(when(pred && lab, 1L)), lit(0L))
        .cast("decimal(38,0)")
    val s = col("graft_s") >= thresholdScore
    val y = col("graft_y") === 1L
    scored
      .select(col(scoreCol).cast("long").as("graft_s"),
        col(labelCol).cast("long").as("graft_y"))
      .agg(cnt(s, y).as("tp"), cnt(s, !y).as("fp"),
        cnt(!s, y).as("fn"), cnt(!s, !y).as("tn"))
      .select(
        col("tp").cast("long").as("n_tp"),
        col("fp").cast("long").as("n_fp"),
        col("fn").cast("long").as("n_fn"),
        col("tn").cast("long").as("n_tn"),
        expr("CASE WHEN tp + fp + fn + tn = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE (tp + tn) * 1000000 div (tp + fp + fn + tn) END")
          .as("accuracy_ppm"),
        expr("CASE WHEN tp + fp = 0 OR tp + fn = 0"
          + "   OR tn + fp = 0 OR tn + fn = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE CAST(round(CAST(tp * tn - fp * fn AS DOUBLE)"
          + "   / (sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE))"
          + "      * sqrt(CAST((tn + fp) * (tn + fn) AS DOUBLE)))"
          + "   * 1000000, 0) AS BIGINT) END").as("mcc_micro"))
  }

  /** pass@k — the unbiased estimator every code-model eval reports
    * (Chen et al. 2021, HumanEval): per task with n attempts and c
    * correct, pass@k = 1 − C(n−c, k)/C(n, k), which clears to the
    * falling-factorial rational Π_{i<k}(n−c−i) / Π_{i<k}(n−i) — exact
    * integers (the product hits zero exactly when fewer than k wrong
    * attempts exist, i.e. the task always passes). Tasks with n < k are
    * excluded (the estimator is undefined, not zero). Reports, per k:
    * evaluable task count and the mean floor-ppm pass rate.
    *
    * Scale: one (task)-keyed count aggregate, a |ks|-bounded explode,
    * per-row falling-factorial folds run in DECIMAL(38,0) (a LONG fold
    * overflows silently already at n≈300 for k=10), one |ks|-row
    * rollup. A per-k magnitude gate asserts nᵏ·10⁶ < 10³⁸ — i.e.
    * n ≤ min(10⁶, ⌊10^(32/k)⌋), which is 10⁶ through k=5 and 1584 at
    * k=10 (real eval harnesses run n ≤ a few hundred) — so the decimal
    * fold is provably exact, never wrapped, never nulled. */
  def passAtK(attempts: DataFrame, taskCol: String, correctCol: Column,
              ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 10),
      "ks must be in 1..10")
    val per = attempts
      .groupBy(col(taskCol).as("graft_task"))
      .agg(count(lit(1)).as("graft_n"),
        coalesce(sum(when(correctCol, 1L).otherwise(0L)), lit(0L))
          .as("graft_c"))
    per
      .withColumn("k", explode(typedLit(ks.toList)))
      .filter(col("graft_n") >= col("k"))
      // n ≤ ⌊10^(32/k)⌋ per k ⇒ den = Π(n−i) ≤ n^k < 10³², so
      // den·10⁶ < 10³⁸ fits DECIMAL(38,0) exactly (num ≤ den a fortiori).
      .withColumn("graft_ncap", expr(
        "element_at(array(1000000L, 1000000L, 1000000L, 1000000L," +
          " 1000000L, 215443L, 37275L, 10000L, 3593L, 1584L), int(k))"))
      .filter(assert_true(col("graft_n") <= col("graft_ncap"),
        lit("passAtK: n attempts for one task exceeds the exactness " +
          "bound 10^(32/k) — cap or sample before evaluating")).isNull)
      .withColumn("graft_num", expr(
        "aggregate(sequence(0, k - 1), CAST(1 AS DECIMAL(38,0))," +
          " (acc, i) -> CAST(acc * (graft_n - graft_c - i)" +
          " AS DECIMAL(38,0)))"))
      .withColumn("graft_den", expr(
        "aggregate(sequence(0, k - 1), CAST(1 AS DECIMAL(38,0))," +
          " (acc, i) -> CAST(acc * (graft_n - i) AS DECIMAL(38,0)))"))
      .withColumn("graft_ppm", expr(
        "CAST(1000000 - graft_num * 1000000 div graft_den AS BIGINT)"))
      .groupBy(col("k").cast("long").as("k"))
      .agg(count(lit(1)).as("n_tasks"),
        expr("sum(graft_ppm) div count(1)").as("mean_pass_ppm"))
      .select(col("k"), col("n_tasks").cast("long").as("n_tasks"),
        col("mean_pass_ppm").cast("long").as("mean_pass_ppm"))
  }
}
