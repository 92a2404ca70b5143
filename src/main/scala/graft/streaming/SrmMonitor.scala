package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Continuous sample-ratio-mismatch monitor — the streaming twin of
  * q283's [[graft.operators.Experiment.srmCheck]] (the FIRST gate an
  * experimentation platform runs; broken assignment invalidates every
  * downstream readout, and the point of the STREAMING form is to page
  * within a day of the redirect bug shipping, not at the weekly
  * readout): distinct exposed users stream through
  * [[DistinctCurve.firstSeenStream]] keyed by (md5-arm, user) — one
  * long of state per user, the same floor any streaming distinct pays —
  * and the finalized first-seen table folds into a PER-DAY CUMULATIVE
  * chi-square curve with srmCheck's exact integer formula, so the
  * streamed verdict for any prefix of days equals the batch check run
  * on that prefix (the [[DistinctCurve.curveOf]] split).
  *
  * The md5 arm rule is [[graft.operators.Experiment]]'s: first hex char
  * of md5(user) < '8' → arm A (designed 500 milli under the default
  * split). `chi2_milli` and the 3841-milli alarm line replay bit-exact. */
object SrmMonitor {

  /** The exposure stream keyed for first-seen gating: grp = md5 arm. */
  def exposureStream(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, exposureType: String,
                     watermark: String = "2 days"): Dataset[DistinctCurve.FirstSeen] =
    DistinctCurve.firstSeenStream(
      events.filter(col(typeCol) === exposureType)
        .withColumn("graft_arm",
          when(substring(md5(col(userCol).cast("string")), 1, 1) < "8",
            "A").otherwise("B")),
      "graft_arm", tsCol, userCol, watermark)

  /** The batch-fold half: a finalized first-seen table (an append
    * sink's contents) → per-day cumulative SRM curve. Day d's row
    * tests ALL users exposed up to and including d — exactly
    * [[graft.operators.Experiment.srmCheck]] on that prefix. */
  def srmOf(firstSeen: DataFrame, designMilliA: Long): DataFrame = {
    require(designMilliA >= 0L && designMilliA <= 1000L,
      "designMilliA is the designed arm-A share in milli")
    val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    firstSeen
      .select(col("grp"), to_date(timestamp_millis(col("dayMs"))).as("d"))
      .groupBy("d")
      .agg(count(lit(1)).as("graft_new"),
        sum(when(col("grp") === "A", 1L).otherwise(0L)).as("graft_newa"))
      .withColumn("graft_n", sum("graft_new").over(w))
      .withColumn("graft_oa", sum("graft_newa").over(w))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("graft_n").cast("long").as("n_exposed"),
        col("graft_oa").cast("long").as("n_a"),
        expr(s"CASE WHEN graft_n = 0 OR $designMilliA <= 0"
          + s"   OR $designMilliA >= 1000 THEN CAST(NULL AS BIGINT)"
          + s" ELSE CAST((CAST(1000 AS DECIMAL(38,0)) * graft_oa"
          + s"       - CAST(graft_n AS DECIMAL(38,0)) * $designMilliA)"
          + s"   * (CAST(1000 AS DECIMAL(38,0)) * graft_oa"
          + s"       - CAST(graft_n AS DECIMAL(38,0)) * $designMilliA)"
          + s"   * 1000 div (CAST(graft_n AS DECIMAL(38,0))"
          + s"       * $designMilliA * ${1000L - designMilliA})"
          + "  AS BIGINT) END").as("chi2_milli"))
      .withColumn("srm",
        when(col("chi2_milli").isNull, lit(null).cast("long"))
          .otherwise((col("chi2_milli") > 3841L).cast("long")))
  }
}
