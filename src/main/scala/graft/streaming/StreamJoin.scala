package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the continuous twin of the batch
  * range-pair join (q39): attribute each purchase to the clicks that
  * preceded it within an attribution window, with both sides unbounded.
  *
  * Spark keeps BOTH sides' rows in join state until the watermark proves
  * no future match can arrive; the time-bound join condition plus a
  * watermark on each side is what makes that state finite — without the
  * range condition the state would grow without bound at 100 TB/day. The
  * condition below bounds click state by `maxGap` past the purchase-side
  * watermark and purchase state by the click-side watermark, so steady
  * state holds only the attribution window's worth of events per side. */
object StreamJoin {

  /** Inner click→purchase attribution: one output row per (click,
    * purchase) pair of the same user with `click_ts <= purchase_ts <
    * click_ts + maxGap`. Append-mode safe: a pair is emitted exactly
    * once, when both sides have arrived. */
  def attributedPairs(clicks: DataFrame, purchases: DataFrame,
                      userCol: String, tsCol: String,
                      maxGap: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame = {
    val c = clicks
      .select(col(userCol).as("user_id"), col(tsCol).as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col(userCol).as("graft_p_user"), col(tsCol).as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, expr(
      s"""user_id = graft_p_user AND
          purchase_ts >= click_ts AND
          purchase_ts < click_ts + INTERVAL $maxGap"""))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  /** LEFT OUTER click→purchase attribution — the conversion-funnel twin
    * of [[attributedPairs]] that also surfaces the clicks that did NOT
    * convert: matched pairs emit as soon as both sides arrive (inner
    * semantics), while an unmatched click emits ONCE, with NULL
    * purchase columns, only after the watermark proves no in-window
    * purchase can still arrive — the null row is a WATERMARK-CLOSED
    * fact, not a momentary absence (the semantic difference between
    * outer streaming joins and outer batch joins, and why the
    * time-bound condition is mandatory here: without it Spark cannot
    * ever close a click's window, and rejects the query). State
    * contract is [[attributedPairs]]'s: both sides bounded by the
    * range condition + watermarks. */
  def attributedPairsOuter(clicks: DataFrame, purchases: DataFrame,
                           userCol: String, tsCol: String,
                           maxGap: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame = {
    val c = clicks
      .select(col(userCol).as("user_id"), col(tsCol).as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col(userCol).as("graft_p_user"), col(tsCol).as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, expr(
      s"""user_id = graft_p_user AND
          purchase_ts >= click_ts AND
          purchase_ts < click_ts + INTERVAL $maxGap"""), "left_outer")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("purchase_ts").isNull.as("unconverted"))
  }
}
