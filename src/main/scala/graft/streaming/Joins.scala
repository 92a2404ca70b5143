package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join and streaming dedup — the continuous counterparts of
  * the reference's batch enrich-join (dag.py tracks↔audio merge) and
  * dedup-on-load (`SELECT DISTINCT`, dag.py:725-733).
  *
  * Scale posture: both sides of the join are watermarked, and the join
  * condition pairs an equality key with a bounded event-time range — so
  * state per key is bounded by (rate × window), and rows older than the
  * watermark are evicted, never accumulated. Streaming dedup keys state by
  * the dedup key with the same watermark eviction.
  */
object Joins {

  /** MULTI-TOUCH attribution: one output row per (purchase, qualifying
    * click) — a purchase preceded by several clicks inside
    * `attributionWindow` appears once per click, so summing `amount`
    * downstream needs a per-purchase dedup (last-touch = keep max
    * click_ts per purchase_id, a batch-side window). Emitting every touch
    * is deliberate: collapsing to last-touch inside the stream would put
    * a non-time window on top of the stream-stream join, which append
    * mode cannot run; the touch stream stays streamable and the policy
    * (first/last/linear) stays a cheap batch choice downstream. Works
    * identically on static DataFrames (batch parity spec).
    *
    * @param clicks    (user_id, click_id, click_ts)
    * @param purchases (user_id, purchase_id, purchase_ts, amount)
    */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                          attributionWindow: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    val c = clicks.withColumnRenamed("user_id", "c_user_id")
      .withWatermark("click_ts", watermark)
    val p = purchases.withWatermark("purchase_ts", watermark)
    p.join(c,
      expr(s"""
        user_id = c_user_id AND
        click_ts <= purchase_ts AND
        click_ts >= purchase_ts - INTERVAL $attributionWindow
      """.stripMargin))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("amount"), col("click_id"), col("click_ts"))
  }

  /** Streaming dedup on arbitrary key columns with watermark-bounded state:
    * exactly-once emission of the first arrival per key; keys older than
    * the watermark are dropped from state (late duplicates beyond it are
    * the documented trade-off — size the watermark to the dup horizon). */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
                  keys: String*): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
