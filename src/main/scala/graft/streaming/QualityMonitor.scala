package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous model-quality monitoring — the streaming twin of the batch
  * eval readouts (ml/Eval.scala): per event-time window, the calibration
  * table (score-bin → count, exact mean score, empirical positive rate)
  * over a scored stream. The per-window readout that catches score drift
  * (bins' mean-score vs realized-rate diverging) hours after a model
  * ships, not at the next offline eval.
  *
  * AUC deliberately has NO streaming twin here: the rank formulation
  * needs a global order over the window's scores, which an incremental
  * state update can't maintain append-only; calibration and rate metrics
  * are the streaming-safe subset (windowed sums), and they use the SAME
  * integer arithmetic as the batch operator, so a window's row equals
  * `Eval.calibration` run on that window's rows (batch parity is the
  * spec's assertion).
  *
  * Scale posture: state per window is ≤ `bins` rows of integer sums —
  * watermark-bounded window count × bins, independent of stream rate.
  * One shuffle on (window, bin), map-side partials. */
object QualityMonitor {

  /** `scored` needs an event-time column `tsCol` (timestamp), an
    * integer-quantized `scoreCol` on [0, scale], and a 0/1 `labelCol`.
    * Emits one row per (window_start, bin) once the watermark closes. */
  def windowedCalibration(scored: DataFrame, tsCol: String, scoreCol: String,
                          labelCol: String, windowDur: String,
                          watermark: String, bins: Int, scale: Long): DataFrame = {
    require(bins > 0 && scale > 0, "bins and scale must be positive")
    scored
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"),
        least(expr(s"CAST($scoreCol AS BIGINT) * $bins div ${scale}L"),
          lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(scoreCol).cast("long")).as("sum_s"),
        sum(col(labelCol).cast("long")).as("pos"))
      .select(col("w.start").as("window_start"), col("bin"),
        col("cnt").as("n_docs"),
        expr(s"sum_s * 1000000 div (cnt * ${scale}L)").as("mean_score_ppm"),
        expr("pos * 1000000 div cnt").as("pos_rate_ppm"))
  }
}
