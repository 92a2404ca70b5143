package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous heavy hitters — the Misra-Gries sketch
  * (operators/Analytics.heavyHitters) run per event-time window over a
  * token stream: the "what's trending NOW" readout with MG's
  * deterministic guarantee (every term above windowN/(k+1) is present,
  * estimates never overcount) instead of a probabilistic sketch's.
  *
  * Spark-first shape: tokens group by WINDOW and fold through the typed
  * MG Aggregator, so state per window is the fixed k-counter summary
  * (merged map-side like any partial aggregate), never a per-term map —
  * the state a per-(window, term) count would hold is exactly what a
  * hot stream can't afford. Update mode re-emits a window's row as its
  * summary absorbs more tokens; the final value for a window is its
  * last emission. */
object HeavyHitters {

  /** `tokens`: (tsCol: Timestamp, termCol: String) stream. Emits per
    * window a single row (window_start, terms: Seq[(term, est)]) — the
    * bounded MG summary.
    *
    * The grouping is an untyped `groupBy(window(...))` — NOT a typed
    * `groupByKey` on an extracted field — because only the untyped
    * window column keeps the event-time watermark metadata that lets
    * the streaming aggregation EVICT a window's MG state once the
    * watermark passes its end. (A typed key lambda is opaque to the
    * analyzer: outputs stay correct but per-window state lives for the
    * stream's lifetime — the unbounded growth this operator exists to
    * avoid.) The Aggregator folds in via `functions.udaf`. */
  def windowed(tokens: DataFrame, tsCol: String, termCol: String,
               windowDur: String, watermark: String, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val mg = udaf(new graft.operators.MisraGriesAgg(k))
    tokens
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(mg(col(termCol)).as("terms"))
      .select(col("window").getField("start").as("window_start"),
        col("terms"))
  }
}
