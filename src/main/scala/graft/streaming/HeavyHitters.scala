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
    * bounded MG summary. */
  def windowed(tokens: DataFrame, tsCol: String, termCol: String,
               windowDur: String, watermark: String, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .withWatermark(tsCol, watermark)
      .select(window(col(tsCol), windowDur).getField("start").as("ws"),
        col(termCol).as("term"))
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.operators.MisraGriesAgg(k).toColumn)
      .toDF("window_start", "terms")
  }
}
