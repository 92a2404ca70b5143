package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the batch sessionizer (operators.Sessions.sessionize,
  * q38) built on Spark's NATIVE session_window state machine: per-key
  * gap-merged windows live in the state store (RocksDB under
  * GraftSession's defaults), merge when late-but-admissible events bridge
  * two open sessions, and are finalized in APPEND mode once the watermark
  * passes last-event + gap — no hand-rolled flatMapGroupsWithState where
  * the engine already ships the exact state machine.
  *
  * Scale posture: state is one open session per (user, active window),
  * bounded by the watermark horizon; the shuffle is keyed on the user
  * like the batch plan's single window Exchange.
  */
object SessionWindows {

  /** One row per CLOSED (user, session): start (first event), end (last
    * event + gap — session_window's end-exclusive convention) and event
    * count.
    *
    * Boundary note: session_window extends a session only while the next
    * event falls STRICTLY before prev + gap, whereas the batch
    * sessionizer starts a new session only when the gap is STRICTLY
    * exceeded — an event at exactly prev + gap closes the session here
    * but continues it in batch. Continuous event times hit the boundary
    * with measure zero; the parity spec pins agreement away from it. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
