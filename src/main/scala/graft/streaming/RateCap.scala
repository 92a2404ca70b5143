package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous per-key admission cap — the streaming twin of the batch
  * per-source frequency cap (operators/Corpus, 69h): each key admits at
  * most `maxPerWindow` rows per event-time window; every row is emitted
  * LABELED (admitted or capped), so the caller routes admitted rows to
  * the load path and capped rows to an overflow sink or a counter — the
  * producer-throttling gate a shared ingest runs in front of a 100 TB
  * store.
  *
  * Determinism contract: WITHIN a micro-batch the admission order is the
  * total (ts, rowId) order, so a replayed batch admits the same rows;
  * ACROSS batches admission is arrival-order dependent — inherent to
  * online rate limiting and documented, not hidden (the batch twin is
  * the engine-portable total-order version of the same policy).
  *
  * State: ONE counter per (key, window) with EVENT-TIME TIMEOUT at
  * window-start + the lateness allowance — a row for a window groups
  * only while its window-start is at or above the watermark, and the
  * timeout fires strictly after that can last happen, so counters evict
  * exactly when their window closes and a long-running stream holds only
  * the active windows' counters, never history. */
object RateCap {

  /** Labeled row: (key, window-start micros, ts micros, rowId) plus the
    * admission verdict. */
  final case class Capped(key: String, windowStartUs: Long, tsUs: Long,
                          rowId: Long, admitted: Boolean)

  private[streaming] case class In(key: String,
                                   windowStart: java.sql.Timestamp,
                                   tsUs: Long, rowId: Long)

  private def capFn(maxPerWindow: Int, lateness: String)(
      key: (String, Long), rows: Iterator[In],
      state: GroupState[Long]): Iterator[Capped] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var admitted = state.getOption.getOrElse(0L)
    val out = rows.toSeq.sortBy(r => (r.tsUs, r.rowId)).map { r =>
      val ok = admitted < maxPerWindow
      if (ok) admitted += 1
      Capped(r.key, r.windowStart.getTime * 1000L, r.tsUs, r.rowId, ok)
    }
    state.update(admitted)
    state.setTimeoutTimestamp(key._2, lateness)
    out.iterator
  }

  /** Start the gate over `events` (tsCol: Timestamp, idCol: numeric row
    * id, keyCol: castable to string). `lateness` is the watermark delay
    * applied to the WINDOW-START column — size it as raw-event lateness
    * PLUS one window length (a window's start lags its latest event by
    * up to the window; the rollingActiveStream inflation rule). */
  def label(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
            windowDur: String, lateness: String,
            maxPerWindow: Int): Dataset[Capped] = {
    require(maxPerWindow >= 1, "maxPerWindow must be at least 1")
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        window(col(tsCol), windowDur).getField("start").as("windowStart"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(idCol).cast("long").as("rowId"))
      .withWatermark("windowStart", lateness)
      .as[In]
      .groupByKey(r => (r.key, r.windowStart.getTime))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(capFn(maxPerWindow, lateness))
  }
}
