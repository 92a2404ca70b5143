package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
  * State: ONE counter per (key, window), on the ARBITRARY-STATE V2 API
  * (`transformWithState`, TimeMode.EventTime) with an explicit
  * EVENT-TIME TIMER at window-start + the lateness allowance — a row
  * for a window groups only while its window-start is at or above the
  * watermark, and the timer fires strictly after that can last happen,
  * so counters evict exactly when their window closes and a
  * long-running stream holds only the active windows' counters, never
  * history. Unlike the old flatMapGroupsWithState form (timeout
  * re-armed by hand on every batch — THE classic leak-by-omission),
  * the timer here registers ONCE per window key and the expiry
  * callback's only job is `clear()`; `listTimers` guards re-arming. */
object RateCap {

  /** Labeled row: (key, window-start micros, ts micros, rowId) plus the
    * admission verdict. */
  final case class Capped(key: String, windowStartUs: Long, tsUs: Long,
                          rowId: Long, admitted: Boolean)

  private[streaming] case class In(key: String,
                                   windowStart: java.sql.Timestamp,
                                   tsUs: Long, rowId: Long)

  private class CapProcessor(maxPerWindow: Int, latenessMs: Long)
      extends StatefulProcessor[(String, Long), In, Capped] {
    @transient private var n: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      n = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[In],
                                 timerValues: TimerValues): Iterator[Capped] = {
      var admitted = if (n.exists()) n.get() else 0L
      val out = rows.toSeq.sortBy(r => (r.tsUs, r.rowId)).map { r =>
        val ok = admitted < maxPerWindow
        if (ok) admitted += 1
        Capped(r.key, r.windowStart.getTime * 1000L, r.tsUs, r.rowId, ok)
      }
      n.update(admitted)
      // one eviction timer per window key; fires once the watermark is
      // past window-start + lateness, after which no row can group here
      if (getHandle.listTimers().isEmpty)
        getHandle.registerTimer(key._2 + latenessMs)
      out.iterator
    }

    override def handleExpiredTimer(key: (String, Long),
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Capped] = {
      n.clear()
      Iterator.empty
    }
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
    val latenessMs = scala.concurrent.duration.Duration(lateness).toMillis
    import events.sparkSession.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        window(col(tsCol), windowDur).getField("start").as("windowStart"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(idCol).cast("long").as("rowId"))
      .withWatermark("windowStart", lateness)
      .as[In]
      .groupByKey(r => (r.key, r.windowStart.getTime))
      .transformWithState(new CapProcessor(maxPerWindow, latenessMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
