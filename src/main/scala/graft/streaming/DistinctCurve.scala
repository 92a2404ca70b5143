package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q321's running-distinct growth curve
  * ([[graft.operators.Analytics.runningDistinct]]): per (group, key),
  * emit the key's FIRST active day — exactly batch `min(day)` — once the
  * watermark proves no earlier-day event can still arrive. The emitted
  * row stream IS the batch `firstDay` table; (group, day) → n_new and
  * the cumulative curve are a trivial rollup the consumer or sink runs
  * (the [[Retention.weeklyChurnStream]] contract shape). The rollup
  * stays downstream DELIBERATELY: append mode + the
  * EMITTING_ROWS_OLDER_THAN_WATERMARK rule forbid re-windowing a row
  * whose event-time day has, by finalization time, fallen behind a
  * watermark that may jump arbitrarily far in one batch.
  *
  * Correctness: day-starts trail raw event times by < 1 day, so with the
  * watermark on the truncated day column, a candidate first day m is
  * immutable once wm ≥ m (any admissible earlier event would carry a day
  * ≤ m − 1d < wm — filtered as late). Each key finalizes exactly once:
  * via the event-time TIMER pointed at the current candidate (re-pointed
  * when an out-of-order earlier day improves it), or on input if the
  * candidate is already decidable.
  *
  * State bound: ONE long per distinct (group, key) — candidate day while
  * open, a DONE sentinel forever after (the gate must remember every key
  * it has admitted; that is the same |distinct keys| floor the batch
  * aggregate and any streaming dedup pay). Timers: at most one per OPEN
  * key, none after finalization.
  */
object DistinctCurve {

  final case class KeyDay(grp: String, key: Long, day: java.sql.Timestamp)
  /** `key`'s first active day in `grp` — final, never retracted. */
  final case class FirstSeen(grp: String, dayMs: Long, key: Long)

  private val Done = Long.MinValue

  private class FirstSeenProcessor
      extends StatefulProcessor[(String, Long), KeyDay, FirstSeen] {
    @transient private var st: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Long]("cand",
        Encoders.scalaLong, TTLConfig.NONE)

    private def decide(gk: (String, Long), cand: Long,
                       wm: Long): Iterator[FirstSeen] = {
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (cand <= wm) {
        st.update(Done)
        Iterator.single(FirstSeen(gk._1, cand, gk._2))
      } else {
        st.update(cand)
        getHandle.registerTimer(cand)
        Iterator.empty
      }
    }

    override def handleInputRows(gk: (String, Long), rows: Iterator[KeyDay],
                                 timerValues: TimerValues): Iterator[FirstSeen] = {
      val prior = if (st.exists()) st.get() else Long.MaxValue
      if (prior == Done) return Iterator.empty
      val cand = rows.foldLeft(prior)((m, r) => math.min(m, r.day.getTime))
      decide(gk, cand, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(gk: (String, Long),
                                    timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[FirstSeen] = {
      val prior = if (st.exists()) st.get() else Long.MaxValue
      if (prior == Done || prior == Long.MaxValue) return Iterator.empty
      decide(gk, prior, timerValues.getCurrentWatermarkInMs())
    }
  }

  /** Finalized first-seen events per (group, key). `watermark` is the
    * lateness allowance for the truncated DAY column; because day-starts
    * trail raw events by < 1 day, effective raw-event lateness is the
    * configured delay minus up to one day — size it accordingly (same
    * note as [[Retention.weekEvents]]). */
  def firstSeenStream(events: DataFrame, groupCol: String, tsCol: String,
                      keyCol: String,
                      watermark: String = "2 days"): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    implicit val enc = Encoders.product[FirstSeen]
    events
      .filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("grp"),
        col(keyCol).cast("long").as("key"),
        date_trunc("day", col(tsCol)).as("day"))
      .withWatermark("day", watermark)
      .as[KeyDay]
      .groupByKey(e => (e.grp, e.key))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .transformWithState(new FirstSeenProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The batch-rollup half: fold a finalized first-seen table (e.g. an
    * append sink's contents) into q321's exact output shape —
    * (group, day, n_new, cum_distinct). */
  def curveOf(firstSeen: DataFrame, groupCol: String): DataFrame = {
    val daily = firstSeen
      .select(col("grp"), to_date(timestamp_millis(col("dayMs"))).as("d"))
      .groupBy("grp", "d").agg(count(lit(1)).as("n_new"))
    daily
      .withColumn("cum_distinct", sum("n_new").over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy("d")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("grp").as(groupCol),
        date_format(col("d"), "yyyy-MM-dd").as("d"),
        col("n_new").cast("long").as("n_new"),
        col("cum_distinct").cast("long").as("cum_distinct"))
  }
}
