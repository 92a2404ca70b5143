package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twins of the product-health metrics (batch: weekly churn
  * q94, rolling N-day active q95) — the metrics a dashboard wants
  * continuously, not on the Airflow cadence the reference retrains at.
  *
  * Scale posture mirrors the batch plans': churn state is ONE record per
  * live user (removed on churn via event-time timeout — state tracks the
  * active-user set, never history), and rolling-active state is bounded
  * by the watermark horizon × windowDays per (day, user) via the
  * streaming dedup, with windows finalized and dropped as the watermark
  * passes.
  */
object Retention {

  /** (user, ISO-week-start) — the churn twin's input; build it with
    * [[weekEvents]]. The week start is a real TIMESTAMP carrying the
    * stream's watermark (watermarking the raw ts and projecting it away
    * would strip the event-time attribute the stateful op needs); since
    * week-start trails the raw event time by < 7 days, the effective lag
    * is the configured watermark + one week. */
  final case class WeekEvent(user: Long, weekStart: java.sql.Timestamp)
  /** Weeks seen for the user whose churn verdict is still OPEN — i.e. the
    * watermark has not yet passed the end of the FOLLOWING week, so an
    * out-of-order event could still arrive for it and avert the churn.
    * Bounded by the watermark horizon in weeks, not user history. */
  final case class ChurnState(openWeeksMs: List[Long])
  /** User `user` was active in the week starting `weekStartMs` and not
    * the next one. */
  final case class Churn(weekStartMs: Long, user: Long)

  private val WeekMs = 7L * 24 * 3600 * 1000

  def weekEvents(events: DataFrame, userCol: String, tsCol: String,
                 watermark: String): Dataset[WeekEvent] = {
    import events.sparkSession.implicits._
    events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).as("weekStart"))
      .withWatermark("weekStart", watermark)
      .as[WeekEvent]
  }

  /** Churn detection per user. A week w churns iff the user was active in
    * w and not in w+1 — but in APPEND mode an emitted row can never be
    * retracted, so no verdict may be emitted while an out-of-order event
    * for week w+1 could still arrive within the watermark's lateness
    * allowance. Candidate weeks are therefore BUFFERED in state and
    * finalized only once the watermark passes the end of week w+1
    * (`w + 2·WeekMs`) — the first moment the verdict is immutable, for
    * both the gap case (later week already seen) and the silence case
    * (no more events; the event-time TIMER fires at exactly that
    * boundary). This is the streaming equivalent of q94's anti-join,
    * decided exactly when the batch plan could first decide it. State is
    * the open-week list per live user — bounded by the watermark horizon
    * in weeks — and is removed once every week is decided.
    *
    * On the ARBITRARY-STATE V2 API (TimeMode.EventTime): the shared
    * decide step runs from both the input path and the expiry callback;
    * the per-user timer is re-pointed (delete + register) at the
    * earliest open verdict's immutability boundary on every touch, so
    * exactly one timer is live per buffered user and none per decided
    * one. */
  private class ChurnProcessor
      extends StatefulProcessor[Long, WeekEvent, Churn] {
    @transient private var st: ValueState[ChurnState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ChurnState]("open",
        Encoders.product[ChurnState], TTLConfig.NONE)

    /** Decide every immutable week, persist/clear the open remainder,
      * re-point the timer. */
    private def decide(user: Long, merged: List[Long],
                       wm: Long): Iterator[Churn] = {
      // Week w is decidable once no week-(w+1) event can be admitted:
      // truncated week-starts are late below the watermark, so wm ≥
      // w + 2·WeekMs guarantees week w+1 is closed. A decided week's
      // successor is still present in `merged` when consulted — w
      // decides no later than w+1, so successors outlive their
      // predecessors here.
      val (decided, open) = merged.partition(_ + 2 * WeekMs <= wm)
      val seen = merged.toSet
      val out = decided.filterNot(w => seen.contains(w + WeekMs))
        .map(Churn(_, user))
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (open.nonEmpty) {
        st.update(ChurnState(open))
        // Fire when the earliest open verdict becomes immutable
        // (strictly above wm by construction of the partition above).
        getHandle.registerTimer(open.min + 2 * WeekMs)
      } else st.clear()
      out.iterator
    }

    override def handleInputRows(user: Long, rows: Iterator[WeekEvent],
                                 timerValues: TimerValues): Iterator[Churn] = {
      val prior = if (st.exists()) st.get().openWeeksMs else Nil
      val merged = (prior ++ rows.map(_.weekStart.getTime)).distinct.sorted
      decide(user, merged, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Churn] = {
      val prior = if (st.exists()) st.get().openWeeksMs else Nil
      decide(user, prior, timerValues.getCurrentWatermarkInMs())
    }
  }

  /** The continuous q94: (wk, user_id) churn events. Aggregate counts
    * downstream (or in the sink) — the row stream IS the anti-join's
    * output, one row per churned (week, user). */
  def weeklyChurnStream(events: DataFrame, userCol: String, tsCol: String,
                        watermark: String = "14 days"): Dataset[Churn] = {
    implicit val churnEnc = Encoders.product[Churn]
    weekEvents(events, userCol, tsCol, watermark)
      .groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new ChurnProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The continuous q95: rolling `windowDays`-day distinct active users.
    * Same constant-fan-out shape as the batch plan — each (day, user)
    * contributes to `windowDays` target days via a bounded explode — then
    * the two streaming-native stateful steps: dropDuplicates on
    * (target-day, user) bounds state at the watermark horizon, and a
    * windowed count finalizes each day as the watermark passes. Emits
    * every day in any window (the batch query then filters to observed
    * days; a day with no events of its own is a superset row, not a
    * disagreement).
    *
    * `watermarkDays` is the lateness allowance for the RAW events. The
    * watermark must run on the exploded target-day column (it is the
    * event-time the windowed count groups on), but that column leads raw
    * event time by up to `windowDays - 1` days — an uninflated delay of
    * d days would tolerate only d-(windowDays-1) days of real lateness.
    * The configured delay is therefore `watermarkDays + windowDays`,
    * which guarantees at least `watermarkDays` days of raw-event
    * lateness before rows are dropped. */
  def rollingActiveStream(events: DataFrame, userCol: String, tsCol: String,
                          windowDays: Int, watermarkDays: Int = 14): DataFrame =
    events
      .select(col(tsCol), col(userCol),
        explode(sequence(lit(0), lit(windowDays - 1))).as("graft_off"))
      .select(timestamp_seconds(unix_timestamp(
        date_add(col(tsCol).cast("date"), col("graft_off")))).as("graft_d2"),
        col(userCol))
      .withWatermark("graft_d2", s"${watermarkDays + windowDays} days")
      .dropDuplicates("graft_d2", userCol)
      .groupBy(window(col("graft_d2"), "1 day"))
      .agg(count(lit(1)).as(s"active_${windowDays}d"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("d"),
        col(s"active_${windowDays}d"))
}
