package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  final case class ChurnState(lastWeekMs: Long)
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

  /** Churn detection per user: a GAP in the week sequence emits the churn
    * row immediately (active in w, next seen ≥ w+2); the no-more-events
    * case emits via EVENT-TIME TIMEOUT when the watermark passes the end
    * of the following week — the streaming equivalent of q94's anti-join,
    * decided exactly when the batch plan could first decide it. State is
    * one lastWeek record per live user, removed at churn. */
  def churnFn(user: Long, rows: Iterator[WeekEvent],
              state: GroupState[ChurnState]): Iterator[Churn] = {
    if (!rows.hasNext && state.hasTimedOut) {
      val out = state.getOption.map(s => Churn(s.lastWeekMs, user))
      state.remove()
      out.iterator
    } else {
      val weeks = rows.map(_.weekStart.getTime).toSeq.sorted.distinct
      var last = state.getOption.map(_.lastWeekMs)
      val out = Seq.newBuilder[Churn]
      weeks.foreach { w =>
        last match {
          case Some(lw) if w > lw + WeekMs => out += Churn(lw, user)
          case _ =>
        }
        last = Some(last.fold(w)(math.max(_, w)))
      }
      last.foreach { lw =>
        state.update(ChurnState(lw))
        // Churn for week lw is decidable once week lw+1 has fully closed.
        state.setTimeoutTimestamp(lw + 2 * WeekMs)
      }
      out.result().iterator
    }
  }

  /** The continuous q94: (wk, user_id) churn events. Aggregate counts
    * downstream (or in the sink) — the row stream IS the anti-join's
    * output, one row per churned (week, user). */
  def weeklyChurnStream(events: DataFrame, userCol: String, tsCol: String,
                        watermark: String = "14 days"): Dataset[Churn] = {
    import events.sparkSession.implicits._
    weekEvents(events, userCol, tsCol, watermark)
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(churnFn)
  }

  /** The continuous q95: rolling `windowDays`-day distinct active users.
    * Same constant-fan-out shape as the batch plan — each (day, user)
    * contributes to `windowDays` target days via a bounded explode — then
    * the two streaming-native stateful steps: dropDuplicates on
    * (target-day, user) bounds state at the watermark horizon, and a
    * windowed count finalizes each day as the watermark passes. Emits
    * every day in any window (the batch query then filters to observed
    * days; a day with no events of its own is a superset row, not a
    * disagreement). */
  def rollingActiveStream(events: DataFrame, userCol: String, tsCol: String,
                          windowDays: Int, watermark: String = "14 days"): DataFrame =
    events
      .select(col(tsCol), col(userCol),
        explode(sequence(lit(0), lit(windowDays - 1))).as("graft_off"))
      // Target-day event time = start of (event day + offset): stays
      // within [event time, event time + windowDays), so the shifted
      // watermark lag is watermark + windowDays and windows still close.
      .select(timestamp_seconds(unix_timestamp(
        date_add(col(tsCol).cast("date"), col("graft_off")))).as("graft_d2"),
        col(userCol))
      .withWatermark("graft_d2", watermark)
      .dropDuplicates("graft_d2", userCol)
      .groupBy(window(col("graft_d2"), "1 day"))
      .agg(count(lit(1)).as(s"active_${windowDays}d"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("d"),
        col(s"active_${windowDays}d"))
}
