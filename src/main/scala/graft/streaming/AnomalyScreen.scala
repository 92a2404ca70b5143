package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of q117's daily volume anomaly screen
  * ([[graft.operators.Analytics.dailyAnomalies]]): per event type, each
  * day's count is finalized when the watermark proves the day complete,
  * then z-scored against the trailing `trailing` OBSERVED days — the
  * volume-spike pager an ingest pipeline runs continuously instead of
  * re-scanning history every morning.
  *
  * Emission is the RAW day statistic (count + exact-integer baseline
  * sums); [[screenOf]] applies q117's z formula, minHistory gate and
  * degenerate-variance filter downstream with the IDENTICAL Spark SQL
  * expressions — the [[DistinctCurve.curveOf]] split, so batch parity is
  * bit-exact and append mode never re-windows a row whose event-time day
  * is, by finalization, behind the watermark.
  *
  * Correctness: a day d is immutable once wm ≥ d + 1 day (any admissible
  * event for d would carry day-column d < wm — filtered as late), and a
  * closed day can never reopen (its rows are late by the same argument).
  * Multiple days closing in one firing close in ascending day order, so
  * each baseline includes every earlier observed day — exactly the batch
  * window `rowsBetween(-trailing, -1)` over OBSERVED days.
  *
  * State bound per event type: the OPEN days inside the watermark
  * horizon (a few (day, count) pairs) plus the trailing history capped
  * at `trailing` pairs. Timers: ONE, at the earliest open day's end. */
object AnomalyScreen {

  final case class EvDay(etype: String, day: java.sql.Timestamp)
  final case class ScreenState(open: Seq[(Long, Long)],
                               hist: Seq[(Long, Long)])
  /** A finalized (type, day) count with its exact trailing baseline
    * sums — final, never retracted. */
  final case class DayStat(etype: String, dayMs: Long, n_events: Long,
                           n_hist: Long, s_hist: Long, ss_hist: Long)

  private val DayMs = 86400000L

  private class Processor(trailing: Int)
      extends StatefulProcessor[String, EvDay, DayStat] {
    @transient private var st: ValueState[ScreenState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ScreenState]("days",
        Encoders.product[ScreenState], TTLConfig.NONE)

    /** Close every open day the watermark has completed (ascending), emit
      * its stat, fold it into the trailing history, re-point the timer at
      * the earliest still-open day. */
    private def drain(etype: String, s0: ScreenState,
                      wm: Long): Iterator[DayStat] = {
      val (done, open) = s0.open.partition { case (d, _) => d + DayMs <= wm }
      var hist = s0.hist
      val out = done.sortBy(_._1).map { case (d, cnt) =>
        val base = hist.takeRight(trailing)
        val stat = DayStat(etype, d, cnt, base.size.toLong,
          base.map(_._2).sum, base.map(p => p._2 * p._2).sum)
        hist = (hist :+ ((d, cnt))).takeRight(trailing)
        stat
      }
      st.update(ScreenState(open, hist))
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (open.nonEmpty) getHandle.registerTimer(open.map(_._1).min + DayMs)
      out.iterator
    }

    override def handleInputRows(etype: String, rows: Iterator[EvDay],
                                 timerValues: TimerValues): Iterator[DayStat] = {
      val prior = if (st.exists()) st.get() else ScreenState(Nil, Nil)
      val add = rows.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val d = r.day.getTime; m.updated(d, m.getOrElse(d, 0L) + 1L)
      }
      val open = (prior.open.toMap.keySet ++ add.keySet).toSeq.map { d =>
        (d, prior.open.toMap.getOrElse(d, 0L) + add.getOrElse(d, 0L))
      }
      drain(etype, ScreenState(open, prior.hist),
        timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(etype: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[DayStat] = {
      if (!st.exists()) return Iterator.empty
      drain(etype, st.get(), timerValues.getCurrentWatermarkInMs())
    }
  }

  /** Finalized per-(type, day) counts with trailing baseline sums.
    * `watermark` is the lateness allowance for the truncated DAY column
    * (day-starts trail raw events by < 1 day — the
    * [[DistinctCurve.firstSeenStream]] sizing note). */
  def dayStatsStream(events: DataFrame, typeCol: String, tsCol: String,
                     trailing: Int = 28,
                     watermark: String = "2 days"): Dataset[DayStat] = {
    import events.sparkSession.implicits._
    implicit val enc = Encoders.product[DayStat]
    events
      .filter(col(typeCol).isNotNull)
      .select(col(typeCol).cast("string").as("etype"),
        date_trunc("day", col(tsCol)).as("day"))
      .withWatermark("day", watermark)
      .as[EvDay]
      .groupByKey(_.etype)(Encoders.STRING)
      .transformWithState(new Processor(trailing),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** q117's exact screen over a finalized day-stat table (e.g. an append
    * sink's contents): the SAME Spark SQL mean/variance/z expressions as
    * [[graft.operators.Analytics.dailyAnomalies]], so the composed
    * stream reproduces the batch screen bit-for-bit. */
  def screenOf(stats: DataFrame, minHistory: Int = 7): DataFrame = {
    val nD = col("n_hist").cast("double")
    val sD = col("s_hist").cast("double")
    val ssD = col("ss_hist").cast("double")
    stats
      .filter(col("n_hist") >= minHistory)
      .withColumn("graft_var", (ssD - sD * sD / nD) / nD)
      .filter(col("graft_var") > 0)
      .select(col("etype"),
        date_format(timestamp_millis(col("dayMs")), "yyyy-MM-dd").as("day"),
        col("n_events"), col("n_hist"),
        round(sD / nD, 4).as("mean_hist"),
        round((col("n_events").cast("double") - sD / nD)
          / sqrt(col("graft_var")), 4).as("z"))
  }
}
