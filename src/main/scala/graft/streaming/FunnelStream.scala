package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState, ListState}

/** Continuous windowed ordered funnel — the streaming twin of the batch
  * [[graft.operators.Analytics.windowedFunnel]] (q115): users must hit
  * the steps IN ORDER, each stage strictly after the previous one and
  * within `window` of the stage-1 anchor; a completion row (user,
  * anchor, end) is emitted the moment the verdict is immutable.
  *
  * Determinism contract (the churn/RateCap discipline): arriving events
  * BUFFER in a ListState until the watermark passes them — only then
  * does the event-time-ordered fold consume them — so the emitted
  * completions are a pure function of event time, independent of
  * arrival order or batch boundaries within the lateness allowance.
  * An event-time TIMER re-points at the earliest actionable instant
  * (the oldest buffered event, or the open funnel's window close), so
  * silence still finalizes state.
  *
  * Re-entrancy: ONE open funnel per user; when its window closes
  * uncompleted, the state evicts and the next step-head event opens a
  * fresh funnel — what a live gate wants. (The batch q115 anchors once
  * per dataset by construction of its min-aggregate; on data where
  * each user has one step-head episode the two agree exactly, which is
  * what the parity spec pins.)
  *
  * State per user: one small Progress record + the buffered
  * not-yet-finalizable events (bounded by the watermark horizon × the
  * user's event rate, never history); both clear on completion or
  * window expiry, so a long-running stream holds only in-flight
  * funnels. */
object FunnelStream {

  /** Input after step resolution: `step` is the 1-based index in the
    * funnel's step sequence. */
  private[streaming] case class StepEvent(user: Long, step: Int, tsUs: Long)
  /** The open-funnel state machine: reached `stage`, anchored at the
    * stage-1 event `anchorUs`, last advanced at `lastUs`. */
  private[streaming] case class Progress(stage: Int, anchorUs: Long,
                                         lastUs: Long)
  final case class Completion(user: Long, startUs: Long, endUs: Long)

  private class FunnelProcessor(nSteps: Int, windowUs: Long)
      extends StatefulProcessor[Long, StepEvent, Completion] {
    @transient private var buf: ListState[StepEvent] = _
    @transient private var prog: ValueState[Progress] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[StepEvent]("buf",
        Encoders.product[StepEvent], TTLConfig.NONE)
      prog = getHandle.getValueState[Progress]("prog",
        Encoders.product[Progress], TTLConfig.NONE)
    }

    /** Fold every finalizable (ts ≤ watermark) buffered event through
      * the state machine in event-time order, expire uncompleted
      * funnels whose window closed, re-buffer the rest, re-point the
      * single timer. */
    private def flush(user: Long, incoming: Seq[StepEvent],
                      wm: Long): Iterator[Completion] = {
      val all = (buf.get().toSeq ++ incoming).sortBy(e => (e.tsUs, e.step))
      val (ripe, pending) = all.partition(_.tsUs <= wm)
      var cur = if (prog.exists()) Option(prog.get()) else None
      val out = Seq.newBuilder[Completion]
      for (e <- ripe) {
        // close an expired funnel before consuming events past its window
        cur match {
          case Some(p) if e.tsUs > p.anchorUs + windowUs => cur = None
          case _ => ()
        }
        cur match {
          case None if e.step == 1 =>
            cur = Some(Progress(1, e.tsUs, e.tsUs))
          case Some(p) if e.step == p.stage + 1 && e.tsUs > p.lastUs &&
              e.tsUs <= p.anchorUs + windowUs =>
            if (e.step == nSteps) {
              out += Completion(user, p.anchorUs, e.tsUs)
              cur = None
            } else cur = Some(Progress(e.step, p.anchorUs, e.tsUs))
          case _ => () // off-order step: no effect (the batch min-join's rule)
        }
      }
      // an open funnel whose window has closed below the watermark can
      // never complete — evict rather than hold dead state
      cur = cur.filterNot(p => p.anchorUs + windowUs <= wm)
      cur match {
        case Some(p) => prog.update(p)
        case None => prog.clear()
      }
      if (pending.nonEmpty) buf.put(pending.toArray) else buf.clear()
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      // timers run in MILLISECONDS; ceil the µs instants so a timer
      // can never fire with the µs condition still unmet (a floored
      // expiry could fire-and-rearm forever on a sub-ms remainder)
      val next = (pending.map(e => (e.tsUs + 999L) / 1000L) ++
        cur.map(p => (p.anchorUs + windowUs + 999L) / 1000L + 1L))
        .sorted.headOption
      next.foreach(getHandle.registerTimer)
      out.result().iterator
    }

    override def handleInputRows(user: Long, rows: Iterator[StepEvent],
                                 timerValues: TimerValues): Iterator[Completion] =
      flush(user, rows.toSeq, timerValues.getCurrentWatermarkInMs() * 1000L)

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Completion] =
      flush(user, Nil, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  /** Start the funnel over `events` (tsCol: Timestamp). Rows whose
    * `typeCol` is not in `steps` are dropped before the stateful op —
    * they can neither advance nor reset a funnel, and filtering them
    * upstream keeps the buffered state to funnel-relevant rows only.
    * `lateness` is the raw-event watermark delay. */
  def completions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String], windowUs: Long,
                  lateness: String): Dataset[Completion] = {
    require(steps.size >= 2, "funnel needs at least two steps")
    require(windowUs > 0, "windowUs must be positive")
    implicit val compEnc = Encoders.product[Completion]
    implicit val stepEnc = Encoders.product[StepEvent]
    val stepIdx = steps.zipWithIndex
      .map { case (s, i) => (s, i + 1) }.toMap
    val idxCol = steps.foldLeft(lit(-1)) { (acc, s) =>
      when(col(typeCol) === s, lit(stepIdx(s))).otherwise(acc)
    }
    events
      .withWatermark(tsCol, lateness)
      .select(col(userCol).cast("long").as("user"),
        idxCol.as("step"), unix_micros(col(tsCol)).as("tsUs"))
      .filter(col("step") > 0)
      .as[StepEvent]
      .groupByKey(_.user)(Encoders.scalaLong)
      .transformWithState(new FunnelProcessor(steps.size, windowUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
