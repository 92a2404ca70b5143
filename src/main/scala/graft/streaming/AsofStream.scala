package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming FORWARD as-of join with tolerance — the continuous twin of
  * [[graft.operators.AsOf.asofJoinDirected]]'s `forward` direction
  * (q399): attach to each left event the EARLIEST right event with
  * right.ts ∈ [left.ts, left.ts + tolerance] for the same key
  * ("time-to-next-purchase" enrichment, decided as the stream runs).
  *
  * Why tolerance is REQUIRED here (it is optional in batch): an
  * append-mode verdict is immutable, and "the earliest right at or
  * after ts" stays mutable forever while no right arrives — only the
  * tolerance bound makes every verdict decidable at a known watermark
  * position. The verdict for a left row at `ts` is emitted exactly when
  * the watermark passes `ts + tolerance` — the first moment no
  * in-allowance right event can still slot into the window (the
  * [[Retention]] buffer-until-immutable discipline; batch q399 decides
  * the same rows from the same information).
  *
  * Matching semantics mirror the batch operator post-ADVICE: minimum
  * right timestamp in the window wins; ties on the timestamp resolve to
  * the GREATEST value (the batch window's `rv ascending, running last`
  * tiebreak). Equal timestamps match (inclusive semantics).
  *
  * State per key: the undecided left rows (ts > wm − tolerance) and the
  * right rows still matchable (rts > wm − tolerance) — both bounded by
  * the tolerance horizon, never by history. One event-time timer per
  * key, re-pointed to the earliest undecided verdict boundary on every
  * touch (the Retention timer discipline). */
object AsofStream {

  /** Union-tagged input: side 0 = right (value carrier), 1 = left. The
    * timestamp stays a real TIMESTAMP column so the watermark attribute
    * survives into the stateful operator (the [[Retention.WeekEvent]]
    * rule); the processor reads epoch millis off it. */
  final case class AsofIn(key: Long, ts: java.sql.Timestamp, side: Int,
                          leftId: Long, value: Long)
  /** One verdict per left row: matched* null (None → null columns) when
    * no right event landed in [ts, ts + tolerance]. */
  final case class AsofMatch(key: Long, leftId: Long, leftTsMs: Long,
                             matchedTsMs: Option[Long],
                             matchedValue: Option[Long])
  /** Parallel-list layout (tuple elements inside a state list defeat
    * the state-store product encoder): lefts as (ts, id) pairs zipped
    * from leftTs/leftId, rights likewise. */
  final case class AsofState(leftTs: List[Long], leftId: List[Long],
                                     rightTs: List[Long], rightV: List[Long])

  private class ForwardAsofProcessor(tolMs: Long)
      extends StatefulProcessor[Long, AsofIn, AsofMatch] {
    @transient private var st: ValueState[AsofState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AsofState]("asof",
        Encoders.product[AsofState], TTLConfig.NONE)

    /** Decide every immutable left, evict unmatchable rights, re-point
      * the timer — shared by the input path and the expiry callback. */
    private def decide(key: Long, lefts: List[(Long, Long)],
                       rights: List[(Long, Long)],
                       wm: Long): Iterator[AsofMatch] = {
      val (decided, open) = lefts.partition(_._1 + tolMs < wm)
      val out = decided.sorted.map { case (ts, id) =>
        val window = rights.filter(r => r._1 >= ts && r._1 <= ts + tolMs)
        if (window.isEmpty) AsofMatch(key, id, ts, None, None)
        else {
          val minTs = window.map(_._1).min
          val v = window.filter(_._1 == minTs).map(_._2).max
          AsofMatch(key, id, ts, Some(minTs), Some(v))
        }
      }
      // a right at rts only matches lefts with ts ≤ rts, and every
      // still-open (or still-admissible) left has ts ≥ wm − tol — so a
      // right below wm − tol can never match again
      val liveRights = rights.filter(_._1 >= wm - tolMs)
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (open.nonEmpty || liveRights.nonEmpty) {
        st.update(AsofState(open.map(_._1), open.map(_._2),
          liveRights.map(_._1), liveRights.map(_._2)))
        // fire when the earliest open verdict becomes immutable; with
        // no open lefts, at the eviction horizon of the oldest right
        if (open.nonEmpty)
          getHandle.registerTimer(open.map(_._1).min + tolMs + 1)
        else
          getHandle.registerTimer(liveRights.map(_._1).min + tolMs + 1)
      } else st.clear()
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[AsofIn],
                                 timerValues: TimerValues): Iterator[AsofMatch] = {
      val prior = if (st.exists()) st.get()
        else AsofState(Nil, Nil, Nil, Nil)
      var lefts = prior.leftTs.zip(prior.leftId)
      var rights = prior.rightTs.zip(prior.rightV)
      rows.foreach { r =>
        if (r.side == 1) lefts = (r.ts.getTime, r.leftId) :: lefts
        else rights = (r.ts.getTime, r.value) :: rights
      }
      // distinct: a replayed batch re-delivers identical events — the
      // dedup keeps state idempotent (batch q399 pre-collapses the
      // right side the same way)
      decide(key, lefts.distinct, rights.distinct,
        timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[AsofMatch] = {
      val prior = if (st.exists()) st.get()
        else AsofState(Nil, Nil, Nil, Nil)
      decide(key, prior.leftTs.zip(prior.leftId),
        prior.rightTs.zip(prior.rightV),
        timerValues.getCurrentWatermarkInMs())
    }
  }

  /** The continuous forward-tolerance as-of: `left` rows (key, ts, id)
    * enriched with the earliest `right` (key, ts, value) within
    * `toleranceMs`. Both inputs watermark on their ts column with
    * `watermark` lateness; verdicts appear once immutable. */
  def forwardAsofStream(left: DataFrame, right: DataFrame,
                        keyCol: String, tsCol: String, idCol: String,
                        valueCol: String, toleranceMs: Long,
                        watermark: String = "10 seconds"): Dataset[AsofMatch] = {
    require(toleranceMs > 0, "tolerance must be positive")
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"), lit(1).as("side"),
      col(idCol).cast("long").as("leftId"), lit(0L).as("value"))
    val r = right.select(col(keyCol).cast("long").as("key"),
      col(tsCol).as("ts"), lit(0).as("side"),
      lit(0L).as("leftId"), col(valueCol).cast("long").as("value"))
    implicit val outEnc = Encoders.product[AsofMatch]
    l.unionByName(r)
      .withWatermark("ts", watermark)
      .as[AsofIn]
      .groupByKey(_.key)(Encoders.scalaLong)
      .transformWithState(new ForwardAsofProcessor(toleranceMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
