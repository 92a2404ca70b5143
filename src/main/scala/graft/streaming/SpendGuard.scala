package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Continuous per-user spend-threshold guard on the ARBITRARY-STATE V2
  * API (`transformWithState`, Spark 4): the first stateful operator in
  * this engine to use typed state variables with DECLARATIVE TTL instead
  * of hand-managed `GroupState` — state eviction is a property of the
  * state variable (RocksDB enforces it), not a timeout callback the
  * processor must remember to arm (the `mapGroupsWithState` failure mode
  * where a forgotten timer leaks state forever; cf. the q36 streaks
  * operator, which carries that burden by hand).
  *
  * Semantics: per user, fold purchase values (lossless centi-units) into
  * a running total; emit EXACTLY ONE row the micro-batch the total first
  * reaches `thresholdCents` — the abuse/fraud/budget flag a platform
  * feeds its action queue. Emission is ORDER-INDEPENDENT by design: the
  * row reports the batch-end total (sum — commutative), not the
  * mid-batch prefix at the crossing event, so shuffle read order cannot
  * change the output. After TTL-idle expiry, a returning user starts a
  * fresh budget window — the documented (and intended) semantic.
  *
  * Scale posture: state is ONE (2×long) value per active user, bounded
  * by the TTL horizon; the shuffle is the groupByKey on the user — the
  * same single keyed Exchange as every stateful operator here. Requires
  * the RocksDB state store provider (GraftSession's default). */
object SpendGuard {

  final case class Crossing(user_id: Long, total_cents: Long,
                            n_events: Long)

  private final case class Acc(cents: Long, n: Long)

  private class GuardProcessor(thresholdCents: Long, ttl: Duration)
      extends StatefulProcessor[Long, (Long, Long), Crossing] {
    @transient private var acc: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Acc]("acc", Encoders.product[Acc],
        TTLConfig(ttl))

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[Crossing] = {
      val before = Option(acc.get()).getOrElse(Acc(0L, 0L))
      var cents = before.cents
      var n = before.n
      rows.foreach { r => cents += r._2; n += 1 }
      acc.update(Acc(cents, n))
      if (before.cents < thresholdCents && cents >= thresholdCents)
        Iterator.single(Crossing(key, cents, n))
      else Iterator.empty
    }
  }

  /** Crossing events for a stream of (user, value) rows. `valueCol`
    * quantizes to lossless centi-units (the generator emits 2-dp). */
  def crossings(events: DataFrame, userCol: String, valueCol: String,
                thresholdCents: Long,
                ttl: Duration = Duration.ofDays(1)): Dataset[Crossing] = {
    require(thresholdCents > 0, "threshold must be positive")
    implicit val pairEnc: Encoder[(Long, Long)] =
      Encoders.product[(Long, Long)]
    implicit val crossEnc: Encoder[Crossing] = Encoders.product[Crossing]
    events
      .select(col(userCol).cast("long"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new GuardProcessor(thresholdCents, ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
