package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Continuous repeat-event detector — the per-(key, item) counting gate
  * a retention/abuse surface runs on the live stream ("emit the moment
  * a user performs the SAME action for the Nth time"): per key a MAP
  * STATE of item → count, and the micro-batch in which an item's count
  * first reaches `threshold` emits exactly one row carrying that
  * batch-end count. The V2 API's MapState is the point: the sub-keyed
  * counts live as individual state-store entries (updating one item
  * touches one entry, not a serialized blob of the user's whole
  * history — the [[EventCharts]]/[[SpendGuard]] ValueState shape would
  * rewrite the full map per event), and the declarative TTL evicts a
  * dormant key's entries with no timer to arm.
  *
  * Emission is once per (key, item): counts strictly above `threshold`
  * never re-emit (the crossing batch reported the batch-END count, so
  * shuffle read order within the batch can't change output — the
  * SpendGuard determinism argument applied per item). A TTL-evicted
  * item that returns starts from zero and may legitimately emit again —
  * the dormancy semantics, not a bug. */
object RepeatGuard {

  final case class Repeat(key: String, item: String, count: Long)

  private class RepeatProcessor(threshold: Long, ttl: Option[Duration])
      extends StatefulProcessor[String, (String, String), Repeat] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String,
                                 rows: Iterator[(String, String)],
                                 timerValues: TimerValues): Iterator[Repeat] = {
      // fold the batch per item first: ONE state read + write per
      // touched item, and the crossing test runs on batch-end counts
      val batch = rows.foldLeft(Map.empty[String, Long]) {
        case (acc, (_, item)) => acc.updated(item, acc.getOrElse(item, 0L) + 1L)
      }
      val out = Seq.newBuilder[Repeat]
      batch.foreach { case (item, n) =>
        val before = if (counts.containsKey(item)) counts.getValue(item) else 0L
        val after = before + n
        counts.updateValue(item, after)
        if (before < threshold && after >= threshold)
          out += Repeat(key, item, after)
      }
      out.result().iterator
    }
  }

  /** Start the gate: rows whose (key, item) count first reaches
    * `threshold`, with optional TTL-based dormancy eviction. */
  def alerts(events: DataFrame, keyCol: String, itemCol: String,
             threshold: Long,
             ttl: Option[Duration] = None): Dataset[Repeat] = {
    require(threshold >= 1L, "threshold must be at least 1")
    implicit val outEnc = Encoders.product[Repeat]
    implicit val inEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    events.sparkSession.streams // batch-run coordinator warmup (see EventCharts)
    events
      .select(col(keyCol).cast("string").as("key"),
        col(itemCol).cast("string").as("item"))
      .as[(String, String)]
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new RepeatProcessor(threshold, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
