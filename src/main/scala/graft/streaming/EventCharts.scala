package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming analogs of the weekly batch cadence: the reference recomputes
  * charts on an Airflow weekly schedule (dag.py schedule + get_week_on_chart);
  * here the same results maintain themselves continuously via Structured
  * Streaming — watermarked weekly windows for the rollup, and keyed state
  * for consecutive-week streaks.
  *
  * Scale posture: watermarks bound state (windows older than the watermark
  * are finalized and dropped); streak state is one small record per entity,
  * partitioned by the group key.
  */
object EventCharts {

  /** Watermarked weekly rollup; mirrors Etl.weeklyAgg's schema so streaming
    * output can be checked against the batch plan on the same data.
    * Tumbling 7-day windows offset by 4 days = ISO Monday alignment
    * (epoch 1970-01-01 is a Thursday). */
  def weeklyAggStream(events: DataFrame, ts: String, group: String,
                      value: String, watermark: String = "14 days"): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), "7 days", "7 days", "4 days"), col(group))
      .agg(count(lit(1)).as("n"),
        round(sum(value), 2).as("sum_v"),
        round(avg(value), 2).as("avg_v"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("wk"),
        col(group), col("n"), col("sum_v"), col("avg_v"))

  final case class WeeklyScore(entity: Long, weekNum: Long, score: Double)
  final case class StreakState(lastWeek: Long, streak: Int)
  final case class Streak(entity: Long, weekNum: Long, streak: Int)

  /** Per-entity consecutive-week streak via keyed state — the stateful
    * streaming version of Charts.weeksOnChart's gaps-and-islands batch
    * plan, on the ARBITRARY-STATE V2 API (`transformWithState`,
    * Spark 4). Emits the running streak for every (entity, week) it
    * sees; a gap (weekNum jump > 1) resets to 1, matching
    * dag.py:140-152. Input must arrive per-entity in weekNum order
    * (e.g. from an upstream weekly window agg in append mode); rows
    * within one micro-batch sort by weekNum before folding. Works
    * identically on a static Dataset, where each group is a single
    * sorted batch.
    *
    * State eviction is DECLARATIVE: with a `ttl`, the one StreakState
    * record per entity is evicted by the state store itself, so a
    * dormant entity's state drops without a timeout callback — the
    * `mapGroupsWithState` leak mode (forget to arm the timer, leak the
    * key forever) is structurally impossible here. An entity returning
    * after TTL expiry restarts at streak 1, which is exactly the
    * consecutive-week semantic: a gap that long broke the streak
    * anyway. Without a `ttl` (batch runs, bounded replay tests) the
    * operator runs in TimeMode.None — note that WITH a TTL the
    * maintenance micro-batches keep a continuous query from ever
    * quiescing, so tests must poll the sink (see SpendGuardSpec). */
  private class StreakProcessor(ttl: Option[Duration])
      extends StatefulProcessor[Long, WeeklyScore, Streak] {
    @transient private var st: ValueState[StreakState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[StreakState]("streak",
        Encoders.product[StreakState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[WeeklyScore],
                                 timerValues: TimerValues): Iterator[Streak] = {
      var cur = Option(st.get()).getOrElse(StreakState(Long.MinValue, 0))
      val out = rows.toSeq.sortBy(_.weekNum).map { r =>
        val streak = if (r.weekNum == cur.lastWeek + 1) cur.streak + 1 else 1
        cur = StreakState(r.weekNum, streak)
        Streak(key, r.weekNum, streak)
      }
      st.update(cur)
      out.iterator
    }
  }

  def streaks(weekly: Dataset[WeeklyScore],
              ttl: Option[Duration] = None): Dataset[Streak] = {
    implicit val streakEnc = Encoders.product[Streak]
    // Batch execution of transformWithState still loads a state store,
    // whose executors look up the driver's StateStoreCoordinator RPC
    // endpoint — created when the session's StreamingQueryManager is
    // instantiated. Touch it so a pure-batch session doesn't fail with
    // CANNOT_LOAD_STATE_STORE on the endpoint lookup.
    weekly.sparkSession.streams
    weekly.groupByKey(_.entity)(Encoders.scalaLong)
      .transformWithState(new StreakProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
