package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * plan. Emits the running streak for every (entity, week) it sees;
    * a gap (weekNum jump > 1) resets to 1, matching dag.py:140-152.
    * Input must arrive per-entity in weekNum order (e.g. from an upstream
    * weekly window agg in append mode). Works identically on a static
    * Dataset, where each group is a single sorted batch. */
  def streakFn(entity: Long, rows: Iterator[WeeklyScore],
               state: GroupState[StreakState]): Iterator[Streak] = {
    var st = state.getOption.getOrElse(StreakState(Long.MinValue, 0))
    val out = rows.toSeq.sortBy(_.weekNum).map { r =>
      val streak = if (r.weekNum == st.lastWeek + 1) st.streak + 1 else 1
      st = StreakState(r.weekNum, streak)
      Streak(entity, r.weekNum, streak)
    }
    state.update(st)
    out.iterator
  }

  def streaks(weekly: Dataset[WeeklyScore]): Dataset[Streak] = {
    import weekly.sparkSession.implicits._
    weekly.groupByKey(_.entity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(streakFn)
  }
}
