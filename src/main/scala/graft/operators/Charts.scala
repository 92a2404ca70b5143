package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chart / leaderboard analytics.
  *
  * Re-expresses the reference dashboard's pandas sort-head logic
  * (app.py:60-119) and the ETL's "weeks on chart" streak computation
  * (dag.py:118-154) as window-function plans.
  *
  * Scale notes: the reference loops over each timestamp and each group in
  * Python (dag.py:127-152 — O(weeks × entities) driver-side). Here the whole
  * streak is two window passes over a per-(entity, week) pre-aggregate, which
  * is tiny relative to the raw fact table, so the expensive shuffle happens
  * once on the pre-aggregate's keys and everything after is narrow.
  */
object Charts {

  /** Global top-k by a metric with a deterministic tiebreak.
    * Reference: app.py:62-63 `sort_values("popularity", ascending=False).head(20)`.
    * TopK through `orderBy.limit` lets Spark run a per-partition partial
    * top-k (TakeOrderedAndProject) — no full sort of 100 TB. */
  def topK(df: DataFrame, metric: String, tiebreak: String, k: Int): DataFrame =
    df.orderBy(col(metric).desc, col(tiebreak).asc).limit(k)

  /** Top-k within each group via row_number — one shuffle on the group key.
    * Reference: the dashboard's per-entity-type leaderboards (app.py:56-89). */
  def topKPerGroup(df: DataFrame, group: String, metric: String,
                   tiebreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(col(metric).desc, col(tiebreak).asc)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Distribution stats per group — the audio-feature comparison surface
    * (app.py:35-53, 93-97) generalized to one partial-aggregated pass. */
  def featureStats(df: DataFrame, group: String, feature: String): DataFrame =
    df.groupBy(group).agg(
      count(lit(1)).as("n"),
      round(avg(feature), 2).as("avg_v"),
      round(min(feature), 2).as("min_v"),
      round(max(feature), 2).as("max_v"),
      // stddev_samp of a single row is NaN in Spark but NULL in ANSI
      // engines — normalize to NULL for oracle parity.
      round(when(isnan(stddev(feature)), lit(null)).otherwise(stddev(feature)), 2)
        .as("std_v"))

  /** Latest row per entity (reference keeps `group.iloc[-1]`, dag.py:139).
    * row_number over (entity order by ts desc) — one shuffle on entity. */
  def latestSnapshot(df: DataFrame, entity: String, ts: String,
                     tiebreak: String): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(col(ts).desc, col(tiebreak).desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Per-(entity, ISO week) score: the weekly snapshot the reference gets
    * from its weekly Airflow cadence. Rounded before any ranking so that
    * cross-engine rank tiebreaks are deterministic. */
  def weeklyScores(events: DataFrame, entity: String, ts: String,
                   value: String): DataFrame =
    events
      .select(col(entity), date_trunc("week", col(ts)).cast("date").as("wk"),
        col(value))
      .groupBy(entity, "wk")
      .agg(round(sum(value), 2).as("score"))
      .withColumn("weeknum",
        (datediff(col("wk"), lit("1970-01-05").cast("date")) / 7).cast("long"))

  /** Rank entities within each week — the per-week chart. */
  def weeklyChart(events: DataFrame, entity: String, ts: String,
                  value: String, k: Int): DataFrame = {
    val w = Window.partitionBy("wk").orderBy(col("score").desc, col(entity).asc)
    weeklyScores(events, entity, ts, value)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(date_format(col("wk"), "yyyy-MM-dd").as("wk"),
        col(entity), col("score"), col("rnk"))
  }

  /** Consecutive-weeks-on-chart streak ending at the newest week.
    *
    * Reference semantics (dag.py:118-154): an entity's `chart` counter is the
    * number of consecutive weekly appearances in the top-`k` chart, reset to 0
    * on a gap, and reported as 0 unless the streak reaches the newest week.
    *
    * Plan: weekly pre-agg → per-week row_number (chart membership) →
    * gaps-and-islands (weeknum - row_number over entity) → count of the
    * island that touches the global max week. The global max week is a 1-row
    * aggregate joined via broadcast.
    */
  def weeksOnChart(events: DataFrame, entity: String, ts: String,
                   value: String, k: Int): DataFrame = {
    val weekly = weeklyScores(events, entity, ts, value)
    val rankW = Window.partitionBy("wk").orderBy(col("score").desc, col(entity).asc)
    val charted = weekly
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col(entity), col("weeknum"))
    val maxWeek = weekly.agg(max("weeknum").as("maxwk"))
    val islandW = Window.partitionBy(entity).orderBy(col("weeknum").asc)
    val islands = charted.withColumn("grp",
      col("weeknum") - row_number().over(islandW))
    val lastIsland = islands.groupBy(col(entity), col("grp"))
      .agg(count(lit(1)).as("cnt"), max("weeknum").as("mxw"))
    val streaks = lastIsland
      .join(broadcast(maxWeek), col("mxw") === col("maxwk"))
      .select(col(entity), col("cnt"))
    weekly.select(entity).distinct()
      .join(streaks, Seq(entity), "left")
      .select(col(entity), coalesce(col("cnt"), lit(0L)).as("weeks_on_chart"))
  }

  /** Leaderboard turnover — how volatile is the top-k chart week over
    * week: for each consecutive week pair, the Jaccard churn of the two
    * top-k member SETS (turnover_ppm = 10⁶ − |∩|·10⁶ div |∪|) — 0 =
    * frozen chart, 10⁶ = complete replacement. The health metric for
    * any ranking surface (a frozen chart isn't ranking, a thrashing one
    * isn't stable), and the set-level complement to the per-entity
    * streaks. Weeks are UTC epoch-week buckets (ts div 7 days — the
    * weekly-agg convention); membership by (count desc, entity asc)
    * rank ≤ k, fully tie-broken.
    *
    * Scale: one (week, entity) aggregate, a per-week rank window over
    * that bounded table, and a week↔week+1 self-join of k-row sets. */
  def chartTurnover(events: DataFrame, entityCol: String, tsUsCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val week = 7L * 86400L * 1000000L
    // Pinned: the ranked membership table feeds FIVE subtrees (both
    // join legs, both size aggregates, the intersection).
    val ranked = Materialize.transient(events
      .select(col(entityCol).as("graft_e"),
        expr(s"$tsUsCol div ${week}L").as("graft_w"))
      .groupBy("graft_w", "graft_e")
      .agg(count(lit(1)).as("graft_c"))
      .withColumn("graft_rk", row_number().over(
        Window.partitionBy("graft_w")
          .orderBy(col("graft_c").desc, col("graft_e").asc)))
      .filter(col("graft_rk") <= k)
      .select(col("graft_w"), col("graft_e")))
    val cur = ranked.select(col("graft_w"), col("graft_e"))
    val nxt = ranked.select((col("graft_w") - 1L).as("graft_w"),
      col("graft_e").as("graft_e2"))
    val sizes = cur.groupBy("graft_w").agg(count(lit(1)).as("graft_na"))
    val nsizes = nxt.groupBy("graft_w").agg(count(lit(1)).as("graft_nb"))
    val inter = cur.join(nxt,
      cur("graft_w") === nxt("graft_w") &&
        cur("graft_e") === nxt("graft_e2"))
      .groupBy(cur("graft_w").as("graft_w"))
      .agg(count(lit(1)).as("graft_i"))
    sizes.join(nsizes, Seq("graft_w"))
      .join(inter, Seq("graft_w"), "left")
      .select(col("graft_w").cast("long").as("week"),
        coalesce(col("graft_i"), lit(0L)).cast("long").as("n_common"),
        expr("CAST(1000000 - coalesce(graft_i, 0L) * 1000000" +
          " div (graft_na + graft_nb - coalesce(graft_i, 0L))" +
          " AS BIGINT)").as("turnover_ppm"))
      .orderBy("week")
  }
}
