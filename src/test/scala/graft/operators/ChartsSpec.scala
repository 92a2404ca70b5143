package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChartsSpec extends SparkSpec {
  import spark.implicits._

  test("topK returns k rows ordered with deterministic tiebreak") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 9.0), (4L, 1.0)).toDF("id", "v")
    val got = Charts.topK(df, "v", "id", 2).collect().map(r => r.getLong(0))
    assert(got.toSeq == Seq(3L, 1L)) // 9.0 first, then tie 5.0 broken by id
  }

  test("topKPerGroup keeps k per group with rank") {
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 2.0), ("a", 3L, 1.0), ("b", 4L, 9.0))
      .toDF("g", "id", "v")
    val got = Charts.topKPerGroup(df, "g", "v", "id", 2)
    assert(got.count() == 3)
    assert(got.filter($"g" === "a" && $"rnk" === 1).select("id").as[Long].head() == 1L)
  }

  test("latestSnapshot keeps the newest row per entity") {
    val df = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "only"))
      .toDF("ent", "ts", "tag")
    val got = Charts.latestSnapshot(df, "ent", "ts", "ts")
      .select("ent", "tag").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "only"))
  }

  test("weeksOnChart counts consecutive weeks ending at the newest week") {
    // 3 weekly periods (Mondays). Entity 1 charted in all 3; entity 2 only
    // in weeks 1-2 of 3 (streak broken at the end → 0); entity 3 only in
    // the last week → 1. k=2 of 3 entities per week.
    def ts(week: Int, day: Int) =
      java.sql.Timestamp.valueOf(s"2024-01-${1 + week * 7 + day} 12:00:00")
    val rows = Seq(
      // week 0 (Jan 1 Mon): e1=100, e2=50, e3=1
      (1L, ts(0, 0), 100.0), (2L, ts(0, 0), 50.0), (3L, ts(0, 0), 1.0),
      // week 1: e1=100, e2=50, e3=1
      (1L, ts(1, 0), 100.0), (2L, ts(1, 0), 50.0), (3L, ts(1, 0), 1.0),
      // week 2: e1=100, e3=50, e2=1  (e2 drops off, e3 charts)
      (1L, ts(2, 0), 100.0), (3L, ts(2, 0), 50.0), (2L, ts(2, 0), 1.0))
    val df = rows.toDF("user_id", "ts_t", "value")
    val got = Charts.weeksOnChart(df, "user_id", "ts_t", "value", 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("weeklyChart ranks within each week") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 20.0))
      .toDF("user_id", "ts_t", "value")
    val got = Charts.weeklyChart(df, "user_id", "ts_t", "value", 5)
    val top = got.filter($"rnk" === 1).select("user_id").as[Long].head()
    assert(top == 2L)
    assert(got.select("wk").distinct().as[String].head() == "2024-01-01")
  }

  test("chartTurnover: hand-computed Jaccard churn between weekly top-k") {
    val wk = 7L * 86400L * 1000000L
    def burst(u: Long, w: Long, n: Int) =
      (1 to n).map(i => (u, w * wk + i))
    // week 0 top-2 = {1, 2}; week 1 top-2 = {2, 3}: ∩=1, ∪=3 →
    // turnover = 10⁶ − 333333 = 666667. week 2 repeats week 1 → 0.
    val ev = (burst(1L, 0, 3) ++ burst(2L, 0, 2) ++ burst(3L, 0, 1) ++
      burst(2L, 1, 3) ++ burst(3L, 1, 2) ++ burst(1L, 1, 1) ++
      burst(2L, 2, 3) ++ burst(3L, 2, 2))
      .toDF("user_id", "ts_us")
    val got = Charts.chartTurnover(ev, "user_id", "ts_us", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 1L, 666667L), (1L, 2L, 0L)))
  }
}
