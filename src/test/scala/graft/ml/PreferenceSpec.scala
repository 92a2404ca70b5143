package graft.ml

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: hand-iterated MM on a transitive tournament") {
    // 4 users, each valuing A > B > C: wins A→B 4, A→C 4, B→C 4.
    // Three hand-iterated integer MM steps give exactly
    // A=(8,0,1000), B=(4,4,222), C=(0,8,0).
    val rows = (1L to 4L).flatMap(u => Seq(
      (u, "A", 3.0), (u, "B", 2.0), (u, "C", 1.0)))
      .toDF("user_id", "event_type", "value")
    val got = Preference.bradleyTerry(rows, "user_id", "event_type",
      "value", iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("A", 8L, 0L, 1000L), ("B", 4L, 4L, 222L), ("C", 0L, 8L, 0L)))
  }

  test("bradleyTerry: symmetric record means equal strength; ties drop") {
    // u1 prefers A, u2 prefers B — 1 win each way; u3 ties (no win).
    val rows = Seq(
      (1L, "A", 5.0), (1L, "B", 1.0),
      (2L, "A", 1.0), (2L, "B", 5.0),
      (3L, "A", 2.0), (3L, "B", 2.0))
      .toDF("user_id", "event_type", "value")
    val got = Preference.bradleyTerry(rows, "user_id", "event_type",
      "value", iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got("A") === 1000L && got("B") === 1000L)
    // the compare is on exact cell MEANS (cross-multiplied, no float
    // division): u4's two A events average 2.0, under B's single 3.0 —
    // B wins even though A's SUM (4.0) is larger
    val means = Seq((4L, "A", 2.0), (4L, "A", 2.0), (4L, "B", 3.0))
      .toDF("user_id", "event_type", "value")
    val s = Preference.bradleyTerry(means, "user_id", "event_type",
      "value", iters = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(s("B") === 1L && s("A") === 0L)
  }

  test("preferencePairs: chosen side, exact centi margins, margin gate") {
    // u1: A mean 300, B mean 100 → margin 200; u2: A 150 vs B 100 →
    // margin 50, gated out at minMargin 100; u3 ties → no pair.
    val rows = Seq(
      (1L, "A", 3.0), (1L, "B", 1.0),
      (2L, "A", 1.5), (2L, "B", 1.0),
      (3L, "A", 2.0), (3L, "B", 2.0))
      .toDF("user_id", "event_type", "value")
    val got = Preference.preferencePairs(rows, "user_id", "event_type",
      "value", minMarginCenti = 100L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq === Seq((1L, "A", "B", 200L)))
    // margin is a MEAN diff: u4's two A events (mean 200) vs B 100 →
    // margin exactly 100, admitted at the boundary
    val m = Seq((4L, "A", 2.0), (4L, "A", 2.0), (4L, "B", 1.0))
      .toDF("user_id", "event_type", "value")
    val g2 = Preference.preferencePairs(m, "user_id", "event_type",
      "value", minMarginCenti = 100L).collect()
    assert(g2.length === 1 && g2(0).getLong(3) === 100L)
  }
}
