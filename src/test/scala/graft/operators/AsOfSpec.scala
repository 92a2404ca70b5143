package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof join attaches the most recent right value at or before ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (2L, 15L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 25L, 2.5), (2L, 99L, 9.9))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", "v", "last_v")
      .select("tag", "last_v").as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "a" -> Some(1.0),  // equal ts matches (inclusive)
      "b" -> Some(1.0),  // 25 is in the future
      "c" -> Some(2.5),
      "d" -> None))      // right@99 is after 15 → no match
  }

  test("asof join keeps every left row exactly once") {
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong, i)).toDF("k", "ts", "i")
    val right = Seq((0L, 50L, 1.0)).toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", "v", "last_v")
    assert(got.count() == 100)
    assert(got.columns.toSet == Set("k", "ts", "i", "last_v"))
  }

  test("directed asof: forward/backward, tolerance voiding, equal-ts inclusive") {
    val left = Seq((1L, 100L), (1L, 200L), (1L, 310L), (2L, 50L))
      .toDF("k", "ts")
    val right = Seq((1L, 90L, 9L), (1L, 200L, 20L), (1L, 300L, 30L))
      .toDF("k", "ts", "v")
    // forward: next right at or after each ts
    val f = AsOf.asofJoinDirected(left, right, "k", "ts", "v", "nv",
      direction = "forward")
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(f === Seq(
      (1L, 100L, Some(20L), Some(200L)),
      (1L, 200L, Some(20L), Some(200L)), // equal ts matches (inclusive)
      (1L, 310L, None, None),            // nothing after
      (2L, 50L, None, None)))            // no right rows for the key
    // backward with tolerance: a match farther than 50 voids entirely
    val b = AsOf.asofJoinDirected(left, right, "k", "ts", "v", "pv",
      direction = "backward", toleranceUs = Some(50L))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    assert(b === Seq(
      (100L, Some(9L), Some(90L)),   // 10 back, inside tolerance
      (200L, Some(20L), Some(200L)), // exact hit
      (310L, Some(30L), Some(300L)), // 10 back
      (50L, None, None)))
    // same join WITHOUT tolerance: 310 would match 300; with tol 5 it voids
    val b5 = AsOf.asofJoinDirected(left.filter($"ts" === 310L), right,
      "k", "ts", "v", "pv", "backward", Some(5L)).collect()(0)
    assert(b5.isNullAt(2) && b5.isNullAt(3))
  }

  test("asofJoinNearest: closest either side, ties to earlier," +
    " tolerance symmetric") {
    import spark.implicits._
    val right = Seq(("a", 100L, 1L), ("a", 200L, 2L), ("b", 500L, 5L))
      .toDF("k", "ts", "v")
    val left = Seq(
      ("a", 130L),  // 30 back vs 70 fwd → back (v=1)
      ("a", 180L),  // 80 back vs 20 fwd → fwd (v=2)
      ("a", 150L),  // exact tie → earlier (v=1)
      ("a", 200L),  // exact hit (dist 0, backward) → v=2
      ("a", 50L),   // nothing behind → fwd (v=1)
      ("a", 999L),  // nothing ahead → back (v=2)
      ("c", 10L))   // key with no captures → NULL
      .toDF("k", "ts")
    val got = AsOf.asofJoinNearest(left, right, "k", "ts", "v", "nv")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(
      ("a", 130L, Some(1L)), ("a", 180L, Some(2L)),
      ("a", 150L, Some(1L)), ("a", 200L, Some(2L)),
      ("a", 50L, Some(1L)), ("a", 999L, Some(2L)),
      ("c", 10L, None)))
    // tolerance voids BOTH directions past the bound
    val t = AsOf.asofJoinNearest(
      Seq(("a", 130L), ("a", 260L)).toDF("k", "ts"), right,
      "k", "ts", "v", "nv", Some(40L))
      .collect().map(r => (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(t === Set((130L, Some(1L)), (260L, None)))
  }
}
