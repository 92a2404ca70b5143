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
}
