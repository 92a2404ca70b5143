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
}
