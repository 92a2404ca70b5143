package graft

class TypedApiSpec extends SparkSpec {
  import spark.implicits._
  import TypedApi._

  test("typed pipeline: events → sessions round-trips through case classes") {
    val M = 60L * 1000000
    val ev = Seq(
      Event(1L, 0L, 7L, "click", 1.0, "{}"),
      Event(2L, 10 * M * 1000, 7L, "view", 2.0, "{}"), // ts is NANOS
      Event(3L, 90 * M * 1000, 7L, "click", 3.0, "{}")
    ).toDS()
    val sess = sessions(ev, gapUs = 30 * M).collect().sortBy(_.session_idx)
    assert(sess.map(_.n_events).toSeq === Seq(2L, 1L))
    assert(sess.head.duration_us === 10 * M)
    val pairs = nearbyPairs(ev, windowUs = 15 * M).collect()
    assert(pairs.toSeq === Seq(UserPairCount(7L, 1L)))
  }

  test("typed loader keeps the stored schema") {
    val ds = TypedApi.events(spark, "/root/testdata/sf0.001")
    val first = ds.head()
    assert(first.ts > 0L)
    assert(ds.count() > 0)
  }
}
