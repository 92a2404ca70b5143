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

  test("typed corpus handoffs: docs → chunks and docs → packed sequences") {
    val d = Seq(
      Doc(1L, (1 to 100).map(i => s"w$i").mkString(" "), "A"),
      Doc(2L, (1 to 10).map(i => s"v$i").mkString(" "), "A")).toDS()
    val cs = chunks(d, chunkSize = 64, stride = 48).collect()
    assert(cs.count(_.doc_id == 1L) === 3) // starts 1, 49, 97
    assert(cs.filter(_.doc_id == 2L).map(_.chunk_tokens).toSeq === Seq(10L))
    val ps = packed(d, capacity = 64L).collect().sortBy(_.doc_id)
    assert(ps.map(_.tok_offset).toSeq === Seq(0L, 100L))
    assert(ps.map(_.seq_id).toSeq === Seq(0L, 1L))
  }
}
