package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels every node with its component's min id") {
    // Components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id1", "id2")
    val out = Components.connected(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (diameter-bound iteration)") {
    val n = 24
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id1", "id2")
    val out = Components.connected(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSet === Set(1L))
    assert(out.size === n)
  }

  test("edge direction and duplicates don't matter") {
    val pairs = Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 3L)).toDF("id1", "id2")
    val out = Components.connected(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(3L -> 3L, 5L -> 3L, 7L -> 3L))
  }

  test("driver union-find path equals the distributed loop exactly") {
    // chains, stars, singleton pairs, merged clusters — forced down BOTH
    // paths via the edge budget and compared row-for-row
    val pairs = ((1 until 30).map(i => (i.toLong, (i + 1).toLong)) ++
      Seq((100L, 101L), (100L, 102L), (100L, 103L), (102L, 103L),
        (200L, 201L), (50L, 100L)))
      .toDF("id1", "id2")
    val fast = Components.connected(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    val dist = Components.connected(pairs, "id1", "id2",
      driverEdgeBudget = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === dist)
    assert(fast(103L) === 50L && fast(30L) === 1L && fast(201L) === 200L)
  }

  test("driver union-find path handles string ids (the q369 entity shape)") {
    val pairs = Seq(("acme corp", "acme corps"), ("acme corps", "acme inc"),
      ("zeta a", "zeta b")).toDF("id1", "id2")
    val out = Components.connected(pairs, "id1", "id2")
      .as[(String, String)].collect().toMap
    assert(out === Map("acme corp" -> "acme corp",
      "acme corps" -> "acme corp", "acme inc" -> "acme corp",
      "zeta a" -> "zeta a", "zeta b" -> "zeta a"))
  }

  // 3-cycle → 2-cycle → chain: SCCs {a,b,c}, {d,e}, {f}, {g}; the
  // DIRECTION matters — undirected components would see ONE blob.
  private val sccEdges = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "d"), ("d", "e"), ("e", "d"),
    ("e", "f"), ("f", "g"))

  test("stronglyConnected: cycles split from the DAG around them" +
    " (driver Tarjan path)") {
    import spark.implicits._
    val got = Components.stronglyConnected(
        sccEdges.toDF("s", "t"), "s", "t")
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "f", "g" -> "g"))
    // sanity: undirected components WOULD merge everything
    val und = Components.connected(sccEdges.toDF("s", "t"), "s", "t")
      .as[(String, String)].collect().toMap
    assert(und.values.toSet === Set("a"))
  }

  test("stronglyConnected: distributed coloring path peels the DAG" +
    " and matches Tarjan") {
    import spark.implicits._
    val df = sccEdges.toDF("s", "t")
    val tarjan = Components.stronglyConnected(df, "s", "t")
      .as[(String, String)].collect().toSet
    val dist = Components.stronglyConnected(df, "s", "t",
        driverEdgeBudget = 0L)
      .as[(String, String)].collect().toSet
    assert(dist === tarjan)
  }
}
