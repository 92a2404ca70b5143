package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class RepeatGuardSpec extends SparkSpec {
  import spark.implicits._

  test("emits exactly once per (key, item) at the crossing batch-end count") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = RepeatGuard.alerts(stream.toDF().toDF("user", "action"),
      "user", "action", threshold = 3L)
      .writeStream.format("memory").queryName("rg")
      .outputMode("append").start()
    try {
      // u1 buys x twice, y once — nothing crosses
      stream.addData(("u1", "x"), ("u1", "x"), ("u1", "y"))
      q.processAllAvailable()
      assert(spark.table("rg").count() === 0L)
      // third x crosses in a batch that ALSO holds a fourth: the emitted
      // count is the batch-end 4, and later batches never re-emit
      stream.addData(("u1", "x"), ("u1", "x"))
      q.processAllAvailable()
      stream.addData(("u1", "x"))
      q.processAllAvailable()
      val got = spark.table("rg").as[RepeatGuard.Repeat].collect()
      assert(got.toSeq === Seq(RepeatGuard.Repeat("u1", "x", 4L)))
      // per-item independence: y still below, a different user's x
      // tracks separately
      stream.addData(("u2", "x"), ("u2", "x"), ("u2", "x"), ("u1", "y"))
      q.processAllAvailable()
      val all = spark.table("rg").as[RepeatGuard.Repeat].collect().toSet
      assert(all === Set(RepeatGuard.Repeat("u1", "x", 4L),
        RepeatGuard.Repeat("u2", "x", 3L)))
    } finally q.stop()
  }

  test("works identically as a batch fold (one sorted group per key)") {
    val df = Seq(("a", "p"), ("a", "p"), ("a", "q"), ("b", "p"))
      .toDF("user", "action")
    val got = RepeatGuard.alerts(df, "user", "action", threshold = 2L)
      .collect().toSet
    assert(got === Set(RepeatGuard.Repeat("a", "p", 2L)))
  }

  test("declarative TTL evicts dormant maps: the item re-counts from zero") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val q = RepeatGuard.alerts(stream.toDF().toDF("user", "action"),
      "user", "action", threshold = 2L,
      ttl = Some(java.time.Duration.ofSeconds(2)))
      .writeStream.format("memory").queryName("rg_ttl")
      .outputMode("append").start()
    def rows() = spark.table("rg_ttl").as[RepeatGuard.Repeat].collect().toSeq
    def await(n: Int): Unit = {
      val deadline = System.nanoTime() + 90L * 1000000000L
      while (rows().length < n && System.nanoTime() < deadline)
        Thread.sleep(200L)
      assert(rows().length === n)
    }
    try {
      stream.addData(("u", "x"), ("u", "x"))
      await(1) // crossed at 2
      // dormancy past the TTL: the counts evict; one new x is BELOW the
      // threshold again (a live map would be at 3 and not re-emit;
      // re-emission only happens after ANOTHER x re-crosses)
      Thread.sleep(3000L)
      stream.addData(("u", "x")); Thread.sleep(500L)
      stream.addData(("u", "x"))
      await(2) // re-crossed from a fresh count — eviction proven
      assert(rows().map(_.count).sorted === Seq(2L, 2L))
    } finally q.stop()
  }
}
