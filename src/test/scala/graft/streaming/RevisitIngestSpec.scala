package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RevisitIngestSpec extends SparkSpec {
  import spark.implicits._

  test("revisit economics match the q427 batch window across a restart;" +
    " store is exactly-once under replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_revisit").toString
    val store = s"$dir/store"
    var bills = List.empty[RevisitIngest.Bill]
    def run(data: Seq[(String, Long, String)], ck: String): Unit = {
      val s = MemoryStream[(String, Long, String)]
      val q = RevisitIngest.start(s.toDF().toDF("url", "ts", "body"),
        "url", "ts", "body", store, ck,
        onBatch = (_, b) => bills = b :: bills)
      try { s.addData(data: _*); q.processAllAvailable() } finally q.stop()
    }
    // batch 1: A first (unique), A revisit (same digest), B + C firsts
    run(Seq(("A", 1L, "x"), ("A", 2L, "x"), ("B", 1L, "bb"),
      ("C", 1L, "ccc")), s"$dir/ck1")
    // RESTART with the side table dropped — must rebuild from the store
    spark.sql(s"DROP TABLE IF EXISTS ${RevisitIngest.urlTableFor(store)}")
    // batch 2: A changed (stored), A revisit-of-FIRST-digest (x == d0,
    // even though the latest stored A is y), B changed
    run(Seq(("A", 3L, "y"), ("A", 4L, "x"), ("B", 2L, "cc")), s"$dir/ck2")

    val got = bills.foldLeft((0L, 0L, 0L, 0L, 0L)) { (a, b) =>
      (a._1 + b.nCaptures, a._2 + b.nUnique, a._3 + b.nRevisits,
        a._4 + b.nChanged, a._5 + b.bytesSaved)
    }
    // the q427 batch twin over the SAME capture set
    val caps = Seq(("A", 1L, "x"), ("A", 2L, "x"), ("B", 1L, "bb"),
      ("C", 1L, "ccc"), ("A", 3L, "y"), ("A", 4L, "x"), ("B", 2L, "cc"))
      .toDF("url", "ts", "body")
    val w = Window.partitionBy("url").orderBy(col("ts").asc)
    val cls = caps.withColumn("dig", md5(col("body")))
      .withColumn("rn", row_number().over(w))
      .withColumn("d0", first(col("dig")).over(w))
      .withColumn("rev", col("rn") > 1 && col("dig") === col("d0"))
    val want = cls.agg(count(lit(1)),
        sum(when(col("rn") === 1, 1L).otherwise(0L)),
        sum(col("rev").cast("long")),
        sum(when(col("rn") > 1 && !col("rev"), 1L).otherwise(0L)),
        sum(when(col("rev"), octet_length(col("body")).cast("long"))
          .otherwise(0L)))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === want, s"stream bill $got != batch twin $want")
    assert(want === ((7L, 3L, 2L, 2L, 2L))) // hand-computed anchor

    // store contents == the batch twin's kept rows (uniques + changed)
    val kept = spark.read.parquet(store)
      .select("url", "ts").as[(String, Long)].collect().toSet
    assert(kept === Set(("A", 1L), ("A", 3L), ("B", 1L), ("B", 2L),
      ("C", 1L)))
    // digest column rides the store (the restart rebuild reads it)
    assert(spark.read.parquet(store).columns.contains("digest"))

    // replay of a kept capture and of a revisit: store unchanged
    // (counters re-bill by contract — at-least-once; store exactly-once)
    run(Seq(("A", 3L, "y"), ("A", 2L, "x")), s"$dir/ck3")
    assert(spark.read.parquet(store).count() === 5L)
    val replayBill = bills.head
    assert(replayBill.nUnique === 0L)
    assert(replayBill.nCaptures === 2L)
  }
}
