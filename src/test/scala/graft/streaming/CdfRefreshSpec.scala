package graft.streaming

import graft.SparkSpec
import graft.sources.WarehouseSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThan, LessThan}

class CdfRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_cdfr_").toString

  test("maintained aggregate tracks the table through DML, exactly-once") {
    val table = tmp(); val store = tmp(); val ck = tmp()
    WarehouseSink.enableChangeFeed(table)
    (1L to 8L).map(i => (i, s"k${i % 2}", i * 10L)).toDF("id", "k", "v")
      .write.format(Fmt).option("path", table).mode("append").save() // v0
    val q = CdfRefresh.aggregate(spark, table, Seq("k"), col("v"),
      store, ck)
    def truth() = spark.read.format(Fmt).option("path", table).load()
      .groupBy("k").agg(count(lit(1)).as("n_rows"),
        sum("v").as("sum_measure"))
      .as[(String, Long, Long)].collect().sorted.toSeq
    def got() = CdfRefresh.view(spark, store)
      .as[(String, Long, Long)].collect().sorted.toSeq
    try {
      q.processAllAvailable()
      assert(got() === truth(), "snapshot fold")
      WarehouseSink.deleteWhere(spark, table, Seq(GreaterThan("id", 6L)))
      q.processAllAvailable()
      assert(got() === truth(), "after delete")
      WarehouseSink.updateWhere(spark, table, Seq(LessThan("id", 3L)),
        Map("v" -> lit(999L)))
      q.processAllAvailable()
      assert(got() === truth(), "after update")
      WarehouseSink.merge(spark, table,
        Seq((5L, "k1", 70L), (40L, "k0", 40L)).toDF("id", "k", "v"),
        Seq("id"))
      q.processAllAvailable()
      assert(got() === truth(), "after merge")
      // a whole group retracting to zero drops from the store
      WarehouseSink.deleteWhere(spark, table,
        Seq(org.apache.spark.sql.sources.EqualTo("k", "k0")))
      q.processAllAvailable()
      assert(got() === truth(), "after group-emptying delete")
      assert(!got().exists(_._1 == "k0"))
    } finally q.stop()
    // exactly-once: a replayed epoch against the store is a no-op
    val cursor = graft.sources.WarehouseTestAccess.manifestCursor(store)._1
    val before = got()
    Seq(("kX", 1L, 1L)).toDF("k", "n_rows", "sum_measure")
      .write.format(Fmt).option("path", store)
      .option("streamEpoch", cursor.toString).mode("overwrite").save()
    assert(got() === before, "replayed epoch must not rewrite the store")
  }

  test("restart from checkpoint continues the fold without double-counting") {
    val table = tmp(); val store = tmp(); val ck = tmp()
    WarehouseSink.enableChangeFeed(table)
    (1L to 4L).map(i => (i, "a", i)).toDF("id", "k", "v")
      .write.format(Fmt).option("path", table).mode("append").save()
    def run(): Unit = {
      val q = CdfRefresh.aggregate(spark, table, Seq("k"), col("v"),
        store, ck)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(CdfRefresh.view(spark, store)
      .as[(String, Long, Long)].collect().toSeq === Seq(("a", 4L, 10L)))
    // new appends between runs fold exactly once on restart
    Seq((9L, "a", 100L)).toDF("id", "k", "v")
      .write.format(Fmt).option("path", table).mode("append").save()
    run()
    assert(CdfRefresh.view(spark, store)
      .as[(String, Long, Long)].collect().toSeq === Seq(("a", 5L, 110L)))
    // idle restart: nothing new, nothing double-counted
    run()
    assert(CdfRefresh.view(spark, store)
      .as[(String, Long, Long)].collect().toSeq === Seq(("a", 5L, 110L)))
  }
}
