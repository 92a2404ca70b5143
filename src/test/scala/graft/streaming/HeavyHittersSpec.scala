package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("windowed MG summary keeps per-window heavy terms with the bound") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = HeavyHitters.windowed(
      src.toDF().toDF("sec", "term")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      "ts", "term", windowDur = "1 minute", watermark = "0 seconds", k = 3)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      // window 0: "hot" x30 of 50 tokens (> 50/4); window 1: "cold" corpus
      // with a different heavy term
      val w0 = (1 to 30).map(_ => (10L, "hot")) ++
        (1 to 20).map(i => (20L, s"f$i"))
      val w1 = (1 to 10).map(_ => (70L, "next")) ++
        (1 to 5).map(i => (80L, s"g$i"))
      src.addData(w0 ++ w1: _*)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("hh")
      .select(date_format(col("window_start"), "mm").as("w"), col("terms"))
      .as[(String, Seq[(String, Long)])].collect()
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    // per-window MG guarantees: the heavy term is present, ≤ k entries,
    // estimate within [true - N/(k+1), true]
    val hot = rows("00").toMap
    assert(rows("00").size <= 3 && hot.contains("hot"))
    assert(hot("hot") <= 30L && hot("hot") >= 30L - 50L / 4L)
    val next = rows("01").toMap
    assert(next.contains("next") && next("next") <= 10L)
    // windows never bleed into each other
    assert(!next.contains("hot"))
  }
}
