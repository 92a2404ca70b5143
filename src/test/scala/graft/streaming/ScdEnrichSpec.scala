package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class ScdEnrichSpec extends SparkSpec {
  import spark.implicits._

  // key 1: attr "a" on [0, 100), "b" on [100, ∞); key 2 never appears
  private def dim = Seq(
    (1L, "a", 0L, Option(100L)),
    (1L, "b", 100L, Option.empty[Long]))
    .toDF("key", "attr", "valid_from", "valid_to")

  test("each event picks the attributes valid AT ITS TIME, keeps no-match") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Long)]
    val out = ScdEnrich.pointInTime(
      events.toDF().toDF("key", "ts_us"), dim,
      "key", "ts_us", "valid_from", "valid_to", Seq("attr"))
    val q = out.writeStream.format("memory").queryName("scd_enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      events.addData((1L, 50L), (1L, 150L))
      q.processAllAvailable()
      events.addData((1L, 99L), (1L, 100L), (2L, 10L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("scd_enrich")
      .select(col("key"), col("ts_us"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got === Set(
      (1L, 50L, "a"), (1L, 99L, "a"),     // inside [0, 100)
      (1L, 100L, "b"), (1L, 150L, "b"),   // boundary is inclusive-from
      (2L, 10L, null)))                   // unknown key survives with NULL
  }

  test("streamed enrichment equals the batch point-in-time join") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, 10L), (1L, 99L), (1L, 100L), (1L, 500L), (2L, 7L))
    val events = MemoryStream[(Long, Long)]
    val out = ScdEnrich.pointInTime(
      events.toDF().toDF("key", "ts_us"), dim,
      "key", "ts_us", "valid_from", "valid_to", Seq("attr"))
    val q = out.writeStream.format("memory").queryName("scd_par")
      .outputMode(OutputMode.Append()).start()
    try { events.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"), col("ts_us"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    val batch = ScdEnrich.pointInTime(rows.toDF("key", "ts_us"), dim,
      "key", "ts_us", "valid_from", "valid_to", Seq("attr"))
    assert(canon(spark.table("scd_par")) === canon(batch))
  }
}
