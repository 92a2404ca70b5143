package graft.streaming

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Batch parity for the streaming forward-tolerance as-of (q399's
  * continuous twin): verdicts through [[AsofStream.forwardAsofStream]]
  * must equal [[AsOf.asofJoinDirected]] (direction=forward, tolerance)
  * on a replayed source, plus the late-arrival regression. */
class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val TolMs = 1000L

  // (key, tsMs, id) lefts; (key, tsMs, value) rights — exercises: match
  // at equal ts, earliest-of-several, tie-on-ts → max value, no right
  // in window (gap), right before left only (never matches forward)
  private val lefts = Seq(
    (1L, 1000L, 101L), (1L, 2500L, 102L), (1L, 9000L, 103L),
    (2L, 1000L, 201L), (3L, 1000L, 301L))
  private val rights = Seq(
    (1L, 1000L, 7L),              // equal-ts match for 101
    (1L, 1400L, 8L),              // later than 1000 — 101 takes 1000
    (1L, 2600L, 9L), (1L, 2600L, 11L), (1L, 3000L, 10L), // 102: ts tie → 11
    (2L, 500L, 5L),               // before the left: forward never looks back
    (2L, 1800L, 6L))              // within tol of 201
    // key 3 has no rights at all

  private def runStream(extraLate: Boolean): Map[Long, (Option[Long], Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = AsofStream.forwardAsofStream(
      ls.toDF().toDF("k", "t", "id"), rs.toDF().toDF("k", "t", "v"),
      "k", "t", "id", "v", toleranceMs = TolMs, watermark = "2 seconds")
    val q = out.writeStream.format("memory").queryName("asof_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: everything except the 9000ms left and the 1800ms
      // right — max event time 3000ms, so the watermark lands at
      // 1000ms and every verdict is still open
      ls.addData(lefts.filter(_._2 != 9000L)
        .map { case (k, t, i) => (k, ts(t), i) }: _*)
      rs.addData(rights.filter(_._2 != 1800L)
        .map { case (k, t, v) => (k, ts(t), v) }: _*)
      q.processAllAvailable()
      if (extraLate) {
        // the 1800ms right arrives a batch later, above the 1000ms
        // watermark (inside the allowance) — it must win 201's verdict
        rs.addData((2L, ts(1800L), 6L)); q.processAllAvailable()
      }
      ls.addData((1L, ts(9000L), 103L)); q.processAllAvailable()
      // sentinel batches advance the watermark past every verdict
      // boundary, then let the timers fire
      rs.addData((99L, ts(60000L), 0L)); q.processAllAvailable()
      rs.addData((99L, ts(120000L), 0L)); q.processAllAvailable()
    } finally q.stop()
    spark.table("asof_sink").filter(col("key") =!= 99L)
      .collect().map { r =>
        r.getLong(1) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))
      }.toMap
  }

  test("stream verdicts equal the batch forward-tolerance as-of") {
    val got = runStream(extraLate = true)
    val batch = AsOf.asofJoinDirected(
      lefts.toDF("k", "t", "id"), rights.toDF("k", "t", "v"),
      "k", "t", "v", "m", direction = "forward",
      toleranceUs = Some(TolMs)) // same unit as the ms fixture
      .collect().map(r => r.getLong(2) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    // batch columns: k, t, id, m, m_ts → (id → (m_ts, m))
    assert(got.keySet == lefts.map(_._3).toSet, s"got $got")
    got.foreach { case (id, (mts, mv)) =>
      assert(batch(id) == (mts, mv), s"left $id: stream $mts/$mv vs " +
        s"batch ${batch(id)}")
    }
    // spot-check the planted semantics
    assert(got(101L) == (Some(1000L), Some(7L)))  // equal ts matches
    assert(got(102L) == (Some(2600L), Some(11L))) // ts tie → max value
    assert(got(103L) == (None, None))             // nothing within tol
    assert(got(201L) == (Some(1800L), Some(6L)))  // late arrival counted
    assert(got(301L) == (None, None))             // no rights at all
  }

  test("each left decides exactly once, even across replayed batches") {
    val got = runStream(extraLate = false)
    assert(got.size == lefts.size)
    // without the late 1800ms right, 201 sees no in-window right
    assert(got(201L) == (None, None))
    val sink = spark.table("asof_sink").filter(col("key") =!= 99L)
    assert(sink.groupBy("leftId").count()
      .filter(col("count") > 1).count() === 0L)
  }
}
