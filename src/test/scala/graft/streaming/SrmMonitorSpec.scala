package graft.streaming

import graft.SparkSpec
import graft.operators.Experiment
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous SRM monitor: the streamed per-day cumulative chi-square
  * must equal q283's batch srmCheck run on each day prefix. */
class SrmMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("exposureStream + srmOf equals srmCheck on every day prefix") {
    implicit val sqlCtx = spark.sqlContext
    // 40 users exposed across 3 days; md5 arms are a pure user function
    val rows = (1L to 40L).map { u =>
      val day = 1 + (u % 3L) // days 1..3
      ("exposure", u, ts(f"2024-01-0$day%d 09:00:00"))
    } ++ Seq(
      ("exposure", 7L, ts("2024-01-03 10:00:00")), // repeat user: not new
      ("click", 999L, ts("2024-01-02 10:00:00"))) // wrong type: invisible
    val stream = MemoryStream[(String, Long, java.sql.Timestamp)]
    val fs = SrmMonitor.exposureStream(
      stream.toDF().toDF("event_type", "user_id", "ts_t"),
      "user_id", "ts_t", "event_type", "exposure",
      watermark = "0 seconds")
    val q = fs.writeStream.format("memory").queryName("srm_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(rows: _*); q.processAllAvailable()
      stream.addData(("exposure", 1000001L, ts("2024-03-01 00:00:00")))
      q.processAllAvailable()
      stream.addData(("exposure", 1000002L, ts("2024-03-02 00:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("srm_sink")
      .filter(col("dayMs") < ts("2024-02-01 00:00:00").getTime)
    val got = SrmMonitor.srmOf(sink, designMilliA = 500L)
      .orderBy("d")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    // every prefix row equals the batch srmCheck on that prefix
    got.foreach { case (d, n, na, chi2, srm) =>
      val prefix = rows.filter(r => r._3.getTime <=
        ts(s"$d 23:59:59").getTime).toDF("event_type", "user_id", "ts_t")
      val b = Experiment.srmCheck(prefix, "user_id", "event_type",
        exposureType = "exposure", designMilliA = 500L).collect()(0)
      assert(n === b.getAs[Long]("n_exposed"), s"day $d n")
      assert(na === b.getAs[Long]("n_a"), s"day $d n_a")
      assert(chi2 === b.getAs[Long]("chi2_milli"), s"day $d chi2")
      assert(srm === b.getAs[Long]("srm"), s"day $d srm")
    }
    // a planted all-A stream alarms: shift every user into arm A by
    // testing the fold directly with a skewed first-seen table
    val skew = (1L to 200L).map(u => ("A", ts("2024-01-01 00:00:00").getTime, u))
      .toDF("grp", "dayMs", "key")
    val alarm = SrmMonitor.srmOf(skew, 500L).collect()(0)
    assert(alarm.getAs[Long]("srm") === 1L)
  }
}
