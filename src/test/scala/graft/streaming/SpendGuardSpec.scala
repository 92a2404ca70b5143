package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SpendGuardSpec extends SparkSpec {
  import spark.implicits._

  // transformWithState requires the RocksDB provider (GraftSession's
  // default; the shared test session opts in per spec). With a TTL
  // configured, TimeMode.ProcessingTime schedules state-maintenance
  // micro-batches CONTINUOUSLY (that is how TTL advances), so neither
  // processAllAvailable nor Trigger.AvailableNow ever quiesces — the
  // spec drives an always-on query and POLLS the sink for the expected
  // set instead (each assertion has a positive signal to wait for).
  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def readSink(name: String): Set[(Long, Long, Long)] =
    spark.table(name).as[(Long, Long, Long)].collect().toSet

  private def awaitSink(name: String,
                        expected: Set[(Long, Long, Long)]): Unit = {
    val deadline = System.nanoTime() + 90L * 1000000000L
    var cur = readSink(name)
    while (cur != expected && System.nanoTime() < deadline) {
      Thread.sleep(250L)
      cur = readSink(name)
    }
    assert(cur === expected)
  }

  test("spend guard emits exactly one crossing per user, at batch-end totals") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Double)]
      val q = SpendGuard.crossings(stream.toDF().toDF("user_id", "value"),
        "user_id", "value", thresholdCents = 5000L)
        .writeStream.format("memory").queryName("guard")
        .outputMode(OutputMode.Append()).start()
      try {
        // batch 1: u1 under threshold; u2 crosses immediately
        stream.addData((1L, 30.0), (2L, 60.0))
        awaitSink("guard", Set((2L, 6000L, 1L)))
        // batch 2: u1 crosses mid-batch (25 then 10 — the reported
        // total is the BATCH-END sum, order-independent)
        stream.addData((1L, 25.0), (1L, 10.0))
        awaitSink("guard", Set((2L, 6000L, 1L), (1L, 6500L, 3L)))
        // batch 3: both already above — no re-emission; the canary
        // user's crossing proves the batch was processed before the
        // no-new-rows assertion reads the sink.
        stream.addData((1L, 5.0), (2L, 5.0), (99L, 80.0))
        awaitSink("guard", Set((2L, 6000L, 1L), (1L, 6500L, 3L),
          (99L, 8000L, 1L)))
      } finally q.stop()
    }
  }

  test("spend guard state survives a checkpoint restart without re-emitting") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files
        .createTempDirectory("graft_guard_rs").toString
      val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
      // The memory sink cannot recover from a checkpoint — restarts go
      // through a foreachBatch parquet append (the production shape).
      def start(stream: MemoryStream[(Long, Double)]) =
        SpendGuard.crossings(stream.toDF().toDF("user_id", "value"),
          "user_id", "value", thresholdCents = 5000L)
          .writeStream
          .foreachBatch {
            (df: org.apache.spark.sql.Dataset[SpendGuard.Crossing],
             _: Long) =>
              if (!df.isEmpty) df.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
      def readOut(): Seq[(Long, Long, Long)] =
        try spark.read.parquet(out)
          .as[(Long, Long, Long)].collect().toSeq.sorted
        catch { case _: org.apache.spark.sql.AnalysisException => Nil }
      // Wait until the data batch is fully COMMITTED: a later completed
      // progress entry with zero input rows can only exist after the
      // data batch's offset commit (batches are sequential, and the
      // TTL maintenance batches keep arriving).
      def awaitCommitted(q: org.apache.spark.sql.streaming.StreamingQuery,
                         rows: Long): Unit = {
        val deadline = System.nanoTime() + 90L * 1000000000L
        def settled: Boolean = {
          val ps = q.recentProgress
          ps.map(_.numInputRows).sum >= rows &&
            ps.lastOption.exists(_.numInputRows == 0)
        }
        while (!settled && System.nanoTime() < deadline) Thread.sleep(250L)
        assert(settled, "data batch never committed")
      }
      val s1 = MemoryStream[(Long, Double)]
      val q1 = start(s1)
      try {
        s1.addData((7L, 60.0))
        awaitCommitted(q1, 1L)
      } finally q1.stop()
      assert(readOut() === Seq((7L, 6000L, 1L)))
      // New query, same checkpoint: the committed offset (1 batch)
      // skips the first addData, so the SECOND batch is the real
      // post-restart work. u7 folds into RESTORED state (already over
      // threshold → silent); u8 is fresh and must emit — proving the
      // batch ran AND the state survived (a wiped store would re-emit
      // u7 at 6000, failing the exact-multiset compare).
      val s2 = MemoryStream[(Long, Double)]
      s2.addData((7L, 60.0)) // offset filler: sits below the commit
      s2.addData((7L, 60.0), (8L, 70.0))
      val q2 = start(s2)
      try awaitCommitted(q2, 2L) finally q2.stop()
      assert(readOut() === Seq((7L, 6000L, 1L), (8L, 7000L, 1L)))
    }
  }
}
