package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val Fmt = "graft.sources.WarehouseSink"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_jv_").toString

  test("multi-batch view equals the one-shot recompute over final stores") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val aStore = tmp(); val bStore = tmp(); val viewDir = tmp(); val ck = tmp()
    val sa = MemoryStream[(Long, String)]
    val sb = MemoryStream[(Long, Long)]
    val q = JoinView.start(
      sa.toDF().toDF("k", "aval"), sb.toDF().toDF("k", "bval"),
      "k", aStore, bStore, viewDir, ck, buckets = 4)
    try {
      sa.addData((1L, "a1"), (2L, "a2")); q.processAllAvailable()
      sb.addData((1L, 10L), (3L, 30L)); q.processAllAvailable()
      sa.addData((3L, "a3")); sb.addData((2L, 20L), (1L, 11L))
      q.processAllAvailable()
      sa.addData((1L, "a1bis")); q.processAllAvailable()
    } finally q.stop()
    val aAll = spark.read.format(Fmt).option("path", aStore).load()
      .drop("graft_bucket")
    val bAll = spark.read.format(Fmt).option("path", bStore).load()
      .drop("graft_bucket")
    // parity vs the q187-style one-shot recompute: full join over the
    // final stores
    val want = aAll.join(bAll, "k")
      .select("k", "aval", "bval").as[(Long, String, Long)]
      .collect().sorted.toSeq
    val got = JoinView.view(spark, viewDir)
      .select("k", "aval", "bval").as[(Long, String, Long)]
      .collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // stores hold exactly what was streamed (no replay duplicates)
    assert(aAll.count() === 4L && bAll.count() === 4L)
  }

  test("replayed epoch is a no-op on every table (exactly-once guard)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val aStore = tmp(); val bStore = tmp(); val viewDir = tmp(); val ck = tmp()
    val sa = MemoryStream[(Long, String)]
    val sb = MemoryStream[(Long, Long)]
    val q = JoinView.start(
      sa.toDF().toDF("k", "aval"), sb.toDF().toDF("k", "bval"),
      "k", aStore, bStore, viewDir, ck, buckets = 4)
    try {
      sa.addData((1L, "x")); sb.addData((1L, 7L)); q.processAllAvailable()
    } finally q.stop()
    def snap(dir: String) =
      (graft.sources.WarehouseTestAccess.manifestCursor(dir)._1,
        spark.read.format(Fmt).option("path", dir).load().count())
    val before = Seq(aStore, bStore, viewDir).map(snap)
    val cursor = graft.sources.WarehouseTestAccess.manifestCursor(viewDir)._1
    assert(cursor >= 0)
    // simulate a checkpoint restart redelivering the folded batch: an
    // epoch-guarded append with the same batch id must change nothing
    Seq((1L, "x")).toDF("k", "aval")
      .withColumn("graft_bucket", pmod(xxhash64(col("k")), lit(4)))
      .write.format(Fmt).option("path", aStore)
      .option("partitionBy", "graft_bucket")
      .option("streamEpoch", cursor.toString).mode("append").save()
    Seq((1L, "x", 7L)).toDF("k", "aval", "bval")
      .withColumn("graft_bucket", pmod(xxhash64(col("k")), lit(4)))
      .write.format(Fmt).option("path", viewDir)
      .option("partitionBy", "graft_bucket")
      .option("streamEpoch", cursor.toString).mode("append").save()
    assert(Seq(aStore, bStore, viewDir).map(snap) === before,
      "epoch-guarded replay must be a detected no-op")
    // and a LATER epoch still lands
    Seq((9L, "y")).toDF("k", "aval")
      .withColumn("graft_bucket", pmod(xxhash64(col("k")), lit(4)))
      .write.format(Fmt).option("path", aStore)
      .option("partitionBy", "graft_bucket")
      .option("streamEpoch", (cursor + 1).toString).mode("append").save()
    assert(snap(aStore)._2 === before.head._2 + 1)
    assert(snap(aStore)._1 === cursor + 1)
  }

  test("restart from checkpoint continues the view without duplicates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val aStore = tmp(); val bStore = tmp(); val viewDir = tmp(); val ck = tmp()
    def run(blocksA: Seq[Seq[(Long, String)]],
            blocksB: Seq[Seq[(Long, Long)]]): Unit = {
      val sa = MemoryStream[(Long, String)]
      val sb = MemoryStream[(Long, Long)]
      // MemoryStream offsets restart from zero in a fresh instance, so
      // re-add the full history AT THE ORIGINAL BLOCK GRANULARITY — the
      // checkpointed offsets then mark exactly the already-processed
      // prefix as consumed (the WarehouseSinkSpec resume pattern).
      val q = JoinView.start(
        sa.toDF().toDF("k", "aval"), sb.toDF().toDF("k", "bval"),
        "k", aStore, bStore, viewDir, ck, buckets = 4)
      try {
        blocksA.foreach(bl => sa.addData(bl: _*))
        blocksB.foreach(bl => sb.addData(bl: _*))
        q.processAllAvailable()
      } finally q.stop()
    }
    run(Seq(Seq((1L, "a1"))), Seq(Seq((1L, 10L))))
    val afterFirst = JoinView.view(spark, viewDir).count()
    assert(afterFirst === 1L)
    run(Seq(Seq((1L, "a1")), Seq((2L, "a2"))),
      Seq(Seq((1L, 10L)), Seq((2L, 20L))))
    val got = JoinView.view(spark, viewDir)
      .select("k", "aval", "bval").as[(Long, String, Long)]
      .collect().sorted.toSeq
    assert(got === Seq((1L, "a1", 10L), (2L, "a2", 20L)),
      s"restart must not duplicate or drop view rows: $got")
  }

  test("delta join shuffles only the batch side (one-side SPJ shuffle)") {
    val store = tmp()
    (0L until 64L).map(i => (i, s"v$i")).toDF("k", "aval")
      .withColumn("graft_bucket", pmod(xxhash64(col("k")), lit(4)))
      .write.format(Fmt).option("path", store)
      .option("partitionBy", "graft_bucket").mode("overwrite").save()
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val storeSide = spark.read.format(Fmt).option("path", store).load()
      val delta = JoinView.bucketed(
        (0L until 8L).map(i => (i, i * 100L)).toDF("k", "bval"), "k", 4)
      val joined = delta.join(storeSide, Seq("graft_bucket", "k"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly ONE Exchange: the delta re-clustering into the store's
      // KeyGroupedPartitioning; the store scan itself is Exchange-free
      assert("Exchange".r.findAllIn(plan).size === 1,
        s"want one (delta-side) Exchange:\n$plan")
      assert(joined.count() === 8L)
    }
  }
}
