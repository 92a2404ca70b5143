package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup ingest appends only never-seen documents") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val store = s"$dir/store"
    val stream = MemoryStream[(Long, String)]
    val q = IncrementalIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", store, s"$dir/ckpt")
    try {
      // batch 1: one unique doc + an intra-batch duplicate
      stream.addData((1L, "first document text"), (2L, "FIRST  document text"))
      q.processAllAvailable()
      // batch 2: a known doc (same content as 1) + a new one
      stream.addData((3L, "first document text"), (4L, "second document text"))
      q.processAllAvailable()
      // batch 3: everything already known
      stream.addData((5L, "second DOCUMENT text".toLowerCase))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))

    // The fp side table the per-batch anti-join builds against: bucketed
    // on fp (the BucketingSpec layout, now IN the pipeline) and in sync
    // with the store.
    val tbl = IncrementalIngest.fpTableFor(store)
    val desc = spark.sql(s"DESCRIBE EXTENDED $tbl").collect().mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("fp"), desc)
    assert(spark.table(tbl).select("fp").as[String].collect().sorted.toSeq ===
      spark.read.parquet(store).select("fp").as[String].collect().sorted.toSeq)

    // Per-batch anti-join plan shape: with broadcast off (the 100 TB
    // regime — a corpus fp table never broadcasts), the join the ingest
    // runs against the side table has exactly ONE Exchange: the
    // maybe-dup sliver hashing into the store's buckets. The store side
    // reads its buckets with no shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sliver = Seq("aaa", "bbb").toDF("fp")
      val plan = sliver.join(spark.table(tbl), Seq("fp"), "left_anti")
        .queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 1, s"expected one shuffle (sliver side only):\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("ingest surfaces per-batch metrics: observed input rows + kept-rows hook") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics").toString
    val stream = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = IncrementalIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/store", s"$dir/ckpt",
      onBatch = (id, n) => kept.synchronized { kept += ((id, n)) })
    try {
      stream.addData((1L, "first doc"), (2L, "FIRST  DOC")) // 2 in, 1 kept
      q.processAllAvailable()
      stream.addData((3L, "first doc"))                     // 1 in, 0 kept
      q.processAllAvailable()
      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("graft_ingest")))
        .map(_.getAs[Long]("in_rows"))
      assert(observed.contains(2L) && observed.contains(1L),
        s"observed per-trigger input rows: $observed")
      assert(kept.toList.map(_._2) === List(1L, 0L))
    } finally q.stop()
  }

  test("file-source ingest resumes from checkpoint across query restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val src = s"$dir/src"; val store = s"$dir/store"; val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def addFile(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$name"),
        lines.mkString("\n").getBytes("UTF-8"))
    def docs() = spark.readStream
      .schema("doc_id LONG, text STRING").json(src)

    addFile("b1.json", """{"doc_id":1,"text":"alpha doc"}""")
    val q1 = IncrementalIngest.start(docs(), "doc_id", "text", store, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // New files arrive while no query is running; the restarted query must
    // pick up from the checkpointed offset and dedup against the store.
    addFile("b2.json",
      """{"doc_id":2,"text":"ALPHA  doc"}""", // near-dup of 1 (normalized)
      """{"doc_id":3,"text":"beta doc"}""")
    val q2 = IncrementalIngest.start(docs(), "doc_id", "text", store, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val kept = spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }
}
