package graft.streaming

import graft.SparkSpec

/** End-to-end continuous pipeline: file source → bloom-dedup ingest →
  * store → watermarked weekly chart → parquet sink, with kill/restart
  * between arrivals and an at-least-once replay — asserting the store and
  * the sink both come out exactly-once. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    "doc_id LONG, text STRING, entity LONG, ts TIMESTAMP, value DOUBLE"

  test("stateless corpus-prep operators run UNCHANGED under readStream") {
    // chunkTokens is a narrow generate — the same code drives a streaming
    // micro-batch with no watermark/state machinery, and its output equals
    // the batch run on the same data (the batch-streaming unification the
    // declarative formulation buys).
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk_stream").toString
    val src = s"$dir/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/d.json"),
      (1 to 20).map(i =>
        s"""{"doc_id":$i,"text":"${(1 to i * 7).map(t => s"w$t").mkString(" ")}"}""")
        .mkString("\n").getBytes("UTF-8"))
    val streamed = graft.operators.Corpus.chunkTokens(
      spark.readStream.schema("doc_id LONG, text STRING").json(src),
      "doc_id", "text", chunkSize = 16, stride = 12)
    val q = streamed.writeStream.format("memory")
      .queryName("graft_chunks_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_chunks_stream")
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect().toSet
    val batch = graft.operators.Corpus.chunkTokens(
      spark.read.schema("doc_id LONG, text STRING").json(src),
      "doc_id", "text", chunkSize = 16, stride = 12)
      .select("doc_id", "chunk_idx", "chunk_text")
      .as[(Long, Long, String)].collect().toSet
    assert(got === batch && got.nonEmpty)
  }

  test("extract→gate→load: the paged feed lands exactly-once with quarantine evidence") {
    import graft.operators.Expectations._
    import graft.sources.PagedEndpoint
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_extract").toString
    val pages = s"$root/pages"
    // Producer feed: 3 pages × 20 rows; score = id, so InRange(score ≥ 10)
    // quarantines exactly ids 0..9.
    def writeFeed(n: Int): Unit = {
      PagedEndpoint.writeFixture(
        spark.range(0, n).select(
          to_json(struct(col("id"), col("id").cast("double").as("score")))
            .as("value"),
          (col("id") / 20).cast("int").as("page")),
        pages)
      ()
    }
    writeFeed(60)
    val rules = Seq(InRange("score", 10.0, 1e9))
    def run(): Unit = {
      val (pub, quar) = Pipeline.startExtractLoad(spark, pages,
        "id LONG, score DOUBLE", rules,
        s"$root/table", s"$root/quarantine", s"$root/ckpt", slices = 2)
      try { pub.processAllAvailable(); quar.processAllAvailable() }
      finally { pub.stop(); quar.stop() }
    }
    def published(): Seq[Long] =
      spark.read.format("graft.sources.WarehouseSink")
        .option("path", s"$root/table").load()
        .select("id").as[Long].collect().sorted.toSeq
    run()
    assert(published() === (10L until 60L))
    val quar1 = spark.read.parquet(s"$root/quarantine")
      .select("id", "violated").as[(Long, String)].collect().toMap
    assert(quar1.keySet === (0L until 10L).toSet)
    assert(quar1.values.toSet === Set("in_range:score"))
    // Producer appends pages 3..4; the restarted composition must resume
    // from both cursors (no page re-fetched, no epoch re-published) and
    // land exactly the new clean rows.
    writeFeed(100)
    run()
    assert(published() === (10L until 100L)) // no duplicates, all new rows
    assert(spark.read.parquet(s"$root/quarantine").count() === 10L)
  }

  test("e2e pipeline is exactly-once across kill/restart and source replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    val src = s"$dir/src"; val store = s"$dir/store"; val sink = s"$dir/sink"
    val ckptI = s"$dir/ckpt_ingest"; val ckptC = s"$dir/ckpt_chart"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def addFile(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$name"),
        lines.mkString("\n").getBytes("UTF-8"))
    def docs() = spark.readStream.schema(schema).json(src)
    val storeSchema = s"$schema, fp STRING"
    def runIngest(ckpt: String): Unit = {
      val q = Pipeline.startIngest(docs(), "doc_id", "text", store, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    def runChart(): Unit = {
      val q = Pipeline.startChart(spark, store, storeSchema,
        "ts", "entity", "value", sink, ckptC)
      try q.processAllAvailable() finally q.stop()
    }
    def storeIds() = spark.read.parquet(store)
      .select("doc_id").as[Long].collect().toSet
    def sinkRows() = spark.read.parquet(sink)
      .select("wk", "entity", "n", "sum_v", "avg_v")
      .as[(String, Long, Long, Double, Double)].collect().toSeq

    // Phase 1: two entities in the week of Mon 2024-01-01, plus an
    // intra-batch near-dup (same normalized text, higher value) that must
    // NOT count toward the chart.
    addFile("b1.json",
      """{"doc_id":1,"text":"alpha doc","entity":1,"ts":"2024-01-02T00:00:00.000Z","value":10.0}""",
      """{"doc_id":2,"text":"ALPHA  DOC","entity":1,"ts":"2024-01-03T00:00:00.000Z","value":99.0}""",
      """{"doc_id":3,"text":"beta doc","entity":2,"ts":"2024-01-04T00:00:00.000Z","value":7.0}""")
    runIngest(ckptI)
    runChart() // killed after this batch; no window is past the watermark yet
    assert(storeIds() === Set(1L, 3L))
    assert(sinkRows().isEmpty)

    // Phase 2 arrives while BOTH queries are down: a re-delivery of doc 1's
    // content under a new id (must be dropped against the store), a fresh
    // doc in the next week, and a far-future sentinel that advances the
    // watermark past both January windows.
    addFile("b2.json",
      """{"doc_id":4,"text":"alpha doc","entity":1,"ts":"2024-01-02T06:00:00.000Z","value":50.0}""",
      """{"doc_id":5,"text":"gamma doc","entity":1,"ts":"2024-01-09T00:00:00.000Z","value":3.0}""",
      """{"doc_id":6,"text":"sentinel far future","entity":9,"ts":"2024-06-01T00:00:00.000Z","value":1.0}""")
    runIngest(ckptI) // restart from checkpoint
    runChart()       // restart from checkpoint
    assert(storeIds() === Set(1L, 3L, 5L, 6L))
    val expected = Set(
      ("2024-01-01", 1L, 1L, 10.0, 10.0), // dup's 99.0 correctly excluded
      ("2024-01-01", 2L, 1L, 7.0, 7.0),
      ("2024-01-08", 1L, 1L, 3.0, 3.0))
    val rows = sinkRows()
    assert(rows.toSet === expected, "finalized windows, each exactly once")
    assert(rows.size === expected.size, "no duplicate window emissions")

    // At-least-once replay: a FRESH ingest checkpoint re-reads every source
    // file; the store dedup must drop all re-delivered rows (self-healing
    // idempotence), and a chart restart must not re-emit committed windows.
    runIngest(s"$dir/ckpt_ingest2")
    runChart()
    assert(storeIds() === Set(1L, 3L, 5L, 6L))
    assert(sinkRows().toSet === expected)
    assert(sinkRows().size === expected.size)
  }
}
