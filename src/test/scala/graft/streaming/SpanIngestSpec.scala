package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SpanIngestSpec extends SparkSpec {
  import spark.implicits._

  test("span-gated ingest admits fresh docs, rejects span copies, drops exact replays") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_span_in").toString
    val store = s"$dir/store"
    val stream = MemoryStream[(Long, String)]
    val decisions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = SpanIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", k = 4, maxDupPpm = 500000L, store, s"$dir/ckpt",
      onBatch = (b, a, r) => decisions.synchronized { decisions += ((b, a, r)) })
    try {
      // batch 1: two fresh docs + an intra-batch exact duplicate of doc 1
      stream.addData(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "one two three four five six seven eight nine ten"),
        (3L, "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      // batch 2: a span copy of doc 2 (8 of 9 tokens covered → 888888 ppm,
      // over the 500000 gate), one fresh doc, one exact replay of doc 1
      stream.addData(
        (4L, "one two three four five six seven eight extra"),
        (5L, "totally novel words nobody wrote before anywhere here"),
        (6L, "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 5L))
    assert(decisions.toList === List((0L, 2L, 0L), (1L, 1L, 1L)))

    // The gram side table: bucketed on g, holding EXACTLY the admitted
    // corpus's distinct k-gram hashes plus one admission mark per doc —
    // growth is new hashes only, so no key can appear twice.
    val tbl = SpanIngest.gramTableFor(store)
    val desc = spark.sql(s"DESCRIBE EXTENDED $tbl").collect().mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("g"), desc)
    val total = spark.table(tbl).count()
    assert(spark.table(tbl).select("g").distinct().count() === total)
    val stored = spark.read.parquet(store)
    val expected = graft.operators.Dedup
      .gramStore(stored, "doc_id", "text", k = 4).count() + kept.size
    assert(total === expected)
  }

  test("file-source span ingest resumes from checkpoint and rebuilds the gram store") {
    val dir = java.nio.file.Files.createTempDirectory("graft_span_rs").toString
    val src = s"$dir/src"; val store = s"$dir/store"; val ckpt = s"$dir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    def addFile(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$name"),
        lines.mkString("\n").getBytes("UTF-8"))
    def docs() = spark.readStream
      .schema("doc_id LONG, text STRING").json(src)

    addFile("b1.json",
      """{"doc_id":1,"text":"the quick brown fox jumps over the lazy dog"}""")
    val q1 = SpanIngest.start(docs(), "doc_id", "text", k = 4,
      maxDupPpm = 500000L, store, ckpt)
    try q1.processAllAvailable() finally q1.stop()

    // New files land while no query runs; the restarted query rebuilds
    // the side table + bloom FROM the store, picks up at the checkpointed
    // offset, drops the exact replay, and span-rejects the 8/9 copy.
    addFile("b2.json",
      """{"doc_id":2,"text":"the quick brown fox jumps over the lazy dog"}""",
      """{"doc_id":3,"text":"the quick brown fox jumps over the lazy cat"}""",
      """{"doc_id":4,"text":"completely different words in every single position"}""")
    val q2 = SpanIngest.start(docs(), "doc_id", "text", k = 4,
      maxDupPpm = 500000L, store, ckpt)
    try q2.processAllAvailable() finally q2.stop()

    val kept = spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
    // exactly-once on the side table across the restart: every hash once
    val tbl = SpanIngest.gramTableFor(store)
    assert(spark.table(tbl).select("g").distinct().count() ===
      spark.table(tbl).count())
    val expected = graft.operators.Dedup
      .gramStore(spark.read.parquet(store), "doc_id", "text", k = 4)
      .count() + kept.size
    assert(spark.table(tbl).count() === expected)
  }
}
