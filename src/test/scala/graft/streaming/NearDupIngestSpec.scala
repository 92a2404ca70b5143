package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class NearDupIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming near-dup ingest rejects store near-dups and replays") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_ingest").toString
    val store = s"$dir/store"
    val stream = MemoryStream[(Long, String)]
    val q = NearDupIngest.start(stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", store, s"$dir/ckpt")
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    try {
      // batch 1: two distinct docs — both admitted
      stream.addData((1L, base),
        (2L, "a completely different report about warehouse compaction cycles"))
      q.processAllAvailable()
      // batch 2: near-copy of stored 1 (dropped), brand-new doc (kept),
      // byte-identical replay of 2 (dropped: signature agreement = 1.0)
      stream.addData((3L, base + " again"),
        (4L, "fresh unrelated text mentioning glaciers volcanoes and tides"),
        (2L, "a completely different report about warehouse compaction cycles"))
      q.processAllAvailable()
      // batch 3: replay of the batch-2 survivor — dropped
      stream.addData((4L, "fresh unrelated text mentioning glaciers volcanoes and tides"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 4L))

    // Side tables: bucketed on their probe keys and in sync with the store
    // (one band row per (doc, band); one signature row per doc).
    val bandDesc = spark.sql(
      s"DESCRIBE EXTENDED ${NearDupIngest.bandTableFor(store)}")
      .collect().mkString("\n")
    assert(bandDesc.contains("Num Buckets"), bandDesc)
    assert(spark.table(NearDupIngest.sigTableFor(store)).count() === 3L)
    assert(spark.table(NearDupIngest.bandTableFor(store)).count() === 3L * 8)
  }

  test("near-dup ingest restart rebuilds side tables from the store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_restart").toString
    val store = s"$dir/store"
    val s1 = MemoryStream[(Long, String)]
    val q1 = NearDupIngest.start(s1.toDF().toDF("doc_id", "text"),
      "doc_id", "text", store, s"$dir/ckpt1")
    try {
      s1.addData((1L, "the shared corpus sentence that will be nearly copied later on"))
      q1.processAllAvailable()
    } finally q1.stop()
    // Drop the side tables: a fresh process must reconcile them from the
    // store before its first probe (the catalog-forgot restart path).
    spark.sql(s"DROP TABLE IF EXISTS ${NearDupIngest.bandTableFor(store)}")
    spark.sql(s"DROP TABLE IF EXISTS ${NearDupIngest.sigTableFor(store)}")
    val s2 = MemoryStream[(Long, String)]
    val q2 = NearDupIngest.start(s2.toDF().toDF("doc_id", "text"),
      "doc_id", "text", store, s"$dir/ckpt2")
    try {
      s2.addData(
        (9L, "the shared corpus sentence that will be nearly copied later today"),
        (10L, "an admissible new document with its own unshared wording entirely"))
      q2.processAllAvailable()
    } finally q2.stop()
    val kept = spark.read.parquet(store).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 10L), s"store after restart: $kept")
  }
}
