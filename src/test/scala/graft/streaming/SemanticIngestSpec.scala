package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SemanticIngestSpec extends SparkSpec {
  import spark.implicits._

  // Unit-ish vectors in distinct sign cells; cos(a, aNear) ≈ 0.995.
  private val a = Array(1.0f, 0.2f, 0.1f, 0.0f)
  private val aNear = Array(0.9f, 0.25f, 0.1f, 0.01f)
  private val b = Array(-1.0f, 0.5f, -0.2f, 0.3f)
  private val c = Array(0.1f, -0.9f, 0.4f, -0.5f)

  test("streaming semantic ingest rejects store near-dups and replays") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_ingest").toString
    val store = s"$dir/store"
    val zeros = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stream = MemoryStream[(Long, Array[Float])]
    val q = SemanticIngest.start(stream.toDF().toDF("vec_id", "vec"),
      "vec_id", "vec", store, s"$dir/ckpt", signBits = 4, minCos = 0.9,
      onZero = z => zeros ++= z.select("vec_id").as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect())
    try {
      // batch 1: two distinct directions — both admitted
      stream.addData((1L, a), (2L, b))
      q.processAllAvailable()
      // batch 2: near-copy of stored 1 (dropped), new direction (kept),
      // byte-identical replay of 2 (dropped: cos = 1.0), zero vector
      // (routed out, not ingested)
      stream.addData((3L, aNear), (4L, c), (2L, b),
        (5L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      q.processAllAvailable()
      // batch 3: replay of the batch-2 survivor — dropped
      stream.addData((4L, c))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(store).select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 4L))
    assert(zeros.toSet === Set(5L))

    // Side table: bucketed on the cell key and in sync with the store.
    val desc = spark.sql(
      s"DESCRIBE EXTENDED ${SemanticIngest.cellTableFor(store)}")
      .collect().mkString("\n")
    assert(desc.contains("Num Buckets"), desc)
    assert(spark.table(SemanticIngest.cellTableFor(store)).count() === 3L)
  }

  test("semantic ingest restart rebuilds the cell table from the store") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sem_restart").toString
    val store = s"$dir/store"
    val s1 = MemoryStream[(Long, Array[Float])]
    val q1 = SemanticIngest.start(s1.toDF().toDF("vec_id", "vec"),
      "vec_id", "vec", store, s"$dir/ckpt1", signBits = 4, minCos = 0.9)
    try { s1.addData((1L, a)); q1.processAllAvailable() } finally q1.stop()
    // Drop the side table: a fresh process must reconcile it from the
    // store before its first probe (the catalog-forgot restart path).
    spark.sql(s"DROP TABLE IF EXISTS ${SemanticIngest.cellTableFor(store)}")
    val s2 = MemoryStream[(Long, Array[Float])]
    val q2 = SemanticIngest.start(s2.toDF().toDF("vec_id", "vec"),
      "vec_id", "vec", store, s"$dir/ckpt2", signBits = 4, minCos = 0.9)
    try {
      s2.addData((9L, aNear), (10L, c))
      q2.processAllAvailable()
    } finally q2.stop()
    val kept = spark.read.parquet(store).select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 10L), s"store after restart: $kept")
  }
}
