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
  }
}
