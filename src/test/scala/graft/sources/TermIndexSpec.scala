package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Term-bloom sidecar: full-text file skipping with the BloomIndex
  * guarantees — candidate pruning on term-local layouts, zero false
  * negatives ever, exact token semantics on the re-read. */
class TermIndexSpec extends SparkSpec {
  import spark.implicits._

  test("rare-term search prunes to the owning files; no false negatives") {
    val base = Files.createTempDirectory("graft_tix").toString
    val store = s"$base/store"; val side = s"$base/side"
    // 8 files with term locality: file k holds docs about topic k only.
    val docs = (0 until 8).flatMap { k =>
      (0 until 20).map(i => (k * 100L + i, s"common words topic$k filler"))
    }
    docs.toDF("doc_id", "text")
      .repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(store)
    TermIndex.build(spark, store, side, "text", expectedPerFile = 1000L)
    // a topic term lives in exactly one file; fpp 1% over 8 files allows
    // the odd extra candidate but never more than a couple
    val cands = TermIndex.candidateFiles(spark, side, "topic3")
    assert(cands.nonEmpty && cands.size <= 2, s"${cands.size} candidates")
    val got = TermIndex.search(spark, store, side, "text", "topic3")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === (300L until 320L)) // every owning doc found — no FNs
    // a corpus-wide term hits everything and still returns exact rows
    assert(TermIndex.search(spark, store, side, "text", "common")
      .count() === 160L)
    // an absent term returns the empty frame with the store's schema
    val none = TermIndex.search(spark, store, side, "text", "absent0")
    assert(none.count() === 0L)
    assert(none.columns.toSeq === Seq("doc_id", "text"))
  }

  test("token semantics: substring hits of longer tokens do not count") {
    val base = Files.createTempDirectory("graft_tix2").toString
    val store = s"$base/store"; val side = s"$base/side"
    Seq((1L, "the vectorized reader"), (2L, "a plain vector here"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(store)
    TermIndex.build(spark, store, side, "text")
    val got = TermIndex.search(spark, store, side, "text", "vector")
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(2L)) // 'vectorized' is a different token
    // malformed probe terms refuse loudly
    intercept[IllegalArgumentException] {
      TermIndex.search(spark, store, side, "text", "Not A Token!")
    }
  }
}
