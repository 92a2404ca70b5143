package graft.streaming

import graft.SparkSpec
import graft.operators.Vocab
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous token-budget admission: per-source cumulative caps hold
  * across micro-batches, within-batch order is docId, and the codegen'd
  * BPE counter plugs into the projection. */
class BudgetCapSpec extends SparkSpec {
  import spark.implicits._

  test("cumulative budget holds across batches; overflow docs are labeled") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val out = BudgetCap.admit(
      stream.toDF().toDF("source", "doc_id", "n_tokens"),
      "source", "doc_id", "n_tokens", budget = 100L)
    val q = out.writeStream.format("memory").queryName("budget_s")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a admits 40+50; the 30-doc would cross 100 and rejects,
      // but a LATER smaller doc still fits (10 → exactly 100)
      stream.addData(("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 30L),
        ("a", 4L, 10L), ("b", 1L, 99L))
      q.processAllAvailable()
      // batch 2: a is full (rejects even 1); b admits exactly to 100
      stream.addData(("a", 5L, 1L), ("b", 2L, 1L), ("b", 3L, 5L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("budget_s")
      .select("source", "docId", "nTokens", "cumTokens", "admitted")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      ("a", 1L, 40L, 40L, true),
      ("a", 2L, 50L, 90L, true),
      ("a", 3L, 30L, 90L, false),
      ("a", 4L, 10L, 100L, true),
      ("a", 5L, 1L, 100L, false),
      ("b", 1L, 99L, 99L, true),
      ("b", 2L, 1L, 100L, true),
      ("b", 3L, 5L, 100L, false)))
    // invariant: every admitted prefix stays within budget
    assert(got.filter(_._5).forall(_._4 <= 100L))
  }

  test("the codegen'd BPE counter feeds the gate in one projection") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, String)]
    val docs = stream.toDF().toDF("source", "doc_id", "text")
      .select(col("source"), col("doc_id"),
        Vocab.bpeTokenCount(col("text"), Vocab.DisjointMerges).as("n_tok"))
    val out = BudgetCap.admit(docs, "source", "doc_id", "n_tok", budget = 10L)
    val q = out.writeStream.format("memory").queryName("budget_bpe")
      .outputMode(OutputMode.Append()).start()
    try {
      // "the" → [th, e] = 2 tokens; "thethe" → 4; "answer" → 5 ("an")
      stream.addData(("s", 1L, "the"), ("s", 2L, "thethe"),
        ("s", 3L, "answer"), ("s", 4L, "the"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("budget_bpe")
      .select("docId", "nTokens", "admitted")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // 2 + 4 admit (6), 5 would cross 10 → reject, 2 admits (8)
    assert(got === Seq((1L, 2L, true), (2L, 4L, true),
      (3L, 5L, false), (4L, 2L, true)))
  }
}
