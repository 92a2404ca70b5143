package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: a 100 TB pipeline's operators see empty
  * partitions, empty sources, and single-row groups constantly — none may
  * throw, and shapes must stay stable. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val noEvents = Seq.empty[(Long, Long, Long)]
    .toDF("user_id", "ts_us", "event_id")
  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("sessionize/rollingAvg/rangeJoin on empty input → empty, same schema") {
    val s = Sessions.sessionize(noEvents, "user_id", "ts_us", "event_id", 1000L)
    assert(s.count() === 0)
    assert(s.columns.toSeq ===
      Seq("user_id", "session_idx", "n_events", "start_us", "end_us", "duration_us"))
    val r = Sessions.rollingAvg(
      noEvents.withColumn("value", lit(0.0)), "user_id", "ts_us", "event_id",
      "value", 1000L)
    assert(r.count() === 0)
    assert(Sessions.rangeJoinPairCounts(noEvents, "user_id", "ts_us",
      "event_id", 1000L).count() === 0)
  }

  test("dedup family on empty corpus → empty pair sets") {
    assert(Dedup.exact(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 0.1).count() === 0)
    assert(Dedup.minhashPairs(noDocs, "doc_id", "text", 3, 4, 2, 0.1).count() === 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text", 3, 16).count() === 0)
  }

  test("connected components on empty edges → empty labels") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Components.connected(noPairs, "id1", "id2").count() === 0)
  }

  test("analytics on empty and single-row inputs") {
    val noSales = Seq.empty[(String, String, Double)].toDF("d1", "d2", "v")
    // Spark emits NO rows for rollup over empty input (not even the
    // grand-total grouping set) — document it so a change gets noticed.
    assert(Analytics.rollup2(noSales, "d1", "d2", "v").count() === 0)
    assert(Analytics.topTerms(noDocs, "text", 5).count() === 0)
    assert(Analytics.repetitionProfile(noDocs, "doc_id", "text").count() === 0)
    val one = Seq(("g", 5)).toDF("grp", "m")
    val q = Analytics.quartiles(one, "grp", "m").collect()(0)
    assert(q.getAs[Double]("p25") === 5.0 && q.getAs[Double]("p75") === 5.0)
  }

  test("docs with empty/whitespace text flow through text metrics") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val rep = Analytics.repetitionProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rep.length === 3)
    assert(rep(0).getAs[Long]("n_tokens") === 0L)
    assert(rep(0).getAs[Double]("top_share") === 0.0)
    assert(rep(2).getAs[Long]("n_tokens") === 1L)
    assert(Dedup.pairShingleStats(docs, "doc_id", "text", 3).count() === 0)
  }
}
