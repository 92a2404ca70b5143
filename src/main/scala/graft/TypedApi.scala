package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed façade over the event-analytics pipeline — `Dataset[T]` with
  * case-class encoders where compile-time schema safety pays (pipeline
  * handoffs between teams), delegating to the same DataFrame plans (the
  * typed wrapper costs nothing at runtime: `.as[T]` is a plan annotation,
  * not a conversion, and every transform below stays in the declarative
  * Column world — no typed-lambda deserialization in the hot path).
  */
object TypedApi {

  /** An event row as stored (ts = epoch nanoseconds). */
  final case class Event(event_id: Long, ts: Long, user_id: Long,
                         event_type: String, value: Double, props: String)

  final case class Session(user_id: Long, session_idx: Long, n_events: Long,
                           start_us: Long, end_us: Long, duration_us: Long)

  final case class UserPairCount(user_id: Long, n_pairs: Long)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Event]
  }

  def sessions(ev: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import ev.sparkSession.implicits._
    operators.Sessions.sessionize(
      ev.toDF().withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_id", gapUs)
      .as[Session]
  }

  def nearbyPairs(ev: Dataset[Event], windowUs: Long): Dataset[UserPairCount] = {
    import ev.sparkSession.implicits._
    operators.Sessions.rangeJoinPairCounts(
      ev.toDF().withColumn("ts_us", expr("ts div 1000")),
      "user_id", "ts_us", "event_id", windowUs)
      .as[UserPairCount]
  }

  // --- corpus-prep handoffs (documents table) ---

  final case class Doc(doc_id: Long, text: String, source: String)
  final case class Chunk(doc_id: Long, chunk_idx: Long, chunk_tokens: Long,
                         chunk_text: String)
  final case class PackedDoc(shard: String, doc_id: Long, n_tokens: Long,
                             tok_offset: Long, seq_id: Long)

  def docs(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text", "source").as[Doc]
  }

  def chunks(d: Dataset[Doc], chunkSize: Int, stride: Int): Dataset[Chunk] = {
    import d.sparkSession.implicits._
    operators.Corpus.chunkTokens(d.toDF(), "doc_id", "text", chunkSize, stride)
      .as[Chunk]
  }

  def packed(d: Dataset[Doc], capacity: Long): Dataset[PackedDoc] = {
    import d.sparkSession.implicits._
    operators.Corpus.packSequences(d.toDF(), "doc_id", "text", "source", capacity)
      .as[PackedDoc]
  }
}
