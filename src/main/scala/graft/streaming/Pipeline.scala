package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** The composed continuous pipeline — the reference DAG's extract →
  * transform → load cadence (dag.py:534-646) as two chained Structured
  * Streaming stages connected by the document store:
  *
  * {{{
  *   file source ─▶ bloom-dedup ingest ─▶ store (parquet, append)
  *   store ─▶ watermarked weekly chart agg ─▶ file sink (exactly-once)
  * }}}
  *
  * Stage 1 is [[IncrementalIngest.start]]: per-batch dedup against the
  * accumulated store through a once-per-start bloom filter; the append is
  * idempotent under replay (re-delivered rows carry already-stored
  * fingerprints and are dropped), so the store is exact even when the
  * source is at-least-once.
  *
  * Stage 2 tails the store as a file-source stream and maintains the
  * weekly chart rollup ([[EventCharts.weeklyAggStream]]); the parquet file
  * sink's metadata log makes its output exactly-once across kill/restart —
  * a restarted query resumes from the checkpointed offset and never
  * rewrites a committed window.
  *
  * Scale posture: both stages are incremental — per-trigger work tracks
  * new files, watermarks bound the agg state, and the store-wide scans
  * (bloom build, restart catch-up) happen once per process lifetime.
  */
object Pipeline {

  /** Stage 0: the EXTRACT leg — the paged external endpoint streamed by
    * its page cursor ([[graft.sources.PagedSource]]) straight into the
    * exactly-once quality gate ([[QualityGate.startExactlyOnce]]). Every
    * trigger fetches only not-yet-committed pages, splits them by the
    * expectation rules, commits clean rows to the warehouse table through
    * the epoch-guarded streaming write, and appends violations as
    * quarantine evidence.
    *
    * This is the reference DAG's full extract → validate → load cadence
    * (dag.py:170-365 fetch loop + its per-field checks + the table load)
    * as ONE continuous composition: the scheduler-driven fetch loop
    * becomes the checkpointed page cursor, the validation becomes the
    * map-only rule split, the warehouse load becomes the manifest commit
    * — and kill/restart is safe end to end (the cursor resumes past
    * consumed pages; a replayed publish epoch is a detected no-op).
    *
    * Returns (publish query, quarantine query) — each owns a checkpoint
    * under `checkpointRoot` and its own page cursor over the same feed. */
  def startExtractLoad(spark: SparkSession, pagesDir: String,
                       schemaDdl: String,
                       rules: Seq[graft.operators.Expectations.Rule],
                       tableDir: String, quarantineDir: String,
                       checkpointRoot: String,
                       slices: Int = 8): (StreamingQuery, StreamingQuery) = {
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dir", pagesDir).option("slices", slices.toString)
      .option("schema", schemaDdl).load()
    QualityGate.startExactlyOnce(stream, rules, tableDir, quarantineDir,
      checkpointRoot)
  }

  /** Stage 1: continuous dedup ingest (see [[IncrementalIngest.start]]). */
  def startIngest(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, storePath: String,
                  checkpoint: String): StreamingQuery =
    IncrementalIngest.start(docs, idCol, textCol, storePath, checkpoint)

  /** Stage 2: tail the store and maintain the weekly chart in an
    * exactly-once sink. `storeSchema` is the store's DDL (file-source
    * streams need the schema declared; inferring it would race stage 1's
    * first append). `sinkFormat` picks the landing zone: "parquet" (file
    * sink, exactly-once via its metadata log) or
    * "graft.sources.WarehouseSink" (the DSv2 external-warehouse sink,
    * exactly-once via epoch-recorded manifest commits). */
  def startChart(spark: SparkSession, storePath: String, storeSchema: String,
                 tsCol: String, groupCol: String, valueCol: String,
                 sinkPath: String, checkpoint: String,
                 watermark: String = "14 days",
                 sinkFormat: String = "parquet"): StreamingQuery =
    EventCharts.weeklyAggStream(
      spark.readStream.schema(storeSchema).parquet(storePath),
      tsCol, groupCol, valueCol, watermark)
      .writeStream
      .format(sinkFormat)
      .option("path", sinkPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
