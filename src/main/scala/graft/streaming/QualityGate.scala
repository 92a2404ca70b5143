package graft.streaming

import graft.operators.Expectations
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous data-quality gate — the streaming twin of the batch
  * expectation suite ([[graft.operators.Expectations]]): every
  * micro-batch is split by the same row-local rules, clean rows land in
  * the publish path, violating rows (labeled with what they violated) in
  * the quarantine/dead-letter path. The production pattern that keeps a
  * poisoned producer from contaminating a 100 TB store while preserving
  * the evidence.
  *
  * Because [[Expectations.violations]] is MAP-ONLY, the gate adds no
  * shuffle and no state — per-trigger cost is exactly one pass over the
  * batch (cached once so the two sinks don't recompute the source).
  *
  * Delivery contract: [[start]]'s sinks are plain parquet appends, so a
  * checkpoint-restart replaying the last micro-batch appends its rows
  * AGAIN — at-least-once, the documented contract for foreachBatch with
  * non-transactional sinks. [[startExactlyOnce]] routes the PUBLISH leg
  * through [[graft.sources.WarehouseSink]]'s epoch-guarded streaming
  * write instead: a replayed epoch is detected against the manifest's
  * epoch cursor and skipped, so the published table never double-counts a
  * redelivered batch. The quarantine leg stays at-least-once by design —
  * it is evidence, where a duplicate is noise, not corruption. */
object QualityGate {

  /** Start the gate: `stream` rows pass to `cleanDir` or, labeled, to
    * `quarantineDir`. Rules must be row-local (see
    * [[Expectations.violations]]). */
  def start(stream: DataFrame, rules: Seq[Expectations.Rule],
            cleanDir: String, quarantineDir: String,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val v = Expectations.violations(batch, rules).persist()
        try {
          v.filter(col("violated") === "").drop("violated")
            .write.mode("append").parquet(cleanDir)
          v.filter(col("violated") =!= "")
            .write.mode("append").parquet(quarantineDir)
        } finally v.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** The exactly-once gate: clean rows publish through the warehouse
    * sink's STREAMING_WRITE (staged commit + epoch cursor — a restart
    * redelivering the last micro-batch is a detected no-op), quarantine
    * rows append as parquet evidence. Two queries over the same source,
    * each with its own checkpoint under `checkpointRoot`; the rule
    * evaluation is MAP-ONLY ([[Expectations.violations]]), so running it
    * once per leg costs two narrow passes and still no shuffle or state.
    * Read the published table back with
    * `spark.read.format("graft.sources.WarehouseSink").option("path",
    * cleanDir)`. */
  def startExactlyOnce(stream: DataFrame, rules: Seq[Expectations.Rule],
                       cleanDir: String, quarantineDir: String,
                       checkpointRoot: String): (StreamingQuery, StreamingQuery) = {
    val v = Expectations.violations(stream, rules)
    val clean = v.filter(col("violated") === "").drop("violated")
      .writeStream.format("graft.sources.WarehouseSink")
      .option("path", cleanDir)
      .option("checkpointLocation", s"$checkpointRoot/clean")
      .outputMode("append")
      .start()
    val quarantine = v.filter(col("violated") =!= "")
      .writeStream
      .option("checkpointLocation", s"$checkpointRoot/quarantine")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(quarantineDir)
        ()
      }
      .start()
    (clean, quarantine)
  }
}
