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
  * Delivery contract: both sinks are plain parquet appends, so a
  * checkpoint-restart replaying the last micro-batch appends its rows
  * AGAIN — at-least-once, the documented contract for foreachBatch with
  * non-transactional sinks. Routing through
  * [[graft.sources.WarehouseSink]]'s epoch-guarded manifests upgrades
  * either side to exactly-once where that matters. */
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
}
