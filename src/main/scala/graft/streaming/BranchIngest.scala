package graft.streaming

import graft.sources.WarehouseSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous write-audit-publish with HISTORY: a stream folds its
  * micro-batches into a warehouse BRANCH ([[WarehouseSink.appendToBranch]])
  * that main readers never see; an audit job reads the branch
  * (`option("ref", name)`) whenever it likes, and a
  * [[WarehouseSink.fastForward]] publishes every accumulated epoch
  * atomically — the multi-commit generalization of the single-stage WAP
  * flow (42v), with each staged epoch individually time-travelable.
  *
  * Delivery contract: EXACTLY-ONCE into the branch. Each fold carries
  * its foreachBatch epoch id, and the branch head's manifest carries the
  * last folded epoch as its cursor — a checkpoint-restart redelivering
  * the last micro-batch is a detected no-op (the identical contract the
  * main table's STREAMING_WRITE epoch guard gives, applied to the
  * parked-slot chain). Single-writer per branch, like every maintenance
  * verb. */
object BranchIngest {

  /** The foreachBatch body, exposed for direct composition. */
  def foldBatch(dir: String, branch: String)(batch: DataFrame,
                                             epochId: Long): Unit =
    WarehouseSink.appendToBranch(batch.sparkSession, dir, branch, batch,
      epoch = Some(epochId))

  /** Start the continuous branch fold. The branch must exist
    * ([[WarehouseSink.createBranch]]); promote with
    * [[WarehouseSink.fastForward]] once the audit passes. */
  def start(stream: DataFrame, dir: String, branch: String,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        foldBatch(dir, branch)(batch, epochId)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
