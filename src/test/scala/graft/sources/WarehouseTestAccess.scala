package graft.sources

import org.apache.spark.sql.types.StructType

/** Test-only bridge into the sink's private commit internals, for specs
  * outside this package (the quality-gate replay case) that need to force
  * an already-folded epoch commit — the crash window a clean restart
  * can't reproduce on demand. */
object WarehouseTestAccess {
  /** (epoch cursor, manifest version) of the live generation. */
  def manifestCursor(dir: String): (Long, Long) = {
    val m = WarehouseSink.readManifest(dir).get
    (m.epoch, m.version)
  }
  /** Re-commit `epoch` with no data — must be a detected no-op when the
    * manifest has already folded it. */
  def replayEpoch(dir: String, schema: StructType, epoch: Long): Unit =
    new WarehouseStreamingWrite(dir, schema, "test-replay")
      .commit(epoch, Array.empty)
}
