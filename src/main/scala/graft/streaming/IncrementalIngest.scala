package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

/** Continuous deduplicating ingest — the reference's append-to-store load
  * cadence (dag.py:534-646, Mongo/BigQuery WRITE_APPEND) made streaming.
  *
  * Each micro-batch is deduplicated within itself and against the
  * accumulated store via the bloom-prefiltered path
  * ([[Dedup.incrementalRowsBloom]]): the filter is built once per query
  * (re)start, then kept current by merging each batch's survivor
  * fingerprints. The anti-join's build side is a dedicated fp side table
  * BUCKETED on `fp` ([[fpTableFor]]) — the layout BucketingSpec proves —
  * so the per-batch plan has exactly ONE Exchange: the maybe-duplicate
  * sliver hashing into the store's buckets. The store's fingerprints are
  * scanned as a single narrow bucketed column read, never shuffled, and
  * the full-width store is only ever read once per (re)start (the side
  * table + bloom rebuild); per-batch join cost tracks the batch size plus
  * the sliver. foreachBatch gives the batch-engine plan (broadcast/
  * anti-join, AQE) inside the stream, and the checkpoint makes the append
  * restart-safe.
  *
  * Exactly-once by construction: a replayed batch (restart after a partial
  * append) re-arrives with fingerprints that are already in the store for
  * every row whose file landed, so the anti-join drops exactly the
  * already-written rows and appends only the missing ones. The fp side
  * table is rebuilt FROM the store at every (re)start, so a crash between
  * the store append and the side-table append can never lose or duplicate
  * a fingerprint across restarts. The same argument makes the store exact
  * even under an at-least-once source that re-delivers whole files.
  */
object IncrementalIngest {

  /** Catalog name of the bucketed fp side table maintained for a store
    * path (a pure function of the path, so restarts find it again).
    * Full-width md5, not String.hashCode — the [[NearDupIngest]] rule: a
    * 32-bit collision between two live store paths would silently share
    * one fp table and let each start's rebuild wipe the other's. */
  def fpTableFor(storePath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(storePath.getBytes("UTF-8"))
    "graft_fp_" + d.map("%02x".format(_)).mkString
  }

  private def writeFps(fps: DataFrame, table: String, buckets: Int,
                       mode: String): Unit =
    fps.write.mode(mode).bucketBy(buckets, "fp").sortBy("fp")
      .saveAsTable(table)

  /** @param onBatch optional driver-side metrics hook called after each
    *   micro-batch commit with (batchId, keptRows) — the dedup RATE signal
    *   an ingest dashboard tracks. Input-row counts per trigger come free
    *   through `Dataset.observe` and surface in every
    *   `StreamingQueryProgress.observedMetrics("graft_ingest")`.
    * @param fpBuckets bucket count of the fp side table; size so one
    *   bucket's fingerprints sort-merge comfortably (store rows / buckets
    *   ≲ tens of millions — fp rows are ~50 B). */
  def start(docs: DataFrame, idCol: String, textCol: String,
            storePath: String, checkpoint: String,
            expectedItems: Long = 1000000L, fpp: Double = 0.01,
            onBatch: (Long, Long) => Unit = (_, _) => (),
            fpBuckets: Int = 8): StreamingQuery = {
    // Driver-held filter, alive for this query's lifetime. None until the
    // first batch; a restart starts from None and rebuilds filter + side
    // table from the store, so neither can ever miss a stored fingerprint
    // (false negatives are impossible; false positives only route a few
    // extra rows through the anti-join).
    var bloom: Option[BloomFilter] = None
    val fpTable = fpTableFor(storePath)
    docs
      .observe("graft_ingest",
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("in_rows"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val filter = bloom.getOrElse {
          // Once per query (re)start: reconcile the bucketed fp side table
          // from the store (the single full-store read of this process
          // lifetime) and build the bloom from the rebuilt table.
          val fps =
            if (fs.exists(store)) spark.read.parquet(storePath).select("fp")
            else spark.range(0).select(
              org.apache.spark.sql.functions.lit(null).cast("string").as("fp"))
          // After a JVM restart the in-memory catalog forgot the side
          // table but its warehouse directory survives — clear it so the
          // overwrite below is a CREATE that can't fail on the stale
          // location (the content is rebuilt from the store right here).
          graft.operators.Etl.resetManagedTable(spark, fpTable)
          writeFps(fps, fpTable, fpBuckets, mode = "overwrite")
          Dedup.fpBloom(spark.table(fpTable), expectedItems, fpp)
        }
        val out = Dedup.incrementalRowsBloom(batch, idCol, textCol,
          spark.table(fpTable), filter)
        out.write.mode("append").parquet(storePath)
        if (!out.isEmpty) {
          // Keep the side table and the filter current with the survivors
          // just appended: one batch-sized bucketed write + one batch-sized
          // aggregation (same bloom create parameters → mergeable) — no
          // store re-scan. Skipped when every row was a duplicate
          // (stat.bloomFilter NPEs on empty).
          writeFps(out.select("fp"), fpTable, fpBuckets, mode = "append")
          filter.mergeInPlace(
            out.select(xxhash64(org.apache.spark.sql.functions.col("fp"))
              .as("graft_h")).stat.bloomFilter("graft_h", expectedItems, fpp))
        }
        bloom = Some(filter)
        onBatch(batchId, out.count()) // count over the checkpointed artifact
        ()
      }
      .start()
  }
}
