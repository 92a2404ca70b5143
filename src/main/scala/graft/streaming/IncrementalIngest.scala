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
  * ([[Dedup.incrementalRowsBloom]]): the filter is built from the store's
  * fingerprint column ONCE per query (re)start, then kept current by
  * merging each batch's survivor fingerprints — so the only store-wide
  * scan happens at startup, and per-batch cost tracks the batch size plus
  * the maybe-duplicate sliver, never the corpus. Survivor rows (all input
  * columns + `fp`) append to the store. foreachBatch gives the
  * batch-engine plan (broadcast/anti-join, AQE) inside the stream, and the
  * checkpoint makes the append restart-safe.
  *
  * Exactly-once by construction: a replayed batch (restart after a partial
  * append) re-arrives with fingerprints that are already in the store for
  * every row whose file landed, so the anti-join drops exactly the
  * already-written rows and appends only the missing ones. The same
  * argument makes the store exact even under an at-least-once source that
  * re-delivers whole files.
  */
object IncrementalIngest {

  /** @param onBatch optional driver-side metrics hook called after each
    *   micro-batch commit with (batchId, keptRows) — the dedup RATE signal
    *   an ingest dashboard tracks. Input-row counts per trigger come free
    *   through `Dataset.observe` and surface in every
    *   `StreamingQueryProgress.observedMetrics("graft_ingest")`. */
  def start(docs: DataFrame, idCol: String, textCol: String,
            storePath: String, checkpoint: String,
            expectedItems: Long = 1000000L, fpp: Double = 0.01,
            onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    // Driver-held filter, alive for this query's lifetime. None until the
    // first batch; a restart starts from None and rebuilds from the store,
    // so the filter can never miss a stored fingerprint (false negatives
    // are impossible; false positives only route a few extra rows through
    // the anti-join).
    var bloom: Option[BloomFilter] = None
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
        val exists = fs.exists(store)
        val known =
          if (exists) spark.read.parquet(storePath).select("fp")
          else spark.emptyDataFrame.withColumn("fp",
            org.apache.spark.sql.functions.lit(null).cast("string"))
        val filter = bloom.getOrElse {
          if (exists) Dedup.fpBloom(known, expectedItems, fpp)
          else BloomFilter.create(expectedItems, fpp)
        }
        val out = Dedup.incrementalRowsBloom(batch, idCol, textCol, known, filter)
        out.write.mode("append").parquet(storePath)
        // Fold the just-appended fingerprints into the filter (same
        // create parameters → mergeable): one batch-sized aggregation over
        // the already-materialized survivors, no store re-scan. Skipped
        // when every row was a duplicate (stat.bloomFilter NPEs on empty).
        if (!out.isEmpty)
          filter.mergeInPlace(
            out.select(xxhash64(org.apache.spark.sql.functions.col("fp"))
              .as("graft_h")).stat.bloomFilter("graft_h", expectedItems, fpp))
        bloom = Some(filter)
        onBatch(batchId, out.count()) // count over the checkpointed artifact
        ()
      }
      .start()
  }
}
