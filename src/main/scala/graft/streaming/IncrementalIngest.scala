package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous deduplicating ingest — the reference's append-to-store load
  * cadence (dag.py:534-646, Mongo/BigQuery WRITE_APPEND) made streaming.
  *
  * Each micro-batch is deduplicated within itself and against the
  * accumulated store's fingerprint column (see Dedup.incrementalExact —
  * only fingerprints shuffle), then appended. foreachBatch gives the
  * batch-engine plan (broadcast/anti-join, AQE) inside the stream, and
  * the checkpoint makes the append restart-safe.
  */
object IncrementalIngest {

  def start(docs: DataFrame, idCol: String, textCol: String,
            storePath: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val known =
          if (fs.exists(store)) spark.read.parquet(storePath).select("fp")
          else spark.emptyDataFrame.withColumn("fp",
            org.apache.spark.sql.functions.lit(null).cast("string"))
        Dedup.incrementalExact(batch, idCol, textCol, known)
          .write.mode("append").parquet(storePath)
        ()
      }
      .start()
}
