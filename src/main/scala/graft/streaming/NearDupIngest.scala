package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, size}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous NEAR-duplicate-rejecting ingest — [[IncrementalIngest]]'s
  * discipline for the MinHash family: each micro-batch signs its own rows,
  * probes the accumulated band store ([[Dedup.incrementalMinhash]]), and
  * appends only documents that near-duplicate nothing already ingested.
  * Both side tables are bucketed on their join keys (bands on (band, bk),
  * signatures on id), so the per-batch probe's store sides read their
  * buckets without an Exchange and per-batch cost tracks batch size plus
  * collision rate — never store size.
  *
  * Restart discipline: the side tables are rebuilt FROM the document store
  * at every query (re)start (the one store-sized read of a process
  * lifetime, exactly the fp-ingest rule), then kept current per batch
  * with batch-sized appends. Replay safety comes from the math: a
  * re-delivered document is byte-identical to its stored copy, signatures
  * are deterministic, and identical signatures agree on every position —
  * est_jaccard 1.0 ≥ any sane threshold — so a replayed row always flags
  * against the store and is dropped, making the append exactly-once
  * without a separate fingerprint check.
  *
  * Documents with fewer than `n` tokens have no shingles, no signature,
  * and therefore no replay guarantee — each batch's short rows are handed
  * to the `onShort` callback (wire it to the exact-fp ingest, whose
  * fingerprint argument does not need shingles); the default is a no-op,
  * i.e. by default short rows are NOT ingested here.
  */
object NearDupIngest {

  /** Side-table suffix: full-width md5 of the store path, not
    * String.hashCode — a 32-bit collision between two live store paths
    * would silently share band/signature tables AND let each start's
    * resetManagedTable wipe the other ingest's live side tables. */
  private def pathTag(storePath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(storePath.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  def bandTableFor(storePath: String): String = "graft_lshband_" + pathTag(storePath)
  def sigTableFor(storePath: String): String = "graft_lshsig_" + pathTag(storePath)

  def start(docs: DataFrame, idCol: String, textCol: String,
            storePath: String, checkpoint: String,
            n: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
            minAgree: Double = 0.5, buckets: Int = 8,
            onBatch: (Long, Long) => Unit = (_, _) => (),
            onShort: DataFrame => Unit = _ => ()): StreamingQuery = {
    val bandTbl = bandTableFor(storePath)
    val sigTbl = sigTableFor(storePath)
    var ready = false
    def writeStores(d: DataFrame, mode: String): Unit = {
      val (bnd, sg) = Dedup.minhashStoreTables(d, idCol, textCol,
        n, bands, rowsPerBand)
      bnd.write.mode(mode).bucketBy(buckets, "band", "bk").saveAsTable(bandTbl)
      sg.write.mode(mode).bucketBy(buckets, "id").saveAsTable(sigTbl)
    }
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!ready) {
          // Once per (re)start: reconcile both bucketed side tables from
          // the document store (catalog may have forgotten them; their
          // warehouse dirs may survive — reset, then rebuild).
          graft.operators.Etl.resetManagedTable(spark, bandTbl)
          graft.operators.Etl.resetManagedTable(spark, sigTbl)
          val base =
            if (fs.exists(store)) spark.read.parquet(storePath)
            else batch0.limit(0)
          writeStores(base, mode = "overwrite")
          ready = true
        }
        // No-shingle rows can't be made replay-safe here — route them out
        // through onShort (object doc) instead of silently dropping them.
        val hasShingles =
          size(graft.functions.TextFunctions.tokens(col(textCol))) >= n
        val short = batch0.filter(!hasShingles)
        if (!short.isEmpty) onShort(short)
        val batch = batch0.filter(hasShingles)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val flagged = Dedup.incrementalMinhash(batch, idCol, textCol,
          n, bands, rowsPerBand, minAgree,
          spark.table(bandTbl), spark.table(sigTbl))
        // In-batch exact dup collapse (smallest id wins), then drop
        // store near-dups. In-batch NEAR-dups are left to the periodic
        // compaction pass (q21's batch pipeline) by design: collapsing
        // them here would need the full pair join per trigger.
        val surv = Dedup.exactRows(batch, idCol, textCol).drop("fp")
          .join(flagged.select(col("id2").as(idCol)), Seq(idCol), "left_anti")
          .transform(graft.operators.Materialize.transient)
        batch.unpersist()
        if (!surv.isEmpty) {
          surv.write.mode("append").parquet(storePath)
          writeStores(surv, mode = "append")
        }
        onBatch(batchId, surv.count())
        ()
      }
      .start()
  }
}
