package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous SEMANTIC-duplicate-rejecting ingest — [[NearDupIngest]]'s
  * discipline for the embedding family: each micro-batch computes its
  * vectors' sign-bit cells, probes the accumulated cell store
  * ([[Dedup.incrementalSemantic]]), and appends only rows whose cosine
  * stays below the threshold against everything already ingested. The
  * side table is bucketed on the cell key, so the per-batch probe's
  * store side reads its buckets without an Exchange and per-batch cost
  * tracks batch size plus cell collision rate — never store size.
  *
  * Restart discipline: the side table is rebuilt FROM the vector store
  * at every query (re)start (the one store-sized read of a process
  * lifetime — the fp-ingest rule), then kept current per batch with
  * batch-sized appends. Replay safety comes from the math: a redelivered
  * row carries the identical vector, lands in the same deterministic
  * cell as its stored copy, and scores cos = 1.0 ≥ any sane threshold —
  * so it always flags against the store and is dropped, making the
  * append exactly-once without a separate fingerprint check.
  *
  * ZERO-NORM vectors have no cosine and therefore no replay guarantee —
  * each batch's zero rows are handed to `onZero` (wire it to the
  * exact-fp ingest keyed on the raw bytes); the default no-op means they
  * are NOT ingested here, mirroring [[NearDupIngest]]'s short-row rule. */
object SemanticIngest {

  /** Side-table name: full-width md5 of the store path (the
    * [[NearDupIngest]] rule — a 32-bit name collision would cross-wire
    * two live ingests' cell stores). */
  def cellTableFor(storePath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(storePath.getBytes("UTF-8"))
    "graft_semcell_" + d.map("%02x".format(_)).mkString
  }

  def start(emb: DataFrame, idCol: String, vecCol: String,
            storePath: String, checkpoint: String,
            signBits: Int = 4, minCos: Double = 0.9, buckets: Int = 8,
            onBatch: (Long, Long) => Unit = (_, _) => (),
            onZero: DataFrame => Unit = _ => ()): StreamingQuery = {
    val cellTbl = cellTableFor(storePath)
    var ready = false
    def writeStore(d: DataFrame, mode: String): Unit =
      Dedup.semanticStoreTable(d, idCol, vecCol, signBits)
        .write.mode(mode).bucketBy(buckets, "bk").saveAsTable(cellTbl)
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!ready) {
          // Once per (re)start: reconcile the bucketed cell table from
          // the vector store (catalog may have forgotten it; its
          // warehouse dir may survive — reset, then rebuild).
          graft.operators.Etl.resetManagedTable(spark, cellTbl)
          val base =
            if (fs.exists(store)) spark.read.parquet(storePath)
            else batch0.limit(0)
          writeStore(base, mode = "overwrite")
          ready = true
        }
        // Zero-norm rows can't be made replay-safe here — route them out.
        val nrm = graft.functions.VectorFunctions.norm(col(vecCol))
        val zero = batch0.filter(nrm <= 0.0)
        if (!zero.isEmpty) onZero(zero)
        val batch = batch0.filter(nrm > 0.0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val flagged = Dedup.incrementalSemantic(batch, idCol, vecCol,
          signBits, minCos, spark.table(cellTbl))
        // In-batch exact-id collapse (first row wins via min over a
        // window is overkill for ids — dropDuplicates is deterministic
        // per id here because redelivery replays identical rows), then
        // drop store near-dups. In-batch SEMANTIC dups are left to the
        // periodic compaction pass (q141's batch pipeline) by design:
        // collapsing them per trigger would need the full cell self-join.
        val surv = batch.dropDuplicates(idCol)
          .join(flagged.select(col("id2").as(idCol)).distinct(),
            Seq(idCol), "left_anti")
          .transform(graft.operators.Materialize.transient)
        batch.unpersist()
        if (!surv.isEmpty) {
          surv.write.mode("append").parquet(storePath)
          writeStore(surv, mode = "append")
        }
        onBatch(batchId, surv.count())
        ()
      }
      .start()
  }
}
