package graft.streaming

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous crawl revisit-dedup — q427's digest-pointer economics as
  * an incremental ingest (the [[NearDupIngest]]/[[IncrementalIngest]]
  * store discipline, keyed on the capture URL):
  *
  *  - the FIRST capture of a URL is stored with its payload;
  *  - a later capture whose digest equals the first capture's digest is
  *    a REVISIT — counted (and its bytes billed as saved), never stored;
  *  - a later capture with a different digest is a real re-capture
  *    (CHANGED) and is stored.
  *
  * The side table is the kept-capture key set `(url, ts, digest)`
  * BUCKETED on url, rebuilt FROM the store at every query (re)start
  * (the one store-sized read of a process lifetime) and appended
  * batch-sized afterwards. Each batch probes it twice, both
  * bucket-local on the store side: a url-grouped `min_by(digest, ts)`
  * gives the first-capture digest per URL (no Exchange — the grouped
  * key IS the bucket key), and a `(url, ts)` anti-join makes the store
  * append exactly-once under replay (a re-delivered kept capture hits
  * its own key and drops; a re-delivered revisit re-classifies as a
  * revisit by the digest math). Only the batch sliver ever shuffles.
  *
  * Per-batch counters (captures, uniques, revisits, changed, bytes
  * saved) ride `Dataset.observe` on the classified frame — they are
  * collected by the SAME action that writes the store (zero extra
  * pass) and surface through [[Observation]] to the `onBatch` hook.
  * Counters are at-least-once under replay (a replayed batch re-bills);
  * the store itself is exactly-once.
  *
  * Ordering contract: arrival order is capture order — a capture is
  * classified against the digest of the earliest capture ALREADY
  * arrived (store first, then in-batch ts order). When delivery
  * respects fetch-ts order this matches q427's batch window exactly
  * (RevisitIngestSpec proves parity across a restart). */
object RevisitIngest {

  /** One micro-batch's dedup bill. */
  final case class Bill(nCaptures: Long, nUnique: Long, nRevisits: Long,
                        nChanged: Long, bytesSaved: Long)

  /** Catalog name of the bucketed kept-capture key table for a store
    * path — full-width md5 of the path (the [[NearDupIngest.pathTag]]
    * rule: a 32-bit collision would let two live ingests wipe each
    * other's side tables). */
  def urlTableFor(storePath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(storePath.getBytes("UTF-8"))
    "graft_crawlkey_" + d.map("%02x".format(_)).mkString
  }

  def start(caps: DataFrame, urlCol: String, tsCol: String,
            bodyCol: String, storePath: String, checkpoint: String,
            buckets: Int = 8,
            onBatch: (Long, Bill) => Unit = (_, _) => ()): StreamingQuery = {
    val keyTbl = urlTableFor(storePath)
    var ready = false
    caps.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!ready) {
          // Once per (re)start: rebuild the bucketed key table from the
          // document store (catalog may have forgotten it; its warehouse
          // dir may survive — reset, then rebuild).
          graft.operators.Etl.resetManagedTable(spark, keyTbl)
          val base =
            if (fs.exists(store))
              spark.read.parquet(storePath).select(
                col(urlCol).as("url"), col(tsCol).as("ts"), col("digest"))
            else batch0.limit(0).select(col(urlCol).as("url"),
              col(tsCol).as("ts"), md5(col(bodyCol)).as("digest"))
          base.write.mode("overwrite").bucketBy(buckets, "url")
            .saveAsTable(keyTbl)
          ready = true
        }
        val st = spark.table(keyTbl)
        // first-ever digest per stored URL; grouped on the bucket key,
        // so the store side aggregates without an Exchange
        val d0s = st.groupBy("url")
          .agg(min_by(col("digest"), col("ts")).as("graft_d0"))
          .select(col("url").as("graft_du"), col("graft_d0"))
        val stKeys = st.select(col("url").as("graft_ku"),
          col("ts").as("graft_kt"))
        val w = Window.partitionBy(col(urlCol)).orderBy(col(tsCol).asc)
        val classified = batch0
          .withColumn("graft_dig", md5(col(bodyCol)))
          .withColumn("graft_rn", row_number().over(w))
          .withColumn("graft_b0", first(col("graft_dig")).over(w))
          .join(d0s, col(urlCol) === col("graft_du"), "left")
          .drop("graft_du")
          .withColumn("graft_uni",
            col("graft_d0").isNull && col("graft_rn") === 1)
          .withColumn("graft_rev", !col("graft_uni") &&
            col("graft_dig") === coalesce(col("graft_d0"), col("graft_b0")))
          .withColumn("graft_chg", !col("graft_uni") && !col("graft_rev"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // exactly-once: a replayed kept capture hits its own (url, ts)
        // key and drops
        def keptRows(c: DataFrame): DataFrame = c
          .filter(col("graft_uni") || col("graft_chg"))
          .join(stKeys, col(urlCol) === col("graft_ku") &&
            col(tsCol) === col("graft_kt"), "left_anti")
        val obs = Observation(s"graft_revisit_$batchId")
        val toStore = keptRows(classified
          .observe(obs,
            count(lit(1)).as("n_captures"),
            coalesce(sum(when(col("graft_uni"), 1L).otherwise(0L)), lit(0L))
              .as("n_unique"),
            coalesce(sum(when(col("graft_rev"), 1L).otherwise(0L)), lit(0L))
              .as("n_revisits"),
            coalesce(sum(when(col("graft_chg"), 1L).otherwise(0L)), lit(0L))
              .as("n_changed"),
            coalesce(sum(when(col("graft_rev"),
              octet_length(col(bodyCol)).cast("long")).otherwise(0L)),
              lit(0L)).as("bytes_saved")))
          .select(batch0.columns.map(col) :+ col("graft_dig").as("digest"): _*)
        toStore.write.mode("append").parquet(storePath)
        val m = obs.get
        // side-table append on a plan WITHOUT the observe node (an
        // Observation latches its first action; classified is cached,
        // so this recompute is batch-sized)
        val keptKeys = keptRows(classified).select(col(urlCol).as("url"),
          col(tsCol).as("ts"), col("graft_dig").as("digest"))
        if (!keptKeys.isEmpty)
          keptKeys.write.mode("append").bucketBy(buckets, "url")
            .saveAsTable(keyTbl)
        classified.unpersist()
        onBatch(batchId, Bill(
          m.get("n_captures").map(_.asInstanceOf[Long]).getOrElse(0L),
          m.get("n_unique").map(_.asInstanceOf[Long]).getOrElse(0L),
          m.get("n_revisits").map(_.asInstanceOf[Long]).getOrElse(0L),
          m.get("n_changed").map(_.asInstanceOf[Long]).getOrElse(0L),
          m.get("bytes_saved").map(_.asInstanceOf[Long]).getOrElse(0L)))
        ()
      }
      .start()
  }
}
