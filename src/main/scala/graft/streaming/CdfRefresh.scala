package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous retractable-view maintenance from the row-level change
  * feed — the composition the CDC source exists for: a streaming query
  * reads a warehouse table's change images
  * (`readChangeFeed`, sources/WarehouseSink) and folds every micro-batch
  * into a per-key (n, sum) aggregate store. Inserts and update
  * postimages ADD; deletes and update preimages RETRACT — the q208 fold
  * made continuous, surviving DELETE/UPDATE/MERGE on the source table
  * where an append-only consumer dies.
  *
  * Per-trigger cost: the delta aggregate is O(changed rows); the store
  * rewrite is O(groups) — the mergeable-aggregate contract (42f), where
  * groups ≪ rows for any aggregate worth materializing. Nothing rescans
  * the source table, ever.
  *
  * Exactly-once: one store table, refreshed by an epoch-guarded
  * TRUNCATE write (`option("streamEpoch", batchId)`) — a checkpoint
  * restart redelivering a folded batch is a detected no-op, and a crash
  * before the publish leaves the previous generation live (the write is
  * staged + atomically swapped), so replaying converges from every
  * crash point. Groups whose count retracts to zero drop from the
  * store. */
object CdfRefresh {

  private val Fmt = "graft.sources.WarehouseSink"

  /** Start maintaining `storeDir` = SELECT keyCols, count(*), sum(measure)
    * FROM <live tableDir> GROUP BY keyCols, fed purely by change images.
    * `measure` must be a LONG-valued expression over the table's columns
    * (quantize monetary values up front — the exactness discipline). */
  def aggregate(spark: SparkSession, tableDir: String, keyCols: Seq[String],
                measure: Column, storeDir: String,
                checkpoint: String): StreamingQuery = {
    require(keyCols.nonEmpty, "need at least one grouping key")
    val feed = spark.readStream.format(Fmt)
      .option("path", tableDir).option("readChangeFeed", "true").load()
    feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val delta = batch
          .withColumn("graft_sign",
            when(col("_change_type").isin("insert", "update_postimage"), 1L)
              .otherwise(-1L))
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("graft_sign")).as("graft_dn"),
            sum(col("graft_sign") * measure).as("graft_ds"))
        val store =
          if (new java.io.File(storeDir, "_current").isFile)
            s.read.format(Fmt).option("path", storeDir).load()
          else delta.select((keyCols.map(col) :+
            lit(0L).as("n_rows") :+ lit(0L).as("sum_measure")): _*)
            .limit(0)
        val next = store.join(delta, keyCols, "full_outer")
          .select((keyCols.map(col) :+
            (coalesce(col("n_rows"), lit(0L)) +
              coalesce(col("graft_dn"), lit(0L))).as("n_rows") :+
            (coalesce(col("sum_measure"), lit(0L)) +
              coalesce(col("graft_ds"), lit(0L))).as("sum_measure")): _*)
          .filter(col("n_rows") > 0)
        next.write.format(Fmt).option("path", storeDir)
          .option("streamEpoch", batchId.toString)
          .mode("overwrite").save()
        ()
      }
      .start()
  }

  /** The maintained view read back. */
  def view(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.format(Fmt).option("path", storeDir).load()
}
