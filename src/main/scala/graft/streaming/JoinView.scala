package graft.streaming

import graft.operators.{Etl, Materialize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Continuous incremental maintenance of a two-sided equi-JOIN
  * materialized view — the streaming leg of the IVM family
  * ([[graft.operators.Etl.incrementalJoinDelta]] is the batch one-shot,
  * q187): appends arrive on EITHER side, and each micro-batch applies the
  * delta rule
  *
  *   ΔMV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * appending ΔMV to the stored view — the view is never rescanned or
  * rejoined; per-batch cost tracks batch size, not view size.
  *
  * Both input streams ride ONE query (tagged union), so a micro-batch
  * sees a consistent (ΔA, ΔB) cut and the A/B/view stores never race.
  *
  * Storage layout (the 100 TB posture): all three stores are warehouse
  * tables value-partitioned on `graft_bucket` = pmod(xxhash64(key),
  * buckets) — a BOUNDED tuple domain regardless of key cardinality, so
  * the one-file-per-value invariant holds at any scale. The delta joins
  * run on (graft_bucket, key): with
  * `spark.sql.sources.v2.bucketing.enabled` and
  * `spark.sql.sources.v2.bucketing.shuffle.enabled` set, Spark's
  * one-side storage-partitioned shuffle moves only the BATCH-sized delta
  * into the store's reported KeyGroupedPartitioning — the store side
  * scans Exchange-free (spec-asserted in JoinViewSpec).
  *
  * Exactly-once under checkpoint replay WITHOUT anti-joins or content
  * ids: each of the three appends is an epoch-guarded warehouse append
  * (`option("streamEpoch", batchId)`) — the same manifest epoch cursor
  * the streaming sink uses, per table. The delta is computed and PINNED
  * (localCheckpoint) from the pre-append store snapshots, the view
  * appends FIRST, then the side stores. Replay analysis: a restart
  * redelivering batch N finds each table's cursor independently — legs
  * already folded skip on the epoch guard, legs that missed re-run; the
  * view leg runs first, so a recomputed delta over stores a partial
  * crash already advanced is always DISCARDED by the view's guard rather
  * than re-appended. Every crash point converges to the same three
  * tables. */
object JoinView {

  private val Fmt = "graft.sources.WarehouseSink"

  private[streaming] def bucketed(df: DataFrame, key: String,
                                  buckets: Int): DataFrame =
    df.withColumn("graft_bucket", pmod(xxhash64(col(key)), lit(buckets)))

  private def readStore(spark: SparkSession, dir: String,
                        schema: StructType): DataFrame =
    if (new java.io.File(dir, "_current").isFile)
      spark.read.format(Fmt).option("path", dir).load()
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Start maintaining `viewDir` = a ⋈ b on `key` under appends from the
    * two streams. Non-key columns of `a` and `b` must be disjoint (the
    * view carries both). `buckets` bounds the per-store file count and
    * sets the co-location grain. */
  def start(a: DataFrame, b: DataFrame, key: String,
            aStore: String, bStore: String, viewDir: String,
            checkpoint: String, buckets: Int = 32): StreamingQuery = {
    require(a.isStreaming && b.isStreaming,
      "JoinView.start takes two STREAMING inputs")
    require(a.columns.contains(key) && b.columns.contains(key),
      s"join key $key must exist on both sides")
    val aCols = a.columns.toSeq
    val bCols = b.columns.toSeq
    val overlap = (aCols.toSet & bCols.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint; shared: ${overlap.mkString(",")}")
    val joinKeys = Seq("graft_bucket", key)
    val tagged = a.withColumn("graft_side", lit("a"))
      .unionByName(b.withColumn("graft_side", lit("b")),
        allowMissingColumns = true)
    tagged.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Pin the batch cut once: three appends below must all see the
        // same rows even if the source plan were nondeterministic.
        val pinned = Materialize.transient(batch)
        val da = bucketed(pinned.filter(col("graft_side") === "a")
          .select(aCols.map(col): _*), key, buckets)
        val db = bucketed(pinned.filter(col("graft_side") === "b")
          .select(bCols.map(col): _*), key, buckets)
        val aOld = readStore(spark, aStore, da.schema)
        val bOld = readStore(spark, bStore, db.schema)
        // Delta from the PRE-append snapshots, pinned so the view write
        // cannot observe a store the later appends advanced.
        val delta = Materialize.transient(
          Etl.incrementalJoinDelta(aOld, da, bOld, db, joinKeys))
        def append(df: DataFrame, dir: String): Unit =
          df.write.format(Fmt).option("path", dir)
            .option("partitionBy", "graft_bucket")
            .option("streamEpoch", batchId.toString)
            .mode("append").save()
        append(delta, viewDir) // view FIRST (class doc: replay analysis)
        append(da, aStore)
        append(db, bStore)
        ()
      }
      .start()
  }

  /** The view read back (bucket column dropped — an implementation
    * detail of the layout, not of the join result). */
  def view(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.format(Fmt).option("path", viewDir).load()
      .drop("graft_bucket")
}
