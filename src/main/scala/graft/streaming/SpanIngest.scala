package graft.streaming

import graft.operators.{Dedup, Materialize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

/** Continuous SPAN-gated ingest — [[IncrementalIngest]]'s store lifecycle
  * at substring granularity: each micro-batch is exact-deduped (within
  * itself and against the store), then every survivor is scored against
  * the accumulated corpus GRAM store ([[Dedup.dupSpanReportVsStore]]) and
  * admitted only when its duplicated-span coverage stays at or below
  * `maxDupPpm` — the gate that catches a feed re-posting wire copy at
  * admission time, without ever re-scanning the corpus.
  *
  * Store layout: admitted documents append to `storePath` (full width +
  * `fp`); the k-gram hashes of the admitted corpus live in a dedicated
  * side table BUCKETED on `g` ([[gramTableFor]]), kept current by
  * appending each batch's genuinely NEW distinct hashes — store growth
  * is new grams only, proven by the anti-join against the table itself.
  * The same table carries one reserved-namespace row per admitted
  * document (`xxhash64("graft:doc:" ++ fp)`) — the admission record the
  * replay guard anti-joins, so ONE bucketed table and ONE bloom serve
  * both the exact-duplicate gate and the span gate (a mark/gram key
  * collision is the explodedShingles 64-bit class, P ≈ rows²/2⁶⁵).
  *
  * The driver-held bloom over the table's hashes is built once per query
  * (re)start and merged forward per batch: marks and grams the filter
  * rejects are DEFINITELY new and skip their joins entirely, so per-batch
  * join cost tracks the batch's duplicate/boilerplate rate, not the
  * corpus. The full-width store is read once per (re)start (side-table +
  * bloom rebuild), exactly like [[IncrementalIngest]].
  *
  * Exactly-once by construction: a replayed batch (restart after a
  * partial append) re-arrives with doc marks already in the side table
  * for every row that landed, so the mark anti-join drops exactly the
  * already-written rows; the side table rebuilds FROM the store at every
  * (re)start, so a crash between the store append and the side-table
  * append can never lose or duplicate a mark or gram across restarts.
  *
  * Within-batch span duplication (two docs in ONE batch sharing a span,
  * neither known to the store) is the documented [[Dedup.dupSpansVsStore]]
  * boundary: both admit this batch, their grams enter the store once,
  * and any LATER re-post is caught — the same admission contract as the
  * fp ingest's per-batch window.
  */
object SpanIngest {

  /** Catalog name of the bucketed gram side table for a store path (a
    * pure function of the path, so restarts find it again) — full-width
    * md5 for the same reason as [[IncrementalIngest.fpTableFor]]. */
  def gramTableFor(storePath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(storePath.getBytes("UTF-8"))
    "graft_gram_" + d.map("%02x".format(_)).mkString
  }

  /** Reserved-namespace admission mark: one long per admitted document,
    * living in the gram table next to the k-gram hashes. */
  private def docMark(fp: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(concat(lit("graft:doc:"), fp))

  private def writeGrams(g: DataFrame, table: String, buckets: Int,
                         mode: String): Unit =
    g.write.mode(mode).bucketBy(buckets, "g").sortBy("g").saveAsTable(table)

  private def gramBloom(g: DataFrame, expectedItems: Long,
                        fpp: Double): BloomFilter = {
    // stat.bloomFilter NPEs on a 0-row input, and its aggregate CLAMPS
    // the bit count at conf ceilings — a sketch-side BloomFilter.create
    // for the empty case can disagree on bit size and blow up the later
    // mergeInPlace. One reserved sentinel row keeps the empty-store
    // build on the SAME builder; its lone maybe-hit only routes one
    // hash through the exact join.
    val src =
      if (g.isEmpty) g.sparkSession.range(1)
        .select(xxhash64(lit("graft:bloom:sentinel")).as("g"))
      else g
    src.stat.bloomFilter("g", expectedItems, fpp)
  }

  /** @param k span anchor gram length (the [[Dedup.dupSpans]] knob)
    * @param maxDupPpm admission ceiling on per-doc duplicated-span
    *   coverage in integer ppm (0 = reject any known span; 1000000 =
    *   span gate off, exact-dup guard only)
    * @param onBatch driver-side metrics hook: (batchId, admittedRows,
    *   rejectedRows) after each commit — the span-rejection RATE signal
    * @param gramBuckets bucket count of the gram side table; grams run
    *   ~corpus tokens, so size an order above the fp table's. */
  def start(docs: DataFrame, idCol: String, textCol: String, k: Int,
            maxDupPpm: Long, storePath: String, checkpoint: String,
            expectedItems: Long = 10000000L, fpp: Double = 0.01,
            onBatch: (Long, Long, Long) => Unit = (_, _, _) => (),
            gramBuckets: Int = 16): StreamingQuery = {
    var bloom: Option[BloomFilter] = None
    val gramTable = gramTableFor(storePath)
    docs
      .observe("graft_span_ingest", count(lit(1)).as("in_rows"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val store = new org.apache.hadoop.fs.Path(storePath)
        val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val filter = bloom.getOrElse {
          // Once per (re)start: reconcile the side table from the store
          // (grams + admission marks — the single full-store read of
          // this process lifetime) and build the bloom from it.
          val side =
            if (fs.exists(store)) {
              val stored = spark.read.parquet(storePath)
              Dedup.gramStore(stored, idCol, textCol, k)
                .unionByName(stored.select(docMark(col("fp")).as("g")).distinct())
            } else spark.range(0).select(lit(null).cast("long").as("g"))
          graft.operators.Etl.resetManagedTable(spark, gramTable)
          writeGrams(side, gramTable, gramBuckets, mode = "overwrite")
          gramBloom(spark.table(gramTable), expectedItems, fpp)
        }
        val bytes = {
          val bos = new java.io.ByteArrayOutputStream()
          filter.writeTo(bos)
          bos.toByteArray
        }
        val side = spark.table(gramTable)
        // Exact-dup / replay guard on the admission mark: within-batch
        // window dedup, bloom prefilter, exact anti-join for the sliver.
        val fresh = Materialize.transient(
          Dedup.exactRows(batch, idCol, textCol)
            .withColumn("graft_mark", docMark(col("fp")))
            .withColumn("graft_maybe",
              ColumnBridge.bloomMightContain(bytes, col("graft_mark"))))
        val survivors = Materialize.transient(
          fresh.filter(!col("graft_maybe")).unionByName(
            fresh.filter(col("graft_maybe"))
              .join(side.withColumnRenamed("g", "graft_mark"),
                Seq("graft_mark"), "left_anti"))
            .drop("graft_maybe"))
        // Span gate: coverage vs the persisted gram store, bloom-prefiltered.
        val rep = Dedup.dupSpanReportVsStore(survivors, idCol, textCol, k,
          side, Some(filter))
        val admitIds = rep.filter(col("dup_ppm") <= maxDupPpm)
          .select(col("doc_id").as(idCol))
        val admitted = Materialize.transient(
          survivors.join(admitIds, Seq(idCol), "left_semi"))
        admitted.drop("graft_mark").write.mode("append").parquet(storePath)
        val nAdmitted = admitted.count()
        if (nAdmitted > 0) {
          // Side-table delta: the admitted docs' distinct gram hashes plus
          // their admission marks, filtered to the genuinely NEW ones
          // (bloom prefilter + exact anti-join) — store growth is new
          // hashes only. One batch-sized bucketed append, no store re-scan.
          val add = Dedup.gramStore(admitted, idCol, textCol, k)
            .unionByName(admitted.select(col("graft_mark").as("g")).distinct())
            .withColumn("graft_maybe",
              ColumnBridge.bloomMightContain(bytes, col("g")))
          val newOnly = Materialize.transient(
            add.filter(!col("graft_maybe")).drop("graft_maybe").unionByName(
              add.filter(col("graft_maybe")).drop("graft_maybe")
                .join(side, Seq("g"), "left_anti")))
          if (!newOnly.isEmpty) {
            writeGrams(newOnly, gramTable, gramBuckets, mode = "append")
            filter.mergeInPlace(
              newOnly.stat.bloomFilter("g", expectedItems, fpp))
          }
        }
        bloom = Some(filter)
        onBatch(batchId, nAdmitted, survivors.count() - nAdmitted)
        ()
      }
      .start()
  }
}
