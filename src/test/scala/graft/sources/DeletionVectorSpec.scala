package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThan}

/** Merge-on-read DELETE via deletion vectors: data files never rewritten,
  * vectors applied at scan time, materialized away by maintenance. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_dv").toString

  private def ids(dir: String): Seq[Long] =
    spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq

  private def write(dir: String, lo: Long, hi: Long, parts: Int = 3): Unit =
    (lo until hi).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(parts)
      .write.format(Fmt).option("path", dir).mode("append").save()

  test("MoR delete hides rows without touching any data file") {
    val dir = tmp()
    write(dir, 0, 100)
    val before = WarehouseSink.readManifest(dir).get
    val sizes = before.files.map(f => f -> new File(dir, f).length()).toMap
    val rep = WarehouseSink.deleteWhereMoR(spark, dir,
      Seq(GreaterThan("id", 89L)))
    assert(rep.rowsDeleted === 10L)
    assert(rep.filesWithVectors >= 1)
    val after = WarehouseSink.readManifest(dir).get
    // identical data files, byte for byte — only vectors were added
    assert(after.files === before.files)
    after.files.foreach(f => assert(new File(dir, f).length() === sizes(f)))
    assert(after.op === "delete_mor")
    assert(WarehouseSink.dvRefs(after).map(_.count).sum === 10L)
    assert(ids(dir) === (0L until 90L))
    // time travel to the pre-delete generation sees every row
    assert(spark.read.format(Fmt).option("path", dir)
      .option("versionAsOf", before.version.toString).load()
      .select("id").as[Long].collect().sorted.toSeq === (0L until 100L))
  }

  test("a second MoR delete merges vectors; re-deleting matches nothing") {
    val dir = tmp()
    write(dir, 0, 50)
    assert(WarehouseSink.deleteWhereMoR(spark, dir,
      Seq(LessThan("id", 10L))).rowsDeleted === 10L)
    // same predicate again: those rows are already dead behind vectors
    assert(WarehouseSink.deleteWhereMoR(spark, dir,
      Seq(LessThan("id", 10L))).rowsDeleted === 0L)
    assert(WarehouseSink.deleteWhereMoR(spark, dir,
      Seq(LessThan("id", 15L))).rowsDeleted === 5L)
    val m = WarehouseSink.readManifest(dir).get
    assert(WarehouseSink.dvRefs(m).map(_.count).sum === 15L)
    assert(ids(dir) === (15L until 50L))
  }

  test("COUNT(*) stays metadata-only under vectors; MIN must scan again") {
    val dir = tmp()
    write(dir, 0, 40, parts = 2)
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(LessThan("id", 7L)))
    def table = spark.read.format(Fmt).option("path", dir).load()
    val cnt = table.agg(count(lit(1)))
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(cnt.as[Long].head() === 33L)
    // MIN's sidecar range may point at a deleted row: pushdown refused
    val mn = table.agg(min("id"))
    assert(!mn.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(mn.as[Long].head() === 7L)
    // optimizer row count reflects the vectors (broadcast decisions do)
    val scan = table.queryExecution.optimizedPlan
    assert(scan.stats.rowCount.forall(_.toLong === 33L))
  }

  test("appends and CoW delete compose with live vectors; no resurrection") {
    val dir = tmp()
    write(dir, 0, 30)
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(LessThan("id", 5L)))
    write(dir, 100, 105) // append must carry the vectors forward
    assert(ids(dir) === ((5L until 30L) ++ (100L until 105L)))
    // CoW delete overlapping the vectored files: already-dead rows must
    // not resurrect, and the rewritten files shed their vectors
    val rep = WarehouseSink.deleteWhere(spark, dir,
      Seq(LessThan("id", 20L)))
    assert(rep.rowsDeleted === 15L) // 5..19 — never 0..4 again
    assert(ids(dir) === ((20L until 30L) ++ (100L until 105L)))
    val m = WarehouseSink.readManifest(dir).get
    assert(WarehouseSink.dvRefs(m).isEmpty)
  }

  test("maintain materializes vectors into clean files and reclaims them") {
    val dir = tmp()
    write(dir, 0, 60)
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(GreaterThan("id", 49L)))
    assert(new File(dir).listFiles.exists(_.getName.endsWith(".dv")))
    val rep = WarehouseSink.maintain(spark, dir, keepVersions = 1)
    assert(rep.compacted)
    val m = WarehouseSink.readManifest(dir).get
    assert(WarehouseSink.dvRefs(m).isEmpty)
    assert(ids(dir) === (0L until 50L))
    // vector files orphaned by the rewrite are vacuumed with the history
    assert(!new File(dir).listFiles.exists(_.getName.endsWith(".dv")))
    // post-materialization MIN is metadata-only again
    val mn = spark.read.format(Fmt).option("path", dir).load().agg(min("id"))
    assert(mn.queryExecution.executedPlan.toString.contains("metadata-only"))
  }

  test("clone carries vectors; vacuum on either side breaks neither") {
    val dir = tmp()
    val dst = tmp() + "/clone"
    write(dir, 0, 20)
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(EqualTo("id", 3L)))
    WarehouseSink.cloneTable(dir, dst)
    assert(ids(dst) === (0L until 20L).filterNot(_ == 3L))
    // materialize on the source; the clone's linked vector must survive
    WarehouseSink.maintain(spark, dir, keepVersions = 1)
    assert(ids(dst) === (0L until 20L).filterNot(_ == 3L))
    assert(ids(dir) === (0L until 20L).filterNot(_ == 3L))
  }

  test("append-only stream fails loudly when vectors change mid-stream") {
    val dir = tmp()
    write(dir, 0, 10)
    val stream = new WarehouseMicroBatchStream(dir,
      spark.read.format(Fmt).option("path", dir).load().schema,
      spark.read.format(Fmt).option("path", dir).load().schema)
    val v0 = stream.latestOffset()
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(EqualTo("id", 1L)))
    val v1 = stream.latestOffset()
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(v0, v1)
    }
    assert(err.getMessage.contains("deletion vectors"))
    // the snapshot batch (fresh checkpoint) applies the live vectors
    val parts = stream.planInputPartitions(stream.initialOffset(), v1)
    assert(parts.collect {
      case WarehouseFilePartition(_, dv) if dv.nonEmpty => dv
    }.nonEmpty)
  }

  test("CDF captures MoR delete images; tableChanges replays them") {
    val dir = tmp()
    write(dir, 0, 25)
    WarehouseSink.enableChangeFeed(dir)
    val v0 = WarehouseSink.readManifest(dir).get.version
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(GreaterThan("id", 19L)))
    val v1 = WarehouseSink.readManifest(dir).get.version
    val changes = WarehouseSink.tableChanges(spark, dir, v0, v1)
      .select("id", "_change_type").as[(Long, String)].collect().sorted.toSeq
    assert(changes === (20L until 25L).map(i => (i, "delete")))
  }

  private def vals(dir: String): Map[Long, String] =
    spark.read.format(Fmt).option("path", dir).load()
      .select("id", "v").as[(Long, String)].collect().toMap

  test("MoR update marks old versions dead and appends post-images only") {
    val dir = tmp()
    write(dir, 0, 100)
    val before = WarehouseSink.readManifest(dir).get
    val sizes = before.files.map(f => f -> new File(dir, f).length()).toMap
    val rep = WarehouseSink.updateWhereMoR(spark, dir,
      Seq(LessThan("id", 10L)), Map("v" -> lit("upd")))
    assert(rep.rowsUpdated === 10L)
    assert(rep.filesWithVectors >= 1 && rep.filesAppended >= 1)
    val after = WarehouseSink.readManifest(dir).get
    assert(after.op === "update_mor")
    // every original data file survives byte-identical; only post-image
    // files were appended next to them
    assert(before.files.forall(after.files.contains))
    before.files.foreach(f => assert(new File(dir, f).length() === sizes(f)))
    assert(after.files.size === before.files.size + rep.filesAppended)
    assert(WarehouseSink.dvRefs(after).map(_.count).sum === 10L)
    val m = vals(dir)
    assert(m.size === 100)
    (0L until 10L).foreach(i => assert(m(i) === "upd"))
    (10L until 100L).foreach(i => assert(m(i) === s"v$i"))
    // time travel to the pre-update generation sees the old values
    assert(spark.read.format(Fmt).option("path", dir)
      .option("versionAsOf", before.version.toString).load()
      .filter(col("id") < 10).select("v").as[String].collect().toSet ===
      (0L until 10L).map(i => s"v$i").toSet)
  }

  test("MoR re-update is idempotent-safe: assignments see current values") {
    val dir = tmp()
    write(dir, 0, 20)
    WarehouseSink.updateWhereMoR(spark, dir, Seq(LessThan("id", 5L)),
      Map("v" -> lit("a")))
    // second update matches the APPENDED post-images (old versions are
    // dead behind vectors) — values move a→b, never v0→b twice
    val rep2 = WarehouseSink.updateWhereMoR(spark, dir,
      Seq(LessThan("id", 5L)), Map("v" -> concat(col("v"), lit("b"))))
    assert(rep2.rowsUpdated === 5L)
    val m = vals(dir)
    assert(m.size === 20)
    (0L until 5L).foreach(i => assert(m(i) === "ab"))
    // a no-match update publishes nothing
    assert(WarehouseSink.updateWhereMoR(spark, dir,
      Seq(GreaterThan("id", 999L)), Map("v" -> lit("x"))).rowsUpdated === 0L)
  }

  test("MoR update: COUNT stays metadata-only and exact; maintain materializes") {
    val dir = tmp()
    write(dir, 0, 40, parts = 2)
    WarehouseSink.updateWhereMoR(spark, dir, Seq(LessThan("id", 7L)),
      Map("v" -> lit("u")))
    def table = spark.read.format(Fmt).option("path", dir).load()
    val cnt = table.agg(count(lit(1)))
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(cnt.as[Long].head() === 40L) // kill N + append N: count unchanged
    val rep = WarehouseSink.maintain(spark, dir, keepVersions = 1)
    assert(rep.compacted)
    assert(WarehouseSink.dvRefs(WarehouseSink.readManifest(dir).get).isEmpty)
    assert(!new File(dir).listFiles.exists(_.getName.endsWith(".dv")))
    val m = vals(dir)
    assert(m.size === 40)
    (0L until 7L).foreach(i => assert(m(i) === "u"))
  }

  test("CDF captures MoR update pre/post images") {
    val dir = tmp()
    write(dir, 0, 12)
    WarehouseSink.enableChangeFeed(dir)
    val v0 = WarehouseSink.readManifest(dir).get.version
    WarehouseSink.updateWhereMoR(spark, dir, Seq(EqualTo("id", 3L)),
      Map("v" -> lit("post")))
    val v1 = WarehouseSink.readManifest(dir).get.version
    val changes = WarehouseSink.tableChanges(spark, dir, v0, v1)
      .select("id", "v", "_change_type").as[(Long, String, String)]
      .collect().sortBy(_._3).toSeq
    assert(changes === Seq((3L, "post", "update_postimage"),
      (3L, "v3", "update_preimage")))
  }

  test("MoR merge: matched keys die behind vectors, batch appends once") {
    val dir = tmp()
    write(dir, 0, 50)
    val before = WarehouseSink.readManifest(dir).get
    val sizes = before.files.map(f => f -> new File(dir, f).length()).toMap
    val updates = Seq((3L, "m3"), (7L, "m7"), (100L, "m100"))
      .toDF("id", "v")
    val rep = WarehouseSink.mergeMoR(spark, dir, updates, Seq("id"))
    assert(rep.rowsMatched === 2L)
    assert(rep.rowsUpserted === 3L)
    val after = WarehouseSink.readManifest(dir).get
    assert(after.op === "merge_mor")
    assert(before.files.forall(after.files.contains))
    before.files.foreach(f => assert(new File(dir, f).length() === sizes(f)))
    val m = vals(dir)
    assert(m.size === 51)
    assert(m(3L) === "m3" && m(7L) === "m7" && m(100L) === "m100")
    assert(m(4L) === "v4")
    // metadata COUNT exact: 50 - 2 dead + 3 appended
    val cnt = spark.read.format(Fmt).option("path", dir).load()
      .agg(count(lit(1)))
    assert(cnt.queryExecution.executedPlan.toString.contains("metadata-only"))
    assert(cnt.as[Long].head() === 51L)
    // time travel pre-merge
    assert(spark.read.format(Fmt).option("path", dir)
      .option("versionAsOf", before.version.toString).load()
      .count() === 50L)
  }

  test("MoR merge composes with MoR delete vectors and CDF") {
    val dir = tmp()
    write(dir, 0, 30)
    WarehouseSink.deleteWhereMoR(spark, dir, Seq(LessThan("id", 5L)))
    WarehouseSink.enableChangeFeed(dir)
    val v0 = WarehouseSink.readManifest(dir).get.version
    // key 2 is already MoR-deleted: it must INSERT, not match its corpse
    val updates = Seq((2L, "back"), (10L, "m10")).toDF("id", "v")
    val rep = WarehouseSink.mergeMoR(spark, dir, updates, Seq("id"))
    assert(rep.rowsMatched === 1L) // only id=10 was live
    val m = vals(dir)
    assert(m.size === 26) // 25 live + back-inserted 2; 10 replaced in place
    assert(m(2L) === "back" && m(10L) === "m10")
    val v1 = WarehouseSink.readManifest(dir).get.version
    val changes = WarehouseSink.tableChanges(spark, dir, v0, v1)
      .select("id", "_change_type").as[(Long, String)]
      .collect().sortBy(r => (r._2, r._1)).toSeq
    assert(changes === Seq((2L, "insert"), (10L, "update_postimage"),
      (10L, "update_preimage")))
    // vectors from the delete and the merge coexist per-file
    val total = WarehouseSink.dvRefs(WarehouseSink.readManifest(dir).get)
      .map(_.count).sum
    assert(total === 6L) // 5 deleted + 1 merged-away
  }

  test("applyChangesMoR: tombstones delete, updates replace, inserts append, CDF tells them apart") {
    val dir = tmp()
    write(dir, 0, 20)
    WarehouseSink.enableChangeFeed(dir)
    val before = WarehouseSink.readManifest(dir).get
    // one batch: delete ids 0-4, update ids 5-9 (v -> U<i>), insert 100-101
    val changes = ((0L until 5L).map(i => (i, "x", true)) ++
      (5L until 10L).map(i => (i, s"U$i", false)) ++
      Seq((100L, "new100", false), (101L, "new101", false)))
      .toDF("id", "v", "is_delete")
    val rep = WarehouseSink.applyChangesMoR(spark, dir, changes,
      keyCols = Seq("id"), deleteCol = "is_delete")
    assert(rep.rowsKilled === 10L)    // 5 tombstoned + 5 updated-away
    assert(rep.rowsDeleted === 5L)
    assert(rep.rowsUpserted === 7L)   // 5 replacements + 2 inserts
    // base data files untouched (vectors only) + the appended batch
    val after = WarehouseSink.readManifest(dir).get
    assert(before.files.forall(after.files.contains))
    assert(after.op === "merge_mor_apply")
    // final content: 0-4 gone, 5-9 updated, 10-19 untouched, 100-101 new
    val got = spark.read.format(Fmt).option("path", dir).load()
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got.keySet === ((5L until 20L) ++ Seq(100L, 101L)).toSet)
    assert((5L until 10L).forall(i => got(i) === s"U$i"))
    assert((10L until 20L).forall(i => got(i) === s"v$i"))
    // CDF: delete images for tombstones, pre/post for updates, inserts
    val cdf = WarehouseSink.tableChanges(spark, dir,
      before.version, after.version)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(cdf === Map("delete" -> 5L, "update_preimage" -> 5L,
      "update_postimage" -> 5L, "insert" -> 2L))
  }

  test("WIDE-predicate MoR update: vectors write executor-side, refs-only driver state") {
    // The scale contract: a broad update matching most of a many-file
    // table must not stream row positions through the driver.
    // writeDvsDistributed writes each merged vector inside the task
    // owning that file's rows and returns only (file, vector, count)
    // refs; this exercises it across 16 files with a predicate matching
    // 90% of rows, then checks every vector on disk is sorted, exact,
    // and disjoint-merged with a pre-existing vector.
    val dir = tmp()
    write(dir, 0, 2000, parts = 16)
    // seed an existing vector so the union-merge leg is on the path
    val d = WarehouseSink.deleteWhereMoR(spark, dir, Seq(LessThan("id", 10L)))
    assert(d.rowsDeleted === 10L)
    val rep = WarehouseSink.updateWhereMoR(spark, dir,
      Seq(GreaterThan("id", 199L)), Map("v" -> lit("wide")))
    assert(rep.rowsUpdated === 1800L)
    assert(rep.filesWithVectors === 16)
    val m = WarehouseSink.readManifest(dir).get
    val refs = WarehouseSink.dvRefs(m)
    // every vector on disk: sorted, no duplicates, counts match refs
    refs.foreach { r =>
      val pos = WarehouseSink.readDvPositions(new File(dir, r.dvFile).getPath)
      assert(pos.length.toLong === r.count, s"${r.dataFile} count drift")
      assert(pos.toSeq === pos.sorted.toSeq && pos.distinct.length === pos.length,
        s"${r.dataFile} vector unsorted or duplicated")
    }
    // killed rows total: 10 deleted + 1800 updated-away old versions
    assert(refs.map(_.count).sum === 1810L)
    // live reads: survivors 10..199 keep old values, the rest read "wide"
    val live = spark.read.format(Fmt).option("path", dir).load()
    assert(live.count() === 1990L)
    assert(live.filter(col("v") === "wide").count() === 1800L)
    assert(live.filter(col("v") =!= "wide").select("id").as[Long]
      .collect().sorted.toSeq === (10L until 200L))
  }

  test("syncMoR: the table becomes the snapshot, keepWhere protects stragglers") {
    val dir = tmp()
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 60L), (5L, 50L), (6L, 5L))
      .toDF("id", "v").repartition(2)
      .write.format(Fmt).option("path", dir).mode("overwrite").save()
    // snapshot: update 1, carry 2, insert 7; 3..6 are NOT MATCHED BY
    // SOURCE — v >= 50 protects 4 and 5, so only 3 and 6 die
    val snap = Seq((1L, 11L), (2L, 20L), (7L, 70L)).toDF("id", "v")
    val rep = WarehouseSink.syncMoR(spark, dir, snap, Seq("id"),
      keepWhere = Some("v >= 50"))
    assert(rep.rowsDeleted === 2L)
    val got = spark.read.format(Fmt).option("path", dir).load()
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 11L), (2L, 20L), (4L, 60L), (5L, 50L),
      (7L, 70L)))
    // without a guard the table equals the snapshot exactly
    val dir2 = tmp()
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .write.format(Fmt).option("path", dir2).mode("overwrite").save()
    WarehouseSink.syncMoR(spark, dir2, snap, Seq("id"))
    assert(spark.read.format(Fmt).option("path", dir2).load()
      .as[(Long, Long)].collect().sorted.toSeq ===
      Seq((1L, 11L), (2L, 20L), (7L, 70L)))
  }
}
