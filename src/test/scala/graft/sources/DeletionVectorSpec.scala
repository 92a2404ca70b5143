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
}
