package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named refs over the warehouse manifest chain: immutable tags and
  * writable branches with fast-forward promotion — the Iceberg refs
  * model (tags pin audited releases; branches stage multi-commit WAP). */
class WarehouseRefsSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_refs").toString
  private def write(dir: String, from: Long, until: Long): Unit =
    (from until until).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
  private def idsAt(dir: String, opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format(Fmt).option("path", dir)
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load().select("id").as[Long].collect().sorted.toSeq
  }

  test("tags pin a generation immutably and survive vacuum") {
    val dir = tmp()
    write(dir, 0, 10)
    WarehouseSink.createTag(dir, "release-1")
    write(dir, 10, 20)
    write(dir, 20, 30)
    // the tag still reads the pinned snapshot
    assert(idsAt(dir, Map("ref" -> "release-1")) === (0L until 10L))
    assert(idsAt(dir) === (0L until 30L))
    // tags are immutable; duplicate creation fails
    intercept[IllegalArgumentException] {
      WarehouseSink.createTag(dir, "release-1")
    }
    // vacuum keeps the tagged generation even at keepVersions = 1
    assert(WarehouseSink.vacuum(dir, keepVersions = 1) >= 0)
    assert(idsAt(dir, Map("ref" -> "release-1")) === (0L until 10L))
    // dropping the tag releases it: the next vacuum reclaims the files
    WarehouseSink.dropRef(dir, "release-1")
    WarehouseSink.vacuum(dir, keepVersions = 1)
    intercept[Exception] { idsAt(dir, Map("ref" -> "release-1")) }
  }

  test("branch: commits are invisible to main until fast-forward") {
    val dir = tmp()
    write(dir, 0, 10)
    WarehouseSink.createBranch(dir, "audit")
    WarehouseSink.appendToBranch(spark, dir, "audit",
      (10L until 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    WarehouseSink.appendToBranch(spark, dir, "audit",
      (20L until 30L).map(i => (i, s"v$i")).toDF("id", "v"))
    // main still sees only the fork-point rows; the branch sees all
    assert(idsAt(dir) === (0L until 10L))
    assert(idsAt(dir, Map("ref" -> "audit")) === (0L until 30L))
    // promote: pointer-only publish of the branch head
    WarehouseSink.fastForward(dir, "audit")
    assert(idsAt(dir) === (0L until 30L))
    // the branch is consumed
    assert(WarehouseSink.readRef(dir, "audit").isEmpty)
  }

  test("fast-forward refuses when main advanced past the fork point") {
    val dir = tmp()
    write(dir, 0, 10)
    WarehouseSink.createBranch(dir, "stale")
    WarehouseSink.appendToBranch(spark, dir, "stale",
      Seq((100L, "x")).toDF("id", "v"))
    write(dir, 10, 20) // main moves on
    val ex = intercept[IllegalArgumentException] {
      WarehouseSink.fastForward(dir, "stale")
    }
    assert(ex.getMessage.contains("not a fast-forward"))
    // main unaffected, branch still readable
    assert(idsAt(dir) === (0L until 20L))
    assert(idsAt(dir, Map("ref" -> "stale")) ===
      ((0L until 10L) :+ 100L).sorted)
  }

  test("a main append never rebases onto a parked branch slot") {
    val dir = tmp()
    write(dir, 0, 10)
    WarehouseSink.createBranch(dir, "side")
    WarehouseSink.appendToBranch(spark, dir, "side",
      Seq((777L, "branch-only")).toDF("id", "v"))
    // main append AFTER the branch claimed the next slot: publish must
    // skip over the parked slot, not merge the branch rows into main
    write(dir, 10, 20)
    assert(idsAt(dir) === (0L until 20L)) // no 777 leak
    assert(idsAt(dir, Map("ref" -> "side")) ===
      ((0L until 10L) :+ 777L).sorted)
    // and the main head version landed ABOVE the branch slot
    val mainV = WarehouseSink.readManifest(dir).get.version
    val branchV = WarehouseSink.readRef(dir, "side").get.version
    assert(mainV > branchV)
  }

  test("history() surfaces parked branch commits inside the chain") {
    val dir = tmp()
    write(dir, 0, 10)                       // v0
    write(dir, 10, 20)                      // v1
    WarehouseSink.createBranch(dir, "b")
    WarehouseSink.appendToBranch(spark, dir, "b",
      Seq((99L, "x")).toDF("id", "v"))      // v2 parked branch slot
    WarehouseSink.deleteWhere(spark, dir,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 0L))) // v3 delete
    val h = WarehouseSink.history(spark, dir)
      .orderBy("version").select("version", "operation")
      .as[(Long, String)].collect().toSeq
    assert(h.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(h(2)._2 === "branch-append") // the parked slot is auditable
    assert(h(3)._2 === "delete")
  }

  test("tableChangesBetweenRefs replays the commits between two tags") {
    val dir = tmp()
    write(dir, 0, 5)
    WarehouseSink.enableChangeFeed(dir) // row-level DML capture for CDF
    WarehouseSink.createTag(dir, "rel-1")
    write(dir, 5, 8)
    WarehouseSink.deleteWhere(spark, dir,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 0L)))
    WarehouseSink.createTag(dir, "rel-2")
    val ch = WarehouseSink.tableChangesBetweenRefs(spark, dir,
        "rel-1", "rel-2")
      .select("id", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(ch === (5L until 8L).map(i => (i, "insert")).toSet
      + ((0L, "delete")))
    // identical or reversed refs refuse loudly
    intercept[IllegalArgumentException] {
      WarehouseSink.tableChangesBetweenRefs(spark, dir, "rel-2", "rel-1")
    }
  }

  test("branch appends keep a partitioned table's layout") {
    val dir = tmp()
    (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("partitionBy", "bucket(4,id)").mode("append").save()
    WarehouseSink.createBranch(dir, "b")
    WarehouseSink.appendToBranch(spark, dir, "b",
      (40L until 80L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val head = WarehouseSink.readRef(dir, "b").get.version
    val m = WarehouseSink.readManifestAt(dir, head).get
    assert(m.partitionCol === "bucket(4,id)")
    m.files.foreach { f =>
      assert(WarehouseSink.readTpartSpec(dir, f) === Some("bucket(4,id)"))
    }
    assert(idsAt(dir, Map("ref" -> "b")) === (0L until 80L))
  }
}
