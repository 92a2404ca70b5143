package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg-style transform partitioning (`bucket(N,col)`, `days(col)`):
  * hidden-partition layouts whose recorded per-file transform values
  * drive the pruning raw min/max stats cannot (a hash bucket's raw range
  * spans everything). */
class TransformPartitionSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tpart").toString

  private def writeBucketed(dir: String, n: Int): Unit =
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("partitionBy", s"bucket($n,id)").mode("append").save()

  test("spec parser: identity, bucket, days, mixed; unknown rejected") {
    assert(WarehouseSink.parsePartSpecs("region") ===
      Seq(WarehouseSink.IdPart("region")))
    assert(WarehouseSink.parsePartSpecs("bucket(8,id),region") ===
      Seq(WarehouseSink.BucketPart(8, "id"), WarehouseSink.IdPart("region")))
    assert(WarehouseSink.parsePartSpecs("days(ts_us)") ===
      Seq(WarehouseSink.DaysPart("ts_us")))
    intercept[IllegalArgumentException] {
      WarehouseSink.parsePartSpecs("months(ts)")
    }
  }

  test("bucket layout: one transform value per file, recorded in #tpart") {
    val dir = tmp()
    writeBucketed(dir, 4)
    val m = WarehouseSink.readManifest(dir).get
    assert(m.partitionCol === "bucket(4,id)")
    assert(m.files.size === 4) // one writer task → one file per bucket
    val spec = WarehouseSink.BucketPart(4, "id")
    m.files.foreach { f =>
      val t = WarehouseSink.readTpart(dir, f)
      assert(t.isDefined)
      // every row in the file hashes to the file's recorded bucket
      val rows = spark.read.format(Fmt).option("path", dir)
        .option("files", f).load().select("id").as[Long].collect()
      assert(rows.nonEmpty)
      rows.foreach(id => assert(WarehouseSink.encode(
        WarehouseSink.transformValue(spec, java.lang.Long.valueOf(id)))
        === t.get))
    }
    // full read-back intact
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq === (0L until 100L))
  }

  test("bucket pruning: a point lookup opens only its bucket's file") {
    val dir = tmp()
    writeBucketed(dir, 4)
    val spec = WarehouseSink.BucketPart(4, "id")
    val target = 7L
    val want = WarehouseSink.encode(
      WarehouseSink.transformValue(spec, java.lang.Long.valueOf(target)))
    // Delete every OTHER bucket's data file (manifest untouched): a
    // point lookup for the surviving bucket succeeds ONLY if transform
    // pruning dropped the deleted files from the plan — raw min/max
    // ranges of hash buckets overlap completely, so stats skipping alone
    // cannot save it from a FileNotFoundException.
    val m = WarehouseSink.readManifest(dir).get
    val doomed = m.files.filterNot(f =>
      WarehouseSink.readTpart(dir, f).contains(want))
    assert(doomed.size === 3)
    doomed.foreach(f => assert(new File(dir, f).delete()))
    def lookup(id: Long) = spark.read.format(Fmt).option("path", dir).load()
      .filter(col("id") === id).select("v").as[String].collect().toSeq
    assert(lookup(target) === Seq(s"v$target"))
    // and the pruning is honest: an id belonging to a deleted bucket
    // still plans ITS OWN file — surfacing the missing data loudly
    // instead of silently returning empty
    val gone = (0L until 100L).find(i => WarehouseSink.encode(
      WarehouseSink.transformValue(spec, java.lang.Long.valueOf(i))) != want).get
    intercept[org.apache.spark.SparkException] { lookup(gone) }
  }

  test("days layout groups rows by calendar day of an epoch-us column") {
    val dir = tmp()
    val day = 86400L * 1000000L
    (0 until 6).flatMap(d => (0 until 10).map(r =>
      (d.toLong * day + r * 1000L, s"d$d-r$r")))
      .toDF("ts_us", "v").coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("partitionBy", "days(ts_us)").mode("append").save()
    val m = WarehouseSink.readManifest(dir).get
    assert(m.files.size === 6)
    val tparts = m.files.flatMap(f => WarehouseSink.readTpart(dir, f))
    assert(tparts.map(_.toLong).sorted === (0L until 6L))
    assert(spark.read.format(Fmt).option("path", dir).load().count() === 60L)
  }

  test("maintain preserves a transform layout and its pruning") {
    val dir = tmp()
    // two appends → 8 small files (4 buckets × 2); compaction must fold
    // them back to one file per bucket WITH fresh #tpart lines
    writeBucketed(dir, 4)
    (100L until 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)
      .write.format(Fmt).option("path", dir)
      .option("partitionBy", "bucket(4,id)").mode("append").save()
    assert(WarehouseSink.readManifest(dir).get.files.size === 8)
    val rep = WarehouseSink.maintain(spark, dir, keepVersions = 1)
    assert(rep.compacted)
    val m = WarehouseSink.readManifest(dir).get
    assert(m.partitionCol === "bucket(4,id)")
    assert(m.files.size === 4)
    m.files.foreach(f => assert(WarehouseSink.readTpart(dir, f).isDefined))
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq === (0L until 200L))
  }

  test("every transform file records the spec it was written under") {
    val dir = tmp()
    writeBucketed(dir, 4)
    WarehouseSink.readManifest(dir).get.files.foreach { f =>
      assert(WarehouseSink.readTpartSpec(dir, f) === Some("bucket(4,id)"))
    }
  }

  test("partition evolution: metadata-only; each spec space prunes itself") {
    val dir = tmp()
    writeBucketed(dir, 4) // ids 0..99 under bucket(4,id)
    val before = WarehouseSink.readManifest(dir).get
    WarehouseSink.evolvePartitioning(dir, "bucket(8,id)")
    val evolved = WarehouseSink.readManifest(dir).get
    // metadata-only: same files, new spec, an explicit op
    assert(evolved.files === before.files)
    assert(evolved.partitionCol === "bucket(8,id)")
    assert(evolved.op === "evolve")
    // appends land under the NEW spec
    (100L until 200L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val m = WarehouseSink.readManifest(dir).get
    assert(m.files.size === 4 + 8)
    val specs = m.files.flatMap(f => WarehouseSink.readTpartSpec(dir, f))
    assert(specs.count(_ == "bucket(4,id)") === 4)
    assert(specs.count(_ == "bucket(8,id)") === 8)
    // full read-back across both spec spaces
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq === (0L until 200L))
    // old files prune under THEIR OWN (bucket-4) spec after evolution:
    // drop the three bucket-4 files that provably can't hold id=7 — the
    // lookup survives only if per-file spec resolution skipped them
    val b4 = WarehouseSink.BucketPart(4, "id")
    val want = WarehouseSink.encode(
      WarehouseSink.transformValue(b4, java.lang.Long.valueOf(7L)))
    val doomed = m.files.filter(f =>
      WarehouseSink.readTpartSpec(dir, f).contains("bucket(4,id)") &&
        !WarehouseSink.readTpart(dir, f).contains(want))
    assert(doomed.size === 3)
    doomed.foreach(f => assert(new File(dir, f).delete()))
    val got = spark.read.format(Fmt).option("path", dir).load()
      .filter(col("id") === 7L).select("v").as[String].collect().toSeq
    assert(got === Seq("v7"))
  }

  test("partition evolution: maintain() unifies the layout physically") {
    val dir = tmp()
    writeBucketed(dir, 4)
    WarehouseSink.evolvePartitioning(dir, "bucket(8,id)")
    (100L until 200L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val rep = WarehouseSink.maintain(spark, dir, keepVersions = 1)
    assert(rep.compacted)
    val m = WarehouseSink.readManifest(dir).get
    assert(m.partitionCol === "bucket(8,id)")
    m.files.foreach(f => assert(
      WarehouseSink.readTpartSpec(dir, f) === Some("bucket(8,id)")))
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq === (0L until 200L))
  }

  test("evolution refuses transform files without a recorded spec") {
    val dir = tmp()
    writeBucketed(dir, 4)
    // forge a legacy sidecar: strip the #tpartspec line from one file
    val f0 = WarehouseSink.readManifest(dir).get.files.head
    val sc = new File(dir, WarehouseSink.statsFile(f0))
    val stripped = new String(
      java.nio.file.Files.readAllBytes(sc.toPath), "UTF-8")
      .split("\n").filterNot(_.startsWith("#tpartspec\t")).mkString("\n")
    java.nio.file.Files.write(sc.toPath, (stripped + "\n").getBytes("UTF-8"))
    val ex = intercept[IllegalArgumentException] {
      WarehouseSink.evolvePartitioning(dir, "bucket(8,id)")
    }
    assert(ex.getMessage.contains("without its spec"))
  }
}
