package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column RENAME/DROP via stable field ids — the Iceberg column-mapping
  * semantics on the warehouse format: metadata-only commits, old files
  * resolving by id under new names, monotone id allocation preventing
  * dropped-column resurrection. */
class WarehouseRenameSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_whren").toString

  test("rename is metadata-only: both file eras read under the new name") {
    val dir = tmp()
    (1L to 5L).map(i => (i, s"b$i", i * 10L)).toDF("id", "brand", "price0")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val filesBefore = WarehouseSink.readManifest(dir).get.files.toSet
    WarehouseSink.renameColumn(dir, "price0", "price")
    // no data file was touched
    assert(WarehouseSink.readManifest(dir).get.files.toSet === filesBefore)
    assert(WarehouseSink.readManifest(dir).get.op === "rename_column")
    // post-rename append: its files store the NEW name
    (6L to 8L).map(i => (i, s"b$i", i * 10L)).toDF("id", "brand", "price")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.columns.toSeq === Seq("id", "brand", "price"))
    val got = back.select("id", "price").as[(Long, Long)].collect().toMap
    assert(got === (1L to 8L).map(i => i -> i * 10L).toMap)
    // filter touching both eras, answered through translated stats
    assert(spark.read.format(Fmt).option("path", dir).load()
      .filter(col("price") >= 40L && col("price") <= 60L)
      .select("id").as[Long].collect().sorted.toSeq === Seq(4L, 5L, 6L))
  }

  test("metadata aggregates stay EXACT across a rename (no all-null lie)") {
    val dir = tmp()
    (1L to 4L).map(i => (i, i * 100L)).toDF("id", "v0")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.renameColumn(dir, "v0", "v")
    (5L to 6L).map(i => (i, i * 100L)).toDF("id", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val r = spark.read.format(Fmt).option("path", dir).load()
      .agg(min("v"), max("v"), sum("v"), count(col("v"))).head()
    assert(r.getLong(0) === 100L)
    assert(r.getLong(1) === 600L)
    assert(r.getLong(2) === 2100L) // a dropped pre-rename file would read 1100
    assert(r.getLong(3) === 6L)
    // and the plan actually answered from metadata, not a scan
    val plan = spark.read.format(Fmt).option("path", dir).load()
      .agg(sum("v")).queryExecution.executedPlan.toString
    assert(plan.contains("metadata-only agg"),
      s"expected a metadata answer, got:\n$plan")
  }

  test("time travel resolves the same field id through each version's own name") {
    val dir = tmp()
    (1L to 3L).map(i => (i, i * 2L)).toDF("id", "old_name")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.renameColumn(dir, "old_name", "new_name")
    val now = spark.read.format(Fmt).option("path", dir).load()
    assert(now.columns.toSeq === Seq("id", "new_name"))
    val v0 = spark.read.format(Fmt).option("path", dir)
      .option("versionAsOf", "0").load()
    assert(v0.columns.toSeq === Seq("id", "old_name"))
    assert(v0.select("old_name").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L, 6L))
    assert(now.select("new_name").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L, 6L))
  }

  test("drop + re-add same name: the dropped column's data can NEVER resurrect") {
    val dir = tmp()
    (1L to 3L).map(i => (i, s"secret$i", i)).toDF("id", "note", "k")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.dropColumn(dir, "note")
    assert(spark.read.format(Fmt).option("path", dir).load()
      .columns.toSeq === Seq("id", "k"))
    // re-add a column NAMED note via mergeSchema: it gets a FRESH id
    (4L to 5L).map(i => (i, i, s"fresh$i")).toDF("id", "k", "note")
      .write.format(Fmt).option("path", dir)
      .option("mergeSchema", "true").mode("append").save()
    val got = spark.read.format(Fmt).option("path", dir).load()
      .select("id", "note").as[(Long, Option[String])].collect().toMap
    // old rows read NULL — "secret1..3" is gone for good; new rows read fresh
    assert(got === Map(1L -> None, 2L -> None, 3L -> None,
      4L -> Some("fresh4"), 5L -> Some("fresh5")))
  }

  test("renaming a partition column keeps pruning and partitioned reads") {
    val dir = tmp()
    (1L to 20L).map(i => (i, i % 4, i * 10L)).toDF("id", "bucket0", "v")
      .write.format(Fmt).option("path", dir)
      .option("partitionBy", "bucket0").mode("append").save()
    WarehouseSink.renameColumn(dir, "bucket0", "cell")
    assert(WarehouseSink.readManifest(dir).get.partitionCol === "cell")
    val got = spark.read.format(Fmt).option("path", dir).load()
      .filter(col("cell") === 2).select("id").as[Long].collect().sorted
    assert(got.toSeq === (1L to 20L).filter(_ % 4 == 2))
    // file pruning via the translated recorded tuples: the scan plans
    // only cell=2's files
    val scanned = spark.read.format(Fmt).option("path", dir).load()
      .filter(col("cell") === 2).queryExecution.executedPlan
      .collectLeaves().map(_.toString).mkString
    // correctness above is the hard assert; this is the layout claim
    assert(spark.read.format(Fmt).option("path", dir).load()
      .filter(col("cell") === 2).rdd.getNumPartitions <=
      spark.read.format(Fmt).option("path", dir).load()
        .rdd.getNumPartitions)
  }

  test("chained renames and rename-back stay consistent") {
    val dir = tmp()
    (1L to 3L).map(i => (i, i * 5L)).toDF("id", "a")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.renameColumn(dir, "a", "b")
    WarehouseSink.renameColumn(dir, "b", "c")
    (4L to 4L).map(i => (i, i * 5L)).toDF("id", "c")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.renameColumn(dir, "c", "a") // full circle
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("a").as[Long].collect().sorted.toSeq ===
      Seq(5L, 10L, 15L, 20L))
  }

  test("rename refuses when a live file lacks the #ids sidecar line") {
    val dir = tmp()
    (1L to 3L).map(i => (i, i)).toDF("id", "x")
      .write.format(Fmt).option("path", dir).mode("append").save()
    // strip one file's #ids line — simulating a pre-field-id data file
    val f = WarehouseSink.readManifest(dir).get.files.head
    val sidecar = new File(dir).listFiles
      .find(x => x.getName.contains(f.stripSuffix(".wtsv")) &&
        x.getName != f).get
    val body = new String(Files.readAllBytes(sidecar.toPath),
      StandardCharsets.UTF_8).split("\n")
      .filterNot(_.startsWith("#ids\t")).mkString("\n")
    Files.write(sidecar.toPath, body.getBytes(StandardCharsets.UTF_8))
    val ex = intercept[IllegalArgumentException] {
      WarehouseSink.renameColumn(dir, "x", "y")
    }
    assert(ex.getMessage.contains("maintain()"))
  }

  test("type widening is metadata-only; narrowing refused; both eras decode") {
    val dir = tmp()
    Seq((1, 10), (2, 20), (3, 30)).toDF("id", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val filesBefore = WarehouseSink.readManifest(dir).get.files.toSet
    WarehouseSink.widenColumnType(dir, "v", "bigint")
    assert(WarehouseSink.readManifest(dir).get.files.toSet === filesBefore)
    // post-widen append carries values an int cannot hold
    Seq((4L, 5000000000L)).toDF("id", "v")
      .selectExpr("CAST(id AS INT) AS id", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.schema("v").dataType.simpleString === "bigint")
    assert(back.select("v").as[Long].collect().sorted.toSeq ===
      Seq(10L, 20L, 30L, 5000000000L))
    // stats skipping still answers exactly across the width change
    assert(back.filter(col("v") > 25L).select("id").as[Int]
      .collect().sorted.toSeq === Seq(3, 4))
    // long -> double is allowed; double -> anything is not; narrowing refused
    WarehouseSink.widenColumnType(dir, "v", "double")
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select(sum("v")).head().getDouble(0) === 5000000060.0)
    assert(intercept[IllegalArgumentException] {
      WarehouseSink.widenColumnType(dir, "v", "int")
    }.getMessage.contains("lossless"))
    assert(intercept[IllegalArgumentException] {
      WarehouseSink.widenColumnType(dir, "id", "string")
    }.getMessage.contains("lossless"))
  }

  test("widening composes with rename: id binding untouched") {
    val dir = tmp()
    Seq((1, 100)).toDF("id", "w0")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.widenColumnType(dir, "w0", "bigint")
    WarehouseSink.renameColumn(dir, "w0", "w")
    Seq((2L, 200L)).toDF("id", "w")
      .selectExpr("CAST(id AS INT) AS id", "w")
      .write.format(Fmt).option("path", dir).mode("append").save()
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("w").as[Long].collect().sorted.toSeq === Seq(100L, 200L))
  }

  test("drop then truncate-overwrite with a REORDERED schema: fresh binding, clean reads") {
    val dir = tmp()
    (1L to 3L).map(i => (i, s"x$i", i * 2L)).toDF("a", "b", "c")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.dropColumn(dir, "b") // binding is now non-positional: a:0, c:2
    // truncate-overwrite with the columns REORDERED — the publish resets
    // the binding to fresh positional ids; a restamp against the dying
    // generation's (a:0, c:2) would cross-map c and a
    Seq((100L, 10L), (200L, 20L)).toDF("c", "a")
      .write.format(Fmt).option("path", dir).mode("overwrite").save()
    val back = spark.read.format(Fmt).option("path", dir).load()
    assert(back.columns.toSeq === Seq("c", "a"))
    assert(back.as[(Long, Long)].collect().toSet ===
      Set((100L, 10L), (200L, 20L)))
    // the binding is usable: a rename after the overwrite still resolves
    WarehouseSink.renameColumn(dir, "c", "cc")
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("cc").as[Long].collect().toSet === Set(100L, 200L))
  }

  test("drop then truncate-overwrite EXTENDING the schema: no duplicate ids") {
    val dir = tmp()
    (1L to 3L).map(i => (i, s"x$i", i * 2L)).toDF("a", "b", "c")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.dropColumn(dir, "b") // schema (a, c), binding a:0, c:2
    // overwrite whose schema EXTENDS (a, c) with d: inheritColIds takes
    // the prefix-extension branch — d must get a fresh id, never a
    // positional restamp that duplicates c's
    Seq((1L, 10L, "d1"), (2L, 20L, "d2")).toDF("a", "c", "d")
      .write.format(Fmt).option("path", dir).mode("overwrite").save()
    val m = WarehouseSink.readManifest(dir).get
    assert(m.colIds.distinct.length === m.colIds.length,
      s"duplicate field ids after extended overwrite: ${m.colIds}")
    WarehouseSink.renameColumn(dir, "d", "dd")
    val got = spark.read.format(Fmt).option("path", dir).load()
    assert(got.columns.toSeq === Seq("a", "c", "dd"))
    assert(got.select("c").as[Long].collect().toSet === Set(10L, 20L))
    assert(got.select("a", "dd").as[(Long, String)].collect().toSet ===
      Set((1L, "d1"), (2L, "d2")))
  }

  test("DML candidate pruning translates legacy stats through the rename map") {
    val dir = tmp()
    // era-1 file: stats sidecar stores ranges under LOCAL names a=[1,5],
    // b=[100,500]
    (1L to 5L).map(i => (i, i, i * 100L)).toDF("id", "a", "b")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.dropColumn(dir, "b")
    WarehouseSink.renameColumn(dir, "a", "b") // current 'b' IS old 'a'
    // without the id-derived rename map the legacy file's local-'b'
    // stats [100,500] would be read as current-'b' stats and b<=2 would
    // FALSELY prune the file — a silent no-op delete
    import org.apache.spark.sql.sources.LessThanOrEqual
    val rep = WarehouseSink.deleteWhere(spark, dir,
      Seq(LessThanOrEqual("b", 2L)))
    assert(rep.rowsDeleted === 2L,
      s"delete pruned a matching legacy file: $rep")
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq === Seq(3L, 4L, 5L))
    // same translation on the MoR leg
    val rep2 = WarehouseSink.updateWhereMoR(spark, dir,
      Seq(LessThanOrEqual("b", 3L)),
      Map("b" -> (col("b") + 1000L)))
    assert(rep2.rowsUpdated === 1L, s"MoR update pruned the file: $rep2")
    assert(spark.read.format(Fmt).option("path", dir).load()
      .select("b").as[Long].collect().sorted.toSeq === Seq(4L, 5L, 1003L))
  }

  test("initial-default column: old era reads the default; composes with rename/drop") {
    val dir = tmp()
    (1L to 3L).map(i => (i, i * 10L)).toDF("id", "v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val v0 = WarehouseSink.readManifest(dir).get.version
    WarehouseSink.addColumnWithDefault(dir, "tag", "string", "d0")
    // metadata-only: no data file touched
    assert(WarehouseSink.readManifest(dir).get.op === "add_column")
    (4L to 5L).map(i => (i, i * 10L, s"t$i")).toDF("id", "v", "tag")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val got = spark.read.format(Fmt).option("path", dir).load()
      .select("id", "tag").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "d0", 2L -> "d0", 3L -> "d0",
      4L -> "t4", 5L -> "t5"))
    // a filter on the defaulted column sees the default, and IS NULL
    // matches nothing (the default is non-null)
    assert(spark.read.format(Fmt).option("path", dir).load()
      .filter(col("tag") === "d0").count() === 3L)
    assert(spark.read.format(Fmt).option("path", dir).load()
      .filter(col("tag").isNull).count() === 0L)
    // min/max on a defaulted column must NOT answer from metadata (the
    // pre-add files carry no range line yet their rows read 'd0')
    val r = spark.read.format(Fmt).option("path", dir).load()
      .agg(min("tag"), max("tag"))
    assert(!r.queryExecution.executedPlan.toString.contains("metadata-only agg"))
    assert(r.head() === org.apache.spark.sql.Row("d0", "t5"))
    // time travel to the pre-add generation: no column at all
    assert(spark.read.format(Fmt).option("path", dir)
      .option("versionAsOf", v0.toString).load()
      .columns.toSeq === Seq("id", "v"))
    // the default follows a rename, dies with a drop, never resurrects
    WarehouseSink.renameColumn(dir, "tag", "label")
    assert(spark.read.format(Fmt).option("path", dir).load()
      .filter(col("label") === "d0").count() === 3L)
    WarehouseSink.dropColumn(dir, "label")
    (6L to 6L).map(i => (i, i * 10L, "fresh")).toDF("id", "v", "label")
      .write.format(Fmt).option("path", dir)
      .option("mergeSchema", "true").mode("append").save()
    val after = spark.read.format(Fmt).option("path", dir).load()
      .select("id", "label").as[(Long, Option[String])].collect().toMap
    assert(after(1L).isEmpty && after(4L).isEmpty && after(6L) === Some("fresh"))
  }

  test("default survives unrelated appends and DML rewrites") {
    val dir = tmp()
    (1L to 4L).map(i => (i, i)).toDF("id", "k")
      .write.format(Fmt).option("path", dir).mode("append").save()
    WarehouseSink.addColumnWithDefault(dir, "score", "bigint", 7L)
    // plain append of the full schema: inheritDefaults carries the entry
    Seq((5L, 5L, 50L)).toDF("id", "k", "score")
      .write.format(Fmt).option("path", dir).mode("append").save()
    // CoW delete rewrites a candidate file: rewritten rows MATERIALIZE
    // the default (they were read through it)
    import org.apache.spark.sql.sources.EqualTo
    WarehouseSink.deleteWhere(spark, dir, Seq(EqualTo("id", 2L)))
    val got = spark.read.format(Fmt).option("path", dir).load()
      .select("id", "score").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 7L, 3L -> 7L, 4L -> 7L, 5L -> 50L))
  }

  test("dropping a partition column is refused; dropping the last column is refused") {
    val dir = tmp()
    (1L to 4L).map(i => (i, i % 2)).toDF("id", "p")
      .write.format(Fmt).option("path", dir)
      .option("partitionBy", "p").mode("append").save()
    assert(intercept[IllegalArgumentException] {
      WarehouseSink.dropColumn(dir, "p")
    }.getMessage.contains("partition column"))
    WarehouseSink.dropColumn(dir, "id")
    assert(intercept[IllegalArgumentException] {
      WarehouseSink.dropColumn(dir, "p")
    }.getMessage.contains("last column"))
  }
}
