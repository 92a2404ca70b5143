package graft.sources

import graft.SparkSpec
import graft.operators.Etl
import org.apache.spark.sql.functions._

class ZoneMapIndexSpec extends SparkSpec {
  import spark.implicits._

  test("zone-map sidecar prunes files for range scans over a range layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonemap").toString
    val store = s"$dir/store"; val side = s"$dir/side"
    // Range-clustered layout: 16 files with disjoint id ranges — the
    // layout zone maps are built to exploit.
    val df = (1L to 4000L).map(i => (i, s"payload$i")).toDF("id", "v")
    Etl.writeRangeLayout(df, store, nFiles = 16, rangeCol = "id")
    val nFiles = spark.read.parquet(store)
      .select(input_file_name()).distinct().count()
    assert(nFiles === 16)
    ZoneMapIndex.build(spark, store, side, Seq("id"))
    // A narrow range: at most 2 of 16 files intersect (boundary overlap),
    // and the rows come back exact.
    val cands = ZoneMapIndex.candidateFiles(spark, side, "id",
      lit(1000L), lit(1100L))
    assert(cands.nonEmpty && cands.size <= 2,
      s"zone map should prune to ~1 file, got ${cands.size} of $nFiles")
    val rows = ZoneMapIndex.rangeScan(spark, store, side, "id",
      lit(1000L), lit(1100L)).select("id").as[Long].collect().sorted.toSeq
    assert(rows === (1000L to 1100L))
    // A range outside every file's bounds: zero candidates, schema kept.
    val empty = ZoneMapIndex.rangeScan(spark, store, side, "id",
      lit(10000L), lit(20000L))
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("id", "v"))
  }

  test("zone maps never lose rows, even on an uncorrelated layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonemap2").toString
    val store = s"$dir/store"; val side = s"$dir/side"
    // Hash layout: ids scatter across files, so every file's [min, max]
    // intersects most ranges — pruning degrades to nothing, correctness
    // must not.
    val df = (1L to 1000L).map(i => (i, i * 3)).toDF("k", "v")
    df.repartition(8, col("k")).write.parquet(store)
    ZoneMapIndex.build(spark, store, side, Seq("k"))
    val got = ZoneMapIndex.rangeScan(spark, store, side, "k",
      lit(250L), lit(300L)).select("k").as[Long].collect().sorted.toSeq
    assert(got === (250L to 300L))
  }

  test("all-null stats rows are skipped, mixed files still probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonemap3").toString
    val store = s"$dir/store"; val side = s"$dir/side"
    // File A: all-null keys (its stats row is NULL/NULL — a range can
    // never match it); file B: real keys.
    val a = Seq.fill(10)((Option.empty[Long], "null-file")).toDF("k", "tag")
    val b = (1L to 10L).map(i => (Option(i), "data-file")).toDF("k", "tag")
    a.coalesce(1).write.parquet(store)
    b.coalesce(1).write.mode("append").parquet(store)
    ZoneMapIndex.build(spark, store, side, Seq("k"))
    val got = ZoneMapIndex.rangeScan(spark, store, side, "k",
      lit(3L), lit(5L)).select("k").as[Long].collect().sorted.toSeq
    assert(got === Seq(3L, 4L, 5L))
  }

  test("non-selective probe past the candidate cap falls back to a full scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonemap4").toString
    val store = s"$dir/store"; val side = s"$dir/side"
    val df = (1L to 4000L).map(i => (i, i * 7)).toDF("id", "v")
    Etl.writeRangeLayout(df, store, nFiles = 16, rangeCol = "id")
    ZoneMapIndex.build(spark, store, side, Seq("id"))
    // A whole-domain range matches every file; with maxCandidates below
    // the file count the scan must fall back to the plain store read —
    // same rows, no driver-sized file list.
    val got = ZoneMapIndex.rangeScan(spark, store, side, "id",
      lit(1L), lit(4000L), maxCandidates = 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (1L to 4000L))
    // And the fallback reads the whole store relation (all 16 files),
    // not an explicit ≤cap-sized file list.
    val nRead = ZoneMapIndex.rangeScan(spark, store, side, "id",
      lit(1L), lit(4000L), maxCandidates = 4).inputFiles.length
    assert(nRead === 16)
  }
}
