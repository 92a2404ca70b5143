package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("reconcile classifies left_only/right_only/changed/same with null-safe compare") {
    val left = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None),
      (4L, Some(40.0))).toDF("k", "p")
    val right = Seq((1L, Some(10.0)), (2L, Some(21.0)), (3L, Some(30.0)),
      (5L, Some(50.0))).toDF("k", "p")
    val got = Etl.reconcile(left, right, Seq("k"), Seq("p"))
      .select("status", "n", "min_key", "max_key")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // k=3: NULL -> 30.0 must be CHANGED (null-safe), not same.
    assert(got === Map(
      "same" -> ((1L, 1L, 1L)),
      "changed" -> ((2L, 2L, 3L)),
      "left_only" -> ((1L, 4L, 4L)),
      "right_only" -> ((1L, 5L, 5L))))
  }

  test("reconcile with no compare columns is a presence-only diff") {
    val l = Seq(1L, 2L).toDF("k")
    val r = Seq(2L, 3L).toDF("k")
    val got = Etl.reconcile(l, r, Seq("k"), Nil)
      .select("status", "n").as[(String, Long)].collect().toMap
    assert(got === Map("same" -> 1L, "left_only" -> 1L, "right_only" -> 1L))
  }

  test("upsert: source wins on key collision, target rows otherwise kept") {
    val target = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val source = Seq((1L, "new"), (3L, "add")).toDF("k", "v")
    val got = Etl.upsert(target, source, "k").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("dedupKeys keeps first row by order columns") {
    val df = Seq((1L, 2, "b"), (1L, 1, "a"), (2L, 9, "c")).toDF("k", "ord", "v")
    val got = Etl.dedupKeys(df, Seq("k"), Seq("ord", "v"))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "c"))
  }

  test("filterProject drops below-threshold and P-status rows") {
    val df = Seq((1L, 10L, "F", 200000.0), (2L, 11L, "P", 300000.0),
      (3L, 12L, "O", 100.0)).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val got = Etl.filterProject(df, 150000.0).select("order_id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("truncate+append load cycle via parquet write modes") {
    // reference: TRUNCATE TABLE + WRITE_APPEND loads (dag.py:735-738, 827+)
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val path = s"$dir/t"
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(path)
    Seq((2L, "b")).toDF("k", "v").write.mode("append").parquet(path)
    assert(spark.read.parquet(path).count() == 2)
    Seq((3L, "c")).toDF("k", "v").write.mode("overwrite").parquet(path) // truncate
    assert(spark.read.parquet(path).as[(Long, String)].collect().toSeq == Seq((3L, "c")))
  }

  test("writePartitioned lays out pruned directories with sorted row groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val path = s"$dir/t"
    val df = (1 to 100).map(i => (s"p${i % 4}", i.toLong, s"v$i"))
      .toDF("part", "k", "v")
    Etl.writePartitioned(df, path, "part", "k")
    val back = spark.read.parquet(path)
    assert(back.count() === 100)
    // Partition filter reaches the scan as directory pruning.
    val plan = back.filter(col("part") === "p1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"))
    // One directory per partition value.
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("part=")).sorted
    assert(dirs.toSeq === Seq("part=p0", "part=p1", "part=p2", "part=p3"))
    // Rows inside each partition file arrive sorted by k (row-group stats
    // monotone → min/max page skipping works).
    val ks = spark.read.parquet(s"$path/part=p1").select("k").as[Long].collect()
    assert(ks.toSeq === ks.sorted.toSeq)
  }

  test("writeRangeLayout: files own disjoint key ranges, rows sorted within") {
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    val path = s"$dir/t"
    val df = (1 to 1000).map(i => ((i * 37) % 1000L, s"v$i")).toDF("k", "v")
    Etl.writeRangeLayout(df, path, nFiles = 4, rangeCol = "k")
    val back = spark.read.parquet(path)
    assert(back.count() === 1000)
    // Per-file [min,max] ranges must not overlap — that's the pruning
    // contract: a point predicate hits exactly one file's range.
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // Row-group stats are monotone within each file: rows sorted by k.
    val oneFile = ranges.head
    val ks = back.filter(col("k").between(oneFile._1, oneFile._2))
      .select("k").as[Long].collect()
    assert(ks.toSeq === ks.sorted.toSeq)
  }

  test("incremental aggState merge equals the full recompute, any batch order") {
    val all = (1 to 900).map(i => (s"k${i % 7}", (i % 101).toLong))
      .toDF("k", "v")
    val full = Etl.aggState(all, Seq("k"), "v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // three arbitrary batches, folded in a shuffled order
    val batches = Seq(0, 1, 2).map(b =>
      Etl.aggState(all.filter(abs(hash(col("v"), col("k"))) % 3 === b),
        Seq("k"), "v"))
    val merged = Seq(2, 0, 1).map(batches)
      .reduce((a, b) => Etl.mergeAggStates(a, b, Seq("k")))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged === full)
    val read = Etl.aggReadView(Etl.aggState(all, Seq("k"), "v"))
    assert(read.columns.contains("avg_v") && read.count() === 7)
  }

  test("retractAggState: delete-then-merge equals the post-delete recompute") {
    val all = (1 to 900).map(i => (s"k${i % 7}", (i % 101).toLong, i.toLong))
      .toDF("k", "v", "id")
    val initial = all.filter(col("id") % 3 =!= 2)
    val ins = all.filter(col("id") % 3 === 2)
    val dels = initial.filter(col("id") % 5 === 0)
    val baseAfter = all.filter(!(col("id") % 3 =!= 2 && col("id") % 5 === 0))
    val stored = Etl.aggState(initial.drop("id"), Seq("k"), "v")
    val merged = Etl.retractAggState(stored, ins.drop("id"), dels.drop("id"),
        baseAfter.drop("id"), Seq("k"), "v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val full = Etl.aggState(baseAfter.drop("id"), Seq("k"), "v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged === full)
  }

  test("retractAggState: extreme-owning delete rescans, full delete drops the group, insert-only group appears") {
    val stored = Etl.aggState(
      Seq(("a", 1L), ("a", 5L), ("a", 9L), ("b", 7L)).toDF("k", "v"),
      Seq("k"), "v")
    val ins = Seq(("a", 6L), ("c", 3L)).toDF("k", "v")
    val dels = Seq(("a", 9L), ("b", 7L)).toDF("k", "v") // group max; whole group
    val baseAfter = Seq(("a", 1L), ("a", 5L), ("a", 6L), ("c", 3L)).toDF("k", "v")
    val out = Etl.retractAggState(stored, ins, dels, baseAfter, Seq("k"), "v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // a: the deleted 9 owned the max — max must fall back to 6 via the
    // rescan, NOT stay 9; b: count hits 0 and drops; c: insert-only.
    assert(out === Set(("a", 3L, 12L, 1L, 6L), ("c", 1L, 3L, 3L, 3L)))
  }

  test("writeZorderLayout prunes candidate files on BOTH columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val zPath = s"$dir/z"; val rPath = s"$dir/r"
    val grid = (for (x <- 0 until 100; y <- 0 until 100)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    Etl.writeZorderLayout(grid, zPath, nFiles = 16, "x", "y")
    Etl.writeRangeLayout(grid, rPath, nFiles = 16, rangeCol = "x")
    def candidates(path: String, c: String, lo: Long, hi: Long): Int = {
      val back = spark.read.parquet(path)
      back.groupBy(input_file_name().as("f"))
        .agg(min(c).as("lo"), max(c).as("hi"))
        .filter(col("hi") >= lo && col("lo") <= hi)
        .count().toInt
    }
    assert(spark.read.parquet(zPath).count() === 10000)
    // A quarter-range predicate on either column overlaps a bounded
    // fraction of the z-curve; a single-column range layout prunes one
    // dimension perfectly and the other not at all.
    val zx = candidates(zPath, "x", 0, 24)
    val zy = candidates(zPath, "y", 0, 24)
    assert(zx <= 8, s"z-layout x-candidates $zx")
    assert(zy <= 8, s"z-layout y-candidates $zy")
    assert(candidates(rPath, "x", 0, 24) <= 5)
    assert(candidates(rPath, "y", 0, 24) === 16) // no pruning on y
  }

  test("weeklyAgg groups by ISO week start") {
    val df = Seq(
      ("x", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1.0),
      ("x", java.sql.Timestamp.valueOf("2024-01-07 23:59:59"), 2.0), // same ISO week (Sun)
      ("x", java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), 4.0)) // next week (Mon)
      .toDF("g", "ts_t", "value")
    val got = Etl.weeklyAgg(df, "ts_t", "g", "value")
      .select("wk", "sum_v").as[(String, Double)].collect().toMap
    assert(got == Map("2024-01-01" -> 3.0, "2024-01-08" -> 4.0))
  }

  test("scd2 builds validity intervals, collapsing consecutive duplicates") {
    val e = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a"), (2L, 10L, 5L, "x")).toDF("k", "ts", "id", "v")
    val got = Etl.scd2(e, "k", "ts", "id", "v").orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(got === Seq(
      (1L, "a", 10L, Some(30L)), // the 20L duplicate collapsed
      (1L, "b", 30L, Some(40L)),
      (1L, "a", 40L, None),      // open interval = current
      (2L, "x", 10L, None)))
  }

  test("applyCdc: latest op per key wins — deletes remove, upserts replace") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val cdc = Seq(
      (1L, 11.0, "U", 1L), (1L, 12.0, "U", 2L), // two upserts → final 12
      (2L, 0.0, "D", 1L),                       // delete
      (3L, 31.0, "D", 1L), (3L, 33.0, "U", 2L), // delete then re-insert → 33
      (4L, 40.0, "U", 1L))                      // brand-new key
      .toDF("k", "v", "op", "seq")
    val got = Etl.applyCdc(target, cdc, "k", Seq("seq"), "op")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 12.0, 3L -> 33.0, 4L -> 40.0))
  }

  test("overwritePartitionsDynamic replaces only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dynpart").toString
    val base = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 100L))
      .toDF("part", "v")
    Etl.writePartitioned(base, dir, "part")
    // backfill rewrites partition b only; a and c must stay byte-identical
    val aFilesBefore = new java.io.File(s"$dir/part=a").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length))
    Etl.overwritePartitionsDynamic(
      Seq(("b", 11L), ("b", 12L)).toDF("part", "v"), dir, "part")
    val got = spark.read.parquet(dir).as[(Long, String)]
      .collect().toSet // (v, part) — parquet puts data cols first
    assert(got === Set((1L, "a"), (2L, "a"), (11L, "b"), (12L, "b"),
      (100L, "c")))
    val aFilesAfter = new java.io.File(s"$dir/part=a").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.length))
    assert(aFilesAfter.toSeq === aFilesBefore.toSeq) // untouched, not rewritten
    // and the session setting was restored, not leaked
    assert(spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode").forall(_ != "dynamic"))
  }

  test("incrementalJoinDelta: append delta equals full-join difference") {
    val rnd = new scala.util.Random(13)
    val a = (1L to 120L).map(i => (rnd.nextInt(25).toLong, i))
      .toDF("k", "av")
    val b = (1L to 60L).map(i => (rnd.nextInt(25).toLong, i * 100))
      .toDF("k", "bv")
    // random 30% of each side is "the new batch"
    val aNew = a.filter(pmod(col("av"), lit(10)) < 3)
    val aOld = a.filter(pmod(col("av"), lit(10)) >= 3)
    val bNew = b.filter(pmod(col("bv") / 100, lit(10)) < 3)
    val bOld = b.filter(pmod(col("bv") / 100, lit(10)) >= 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "av", "bv").as[(Long, Long, Long)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    val full = rows(a.join(b, Seq("k")))
    val old = rows(aOld.join(bOld, Seq("k")))
    val delta = rows(Etl.incrementalJoinDelta(aOld, aNew, bOld, bNew, "k"))
    // multiset identity: old ⊎ delta == full (nothing lost, nothing doubled)
    val merged = (old.keySet ++ delta.keySet).map(r =>
      r -> (old.getOrElse(r, 0) + delta.getOrElse(r, 0))).toMap
    assert(merged === full)
  }

  test("incrementalJoinDelta: empty deltas produce an empty delta") {
    val a = Seq((1L, 1L)).toDF("k", "av")
    val b = Seq((1L, 2L)).toDF("k", "bv")
    val e = a.limit(0)
    val eb = b.limit(0)
    assert(Etl.incrementalJoinDelta(a, e, b, eb, "k").count() === 0L)
  }

  test("snapshotDiff classifies keys null-safely across two versions") {
    val before = Seq((1L, Option("a"), 10), (2L, None: Option[String], 20),
      (3L, Option("c"), 30), (5L, Option("e"), 50))
      .toDF("k", "v", "n")
    val after = Seq((2L, None: Option[String], 20), (3L, Option("x"), 30),
      (4L, Option("d"), 40), (5L, None: Option[String], 50))
      .toDF("k", "v", "n")
    val got = Etl.snapshotDiff(before, after, Seq("k"))
      .orderBy("k").as[(Long, String)].collect()
    // 2 has a NULL payload on BOTH sides → unchanged (null-safe compare);
    // 5 goes value→NULL → changed, not unchanged
    assert(got === Array((1L, "removed"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added"), (5L, "changed")))
    // column order must not matter — only names/values
    val shuffled = after.select($"n", $"k", $"v")
    val re = Etl.snapshotDiff(before, shuffled, Seq("k"))
      .orderBy("k").as[(Long, String)].collect()
    assert(re === got)
  }

  test("imputePanel: lower-median fill, exact post-sum, all-null refusal") {
    // group a: values 1,2,3(+two nulls) → fill = lower median 200
    //   (centi), post-sum = 600 + 2·200 = 1000
    // group b: no nulls → fill still reported, post-sum = raw sum
    // group c: ALL null → NULL fill and NULL post-sum
    val rows = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", None),
      ("b", Some(5.0)), ("b", Some(7.0)),
      ("c", None)).map { case (g, v) => (g, v.map(Double.box).orNull) }
    val got = Etl.imputePanel(rows.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
    val a = got(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ===
      ((5L, 2L, 200L, 1000L)))
    val b = got(1)
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4)) ===
      ((2L, 0L, 500L, 1200L)))
    val c = got(2)
    assert(c.getLong(1) === 1L && c.getLong(2) === 1L)
    assert(c.isNullAt(3) && c.isNullAt(4))
  }

  test("businessDaysBetween: closed form matches day-walk hand counts," +
    " weekend holidays inert, reversed intervals zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hols = Seq("2026-01-26", "2026-02-14") // Mon holiday + Sat
    val cases = Seq(
      ("2026-01-05", "2026-01-12", 5L), // one full Mon→Mon week
      ("2026-01-24", "2026-01-27", 0L), // Sat,Sun,Mon(holiday)
      ("2026-02-13", "2026-02-16", 1L), // Fri + Sat-holiday(inert)
      ("2026-01-10", "2026-01-11", 0L), // Sat→Sun
      ("2026-01-05", "2026-01-05", 0L), // empty interval
      ("2026-01-12", "2026-01-05", 0L)) // reversed → defined zero
    val got = cases.map(_._1).zip(cases.map(_._2))
      .toDF("s", "e")
      .select(Etl.businessDaysBetween(col("s"), col("e"), hols))
      .as[Long].collect().toSeq
    assert(got === cases.map(_._3))
  }
}
