package graft.sources

import java.io.File

import graft.SparkSpec

/** The manifest protocol's concurrency contract, exercised for real:
  * racing committers must MERGE (rebase), never silently drop each
  * other's generations — the lost-update half of optimistic concurrency
  * that the publish() scaladoc promises. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_conc").toString

  private def ids(dir: String): Seq[Long] =
    spark.read.format(Fmt).option("path", dir).load()
      .select("id").as[Long].collect().sorted.toSeq

  test("racing appends from two threads all land; no batch is lost") {
    val dir = tmp()
    // Spark actions are thread-safe per session; the race under test is
    // the manifest slot claim inside publish(), which both writers hit.
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        (0 until 5).foreach { i =>
          val lo = t * 1000 + i * 100
          (lo until lo + 100).map(x => (x.toLong, s"v$x")).toDF("id", "v")
            .coalesce(1)
            .write.format(Fmt).option("path", dir).mode("append").save()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // every one of the 10 batches' rows is present exactly once
    val expect = (for (t <- 0 until 2; i <- 0 until 5;
                       x <- t * 1000 + i * 100 until t * 1000 + i * 100 + 100)
      yield x.toLong).sorted
    assert(ids(dir) === expect)
    // and the manifest chain recorded all ten generations
    assert(WarehouseSink.readManifest(dir).get.version === 9L)
  }

  test("append rebases on a claimed-but-unswapped slot instead of dropping it") {
    val dir = tmp()
    (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val m0 = WarehouseSink.readManifest(dir).get
    // Simulate a winner that claimed slot 1 (manifest file written, data
    // file fully moved — publish's precondition) but has not yet swapped
    // _current: a slow or crashed committer mid-commit.
    val src = new File(dir, m0.files.head)
    val extra = "part-claimed-slot.wtsv"
    java.nio.file.Files.copy(src.toPath, new File(dir, extra).toPath)
    java.nio.file.Files.copy(
      new File(dir, WarehouseSink.statsFile(m0.files.head)).toPath,
      new File(dir, WarehouseSink.statsFile(extra)).toPath)
    WarehouseSink.writeManifestFileOnly(dir,
      m0.copy(version = 1L, files = m0.files :+ extra, op = "append"))
    // The next append collides with slot 1, waits out the missing swap,
    // then REBASES on the claimed manifest — the winner's file survives.
    (100L until 105L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val live = WarehouseSink.readManifest(dir).get
    assert(live.version === 2L)
    assert(live.files.contains(extra))
    assert(ids(dir) === ((0L until 10L) ++ (0L until 10L) ++
      (100L until 105L)).sorted) // duplicated ids: the copied file's rows
  }
}
