package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  /** 5 pages × 20 rows fixture: id dense 0..99, page = id / 20. */
  private def writePages(dir: String, n: Int = 100, pageSize: Int = 20): Int =
    PagedEndpoint.writeFixture(
      spark.range(n).select(
        to_json(struct(col("id"), concat(lit("name"), col("id")).as("name"),
          (col("id") * lit(2.5)).as("score"))).as("value"),
        (col("id") / pageSize).cast("int").as("page")),
      dir)

  private def load(dir: String, slices: Int = 4, extra: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read.format("graft.sources.PagedSource")
      .option("dir", dir).option("slices", slices.toString)
      .option("schema", "id LONG, name STRING, score DOUBLE")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("batch read: page slicing into partitions, exact rows, column pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged1").toString
    assert(writePages(dir) === 5)
    val df = load(dir)
    // 5 pages over 4 slices → ceil → 2 pages per partition → 3 partitions
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 100)
    val r7 = df.filter(col("id") === 7L).as[(Long, String, Double)].head()
    assert(r7 === ((7L, "name7", 17.5)))
    // pruning: the scan description lists only the requested columns
    val pruned = df.select("name")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("cols=name"), desc.take(500))
    assert(pruned.as[String].collect().toSet === (0 until 100).map("name" + _).toSet)
  }

  test("pushed LIMIT stops the page walk: a preview never crawls the API") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pagedlim").toString
    assert(writePages(dir) === 5)
    // drop every page after the first; the declared count still says 5
    (1 until 5).foreach(p => assert(PagedEndpoint.pageFile(dir, p).delete()))
    val df = load(dir, extra = Map("pages" -> "5", "maxRetries" -> "0"))
    val preview = df.limit(10)
    val desc = preview.queryExecution.executedPlan.toString
    assert(desc.contains("limit=10"), desc.take(500))
    // one sequential partition, and rows come only from page 0
    assert(preview.rdd.getNumPartitions === 1)
    assert(preview.select("id").as[Long].collect().toSeq === (0L until 10L))
    // limit larger than one page but satisfied before the missing pages
    assert(df.limit(20).count() === 20)
    // without the limit the scan must fault on the missing page —
    // proving the preview really never fetched past its answer
    intercept[org.apache.spark.SparkException] { df.count() }
  }

  test("declared page count skips the probe and bounds the read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged2").toString
    writePages(dir)
    // declaring 3 of the 5 pages reads exactly pages 0..2 (ids 0..59)
    val df = load(dir, extra = Map("pages" -> "3"))
    assert(df.count() === 60)
    assert(df.agg(max("id")).as[Long].head() === 59L)
  }

  test("schema inference from page 0 sample: field kinds and order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged3").toString
    PagedEndpoint.writeFixture(
      Seq((0, """{"id": 1, "tags": ["a","b"], "ok": true, "ratio": 0.5, "s": "x"}"""),
          (0, """{"id": 2, "tags": [], "ok": false, "ratio": 2, "s": "y"}"""))
        .toDF("page", "value").select("value", "page"),
      dir)
    val df = spark.read.format("graft.sources.PagedSource").option("dir", dir).load()
    assert(df.schema.map(f => f.name -> f.dataType.simpleString) === Seq(
      "id" -> "bigint", "tags" -> "array<string>", "ok" -> "boolean",
      "ratio" -> "double", "s" -> "string"))
    val r = df.filter(col("id") === 1L).head()
    assert(r.getSeq[String](r.fieldIndex("tags")) === Seq("a", "b"))
    assert(r.getBoolean(r.fieldIndex("ok")))
  }

  test("bounded retry rides out transient failures; budget exhaustion fails the task") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged4").toString
    writePages(dir)
    // 2 injected failures, 3 retries → succeeds, all rows intact
    PagedEndpoint.armFlaky(dir, page = 2, failures = 2)
    assert(load(dir, extra = Map("maxRetries" -> "3", "retryWaitMs" -> "1"))
      .count() === 100)
    // 5 injected failures, 1 retry → the fetch gives up and the task fails.
    // (Disable Spark's own task retries? local[*] already has 1 attempt.)
    PagedEndpoint.armFlaky(dir, page = 2, failures = 5)
    val e = intercept[org.apache.spark.SparkException] {
      load(dir, extra = Map("maxRetries" -> "1", "retryWaitMs" -> "1")).count()
    }
    assert(e.getMessage.contains("simulated") ||
      Option(e.getCause).exists(_.getMessage.contains("simulated")))
  }

  test("micro-batch stream: page cursor advances and resumes across a restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_paged5").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_paged5_ck").toString
    writePages(dir, n = 60, pageSize = 20) // pages 0..2
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.PagedSource")
        .option("dir", dir).option("slices", "2")
        .option("schema", "id LONG, name STRING, score DOUBLE")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.Once())
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
            .collect().foreach(v => seen.add((id, v)))
          ()
        }
        .start()
      q.awaitTermination()
    }
    run()
    assert(seen.size() === 60) // pages 0..2 consumed
    // producer appends pages 3..4 (ids 60..99): fixture writer overwrites,
    // so write the full feed again — the cursor must skip pages 0..2.
    writePages(dir, n = 100, pageSize = 20)
    run()
    val ids = seen.iterator()
    var total = 0
    var second = 0
    while (ids.hasNext) { val (b, _) = ids.next(); total += 1; if (b > 0) second += 1 }
    assert(total === 100)   // no page re-fetched after the restart
    assert(second === 40)   // the restarted query read exactly pages 3..4
  }
}
