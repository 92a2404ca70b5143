package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("parseJson extracts typed fields, null on malformed rows") {
    val df = Seq("""{"k": 42}""", """{"k": 7, "extra": true}""", "not json", null)
      .toDF("props")
    val got = Semi.parseJson(df, "props", "k INT")
      .select(Semi.jsonField("props", "k")).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(42), Some(7), None, None))
  }

  test("CSV sink/source round-trip with explicit schema (GCS->BQ load analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val path = s"$dir/t"
    val orig = Seq((1L, "a,b", 1.5), (2L, "plain", -0.25)).toDF("id", "name", "v")
    orig.write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(path)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      orig.as[(Long, String, Double)].collect().toSet)
  }

  test("RangeSource DSv2: correct rows, planning-time range narrowing, column pruning") {
    def load() = spark.read.format("graft.sources.RangeSource")
      .option("rows", "1000").option("users", "10").option("slices", "4").load()
    // Full read: row function is exact.
    val all = load()
    assert(all.count() === 1000)
    val r7 = all.filter(col("id") === 7L)
      .as[(Long, Long, String, Double)].head()
    assert(r7 === ((7L, 7L, "purchase", ((7L * 2654435761L) % 1000000L) / 100.0)))
    // Filter pushdown narrows planInputPartitions: 100 ids over 4 slices.
    val narrowed = load().filter(col("id") >= 100L && col("id") < 200L)
    assert(narrowed.count() === 100)
    assert(narrowed.rdd.getNumPartitions === 4)
    // The scan itself reports the narrowed window (planning-time pruning,
    // not a post-scan filter).
    val scan = narrowed.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.scan.description().contains("lo=100"))
    assert(scan.scan.description().contains("hi=200"))
    // Column pruning: a 2-column projection reaches the reader.
    val pruned = load().select("etype", "uid")
    val prunedScan = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(prunedScan.scan.readSchema().fieldNames.toSet === Set("etype", "uid"))
    // uid = i%10 determines etype = i%5 (10 is a multiple of 5) → exactly
    // lcm(10,5) = 10 distinct pairs.
    assert(pruned.distinct().count() === 10)
  }

  test("RangeSource answers count/min/max at planning time (aggregate pushdown)") {
    def load() = spark.read.format("graft.sources.RangeSource")
      .option("rows", "100000").option("users", "10").option("slices", "4").load()
    val windowed = load().filter(col("id") >= 5000L && col("id") < 95000L)
    val agg = windowed.agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    // Complete pushdown: the scan IS the aggregate — no HashAggregate node
    // and no 90k-row generation.
    assert(plan.contains("AGG-pushdown"), s"expected pushed-down agg scan:\n$plan")
    assert(!plan.contains("HashAggregate"), s"expected no post-scan aggregate:\n$plan")
    assert(agg.as[(Long, Long, Long)].head() === ((90000L, 5000L, 94999L)))
    // A non-id residual filter blocks the pushdown and falls back to a
    // real scan + aggregate with the same answer.
    val mixed = load().filter(col("id") < 10L && col("etype") === "view")
    val fallback = mixed.agg(count(lit(1)))
    assert(fallback.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(fallback.as[Long].head() === 2L) // ids 0 and 5 are "view"
  }

  test("RangeSource pushes limit and TopN into the generator window") {
    def load() = spark.read.format("graft.sources.RangeSource")
      .option("rows", "100000").option("users", "10").option("slices", "4").load()
    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.get.scan.description()
    // Plain LIMIT: generation stops at n rows at PLANNING time.
    val limited = load().limit(5)
    assert(scanDesc(limited).contains("hi=5"), scanDesc(limited))
    assert(limited.as[(Long, Long, String, Double)].collect().map(_._1).toSeq
      === (0L until 5L).toSeq)
    // Composes with filter pushdown: the window narrows first, then cuts.
    val both = load().filter(col("id") >= 1000L).limit(10)
    assert(scanDesc(both).contains("lo=1000") && scanDesc(both).contains("hi=1010"),
      scanDesc(both))
    assert(both.count() === 10)
    // TopN desc on id: the window keeps its LAST n indices.
    val topDesc = load().orderBy(col("id").desc).limit(3)
    assert(scanDesc(topDesc).contains("lo=99997"), scanDesc(topDesc))
    assert(topDesc.select("id").as[Long].collect().toSeq
      === Seq(99999L, 99998L, 99997L))
    // TopN asc keeps the FIRST n.
    val topAsc = load().orderBy(col("id").asc).limit(3)
    assert(scanDesc(topAsc).contains("hi=3"), scanDesc(topAsc))
    assert(topAsc.select("id").as[Long].collect().toSeq === Seq(0L, 1L, 2L))
    // A residual (non-id) filter blocks the cut — the limit stays above a
    // real scan and the answer is unchanged.
    val residual = load().filter(col("etype") === "view").limit(4)
    assert(scanDesc(residual).contains("hi=100000"), scanDesc(residual))
    assert(residual.select("id").as[Long].collect().forall(_ % 5 == 0))
    assert(residual.count() === 4)
  }

  test("RangeSource streams as a micro-batch source with the same rows") {
    val q = spark.readStream.format("graft.sources.RangeSource")
      .option("rows", "500").option("users", "10").option("slices", "4").load()
      .groupBy("etype").count()
      .writeStream.format("memory").queryName("graft_range_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("graft_range_stream")
      .as[(String, Long)].collect().toMap
    assert(got.values.sum === 500L)
    assert(got("view") === 100L) // 500 rows / 5 cycling types
  }

  test("JSON-lines sink/source round-trip (Mongo export analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val path = s"$dir/t"
    val orig = Seq((1L, Seq("pop", "rock"), 9), (2L, Seq("jazz"), 5))
      .toDF("id", "genres", "score")
    orig.write.mode("overwrite").json(path)
    val back = spark.read.json(path).select("id", "genres", "score")
    assert(back.as[(Long, Seq[String], Long)].collect().toSet ==
      Set((1L, Seq("pop", "rock"), 9L), (2L, Seq("jazz"), 5L)))
  }

  test("JSONL quarantine routes malformed lines, keeps raw text for forensics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_q").toString
    val path = s"$dir/c"
    Seq(
      """{"doc_id":1,"source":"a","text":"good line"}""",
      """{"doc_id":2,"source":"a","text":""" + "\n", // truncated mid-object
      """not json at all""",
      """{"doc_id":4,"source":"b","text":"also good"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val got = Semi.readJsonlQuarantine(spark, path,
      "doc_id LONG, source STRING, text STRING")
    val ok = got.filter($"graft_status" === "ok")
      .select("doc_id").as[Long].collect().toSet
    assert(ok === Set(1L, 4L))
    // dead-letter rows keep the payload columns + the raw line; selecting
    // a payload column alongside is also what satisfies Spark's
    // only-corrupt-column query restriction on raw scans
    val corrupt = got.filter($"graft_status" === "corrupt")
      .select("doc_id", "_corrupt_record").as[(Option[Long], String)].collect()
    assert(corrupt.length === 2)
    assert(corrupt.map(_._2).contains("not json at all")) // raw line preserved
  }
}
