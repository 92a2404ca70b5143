package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Runtime (dynamic) file pruning — SupportsRuntimeV2Filtering over the
  * stats sidecars: the DPP IN-list of join keys the build side actually
  * produced drops whole files at runtime, without Hive partitions. */
class WarehouseRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.WarehouseSink"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_whrf").toString

  private def writeClustered(dir: String): Unit =
    (0L until 400L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(8, col("id")) // 8 disjoint id-range files
      .sortWithinPartitions("id")
      .write.format(Fmt).option("path", dir).mode("overwrite").save()

  test("a runtime IN predicate prunes to the files whose ranges cover it") {
    val dir = tmp()
    writeClustered(dir)
    val schema = StructType.fromDDL(
      WarehouseSink.readManifest(dir).get.schemaDdl)
    val scan = new WarehouseScan(dir, schema)
    val all = scan.planInputPartitions().length
    assert(all === 8)
    // both keys land in the first 50-id range → exactly one file survives
    def lit(v: Long) = new org.apache.spark.sql.connector.expressions.Literal[Long] {
      override def value(): Long = v
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
    }
    scan.filter(Array(new Predicate("IN",
      Array(Expressions.column("id"), lit(3L), lit(17L)))))
    assert(scan.planInputPartitions().length === 1)
    // an untranslatable predicate prunes nothing (correctness never
    // rides on this path)
    val scan2 = new WarehouseScan(dir, schema)
    scan2.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(scan2.planInputPartitions().length === all)
  }

  test("dynamic pruning flows through a real join and stays correct") {
    val dir = tmp()
    writeClustered(dir)
    // the dim must be a SCAN (not a LocalRelation) for Spark's
    // PartitionPruning rule to rate its filter as selective
    val dimDir = tmp() + "/dim"
    Seq((3L, "a"), (17L, "a"), (390L, "b"), (999L, "c"))
      .toDF("id", "grp").write.parquet(dimDir)
    val fact = spark.read.format(Fmt).option("path", dir).load()
    val dim = spark.read.parquet(dimDir)
    val j = fact.join(dim.filter(col("grp") =!= "c"), Seq("id"))
      .select("id", "v", "grp")
    val got = j.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((3L, "v3", "a"), (17L, "v17", "a"),
      (390L, "v390", "b")))
    // the optimizer inserted a dynamic-pruning subquery and the executed
    // warehouse scan carries a NON-empty runtime filter list
    assert(j.queryExecution.optimizedPlan.toString.contains("dynamicpruning"))
    assert(j.queryExecution.executedPlan.toString.split("\n").exists(l =>
      l.contains("graft_warehouse") && l.contains("RuntimeFilters: [") &&
        !l.contains("RuntimeFilters: []")))
  }
}
