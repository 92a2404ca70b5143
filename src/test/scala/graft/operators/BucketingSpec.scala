package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB co-located join strategy: both fact tables
  * pre-partitioned on the join key at write time, so the join compiles to
  * zero Exchange operators. This spec proves the plan shape, not just the
  * result. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fingerprint store: incremental dedup anti-join never shuffles the store") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // The corpus fingerprint store, bucketed on fp — the layout
      // Dedup.incrementalExact's scaladoc promises removes the store-side
      // shuffle entirely at 100 TB.
      val store = (1 to 2000).map(i => s"fp$i").toDF("fp")
      store.write.mode("overwrite").bucketBy(8, "fp").sortBy("fp")
        .saveAsTable("graft_fp_store")
      val batch = (1500 to 2500).map(i => (i.toLong, s"fp$i")).toDF("doc_id", "fp")
      val kept = batch.join(spark.table("graft_fp_store"), Seq("fp"), "left_anti")
      val plan = kept.queryExecution.executedPlan.toString
      // Exactly ONE shuffle — the batch side. The store scan is bucketed,
      // so its side of the join has no Exchange.
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 1, s"expected one shuffle (batch side only):\n$plan")
      assert(kept.select("doc_id").as[Long].collect().toSet ===
        (2001L to 2500L).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_fp_store")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("compactTo rewrites a small-file directory into the computed file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"
    // 40 tiny files.
    (1 to 4000).map(i => (i.toLong, s"row $i")).toDF("id", "v")
      .repartition(40).write.mode("overwrite").parquet(src)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles(src) === 40)
    val n = Etl.compactTo(spark, src, dst, targetBytes = 512L * 1024)
    assert(parquetFiles(dst) === n)
    assert(parquetFiles(dst) < 40)
    assert(spark.read.parquet(dst).count() === 4000)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val left = (1 to 1000).map(i => (i.toLong % 100, s"l$i")).toDF("k", "lv")
      val right = (1 to 500).map(i => (i.toLong % 100, s"r$i")).toDF("k", "rv")
      left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bucketed_l")
      right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bucketed_r")
      val joined = spark.table("graft_bucketed_l")
        .join(spark.table("graft_bucketed_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free join, got:\n$plan")
      assert(joined.count() == 1000L * 5) // 10 l-rows x 5 r-rows per key x 100 keys
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_r")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
