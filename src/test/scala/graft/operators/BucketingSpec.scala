package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB co-located join strategy: both fact tables
  * pre-partitioned on the join key at write time, so the join compiles to
  * zero Exchange operators. This spec proves the plan shape, not just the
  * result. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

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
