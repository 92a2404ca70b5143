package graft

/** Automated plan audit over the ENTIRE driver contract: every query's
  * physical plan must be free of the one shape that cannot survive scale —
  * a non-broadcast CartesianProduct. (1-row broadcast cross joins compile
  * to BroadcastNestedLoopJoin and are the accepted pattern for attaching
  * scalar aggregates.) Building each plan also exercises every query's
  * eager setup path, so a contract-breaking regression fails HERE before
  * the driver's verify run does. */
class PlanAuditSpec extends SparkSpec {

  test("no query in the contract plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    // q312: Spark ML's ALSModel.recommendForAllUsers IS a deliberate
    // blocked cartesian — both factor matrices are pre-grouped into
    // blocks and the product pairs blocks, not rows (the standard
    // dense-scoring implementation; the per-row work is the blocked
    // top-k accumulator). The audit's target is ACCIDENTAL cartesians
    // from missing join keys, which this is not.
    val designedCartesians = Set("q312_als_eval")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => designedCartesians.contains(q._1))
      .flatMap {
        case (name, fn) =>
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
      }
    SparkEntry.releaseCaches()
    assert(offenders.isEmpty,
      s"queries with CartesianProduct plans: ${offenders.mkString(", ")}")
  }

  test("q81's anti-join plans one Exchange: the store side reads bucketed") {
    // Force the 100 TB join regime (a corpus fp store never broadcasts):
    // the batch side's window exchange must be the ONLY shuffle — its
    // hash partitioning (fp, shuffle-partitions) matches the store's
    // bucket spec, so the anti-join adds none.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SparkEntry.queries("q81_incremental_dedup")(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles === 1, s"expected one shuffle (batch window only):\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      SparkEntry.releaseCaches()
    }
  }
}
