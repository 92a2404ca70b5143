package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Both artifact-materialization modes: executor-local (default) and the
  * reliable-checkpoint posture for preemptible clusters. */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("artifact() uses local checkpoint blocks when no checkpoint dir is set") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val out = Materialize.artifact(Seq(1, 2, 3).toDF("x"))
    assert(out.as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    // Local checkpoint: nothing written to any checkpoint dir; the plan
    // is truncated to a scan of materialized blocks.
    assert(out.queryExecution.optimizedPlan.collectLeaves().nonEmpty)
  }

  test("artifact() writes a RELIABLE checkpoint when a dir is configured, and the toggle opts out") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val out = Materialize.artifact(
        Seq(("a", 1L), ("b", 2L)).toDF("k", "v").filter(col("v") > 0))
      assert(out.as[(String, Long)].collect().toSet === Set(("a", 1L), ("b", 2L)))
      // The artifact must actually live in the reliable dir — executor
      // loss then degrades to a re-read instead of a failed job.
      def ckptFiles =
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(ckptFiles > 0, "no files under the reliable checkpoint dir")
      // Opt-out toggle: same session, conf flips the mode back to local.
      spark.conf.set(Materialize.ReliableConfKey, "false")
      val before = ckptFiles
      val out2 = Materialize.artifact(Seq(9).toDF("x"))
      assert(out2.as[Int].head() === 9)
      assert(ckptFiles === before, "opt-out still wrote a reliable checkpoint")
      // Downstream operators run end-to-end in reliable mode too.
      spark.conf.set(Materialize.ReliableConfKey, "true")
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
      val comps = Components.connected(edges, "id1", "id2")
        .as[(Long, Long)].collect().toMap
      assert(comps(1L) === comps(3L))
      assert(comps(10L) != comps(1L))
    } finally {
      // The shared session has no public checkpoint-dir unset; leaving
      // the conf off restores prior behavior for every other suite.
      spark.conf.set(Materialize.ReliableConfKey, "false")
    }
  }
}
