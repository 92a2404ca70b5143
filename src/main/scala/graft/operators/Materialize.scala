package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization for DERIVED ARTIFACTS — the small frames the
  * iterative/self-join operators hand back (dedup pair lists, component
  * labels): lineage above them is an iterative or multi-join plan that
  * must not replay on every downstream action, so they are checkpointed
  * eagerly and the plan truncated.
  *
  * Two modes, chosen per session:
  *  - `localCheckpoint` (default): executor-local blocks — fastest, and
  *    correct on a static cluster, but an executor lost AFTER truncation
  *    (spot reclaim, dynamic-allocation scale-in) makes the artifact
  *    unrecoverable: downstream actions fail instead of recomputing.
  *  - RELIABLE checkpoint: when the session has a checkpoint dir
  *    (`sc.setCheckpointDir` / `spark.checkpoint.dir`) and
  *    `graft.artifact.reliableCheckpoint` is not "false", artifacts are
  *    written there (HDFS/object store) so executor loss degrades to a
  *    re-read. That is the right default posture on any cluster with
  *    preemptible executors; the artifacts are small (pairs/labels), so
  *    the extra write is noise next to the compute above it.
  */
object Materialize {

  val ReliableConfKey = "graft.artifact.reliableCheckpoint"

  /** Materialize `df` eagerly with truncated lineage, reliably if the
    * session is configured for it (see class doc). */
  def artifact(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.sparkContext.getCheckpointDir.isDefined &&
        spark.conf.get(ReliableConfKey, "true") != "false"
    if (reliable) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }
}
