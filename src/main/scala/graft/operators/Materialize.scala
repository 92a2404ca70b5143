package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization with truncated lineage, in two flavors that
  * differ in LIFETIME, not mechanism:
  *
  *  - [[artifact]] — small, long-lived DERIVED ARTIFACTS (dedup pair
  *    lists, component labels, top-k heads): lineage above them is an
  *    iterative or multi-join plan that must not replay on every
  *    downstream action, and they may be consumed long after the
  *    operator returns. Mode is chosen per session:
  *      - `localCheckpoint` (default): executor-local blocks — fastest,
  *        and correct on a static cluster, but an executor lost AFTER
  *        truncation (spot reclaim, dynamic-allocation scale-in) makes
  *        the artifact unrecoverable: downstream actions fail instead of
  *        recomputing.
  *      - RELIABLE checkpoint: when the session has a checkpoint dir
  *        (`sc.setCheckpointDir` / `spark.checkpoint.dir`) and
  *        `graft.artifact.reliableCheckpoint` is not "false", artifacts
  *        are written there (HDFS/object store) so executor loss
  *        degrades to a re-read — the right posture on preemptible
  *        clusters. CLEANUP CAVEAT: reliable checkpoint files are NOT
  *        removed by the ContextCleaner unless the session was started
  *        with `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  *        (a static conf, default false); otherwise they live until the
  *        checkpoint dir itself is cleaned. That cost is acceptable
  *        precisely because artifacts are small (pairs/labels/heads) —
  *        which is why corpus-sized frames must never route here.
  *
  *  - [[transient]] — corpus/batch-sized INTERMEDIATES scoped to one
  *    operator invocation (shingle tables, minhash/simhash signature
  *    tables, bloom-probed batches): they feed 2-3 concurrent subtrees
  *    of a single action, where a lazy persist is racy (each stage
  *    re-runs the build before the cache fills). Always
  *    `localCheckpoint`, REGARDLESS of the session's reliable-artifact
  *    setting: the blocks are freed by the ContextCleaner on GC, so a
  *    long session never accumulates corpus-sized files in a durable
  *    checkpoint dir. Executor loss mid-operator just fails that
  *    operator's action (the caller retries) — transient intermediates
  *    don't need to outlive it.
  */
object Materialize {

  val ReliableConfKey = "graft.artifact.reliableCheckpoint"

  /** Materialize a small long-lived artifact eagerly with truncated
    * lineage, reliably if the session is configured for it (class doc). */
  def artifact(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.sparkContext.getCheckpointDir.isDefined &&
        spark.conf.get(ReliableConfKey, "true") != "false"
    if (reliable) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }

  /** Materialize a corpus/batch-sized intra-operator intermediate
    * eagerly: always executor-local blocks (GC-freed), never the
    * reliable checkpoint dir (class doc). */
  def transient(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)
}
