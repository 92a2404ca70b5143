package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — turns near-duplicate PAIRS
  * (minhash/simhash/jaccard output) into duplicate CLUSTERS, the form a
  * dedup pipeline actually consumes (keep one canonical doc per cluster).
  *
  * Algorithm: distributed min-label propagation with pointer jumping.
  * Every node starts labeled with its own id; each round a node takes the
  * min of its label and its neighbors' labels (propagation), then replaces
  * its label with its label's label (pointer jump — halves chain depth, so
  * convergence is O(log diameter) rounds, not O(diameter)). Each round is
  * a constant number of hash-shuffles over the EDGE list only (never the
  * corpus). The loop is driver-side control flow over fully distributed
  * steps with a convergence check — no data ever collects.
  */
object Components {

  /** @param pairs DataFrame with two ORDERABLE id columns (long ids in
    *              the dedup family, strings in the q369 name-entity
    *              resolution — min/least drive the label algebra, so any
    *              totally ordered type works); an undirected edge per
    *              row. Isolated docs are not emitted (no edge → no dup).
    * @return (id, cluster) where cluster = min id reachable from id —
    *         materialized eagerly ([[Materialize.artifact]]: local blocks,
    *         or the reliable checkpoint dir when one is set), so the caller gets a
    *         computed artifact with no cache-lifecycle obligations: the
    *         iteration chain is already cut and the blocks are freed by the
    *         ContextCleaner once the frame is collected. It is small (one
    *         row per node with an edge). */
  /** @param driverEdgeBudget edge count at or below which the component
    *        pass runs as a DRIVER-LOCAL union-find instead of the
    *        distributed round loop — the bpeMerges hybrid discipline:
    *        each distributed round costs a fixed handful of scheduled
    *        stages, so a few-hundred-edge graph pays seconds of pure
    *        scheduling for microseconds of work. The edge list is
    *        already the post-similarity-join artifact (pairs, never the
    *        corpus); ≤ budget edges is a bounded driver artifact by the
    *        same contract as the PQ training sample. Identical output
    *        (min reachable id — union-by-min keeps every root the
    *        component minimum, path compression keeps the walk linear);
    *        the distributed path is unchanged above the budget. */
  def connected(pairs: DataFrame, id1: String, id2: String,
                maxIters: Int = 25,
                driverEdgeBudget: Long = 1000000L): DataFrame = {
    val edges = pairs.select(col(id1).as("a"), col(id2).as("b"))
      .unionByName(pairs.select(col(id2).as("a"), col(id1).as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count() // also materializes the persist
    if (nEdges <= driverEdgeBudget) {
      val spark = pairs.sparkSession
      val idType = edges.schema("a").dataType
      val rows = edges.collect()
      val parent = new java.util.HashMap[Any, Any]()
      def cmp(x: Any, y: Any): Int =
        x.asInstanceOf[Comparable[Any]].compareTo(y)
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) {
          val nx = parent.get(c); parent.put(c, r); c = nx
        }
        r
      }
      rows.foreach { r =>
        val a = r.get(0); val b = r.get(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (cmp(ra, rb) <= 0) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      import scala.jdk.CollectionConverters._
      val out = parent.keySet().asScala.toSeq
        .map(k => org.apache.spark.sql.Row(k, find(k)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster", idType)))
      edges.unpersist()
      return Materialize.artifact(spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq,
          math.max(1, out.size / 500000 + 1)), schema))
    }
    var labels = edges.groupBy(col("a").as("id"))
      .agg(least(min(col("b")), first(col("a"))).as("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // Propagate: each node's new label = min(own, min over neighbors').
      // The pre-propagation label rides along as `old` so the convergence
      // check needs no extra join against the previous labels.
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("cluster")).as("nb"))
      val propagated = labels
        .select(col("id"), col("cluster").as("old"))
        .join(viaNeighbor, Seq("id"))
        .select(col("id"), least(col("old"), col("nb")).as("cluster"), col("old"))
      // Pointer jump: label ← label(label). Labels are node ids, and every
      // node has a label row, so the self-join always matches; the jumped
      // label is ≤ the current one by construction.
      val next = propagated
        .join(propagated.select(col("id").as("cluster"), col("cluster").as("c2")),
          Seq("cluster"))
        .select(col("id"), col("c2").as("cluster"), col("old"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // ONE action per round: the aggregate both fully materializes the
      // persisted `next` (so the following round reads cached blocks — a
      // limit(1) probe would leave most partitions uncomputed and replayed)
      // and counts the label changes for the convergence test.
      val changed = next
        .agg(count(when(col("cluster") < col("old"), 1)).as("ch"))
        .head().getLong(0)
      labels.unpersist()
      labels = next
      converged = changed == 0L
      iters += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connected(): maxIters=$maxIters exhausted before convergence — " +
          "returned labels may be partially propagated; raise maxIters")
    // Hand back a materialized artifact and release the loop's caches: the
    // final pass reads the (tiny, fully cached) label table once.
    val out = labels.select(col("id"), col("cluster")).transform(Materialize.artifact)
    labels.unpersist()
    edges.unpersist()
    out
  }
}
