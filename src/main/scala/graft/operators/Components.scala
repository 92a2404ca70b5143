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

  /** STRONGLY connected components over a DIRECTED edge list — the
    * cycle structure [[connected]]'s undirected pass cannot see (link
    * farms in a crawl host graph, mutual-citation clusters, feedback
    * loops in a lineage DAG check). Returns (id, scc) with scc = the
    * minimum node id of the component; every node appearing on either
    * edge side is labeled (a node on no cycle is its own singleton
    * SCC).
    *
    * Hybrid by the [[connected]] budget discipline: at or below
    * `driverEdgeBudget` edges (the post-similarity-join artifact scale)
    * an iterative Tarjan runs driver-local — one linear pass, exact.
    * Above it, the distributed Orzan-style coloring: per peel round,
    * min-id FORWARD-reachable (f) and BACKWARD-reachable (b) labels
    * propagate to fixpoint (each inner iteration one edge-keyed join —
    * the [[graft.operators.Graph.bfsHops]] shape); nodes with f = b
    * form exactly SCC(f) (f is reachable both ways), they peel off with
    * their edges, and the next round classifies the next DAG layer.
    * Peel rounds are bounded by the condensation-DAG depth; `maxPeels`
    * caps them and a non-empty remainder warns (the maxIters
    * discipline), never silently mislabels. */
  def stronglyConnected(pairs: DataFrame, srcCol: String, dstCol: String,
                        maxIters: Int = 25, maxPeels: Int = 12,
                        driverEdgeBudget: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edges0 = pairs.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges0.count()
    val idType = edges0.schema("a").dataType
    if (nEdges <= driverEdgeBudget) {
      // Iterative Tarjan (explicit stacks — no recursion depth limit).
      val rows = edges0.collect()
      edges0.unpersist()
      def cmp(x: Any, y: Any): Int =
        x.asInstanceOf[Comparable[Any]].compareTo(y)
      val adj = new java.util.HashMap[Any, java.util.ArrayList[Any]]()
      val nodes = new java.util.LinkedHashSet[Any]()
      rows.foreach { r =>
        val a = r.get(0); val b = r.get(1)
        nodes.add(a); nodes.add(b)
        adj.computeIfAbsent(a, _ => new java.util.ArrayList[Any]()).add(b)
      }
      val index = new java.util.HashMap[Any, Int]()
      val low = new java.util.HashMap[Any, Int]()
      val onStack = new java.util.HashSet[Any]()
      val stack = new java.util.ArrayDeque[Any]()
      val sccOf = new java.util.HashMap[Any, Any]()
      var counter = 0
      val it0 = nodes.iterator()
      while (it0.hasNext) {
        val root = it0.next()
        if (!index.containsKey(root)) {
          // work stack of (node, next-child cursor)
          val work = new java.util.ArrayDeque[(Any, Int)]()
          work.push((root, 0))
          index.put(root, counter); low.put(root, counter); counter += 1
          stack.push(root); onStack.add(root)
          while (!work.isEmpty) {
            val (v, ci) = work.pop()
            val kids = adj.getOrDefault(v, new java.util.ArrayList[Any]())
            if (ci < kids.size()) {
              work.push((v, ci + 1))
              val w = kids.get(ci)
              if (!index.containsKey(w)) {
                index.put(w, counter); low.put(w, counter); counter += 1
                stack.push(w); onStack.add(w)
                work.push((w, 0))
              } else if (onStack.contains(w)) {
                if (index.get(w) < low.get(v)) low.put(v, index.get(w))
              }
            } else {
              // post-visit: fold low into parent, pop an SCC at a root
              if (low.get(v) == index.get(v)) {
                val members = new java.util.ArrayList[Any]()
                var done = false
                while (!done) {
                  val w = stack.pop(); onStack.remove(w); members.add(w)
                  if (w == v) done = true
                }
                var mn = members.get(0)
                var i = 1
                while (i < members.size()) {
                  if (cmp(members.get(i), mn) < 0) mn = members.get(i)
                  i += 1
                }
                members.forEach(m => sccOf.put(m, mn))
              }
              if (!work.isEmpty) {
                val (p, _) = work.peek()
                if (low.get(v) < low.get(p)) low.put(p, low.get(v))
              }
            }
          }
        }
      }
      import scala.jdk.CollectionConverters._
      val out = nodes.asScala.toSeq
        .map(k => org.apache.spark.sql.Row(k, sccOf.get(k)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("scc", idType)))
      return Materialize.artifact(spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq,
          math.max(1, out.size / 500000 + 1)), schema))
    }
    // distributed peeling
    def minReach(edges: DataFrame, nodes: DataFrame,
                 forward: Boolean): DataFrame = {
      val e = if (forward) edges
        else edges.select(col("b").as("a"), col("a").as("b"))
      var labels = nodes.select(col("id"), col("id").as("lab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      var converged = false
      var iters = 0
      while (!converged && iters < maxIters) {
        val viaOut = e.join(labels.withColumnRenamed("id", "b"), Seq("b"))
          .groupBy(col("a").as("id")).agg(min(col("lab")).as("nb"))
        val next = labels.select(col("id"), col("lab").as("old"))
          .join(viaOut, Seq("id"), "left")
          .select(col("id"),
            least(col("old"), coalesce(col("nb"), col("old"))).as("lab"),
            col("old"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val changed = next
          .agg(count(when(col("lab") < col("old"), 1)).as("ch"))
          .head().getLong(0)
        labels.unpersist()
        labels = next
        converged = changed == 0L
        iters += 1
      }
      val out = labels.select(col("id"), col("lab"))
        .transform(Materialize.artifact)
      labels.unpersist()
      out
    }
    var edges = edges0
    var nodes = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var acc: DataFrame = null
    var peel = 0
    var empty = nodes.isEmpty
    while (!empty && peel < maxPeels) {
      val f = minReach(edges, nodes, forward = true)
      val b = minReach(edges, nodes, forward = false)
      val assigned = f.join(b.withColumnRenamed("lab", "blab"), Seq("id"))
        .filter(col("lab") === col("blab"))
        .select(col("id"), col("lab").as("scc"))
        .transform(Materialize.artifact)
      acc = if (acc == null) assigned else acc.unionByName(assigned)
      val rest = nodes.join(assigned.select("id"), Seq("id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val restEdges = edges
        .join(rest.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(rest.select(col("id").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      empty = rest.isEmpty
      nodes.unpersist(); edges.unpersist()
      nodes = rest; edges = restEdges
      peel += 1
    }
    if (!empty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"stronglyConnected(): maxPeels=$maxPeels exhausted — " +
          "unclassified nodes remain unlabeled; raise maxPeels")
    nodes.unpersist(); edges.unpersist()
    Materialize.artifact(acc)
  }
}
