package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAndIvfSpec extends SparkSpec {
  import spark.implicits._

  test("salted top-k per group equals the unsalted plan exactly") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(i =>
      (if (i % 10 < 8) "hot" else s"g${i % 10}", i.toLong, rnd.nextDouble()))
      .toDF("g", "id", "v")
    val plain = Charts.topKPerGroup(df, "g", "v", "id", 5)
      .select("g", "id").as[(String, Long)].collect().toSet
    val salted = Skew.saltedTopKPerGroup(df, "g", "v", "id", 5, salts = 8)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salted global top-k equals plain topK") {
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 501).toDouble)).toDF("id", "v")
    val plain = Charts.topK(df, "v", "id", 10).select("id").as[Long].collect().toSet
    val salted = Skew.saltedTopK(df, "v", "id", 10, salts = 4)
      .select("id").as[Long].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join and shuffles on (key, salt)") {
    // hot key: 80% of fact rows share one supplier; dim has multiplicity 2
    val fact = (1 to 2000).map(i =>
      (if (i % 10 < 8) 1L else (i % 10).toLong, i.toLong)).toDF("k", "fact_id")
    val dim = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (9L, "e"))
      .toDF("k", "attr")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Skew.saltedJoin(fact, dim, "k", "fact_id", 8)
      val got = salted.select("k", "fact_id", "attr")
        .as[(Long, Long, String)].collect().sorted.toSeq
      val want = fact.join(dim, "k").select("k", "fact_id", "attr")
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(got === want)
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("graft_salt"), "join must key on the salt")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("IVF index probes nearest cells and finds close vectors") {
    // Two well-separated clusters; the query's cluster-mates must surface.
    val rnd = new scala.util.Random(3)
    def jitter() = (rnd.nextDouble() * 0.01).toFloat
    val a = (0L until 20L).map(i => (i, Array(1.0f + jitter(), jitter(), jitter())))
    val b = (20L until 40L).map(i => (i, Array(jitter(), 1.0f + jitter(), jitter())))
    val emb = (a ++ b).toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 2)
    val got = Similarity.ivfTopK(idx, "vec_id", "embedding",
      queryId = 0L, k = 5, nProbe = 1)
      .select("vec_id").as[Long].collect()
    assert(got.length == 5)
    assert(got.forall(_ < 20L)) // all from the query's own cluster
  }

  test("exact IVF top-k equals brute force on unclustered vectors") {
    // Uniform random directions — the worst case for IVF (no cluster
    // structure, cells have wide angular radii, so the bound must admit
    // many cells). Exactness must hold anyway, for several queries and ks.
    val rnd = new scala.util.Random(11)
    val emb = (0L until 300L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))).toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 8)
    for (q <- Seq(0L, 17L, 123L); k <- Seq(1, 10)) {
      val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, k)
        .as[(Long, Double)].collect().toSeq
      val exact = Similarity.ivfTopKExact(idx, "vec_id", "embedding", q, k)
        .as[(Long, Double)].collect().toSeq
      assert(exact === brute, s"mismatch at q=$q k=$k")
    }
    idx.release()
  }

  test("exact IVF probes few cells when clusters are tight") {
    // Clustered case: the bound should cut probing to ~1 cell. Verified
    // indirectly — results match brute force AND the query's own cluster
    // dominates — plus directly via cellMinCos (tight radii ⇒ high min-cos).
    val rnd = new scala.util.Random(5)
    def jitter() = (rnd.nextDouble() * 0.01).toFloat
    val a = (0L until 30L).map(i => (i, Array(1.0f + jitter(), jitter(), jitter())))
    val b = (30L until 60L).map(i => (i, Array(jitter(), 1.0f + jitter(), jitter())))
    val emb = (a ++ b).toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 2)
    val radii = Similarity.cellMinCos(idx, "embedding")
    assert(radii.values.forall(_ > 0.99)) // tight cells
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 3L, 10)
      .as[(Long, Double)].collect().toSeq
    val exact = Similarity.ivfTopKExact(idx, "vec_id", "embedding", 3L, 10)
      .as[(Long, Double)].collect().toSeq
    assert(exact === brute)
    idx.release()
  }

  test("filtered exact IVF equals pre-filtered brute force, pruning survives") {
    import org.apache.spark.sql.functions.col
    // Three tight clusters; labels split WITHIN clusters so the filter
    // is orthogonal to the cell layout.
    val rnd = new scala.util.Random(11)
    def jitter() = (rnd.nextDouble() * 0.01).toFloat
    val a = (0L until 30L).map(i => (i, Array(1.0f + jitter(), jitter(), jitter())))
    val b = (30L until 60L).map(i => (i, Array(jitter(), 1.0f + jitter(), jitter())))
    val c = (60L until 90L).map(i => (i, Array(jitter(), jitter(), 1.0f + jitter())))
    val emb = (a ++ b ++ c).map { case (i, v) => (i, v, i % 2) }
      .toDF("vec_id", "embedding", "label")
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 3)
    for (q <- Seq(3L, 45L, 70L); k <- Seq(5, 10)) {
      val brute = Similarity.cosineTopKFiltered(emb, "vec_id", "embedding",
        q, k, col("label") === 1).as[(Long, Double)].collect().toSeq
      val (df, probed) = Similarity.ivfTopKExactImpl(idx, "vec_id",
        "embedding", q, k, col("label") === 1)
      assert(df.as[(Long, Double)].collect().toSeq === brute,
        s"filtered mismatch at q=$q k=$k")
      // the predicate must not defeat cell pruning: tight clusters with
      // in-cluster matches stop the probe loop before the full index
      assert(probed.size < 3, s"no pruning at q=$q k=$k: probed $probed")
    }
    // filter that empties a cluster entirely: still exact (k starves to
    // the eligible count), never errors
    val none = Similarity.ivfTopKExactFiltered(idx, "vec_id", "embedding",
      3L, 5, col("vec_id") >= 60L).as[(Long, Double)].collect().toSeq
    val bruteNone = Similarity.cosineTopKFiltered(emb, "vec_id", "embedding",
      3L, 5, col("vec_id") >= 60L).as[(Long, Double)].collect().toSeq
    assert(none === bruteNone)
    idx.release()
  }

  test("batched IVF probe: all-cells == brute force per query; partial probes keep recall; one index scan") {
    val rnd = new scala.util.Random(23)
    val emb = (0L until 300L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))).toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 8)
    val queries = Seq(0L, 17L, 123L, 250L)
    // nProbe = nLists probes everything: identical rows to the exact
    // brute-force batch, per query, scores included.
    val all = Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
      queries, k = 10, nProbe = 8)
      .as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
      queries, k = 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(all === brute)
    // Partial probe: recall@10 ≥ 0.5 on uniform vectors (IVF's worst
    // case) with half the cells probed — the scale path trades exactly
    // this bounded recall for reading nProbe/nLists of the corpus.
    val half = Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
      queries, k = 10, nProbe = 4)
      .as[(Long, Long, Double)].collect().toSet
    val recall = half.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.5, s"recall@10 = $recall")
    // One pass over the index: the plan has exactly two leaves — the
    // corpus scan and the tiny probe table — and the probe side joins by
    // BROADCAST, so no second corpus read and no shuffle of the corpus
    // onto the query key before scoring.
    val plan = Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
      queries, k = 10, nProbe = 8).queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).size === 1,
      s"expected exactly one corpus scan, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe table must broadcast-join the corpus scan:\n$plan")
    idx.release()
  }

  test("ivfAppend assigns new vectors to their nearest existing cell, no refit") {
    val rnd = new scala.util.Random(13)
    def jitter() = (rnd.nextDouble() * 0.01).toFloat
    val a = (0L until 20L).map(i => (i, Array(1.0f + jitter(), jitter(), jitter())))
    val b = (20L until 40L).map(i => (i, Array(jitter(), 1.0f + jitter(), jitter())))
    val idx = Similarity.ivfIndex((a ++ b).toDF("vec_id", "embedding"),
      "vec_id", "embedding", nLists = 2)
    // Appended vectors: one clearly in each cluster.
    val extra = Seq((100L, Array(1.05f, 0.0f, 0.0f)), (101L, Array(0.0f, 1.05f, 0.0f)))
      .toDF("vec_id", "embedding")
    val grown = Similarity.ivfAppend(idx, extra, "embedding")
    assert(grown.assigned.count() === 42)
    // Each appended vector's cell must equal the driver-computed argmin
    // over the existing centroids (the no-refit contract).
    val cells = grown.assigned.filter($"vec_id" >= 100L)
      .select("vec_id", "graft_cell").as[(Long, Int)].collect().toMap
    def nearest(v: Array[Double]): Int = idx.centers.minBy { case (_, c) =>
      c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum }._1
    assert(cells(100L) === nearest(Array(1.05, 0.0, 0.0)))
    assert(cells(101L) === nearest(Array(0.0, 1.05, 0.0)))
    // Probing the grown index's cell surfaces the appended member (k covers
    // the whole cell: 20 originals + 1 appended, query excluded).
    val got = Similarity.ivfTopK(grown, "vec_id", "embedding", 0L, 25, 1)
      .select("vec_id").as[Long].collect().toSet
    assert(got.contains(100L) && got.size === 20)
    idx.release()
  }

  test("persisted IVF index round-trips and probes prune partitions") {
    val rnd = new scala.util.Random(9)
    def jitter() = (rnd.nextDouble() * 0.01).toFloat
    val a = (0L until 20L).map(i => (i, Array(1.0f + jitter(), jitter(), jitter())))
    val b = (20L until 40L).map(i => (i, Array(jitter(), 1.0f + jitter(), jitter())))
    val emb = (a ++ b).toDF("vec_id", "embedding")
    val fresh = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.saveIndex(fresh, dir)
    val loaded = Similarity.loadIndex(spark, dir)
    assert(loaded.centers.map(_._1).toSeq === Seq(0, 1))
    val freshTop = Similarity.ivfTopK(fresh, "vec_id", "embedding", 0L, 5, 1)
      .select("vec_id").as[Long].collect().toSet
    val loadedTop = Similarity.ivfTopK(loaded, "vec_id", "embedding", 0L, 5, 1)
      .select("vec_id").as[Long].collect().toSet
    assert(loadedTop === freshTop)
    // The probe filter must reach the scan as a partition filter (directory
    // pruning — the mechanism that skips (nLists-nProbe)/nLists of the data).
    val probePlan = loaded.assigned.filter(col("graft_cell") === 0)
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters: [isnotnull(graft_cell"))
  }

  test("joinCardinalityAudit: exact pair counts, shares, and key-miss drop") {
    import spark.implicits._
    // key 1: 3×2=6 pairs; key 2: 1×4=4; key 3 left-only, key 4
    // right-only — non-matching keys contribute NOTHING (inner-join
    // semantics, the honest cardinality).
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val right = Seq(1L, 1L, 2L, 2L, 2L, 2L, 4L).toDF("j")
    val got = Skew.joinCardinalityAudit(left, right, "k", "j", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length === 2)
    assert(got(0) === ((1L, 3L, 2L, 6L, 600000L, 10L)))
    assert(got(1) === ((2L, 1L, 4L, 4L, 400000L, 10L)))
  }
}
