package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.8f, 0.2f, 0.1f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("cosineTopK ranks by similarity to the query vector") {
    val got = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.head == 1L)       // closest
    assert(got.last != 3L)       // opposite vector not in top-3 of 4? it is 4th
    assert(got == Seq(1L, 4L, 2L))
  }

  test("cosineTopKBatch answers each query like per-query cosineTopK") {
    val batch = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 2L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val grouped = batch.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    for (q <- Seq(0L, 2L)) {
      val single = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 3)
        .as[(Long, Double)].collect().toSeq
      assert(grouped(q) === single, s"query $q")
    }
    assert(batch.length === 6)
  }

  test("annBucketTopK returns candidates from the query's bucket, ranked") {
    val got = Similarity.annBucketTopK(emb, "vec_id", "embedding",
      dim = 4, nBits = 2, queryId = 0L, k = 5)
      .select("vec_id", "cos").as[(Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq) // desc order
    assert(!got.map(_._1).contains(0L))
  }

  test("pqTopK with refine covering the corpus equals brute force exactly") {
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dim = 4, m = 2,
      k = 2)
    try {
      val pq = Similarity.pqTopK(idx, emb, "vec_id", "embedding",
        queryId = 0L, k = 3, refine = 10)
        .select("vec_id", "cos").as[(Long, Double)].collect().toSeq
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 3)
        .select("vec_id", "cos").as[(Long, Double)].collect().toSeq
      assert(pq === exact) // re-rank over all candidates = brute force
    } finally idx.release()
  }

  test("PQ index round-trips through parquet and probes identically") {
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dim = 4, m = 2,
      k = 2)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
      Similarity.savePqIndex(idx, dir)
      val loaded = Similarity.loadPqIndex(spark, dir)
      assert(loaded.m === idx.m && loaded.dsub === idx.dsub)
      assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
        idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      val fresh = Similarity.pqTopK(idx, emb, "vec_id", "embedding", 0L, 3, 10)
        .as[(Long, Double)].collect().toSeq
      val reloaded = Similarity.pqTopK(loaded, emb, "vec_id", "embedding", 0L, 3, 10)
        .as[(Long, Double)].collect().toSeq
      assert(reloaded === fresh)
    } finally idx.release()
  }

  test("pqTopK recall@20 vs brute force on real embeddings ≥ 0.9") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // Default maxTrain (100k) covers this 500-vector corpus entirely —
    // the absolute-size bound matters at corpus scale, not here.
    val idx = Similarity.pqIndex(real, "vec_id", "embedding", dim = 64)
    try {
      val exact = Similarity.cosineTopK(real, "vec_id", "embedding", 0L, 20)
        .select("vec_id").as[Long].collect().toSet
      val pq = Similarity.pqTopK(idx, real, "vec_id", "embedding",
        queryId = 0L, k = 20, refine = 100)
        .select("vec_id").as[Long].collect().toSet
      val recall = (exact & pq).size.toDouble / exact.size
      assert(recall >= 0.9, s"PQ recall@20 = $recall")
    } finally idx.release()
  }

  test("pqIndex training sample is bounded by maxTrain and deterministic") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // maxTrain far below the corpus size: the codebooks must still train
    // (on exactly maxTrain hash-ordered vectors) and two builds must agree
    // bit-for-bit — the sample is a pure function of ids, not partitioning.
    val a = Similarity.pqIndex(real, "vec_id", "embedding", dim = 64,
      maxTrain = 50)
    val b = Similarity.pqIndex(
      real.repartition(7), "vec_id", "embedding", dim = 64, maxTrain = 50)
    try {
      assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
        b.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      val probe = Similarity.pqTopK(a, real, "vec_id", "embedding",
        queryId = 0L, k = 5, refine = 50)
      assert(probe.count() === 5L)
    } finally { a.release(); b.release() }
  }

  test("mutualTopK equals the reciprocal closure of per-query top-k") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L)
    val topk = ids.map(q => q -> Similarity
      .cosineTopK(emb, "vec_id", "embedding", q, 2)
      .select("vec_id").as[Long].collect().toSet).toMap
    val expected = (for {
      i <- ids; j <- ids
      if i < j && topk(i).contains(j) && topk(j).contains(i)
    } yield (i, j)).toSet
    val got = Similarity.mutualTopK(emb, "vec_id", "embedding", k = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(expected.nonEmpty) // fixture has at least one reciprocal pair
    // one-sided neighbors must NOT appear: every kept pair is reciprocal
    got.foreach { case (i, j) =>
      assert(topk(i).contains(j) && topk(j).contains(i), s"pair ($i,$j)") }
  }

  test("ivfPqTopK: exact configuration equals brute force; production point holds recall") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = real.count().toInt
    val idx = Similarity.ivfPqIndex(real, "vec_id", "embedding",
      dim = 64, nLists = 8, m = 8, k = 16)
    try {
      val exact = Similarity.cosineTopK(real, "vec_id", "embedding", 0L, 10)
        .as[(Long, Double)].collect().toSeq
      // probe EVERY cell with refine ≥ corpus: the re-rank sees all ids,
      // so the composed index must reproduce brute force row-for-row
      val full = Similarity.ivfPqTopK(idx, real, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 8, refine = n)
        .as[(Long, Double)].collect().toSeq
      assert(full === exact)
      // production operating point: a fraction of the cells, bounded
      // refine — recall@10 must stay useful
      val probe = Similarity.ivfPqTopK(idx, real, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 4, refine = 100)
        .select("vec_id").as[Long].collect().toSet
      val recall = (exact.map(_._1).toSet & probe).size.toDouble / 10
      assert(recall >= 0.6, s"IVF-PQ recall@10 = $recall")
    } finally idx.release()
  }

  test("ivfPqTopKBatch answers each query like per-query ivfPqTopK; full probe equals brute force") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = real.count().toInt
    val idx = Similarity.ivfPqIndex(real, "vec_id", "embedding",
      dim = 64, nLists = 8, m = 8, k = 16)
    try {
      val qids = Seq(0L, 1L, 2L)
      // production operating point: batch rows must equal the per-query
      // probe row-for-row (same ADC association, refine cut, tiebreaks)
      val batch = Similarity.ivfPqTopKBatch(idx, real, "vec_id", "embedding",
        queryIds = qids, k = 10, nProbe = 4, refine = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val grouped = batch.groupBy(_._1)
        .view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      for (q <- qids) {
        val single = Similarity.ivfPqTopK(idx, real, "vec_id", "embedding",
          queryId = q, k = 10, nProbe = 4, refine = 100)
          .as[(Long, Double)].collect().toSeq
        assert(grouped(q) === single, s"query $q")
      }
      // exact configuration: every cell probed, refine ≥ corpus — each
      // query's rows reproduce brute force exactly
      val full = Similarity.ivfPqTopKBatch(idx, real, "vec_id", "embedding",
        queryIds = qids, k = 10, nProbe = 8, refine = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      for (q <- qids) {
        val exact = Similarity.cosineTopK(real, "vec_id", "embedding", q, 10)
          .as[(Long, Double)].collect().toSeq
        assert(full(q) === exact, s"query $q full-probe")
      }
    } finally idx.release()
  }

  test("IVF-PQ index round-trips through parquet and probes identically") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfPqIndex(real, "vec_id", "embedding",
      dim = 64, nLists = 8, m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    try {
      Similarity.saveIvfPqIndex(idx, dir)
      val loaded = Similarity.loadIvfPqIndex(spark, dir)
      assert(loaded.m === idx.m && loaded.dsub === idx.dsub)
      assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
        idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      val a = Similarity.ivfPqTopK(idx, real, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 4, refine = 100)
        .as[(Long, Double)].collect().toSeq
      val b = Similarity.ivfPqTopK(loaded, real, "vec_id", "embedding",
        queryId = 0L, k = 10, nProbe = 4, refine = 100)
        .as[(Long, Double)].collect().toSeq
      assert(a === b)
      // the persisted probe PRUNES: scanning 4 of 8 cells must read only
      // those partition directories
      import org.apache.spark.sql.functions.col
      val plan = loaded.codes
        .filter(col("graft_cell").isin(0, 1, 2, 3))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        plan.contains("graft_cell"), plan)
    } finally idx.release()
  }

  test("labelCentroidDistances returns the exact L2 between mean centroids") {
    // label 0 centroid (1,1) from two vectors, label 1 centroid (4,5):
    // distance = √(3² + 4²) = 5 exactly
    val df = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 2.0f)),
      (1, Array(4.0f, 5.0f)))
      .toDF("label", "embedding")
    val r = Similarity.labelCentroidDistances(df, "label", "embedding")
      .collect()(0)
    assert((r.getAs[Int]("l1"), r.getAs[Int]("l2")) === ((0, 1)))
    assert((r.getAs[Long]("n1"), r.getAs[Long]("n2")) === ((2L, 1L)))
    assert(r.getAs[Double]("dist") === 5.0)
  }

  test("hardNegatives ranks nearest different-label vectors, skips same label") {
    // Cell "11" (both dims positive): anchor 1 (label 0) sits next to a
    // SAME-label near twin (2) — excluded — and two different-label vecs:
    // 3 is closer than 4, so ranks are (3: 1, 4: 2). Vector 5 lives in
    // another cell and must never pair with 1.
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.5f)),
      (2L, 0, Array(0.99f, 0.5f)),   // same label: not a negative
      (3L, 1, Array(0.9f, 0.6f)),    // hard negative, rank 1
      (4L, 1, Array(0.1f, 1.0f)),    // softer negative, rank 2
      (5L, 1, Array(-1.0f, 0.5f)))   // different cell
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        signBits = 2, k = 2)
      .filter($"anchor_id" === 1L)
      .orderBy($"rank")
      .select("neg_id", "rank").as[(Long, Int)].collect().toList
    assert(got === List((3L, 1), (4L, 2)))
  }

  test("prefixDimAgreement: full-dim prefix is identity; informative prefix holds") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(19)
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    // prefix = the whole vector: rankings identical, overlap 100%
    val full = Similarity.prefixDimAgreement(emb, "vec_id", "embedding",
      Seq(1L, 5L), k = 8, mDims = 8).collect()
    assert(full.forall(_.getAs[Long]("overlap_ppm") === 1000000L))
    // 1-dim prefix of noise: overlap can only drop
    val one = Similarity.prefixDimAgreement(emb, "vec_id", "embedding",
      Seq(1L, 5L), k = 8, mDims = 1).collect()
    assert(one.forall(r => r.getAs[Long]("overlap_ppm") <= 1000000L))
  }

  test("labelAgreement: clean clusters agree; a planted mislabel is suspect") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    def jitter() = (rnd.nextDouble() * 0.01).toFloat
    // two tight clusters labeled 0/1, except vec 3 carries the WRONG label
    val rows = (0L until 40L).map { i =>
      val cluster = if (i < 20) 0 else 1
      val vec =
        if (cluster == 0) Array(1.0f + jitter(), jitter())
        else Array(jitter(), 1.0f + jitter())
      val label = if (i == 3L) 1 else cluster
      (i, vec, label)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.labelAgreement(emb, "vec_id", "embedding", "label",
      probePred = col("vec_id") >= 0, k = 5).collect()
      .map(r => (r.getAs[Int]("label"), (r.getAs[Long]("n_probes"),
        r.getAs[Long]("agreement_ppm"), r.getAs[Long]("n_suspect")))).toMap
    // label 1 has 21 probes incl. the mislabeled vec 3, whose 5 nearest
    // neighbors all sit in cluster 0 with label 0 -> zero agreement,
    // flagged suspect
    assert(got(1)._1 === 21L)
    assert(got(1)._3 === 1L, s"mislabel must be the one suspect: $got")
    assert(got(0)._3 === 0L)
    assert(got(0)._2 > 900000L)
    assert(got(1)._2 < 1000000L) // the zero-agreement probe drags the mean
  }

  test("mmrTopK trades redundant relevance for diversity") {
    // 1 and 2 are near-duplicates hugging the query; 3 is moderately
    // relevant but diverse. Pure relevance ranks (2, 1, 3) — 2's tiny
    // extra component shrinks its norm — but MMR at λ=0.5 must
    // interleave the diverse item: (2, 3, 1).
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.141f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.14f, 0.002f, 0.0f)),
      (3L, Array(0.7f, -0.714f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rel = Similarity.cosineTopK(rows, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(rel === Seq(2L, 1L, 3L))
    val got = Similarity.mmrTopK(rows, "vec_id", "embedding",
      queryId = 0L, k = 3, poolN = 3, lambdaMilli = 500L)
      .orderBy("mmr_rank")
      .select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(2L, 3L, 1L))
  }

  test("mmrTopK at λ=1000 degenerates to pure relevance ranking") {
    val got = Similarity.mmrTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 3, poolN = 4, lambdaMilli = 1000L)
      .orderBy("mmr_rank")
      .select("vec_id").as[Long].collect().toSeq
    val pure = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === pure)
  }

  test("mmrTopK is invariant to input partitioning") {
    val a = Similarity.mmrTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 3, poolN = 4, lambdaMilli = 700L).collect().toSet
    val b = Similarity.mmrTopK(emb.repartition(7), "vec_id", "embedding",
      queryId = 0L, k = 3, poolN = 4, lambdaMilli = 700L).collect().toSet
    assert(a === b)
    assert(a.size === 3)
  }

  test("rboAgreement: exact weights, identical-ranking mass, absent on disjoint") {
    // W_1 = floor(1e9 * 0.1), W_2 = floor(1e9 * 0.09) — exact decimals
    val w = Similarity.rboWeightsNano(3, 900L)
    assert(w === Seq(100000000L, 90000000L, 81000000L))
    // mDims = full dimension → both rankings identical → ov_d = d and
    // rbo_micro = (Σ W_d) / 1000 exactly (truncated-RBO mass)
    import spark.implicits._
    val vecs = (0L until 8L).map(i =>
      (i, Seq.tabulate(4)(j => (1.0f / (1 + i + j)))))
      .toDF("vec_id", "embedding")
    val got = Similarity.rboAgreement(vecs, "vec_id", "embedding",
      queryIds = Seq(0L, 3L), k = 4, mDims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val mass = Similarity.rboWeightsNano(4, 900L).sum / 1000L
    assert(got === Seq((0L, 4L, mass), (3L, 4L, mass)))
  }

  test("signWords packs bits per 64-dim word, partial tail word") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 70 dims: dims 0, 63, 64, 69 positive → word0 bits 0+63, word1 bits 0+5
    val v = Array.tabulate(70)(i =>
      if (Set(0, 63, 64, 69).contains(i)) 1.0f else -1.0f)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.signWords(col("v"))).as[Seq[Long]].head()
    assert(got === Seq((1L | (1L << 63)), (1L | (1L << 5))))
    // zeros are NOT positive
    val z = Seq(Tuple1(Array.fill(64)(0.0f))).toDF("v")
      .select(Similarity.signWords(col("v"))).as[Seq[Long]].head()
    assert(z === Seq(0L))
  }

  test("binaryAnn: hamming pass keeps the true neighbor, rerank is" +
    " exact cosine") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def vec(signs: Int*): Array[Float] =
      Array.tabulate(8)(i => if (signs.contains(i)) 1.0f else -1.0f)
    // query 0; vec 1 = identical signs (hamming 0, cos 1.0);
    // vec 2 flips 1 dim; vec 3 flips 6 dims (pruned at candK = 2)
    val emb = Seq(
      (0L, vec(0, 1, 2, 3)), (1L, vec(0, 1, 2, 3)),
      (2L, vec(0, 1, 2)), (3L, vec(4, 5))).toDF("vec_id", "embedding")
    val got = Similarity.binaryAnn(emb, "vec_id", "embedding",
        queryId = 0L, candK = 2, k = 2)
      .select("vec_id", "hamming").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L)))
    // hammingWords equals the per-dim count on crafted words
    val h = Seq((Seq(0x0fL, 3L), Seq(0xf0L, 1L))).toDF("a", "b")
      .select(Similarity.hammingWords(col("a"), col("b")))
      .as[Long].head()
    assert(h === 9L) // 8 differing bits in word0, 1 in word1
  }
}
