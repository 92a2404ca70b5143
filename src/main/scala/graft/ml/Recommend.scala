package graft.ml

import graft.operators.Materialize
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cluster-based item recommendation — the Spark ML re-expression of
  * recommendation.py: label-encode the grouping attribute (LabelEncoder →
  * StringIndexer), standard-scale the numeric features (StandardScaler →
  * StandardScaler), weight the group id ×100 so same-group items cluster
  * together (recommendation.py:59-60), KMeans with k = n/15
  * (recommendation.py:61), then recommend items sharing the query item's
  * cluster (recommendation.py:66-69).
  *
  * Scale posture: fit distributes over the feature table; transform is a
  * narrow map. The only driver-side values are the query row's cluster id
  * (a 1-row lookup) and k.
  */
object Recommend {

  /** Assign a cluster label to every item. */
  def clusterItems(items: DataFrame, idCol: String, groupCol: String,
                   features: Seq[String], groupWeight: Double = 100.0,
                   itemsPerCluster: Int = 15, maxK: Int = 40,
                   seed: Long = 42L): DataFrame = {
    val indexer = new StringIndexer()
      .setInputCol(groupCol).setOutputCol("graft_group_idx")
      .setStringOrderType("alphabetAsc") // deterministic encoding
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("graft_raw")
    val scaler = new StandardScaler()
      .setInputCol("graft_raw").setOutputCol("graft_scaled")
      .setWithMean(true).setWithStd(true)
    val weighted = new VectorAssembler()
      .setInputCols(Array("graft_scaled", "graft_weighted_group"))
      .setOutputCol("graft_features")
    // Right-size fit parallelism to the item slice (same discipline as
    // Popularity.train): KMeans makes init + maxIter full passes, and an
    // item table of tens of thousands of rows inheriting 32 shuffle
    // partitions pays 32 task launches per pass for few-hundred-row tasks.
    // The sizing count runs on the CACHED input, doubling as its
    // materialization pass — the prep fits and the repartition below read
    // the cache, never the source again. The KMeans hot loop reads the
    // separately-cached assembled vectors (withVec), so the re-shuffle
    // from cache happens twice (indexer, scaler), on an item-sized table.
    val rawItems = items.cache()
    val n = rawItems.count()
    val parts = math.max(8, math.min(64, (n / 25000L).toInt))
    val cachedItems = rawItems.repartition(parts)
    val prepped = new Pipeline().setStages(Array(indexer, assembler, scaler))
      .fit(cachedItems).transform(cachedItems)
      .withColumn("graft_weighted_group", col("graft_group_idx") * groupWeight)
    // KMeans.fit makes maxIter passes over the input; cache the assembled
    // vectors so each pass reads the cached block, not the whole pipeline.
    val withVec = weighted.transform(prepped).cache()
    withVec.count() // materialize before the multi-pass fit
    val k = math.max(2, math.min(maxK, (n / itemsPerCluster).toInt))
    val kmeans = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(10)
      // One k-means|| init round instead of two: for coarse recommendation
      // cells the refined init buys nothing the Lloyd iterations don't
      // redo, and each init step is a full distributed pass.
      .setInitSteps(1)
      .setFeaturesCol("graft_features").setPredictionCol("cluster")
    val out = kmeans.fit(withVec).transform(withVec)
      .drop("graft_group_idx", "graft_raw", "graft_scaled",
        "graft_weighted_group", "graft_features")
    // Both caches exist for the multi-pass FIT (indexer/scaler scans,
    // maxIter KMeans passes); release them now rather than leak for the
    // session — the returned plan's single downstream action recomputes
    // the narrow prep chain once, which is cheaper than a pinned cache.
    rawItems.unpersist()
    withVec.unpersist()
    out
  }

  /** Items sharing the query item's cluster, excluding the query itself —
    * `similar_songs` (recommendation.py:66-69). */
  def recommendFor(clustered: DataFrame, idCol: String, queryId: Long,
                   outCols: Seq[String]): DataFrame = {
    val queryCluster = clustered.filter(col(idCol) === queryId)
      .select(col("cluster").as("graft_qc")).limit(1)
    clustered.join(broadcast(queryCluster), col("cluster") === col("graft_qc"))
      .filter(col(idCol) =!= queryId)
      .select(outCols.map(col): _*)
  }

  /** Multi-item recommendation: the modal cluster over the query items'
    * assignments picks the target cell — `statistics.mode(kmeans.predict
    * (input))` (recommendation.py:64-66) — then cluster-mates excluding
    * every query item are returned (the reference filters all input names,
    * recommendation.py:66-69). Python's `statistics.mode` returns the
    * first-encountered value among tied modes, so ties break by the
    * earliest query item's position in `queryIds`; deterministic here via
    * min-position per cluster. The vote is a tiny aggregate over
    * |queryIds| rows; the join side is a 1-row broadcast. */
  def recommendForAll(clustered: DataFrame, idCol: String, queryIds: Seq[Long],
                      outCols: Seq[String]): DataFrame = {
    require(queryIds.nonEmpty, "recommendForAll: queryIds must be non-empty")
    val pos = map(queryIds.zipWithIndex.flatMap {
      case (id, i) => Seq(lit(id), lit(i)) }: _*)
    val modal = clustered.filter(col(idCol).isin(queryIds: _*))
      .select(col("cluster"), element_at(pos, col(idCol)).as("graft_pos"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("graft_votes"), min("graft_pos").as("graft_first"))
      .orderBy(col("graft_votes").desc, col("graft_first").asc)
      .limit(1)
      .select(col("cluster").as("graft_qc"))
    clustered.join(broadcast(modal), col("cluster") === col("graft_qc"))
      .filter(!col(idCol).isin(queryIds: _*))
      .select(outCols.map(col): _*)
  }

  /** Item-item cosine collaborative filtering — the classic "users who
    * took this also took" table (Sarwar et al., WWW 2001), the
    * neighborhood recommender every catalog ships before (and usually
    * alongside) a learned model: sim(i,j) = co(i,j) / √(n_i·n_j) over
    * binary user-item incidence, top-k neighbors per item. The cosine
    * denominator is what q201's lift is not — it damps popularity, so a
    * blockbuster doesn't neighbor everything. Score is round-6-micro
    * with the pinned two-sqrt finish over exact integer counts (co and
    * both margins — the q280 argument), ties broken on the neighbor id.
    *
    * Hub users are EXCLUDED by `maxUserItems` as co-occurrence
    * intermediaries (a user touching half the catalog contributes
    * items² spammy pairs and ~no preference signal — the maxDeg/maxDf
    * trade, part of the contract; margins count the SAME capped set so
    * the cosine stays a true cosine).
    *
    * Scale: one distinct reduction, a user-keyed pair self-join bounded
    * at C(maxUserItems, 2) per user, margins map-combinable, one
    * per-item rank window over the pair table. */
  /** @param minCo noise floor on the co-occurrence count: pairs seen
    *   together fewer than `minCo` times never become neighbors. At
    *   corpus scale MOST candidate pairs are single co-occurrences —
    *   statistical hay with maximal variance — and dropping them before
    *   the margin joins and the per-item rank window cuts the scored
    *   volume several-fold (the q201 minSupport discipline; part of the
    *   CONTRACT, replayed by the oracle's HAVING). */
  def itemCosineCf(interactions: DataFrame, userCol: String,
                   itemCol: String, maxUserItems: Int, k: Int,
                   minCo: Int = 1): DataFrame = {
    require(maxUserItems >= 2 && k >= 1 && minCo >= 1,
      "maxUserItems >= 2, k >= 1, minCo >= 1")
    val pos = Materialize.transient(
      interactions.select(col(userCol).as("graft_u"),
        col(itemCol).as("graft_i")).distinct())
    val kept = Materialize.transient(pos
      .withColumn("graft_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("graft_u")))
      .filter(col("graft_n") <= maxUserItems)
      .select("graft_u", "graft_i"))
    val margins = kept.groupBy(col("graft_i"))
      .agg(count(lit(1)).as("graft_m"))
    val a = kept.select(col("graft_u"), col("graft_i").as("graft_a"))
    val b = kept.select(col("graft_u"), col("graft_i").as("graft_b"))
    val co = a.join(b, Seq("graft_u"))
      .filter(col("graft_a") < col("graft_b"))
      .groupBy("graft_a", "graft_b")
      .agg(count(lit(1)).as("graft_co"))
      .filter(col("graft_co") >= minCo)
    val scored = co
      .join(margins.select(col("graft_i").as("graft_a"),
        col("graft_m").as("graft_ma")), Seq("graft_a"))
      .join(margins.select(col("graft_i").as("graft_b"),
        col("graft_m").as("graft_mb")), Seq("graft_b"))
      .select(col("graft_a"), col("graft_b"),
        col("graft_co").cast("long").as("n_co"),
        expr("CAST(round(CAST(graft_co AS DOUBLE)"
          + " / (sqrt(CAST(graft_ma AS DOUBLE))"
          + "    * sqrt(CAST(graft_mb AS DOUBLE))) * 1000000, 0)"
          + " AS BIGINT)").as("cos_micro"))
    val both = scored.select(col("graft_a").as("item"),
      col("graft_b").as("neighbor"), col("n_co"), col("cos_micro"))
      .unionByName(scored.select(col("graft_b").as("item"),
        col("graft_a").as("neighbor"), col("n_co"), col("cos_micro")))
    both.withColumn("nb_rank", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("item")
        .orderBy(col("cos_micro").desc, col("neighbor").asc))
      .cast("long"))
      .filter(col("nb_rank") <= k)
  }

  /** Leave-last-out next-item evaluation — the offline recommender
    * metric loop (HR@k / MRR, the MovieLens-protocol staple): each
    * entity's LAST interaction (by the caller's timestamp with id
    * tiebreaks) is held out as the target, the popularity baseline is
    * fit on everything EXCEPT the held-out rows (no target leaks into
    * its own ranking), and the readout is hit-rate@k (did the target
    * make the global top-k) and MRR (10⁶ div rank, 0 on miss) — the
    * floor every learned recommender must beat before it ships.
    * Popularity ranks tie-break on the item id; all rates floor-ppm /
    * floor-micro integers.
    *
    * Scale: one entity-keyed window pass marks the last row; the
    * baseline is a map-combinable item count; the top-k list is a
    * k-row broadcast joined onto the |entities|-row target table. */
  def leaveLastOutEval(interactions: DataFrame, entityCol: String,
                       itemCol: String, tsCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    // The holdout pick must be a TOTAL order: (ts, id, item) — idCol
    // alone need not be unique in real interaction logs, and an engine-
    // dependent tie pick would silently shift the train set. Rows
    // identical in all three are interchangeable (same item either
    // way), so the readout is well-defined regardless.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_e")
      .orderBy(col("graft_t").desc, col("graft_id").desc,
        col("graft_i").desc)
    val marked = Materialize.transient(interactions
      .select(col(entityCol).as("graft_e"), col(itemCol).as("graft_i"),
        col(tsCol).as("graft_t"), col(idCol).as("graft_id"))
      .withColumn("graft_rn", row_number().over(w)))
    val targets = marked.filter(col("graft_rn") === 1)
      .select(col("graft_e"), col("graft_i").as("graft_tgt"))
    val topk = marked.filter(col("graft_rn") > 1)
      .groupBy(col("graft_i")).agg(count(lit(1)).as("graft_c"))
      .orderBy(col("graft_c").desc, col("graft_i").asc)
      .limit(k)
      .withColumn("graft_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("graft_c").desc, col("graft_i").asc)))
      .select(col("graft_i").as("graft_tgt"), col("graft_rk"))
    targets.join(broadcast(topk), Seq("graft_tgt"), "left")
      .agg(count(lit(1)).as("graft_n"),
        coalesce(sum(when(col("graft_rk").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("graft_h"),
        coalesce(sum(when(col("graft_rk").isNotNull,
          expr("1000000 div graft_rk")).otherwise(0L)), lit(0L))
          .as("graft_m"))
      .select(col("graft_n").cast("long").as("n_entities"),
        col("graft_h").cast("long").as("n_hits"),
        expr("CASE WHEN graft_n = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_h * 1000000 div graft_n END").as("hr_ppm"),
        expr("CASE WHEN graft_n = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_m div graft_n END").as("mrr_micro"))
  }

  /** Deterministic negative sampling — the training-data op every
    * implicit-feedback recommender and contrastive ranker needs: for
    * each user, `k` items they did NOT interact with, drawn by a pure
    * content hash so the same (user, epoch-salt) always yields the same
    * negatives across engines, partitioning, and retries (an RNG draw
    * is none of those). Draw j for user u targets item
    * `1 + md5(u·'#'·j) mod maxItem`; draws landing on catalog holes or
    * on the user's own positives are discarded and the margin
    * (`2k + margin` draws) absorbs the loss — a user may under-fill
    * only if nearly every draw collides, i.e. the user interacted with
    * most of the catalog (documented; such users don't need sampled
    * negatives). Contract: an integer item catalog that is mostly
    * dense in [1, maxItem] — the modular draw's uniformity degrades
    * with the hole rate, and the semi-join keeps correctness regardless.
    *
    * Scale: |users|·(2k+margin) candidate rows (never catalog × users),
    * one semi-join against the item set, one anti-join against the
    * positives (both keyed), a per-user row_number over ≤ 2k+margin
    * rows. No dense-index build, no catalog-sized window. */
  def negativeSample(interactions: DataFrame, userCol: String,
                     itemCol: String, k: Int, margin: Int = 4): DataFrame = {
    require(k >= 1 && margin >= 0, "k >= 1 and margin >= 0")
    val m = 2 * k + margin
    // Pinned: the positive set feeds FOUR subtrees (users, items, the
    // max, the anti-join) — without the pin the corpus distinct runs
    // once per consumer.
    val pos = Materialize.transient(
      interactions.select(col(userCol).cast("long").as("graft_u"),
        col(itemCol).cast("long").as("graft_it")).distinct())
    val users = pos.select("graft_u").distinct()
    val items = pos.select("graft_it").distinct()
    val mx = pos.agg(max("graft_it").as("graft_mi"))
    val cands = users
      .select(col("graft_u"),
        explode(sequence(lit(1), lit(m))).as("graft_j"))
      .crossJoin(broadcast(mx))
      .withColumn("graft_it",
        conv(substring(md5(concat(col("graft_u").cast("string"), lit("#"),
          col("graft_j").cast("string"))), 1, 8), 16, 10).cast("long")
          % col("graft_mi") + 1)
    val valid = cands
      .join(items, Seq("graft_it"), "left_semi")
      .groupBy("graft_u", "graft_it")
      .agg(min("graft_j").as("graft_j"))
    val negs = valid.join(pos, Seq("graft_u", "graft_it"), "left_anti")
    negs
      .withColumn("graft_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("graft_u")
          .orderBy(col("graft_j").asc, col("graft_it").asc)))
      .filter(col("graft_rk") <= k)
      .select(col("graft_u").as("user_id"),
        col("graft_it").as("neg_item"),
        col("graft_j").cast("long").as("draw"))
  }

  /** ALS implicit-feedback recommender, evaluated head-to-head against
    * the popularity baseline through the same leave-last-out protocol
    * as [[leaveLastOutEval]] — the learned-model rung the reference's
    * KMeans recommender (recommendation.py:41-70) approximates with
    * cluster membership. Each entity's LAST interaction (total order
    * (ts, id, item) desc, as in leaveLastOutEval) is held out; ALS
    * (implicitPrefs, confidence = interaction count) is fit on the
    * rest; each entity is scored by whether its held-out item appears
    * in its top-k AMONG ITEMS IT HAS NOT CONSUMED in train — the
    * MovieLens/NCF protocol: an implicit factorizer necessarily scores
    * already-consumed items highest, so ranking WITH them measures
    * memorization, not recommendation. Both arms play the same game:
    * the ALS arm takes `recommendForAllUsers(k + seenMargin)`, the
    * popularity arm the global top-(k + seenMargin) list; each entity's
    * train items are anti-joined out and the survivors re-ranked to k.
    * `seenMargin` bounds the candidate list: per-entity exactness needs
    * the entity's train-item overlap with its candidate list ≤ margin —
    * a shortfall can only SHORTEN the filtered list (miss-biased, never
    * a false hit). Output: one row per model ('als', 'popularity') with
    * n_entities / n_hits / hr_ppm / mrr_micro, rates floor-ppm /
    * floor-micro. Entities with no train rows left (single-interaction
    * users) stay in the denominator for BOTH models and can only hit
    * via popularity — cold-start honesty, not leakage. Rows-only
    * contract: ALS factor init is seeded but float-reduction order is
    * engine-specific, so no SQL oracle can replay the factors; MlSpec
    * pins the semantics instead (planted block structure recovered,
    * ALS beats popularity HR@k).
    *
    * Scale: ALS is Spark ML's block-partitioned factorizer — factor
    * blocks co-partitioned with rating blocks, each normal-equation
    * solve local to a block. `recommendForAllUsers` is the blocked
    * factor-matrix cross with per-block top-k accumulators (never a
    * |users|×|items| materialization). The eval joins are keyed on
    * entity; the popularity top-k is a k-row broadcast. Spark ML ALS
    * keys users/items as Int — the in-plan guard fails loudly on ids
    * beyond 2³¹ (at that cardinality, re-key first). */
  def alsVsPopularityEval(interactions: DataFrame, entityCol: String,
                          itemCol: String, tsCol: String, idCol: String,
                          k: Int, seenMargin: Int = 64, rank: Int = 16,
                          maxIter: Int = 10, regParam: Double = 0.05,
                          alpha: Double = 10.0, seed: Long = 42L): DataFrame = {
    require(k >= 1 && seenMargin >= 0 && rank >= 1 && maxIter >= 1,
      "k, rank, maxIter >= 1 and seenMargin >= 0")
    val kc = k + seenMargin
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_e")
      .orderBy(col("graft_t").desc, col("graft_id").desc,
        col("graft_i").desc)
    val marked = Materialize.transient(interactions
      .select(col(entityCol).cast("long").as("graft_e"),
        col(itemCol).cast("long").as("graft_i"),
        col(tsCol).as("graft_t"), col(idCol).as("graft_id"))
      .withColumn("graft_rn", row_number().over(w)))
    val targets = marked.filter(col("graft_rn") === 1)
      .select(col("graft_e"), col("graft_i").as("graft_tgt"))
    val train = Materialize.transient(marked.filter(col("graft_rn") > 1)
      .select("graft_e", "graft_i"))
    // Drop each entity's seen train items from its candidate list and
    // re-rank the survivors — both arms rank only unseen items.
    def unseenTopK(cands: DataFrame): DataFrame = cands
      .join(train.select(col("graft_e"), col("graft_i").as("graft_cand")),
        Seq("graft_e", "graft_cand"), "left_anti")
      .withColumn("graft_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("graft_e")
          .orderBy(col("graft_rk0").asc)))
      .filter(col("graft_rk") <= k)
      .select(col("graft_e"), col("graft_cand").as("graft_tgt"),
        col("graft_rk"))
    // Popularity arm: global train-side top-(k+margin), broadcast per
    // entity (|entities|·(k+margin) bounded candidate rows), seen-filtered.
    val popTop = train
      .groupBy(col("graft_i")).agg(count(lit(1)).as("graft_c"))
      .orderBy(col("graft_c").desc, col("graft_i").asc)
      .limit(kc)
      .withColumn("graft_rk0", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("graft_c").desc, col("graft_i").asc)))
      .select(col("graft_i").as("graft_cand"), col("graft_rk0"))
    val popCands = targets.select("graft_e").crossJoin(broadcast(popTop))
    val popRanked = targets.join(unseenTopK(popCands),
      Seq("graft_e", "graft_tgt"), "left")
      .select(col("graft_e"), col("graft_rk"))
    // ALS arm: implicit confidence = per-(entity, item) train count.
    val intGuard = (c: Column) => when(
      assert_true(c <= Int.MaxValue && c >= Int.MinValue,
        lit("ALS ids must fit Int — re-key the catalog")).isNull, c)
      .cast("int")
    val ratings = train.groupBy("graft_e", "graft_i")
      .agg(count(lit(1)).cast("float").as("graft_r"))
      .select(intGuard(col("graft_e")).as("graft_ue"),
        intGuard(col("graft_i")).as("graft_ii"), col("graft_r"))
    val als = new org.apache.spark.ml.recommendation.ALS()
      .setUserCol("graft_ue").setItemCol("graft_ii").setRatingCol("graft_r")
      .setImplicitPrefs(true).setRank(rank).setMaxIter(maxIter)
      .setRegParam(regParam).setAlpha(alpha).setSeed(seed)
      .setColdStartStrategy("drop").setNonnegative(false)
    val model = als.fit(ratings)
    val alsCands = model.recommendForAllUsers(kc)
      .select(col("graft_ue").cast("long").as("graft_e"),
        posexplode(col("recommendations")))
      .select(col("graft_e"),
        col("col.graft_ii").cast("long").as("graft_cand"),
        (col("pos") + 1).as("graft_rk0"))
    val alsRanked = targets.join(unseenTopK(alsCands),
      Seq("graft_e", "graft_tgt"), "left")
      .select(col("graft_e"), col("graft_rk"))
    def readout(ranked: DataFrame, label: String): DataFrame = ranked
      .agg(count(lit(1)).as("graft_n"),
        coalesce(sum(when(col("graft_rk").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("graft_h"),
        coalesce(sum(when(col("graft_rk").isNotNull,
          expr("1000000 div graft_rk")).otherwise(0L)), lit(0L))
          .as("graft_m"))
      .select(lit(label).as("model"),
        col("graft_n").cast("long").as("n_entities"),
        col("graft_h").cast("long").as("n_hits"),
        expr("CASE WHEN graft_n = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_h * 1000000 div graft_n END").as("hr_ppm"),
        expr("CASE WHEN graft_n = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_m div graft_n END").as("mrr_micro"))
    readout(alsRanked, "als").unionByName(readout(popRanked, "popularity"))
      .orderBy("model")
  }
}
