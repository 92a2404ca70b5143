package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * query key maps to. Every oracle-checked query aliases its output columns
  * identically here and in [[oracleSql]], rounds derived doubles before
  * thresholding/ranking, and casts computed integers to BIGINT on both
  * engines so the DuckDB hash compare is exact. */
object SparkEntry {

  /** Scratch warehouse directory for the table-format queries, deleted at
    * JVM exit: the returned DataFrame is lazy (the driver materializes it
    * after this function returns), so eager deletion would race the scan —
    * a shutdown hook is the earliest safe point. Without it every
    * bench/correctness run of a warehouse query leaked a full table copy
    * under java.io.tmpdir. */
  private def tempTableDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** Flagship: consecutive-weeks-on-chart streaks (dag.py:118-154) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Charts.weeksOnChart(Tables.events(spark, "/root/testdata/sf0.001"),
      "user_id", "ts_t", "value", 10)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_topk" -> ((s, d) =>
      Charts.topK(Tables.part(s, d).select("p_partkey", "p_name", "p_retailprice"),
        "p_retailprice", "p_partkey", 20)),

    "q02_topk_per_group" -> ((s, d) =>
      Charts.topKPerGroup(
        Tables.customer(s, d).select("c_mktsegment", "c_custkey", "c_name", "c_acctbal"),
        "c_mktsegment", "c_acctbal", "c_custkey", 5)
        .withColumn("rnk", col("rnk").cast("long"))),

    "q03_feature_stats" -> ((s, d) =>
      Charts.featureStats(Tables.part(s, d), "p_brand", "p_retailprice")),

    "q04_filter_project" -> ((s, d) =>
      Etl.filterProject(Tables.orders(s, d), 150000.0)),

    "q05_enrich_join" -> ((s, d) =>
      Etl.enrichRevenueByBrand(Tables.lineitem(s, d), Tables.part(s, d))),

    "q06_union_history" -> ((s, d) =>
      Etl.unionHistory(Tables.orders(s, d), 730, 365)),

    "q07_latest_snapshot" -> ((s, d) =>
      Charts.latestSnapshot(Tables.events(s, d), "user_id", "ts", "event_id")
        .select("user_id", "event_id", "event_type", "value")),

    "q08_weeks_on_chart" -> ((s, d) =>
      Charts.weeksOnChart(Tables.events(s, d), "user_id", "ts_t", "value", 10)),

    "q09_dedup_keys" -> ((s, d) =>
      Etl.dedupKeys(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey", "l_partkey"), Seq("l_linenumber", "l_quantity"))),

    "q10_upsert" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val maxd = orders.agg(max(col("o_orderdate")).as("maxd"))
      val withMax = orders.crossJoin(broadcast(maxd))
      def slice(pred: org.apache.spark.sql.Column) = withMax.filter(pred)
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"))
      val target = slice(col("o_orderdate") < expr("maxd - INTERVAL 365 DAYS"))
      val source = slice(col("o_orderdate") >= expr("maxd - INTERVAL 730 DAYS"))
      Etl.upsert(target, source, "o_orderkey")
    }),

    "q11_recent_window" -> ((s, d) =>
      Etl.recentWindowNanos(Tables.events(s, d), "ts", 14)
        .select("event_id", "user_id", "event_type", "value")),

    "q12_weekly_agg" -> ((s, d) =>
      Etl.weeklyAgg(Tables.events(s, d), "ts_t", "event_type", "value")),

    "q13_pricing_summary" -> ((s, d) =>
      Etl.pricingSummary(Tables.lineitem(s, d))),

    "q14_weekly_chart" -> ((s, d) =>
      Charts.weeklyChart(Tables.events(s, d), "user_id", "ts_t", "value", 5)
        .withColumn("rnk", col("rnk").cast("long"))),

    "q15_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        T.wsTokens(col("text")).cast("long").as("ws_tokens"),
        T.wordTokens(col("text")).cast("long").as("word_tokens"))),

    "q16_quality_score" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("len"),
        T.wordTokens(col("text")).cast("long").as("word_tokens"),
        T.stopwordHits(col("text")).cast("long").as("stop_hits"),
        T.punctHits(col("text")).cast("long").as("punct_hits"),
        T.qualityScore(col("text")).as("quality"))),

    "q17_lang_guess" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"), T.langGuess(col("text")).as("guess"))),

    "q18_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), T.fingerprint(col("text")).as("fp"))),

    "q19_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")),

    // Incremental dedup against a BUCKETED fp store — the IncrementalIngest
    // layout as an oracle-checked batch query: the "already ingested" third
    // of the corpus (doc_id % 3 == 0) persists its distinct fingerprints
    // bucketed on fp; the remaining docs arrive as a batch, dedup within
    // themselves, and anti-join the store. The store side reads its
    // buckets with NO shuffle (bucket count == shuffle partitions, so the
    // batch side's window exchange serves the join too — PlanAuditSpec
    // asserts the single-Exchange shape); the RESULT is pure relational
    // algebra, so DuckDB replays it exactly.
    "q81_incremental_dedup" -> ((s, d) =>
      Dedup.incrementalExact(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) =!= 0),
        "doc_id", "text", s.table(fpStoreTable(s, d)))
        .select("doc_id", "fp")),

    "q20_ngram_jaccard" -> ((s, d) => jaccardPairs(s, d)),

    // The df-capped exact path — the production skew bound at corpus scale
    // (a boilerplate shingle shared by 1% of 10⁹ docs would alone fan out
    // ~10¹⁴ candidate pairs; the cap bounds every shingle's fan-out at
    // maxDf²). Oracle-EXACT: intersections count only sub-maxDf shingles
    // while set sizes stay uncapped, and the DuckDB oracle replays exactly
    // that (capped intersections, uncapped sizes) — see its HAVING clause.
    // DedupSpec's planted-boilerplate case additionally pins the recall
    // story vs the uncapped q20 path.
    "q64_jaccard_capped" -> ((s, d) =>
      Dedup.jaccardFromStats(
        Dedup.pairShingleStats(Tables.documents(s, d), "doc_id", "text", 3,
          maxDf = Some(50L)),
        minJaccard = 0.2)),

    // Context-window chunking: 64-token windows every 48 tokens — the
    // doc → training-example fan-out step. Bounded generate, no shuffle.
    "q65_chunk_tokens" -> ((s, d) =>
      Corpus.chunkTokens(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 64, stride = 48)),

    // Per-source p75 quality gate — corpus filtering with a per-group
    // quantile threshold (broadcast O(|sources|) table, narrow filter).
    "q66_quality_gate" -> ((s, d) =>
      Corpus.qualityGate(Tables.documents(s, d), "doc_id", "text",
        "source", quantile = 0.75)),

    // Test-set decontamination: planted held-out set = doc_id % 97 == 0;
    // training docs sharing ≥1 3-shingle with it are dropped.
    "q67_decontaminate" -> ((s, d) =>
      Corpus.decontaminate(Tables.documents(s, d), "doc_id", "text",
        isTest = pmod(col("doc_id"), lit(97)) === 0, n = 3)),

    // Embedding-quality screening: per-label centroid outliers (the 3
    // least-cohesive members per label). Fixed-point quantization makes
    // the cosine bit-exact cross-engine — see Similarity.centroidOutliers.
    "q68_label_outliers" -> ((s, d) =>
      Similarity.centroidOutliers(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", k = 3)),

    // Token-stream sequence packing (capacity 2048, shard = source):
    // doc → (offset, sequence) assignment, exact integer window math.
    "q69_pack_sequences" -> ((s, d) =>
      Corpus.packSequences(Tables.documents(s, d), "doc_id", "text",
        "source", capacity = 2048L)),

    // PQ-compressed ANN with exact re-rank — the third scale path next to
    // LSH buckets (q25) and IVF (q32/q61): approximate scoring reads only
    // the ~8-byte codes, then `refine` candidates re-rank exactly.
    // Rows-only (codebooks are KMeans-dependent); SimilaritySpec holds the
    // brute-force-equality and recall@20 evidence.
    "q70_ann_pq" -> ((s, d) =>
      Similarity.pqTopK(pqIdx(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 20, refine = 100)),

    // Composed IVF-PQ (the FAISS IVFPQ recipe): coarse cells prune the
    // scan, residual PQ codes feed the ADC score, exact cosine re-ranks
    // the refine set. Rows-only contract like q70/q32 (KMeans float fits
    // are engine-specific); SimilaritySpec holds recall vs brute force
    // and the exact-configuration equality.
    "q327_ivfpq_ann" -> ((s, d) =>
      Similarity.ivfPqTopK(ivfPqIdx(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 20, nProbe = 4,
        refine = 100)),

    // Batched IVF-PQ probe: the production retrieval shape (a probe
    // batch against the built-once composed index) — ONE ADC scan of
    // the probed-cell union answers every query, one exact re-rank
    // join finishes. Rows-only like q327 (KMeans float fits);
    // SimilaritySpec pins per-query equality and the full-probe
    // brute-force identity.
    "q351_ivfpq_batch" -> ((s, d) =>
      Similarity.ivfPqTopKBatch(ivfPqIdx(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L, 3L), k = 10,
        nProbe = 4, refine = 100)),

    // SCD type-2 validity intervals per user over the event-type history —
    // the as-of-queryable form of the reference's snapshot merges.
    "q74_scd2" -> ((s, d) =>
      Etl.scd2(eventsUs(s, d), "user_id", "ts_us", "event_id", "event_type")),

    // Point-in-time lookup against the q74 SCD-2 dimension: each event
    // takes the attribute valid at its timestamp. Because SCD-2 intervals
    // PARTITION time per key, "containing interval" ≡ "last change at or
    // before ts" — so this plans as the AS-OF union+window (ONE shuffle,
    // linear) instead of an events×intervals join whose per-key fan-out
    // grows quadratically with history density. Self-consistency makes
    // the oracle sharp: the attr valid at each event's time is the
    // event's OWN type, so n_matched == n_events.
    "q77_interval_lookup" -> ((s, d) => {
      val e = eventsUs(s, d).select("user_id", "ts_us", "event_id", "event_type")
      val dim = Etl.scd2(e, "user_id", "ts_us", "event_id", "event_type")
        .select(col("user_id"), col("valid_from").as("ts_us"),
          col("event_type").as("dim_type"))
      AsOf.asofJoin(e, dim, "user_id", "ts_us", "dim_type", "dim_at")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          count(when(col("event_type") === col("dim_at"), 1)).as("n_matched"))
    }),

    // CDC apply with deletes: the pre-cutoff latest state is the target,
    // post-cutoff events are the change stream ('error' = delete, else
    // upsert); the latest op per key wins.
    "q75_cdc_apply" -> ((s, d) => {
      val e = eventsUs(s, d)
        .select("user_id", "ts_us", "event_id", "event_type", "value")
      val cut = e.agg((max("ts_us") - lit(14L * 86400 * 1000000)).as("graft_cut"))
      val ec = e.crossJoin(broadcast(cut))
      val target = Charts.latestSnapshot(
        ec.filter(col("ts_us") < col("graft_cut")), "user_id", "ts_us", "event_id")
        .select("user_id", "value")
      val cdc = ec.filter(col("ts_us") >= col("graft_cut"))
        .withColumn("op", when(col("event_type") === "error", "D").otherwise("U"))
        .select("user_id", "value", "op", "ts_us", "event_id")
      Etl.applyCdc(target, cdc, "user_id", Seq("ts_us", "event_id"), "op")
    }),

    // Upsampling mix: src0-4 ×2.5 expected, src5-9 ×1, rest ×0.5 —
    // repeats are content-deterministic with copy indices.
    "q78_corpus_upsample" -> ((s, d) =>
      Corpus.mixUpsample(Tables.documents(s, d), "doc_id", "text", "source",
        rates = (0 to 4).map(i => s"src$i" -> 2.5).toMap ++
          (5 to 9).map(i => s"src$i" -> 1.0).toMap,
        defaultRate = 0.5)),

    // Deterministic 5-per-source sample — reproducible eval subsets
    // (membership is a pure function of content, not a seed).
    "q76_group_sample" -> ((s, d) =>
      Corpus.sampleKPerGroup(Tables.documents(s, d), "doc_id", "text",
        "source", k = 5)),

    // Deterministic corpus mixing: content-hash sampling with per-source
    // rates (domain reweighting) — full/half/quarter tiers.
    "q72_corpus_mix" -> ((s, d) =>
      Corpus.mixSample(Tables.documents(s, d), "doc_id", "text", "source",
        rates = (0 to 4).map(i => s"src$i" -> 1.0).toMap ++
          (5 to 9).map(i => s"src$i" -> 0.5).toMap,
        defaultRate = 0.25)),

    // Percent-rank / cume-dist normalization within brand — the
    // distribution-free popularity normalization recommenders feed on.
    // Unique ordering (price, id) makes both window functions exact
    // integer ratios → bit-identical cross-engine.
    "q73_rank_normalize" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p_brand").orderBy(col("p_retailprice").asc, col("p_partkey").asc)
      Tables.part(s, d).select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
    }),

    // Custom DataSource V2 connector (sources/RangeSource.scala): the id
    // range predicate narrows the generated window at planning time
    // (pushdown) and only 3 of 4 columns are read (pruning). The
    // deterministic row function lets DuckDB regenerate the identical
    // table with range(). Fixed-point cents keep the sum exact.
    "q71_custom_source" -> ((s, _) =>
      s.read.format("graft.sources.RangeSource")
        .option("rows", "100000").option("users", "50").option("slices", "8")
        .load()
        .filter(col("id") >= 20000 && col("id") < 80000 && col("etype") =!= "error")
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"),
          countDistinct(col("uid")).as("n_users"))),

    // 16 bands × 2 rows: candidate probability 1-(1-j²)^16 ≈ 0.78 at j=0.3
    // (vs 0.06 for 8×4) — banding tuned to the corpus's jaccard range.
    "q21_minhash_lsh" -> ((s, d) =>
      Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, bands = 16, rowsPerBand = 2, minAgree = 0.2)),

    "q22_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, maxHamming = 16)),

    "q23_cosine_topk" -> ((s, d) =>
      Similarity.cosineTopK(Tables.embeddings(s, d), "vec_id", "embedding", 0L, 20)),

    "q24_embedding_neardup" -> ((s, d) =>
      Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", 0.3)),

    // Reciprocal (mutual) kNN pairs: (i,j) kept only when each is in
    // the other's top-5 by rounded cosine — the hub-resistant matching
    // rung (bitext-mining RNN step); exact anchor here, IVF-PQ batch
    // substrate at scale.
    "q353_mutual_knn" -> ((s, d) =>
      Similarity.mutualTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", k = 5)),

    "q29_json_extract" -> ((s, d) => {
      val parsed = sources.Semi.parseJson(Tables.events(s, d), "props", "k INT")
      parsed.select(col("event_type"), sources.Semi.jsonField("props", "k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").cast("long").as("sum_k"),
          round(avg("k"), 2).as("avg_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
    }),

    "q30_entity_compare" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_suppkey").isin(1, 2))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(sum("l_extendedprice"), 2).as("sum_price"))),

    "q31_source_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          T.qualityScore(col("text")).as("q"),
          T.wordTokens(col("text")).cast("long").as("wt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          round(avg("q"), 4).as("avg_quality"),
          round(avg("n_chars"), 2).as("avg_chars"),
          sum("wt").as("sum_tokens"))),

    "q25_ann_buckets" -> ((s, d) =>
      Similarity.annBucketTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, nBits = 4, queryId = 0L, k = 20)),

    "q37_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOf.asofJoin(ev, purchases, "user_id", "ts", "value", "last_purchase")
        .select("event_id", "user_id", "event_type", "value", "last_purchase")
    }),

    "q33_chart_snapshot" -> ((s, d) => {
      // Reference's final merged output (dag.py:137-154): each entity's
      // latest row annotated with its weeks-on-chart streak.
      val ev = Tables.events(s, d)
      val latest = Charts.latestSnapshot(ev, "user_id", "ts", "event_id")
        .select("user_id", "event_id", "event_type", "value")
      val streaks = Charts.weeksOnChart(ev, "user_id", "ts_t", "value", 10)
      latest.join(streaks, Seq("user_id"))
    }),

    "q32_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopK(ivfIdx(s, d), "vec_id", "embedding",
        queryId = 0L, k = 20, nProbe = 4)),

    // Same index family as q32 but with the adaptive exactness-guaranteed
    // probe — output is provably identical to brute force, so unlike q32
    // (recall-target nProbe) this one hash-matches an exact SQL oracle.
    "q61_ann_ivf_exact" -> ((s, d) =>
      Similarity.ivfTopKExact(ivfIdx(s, d), "vec_id", "embedding",
        queryId = 7L, k = 25)),

    "q26_kmeans_recommend" -> ((s, d) =>
      ml.Recommend.recommendFor(clusteredParts(s, d), "p_partkey", 1L,
        Seq("p_partkey", "p_name", "p_brand"))),

    // Multi-item recommendation — the reference's list-input mode vote
    // (recommendation.py:64-66): modal cluster over the query items, mates
    // minus every input item.
    "q63_recommend_multi" -> ((s, d) =>
      ml.Recommend.recommendForAll(clusteredParts(s, d), "p_partkey",
        Seq(1L, 2L, 3L), Seq("p_partkey", "p_name", "p_brand"))),

    // Composed Model-page surface (app.py:149-175): ONE call returns the
    // chosen item's predicted metric and its recommendations, like
    // `model_prediction` returning (output[0], songs). The RF fit and the
    // KMeans clustering are both memoized substrates shared with q27/q26.
    "q62_predict_recommend" -> ((s, d) => {
      val fit = rfFit(s, d)
      val itemRows = Tables.lineitem(s, d).filter(col("l_partkey") === 1L)
        .select("l_quantity", "l_discount", "l_tax")
      val predicted = ml.Popularity.predict(fit, itemRows)
        .agg(round(avg("prediction"), 2).as("p")).head().getDouble(0)
      ml.Recommend.recommendFor(clusteredParts(s, d), "p_partkey", 1L,
        Seq("p_partkey", "p_name", "p_brand"))
        .withColumn("predicted_price", lit(predicted))
    }),

    "q27_rf_predict" -> ((s, d) =>
      ml.Popularity.metricsDf(s, rfFit(s, d))),

    "q28_feature_importance" -> ((s, d) =>
      ml.Popularity.importancesDf(s, rfFit(s, d))),

    "q35_multimodal_meta" -> ((s, d) => {
      // Binary media pipeline over synthesized payloads: text bytes stand in
      // for encoded media, deliberately exercising the digest fallback of
      // multimodal.Binary.decode (real BMP/PNG header parsing is covered by
      // BinarySpec with crafted container bytes; text payloads can't match
      // the magic numbers, so the nibble oracle below stays exact).
      import s.implicits._
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("video"), lit("audio")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("bytes"),
        col("source")).as[multimodal.Binary.MediaRecord]
      multimodal.Binary.extractMeta(media).toDF()
    }),

    "q36_stateful_streaks" -> ((s, d) => {
      import s.implicits._
      val weekly = Charts.weeklyScores(Tables.events(s, d), "user_id", "ts_t", "value")
        .select(col("user_id").as("entity"), col("weeknum").as("weekNum"),
          col("score"))
        .as[streaming.EventCharts.WeeklyScore]
      streaming.EventCharts.streaks(weekly).toDF()
        .select(col("entity").as("user_id"), col("weekNum").as("weeknum"),
          col("streak").cast("long").as("streak"))
    }),

    "q34_model_compare" -> ((s, d) =>
      ml.Popularity.compareModels(s,
        Tables.lineitem(s, d)
          .filter(pmod(col("l_orderkey"), lit(40)) === 0)
          .select("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")),

    // Timestamps for q38-q40 are int64 MICROseconds (`ts div 1000` here,
    // epoch_us(ts) in the oracle): DuckDB truncates the parquet ns
    // timestamps to µs on read, so µs is the finest exactly-shared grain.
    "q38_sessionize" -> ((s, d) =>
      Sessions.sessionize(eventsUs(s, d), "user_id", "ts_us", "event_id",
        gapUs = 30L * 60 * 1000000)),

    "q39_range_pairs" -> ((s, d) =>
      Sessions.rangeJoinPairCounts(eventsUs(s, d), "user_id", "ts_us",
        "event_id", windowUs = 3600000000L)),

    "q40_rolling_avg" -> ((s, d) =>
      Sessions.rollingAvg(eventsUs(s, d), "user_id", "ts_us", "event_id",
        "value", windowUs = 7L * 86400 * 1000000)),

    "q41_rollup" -> ((s, d) =>
      Analytics.rollup2(
        Tables.lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity"),
        "l_returnflag", "l_linestatus", "l_quantity")),

    "q79_cube" -> ((s, d) =>
      Analytics.cube2(
        Tables.lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity"),
        "l_returnflag", "l_linestatus", "l_quantity")),

    // Explicit grouping sets (Spark 4 native API): just the two
    // one-dimensional margins, no cross combinations.
    "q80_grouping_sets" -> ((s, d) =>
      Analytics.marginals2(
        Tables.lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity"),
        "l_returnflag", "l_linestatus", "l_quantity")),

    "q42_pivot_weekly" -> ((s, d) =>
      Analytics.pivotWeekly(Tables.events(s, d),
        date_format(date_trunc("week", col("ts_t")), "yyyy-MM-dd"),
        "event_type", Seq("click", "error", "purchase", "signup", "view"))),

    "q43_hash_split" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), T.hashSplit(col("text")).as("split"))),

    "q44_top_terms" -> ((s, d) =>
      Analytics.topTerms(Tables.documents(s, d), "text", 50)),

    // Vocabulary coverage / OOV rate per source against the global
    // top-200 term vocabulary: token-mass and type coverage in exact
    // ppm — the tokenizer-fit go/no-go for a new source mix.
    "q357_vocab_coverage" -> ((s, d) =>
      Analytics.vocabCoverage(Tables.documents(s, d), "text", "source",
        vocabSize = 200)),

    "q45_pii_scrub" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), T.piiScrub(col("text")).as("scrubbed"),
        T.piiHits(col("text")).cast("long").as("pii_hits"))),

    // connected() returns a materialized artifact (it checkpoints and
    // releases its own loop caches) — the rename is a free projection.
    "q46_dedup_clusters" -> ((s, d) => clusterLabels(s, d)),

    // Canonicalization by QUALITY: within each near-dup cluster keep the
    // best-quality member (rounded score, id tiebreak) — the curation
    // step after clustering ("which copy do we train on?"), composing the
    // memoized cluster substrate with the q16 quality signal. One window
    // shuffle over the O(clustered docs) label table.
    "q100_canonical_quality" -> ((s, d) => {
      val quality = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
      val byCluster = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
      val pick = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
        .orderBy(col("quality").desc, col("doc_id").asc)
      clusterLabels(s, d).join(quality, "doc_id")
        .withColumn("n_members", count(lit(1)).over(byCluster))
        .withColumn("graft_rn", row_number().over(pick))
        .filter(col("graft_rn") === 1)
        .select(col("cluster"), col("doc_id").as("canonical_id"),
          col("quality"), col("n_members"))
    }),

    "q47_percentiles" -> ((s, d) =>
      Analytics.quartiles(
        Tables.documents(s, d).select("source", "n_chars"), "source", "n_chars")),

    // Ordered collect: smallest-5 part names per brand as one string —
    // collect_list is unordered by contract, so sort in the expression;
    // slice bounds the per-group state the shuffle carries.
    // Deep dimensional chain: fact ⋈ supplier ⋈ nation ⋈ region — the
    // snowflake path. The three dims are broadcast (each orders of
    // magnitude under the fact), so the fact never shuffles before the
    // final group-key exchange.
    // Inter-event gaps per user (lag over the µs grain): the cadence
    // metric behind churn/engagement features. One shuffle on the user
    // key; integer µs math keeps gaps exact.
    "q59_event_gaps" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
      eventsUs(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          max(col("gap")).as("max_gap_us"),
          (sum(col("gap")) / count(lit(1))).as("avg_gap_us"))
    }),

    // Quartile bucketing by ntile over a total order — distribution
    // segmentation (price tiers per brand). ntile's uneven-bucket rule is
    // SQL-standard, so the bucket sizes agree across engines.
    "q60_ntile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p_brand").orderBy(col("p_retailprice").asc, col("p_partkey").asc)
      Tables.part(s, d).select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("tier", ntile(4).over(w).cast("long"))
        .groupBy("p_brand", "tier")
        .agg(count(lit(1)).as("n"),
          round(min(col("p_retailprice")), 2).as("lo"),
          round(max(col("p_retailprice")), 2).as("hi"))
    }),

    "q58_region_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("rev")), 2).as("revenue"))),

    "q56_group_concat" -> ((s, d) =>
      Tables.part(s, d).select("p_brand", "p_name")
        .groupBy("p_brand")
        .agg(array_join(slice(array_sort(collect_list(col("p_name"))), 1, 5), ",")
          .as("sample_names"),
          count(lit(1)).as("n"))),

    // Cross-modal join: text-side quality vs embedding-side label — the
    // docs and embeddings tables co-key on id, so the join is a plain
    // hash join on the shared key (bucket both sides at scale).
    "q57_crossmodal" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), T.qualityScore(col("text")).as("q"))
        .join(Tables.embeddings(s, d).select(col("vec_id").as("doc_id"), col("label")),
          Seq("doc_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg(col("q")), 4).as("avg_quality"),
          round(avg(col("n_chars")), 2).as("avg_chars"))),

    "q54_weekly_active" -> ((s, d) =>
      Analytics.weeklyActive(Tables.events(s, d), "ts_t", "user_id")),

    // µs grain (see q38-q40 note): strict ts inequalities must agree with
    // the oracle engine's µs-truncated timestamps.
    "q55_funnel" -> ((s, d) =>
      Analytics.funnel(eventsUs(s, d), "user_id", "ts_us", "event_type",
        "view", "click", "purchase")),

    "q52_tfidf_terms" -> ((s, d) =>
      Analytics.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", 3)),

    "q53_containment" -> ((s, d) =>
      Dedup.containmentFromStats(pairStats(s, d), minContainment = 0.5)),

    "q51_repetition" -> ((s, d) =>
      Analytics.repetitionProfile(Tables.documents(s, d), "doc_id", "text")),

    "q49_histogram" -> ((s, d) =>
      Etl.histogram(Tables.lineitem(s, d).select("l_extendedprice"),
        "l_extendedprice", width = 6000.0, nBuckets = 20)),

    "q50_star_join" -> ((s, d) =>
      Etl.starRevenue(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d))),

    "q48_salted_topk" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_extendedprice"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("row_id"))
      Skew.saltedTopK(li, "l_extendedprice", "row_id", 20, 8)
        .select("row_id", "l_extendedprice")
    }),

    // Engine-portable MinHash+LSH (md5 min-wise hashing): unlike q21's
    // crc32-native sketch, the whole pipeline — signatures, banding,
    // candidates, verification — replays in DuckDB, so the LSH family
    // gets a hash-exact oracle. 8 bands × 2 rows = 16 hashes, est ≥ 0.5.
    "q82_minhash_portable" -> ((s, d) => portableMinhashPairs(s, d)),

    // Engine-portable 32-bit SimHash (md5 nibble votes, bit-string
    // fingerprint): votes, block banding, and hamming verification all
    // replay in DuckDB — the SimHash twin of q82's oracle-exact contract.
    "q83_simhash_portable" -> ((s, d) =>
      Dedup.simhashPairsPortable(Tables.documents(s, d), "doc_id", "text",
        n = 3, maxHamming = 6)),

    // Exact-sum Pearson correlation matrix over the lineitem measures:
    // integer-quantized values, decimal(38,0) sums (order-independent,
    // exact), correlation assembled in double from the exact sums — so
    // the 6-pair matrix is bit-identical across engines.
    "q84_feature_corr" -> ((s, d) =>
      Analytics.corrMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // Batched exact ANN: ten query vectors answered in ONE corpus scan
    // (broadcast query set + per-query row_number window) — the realistic
    // many-probes retrieval shape, scored identically to q23.
    "q85_ann_batch" -> ((s, d) =>
      Similarity.cosineTopKBatch(Tables.embeddings(s, d), "vec_id",
        "embedding", queryIds = (0L until 10L), k = 5)),

    // Batched probe against the IVF index: ten queries, one pass over the
    // index, (query, probe-cell) table broadcast onto the cell-pruned
    // scan. Probing every cell (nProbe = nLists) makes it provably equal
    // to the brute-force batch, so it hash-checks like q85 while
    // exercising the index plan; SkewAndIvfSpec pins the nProbe<nLists
    // recall and the one-scan shape.
    "q98_ann_ivf_batch" -> ((s, d) =>
      Similarity.ivfTopKBatch(ivfIdx(s, d), "vec_id", "embedding",
        queryIds = (10L until 20L), k = 5, nProbe = 16)),

    // Robust per-type outliers: |value − median| > 3·MAD with exact
    // percentiles — the monitoring screen whose threshold outliers can't
    // poison. Group stats broadcast; rows never shuffle.
    "q86_mad_outliers" -> ((s, d) =>
      Analytics.madOutliers(Tables.events(s, d), "event_type", "event_id",
        "value", k = 3.0)),

    // First-order Markov transition counts over per-user event streams:
    // one user-key window shuffle, O(|types|²) output.
    "q87_transitions" -> ((s, d) =>
      Sessions.transitionCounts(Tables.events(s, d), "user_id", "ts_t",
        "event_id", "event_type")),

    // Weekly cohort retention grid: cohort = first active ISO week per
    // user, cells count distinct users at each week offset.
    "q88_cohort_retention" -> ((s, d) =>
      Analytics.cohortRetention(Tables.events(s, d), "user_id", "ts_t")),

    // Data-quality audit: null/exact-distinct/min/max per measure in one
    // aggregate pass (the approx HLL++ twin is spec'd for the 100 TB path).
    "q89_profile" -> ((s, d) =>
      Analytics.profileNumeric(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // Winsorized per-source doc-length stats: clamp at exact p05/p95 then
    // average — the robust location estimate for feature pipelines.
    "q90_winsorized" -> ((s, d) =>
      Analytics.winsorizedStats(Tables.documents(s, d), "source", "n_chars",
        pLo = 0.05, pHi = 0.95)),

    // Class-balance report with cumulative share (counts first, window
    // only over the O(|labels|) aggregate).
    "q91_label_balance" -> ((s, d) =>
      Analytics.labelBalance(Tables.embeddings(s, d), "label")),

    // Incremental materialized-view refresh as an oracle row: two thirds
    // of events are the "stored" pre-aggregated state, the last third is
    // the arriving batch; merge is O(groups), no history rescan, and the
    // read view equals the full recompute (which is what DuckDB replays).
    "q92_incremental_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        date_format(date_trunc("week", col("ts_t")), "yyyy-MM-dd").as("wk"),
        col("event_type"), col("value"), col("event_id"))
      def state(f: DataFrame) =
        operators.Etl.aggState(f.drop("event_id"), Seq("wk", "event_type"), "value")
      val stored = state(ev.filter(pmod(col("event_id"), lit(3)) =!= 2))
      val batch = state(ev.filter(pmod(col("event_id"), lit(3)) === 2))
      operators.Etl.aggReadView(
        operators.Etl.mergeAggStates(stored, batch, Seq("wk", "event_type")))
        .select(col("wk"), col("event_type"), col("n"),
          round(col("sum_v"), 2).as("sum_v"),
          round(col("min_v"), 4).as("min_v"),
          round(col("max_v"), 4).as("max_v"),
          col("avg_v"))
    }),

    // Retractable incremental refresh: the CDC batch carries DELETES as
    // well as inserts — mergeAggStates would silently corrupt here (min/
    // max can't subtract). retractAggState retracts n/sum algebraically
    // and re-aggregates min/max for ONLY the groups a delete's value
    // could have owned; the oracle is the one-shot recompute over the
    // post-CDC base, which the merged view must equal exactly.
    "q96_retract_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        date_format(date_trunc("week", col("ts_t")), "yyyy-MM-dd").as("wk"),
        col("event_type"), col("value"), col("event_id"))
      val initial = ev.filter(pmod(col("event_id"), lit(3)) =!= 2)
      val cdcIns = ev.filter(pmod(col("event_id"), lit(3)) === 2)
      val cdcDel = initial.filter(pmod(col("event_id"), lit(5)) === 0)
      val baseAfter = ev.filter(!(pmod(col("event_id"), lit(3)) =!= 2 &&
        pmod(col("event_id"), lit(5)) === 0))
      val stored = operators.Etl.aggState(initial.drop("event_id"),
        Seq("wk", "event_type"), "value")
      // avg divides the ROUNDED sum: the retracted sum can differ from
      // the recompute's in the last ulp, and a /n can park the quotient
      // exactly on a .005 boundary — rounding first makes both engines
      // divide the identical double.
      operators.Etl.retractAggState(stored, cdcIns.drop("event_id"),
          cdcDel.drop("event_id"), baseAfter.drop("event_id"),
          Seq("wk", "event_type"), "value")
        .select(col("wk"), col("event_type"), col("n"),
          round(col("sum_v"), 2).as("sum_v"),
          round(col("min_v"), 4).as("min_v"),
          round(col("max_v"), 4).as("max_v"),
          round(round(col("sum_v"), 2) / col("n"), 2).as("avg_v"))
    }),

    // Per-source dedup-rate report — the curation dashboard's first
    // number ("which source is mostly copies?"): one two-phase
    // count(distinct fp) aggregate per source, no pair join anywhere.
    "q101_dedup_rate" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), T.fingerprint(col("text")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          round((count(lit(1)) - countDistinct(col("fp"))).cast("double")
            / count(lit(1)), 4).as("dup_rate"))),

    // Per-dimension embedding profile (64 rows): dead dims, scale drift,
    // variance collapse. Fixed-point quantization makes every stat exact
    // integer math; mean/variance derive bit-identically on both engines.
    "q102_dim_stats" -> ((s, d) =>
      Analytics.dimStats(Tables.embeddings(s, d), "embedding")),

    // Source-vocabulary redundancy matrix (190 pairs at 20 sources): the
    // join is keyed on term over the DEDUPLICATED vocabulary — fan-out
    // bounded by sources², never corpus size.
    "q103_source_overlap" -> ((s, d) =>
      Analytics.sourceOverlap(Tables.documents(s, d), "source", "text")),

    // "800 tokens from every source" deterministic mixing cap: content-
    // hash pick order, exact long cumsum, one window per source partition.
    "q104_token_budget" -> ((s, d) =>
      Corpus.tokenBudgetCap(Tables.documents(s, d), "doc_id", "text",
        "source", budget = 800L)),

    // Full warehouse-load cycle through the DSv2 WRITE path: decoy load →
    // truncate-overwrite (slice A) → append (slice B) → read back via the
    // manifest → aggregate. The oracle sees none of the sink: it aggregates
    // the A∪B predicate directly, so staged commit + truncate + append +
    // read must ALL be exact for the hashes to meet.
    "q105_warehouse_cycle" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_wh_")
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      // (DSv2 via format().save() admits only append/overwrite modes)
      src.limit(50).write.format(fmt).option("path", dir)
        .mode("append").save() // decoy generation the overwrite must drop
      src.filter(col("o_totalprice") < 100000.0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      src.filter(col("o_totalprice") >= 100000.0 &&
          col("o_totalprice") < 150000.0)
        .write.format(fmt).option("path", dir).mode("append").save()
      s.read.format(fmt).option("path", dir).load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // "Does this join need salting?" — the pre-shuffle key audit: skew
    // ratio (max / mean rows-per-key) per candidate key, one two-phase
    // aggregate each, nothing key-cardinality-sized on the driver.
    "q106_key_skew" -> ((s, d) =>
      Skew.keySkewReport(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))),

    // Vector-corpus hygiene: distribution of embedding norms (zero /
    // degenerate / outlier vectors show up as edge buckets). Quantized
    // components make norm² an exact long; the histogram is one narrow
    // aggregate — no shuffle wider than the bucket count.
    "q107_norm_histogram" -> ((s, d) => {
      val q = transform(col("embedding").cast("array<double>"),
        x => floor(x * 1000 + lit(0.5)).cast("long"))
      val norms = Tables.embeddings(s, d).select(
        aggregate(q, lit(0L), (acc, v) => acc + v * v)
          .cast("double").as("norm2_q"))
      Etl.histogram(norms, "norm2_q", 1e6, 20)
    }),

    // Split-balance audit: per-source train/test shares of the q43
    // deterministic content-hash split — the "is my held-out set
    // represented in every source?" check before training.
    "q108_split_balance" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      Tables.documents(s, d)
        .select(col("source"), T.hashSplit(col("text")).as("split"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"))
        .withColumn("frac",
          round(col("n").cast("double") / sum(col("n")).over(w), 4))
    }),

    // Weekly stickiness (DAU/WAU): Σ active-days / (7·WAU) per ISO week —
    // the habit metric; one distinct + two shrinking aggregates.
    "q109_stickiness" -> ((s, d) =>
      Analytics.stickiness(Tables.events(s, d), "user_id", "ts_t")),

    // Per-source lexical diversity: type/token ratio + hapax fraction —
    // the template-boilerplate / OCR-noise screen over the corpus.
    "q110_lexical_diversity" -> ((s, d) =>
      Analytics.lexicalDiversity(Tables.documents(s, d), "source", "text")),

    // Truncation-duplicate screen: same first-16-token prefix, different
    // doc — one md5 + one aggregate, the cheapest near-dup family member.
    "q111_prefix_dups" -> ((s, d) =>
      Dedup.prefixDuplicates(Tables.documents(s, d), "doc_id", "text", 16)),

    // Activity concentration: share of events from the top 1/5/10% of
    // users — Lorenz audit via count-of-counts, never a user-level sort.
    "q112_user_concentration" -> ((s, d) =>
      Analytics.userConcentration(Tables.events(s, d), "user_id",
        Seq(0.01, 0.05, 0.10))),

    // Event-type co-occurrence lift over distinct (user, type) — the
    // market-basket view; |types|²-bounded fan-out, broadcast totals.
    "q113_cooccur_lift" -> ((s, d) =>
      Analytics.eventCooccurrence(Tables.events(s, d), "user_id",
        "event_type")),

    // Label-centroid separation matrix: exact fixed-point mean centroids,
    // integer-cleared distance numerator, one corpus pass.
    "q114_label_separation" -> ((s, d) =>
      Similarity.labelCentroidDistances(Tables.embeddings(s, d), "label",
        "embedding")),

    // Time-windowed ordered funnel: click after signup, purchase after
    // click, everything within 7 days of the FIRST signup — q55's honest
    // sibling (no credit for a conversion a year later).
    "q115_windowed_funnel" -> ((s, d) =>
      Analytics.windowedFunnel(eventsUs(s, d), "user_id", "ts_us",
        "event_type", Seq("signup", "click", "purchase"),
        windowUs = 7L * 86400 * 1000000)),

    // Top user journeys: most common first-3-event-type session paths;
    // positions come off the one user-keyed window pass, rows beyond
    // position 3 drop before any list is built.
    "q116_session_paths" -> ((s, d) =>
      Sessions.sessionPaths(eventsUs(s, d), "user_id", "ts_us", "event_id",
        "event_type", gapUs = 30L * 60 * 1000000, k = 3, topN = 25)),

    // Daily volume anomalies: per-type day counts z-scored against the
    // trailing 28 observed days (yesterday back) — exact integer window
    // sums, so z replays bit-identically.
    "q117_daily_anomaly" -> ((s, d) =>
      Analytics.dailyAnomalies(Tables.events(s, d), "event_type", "ts_t",
        trailing = 28, minHistory = 7)),

    // LSH banding quality audit: the q82 candidate pipeline (agreement
    // filter off) scored against exact shingle-Jaccard truth at 0.5 —
    // measured precision/recall of 8×2 banding on THIS corpus, the
    // number that sizes a 100 TB dedup run. Reuses the memoized
    // pair-stats substrate for the truth leg.
    "q118_lsh_quality" -> ((s, d) =>
      Dedup.lshQualityAudit(Tables.documents(s, d), "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, trueJaccard = 0.5,
        precomputedStats = Some(pairStats(s, d)))),

    // Duplicate-cluster size histogram over the memoized q46 labels:
    // "is duplication a few mega-clusters or a long tail?" — the shape
    // that picks between survivor-ranking strategies.
    "q119_cluster_sizes" -> ((s, d) =>
      clusterLabels(s, d)
        .groupBy("cluster").agg(count(lit(1)).as("graft_sz"))
        .groupBy(col("graft_sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          (count(lit(1)) * col("graft_sz")).as("n_docs"))),

    // Length-bucketed batch packing report: rank within ⌊tokens/32⌋
    // buckets, chop into 16-doc batches, report per-batch padding waste —
    // the bucketed-batching audit; the window key is the bounded bucket,
    // never a global order.
    "q99_length_batches" -> ((s, d) =>
      Corpus.lengthBatches(Tables.documents(s, d), "doc_id", "text",
        binTokens = 32, batchSize = 16)),

    // Bloom-sidecar point lookup as a driver row: the probe consults the
    // O(nFiles) sidecar, reads ONLY candidate files, and re-applies the
    // exact predicate — the oracle is the plain filter, because blooms
    // change which FILES are read, never which ROWS come back.
    "q97_bloom_lookup" -> ((s, d) => {
      val (store, side) = bloomStorePaths(s, d)
      sources.BloomIndex.lookup(s, store, side, "doc_id", "7")
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // Weekly churn — q88's complement: users active in week w with no
    // activity in week w+1, via a left-anti join between the weekly
    // distinct-user sets (user-set-sized, never event-sized). The final
    // calendar week trivially "churns" (no successor week exists) —
    // included deliberately so the row is a closed-form replay.
    "q94_weekly_churn" -> ((s, d) => {
      val wu = Tables.events(s, d).select(
        date_trunc("week", col("ts_t")).cast("date").as("wk"),
        col("user_id")).distinct()
      val nxt = wu.select(col("wk").as("wk2"), col("user_id").as("uid2"))
      wu.join(nxt, wu("user_id") === nxt("uid2") &&
          date_add(wu("wk"), 7) === nxt("wk2"), "left_anti")
        .groupBy(date_format(col("wk"), "yyyy-MM-dd").as("wk"))
        .agg(countDistinct(col("user_id")).as("churned"))
    }),

    // Rolling 7-day active users per observed day: bounded ×7 explode +
    // observed-day semi-join + one distinct-count — never a range
    // self-join (quadratic in the window) and never a window frame
    // (count distinct has none).
    "q95_rolling_active" -> ((s, d) =>
      Analytics.rollingActiveUsers(Tables.events(s, d), "user_id", "ts_t", 7)),

    // The salted skewed join in the driver contract: semantics are
    // EXACTLY the plain join's (which is what DuckDB replays) while the
    // physical join keys on (suppkey, salt) — the manual skew spread for
    // plans AQE can't rewrite. Dim side: supplier ⋈ nation, broadcast.
    "q93_salted_join" -> ((s, d) => {
      val fact = Tables.lineitem(s, d).select(col("l_suppkey"),
        col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val dim = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("l_suppkey"), col("n_name"))
      operators.Skew.saltedJoin(fact, dim, "l_suppkey", "l_orderkey", 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), round(sum(col("rev")), 2).as("revenue"))
    }),

    // Tuned gradient-boosted trees — the notebook's searched-XGBoost
    // analog (learning rate × depth × rounds over a train/validation
    // screen). Rows-only: a distributed GBT fit has no SQL oracle; the
    // holdout metrics row is the driver surface.
    "q120_tuned_gbt" -> ((s, d) =>
      ml.Popularity.tunedGbt(s,
        Tables.lineitem(s, d)
          .filter(pmod(col("l_orderkey"), lit(80)) === 0)
          .select("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")._2),

    // Snapshot reconciliation: current orders vs a deterministically
    // perturbed next load (deletes at %13, price bumps at %7, inserts at
    // %11 under shifted keys) — the pre-cutover diff report, ONE
    // full-outer join reduced to status cardinality.
    "q121_reconcile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val r = o.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 7 === 0,
            round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")).as("p"))
        .unionByName(o.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 10000000L).as("k"),
            col("o_totalprice").as("p")))
      Etl.reconcile(l, r, Seq("k"), Seq("p"))
    }),

    // Feature-drift screen between the low- and high-quantity halves of
    // lineitem over revenue: per-bin populations plus the exact-integer
    // cumulative L1 distance (the engine-portable PSI stand-in).
    "q122_feature_drift" -> ((s, d) =>
      Analytics.featureDrift(Tables.lineitem(s, d), "l_extendedprice",
        col("l_quantity") <= 25, col("l_quantity") > 25,
        lo = 0.0, hi = 110000.0, bins = 22)),

    // All-dtype schema-health audit: null/distinct/constant per column in
    // ONE Expand-planned aggregate pass over orders.
    "q123_column_hygiene" -> ((s, d) =>
      Analytics.columnHygiene(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))),

    // Zone-map range scan: range-clustered store + per-file min/max
    // sidecar; the probe reads only files whose interval intersects the
    // range, then re-applies the exact predicate — so the oracle is the
    // plain filter (zone maps change which FILES are read, never which
    // rows come back). ZoneMapIndexSpec holds the ≤2-of-16 pruning bar.
    "q124_zonemap_scan" -> ((s, d) => {
      val (store, side) = zoneStorePaths(s, d)
      sources.ZoneMapIndex.rangeScan(s, store, side, "n_chars",
        lit(200L), lit(400L))
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // Warehouse time travel, end-to-end: generation 0 (overwrite) is read
    // back AS OF its version AFTER a later append changed the live table —
    // the oracle sees only the sink-free predicate of generation 0, so
    // manifest retention + versioned file listing must both be exact.
    "q125_time_travel" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_tt_")
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      src.filter(col("o_totalprice") < 100000.0)
        .write.format(fmt).option("path", dir).mode("overwrite").save() // v0
      src.filter(col("o_totalprice") >= 100000.0)
        .write.format(fmt).option("path", dir).mode("append").save() // v1
      s.read.format(fmt).option("path", dir)
        .option("versionAsOf", "0").load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // Corpus-frequency boilerplate strip — the line/paragraph-dedup step
    // of web-corpus pipelines on 3-token segments: a segment shared by
    // more than 2 documents is chrome, not content.
    "q126_boilerplate_strip" -> ((s, d) =>
      Corpus.boilerplateStrip(Tables.documents(s, d), "doc_id", "text",
        segTokens = 3, maxDf = 2)),

    "q127_lang_fertility" -> ((s, d) =>
      Corpus.langFertility(Tables.documents(s, d), "text", "lang")),

    // Train/test contamination audit: embedding near-dup pairs (q24
    // semantics) whose members land on OPPOSITE sides of the q43 hash
    // split — each such pair leaks evaluation signal into training.
    "q128_split_leakage" -> ((s, d) => {
      val pairs = Dedup.embeddingNearDup(Tables.embeddings(s, d),
        "vec_id", "embedding", "label", 0.3)
      val splits = Tables.documents(s, d)
        .select(col("doc_id"), T.hashSplit(col("text")).as("split"))
      pairs
        .join(splits.select(col("doc_id").as("id1"),
          col("split").as("split1")), "id1")
        .join(splits.select(col("doc_id").as("id2"),
          col("split").as("split2")), "id2")
        .filter(col("split1") =!= col("split2"))
        .select("id1", "id2", "cos", "split1", "split2")
    }),

    // Engine-portable Lloyd clustering (quantized integer grid, k lowest
    // ids as seeds, floor-divided centroid updates) — the hash-checkable
    // twin of the seeded MLlib KMeans path, the same promotion q82/q83
    // made for the MinHash/SimHash sketches.
    "q129_kmeans_portable" -> ((s, d) =>
      ml.KMeansLite.fit(Tables.part(s, d), "p_partkey",
        floor(col("p_retailprice") * 100 + 0.5), col("p_size") * 10000,
        k = 4, iters = 3)),

    // Declarative expectation suite over the fact tables: publish-gate
    // checks with planted-threshold rules that actually fire (price cap,
    // discount cap, status subset) alongside the structural ones that
    // must hold (keys unique, FKs resolve, priority format).
    "q130_expectations" -> ((s, d) => {
      import Expectations._
      val orders = Tables.orders(s, d)
      val ordersReport = Expectations.check(orders, Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 0.0, 400000.0),
        Matches("o_orderpriority", "^[1-5]-"),
        OneOf("o_orderstatus", Seq("O", "F")),
        Unique(Seq("o_orderkey")),
        RefIntegrity("o_custkey", Tables.customer(s, d), "c_custkey",
          "customer")))
      val lineitemReport = Expectations.check(Tables.lineitem(s, d), Seq(
        InRange("l_discount", 0.0, 0.05),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("l_orderkey", orders, "o_orderkey", "orders")))
      ordersReport.unionByName(lineitemReport)
    }),

    // Engine-portable PageRank over the supplier↔part bipartite graph
    // (distinct lineitem edges, symmetrized; parts offset to their own id
    // space). Integer micro-unit ranks → the unrolled SQL oracle replays
    // every iteration bit-for-bit.
    "q131_pagerank" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      val edges = li.select(col("sk").as("src"), col("pk").as("dst"))
        .unionByName(li.select(col("pk").as("src"), col("sk").as("dst")))
      Graph.pagerankPortable(edges, "src", "dst", iters = 3, topK = 20)
    }),

    // BM25 ranked retrieval (rational idf, micro-unit fixed point) for a
    // three-term query over the corpus.
    "q132_bm25" -> ((s, d) =>
      Search.bm25(Tables.documents(s, d), "doc_id", "text",
        Seq("join", "vector", "slow"), topK = 20)),

    // SQ8 scalar quantization: per-dim [min,max] → 8-bit codes. The CSV
    // form hash-checks the exact codes of the first 20 vectors.
    "q133_sq8_codes" -> ((s, d) =>
      Quantize.sq8Encode(Tables.embeddings(s, d), "vec_id", "embedding")
        .filter(col("vec_id") < 20)
        .select("vec_id", "codes_csv")),

    // ANN over the SQ8 codes: quantized dot product is pure integer
    // arithmetic, so the whole search is hash-exact — no float caveats.
    "q134_sq8_ann" -> ((s, d) =>
      Quantize.sq8TopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 20)),

    // Impact-ordered inverted index: top-30 terms by df, each with its
    // top-5 postings (tf desc) as a doc:tf string.
    "q135_inverted_index" -> ((s, d) =>
      Search.invertedIndex(Tables.documents(s, d), "doc_id", "text",
        maxPostings = 5, topTerms = 30)),

    // The dead-letter side of the q130 gate: rows failing a row-local
    // rule, each labeled with what it violated.
    "q136_quarantine" -> ((s, d) => {
      import Expectations._
      Expectations.quarantine(Tables.orders(s, d), Seq(
        InRange("o_totalprice", 0.0, 400000.0),
        OneOf("o_orderstatus", Seq("O", "F"))))
        .select("o_orderkey", "violated")
    }),

    // Deterministic A/B readout: view-exposed users hash-split into arms,
    // conversion = a purchase over 50; all rates in integer ppm.
    "q137_ab_lift" -> ((s, d) =>
      Experiment.abLift(Tables.events(s, d), "user_id", "event_type",
        "value", exposureType = "view", conversionType = "purchase",
        minValue = 50.0)),

    // Trending: rational recency decay (10⁶ div (1+age_days)) — integer
    // arithmetic end to end, snapshot-deterministic reference time.
    "q138_trending" -> ((s, d) =>
      Analytics.decayedEngagement(eventsUs(s, d), "event_type", "ts_us")),

    // The end-to-end corpus build, composed from the pipeline's own
    // stages: quality threshold → exact-dedup survivor → decontaminate
    // against the held-out set → per-source token budget → final mix
    // report. Every stage is an already-oracle-proven operator; the
    // composition is the "switch your curation pipeline to this library"
    // demonstration, hash-checked end to end.
    "q140_corpus_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isTest = col("doc_id") % 97 === 0
      val train = docs.filter(!isTest)
        .filter(T.qualityScore(col("text")) >= 0.5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("graft_fp").orderBy(col("doc_id").asc)
      val surv = train
        .withColumn("graft_fp", T.fingerprint(col("text")))
        .withColumn("graft_rk", row_number().over(w))
        .filter(col("graft_rk") === 1)
        .drop("graft_fp", "graft_rk")
      // Only surv docs' contamination status can affect the result, so the
      // train side of the check is restricted to surv — quality-rejected and
      // dedup-dropped docs are never shingled. The test side still needs the
      // FULL held-out split, hence the union rather than a plain filter.
      val keep = Corpus.decontaminate(
        docs.filter(isTest).unionByName(surv), "doc_id", "text", isTest, 3)
      val clean = surv.join(keep, Seq("doc_id"), "left_semi")
      Corpus.tokenBudgetCap(clean, "doc_id", "text", "source", 800L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast("long").as("tot_tokens"))
    }),

    // Change data feed between warehouse generations: gen 0 = the full
    // snapshot; gen 1 = an overwrite that drops the >450k tail and
    // rewrites sub-50k statuses. The version-to-version reconcile is the
    // Delta CHANGES readout on the manifest history.
    "q139_table_changes" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_cdf_")
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      src.write.format(fmt).option("path", dir).mode("overwrite").save()
      src.filter(col("o_totalprice") <= 450000.0)
        .withColumn("o_orderstatus",
          when(col("o_totalprice") < 50000.0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      val v0 = s.read.format(fmt).option("path", dir)
        .option("versionAsOf", "0").load()
      val v1 = s.read.format(fmt).option("path", dir)
        .option("versionAsOf", "1").load()
      Etl.reconcile(v0, v1, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
    }),

    // SemDeDup-style semantic dedup: sign-bit coarse cells over the
    // embedding space, greedy lowest-id-wins inside each cell at
    // cos ≥ 0.35. Per-cell survivor counts, oracle-replayed exactly.
    "q141_semantic_dedup" -> ((s, d) =>
      Dedup.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        signBits = 4, minCos = 0.35)),

    // Passage-level duplication: 8-token windows at stride 4, md5 window
    // hashes; per-doc count of windows shared with ANOTHER doc.
    "q142_passage_dedup" -> ((s, d) =>
      Dedup.passageDuplication(Tables.documents(s, d), "doc_id", "text",
        w = 8, stride = 4)),

    // k-anonymity audit on customer quasi-identifiers (nation, market
    // segment, account-balance band): groups under k=3 are
    // re-identification risks.
    "q143_k_anonymity" -> ((s, d) =>
      Analytics.kAnonymityRisk(Tables.customer(s, d),
        Seq(col("c_nationkey"), col("c_mktsegment"),
          expr("CAST(floor(c_acctbal / 2000) AS BIGINT)")),
        Seq("nation", "segment", "balance_band"), k = 3L)),

    // Corpus-trained character-bigram fluency score (the perplexity-filter
    // analog) in integer parts-per-million; 20 least fluent docs.
    "q144_fluency" -> ((s, d) =>
      Corpus.fluencyScore(Tables.documents(s, d), "doc_id", "text",
        bottomK = 20)),

    // Tokenizer-vocabulary induction: the first 4 BPE merges learned from
    // the corpus word-frequency table (one corpus scan, then vocab-sized
    // iterations); oracle = the 4 merge rounds unrolled as SQL CTEs.
    "q145_bpe_merges" -> ((s, d) => bpeMergeTable(s, d)),

    // Apply the corpus-learned merges back per source: token-count
    // compression readout (chars baseline vs BPE'd), integer ppm savings.
    // The learning pass is the memoized q145 substrate — computed once.
    "q146_bpe_encode" -> ((s, d) =>
      Vocab.bpeEncode(Tables.documents(s, d), "text", "source", merges = 4,
        precomputed = Some(bpeMergeTable(s, d)))),

    // Per-source data card — the model-card readout (docs, tokens, mean
    // quality in basis points, exact-dup ppm, language count) composed
    // from already-proven per-doc metrics, all integer-exact aggregation.
    // Paged-external-source ingest (sources/PagedSource.scala): the
    // reference DAG's REST extract loop as a DSv2 connector. The
    // documents table is serialized into a paged JSONL endpoint (page =
    // doc_id div 100 — dense ids make pages contiguous, the protocol's
    // contract), read back through planning-time page slicing with
    // per-partition fetch, and rolled up; the oracle replays the rollup
    // straight off the parquet — the connector round-trip is the fact
    // under test.
    "q153_paged_source" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q153_" + (d.hashCode.toLong & 0xffffffffL)).getAbsolutePath
      sources.PagedEndpoint.writeFixture(
        Tables.documents(s, d).select(
          to_json(struct(col("doc_id"), col("lang"), col("source"),
            col("n_chars"))).as("value"),
          (col("doc_id") / lit(100)).cast("int").as("page")),
        dir)
      s.read.format("graft.sources.PagedSource")
        .option("dir", dir).option("slices", "8")
        .option("schema", "doc_id LONG, lang STRING, source STRING, n_chars LONG")
        .load()
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          max("doc_id").as("max_doc_id"))
    }),

    // Audio-metadata extraction over REAL WAV containers: each doc gets a
    // synthesized RIFF/WAVE payload whose fmt/data fields are pure
    // functions of doc_id, the partition-wise decoder parses them back,
    // and the oracle recomputes every field arithmetically — so the hash
    // match verifies parse(synth(p)) == p end-to-end through the typed
    // binary-column path (digest dropped: the oracle can't md5 bytes it
    // never builds). Synthesis and decode are both map-only sweeps.
    "q155_audio_meta" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          multimodal.Binary.MediaRecord(id, "audio",
            multimodal.Binary.synthWav(
              sampleRate = (8000 * (1 + id % 3)).toInt,
              channels = (1 + id % 2).toInt,
              bitsPerSample = (8 * (1 + id % 2)).toInt,
              nSamples = 200 + id % 100), src)
        }
      multimodal.Binary.extractAudioMeta(media).toDF()
        .select("media_id", "size_bytes", "sample_rate", "channels",
          "bits_per_sample", "n_samples", "duration_ms")
    }),

    // Video twin of q155: ISO BMFF containers synthesized from
    // doc_id-derived parameters (timescale 600, the QuickTime default),
    // decoded by the real box walk, fields re-derived arithmetically by
    // the oracle — parse(synth(p)) == p for the video path.
    "q156_video_meta" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          multimodal.Binary.MediaRecord(id, "video",
            multimodal.Binary.synthMp4(
              width = (160 * (1 + id % 8)).toInt,
              height = (120 * (1 + id % 6)).toInt,
              durationUnits = 600 + id % 1000), src)
        }
      multimodal.Binary.extractVideoMeta(media).toDF()
        .select("media_id", "width", "height", "duration_ms")
    }),

    // File-skipping probe through the warehouse scan: orders land in 8
    // disjoint o_orderkey-range files (each with its stats sidecar), and
    // the range probe reads back through the stats-pruned DSv2 scan — the
    // oracle replays the same predicate on the parquet directly, so the
    // hash proves skipping loses no rows (the partition-count assertions
    // live in WarehouseSinkSpec; this is the completeness contract).
    // Money sums in floor'd integer cents: Spark's double→long cast
    // truncates where DuckDB's rounds, so the floor is explicit.
    "q158_warehouse_skip" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whskip_")
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .repartitionByRange(8, col("o_orderkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      s.read.format(fmt).option("path", dir).load()
        .filter(col("o_orderkey") >= 1000L && col("o_orderkey") < 3000L)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Metadata-only table probe: unfiltered COUNT(*)/MIN/MAX answered
    // entirely from the manifest's per-file stats sidecars — the scan
    // plans ONE synthetic partition and never opens a data file (the
    // Delta/Iceberg "O(metadata) sanity probe"; on a 100 TB table this is
    // the difference between milliseconds and a full scan). The spec
    // proves the no-data-read claim by deleting a data file and
    // aggregating anyway; here the oracle proves exactness against the
    // raw source the warehouse was loaded from.
    "q159_metadata_agg" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whagg_")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          col("l_quantity").cast("double").as("qty"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"))
        .repartition(8)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      s.read.format(fmt).option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"),
          min("qty").as("min_qty"), max("qty").as("max_qty"),
          min("ship").as("min_ship"), max("ship").as("max_ship"))
    }),

    // Deterministic epoch-shard balance: the seeded hash-bucket shard
    // assignment a trainer shuffles by, audited for evenness (a skewed
    // shard is a straggler for the whole training step). Pure function
    // of (seed, doc_id) — survives repartitioning and engine swaps.
    "q160_epoch_shards" -> ((s, d) =>
      Corpus.epochShardReport(Tables.documents(s, d), "doc_id", "text",
        seed = 7L, nShards = 8)),

    // C4-style per-source frequency cap: at most 40 docs per source,
    // chosen by seeded-hash rank (WindowGroupLimit bounds every
    // partition's contribution BEFORE the shuffle).
    "q161_source_cap" -> ((s, d) =>
      Corpus.sourceCapSurvivors(Tables.documents(s, d), "doc_id", "source",
        seed = 7L, cap = 40)),

    // Corpus release manifest: per (source, split) counts + exact
    // order-independent 48-bit XOR content checksum any engine replays.
    "q162_release_manifest" -> ((s, d) =>
      Corpus.releaseManifest(Tables.documents(s, d), "text", "source")),

    // Lossless-audio edition of q155: FLAC STREAMINFO containers
    // synthesized from doc_id-derived parameters, decoded by the real
    // bit-field parse, every field re-derived arithmetically by the
    // oracle — parse(synth(p)) == p through the typed partition sweep.
    "q166_flac_meta" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          multimodal.Binary.MediaRecord(id, "audio",
            multimodal.Binary.synthFlac(
              sampleRate = (8000 * (1 + id % 4)).toInt,
              channels = (1 + id % 2).toInt,
              bitsPerSample = (8 + (id % 3) * 4).toInt,
              nSamples = 300 + id % 200), src)
        }
      multimodal.Binary.extractAudioMeta(media).toDF()
        .select("media_id", "size_bytes", "sample_rate", "channels",
          "bits_per_sample", "n_samples", "duration_ms")
    }),

    // Copy-on-write DELETE through the warehouse manifest: candidate
    // files chosen by the SAME stats algebra the skip path tests, so a
    // narrow delete rewrites the overlapping range files and carries
    // every other file by name; readback proves row-exact semantics.
    "q165_warehouse_delete" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whdel_")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartitionByRange(8, col("o_orderkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.deleteWhere(s, dir,
        Seq(GreaterThanOrEqual("o_orderkey", 2000L),
          LessThan("o_orderkey", 4000L)))
      s.read.format(fmt).option("path", dir).load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Heaps-law vocabulary growth at geometric corpus prefixes: ONE
    // corpus scan (a term's contribution to every prefix is fixed by its
    // first appearance), vs the naive rescan-per-checkpoint. The
    // sub-linear curve is the "diverse or recycled?" probe run before
    // committing a training run to a corpus.
    "q163_vocab_growth" -> ((s, d) =>
      Analytics.vocabGrowth(Tables.documents(s, d), "doc_id", "text",
        checkpoints = Seq(50L, 500L, 5000L, 50000L, 500000L))),

    // CCNet-style model-based quality filter: hashed bag-of-words
    // logistic regression bootstrapped from weak labels at the corpus
    // MEDIAN of the heuristic score (balanced classes by construction —
    // a fixed threshold would drift degenerate across scale factors).
    // The median is ONE driver double; everything else distributes.
    // Model-dependent probabilities → rows-only; the planted-
    // separability spec carries the correctness claim.
    "q164_quality_classifier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val med = docs.select(T.qualityScore(col("text")).as("graft_q"))
        .agg(expr("percentile(graft_q, 0.5)")).collect()(0).getDouble(0)
      ml.QualityClassifier.weakLabelPipeline(docs, "doc_id", "text",
        labelOf = T.qualityScore(col("text")) > med, dim = 1024)
    }),

    // Temperature-weighted (α = 0.5) source allocation over a 1M-token
    // budget: the training-mix smoothing readout, floor'd fixed-point
    // weights so the hash check is engine-exact.
    "q157_temperature_mix" -> ((s, d) =>
      Corpus.temperatureMix(Tables.documents(s, d), "text", "source",
        budgetTokens = 1000000L, alpha = 0.5)),

    "q152_data_card" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          T.wordTokens(col("text")).cast("long").as("graft_t"),
          floor(T.qualityScore(col("text")) * 10000 + 0.5).cast("long")
            .as("graft_q"),
          T.fingerprint(col("text")).as("graft_fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("graft_t").as("n_tokens"),
          expr("sum(graft_q) div count(1)").as("mean_quality_bp"),
          count_distinct(col("graft_fp")).as("graft_u"),
          count_distinct(col("lang")).as("n_langs"))
        .withColumn("dup_ppm",
          expr("(n_docs - graft_u) * 1000000 div n_docs"))
        .drop("graft_u")),

    // Three-way weighted content-hash split (80/10/10): the 16-bit hex
    // bucket compared against literal bounds — reproducible across
    // engines, runs, and repartitioning; per-source counts readout.
    "q151_hash_split3" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          T.hashSplit3(col("text"), trainPct = 80, valPct = 10).as("split"))
        .groupBy("source", "split").agg(count(lit(1)).as("n_docs"))),

    // JSONL corpus ingestion with corrupt-line quarantine: documents
    // round-trip through the one-doc-per-line dump format with every
    // 97th line deterministically truncated mid-object; the PERMISSIVE
    // read routes those to _corrupt_record and the readout rolls up
    // clean counts per source plus the quarantined line count.
    "q150_jsonl_quarantine" -> ((s, d) => {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q150_" + (d.hashCode.toLong & 0xffffffffL)).getAbsolutePath
      val lines = Tables.documents(s, d).select(
        when(pmod(col("doc_id"), lit(97)) === 0,
          concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
            lit(",\"source\":\""), col("source"), lit("\",\"text\":")))
          .otherwise(to_json(struct(col("doc_id"), col("source"),
            col("text")))).as("value"))
      lines.coalesce(4).write.mode("overwrite").text(dir)
      sources.Semi.readJsonlQuarantine(s, dir,
          "doc_id LONG, source STRING, text STRING")
        .groupBy(when(col("graft_status") === "corrupt", lit("_corrupt"))
          .otherwise(col("source")).as("source"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("graft_status") === "ok",
            length(col("text"))).otherwise(0L)).as("clean_chars"))
    }),

    // The reference DAG's transform cadence end to end (dag.py's
    // extract→align→concat→dedup→chart chain, q140's discipline for the
    // music-ETL side): history store + a re-fetched "API batch" whose
    // window OVERLAPS the store by 7 days (renamed fields, aligned back),
    // concatenated, overlap collapsed by keyed dedup, and the weeks-on-
    // chart leaderboard read off the merged store — hash-checked end to
    // end. Every stage is an already-proven primitive; the only new facts
    // are the handoffs.
    "q149_etl_pipeline" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val dayNs = 86400L * 1000000000L
      val m = ev.agg(max(col("ts")).as("graft_mt"))
      val wide = ev.crossJoin(broadcast(m))
      val hist = wide.filter(col("ts") <= col("graft_mt") - lit(7L * dayNs))
      val batch = wide.filter(col("ts") > col("graft_mt") - lit(14L * dayNs))
      // the "API" ships its own field names; align back to the warehouse
      // schema (dag.py's rename/align step) before the concat
      val api = batch.select(col("event_id").as("id"),
        col("user_id").as("entity"), col("ts").as("captured_at"),
        col("ts_t").as("captured_t"), col("value").as("score"))
      val aligned = api.select(col("id").as("event_id"),
        col("entity").as("user_id"), col("captured_at").as("ts"),
        col("captured_t").as("ts_t"), col("score").as("value"))
      val cols = Seq("event_id", "user_id", "ts", "ts_t", "value")
      val merged = hist.select(cols.map(col): _*).unionByName(aligned)
      val store = Etl.dedupKeys(merged, Seq("event_id"), Seq("ts"))
      Charts.weeksOnChart(store, "user_id", "ts_t", "value", 10)
    }),

    // Hard-negative mining: per anchor, the 2 most similar DIFFERENT-label
    // vectors from its coarse cell — contrastive-training pair selection,
    // deterministic (6-dp cosine, id tiebreak).
    "q148_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", signBits = 4, k = 2)),

    // Incremental MinHash near-dup: the batch (docs with id % 3 != 0)
    // probes the ingested third's PERSISTED bucketed band store, verified
    // against its persisted signatures — q81's incremental shape for the
    // LSH family, oracle-replayed end to end.
    "q147_incremental_minhash" -> ((s, d) => {
      val (bandTbl, sigTbl) = lshStoreTables(s, d)
      Dedup.incrementalMinhash(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) =!= 0),
        "doc_id", "text", n = 3, bands = 8, rowsPerBand = 2,
        minAgree = 0.5, s.table(bandTbl), s.table(sigTbl))
    }),

    // Incremental SEMANTIC near-dup: the batch (vectors with id % 3 != 0)
    // probes the ingested third's PERSISTED bucketed sign-cell store —
    // q147's split-candidate shape over q141's cosine semantics, the
    // batch view of graft.streaming.SemanticIngest's per-trigger probe.
    "q154_incremental_semantic" -> ((s, d) =>
      Dedup.incrementalSemantic(
        Tables.embeddings(s, d).filter(pmod(col("vec_id"), lit(3)) =!= 0),
        "vec_id", "embedding", signBits = 4, minCos = 0.35,
        s.table(semanticStoreTable(s, d)))),

    // Exact ROC-AUC of the heuristic quality score against a
    // length-based label (Mann-Whitney midrank formulation, integer
    // end-to-end): the offline-eval readout that decides whether a
    // cheap scorer is worth gating a 100 TB corpus on. Score quantized
    // to 1e4; the rank window runs over the ≤10⁴-row per-score table,
    // never the corpus.
    "q167_roc_auc" -> ((s, d) =>
      ml.Eval.rocAuc(scoredDocs(s, d), "score_q", "label")),

    // Exact average precision (PR-AUC step area) with BOTH
    // deterministic tie bounds — the class-imbalance ranking readout
    // next to q167's ROC-AUC. Scored as "does the quality score
    // retrieve English?" — a genuinely partial separation (stopword
    // ratios favor English), so the tie bounds do real work.
    "q366_avg_precision" -> ((s, d) =>
      ml.Eval.averagePrecision(
        Tables.documents(s, d).select(
          greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
            lit(10000L)), lit(0L)).cast("long").as("score_q"),
          (col("lang") === "en").cast("long").as("label")),
        "score_q", "label")),

    // Reliability table for the same scorer: 10 equal-width score bins,
    // exact mean score vs empirical positive rate (both floor-ppm) — the
    // calibration readout next to q167's ranking readout.
    "q168_calibration" -> ((s, d) =>
      ml.Eval.calibration(scoredDocs(s, d), "score_q", "label",
        bins = 10, scale = 10000L)),

    // Precision/recall/F1 sweep across 9 quality thresholds: confusion
    // counts exact, rates floor-ppm, F1 from the ppm pair — the
    // threshold-picking table for the corpus quality gate.
    "q169_threshold_sweep" -> ((s, d) =>
      ml.Eval.thresholdSweep(scoredDocs(s, d), "score_q", "label",
        thresholds = (1000L to 9000L by 1000L))),

    // CUPED variance-reduced A/B readout: purchase value split at the
    // month midpoint into pre-period covariate and post-period outcome,
    // pooled θ from exact decimal sums, adjusted per-arm means in
    // floor-ppm of centi-units — deterministic arm assignment like q137.
    "q170_cuped" -> ((s, d) =>
      Experiment.cuped(eventsUs(s, d), "user_id", "event_type", "value",
        "ts_us", metricType = "purchase",
        cutTsUs = java.time.LocalDate.of(2024, 1, 16)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L)),

    // Copy-on-write MERGE through the warehouse manifest: a key-local
    // update batch (every 10th order repriced) plus disjoint inserts;
    // the updates' key bounding box prunes candidate files, matched old
    // versions drop via anti-join, ONE generation publishes. Readback
    // proves row-exact upsert semantics against the relational recompute.
    "q171_warehouse_merge" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whmrg_")
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      base.repartitionByRange(8, col("o_orderkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(base.filter(col("o_orderkey") % 97 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(50.25).as("o_totalprice")))
      graft.sources.WarehouseSink.merge(s, dir, updates, Seq("o_orderkey"))
      s.read.format(fmt).option("path", dir).load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Copy-on-write UPDATE WHERE SET: a key-range reprice rewrites only
    // the stats-overlapping files (assignments see pre-update values,
    // NULL predicates leave rows untouched); readback vs the CASE
    // recompute proves row-exact in-place semantics.
    "q172_warehouse_update" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whupd_")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .repartitionByRange(8, col("p_partkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.updateWhere(s, dir,
        Seq(GreaterThanOrEqual("p_partkey", 500L), LessThan("p_partkey", 1500L)),
        Map("p_retailprice" -> (col("p_retailprice") + 100.0)))
      s.read.format(fmt).option("path", dir).load()
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(floor(col("p_retailprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Schema evolution on append (mergeSchema): half the corpus lands
    // before the n_chars column exists, half after; per-file #cols
    // sidecar mapping reads pre-evolution files as null for the new
    // column — the readback aggregate proves both generations decode
    // correctly against the widened schema.
    "q173_warehouse_evolve" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whevo_")
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "source")
        .write.format(fmt).option("path", dir).mode("append").save()
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "source", "n_chars")
        .write.format(fmt).option("path", dir)
        .option("mergeSchema", "true").mode("append").save()
      s.read.format(fmt).option("path", dir).load()
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"),
          count(col("n_chars")).as("n_with_chars"))
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent prior view within 7 days — one user-keyed window pass
    // carrying the running last-view timestamp (no self-join), ties
    // broken by event id so re-sharding never flips a credit.
    "q174_attribution" -> ((s, d) =>
      Sessions.lastTouchAttribution(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type", touchType = "view", convType = "purchase",
        windowUs = 7L * 86400L * 1000000L)),

    // Consistent bottom-k corpus sample: the 100 smallest-md5 documents —
    // a content-keyed sample stable across runs, engines, re-sharding
    // and appends; plans as per-partition k-heaps, never a global sort.
    "q175_consistent_sample" -> ((s, d) =>
      Corpus.consistentSample(Tables.documents(s, d), "doc_id", "text",
        k = 100, keep = Seq("source"))),

    // RFM segmentation: exact per-user recency/frequency/centi-monetary
    // metrics from one event aggregate, tie-broken ntile(5) tiers over
    // the user-cardinality table, users counted per (r,f,m) cell.
    "q176_rfm" -> ((s, d) =>
      Analytics.rfmSegments(eventsUs(s, d), "user_id", "ts_us", "value",
        refTsUs = 1706745600000000L)),

    // Exact phrase search (positional adjacency, which BM25's bag of
    // words can't express): anchor-keyed slot counting — only phrase
    // terms survive the scan, fan-out ≤ hits × phrase length.
    "q177_phrase_search" -> ((s, d) =>
      Search.phraseSearch(Tables.documents(s, d), "doc_id", "text",
        phrase = Seq("value", "table"))),

    // Proximity search (scan NEAR/5 column): unordered within-k-token
    // co-occurrence with pair count + closest distance — the rung
    // between bag-of-words and exact phrase.
    "q361_proximity_search" -> ((s, d) =>
      Search.proximitySearch(Tables.documents(s, d), "doc_id", "text",
        termA = "scan", termB = "column", k = 5)),

    // COUNT(col)/SUM through the warehouse metadata path: null counts
    // and exact integral sums ride the per-file sidecars, so the whole
    // readout — including a column with planted NULLs — answers in
    // O(metadata) (the spec proves no data file opens). The oracle
    // recomputes from the raw parquet.
    "q178_metadata_sum" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_whsum_")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          when(col("l_linenumber") =!= 1, col("l_partkey")).as("opt_part"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_cents"))
        .repartition(8)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      s.read.format(fmt).option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"),
          count(col("opt_part")).as("n_with_part"),
          sum(col("opt_part")).as("sum_part"),
          sum(col("price_cents")).as("sum_cents"))
    }),

    // REAL pixel-space image resize (no stub): deterministic 24-bpp BMPs
    // synthesized per doc, nearest-neighbor resized to 8×6 through the
    // pure-JDK pixel path, then re-decoded — dims, byte size, and the
    // LAST pixel's BGR are pure integer functions of doc_id the oracle
    // replays, so a hash match proves decode→resize→re-encode→decode.
    "q179_image_resize" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          multimodal.Binary.MediaRecord(id, "image",
            multimodal.Binary.synthBmp(
              width = (16 + (id % 8) * 2).toInt,
              height = (12 + (id % 6) * 2).toInt,
              seed = (id % 251).toInt), src)
        }
      multimodal.Binary.resizeImages(media, outW = 8, outH = 6)
        .map { r =>
          val (w, h) = multimodal.Binary.imageDims(r.bytes)
            .getOrElse((-1, -1))
          val (b, g, rr) = multimodal.Binary.bmpPixel(r.bytes, w - 1, h - 1)
            .getOrElse((-1, -1, -1))
          (r.media_id, w, h, r.bytes.length.toLong, b, g, rr)
        }
        .toDF("media_id", "width", "height", "size_bytes",
          "last_b", "last_g", "last_r")
    }),

    // REAL sample-level audio feature extraction: deterministic PCM-16
    // waveforms synthesized per doc, energy stats (count, peak, exact
    // sum of squares) computed from the decoded samples — integers the
    // oracle recomputes from the same waveform formula.
    "q180_audio_energy" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, _) =>
          val bytes = multimodal.Binary.synthWavPcm16(sampleRate = 8000,
            nSamples = (100 + id % 50).toInt, seed = id)
          val (n, peak, ss) = multimodal.Binary.wavEnergy(bytes)
            .getOrElse((-1L, -1L, -1L))
          (id, n, peak, ss)
        }
        .toDF("media_id", "n_samples", "peak_abs", "sum_sq")
    }),

    // Value-partitioned warehouse tables: orders and customers both laid
    // out one-file-per-status/segment value (the storage-partitioned-join
    // layout; the shuffle-free SPJ plan itself is spec-asserted), read
    // back through the grouped readers and joined — correctness of the
    // partitioned write→group-read→join path against the plain replay.
    "q181_partitioned_join" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val oDir = tempTableDir("graft_whpo_")
      val cDir = tempTableDir("graft_whpc_")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.format(fmt).option("path", oDir)
        .option("partitionBy", "o_orderstatus").mode("overwrite").save()
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.format(fmt).option("path", cDir)
        .option("partitionBy", "c_mktsegment").mode("overwrite").save()
      val o = s.read.format(fmt).option("path", oDir).load()
      val c = s.read.format(fmt).option("path", cDir).load()
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Linear multi-touch attribution: every view in the 7 days before a
    // purchase shares its credit equally (floor-ppm), bucketed by touch
    // age — the decay curve q174's last-touch readout can't show.
    "q182_linear_attribution" -> ((s, d) =>
      Sessions.linearAttribution(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type", touchType = "view", convType = "purchase",
        windowUs = 7L * 86400L * 1000000L)),

    // Language-ID confusion matrix: the langGuess heuristic evaluated
    // against the labeled lang column — per (actual, predicted) counts
    // plus per-actual recall in floor-ppm; the eval readout for q17.
    "q183_lang_confusion" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), T.langGuess(col("text")).as("guess"))
        .groupBy("lang", "guess").agg(count(lit(1)).as("n"))
        .withColumn("recall_ppm",
          expr("n * 1000000 div sum(n) OVER (PARTITION BY lang)"))),

    // Day-of-week seasonality profile: per event type, each weekday's
    // event share as a ×7 index (10⁶ = flat) — the load-shape readout
    // capacity planning and anomaly baselines start from.
    "q184_seasonality" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), (dayofweek(col("ts_t")) - 1).as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
        .withColumn("index_ppm",
          expr("n * 7 * 1000000 div sum(n) OVER (PARTITION BY event_type)"))),

    // Compression-ratio quality signal (rows-only: no SQL twin can
    // replay zlib; the planted-ordering spec carries correctness).
    "q185_compressibility" -> ((s, d) =>
      Corpus.compressibility(Tables.documents(s, d), "doc_id", "text")),

    // Per-type trend slope: exact least squares of daily counts over the
    // day index (CUPED's integer discipline) — growing or decaying, in
    // floor-ppm events/day per day.
    "q186_trend_slope" -> ((s, d) =>
      Analytics.trendSlope(eventsUs(s, d), "event_type", "ts_us")),

    // Incremental JOIN-view maintenance: orders/customer split into
    // old + append batches, the stored view (old⋈old) extended by the
    // delta rule ΔA⋈B_new ∪ A_old⋈ΔB — readback must equal the full
    // join recompute, proving no pair is lost or doubled.
    "q187_incremental_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        .withColumnRenamed("c_custkey", "o_custkey")
      val (oOld, oNew) = (o.filter(col("o_orderkey") % 5 =!= 0),
        o.filter(col("o_orderkey") % 5 === 0))
      val (cOld, cNew) = (c.filter(col("o_custkey") % 7 =!= 0),
        c.filter(col("o_custkey") % 7 === 0))
      val mvOld = oOld.join(cOld, Seq("o_custkey"))
      val refreshed = mvOld.unionByName(
        Etl.incrementalJoinDelta(oOld, oNew, cOld, cNew, "o_custkey"))
      refreshed.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Hybrid retrieval: BM25 lexical leg + exact-cosine dense leg fused
    // by reciprocal rank (10⁶ div (60 + rank), integer-exact) — the RAG
    // stack's retrieval composition over the two proven legs.
    "q188_hybrid_retrieval" -> ((s, d) =>
      Search.hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d),
        "doc_id", "text", "vec_id", "embedding",
        queryTerms = Seq("join", "vector", "slow"), queryVecId = 0L,
        legK = 20, k = 10)),

    // Query expansion: top co-occurring terms for a seed by integer
    // lift (the PMI ordering without the log) — one tokenize, seed-doc
    // semi-restricted co-counts, wordcount dfs.
    "q189_related_terms" -> ((s, d) =>
      Search.relatedTerms(Tables.documents(s, d), "doc_id", "text",
        seed = "vector", minCo = 3L, k = 20)),

    // Write-audit-publish end to end: a clean batch stages, audits, and
    // promotes; a dirty batch (negative totals planted) stages, FAILS
    // its audit, and discards — the readback must contain exactly base +
    // the clean batch, proving staged rows never leak either way.
    "q190_wap_cycle" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val wh = graft.sources.WarehouseSink
      val dir = tempTableDir("graft_whwap_")
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      orders.filter(col("o_orderkey") % 3 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      val clean = orders.filter(col("o_orderkey") % 3 === 1)
      val dirty = orders.filter(col("o_orderkey") % 3 === 2)
        .withColumn("o_totalprice", col("o_totalprice") * -1)
      import graft.operators.Expectations._
      def violations(tok: String): Long =
        check(wh.readStaged(s, dir, tok), Seq(InRange("o_totalprice", 0.0, 1e9)))
          .agg(sum(col("n_violations"))).collect()(0).getLong(0)
      val t1 = wh.stageAppend(s, dir, clean)
      require(violations(t1) == 0L, "clean batch must pass its audit")
      wh.promoteStaged(dir, t1)
      val t2 = wh.stageAppend(s, dir, dirty)
      require(violations(t2) > 0L, "dirty batch must fail its audit")
      wh.discardStaged(dir, t2)
      s.read.format(fmt).option("path", dir).load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Referential-integrity audit across the star schema: orphaned and
    // null foreign keys per relation — one anti-join each, the dangling-
    // reference gate next to the in-table expectation rules.
    "q191_fk_audit" -> ((s, d) =>
      graft.operators.Expectations.fkAudit(Seq(
        ("lineitem.orderkey", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey"),
        ("orders.custkey", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"),
        ("customer.nationkey", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey")))),

    // Cross-source exact-duplicate matrix: which sources copy from
    // which, via per-fingerprint source counts + pair arithmetic — no
    // doc-level pair join anywhere. The synthetic corpus is dup-free,
    // so a deterministic 'mirror' source (every 7th doc re-hosted)
    // plants the cross-source copies the matrix must expose.
    "q193_source_dup_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("source", lit("mirror")))
      Dedup.crossSourceDupMatrix(mirrored, "doc_id", "text", "source")
    }),

    // Soft dedup: duplicate-aware training weights over the mirrored
    // corpus — weight 1/n_copies per doc, per-source EFFECTIVE size in
    // micro-docs (the number mixing ratios should use).
    "q368_soft_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("source", lit("mirror")))
      Dedup.softDedupWeights(mirrored, "doc_id", "text", "source")
    }),

    // Entity resolution end-to-end: Jaro-Winkler fuzzy links (≥ 0.88,
    // first-token blocked) union-found into entities via the q46
    // min-label components — the alias-unification pipeline over noisy
    // name keys; per-cluster membership is the contract readout.
    "q369_entity_resolution" -> ((s, d) => {
      val names = Tables.part(s, d).select("p_name").distinct()
      val pairs = Dedup.jwNameMatch(names, "p_name", "p_name",
        minJw = 0.88, maxBlock = 100000L)
      Components.connected(pairs, "id1", "id2")
        .select(col("id").as("name"), col("cluster").as("entity"))
    }),

    // URL extraction + registrable-domain rollup over planted citations:
    // the C4/RefinedWeb provenance audit. URLs (subdomain/tld/port/path
    // varied by doc_id, one with trailing punctuation, one ftp:// decoy
    // that must NOT match) are planted deterministically so the real
    // regex extraction + host normalization replays arithmetically.
    "q370_url_domains" -> ((s, d) => {
      val subs = typedLit(Seq("", "www.", "cdn.", "api."))
      val names = typedLit(Seq("alpha", "beta", "gamma", "delta", "epsilon"))
      val tlds = typedLit(Seq("com", "org", "co.uk"))
      val planted = Tables.documents(s, d).select(col("doc_id"), concat(
        col("text"), lit(" http://"),
        element_at(subs, (col("doc_id") % 4 + 1).cast("int")),
        element_at(names, (col("doc_id") % 5 + 1).cast("int")), lit("."),
        element_at(tlds, (col("doc_id") % 3 + 1).cast("int")),
        when(col("doc_id") % 7 === 0, lit(":8080")).otherwise(lit("")),
        lit("/p/"), col("doc_id"), lit(","),
        when(col("doc_id") % 2 === 0,
          lit(" https://mirror.example.net/x)")).otherwise(lit("")),
        lit(" ftp://skip.example.org/no")).as("text"))
      Corpus.urlDomains(planted, "doc_id", "text")
    }),

    // Jarque-Bera normality screen on per-type daily event counts — the
    // "is it even normal" gate in front of the parametric test family;
    // exact centered power sums, one ordered double expression per stat.
    "q371_jarque_bera" -> ((s, d) => {
      val daily = eventsUs(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
      Analytics.jarqueBera(daily, "event_type", "cnt")
    }),

    // Wilcoxon signed-rank: per customer, odd-orderkey spend vs
    // even-orderkey spend — the paired twin of q328's rank-sum, doubled
    // midranks over the gated distinct-|d| table.
    "q372_wilcoxon_signed" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      val pairs = o.groupBy("o_custkey").agg(
        sum(when(col("o_orderkey") % 2 === 1, col("cents")).otherwise(0L))
          .as("x"),
        sum(when(col("o_orderkey") % 2 === 0, col("cents")).otherwise(0L))
          .as("y"))
      Analytics.wilcoxonSignedRank(pairs, "x", "y")
    }),

    // gzip member metadata over deterministic stored-block fixtures:
    // real RFC 1952 header walk + CRC32/ISIZE verification against the
    // recomputed checksum; the synth arithmetic replays in SQL.
    "q373_gzip_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val len = 100 + (id % 1000L).toInt
          val got = multimodal.Binary.gzipMeta(
            multimodal.Binary.synthGzip(len, 1600000000L + id, 256))
            .getOrElse((-1L, -1, -1, -1L, false))
          (id, got._1, got._3.toLong, got._4, got._5)
        }.toDF("doc_id", "mtime", "n_blocks", "isize", "crc_ok")
    }),

    // Snapshot-sync MERGE (WHEN NOT MATCHED BY SOURCE THEN DELETE with
    // a protective keepWhere): the table becomes the incoming snapshot
    // except protected stragglers; the oracle recomputes the final
    // table from source arithmetic.
    "q374_sync_merge" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_sync_")
      val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      base.write.format(fmt).option("path", dir).mode("overwrite").save()
      val snap = base.filter(col("k") % 3 =!= 0)
        .select(col("k"), when(col("k") % 5 === 0, col("cents") + 500L)
          .otherwise(col("cents")).as("cents"))
        .unionByName(base.filter(col("k") % 11 === 0)
          .select((col("k") + 2000000000L).as("k"), lit(99L).as("cents")))
      sources.WarehouseSink.syncMoR(s, dir, snap, Seq("k"),
        keepWhere = Some("cents % 10 = 3"))
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_cents").cast("long").as("sum_cents"))
    }),

    // Harmonic closeness for a seed set on the supplier↔part bipartite
    // graph (the q330 substrate): per-seed BFS in one shared frontier,
    // exact 1000000 div d contributions within 3 hops.
    "q375_closeness" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      val edges = li.select(col("sk").as("src"), col("pk").as("dst"))
        .unionByName(li.select(col("pk").as("src"), col("sk").as("dst")))
      Graph.harmonicCloseness(edges, "src", "dst", seeds = Seq(1L, 2L, 3L),
        maxHops = 3)
    }),

    // Cramér-von Mises two-sample distance on the q198 A/B split —
    // the whole-curve companion of the KS sup-gap, one exact rational
    // over the same cumulative substrate.
    "q376_cvm_test" -> ((s, d) =>
      Analytics.cvmTest(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        sideCol = substring(md5(col("user_id").cast("string")), 1, 1) < "8",
        "value")),

    // Pettitt rank-based changepoint per event-type daily series —
    // the distribution-free "did the level shift, and when" next to
    // q219's CUSUM; doubled midranks keep U_t exact.
    "q377_pettitt" -> ((s, d) =>
      Analytics.pettittTest(eventsUs(s, d), "event_type", "ts_us")),

    // DBSCAN over the quantized 2-D embedding projection, with a
    // second +18-shifted population planted so the density structure
    // has two real clusters plus border and noise verdicts.
    "q378_dbscan" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(
        (floor(element_at(col("embedding"), 1) * 20) + 20).cast("long")
          .as("x"),
        (floor(element_at(col("embedding"), 2) * 20) + 20).cast("long")
          .as("y"),
        col("vec_id"))
      val planted = base.unionByName(
        base.filter(col("vec_id") % 5 === 0)
          .select((col("x") + 18L).as("x"), (col("y") + 18L).as("y"),
            col("vec_id")))
      Analytics.dbscan2d(planted, "x", "y", eps = 1L, minPts = 8L)
    }),

    // SVG dimensions: width/height attributes with the viewBox
    // fallback exercised on odd ids; the synth arithmetic replays.
    "q379_svg_dims" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val w = ((id % 300L) + 1L).toInt * 2
          val h = ((id % 150L) + 1L).toInt * 3
          val got = multimodal.Binary.svgDims(
            multimodal.Binary.synthSvg(w, h, explicit = id % 2 == 0))
          (id, got.map(_._1.toLong).getOrElse(-1L),
            got.map(_._2.toLong).getOrElse(-1L))
        }.toDF("doc_id", "width", "height")
    }),

    // PDF metadata: version, /Type /Page count (the /Pages tree node
    // excluded), and startxref→xref validation over real minimal
    // fixtures with correct byte offsets.
    "q380_pdf_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val pages = 1 + (id % 9L).toInt
          val minor = (4 + id % 4L).toInt
          val got = multimodal.Binary.pdfMeta(
            multimodal.Binary.synthPdf(1, minor, pages))
            .getOrElse((-1, -1, -1, false))
          (id, got._1.toLong, got._2.toLong, got._3.toLong, got._4)
        }.toDF("doc_id", "ver_major", "ver_minor", "n_pages", "xref_ok")
    }),

    // Haar wavelet energy per event-type daily series: exact integer
    // detail energies over the latest 16 observed days — which
    // timescale the variance lives at (the generator ships 30-day
    // spans, so the 16-day dyadic window is the largest that fills).
    "q381_haar_energy" -> ((s, d) =>
      Analytics.haarEnergy(eventsUs(s, d), "event_type", "ts_us",
        levels = 4)),

    // Johnson-Lindenstrauss distortion audit: deterministic md5-sign
    // ±1 projection 64→16, pairwise distance distortion spread over a
    // consistent-hash sample — exact fixed-point end to end.
    "q382_jl_distortion" -> ((s, d) =>
      Quantize.jlDistortion(Tables.embeddings(s, d), "vec_id",
        "embedding", dim = 64, k = 16, sampleMod = 13L)),

    // ICO icon-directory walk over deterministic fixtures: entry
    // count + max declared dims, offsets containment-checked.
    "q383_ico_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val n = 1 + (id % 4L).toInt
          val dims = (0 until n).map(k =>
            (((id % 200L) + 1).toInt + k, ((id % 100L) + 1).toInt + k))
          val got = multimodal.Binary.icoMeta(
            multimodal.Binary.synthIco(dims)).getOrElse((-1, -1, -1))
          (id, got._1.toLong, got._2.toLong, got._3.toLong)
        }.toDF("doc_id", "n_images", "max_width", "max_height")
    }),

    // SQL UPDATE + MERGE INTO through the catalog (group-based
    // copy-on-write row-level operations): update a slice, merge a
    // change batch with matched updates and not-matched inserts, read
    // the final state back — the oracle recomputes it from source
    // arithmetic.
    "q384_sql_update" -> ((s, d) => {
      useCatalog(s)
      val ns = "c" + (d.hashCode.toLong & 0xffffffffL)
      new java.io.File(catalogRoot, ns).mkdirs()
      s.sql(s"DROP TABLE IF EXISTS graft.$ns.upd_t")
      s.sql(s"CREATE TABLE graft.$ns.upd_t (k BIGINT, cents BIGINT)")
      Tables.orders(s, d).select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .createOrReplaceTempView("graft_q384_src")
      s.sql(s"INSERT INTO graft.$ns.upd_t SELECT * FROM graft_q384_src")
      s.sql(s"UPDATE graft.$ns.upd_t SET cents = cents + 250 " +
        "WHERE k % 7 = 2")
      s.sql(s"""MERGE INTO graft.$ns.upd_t t
                USING (SELECT k, cents FROM graft_q384_src WHERE k % 9 = 0
                       UNION ALL
                       SELECT k + 1000000000 AS k, 77 AS cents
                       FROM graft_q384_src WHERE k % 11 = 0) s
                ON t.k = s.k
                WHEN MATCHED THEN UPDATE SET cents = s.cents + 13
                WHEN NOT MATCHED THEN
                  INSERT (k, cents) VALUES (s.k, s.cents)""")
      s.sql(s"""SELECT CAST(k % 10 AS BIGINT) AS bucket,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(sum(cents) AS BIGINT) AS sum_cents
                FROM graft.$ns.upd_t GROUP BY 1""")
    }),

    // Exact 2-D Mahalanobis outliers over (quality centi, n_chars):
    // docs inside both marginal ranges but off the correlation ridge —
    // one integer rational per point, distributed top-k.
    "q385_mahalanobis" -> ((s, d) =>
      Analytics.mahalanobis2d(
        Tables.documents(s, d).select(col("doc_id"),
          greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
            lit(10000L)), lit(0L)).cast("long").as("q0"),
          col("n_chars"))
          .select(col("doc_id"), expr("q0 div 100").as("q"),
            col("n_chars")),
        "doc_id", "q", "n_chars", topK = 20)),

    // Poisson-bootstrap CI for the MEDIAN per event type — the quantile
    // rung next to q314's mean variance; deterministic md5 weights,
    // lower weighted medians, exact order-statistic CI.
    "q386_boot_median" -> ((s, d) =>
      Experiment.bootstrapMedian(Tables.events(s, d), "event_type",
        "value", "event_id")),

    // Rank-Biased Overlap between full-dim and 16-dim retrieval on the
    // q211 query set — the rank-weighted refinement of overlap@k; every
    // depth weight is a shared exact nano literal.
    "q387_rbo" -> ((s, d) =>
      Similarity.rboAgreement(Tables.embeddings(s, d), "vec_id",
        "embedding", queryIds = Seq(0L, 7L, 21L, 42L, 63L), k = 10,
        mDims = 16)),

    // Matroska/WebM metadata via a real EBML varint walk: DocType,
    // duration (timestamp-scale rule), track-type census, first video
    // track dimensions; the synth arithmetic replays.
    "q388_webm_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val dt = if (id % 2 == 0) "webm" else "matroska"
          val got = multimodal.Binary.webmMeta(
            multimodal.Binary.synthWebm(dt, 1000 + id % 9000L,
              ((id % 200L).toInt + 1) * 4, ((id % 100L).toInt + 1) * 4,
              (id % 3L).toInt))
            .getOrElse(("", -1L, -1, -1, -1, -1))
          (id, got._1, got._2, got._3.toLong, got._4.toLong,
            got._5.toLong, got._6.toLong)
        }.toDF("doc_id", "doc_type", "duration_ms", "n_video", "n_audio",
          "width", "height")
    }),

    // Bigram collocation mining by exact floor-ppm lift over the
    // documents corpus — which word pairs travel together beyond
    // chance, with a support floor and a deterministic top-k.
    "q389_collocations" -> ((s, d) =>
      Corpus.collocations(Tables.documents(s, d), "text",
        minSupport = 5L, topK = 25)),

    // Group-median imputation audit on events with planted nulls
    // (event_id % 7): per type the exact fill value, null count and
    // post-fill sum — the NA-repair readout next to dag.py's dropna.
    "q390_impute" -> ((s, d) =>
      Etl.imputePanel(
        Tables.events(s, d).withColumn("value",
          when(col("event_id") % 7 === 0, lit(null))
            .otherwise(col("value"))),
        "event_type", "value")),

    // Markov next-event predictor with a temporal holdout: fit on
    // even-day transition pairs, score on odd-day pairs — a real
    // out-of-sample hit rate per from-type.
    "q391_next_event" -> ((s, d) =>
      Sessions.nextEventEval(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type")),

    // Seed-sampled Brandes betweenness on the supplier↔part bipartite
    // graph: exact path counts forward, one documented floor per DAG
    // edge backward — the broker scores the degree family can't see.
    "q392_betweenness" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      val edges = li.select(col("sk").as("src"), col("pk").as("dst"))
        .unionByName(li.select(col("pk").as("src"), col("sk").as("dst")))
      Graph.betweennessSeeded(edges, "src", "dst",
        seeds = Seq(1L, 2L, 3L), maxHops = 3, topK = 20)
    }),

    // HTML main-text extraction over planted markup: script/style
    // blocks die with content, links/images counted, entities decode
    // in the documented order — the C4 markup-strip step, replayed
    // regex-for-regex by the oracle (clean text compared by md5).
    "q393_html_extract" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"), concat(
        lit("<html><head><style>p{color:red}</style>" +
          "<script>var x=1;</script></head><body><h1>T&amp;"),
        col("doc_id"), lit("</h1><p>"), col("text"),
        lit("</p><a href=\"/x\">link</a>"),
        when(col("doc_id") % 2 === 0, lit("<img src=\"a.png\"/>"))
          .otherwise(lit("")),
        lit("</body></html>")).as("html"))
      Corpus.htmlExtract(planted, "doc_id", "html")
        .select(col("doc_id"), md5(col("clean_text")).as("text_md5"),
          col("n_links"), col("n_images"), col("n_tags"),
          col("markup_ppm"))
    }),

    // Per-source Gini-Simpson diversity + Chao1 richness — the
    // single-sample ecology pair next to TTR/Good-Turing, entropy-free
    // exact fixed point.
    "q394_diversity" -> ((s, d) =>
      Analytics.diversityPanel(Tables.documents(s, d), "source", "text")),

    // Feature-hashing collision audit: the portable md5 bucket at four
    // candidate widths over the distinct vocabulary — the
    // bits-vs-quality trade for hashed bag-of-words models, measured.
    "q395_hash_collisions" -> ((s, d) =>
      Vocab.hashCollisionAudit(Tables.documents(s, d), "text",
        bucketBits = Seq(6, 8, 10, 12))),

    // Interval-overlap join: q38 sessions (padded half-open by 1µs so
    // instant sessions count) against the daily 2-hour maintenance
    // windows — per window, overlapping sessions + exact overlap mass.
    // The binned equi-join is the scale shape; the oracle replays with
    // a plain inequality join.
    "q396_interval_overlap" -> ((s, d) => {
      val sess = Sessions.sessionize(eventsUs(s, d), "user_id", "ts_us",
        "event_id", gapUs = 1800L * 1000000L)
        .select((col("user_id") * 1000000L + col("session_idx"))
          .as("sid"), col("start_us"),
          (col("end_us") + 1L).as("end_pad_us"))
      val dayUs = 86400L * 1000000L
      val windows = eventsUs(s, d)
        .select(expr(s"ts_us div ${dayUs}L").as("day")).distinct()
        .withColumn("slot", explode(typedLit(Seq(0, 1))))
        .select((col("day") * 2 + col("slot")).as("wid"),
          (col("day") * dayUs +
            (lit(3L) + col("slot") * 12L) * 3600000000L).as("w_start"),
          (col("day") * dayUs +
            (lit(5L) + col("slot") * 12L) * 3600000000L).as("w_end"))
      Sessions.intervalOverlapJoin(
          sess, "sid", "start_us", "end_pad_us",
          windows, "wid", "w_start", "w_end",
          binUs = 3600L * 1000000L)
        .groupBy(col("b_id").as("wid"))
        .agg(count(lit(1)).as("n_sessions"),
          sum("overlap_us").as("graft_o"))
        .select(col("wid").cast("long").as("wid"), col("n_sessions"),
          col("graft_o").cast("long").as("overlap_us_total"))
    }),

    // Allen-relation histogram over the q396 substrate: HOW sessions
    // intersect the maintenance windows, not just whether.
    "q397_allen_relations" -> ((s, d) => {
      val sess = Sessions.sessionize(eventsUs(s, d), "user_id", "ts_us",
        "event_id", gapUs = 1800L * 1000000L)
        .select((col("user_id") * 1000000L + col("session_idx"))
          .as("sid"), col("start_us"),
          (col("end_us") + 1L).as("end_pad_us"))
      val dayUs = 86400L * 1000000L
      val windows = eventsUs(s, d)
        .select(expr(s"ts_us div ${dayUs}L").as("day")).distinct()
        .withColumn("slot", explode(typedLit(Seq(0, 1))))
        .select((col("day") * 2 + col("slot")).as("wid"),
          (col("day") * dayUs +
            (lit(3L) + col("slot") * 12L) * 3600000000L).as("w_start"),
          (col("day") * dayUs +
            (lit(5L) + col("slot") * 12L) * 3600000000L).as("w_end"))
      Sessions.intervalOverlapJoin(
          sess, "sid", "start_us", "end_pad_us",
          windows, "wid", "w_start", "w_end",
          binUs = 3600L * 1000000L)
        .groupBy("relation")
        .agg(count(lit(1)).as("n_pairs"),
          sum("overlap_us").cast("long").as("overlap_us_total"))
    }),

    // Hour-of-week activity heatmap: 168 exact cells (week anchored at
    // the epoch — hour 0 = Thursday 00:00 UTC), share in floor-ppm.
    "q398_hour_heatmap" -> ((s, d) =>
      eventsUs(s, d)
        .select(expr("(ts_us div 3600000000L) % 168").as("how"))
        .groupBy("how").agg(count(lit(1)).as("n_events"))
        .select(expr("how div 24").cast("long").as("dow_from_thu"),
          expr("how % 24").cast("long").as("hour"),
          col("n_events"),
          expr("n_events * 1000000 div (sum(n_events) OVER ())")
            .cast("long").as("share_ppm"))),

    // FORWARD as-of join with tolerance (the full merge_asof surface):
    // each non-purchase event enriched with the user's NEXT purchase
    // value within one day; per-type match rate + exact cents.
    "q399_asof_forward" -> ((s, d) => {
      val ev = eventsUs(s, d)
      val leftE = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_us"), col("event_type"))
      // one right row per (user, ts): equal-timestamp right rows have
      // no deterministic ASOF order, so the max-cents collapse IS the
      // documented tiebreak
      val rightE = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us")
        .agg(max(floor(col("value") * 100 + 0.5).cast("long"))
          .as("cents"))
      AsOf.asofJoinDirected(leftE, rightE, "user_id", "ts_us",
          "cents", "next_cents", direction = "forward",
          toleranceUs = Some(86400L * 1000000L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("next_cents").isNotNull, 1L).otherwise(0L))
            .as("n_matched"),
          coalesce(sum("next_cents"), lit(0L)).cast("long")
            .as("sum_next_cents"),
          coalesce(sum(expr("next_cents_ts - ts_us")), lit(0L))
            .cast("long").as("sum_wait_us"))
    }),

    // End-to-end WEB corpus build: planted markup → htmlExtract →
    // quality gate on the CLEAN text → exact dedup among survivors →
    // per-source funnel with final token mass — q140's funnel with the
    // markup-strip stage in front, the full crawl-curation chain.
    "q400_web_pipeline" -> ((s, d) => {
      val docs0 = Tables.documents(s, d)
      // mirrored fifth: true duplicates under a different source — the
      // dedup stage must fold them onto the original (min id wins)
      val base = docs0.select(col("doc_id"), col("source"), col("text"))
        .unionByName(docs0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            lit("mirror").as("source"), col("text")))
      val planted = base.select(col("doc_id"),
        col("source"), concat(
          lit("<html><head><style>p{color:red}</style>" +
            "<script>var x=1;</script></head><body><h1>T&amp;X</h1><p>"),
          col("text"),
          lit("</p><a href=\"/x\">link</a>"),
          when(col("doc_id") % 2 === 0, lit("<img src=\"a.png\"/>"))
            .otherwise(lit("")),
          lit("</body></html>")).as("html"))
      val cleaned = Corpus.htmlExtract(planted, "doc_id", "html")
        .join(planted.select("doc_id", "source"), Seq("doc_id"))
      val scored = cleaned.withColumn("graft_q",
        greatest(least(floor(T.qualityScore(col("clean_text")) * 10000
          + 0.5), lit(10000L)), lit(0L)).cast("long"))
        .withColumn("graft_pass", col("graft_q") >= 8000L)
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy("graft_fp")
      val flagged = scored
        .withColumn("graft_fp",
          when(col("graft_pass"), T.fingerprint(col("clean_text"))))
        .withColumn("graft_canon",
          col("graft_pass") &&
            col("doc_id") === min(when(col("graft_pass"),
              col("doc_id"))).over(wFp))
      flagged.groupBy("source")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("graft_pass"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("graft_canon"), 1L).otherwise(0L)).as("n_unique"),
          coalesce(sum(when(col("graft_canon"),
            T.wsTokens(col("clean_text")).cast("long"))), lit(0L))
            .cast("long").as("tokens_final"))
    }),

    // WARC container walk (ISO 28500): each doc becomes a 3-record
    // .warc.gz (warcinfo + HTTP response carrying HTML + WET
    // conversion), one gzip member per record (the CommonCrawl shape);
    // the real walk inflates members, parses records, splits the HTTP
    // payload. Every emitted field is synth arithmetic the oracle
    // replays; doc_id % 7 == 3 tears the last member mid-block —
    // partial-count degradation keeps the response, drops the WET.
    "q401_warc_walk" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("text"))
        .as[(Long, String, String)]
        .map { case (id, src, text) =>
          val html = s"<html><body><h1>T&amp;$id</h1><p>$text" +
            "</p></body></html>"
          val uri = s"https://$src.example.org/doc/$id"
          val full = multimodal.Warc.synthWarcGz(uri, 1600000000L + id,
            html, text)
          val bytes = if (id % 7 == 3) full.take(full.length - 12) else full
          val (recs, torn) = multimodal.Warc.walkGz(bytes)
          val resp = recs.find(_.warcType == "response")
          val http = resp.flatMap(r =>
            multimodal.Warc.httpResponse(r.payload))
          val wet = recs.find(_.warcType == "conversion")
          (id, recs.size.toLong, torn,
            http.map(_._1.toLong),
            resp.map(_.targetUri),
            resp.map(r => multimodal.Warc.dateEpochSec(r.date)),
            http.map(_._2),
            http.map(_._3.length.toLong),
            http.map(h => new String(h._3, "UTF-8")),
            wet.map(w => new String(w.payload, "UTF-8")))
        }
        .toDF("doc_id", "n_records", "truncated", "status", "url",
          "fetch_ts", "mime", "content_len", "graft_body", "graft_wet")
        .select(col("doc_id"), col("n_records"), col("truncated"),
          col("status"), col("url"), col("fetch_ts"), col("mime"),
          col("content_len"), md5(col("graft_body")).as("body_md5"),
          md5(col("graft_wet")).as("wet_md5"))
    }),

    // q400 re-plumbed to START from the crawl container: synthesize
    // the mirrored corpus INTO .warc.gz bytes, walk them back to the
    // (host, html) table with the real record walk + HTTP split, then
    // run the same extract → quality gate → exact dedup → funnel,
    // grouped by the crawl host instead of the source label.
    "q402_warc_pipeline" -> ((s, d) => {
      import s.implicits._
      val docs0 = Tables.documents(s, d)
      val base = docs0.select(col("doc_id"), col("source"), col("text"))
        .unionByName(docs0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            lit("mirror").as("source"), col("text")))
      val pages = base.as[(Long, String, String)]
        .map { case (id, src, text) =>
          val html = "<html><head><style>p{color:red}</style>" +
            "<script>var x=1;</script></head><body><h1>T&amp;X</h1><p>" +
            text + "</p><a href=\"/x\">link</a>" +
            (if (id % 2 == 0) "<img src=\"a.png\"/>" else "") +
            "</body></html>"
          val uri = s"https://$src.example.org/doc/$id"
          val bytes = multimodal.Warc.synthWarcGz(uri,
            1600000000L + id, html, text)
          val (recs, _) = multimodal.Warc.walkGz(bytes)
          val resp = recs.find(_.warcType == "response").get
          val body = multimodal.Warc.httpResponse(resp.payload).get._3
          val host = resp.targetUri
            .stripPrefix("https://").takeWhile(_ != '/')
          (id, host, new String(body, "UTF-8"))
        }.toDF("doc_id", "host", "html")
      val cleaned = Corpus.htmlExtract(pages, "doc_id", "html")
        .join(pages.select("doc_id", "host"), Seq("doc_id"))
      val scored = cleaned.withColumn("graft_q",
        greatest(least(floor(T.qualityScore(col("clean_text")) * 10000
          + 0.5), lit(10000L)), lit(0L)).cast("long"))
        .withColumn("graft_pass", col("graft_q") >= 8000L)
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy("graft_fp")
      val flagged = scored
        .withColumn("graft_fp",
          when(col("graft_pass"), T.fingerprint(col("clean_text"))))
        .withColumn("graft_canon",
          col("graft_pass") &&
            col("doc_id") === min(when(col("graft_pass"),
              col("doc_id"))).over(wFp))
      flagged.groupBy("host")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("graft_pass"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("graft_canon"), 1L).otherwise(0L)).as("n_unique"),
          coalesce(sum(when(col("graft_canon"),
            T.wsTokens(col("clean_text")).cast("long"))), lit(0L))
            .cast("long").as("tokens_final"))
    }),

    // Mojibake repair round-trip (ftfy stage): a third of the docs get
    // REAL double-encoding damage (the clean suffix's UTF-8 bytes
    // mis-decoded as cp1252 — computed, not hand-typed), a third get a
    // flagged-but-invalid tail (stray continuation byte 0xBF: the
    // strict re-decode must refuse), a third stay clean. The repair
    // recovers the clean suffix byte-exactly; md5 proves it.
    "q403_fix_encoding" -> ((s, d) => {
      val cleanSuffix = " café – “x"
      val corrupt = new String(cleanSuffix.getBytes("UTF-8"),
        "windows-1252")
      val planted = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(corrupt)))
          .when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" Ã© ¿")))
          .otherwise(col("text")).as("text"))
      Corpus.repairEncodingDocs(planted, "text")
        .select(col("doc_id"), col("graft_flag").as("flagged"),
          (col("repaired") =!= col("text")).as("changed"),
          md5(col("repaired")).as("text_md5"))
    }),

    // The per-source repair report over the same plant: detect → fix →
    // re-audit closed loop (flagged_after is RECOMPUTED on the repaired
    // text, so it proves the artifacts are gone, not just counted).
    "q404_repair_report" -> ((s, d) => {
      val cleanSuffix = " café – “x"
      val corrupt = new String(cleanSuffix.getBytes("UTF-8"),
        "windows-1252")
      val planted = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(corrupt)))
          .when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" Ã© ¿")))
          .otherwise(col("text")).as("text"))
      Corpus.repairEncoding(planted, "text", "source")
    }),

    // Unigram-LM (SentencePiece) tokenizer fit: substring seed → EM
    // with micro-quantized expected counts → likelihood-loss prune to
    // 64 pieces. Float EM ⇒ rows-only contract (the ML-family rule);
    // UnigramSpec pins distributed==local bit-equality and the encode
    // key (q406) carries the cross-engine oracle.
    "q405_unigram_vocab" -> ((s, d) =>
      UnigramLm.unigramVocab(Tables.documents(s, d), "text",
        vocabSize = 64, emIters = 2)),

    // Viterbi unigram ENCODE under the pinned disjoint-alphabet piece
    // table: token count has the closed form chars − Σ occurrences
    // (pieces share no characters, so Viterbi takes every occurrence
    // and DuckDB replays the count by replace-length arithmetic).
    "q406_unigram_encode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          UnigramLm.unigramTokenCount(col("text"),
            UnigramLm.DisjointPieces).as("graft_tok"),
          length(regexp_replace(T.normText(col("text")), " ", ""))
            .cast("long").as("graft_ch"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("graft_tok").cast("long").as("tokens_unigram"),
          sum("graft_ch").cast("long").as("n_chars"))
        .withColumn("tokens_per_char_ppm",
          expr("CASE WHEN n_chars = 0 THEN CAST(NULL AS BIGINT)" +
            " ELSE tokens_unigram * 1000000 div n_chars END"))),

    // Cross-source duplication Venn (q193's mirrored corpus): content
    // bucketed by how many distinct sources carry it — the syndication
    // spread histogram a dedup rollout is sized by.
    "q364_source_venn" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("source", lit("mirror")))
      Dedup.sourceVenn(mirrored, "doc_id", "text", "source")
    }),

    // Session entry/exit profile: which event types open and close the
    // q38 gap-rule sessions, and which bounce — landing/leave-page
    // analytics in exact integers.
    "q365_entry_exit" -> ((s, d) =>
      Sessions.entryExit(eventsUs(s, d), "user_id", "ts_us", "event_id",
        "event_type", gapUs = 1800L * 1000000L)),

    // Bitmap exact distinct: OR-merged Roaring-style containers per
    // event type — exact where HLL is ±2%, partials combine map-side.
    "q309_bitmap_distinct" -> ((s, d) =>
      Analytics.bitmapDistinct(Tables.events(s, d), "event_type",
        "user_id")),

    // Label-propagation communities on the supplier↔part co-supply
    // graph (the q131 substrate): synchronous min-tiebreak rounds,
    // oracle unrolls all three.
    "q313_label_prop" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      Graph.labelPropagation(li, "sk", "pk", iters = 3, topK = 20)
    }),

    // Poisson-bootstrap variance of per-type mean value: the at-scale
    // bootstrap — one pass, 32 hash-weighted replicates, map-combined.
    "q314_poisson_boot" -> ((s, d) =>
      Experiment.poissonBootstrap(Tables.events(s, d), "event_type",
        "value", "event_id", replicas = 32)),

    // Wide→long melt (pandas .melt / SQL UNPIVOT): the reshape every
    // feature-comparison surface runs before a per-metric groupBy —
    // Spark's native unpivot, so Catalyst sees one Expand, not 3 scans.
    "q320_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("quantity"),
          floor(col("l_discount") * 100 + 0.5).cast("long")
            .as("discount_centi"),
          floor(col("l_tax") * 100 + 0.5).cast("long").as("tax_centi"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount_centi"), col("tax_centi")),
          "metric", "value")),

    // Cumulative distinct users per event type by day: each key counted
    // on its FIRST day only (one keyed aggregate), running sum over the
    // tiny (type, day) table — never a per-day expanding re-scan.
    "q321_running_distinct" -> ((s, d) =>
      Analytics.runningDistinct(Tables.events(s, d), "event_type",
        "ts_t", "user_id")),

    // Type widening end-to-end: int data files under a widened-to-long
    // schema, plus post-widen rows only a long can hold — the oracle
    // recomputes from the source, proving both eras decode exactly.
    "q322_type_widening" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_wid_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity").cast("int").as("qty"))
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.widenColumnType(dir, "qty", "bigint")
      li.filter(col("l_orderkey") % 2 === 1)
        .select(col("l_orderkey"), col("qty").cast("bigint").as("qty"))
        .write.format(fmt).option("path", dir).mode("append").save()
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_qty").cast("long").as("sum_qty"))
    }),

    // Per-source embedding-centroid drift between doc_id-parity eras:
    // exact integer numerator, float only in the final sqrt/divide.
    "q341_embedding_drift" -> ((s, d) =>
      Analytics.centroidDrift(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding"))
          .join(Tables.documents(s, d).select("doc_id", "source"),
            Seq("doc_id"))
          .withColumn("era", (col("doc_id") % 2).cast("int")),
        "source", "era", "embedding")),

    // Exact 10%-trimmed mean per return flag: histogram rank-interval
    // overlap arithmetic, no sort, no approx.
    "q348_trimmed_mean" -> ((s, d) =>
      Analytics.trimmedMean(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", trimPpm = 100000L)),

    // Exact equi-depth histogram of prices: order-statistic boundaries
    // on the cumulative value histogram, honest tie-skewed depths.
    "q345_equidepth" -> ((s, d) =>
      Analytics.equiDepthHistogram(Tables.lineitem(s, d),
        "l_extendedprice", k = 8)),

    // Cohen's d effect size between the R and N return cohorts' prices.
    "q340_cohens_d" -> ((s, d) =>
      Analytics.cohensD(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", groupA = "R", groupB = "N")),

    // Exact Shapley attribution: coalition subset-sums from ONE corpus
    // pass, k!-scaled integer Shapley values on the 2^k lattice.
    "q339_shapley" -> ((s, d) =>
      Sessions.shapleyAttribution(Tables.events(s, d), "user_id", "ts",
        "event_type", convChannel = "purchase")),

    // Exact weighted median: price order statistic weighted by quantity
    // per return flag — histogram + cumulative weight, doubled centi.
    "q337_weighted_median" -> ((s, d) =>
      Analytics.weightedMedian(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", "l_quantity")),

    // Cramér's V effect size over the order-priority × status table —
    // exact chi-square arithmetic, one round-6 sqrt.
    "q338_cramers_v" -> ((s, d) =>
      Analytics.cramersV(Tables.orders(s, d), "o_orderpriority",
        "o_orderstatus")),

    // Brown-Forsythe variance-homogeneity test: exact ANOVA on doubled
    // absolute deviations from per-group medians (histogram order-stats).
    "q336_brown_forsythe" -> ((s, d) =>
      Analytics.brownForsythe(Tables.events(s, d), "event_type", "value")),

    // Pairwise source-distribution total-variation distance in exact
    // ppm: shared-word inner join + closed-form exclusive-mass
    // corrections — no ratios, no full-outer join.
    "q335_source_tvd" -> ((s, d) =>
      Analytics.sourceTvdMatrix(Tables.documents(s, d), "source", "text")),

    // Xing VBR header decode: real first-frame tag walk over
    // deterministic fixtures; the declared frame count and the duration
    // arithmetic replay in SQL.
    "q333_mp3_vbr" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val sr = (id % 3L).toInt
          val fr = 100L + id % 900L
          val got = multimodal.Binary.mp3VbrMeta(
            multimodal.Binary.synthXingMp3(sr, fr, mono = id % 2L == 0L))
          (id, got.map(_._1).getOrElse(-1L),
            got.map(_._2.toLong).getOrElse(-1L),
            got.map(_._3).getOrElse(-1L))
        }.toDF("doc_id", "vbr_frames", "sample_rate", "duration_ms")
    }),

    // ZIP central-directory walk over JDK-written STORED fixtures: the
    // archive-indexing question (members, bytes) answered from EOCD+CD
    // only, payloads never read; counts/sizes replay arithmetically.
    "q358_zip_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val entries = 1 + (id % 7L).toInt
          val per = 64 + (id % 5L).toInt * 32
          val got = multimodal.Binary.zipMeta(
            multimodal.Binary.synthZip(entries, per))
            .getOrElse((-1, -1L, -1L))
          (id, got._1.toLong, got._2, got._3)
        }.toDF("doc_id", "n_entries", "total_bytes", "compressed_bytes")
    }),

    // POSIX ustar header walk: hop by declared octal sizes, count
    // regular members, never read payloads.
    "q359_tar_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val entries = 1 + (id % 6L).toInt
          val per = 100 + (id % 9L).toInt * 50
          val got = multimodal.Binary.tarMeta(
            multimodal.Binary.synthTar(entries, per))
            .getOrElse((-1, -1L))
          (id, got._1.toLong, got._2)
        }.toDF("doc_id", "n_entries", "total_bytes")
    }),

    // OGG Vorbis/Opus identification-header decode: real page walk over
    // deterministic fixtures (even ids Vorbis with a table rate, odd
    // ids Opus at the RFC-fixed 48 kHz granule rate); the synth
    // arithmetic replays in SQL.
    "q352_ogg_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val codec = 1 + (id % 2L).toInt
          val rate = Seq(44100, 48000, 32000)((id % 3L).toInt)
          val ch = 1 + (id % 2L).toInt
          val n = 1000L + id % 9000L
          val got = multimodal.Binary.oggMeta(
            multimodal.Binary.synthOgg(codec, rate, ch, n))
            .getOrElse((-1, -1, -1, -1L))
          (id, got._1.toLong, got._2.toLong, got._3.toLong, got._4)
        }.toDF("doc_id", "codec", "sample_rate", "channels", "n_samples")
    }),

    // AVIF/HEIC dimensions via the ISO-BMFF ispe item property — the
    // modern-codec leg of the dimension family, fixture-driven with
    // SQL-derivable expected values.
    "q334_avif_dims" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val w = ((id % 200L).toInt + 1) * 2
          val h = ((id % 100L).toInt + 1) * 3
          val brand = if (id % 2L == 0L) "avif" else "heic"
          val got = multimodal.Binary.avifDims(
            multimodal.Binary.synthAvif(w, h, brand))
          (id, got.map(_._1.toLong).getOrElse(-1L),
            got.map(_._2.toLong).getOrElse(-1L))
        }.toDF("doc_id", "width", "height")
    }),

    // MoR MERGE with a DELETE clause (CDC apply at the table-format
    // level): one change batch carrying tombstones, updates and inserts;
    // matched rows die behind vectors, only non-tombstones append. The
    // oracle recomputes the final table from source arithmetic.
    "q332_merge_apply" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_app_")
      val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      base.write.format(fmt).option("path", dir).mode("overwrite").save()
      val changes = base.filter(col("k") % 7 === 0)
        .select(col("k"), col("cents"), lit(true).as("is_delete"))
        .unionByName(base.filter(col("k") % 7 === 1)
          .select(col("k"), (col("cents") + 12345L).as("cents"),
            lit(false).as("is_delete")))
        .unionByName(base.filter(col("k") % 7 === 2)
          .select((col("k") + 1000000000L).as("k"),
            lit(77L).as("cents"), lit(false).as("is_delete")))
      sources.WarehouseSink.applyChangesMoR(s, dir, changes,
        keyCols = Seq("k"), deleteCol = "is_delete")
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_cents").cast("long").as("sum_cents"))
    }),

    // Initial-default column end-to-end: write an era WITHOUT the
    // column, addColumnWithDefault (metadata-only), append an era WITH
    // real values — old-era rows must read the default, new-era rows
    // their stored values; the oracle recomputes both eras from source.
    "q331_column_default" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_def_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qty"))
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.addColumnWithDefault(dir, "grade", "string",
        "legacy")
      li.filter(col("l_orderkey") % 2 === 1)
        .withColumn("grade",
          when(col("qty") >= 25, "high").otherwise("low"))
        .write.format(fmt).option("path", dir).mode("append").save()
      s.read.format(fmt).option("path", dir).load()
        .groupBy("grade")
        .agg(count(lit(1)).as("n_rows"),
          sum("qty").cast("long").as("sum_qty"))
    }),

    // Multi-seed BFS over the supplier↔part bipartite graph: exact
    // shortest-hop expansion curve, frontier-driven, 3 unrolled rounds.
    "q330_bfs_hops" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      val edges = li.select(col("sk").as("src"), col("pk").as("dst"))
        .unionByName(li.select(col("pk").as("src"), col("sk").as("dst")))
      Graph.bfsHops(edges, "src", "dst", seeds = Seq(1L, 2L, 3L),
        maxHops = 3)
    }),

    // Concentration panel: exact Gini / HHI / top-share of per-user
    // event volume within each event type — pure ppm integer arithmetic.
    "q329_concentration" -> ((s, d) =>
      Analytics.concentrationPanel(Tables.events(s, d), "event_type",
        "user_id")),

    // Mann-Whitney U on a heavily-tied integer metric (quantity 1..50):
    // doubled midranks keep U and the tie term exact; z replays through
    // the explicitly-ordered double/sqrt expression.
    "q328_mann_whitney" -> ((s, d) =>
      Analytics.mannWhitneyU(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity", groupA = "R", groupB = "N")),

    // Welch's unequal-variance t-test (t² + Welch–Satterthwaite df,
    // integral milli/micro fixed points, three documented floors the
    // oracle mirrors): do returned and kept line items differ in mean
    // extended price?
    "q356_welch_t" -> ((s, d) =>
      Analytics.welchT(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", groupA = "R", groupB = "N")),

    // Span-dedup sensitivity: corpus removal volume at k in {6, 8, 12}
    // — the knob audit before committing to one anchor length.
    "q349_span_sweep" -> ((s, d) =>
      Dedup.spanSensitivity(Tables.documents(s, d), "doc_id", "text",
        ks = Seq(6, 8, 12))),

    // Incremental span dedup: odd-doc batch checked against the
    // even-doc corpus gram store — spans found at admission, zero
    // corpus re-scan.
    "q347_span_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = Dedup.gramStore(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", k = 8)
      Dedup.dupSpansVsStore(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", k = 8,
        store)
    }),

    // Per-doc novelty: share of shingles unique to the doc corpus-wide
    // (the inverse near-dup readout; template sludge scores ~0).
    "q346_novelty" -> ((s, d) =>
      Dedup.noveltyRate(Tables.documents(s, d), "doc_id", "text", n = 3)),

    // Span-dedup action readout: what the removal pass deletes per
    // source — the corpus-curation decision table over q326.
    "q342_span_clean" -> ((s, d) =>
      Dedup.spanCleanReportFromSpans(Tables.documents(s, d), "doc_id",
        "text", "source", dupSpans8(s, d))),

    // Span-removal REWRITE: splice every duplicated-span interval out of
    // the token stream and re-materialize clean_text — untouched docs
    // byte-identical, touched docs rebuilt from original-case tokens;
    // tokens_after == n_tokens - tokens_removed asserted in-query.
    "q350_span_rewrite" -> ((s, d) =>
      Dedup.removeSpansFromSpans(Tables.documents(s, d), "doc_id", "text",
        dupSpans8(s, d))),

    // Exact duplicated-SPAN detection (substring-level dedup, the Lee
    // et al. suffix-array rung in bucketed k-gram-anchor form): spans of
    // ≥ 8 tokens shared verbatim across documents, found exactly via
    // shared-gram coverage + doc-keyed island merge. No pair join.
    "q325_dup_spans" -> ((s, d) => dupSpans8(s, d)),

    // Per-doc duplicated-span rollup: how much of each document is
    // copied verbatim elsewhere in the corpus (integer-ppm).
    "q326_span_report" -> ((s, d) =>
      Dedup.dupSpanReportFromSpans(Tables.documents(s, d), "doc_id",
        "text", dupSpans8(s, d))),

    // REAL BPE tokenizer encode, oracle-proven: the codegen'd BpeTokens
    // expression under Vocab.DisjointMerges, whose non-interacting pairs
    // give the token count a closed form the DuckDB oracle computes
    // independently (|non-space chars| − Σ pair occurrences). Interacting
    // merge tables are BpeSpec territory (SQL can't replay the loop).
    "q323_bpe_encode" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        Vocab.bpeTokenCount(col("text"), Vocab.DisjointMerges)
          .as("n_tokens"))),

    // q104's token budget recounted with the REAL tokenizer: per-source
    // deterministic admission until the cumulative BPE token count
    // crosses the budget.
    "q324_bpe_budget" -> ((s, d) =>
      Vocab.bpeTokenBudgetCap(Tables.documents(s, d), "doc_id", "text",
        "source", budget = 4000L, Vocab.DisjointMerges)),

    // Column mapping end-to-end: write → RENAME (metadata-only, field
    // ids) → append under the new name → DROP a column → read both file
    // eras back; the oracle recomputes from the source, so the hash
    // proves the id resolution returned every pre-rename value.
    "q319_column_mapping" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_ren_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_partkey"), col("l_quantity").cast("long").as("q0"))
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.renameColumn(dir, "q0", "qty")
      li.filter(col("l_orderkey") % 2 === 1)
        .select(col("l_orderkey"), col("l_partkey"), col("q0").as("qty"))
        .write.format(fmt).option("path", dir).mode("append").save()
      sources.WarehouseSink.dropColumn(dir, "l_partkey")
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_qty").cast("long").as("sum_qty"))
    }),

    // Prefix-filter EXACT similarity self-join: identical answer to the
    // brute-force all-pairs oracle — the rarest-first prefix index is
    // provably lossless, and the hash match IS the losslessness proof.
    "q317_prefix_jaccard" -> ((s, d) =>
      Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.5)),

    // FP-Growth frequent itemsets (PFP) over per-user event-type
    // baskets, exact integer support threshold, lattice to triples.
    "q318_fp_growth" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"))
      val n = ev.filter(col("user_id").isNotNull &&
        col("event_type").isNotNull).select("user_id").distinct().count()
      ml.Fpm.frequentItemsets(ev, "user_id", "event_type",
        minCount = math.max(2L, n / 20L), maxLen = 3)
    }),

    // WebP dims across all three container variants (lossy VP8 /
    // lossless VP8L / extended VP8X chosen per doc), synth-roundtrip:
    // decode(synth(w,h,v)) must reproduce the id-derived dims.
    "q315_webp_dims" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val w = 16 + (id % 17L).toInt
          val h = 9 + (id % 13L).toInt
          val v = (id % 3L).toInt
          val got = multimodal.Binary.webpDims(
            multimodal.Binary.synthWebp(w, h, v)).getOrElse((-1, -1))
          (v.toLong, w.toLong, h.toLong, got._1.toLong, got._2.toLong)
        }.toDF("variant", "w", "h", "w_decoded", "h_decoded")
        .groupBy("variant", "w", "h", "w_decoded", "h_decoded")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // MP3 frame-header walk over id-derived CBR fixtures (1/3 behind an
    // ID3v2 prefix): frame count, rate/bitrate tables, sample totals.
    "q316_mp3_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val brIdx = 1 + (id % 14L).toInt
          val srIdx = (id % 3L).toInt
          val frames = 3 + (id % 5L).toInt
          val id3 = if (id % 3L == 0L) 32 else 0
          val m = multimodal.Binary.mp3Meta(
            multimodal.Binary.synthMp3(brIdx, srIdx, frames, id3))
            .getOrElse((-1, -1, -1, -1L))
          (brIdx.toLong, srIdx.toLong, frames.toLong,
            m._1.toLong, m._2.toLong, m._3.toLong, m._4)
        }.toDF("br_idx", "sr_idx", "frames", "frames_decoded",
          "sample_rate", "bitrate_kbps", "n_samples")
        .groupBy("br_idx", "sr_idx", "frames", "frames_decoded",
          "sample_rate", "bitrate_kbps", "n_samples")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Consistent-hash rebalance bill: 4→5 shards on the md5 ring —
    // the ~1/(N+1) movement promise proved on the corpus itself.
    "q308_shard_rebalance" -> ((s, d) =>
      Corpus.shardRebalanceReport(Tables.documents(s, d), "doc_id",
        nShards = 4, vnodes = 8)),

    // Merge-on-read UPDATE WHERE SET: two composed DV updates (the
    // second one hits the first's appended post-images, proving old
    // versions die behind vectors and assignments see CURRENT values);
    // data files never rewritten — readback through the vectors vs the
    // CASE recompute proves row-exact semantics at O(matched rows) write.
    "q310_mor_update" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_morupd_")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .repartitionByRange(8, col("p_partkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.updateWhereMoR(s, dir,
        Seq(GreaterThanOrEqual("p_partkey", 500L), LessThan("p_partkey", 1500L)),
        Map("p_retailprice" -> (col("p_retailprice") + 100.0)))
      graft.sources.WarehouseSink.updateWhereMoR(s, dir,
        Seq(LessThan("p_partkey", 800L)),
        Map("p_retailprice" -> (col("p_retailprice") + 10.0)))
      s.read.format(fmt).option("path", dir).load()
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(floor(col("p_retailprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Keyed snapshot diff across table VERSIONS: v0 (time travel) vs
    // the live state after a CoW delete + append + CoW update —
    // added/removed/changed/unchanged per key, null-safe payload
    // compare; the release-audit readout of the time-travel family.
    "q362_version_diff" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_vdiff_")
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      cust.repartition(4)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{EqualTo, LessThan}
      graft.sources.WarehouseSink.deleteWhere(s, dir,
        Seq(LessThan("c_custkey", 50L)))
      cust.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"), col("c_acctbal"))
        .write.format(fmt).option("path", dir).mode("append").save()
      graft.sources.WarehouseSink.updateWhere(s, dir,
        Seq(EqualTo("c_mktsegment", "BUILDING")),
        Map("c_acctbal" -> (col("c_acctbal") + 100.0)))
      val v0 = s.read.format(fmt).option("path", dir)
        .option("versionAsOf", "0").load()
      val live = s.read.format(fmt).option("path", dir).load()
      Etl.snapshotDiff(v0, live, Seq("c_custkey"))
        .groupBy("change").agg(count(lit(1)).as("n_rows"))
    }),

    // MoR DML chain materialized by maintenance (REORG/PURGE): a delete
    // and an update land as deletion vectors (O(matched) writes), then
    // maintain rewrites the table THROUGH the vectors into clean
    // vector-free files — the readback after the purge must replay the
    // same set/CASE arithmetic the vectors encoded.
    "q355_mor_reorg" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_morreorg_")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_retailprice"))
        .repartitionByRange(8, col("p_partkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.deleteWhereMoR(s, dir,
        Seq(LessThan("p_partkey", 30L)))
      graft.sources.WarehouseSink.updateWhereMoR(s, dir,
        Seq(GreaterThanOrEqual("p_size", 25)),
        Map("p_retailprice" -> (col("p_retailprice") + 50.0)))
      val rep = graft.sources.WarehouseSink.maintain(s, dir)
      require(rep.compacted, "REORG must rewrite a DV-carrying table")
      s.read.format(fmt).option("path", dir).load()
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(floor(col("p_retailprice") * 100).cast("long"))
            .as("sum_cents"))
    }),

    // Merge-on-read MERGE: matched customer keys die behind deletion
    // vectors and the whole upsert batch (replacements + brand-new keys)
    // appends ONCE — O(|updates| + matched positions) against a table
    // whose data files never rewrite; readback vs the set-algebra oracle.
    "q311_mor_merge" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_mormrg_")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .repartitionByRange(8, col("c_custkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      val base = Tables.customer(s, d).filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal") + 1000.0).as("c_acctbal"))
      val updates = base.unionByName(base.select(
        (col("c_custkey") + 10000000L).as("c_custkey"),
        lit("NEWSEG").as("c_mktsegment"), col("c_acctbal")))
      graft.sources.WarehouseSink.mergeMoR(s, dir, updates, Seq("c_custkey"))
      s.read.format(fmt).option("path", dir).load()
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_cust"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("sum_cents"))
    }),

    // Funnel drop-off with Wilson CIs: which step bleeds, and is the
    // drop signal or noise — pairwise conversions over q115's stages.
    "q307_funnel_dropoff" -> ((s, d) =>
      Analytics.funnelDropoff(eventsUs(s, d), "user_id", "ts_us",
        "event_type", Seq("signup", "click", "purchase"),
        windowUs = 7L * 86400L * 1000000L)),

    // Per-slice AUC: the model-card readout — q167's exact midrank AUC
    // partitioned by language, surfacing slices the global number hides.
    "q306_auc_by_slice" -> ((s, d) =>
      ml.Eval.rocAucBy(Tables.documents(s, d).select(
        col("lang").as("slice"),
        greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
          lit(10000L)), lit(0L)).cast("long").as("score_q"),
        (col("n_chars") >= 300).cast("long").as("label")),
        "slice", "score_q", "label")),

    // Item-item cosine CF: "bought this, also bought" neighbors with
    // popularity damped by the cosine denominator, hub users capped.
    "q305_item_cf" -> ((s, d) =>
      ml.Recommend.itemCosineCf(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id")),
        "user_id", "item_id", maxUserItems = 80, k = 5, minCo = 2)),

    // Chart turnover: week-over-week Jaccard churn of the top-10 user
    // leaderboard — the ranking-surface volatility metric.
    "q304_chart_turnover" -> ((s, d) =>
      Charts.chartTurnover(eventsUs(s, d), "user_id", "ts_us", k = 10)),

    // Leak-free feature/label rows: features strictly before the
    // cutoff, the label from the 14-day future window — the temporal
    // training-table builder.
    "q303_feature_labels" -> ((s, d) =>
      Analytics.featureLabelTable(eventsUs(s, d), "user_id", "ts_us",
        "value", cutoffUs = 1706745600000000L,
        labelWindowUs = 14L * 86400L * 1000000L)),

    // Leave-last-out recommender eval: HR@20 / MRR of the popularity
    // baseline on each customer's held-out last purchase.
    "q302_leave_last_out" -> ((s, d) =>
      ml.Recommend.leaveLastOutEval(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey"), col("l_linenumber")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id"), col("o_orderdate").as("ts"),
            (col("l_orderkey") * lit(10L) + col("l_linenumber"))
              .cast("long").as("row_id")),
        "user_id", "item_id", "ts", "row_id", k = 20)),

    // ALS implicit-feedback recommender vs the popularity baseline,
    // both through the q302 leave-last-out protocol — the learned-model
    // rung recommendation.py's KMeans recommender approximates.
    // Rows-only: ALS factors are seeded but float-reduction-order
    // specific; MlSpec pins planted-structure recovery instead.
    "q312_als_eval" -> ((s, d) =>
      ml.Recommend.alsVsPopularityEval(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey"), col("l_linenumber")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id"), col("o_orderdate").as("ts"),
            (col("l_orderkey") * lit(10L) + col("l_linenumber"))
              .cast("long").as("row_id")),
        // rank/maxIter sized for the bench budget: the contract claim
        // is the protocol (rows-only), not model quality — MlSpec owns
        // the planted-recovery assertion at full strength.
        "user_id", "item_id", "ts", "row_id", k = 20, rank = 8,
        maxIter = 5)),

    // TextRank keywords: PageRank centrality over the word
    // co-occurrence graph — integer walk, oracle unrolls 3 steps.
    "q301_textrank" -> ((s, d) =>
      Search.textRank(Tables.documents(s, d), "doc_id", "text",
        coWindow = 2, iters = 3, topK = 20)),

    // Preference pairs: the (chosen, rejected, margin) training rows a
    // DPO/reward pipeline consumes — exact floor-centi margins, thin
    // margins gated out.
    "q300_preference_pairs" -> ((s, d) =>
      ml.Preference.preferencePairs(Tables.events(s, d), "user_id",
        "event_type", "value", minMarginCenti = 500L)),

    // Bradley-Terry preference strengths over per-user pairwise value
    // comparisons — integer MM iterations, oracle unrolls the same
    // three steps.
    "q299_bradley_terry" -> ((s, d) =>
      ml.Preference.bradleyTerry(Tables.events(s, d), "user_id",
        "event_type", "value", iters = 3)),

    // Near-dup SPLIT leakage: the same portable pairs mapped to the
    // train/test hash split on both ends — the paraphrase-leakage audit
    // q128's exact-fingerprint check can't see (a train doc's light
    // rewrite sitting in test inflates eval).
    "q298_neardup_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = portableMinhashPairs(s, d)
      val sp = docs.select(col("doc_id"),
        when(substring(md5(col("text").cast("binary")), 1, 1) < "d",
          "train").otherwise("test").as("graft_sp"))
      pairs
        .join(sp.withColumnRenamed("doc_id", "id1")
          .withColumnRenamed("graft_sp", "graft_p1"), Seq("id1"))
        .join(sp.withColumnRenamed("doc_id", "id2")
          .withColumnRenamed("graft_sp", "graft_p2"), Seq("id2"))
        .select(least(col("graft_p1"), col("graft_p2")).as("split_a"),
          greatest(col("graft_p1"), col("graft_p2")).as("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_neardup_pairs"))
    }),

    // Near-dup contamination matrix: the oracle-exact portable-LSH pairs
    // mapped to their sources — which sources SHARE near-duplicate
    // content (the exact-copy matrix q193 can't see paraphrases).
    "q194_source_neardup_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = portableMinhashPairs(s, d)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.withColumnRenamed("doc_id", "id1")
          .withColumnRenamed("source", "graft_s1"), Seq("id1"))
        .join(src.withColumnRenamed("doc_id", "id2")
          .withColumnRenamed("source", "graft_s2"), Seq("id2"))
        .select(least(col("graft_s1"), col("graft_s2")).as("src_a"),
          greatest(col("graft_s1"), col("graft_s2")).as("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_neardup_pairs"))
    }),

    // Filtered vector search: top-k nearest within one label only —
    // pre-filtered (exact), same scoring as q23.
    "q195_filtered_ann" -> ((s, d) =>
      Similarity.cosineTopKFiltered(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 10, predicate = col("label") === 1)),

    // One-way ANOVA of purchase value by event type: exact η² and F in
    // fixed-point from decimal sums — "does the grouping explain the
    // metric" as a hash-checkable readout.
    "q196_variance_decomposition" -> ((s, d) =>
      Analytics.varianceDecomposition(Tables.events(s, d), "event_type",
        "value")),

    // Robust trend: lower-median of pairwise daily slopes per type —
    // the outlier-proof twin of q186's least squares.
    "q199_theil_sen" -> ((s, d) =>
      Analytics.theilSenSlope(eventsUs(s, d), "event_type", "ts_us")),

    // Seasonal-adjusted anomaly screen: q117's blind spot fixed — the
    // MAD rule applies to residuals vs the same-weekday expectation, so
    // a weekly-cyclic series stops flagging every weekend.
    "q230_seasonal_anomaly" -> ((s, d) =>
      Analytics.seasonalAnomaly(eventsUs(s, d), "event_type", "ts_us",
        k = 3, madK = 3.0)),

    // Weekly cohort LTV: q88 retention's monetary twin — the cumulative
    // centi-value-per-user curve a growth team reads payback off.
    "q231_cohort_ltv" -> ((s, d) =>
      Analytics.cohortLtv(eventsUs(s, d), "user_id", "ts_us", "value")),

    // Mann-Kendall trend test: the significance readout completing the
    // trend family (q186 slope, q199 robust slope) — integer S and
    // tie-corrected V18, pinned-order IEEE assembly.
    "q232_mann_kendall" -> ((s, d) =>
      Analytics.mannKendall(eventsUs(s, d), "event_type", "ts_us")),

    // Kaplan-Meier churn survival: censoring-correct retention — the
    // per-step ppm-floored product limit, replayed by the oracle as a
    // recursive CTE walking the identical recurrence.
    "q242_kaplan_meier" -> ((s, d) =>
      Analytics.kaplanMeier(eventsUs(s, d), "user_id", "ts_us",
        censorDays = 7)),

    // Nelson-Aalen cumulative hazard: KM's additive twin — the same
    // censoring-correct life table, but the SUM estimator stays fully
    // distributed (one ordered window, no driver fold, no recursion).
    "q343_nelson_aalen" -> ((s, d) =>
      Analytics.nelsonAalen(eventsUs(s, d), "user_id", "ts_us",
        censorDays = 7)),

    // Chance-corrected agreement at the q169 mid threshold: accuracy,
    // balanced accuracy, Cohen's kappa — the imbalance-honest readout
    // (all rationals in the confusion counts, truncated ppm).
    "q243_agreement" -> ((s, d) =>
      ml.Eval.agreementStats(scoredDocs(s, d), "score_q", "label",
        threshold = 5000L)),

    // Negative sampling: per customer, 3 deterministic hash-drawn parts
    // they never bought — the implicit-feedback training-data op.
    "q297_negative_sample" -> ((s, d) =>
      ml.Recommend.negativeSample(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id")),
        "user_id", "item_id", k = 3)),

    // Median with a distribution-free order-statistic CI per event
    // type — binomial rank bounds, exact centi values.
    "q296_quantile_ci" -> ((s, d) =>
      Analytics.quantileCi(Tables.events(s, d), "event_type", "value",
        qMilli = 500L)),

    // Wilson intervals per arm: the uncertainty the q137 point rates
    // can't carry — score intervals that never leave [0,1].
    "q295_wilson_arms" -> ((s, d) =>
      Experiment.wilsonArms(Tables.events(s, d), "user_id", "event_type",
        "value", exposureType = "view", conversionType = "purchase",
        minValue = 50.0)),

    // Cochran-Armitage: does purchase rate rise MONOTONICALLY with
    // view-exposure dose — the trend test chi-square can't sharpen to.
    "q294_cochran_armitage" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("graft_v"),
          max((col("event_type") === "purchase").cast("long"))
            .as("outcome"))
        .select(expr("least(graft_v div 3, 3L)").as("dose"),
          col("outcome"))
      Experiment.cochranArmitage(perUser, "dose", "outcome")
    }),

    // Good-Turing: unseen-vocabulary mass (n1/N) + adjusted counts for
    // the low-frequency tail — the corpus-coverage readout.
    "q293_good_turing" -> ((s, d) =>
      Analytics.goodTuring(Tables.documents(s, d), "text", gramN = 3,
        maxR = 5)),

    // Capture-recapture: Lincoln-Petersen estimate of the corpus's
    // distinct-content count from two independent hash half-samples —
    // the dedup-scoping estimate that never pays for a global distinct.
    "q292_capture_recapture" -> ((s, d) =>
      Dedup.captureRecapture(Tables.documents(s, d), "doc_id", "text")),

    // Join-cardinality pre-flight: exact pair counts per key from the
    // two histograms — the audit that prices a 100 TB join before
    // running it (lineitem ⋈ orders on orderkey).
    "q291_join_cardinality" -> ((s, d) =>
      Skew.joinCardinalityAudit(Tables.lineitem(s, d), Tables.orders(s, d),
        "l_orderkey", "o_orderkey", topK = 20)),

    // EXIF tag walk: APP1/TIFF IFD0 in BOTH byte orders (half the docs
    // synthesize Intel "II", half Motorola "MM") — the oracle derives
    // the expected orientation/timestamp arithmetically, so the hash
    // match proves both endianness walks decode identically.
    "q290_exif_tags" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val dt = f"2024:01:${1 + id % 28}%02d 10:00:00"
          multimodal.Binary.exifTags(multimodal.Binary.synthExifJpeg(
            orientation = (1 + id % 8).toInt, dateTime = dt,
            littleEndian = id % 2 == 0)) match {
            case Some((o, t)) => (o, t)
            case None => (-1L, "?")
          }
        }.toDF("orientation", "taken_at")
        .groupBy("orientation", "taken_at")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Cross-correlation: does the error series LEAD the purchase
    // series — per-lag exact-sums Pearson over paired observed days.
    "q289_ccf" -> ((s, d) =>
      Analytics.crossCorrelation(eventsUs(s, d), "event_type", "ts_us",
        seriesA = "error", seriesB = "purchase", maxLag = 3)),

    // Best-passage extraction: the 8-token window with max distinct
    // query-term coverage per doc, snippet text reassembled from the
    // normalized tokens — the highlighting/RAG-context picker.
    "q288_best_passage" -> ((s, d) =>
      Search.bestPassage(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "vector"), windowTokens = 8, topK = 10)),

    // Friedman repeated-measures rank test: within-user ranks across
    // three event types — blocks cancel user-level heterogeneity.
    "q287_friedman" -> ((s, d) =>
      Analytics.friedman(Tables.events(s, d), "user_id", "event_type",
        "value", treatments = Seq("view", "click", "purchase"))),

    // Link prediction: CN + resource-allocation over the supplier↔part
    // graph — hub intermediaries df-capped, exact integer RA.
    "q286_link_prediction" -> ((s, d) =>
      Graph.linkPrediction(Tables.lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + lit(10000000L)).cast("long").as("dst")),
        "src", "dst", maxDeg = 25, topK = 20)),

    // Rocchio PRF expansion: top-4 feedback docs → top-8 Σtf·idf
    // expansion terms at weight 400 milli → weighted BM25 re-retrieval.
    "q285_prf_expand" -> ((s, d) =>
      Search.prfExpand(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "vector", "slow"), fbDocs = 4,
        fbTerms = 8, betaMilli = 400L, topK = 20)),

    // MCC at the mid-scale threshold: the imbalance-honest confusion
    // summary — exact DECIMAL counts/products, pinned IEEE finish.
    "q284_mcc" -> ((s, d) =>
      ml.Eval.mcc(scoredDocs(s, d), "score_q", "label",
        thresholdScore = 5000L)),

    // SRM check: the assignment-integrity gate — cleared-denominator
    // 1-df chi-square of the observed arm split vs the designed share,
    // DECIMAL(38,0) through the square, flag at the 95% critical value.
    "q283_srm" -> ((s, d) =>
      Experiment.srmCheck(Tables.events(s, d), "user_id", "event_type",
        exposureType = "view", designMilliA = 500L)),

    // MMR diversified top-k: greedy λ·rel − (1−λ)·max-sim re-ranking
    // over a bounded candidate pool — all integer nano-unit scores, the
    // oracle unrolls the same six greedy steps.
    "q282_mmr_topk" -> ((s, d) =>
      Similarity.mmrTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 6, poolN = 16, lambdaMilli = 700L)),

    // ID3v2 tag walk: synchsafe-size round-trip + frame iteration —
    // the oracle derives the expected tag size arithmetically, so the
    // hash match proves the 7-bit size encoding and the frame walk.
    "q281_id3_tags" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val title = "T" + ("x" * (id % 7).toInt)
          val artist = "A" + ("y" * (id % 3).toInt)
          multimodal.Binary.id3Tags(multimodal.Binary.synthMp3Id3(
            title, artist, padBytes = 200, audioBytes = 64)) match {
            case Some((t, a, sz)) => (t, a, sz)
            case None => ("?", "?", -1L)
          }
        }.toDF("title", "artist", "tag_size")
        .groupBy("title", "artist", "tag_size")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Degree assortativity: Newman's r over the supplier↔part graph —
    // do hubs link to hubs, exact degree sums then the spearman finish.
    "q280_assortativity" -> ((s, d) =>
      Graph.degreeAssortativity(Tables.lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + lit(10000000L)).cast("long").as("dst")),
        "src", "dst")),

    // Qini uplift curve: cumulative incremental conversions by score
    // decile — treated vs exposure-scaled control, the model-free
    // pre-activity score any uplift model must beat.
    "q279_qini" -> ((s, d) =>
      Experiment.upliftCurve(eventsUs(s, d), "user_id", "event_type",
        "value", "ts_us", metricType = "purchase",
        cutTsUs = 1705363200000000L)),

    // Coarsened-exact-matching ATT: the observational-causal rung —
    // treated vs control compared only inside coarsened pre-covariate
    // strata, off-support units pruned and REPORTED, effect as an exact
    // rational pair plus one correctly-rounded double division.
    "q278_cem" -> ((s, d) =>
      Experiment.cemAtt(eventsUs(s, d), "user_id", "event_type", "value",
        "ts_us", metricType = "purchase", cutTsUs = 1705363200000000L)),

    // Ljung-Box whiteness test: one-number portmanteau over q218's
    // exact ACF lags — joint autocorrelation through lag 3, the chain
    // of correctly-rounded FP ops pinned by expression shape.
    "q277_ljung_box" -> ((s, d) =>
      Analytics.ljungBox(eventsUs(s, d), "event_type", "ts_us", maxLag = 3)),

    // Z-order maintenance cycle: Morton-clustered rewrite (quantile-rank
    // bit interleave) gives every file a tight rectangle in
    // (l_orderkey, l_partkey) space, then a 2-D box probe reads through
    // the min/max skip path — pruning on BOTH columns, which
    // single-column clustering gives only its lead dimension.
    "q276_zorder" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_zord_")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity").cast("long").as("qty"))
        .repartition(64)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.maintain(s, dir, targetBytes = 256L << 10,
        zorderBy = Some(("l_orderkey", "l_partkey")))
      s.read.format(fmt).option("path", dir).load()
        .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 2500L &&
          col("l_partkey") >= 500L && col("l_partkey") < 1500L)
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"),
          sum("l_orderkey").as("sum_ok"), sum("l_partkey").as("sum_pk"))
    }),

    // Sequential-pattern pairs: gap-tolerant ordered mining — sessions
    // where type a happens EVENTUALLY before type b (min-pos < max-pos
    // collapse, so the pair join never touches raw events).
    "q275_seq_patterns" -> ((s, d) =>
      Sessions.sequentialPairs(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type", gapUs = 30L * 60 * 1000000,
        minSupport = 2L)),

    // Difference-in-differences with a pre-period placebo replay: the
    // quasi-experimental rung of the experiment family — each arm's own
    // pre-trend subtracted, parallel-trends made checkable.
    "q274_did" -> ((s, d) =>
      Experiment.diffInDiff(eventsUs(s, d), "user_id", "event_type",
        "value", "ts_us", metricType = "purchase",
        cutTsUs = 1705363200000000L, placeboCutUs = 1704672000000000L)),

    // Kruskal-Wallis: the k-sample rung of the rank family — do the
    // event types draw `value` from one distribution, judged on exact
    // integral midranks with the tie-corrected H in floor-milli.
    "q273_kruskal_wallis" -> ((s, d) =>
      Analytics.kruskalWallis(Tables.events(s, d), "event_type", "value")),

    // HITS hubs/authorities: the directed twin of q131's PageRank — on
    // the supplier→part graph, hub mass = broad-catalog suppliers,
    // authority mass = widely-sourced parts; max-normed integer
    // half-steps so the oracle unrolls the identical arithmetic.
    "q272_hits" -> ((s, d) =>
      Graph.hitsPortable(Tables.lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + lit(10000000L)).cast("long").as("dst")),
        "src", "dst", iters = 3, topK = 20)),

    // t-closeness: the privacy triad's skew rung after k-anonymity
    // (q143) and l-diversity (q241) — ordered-domain EMD between each
    // (nation, segment) group's acctbal-band distribution and the
    // global one, denominators cleared so the statistic stays integral.
    "q271_t_closeness" -> ((s, d) =>
      Analytics.tClosenessRisk(Tables.customer(s, d),
        Seq(col("c_nationkey"), col("c_mktsegment")),
        Seq("nation", "segment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)"), tPpm = 100000L)),

    // Term-bloom full-text file skipping: the sidecar-index family's
    // third leg (equality bloom, zone maps, now TOKENS) — search 'dup'
    // through the index, exact token predicate re-applied.
    "q270_term_lookup" -> ((s, d) => {
      val (store, side) = termStorePaths(s, d)
      sources.TermIndex.search(s, store, side, "text", "dup")
        .select(col("doc_id"), col("source"))
    }),

    // Operating-point picker: the Youden-J and F1-max thresholds over
    // every distinct score — the cut a deployed classifier ships.
    "q269_operating_point" -> ((s, d) =>
      ml.Eval.operatingPoint(scoredDocs(s, d), "score_q", "label")),

    // GIF frame count via the real block walk — the animated-vs-static
    // media signal, no LZW decode needed. Deterministic synth fixtures.
    "q268_gif_frames" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val n = 1 + (id % 5L).toInt
          val got = multimodal.Binary.gifFrameCount(
            multimodal.Binary.synthGif(16, 12, n)).getOrElse(-1)
          (n.toLong, got.toLong)
        }.toDF("frames", "frames_decoded")
        .groupBy("frames", "frames_decoded")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Fano-factor burstiness: variance-to-mean of daily counts per
    // series — 1e6 ppm = Poisson baseline, above = bursty.
    "q267_fano" -> ((s, d) =>
      Analytics.fanoFactor(eventsUs(s, d), "event_type", "ts_us")),

    // Out-of-fold target encoding: the leakage-free categorical feature
    // table (lang → label mean from the OTHER md5 folds), exact ppm.
    "q266_target_encoding" -> ((s, d) =>
      ml.Eval.targetEncode(
        Tables.documents(s, d).select(col("doc_id"), col("lang"),
          (col("n_chars") >= 300).cast("long").as("label")),
        "doc_id", "lang", "label", folds = 4)),

    // Composed eval panel #2 (the q200 pattern over the round-10 eval
    // family): kappa, Brier, ECE, conformal coverage, jackknife z and
    // log-rank z in one labeled table — the oracle composes the
    // members' own proven SQL, so any member drifting breaks both.
    "q265_eval_panel" -> ((s, d) => {
      def one(metric: String, df: DataFrame, valueCol: String): DataFrame =
        df.select(lit(metric).as("metric"), col(valueCol).as("value"))
      Seq(
        one("kappa_ppm",
          ml.Eval.agreementStats(scoredDocs(s, d), "score_q", "label",
            threshold = 5000L), "kappa_ppm"),
        one("brier_ppm",
          ml.Eval.brierDecomposition(scoredDocs(s, d), "score_q", "label",
            scale = 10000L), "brier_ppm"),
        one("ece_ppm",
          ml.Eval.calibrationError(scoredDocs(s, d), "score_q", "label",
            bins = 10, scale = 10000L), "ece_ppm"),
        one("conformal_coverage_ppm",
          ml.Eval.conformalCoverage(
            Tables.documents(s, d).select(col("doc_id"),
              greatest(least(floor(T.qualityScore(col("text")) * 10000
                + 0.5), lit(10000L)), lit(0L)).cast("long").as("pred"),
              ((col("n_chars") >= 300).cast("long") * 10000L)
                .as("actual")),
            "doc_id", "pred", "actual", alphaPpm = 100000L),
          "coverage_ppm"),
        one("jackknife_z_milli",
          Experiment.jackknifeDiff(Tables.events(s, d), "user_id",
            "event_type", "value", metricType = "purchase", buckets = 16),
          "z_milli"),
        one("logrank_z_milli",
          Analytics.logRank(eventsUs(s, d), "user_id", "ts_us",
            censorDays = 7), "z_milli"))
        .reduce(_ unionByName _)
    }),

    // Log-rank test: do the two md5 cohorts' churn curves differ —
    // censoring-correct O/E per event time, Brier-style exact micro
    // accumulation, pinned z assembly.
    "q264_logrank" -> ((s, d) =>
      Analytics.logRank(eventsUs(s, d), "user_id", "ts_us",
        censorDays = 7)),

    // Exact two-covariate OLS: daily purchases ~ views + clicks by
    // Cramer's rule — every coefficient one rational, NULL on collinear.
    "q263_ols2" -> ((s, d) =>
      Analytics.ols2(eventsUs(s, d), "ts_us", "event_type",
        yType = "purchase", xType = "view", zType = "click")),

    // Functional-dependency audit: declared "lhs → rhs" candidates over
    // lineitem — true dependencies audit clean, believed-but-false ones
    // surface denormalization drift.
    "q262_fd_audit" -> ((s, d) =>
      Expectations.fdAudit(Tables.lineitem(s, d), Seq(
        (Seq("l_orderkey"), "l_suppkey"),
        (Seq("l_partkey"), "l_suppkey"),
        (Seq("l_orderkey", "l_linenumber"), "l_partkey")))),

    // KMV bottom-k sketch Jaccard: a deterministic (md5-ordered) sketch
    // whose estimate hash-checks — each source compresses to 64 hashes,
    // pair cost O(k) instead of q103's vocabulary join.
    "q261_kmv_overlap" -> ((s, d) =>
      Analytics.kmvOverlap(Tables.documents(s, d), "source", "text",
        k = 64)),

    // Zipf frequency spectrum: distinct terms + occurrences per log2
    // frequency bucket — exact power-of-two thresholds, no float log.
    "q260_zipf_profile" -> ((s, d) =>
      Analytics.zipfProfile(Tables.documents(s, d), "text")),

    // Time-to-conversion distribution: first view → first purchase at
    // or after it, day-quantized exact quartiles + p90 with the rate.
    "q259_time_to_convert" -> ((s, d) =>
      Sessions.timeToConversion(eventsUs(s, d), "user_id", "ts_us",
        "event_type", fromType = "view", toType = "purchase")),

    // Binary-segmentation changepoints: q219's single break plus the
    // strongest left/right sub-breaks, each side re-running the exact
    // CUSUM statistic with side-local mass.
    "q258_cusum_segments" -> ((s, d) =>
      Analytics.cusumSegments(eventsUs(s, d), "event_type", "ts_us")),

    // Nested denormalized export: one row per order with its line items
    // as a SORTED array of structs (the JSONL-export shape a training
    // pipeline ships), and the readout is computed FROM the nested form
    // (size / element_at / higher-order aggregate) — proving the
    // build+access round trip, hash-checked against the flat oracle.
    "q257_nested_export" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        struct(col("l_linenumber").cast("long").as("ln"),
          col("l_partkey").cast("long").as("pk"),
          floor(col("l_extendedprice") * 100).cast("long")
            .as("price_cents")).as("item"))
      val nested = li.groupBy("l_orderkey")
        .agg(sort_array(collect_list("item")).as("items"))
      require(nested.schema("items").dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType],
        "export shape must nest items as an array of structs")
      nested.select(col("l_orderkey"),
        size(col("items")).cast("long").as("n_items"),
        col("items").getItem(0).getField("pk").as("first_pk"),
        aggregate(col("items"), lit(0L),
          (acc, it) => acc + it.getField("price_cents")).as("total_cents"))
    }),

    // Personalized PageRank: teleport mass pinned to three seed
    // suppliers on the supplier↔part graph — "parts/suppliers similar
    // to THESE", same integer discipline as q131.
    "q256_ppr" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      val edges = li.select(col("sk").as("src"), col("pk").as("dst"))
        .unionByName(li.select(col("pk").as("src"), col("sk").as("dst")))
      Graph.personalizedPagerank(edges, "src", "dst",
        seeds = Seq(1L, 2L, 3L), iters = 3, topK = 20)
    }),

    // JPEG DQT quality estimate: real marker-walk to the quantization
    // table, exact integer inversion of the IJG scale — ranks re-encoded
    // spam without decoding a pixel. Deterministic synthJpeg fixtures.
    "q255_jpeg_quality" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val q = 1 + (id % 100L).toInt
          val est = multimodal.Binary.jpegDqtQuality(
            multimodal.Binary.synthJpeg(8, 8, q)).getOrElse(-1)
          (q.toLong, est.toLong)
        }.toDF("quality", "quality_est")
        .groupBy("quality", "quality_est")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Split-conformal interval + held-out coverage: q̂ is an exact order
    // statistic over md5-split calibration residuals; coverage audited
    // on the disjoint test half at the 90% target.
    "q254_conformal" -> ((s, d) => {
      val rows = Tables.documents(s, d).select(
        col("doc_id"),
        greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
          lit(10000L)), lit(0L)).cast("long").as("pred"),
        ((col("n_chars") >= 300).cast("long") * 10000L).as("actual"))
      ml.Eval.conformalCoverage(rows, "doc_id", "pred", "actual",
        alphaPpm = 100000L)
    }),

    // ECE + MCE: the calibration table as two exact numbers — the bin
    // denominators cancel, so ECE is ONE floor division over bin sums.
    "q253_ece" -> ((s, d) =>
      ml.Eval.calibrationError(scoredDocs(s, d), "score_q", "label",
        bins = 10, scale = 10000L)),

    // Per-source readability: Flesch ease + FK grade from the documented
    // vowel-group heuristic — two floor divisions per doc, exact milli.
    "q252_readability" -> ((s, d) =>
      Corpus.readabilityProfile(Tables.documents(s, d), "text", "source")),

    // Named refs: tag the first load, stage the second on a branch
    // (invisible to main — gated in-query), fast-forward, then read both
    // the tag snapshot and the promoted main. Oracle replays both legs
    // relationally from orders.
    "q251_refs" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_refs_")
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      ord.filter(col("o_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("append").save()
      graft.sources.WarehouseSink.createTag(dir, "v1")
      graft.sources.WarehouseSink.createBranch(dir, "wip")
      graft.sources.WarehouseSink.appendToBranch(s, dir, "wip",
        ord.filter(col("o_orderkey") % 2 === 1))
      val mainBefore = s.read.format(fmt).option("path", dir).load().count()
      val branchNow = s.read.format(fmt).option("path", dir)
        .option("ref", "wip").load().count()
      require(mainBefore < branchNow,
        s"branch isolation broken: main=$mainBefore branch=$branchNow")
      graft.sources.WarehouseSink.fastForward(dir, "wip")
      def leg(tag: Option[String], name: String) = {
        val r = s.read.format(fmt).option("path", dir)
        tag.foreach(t => r.option("ref", t))
        r.load().agg(count(lit(1)).as("n"),
            sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
              .as("price_cents"))
          .select(lit(name).as("leg"), col("n"), col("price_cents"))
      }
      leg(None, "main").unionAll(leg(Some("v1"), "tag_v1"))
    }),

    // PARTITION EVOLUTION: bucket(4) → bucket(8) as a metadata-only
    // manifest bump — old files keep pruning under the spec each records
    // (#tpartspec), appends land under the new spec, maintain() unifies
    // the layout. In-query partition gates pin both pruning regimes.
    "q250_partition_evolution" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_pevo_")
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      cust.filter(col("c_custkey") % 2 === 0).coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "bucket(4,c_custkey)")
        .mode("overwrite").save()
      graft.sources.WarehouseSink.evolvePartitioning(dir,
        "bucket(8,c_custkey)")
      cust.filter(col("c_custkey") % 2 === 1).coalesce(1)
        .write.format(fmt).option("path", dir).mode("append").save()
      // 4 bucket(4) files + 8 bucket(8) files; a point lookup plans at
      // most one file per spec space (each prunes under ITS OWN spec)
      val probe = s.read.format(fmt).option("path", dir).load()
        .filter(col("c_custkey") === 2L)
      require(probe.rdd.getNumPartitions <= 2,
        s"mixed-spec pruning failed: ${probe.rdd.getNumPartitions} planned")
      // compaction completes the evolution physically: one spec space
      graft.sources.WarehouseSink.maintain(s, dir, keepVersions = 1)
      val probe2 = s.read.format(fmt).option("path", dir).load()
        .filter(col("c_custkey") === 2L)
      require(probe2.rdd.getNumPartitions <= 1,
        s"post-maintain pruning failed: ${probe2.rdd.getNumPartitions}")
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("c_custkey") % 7).as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("c_acctbal") * 100).cast("long"))
            .cast("long").as("bal_cents"))
    }),

    // McNemar paired test: does the quality-score rule beat the plain
    // length rule on the SAME docs — discordant pairs only, exact
    // continuity-corrected statistic in milli.
    "q249_mcnemar" -> ((s, d) => {
      val preds = Tables.documents(s, d).select(
        (greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
          lit(10000L)), lit(0L)) >= 5000L).cast("long").as("p_quality"),
        (T.wordTokens(col("text")) >= 50).cast("long").as("p_length"),
        (col("n_chars") >= 300).cast("long").as("label"))
      ml.Eval.mcnemar(preds, "p_quality", "p_length", "label")
    }),

    // Encoding-damage + character-hygiene audit per source: control
    // chars / U+FFFD / mojibake battery + composition ppms — the
    // pre-curation transcode screen (zeros on a clean corpus ARE the
    // readout; the spec plants damage).
    "q248_encoding_audit" -> ((s, d) =>
      Corpus.encodingAudit(Tables.documents(s, d), "text", "source")),

    // Bucketed-jackknife variance for the A/B mean difference: the
    // delete-one-group standard error real experiment platforms use at
    // scale (replicates from a G-row bucket table, never a resample).
    "q247_jackknife" -> ((s, d) =>
      Experiment.jackknifeDiff(Tables.events(s, d), "user_id",
        "event_type", "value", metricType = "purchase", buckets = 16)),

    // Brier score + Murphy decomposition: the proper-scoring-rule
    // readout over the quantized quality score — REL − RES + UNC with
    // exact quotient/remainder splits, floor drift surfaced as the gap.
    "q246_brier" -> ((s, d) =>
      ml.Eval.brierDecomposition(scoredDocs(s, d), "score_q", "label",
        scale = 10000L)),

    // Binary (sign-bit) quantization ANN: 1 bit/dim packed into 32-bit
    // words, similarity = XOR + popcount — integer-exact end to end, the
    // 32×-compression rung below SQ8/PQ.
    "q244_binary_ann" -> ((s, d) =>
      Quantize.hammingTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 3L, k = 20)),

    // Two-stage binary retrieval: 64-wide Hamming shortlist, exact
    // cosine re-rank — only shortlist rows pay full-precision work.
    "q245_binary_rerank" -> ((s, d) =>
      Quantize.hammingRerankTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 3L, candidates = 64, k = 10)),

    // l-diversity audit: the homogeneity-attack screen k-anonymity
    // misses — nation×segment groups whose customers' balance band is
    // too uniform leak the band even at k-safe group sizes.
    "q241_l_diversity" -> ((s, d) =>
      Analytics.lDiversityRisk(Tables.customer(s, d),
        Seq(col("c_nationkey"), col("c_mktsegment")),
        Seq("nation", "segment"),
        expr("CAST(floor(c_acctbal / 2000) AS BIGINT)"), l = 5L)),

    // Markov removal-effect attribution: the data-driven rung of the
    // attribution family — remove each channel and measure the
    // conversion collapse, ppm-floored power iteration pinned at 8 steps
    // so the DuckDB oracle unrolls the identical arithmetic.
    "q240_markov_attribution" -> ((s, d) =>
      Sessions.markovAttribution(eventsUs(s, d), "user_id", "ts_us",
        "event_id", "event_type", convChannel = "purchase", iters = 8)),

    // Exact isotonic (PAV) calibration WITHOUT the sequential PAV: the
    // minimax identity turns the pooling into prefix sums + a bounded
    // O(points²) pair join + one running-min window — SQL a DuckDB
    // oracle replays bit-for-bit. 201 calibration points (score_q/50).
    "q239_isotonic" -> ((s, d) =>
      ml.Eval.isotonicCalibration(
        scoredDocs(s, d).select(expr("score_q div 50").as("score_pt"),
          col("label")),
        "score_pt", "label", maxPoints = 256L)),

    // The warehouse as a SQL catalog: CREATE TABLE ... PARTITIONED BY
    // (bucket(...)), INSERT INTO, and the aggregate — all through
    // spark.sql against the registered WarehouseCatalog.
    "q237_sql_catalog" -> ((s, d) => {
      useCatalog(s)
      val ns = "c" + (d.hashCode.toLong & 0xffffffffL)
      new java.io.File(catalogRoot, ns).mkdirs()
      s.sql(s"DROP TABLE IF EXISTS graft.$ns.orders_t")
      s.sql(s"CREATE TABLE graft.$ns.orders_t (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
        "PARTITIONED BY (bucket(4, o_custkey))")
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("graft_q237_src")
      s.sql(s"INSERT INTO graft.$ns.orders_t SELECT * FROM graft_q237_src")
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents
                FROM graft.$ns.orders_t GROUP BY o_orderstatus""")
    }),

    // Storage-partitioned join on a bucket TRANSFORM layout — the SPJ
    // family's third rung (q181 identity, q204 multi-column + mismatched
    // value sets, this one hashed buckets): the catalog's bucket function
    // resolves both scans' bucket(4,·) keys, the join AND the per-key
    // aggregate ride the layout, and the in-query gate proves the plan
    // holds zero Exchange.
    "q238_bucket_spj" -> ((s, d) => {
      useCatalog(s)
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val ns = "c" + (d.hashCode.toLong & 0xffffffffL)
      new java.io.File(catalogRoot, ns).mkdirs()
      s.sql(s"DROP TABLE IF EXISTS graft.$ns.ord_b")
      s.sql(s"DROP TABLE IF EXISTS graft.$ns.cust_b")
      s.sql(s"CREATE TABLE graft.$ns.ord_b (o_custkey BIGINT, " +
        "o_totalprice DOUBLE) PARTITIONED BY (bucket(4, o_custkey))")
      s.sql(s"CREATE TABLE graft.$ns.cust_b (c_custkey BIGINT, " +
        "c_mktsegment STRING) PARTITIONED BY (bucket(4, c_custkey))")
      Tables.orders(s, d).select("o_custkey", "o_totalprice")
        .createOrReplaceTempView("graft_q238_o")
      Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        .createOrReplaceTempView("graft_q238_c")
      s.sql(s"INSERT INTO graft.$ns.ord_b SELECT * FROM graft_q238_o")
      s.sql(s"INSERT INTO graft.$ns.cust_b SELECT * FROM graft_q238_c")
      val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = s.sql(
          s"""SELECT o.o_custkey AS custkey, max(c.c_mktsegment) AS segment,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
              FROM graft.$ns.ord_b o JOIN graft.$ns.cust_b c
                ON o.o_custkey = c.c_custkey
              GROUP BY o.o_custkey""")
        require(!q.queryExecution.executedPlan.toString.contains("Exchange"),
          "bucket-transform SPJ must plan zero Exchange")
        // pin the result before the confs are restored below
        Materialize.transient(q)
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
        s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }),

    // Hidden (transform) partitioning: bucket(8, c_custkey) layout, then
    // a point-lookup batch that PROVES the transform pruning in-plan —
    // a hash bucket's raw min/max spans everything, so only the recorded
    // per-file bucket value can prune; the require gates on it.
    "q236_bucket_lookup" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_bkt_")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .coalesce(1)
        .write.format(fmt).option("path", dir)
        .option("partitionBy", "bucket(8,c_custkey)")
        .mode("overwrite").save()
      val keys = Seq(7L, 19L, 83L)
      val q = s.read.format(fmt).option("path", dir).load()
        .filter(col("c_custkey").isin(keys: _*))
      // 8 one-bucket files on disk; ≤3 distinct buckets among the keys —
      // the scan must plan at most that many partitions
      require(q.rdd.getNumPartitions <= 3,
        s"bucket pruning failed: ${q.rdd.getNumPartitions} partitions planned")
      q.select(col("c_custkey"), col("c_name"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_cents"))
    }),

    // EWMA forecast backtest: exponential smoothing made oracle-exact by
    // dyadic weights — S = Σ y_lag·2^(20-lag), forecast = S div (2^20−1),
    // pure integer arithmetic both engines replay bit-for-bit.
    "q235_ewma_backtest" -> ((s, d) =>
      Analytics.ewmaBacktest(eventsUs(s, d), "event_type", "ts_us", 20)),

    // Holt level+trend one-step backtest (α=0.3, β=0.1 in milli): the
    // genuinely sequential per-series fold in micro fixed point, oracle
    // = the identical recursion as a recursive CTE.
    "q360_holt_backtest" -> ((s, d) =>
      Analytics.holtBacktest(eventsUs(s, d), "event_type", "ts_us",
        alphaMilli = 300L, betaMilli = 100L)),

    // Gopher/C4 heuristic curation-rule audit: the published hard-filter
    // battery as a per-source profile — every ratio tested by integer
    // cross-multiplication, so the oracle replays it exactly.
    "q234_curation_rules" -> ((s, d) =>
      Corpus.curationRules(Tables.documents(s, d), "text", "source")),

    // Merge-on-read DELETE: two overlapping deletion-vector deletes (the
    // second merges vectors on shared files), zero data files rewritten,
    // then an aggregate read through the vectors. The CoW twin is q165.
    "q233_mor_delete" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_mordel_")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartitionByRange(8, col("o_orderkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThan, GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.deleteWhereMoR(s, dir,
        Seq(GreaterThan("o_totalprice", 250000.0)))
      graft.sources.WarehouseSink.deleteWhereMoR(s, dir,
        Seq(GreaterThanOrEqual("o_orderkey", 1000L),
          LessThan("o_orderkey", 3000L)))
      // the merge-on-read CONTRACT: both deletes left every file in place
      val hist = graft.sources.WarehouseSink.history(s, dir)
        .select("version", "operation", "n_files")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      require(hist.count(_._2 == "delete_mor") == 2 &&
        hist.map(_._3).distinct.length == 1,
        "MoR delete must not rewrite data files")
      s.read.format(fmt).option("path", dir).load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    }),

    // k-core of the co-purchase graph (sparser 1-in-17 sample so the
    // peel genuinely cascades): the cohesive backbone between q46's
    // components and q209's triangles. Convergence short-circuit is
    // replay-safe (peeling is monotone: a no-op round stays no-op).
    "q229_kcore" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 17 === 0)
        .select(col("l_orderkey").as("graft_o"),
          col("l_partkey").as("graft_i")).distinct()
      val a = items.select(col("graft_o"), col("graft_i").as("pa"))
      val b = items.select(col("graft_o"), col("graft_i").as("pb"))
      val edges = a.join(b, Seq("graft_o"))
        .filter(col("pa") < col("pb")).select("pa", "pb")
      Graph.kCore(edges, "pa", "pb", k = 4, maxRounds = 8)
    }),

    // Cumulative gains / lift by score decile: the campaign-targeting
    // readout over q167's scored substrate — groups-atomic buckets so
    // score ties never split nondeterministically.
    "q226_gains" -> ((s, d) =>
      ml.Eval.gainsChart(scoredDocs(s, d), "score_q", "label", tiles = 10)),

    // PCA projection: exact-integer covariance moments (one map-side
    // typed aggregate) -> driver power iteration -> map-side projection.
    // Rows-only by declared contract (no SQL engine can replay the
    // eigensolve); PcaSpec pins planted-axis recovery and determinism.
    "q227_pca" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val model = ml.Pca.fit(emb, "embedding", dim = 64, k = 2)
      ml.Pca.transform(emb, "vec_id", "embedding", model)
    }),

    // Frame-sample schedule over the real MP4 duration decode: the
    // planning half of video frame extraction, oracle-checked (decode of
    // scheduled frames stays behind the documented codec stand-in).
    "q228_frame_schedule" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          multimodal.Binary.MediaRecord(id, "video",
            multimodal.Binary.synthMp4(
              width = (160 * (1 + id % 8)).toInt,
              height = (120 * (1 + id % 6)).toInt,
              durationUnits = 600 + id % 1000), src)
        }
      multimodal.Binary.frameSchedule(
        multimodal.Binary.extractVideoMeta(media).toDF(),
        "media_id", "duration_ms", stepMs = 400L, maxFrames = 5)
    }),

    // Zero-copy clone: hard-linked files, fresh manifest chain; the two
    // tables then DIVERGE under copy-on-write DML, and the source is
    // VACUUMED after its own DML — the clone's links must keep every
    // shared byte alive (the claim path-based shallow clones can't make).
    "q225_clone" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val W = graft.sources.WarehouseSink
      val src = tempTableDir("graft_clone_")
      val dst = src + "/cl"
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.format(fmt).option("path", src).mode("overwrite").save()
      W.cloneTable(src, dst)
      W.deleteWhere(s, dst, Seq(
        org.apache.spark.sql.sources.GreaterThan("o_totalprice", 300000.0)))
      W.deleteWhere(s, src, Seq(
        org.apache.spark.sql.sources.LessThan("o_totalprice", 50000.0)))
      W.vacuum(src, keepVersions = 1)
      def side(dir: String, tag: String) =
        s.read.format(fmt).option("path", dir).load()
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("o_totalprice") * 100).cast("long"))
              .as("sum_cents"))
          .withColumn("side", lit(tag))
      side(src, "source").unionByName(side(dst, "clone"))
    }),

    // Exact ACF: calendar-lag 1-3 autocorrelation of daily volume per
    // event type — integer deviation products, no sqrt (the n² factors
    // cancel), the forecaster's first readout next to q210's backtest.
    "q218_acf" -> ((s, d) =>
      Analytics.acf(eventsUs(s, d), "event_type", "ts_us", maxLag = 3)),

    // CUSUM changepoint: the day each series' cumulative mean-deviation
    // peaks — "did the level shift, and when", exact integer sweep.
    "q219_cusum" -> ((s, d) =>
      Analytics.cusumChangepoint(eventsUs(s, d), "event_type", "ts_us")),

    // Kendall tau-b over the bounded daily (activity, spend) table —
    // the pair-concordance twin of q203's Spearman.
    "q220_kendall" -> ((s, d) =>
      Analytics.kendallTau(
        Tables.events(s, d)
          .groupBy(expr("(ts div 1000) div 86400000000").as("graft_day"))
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents")),
        "n_events", "cents")),

    // Stratified EXACT-quota split: per source, exactly floor(80%) to
    // train by md5 rank — the per-stratum guarantee q43/q151's
    // independent hashing can only approximate. Readout pins membership
    // (xor of doc ids), not just counts.
    "q221_stratified_split" -> ((s, d) =>
      Corpus.stratifiedSplit(Tables.documents(s, d), "doc_id", "source",
          seed = 7L, trainPct = 80)
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(doc_id)").as("id_xor"))),

    // Blocked fuzzy matching, oracle-checked: levenshtein <= 3 name
    // pairs on the DISTINCT-name substrate (64 names stand in for 20k
    // parts — the dedup discipline), first-token blocking, pair volume
    // recovered by count arithmetic.
    "q222_fuzzy_pairs" -> ((s, d) => {
      val names = Tables.part(s, d).groupBy("p_name")
        .agg(count(lit(1)).as("graft_n"))
      val pairs = Dedup.fuzzyNameMatch(names, "p_name", "p_name", maxDist = 3)
      pairs
        .join(names.select(col("p_name").as("id1"),
          col("graft_n").as("graft_n1")), Seq("id1"))
        .join(names.select(col("p_name").as("id2"),
          col("graft_n").as("graft_n2")), Seq("id2"))
        .select(col("id1").as("name_1"), col("id2").as("name_2"),
          col("dist"), (col("graft_n1") * col("graft_n2")).as("n_pairs"))
    }),

    // TRUE Damerau-Levenshtein pairs (native Lowrance-Wagner
    // expression): swaps cost 1 where plain levenshtein charges 2 —
    // both distances reported side by side so the transposition mass
    // is visible; oracle = DuckDB's own damerau_levenshtein.
    "q367_damerau_pairs" -> ((s, d) => {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val n = Tables.part(s, d).select("p_name").distinct()
        .select(col("p_name"), split(col("p_name"), " ").getItem(0).as("blk"))
      val a = n.select(col("blk"), col("p_name").as("name_1"))
      val b = n.select(col("blk"), col("p_name").as("name_2"))
      a.join(b, Seq("blk")).filter(col("name_1") < col("name_2"))
        .withColumn("dl_dist", ColumnBridge.column(
          graft.functions.DamerauLevenshtein(
            ColumnBridge.expression(col("name_1")),
            ColumnBridge.expression(col("name_2")))).cast("long"))
        .filter(col("dl_dist") <= 3)
        .select(col("name_1"), col("name_2"), col("dl_dist"),
          levenshtein(col("name_1"), col("name_2")).cast("long")
            .as("lev_dist"))
    }),

    // Jaro-Winkler graded fuzzy pairs (native codegen'd expression,
    // first-token blocking): the length-normalized record-linkage score
    // next to q222's levenshtein distance; oracle = DuckDB's own
    // jaro_winkler_similarity, bit-matched at 6 dp.
    "q363_jw_pairs" -> ((s, d) =>
      Dedup.jwNameMatch(Tables.part(s, d).select("p_name").distinct(),
        "p_name", "p_name", minJw = 0.85, maxBlock = 100000L)
        .select(col("id1").as("name_1"), col("id2").as("name_2"),
          col("jw"))),

    // Peak concurrent sessions per day via the sweep-line: the k-way
    // overlap readout a pair join can't produce — capacity planning on
    // top of q38's sessions.
    "q223_peak_concurrency" -> ((s, d) =>
      Sessions.peakConcurrency(
        Sessions.sessionize(eventsUs(s, d), "user_id", "ts_us",
          "event_id", gapUs = 1800L * 1000000L),
        expr("start_us div 86400000000").as("graft_day"),
        "start_us", "end_us")),

    // Time-weighted average value per event type: trapezoid over the
    // irregular event times in exact centi-units — the gauge-stream
    // mean a plain AVG gets wrong.
    "q224_twa" -> ((s, d) =>
      Analytics.timeWeightedAvg(eventsUs(s, d), "event_type", "ts_us",
        "event_id", "value")),

    // Per-source curation funnel: how many documents survive each
    // pipeline stage (raw -> quality gate -> exact dedup -> decontam ->
    // token budget) — the stage-attrition readout published next to the
    // q140 end-to-end build, from the same proven operators.
    "q217_curation_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val isTest = col("doc_id") % 97 === 0
      val train = docs.filter(!isTest)
      val qual = train.filter(T.qualityScore(col("text")) >= 0.5)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("graft_fp").orderBy(col("doc_id").asc)
      val surv = qual
        .withColumn("graft_fp", T.fingerprint(col("text")))
        .withColumn("graft_rk", row_number().over(w))
        .filter(col("graft_rk") === 1)
        .drop("graft_fp", "graft_rk")
      val keep = Corpus.decontaminate(
        docs.filter(isTest).unionByName(surv), "doc_id", "text", isTest, 3)
      val clean = surv.join(keep, Seq("doc_id"), "left_semi")
      val budget = Corpus.tokenBudgetCap(clean, "doc_id", "text",
        "source", 800L)
      def cnt(df: DataFrame, name: String) =
        df.groupBy("source").agg(count(lit(1)).as(name))
      cnt(train, "n_raw")
        .join(cnt(qual, "n_quality"), Seq("source"), "left_outer")
        .join(cnt(surv, "n_dedup"), Seq("source"), "left_outer")
        .join(cnt(clean, "n_clean"), Seq("source"), "left_outer")
        .join(cnt(budget, "n_budget"), Seq("source"), "left_outer")
        .na.fill(0L)
    }),

    // Near-dup threshold sensitivity sweep: how many pairs each Jaccard
    // cutoff would merge — the tuning table a dedup rollout reads before
    // picking its threshold. Rides the memoized q20 pair-stats substrate
    // (the shingle self-join runs once per corpus); integer ppm cutoffs.
    "q216_dedup_sweep" -> ((s, d) => {
      import s.implicits._
      val ts = Seq(200000L, 300000L, 400000L, 500000L, 600000L,
        700000L, 800000L, 900000L).toDF("threshold_ppm")
      pairStats(s, d)
        .withColumn("graft_jac",
          expr("inter * 1000000 div (n1 + n2 - inter)"))
        .crossJoin(broadcast(ts))
        .filter(col("graft_jac") >= col("threshold_ppm"))
        .groupBy("threshold_ppm")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("threshold_ppm")
    }),

    // Perceptual image hashing (aHash): deterministic 16x12 PNGs whose
    // seed collides every 17 docs, hashed through the REAL pixel decode
    // (8x8 sample grid, integer grayscale, strict-above-mean bits) and
    // grouped — the image leg of exact dedup; identical renders hash
    // identically, so group sizes replay arithmetically.
    "q215_image_phash" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val png = multimodal.Binary.synthPng(16, 12, (id % 17L).toInt)
          (id, multimodal.Binary.aHash64(png).getOrElse(-1L))
        }
        .toDF("doc_id", "ahash")
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_images"), min("doc_id").as("min_doc"))
    }),

    // Benchmark-contamination report: per train doc, the ppm of its
    // distinct 3-gram shingles found in the held-out split — the graded
    // audit next to q67's boolean drop.
    "q214_contamination" -> ((s, d) =>
      Corpus.contaminationReport(Tables.documents(s, d), "doc_id", "text",
        isTest = col("doc_id") % 97 === 0, n = 3, topK = 25)),

    // Exact nDCG@10 retrieval eval: per query term, the BM25 ranking's
    // discounted gain vs the ideal gain ordering — integer discount
    // constants (the spec'd log2 table), graded gain = raw tf,
    // ndcg_ppm exact.
    "q213_ndcg" -> ((s, d) =>
      Search.ndcgAtK(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "vector", "slow", "data"), k = 10)),

    // MRR@10 + recall@10: binary relevance (tf >= 2) judged against the
    // BM25 ranking — the remaining legs of the retrieval-eval panel.
    "q344_mrr_recall" -> ((s, d) =>
      Search.mrrRecallAtK(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "vector", "slow", "data"), k = 10,
        minTf = 2)),

    // Matryoshka retrieval agreement: exact top-10 under the full
    // 64-dim embedding vs under its first 16 dims, overlap@k floor-ppm
    // per query — the dimension-truncation eval before shipping shorter
    // vectors.
    "q211_matryoshka" -> ((s, d) =>
      Similarity.prefixDimAgreement(Tables.embeddings(s, d), "vec_id",
        "embedding", queryIds = Seq(0L, 7L, 21L, 42L, 63L), k = 10,
        mDims = 16)),

    // kNN label-noise audit: per label, mean k-neighbor label agreement
    // over a deterministic probe sample + suspect count — the
    // Confident-Learning-style curation screen.
    "q212_label_noise" -> ((s, d) =>
      Similarity.labelAgreement(Tables.embeddings(s, d), "vec_id",
        "embedding", "label", probePred = col("vec_id") % 7 === 0,
        k = 10)),

    // Seasonal-naive forecast backtest: per event type, is the weekly
    // shape predictive — floor-mean same-weekday forecast vs the
    // previous-day naive, exact floor-milli MAEs over observed days.
    "q210_seasonal_backtest" -> ((s, d) =>
      Analytics.seasonalBacktest(eventsUs(s, d), "event_type", "ts_us",
        k = 3)),

    // Triangle counting + local clustering coefficient on the
    // co-purchase graph (parts are neighbors when one order holds both):
    // degree-ordered orientation bounds wedge fan-out at O(sqrt(m)) per
    // node — hub parts can't explode the join — and the result is
    // orientation-independent, so the oracle replays with the simple
    // id-orientation. Any order of >= 3 lines contributes triangles.
    "q209_triangles" -> ((s, d) => {
      // Deterministic part sample (1-in-5): triangle counting is
      // O(wedges) by nature — the sample keeps the bench query's wedge
      // volume proportionate while the operator itself stays general
      // (the same predicate bounds it identically at any scale).
      val items = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("graft_o"),
          col("l_partkey").as("graft_i")).distinct()
      val a = items.select(col("graft_o"), col("graft_i").as("pa"))
      val b = items.select(col("graft_o"), col("graft_i").as("pb"))
      val edges = a.join(b, Seq("graft_o"))
        .filter(col("pa") < col("pb"))
        .select("pa", "pb")
      Graph.triangleStats(edges, "pa", "pb")
        .orderBy(col("n_triangles").desc, col("node").asc)
        .limit(50)
    }),

    // Newman modularity of the brand partition over the part
    // co-purchase graph (q209's sampled edge substrate): per-brand
    // intra-edge mass vs the degree-preserving random expectation, in
    // exact integer ppm — the quality readout any community detection
    // or attribute grouping gets scored with.
    "q354_modularity" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 5 === 0)
        .select(col("l_orderkey").as("graft_o"),
          col("l_partkey").as("graft_i")).distinct()
      val a = items.select(col("graft_o"), col("graft_i").as("pa"))
      val b = items.select(col("graft_o"), col("graft_i").as("pb"))
      val edges = a.join(b, Seq("graft_o"))
        .filter(col("pa") < col("pb"))
        .select("pa", "pb").distinct()
      Graph.modularity(edges, "pa", "pb",
        Tables.part(s, d).filter(col("p_partkey") % 5 === 0),
        "p_partkey", "p_brand")
    }),

    // CDF-DRIVEN incremental aggregate maintenance — the composition the
    // row-level feed exists for: an aggregate view starts from the v0
    // snapshot and folds ONLY the change images of the q205 DML chain
    // (insert/update_postimage add, delete/update_preimage retract);
    // the result must equal the ground-truth aggregate over the FINAL
    // table state, which the oracle reconstructs relationally. The view
    // never rescans the table — per-DML cost is O(changed rows).
    "q208_cdf_refresh" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_cdfr_")
      graft.sources.WarehouseSink.enableChangeFeed(dir)
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.format(fmt).option("path", dir).mode("overwrite").save() // v0
      graft.sources.WarehouseSink.deleteWhere(s, dir,
        Seq(org.apache.spark.sql.sources.GreaterThan("o_totalprice",
          450000.0))) // v1
      graft.sources.WarehouseSink.updateWhere(s, dir,
        Seq(org.apache.spark.sql.sources.LessThan("o_totalprice", 50000.0)),
        Map("o_orderstatus" -> lit("X"))) // v2
      graft.sources.WarehouseSink.merge(s, dir,
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"), lit("M").as("o_orderstatus"),
            col("o_totalprice")),
        Seq("o_orderkey")) // v3
      val cents = floor(col("o_totalprice") * 100).cast("long")
      val base = s.read.format(fmt).option("path", dir)
        .option("versionAsOf", "0").load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("graft_n"), sum(cents).as("graft_c"))
      val deltas = graft.sources.WarehouseSink.tableChanges(s, dir, 0L, 3L)
        .withColumn("graft_sign",
          when(col("_change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L))
        .groupBy("o_orderstatus")
        .agg(sum(col("graft_sign")).as("graft_dn"),
          sum(col("graft_sign") * cents).as("graft_dc"))
      base.join(deltas, Seq("o_orderstatus"), "full_outer")
        .select(col("o_orderstatus"),
          (coalesce(col("graft_n"), lit(0L)) +
            coalesce(col("graft_dn"), lit(0L))).as("n_orders"),
          (coalesce(col("graft_c"), lit(0L)) +
            coalesce(col("graft_dc"), lit(0L))).as("sum_cents"))
        .filter(col("n_orders") > 0)
    }),

    // Filtered search INSIDE the index probe: q195's pre-filter semantics
    // with q61's exactness-guaranteed cell pruning — the predicate runs
    // below scoring in every probed cell, so the result provably equals
    // pre-filtered brute force (the oracle) while the scan still reads
    // only the cells the bound admits (probe-count spec-pinned).
    "q207_filtered_ivf" -> ((s, d) =>
      Similarity.ivfTopKExactFiltered(ivfIdx(s, d), "vec_id", "embedding",
        queryId = 7L, k = 10, predicate = col("label") === 1)),

    // REAL PNG pixel pipeline (no stub): deterministic 8-bit truecolor
    // PNGs synthesized per doc with ROTATING row filters (all five types
    // land across the corpus), nearest-neighbor resized to 6x4 through
    // the Inflater+unfilter decode path, re-encoded, RE-decoded — the
    // corner pixels are integer functions of doc_id the oracle replays,
    // so a hash match proves the full zlib+filter codec round trip.
    "q206_png_resize" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("source")).as[(Long, String)]
        .map { case (id, src) =>
          multimodal.Binary.MediaRecord(id, "image",
            multimodal.Binary.synthPng(
              width = (10 + (id % 7) * 2).toInt,
              height = (8 + (id % 5) * 2).toInt,
              seed = (id % 97).toInt), src)
        }
      multimodal.Binary.resizeImages(media, outW = 6, outH = 4)
        .map { r =>
          multimodal.Binary.pngDecode(r.bytes) match {
            case Some((w, h, px)) =>
              def at(x: Int, y: Int, c: Int): Int = px((y * w + x) * 3 + c) & 0xff
              (r.media_id, w, h, at(0, 0, 0), at(0, 0, 1), at(0, 0, 2),
                at(w - 1, h - 1, 0), at(w - 1, h - 1, 1), at(w - 1, h - 1, 2))
            case None => (r.media_id, -1, -1, -1, -1, -1, -1, -1, -1)
          }
        }
        .toDF("media_id", "width", "height", "first_r", "first_g", "first_b",
          "last_r", "last_g", "last_b")
    }),

    // Row-level change data feed through the DML triad: a CDF-enabled
    // warehouse table takes a DELETE, an UPDATE, and a MERGE;
    // tableChanges(0, 3) replays every change IMAGE (delete /
    // update_preimage / update_postimage / insert) from the captured
    // change files — never a generation diff — and the readout
    // aggregates images per (version, type). The oracle reconstructs
    // the same images relationally from the op definitions.
    "q205_change_feed" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_cdfq_")
      graft.sources.WarehouseSink.enableChangeFeed(dir)
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.format(fmt).option("path", dir).mode("overwrite").save() // v0
      graft.sources.WarehouseSink.deleteWhere(s, dir,
        Seq(org.apache.spark.sql.sources.GreaterThan("o_totalprice",
          450000.0))) // v1
      graft.sources.WarehouseSink.updateWhere(s, dir,
        Seq(org.apache.spark.sql.sources.LessThan("o_totalprice", 50000.0)),
        Map("o_orderstatus" -> lit("X"))) // v2
      graft.sources.WarehouseSink.merge(s, dir,
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"), lit("M").as("o_orderstatus"),
            col("o_totalprice")),
        Seq("o_orderkey")) // v3
      graft.sources.WarehouseSink.tableChanges(s, dir, 0L, 3L)
        .groupBy(col("_commit_version").as("v"),
          col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"),
          sum((col("o_orderstatus") === "X").cast("long")).as("n_x"),
          sum((col("o_orderstatus") === "M").cast("long")).as("n_m"))
    }),

    // Two-column storage-partitioned join with MISMATCHED value sets:
    // both warehouse tables laid out one-file-per-(status, priority)
    // tuple; the right side holds only non-'P' tuples, so a zero-
    // Exchange join needs pushPartValues (Spark pads the missing
    // groups). The shuffle-free plan itself is spec-asserted in
    // WarehouseSinkSpec; this query hash-checks the joined result
    // against a plain relational replay. The two bucketing confs are
    // session-safe: they only activate on DSv2 scans that REPORT
    // KeyGroupedPartitioning — exactly the warehouse layout.
    "q204_spj_multicol" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      val aDir = tempTableDir("graft_spja_")
      val bDir = tempTableDir("graft_spjb_")
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_totalprice"))
        .write.format(fmt).option("path", aDir)
        .option("partitionBy", "o_orderstatus,o_orderpriority")
        .mode("overwrite").save()
      Tables.orders(s, d).filter(col("o_orderstatus") =!= "P")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_right"))
        .write.format(fmt).option("path", bDir)
        .option("partitionBy", "o_orderstatus,o_orderpriority")
        .mode("overwrite").save()
      val a = s.read.format(fmt).option("path", aDir).load()
      val b = s.read.format(fmt).option("path", bDir).load()
      a.join(b, Seq("o_orderstatus", "o_orderpriority"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_cents"),
          max("n_right").as("n_right"))
    }),

    // Spearman: do more-active users spend monotonically more — rank
    // correlation of per-user event count vs centi-spend, exact
    // midranks, q84's bit-stable assembly.
    "q203_spearman" -> ((s, d) =>
      Analytics.spearman(
        Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents")),
        "n_events", "cents")),

    // Conversion by session ordinal: does the first visit or a later one
    // convert — gap-sessions, per-user ordinal (5+ tail bucket),
    // floor-ppm rates.
    "q202_session_conversion" -> ((s, d) =>
      Sessions.conversionBySessionOrdinal(eventsUs(s, d), "user_id",
        "ts_us", "event_id", "event_type", convType = "purchase",
        gapUs = 1800L * 1000000L, maxOrdinal = 4)),

    // Market-basket pairs: co-purchased parts by support + integer lift
    // — pair fan-out bounded by basket size (≤7 lines per order), never
    // the corpus.
    "q201_basket_pairs" -> ((s, d) =>
      Analytics.basketPairs(Tables.lineitem(s, d), "l_orderkey",
        "l_partkey", minSupport = 2L, k = 20)),

    // The stats panel: five one-row testing readouts (attribution rate,
    // AUC, CUPED adjusted diff, ANOVA η², KS distance) unioned into one
    // labeled metrics table — the dashboard row a pipeline health check
    // publishes per run; its oracle composes the members' proven SQL.
    "q200_stats_panel" -> ((s, d) => {
      def one(metric: String, df: DataFrame, valueCol: String): DataFrame =
        df.select(lit(metric).as("metric"), col(valueCol).as("value_ppm"))
      Seq(
        one("attr_ppm",
          Sessions.lastTouchAttribution(eventsUs(s, d), "user_id", "ts_us",
            "event_id", "event_type", "view", "purchase",
            7L * 86400L * 1000000L), "attr_ppm"),
        one("auc_ppm", ml.Eval.rocAuc(scoredDocs(s, d), "score_q", "label"),
          "auc_ppm"),
        one("cuped_adj_diff_ppm",
          Experiment.cuped(eventsUs(s, d), "user_id", "event_type", "value",
            "ts_us", "purchase", 1705363200000000L), "adj_diff_ppm"),
        one("eta2_ppm",
          Analytics.varianceDecomposition(Tables.events(s, d), "event_type",
            "value"), "eta2_ppm"),
        one("ks_ppm",
          Analytics.ksTest(
            Tables.events(s, d).filter(col("event_type") === "purchase"),
            substring(md5(col("user_id").cast("string")), 1, 1) < "8",
            "value"), "ks_ppm"))
        .reduce(_ unionByName _)
    }),

    // Two-sample KS distance between the hash arms' purchase values:
    // did the DISTRIBUTION shift, not just the mean — exact D in ppm.
    "q198_ks_test" -> ((s, d) =>
      Analytics.ksTest(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        sideCol = substring(md5(col("user_id").cast("string")), 1, 1) < "8",
        "value")),

    // Chi-square independence of event type × weekday: the categorical
    // sibling of q196, exact floor-milli per contingency cell.
    "q197_chi_square" -> ((s, d) =>
      Analytics.chiSquare(
        Tables.events(s, d)
          .select(col("event_type"), (dayofweek(col("ts_t")) - 1).as("dow")),
        "event_type", "dow")),

    // Benford first-significant-digit profile of order totals: observed
    // digit shares in floor-ppm next to the Benford expectation — the
    // classic forensic screen for fabricated numerics.
    "q192_benford" -> ((s, d) =>
      Tables.orders(s, d)
        .select(regexp_extract(col("o_totalprice").cast("string"),
          "[1-9]", 0).as("digit"))
        .filter(col("digit") =!= "")
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .withColumn("share_ppm",
          expr("n * 1000000 div sum(n) OVER ()"))),
  )

  /** Shared scored table for the eval-metric queries (q167-q169): the
    * heuristic quality score quantized to a 1e4 integer scale, labeled by
    * a deterministic length rule (n_chars ≥ 300 — correlated with the
    * length-saturation term of the score, so the AUC is a real signal,
    * not a coin flip). Deterministic on both engines → every metric
    * hash-checks. */
  private def scoredDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      // Clamped to [0, 10⁴]: the punctuation penalty can push the raw
      // score slightly negative, and `div` truncates toward zero — floor
      // parity across engines is only guaranteed on nonnegative operands.
      greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
        lit(10000L)), lit(0L)).cast("long").as("score_q"),
      (col("n_chars") >= 300).cast("long").as("label"))

  /** Events with the shared-grain µs timestamp column (see q38-q40 note). */
  /** One catalog root per JVM: the catalog caches its root at first
    * initialization, so every query must hand it the same directory —
    * per-sfDir isolation comes from the namespace instead. */
  private lazy val catalogRoot: String = tempTableDir("graft_cat_root_")

  private def useCatalog(s: SparkSession): Unit = {
    s.conf.set("spark.sql.catalog.graft", "graft.sources.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.graft.root", catalogRoot)
  }

  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts_us", expr("ts div 1000"))

  /** Pair shingle-intersection stats shared by the exact near-dup family —
    * q20 (Jaccard), q46 (clusters), q53 (containment) — memoized per
    * (session, scale dir): one shingle self-join serves all three (the
    * stats table is the natural pipeline handoff, tiny vs the corpus).
    * pairShingleStats materializes its output via localCheckpoint, so the
    * memo holds a computed artifact, not a pinned cache; [[releaseCaches]]
    * (or GC after the session drops) frees the blocks. Keying by session
    * keeps a restarted session from receiving plans bound to a stopped one. */
  private val pairStatsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def pairStats(s: SparkSession, d: String): DataFrame =
    pairStatsCache.getOrElseUpdate((s, d),
      Dedup.pairShingleStats(Tables.documents(s, d), "doc_id", "text", 3))
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardFromStats(pairStats(s, d), minJaccard = 0.2)

  /** Portable-LSH pair set shared by q82 (the pairs themselves), q118
    * (banding quality) and q194 (the source matrix): the md5 signature
    * build + band join runs once per (session, dir) — the operator
    * already returns an eager artifact, so the memo hands out computed
    * rows, not a plan to replay. */
  private val portablePairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def portableMinhashPairs(s: SparkSession, d: String): DataFrame =
    portablePairsCache.getOrElseUpdate((s, d),
      Dedup.minhashPairsPortable(Tables.documents(s, d), "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 2, minAgree = 0.5))

  /** Cluster labels shared by q46 (the raw clusters) and q100 (the
    * quality-canonical pick): connected() is an iterative job — one run
    * per sweep, memoized as the materialized artifact it returns. */
  private val clustersCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def clusterLabels(s: SparkSession, d: String): DataFrame =
    clustersCache.getOrElseUpdate((s, d),
      Components.connected(jaccardPairs(s, d), "id1", "id2")
        .select(col("id").as("doc_id"), col("cluster")))

  /** BPE merge table shared by q145 (the learned merges) and q146 (the
    * encode readout), memoized per (session, dir): the learning rounds'
    * outputs are one-row materialized artifacts, so the memo holds a
    * computed result, never a pinned corpus cache. */
  private val bpeMergeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def bpeMergeTable(s: SparkSession, d: String): DataFrame =
    bpeMergeCache.getOrElseUpdate((s, d),
      Vocab.bpeMerges(Tables.documents(s, d), "text", merges = 4))

  /** Bucketed fp store backing q81, built once per (session, scale dir):
    * distinct fingerprints of the corpus third with doc_id % 3 == 0,
    * written `bucketBy(shuffle-partitions, fp)` so the incremental
    * anti-join's store side scans its buckets without an Exchange — the
    * exact layout [[graft.streaming.IncrementalIngest]] maintains
    * continuously, here as a deterministic batch artifact the DuckDB
    * oracle can replay. Returns the catalog table name. */
  private val fpStoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def fpStoreTable(s: SparkSession, d: String): String =
    fpStoreCache.getOrElseUpdate((s, d), {
      val tbl = "graft_q81_store_" + (d.hashCode.toLong & 0xffffffffL).toString
      val buckets = s.sessionState.conf.numShufflePartitions
      // A previous JVM's warehouse dir would make the CREATE path of
      // saveAsTable fail (fresh in-memory catalog + surviving location).
      operators.Etl.resetManagedTable(s, tbl)
      Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
        .distinct()
        .write.mode("overwrite").bucketBy(buckets, "fp").sortBy("fp")
        .saveAsTable(tbl)
      tbl
    })

  /** Bucketed LSH signature store backing q147 — the q81 layout for the
    * NEAR-dup family: the ingested third's (id, band, bk) band table
    * bucketed on (band, bk) (the candidate probe's join key) and its
    * (id, sig) signature table bucketed on id (the verify join's key),
    * both from the portable md5 signature stage so the DuckDB oracle
    * replays the whole incremental path. */
  private val lshStoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]
  private def lshStoreTables(s: SparkSession, d: String): (String, String) =
    lshStoreCache.getOrElseUpdate((s, d), {
      val suffix = (d.hashCode.toLong & 0xffffffffL).toString
      val bandTbl = "graft_q147_bands_" + suffix
      val sigTbl = "graft_q147_sigs_" + suffix
      val buckets = s.sessionState.conf.numShufflePartitions
      operators.Etl.resetManagedTable(s, bandTbl)
      operators.Etl.resetManagedTable(s, sigTbl)
      val (banded, sig) = Dedup.minhashStoreTables(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text", n = 3, bands = 8, rowsPerBand = 2)
      banded.write.mode("overwrite")
        .bucketBy(buckets, "band", "bk").saveAsTable(bandTbl)
      sig.write.mode("overwrite")
        .bucketBy(buckets, "id").saveAsTable(sigTbl)
      (bandTbl, sigTbl)
    })

  /** Bucketed sign-cell store backing q154 — the q147 layout for the
    * SEMANTIC family: the ingested third's (bk, id, v, nrm) cell table
    * bucketed on bk (the probe join's key), built by the same
    * [[Dedup.semanticStoreTable]] stage [[graft.streaming.SemanticIngest]]
    * maintains continuously. Returns the catalog table name. */
  private val semStoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def semanticStoreTable(s: SparkSession, d: String): String =
    semStoreCache.getOrElseUpdate((s, d), {
      val tbl = "graft_q154_cells_" + (d.hashCode.toLong & 0xffffffffL).toString
      val buckets = s.sessionState.conf.numShufflePartitions
      operators.Etl.resetManagedTable(s, tbl)
      Dedup.semanticStoreTable(
        Tables.embeddings(s, d).filter(pmod(col("vec_id"), lit(3)) === 0),
        "vec_id", "embedding", signBits = 4)
        .write.mode("overwrite").bucketBy(buckets, "bk").saveAsTable(tbl)
      tbl
    })

  /** Parquet store + bloom sidecar for q97, memoized per (session, dir):
    * documents written as 16 files NOT organized by doc_id (the sidecar's
    * whole point — equality skipping on a column with no layout help),
    * then one distributed pass builds a per-file bloom. The sidecar is
    * O(nFiles); the probe reads the sidecar, then only candidate files.
    * BloomIndexSpec holds the ≤3-of-16 pruning + no-false-negative bars;
    * this store makes the end-to-end lookup an oracle-checked row. */
  private val bloomStoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]
  private def bloomStorePaths(s: SparkSession, d: String): (String, String) =
    bloomStoreCache.getOrElseUpdate((s, d), {
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q97_" + (d.hashCode.toLong & 0xffffffffL)).getAbsolutePath
      val store = s"$base/store"; val side = s"$base/sidecar"
      Tables.documents(s, d).select("doc_id", "source", "n_chars")
        .repartition(16).write.mode("overwrite").parquet(store)
      // Sized to the store's actual per-file rows: the aggregator
      // allocates a zero-bloom per (file × input partition), so an
      // oversized `expectedPerFile` multiplies build allocations for no
      // fpp gain. Real deployments size this to rows-per-file.
      sources.BloomIndex.build(s, store, side, "doc_id",
        expectedPerFile = 20000L)
      (store, side)
    })

  /** Text store + TERM bloom sidecar for q270, memoized like the q97
    * store: 16 files not organized by content, one term-bloom per file.
    * TermIndexSpec holds the locality-pruning and no-false-negative
    * bars; this store makes the end-to-end search an oracle-checked
    * row set. */
  private val termStoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]
  private def termStorePaths(s: SparkSession, d: String): (String, String) =
    termStoreCache.getOrElseUpdate((s, d), {
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q270_" + (d.hashCode.toLong & 0xffffffffL)).getAbsolutePath
      val store = s"$base/store"; val side = s"$base/sidecar"
      Tables.documents(s, d).select("doc_id", "source", "text")
        .repartition(16).write.mode("overwrite").parquet(store)
      sources.TermIndex.build(s, store, side, "text",
        expectedPerFile = 20000L)
      (store, side)
    })

  /** Range-clustered store + zone-map sidecar for q124, memoized per
    * (session, dir) like the bloom store: the layout is what makes the
    * min/max intervals disjoint enough to prune. */
  private val zoneStoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]
  private def zoneStorePaths(s: SparkSession, d: String): (String, String) =
    zoneStoreCache.getOrElseUpdate((s, d), {
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_q124_" + (d.hashCode.toLong & 0xffffffffL)).getAbsolutePath
      val store = s"$base/store"; val side = s"$base/sidecar"
      Etl.writeRangeLayout(Tables.documents(s, d)
        .select("doc_id", "source", "n_chars"),
        store, nFiles = 16, rangeCol = "n_chars", "doc_id")
      sources.ZoneMapIndex.build(s, store, side, Seq("n_chars"))
      (store, side)
    })

  /** Drop every memoized substrate (pair stats, RF fits) so their blocks
    * and models become collectable — drivers call this once their query
    * sweep is done. */
  /** Drop only the ML-FIT memos (RF family, the q26 clustering) — the
    * bench's median-of-3 repeats call this between repetitions so every
    * sample pays the real fit instead of a memo hit, while the shared
    * non-ML substrates (pair stats, LSH stores, IVF/PQ indexes) keep
    * their build-once contract. The last repetition repopulates the
    * memos, so downstream sharers (q28/q62/q63) keep their warm path. */
  def releaseMlCaches(): Unit = {
    rfCache.clear()
    clusterCache.clear()
  }

  /** Duplicated-span table at the k=8 contract point, shared by q325
    * (the raw spans), q326 (per-doc rollup), q342 (per-source decision
    * table) and q350 (the rewrite): the detection pass — tokenize, gram
    * explode, two-phase df count, island merge — runs ONCE per
    * (session, dir) and hands out a localCheckpoint'd artifact (span
    * rows are corpus-duplication-sized, tiny next to the corpus). */
  private val spanCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def dupSpans8(s: SparkSession, d: String): DataFrame =
    spanCache.getOrElseUpdate((s, d), operators.Materialize.transient(
      Dedup.dupSpans(Tables.documents(s, d), "doc_id", "text", k = 8)))

  def releaseCaches(): Unit = {
    spanCache.clear()
    bloomStoreCache.clear()
    zoneStoreCache.clear()
    termStoreCache.clear()
    clustersCache.clear()
    fpStoreCache.clear()
    lshStoreCache.clear()
    bpeMergeCache.clear()
    pairStatsCache.clear()
    portablePairsCache.clear()
    rfCache.clear()
    clusterCache.clear()
    ivfCache.values.foreach(_.release())
    ivfCache.clear()
    pqCache.values.foreach(_.release())
    pqCache.clear()
    ivfPqCache.values.foreach(_.release())
    ivfPqCache.clear()
  }

  /** Clustered parts shared by q26/q62/q63, memoized per (session, dir):
    * ONE KMeans fit serves the single-item, multi-item and composed
    * recommendation queries. localCheckpoint materializes the (tiny —
    * one row per item) clustered table eagerly, so the three consumers
    * share one FIT and one MATERIALIZATION — without it the memo hands out
    * a plan and every consumer's first action replays the prep+transform
    * chain. */
  private val clusterCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def clusteredParts(s: SparkSession, d: String): DataFrame =
    clusterCache.getOrElseUpdate((s, d),
      ml.Recommend.clusterItems(Tables.part(s, d),
        "p_partkey", "p_brand", Seq("p_retailprice", "p_size"))
        .localCheckpoint(true))

  /** One IVF index shared by q32 (recall-probe) and q61 (exact-probe),
    * memoized per (session, dir): the KMeans cell fit runs once per sweep.
    * The index pins its feature-projection cache while live —
    * [[releaseCaches]] calls release() on every entry. */
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Similarity.IvfIndex]
  private def ivfIdx(s: SparkSession, d: String): Similarity.IvfIndex =
    ivfCache.getOrElseUpdate((s, d),
      Similarity.ivfIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        nLists = 16))

  /** PQ index for q70, memoized per (session, dir) with the same release
    * contract as the IVF index. */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Similarity.PqIndex]
  private def pqIdx(s: SparkSession, d: String): Similarity.PqIndex =
    pqCache.getOrElseUpdate((s, d),
      Similarity.pqIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64))

  /** Composed IVF-PQ index for q327, memoized like its two parents. */
  private val ivfPqCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Similarity.IvfPqIndex]
  private def ivfPqIdx(s: SparkSession, d: String): Similarity.IvfPqIndex =
    ivfPqCache.getOrElseUpdate((s, d),
      Similarity.ivfPqIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, nLists = 16, m = 8, k = 32))

  /** RF fit shared by q27/q28, memoized per (session, scale dir). Trained
    * on a deterministic 5% key-sampled slice so CV tuning stays bounded. */
  private val rfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), ml.Popularity.Fit]
  private def rfFit(s: SparkSession, d: String): ml.Popularity.Fit =
    rfCache.getOrElseUpdate((s, d), {
      val sample = Tables.lineitem(s, d)
        .filter(pmod(col("l_orderkey"), lit(40)) === 0)
        .select("l_quantity", "l_discount", "l_tax", "l_extendedprice")
      ml.Popularity.train(sample,
        Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    })

  /** The q25 random-projection oracle, generated: the hyperplane weights
    * sin(i·(j+1)) are plain doubles computed once here and embedded as
    * shortest-round-trip literals, so DuckDB reproduces the EXACT bucket
    * assignment (list_dot_product folds left-to-right like Spark's
    * `aggregate`, and Double.toString literals parse back to the identical
    * bits). That turns the "probabilistic" candidate set deterministic
    * across engines and lets the full (vec_id, cos) result hash-match. */
  /** q349's oracle: the q325 span replay templated per anchor length k
    * and UNION ALL'd — the sweep IS three independent replays. */
  private def spanSweepOracleSql: String =
    Seq(6, 8, 12).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k, docs_touched, total_spans,
                covered_tokens
         FROM (
           WITH t AS (SELECT doc_id,
                    string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
             FROM documents),
           g AS (SELECT doc_id, i - 1 AS p,
                        array_to_string(toks[i:i+${k - 1}], ' ') AS gram
                 FROM (SELECT doc_id, toks,
                              unnest(range(1, greatest(len(toks) - ${k - 1}, 0) + 1)) AS i
                       FROM t WHERE len(toks) >= $k)),
           sh AS (SELECT gram FROM
                    (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                  WHERE nd >= 2),
           cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
           isl AS (SELECT doc_id, p,
                     CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                            OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + $k
                          THEN 1 ELSE 0 END AS ns
                   FROM cov),
           sp AS (SELECT doc_id, p,
                    sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS sid
                  FROM isl),
           spans AS (SELECT doc_id, max(p) + $k - min(p) AS slen
                     FROM sp GROUP BY doc_id, sid)
           SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_touched,
                  CAST(count(*) AS BIGINT) AS total_spans,
                  CAST(coalesce(sum(slen), 0) AS BIGINT) AS covered_tokens
           FROM spans)"""
    }.mkString("\nUNION ALL\n")

  private def q25OracleSql: String = {
    def weights(j: Int): String =
      (0 until 64).map(i => java.lang.Double.toString(math.sin(i.toDouble * (j + 1))))
        .mkString("[", ", ", "]")
    val bits = (0 until 4).map { j =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${weights(j)}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("\n                + ")
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                $bits AS bk
         FROM embeddings),
         q AS (SELECT v AS qv, bk AS qbk FROM b WHERE vec_id = 0)
         SELECT vec_id,
                round(list_dot_product(v, qv)
                      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM b, q WHERE bk = qbk AND vec_id <> 0
         ORDER BY cos DESC, vec_id LIMIT 20"""
  }

  /** The q129 oracle: KMeansLite's three Lloyd iterations UNROLLED as SQL
    * CTE stages. Everything stays on the integer grid (exact distances,
    * floor-divided centroid updates), so assignment, tiebreak, and every
    * centroid coordinate replay bit-exactly — the iteration count is the
    * only thing the oracle has to agree on with the Scala loop. */
  private def q129OracleSql: String = {
    def assignCte(a: String, c: String) =
      s"""$a AS (SELECT id, f1, f2, j FROM (
            SELECT f.id, f.f1, f.f2, c.j,
                   row_number() OVER (PARTITION BY f.id
                     ORDER BY (f.f1 - c.cx) * (f.f1 - c.cx)
                            + (f.f2 - c.cy) * (f.f2 - c.cy), c.j) AS rn
            FROM f CROSS JOIN $c c) WHERE rn = 1)"""
    def updateCte(c: String, prev: String, a: String) =
      s"""$c AS (SELECT p.j,
                   CAST(COALESCE(g.sx // g.n, p.cx) AS BIGINT) AS cx,
                   CAST(COALESCE(g.sy // g.n, p.cy) AS BIGINT) AS cy
            FROM $prev p LEFT JOIN (SELECT j, sum(f1) AS sx, sum(f2) AS sy,
                                           count(*) AS n FROM $a GROUP BY j) g
              ON p.j = g.j)"""
    s"""WITH f AS (SELECT p_partkey AS id,
                CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS f1,
                CAST(p_size * 10000 AS BIGINT) AS f2 FROM part),
       c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS j,
                     f1 AS cx, f2 AS cy
              FROM (SELECT * FROM f ORDER BY id LIMIT 4)),
       ${assignCte("a1", "c0")},
       ${updateCte("c1", "c0", "a1")},
       ${assignCte("a2", "c1")},
       ${updateCte("c2", "c1", "a2")},
       ${assignCte("a3", "c2")},
       ${updateCte("c3", "c2", "a3")},
       ${assignCte("a4", "c3")},
       sz AS (SELECT j, CAST(count(*) AS BIGINT) AS n FROM a4 GROUP BY j)
       SELECT c3.j AS cluster, COALESCE(sz.n, 0) AS n, c3.cx, c3.cy
       FROM c3 LEFT JOIN sz ON c3.j = sz.j"""
  }

  /** The q145 oracle: 4 BPE merge rounds UNROLLED as SQL CTE stages
    * (q129's discipline). Pair weights are exact integer sums, the winner
    * is the (weight DESC, pair ASC) total order, and the merge rewrite is
    * the same space-padded leftmost non-overlapping `replace` the Scala
    * loop applies — so every round's winner and rewritten vocab replay
    * bit-exactly. */
  private def q145OracleSql: String = {
    def round(k: Int, wPrev: String) =
      s"""p$k AS (SELECT pair, CAST(sum(n) AS BIGINT) AS weight
            FROM (SELECT s.syms[i] || ' ' || s.syms[i + 1] AS pair, s.n
                  FROM (SELECT string_split(sym, ' ') AS syms, n,
                               unnest(range(1, len(string_split(sym, ' ')))) AS i
                        FROM $wPrev) s)
            GROUP BY pair),
          b$k AS (SELECT $k AS merge_idx, pair,
                         replace(pair, ' ', '') AS merged, weight
                  FROM p$k ORDER BY weight DESC, pair ASC LIMIT 1),
          w$k AS (SELECT trim(replace(' ' || w.sym || ' ',
                                      ' ' || b.pair || ' ',
                                      ' ' || b.merged || ' ')) AS sym, w.n
                  FROM $wPrev w, b$k b)"""
    s"""WITH w0 AS (SELECT array_to_string(string_split(w, ''), ' ') AS sym,
                  CAST(count(*) AS BIGINT) AS n
           FROM (SELECT unnest(string_split(lower(trim(
                          regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
                 FROM documents)
           WHERE length(w) > 0
           GROUP BY 1),
       ${round(1, "w0")},
       ${round(2, "w1")},
       ${round(3, "w2")},
       ${round(4, "w3")}
       SELECT merge_idx, pair, merged, weight FROM b1
       UNION ALL SELECT merge_idx, pair, merged, weight FROM b2
       UNION ALL SELECT merge_idx, pair, merged, weight FROM b3
       UNION ALL SELECT merge_idx, pair, merged, weight FROM b4"""
  }

  /** The q146 oracle: q145's four learning rounds (same CTEs) plus the
    * per-source encode — the k merges applied in learned order as nested
    * scalar-subquery replaces over the per-source word table. */
  private def q146OracleSql: String = {
    val learning = q145OracleSql
      .substring(0, q145OracleSql.indexOf("SELECT merge_idx"))
      .trim.stripSuffix(",")
    val rewritten = (1 to 4).foldLeft("sym") { (e, k) =>
      s"trim(replace(' ' || $e || ' ', ' ' || (SELECT pair FROM b$k) || ' ', ' ' || (SELECT merged FROM b$k) || ' '))"
    }
    s"""$learning,
       ws AS (SELECT source, array_to_string(string_split(w, ''), ' ') AS sym,
                     CAST(count(*) AS BIGINT) AS n
              FROM (SELECT source, unnest(string_split(lower(trim(
                             regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
                    FROM documents)
              WHERE length(w) > 0
              GROUP BY 1, 2),
       enc AS (SELECT source, n,
                      len(string_split(sym, ' ')) * n AS tc,
                      len(string_split($rewritten, ' ')) * n AS tb
               FROM ws)
       SELECT source, CAST(sum(n) AS BIGINT) AS n_words,
              CAST(sum(tc) AS BIGINT) AS tokens_chars,
              CAST(sum(tb) AS BIGINT) AS tokens_bpe,
              CAST((sum(tc) - sum(tb)) * 1000000 // sum(tc) AS BIGINT)
                AS saved_ppm
       FROM enc GROUP BY source"""
  }

  /** The q131 oracle: PageRank's three integer-arithmetic iterations
    * unrolled as SQL CTE stages (q129's discipline). DuckDB `//` and
    * Spark `div` agree on floor division for the all-positive ranks, so
    * every micro-unit rank replays exactly; HUGEINT intermediates cast
    * back to BIGINT at each stage. */
  private def q256OracleSql: String = {
    val seedIn = "(1, 2, 3)"
    def iter(m: String, rPrev: String, r: String) =
      s"""$m AS (SELECT e.dst AS node, sum(r.rank // dg.deg) AS s
            FROM e JOIN $rPrev r ON e.src = r.node
                   JOIN dg ON e.src = dg.src GROUP BY 1),
          $r AS (SELECT n.node,
                   CAST((CASE WHEN n.node IN $seedIn THEN 150000 ELSE 0 END)
                        + COALESCE($m.s, 0) * 85 // 100 AS BIGINT)
                     AS rank
                 FROM n LEFT JOIN $m USING (node))"""
    s"""WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                       CAST(l_partkey + 10000000 AS BIGINT) AS dst
                FROM lineitem
                UNION
                SELECT DISTINCT CAST(l_partkey + 10000000 AS BIGINT),
                       CAST(l_suppkey AS BIGINT)
                FROM lineitem),
       n AS (SELECT DISTINCT src AS node FROM e),
       dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       r0 AS (SELECT node,
                CAST(CASE WHEN node IN $seedIn THEN 1000000 ELSE 0 END
                     AS BIGINT) AS rank
              FROM n),
       ${iter("m1", "r0", "r1")},
       ${iter("m2", "r1", "r2")},
       ${iter("m3", "r2", "r3")}
       SELECT node, rank FROM r3 WHERE rank > 0
       ORDER BY rank DESC, node LIMIT 20"""
  }

  /** HITS unrolled: each iteration is two joins + two max-normed floor
    * divisions; score tables stay sparse exactly as the operator's. */
  /** The q301 oracle: the co-occurrence graph from the length-filtered
    * token sequence and the q131 integer walk unrolled on WORD keys. */
  private def q301OracleSql: String = {
    def iter(m: String, rPrev: String, r: String) =
      s"""$m AS (SELECT e.dst AS word, sum(r.rank // dg.deg) AS s
            FROM e JOIN $rPrev r ON e.src = r.word
                   JOIN dg ON e.src = dg.src GROUP BY 1),
          $r AS (SELECT n.word,
                   CAST(150000 + COALESCE($m.s, 0) * 85 // 100 AS BIGINT)
                     AS rank
                 FROM n LEFT JOIN $m ON n.word = $m.word)"""
    s"""WITH t AS (SELECT doc_id,
                list_filter(string_split(lower(trim(
                  regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                  w -> length(w) >= 3) AS ws
           FROM documents),
       p AS (SELECT doc_id, i AS pos, ws[i] AS w
             FROM (SELECT doc_id, ws,
                     unnest(range(1, len(ws) + 1)) AS i
                   FROM t) u),
       pr AS (SELECT a.w AS wa, b.w AS wb
              FROM p a JOIN p b ON a.doc_id = b.doc_id
                   AND b.pos > a.pos AND b.pos <= a.pos + 2
                   AND a.w <> b.w),
       e AS (SELECT DISTINCT wa AS src, wb AS dst FROM pr
             UNION SELECT DISTINCT wb, wa FROM pr),
       n AS (SELECT DISTINCT src AS word FROM e),
       dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
              FROM e GROUP BY 1),
       r0 AS (SELECT word, CAST(1000000 AS BIGINT) AS rank FROM n),
       ${iter("m1", "r0", "r1")},
       ${iter("m2", "r1", "r2")},
       ${iter("m3", "r2", "r3")}
       SELECT word, rank AS rank_micro FROM r3
       ORDER BY rank DESC, word LIMIT 20"""
  }

  /** The q299 oracle: the same exact-cross-multiply tournament, then
    * `iters` UNROLLED MM steps over the ≤|items|²-row wins matrix —
    * per step one d-fold, the raw update with the d=0 carry, and the
    * max-norm back to 1000 milli. Pure integer floor arithmetic. */
  private def q299OracleSql: String = {
    val iters = 3
    val steps = (1 to iters).map { k =>
      s"""d$k AS (SELECT nt.i,
                  SUM(CASE WHEN nt.n = 0 THEN 0
                      ELSE nt.n * 1000000 // (pi.p + pj.p) END) AS d
           FROM nt JOIN p${k - 1} pi ON nt.i = pi.i
                JOIN p${k - 1} pj ON nt.j = pj.i
           GROUP BY 1),
         r$k AS (SELECT d$k.i,
                  CASE WHEN d = 0 THEN p.p
                       ELSE wt.wtot * 1000000 // d END AS v
                 FROM d$k JOIN p${k - 1} p ON d$k.i = p.i
                      JOIN wt ON d$k.i = wt.i),
         p$k AS (SELECT i, v * 1000
                  // greatest(1, (SELECT max(v) FROM r$k)) AS p
                 FROM r$k)"""
    }.mkString(",\n         ")
    s"""WITH cells AS (SELECT user_id AS e, event_type AS i,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS HUGEINT) AS s,
                CAST(count(*) AS HUGEINT) AS n
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2),
         w AS (SELECT a.i AS wi, b.i AS li, CAST(count(*) AS BIGINT) AS n
               FROM cells a JOIN cells b ON a.e = b.e AND a.i <> b.i
               WHERE a.s * b.n > b.s * a.n GROUP BY 1, 2),
         it AS (SELECT DISTINCT i FROM
                 (SELECT wi AS i FROM w UNION SELECT li FROM w) u),
         nt AS (SELECT x.i AS i, y.i AS j,
                  CAST(coalesce(w1.n, 0) + coalesce(w2.n, 0) AS BIGINT)
                    AS n,
                  CAST(coalesce(w1.n, 0) AS BIGINT) AS wij
                FROM it x JOIN it y ON x.i <> y.i
                LEFT JOIN w w1 ON w1.wi = x.i AND w1.li = y.i
                LEFT JOIN w w2 ON w2.wi = y.i AND w2.li = x.i),
         wt AS (SELECT i, CAST(sum(wij) AS BIGINT) AS wtot
                FROM nt GROUP BY 1),
         ls AS (SELECT i, CAST(sum(n - wij) AS BIGINT) AS losses
                FROM nt GROUP BY 1),
         p0 AS (SELECT i, CAST(1000 AS BIGINT) AS p FROM it),
         $steps
         SELECT p$iters.i AS item, wt.wtot AS wins, ls.losses,
                CAST(p$iters.p AS BIGINT) AS bt_milli
         FROM p$iters JOIN wt ON p$iters.i = wt.i
              JOIN ls ON p$iters.i = ls.i"""
  }

  /** The q282 oracle: the same bounded pool, pairwise micro-unit sims,
    * and k UNROLLED greedy MMR steps — per step one argmax CTE (score
    * desc, id asc) plus the accumulated selected set. Everything after
    * the 6-dp cosine rounding is BIGINT arithmetic, so the greedy path
    * replays bit-exactly. */
  private def q282OracleSql: String = {
    val (lam, k, poolN) = (700L, 6, 16)
    def cos(a: String, b: String) =
      s"""round(list_dot_product($a, $b)
             / (sqrt(list_dot_product($a, $a))
                * sqrt(list_dot_product($b, $b))), 6)"""
    val steps = (2 to k).map { i =>
      s"""sel$i AS (SELECT p.id, p.rel_u,
                  $lam * p.rel_u - ${1000L - lam} * max(s.sim_u) AS score
           FROM pool p JOIN sims s ON s.a = p.id
                JOIN all${i - 1} t ON s.b2 = t.id
           WHERE p.id NOT IN (SELECT id FROM all${i - 1})
           GROUP BY p.id, p.rel_u
           ORDER BY score DESC, p.id LIMIT 1),
         all$i AS (SELECT id, rel_u, score, $i AS rk FROM sel$i
                   UNION ALL SELECT * FROM all${i - 1})"""
    }.mkString(",\n         ")
    s"""WITH b AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         q AS (SELECT v AS qv FROM b WHERE id = 0),
         sc AS (SELECT id, v, ${cos("v", "qv")} AS rel
                FROM b, q WHERE id <> 0),
         pool AS (SELECT id, v, CAST(round(rel * 1000000) AS BIGINT) AS rel_u
                  FROM sc ORDER BY rel DESC, id LIMIT $poolN),
         sims AS (SELECT x.id AS a, y.id AS b2,
                    CAST(round(${cos("x.v", "y.v")} * 1000000) AS BIGINT)
                      AS sim_u
                  FROM pool x JOIN pool y ON x.id <> y.id),
         sel1 AS (SELECT id, rel_u, $lam * rel_u AS score FROM pool
                  ORDER BY score DESC, id LIMIT 1),
         all1 AS (SELECT id, rel_u, score, 1 AS rk FROM sel1),
         $steps
         SELECT CAST(rk AS BIGINT) AS mmr_rank, CAST(id AS BIGINT) AS vec_id,
                rel_u AS rel_micro, CAST(score AS BIGINT) AS mmr_nano
         FROM all$k"""
  }

  private def q272OracleSql: String = {
    def iter(aPrev: String, i: Int) =
      s"""hr$i AS (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS s
            FROM e JOIN $aPrev a ON e.dst = a.node GROUP BY 1),
          h$i AS (SELECT node, CAST(s * 1000000 //
                    (SELECT max(s) FROM hr$i) AS BIGINT) AS h
                  FROM hr$i),
          ar$i AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS s
            FROM e JOIN h$i h ON e.src = h.node GROUP BY 1),
          a$i AS (SELECT node, CAST(s * 1000000 //
                    (SELECT max(s) FROM ar$i) AS BIGINT) AS a
                  FROM ar$i)"""
    s"""WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                CAST(l_partkey + 10000000 AS BIGINT) AS dst FROM lineitem),
       n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       a0 AS (SELECT node, CAST(1000000 AS BIGINT) AS a FROM n),
       ${iter("a0", 1)},
       ${iter("a1", 2)},
       ${iter("a2", 3)}
       SELECT n.node, COALESCE(h3.h, 0) AS hub, COALESCE(a3.a, 0) AS auth
       FROM n LEFT JOIN h3 ON n.node = h3.node
              LEFT JOIN a3 ON n.node = a3.node
       ORDER BY auth DESC, n.node LIMIT 20"""
  }

  private def q131OracleSql: String = {
    def iter(m: String, rPrev: String, r: String) =
      s"""$m AS (SELECT e.dst AS node, sum(r.rank // dg.deg) AS s
            FROM e JOIN $rPrev r ON e.src = r.node
                   JOIN dg ON e.src = dg.src GROUP BY 1),
          $r AS (SELECT n.node,
                   CAST(150000 + COALESCE($m.s, 0) * 85 // 100 AS BIGINT)
                     AS rank
                 FROM n LEFT JOIN $m USING (node))"""
    s"""WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                       CAST(l_partkey + 10000000 AS BIGINT) AS dst
                FROM lineitem
                UNION
                SELECT DISTINCT CAST(l_partkey + 10000000 AS BIGINT),
                       CAST(l_suppkey AS BIGINT)
                FROM lineitem),
       n AS (SELECT DISTINCT src AS node FROM e),
       dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
       ${iter("m1", "r0", "r1")},
       ${iter("m2", "r1", "r2")},
       ${iter("m3", "r2", "r3")}
       SELECT node, rank FROM r3 ORDER BY rank DESC, node LIMIT 20"""
  }

  /** DuckDB 1.0 oracle SQL — same table names, same output column names.
    * DuckDB-vs-Spark portability rules: regexp_replace needs the 'g' flag
    * (Spark replaces all matches by default); computed ints are CAST to
    * BIGINT (DuckDB sum(int)→HUGEINT, row_number→BIGINT vs Spark INT);
    * doubles from aggregation are rounded identically on both sides. */
  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // q200's oracle composes the member readouts' own proven SQL — any
    // member drifting from its oracle breaks the panel identically.
    base + ("q200_stats_panel" ->
      s"""SELECT 'attr_ppm' AS metric, attr_ppm AS value_ppm
            FROM (${base("q174_attribution")})
          UNION ALL SELECT 'auc_ppm', auc_ppm
            FROM (${base("q167_roc_auc")})
          UNION ALL SELECT 'cuped_adj_diff_ppm', adj_diff_ppm
            FROM (${base("q170_cuped")})
          UNION ALL SELECT 'eta2_ppm', eta2_ppm
            FROM (${base("q196_variance_decomposition")})
          UNION ALL SELECT 'ks_ppm', ks_ppm
            FROM (${base("q198_ks_test")})""") +
    // Panel #2 composes the round-10 eval family the same way.
    ("q265_eval_panel" ->
      s"""SELECT 'kappa_ppm' AS metric, kappa_ppm AS value
            FROM (${base("q243_agreement")})
          UNION ALL SELECT 'brier_ppm', brier_ppm
            FROM (${base("q246_brier")})
          UNION ALL SELECT 'ece_ppm', ece_ppm
            FROM (${base("q253_ece")})
          UNION ALL SELECT 'conformal_coverage_ppm', coverage_ppm
            FROM (${base("q254_conformal")})
          UNION ALL SELECT 'jackknife_z_milli', z_milli
            FROM (${base("q247_jackknife")})
          UNION ALL SELECT 'logrank_z_milli', z_milli
            FROM (${base("q264_logrank")})""")
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "q01_topk" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_retailprice DESC, p_partkey LIMIT 20""",

    "q02_topk_per_group" ->
      """SELECT c_mktsegment, c_custkey, c_name, c_acctbal, CAST(rnk AS BIGINT) AS rnk
         FROM (SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                      row_number() OVER (PARTITION BY c_mktsegment
                                         ORDER BY c_acctbal DESC, c_custkey) AS rnk
               FROM customer) WHERE rnk <= 5""",

    "q03_feature_stats" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                round(avg(p_retailprice), 2) AS avg_v,
                round(min(p_retailprice), 2) AS min_v,
                round(max(p_retailprice), 2) AS max_v,
                round(stddev(p_retailprice), 2) AS std_v
         FROM part GROUP BY p_brand""",

    "q04_filter_project" ->
      """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
                o_orderstatus AS status, o_totalprice AS total
         FROM orders WHERE o_totalprice > 150000 AND o_orderstatus <> 'P'""",

    "q05_enrich_join" ->
      """SELECT COALESCE(p.p_brand, 'UNKNOWN') AS brand,
                CAST(count(*) AS BIGINT) AS n_items,
                round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
                round(sum(l.l_quantity), 2) AS sum_qty
         FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",

    "q06_union_history" ->
      """WITH mx AS (SELECT max(o_orderdate) AS m FROM orders)
         SELECT DISTINCT o_orderkey, o_custkey,
                strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
         FROM orders, mx
         WHERE o_orderdate < m - INTERVAL 730 DAY
            OR o_orderdate >= m - INTERVAL 365 DAY""",

    "q07_latest_snapshot" ->
      """SELECT user_id, event_id, event_type, value
         FROM (SELECT user_id, event_id, event_type, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1""",

    "q08_weeks_on_chart" ->
      """WITH weekly AS (
           SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                  round(sum(value), 2) AS score
           FROM events GROUP BY 1, 2),
         wk2 AS (SELECT *, CAST((wk - DATE '1970-01-05') / 7 AS BIGINT) AS weeknum
                 FROM weekly),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY wk
                      ORDER BY score DESC, user_id) AS rnk FROM wk2),
         charted AS (SELECT user_id, weeknum FROM ranked WHERE rnk <= 10),
         mx AS (SELECT max(weeknum) AS maxwk FROM wk2),
         islands AS (SELECT user_id, weeknum,
                            weeknum - row_number() OVER (PARTITION BY user_id
                                                         ORDER BY weeknum) AS grp
                     FROM charted),
         li AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS cnt,
                       max(weeknum) AS mxw
                FROM islands GROUP BY 1, 2),
         st AS (SELECT li.user_id, li.cnt FROM li, mx WHERE li.mxw = mx.maxwk)
         SELECT u.user_id, COALESCE(st.cnt, 0) AS weeks_on_chart
         FROM (SELECT DISTINCT user_id FROM weekly) u
         LEFT JOIN st ON u.user_id = st.user_id""",

    "q09_dedup_keys" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
         FROM (SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
                      row_number() OVER (PARTITION BY l_orderkey, l_partkey
                                         ORDER BY l_linenumber, l_quantity) AS rn
               FROM lineitem) WHERE rn = 1""",

    "q10_upsert" ->
      """WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
         src AS (SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                        o_totalprice
                 FROM orders, mx WHERE o_orderdate >= m - INTERVAL 730 DAY),
         tgt AS (SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                        o_totalprice
                 FROM orders, mx WHERE o_orderdate < m - INTERVAL 365 DAY)
         SELECT * FROM src
         UNION ALL
         SELECT * FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)""",

    "q11_recent_window" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 14 DAY""",

    "q12_weekly_agg" ->
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk, event_type,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(value), 2) AS sum_v,
                round(avg(value), 2) AS avg_v
         FROM events GROUP BY 1, 2""",

    "q13_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base_price,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
                round(avg(l_quantity), 2) AS avg_qty,
                round(avg(l_discount), 4) AS avg_disc,
                CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q14_weekly_chart" ->
      """WITH weekly AS (
           SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                  round(sum(value), 2) AS score
           FROM events GROUP BY 1, 2)
         SELECT strftime(wk, '%Y-%m-%d') AS wk, user_id, score, CAST(rnk AS BIGINT) AS rnk
         FROM (SELECT *, row_number() OVER (PARTITION BY wk
                 ORDER BY score DESC, user_id) AS rnk FROM weekly)
         WHERE rnk <= 5""",

    "q15_token_count" ->
      """SELECT doc_id,
                CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS word_tokens
         FROM documents""",

    "q16_quality_score" ->
      """WITH t AS (SELECT doc_id, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT doc_id,
                  CAST(length(text) AS BIGINT) AS len,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS word_tokens,
                  CAST(len(regexp_extract_all(nt, '(^| )(the|a|an|and|or|of|to|in|is|it)( |$)')) AS BIGINT) AS stop_hits,
                  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct_hits
               FROM t)
         SELECT doc_id, len, word_tokens, stop_hits, punct_hits,
                round(0.5 * least(len / 500.0, 1.0)
                      + 0.5 * least(word_tokens * 1.0 / greatest(ws, 1), 1.0)
                      - punct_hits * 1.0 / greatest(len, 1), 4) AS quality
         FROM c""",

    "q17_lang_guess" ->
      """WITH t AS (SELECT doc_id, lang,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT doc_id, lang,
                  len(regexp_extract_all(nt, '(^| )(the|and|of|is)( |$)')) AS en,
                  len(regexp_extract_all(nt, '(^| )(der|die|und|ist)( |$)')) AS de,
                  len(regexp_extract_all(nt, '(^| )(le|la|et|est)( |$)')) AS fr,
                  len(regexp_extract_all(nt, '(^| )(el|los|y|es)( |$)')) AS es
               FROM t)
         SELECT doc_id, lang,
                CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                     WHEN en = greatest(en, de, fr, es) THEN 'en'
                     WHEN de = greatest(en, de, fr, es) THEN 'de'
                     WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                     ELSE 'es' END AS guess
         FROM c""",

    "q18_fingerprint" ->
      """SELECT doc_id,
                md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents""",

    "q19_dedup_exact" ->
      """SELECT doc_id, fp
         FROM (SELECT doc_id,
                      md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
                      row_number() OVER (
                        PARTITION BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                        ORDER BY doc_id) AS rn
               FROM documents) WHERE rn = 1""",

    "q81_incremental_dedup" ->
      """WITH fps AS (
           SELECT doc_id,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           FROM documents),
         store AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 3 = 0),
         batch AS (
           SELECT doc_id, fp,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM fps WHERE doc_id % 3 <> 0)
         SELECT doc_id, fp FROM batch
         WHERE rn = 1 AND fp NOT IN (SELECT fp FROM store)""",

    "q20_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT id1, id2,
                round(inter * 1.0 / (c1.n + c2.n - inter), 4) AS jaccard
         FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                 JOIN cnt c2 ON pr.id2 = c2.doc_id
         WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.2""",

    "q25_ann_buckets" -> q25OracleSql,

    // Same shingle substrate as q20/q46/q53 with the df cap applied to
    // candidate generation only: set sizes (n1/n2) stay UNCAPPED, so the
    // capped jaccard is a strict underestimate for boilerplate-heavy pairs
    // — exactly the production semantics of the skew bound.
    "q64_jaccard_capped" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1),
         shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN df USING (g) WHERE df.df <= 50),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT id1, id2,
                round(inter * 1.0 / (c1.n + c2.n - inter), 4) AS jaccard
         FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                 JOIN cnt c2 ON pr.id2 = c2.doc_id
         WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.2""",

    "q65_chunk_tokens" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         s AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, 48)) AS start
               FROM t WHERE len(toks) > 0)
         SELECT doc_id, CAST((start - 1) // 48 AS BIGINT) AS chunk_idx,
                CAST(len(toks[start:start+63]) AS BIGINT) AS chunk_tokens,
                array_to_string(toks[start:start+63], ' ') AS chunk_text
         FROM s""",

    "q66_quality_gate" ->
      """WITH c AS (SELECT doc_id, source,
                  round(0.5 * least(CAST(length(text) AS BIGINT) / 500.0, 1.0)
                      + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+')) * 1.0
                                    / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
                      - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                        / greatest(CAST(length(text) AS BIGINT), 1), 4) AS quality
               FROM documents),
         thr AS (SELECT source, quantile_cont(quality, 0.75) AS thr
                 FROM c GROUP BY source)
         SELECT c.doc_id, c.source, c.quality
         FROM c JOIN thr USING (source) WHERE c.quality >= thr.thr""",

    "q67_decontaminate" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         test_g AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
         contaminated AS (SELECT DISTINCT doc_id FROM sh
                          WHERE doc_id % 97 <> 0
                            AND g IN (SELECT g FROM test_g))
         SELECT d.doc_id FROM documents d
         WHERE d.doc_id % 97 <> 0
           AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)""",

    "q68_label_outliers" ->
      """WITH s AS (SELECT label, vec_id,
                  list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS v
           FROM embeddings),
         e AS (SELECT label, pos, v[pos] AS x
               FROM (SELECT label, v, unnest(range(1, len(v) + 1)) AS pos FROM s)),
         c AS (SELECT label, list(CAST(cx AS DOUBLE) ORDER BY pos) AS c
               FROM (SELECT label, pos, sum(x) AS cx FROM e GROUP BY label, pos)
               GROUP BY label),
         j AS (SELECT s.label, s.vec_id,
                 list_dot_product(CAST(s.v AS DOUBLE[]), c.c)
                 / (sqrt(list_dot_product(CAST(s.v AS DOUBLE[]), CAST(s.v AS DOUBLE[])))
                    * sqrt(list_dot_product(c.c, c.c))) AS cos
               FROM s JOIN c USING (label))
         SELECT label, vec_id, cos, CAST(rnk AS BIGINT) AS rnk
         FROM (SELECT *, row_number() OVER (PARTITION BY label
                          ORDER BY cos, vec_id) AS rnk FROM j)
         WHERE rnk <= 3""",

    "q78_corpus_upsample" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS x FROM documents),
         u AS (SELECT doc_id, source,
                 (strpos('0123456789abcdef', substring(x, 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substring(x, 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substring(x, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substring(x, 4, 1)) - 1) AS u16
               FROM h),
         n AS (SELECT doc_id, source,
                 CASE WHEN source IN ('src0','src1','src2','src3','src4')
                        THEN 2 + (CASE WHEN u16 < 32768 THEN 1 ELSE 0 END)
                      WHEN source IN ('src5','src6','src7','src8','src9')
                        THEN 1
                      ELSE (CASE WHEN u16 < 32768 THEN 1 ELSE 0 END) END AS nc
               FROM u)
         SELECT doc_id, source, CAST(unnest(range(1, nc + 1)) AS BIGINT) AS copy_idx
         FROM n WHERE nc > 0""",

    "q76_group_sample" ->
      """SELECT doc_id, source
         FROM (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source
                        ORDER BY md5(text), doc_id) AS rn
               FROM documents)
         WHERE rn <= 5""",

    "q74_scd2" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events),
         c AS (SELECT user_id, event_type, ts_us, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id) AS prev
               FROM e),
         ch AS (SELECT user_id, event_type, ts_us, event_id FROM c
                WHERE prev IS NULL OR event_type <> prev)
         SELECT user_id, event_type, ts_us AS valid_from,
                lead(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS valid_to
         FROM ch""",

    "q77_interval_lookup" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                    FROM events),
         c AS (SELECT user_id, event_type, ts_us, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id) AS prev
               FROM e),
         ch AS (SELECT user_id, event_type, ts_us, event_id FROM c
                WHERE prev IS NULL OR event_type <> prev),
         dim AS (SELECT user_id, event_type AS dim_type, ts_us AS vf FROM ch)
         SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(CASE WHEN e.event_type = d.dim_type THEN 1 END)
                     AS BIGINT) AS n_matched
         FROM e ASOF LEFT JOIN dim d
           ON e.user_id = d.user_id AND e.ts_us >= d.vf
         GROUP BY e.user_id""",

    "q75_cdc_apply" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           event_type, value FROM events),
         cut AS (SELECT max(ts_us) - 1209600000000 AS c FROM e),
         tgt AS (SELECT user_id, value FROM (
                   SELECT user_id, value,
                          row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rn
                   FROM e, cut WHERE ts_us < c) WHERE rn = 1),
         chg AS (SELECT user_id, value,
                        CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                        row_number() OVER (PARTITION BY user_id
                          ORDER BY ts_us DESC, event_id DESC) AS rn
                 FROM e, cut WHERE ts_us >= c),
         lastop AS (SELECT user_id, value, op FROM chg WHERE rn = 1)
         SELECT user_id, value FROM tgt
         WHERE user_id NOT IN (SELECT user_id FROM lastop)
         UNION ALL
         SELECT user_id, value FROM lastop WHERE op <> 'D'""",

    "q72_corpus_mix" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS x FROM documents),
         u AS (SELECT doc_id, source,
                 (strpos('0123456789abcdef', substring(x, 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substring(x, 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substring(x, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substring(x, 4, 1)) - 1) AS u16
               FROM h)
         SELECT doc_id, source FROM u
         WHERE u16 < CASE
           WHEN source IN ('src0','src1','src2','src3','src4') THEN 65536
           WHEN source IN ('src5','src6','src7','src8','src9') THEN 32768
           ELSE 16384 END""",

    "q73_rank_normalize" ->
      """SELECT p_brand, p_partkey, p_retailprice,
                percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
         FROM part
         WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)""",

    "q71_custom_source" ->
      """WITH g AS (SELECT i, i % 50 AS uid,
                  ['view','click','purchase','signup','error'][CAST(i % 5 AS INT) + 1] AS etype,
                  ((i * 2654435761) % 1000000) / 100.0 AS value
           FROM (SELECT unnest(range(0, 100000)) AS i))
         SELECT etype, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
                CAST(count(DISTINCT uid) AS BIGINT) AS n_users
         FROM g WHERE i >= 20000 AND i < 80000 AND etype <> 'error'
         GROUP BY etype""",

    "q69_pack_sequences" ->
      """WITH t AS (SELECT source AS shard, doc_id,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
           FROM documents),
         o AS (SELECT shard, doc_id, n_tokens,
                      COALESCE(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                               AS BIGINT), 0) AS tok_offset
               FROM t)
         SELECT shard, doc_id, n_tokens, tok_offset,
                CAST(tok_offset // 2048 AS BIGINT) AS seq_id
         FROM o""",

    "q23_cosine_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                    WHERE vec_id = 0)
         SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings, q WHERE vec_id <> 0
         ORDER BY cos DESC, vec_id LIMIT 20""",

    // Exact-probing IVF: provably identical to brute force, so the oracle
    // is the plain exact top-k (q23's form at a different query point).
    "q61_ann_ivf_exact" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                    WHERE vec_id = 7)
         SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings, q WHERE vec_id <> 7
         ORDER BY cos DESC, vec_id LIMIT 25""",

    "q24_embedding_neardup" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2,
                round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[]))
                      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                               CAST(a.embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])))), 6) AS cos
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                              CAST(a.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])))), 6) >= 0.3""",

    "q353_mutual_knn" ->
      """WITH scored AS (
           SELECT a.vec_id AS src, b.vec_id AS dst,
                  round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(a.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])))), 6) AS cos
           FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         knn AS (
           SELECT src, dst, cos
           FROM (SELECT src, dst, cos,
                        row_number() OVER (PARTITION BY src
                                           ORDER BY cos DESC, dst) AS rn
                 FROM scored)
           WHERE rn <= 5)
         SELECT k1.src AS id1, k1.dst AS id2, k1.cos AS cos
         FROM knn k1 JOIN knn k2 ON k1.src = k2.dst AND k1.dst = k2.src
         WHERE k1.src < k1.dst""",

    "q33_chart_snapshot" ->
      """WITH latest AS (
           SELECT user_id, event_id, event_type, value
           FROM (SELECT user_id, event_id, event_type, value,
                        row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events) WHERE rn = 1),
         weekly AS (
           SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                  round(sum(value), 2) AS score
           FROM events GROUP BY 1, 2),
         wk2 AS (SELECT *, CAST((wk - DATE '1970-01-05') / 7 AS BIGINT) AS weeknum
                 FROM weekly),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY wk
                      ORDER BY score DESC, user_id) AS rnk FROM wk2),
         charted AS (SELECT user_id, weeknum FROM ranked WHERE rnk <= 10),
         mx AS (SELECT max(weeknum) AS maxwk FROM wk2),
         islands AS (SELECT user_id, weeknum,
                            weeknum - row_number() OVER (PARTITION BY user_id
                                                         ORDER BY weeknum) AS grp
                     FROM charted),
         li AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS cnt,
                       max(weeknum) AS mxw
                FROM islands GROUP BY 1, 2),
         st AS (SELECT li.user_id, li.cnt FROM li, mx WHERE li.mxw = mx.maxwk),
         streaks AS (SELECT u.user_id, COALESCE(st.cnt, 0) AS weeks_on_chart
                     FROM (SELECT DISTINCT user_id FROM weekly) u
                     LEFT JOIN st ON u.user_id = st.user_id)
         SELECT l.user_id, l.event_id, l.event_type, l.value, s.weeks_on_chart
         FROM latest l JOIN streaks s ON l.user_id = s.user_id""",

    "q37_asof_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value,
                p.value AS last_purchase
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                         WHERE event_type = 'purchase') p
           ON e.user_id = p.user_id AND e.ts >= p.ts""",

    "q36_stateful_streaks" ->
      """WITH weekly AS (
           SELECT user_id,
                  CAST((CAST(date_trunc('week', ts) AS DATE) - DATE '1970-01-05') / 7
                       AS BIGINT) AS weeknum
           FROM events GROUP BY 1, date_trunc('week', ts)),
         islands AS (SELECT user_id, weeknum,
                            weeknum - row_number() OVER (PARTITION BY user_id
                                                         ORDER BY weeknum) AS grp
                     FROM weekly)
         SELECT user_id, weeknum,
                CAST(row_number() OVER (PARTITION BY user_id, grp
                                        ORDER BY weeknum) AS BIGINT) AS streak
         FROM islands""",

    "q29_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k,
                round(avg(k), 2) AS avg_k,
                CAST(count(CASE WHEN k > 50 THEN 1 END) AS BIGINT) AS n_high
         FROM (SELECT event_type,
                      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
               FROM events) GROUP BY event_type""",

    "q30_entity_compare" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
                round(avg(l_quantity), 2) AS avg_qty,
                round(avg(l_extendedprice), 2) AS avg_price,
                round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem WHERE l_suppkey IN (1, 2) GROUP BY l_suppkey""",

    "q31_source_quality" ->
      """WITH c AS (SELECT source, n_chars,
                  CAST(length(text) AS BIGINT) AS len,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS wt,
                  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct
               FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n,
                round(avg(round(0.5 * least(len / 500.0, 1.0)
                      + 0.5 * least(wt * 1.0 / greatest(ws, 1), 1.0)
                      - punct * 1.0 / greatest(len, 1), 4)), 4) AS avg_quality,
                round(avg(n_chars), 2) AS avg_chars,
                CAST(sum(wt) AS BIGINT) AS sum_tokens
         FROM c GROUP BY source""",

    "q38_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                      CAST(sum(news) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                        AS session_idx
               FROM g)
         SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                max(ts_us) - min(ts_us) AS duration_us
         FROM s GROUP BY user_id, session_idx""",

    "q39_range_pairs" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events)
         SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
         FROM e a JOIN e b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(a.t - b.t) <= 3600000000
         GROUP BY a.user_id""",

    "q40_rolling_avg" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
                           CAST(round(value * 100, 0) AS BIGINT) AS cents
                    FROM events)
         SELECT event_id, user_id, ts_us, value,
                sum(cents) OVER w / (100.0 * count(*) OVER w) AS roll_avg,
                CAST(count(*) OVER w AS BIGINT) AS roll_n
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                             RANGE BETWEEN 604800000000 PRECEDING
                                       AND CURRENT ROW)""",

    "q41_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_v,
                round(avg(l_quantity), 2) AS avg_v
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q79_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_v,
                round(avg(l_quantity), 2) AS avg_v
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",

    "q80_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_v
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",

    "q42_pivot_weekly" ->
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
                CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
                CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
                CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
                CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
                CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
         FROM events GROUP BY 1""",

    "q43_hash_split" ->
      """SELECT doc_id,
                CASE WHEN substring(md5(text), 1, 1) < 'd'
                     THEN 'train' ELSE 'test' END AS split
         FROM documents""",

    "q44_top_terms" ->
      """SELECT term, CAST(count(*) AS BIGINT) AS cnt
         FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
               FROM documents)
         GROUP BY term ORDER BY cnt DESC, term LIMIT 50""",

    "q357_vocab_coverage" ->
      """WITH sw AS (SELECT source, term, count(*) AS n
              FROM (SELECT source,
                           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                    FROM documents)
              GROUP BY 1, 2),
         v AS (SELECT term FROM (SELECT term, sum(n) AS gn FROM sw
                                 GROUP BY 1 ORDER BY gn DESC, term LIMIT 200)),
         j AS (SELECT sw.source, sw.n,
                      CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END AS inv
               FROM sw LEFT JOIN v ON sw.term = v.term)
         SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN inv = 1 THEN n ELSE 0 END) AS BIGINT)
                  AS in_vocab_tokens,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(inv) AS BIGINT) AS in_vocab_types,
                CAST(CASE WHEN sum(n) = 0 THEN 0
                     ELSE sum(CASE WHEN inv = 1 THEN n ELSE 0 END)
                          * 1000000 // sum(n) END AS BIGINT) AS coverage_ppm
         FROM j GROUP BY 1""",

    "q45_pii_scrub" ->
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '[0-9]{4,}', '<NUM>', 'g') AS scrubbed,
                CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     + len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT)
                  AS pii_hits
         FROM documents""",

    "q46_dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pairs AS (SELECT id1, id2
                   FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                           JOIN cnt c2 ON pr.id2 = c2.doc_id
                   WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.2),
         e AS (SELECT id1 AS a, id2 AS b FROM pairs
               UNION SELECT id2, id1 FROM pairs),
         r(n, m) AS (SELECT a, b FROM e
                     UNION SELECT r.n, e.b FROM r JOIN e ON r.m = e.a)
         SELECT n AS doc_id, least(n, min(m)) AS cluster FROM r GROUP BY n""",

    // Same normalized-md5 fingerprint as q19/q81.
    "q101_dedup_rate" ->
      """WITH f AS (SELECT source,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
                round((count(*) - count(DISTINCT fp)) * 1.0 / count(*), 4)
                  AS dup_rate
         FROM f GROUP BY 1""",

    // q68's fixed-point discipline: quantized longs are exact; the mean /
    // variance doubles derive from identical longs through the identical
    // expression on both engines — bit-identical, no rounding epsilon.
    "q102_dim_stats" ->
      """WITH s AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS v
           FROM embeddings),
         e AS (SELECT CAST(pos AS BIGINT) AS dim, v[pos] AS q
               FROM (SELECT v, unnest(range(1, len(v) + 1)) AS pos FROM s)),
         g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(q) AS BIGINT) AS sum_q,
                      CAST(min(q) AS BIGINT) AS min_q,
                      CAST(max(q) AS BIGINT) AS max_q,
                      CAST(sum(q * q) AS BIGINT) AS ssq
               FROM e GROUP BY dim)
         SELECT dim, n, sum_q, min_q, max_q,
                CAST(floor(CAST(sum_q AS DOUBLE) / CAST(n AS DOUBLE) + 0.5)
                     AS BIGINT) AS mean_milli,
                CAST(floor((CAST(ssq AS DOUBLE)
                            - CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS var_micro
         FROM g""",

    // Same [a-z0-9]+ term split as q44; jaccard over DISTINCT terms.
    "q103_source_overlap" ->
      """WITH v AS (SELECT DISTINCT source AS src, term
           FROM (SELECT source,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                 FROM documents)),
         sz AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
         pr AS (SELECT a.src AS s1, b.src AS s2, CAST(count(*) AS BIGINT) AS inter
                FROM v a JOIN v b ON a.term = b.term AND a.src < b.src
                GROUP BY 1, 2)
         SELECT s2, s1, x.n AS n1, y.n AS n2, inter,
                round(inter * 1.0 / (x.n + y.n - inter), 4) AS jaccard
         FROM pr JOIN sz x ON pr.s1 = x.src JOIN sz y ON pr.s2 = y.src""",

    // Same word-token count as q15; ROWS frame spelled on both engines
    // (doc_id tiebreak makes it equal to RANGE, but parity is explicit).
    // DuckDB's windowed sum(BIGINT) widens to HUGEINT — CAST back to
    // BIGINT like every other computed integer in this map.
    "q104_token_budget" ->
      """SELECT doc_id, source, n_tokens, cum_tokens
         FROM (SELECT doc_id, source, n_tokens,
                      CAST(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY md5(text), doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM (SELECT doc_id, source, text,
                            CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                                 AS BIGINT) AS n_tokens
                     FROM documents))
         WHERE cum_tokens <= 800""",

    // The A∪B predicate the truncate+append cycle must reproduce exactly.
    "q105_warehouse_cycle" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_totalprice < 150000 GROUP BY 1""",

    // Exact-integer inputs → the ratio is the same double on both engines.
    "q106_key_skew" ->
      """WITH g AS (SELECT 'l_orderkey' AS key_col, count(*) AS c
                    FROM lineitem GROUP BY l_orderkey
             UNION ALL SELECT 'l_partkey', count(*)
                    FROM lineitem GROUP BY l_partkey
             UNION ALL SELECT 'l_suppkey', count(*)
                    FROM lineitem GROUP BY l_suppkey)
         SELECT key_col, CAST(sum(c) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(max(c) AS BIGINT) AS max_cnt,
                round(CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                      / CAST(sum(c) AS DOUBLE), 4) AS skew_ratio
         FROM g GROUP BY key_col""",

    // Quantized norm² is exact integer on both engines (≤ 64·10⁶ ≪ 2⁵³);
    // the bucket floor-division sees identical doubles.
    "q107_norm_histogram" ->
      """WITH s AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS v
           FROM embeddings),
         n AS (SELECT CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE)
                 AS norm2 FROM s)
         SELECT CAST(greatest(least(floor(norm2 / 1000000.0), 19), 0)
                     AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                round(min(norm2), 2) AS lo, round(max(norm2), 2) AS hi
         FROM n GROUP BY 1""",

    // Same md5-nibble split rule as q43; frac = exact-integer ratio.
    "q108_split_balance" ->
      """WITH g AS (SELECT source,
                  CASE WHEN substring(md5(text), 1, 1) < 'd'
                       THEN 'train' ELSE 'test' END AS split,
                  count(*) AS n
           FROM documents GROUP BY 1, 2)
         SELECT source, split, CAST(n AS BIGINT) AS n,
                round(n * 1.0 / sum(n) OVER (PARTITION BY source), 4) AS frac
         FROM g""",

    // Exact-integer wau/active_days → identical ratio doubles.
    "q109_stickiness" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
                     FROM events),
         wu AS (SELECT strftime(date_trunc('week', d), '%Y-%m-%d') AS week,
                       user_id, count(*) AS days
                FROM du GROUP BY 1, 2)
         SELECT week, CAST(count(*) AS BIGINT) AS wau,
                CAST(sum(days) AS BIGINT) AS active_days,
                round(sum(days) * 1.0 / count(*), 4) AS avg_days,
                round(sum(days) * 1.0 / (count(*) * 7), 4) AS stickiness
         FROM wu GROUP BY week""",

    // Same tokenizer as q44; all ratio inputs exact integers.
    "q110_lexical_diversity" ->
      """WITH t AS (SELECT source,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         g AS (SELECT source, term, count(*) AS c FROM t GROUP BY 1, 2)
         SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_hapax,
                round(count(*) * 1.0 / sum(c), 4) AS ttr,
                round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0
                      / count(*), 4) AS hapax_frac
         FROM g GROUP BY source""",

    // Both engines md5 the identical space-joined first-16-token string;
    // list_slice/slice clamp the same way on short docs.
    "q111_prefix_dups" ->
      """WITH p AS (SELECT doc_id,
                  md5(array_to_string(list_slice(
                        regexp_extract_all(lower(text), '[a-z0-9]+'),
                        1, 16), ' ')) AS prefix_hash
           FROM documents)
         SELECT prefix_hash, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(min(doc_id) AS BIGINT) AS keep_id
         FROM p GROUP BY 1 HAVING count(*) > 1""",

    // Count-of-counts replay: k = ceil(p·N) is the same double → same
    // ceil; everything else exact integers.
    "q112_user_concentration" ->
      """WITH uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
         cc AS (SELECT c, count(*) AS nu FROM uc GROUP BY 1),
         w AS (SELECT c, nu,
                      sum(nu) OVER (ORDER BY c DESC
                        ROWS UNBOUNDED PRECEDING) AS cu,
                      sum(c * nu) OVER (ORDER BY c DESC
                        ROWS UNBOUNDED PRECEDING) AS ce
               FROM cc),
         t AS (SELECT max(cu) AS tu, max(ce) AS te FROM w),
         l AS (SELECT unnest([0.01, 0.05, 0.10]) AS pct)
         SELECT pct, CAST(ceil(pct * tu) AS BIGINT) AS top_users,
                CAST(ce - (cu - ceil(pct * tu)) * c AS BIGINT) AS top_events,
                CAST(te AS BIGINT) AS total_events,
                round((ce - (cu - ceil(pct * tu)) * c) * 1.0 / te, 4) AS share
         FROM w, t, l
         WHERE cu >= ceil(pct * tu) AND cu - nu < ceil(pct * tu)""",

    // Distinct (user,type) bounds the self-join; exact counts → exact
    // lift inputs.
    "q113_cooccur_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
         nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
         p AS (SELECT a.event_type AS t1, b.event_type AS t2,
                      count(*) AS n_both
               FROM ut a JOIN ut b USING (user_id)
               WHERE a.event_type < b.event_type GROUP BY 1, 2)
         SELECT t1, t2, CAST(x.n AS BIGINT) AS n1, CAST(y.n AS BIGINT) AS n2,
                CAST(n_both AS BIGINT) AS n_both,
                round(n_both * 1.0 * n_users / (x.n * y.n), 4) AS lift
         FROM p JOIN tot x ON p.t1 = x.event_type
                JOIN tot y ON p.t2 = y.event_type, nu""",

    // HUGEINT sums mirror Spark's decimal(38,0): the distance numerator
    // stays integer; sqrt/divide is the identical double expression.
    "q114_label_separation" ->
      """WITH s AS (SELECT label,
                  list_transform(CAST(embedding AS DOUBLE[]),
                    x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS v
           FROM embeddings),
         e AS (SELECT label, CAST(pos AS BIGINT) AS dim, v[pos] AS q
               FROM (SELECT label, v, unnest(range(1, len(v) + 1)) AS pos
                     FROM s)),
         c AS (SELECT label, dim, CAST(sum(q) AS HUGEINT) AS sm,
                      count(*) AS n
               FROM e GROUP BY 1, 2),
         p AS (SELECT a.label AS l1, b.label AS l2, a.n AS n1, b.n AS n2,
                      (a.sm * b.n - b.sm * a.n) AS df
               FROM c a JOIN c b USING (dim) WHERE a.label < b.label)
         SELECT l1, l2, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                round(sqrt(CAST(sum(df * df) AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                      / 1000.0, 6) AS dist
         FROM p GROUP BY l1, l2, n1, n2""",

    // Same µs-long timestamps (epoch_us ↔ unix_micros); counts exact.
    "q115_windowed_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type
                    FROM events),
         s1 AS (SELECT u, min(t) AS t1 FROM e WHERE event_type = 'signup'
                GROUP BY u),
         s2 AS (SELECT e.u, min(t) AS t2, min(t1) AS t1
                FROM e JOIN s1 USING (u)
                WHERE event_type = 'click' AND t > t1
                  AND t <= t1 + 604800000000 GROUP BY e.u),
         s3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN s2 USING (u)
                WHERE event_type = 'purchase' AND t > t2
                  AND t <= t1 + 604800000000 GROUP BY e.u),
         c AS (SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
                      (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
               UNION ALL
               SELECT 2, 'click',
                      (SELECT CAST(count(*) AS BIGINT) FROM s2)
               UNION ALL
               SELECT 3, 'purchase',
                      (SELECT CAST(count(*) AS BIGINT) FROM s3))
         SELECT step_idx, step, n_users,
                round(n_users * 1.0
                      / (SELECT n_users FROM c WHERE step_idx = 1), 4)
                  AS conv
         FROM c""",

    // Same gaps-and-islands replay as q38; the path is the first 3 event
    // types per session ordered by (ts, event_id).
    "q116_session_paths" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           event_type
                    FROM events),
         g AS (SELECT user_id, ts_us, event_id, event_type,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us, event_id, event_type,
                      sum(news) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         p AS (SELECT array_to_string(
                        (list(event_type ORDER BY ts_us, event_id))[1:3],
                        '>') AS path
               FROM s GROUP BY user_id, sid)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 25""",

    // Exact-integer window sums → identical mean/var/z doubles; baseline
    // is the trailing 28 OBSERVED days ending yesterday.
    "q117_daily_anomaly" ->
      """WITH d AS (SELECT event_type AS etype, CAST(ts AS DATE) AS d,
                           count(*) AS n_events
                    FROM events GROUP BY 1, 2),
         w AS (SELECT etype, d, n_events,
                      count(n_events) OVER win AS n_hist,
                      sum(n_events) OVER win AS s,
                      sum(n_events * n_events) OVER win AS ss
               FROM d WINDOW win AS (PARTITION BY etype ORDER BY d
                 ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
         v AS (SELECT etype, d, n_events, n_hist,
                      CAST(s AS DOUBLE) / CAST(n_hist AS DOUBLE) AS mean,
                      (CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n_hist AS DOUBLE))
                      / CAST(n_hist AS DOUBLE) AS var
               FROM w WHERE n_hist >= 7)
         SELECT etype, strftime(d, '%Y-%m-%d') AS day,
                CAST(n_events AS BIGINT) AS n_events,
                CAST(n_hist AS BIGINT) AS n_hist,
                round(mean, 4) AS mean_hist,
                round((CAST(n_events AS DOUBLE) - mean) / sqrt(var), 4) AS z
         FROM v WHERE var > 0""",

    // q82's candidate CTEs (agreement filter off) scored against q20's
    // exact-Jaccard truth at 0.5; counts exact, ratios identical doubles.
    "q118_lsh_quality" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         ex AS (SELECT id1, id2
                FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                        JOIN cnt c2 ON pr.id2 = c2.doc_id
                WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.5),
         mh AS (SELECT doc_id, s,
                       min(substr(md5((s // 4)::VARCHAR || ':' || g),
                                  CAST(1 + 8 * (s % 4) AS INTEGER), 8)) AS h
                FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS s) seeds
                GROUP BY doc_id, s),
         sig AS (SELECT doc_id, list(h ORDER BY s) AS sig FROM mh
                 GROUP BY doc_id),
         band AS (SELECT doc_id, b, sig[2*b+1] || '|' || sig[2*b+2] AS bk
                  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bands),
         cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
                  FROM band a JOIN band c
                    ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
         m AS (SELECT count(*) AS n_caught
               FROM cand JOIN ex USING (id1, id2))
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
                (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true,
                CAST(n_caught AS BIGINT) AS n_caught,
                round(n_caught * 1.0
                      / greatest((SELECT count(*) FROM cand), 1), 4)
                  AS lsh_precision,
                round(n_caught * 1.0
                      / greatest((SELECT count(*) FROM ex), 1), 4)
                  AS lsh_recall
         FROM m""",

    // q46's recursive-CTE components, rolled up twice.
    "q119_cluster_sizes" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pairs AS (SELECT id1, id2
                   FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                           JOIN cnt c2 ON pr.id2 = c2.doc_id
                   WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.2),
         e AS (SELECT id1 AS a, id2 AS b FROM pairs
               UNION SELECT id2, id1 FROM pairs),
         r(n, m) AS (SELECT a, b FROM e
                     UNION SELECT r.n, e.b FROM r JOIN e ON r.m = e.a),
         lbl AS (SELECT n AS doc_id, least(n, min(m)) AS cluster
                 FROM r GROUP BY n),
         sz AS (SELECT cluster, count(*) AS s FROM lbl GROUP BY cluster)
         SELECT CAST(s AS BIGINT) AS cluster_size,
                CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(count(*) * s AS BIGINT) AS n_docs
         FROM sz GROUP BY s""",

    // The window replays per bucket (bounded key), batch = floor-division
    // of the in-bucket rank; pad_frac's denominator guards the all-empty
    // batch with greatest(...,1) on both engines.
    "q99_length_batches" ->
      """WITH n AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
                    AS n_tokens
           FROM documents),
         b AS (SELECT doc_id, n_tokens, n_tokens // 32 AS bucket,
                      row_number() OVER (PARTITION BY n_tokens // 32
                                         ORDER BY n_tokens DESC, doc_id) AS rn
               FROM n)
         SELECT bucket, (rn - 1) // 16 AS batch_in_bucket,
                CAST(count(*) AS BIGINT) AS n_docs,
                max(n_tokens) AS max_tokens,
                CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                round((max(n_tokens) * count(*) - sum(n_tokens)) * 1.0
                      / greatest(max(n_tokens) * count(*), 1), 4) AS pad_frac
         FROM b
         GROUP BY 1, 2""",

    // q46's closure + q16's quality, composed: the canonical pick is the
    // per-cluster argmax of the ROUNDED quality with an id tiebreak.
    "q100_canonical_quality" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         pairs AS (SELECT id1, id2
                   FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                           JOIN cnt c2 ON pr.id2 = c2.doc_id
                   WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.2),
         e AS (SELECT id1 AS a, id2 AS b FROM pairs
               UNION SELECT id2, id1 FROM pairs),
         r(n, m) AS (SELECT a, b FROM e
                     UNION SELECT r.n, e.b FROM r JOIN e ON r.m = e.a),
         cl AS (SELECT n AS doc_id, least(n, min(m)) AS cluster FROM r GROUP BY n),
         qt AS (SELECT doc_id, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
                FROM documents),
         qc AS (SELECT doc_id,
                  CAST(length(text) AS BIGINT) AS len,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS word_tokens,
                  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct_hits
                FROM qt),
         q AS (SELECT doc_id,
                  round(0.5 * least(len / 500.0, 1.0)
                        + 0.5 * least(word_tokens * 1.0 / greatest(ws, 1), 1.0)
                        - punct_hits * 1.0 / greatest(len, 1), 4) AS quality
               FROM qc)
         SELECT cluster, doc_id AS canonical_id, quality, n_members
         FROM (SELECT cluster, doc_id, quality,
                      row_number() OVER (PARTITION BY cluster
                                         ORDER BY quality DESC, doc_id) AS rn,
                      CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
                        AS n_members
               FROM cl JOIN q USING (doc_id))
         WHERE rn = 1""",

    "q47_percentiles" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n,
                round(quantile_cont(n_chars, 0.25), 2) AS p25,
                round(quantile_cont(n_chars, 0.50), 2) AS p50,
                round(quantile_cont(n_chars, 0.75), 2) AS p75
         FROM documents GROUP BY source""",

    "q48_salted_topk" ->
      """SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS row_id,
                l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, row_id LIMIT 20""",

    "q35_multimodal_meta" ->
      """WITH m AS (SELECT doc_id AS media_id,
                  ['image','video','audio'][CAST(doc_id % 3 AS INT) + 1] AS modality,
                  text, md5(text) AS hex
           FROM documents),
         nibs AS (SELECT media_id, modality, text, hex,
                  strpos('0123456789abcdef', substring(hex, 1, 1)) - 1 AS n0,
                  strpos('0123456789abcdef', substring(hex, 2, 1)) - 1 AS n1,
                  strpos('0123456789abcdef', substring(hex, 3, 1)) - 1 AS n2,
                  strpos('0123456789abcdef', substring(hex, 4, 1)) - 1 AS n3,
                  strpos('0123456789abcdef', substring(hex, 5, 1)) - 1 AS n4
               FROM m)
         SELECT media_id, modality,
                CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
                CAST(n0 * 16 + n1 + 1 AS INT) AS width,
                CAST(n2 * 16 + n3 + 1 AS INT) AS height,
                CAST(CASE WHEN modality = 'video' THEN n4 + 2 ELSE 1 END AS INT)
                  AS n_frames,
                hex AS digest
         FROM nibs""",

    "q59_event_gaps" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         g AS (SELECT user_id,
                      ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                               ORDER BY ts_us, event_id) AS gap
               FROM e)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                max(gap) AS max_gap_us,
                sum(gap) * 1.0 / count(*) AS avg_gap_us
         FROM g WHERE gap IS NOT NULL GROUP BY user_id""",

    "q60_ntile" ->
      """SELECT p_brand, CAST(tier AS BIGINT) AS tier,
                CAST(count(*) AS BIGINT) AS n,
                round(min(p_retailprice), 2) AS lo,
                round(max(p_retailprice), 2) AS hi
         FROM (SELECT p_brand, p_retailprice,
                      ntile(4) OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice, p_partkey) AS tier
               FROM part)
         GROUP BY p_brand, tier""",

    "q58_region_rollup" ->
      """SELECT r_name AS region, n_name AS nation,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q56_group_concat" ->
      """SELECT p_brand,
                array_to_string(list_sort(list(p_name))[1:5], ',') AS sample_names,
                CAST(count(*) AS BIGINT) AS n
         FROM part GROUP BY p_brand""",

    "q57_crossmodal" ->
      """WITH q AS (SELECT doc_id, n_chars,
                  CAST(length(text) AS BIGINT) AS len,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS wt,
                  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct
               FROM documents)
         SELECT e.label, CAST(count(*) AS BIGINT) AS n,
                round(avg(round(0.5 * least(q.len / 500.0, 1.0)
                      + 0.5 * least(q.wt * 1.0 / greatest(q.ws, 1), 1.0)
                      - q.punct * 1.0 / greatest(q.len, 1), 4)), 4) AS avg_quality,
                round(avg(q.n_chars), 2) AS avg_chars
         FROM q JOIN embeddings e ON q.doc_id = e.vec_id
         GROUP BY e.label""",

    "q54_weekly_active" ->
      """SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
                CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1""",

    "q55_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type
                    FROM events),
         s1 AS (SELECT u, min(t) AS t1 FROM e WHERE event_type = 'view'
                GROUP BY u),
         s2 AS (SELECT e.u, min(t) AS t2 FROM e JOIN s1 USING (u)
                WHERE event_type = 'click' AND t > t1 GROUP BY e.u),
         s3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN s2 USING (u)
                WHERE event_type = 'purchase' AND t > t2 GROUP BY e.u)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
                (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
                (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase""",

    "q52_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY 1, 2),
         idf AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         scored AS (SELECT doc_id, term, tf * n_docs / df AS score
                    FROM tf JOIN idf USING (term), n)
         SELECT doc_id, term, score, CAST(rnk AS BIGINT) AS rnk
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term) AS rnk
               FROM scored)
         WHERE rnk <= 3""",

    "q53_containment" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT id1, id2,
                inter * 1.0 / least(c1.n, c2.n) AS containment
         FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                 JOIN cnt c2 ON pr.id2 = c2.doc_id
         WHERE inter * 1.0 / least(c1.n, c2.n) >= 0.5""",

    "q51_repetition" ->
      """WITH tok AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
           FROM documents),
         c AS (SELECT doc_id, t, count(*) AS n FROM tok GROUP BY 1, 2),
         agg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
                        CAST(count(*) AS BIGINT) AS n_distinct,
                        max(n) AS top_cnt
                 FROM c GROUP BY 1)
         SELECT d.doc_id,
                COALESCE(agg.n_tokens, 0) AS n_tokens,
                COALESCE(agg.n_distinct, 0) AS n_distinct,
                COALESCE(agg.top_cnt * 1.0 / agg.n_tokens, 0.0) AS top_share
         FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""",

    "q49_histogram" ->
      """SELECT CAST(greatest(least(floor(l_extendedprice / 6000), 19), 0) AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n,
                round(min(l_extendedprice), 2) AS lo,
                round(max(l_extendedprice), 2) AS hi
         FROM lineitem GROUP BY 1""",

    "q50_star_join" ->
      """SELECT c_mktsegment, o_orderpriority,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment, o_orderpriority""",

    // Full MinHash+LSH replay: same shingles as q20; hash s = the 8-hex
    // slice s%4 of md5("<s/4>:<shingle>") (one digest = four min-wise
    // hashes), 8 bands × 2 rows, candidate pairs from band-bucket
    // equality, verified agreement ≥ 0.5 of 16 positions.
    "q82_minhash_portable" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         mh AS (SELECT doc_id, s,
                       min(substr(md5((s // 4)::VARCHAR || ':' || g),
                                  CAST(1 + 8 * (s % 4) AS INTEGER), 8)) AS h
                FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS s) seeds
                GROUP BY doc_id, s),
         sig AS (SELECT doc_id, list(h ORDER BY s) AS sig FROM mh GROUP BY doc_id),
         band AS (SELECT doc_id, b, sig[2*b+1] || '|' || sig[2*b+2] AS bk
                  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bands),
         cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
                  FROM band a JOIN band c
                    ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
         agr AS (SELECT cand.id1, cand.id2,
                        sum(CASE WHEN s1.sig[k+1] = s2.sig[k+1] THEN 1 ELSE 0 END) AS agree
                 FROM cand JOIN sig s1 ON cand.id1 = s1.doc_id
                           JOIN sig s2 ON cand.id2 = s2.doc_id
                      CROSS JOIN (SELECT unnest(range(0, 16)) AS k) ks
                 GROUP BY 1, 2)
         SELECT id1, id2, round(agree / 16.0, 4) AS est_jaccard
         FROM agr WHERE agree / 16.0 >= 0.5""",

    // Full 32-bit SimHash replay: per-shingle md5, bit j = sign of the
    // nibble-vote sum, fingerprint = 32-char bit string, 4 blocks of 8,
    // hamming over candidate pairs ≤ 6.
    "q83_simhash_portable" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         hx AS (SELECT doc_id, md5(g) AS h FROM sh),
         bits AS (SELECT doc_id, j,
                         sum(2 * (((instr('0123456789abcdef',
                                          substr(h, CAST(1 + j // 4 AS INTEGER), 1)) - 1)
                                   >> CAST(3 - j % 4 AS INTEGER)) & 1) - 1) AS v
                  FROM hx CROSS JOIN (SELECT unnest(range(0, 32)) AS j) js
                  GROUP BY doc_id, j),
         fp AS (SELECT doc_id,
                       string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS fp
                FROM bits GROUP BY doc_id),
         band AS (SELECT doc_id, b, substr(fp, CAST(1 + 8*b AS INTEGER), 8) AS bk
                  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
         cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
                  FROM band a JOIN band c
                    ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
         ham AS (SELECT cand.id1, cand.id2,
                        sum(CASE WHEN substr(f1.fp, CAST(k+1 AS INTEGER), 1)
                                  <> substr(f2.fp, CAST(k+1 AS INTEGER), 1)
                                 THEN 1 ELSE 0 END) AS hamming
                 FROM cand JOIN fp f1 ON cand.id1 = f1.doc_id
                           JOIN fp f2 ON cand.id2 = f2.doc_id
                      CROSS JOIN (SELECT unnest(range(0, 32)) AS k) ks
                 GROUP BY 1, 2)
         SELECT id1, id2, CAST(hamming AS BIGINT) AS hamming
         FROM ham WHERE hamming <= 6""",

    // Exact-sum Pearson: quantize to ints, exact decimal sums, assemble
    // in double — the same formula the Spark side evaluates, term by term.
    "q84_feature_corr" ->
      """WITH z AS (SELECT CAST(floor(l_quantity*100 + 0.5) AS DECIMAL(38,0)) AS x0,
                         CAST(floor(l_extendedprice*100 + 0.5) AS DECIMAL(38,0)) AS x1,
                         CAST(floor(l_discount*100 + 0.5) AS DECIMAL(38,0)) AS x2,
                         CAST(floor(l_tax*100 + 0.5) AS DECIMAL(38,0)) AS x3
                  FROM lineitem),
         s AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
                      sum(x0) AS s0, sum(x0*x0) AS s00,
                      sum(x1) AS s1, sum(x1*x1) AS s11,
                      sum(x2) AS s2, sum(x2*x2) AS s22,
                      sum(x3) AS s3, sum(x3*x3) AS s33,
                      sum(x0*x1) AS s01, sum(x0*x2) AS s02, sum(x0*x3) AS s03,
                      sum(x1*x2) AS s12, sum(x1*x3) AS s13, sum(x2*x3) AS s23
               FROM z)
         SELECT 'l_quantity' AS f1, 'l_extendedprice' AS f2,
                round(CAST(n*s01 - s0*s1 AS DOUBLE) /
                      (sqrt(CAST(n*s00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*s11 - s1*s1 AS DOUBLE))), 6) AS corr FROM s
         UNION ALL SELECT 'l_quantity', 'l_discount',
                round(CAST(n*s02 - s0*s2 AS DOUBLE) /
                      (sqrt(CAST(n*s00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_quantity', 'l_tax',
                round(CAST(n*s03 - s0*s3 AS DOUBLE) /
                      (sqrt(CAST(n*s00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_extendedprice', 'l_discount',
                round(CAST(n*s12 - s1*s2 AS DOUBLE) /
                      (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE)) * sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_extendedprice', 'l_tax',
                round(CAST(n*s13 - s1*s3 AS DOUBLE) /
                      (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE)) * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_discount', 'l_tax',
                round(CAST(n*s23 - s2*s3 AS DOUBLE) /
                      (sqrt(CAST(n*s22 - s2*s2 AS DOUBLE)) * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))), 6) FROM s""",

    // Per-query replay of q23's exact scoring for ten query vectors.
    "q85_ann_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 10),
         scored AS (SELECT q.query_id, e.vec_id,
                           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                          CAST(e.embedding AS DOUBLE[])))
                                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                    FROM embeddings e CROSS JOIN q
                    WHERE e.vec_id <> q.query_id)
         SELECT query_id, vec_id, cos
         FROM (SELECT query_id, vec_id, cos,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, vec_id) AS rn
               FROM scored)
         WHERE rn <= 5""",

    // All-cells IVF batch probe == brute force per query, so the oracle
    // is the same replay as q85's over this query set: the index changes
    // WHICH FILES a probe reads, never the rows it returns.
    "q98_ann_ivf_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id >= 10 AND vec_id < 20),
         scored AS (SELECT q.query_id, e.vec_id,
                           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                          CAST(e.embedding AS DOUBLE[])))
                                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                    FROM embeddings e CROSS JOIN q
                    WHERE e.vec_id <> q.query_id)
         SELECT query_id, vec_id, cos
         FROM (SELECT query_id, vec_id, cos,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, vec_id) AS rn
               FROM scored)
         WHERE rn <= 5""",

    // Median and MAD via quantile_cont (= Spark's exact percentile); the
    // unrounded |x−med| > k·MAD filter replays identically because both
    // engines compute the same doubles from the same exact percentiles.
    "q86_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                    FROM events GROUP BY 1),
         mad AS (SELECT e.event_type,
                        quantile_cont(abs(e.value - m.med), 0.5) AS mad
                 FROM events e JOIN med m USING (event_type) GROUP BY 1)
         SELECT e.event_id, e.event_type,
                round(abs(e.value - m.med) / d.mad, 4) AS score
         FROM events e JOIN med m USING (event_type)
                       JOIN mad d USING (event_type)
         WHERE d.mad > 0 AND abs(e.value - m.med) > 3 * d.mad""",

    // µs-grain ordering with the event_id tiebreak (the q38-q40/q59
    // convention) so the lag pairing is engine-independent.
    "q87_transitions" ->
      """WITH x AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
                  FROM events),
         y AS (SELECT user_id, event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id) AS prev
               FROM x)
         SELECT prev AS from_type, event_type AS to_type,
                CAST(count(*) AS BIGINT) AS n
         FROM y WHERE prev IS NOT NULL GROUP BY 1, 2""",

    // Monday-start weeks both sides; the day-diff is divisible by 7
    // exactly, so the offset arithmetic is integer-exact.
    "q88_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
                  FROM events GROUP BY 1),
         x AS (SELECT e.user_id, strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
                      CAST(datediff('day', CAST(f.cohort AS DATE),
                                    CAST(date_trunc('week', e.ts) AS DATE)) / 7
                           AS BIGINT) AS week_offset
               FROM events e JOIN f USING (user_id))
         SELECT cohort_week, week_offset,
                CAST(count(DISTINCT user_id) AS BIGINT) AS users
         FROM x GROUP BY 1, 2""",

    // min/max surface as DOUBLE both sides (string-formatting a double
    // differs between engines; the double value itself doesn't).
    "q89_profile" ->
      """SELECT 'l_quantity' AS "column",
                CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
                CAST(min(l_quantity) AS DOUBLE) AS min_v,
                CAST(max(l_quantity) AS DOUBLE) AS max_v FROM lineitem
         UNION ALL SELECT 'l_extendedprice',
                CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT l_extendedprice) AS BIGINT),
                CAST(min(l_extendedprice) AS DOUBLE),
                CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem
         UNION ALL SELECT 'l_discount',
                CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT l_discount) AS BIGINT),
                CAST(min(l_discount) AS DOUBLE),
                CAST(max(l_discount) AS DOUBLE) FROM lineitem
         UNION ALL SELECT 'l_tax',
                CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT l_tax) AS BIGINT),
                CAST(min(l_tax) AS DOUBLE),
                CAST(max(l_tax) AS DOUBLE) FROM lineitem""",

    // quantile_cont = Spark percentile (q47 parity); the clamp and the
    // rounded mean replay on identical doubles.
    "q90_winsorized" ->
      """WITH b AS (SELECT source, quantile_cont(n_chars, 0.05) AS lo,
                         quantile_cont(n_chars, 0.95) AS hi
                  FROM documents GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n,
                round(min(lo), 2) AS p_lo, round(min(hi), 2) AS p_hi,
                round(sum(greatest(least(CAST(n_chars AS DOUBLE), hi), lo))
                      / count(n_chars), 2) AS wmean
         FROM documents JOIN b USING (source) GROUP BY source""",

    // Counts aggregate first; the share/cumulative window runs over the
    // O(|labels|) result only.
    "q91_label_balance" ->
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
         SELECT label, CAST(n AS BIGINT) AS n,
                round(n / sum(n) OVER (), 6) AS share,
                round(sum(n) OVER (ORDER BY n DESC, label)
                      / sum(n) OVER (), 6) AS cum_share
         FROM c""",

    // The merged-state read view MUST equal the one-shot recompute — so
    // the oracle IS the one-shot recompute (merge associativity is the
    // property under test; the 2-dp rounds absorb double-sum ordering).
    "q92_incremental_rollup" ->
      """WITH a AS (SELECT event_type, date_trunc('week', ts) AS wk, value
                  FROM events)
         SELECT strftime(wk, '%Y-%m-%d') AS wk, event_type,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(value), 2) AS sum_v,
                round(min(value), 4) AS min_v,
                round(max(value), 4) AS max_v,
                round(sum(value) / count(*), 2) AS avg_v
         FROM a GROUP BY 1, 2""",

    // The retracted view MUST equal the one-shot recompute AFTER the CDC
    // deletes applied — so the oracle recomputes over the post-CDC base
    // (initial rows with event_id%5=0 deleted, the %3=2 third inserted).
    "q96_retract_rollup" ->
      """WITH a AS (SELECT event_type, date_trunc('week', ts) AS wk, value
                  FROM events
                  WHERE NOT (event_id % 3 <> 2 AND event_id % 5 = 0))
         SELECT strftime(wk, '%Y-%m-%d') AS wk, event_type,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(value), 2) AS sum_v,
                round(min(value), 4) AS min_v,
                round(max(value), 4) AS max_v,
                round(round(sum(value), 2) / count(*), 2) AS avg_v
         FROM a GROUP BY 1, 2""",

    // Trailing-window membership replayed as a BETWEEN join against the
    // observed-day set.
    "q95_rolling_active" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
         days AS (SELECT DISTINCT d FROM du),
         x AS (SELECT days.d AS d, du.user_id
               FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d)
         SELECT strftime(d, '%Y-%m-%d') AS d,
                CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
         FROM x GROUP BY 1""",

    // File skipping never changes the answer: the oracle is the plain
    // equality filter over the whole table.
    "q97_bloom_lookup" ->
      """SELECT doc_id, source, n_chars FROM documents WHERE doc_id = 7""",

    // Anti-join churn replayed as NOT EXISTS over the weekly user sets.
    "q94_weekly_churn" ->
      """WITH wu AS (SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk,
                          user_id
                   FROM events)
         SELECT strftime(a.wk, '%Y-%m-%d') AS wk,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS churned
         FROM wu a
         WHERE NOT EXISTS (SELECT 1 FROM wu b
                           WHERE b.user_id = a.user_id AND b.wk = a.wk + 7)
         GROUP BY 1""",

    // Salting changes the physical join, never the result: the oracle is
    // the plain three-way join + rollup.
    "q93_salted_join" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                       JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",

    // The same deterministic perturbation replayed, classified by a
    // FULL OUTER JOIN; IS DISTINCT FROM mirrors Spark's null-safe <=>.
    "q121_reconcile" ->
      """WITH l AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
         r AS (SELECT o_orderkey AS k,
                      CASE WHEN o_orderkey % 7 = 0
                           THEN round(o_totalprice * 1.1, 2)
                           ELSE o_totalprice END AS p
               FROM orders WHERE o_orderkey % 13 <> 0
               UNION ALL
               SELECT o_orderkey + 10000000 AS k, o_totalprice AS p
               FROM orders WHERE o_orderkey % 11 = 0),
         j AS (SELECT coalesce(l.k, r.k) AS k,
                      CASE WHEN l.k IS NULL THEN 'right_only'
                           WHEN r.k IS NULL THEN 'left_only'
                           WHEN l.p IS DISTINCT FROM r.p THEN 'changed'
                           ELSE 'same' END AS status
               FROM l FULL OUTER JOIN r ON l.k = r.k)
         SELECT status, CAST(count(*) AS BIGINT) AS n,
                CAST(min(k) AS BIGINT) AS min_key,
                CAST(max(k) AS BIGINT) AS max_key
         FROM j GROUP BY status""",

    // Fractions are integer-ratio doubles; the cumulative L1 keeps an
    // exact-integer numerator and divides once at the end (a windowed
    // DOUBLE sum would have engine-specific accumulation order).
    "q122_feature_drift" ->
      """WITH u AS (SELECT CAST(least(greatest(
                    floor((l_extendedprice - 0.0) / 5000.0), 0), 21) AS BIGINT)
                    AS bin,
                  CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END AS ir,
                  CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS ic
           FROM lineitem),
         c AS (SELECT bin, CAST(sum(ir) AS BIGINT) AS ref_n,
                      CAST(sum(ic) AS BIGINT) AS cur_n
               FROM u GROUP BY bin),
         t AS (SELECT bin, ref_n, cur_n,
                      CAST(sum(ref_n) OVER () AS BIGINT) AS rt,
                      CAST(sum(cur_n) OVER () AS BIGINT) AS ct
               FROM c)
         SELECT bin, ref_n, cur_n,
                round(CAST(ref_n AS DOUBLE) / CAST(rt AS DOUBLE), 4) AS ref_frac,
                round(CAST(cur_n AS DOUBLE) / CAST(ct AS DOUBLE), 4) AS cur_frac,
                round(CAST(CAST(sum(abs(cur_n * rt - ref_n * ct))
                            OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS DOUBLE)
                      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)), 4) AS cum_l1
         FROM t""",

    // Counting-only stats keep every dtype engine-exact (no cross-dtype
    // min/max formatting); the boolean flag is emitted as 0/1 BIGINT.
    "q123_column_hygiene" ->
      """WITH s AS (SELECT count(*) AS nr,
                count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS d1,
                count(o_custkey) AS c2, count(DISTINCT o_custkey) AS d2,
                count(o_orderstatus) AS c3, count(DISTINCT o_orderstatus) AS d3,
                count(o_totalprice) AS c4, count(DISTINCT o_totalprice) AS d4,
                count(o_orderpriority) AS c5, count(DISTINCT o_orderpriority) AS d5
           FROM orders)
         SELECT col_name, CAST(n_nulls AS BIGINT) AS n_nulls,
                CAST(n_distinct AS BIGINT) AS n_distinct,
                CAST(CASE WHEN n_distinct = 1 THEN 1 ELSE 0 END AS BIGINT)
                  AS is_constant
         FROM (SELECT 'o_orderkey' AS col_name, nr - c1 AS n_nulls,
                      d1 AS n_distinct FROM s
               UNION ALL SELECT 'o_custkey', nr - c2, d2 FROM s
               UNION ALL SELECT 'o_orderstatus', nr - c3, d3 FROM s
               UNION ALL SELECT 'o_totalprice', nr - c4, d4 FROM s
               UNION ALL SELECT 'o_orderpriority', nr - c5, d5 FROM s)""",

    // Zone maps change which FILES are read, never which rows come back:
    // the oracle is the plain range filter.
    "q124_zonemap_scan" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE n_chars >= 200 AND n_chars <= 400""",

    // The AS-OF-version read must reproduce generation 0's predicate
    // exactly, ignoring the later append.
    "q125_time_travel" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_totalprice < 100000 GROUP BY 1""",

    // Non-overlapping 3-token segments on the canonical tokenization
    // (same split as q20); out_len = kept lengths + single-space joins.
    "q126_boilerplate_strip" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         seg AS (SELECT doc_id, array_to_string(list_slice(toks, i*3+1, i*3+3), ' ') AS seg
                 FROM (SELECT doc_id, toks,
                              unnest(range(0, CAST(ceil(len(toks) / 3.0) AS BIGINT))) AS i
                       FROM t)),
         d AS (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM seg GROUP BY 1),
         m AS (SELECT s.doc_id, s.seg, d.seg_df FROM seg s JOIN d USING (seg))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                CAST(sum(CASE WHEN seg_df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                CAST(COALESCE(sum(CASE WHEN seg_df <= 2 THEN len(seg) END), 0)
                     + greatest(count(CASE WHEN seg_df <= 2 THEN 1 END) - 1, 0)
                     AS BIGINT) AS out_len
         FROM m GROUP BY doc_id""",

    "q127_lang_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                CAST(sum(len(text)) AS BIGINT) AS n_chars,
                round(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) * 100.0
                      / sum(len(text)), 4) AS tokens_per_100chars
         FROM documents GROUP BY lang""",

    // q24's near-dup pairs × q43's hash split: pairs straddling the
    // train/test boundary.
    "q128_split_leakage" ->
      """WITH pr AS (
           SELECT a.vec_id AS id1, b.vec_id AS id2,
                  round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(a.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])))), 6) AS cos
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id),
         sp AS (SELECT doc_id,
                       CASE WHEN substring(md5(text), 1, 1) < 'd'
                            THEN 'train' ELSE 'test' END AS split
                FROM documents)
         SELECT pr.id1, pr.id2, pr.cos, s1.split AS split1, s2.split AS split2
         FROM pr JOIN sp s1 ON pr.id1 = s1.doc_id
                 JOIN sp s2 ON pr.id2 = s2.doc_id
         WHERE pr.cos >= 0.3 AND s1.split <> s2.split""",

    "q129_kmeans_portable" -> q129OracleSql,

    // One scalar-aggregate leg per rule; range/regex/set rules skip nulls
    // (CASE over a null predicate falls to ELSE on both engines), FK
    // checks count only non-null keys, uniqueness counts rows beyond the
    // first per key.
    "q130_expectations" ->
      """WITH u AS (
           SELECT 'not_null' AS rule, 'o_custkey' AS target,
                  CAST(count(*) AS BIGINT) AS n_checked,
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'in_range', 'o_totalprice', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT (o_totalprice >= 0.0
                                     AND o_totalprice <= 400000.0)
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'matches', 'o_orderpriority', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority,
                                     '^[1-5]-')
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'one_of', 'o_orderstatus', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT (o_orderstatus IN ('O', 'F'))
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'unique', 'o_orderkey', CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'ref_integrity', 'o_custkey->customer.c_custkey',
                  CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey
           UNION ALL
           SELECT 'in_range', 'l_discount', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT (l_discount >= 0.0
                                     AND l_discount <= 0.05)
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'unique', 'l_orderkey,l_linenumber',
                  CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                       AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'ref_integrity', 'l_orderkey->orders.o_orderkey',
                  CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM (SELECT l_orderkey FROM lineitem
                 WHERE l_orderkey IS NOT NULL) l
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey)
         SELECT rule, target, n_checked, n_violations,
                n_violations = 0 AS pass
         FROM u""",

    "q131_pagerank" -> q131OracleSql,

    // HITS replayed: the same three max-normed integer half-steps.
    "q272_hits" -> q272OracleSql,

    // Negative sampling replayed: same modular md5 draws, same
    // hole/positive discards, same (draw, item) pick order.
    "q297_negative_sample" ->
      """WITH pos AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
                    CAST(l_partkey AS BIGINT) AS it
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         us AS (SELECT DISTINCT u FROM pos),
         items AS (SELECT DISTINCT it FROM pos),
         mx AS (SELECT CAST(max(it) AS BIGINT) AS mi FROM pos),
         c AS (SELECT u, j,
                 CAST(('0x' || substring(md5(CAST(u AS VARCHAR) || '#'
                   || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % mi + 1
                   AS it
               FROM us, (SELECT unnest(range(1, 11)) AS j) jj, mx),
         v AS (SELECT c.u, c.it, CAST(min(j) AS BIGINT) AS j
               FROM c JOIN items USING (it) GROUP BY 1, 2),
         neg AS (SELECT v.* FROM v LEFT JOIN pos p
                   ON v.u = p.u AND v.it = p.it
                 WHERE p.u IS NULL),
         r AS (SELECT u, it, j, row_number() OVER (PARTITION BY u
                 ORDER BY j, it) AS rk
               FROM neg)
         SELECT u AS user_id, it AS neg_item, j AS draw
         FROM r WHERE rk <= 3""",

    // Quantile-CI replayed: same cumulative ranks, same integer-radicand
    // sqrt chain (identical association order).
    "q296_quantile_ci" ->
      """WITH pv AS (SELECT event_type AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY 1, 2),
         w AS (SELECT g, v, c,
                 sum(c) OVER (PARTITION BY g ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY g) AS n
               FROM pv),
         r AS (SELECT g, v, cum, n,
                 (n * 500 + 999) // 1000 AS rm,
                 greatest(1, CAST(floor(CAST(n * 500 AS DOUBLE) / 1000.0
                   - 1.96 * sqrt(CAST(n * 500 * 500 AS DOUBLE)) / 1000.0)
                   AS BIGINT)) AS rl,
                 least(n, CAST(ceil(CAST(n * 500 AS DOUBLE) / 1000.0
                   + 1.96 * sqrt(CAST(n * 500 * 500 AS DOUBLE)) / 1000.0)
                   AS BIGINT) + 1) AS ru
               FROM w)
         SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n_rows,
                CAST(min(CASE WHEN cum >= rm THEN v END) AS BIGINT)
                  AS q_centi,
                CAST(min(CASE WHEN cum >= rl THEN v END) AS BIGINT)
                  AS ci_lo_centi,
                CAST(min(CASE WHEN cum >= ru THEN v END) AS BIGINT)
                  AS ci_hi_centi
         FROM r GROUP BY 1""",

    // Wilson replayed: same md5 arms, same pinned score-interval chain.
    "q295_wilson_arms" ->
      """WITH ex AS (SELECT DISTINCT user_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8' THEN 'A' ELSE 'B' END AS arm
                FROM events WHERE event_type = 'view'),
         cv AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase' AND value > 50.0),
         pa AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(CASE WHEN cv.user_id IS NOT NULL
                                THEN 1 ELSE 0 END) AS HUGEINT) AS c
                FROM ex LEFT JOIN cv USING (user_id) GROUP BY 1)
         SELECT arm, CAST(n AS BIGINT) AS n_users,
                CAST(c AS BIGINT) AS n_conv,
                CAST(CASE WHEN n = 0 THEN NULL
                     ELSE c * 1000000 // n END AS BIGINT) AS rate_ppm,
                CAST(CASE WHEN n = 0 THEN NULL
                     ELSE round((CAST(c AS DOUBLE) + 1.9208
                       - 1.96 * sqrt(CAST(c * (n - c) AS DOUBLE)
                           / CAST(n AS DOUBLE) + 0.9604))
                       / (CAST(n AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_lo_ppm,
                CAST(CASE WHEN n = 0 THEN NULL
                     ELSE round((CAST(c AS DOUBLE) + 1.9208
                       + 1.96 * sqrt(CAST(c * (n - c) AS DOUBLE)
                           / CAST(n AS DOUBLE) + 0.9604))
                       / (CAST(n AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_hi_ppm
         FROM pa ORDER BY arm""",

    // CA trend replayed: same dose bucketing, same cleared-denominator
    // radicands, same pinned finish.
    "q294_cochran_armitage" ->
      """WITH pu AS (SELECT user_id,
                   least(sum(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END) // 3, 3) AS s,
                   max(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY 1),
         lvl AS (SELECT s, CAST(count(*) AS HUGEINT) AS n,
                        CAST(sum(y) AS HUGEINT) AS r
                 FROM pu GROUP BY 1),
         a AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(n) AS nn,
                      sum(r) AS rr, sum(s * n) AS sn,
                      sum(s * s * n) AS s2n, sum(s * r) AS sr
               FROM lvl),
         z AS (SELECT k, nn, rr,
                 CASE WHEN k < 2 OR rr = 0 OR rr = nn
                        OR nn * s2n - sn * sn <= 0 THEN NULL
                 ELSE round(CAST(sr * nn - sn * rr AS DOUBLE)
                   * sqrt(CAST(nn AS DOUBLE))
                   / sqrt(CAST(rr * (nn - rr) * (nn * s2n - sn * sn)
                       AS DOUBLE)) * 1000, 0) END AS zm
               FROM a)
         SELECT CAST(k AS BIGINT) AS n_levels,
                CAST(nn AS BIGINT) AS n_subjects,
                CAST(rr AS BIGINT) AS n_positive,
                CAST(zm AS BIGINT) AS z_milli,
                CAST(CASE WHEN zm IS NULL THEN NULL
                     WHEN abs(zm) >= 1960 THEN 1 ELSE 0 END AS BIGINT)
                  AS significant_05
         FROM z""",

    // Good-Turing replayed: same spectrum, same r+1 self-join, same
    // floor arithmetic.
    "q293_good_turing" ->
      """WITH tk AS (SELECT string_split(lower(trim(
                  regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         f AS (SELECT t, CAST(count(*) AS BIGINT) AS r
           FROM (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    AS t
                 FROM (SELECT toks,
                         unnest(range(1, greatest(len(toks) - 2, 0) + 1))
                           AS i
                       FROM tk)) u
           GROUP BY 1),
         sp AS (SELECT r, CAST(count(*) AS BIGINT) AS nr
                FROM f GROUP BY 1),
         tot AS (SELECT CAST(coalesce(sum(r * nr), 0) AS BIGINT) AS n,
                        CAST(coalesce(sum(CASE WHEN r = 1 THEN nr END), 0)
                          AS BIGINT) AS n1
                 FROM sp)
         SELECT sp.r, sp.nr AS n_types,
                CAST((sp.r + 1) * coalesce(nx.nr, 0) * 1000 // sp.nr
                  AS BIGINT) AS r_star_milli,
                CAST(CASE WHEN tot.n = 0 THEN NULL
                     ELSE tot.n1 * 1000000 // tot.n END AS BIGINT)
                  AS p0_ppm
         FROM sp LEFT JOIN sp nx ON nx.r = sp.r + 1, tot
         WHERE sp.r <= 5""",

    // Capture-recapture replayed: same marks, same per-fingerprint
    // capture max, same Lincoln-Petersen and Chapman arithmetic.
    "q292_capture_recapture" ->
      """WITH m AS (SELECT
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             CASE WHEN substring(md5(concat('a',
                    CAST(doc_id AS VARCHAR))), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ia,
             CASE WHEN substring(md5(concat('b',
                    CAST(doc_id AS VARCHAR))), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ib
           FROM documents),
         f AS (SELECT fp, max(ia) AS ia, max(ib) AS ib FROM m GROUP BY 1),
         a AS (SELECT CAST(coalesce(sum(ia), 0) AS BIGINT) AS da,
                      CAST(coalesce(sum(ib), 0) AS BIGINT) AS db,
                      CAST(coalesce(sum(ia * ib), 0) AS BIGINT) AS dab
               FROM f)
         SELECT da AS d_a, db AS d_b, dab AS d_both,
                CAST(CASE WHEN dab = 0 THEN NULL
                     ELSE da * db // dab END AS BIGINT) AS n_hat,
                CAST((da + 1) * (db + 1) // (dab + 1) - 1 AS BIGINT)
                  AS n_hat_chapman
         FROM a""",

    // Join cardinality replayed: two histograms, exact products, same
    // floor-ppm shares and (pairs desc, key) top-k.
    "q291_join_cardinality" ->
      """WITH l AS (SELECT l_orderkey AS join_key,
                  CAST(count(*) AS HUGEINT) AS nl
           FROM lineitem GROUP BY 1),
         r AS (SELECT o_orderkey AS join_key,
                      CAST(count(*) AS HUGEINT) AS nr
               FROM orders GROUP BY 1),
         p AS (SELECT join_key, nl, nr, nl * nr AS pr
               FROM l JOIN r USING (join_key)),
         t AS (SELECT coalesce(sum(pr), 0) AS tot FROM p)
         SELECT join_key, CAST(nl AS BIGINT) AS n_left,
                CAST(nr AS BIGINT) AS n_right,
                CAST(pr AS BIGINT) AS n_pairs,
                CAST(CASE WHEN tot = 0 THEN NULL
                     ELSE pr * 1000000 // tot END AS BIGINT) AS share_ppm,
                CAST(tot AS BIGINT) AS total_pairs
         FROM p, t ORDER BY n_pairs DESC, join_key LIMIT 20""",

    // EXIF expected values derived arithmetically — a decode that
    // misreads either byte order breaks the group-count hash.
    "q290_exif_tags" ->
      """SELECT CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
                concat('2024:01:',
                  CASE WHEN 1 + doc_id % 28 < 10
                       THEN concat('0', CAST(1 + doc_id % 28 AS VARCHAR))
                       ELSE CAST(1 + doc_id % 28 AS VARCHAR) END,
                  ' 10:00:00') AS taken_at,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2""",

    // CCF replayed: same paired-day join per lag, same exact sums and
    // two-sqrt finish.
    "q289_ccf" ->
      """WITH dl AS (SELECT event_type AS s,
                   epoch_us(ts) // 86400000000 AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events WHERE event_type IN ('error', 'purchase')
            GROUP BY 1, 2),
         a AS (SELECT d, y AS x FROM dl WHERE s = 'error'),
         b AS (SELECT d, y AS yy FROM dl WHERE s = 'purchase'),
         l AS (SELECT unnest(range(-3, 4)) AS lag),
         p AS (SELECT a.d + l.lag AS d, l.lag, a.x FROM a, l),
         j AS (SELECT p.lag, p.x, b.yy FROM p JOIN b USING (d)),
         g AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(yy) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(yy AS HUGEINT) * yy) AS HUGEINT) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * yy) AS HUGEINT) AS sxy
               FROM j GROUP BY 1)
         SELECT CAST(lag AS BIGINT) AS lag,
                CAST(n AS BIGINT) AS n_pairs,
                CASE WHEN n < 2 OR n * sxx - sx * sx <= 0
                       OR n * syy - sy * sy <= 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                END AS ccf
         FROM g""",

    // Best passage replayed: hit-anchored windows, coverage-dominant
    // integer score, identical tiebreaks, list_slice snippet.
    "q288_best_passage" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         h AS (SELECT doc_id, unnest(toks) AS term,
                      generate_subscripts(toks, 1) - 1 AS pos
               FROM b),
         q AS (SELECT doc_id, term, pos FROM h
               WHERE term IN ('join', 'vector')),
         win AS (SELECT s.doc_id, s.pos AS st,
                        CAST(count(*) AS BIGINT) AS n_hits,
                        CAST(count(DISTINCT o.term) AS BIGINT) AS n_terms
                 FROM q s JOIN q o ON s.doc_id = o.doc_id
                      AND o.pos >= s.pos AND o.pos < s.pos + 8
                 GROUP BY 1, 2),
         best AS (SELECT doc_id, st, n_terms, n_hits,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY n_terms * 1000 + n_hits DESC, st) AS rk
                  FROM win),
         top AS (SELECT doc_id, st, n_terms, n_hits FROM best
                 WHERE rk = 1
                 ORDER BY n_terms * 1000 + n_hits DESC, doc_id LIMIT 10)
         SELECT t.doc_id, CAST(t.st AS BIGINT) AS start_pos,
                t.n_terms, t.n_hits,
                array_to_string(list_slice(b.toks, t.st + 1, t.st + 8),
                  ' ') AS snippet
         FROM top t JOIN b USING (doc_id)""",

    // Friedman replayed: same complete-block cells, doubled midranks
    // via the k²-bounded block self-join, cleared-denominator finish.
    "q287_friedman" ->
      """WITH c0 AS (SELECT user_id AS b, event_type AS t,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS v
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
            GROUP BY 1, 2),
         cb AS (SELECT b FROM c0 GROUP BY b HAVING count(*) = 3),
         c AS (SELECT c0.* FROM c0 JOIN cb USING (b)),
         r AS (SELECT x.b, x.t,
                 CAST(2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END)
                   + sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1
                   AS BIGINT) AS d
               FROM c x JOIN c y ON x.b = y.b GROUP BY x.b, x.t, x.v),
         pt AS (SELECT t, CAST(sum(d) AS HUGEINT) AS dj,
                       CAST(count(*) AS HUGEINT) AS n
                FROM r GROUP BY 1),
         dn AS (SELECT CAST(sum((d - 4) * (d - 4)) AS HUGEINT) AS den
                FROM r),
         nm AS (SELECT max(n) AS nb,
                       sum((dj - n * 4) * (dj - n * 4)) AS num
                FROM pt)
         SELECT CAST(nb AS BIGINT) AS n_blocks,
                CAST(3 AS BIGINT) AS k_treatments,
                CAST(CASE WHEN den = 0 THEN NULL
                     ELSE 2 * num * 1000 // den END AS BIGINT)
                  AS chi2_milli
         FROM nm, dn""",

    // Link prediction replayed: same canonical edges, same deg cap,
    // same wedge join and integer RA fold.
    "q286_link_prediction" ->
      """WITH e AS (SELECT DISTINCT
                  least(CAST(l_suppkey AS BIGINT),
                        CAST(l_partkey + 10000000 AS BIGINT)) AS x,
                  greatest(CAST(l_suppkey AS BIGINT),
                           CAST(l_partkey + 10000000 AS BIGINT)) AS y
           FROM lineitem),
         dg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) u
                GROUP BY 1),
         adj AS (SELECT a.z, a.v, dg.deg
                 FROM (SELECT x AS z, y AS v FROM e
                       UNION ALL SELECT y, x FROM e) a
                 JOIN dg ON a.z = dg.n WHERE dg.deg <= 25),
         w AS (SELECT a1.v AS v1, a2.v AS v2, a1.deg
               FROM adj a1 JOIN adj a2 ON a1.z = a2.z AND a1.v < a2.v),
         sc AS (SELECT v1, v2, CAST(count(*) AS BIGINT) AS n_common,
                       CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro
                FROM w GROUP BY 1, 2),
         ne AS (SELECT s.* FROM sc s
                LEFT JOIN e ON s.v1 = e.x AND s.v2 = e.y
                WHERE e.x IS NULL)
         SELECT v1 AS node_a, v2 AS node_b, n_common, ra_micro
         FROM ne ORDER BY ra_micro DESC, n_common DESC, node_a, node_b
         LIMIT 20""",

    // PRF replayed end to end: pass-1 BM25 → feedback tf & corpus df →
    // floor-micro Σtf·idf selection → weighted pass-2 BM25.
    "q285_prf_expand" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h1 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                       unnest(toks) AS term
                FROM b),
         tf1 AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                 FROM h1 WHERE term IN ('join', 'vector', 'slow')
                 GROUP BY 1, 2, 3),
         sc1 AS (SELECT doc_id, dl, term, tf,
                        count(*) OVER (PARTITION BY term) AS df
                 FROM tf1),
         c1 AS (SELECT doc_id,
                  CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + 0.75 * dl
                                        / (st.tt * 1.0 / st.nd)))
                         * 1000000.0 + 0.5) AS BIGINT) AS cm
                FROM sc1, st),
         fbd AS (SELECT doc_id FROM c1 GROUP BY doc_id
                 ORDER BY CAST(sum(cm) AS BIGINT) DESC, doc_id LIMIT 4),
         ftf AS (SELECT term, CAST(count(*) AS BIGINT) AS ftf
                 FROM (SELECT unnest(toks) AS term
                       FROM b JOIN fbd USING (doc_id)) u
                 WHERE term NOT IN ('join', 'vector', 'slow')
                 GROUP BY 1),
         dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS cdf
                 FROM (SELECT DISTINCT doc_id, unnest(toks) AS term
                       FROM b) u
                 WHERE term IN (SELECT term FROM ftf) GROUP BY 1),
         expq AS (SELECT f.term,
                    CAST(400 AS BIGINT) AS wm
                  FROM ftf f JOIN dfc d USING (term), st
                  ORDER BY CAST(floor((st.nd - d.cdf + 0.5) / (d.cdf + 0.5)
                           * f.ftf * 1000000.0 + 0.5) AS BIGINT) DESC,
                           f.term LIMIT 8),
         allt AS (SELECT term, wm FROM expq
                  UNION ALL
                  SELECT t.term, CAST(1000 AS BIGINT)
                  FROM (VALUES ('join'), ('vector'), ('slow')) t(term)),
         tf2 AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                 FROM h1 WHERE term IN (SELECT term FROM allt)
                 GROUP BY 1, 2, 3),
         sc2 AS (SELECT doc_id, dl, term, tf,
                        count(*) OVER (PARTITION BY term) AS df
                 FROM tf2),
         c2 AS (SELECT doc_id, a.wm,
                  CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + 0.75 * dl
                                        / (st.tt * 1.0 / st.nd)))
                         * 1000000.0 + 0.5) AS BIGINT) AS cm
                FROM sc2 JOIN allt a USING (term), st)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
                CAST(sum(wm * cm // 1000) AS BIGINT) AS score_micro
         FROM c2 GROUP BY 1
         ORDER BY score_micro DESC, doc_id LIMIT 20""",

    // MCC replayed: same confusion counts, same two-sqrt IEEE finish.
    "q284_mcc" ->
      s"""WITH $ScoredDocsSql,
         c AS (SELECT
             CAST(coalesce(sum(CASE WHEN s >= 5000 AND y = 1 THEN 1 END), 0)
               AS HUGEINT) AS tp,
             CAST(coalesce(sum(CASE WHEN s >= 5000 AND y = 0 THEN 1 END), 0)
               AS HUGEINT) AS fp,
             CAST(coalesce(sum(CASE WHEN s < 5000 AND y = 1 THEN 1 END), 0)
               AS HUGEINT) AS fn,
             CAST(coalesce(sum(CASE WHEN s < 5000 AND y = 0 THEN 1 END), 0)
               AS HUGEINT) AS tn
           FROM sc)
         SELECT CAST(tp AS BIGINT) AS n_tp, CAST(fp AS BIGINT) AS n_fp,
                CAST(fn AS BIGINT) AS n_fn, CAST(tn AS BIGINT) AS n_tn,
                CAST(CASE WHEN tp + fp + fn + tn = 0 THEN NULL
                     ELSE (tp + tn) * 1000000 // (tp + fp + fn + tn) END
                  AS BIGINT) AS accuracy_ppm,
                CAST(CASE WHEN tp + fp = 0 OR tp + fn = 0
                       OR tn + fp = 0 OR tn + fn = 0 THEN NULL
                     ELSE round(CAST(tp * tn - fp * fn AS DOUBLE)
                       / (sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE))
                          * sqrt(CAST((tn + fp) * (tn + fn) AS DOUBLE)))
                       * 1000000, 0) END AS BIGINT) AS mcc_micro
         FROM c""",

    // SRM replayed: same md5 arm split, HUGEINT cleared-denominator
    // chi-square, same 3.841 alarm line.
    "q283_srm" ->
      """WITH ex AS (SELECT DISTINCT user_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8' THEN 1 ELSE 0 END AS isa
                FROM events WHERE event_type = 'view'),
         a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                      CAST(coalesce(sum(isa), 0) AS HUGEINT) AS oa FROM ex),
         c AS (SELECT n, oa,
                      CASE WHEN n = 0 THEN NULL
                           ELSE (1000 * oa - n * 500) * (1000 * oa - n * 500)
                                * 1000 // (n * 500 * 500) END AS chi
               FROM a)
         SELECT CAST(n AS BIGINT) AS n_exposed, CAST(oa AS BIGINT) AS n_a,
                CAST(n - oa AS BIGINT) AS n_b,
                CAST(n * 500 // 1000 AS BIGINT) AS expected_a,
                CAST(chi AS BIGINT) AS chi2_milli,
                CAST(CASE WHEN chi IS NULL THEN NULL
                          WHEN chi > 3841 THEN 1 ELSE 0 END AS BIGINT) AS srm
         FROM c""",

    // MMR replayed: same pool, same pairwise sims, six unrolled greedy
    // argmax steps over BIGINT nano-unit scores.
    "q282_mmr_topk" -> q282OracleSql,

    // Expected tag size derived arithmetically: 2 frames (11+len) + 200
    // padding = 224 + len variance — proving the synchsafe round-trip.
    "q281_id3_tags" ->
      """SELECT concat('T', repeat('x', CAST(doc_id % 7 AS INT))) AS title,
                concat('A', repeat('y', CAST(doc_id % 3 AS INT))) AS artist,
                CAST(224 + doc_id % 7 + doc_id % 3 AS BIGINT) AS tag_size,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2, 3""",

    // Same symmetrized degree join, same integral-sums Pearson finish.
    "q280_assortativity" ->
      """WITH d0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
                  CAST(l_partkey + 10000000 AS BIGINT) AS b FROM lineitem),
         e AS (SELECT a, b FROM d0 UNION SELECT b, a FROM d0),
         dg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
                FROM e GROUP BY 1),
         p AS (SELECT x.deg AS dx, y.deg AS dy
               FROM e JOIN dg x ON e.a = x.node JOIN dg y ON e.b = y.node),
         s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dx) AS HUGEINT) AS sx,
                 CAST(sum(dy) AS HUGEINT) AS sy,
                 CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
                 CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy
               FROM p)
         SELECT CAST(n AS BIGINT) AS n_edges_directed,
                CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                     THEN NULL
                     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                END AS assortativity
         FROM s""",

    // Same ntile tie discipline, same cumulative fixed-point Qini.
    "q279_qini" ->
      """WITH pu AS (SELECT user_id AS u,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS pc,
                  CAST(max(CASE WHEN epoch_us(ts) >= 1705363200000000
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS cv,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events GROUP BY 1
               HAVING sum(CASE WHEN epoch_us(ts) < 1705363200000000
                     THEN 1 ELSE 0 END) > 0),
         dd AS (SELECT *, CAST(ntile(10) OVER (ORDER BY pc DESC, u)
                  AS BIGINT) AS decile FROM pu),
         bd AS (SELECT decile,
                  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS nt,
                  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS nc,
                  CAST(sum(CASE WHEN arm = 'B' THEN cv ELSE 0 END)
                    AS HUGEINT) AS ct,
                  CAST(sum(CASE WHEN arm = 'A' THEN cv ELSE 0 END)
                    AS HUGEINT) AS cc
                FROM dd GROUP BY 1),
         cm AS (SELECT decile,
                  CAST(sum(nt) OVER w AS HUGEINT) AS cnt,
                  CAST(sum(nc) OVER w AS HUGEINT) AS cnc,
                  CAST(sum(ct) OVER w AS HUGEINT) AS cct,
                  CAST(sum(cc) OVER w AS HUGEINT) AS ccc
                FROM bd
                WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
         SELECT decile, CAST(cnt AS BIGINT) AS cum_n_t,
                CAST(cnc AS BIGINT) AS cum_n_c,
                CAST(cct AS BIGINT) AS cum_conv_t,
                CAST(ccc AS BIGINT) AS cum_conv_c,
                CASE WHEN cnc = 0 THEN NULL
                     ELSE CAST(cct * 1000 - ccc * 1000 * cnt // cnc
                       AS BIGINT) END AS qini_milli
         FROM cm""",

    // Same strata, same floor milli means, same rational-pair ATT.
    "q278_cem" -> {
      val chain = (1 to 20).map(i =>
        s"(CASE WHEN pc >= ${1L << i} THEN 1 ELSE 0 END)")
        .mkString("\n                   + ")
      s"""WITH pu AS (SELECT user_id AS u,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS pc,
                  CAST(count(DISTINCT CASE
                       WHEN epoch_us(ts) < 1705363200000000
                       THEN epoch_us(ts) // 86400000000 END) AS BIGINT) AS pd,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                        AND event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS y,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events GROUP BY 1
               HAVING sum(CASE WHEN epoch_us(ts) < 1705363200000000
                     THEN 1 ELSE 0 END) > 0),
         su AS (SELECT CAST($chain AS BIGINT) AS b1,
                  least(pd, 7) AS b2, arm,
                  CAST(count(*) AS HUGEINT) AS n, sum(y) AS s
                FROM pu GROUP BY 1, 2, 3),
         tt AS (SELECT b1, b2, n AS nt, s AS st FROM su WHERE arm = 'B'),
         cc AS (SELECT b1, b2, n AS nc, s AS sc FROM su WHERE arm = 'A'),
         j AS (SELECT tt.nt, cc.nc,
                 (tt.nt IS NOT NULL AND cc.nc IS NOT NULL) AS m,
                 CASE WHEN tt.nt IS NOT NULL AND cc.nc IS NOT NULL
                      THEN tt.nt * (tt.st * 1000 // tt.nt
                                    - cc.sc * 1000 // cc.nc) END AS contrib
               FROM tt FULL OUTER JOIN cc USING (b1, b2)),
         a AS (SELECT
                 CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_strata_matched,
                 CAST(sum(CASE WHEN m THEN nt ELSE 0 END) AS BIGINT)
                   AS n_treated_matched,
                 CAST(sum(CASE WHEN NOT m THEN COALESCE(nt, 0)
                   ELSE 0 END) AS BIGINT) AS n_treated_pruned,
                 CAST(sum(CASE WHEN m THEN nc ELSE 0 END) AS BIGINT)
                   AS n_control_matched,
                 CAST(sum(CASE WHEN NOT m THEN COALESCE(nc, 0)
                   ELSE 0 END) AS BIGINT) AS n_control_pruned,
                 CAST(sum(contrib) AS BIGINT) AS att_num_milli
               FROM j)
         SELECT a.*, CASE WHEN n_treated_matched = 0 THEN NULL
                  ELSE round(CAST(att_num_milli AS DOUBLE)
                       / n_treated_matched, 4) END AS att_milli
         FROM a"""
    },

    // q218's ACF CTEs + a pivot; the same fixed-shape Q expression.
    "q277_ljung_box" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         dev AS (SELECT daily.s, daily.d, st.n,
                  st.n * daily.y - st.tot AS dv
               FROM daily JOIN st USING (s)),
         den AS (SELECT s, CAST(sum(dv * dv) AS BIGINT) AS dn,
                  CAST(max(n) AS BIGINT) AS n_days FROM dev GROUP BY 1),
         num AS (SELECT a.s, CAST(l.lag AS BIGINT) AS lag,
                  CAST(sum(a.dv * b.dv) AS BIGINT) AS nm
               FROM dev a CROSS JOIN (VALUES (1), (2), (3)) l(lag)
               JOIN dev b ON a.s = b.s AND b.d = a.d + l.lag
               GROUP BY 1, 2),
         acfv AS (SELECT num.s, num.lag, den.n_days,
                  CASE WHEN den.dn = 0 THEN NULL
                       ELSE round(CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE), 6)
                  END AS acf
               FROM num JOIN den ON num.s = den.s),
         pv AS (SELECT s, max(n_days) AS n_days,
                  max(CASE WHEN acf IS NULL THEN 1 ELSE 0 END) AS degen,
                  COALESCE(max(CASE WHEN lag = 1 THEN acf END), 0.0) AS r1,
                  COALESCE(max(CASE WHEN lag = 2 THEN acf END), 0.0) AS r2,
                  COALESCE(max(CASE WHEN lag = 3 THEN acf END), 0.0) AS r3
                FROM acfv GROUP BY 1)
         SELECT s AS event_type, CAST(n_days AS BIGINT) AS n_days,
                CAST(3 AS BIGINT) AS lags,
                CASE WHEN degen = 1 OR n_days <= 3 THEN NULL
                     ELSE round(n_days * (n_days + 2) *
                       (r1 * r1 / (n_days - 1) + r2 * r2 / (n_days - 2)
                        + r3 * r3 / (n_days - 3)), 4)
                END AS q_stat
         FROM pv""",

    // The box probe recomputed relationally — layout cannot change rows.
    "q276_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
                CAST(sum(l_partkey) AS BIGINT) AS sum_pk
         FROM lineitem
         WHERE l_orderkey >= 1000 AND l_orderkey < 2500
           AND l_partkey >= 500 AND l_partkey < 1500""",

    // Same session window, same min/max-position pair collapse.
    "q275_seq_patterns" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
                 event_type AS ty FROM events),
         g AS (SELECT u, t, eid, ty,
                 CASE WHEN lag(t) OVER w IS NULL
                           OR t - lag(t) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS news,
                 row_number() OVER w AS pos
               FROM e WINDOW w AS (PARTITION BY u ORDER BY t, eid)),
         s AS (SELECT u, ty, CAST(pos AS BIGINT) AS pos,
                 CAST(sum(news) OVER (PARTITION BY u ORDER BY t, eid
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
               FROM g),
         st AS (SELECT u, sess, ty, min(pos) AS mn, max(pos) AS mx
                FROM s GROUP BY 1, 2, 3),
         pr AS (SELECT a.ty AS ante, b.ty AS cons,
                  CAST(count(*) AS BIGINT) AS n_sessions
                FROM st a JOIN st b
                  ON a.u = b.u AND a.sess = b.sess AND a.mn < b.mx
                GROUP BY 1, 2),
         an AS (SELECT ty AS ante, CAST(count(*) AS BIGINT) AS na
                FROM st GROUP BY 1)
         SELECT p.ante, p.cons, p.n_sessions,
                CAST(p.n_sessions * 1000000 // a.na AS BIGINT) AS conf_ppm
         FROM pr p JOIN an a USING (ante)
         WHERE p.n_sessions >= 2""",

    // Same one-pass four-period user table, floor milli-cent cell means.
    "q274_did" ->
      """WITH pu AS (SELECT user_id AS u,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_pre,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_post,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1704672000000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_pl1,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1704672000000000
                        AND epoch_us(ts) < 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_pl2,
                  max(CASE WHEN epoch_us(ts) < 1705363200000000
                      THEN 1 ELSE 0 END) AS a_pre,
                  max(CASE WHEN epoch_us(ts) >= 1705363200000000
                      THEN 1 ELSE 0 END) AS a_post,
                  max(CASE WHEN epoch_us(ts) < 1704672000000000
                      THEN 1 ELSE 0 END) AS a_pl1,
                  max(CASE WHEN epoch_us(ts) >= 1704672000000000
                       AND epoch_us(ts) < 1705363200000000
                      THEN 1 ELSE 0 END) AS a_pl2,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         pa AS (SELECT arm,
                  CAST(sum(a_pre) AS HUGEINT) AS n_pre,
                  CAST(sum(a_post) AS HUGEINT) AS n_post,
                  CAST(sum(a_pl1) AS HUGEINT) AS n_pl1,
                  CAST(sum(a_pl2) AS HUGEINT) AS n_pl2,
                  sum(s_pre) AS t_pre, sum(s_post) AS t_post,
                  sum(s_pl1) AS t_pl1, sum(s_pl2) AS t_pl2
                FROM pu GROUP BY 1),
         m AS (SELECT arm,
                 CAST(n_pre AS BIGINT) AS n_pre,
                 CAST(n_post AS BIGINT) AS n_post,
                 CASE WHEN n_pre = 0 THEN NULL
                      ELSE CAST(t_pre * 1000 // n_pre AS BIGINT)
                      END AS m_pre,
                 CASE WHEN n_post = 0 THEN NULL
                      ELSE CAST(t_post * 1000 // n_post AS BIGINT)
                      END AS m_post,
                 CASE WHEN n_pl1 = 0 THEN NULL
                      ELSE CAST(t_pl1 * 1000 // n_pl1 AS BIGINT)
                      END AS m_pl1,
                 CASE WHEN n_pl2 = 0 THEN NULL
                      ELSE CAST(t_pl2 * 1000 // n_pl2 AS BIGINT)
                      END AS m_pl2
               FROM pa)
         SELECT a.n_pre AS n_a_pre, a.n_post AS n_a_post,
                b.n_pre AS n_b_pre, b.n_post AS n_b_post,
                a.m_pre AS m_a_pre, a.m_post AS m_a_post,
                b.m_pre AS m_b_pre, b.m_post AS m_b_post,
                (b.m_post - b.m_pre) - (a.m_post - a.m_pre) AS did_milli,
                (b.m_pl2 - b.m_pl1) - (a.m_pl2 - a.m_pl1)
                  AS placebo_did_milli
         FROM (SELECT * FROM m WHERE arm = 'A') a
              CROSS JOIN (SELECT * FROM m WHERE arm = 'B') b""",

    // Same doubled-midrank table, floor-milli H and tie-corrected H.
    "q273_kruskal_wallis" ->
      """WITH r AS (SELECT event_type AS g, value AS v FROM events
                WHERE event_type IS NOT NULL AND value IS NOT NULL),
         d AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM r GROUP BY 1),
         rk AS (SELECT v, m, CAST(2 * COALESCE(sum(m) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + m + 1 AS HUGEINT) AS r2 FROM d),
         g AS (SELECT r.g, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(rk.r2) AS HUGEINT) AS s
               FROM r JOIN rk ON r.v = rk.v GROUP BY 1),
         t AS (SELECT CAST(sum(CAST(m AS HUGEINT) * m * m - m)
                 AS HUGEINT) AS tie FROM d),
         a AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(s * s // n) AS HUGEINT) AS st FROM g)
         SELECT CAST(nn AS BIGINT) AS n_rows, n_groups,
           CAST(greatest(0, 3000 * st // (nn * (nn + 1))
             - 3000 * (nn + 1)) AS BIGINT) AS h_milli,
           CASE WHEN nn * nn * nn - nn - tie = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(greatest(0, (3000 * st // (nn * (nn + 1))
                       - 3000 * (nn + 1)) * (nn * nn * nn - nn)
                       // (nn * nn * nn - nn - tie)) AS BIGINT)
                END AS hc_milli
         FROM a CROSS JOIN t""",

    // q131's unrolled walk with the teleport CASE-gated to the seeds.
    "q256_ppr" -> q256OracleSql,

    // Rational-idf BM25 in micro-units: every double derives from exact
    // integer stats through the same expression tree as the Spark side,
    // and per-term contributions quantize to BIGINT before the per-doc
    // sum so accumulation order can't flip a bit.
    "q132_bm25" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                      unnest(toks) AS term
               FROM b),
         tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                FROM h WHERE term IN ('join', 'vector', 'slow')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, dl, term, tf,
                       count(*) OVER (PARTITION BY term) AS df
                FROM tf),
         c AS (SELECT doc_id,
                 CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                        / (tf + 1.2 * (0.25 + 0.75 * dl
                                       / (st.tt * 1.0 / st.nd)))
                        * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM sc, st)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
                CAST(sum(cm) AS BIGINT) AS score_micro
         FROM c GROUP BY 1 ORDER BY score_micro DESC, doc_id LIMIT 20""",

    // Per-dim [min,max] from the same double-cast values both engines
    // see; code = floor((x-mn)*255/(mx-mn) + 0.5), constant dims → 0.
    "q133_sq8_codes" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(e, 1) AS i,
                      unnest(e) AS val
               FROM v),
         st AS (SELECT i, min(val) AS mn, max(val) AS mx FROM x GROUP BY 1),
         c AS (SELECT vec_id, x.i,
                 CASE WHEN mx > mn
                      THEN CAST(floor((val - mn) * 255.0 / (mx - mn) + 0.5)
                                AS INT)
                      ELSE 0 END AS code
               FROM x JOIN st ON x.i = st.i)
         SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                  AS codes_csv
         FROM c WHERE vec_id < 20 GROUP BY 1""",

    "q134_sq8_ann" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(e, 1) AS i,
                      unnest(e) AS val
               FROM v),
         st AS (SELECT i, min(val) AS mn, max(val) AS mx FROM x GROUP BY 1),
         c AS (SELECT vec_id, x.i,
                 CASE WHEN mx > mn
                      THEN CAST(floor((val - mn) * 255.0 / (mx - mn) + 0.5)
                                AS INT)
                      ELSE 0 END AS code
               FROM x JOIN st ON x.i = st.i),
         q AS (SELECT i, code FROM c WHERE vec_id = 0)
         SELECT c.vec_id, CAST(sum(c.code * q.code) AS BIGINT) AS score_q
         FROM c JOIN q ON c.i = q.i WHERE c.vec_id <> 0
         GROUP BY 1 ORDER BY score_q DESC, vec_id LIMIT 20""",

    "q135_inverted_index" ->
      """WITH tok AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY 1, 2),
         r AS (SELECT term, doc_id, tf,
                 count(*) OVER (PARTITION BY term) AS df,
                 row_number() OVER (PARTITION BY term
                   ORDER BY tf DESC, doc_id) AS rk
               FROM tf)
         SELECT term, CAST(df AS BIGINT) AS df,
                CAST(count(*) AS BIGINT) AS n_postings,
                string_agg(doc_id || ':' || tf, '|' ORDER BY rk) AS postings
         FROM r WHERE rk <= 5
         GROUP BY term, df
         ORDER BY df DESC, term LIMIT 30""",

    // concat_ws drops NULLs on both engines, so the label list is the
    // rule order with clean rules skipped.
    "q136_quarantine" ->
      """SELECT o_orderkey, violated FROM (
           SELECT o_orderkey, concat_ws(',',
             CASE WHEN NOT (o_totalprice >= 0.0 AND o_totalprice <= 400000.0)
                  THEN 'in_range:o_totalprice' END,
             CASE WHEN NOT (o_orderstatus IN ('O', 'F'))
                  THEN 'one_of:o_orderstatus' END) AS violated
           FROM orders)
         WHERE violated <> ''""",

    "q137_ab_lift" ->
      """WITH ex AS (SELECT DISTINCT user_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8'
                        THEN 'A' ELSE 'B' END AS arm
                FROM events WHERE event_type = 'view'),
         cv AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase' AND value > 50.0),
         pa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN cv.user_id IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) AS c
                FROM ex LEFT JOIN cv USING (user_id) GROUP BY 1),
         pr AS (SELECT arm, n, c, CAST(c * 1000000 // n AS BIGINT)
                         AS rate_ppm
                FROM pa)
         SELECT a.n AS n_users_a, a.c AS n_conv_a, a.rate_ppm AS rate_ppm_a,
                b.n AS n_users_b, b.c AS n_conv_b, b.rate_ppm AS rate_ppm_b,
                CAST(CASE WHEN a.rate_ppm = 0 THEN NULL
                          ELSE b.rate_ppm * 1000000 // a.rate_ppm END
                     AS BIGINT) AS lift_ppm
         FROM (SELECT * FROM pr WHERE arm = 'A') a,
              (SELECT * FROM pr WHERE arm = 'B') b""",

    // µs-grain ages (DuckDB truncates the parquet ns — q38's rule);
    // hyperbolic decay in pure integer floor division.
    "q138_trending" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS mt FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(1000000 // (1 + (mt - epoch_us(ts)) // 86400000000))
                     AS BIGINT) AS decayed_score
         FROM events, m GROUP BY 1""",

    // The four stages are the q16/q18/q67/q104 oracle fragments chained:
    // same quality formula, same md5(nt) fingerprint survivor, same
    // 3-gram contamination semi-join, same md5-ordered budget window.
    "q140_corpus_pipeline" ->
      """WITH t AS (SELECT doc_id, source, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         q AS (SELECT doc_id, source, text, nt FROM (
                SELECT doc_id, source, text, nt,
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                        / greatest(length(text), 1), 4) AS quality
                FROM t WHERE doc_id % 97 <> 0)
               WHERE quality >= 0.5),
         s2 AS (SELECT doc_id, source, text FROM (
                 SELECT *, row_number() OVER (PARTITION BY md5(nt)
                            ORDER BY doc_id) AS rk FROM q)
                WHERE rk = 1),
         tok AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM t),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1))
                               AS i
                      FROM tok)),
         test_g AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
         contaminated AS (SELECT DISTINCT doc_id FROM sh
                          WHERE doc_id % 97 <> 0
                            AND g IN (SELECT g FROM test_g)),
         s3 AS (SELECT doc_id, source, text FROM s2
                WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         s4 AS (SELECT doc_id, source,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       AS BIGINT) AS n_tokens,
                  CAST(sum(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                           AS BIGINT))
                       OVER (PARTITION BY source ORDER BY md5(text), doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM s3)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
         FROM s4 WHERE cum <= 800 GROUP BY 1""",

    // The generation-diff legs restated as source predicates: gen 1
    // dropped the >450k tail (left_only), rewrote sub-50k statuses
    // (changed), and kept the middle band byte-identical (same).
    "q139_table_changes" ->
      """SELECT 'left_only' AS status, CAST(count(*) AS BIGINT) AS n,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders WHERE o_totalprice > 450000.0
         UNION ALL
         SELECT 'changed', CAST(count(*) AS BIGINT),
                min(o_orderkey), max(o_orderkey)
         FROM orders WHERE o_totalprice < 50000.0
         UNION ALL
         SELECT 'same', CAST(count(*) AS BIGINT),
                min(o_orderkey), max(o_orderkey)
         FROM orders
         WHERE o_totalprice >= 50000.0 AND o_totalprice <= 450000.0""",

    // Sign-bit cells over DOUBLE-cast embeddings; greedy lowest-id-wins
    // inside each cell at the same 6-dp-rounded cosine as q24.
    "q141_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, v,
                 (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bk
               FROM e),
         drp AS (SELECT DISTINCT c.bk, c.vec_id
                 FROM b a JOIN b c ON a.bk = c.bk AND a.vec_id < c.vec_id
                 WHERE round(list_dot_product(a.v, c.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.35)
         SELECT b.bk AS bucket, CAST(count(*) AS BIGINT) AS n_total,
                CAST(count(drp.vec_id) AS BIGINT) AS n_dropped,
                CAST(count(*) - count(drp.vec_id) AS BIGINT) AS n_kept
         FROM b LEFT JOIN drp ON b.bk = drp.bk AND b.vec_id = drp.vec_id
         GROUP BY b.bk""",

    // 8-token windows at stride 4 over the q82 tokenization; a window is
    // duplicated when its md5 occurs in more than one document.
    "q142_passage_dedup" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         w AS (SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
               FROM (SELECT doc_id, toks,
                            unnest(range(1, len(toks) - 6, 4)) AS i
                     FROM f)),
         d AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                              FROM w GROUP BY h) WHERE nd > 1)
         SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                CAST(count(d.h) AS BIGINT) AS n_dup_windows,
                round(count(d.h) * 1.0 / count(*), 4) AS dup_frac
         FROM w LEFT JOIN d ON w.h = d.h
         GROUP BY w.doc_id""",

    "q143_k_anonymity" ->
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
                CAST(floor(c_acctbal / 2000) AS BIGINT) AS balance_band,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM customer
         GROUP BY 1, 2, 3 HAVING count(*) < 3""",

    // Character-bigram model in integer ppm; doc score = floored mean of
    // its bigram-occurrence ppms; 20 least fluent, id tiebreak.
    "q144_fluency" ->
      """WITH c AS (SELECT doc_id,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         f AS (SELECT doc_id, nt FROM c WHERE length(nt) >= 2),
         o AS (SELECT doc_id, substr(nt, CAST(i AS INTEGER), 2) AS bg,
                      substr(nt, CAST(i AS INTEGER), 1) AS c1
               FROM (SELECT doc_id, nt, unnest(range(1, length(nt))) AS i
                     FROM f)),
         bc AS (SELECT bg, count(*) AS nbg FROM o GROUP BY 1),
         cc AS (SELECT c1, count(*) AS nc1 FROM o GROUP BY 1),
         m AS (SELECT bg, nbg * 1000000 // nc1 AS ppm
               FROM bc JOIN cc ON substr(bg, 1, 1) = cc.c1)
         SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(sum(m.ppm) // count(*) AS BIGINT) AS fluency_ppm
         FROM o JOIN m ON o.bg = m.bg
         GROUP BY o.doc_id
         ORDER BY fluency_ppm ASC, doc_id ASC LIMIT 20""",

    "q145_bpe_merges" -> q145OracleSql,
    "q146_bpe_encode" -> q146OracleSql,

    // Per-doc quality replayed exactly as q16's formula, quantized to
    // The paged-connector round-trip preserves every row and field, so
    // the oracle is the same rollup directly over the parquet.
    "q153_paged_source" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                CAST(max(doc_id) AS BIGINT) AS max_doc_id
         FROM documents GROUP BY 1, 2""",

    // Every decoded field is a pure function of doc_id (the query
    // synthesized the WAV container from exactly these formulas), so the
    // oracle recomputes them arithmetically: a hash match proves the RIFF
    // parse returned what the writer wrote. blockAlign = ch*bits/8
    // collapses to (1 + doc_id%2)^2; duration is floor'd integer ms.
    "q155_audio_meta" ->
      """SELECT doc_id AS media_id,
                CAST(44 + (200 + doc_id % 100)
                     * ((1 + doc_id % 2) * (1 + doc_id % 2)) AS BIGINT) AS size_bytes,
                CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
                CAST(1 + doc_id % 2 AS INT) AS channels,
                CAST(8 * (1 + doc_id % 2) AS INT) AS bits_per_sample,
                CAST(200 + doc_id % 100 AS BIGINT) AS n_samples,
                CAST((200 + doc_id % 100) * 1000
                     // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
         FROM documents""",

    // q155's contract for the video leg: every decoded field re-derived
    // from doc_id; duration floor'd at the synth timescale of 600.
    "q156_video_meta" ->
      """SELECT doc_id AS media_id,
                CAST(160 * (1 + doc_id % 8) AS INT) AS width,
                CAST(120 * (1 + doc_id % 6) AS INT) AS height,
                CAST((600 + doc_id % 1000) * 1000 // 600 AS BIGINT) AS duration_ms
         FROM documents""",

    // The warehouse round-trip preserves rows bit-exactly and skipping is
    // planning-only, so the oracle is the predicate on the parquet.
    "q158_warehouse_skip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM orders
         WHERE o_orderkey >= 1000 AND o_orderkey < 3000
         GROUP BY 1""",

    // The warehouse answers this from sidecar metadata; the oracle runs
    // the honest full aggregate over the raw table — exact equality IS
    // the soundness claim (min/max compare single stored values, count
    // sums per-file longs: nothing accumulation-order-sensitive).
    "q159_metadata_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
                min(CAST(l_quantity AS DOUBLE)) AS min_qty,
                max(CAST(l_quantity AS DOUBLE)) AS max_qty,
                min(strftime(l_shipdate, '%Y-%m-%d')) AS min_ship,
                max(strftime(l_shipdate, '%Y-%m-%d')) AS max_ship
         FROM lineitem""",

    // Shard = count of 16-bit hex boundaries ≤ the md5(seed:id) prefix —
    // fixed-width lowercase hex compares replay the Spark assignment
    // verbatim (8 shards → boundaries at i*0x2000).
    "q160_epoch_shards" ->
      """WITH t AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tok,
                  substring(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 4) AS h
           FROM documents),
         a AS (SELECT doc_id, tok,
                  CAST((CASE WHEN h >= '2000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= '4000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= '6000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= '8000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= 'a000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= 'c000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= 'e000' THEN 1 ELSE 0 END) AS BIGINT)
                    AS shard
               FROM t)
         SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM a GROUP BY shard""",

    "q161_source_cap" ->
      """SELECT source, doc_id, rk FROM (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))), doc_id)
                    AS rk
           FROM documents) WHERE rk <= 40""",

    // 48-bit md5 prefix parsed exactly via the 0x-literal cast; XOR is
    // order-independent, so the checksum replays under any row order.
    "q162_release_manifest" ->
      """WITH t AS (SELECT source,
                  CASE WHEN substring(md5(text), 1, 1) < 'd'
                       THEN 'train' ELSE 'test' END AS split,
                  CAST(('0x' || substring(md5(text), 1, 12)) AS BIGINT) AS h,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tok,
                  CAST(length(text) AS BIGINT) AS nc
           FROM documents)
         SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                CAST(sum(nc) AS BIGINT) AS n_chars,
                CAST(bit_xor(h) AS BIGINT) AS checksum48
         FROM t GROUP BY 1, 2""",

    // q155's contract for the FLAC leg: a lone-STREAMINFO container is
    // exactly 42 bytes; every other field is doc_id arithmetic.
    "q166_flac_meta" ->
      """SELECT doc_id AS media_id,
                CAST(42 AS BIGINT) AS size_bytes,
                CAST(8000 * (1 + doc_id % 4) AS INT) AS sample_rate,
                CAST(1 + doc_id % 2 AS INT) AS channels,
                CAST(8 + (doc_id % 3) * 4 AS INT) AS bits_per_sample,
                CAST(300 + doc_id % 200 AS BIGINT) AS n_samples,
                CAST((300 + doc_id % 200) * 1000
                     // (8000 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms
         FROM documents""",

    // The oracle applies the delete as a WHERE NOT — exact equality is
    // the copy-on-write soundness claim (no lost rows from carried
    // files, no surviving rows from rewritten ones).
    "q165_warehouse_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM orders
         WHERE NOT (o_orderkey >= 2000 AND o_orderkey < 4000)
         GROUP BY 1""",

    // Same confusion counts; kappa with denominators cleared — both
    // engines truncate toward zero so the possibly-negative numerator
    // divides identically.
    "q243_agreement" ->
      s"""WITH $ScoredDocsSql,
         c AS (SELECT
             CAST(sum(CASE WHEN s >= 5000 THEN y ELSE 0 END) AS HUGEINT) AS tp,
             CAST(sum(CASE WHEN s >= 5000 THEN 1 - y ELSE 0 END) AS HUGEINT) AS fp,
             CAST(sum(CASE WHEN s < 5000 THEN y ELSE 0 END) AS HUGEINT) AS fn,
             CAST(sum(CASE WHEN s < 5000 THEN 1 - y ELSE 0 END) AS HUGEINT) AS tn
           FROM sc)
         SELECT CAST(5000 AS BIGINT) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(CASE WHEN tp + fp + fn + tn = 0 THEN NULL
             ELSE (tp + tn) * 1000000 // (tp + fp + fn + tn) END AS BIGINT)
             AS accuracy_ppm,
           CAST(CASE WHEN tp + fn = 0 OR tn + fp = 0 THEN NULL
             ELSE (tp * 1000000 // (tp + fn)
                 + tn * 1000000 // (tn + fp)) // 2 END AS BIGINT)
             AS balanced_accuracy_ppm,
           CAST(CASE WHEN (tp + fp + fn + tn) * (tp + fp + fn + tn)
                   - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) = 0
             THEN NULL
             ELSE ((tp + fp + fn + tn) * (tp + tn)
                 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) * 1000000
               // ((tp + fp + fn + tn) * (tp + fp + fn + tn)
                 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)))
             END AS BIGINT) AS kappa_ppm
         FROM c""",

    // Exact token membership (substring hits of longer tokens do NOT
    // count — list_contains over the same tokenizer).
    "q270_term_lookup" ->
      """SELECT doc_id, source FROM documents
         WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'),
                             'dup')""",

    // Same cleared-denominator cumulative EMD, one floor-div into ppm.
    "q271_t_closeness" ->
      """WITH k AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
             FROM customer),
         cell AS (SELECT nation, segment, band,
                    CAST(count(*) AS BIGINT) AS c
                  FROM k GROUP BY 1, 2, 3),
         gdist AS (SELECT band, CAST(count(*) AS BIGINT) AS g
                  FROM k GROUP BY 1),
         tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS m
                 FROM gdist),
         grp AS (SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n
                 FROM cell GROUP BY 1, 2),
         filled AS (SELECT gr.nation, gr.segment, gl.band, gl.g, gr.n,
                      COALESCE(cl.c, 0) AS c
                    FROM grp gr CROSS JOIN gdist gl
                    LEFT JOIN cell cl ON cl.nation = gr.nation
                      AND cl.segment = gr.segment AND cl.band = gl.band),
         cum AS (SELECT nation, segment, n,
                   CAST(sum(c) OVER (PARTITION BY nation, segment
                     ORDER BY band) AS BIGINT) AS cc,
                   CAST(sum(g) OVER (PARTITION BY nation, segment
                     ORDER BY band) AS BIGINT) AS gc
                 FROM filled),
         s AS (SELECT nation, segment, n, nn, m,
                 CAST(sum(abs(cc * nn - gc * n)) AS BIGINT) AS sv
               FROM cum CROSS JOIN tot GROUP BY 1, 2, 3, 4, 5)
         SELECT nation, segment, n AS n_rows,
                CAST(sv * 1000000 // (n * nn * (m - 1)) AS BIGINT) AS emd_ppm
         FROM s WHERE sv * 1000000 // (n * nn * (m - 1)) > 100000""",

    // Same cumulative window and (metric desc, threshold asc) argmax.
    "q269_operating_point" ->
      s"""WITH $ScoredDocsSql,
         g AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                 CAST(count(*) - sum(y) AS HUGEINT) AS n
               FROM sc GROUP BY 1),
         c AS (SELECT s,
                 sum(p) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
                   AS tp,
                 sum(n) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
                   AS fp,
                 sum(p) OVER () AS pt, sum(n) OVER () AS nt
               FROM g),
         m AS (SELECT s,
                 CASE WHEN pt = 0 OR nt = 0 THEN NULL
                      ELSE tp * 1000000 // pt
                         + (nt - fp) * 1000000 // nt - 1000000 END AS j,
                 CASE WHEN pt = 0 THEN NULL
                      ELSE 2 * tp * 1000000
                           // (2 * tp + fp + (pt - tp)) END AS f1
               FROM c)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_thresholds,
           (SELECT CAST(s AS BIGINT) FROM m WHERE j IS NOT NULL
            ORDER BY j DESC, s ASC LIMIT 1) AS best_j_threshold,
           (SELECT CAST(j AS BIGINT) FROM m WHERE j IS NOT NULL
            ORDER BY j DESC, s ASC LIMIT 1) AS best_j_ppm,
           (SELECT CAST(s AS BIGINT) FROM m WHERE f1 IS NOT NULL
            ORDER BY f1 DESC, s ASC LIMIT 1) AS best_f1_threshold,
           (SELECT CAST(f1 AS BIGINT) FROM m WHERE f1 IS NOT NULL
            ORDER BY f1 DESC, s ASC LIMIT 1) AS best_f1_ppm""",

    // The decode is the identity on the synth fixtures, so the oracle
    // replays the arithmetic alone.
    "q268_gif_frames" ->
      """SELECT 1 + doc_id % 5 AS frames,
                1 + doc_id % 5 AS frames_decoded,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2""",

    // One rational per series over the daily table.
    "q267_fano" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS HUGEINT) AS y
             FROM events GROUP BY 1, 2)
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS n_events,
           CAST(CASE WHEN sum(y) = 0 THEN NULL
                ELSE (count(*) * sum(y * y) - sum(y) * sum(y)) * 1000000
                     // (count(*) * sum(y)) END AS BIGINT) AS fano_ppm
         FROM daily GROUP BY 1""",

    // The same md5 fold thresholds (65536/4 = 16384 → '4000', '8000',
    // 'c000') and exact out-of-fold means.
    "q266_target_encoding" ->
      """WITH r AS (SELECT lang AS category,
           CAST((CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      >= '4000' THEN 1 ELSE 0 END)
              + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      >= '8000' THEN 1 ELSE 0 END)
              + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      >= 'c000' THEN 1 ELSE 0 END) AS BIGINT) AS fold,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
         FROM documents),
         cf AS (SELECT category, fold, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS s
                FROM r GROUP BY 1, 2),
         c AS (SELECT category, sum(n) AS nt, sum(s) AS st
               FROM cf GROUP BY 1),
         p AS (SELECT sum(nt) AS na, sum(st) AS sa FROM c)
         SELECT cf.category, cf.fold,
           CAST(c.nt - cf.n AS BIGINT) AS n_out,
           CAST(CASE WHEN c.nt - cf.n = 0 THEN NULL
                ELSE (c.st - cf.s) * 1000000 // (c.nt - cf.n) END
                AS BIGINT) AS encoding_ppm,
           CAST(CASE WHEN p.na = 0 THEN NULL
                ELSE p.sa * 1000000 // p.na END AS BIGINT) AS prior_ppm
         FROM cf JOIN c USING (category), p""",

    // Same md5 arm, same suffix-sum risk table, same quotient/remainder
    // micro splits and pinned z.
    "q264_logrank" ->
      """WITH u AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
               FROM events GROUP BY 1),
         mx AS (SELECT max(l) AS maxd FROM u),
         life AS (SELECT (l - f) AS t,
                    CASE WHEN maxd - l < 7 THEN 1 ELSE 0 END AS cens,
                    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                              1, 1) < '8' THEN 1 ELSE 0 END AS g1
                  FROM u, mx),
         byt AS (SELECT t,
                   CAST(sum(CASE WHEN g1 = 1 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS a1,
                   CAST(sum(CASE WHEN g1 = 0 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS a0,
                   CAST(sum(CASE WHEN g1 = 1 AND cens = 0 THEN 1 ELSE 0
                        END) AS HUGEINT) AS d1,
                   CAST(sum(CASE WHEN g1 = 0 AND cens = 0 THEN 1 ELSE 0
                        END) AS HUGEINT) AS d0
                 FROM life GROUP BY 1),
         rk AS (SELECT d1, d1 + d0 AS dd,
                  (sum(a1) OVER ()) - coalesce(sum(a1) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n1,
                  (sum(a0) OVER ()) - coalesce(sum(a0) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n0
                FROM byt),
         ev AS (SELECT d1, dd, n1, n0, n1 + n0 AS nn,
                  dd * n1 AS en,
                  dd * n1 * n0 * (n1 + n0 - dd) AS vn,
                  (n1 + n0) * (n1 + n0) * (n1 + n0 - 1) AS vd
                FROM rk WHERE dd > 0),
         ag AS (SELECT CAST(count(*) AS BIGINT) AS n_event_times,
                  sum(d1) AS o1,
                  sum(en // nn) * 1000000
                    + sum(((en - (en // nn) * nn) * 1000000) // nn)
                    AS e1m,
                  sum(CASE WHEN nn <= 1 THEN 0 ELSE vn // vd END) * 1000000
                    + sum(CASE WHEN nn <= 1 THEN 0
                          ELSE ((vn - (vn // vd) * vd) * 1000000) // vd
                          END) AS vm
                FROM ev)
         SELECT n_event_times, CAST(o1 AS BIGINT) AS o1_events,
           CAST(e1m AS BIGINT) AS e1_micro, CAST(vm AS BIGINT) AS v_micro,
           CAST(CASE WHEN vm IS NULL OR vm <= 0 THEN NULL
                ELSE CAST(round(CAST(o1 * 1000000 - e1m AS DOUBLE)
                     / sqrt(CAST(vm AS DOUBLE)), 0) AS BIGINT) END
                AS BIGINT) AS z_milli,
           CAST(CASE WHEN vm IS NULL OR vm <= 0 THEN NULL
                WHEN abs(CAST(round(CAST(o1 * 1000000 - e1m AS DOUBLE)
                     / sqrt(CAST(vm AS DOUBLE)), 0) AS BIGINT)) >= 1960
                THEN 1 ELSE 0 END AS BIGINT) AS significant_05
         FROM ag""",

    // Identical Cramer determinants in HUGEINT; the intercept's two
    // div-1000 floor points replay verbatim.
    "q263_ols2" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS HUGEINT) AS y,
                  CAST(sum(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS HUGEINT) AS x,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS HUGEINT) AS z
               FROM events GROUP BY 1),
         s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(z) AS sz, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(z * z) AS szz,
                 sum(x * z) AS sxz, sum(x * y) AS sxy,
                 sum(z * y) AS szy
               FROM daily),
         t AS (SELECT CAST(n AS BIGINT) AS n_days, n, sx, sz, sy,
                 n * sxx - sx * sx AS a, n * sxz - sx * sz AS b,
                 n * szz - sz * sz AS c, n * sxy - sx * sy AS dd,
                 n * szy - sz * sy AS e
               FROM s)
         SELECT n_days,
           CAST(CASE WHEN a * c - b * b = 0 THEN NULL
                ELSE (c * dd - b * e) * 1000000 // (a * c - b * b) END
                AS BIGINT) AS beta_x_ppm,
           CAST(CASE WHEN a * c - b * b = 0 THEN NULL
                ELSE (a * e - b * dd) * 1000000 // (a * c - b * b) END
                AS BIGINT) AS beta_z_ppm,
           CAST(CASE WHEN a * c - b * b = 0 OR n = 0 THEN NULL
                ELSE (sy * 1000
                  - ((c * dd - b * e) * 1000000 // (a * c - b * b))
                    * sx // 1000
                  - ((a * e - b * dd) * 1000000 // (a * c - b * b))
                    * sz // 1000) // n END AS BIGINT) AS intercept_milli
         FROM t""",

    // Three per-key countDistinct rollups unioned; lineitem columns are
    // non-null so the NULL-behavior term contributes zero here.
    "q262_fd_audit" ->
      """WITH a AS (SELECT count(DISTINCT l_suppkey)
                    + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                      AS n
               FROM lineitem GROUP BY l_orderkey),
         b AS (SELECT count(DISTINCT l_suppkey)
                    + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                      AS n
               FROM lineitem GROUP BY l_partkey),
         c AS (SELECT count(DISTINCT l_partkey)
                    + max(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
                      AS n
               FROM lineitem GROUP BY l_orderkey, l_linenumber)
         SELECT 'l_orderkey->l_suppkey' AS dependency,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_keys,
           CAST(max(n) AS BIGINT) AS max_rhs_per_key,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS violation_ppm
         FROM a
         UNION ALL
         SELECT 'l_partkey->l_suppkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(n) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT)
         FROM b
         UNION ALL
         SELECT 'l_orderkey+l_linenumber->l_partkey',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(n) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT)
         FROM c""",

    // The same md5 order, signatures, union-bottom-k and membership
    // joins — the sketch replays because its randomness is a hash.
    "q261_kmv_overlap" ->
      """WITH v AS (SELECT DISTINCT src, term
               FROM (SELECT source AS src,
                       unnest(regexp_extract_all(lower(text),
                         '[a-z0-9]+')) AS term
                     FROM documents)),
         hh AS (SELECT src, md5(term) AS h FROM v),
         s AS (SELECT src, h
               FROM (SELECT src, h, row_number() OVER (PARTITION BY src
                       ORDER BY h) AS rk FROM hh)
               WHERE rk <= 64),
         p AS (SELECT a.src AS s1, b.src AS s2
               FROM (SELECT DISTINCT src FROM s) a
               JOIN (SELECT DISTINCT src FROM s) b ON a.src < b.src),
         m AS (SELECT DISTINCT x.s1, x.s2, x.h FROM (
                 SELECT p.s1, p.s2, s.h FROM p JOIN s ON s.src = p.s1
                 UNION ALL
                 SELECT p.s1, p.s2, s.h FROM p JOIN s ON s.src = p.s2) x),
         bt AS (SELECT s1, s2, h
                FROM (SELECT s1, s2, h, row_number() OVER (
                        PARTITION BY s1, s2 ORDER BY h) AS rk FROM m)
                WHERE rk <= 64),
         j AS (SELECT bt.s1, bt.s2, CAST(count(*) AS BIGINT) AS k_used,
                 CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_both
               FROM bt
               LEFT JOIN s a ON a.src = bt.s1 AND a.h = bt.h
               LEFT JOIN s b ON b.src = bt.s2 AND b.h = bt.h
               GROUP BY 1, 2)
         SELECT s1, s2, k_used, n_both,
                CAST(n_both * 1000000 // k_used AS BIGINT)
                  AS jaccard_est_ppm
         FROM j""",

    // The identical threshold-fold bucket (generated power-of-two CASE
    // chain), so no float log exists on either engine.
    "q260_zipf_profile" -> {
      val chain = (1 to 40).map(i =>
        s"(CASE WHEN f >= ${1L << i} THEN 1 ELSE 0 END)")
        .mkString("\n                   + ")
      s"""WITH tf AS (SELECT unnest(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) AS t
               FROM documents),
         f AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM tf GROUP BY 1)
         SELECT CAST($chain AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_terms,
                CAST(sum(f) AS BIGINT) AS n_occurrences,
                min(t) AS min_term
         FROM f GROUP BY 1"""
    },

    // Same per-user min-collapse and day quantization; quantile_cont =
    // Spark percentile (q47 parity), round 2.
    "q259_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v
               FROM events WHERE event_type = 'view' GROUP BY 1),
         p AS (SELECT v.user_id,
                 min(epoch_us(e.ts)) AS p, any_value(v.v) AS v2
               FROM v JOIN events e ON e.user_id = v.user_id
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v
               GROUP BY 1),
         dly AS (SELECT (p - v2) // 86400000000 AS days FROM p)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_from,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(CASE WHEN (SELECT count(*) FROM v) = 0 THEN NULL
                ELSE count(*) * 1000000 // (SELECT count(*) FROM v) END
                AS BIGINT) AS conv_ppm,
           round(quantile_cont(days, 0.25), 2) AS p25_days,
           round(quantile_cont(days, 0.50), 2) AS p50_days,
           round(quantile_cont(days, 0.75), 2) AS p75_days,
           round(quantile_cont(days, 0.90), 2) AS p90_days
         FROM dly""",

    // The identical two-level window replay: level-1 argmax, side split
    // at the break day (inclusive left), side-local stats.
    "q258_cusum_segments" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         c AS (SELECT daily.s, daily.d, st.n, st.tot,
                 CAST(sum(st.n * daily.y - st.tot) OVER (
                   PARTITION BY daily.s ORDER BY daily.d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
               FROM daily JOIN st USING (s)),
         l1 AS (SELECT s, d AS changepoint_day,
                  CAST(abs(cs) * 1000000 // (n * tot) AS BIGINT)
                    AS cusum_ppm
                FROM (SELECT s, d, n, tot, cs,
                        row_number() OVER (PARTITION BY s
                          ORDER BY abs(cs) DESC, d ASC) AS rk
                      FROM c)
                WHERE rk = 1 AND n >= 2),
         sided AS (SELECT daily.s, daily.d, daily.y,
                     CASE WHEN daily.d <= l1.changepoint_day
                          THEN 'L' ELSE 'R' END AS side
                   FROM daily JOIN l1 USING (s)),
         st2 AS (SELECT s, side, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS tot
                 FROM sided GROUP BY 1, 2),
         c2 AS (SELECT sided.s, sided.side, sided.d, st2.n, st2.tot,
                  CAST(sum(st2.n * sided.y - st2.tot) OVER (
                    PARTITION BY sided.s, sided.side ORDER BY sided.d
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
                FROM sided JOIN st2 USING (s, side)),
         l2 AS (SELECT s, side, d AS cp_day,
                  CAST(abs(cs) * 1000000 // (n * tot) AS BIGINT) AS cp_ppm
                FROM (SELECT s, side, d, n, tot, cs,
                        row_number() OVER (PARTITION BY s, side
                          ORDER BY abs(cs) DESC, d ASC) AS rk
                      FROM c2)
                WHERE rk = 1 AND n >= 2)
         SELECT l1.s AS event_type, l1.changepoint_day, l1.cusum_ppm,
                CAST(lf.cp_day AS BIGINT) AS left_day,
                CAST(lf.cp_ppm AS BIGINT) AS left_ppm,
                CAST(rt.cp_day AS BIGINT) AS right_day,
                CAST(rt.cp_ppm AS BIGINT) AS right_ppm
         FROM l1
         LEFT JOIN (SELECT * FROM l2 WHERE side = 'L') lf USING (s)
         LEFT JOIN (SELECT * FROM l2 WHERE side = 'R') rt USING (s)""",

    // The nested form is engine-side; the data contract is the flat
    // per-order readout. The struct sort key is (ln, pk, price), so the
    // first item's pk = min pk among the min-linenumber rows (line
    // numbers are NOT unique per order in this generator).
    "q257_nested_export" ->
      """WITH w AS (SELECT l_orderkey, l_partkey, l_linenumber,
                  l_extendedprice,
                  min(l_linenumber) OVER (PARTITION BY l_orderkey) AS mln
               FROM lineitem)
         SELECT l_orderkey,
                CAST(count(*) AS BIGINT) AS n_items,
                CAST(min(CASE WHEN l_linenumber = mln THEN l_partkey END)
                     AS BIGINT) AS first_pk,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS total_cents
         FROM w GROUP BY 1""",

    // Replays the full IJG scale→estimate round trip arithmetically:
    // the Annex-K base as a literal list, Σbase = 3688.
    "q255_jpeg_quality" ->
      """WITH d AS (SELECT 1 + doc_id % 100 AS q FROM documents),
         s AS (SELECT q, CASE WHEN q < 50 THEN 5000 // q
                         ELSE 200 - 2 * q END AS sc,
                 CAST(count(*) AS BIGINT) AS n
               FROM d GROUP BY 1),
         b AS (SELECT unnest([16,11,10,16,24,40,51,61,
                              12,12,14,19,26,58,60,55,
                              14,13,16,24,40,57,69,56,
                              14,17,22,29,51,87,80,62,
                              18,22,37,56,68,109,103,77,
                              24,35,55,64,81,104,113,92,
                              49,64,78,87,103,121,120,101,
                              72,92,95,98,112,100,103,99]) AS bq),
         t AS (SELECT q, n,
                 sum(least(255, greatest(1, (bq * sc + 50) // 100))) AS sq
               FROM s, b GROUP BY 1, 2),
         e AS (SELECT q, n, (100 * sq + 1844) // 3688 AS spct FROM t)
         SELECT CAST(q AS BIGINT) AS quality,
           CAST(CASE WHEN spct <= 0 THEN 100
                WHEN spct <= 100 THEN (200 - spct) // 2
                ELSE 5000 // spct END AS BIGINT) AS quality_est,
           n AS n_docs
         FROM e""",

    // Same md5 split, same order-statistic k = ceil((n+1)(1−α)) and
    // cumulative-count q̂; coverage one floor-ppm.
    "q254_conformal" ->
      """WITH t AS (SELECT doc_id,
           greatest(least(CAST(floor(
             round(0.5 * least(length(text) / 500.0, 1.0)
               + 0.5 * least(len(regexp_extract_all(text,
                       '[A-Za-z0-9]+')) * 1.0
                   / greatest(len(regexp_split_to_array(trim(text),
                       '\s+')), 1), 1.0)
               - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                 / greatest(length(text), 1), 4) * 10000 + 0.5)
             AS BIGINT), 10000), 0) AS pred,
           CASE WHEN n_chars >= 300 THEN 10000 ELSE 0 END AS actual
         FROM documents),
         r AS (SELECT abs(actual - pred) AS r,
                 CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                           < '8' THEN 1 ELSE 0 END AS cal
               FROM t),
         n AS (SELECT CAST(count(*) AS BIGINT) AS ncal,
                 ((count(*) + 1) * 900000 + 999999) // 1000000 AS k
               FROM r WHERE cal = 1),
         cum AS (SELECT r, sum(cnt) OVER (ORDER BY r) AS cum
                 FROM (SELECT r, count(*) AS cnt FROM r WHERE cal = 1
                       GROUP BY 1)),
         qh AS (SELECT min(r) AS qhat FROM cum, n WHERE cum >= n.k)
         SELECT n.ncal AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(CASE WHEN n.k > n.ncal THEN NULL ELSE qh.qhat END
                AS BIGINT) AS qhat,
           CAST(CASE WHEN n.k > n.ncal OR count(*) = 0 THEN NULL
                ELSE sum(CASE WHEN r.r <= qh.qhat THEN 1 ELSE 0 END)
                     * 1000000 // count(*) END AS BIGINT) AS coverage_ppm,
           CAST(900000 AS BIGINT) AS target_ppm
         FROM r, n, qh WHERE r.cal = 0
         GROUP BY n.ncal, n.k, qh.qhat""",

    // Same binning, same cancelled-denominator identity in HUGEINT.
    "q253_ece" ->
      s"""WITH $ScoredDocsSql,
         g AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                 CAST(count(*) AS HUGEINT) AS ns
               FROM sc GROUP BY 1),
         b AS (SELECT least(s * 10 // 10000, 9) AS bin,
                 sum(ns) AS cnt,
                 sum(CAST(s AS HUGEINT) * ns) AS sum_s,
                 sum(p) AS pos
               FROM g GROUP BY 1),
         a AS (SELECT sum(cnt) AS nn, CAST(count(*) AS HUGEINT)
                 AS n_bins_used,
                 sum(abs(sum_s - pos * 10000)) AS gap,
                 max(abs(sum_s - pos * 10000) * 1000000
                     // (cnt * 10000)) AS mce
               FROM b)
         SELECT CAST(nn AS BIGINT) AS n,
           CAST(n_bins_used AS BIGINT) AS n_bins_used,
           CAST(CASE WHEN nn = 0 THEN NULL
                ELSE gap * 1000000 // (nn * 10000) END AS BIGINT)
             AS ece_ppm,
           CAST(mce AS BIGINT) AS mce_ppm
         FROM a""",

    // Identical vowel-group/sentence heuristics and floor points; doc
    // sums can be negative — both engines truncate toward zero.
    "q252_readability" ->
      """WITH p AS (SELECT source,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
             AS w,
           greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                         AS BIGINT),
                    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                         AS BIGINT)) AS y,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                AS BIGINT) AS s2
         FROM documents),
         d AS (SELECT source, w,
           CASE WHEN w > 0 THEN (390 * w) // s2 + (11800 * y) // w - 15590
                END AS fk,
           CASE WHEN w > 0
                THEN 206835 - (1015 * w) // s2 - (84600 * y) // w
                END AS ease
         FROM p)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty,
           CAST(CASE WHEN count(fk) = 0 THEN NULL
                ELSE sum(fk) // count(fk) END AS BIGINT) AS fk_grade_milli,
           CAST(CASE WHEN count(ease) = 0 THEN NULL
                ELSE sum(ease) // count(ease) END AS BIGINT)
             AS reading_ease_milli
         FROM d GROUP BY 1""",

    // Main after fast-forward = all orders; the tag = the even half.
    "q251_refs" ->
      """SELECT 'main' AS leg, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS price_cents
         FROM orders
         UNION ALL
         SELECT 'tag_v1', CAST(count(*) AS BIGINT),
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                     AS BIGINT)
         FROM orders WHERE o_orderkey % 2 = 0""",

    // The warehouse legs are engine-side mechanics; the data contract is
    // just the per-group rollup over the full customer slice.
    "q250_partition_evolution" ->
      """SELECT c_custkey % 7 AS grp, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS bal_cents
         FROM customer GROUP BY 1""",

    // The q16/q243 quality expression inline (same row must carry both
    // classifiers + the label); discordant counts then one rational.
    "q249_mcnemar" ->
      """WITH t AS (SELECT
           CASE WHEN greatest(least(CAST(floor(
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(len(regexp_extract_all(text,
                            '[A-Za-z0-9]+')) * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                      / greatest(length(text), 1), 4) * 10000 + 0.5)
                  AS BIGINT), 10000), 0) >= 5000 THEN 1 ELSE 0 END AS p1,
           CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 50
                THEN 1 ELSE 0 END AS p2,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
         FROM documents),
         r AS (SELECT CASE WHEN p1 = y THEN 1 ELSE 0 END AS r1,
                      CASE WHEN p2 = y THEN 1 ELSE 0 END AS r2 FROM t),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS b,
                 CAST(sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c
               FROM r)
         SELECT n, b, c,
           CAST(CASE WHEN b + c = 0 THEN NULL
                WHEN abs(b - c) <= 1 THEN 0
                ELSE (abs(b - c) - 1) * (abs(b - c) - 1) * 1000 // (b + c)
                END AS BIGINT) AS stat_milli,
           CAST(CASE WHEN b + c = 0 THEN NULL
                WHEN (CASE WHEN abs(b - c) <= 1 THEN 0
                      ELSE (abs(b - c) - 1) * (abs(b - c) - 1) * 1000
                           // (b + c) END) > 3841 THEN 1 ELSE 0 END
                AS BIGINT) AS significant_05
         FROM a""",

    // Character-class-only regexes (Java and RE2 agree per code point);
    // DuckDB counts matches via len(regexp_extract_all).
    "q248_encoding_audit" ->
      """WITH f AS (SELECT source,
           CASE WHEN regexp_matches(text,
                '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS ctl,
           CASE WHEN regexp_matches(text, '�') THEN 1 ELSE 0 END AS rpl,
           CASE WHEN regexp_matches(text,
                'Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|â€|Â£|Â°') THEN 1 ELSE 0 END AS mji,
           len(regexp_extract_all(text, '[A-Z]')) AS up,
           len(regexp_extract_all(text, '[A-Za-z]')) AS lt,
           len(regexp_extract_all(text, '[0-9]')) AS dg,
           len(regexp_extract_all(text, '[^\x00-\x7F]')) AS na,
           length(text) AS ch
         FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ctl) AS BIGINT) AS n_ctrl,
           CAST(sum(rpl) AS BIGINT) AS n_replacement,
           CAST(sum(mji) AS BIGINT) AS n_mojibake,
           CAST(sum(CASE WHEN ctl + rpl + mji = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean,
           CAST(CASE WHEN sum(lt) = 0 THEN NULL
                ELSE sum(up) * 1000000 // sum(lt) END AS BIGINT)
             AS upper_ppm,
           CAST(CASE WHEN sum(ch) = 0 THEN NULL
                ELSE sum(dg) * 1000000 // sum(ch) END AS BIGINT)
             AS digit_ppm,
           CAST(CASE WHEN sum(ch) = 0 THEN NULL
                ELSE sum(na) * 1000000 // sum(ch) END AS BIGINT)
             AS nonascii_ppm
         FROM f GROUP BY 1""",

    // Same md5 arm/bucket assignment (fixed-width hex thresholds), same
    // replicate arithmetic in HUGEINT; z replays the three pinned IEEE
    // ops verbatim.
    "q247_jackknife" -> {
      val g = 16
      val chain = (1 until g).map(i =>
        f"(CASE WHEN h >= '${i * 65536 / g}%04x' THEN 1 ELSE 0 END)")
        .mkString("\n                   + ")
      s"""WITH pu AS (SELECT user_id,
                  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS HUGEINT) AS y
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         t AS (SELECT y,
                 CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                           < '8' THEN 'A' ELSE 'B' END AS arm,
                 substring(md5(CAST(user_id AS VARCHAR)), 2, 4) AS h
               FROM pu),
         tb AS (SELECT CAST($chain AS HUGEINT) AS g, arm, y FROM t),
         pb0 AS (SELECT g,
                  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                       AS HUGEINT) AS n_ag,
                  CAST(sum(CASE WHEN arm = 'A' THEN y ELSE 0 END)
                       AS HUGEINT) AS s_ag,
                  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                       AS HUGEINT) AS n_bg,
                  CAST(sum(CASE WHEN arm = 'B' THEN y ELSE 0 END)
                       AS HUGEINT) AS s_bg
                 FROM tb GROUP BY 1),
         pb AS (SELECT gs.g, coalesce(n_ag, 0) AS n_ag,
                  coalesce(s_ag, 0) AS s_ag, coalesce(n_bg, 0) AS n_bg,
                  coalesce(s_bg, 0) AS s_bg
                FROM (SELECT CAST(range AS HUGEINT) AS g FROM range($g)) gs
                LEFT JOIN pb0 ON pb0.g = gs.g),
         tot AS (SELECT sum(n_ag) AS tna, sum(s_ag) AS tsa,
                   sum(n_bg) AS tnb, sum(s_bg) AS tsb FROM pb),
         reps AS (SELECT CASE WHEN tna - n_ag = 0 OR tnb - n_bg = 0
                    THEN NULL
                    ELSE (tsb - s_bg) * 1000000 // (tnb - n_bg)
                       - (tsa - s_ag) * 1000000 // (tna - n_ag) END AS dg
                  FROM pb, tot),
         rs AS (SELECT CAST(count(dg) AS HUGEINT) AS n_valid,
                  sum(dg) AS sd, sum(dg * dg) AS sd2 FROM reps)
         SELECT CAST(tna AS BIGINT) AS n_users_a,
           CAST(tnb AS BIGINT) AS n_users_b,
           CAST(CASE WHEN tna = 0 THEN NULL
                ELSE tsa * 1000000 // tna END AS BIGINT) AS mean_a_micro,
           CAST(CASE WHEN tnb = 0 THEN NULL
                ELSE tsb * 1000000 // tnb END AS BIGINT) AS mean_b_micro,
           CAST(CASE WHEN tna = 0 OR tnb = 0 THEN NULL
                ELSE tsb * 1000000 // tnb - tsa * 1000000 // tna END
                AS BIGINT) AS diff_micro,
           CAST(n_valid AS BIGINT) AS n_valid_buckets,
           CAST(CASE WHEN n_valid < $g
                  OR ($g - 1) * ($g * sd2 - sd * sd) < 0 THEN NULL
                ELSE CAST(round(sqrt(CAST(($g - 1)
                       * ($g * sd2 - sd * sd) AS DOUBLE))
                     / $g, 0) AS BIGINT) END AS BIGINT) AS se_micro,
           CAST(CASE WHEN n_valid < $g OR tna = 0 OR tnb = 0
                  OR ($g - 1) * ($g * sd2 - sd * sd) <= 0 THEN NULL
                ELSE CAST(round(CAST(tsb * 1000000 // tnb
                       - tsa * 1000000 // tna AS DOUBLE) * $g
                     / sqrt(CAST(($g - 1) * ($g * sd2 - sd * sd)
                            AS DOUBLE)) * 1000, 0) AS BIGINT) END
                AS BIGINT) AS z_milli
         FROM tot, rs"""
    },

    // Same per-score quotient/remainder splits in HUGEINT; every
    // division is `//` so the floors replay bit-identically.
    "q246_brier" ->
      s"""WITH $ScoredDocsSql,
         g AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                 CAST(count(*) AS HUGEINT) AS ns
               FROM sc GROUP BY 1),
         d AS (SELECT s, p, ns,
                 CAST(s AS HUGEINT) * ns - p * 10000 AS tlin,
                 p * p AS psq
               FROM g),
         e AS (SELECT sum(ns) AS nn, sum(p) AS oo,
                 sum(ns * CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS a,
                 sum(CAST(s AS HUGEINT) * p) AS b,
                 sum((tlin * tlin) // ns) AS relq,
                 sum(((tlin * tlin - ((tlin * tlin) // ns) * ns) * 1000000)
                     // ns) AS relr,
                 sum(psq // ns) AS resq,
                 sum(((psq - (psq // ns) * ns) * 1000000) // ns) AS resr
               FROM d)
         SELECT CAST(nn AS BIGINT) AS n,
           CAST((a - 2 * 10000 * b + 10000 * 10000 * oo) * 1000000
                // (nn * 10000 * 10000) AS BIGINT) AS brier_ppm,
           CAST((relq * 1000000 + relr) // (nn * 10000 * 10000) AS BIGINT)
             AS reliability_ppm,
           CAST((resq * 1000000 + resr) // nn
                - (oo * oo * 1000000) // (nn * nn) AS BIGINT)
             AS resolution_ppm,
           CAST((oo * (nn - oo) * 1000000) // (nn * nn) AS BIGINT)
             AS uncertainty_ppm,
           CAST((a - 2 * 10000 * b + 10000 * 10000 * oo) * 1000000
                // (nn * 10000 * 10000)
              - ((relq * 1000000 + relr) // (nn * 10000 * 10000)
                 - ((resq * 1000000 + resr) // nn
                    - (oo * oo * 1000000) // (nn * nn))
                 + (oo * (nn - oo) * 1000000) // (nn * nn)) AS BIGINT)
             AS decomp_gap_ppm
         FROM e""",

    // Identical packing (dim d → word d//32, bit d%32, set iff x >= 0),
    // Hamming = per-word bit_count(xor), summed.
    "q244_binary_ann" ->
      """WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding) AS val FROM embeddings),
         wd AS (SELECT vec_id, (i - 1) // 32 AS wi,
                  CAST(sum(CASE WHEN val >= 0
                    THEN CAST(1 AS BIGINT) << CAST((i - 1) % 32 AS INT)
                    ELSE 0 END) AS BIGINT) AS word
                FROM x GROUP BY 1, 2),
         q AS (SELECT wi, word FROM wd WHERE vec_id = 3)
         SELECT wd.vec_id,
                CAST(sum(bit_count(xor(wd.word, q.word))) AS BIGINT)
                  AS hamming
         FROM wd JOIN q ON wd.wi = q.wi WHERE wd.vec_id <> 3
         GROUP BY 1 ORDER BY hamming, vec_id LIMIT 20""",

    // Same Hamming CTE cut at 64 (deterministic tiebreak), then the q23
    // cosine re-rank over only the shortlist.
    "q245_binary_rerank" ->
      """WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding) AS val FROM embeddings),
         wd AS (SELECT vec_id, (i - 1) // 32 AS wi,
                  CAST(sum(CASE WHEN val >= 0
                    THEN CAST(1 AS BIGINT) << CAST((i - 1) % 32 AS INT)
                    ELSE 0 END) AS BIGINT) AS word
                FROM x GROUP BY 1, 2),
         q AS (SELECT wi, word FROM wd WHERE vec_id = 3),
         h AS (SELECT wd.vec_id,
                 sum(bit_count(xor(wd.word, q.word))) AS hamming
               FROM wd JOIN q ON wd.wi = q.wi WHERE wd.vec_id <> 3
               GROUP BY 1),
         cand AS (SELECT vec_id FROM h ORDER BY hamming, vec_id LIMIT 64),
         qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                WHERE vec_id = 3)
         SELECT e.vec_id,
                round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv)
                  / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[])))
                     * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings e JOIN cand USING (vec_id), qv
         ORDER BY cos DESC, vec_id LIMIT 10""",

    // The identical per-step floor, walked by a recursive CTE.
    "q343_nelson_aalen" ->
      """WITH u AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
             FROM events GROUP BY 1),
         lab AS (SELECT l - f AS t,
                  CASE WHEN (SELECT max(l) FROM u) - l < 7
                       THEN 1 ELSE 0 END AS cens
               FROM u),
         life0 AS (SELECT t, CAST(count(*) AS BIGINT) AS al,
                  CAST(sum(1 - cens) AS BIGINT) AS ev,
                  CAST(sum(cens) AS BIGINT) AS c
               FROM lab GROUP BY 1),
         life AS (SELECT t, ev, c,
                  CAST(sum(al) OVER () -
                    coalesce(sum(al) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
               FROM life0)
         SELECT t AS t_days, n_risk, ev AS n_events, c AS n_censored,
                CAST(sum(ev * 1000000 // n_risk) OVER (ORDER BY t
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_ppm
         FROM life""",

    "q242_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
             FROM events GROUP BY 1),
         lab AS (SELECT l - f AS t,
                  CASE WHEN (SELECT max(l) FROM u) - l < 7
                       THEN 1 ELSE 0 END AS cens
               FROM u),
         life0 AS (SELECT t, CAST(count(*) AS BIGINT) AS al,
                  CAST(sum(1 - cens) AS BIGINT) AS ev,
                  CAST(sum(cens) AS BIGINT) AS c
               FROM lab GROUP BY 1),
         life AS (SELECT t, ev, c,
                  CAST(sum(al) OVER () -
                    coalesce(sum(al) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk,
                  row_number() OVER (ORDER BY t) AS rn
               FROM life0)
         SELECT t AS t_days, n_risk, ev AS n_events, c AS n_censored,
                CAST(surv AS BIGINT) AS surv_ppm
         FROM (WITH RECURSIVE km(rn, surv) AS (
                 SELECT 0, CAST(1000000 AS HUGEINT)
                 UNION ALL
                 SELECT l.rn, km.surv * (l.n_risk - l.ev) // l.n_risk
                 FROM km JOIN life l ON l.rn = km.rn + 1)
               SELECT life.*, km.surv FROM life
               JOIN km ON life.rn = km.rn)""",

    // Same two-level aggregate; the filter keeps under-diverse groups.
    "q241_l_diversity" ->
      """WITH sv AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
                  CAST(floor(c_acctbal / 2000) AS BIGINT) AS band,
                  CAST(count(*) AS BIGINT) AS c
             FROM customer GROUP BY 1, 2, 3)
         SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_sensitive,
                CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top_share_ppm
         FROM sv GROUP BY 1, 2 HAVING count(*) < 5""",

    // The chain replayed with the SAME 8 unrolled ppm-floored steps.
    "q240_markov_attribution" -> {
      val iterCtes = (1 to 8).map { i =>
        s"""v$i AS (SELECT tv.variant, tv.f AS state,
                  CAST(sum(tv.p_ppm * v.v) // 1000000 AS HUGEINT) AS v
               FROM tv JOIN v${i - 1} v
                 ON tv.variant = v.variant AND tv.t = v.state
               GROUP BY 1, 2
             UNION ALL
             SELECT variant, 'CONV', CAST(1000000 AS HUGEINT)
             FROM variants)"""
      }.mkString(",\n         ")
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id AS id,
                  CASE WHEN event_type = 'purchase' THEN 'CONV'
                       ELSE event_type END AS st
             FROM events),
         ord AS (SELECT user_id, st,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY t, id) AS rn
               FROM ev),
         fc AS (SELECT user_id, min(rn) AS fc FROM ord
               WHERE st = 'CONV' GROUP BY 1),
         stp AS (SELECT o.user_id, o.st, o.rn,
                  lead(o.st) OVER (PARTITION BY o.user_id
                    ORDER BY o.rn) AS nxt
               FROM ord o LEFT JOIN fc ON o.user_id = fc.user_id
               WHERE fc.fc IS NULL OR o.rn <= fc.fc),
         trans AS (
           SELECT 'START' AS f, st AS t FROM stp WHERE rn = 1
           UNION ALL
           SELECT st, nxt FROM stp WHERE nxt IS NOT NULL
           UNION ALL
           SELECT st, 'NULL' FROM stp WHERE nxt IS NULL AND st <> 'CONV'),
         cnt AS (SELECT f, t, CAST(count(*) AS HUGEINT) AS c
               FROM trans GROUP BY 1, 2),
         channels AS (SELECT DISTINCT st AS ch FROM ev WHERE st <> 'CONV'),
         variants AS (SELECT ch AS variant FROM channels
               UNION ALL SELECT 'none'),
         tv AS (SELECT variant, f, t2 AS t, c,
                  CAST(c * 1000000 // sum(c) OVER (PARTITION BY variant, f)
                    AS HUGEINT) AS p_ppm
               FROM (SELECT v.variant, cnt.f,
                       CASE WHEN cnt.t = v.variant THEN 'NULL'
                            ELSE cnt.t END AS t2,
                       CAST(sum(cnt.c) AS HUGEINT) AS c
                     FROM cnt CROSS JOIN variants v
                     GROUP BY 1, 2, 3)),
         v0 AS (SELECT variant, 'CONV' AS state,
                  CAST(1000000 AS HUGEINT) AS v FROM variants),
         $iterCtes,
         strt AS (SELECT variant, v FROM v8 WHERE state = 'START'),
         b AS (SELECT coalesce(max(CASE WHEN variant = 'none' THEN v END),
                  0) AS base FROM strt),
         rr AS (SELECT ch, base,
                  greatest(0, base - coalesce(
                    (SELECT v FROM strt WHERE variant = ch), 0)) AS d
               FROM channels CROSS JOIN b)
         SELECT ch AS channel, CAST(base AS BIGINT) AS base_conv_ppm,
                CASE WHEN base = 0 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(d * 1000000 // base AS BIGINT)
                END AS removal_ppm,
                CASE WHEN sum(d) OVER () = 0 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(d * 1000000 // sum(d) OVER () AS BIGINT)
                END AS share_ppm
         FROM rr"""
    },

    // The same minimax chain: per-point substrate → prefix sums → pair
    // join (j ≤ k) → per-start running min over descending k → per-point
    // max. Floors commute with min/max, so micro-rates stay exact.
    "q239_isotonic" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s // 50 AS s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         pre AS (SELECT s, p, n,
                  sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
                  sum(p + n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS ct
                 FROM per),
         pair AS (SELECT a.s AS j, b.s AS k, b.p, b.n, b.cp, b.ct,
                  (b.cp - (a.cp - a.p)) * 1000000
                    // (b.ct - (a.ct - a.p - a.n)) AS rate
                 FROM pre a JOIN pre b ON a.s <= b.s),
         rm AS (SELECT j, k, p, n,
                  min(rate) OVER (PARTITION BY j ORDER BY k DESC
                    ROWS UNBOUNDED PRECEDING) AS run_min
                 FROM pair)
         SELECT k AS score, CAST(max(p + n) AS BIGINT) AS n_docs,
                CAST(max(p) AS BIGINT) AS n_pos,
                CAST(max(p * 1000000 // (p + n)) AS BIGINT) AS raw_ppm,
                CAST(max(run_min) AS BIGINT) AS fitted_ppm
         FROM rm GROUP BY k""",

    // The catalog round-trip is pure plumbing to SQL: a plain aggregate.
    "q237_sql_catalog" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders GROUP BY o_orderstatus""",

    // The SPJ is a plan property; the answer is a plain join-aggregate.
    "q238_bucket_spj" ->
      """SELECT o_custkey AS custkey, max(c_mktsegment) AS segment,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY o_custkey""",

    // The layout is invisible to SQL: a plain key lookup.
    "q236_bucket_lookup" ->
      """SELECT c_custkey, c_name,
                CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
         FROM customer WHERE c_custkey IN (7, 19, 83)""",

    // The same dyadic-weight integer sum; NULL lags unscore the day.
    "q360_holt_backtest" -> {
      val lNext = "(300 * q.y * 1000000 + 700 * (r.l + r.b)) // 1000"
      s"""WITH RECURSIVE daily AS (
           SELECT event_type AS s, epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         seq AS (SELECT s, y,
                        row_number() OVER (PARTITION BY s ORDER BY d) AS t
                 FROM daily),
         rec AS (
           SELECT s, t, y AS prev, y * 1000000 AS l, CAST(0 AS BIGINT) AS b,
                  CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS saen,
                  CAST(0 AS BIGINT) AS nf
           FROM seq WHERE t = 1
           UNION ALL
           SELECT q.s, q.t, q.y,
                  $lNext,
                  (100 * (($lNext) - r.l) + 900 * r.b) // 1000,
                  r.sae + abs(q.y * 1000000 - (r.l + r.b)),
                  r.saen + abs(q.y - r.prev) * 1000000,
                  r.nf + 1
           FROM rec r JOIN seq q ON q.s = r.s AND q.t = r.t + 1),
         fin AS (SELECT s, t, l, b, sae, saen, nf,
                        row_number() OVER (PARTITION BY s ORDER BY t DESC) AS rn
                 FROM rec)
         SELECT s AS event_type, CAST(t AS BIGINT) AS n_days,
                CAST(l AS BIGINT) AS level_micro,
                CAST(b AS BIGINT) AS trend_micro,
                CAST(CASE WHEN nf = 0 THEN NULL ELSE sae // nf END AS BIGINT)
                  AS mae_micro_holt,
                CAST(CASE WHEN nf = 0 THEN NULL ELSE saen // nf END AS BIGINT)
                  AS mae_micro_naive
         FROM fin WHERE rn = 1"""
    },

    "q235_ewma_backtest" -> {
      val terms = (1 to 20)
        .map(k => s"lag(y, $k) OVER w * ${1L << (20 - k)}").mkString(" + ")
      s"""WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         sc AS (SELECT s, d, y,
                  $terms AS wsum,
                  lag(y, 1) OVER w AS prev
               FROM daily WINDOW w AS (PARTITION BY s ORDER BY d)),
         f AS (SELECT s, y, wsum // ${(1L << 20) - 1} AS fc, prev
               FROM sc WHERE wsum IS NOT NULL)
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(abs(y - fc)) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_ewma,
                CAST(sum(abs(y - prev)) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_naive
         FROM f GROUP BY 1"""
    },

    // The six rules with the same integer cross-multiplied ratio tests.
    "q234_curation_rules" ->
      """WITH c AS (SELECT source,
              CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS words,
              CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) AS ac,
              CAST(len(regexp_extract_all(text, '#|…|\.\.\.')) AS BIGINT) AS symbols,
              CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits,
              CAST(length(text) AS BIGINT) AS chars,
              CAST(len(regexp_extract_all(
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                '(^| )(the|a|an|and|or|of|to|in|is|it)( |$)')) AS BIGINT) AS stop_hits,
              CASE WHEN regexp_matches(lower(text),
                'lorem ipsum|javascript|cookie') THEN 1 ELSE 0 END AS boiler
            FROM documents),
         f AS (SELECT source,
              CASE WHEN words < 5 THEN 1 ELSE 0 END AS r_short,
              CASE WHEN words > 0 AND (ac * 10 > words * 120
                OR ac * 10 < words * 20) THEN 1 ELSE 0 END AS r_wl,
              CASE WHEN symbols * 10 > words THEN 1 ELSE 0 END AS r_sy,
              CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END AS r_st,
              boiler AS r_bo,
              CASE WHEN digits * 5 > chars THEN 1 ELSE 0 END AS r_dg
            FROM c)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(r_short) AS BIGINT) AS fail_short,
                CAST(sum(r_wl) AS BIGINT) AS fail_word_len,
                CAST(sum(r_sy) AS BIGINT) AS fail_symbol,
                CAST(sum(r_st) AS BIGINT) AS fail_stopword,
                CAST(sum(r_bo) AS BIGINT) AS fail_boiler,
                CAST(sum(r_dg) AS BIGINT) AS fail_digit,
                CAST(sum(CASE WHEN r_short + r_wl + r_sy + r_st + r_bo + r_dg
                  = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
         FROM f GROUP BY 1""",

    // Both MoR deletes relationally: rows surviving EVERY vector.
    "q233_mor_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM orders
         WHERE NOT (o_totalprice > 250000)
           AND NOT (o_orderkey >= 1000 AND o_orderkey < 3000)
         GROUP BY 1""",

    // First-appearance reformulation replayed literally: vocab at a
    // checkpoint = terms whose min(doc_id) ≤ it.
    "q163_vocab_growth" ->
      """WITH cp AS (SELECT CAST(c AS BIGINT) AS checkpoint
             FROM (VALUES (50), (500), (5000), (50000), (500000)) t(c)),
         fs AS (SELECT term, min(doc_id) AS first_seen
             FROM (SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                   FROM documents)
             GROUP BY term),
         v AS (SELECT cp.checkpoint, CAST(count(*) AS BIGINT) AS vocab_size
             FROM cp JOIN fs ON fs.first_seen <= cp.checkpoint
             GROUP BY cp.checkpoint),
         tk AS (SELECT cp.checkpoint, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')))
                    AS BIGINT) AS n_tokens
             FROM cp JOIN documents d ON d.doc_id <= cp.checkpoint
             GROUP BY cp.checkpoint)
         SELECT tk.checkpoint, tk.n_docs, tk.n_tokens,
                COALESCE(v.vocab_size, 0) AS vocab_size
         FROM tk LEFT JOIN v ON tk.checkpoint = v.checkpoint""",

    // α-sampling weights replayed exactly: sqrt is correctly-rounded in
    // both engines, weights floor to micro units BEFORE the exact BIGINT
    // sum, and the budget split is one fixed double multiply-divide tree.
    "q157_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
                    AS n_tokens
           FROM documents GROUP BY source),
         w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
                    AS weight_micro FROM c),
         t AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS wt FROM w),
         a AS (SELECT w.*, least(
                  CAST(floor(1000000.0 * CAST(weight_micro AS DOUBLE)
                             / CAST(wt AS DOUBLE)) AS BIGINT),
                  n_tokens) AS target_tokens
               FROM w, t)
         SELECT source, n_docs, n_tokens, weight_micro, target_tokens,
                CAST(CASE WHEN n_tokens = 0 THEN 0
                     ELSE target_tokens * 1000000 // n_tokens END AS BIGINT)
                  AS sample_rate_ppm
         FROM a""",

    // integer basis points BEFORE aggregation (floored means, no
    // accumulation-order doubles); fingerprints as in q81.
    "q152_data_card" ->
      """WITH t AS (SELECT source, lang, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT source, lang,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tok,
                  CAST(floor(round(0.5 * least(length(text) / 500.0, 1.0)
                         + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+')) * 1.0
                                       / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
                         - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                           / greatest(length(text), 1), 4) * 10000 + 0.5) AS BIGINT) AS qbp,
                  md5(nt) AS fp
               FROM t)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                CAST(sum(qbp) // count(*) AS BIGINT) AS mean_quality_bp,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*) AS BIGINT)
                  AS dup_ppm
         FROM c GROUP BY source""",

    // 80*65536/100 = 0xcccc, 90*65536/100 = 0xe666 — the same literal
    // bounds the Scala split compiles to.
    "q151_hash_split3" ->
      """SELECT source,
                CASE WHEN substring(md5(text), 1, 4) < 'cccc' THEN 'train'
                     WHEN substring(md5(text), 1, 4) < 'e666' THEN 'val'
                     ELSE 'test' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2""",

    // The quarantine readout is fully determined by the planted corruption
    // rule, so the oracle recomputes it from the source table directly.
    "q150_jsonl_quarantine" ->
      """SELECT CASE WHEN doc_id % 97 = 0 THEN '_corrupt' ELSE source END
                  AS source,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 0
                              ELSE length(text) END) AS BIGINT) AS clean_chars
         FROM documents GROUP BY 1""",

    "q149_etl_pipeline" ->
      """WITH mxs AS (SELECT max(ts) AS mt FROM events),
         hist AS (SELECT event_id, user_id, ts, value FROM events, mxs
                  WHERE ts <= mt - INTERVAL 7 DAY),
         batch AS (SELECT event_id, user_id, ts, value FROM events, mxs
                   WHERE ts > mt - INTERVAL 14 DAY),
         merged AS (SELECT * FROM hist UNION ALL SELECT * FROM batch),
         store AS (SELECT event_id, user_id, ts, value
                   FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                                      ORDER BY ts) AS rn
                         FROM merged) WHERE rn = 1),
         weekly AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                           round(sum(value), 2) AS score
                    FROM store GROUP BY 1, 2),
         wk2 AS (SELECT *, CAST((wk - DATE '1970-01-05') / 7 AS BIGINT) AS weeknum
                 FROM weekly),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY wk
                      ORDER BY score DESC, user_id) AS rnk FROM wk2),
         charted AS (SELECT user_id, weeknum FROM ranked WHERE rnk <= 10),
         mx AS (SELECT max(weeknum) AS maxwk FROM wk2),
         islands AS (SELECT user_id, weeknum,
                            weeknum - row_number() OVER (PARTITION BY user_id
                                                         ORDER BY weeknum) AS grp
                     FROM charted),
         li AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS cnt,
                       max(weeknum) AS mxw
                FROM islands GROUP BY 1, 2),
         st AS (SELECT li.user_id, li.cnt FROM li, mx WHERE li.mxw = mx.maxwk)
         SELECT u.user_id, COALESCE(st.cnt, 0) AS weeks_on_chart
         FROM (SELECT DISTINCT user_id FROM weekly) u
         LEFT JOIN st ON u.user_id = st.user_id""",

    "q148_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, label, v,
                 (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bk
               FROM e),
         p AS (SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id,
                      round(list_dot_product(a.v, c.v)
                            / (sqrt(list_dot_product(a.v, a.v))
                               * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
               FROM b a JOIN b c ON a.bk = c.bk AND a.label <> c.label),
         r AS (SELECT anchor_id, neg_id, cos,
                      CAST(row_number() OVER (PARTITION BY anchor_id
                        ORDER BY cos DESC, neg_id ASC) AS INTEGER) AS rank
               FROM p)
         SELECT anchor_id, neg_id, cos, rank FROM r WHERE rank <= 2""",

    // q82's signature pipeline with the candidate join split store-side
    // (doc_id % 3 = 0) vs batch-side — the incremental probe replayed.
    "q147_incremental_minhash" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         mh AS (SELECT doc_id, s,
                       min(substr(md5((s // 4)::VARCHAR || ':' || g),
                                  CAST(1 + 8 * (s % 4) AS INTEGER), 8)) AS h
                FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS s) seeds
                GROUP BY doc_id, s),
         sig AS (SELECT doc_id, list(h ORDER BY s) AS sig FROM mh GROUP BY doc_id),
         band AS (SELECT doc_id, b, sig[2*b+1] || '|' || sig[2*b+2] AS bk
                  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bands),
         cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
                  FROM band a JOIN band c ON a.b = c.b AND a.bk = c.bk
                  WHERE a.doc_id % 3 = 0 AND c.doc_id % 3 <> 0),
         agr AS (SELECT cand.id1, cand.id2,
                        sum(CASE WHEN s1.sig[k+1] = s2.sig[k+1] THEN 1 ELSE 0 END) AS agree
                 FROM cand JOIN sig s1 ON cand.id1 = s1.doc_id
                           JOIN sig s2 ON cand.id2 = s2.doc_id
                      CROSS JOIN (SELECT unnest(range(0, 16)) AS k) ks
                 GROUP BY 1, 2)
         SELECT id1, id2, round(agree / 16.0, 4) AS est_jaccard
         FROM agr WHERE agree / 16.0 >= 0.5""",

    // q141's sign-cell + 6-dp cosine replay, split store (id%3=0) vs
    // batch (id%3<>0) like q147.
    "q154_incremental_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, v,
                 (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bk
               FROM e)
         SELECT a.vec_id AS id1, c.vec_id AS id2,
                round(list_dot_product(a.v, c.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
         FROM b a JOIN b c ON a.bk = c.bk
         WHERE a.vec_id % 3 = 0 AND c.vec_id % 3 <> 0
           AND round(list_dot_product(a.v, c.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.35""",

    // Mann-Whitney midrank AUC replayed literally: per-distinct-score
    // (p, n) counts, a cumulative negatives-below window over the
    // bounded per-score table, 2U kept integral, floor-ppm at the end.
    "q167_roc_auc" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         cum AS (SELECT s, p, n,
                   COALESCE(sum(n) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS nlt
                 FROM per),
         agg AS (SELECT sum(p * (2 * nlt + n)) AS num2,
                        sum(p) AS pos, sum(n) AS neg
                 FROM cum)
         SELECT CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
                CAST(CASE WHEN pos = 0 OR neg = 0 THEN NULL
                     ELSE num2 * 1000000 // (2 * pos * neg) END AS BIGINT)
                  AS auc_ppm,
                CAST(CASE WHEN pos = 0 OR neg = 0 THEN NULL
                     ELSE 2 * (num2 * 1000000 // (2 * pos * neg)) - 1000000
                     END AS BIGINT) AS gini_ppm
         FROM agg""",

    "q366_avg_precision" ->
      s"""WITH sc AS (SELECT greatest(least(CAST(floor(
                round(0.5 * least(length(text) / 500.0, 1.0)
                  + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+')) * 1.0
                          / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 1.0)
                  - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                    / greatest(length(text), 1), 4) * 10000 + 0.5) AS BIGINT),
                10000), 0) AS s,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         cum AS (SELECT s, p, n,
                   COALESCE(sum(p) OVER (ORDER BY s DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cp,
                   COALESCE(sum(p + n) OVER (ORDER BY s DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cr
                 FROM per),
         terms AS (SELECT (cp + j) * 1000000000 // (cr + j) AS t_opt,
                          (cp + j) * 1000000000 // (cr + n + j) AS t_pess
                   FROM (SELECT n, cp, cr,
                           unnest(generate_series(1, CAST(p AS BIGINT))) AS j
                         FROM cum WHERE p > 0)),
         tot AS (SELECT COALESCE(sum(p), 0) AS pos,
                        COALESCE(sum(n), 0) AS neg FROM per),
         agg AS (SELECT COALESCE(sum(t_opt), 0) AS so,
                        COALESCE(sum(t_pess), 0) AS sp FROM terms)
         SELECT CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
                CAST(CASE WHEN pos = 0 THEN NULL
                     ELSE sp // (1000 * pos) END AS BIGINT) AS ap_pess_ppm,
                CAST(CASE WHEN pos = 0 THEN NULL
                     ELSE so // (1000 * pos) END AS BIGINT) AS ap_opt_ppm
         FROM agg CROSS JOIN tot""",

    // Reliability bins: equal-width on the 1e4 scale (top edge folded
    // into bin 9), exact mean score and positive rate in floor-ppm.
    "q168_calibration" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         b AS (SELECT least(s * 10 // 10000, 9) AS bin, p, n, s FROM per)
         SELECT CAST(bin AS BIGINT) AS bin,
                CAST(sum(p + n) AS BIGINT) AS n_docs,
                CAST(sum(s * (p + n)) * 1000000
                     // (sum(p + n) * 10000) AS BIGINT) AS mean_score_ppm,
                CAST(sum(p) * 1000000 // sum(p + n) AS BIGINT)
                  AS pos_rate_ppm
         FROM b GROUP BY 1""",

    // Confusion sweep: per-score counts joined to the 9-threshold list,
    // exact TP/FP/FN/TN, floor-ppm precision/recall, F1 from the ppm
    // pair with the same NULL guards as the Spark side.
    "q169_threshold_sweep" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         th AS (SELECT CAST(t AS BIGINT) AS t FROM (VALUES (1000), (2000),
                 (3000), (4000), (5000), (6000), (7000), (8000), (9000))
                 x(t)),
         cf AS (SELECT th.t,
                  sum(CASE WHEN per.s >= th.t THEN per.p ELSE 0 END) AS tp,
                  sum(CASE WHEN per.s >= th.t THEN per.n ELSE 0 END) AS fp,
                  sum(CASE WHEN per.s < th.t THEN per.p ELSE 0 END) AS fn,
                  sum(CASE WHEN per.s < th.t THEN per.n ELSE 0 END) AS tn
                FROM th CROSS JOIN per GROUP BY th.t),
         pr AS (SELECT t, tp, fp, fn, tn,
                  CASE WHEN tp + fp = 0 THEN NULL
                       ELSE tp * 1000000 // (tp + fp) END AS prec,
                  CASE WHEN tp + fn = 0 THEN NULL
                       ELSE tp * 1000000 // (tp + fn) END AS rec
                FROM cf)
         SELECT t AS threshold, CAST(tp AS BIGINT) AS tp,
                CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
                CAST(tn AS BIGINT) AS tn,
                CAST(prec AS BIGINT) AS precision_ppm,
                CAST(rec AS BIGINT) AS recall_ppm,
                CAST(CASE WHEN COALESCE(prec, 0) + COALESCE(rec, 0) = 0
                     THEN NULL
                     ELSE 2 * COALESCE(prec, 0) * COALESCE(rec, 0)
                          // (COALESCE(prec, 0) + COALESCE(rec, 0)) END
                  AS BIGINT) AS f1_ppm
         FROM pr""",

    // CUPED replayed step by step: centi-quantized purchase values split
    // at the Jan-16 midpoint, per-user (x, y) sums, pooled θ in floor
    // ppm from exact HUGEINT sums, per-arm adjusted means with the
    // divisions in the same fixed order as the Spark side.
    "q170_cuped" ->
      """WITH pu AS (SELECT user_id,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS x,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS y,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         th AS (SELECT CAST(count(*) AS HUGEINT) AS tn,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(x * y) AS sxy
                FROM pu),
         t2 AS (SELECT tn, sx,
                  CASE WHEN tn * sxx - sx * sx = 0 THEN NULL
                       ELSE (tn * sxy - sx * sy) * 1000000
                            // (tn * sxx - sx * sx) END AS theta_ppm
                FROM th),
         pa AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
                       sum(x) AS ax, sum(y) AS ay
                FROM pu GROUP BY 1),
         adj AS (SELECT arm, n, ay * 1000000 // n AS raw_ppm,
                   CASE WHEN t2.theta_ppm IS NULL THEN ay * 1000000 // n
                        ELSE (ay * 1000000 - t2.theta_ppm * ax) // n
                             + (t2.theta_ppm * t2.sx) // t2.tn END
                     AS adj_ppm,
                   t2.theta_ppm
                 FROM pa CROSS JOIN t2)
         SELECT CAST(a.n AS BIGINT) AS n_users_a,
                CAST(b.n AS BIGINT) AS n_users_b,
                CAST(a.theta_ppm AS BIGINT) AS theta_ppm,
                CAST(a.raw_ppm AS BIGINT) AS raw_ppm_a,
                CAST(b.raw_ppm AS BIGINT) AS raw_ppm_b,
                CAST(a.adj_ppm AS BIGINT) AS adj_ppm_a,
                CAST(b.adj_ppm AS BIGINT) AS adj_ppm_b,
                CAST(b.adj_ppm - a.adj_ppm AS BIGINT) AS adj_diff_ppm
         FROM (SELECT * FROM adj WHERE arm = 'A') a
              CROSS JOIN (SELECT * FROM adj WHERE arm = 'B') b""",

    // The oracle replays MERGE relationally: base rows whose key is NOT
    // in the update set, plus the update set itself — exact equality is
    // the upsert soundness claim (no lost carried rows, no surviving
    // stale versions, all inserts present).
    "q171_warehouse_merge" ->
      """WITH upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                    o_totalprice * 2 AS o_totalprice
             FROM orders WHERE o_orderkey % 10 = 0
             UNION ALL
             SELECT o_orderkey + 10000000, 'N', 50.25
             FROM orders WHERE o_orderkey % 97 = 0),
         m AS (SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
             FROM orders o
             WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
             UNION ALL SELECT * FROM upd)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM m GROUP BY 1""",

    // The resize replayed arithmetically: out pixel (7,5) maps to source
    // (7·srcW div 8, 5·srcH div 6); BGR from the synth formulas.
    "q179_image_resize" ->
      """WITH p AS (SELECT doc_id,
                  16 + (doc_id % 8) * 2 AS sw,
                  12 + (doc_id % 6) * 2 AS sh,
                  doc_id % 251 AS seed
             FROM documents),
         m AS (SELECT doc_id, seed,
                 (7 * sw) // 8 AS sx, (5 * sh) // 6 AS sy
               FROM p)
         SELECT doc_id AS media_id, CAST(8 AS INT) AS width,
                CAST(6 AS INT) AS height, CAST(198 AS BIGINT) AS size_bytes,
                CAST((7 * sx + 13 * sy + seed) % 256 AS INT) AS last_b,
                CAST((3 * sx + 5 * sy + 11 * seed) % 256 AS INT) AS last_g,
                CAST((sx + sy + seed) % 256 AS INT) AS last_r
         FROM m""",

    // Energy stats recomputed from the same integer waveform formula.
    "q180_audio_energy" ->
      """WITH d AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents),
         s AS (SELECT doc_id, unnest(range(0, n)) AS k FROM d),
         v AS (SELECT doc_id,
                 ((31 * k + 7 + doc_id) % 65536) - 32768 AS x
               FROM s)
         SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_samples,
                CAST(max(abs(x)) AS BIGINT) AS peak_abs,
                CAST(sum(x * x) AS BIGINT) AS sum_sq
         FROM v GROUP BY 1""",

    // q140's CTE chain, counted per stage instead of collapsed.
    // Residuals vs the trailing same-dow floor mean, then the q86 MAD
    // rule (quantile_cont == Spark's exact interpolating percentile).
    "q230_seasonal_anomaly" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         w AS (SELECT s, d, y,
                 sum(y) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ssum,
                 count(*) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS scnt
               FROM daily),
         r AS (SELECT s, d, y, ssum // 3 AS fc, y - ssum // 3 AS resid
               FROM w WHERE scnt = 3),
         med AS (SELECT s, quantile_cont(resid, 0.5) AS m FROM r GROUP BY 1),
         mad AS (SELECT r.s, quantile_cont(abs(resid - m), 0.5) AS md
               FROM r JOIN med ON r.s = med.s GROUP BY 1)
         SELECT r.s AS event_type, r.d AS day, r.y AS n_events,
                CAST(fc AS BIGINT) AS expected,
                CAST(resid AS BIGINT) AS residual
         FROM r JOIN med ON r.s = med.s JOIN mad ON r.s = mad.s
         WHERE abs(resid - m) > 3.0 * md""",

    // Cohort week = first event week; cumulative centi-value per user.
    "q231_cohort_ltv" ->
      """WITH ev AS (SELECT user_id,
                  epoch_us(ts) // 604800000000 AS w,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             FROM events),
         fw AS (SELECT user_id, min(w) AS w0 FROM ev GROUP BY 1),
         cs AS (SELECT w0, CAST(count(*) AS BIGINT) AS users
               FROM fw GROUP BY 1),
         cells AS (SELECT fw.w0, ev.w - fw.w0 AS weeks_since,
                  CAST(sum(ev.c) AS BIGINT) AS cents
               FROM ev JOIN fw ON ev.user_id = fw.user_id
               GROUP BY 1, 2),
         g AS (SELECT w0, weeks_since, cents,
                  CAST(sum(cents) OVER (PARTITION BY w0 ORDER BY weeks_since
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM cells)
         SELECT g.w0 AS cohort_week, g.weeks_since, cs.users AS n_users,
                g.cents AS week_cents, g.cum AS cum_cents,
                CAST(g.cum // cs.users AS BIGINT) AS ltv_centi_per_user
         FROM g JOIN cs ON g.w0 = cs.w0""",

    // Integer S and V18; the z assembly replays the same IEEE op order.
    "q232_mann_kendall" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         p AS (SELECT a.s,
                  CAST(sum(CASE WHEN b.y > a.y THEN 1
                               WHEN b.y < a.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
               FROM daily a JOIN daily b
                 ON a.s = b.s AND a.d < b.d
               GROUP BY 1),
         n AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
         t AS (SELECT s, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
               FROM (SELECT s, y, CAST(count(*) AS BIGINT) AS t
                     FROM daily GROUP BY 1, 2) GROUP BY 1)
         SELECT p.s AS event_type, n.n AS n_days, p.s_stat,
                CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tt AS BIGINT)
                  AS var18,
                CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tt <= 0
                     THEN NULL
                     ELSE round(CAST(p.s_stat - sign(p.s_stat) AS DOUBLE)
                       * sqrt(18.0)
                       / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tt
                           AS DOUBLE)), 3)
                END AS z_corrected
         FROM p JOIN n ON p.s = n.s JOIN t ON p.s = t.s""",

    // The peel unrolled to the operator's maxRounds: rounds past
    // convergence are identity (monotone peel), so fixed-depth replay
    // equals the short-circuited run.
    "q229_kcore" -> {
      val rounds = 8
      // MATERIALIZED: each round references its predecessor three times,
      // so default CTE inlining would expand the chain exponentially
      // (3^8 base-table scans — DuckDB runs out of file handles).
      val peel = (1 to rounds).map { r =>
        s"""d$r AS MATERIALIZED (SELECT n, count(*) AS deg
               FROM (SELECT x AS n FROM e${r - 1}
                     UNION ALL SELECT y FROM e${r - 1}) GROUP BY 1),
         s$r AS MATERIALIZED (SELECT n FROM d$r WHERE deg >= 4),
         e$r AS MATERIALIZED (SELECT x, y FROM e${r - 1}
               WHERE x IN (SELECT n FROM s$r)
                 AND y IN (SELECT n FROM s$r))"""
      }.mkString(",\n         ")
      s"""WITH items AS MATERIALIZED (
               SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem WHERE l_partkey % 17 = 0),
         e0 AS MATERIALIZED (SELECT DISTINCT a.i AS x, b.i AS y
               FROM items a JOIN items b ON a.o = b.o AND a.i < b.i),
         $peel
         SELECT n AS node, CAST(count(*) AS BIGINT) AS core_degree
         FROM (SELECT x AS n FROM e$rounds UNION ALL SELECT y FROM e$rounds)
         GROUP BY 1"""
    },

    // The schedule is arithmetic on the decoded duration: frames
    // 0..min(⌊(dur−1)/step⌋, max−1), i.e. f·step < dur, f < max.
    "q228_frame_schedule" ->
      """WITH f AS (SELECT CAST(x AS BIGINT) AS frame_idx
               FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
         m AS (SELECT doc_id,
                  (600 + doc_id % 1000) * 1000 // 600 AS dur
               FROM documents)
         SELECT m.doc_id AS media_id, f.frame_idx,
                f.frame_idx * 400 AS ts_ms
         FROM m CROSS JOIN f WHERE f.frame_idx * 400 < m.dur""",

    // Same groups-atomic bucket rule over the shared scored substrate:
    // bucket = cumBefore·10 // total + 1 on the per-score table.
    "q226_gains" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                  CAST(count(*) AS HUGEINT) AS t
               FROM sc GROUP BY 1),
         c AS (SELECT s, p, t,
                  COALESCE(sum(t) OVER (ORDER BY s DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cb,
                  sum(t) OVER () AS total, sum(p) OVER () AS tp
               FROM per),
         b AS (SELECT cb * 10 // total + 1 AS bucket,
                  sum(t) AS bt, sum(p) AS bp,
                  max(total) AS total, max(tp) AS tp
               FROM c GROUP BY 1),
         g AS (SELECT bucket, bt, bp, total, tp,
                  sum(bt) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS ct,
                  sum(bp) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS cp
               FROM b)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(bt AS BIGINT) AS n_rows, CAST(bp AS BIGINT) AS n_pos,
                CAST(ct AS BIGINT) AS cum_rows,
                CAST(cp AS BIGINT) AS cum_pos,
                CAST(CASE WHEN tp = 0 THEN NULL
                     ELSE cp * 1000000 // tp END AS BIGINT) AS gain_ppm,
                CAST(CASE WHEN tp = 0 OR ct = 0 THEN NULL
                     ELSE cp * total * 1000000 // (ct * tp) END AS BIGINT)
                  AS lift_ppm
         FROM g""",

    // The divergence both tables must show after clone + independent DML
    // + source vacuum, reconstructed relationally.
    "q225_clone" ->
      """SELECT 'source' AS side, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders WHERE NOT (o_totalprice < 50000)
         UNION ALL
         SELECT 'clone', CAST(count(*) AS BIGINT),
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT)
         FROM orders WHERE NOT (o_totalprice > 300000)""",

    // Integer deviation products (dev = n·y − Σy); the n² factors cancel
    // in the ratio, so acf needs ONE exact int/int double division.
    "q218_acf" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         dev AS (SELECT daily.s, daily.d, st.n,
                  st.n * daily.y - st.tot AS dv
               FROM daily JOIN st USING (s)),
         den AS (SELECT s, CAST(sum(dv * dv) AS BIGINT) AS dn,
                  CAST(max(n) AS BIGINT) AS n_days FROM dev GROUP BY 1),
         num AS (SELECT a.s, CAST(l.lag AS BIGINT) AS lag,
                  CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(a.dv * b.dv) AS BIGINT) AS nm
               FROM dev a CROSS JOIN (VALUES (1), (2), (3)) l(lag)
               JOIN dev b ON a.s = b.s AND b.d = a.d + l.lag
               GROUP BY 1, 2)
         SELECT num.s AS event_type, num.lag, den.n_days, num.n_pairs,
                CASE WHEN den.dn = 0 THEN NULL
                     ELSE round(CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE), 6)
                END AS acf
         FROM num JOIN den ON num.s = den.s""",

    // Integer CUSUM of the ×n mean-centered counts; earliest argmax day.
    "q219_cusum" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         c AS (SELECT daily.s, daily.d, st.n, st.tot,
                 CAST(sum(st.n * daily.y - st.tot) OVER (PARTITION BY daily.s
                   ORDER BY daily.d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
               FROM daily JOIN st USING (s)),
         r AS (SELECT s, n, tot, d, abs(cs) AS sc,
                 row_number() OVER (PARTITION BY s
                   ORDER BY abs(cs) DESC, d ASC) AS rk
               FROM c)
         SELECT s AS event_type, n AS n_days, d AS changepoint_day,
                CAST(sc * 1000000 // (n * tot) AS BIGINT) AS cusum_ppm
         FROM r WHERE rk = 1""",

    // Pair statistics are enumeration-order-free: any once-per-unordered-
    // pair join (here by day; Spark by rank) yields the same counts.
    "q220_kendall" ->
      """WITH u AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS x,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
             FROM events GROUP BY 1),
         p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
               FROM u a JOIN u b ON a.d < b.d),
         s AS (SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN (x1 < x2 AND y1 < y2)
                               OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END)
                  AS BIGINT) AS concordant,
                CAST(sum(CASE WHEN (x1 < x2 AND y1 > y2)
                               OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END)
                  AS BIGINT) AS discordant,
                CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ty
               FROM p)
         SELECT n_rows, n_pairs, concordant, discordant,
                CASE WHEN n_pairs = tx OR n_pairs = ty THEN NULL
                     ELSE round(CAST(concordant - discordant AS DOUBLE)
                       / (sqrt(CAST(n_pairs - tx AS DOUBLE))
                          * sqrt(CAST(n_pairs - ty AS DOUBLE))), 6)
                END AS tau_b
         FROM s""",

    // Exact per-stratum quota: rank·100 ≤ n·80 (integer), md5(seed:id)
    // order; xor of member ids pins MEMBERSHIP, not just counts.
    "q221_stratified_split" ->
      """WITH a AS (SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))),
                      doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
             FROM documents)
         SELECT source,
                CASE WHEN rn * 100 <= n * 80 THEN 'train'
                     ELSE 'heldout' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
         FROM a GROUP BY 1, 2""",

    // Levenshtein pairs on the distinct-name substrate, first-token
    // blocks, pair volume by count arithmetic.
    "q368_soft_dedup" ->
      """WITH m AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, 'mirror', text
               FROM documents WHERE doc_id % 7 = 0),
         f AS (SELECT source,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
               FROM m),
         c AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_copies
               FROM f GROUP BY 1),
         w AS (SELECT source, 1000000 // n_copies AS w
               FROM f JOIN c ON f.fp = c.fp)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(w) AS BIGINT) AS effective_micro,
                CAST(sum(w) // count(*) AS BIGINT) AS mean_weight_ppm
         FROM w GROUP BY 1""",

    "q369_entity_resolution" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
         p AS (SELECT a.p_name AS id1, b.p_name AS id2
               FROM n a JOIN n b
                 ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
                AND a.p_name < b.p_name
               WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
                     >= 0.88),
         e AS (SELECT id1 AS a, id2 AS b FROM p
               UNION SELECT id2, id1 FROM p),
         r(x, y) AS (SELECT a, b FROM e
                     UNION SELECT r.x, e.b FROM r JOIN e ON r.y = e.a)
         SELECT x AS name, least(x, min(y)) AS entity FROM r GROUP BY x""",

    // The planted-URL arithmetic: domain = name(id%5).tld(id%3), one
    // URL per doc plus a mirror URL on even ids; the ftp decoy and the
    // trailing punctuation exist only to exercise the Spark-side regex.
    "q370_url_domains" ->
      """WITH d AS (SELECT doc_id,
              CASE doc_id % 5 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                WHEN 2 THEN 'gamma' WHEN 3 THEN 'delta'
                ELSE 'epsilon' END || '.' ||
              CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                ELSE 'co.uk' END AS dom
             FROM documents),
         one AS (SELECT dom AS domain, count(*) AS n_urls,
                   count(DISTINCT doc_id) AS n_docs
                 FROM d GROUP BY 1
                 UNION ALL
                 SELECT 'example.net', count(*), count(*)
                 FROM documents WHERE doc_id % 2 = 0)
         SELECT domain, CAST(n_urls AS BIGINT) AS n_urls,
                CAST(n_docs AS BIGINT) AS n_docs
         FROM one""",

    // Exact centered power sums per event type, then the same ordered
    // double expressions (one sqrt, round 6) the operator documents.
    "q371_jarque_bera" ->
      """WITH daily AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY 1, 2),
         mu AS (SELECT event_type,
                  CAST(sum(cnt) AS HUGEINT) // count(*) AS mu
               FROM daily GROUP BY 1),
         c AS (SELECT daily.event_type,
                 CAST(cnt - mu AS HUGEINT) AS c
               FROM daily JOIN mu ON daily.event_type = mu.event_type),
         f AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 sum(c) AS s1, sum(c * c) AS s2,
                 sum(c * c * c) AS s3, sum(c * c * c * c) AS s4
               FROM c GROUP BY 1),
         mm AS (SELECT event_type, n,
                 n * s2 - s1 * s1 AS m2,
                 n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1 AS m3,
                 n * n * n * s4 - 4 * n * n * s3 * s1
                   + 6 * n * s2 * s1 * s1
                   - 3 * s1 * s1 * s1 * s1 AS m4
               FROM f),
         st AS (SELECT event_type, CAST(n AS BIGINT) AS n,
                 CASE WHEN n < 4 OR m2 <= 0 THEN NULL
                   ELSE round(CAST(m3 AS DOUBLE)
                     / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))), 6)
                   END AS skew,
                 CASE WHEN n < 4 OR m2 <= 0 THEN NULL
                   ELSE round(CAST(m4 AS DOUBLE)
                     / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0, 6)
                   END AS exkurt
               FROM mm)
         SELECT event_type, n, skew, exkurt,
                CASE WHEN skew IS NULL OR exkurt IS NULL THEN NULL
                  ELSE round(CAST(n AS DOUBLE) / 6.0
                    * (skew * skew + exkurt * exkurt / 4.0), 6)
                  END AS jb
         FROM st""",

    // Doubled midranks over the distinct-|d| table, 2W+ and the tie
    // term exact; z replays the operator's ordered double expression.
    "q372_wilcoxon_signed" ->
      """WITH pairs AS (SELECT o_custkey,
                  CAST(sum(CASE WHEN o_orderkey % 2 = 1
                       THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT)
                  - CAST(sum(CASE WHEN o_orderkey % 2 = 0
                       THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS d
               FROM orders GROUP BY 1),
         nz AS (SELECT d, abs(d) AS a FROM pairs WHERE d <> 0),
         g AS (SELECT a, CAST(count(*) AS HUGEINT) AS m,
                 CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS p
               FROM nz GROUP BY 1),
         r AS (SELECT a, m, p,
                 CAST(coalesce(sum(m) OVER (ORDER BY a
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS HUGEINT) AS below
               FROM g),
         f AS (SELECT CAST(coalesce(sum(m), 0) AS HUGEINT) AS n,
                 CAST(coalesce(sum((2 * below + m + 1) * p), 0) AS HUGEINT)
                   AS twp,
                 CAST(coalesce(sum(m * m * m - m), 0) AS HUGEINT) AS tie
               FROM r)
         SELECT CAST(n AS BIGINT) AS n_pairs,
                CAST(twp AS BIGINT) AS two_w_plus,
                CAST(tie AS BIGINT) AS tie_term,
                CASE WHEN n = 0 THEN NULL
                  WHEN CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                    * CAST(2 * n + 1 AS DOUBLE) / 24.0
                    - CAST(tie AS DOUBLE) / 48.0 <= 0.0 THEN NULL
                  ELSE round((CAST(twp AS DOUBLE) / 2.0
                    - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 4.0)
                   / sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                      * CAST(2 * n + 1 AS DOUBLE) / 24.0
                      - CAST(tie AS DOUBLE) / 48.0), 6) END AS z
         FROM f""",

    "q373_gzip_meta" ->
      """SELECT doc_id,
                CAST(1600000000 + doc_id AS BIGINT) AS mtime,
                CAST((100 + doc_id % 1000 + 255) // 256 AS BIGINT)
                  AS n_blocks,
                CAST(100 + doc_id % 1000 AS BIGINT) AS isize,
                true AS crc_ok
         FROM documents""",

    // Final table = snapshot ∪ protected stragglers (absent from the
    // snapshot AND matching the keepWhere guard).
    "q374_sync_merge" ->
      """WITH base AS (SELECT o_orderkey AS k,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders),
         final AS (
           SELECT k, CASE WHEN k % 5 = 0 THEN cents + 500 ELSE cents END
             AS cents
           FROM base WHERE k % 3 <> 0
           UNION ALL
           SELECT k + 2000000000 AS k, 99 AS cents FROM base
           WHERE k % 11 = 0
           UNION ALL
           SELECT k, cents FROM base WHERE k % 3 = 0 AND cents % 10 = 3)
         SELECT CAST(k % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM final GROUP BY 1""",

    // Unrolled 3-hop per-seed BFS with EXCEPT level separation; the
    // harmonic sum replays the integer 1000000 // d contributions.
    "q375_closeness" ->
      """WITH li AS (SELECT DISTINCT l_suppkey AS a,
                  l_partkey + 10000000 AS b FROM lineitem),
         ed AS (SELECT a AS src, b AS dst FROM li
                UNION SELECT b, a FROM li),
         s(seed) AS (SELECT CAST(x AS BIGINT)
                     FROM (VALUES (1), (2), (3)) t(x)),
         d0 AS (SELECT seed, seed AS node FROM s),
         n1 AS (SELECT DISTINCT d0.seed, ed.dst AS node
                FROM d0 JOIN ed ON ed.src = d0.node),
         d1 AS (SELECT * FROM n1 EXCEPT SELECT * FROM d0),
         n2 AS (SELECT DISTINCT d1.seed, ed.dst AS node
                FROM d1 JOIN ed ON ed.src = d1.node),
         d2 AS (SELECT * FROM n2 EXCEPT SELECT * FROM d0
                EXCEPT SELECT * FROM d1),
         n3 AS (SELECT DISTINCT d2.seed, ed.dst AS node
                FROM d2 JOIN ed ON ed.src = d2.node),
         d3 AS (SELECT * FROM n3 EXCEPT SELECT * FROM d0
                EXCEPT SELECT * FROM d1 EXCEPT SELECT * FROM d2),
         allv AS (SELECT seed, node, 1 AS hops FROM d1
                  UNION ALL SELECT seed, node, 2 FROM d2
                  UNION ALL SELECT seed, node, 3 FROM d3)
         SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
                CAST(sum(1000000 // hops) AS BIGINT) AS harmonic_micro
         FROM allv GROUP BY seed""",

    // The q198 substrate with the squared-gap integral instead of the
    // sup: num = Σ m·(f1·n2 − f2·n1)², den = N²·n1·n2, floor-ppm.
    "q376_cvm_test" ->
      """WITH x AS (SELECT
                  substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS s,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events WHERE event_type = 'purchase'),
         per AS (SELECT v,
                  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
                  CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS HUGEINT) AS c2
               FROM x GROUP BY 1),
         cum AS (SELECT v, c1, c2,
                  sum(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
                  sum(c2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
               FROM per),
         t AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM cum),
         d AS (SELECT any_value(t.n1) AS n1, any_value(t.n2) AS n2,
                      sum((c1 + c2) * (f1 * t.n2 - f2 * t.n1)
                          * (f1 * t.n2 - f2 * t.n1)) AS num
               FROM cum, t)
         SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
                CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                     ELSE num * 1000000
                       // ((n1 + n2) * (n1 + n2) * n1 * n2) END
                  AS BIGINT) AS cvm_ppm
         FROM d""",

    // Doubled midranks per series, running rank sums over the day
    // order, U2_t = S2_t − t(n+1); the 5% flag replays the pinned
    // constant compare (no exp materializes on either engine).
    "q377_pettitt" ->
      """WITH daily AS (SELECT event_type AS et,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
         g AS (SELECT et, y, CAST(count(*) AS HUGEINT) AS m
               FROM daily GROUP BY 1, 2),
         rk AS (SELECT et, y,
                  2 * CAST(coalesce(sum(m) OVER (PARTITION BY et
                    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND
                    1 PRECEDING), 0) AS HUGEINT) + m + 1 AS r2
                FROM g),
         u AS (SELECT daily.et, daily.d,
                 CAST(row_number() OVER (PARTITION BY daily.et
                   ORDER BY daily.d) AS HUGEINT) AS t,
                 sum(rk.r2) OVER (PARTITION BY daily.et ORDER BY daily.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s2,
                 CAST(count(*) OVER (PARTITION BY daily.et) AS HUGEINT)
                   AS n
               FROM daily JOIN rk
                 ON daily.et = rk.et AND daily.y = rk.y),
         uu AS (SELECT et, d, n, s2 - t * (n + 1) AS u2
                FROM u WHERE t < n),
         best AS (SELECT et, max(abs(u2)) AS k2 FROM uu GROUP BY 1),
         pick AS (SELECT uu.et, max(uu.n) AS n, best.k2,
                    min(uu.d) AS change_day
                  FROM uu JOIN best
                    ON uu.et = best.et AND abs(uu.u2) = best.k2
                  GROUP BY uu.et, best.k2)
         SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
                CAST(k2 AS BIGINT) AS k_stat,
                CAST(change_day AS BIGINT) AS change_day,
                CASE WHEN CAST(6 * k2 * k2 AS DOUBLE)
                  >= 3.6888794541139363
                    * CAST(n * n * n + n * n AS DOUBLE)
                  THEN 1 ELSE 0 END AS significant_05
         FROM pick""",

    // Brute-force pair replay on the bounded distinct-point table,
    // recursive-CTE components for the core graph (q369's closure),
    // min-cluster border attach, noise = -1.
    "q378_dbscan" ->
      """WITH RECURSIVE e AS (SELECT
                  CAST(floor(embedding[1] * 20) + 20 AS BIGINT) AS x,
                  CAST(floor(embedding[2] * 20) + 20 AS BIGINT) AS y,
                  vec_id
               FROM embeddings),
         pl AS (SELECT x, y FROM e
                UNION ALL
                SELECT x + 18, y + 18 FROM e WHERE vec_id % 5 = 0),
         p AS (SELECT x, y, CAST(count(*) AS BIGINT) AS w,
                 x * 2147483648 + y AS pid
               FROM pl GROUP BY 1, 2),
         nb AS (SELECT a.pid AS pa, b.pid AS pb, b.w AS wb
                FROM p a JOIN p b
                  ON (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) <= 1),
         mass AS (SELECT pa AS pid, sum(wb) AS m FROM nb GROUP BY 1),
         core AS (SELECT pid FROM mass WHERE m >= 8),
         ce AS (SELECT nb.pa AS a, nb.pb AS b FROM nb
                JOIN core c1 ON nb.pa = c1.pid
                JOIN core c2 ON nb.pb = c2.pid
                WHERE nb.pa < nb.pb),
         sym AS (SELECT a, b FROM ce UNION SELECT b, a FROM ce),
         r(s, t) AS (SELECT a, b FROM sym
                     UNION SELECT r.s, sym.b
                     FROM r JOIN sym ON r.t = sym.a),
         comp AS (SELECT s AS pid, least(s, min(t)) AS cl
                  FROM r GROUP BY s),
         corelab AS (SELECT core.pid, coalesce(comp.cl, core.pid) AS cl
                     FROM core LEFT JOIN comp ON core.pid = comp.pid),
         borderlab AS (SELECT nb.pa AS pid, min(corelab.cl) AS cl
                       FROM nb JOIN corelab ON nb.pb = corelab.pid
                       WHERE nb.pa NOT IN (SELECT pid FROM core)
                       GROUP BY 1),
         asg AS (SELECT p.x, p.y, p.w,
                   CASE WHEN cl1.pid IS NOT NULL THEN 1 ELSE 0 END
                     AS is_core,
                   coalesce(cl1.cl, bl.cl, -1) AS cluster
                 FROM p
                 LEFT JOIN corelab cl1 ON p.pid = cl1.pid
                 LEFT JOIN borderlab bl ON p.pid = bl.pid)
         SELECT cluster, CAST(sum(w) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN is_core = 1 THEN w ELSE 0 END)
                  AS BIGINT) AS n_core_docs,
                CAST(count(*) AS BIGINT) AS n_points,
                CAST(min(x) AS BIGINT) AS min_x,
                CAST(max(x) AS BIGINT) AS max_x,
                CAST(min(y) AS BIGINT) AS min_y,
                CAST(max(y) AS BIGINT) AS max_y
         FROM asg GROUP BY 1""",

    "q379_svg_dims" ->
      """SELECT doc_id,
                CAST((doc_id % 300 + 1) * 2 AS BIGINT) AS width,
                CAST((doc_id % 150 + 1) * 3 AS BIGINT) AS height
         FROM documents""",

    "q380_pdf_meta" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS ver_major,
                CAST(4 + doc_id % 4 AS BIGINT) AS ver_minor,
                CAST(1 + doc_id % 9 AS BIGINT) AS n_pages,
                true AS xref_ok
         FROM documents""",

    // Latest 32 observed days per series, dyadic block signs, integer
    // coefficient energies per level.
    "q381_haar_energy" ->
      """WITH daily AS (SELECT event_type AS et,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
         w AS (SELECT et, d, y,
                 row_number() OVER (PARTITION BY et ORDER BY d DESC)
                   AS rn
               FROM daily),
         win0 AS (SELECT et, y, rn FROM w WHERE rn <= 16),
         nw AS (SELECT et, count(*) AS n FROM win0 GROUP BY 1),
         win AS (SELECT win0.et, win0.y, 16 - win0.rn AS idx
                 FROM win0 JOIN nw ON win0.et = nw.et WHERE nw.n = 16),
         lev AS (SELECT et, y, idx, CAST(l AS BIGINT) AS l
                 FROM win, (SELECT unnest(range(1, 5)) AS l) ls),
         co AS (SELECT et, l, idx // (1 << l) AS b,
                  CAST(sum(CASE WHEN (idx // (1 << (l - 1))) % 2 = 0
                    THEN y ELSE -y END) AS HUGEINT) AS c
                FROM lev GROUP BY 1, 2, 3)
         SELECT et AS event_type, CAST(l AS BIGINT) AS level,
                CAST(count(*) AS BIGINT) AS n_blocks,
                CAST(sum(c * c) AS BIGINT) AS energy
         FROM co GROUP BY 1, 2""",

    // Deterministic md5-sign ±1 projection replayed end-to-end:
    // fixed-point coordinates, integer distances, lower-median order
    // statistic under the (distortion, id, id) total order.
    "q382_jl_distortion" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 13 = 0),
         q AS (SELECT vec_id, i,
                 CAST(floor(embedding[i + 1] * 10000 + 0.5) AS BIGINT)
                   AS v
               FROM s, (SELECT unnest(range(0, 64)) AS i) t),
         sg AS (SELECT j, i,
                  CASE WHEN substr(md5(j || ':' || i), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS sgn
                FROM (SELECT unnest(range(0, 16)) AS j) a,
                     (SELECT unnest(range(0, 64)) AS i) b),
         pr AS (SELECT q.vec_id, sg.j,
                  CAST(sum(sg.sgn * q.v) AS HUGEINT) AS p
                FROM q JOIN sg ON q.i = sg.i GROUP BY 1, 2),
         dor AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                   CAST(sum((a.v - b.v) * (a.v - b.v)) AS HUGEINT)
                     AS d_orig
                 FROM q a JOIN q b
                   ON a.i = b.i AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
         dpr AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                   CAST(sum((a.p - b.p) * (a.p - b.p)) AS HUGEINT)
                     AS d_proj
                 FROM pr a JOIN pr b
                   ON a.j = b.j AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
         pp AS (SELECT dor.id1, dor.id2,
                  CAST(dpr.d_proj * 1000000 // (16 * dor.d_orig)
                    AS BIGINT) AS dist
                FROM dor JOIN dpr
                  ON dor.id1 = dpr.id1 AND dor.id2 = dpr.id2
                WHERE dor.d_orig > 0),
         r AS (SELECT dist,
                 row_number() OVER (ORDER BY dist, id1, id2) AS rn,
                 count(*) OVER () AS np
               FROM pp)
         SELECT CAST(max(np) AS BIGINT) AS n_pairs,
                CAST(min(dist) AS BIGINT) AS min_ppm,
                CAST(max(CASE WHEN rn = (np + 1) // 2 THEN dist END)
                  AS BIGINT) AS median_ppm,
                CAST(max(dist) AS BIGINT) AS max_ppm
         FROM r""",

    "q383_ico_meta" ->
      """SELECT doc_id, CAST(1 + doc_id % 4 AS BIGINT) AS n_images,
                CAST(doc_id % 200 + 1 + doc_id % 4 AS BIGINT)
                  AS max_width,
                CAST(doc_id % 100 + 1 + doc_id % 4 AS BIGINT)
                  AS max_height
         FROM documents""",

    // UPDATE then MERGE replayed arithmetically: matched k%9=0 rows
    // take source cents + 13 (overwriting the earlier +250 where both
    // hit), unmatched shifted keys insert at 77.
    "q384_sql_update" ->
      """WITH base AS (SELECT o_orderkey AS k,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders),
         au AS (SELECT k, CASE WHEN k % 7 = 2 THEN cents + 250
                  ELSE cents END AS cents
                FROM base),
         final AS (
           SELECT a.k, CASE WHEN a.k % 9 = 0 THEN b.cents + 13
             ELSE a.cents END AS cents
           FROM au a JOIN base b ON a.k = b.k
           UNION ALL
           SELECT k + 1000000000 AS k, 77 AS cents FROM base
           WHERE k % 11 = 0)
         SELECT CAST(k % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM final GROUP BY 1""",

    // One six-sum moment pass, the cleared 2x2 inverse, one integer
    // rational per point, deterministic top-k.
    "q385_mahalanobis" ->
      s"""WITH $IdScoredDocsSql,
         pts AS (SELECT doc_id, CAST(s // 100 AS HUGEINT) AS x,
                   CAST(n_chars AS HUGEINT) AS y
                 FROM sc),
         mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                   sum(y * y) AS syy, sum(x * y) AS sxy
                 FROM pts),
         ab AS (SELECT n, sx, sy, n * sxx - sx * sx AS a,
                  n * syy - sy * sy AS b, n * sxy - sx * sy AS c
                FROM mom),
         sc3 AS (SELECT pts.doc_id, pts.x, pts.y,
                   (n * pts.x - sx) AS u, (n * pts.y - sy) AS v,
                   a, b, c, a * b - c * c AS det
                 FROM pts CROSS JOIN ab)
         SELECT doc_id, CAST(x AS BIGINT) AS q,
                CAST(y AS BIGINT) AS n_chars,
                CAST((u * u * b - 2 * u * v * c + v * v * a) * 1000
                  // det AS BIGINT) AS d2_milli
         FROM sc3 WHERE det > 0
         ORDER BY d2_milli DESC, doc_id ASC LIMIT 20""",

    // The q314 weight recipe + per-replicate lower weighted medians +
    // exact order-statistic CI ranks.
    "q386_boot_median" ->
      """WITH base AS (SELECT event_type AS g,
                CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                CAST(event_id AS VARCHAR) AS id
             FROM events
             WHERE value IS NOT NULL AND event_id IS NOT NULL),
         rawg AS (SELECT g, c, CAST(count(*) AS HUGEINT) AS w
                  FROM base GROUP BY 1, 2),
         rawm AS (SELECT g, min(c) AS med FROM (
                    SELECT g, c,
                      sum(w) OVER (PARTITION BY g ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      sum(w) OVER (PARTITION BY g) AS tot
                    FROM rawg)
                  WHERE tot > 0 AND cum * 2 >= tot GROUP BY g),
         reps AS (SELECT g, c, id, CAST(bb.range AS INTEGER) AS b
                  FROM base, range(32) bb),
         wt AS (SELECT g, b, c,
                  CASE WHEN h < '5e2d58d8' THEN 0
                       WHEN h < 'bc5ab1b1' THEN 1
                       WHEN h < 'eb715e1d' THEN 2
                       WHEN h < 'fb239797' THEN 3
                       WHEN h < 'ff1025f5' THEN 4
                       WHEN h < 'ffd90f3b' THEN 5
                       WHEN h < 'fffa8b71' THEN 6
                       WHEN h < 'ffff540c' THEN 7
                       WHEN h < 'ffffed1f' THEN 8
                       ELSE 9 END AS m
                FROM (SELECT g, c, b,
                        substring(md5(id || '#' || CAST(b // 4 AS VARCHAR)),
                          1 + 8 * (b % 4), 8) AS h
                      FROM reps) t),
         pw AS (SELECT g, b, c, CAST(sum(m) AS HUGEINT) AS wm
                FROM wt GROUP BY 1, 2, 3 HAVING sum(m) > 0),
         repm AS (SELECT g, b, min(c) AS med FROM (
                    SELECT g, b, c,
                      sum(wm) OVER (PARTITION BY g, b ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      sum(wm) OVER (PARTITION BY g, b) AS tot
                    FROM pw)
                  WHERE tot > 0 AND cum * 2 >= tot GROUP BY g, b),
         ci AS (SELECT g, max(bl) AS bl,
                  max(CASE WHEN rn = bl * 25 // 1000 + 1 THEN med END)
                    AS cilo,
                  max(CASE WHEN rn = (bl * 975 + 999) // 1000 THEN med
                    END) AS cihi
                FROM (SELECT g, med,
                        row_number() OVER (PARTITION BY g
                          ORDER BY med, b) AS rn,
                        count(*) OVER (PARTITION BY g) AS bl
                      FROM repm)
                GROUP BY g),
         nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base
                GROUP BY 1)
         SELECT nn.g AS event_type, nn.n AS n_rows,
                CAST(rawm.med AS BIGINT) AS median_centi,
                CAST(ci.bl AS BIGINT) AS b_live,
                CAST(ci.cilo AS BIGINT) AS ci_lo_centi,
                CAST(ci.cihi AS BIGINT) AS ci_hi_centi
         FROM nn JOIN rawm ON nn.g = rawm.g JOIN ci ON nn.g = ci.g
         ORDER BY event_type""",

    // The q211 ranking CTEs with ranks kept; shared-literal depth
    // weights, entry depth = max rank, one floor per depth term.
    "q387_rbo" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                  CAST(embedding[1:16] AS DOUBLE[]) AS qp
               FROM embeddings WHERE vec_id IN (0, 7, 21, 42, 63)),
         fr AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id) AS rn
               FROM (SELECT q.qid, e.vec_id,
                       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                     FROM embeddings e, q WHERE e.vec_id <> q.qid)),
         pr AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id) AS rn
               FROM (SELECT q.qid, e.vec_id,
                       round(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]), q.qp)
                         / (sqrt(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]),
                                                  CAST(e.embedding[1:16] AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qp, q.qp))), 6) AS cos
                     FROM embeddings e, q WHERE e.vec_id <> q.qid)),
         j AS (SELECT f.qid, greatest(f.rn, p.rn) AS d0
               FROM fr f JOIN pr p
                 ON f.qid = p.qid AND f.vec_id = p.vec_id
               WHERE f.rn <= 10 AND p.rn <= 10),
         ov AS (SELECT qid, CAST(t.d AS BIGINT) AS d,
                  CAST(count(*) AS HUGEINT) AS ov
                FROM j, (SELECT unnest(range(1, 11)) AS d) t
                WHERE t.d >= j.d0 GROUP BY 1, 2),
         wts(d, w) AS (VALUES ${Similarity.rboWeightsNano(10, 900L)
             .zipWithIndex.map { case (wv, i) =>
               s"(${i + 1}, CAST($wv AS HUGEINT))" }.mkString(", ")}),
         agg AS (SELECT ov.qid,
                CAST(coalesce(max(CASE WHEN ov.d = 10 THEN ov.ov END), 0)
                  AS BIGINT) AS n_overlap,
                CAST(sum(wts.w * ov.ov // ov.d) // 1000 AS BIGINT)
                  AS rbo_micro
         FROM ov JOIN wts ON ov.d = wts.d
         GROUP BY 1),
         qids(qid) AS (VALUES (0), (7), (21), (42), (63))
         SELECT CAST(qids.qid AS BIGINT) AS query_id,
                coalesce(agg.n_overlap, 0) AS n_overlap,
                coalesce(agg.rbo_micro, 0) AS rbo_micro
         FROM qids LEFT JOIN agg ON agg.qid = qids.qid""",

    "q388_webm_meta" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN 'webm'
                  ELSE 'matroska' END AS doc_type,
                CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
                CAST(1 AS BIGINT) AS n_video,
                CAST(doc_id % 3 AS BIGINT) AS n_audio,
                CAST((doc_id % 200 + 1) * 4 AS BIGINT) AS width,
                CAST((doc_id % 100 + 1) * 4 AS BIGINT) AS height
         FROM documents""",

    // Adjacent zip of the normalized token arrays; lift cleared to one
    // floor-ppm rational; deterministic (lift, pair) top-k.
    "q389_collocations" ->
      """WITH t AS (SELECT string_split(
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
                  AS toks
               FROM documents),
         uni AS (SELECT u.t AS w, CAST(count(*) AS HUGEINT) AS nu
                 FROM (SELECT unnest(toks) AS t FROM t) u
                 WHERE length(u.t) > 0 GROUP BY 1),
         tot AS (SELECT sum(nu) AS nn FROM uni),
         bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2,
                  CAST(count(*) AS HUGEINT) AS nab
                FROM (SELECT toks,
                        unnest(range(1, greatest(len(toks), 1))) AS i
                      FROM t)
                WHERE length(toks[i]) > 0 AND length(toks[i + 1]) > 0
                GROUP BY 1, 2),
         n2 AS (SELECT sum(nab) AS n2 FROM bi)
         SELECT w1 AS word_1, w2 AS word_2,
                CAST(nab AS BIGINT) AS n_pair,
                CAST(nab * nn * nn * 1000000 // (n2.n2 * a.nu * b.nu)
                  AS BIGINT) AS lift_ppm
         FROM bi JOIN uni a ON bi.w1 = a.w
                 JOIN uni b ON bi.w2 = b.w, tot, n2
         WHERE nab >= 5
         ORDER BY lift_ppm DESC, word_1 ASC, word_2 ASC LIMIT 25""",

    // Lower median of the non-null centi values per type, planted-null
    // counts, exact post-fill sum.
    "q390_impute" ->
      """WITH r AS (SELECT event_type AS g,
                  CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
                    END AS c
               FROM events),
         pv AS (SELECT g, c, CAST(count(*) AS HUGEINT) AS w
                FROM r WHERE c IS NOT NULL GROUP BY 1, 2),
         med AS (SELECT g, min(c) AS fill FROM (
                   SELECT g, c,
                     sum(w) OVER (PARTITION BY g ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     sum(w) OVER (PARTITION BY g) AS tot
                   FROM pv)
                 WHERE cum * 2 >= tot GROUP BY g),
         agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_null,
                   CAST(coalesce(sum(CAST(c AS HUGEINT)), 0) AS HUGEINT)
                     AS s
                 FROM r GROUP BY 1)
         SELECT agg.g AS event_type, n_rows, n_null,
                CAST(med.fill AS BIGINT) AS fill_centi,
                CAST(CASE WHEN med.fill IS NULL AND n_null > 0 THEN NULL
                  ELSE s + n_null * coalesce(med.fill, 0) END AS BIGINT)
                  AS sum_after_centi
         FROM agg LEFT JOIN med ON agg.g = med.g""",

    // Even-day-fit argmax predictor scored on odd-day pairs; NULL
    // prediction for eval-only from-types.
    "q391_next_event" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS i,
                  event_type AS ty
               FROM events),
         pr AS (SELECT u, ty,
                  lag(ty) OVER (PARTITION BY u ORDER BY t, i) AS prev,
                  lag(t) OVER (PARTITION BY u ORDER BY t, i) AS pts
                FROM e),
         pairs AS (SELECT prev AS f, ty AS tt,
                     pts // 86400000000 AS pday
                   FROM pr WHERE prev IS NOT NULL),
         train AS (SELECT f, tt, CAST(count(*) AS BIGINT) AS n
                   FROM pairs WHERE ((pday % 2) + 2) % 2 = 0 GROUP BY 1, 2),
         pred AS (SELECT f, max(nt) AS n_train, max(p) AS pred FROM (
                    SELECT f, tt AS p,
                      row_number() OVER (PARTITION BY f
                        ORDER BY n DESC, tt ASC) AS rn,
                      sum(n) OVER (PARTITION BY f) AS nt
                    FROM train)
                  WHERE rn = 1 GROUP BY f),
         ev AS (SELECT f, tt, CAST(count(*) AS BIGINT) AS ne
                FROM pairs WHERE ((pday % 2) + 2) % 2 = 1 GROUP BY 1, 2)
         SELECT ev.f AS from_type,
                CAST(coalesce(max(pred.n_train), 0) AS BIGINT) AS n_train,
                max(pred.pred) AS predicted_type,
                CAST(sum(ne) AS BIGINT) AS n_eval,
                CAST(coalesce(sum(CASE WHEN ev.tt = pred.pred THEN ne
                  END), 0) AS BIGINT) AS n_hits,
                CAST(CASE WHEN sum(ne) = 0 THEN NULL
                  ELSE coalesce(sum(CASE WHEN ev.tt = pred.pred THEN ne
                    END), 0) * 1000000 // sum(ne) END AS BIGINT)
                  AS hit_ppm
         FROM ev LEFT JOIN pred ON ev.f = pred.f
         GROUP BY 1""",

    // Three forward levels with exact path counts, two backward folds
    // with the per-edge floor, anti-joins per level, summed over seeds.
    "q392_betweenness" ->
      """WITH li AS (SELECT DISTINCT l_suppkey AS a,
                  l_partkey + 10000000 AS b FROM lineitem),
         ed AS (SELECT a AS src, b AS dst FROM li
                UNION SELECT b, a FROM li),
         s(seed) AS (SELECT CAST(x AS BIGINT)
                     FROM (VALUES (1), (2), (3)) t(x)),
         l0 AS (SELECT seed, seed AS node, CAST(1 AS HUGEINT) AS sigma
                FROM s),
         c1 AS (SELECT l0.seed, ed.dst AS node,
                  CAST(sum(l0.sigma) AS HUGEINT) AS sigma
                FROM l0 JOIN ed ON ed.src = l0.node GROUP BY 1, 2),
         l1 AS (SELECT c1.seed, c1.node, c1.sigma FROM c1
                ANTI JOIN l0 USING (seed, node)),
         c2 AS (SELECT l1.seed, ed.dst AS node,
                  CAST(sum(l1.sigma) AS HUGEINT) AS sigma
                FROM l1 JOIN ed ON ed.src = l1.node GROUP BY 1, 2),
         v1 AS (SELECT seed, node FROM l0
                UNION ALL SELECT seed, node FROM l1),
         l2 AS (SELECT c2.seed, c2.node, c2.sigma FROM c2
                ANTI JOIN v1 USING (seed, node)),
         c3 AS (SELECT l2.seed, ed.dst AS node,
                  CAST(sum(l2.sigma) AS HUGEINT) AS sigma
                FROM l2 JOIN ed ON ed.src = l2.node GROUP BY 1, 2),
         v2 AS (SELECT seed, node FROM v1
                UNION ALL SELECT seed, node FROM l2),
         l3 AS (SELECT c3.seed, c3.node, c3.sigma FROM c3
                ANTI JOIN v2 USING (seed, node)),
         d2r AS (SELECT l2.seed, l2.node,
                   CAST(sum(l2.sigma * 1000000 // l3.sigma) AS HUGEINT)
                     AS delta
                 FROM l2 JOIN ed ON ed.src = l2.node
                 JOIN l3 ON l3.seed = l2.seed AND l3.node = ed.dst
                 GROUP BY 1, 2),
         dd2 AS (SELECT l2.seed, l2.node, l2.sigma,
                   coalesce(d2r.delta, 0) AS delta
                 FROM l2 LEFT JOIN d2r
                   ON d2r.seed = l2.seed AND d2r.node = l2.node),
         d1r AS (SELECT l1.seed, l1.node,
                   CAST(sum(l1.sigma * (1000000 + dd2.delta)
                     // dd2.sigma) AS HUGEINT) AS delta
                 FROM l1 JOIN ed ON ed.src = l1.node
                 JOIN dd2 ON dd2.seed = l1.seed AND dd2.node = ed.dst
                 GROUP BY 1, 2),
         dd1 AS (SELECT l1.seed, l1.node, coalesce(d1r.delta, 0) AS delta
                 FROM l1 LEFT JOIN d1r
                   ON d1r.seed = l1.seed AND d1r.node = l1.node),
         contrib AS (SELECT seed, node, delta FROM dd2
                     UNION ALL SELECT seed, node, delta FROM dd1)
         SELECT node, CAST(sum(delta) AS BIGINT) AS bc_micro
         FROM contrib GROUP BY 1
         ORDER BY bc_micro DESC, node ASC LIMIT 20""",

    // The identical regex/replace chain, 'g'-flagged, entities decoded
    // in the same order with &amp; last.
    "q393_html_extract" ->
      """WITH h AS (SELECT doc_id,
                '<html><head><style>p{color:red}</style>'
                || '<script>var x=1;</script></head><body><h1>T&amp;'
                || doc_id || '</h1><p>' || text
                || '</p><a href="/x">link</a>'
                || CASE WHEN doc_id % 2 = 0
                     THEN '<img src="a.png"/>' ELSE '' END
                || '</body></html>' AS html
             FROM documents),
         ns AS (SELECT doc_id, html,
                  regexp_replace(regexp_replace(html,
                    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                    '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS ns
                FROM h),
         de AS (SELECT doc_id, html, ns,
                  trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(ns, '<[^>]+>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS clean
                FROM ns)
         SELECT doc_id, md5(clean) AS text_md5,
                CAST(len(regexp_extract_all(ns, '<a[\s>]')) AS BIGINT)
                  AS n_links,
                CAST(len(regexp_extract_all(ns, '<img[\s/>]')) AS BIGINT)
                  AS n_images,
                CAST(len(regexp_extract_all(ns, '<[^>]+>')) AS BIGINT)
                  AS n_tags,
                CAST(CASE WHEN length(html) = 0 THEN 0
                  ELSE (length(html) - length(clean)) * 1000000
                    // length(html) END AS BIGINT) AS markup_ppm
         FROM de""",

    "q394_diversity" ->
      """WITH t AS (SELECT source,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS term
               FROM documents),
         c AS (SELECT source, term, CAST(count(*) AS HUGEINT) AS c
               FROM t GROUP BY 1, 2),
         f AS (SELECT source, CAST(sum(c) AS HUGEINT) AS n,
                 CAST(count(*) AS HUGEINT) AS s,
                 CAST(sum(c * (c - 1)) AS HUGEINT) AS p2,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS f1,
                 CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS f2
               FROM c GROUP BY 1)
         SELECT source, CAST(n AS BIGINT) AS n_tokens,
                CAST(s AS BIGINT) AS n_types,
                CAST(CASE WHEN n < 2 THEN NULL
                  ELSE 1000000 - p2 * 1000000 // (n * (n - 1)) END
                  AS BIGINT) AS simpson_ppm,
                CAST(s * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
                  AS BIGINT) AS chao1_milli
         FROM f""",

    // Same md5-hex bucket arithmetic (the q308 conv trick), same
    // two-level rollup.
    "q395_hash_collisions" ->
      """WITH terms AS (SELECT DISTINCT unnest(string_split(
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
                  AS t
               FROM documents),
         tt AS (SELECT t FROM terms WHERE length(t) > 0),
         b AS (SELECT bb.bits,
                 CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
                   % (1 << bb.bits) AS bkt
               FROM tt, (SELECT unnest([6, 8, 10, 12]) AS bits) bb),
         c AS (SELECT bits, bkt, CAST(count(*) AS BIGINT) AS m
               FROM b GROUP BY 1, 2)
         SELECT CAST(bits AS BIGINT) AS bits,
                CAST(sum(m) AS BIGINT) AS n_terms,
                CAST(count(*) AS BIGINT) AS n_buckets_occupied,
                CAST(sum(CASE WHEN m >= 2 THEN m ELSE 0 END) AS BIGINT)
                  AS n_colliding,
                CAST(CASE WHEN sum(m) = 0 THEN 0
                  ELSE sum(CASE WHEN m >= 2 THEN m ELSE 0 END) * 1000000
                    // sum(m) END AS BIGINT) AS collision_ppm
         FROM c GROUP BY 1""",

    // The q38 session CTE, the generated window table, and a plain
    // inequality overlap join (the small-scale reference for the
    // binned equi-join's exactly-once dedup).
    "q396_interval_overlap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
               FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                 CAST(sum(news) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS session_idx
               FROM g),
         sess AS (SELECT user_id * 1000000 + session_idx AS sid,
                    min(ts_us) AS st, max(ts_us) + 1 AS en
                  FROM s GROUP BY user_id, session_idx),
         wins AS (SELECT day * 2 + slot AS wid,
                    day * 86400000000 + (3 + slot * 12) * 3600000000
                      AS ws,
                    day * 86400000000 + (5 + slot * 12) * 3600000000
                      AS we
                  FROM (SELECT DISTINCT ts_us // 86400000000 AS day
                        FROM (SELECT epoch_us(ts) AS ts_us FROM events)),
                       (SELECT unnest([0, 1]) AS slot)),
         ov AS (SELECT sess.sid, wins.wid,
                  least(sess.en, wins.we) - greatest(sess.st, wins.ws)
                    AS o
                FROM sess JOIN wins
                  ON sess.st < wins.we AND wins.ws < sess.en)
         SELECT CAST(wid AS BIGINT) AS wid,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(o) AS BIGINT) AS overlap_us_total
         FROM ov GROUP BY 1""",

    // The q396 CTEs plus the same nine-way Allen CASE.
    "q397_allen_relations" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
               FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                 CAST(sum(news) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS session_idx
               FROM g),
         sess AS (SELECT user_id * 1000000 + session_idx AS sid,
                    min(ts_us) AS st, max(ts_us) + 1 AS en
                  FROM s GROUP BY user_id, session_idx),
         wins AS (SELECT day * 2 + slot AS wid,
                    day * 86400000000 + (3 + slot * 12) * 3600000000
                      AS ws,
                    day * 86400000000 + (5 + slot * 12) * 3600000000
                      AS we
                  FROM (SELECT DISTINCT ts_us // 86400000000 AS day
                        FROM (SELECT epoch_us(ts) AS ts_us FROM events)),
                       (SELECT unnest([0, 1]) AS slot)),
         ov AS (SELECT least(sess.en, wins.we)
                    - greatest(sess.st, wins.ws) AS o,
                  CASE
                    WHEN st = ws AND en = we THEN 'equals'
                    WHEN st = ws AND en < we THEN 'starts'
                    WHEN st = ws THEN 'started_by'
                    WHEN en = we AND st > ws THEN 'finishes'
                    WHEN en = we THEN 'finished_by'
                    WHEN st > ws AND en < we THEN 'during'
                    WHEN st < ws AND en > we THEN 'contains'
                    WHEN st < ws THEN 'overlaps'
                    ELSE 'overlapped_by' END AS relation
                FROM sess JOIN wins
                  ON sess.st < wins.we AND wins.ws < sess.en)
         SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(o) AS BIGINT) AS overlap_us_total
         FROM ov GROUP BY 1""",

    "q398_hour_heatmap" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 168 AS how
               FROM events),
         c AS (SELECT how, CAST(count(*) AS BIGINT) AS n_events
               FROM h GROUP BY 1)
         SELECT CAST(how // 24 AS BIGINT) AS dow_from_thu,
                CAST(how % 24 AS BIGINT) AS hour, n_events,
                CAST(n_events * 1000000 // (SELECT sum(n_events) FROM c)
                  AS BIGINT) AS share_ppm
         FROM c""",

    // The forward-ASOF as a decorrelated min-next-timestamp lookup;
    // identical tolerance voiding and per-(user, ts) max-cents tiebreak.
    "q399_asof_forward" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
               FROM events WHERE event_type <> 'purchase'),
         r AS (SELECT user_id, epoch_us(ts) AS ts_us,
                 max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         m AS (SELECT l.user_id, l.ts_us, l.event_type,
                 (SELECT min(r.ts_us) FROM r
                  WHERE r.user_id = l.user_id AND r.ts_us >= l.ts_us)
                   AS mts
               FROM l),
         mm AS (SELECT m.event_type, m.ts_us, m.mts, r.cents
                FROM m LEFT JOIN r
                  ON r.user_id = m.user_id AND r.ts_us = m.mts),
         ok AS (SELECT event_type, ts_us,
                  CASE WHEN mts IS NOT NULL
                    AND mts - ts_us <= 86400000000 THEN cents END AS nc,
                  CASE WHEN mts IS NOT NULL
                    AND mts - ts_us <= 86400000000 THEN mts END AS nts
                FROM mm)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN nc IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_matched,
                CAST(coalesce(sum(nc), 0) AS BIGINT) AS sum_next_cents,
                CAST(coalesce(sum(nts - ts_us), 0) AS BIGINT)
                  AS sum_wait_us
         FROM ok GROUP BY 1""",

    // The q393 markup chain, the quality formula over the CLEAN text,
    // md5 min-id canonicals among survivors, per-source funnel.
    "q400_web_pipeline" ->
      """WITH d0 AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, 'mirror', text FROM documents
               WHERE doc_id % 5 = 0),
         h AS (SELECT doc_id, source,
                '<html><head><style>p{color:red}</style>'
                || '<script>var x=1;</script></head><body><h1>T&amp;X'
                || '</h1><p>' || text
                || '</p><a href="/x">link</a>'
                || CASE WHEN doc_id % 2 = 0
                     THEN '<img src="a.png"/>' ELSE '' END
                || '</body></html>' AS html
             FROM d0),
         cl AS (SELECT doc_id, source,
                  trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(
                        regexp_replace(regexp_replace(html,
                          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                        '<[^>]+>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS ct
                FROM h),
         sc AS (SELECT doc_id, source, ct,
                  greatest(least(CAST(floor(
                    round(0.5 * least(length(ct) / 500.0, 1.0)
                      + 0.5 * least(
                          len(regexp_extract_all(ct, '[A-Za-z0-9]+'))
                            * 1.0
                          / greatest(len(regexp_split_to_array(trim(ct),
                              '\s+')), 1), 1.0)
                      - len(regexp_extract_all(ct, '[.,;:!?]')) * 1.0
                        / greatest(length(ct), 1), 4) * 10000 + 0.5)
                    AS BIGINT), 10000), 0) AS q
                FROM cl),
         f AS (SELECT doc_id, source, ct, q >= 8000 AS pass,
                 CASE WHEN q >= 8000 THEN md5(lower(trim(
                   regexp_replace(ct, '\s+', ' ', 'g')))) END AS fp
               FROM sc),
         c AS (SELECT f.*, pass AND doc_id = min(CASE WHEN pass
                 THEN doc_id END) OVER (PARTITION BY fp) AS canon
               FROM f)
         SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
                CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quality,
                CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unique,
                CAST(coalesce(sum(CASE WHEN canon THEN
                  len(regexp_split_to_array(trim(ct), '\s+')) END), 0)
                  AS BIGINT) AS tokens_final
         FROM c GROUP BY 1""",

    // Synth round-trip (q155/q373 discipline): every parsed field is
    // doc_id arithmetic; the % 7 tear drops exactly the WET member.
    "q401_warc_walk" ->
      """WITH h AS (SELECT doc_id, source, text,
                '<html><body><h1>T&amp;' || doc_id || '</h1><p>' || text
                  || '</p></body></html>' AS html
             FROM documents)
         SELECT doc_id,
                CAST(CASE WHEN doc_id % 7 = 3 THEN 2 ELSE 3 END
                  AS BIGINT) AS n_records,
                doc_id % 7 = 3 AS truncated,
                CAST(200 AS BIGINT) AS status,
                'https://' || source || '.example.org/doc/' || doc_id
                  AS url,
                CAST(1600000000 + doc_id AS BIGINT) AS fetch_ts,
                'text/html; charset=utf-8' AS mime,
                CAST(octet_length(encode(html)) AS BIGINT) AS content_len,
                md5(html) AS body_md5,
                CASE WHEN doc_id % 7 = 3 THEN NULL ELSE md5(text) END
                  AS wet_md5
         FROM h""",

    // q400's funnel replayed from the WARC host: the walk's
    // (host, html) is pure synth arithmetic, the chain is q400's.
    "q402_warc_pipeline" ->
      """WITH d0 AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, 'mirror', text FROM documents
               WHERE doc_id % 5 = 0),
         h AS (SELECT doc_id, source || '.example.org' AS host,
                '<html><head><style>p{color:red}</style>'
                || '<script>var x=1;</script></head><body><h1>T&amp;X'
                || '</h1><p>' || text
                || '</p><a href="/x">link</a>'
                || CASE WHEN doc_id % 2 = 0
                     THEN '<img src="a.png"/>' ELSE '' END
                || '</body></html>' AS html
             FROM d0),
         cl AS (SELECT doc_id, host,
                  trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(
                        regexp_replace(regexp_replace(html,
                          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                        '<[^>]+>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS ct
                FROM h),
         sc AS (SELECT doc_id, host, ct,
                  greatest(least(CAST(floor(
                    round(0.5 * least(length(ct) / 500.0, 1.0)
                      + 0.5 * least(
                          len(regexp_extract_all(ct, '[A-Za-z0-9]+'))
                            * 1.0
                          / greatest(len(regexp_split_to_array(trim(ct),
                              '\s+')), 1), 1.0)
                      - len(regexp_extract_all(ct, '[.,;:!?]')) * 1.0
                        / greatest(length(ct), 1), 4) * 10000 + 0.5)
                    AS BIGINT), 10000), 0) AS q
                FROM cl),
         f AS (SELECT doc_id, host, ct, q >= 8000 AS pass,
                 CASE WHEN q >= 8000 THEN md5(lower(trim(
                   regexp_replace(ct, '\s+', ' ', 'g')))) END AS fp
               FROM sc),
         c AS (SELECT f.*, pass AND doc_id = min(CASE WHEN pass
                 THEN doc_id END) OVER (PARTITION BY fp) AS canon
               FROM f)
         SELECT host, CAST(count(*) AS BIGINT) AS n_raw,
                CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quality,
                CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unique,
                CAST(coalesce(sum(CASE WHEN canon THEN
                  len(regexp_split_to_array(trim(ct), '\s+')) END), 0)
                  AS BIGINT) AS tokens_final
         FROM c GROUP BY 1""",

    // The repaired text for the double-encoded third IS the clean
    // suffix appended — DuckDB replays the recovery, not the bytes.
    "q403_fix_encoding" ->
      """SELECT doc_id,
                doc_id % 3 IN (0, 1) AS flagged,
                doc_id % 3 = 0 AS changed,
                CASE WHEN doc_id % 3 = 0 THEN md5(text || ' café – “x')
                     WHEN doc_id % 3 = 1 THEN md5(text || ' Ã© ¿')
                     ELSE md5(text) END AS text_md5
         FROM documents""",

    "q404_repair_report" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0
                  END) AS BIGINT) AS n_flagged,
                CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_repaired,
                CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_unrepairable,
                CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_flagged_after
         FROM documents GROUP BY 1""",

    // Disjoint pieces: every occurrence is position-disjoint (no shared
    // chars piece-to-piece or within a piece), so Viterbi token count =
    // chars − matches, and replace-length arithmetic counts matches.
    "q406_unigram_encode" ->
      """WITH t AS (SELECT source,
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
             FROM documents),
         c AS (SELECT source,
                 length(replace(s, ' ', '')) AS nch,
                 (length(s) - length(replace(s, 'th', ''))) // 2
                 + (length(s) - length(replace(s, 'an', ''))) // 2
                 + (length(s) - length(replace(s, 'ou', ''))) // 2
                 + (length(s) - length(replace(s, 'es', ''))) // 2 AS occ
               FROM t)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nch - occ) AS BIGINT) AS tokens_unigram,
                CAST(sum(nch) AS BIGINT) AS n_chars,
                CAST(CASE WHEN sum(nch) = 0 THEN NULL
                  ELSE sum(nch - occ) * 1000000 // sum(nch) END
                  AS BIGINT) AS tokens_per_char_ppm
         FROM c GROUP BY 1""",

    "q367_damerau_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
         SELECT a.p_name AS name_1, b.p_name AS name_2,
                CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT)
                  AS dl_dist,
                CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist
         FROM n a JOIN n b
           ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
          AND a.p_name < b.p_name
         WHERE damerau_levenshtein(a.p_name, b.p_name) <= 3""",

    "q363_jw_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
         SELECT name_1, name_2, jw FROM (
           SELECT a.p_name AS name_1, b.p_name AS name_2,
                  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
           FROM n a JOIN n b
             ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
            AND a.p_name < b.p_name)
         WHERE jw >= 0.85""",

    "q222_fuzzy_pairs" ->
      """WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS nn
             FROM part GROUP BY 1),
         p AS (SELECT a.p_name AS name_1, b.p_name AS name_2,
                  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
                  a.nn * b.nn AS n_pairs
               FROM n a JOIN n b
                 ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
                AND a.p_name < b.p_name)
         SELECT name_1, name_2, dist, n_pairs FROM p WHERE dist <= 3""",

    // q38's sessions swept: ends before starts at equal instants
    // (delta asc), running sum IS the concurrency curve.
    "q223_peak_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                      sum(news) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         sess AS (SELECT min(ts_us) AS st, max(ts_us) AS en
               FROM s GROUP BY user_id, sid),
         d AS (SELECT st // 86400000000 AS k, st AS t,
                  CAST(1 AS BIGINT) AS delta FROM sess
               UNION ALL
               SELECT st // 86400000000, en, CAST(-1 AS BIGINT) FROM sess),
         r AS (SELECT k, t, delta,
                  CAST(sum(delta) OVER (PARTITION BY k ORDER BY t, delta
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run,
                  CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS nd
               FROM d),
         pk AS (SELECT k, nd, run, t,
                  row_number() OVER (PARTITION BY k
                    ORDER BY run DESC, t ASC) AS rk
               FROM r)
         SELECT k AS sweep_key, CAST(nd // 2 AS BIGINT) AS n_intervals,
                run AS peak_concurrency, t AS peak_at_us
         FROM pk WHERE rk = 1""",

    // Trapezoid in exact centi·µs integers; one floor division at the end.
    "q224_twa" ->
      """WITH e AS (SELECT event_type AS s, epoch_us(ts) AS t, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             FROM events),
         l AS (SELECT s, t, c, lag(t) OVER w AS pt, lag(c) OVER w AS pc
               FROM e WINDOW w AS (PARTITION BY s ORDER BY t, event_id))
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(t) - min(t) AS BIGINT) AS span_us,
                CASE WHEN max(t) = min(t) THEN NULL
                     ELSE CAST(sum(CASE WHEN pt IS NOT NULL
                            THEN CAST(pc + c AS HUGEINT) * (t - pt)
                            ELSE 0 END)
                       // (2 * CAST(max(t) - min(t) AS HUGEINT)) AS BIGINT)
                END AS twa_centi
         FROM l GROUP BY 1""",

    "q217_curation_funnel" ->
      """WITH t AS (SELECT doc_id, source, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         tr AS (SELECT * FROM t WHERE doc_id % 97 <> 0),
         q AS (SELECT doc_id, source, text, nt FROM (
                SELECT doc_id, source, text, nt,
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                        / greatest(length(text), 1), 4) AS quality
                FROM tr)
               WHERE quality >= 0.5),
         s2 AS (SELECT doc_id, source, text FROM (
                 SELECT *, row_number() OVER (PARTITION BY md5(nt)
                            ORDER BY doc_id) AS rk FROM q)
                WHERE rk = 1),
         tok AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM t),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1))
                               AS i
                      FROM tok)),
         test_g AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
         contaminated AS (SELECT DISTINCT doc_id FROM sh
                          WHERE doc_id % 97 <> 0
                            AND g IN (SELECT g FROM test_g)),
         s3 AS (SELECT doc_id, source, text FROM s2
                WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         s4 AS (SELECT doc_id, source,
                  CAST(sum(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                           AS BIGINT))
                       OVER (PARTITION BY source ORDER BY md5(text), doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM s3)
         SELECT r.source,
                CAST(count(*) AS BIGINT) AS n_raw,
                CAST(COALESCE(qn.n, 0) AS BIGINT) AS n_quality,
                CAST(COALESCE(dn.n, 0) AS BIGINT) AS n_dedup,
                CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_clean,
                CAST(COALESCE(bn.n, 0) AS BIGINT) AS n_budget
         FROM tr r
         LEFT JOIN (SELECT source, count(*) AS n FROM q GROUP BY 1) qn
           ON r.source = qn.source
         LEFT JOIN (SELECT source, count(*) AS n FROM s2 GROUP BY 1) dn
           ON r.source = dn.source
         LEFT JOIN (SELECT source, count(*) AS n FROM s3 GROUP BY 1) cn
           ON r.source = cn.source
         LEFT JOIN (SELECT source, count(*) AS n FROM s4
                    WHERE cum <= 800 GROUP BY 1) bn
           ON r.source = bn.source
         GROUP BY 1, qn.n, dn.n, cn.n, bn.n""",

    // q20's pair build, swept over integer ppm cutoffs.
    "q216_dedup_sweep" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                  CAST(count(*) AS BIGINT) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         j AS (SELECT inter * 1000000 // (c1.n + c2.n - inter) AS jac
               FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                       JOIN cnt c2 ON pr.id2 = c2.doc_id),
         th AS (SELECT unnest([200000, 300000, 400000, 500000, 600000,
                  700000, 800000, 900000]) AS threshold_ppm)
         SELECT CAST(threshold_ppm AS BIGINT) AS threshold_ppm,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM th JOIN j ON j.jac >= th.threshold_ppm
         GROUP BY 1 ORDER BY 1""",

    // The aHash replayed arithmetically: same synth formulas, same 8x8
    // grid (w=16,h=12: x=2i, y=3j//2), same floor grayscale/mean/bits.
    "q215_image_phash" ->
      """WITH seeds AS (SELECT doc_id, doc_id % 17 AS s FROM documents),
         g AS (SELECT doc_id, s, k,
                 ((((k % 8) * 2) + ((k // 8) * 12 // 8) + s) % 256
                  + ((3 * ((k % 8) * 2) + 5 * ((k // 8) * 12 // 8)
                      + 11 * s) % 256)
                  + ((7 * ((k % 8) * 2) + 13 * ((k // 8) * 12 // 8)
                      + s) % 256)) // 3 AS gray
               FROM seeds, (SELECT unnest(range(0, 64)) AS k)),
         m AS (SELECT doc_id, s, CAST(sum(gray) // 64 AS BIGINT) AS mean
               FROM g GROUP BY 1, 2),
         h AS (SELECT g.doc_id,
                 CAST(sum(CASE WHEN gray > mean THEN
                     CASE WHEN k = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                          ELSE CAST(CAST(1 AS BIGINT) << k AS HUGEINT) END
                   ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS ahash
               FROM g JOIN m ON g.doc_id = m.doc_id
               GROUP BY 1)
         SELECT ahash, CAST(count(*) AS BIGINT) AS n_images,
                CAST(min(doc_id) AS BIGINT) AS min_doc
         FROM h GROUP BY 1""",

    // q67's shingle build, graded: distinct-shingle totals vs held-out
    // hits, floor-ppm.
    "q214_contamination" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         test_g AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
         train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
               FROM train GROUP BY 1),
         hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
               FROM train WHERE g IN (SELECT g FROM test_g) GROUP BY 1)
         SELECT tot.doc_id, tot.n_shingles, hit.n_overlap,
                CAST(n_overlap * 1000000 // n_shingles AS BIGINT)
                  AS overlap_ppm
         FROM tot JOIN hit ON tot.doc_id = hit.doc_id
         ORDER BY overlap_ppm DESC, tot.doc_id ASC LIMIT 25""",

    // The q132 score replay, ranked two ways and folded through the
    // SAME integer discount constants.
    "q348_trimmed_mean" ->
      """WITH x AS (SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
         h AS (SELECT g, v, count(*) AS m FROM x GROUP BY 1, 2),
         c AS (SELECT g, v, m, sum(m) OVER (PARTITION BY g ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         ns AS (SELECT g, count(*) AS n,
                       count(*) * 100000 // 1000000 AS t
                FROM x GROUP BY 1),
         k AS (SELECT c.g, v, n,
                 greatest(0, least(cum, n - t) - greatest(cum - m, t)) AS keep
               FROM c JOIN ns ON c.g = ns.g)
         SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
                CAST(sum(keep) AS BIGINT) AS n_kept,
                CAST(CASE WHEN sum(keep) = 0 THEN NULL
                     ELSE floor(CAST(sum(v * keep) AS DOUBLE) * 10.0
                       / CAST(sum(keep) AS DOUBLE) + 0.5) END AS BIGINT)
                  AS trimmed_mean_milli
         FROM k GROUP BY 1""",

    "q345_equidepth" ->
      """WITH x AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
             FROM lineitem WHERE l_extendedprice IS NOT NULL),
         h AS (SELECT v, count(*) AS m FROM x GROUP BY 1),
         c AS (SELECT v, m, sum(m) OVER (ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         n AS (SELECT count(*) AS n FROM x),
         ks AS (SELECT i AS bucket, (i * n.n + 8 - 1) // 8 AS t
                FROM range(1, 9) r(i), n),
         bounds AS (SELECT bucket, min(v) AS hi_centi
                    FROM c JOIN ks ON c.cum >= ks.t GROUP BY 1),
         cnt AS (SELECT v, m, min(bucket) AS bucket
                 FROM c JOIN bounds ON c.v <= bounds.hi_centi
                 GROUP BY 1, 2),
         bc AS (SELECT bucket, sum(m) AS n_rows FROM cnt GROUP BY 1)
         SELECT bounds.bucket, CAST(hi_centi AS BIGINT) AS hi_centi,
                CAST(coalesce(n_rows, 0) AS BIGINT) AS n_rows
         FROM bounds LEFT JOIN bc ON bounds.bucket = bc.bucket""",

    "q344_mrr_recall" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                      unnest(toks) AS term
               FROM b),
         tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                FROM h WHERE term IN ('join', 'vector', 'slow', 'data')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, term,
                       CASE WHEN tf >= 2 THEN 1 ELSE 0 END AS rel,
                       CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                              / (tf + 1.2 * (0.25 + 0.75 * dl
                                             / (st.tt * 1.0 / st.nd)))
                              * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM (SELECT *, count(*) OVER (PARTITION BY term) AS df
                     FROM tf), st),
         rk AS (SELECT term, rel, row_number() OVER (PARTITION BY term
                  ORDER BY cm DESC, doc_id) AS rn FROM sc),
         tot AS (SELECT term, CAST(sum(rel) AS BIGINT) AS nrel
                 FROM sc GROUP BY 1),
         ink AS (SELECT term,
                   min(CASE WHEN rel = 1 THEN rn END) AS first_rk,
                   CAST(sum(rel) AS BIGINT) AS n_ink
                 FROM rk WHERE rn <= 10 GROUP BY 1)
         SELECT ink.term, tot.nrel AS n_relevant,
                CAST(coalesce(first_rk, 0) AS BIGINT) AS first_rank,
                CAST(CASE WHEN first_rk IS NULL THEN 0
                     ELSE 1000000 // first_rk END AS BIGINT) AS rr_ppm,
                CAST(CASE WHEN nrel = 0 THEN 0
                     ELSE n_ink * 1000000 // least(nrel, 10) END AS BIGINT)
                  AS recall_ppm
         FROM ink JOIN tot ON ink.term = tot.term""",

    "q213_ndcg" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                      unnest(toks) AS term
               FROM b),
         tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                FROM h WHERE term IN ('join', 'vector', 'slow', 'data')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, term, tf,
                       CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                              / (tf + 1.2 * (0.25 + 0.75 * dl
                                             / (st.tt * 1.0 / st.nd)))
                              * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM (SELECT *, count(*) OVER (PARTITION BY term) AS df
                     FROM tf), st),
         d AS (SELECT i, w FROM (VALUES (1, 1000000), (2, 630929),
                 (3, 500000), (4, 430676), (5, 386852), (6, 356207),
                 (7, 333333), (8, 315464), (9, 301029), (10, 289064))
                 v(i, w)),
         rk AS (SELECT term, tf, row_number() OVER (PARTITION BY term
                  ORDER BY cm DESC, doc_id) AS rn FROM sc),
         ik AS (SELECT term, tf, row_number() OVER (PARTITION BY term
                  ORDER BY tf DESC, doc_id) AS rn FROM sc),
         dcg AS (SELECT term, CAST(sum(tf * w) AS BIGINT) AS dcg_micro
               FROM rk JOIN d ON rk.rn = d.i WHERE rn <= 10 GROUP BY 1),
         idcg AS (SELECT term, CAST(sum(tf * w) AS BIGINT) AS idcg_micro
               FROM ik JOIN d ON ik.rn = d.i WHERE rn <= 10 GROUP BY 1)
         SELECT dcg.term, dcg.dcg_micro, idcg.idcg_micro,
                CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT)
                  AS ndcg_ppm
         FROM dcg JOIN idcg ON dcg.term = idcg.term""",

    // Both rankings replayed with DuckDB list slicing + windows.
    "q211_matryoshka" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                  CAST(embedding[1:16] AS DOUBLE[]) AS qp
               FROM embeddings WHERE vec_id IN (0, 7, 21, 42, 63)),
         fr AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id) AS rn
               FROM (SELECT q.qid, e.vec_id,
                       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                     FROM embeddings e, q WHERE e.vec_id <> q.qid)),
         pr AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id) AS rn
               FROM (SELECT q.qid, e.vec_id,
                       round(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]), q.qp)
                         / (sqrt(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]),
                                                  CAST(e.embedding[1:16] AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qp, q.qp))), 6) AS cos
                     FROM embeddings e, q WHERE e.vec_id <> q.qid))
         SELECT f.qid AS query_id, CAST(count(*) AS BIGINT) AS n_overlap,
                CAST(count(*) * 1000000 // 10 AS BIGINT) AS overlap_ppm
         FROM fr f JOIN pr p ON f.qid = p.qid AND f.vec_id = p.vec_id
         WHERE f.rn <= 10 AND p.rn <= 10
         GROUP BY 1""",

    // Per-probe neighbor-label matches replayed, then the same label
    // summary.
    "q212_label_noise" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                  label AS qlabel
               FROM embeddings WHERE vec_id % 7 = 0),
         r AS (SELECT qid, qlabel, e.label,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                     e.vec_id) AS rn
               FROM embeddings e, q WHERE e.vec_id <> q.qid),
         m AS (SELECT qid, qlabel,
                 CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                   AS BIGINT) AS nm
               FROM r WHERE rn <= 10 GROUP BY 1, 2)
         SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
                CAST(sum(nm) * 1000000 // (count(*) * 10) AS BIGINT)
                  AS agreement_ppm,
                CAST(sum(CASE WHEN nm * 2 < 10 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_suspect
         FROM m GROUP BY 1""",

    // Same two windows over the same observed-day table, floor-exact.
    "q210_seasonal_backtest" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         w AS (SELECT s, d, y, d % 7 AS dow,
                 sum(y) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ssum,
                 count(*) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS scnt,
                 lag(y, 1) OVER (PARTITION BY s ORDER BY d) AS prev
               FROM daily),
         b AS (SELECT s, abs(y - ssum // 3) AS efc, abs(y - prev) AS env
               FROM w WHERE scnt = 3 AND prev IS NOT NULL)
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(efc) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_seasonal,
                CAST(sum(env) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_naive
         FROM b GROUP BY 1""",

    // Triangles replayed with the id-orientation (orientation-free
    // result): all three edges of a < b < c present.
    "q354_modularity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem WHERE l_partkey % 5 = 0),
         e AS (SELECT DISTINCT a.i AS x, b.i AS y
               FROM items a JOIN items b ON a.o = b.o AND a.i < b.i),
         deg AS (SELECT n, count(*) AS dg
               FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
               GROUP BY 1),
         m AS (SELECT count(*) AS m FROM e),
         perc AS (SELECT p.p_brand AS community,
                         CAST(count(*) AS BIGINT) AS n_nodes,
                         CAST(sum(coalesce(dg, 0)) AS BIGINT) AS degree_sum
                  FROM part p LEFT JOIN deg ON p.p_partkey = deg.n
                  WHERE p.p_partkey % 5 = 0
                  GROUP BY 1),
         intra AS (SELECT pa.p_brand AS community,
                          CAST(count(*) AS BIGINT) AS intra_edges
                   FROM e JOIN part pa ON e.x = pa.p_partkey
                          JOIN part pb ON e.y = pb.p_partkey
                   WHERE pa.p_brand = pb.p_brand
                   GROUP BY 1)
         SELECT perc.community, n_nodes,
                CAST(coalesce(intra_edges, 0) AS BIGINT) AS intra_edges,
                degree_sum,
                CAST((4 * m.m * coalesce(intra_edges, 0)
                      - degree_sum * degree_sum) * 1000000
                     // (4 * m.m * m.m) AS BIGINT) AS q_contrib_ppm
         FROM perc LEFT JOIN intra ON perc.community = intra.community
         CROSS JOIN m""",

    "q209_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem WHERE l_partkey % 5 = 0),
         e AS (SELECT DISTINCT a.i AS x, b.i AS y
               FROM items a JOIN items b ON a.o = b.o AND a.i < b.i),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS degree
               FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
               GROUP BY 1),
         t AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
               FROM e e1 JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
               JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y),
         tn AS (SELECT n, CAST(count(*) AS BIGINT) AS nt
               FROM (SELECT a AS n FROM t UNION ALL SELECT b FROM t
                     UNION ALL SELECT c FROM t)
               GROUP BY 1)
         SELECT deg.n AS node, deg.degree,
                CAST(COALESCE(tn.nt, 0) AS BIGINT) AS n_triangles,
                CASE WHEN deg.degree < 2 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(2 * COALESCE(tn.nt, 0) * 1000000
                       // (deg.degree * (deg.degree - 1)) AS BIGINT)
                END AS clustering_ppm
         FROM deg LEFT JOIN tn ON deg.n = tn.n
         ORDER BY n_triangles DESC, node ASC LIMIT 50""",

    // Ground truth: the aggregate over the FINAL table state, which the
    // maintained view must reproduce having seen only v0 + the feed.
    "q208_cdf_refresh" ->
      """WITH v1s AS (SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM orders WHERE o_totalprice <= 450000),
         v2s AS (SELECT o_orderkey,
                  CASE WHEN o_totalprice < 50000 THEN 'X'
                       ELSE o_orderstatus END AS o_orderstatus,
                  o_totalprice FROM v1s),
         upd AS (SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
               FROM orders WHERE o_orderkey % 100 = 0),
         v3 AS (SELECT * FROM v2s WHERE o_orderkey NOT IN
                  (SELECT o_orderkey FROM upd)
               UNION ALL SELECT * FROM upd)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM v3 GROUP BY 1""",

    // Pre-filtered brute force at q61's query point — exactness means the
    // IVF plan must reproduce it bit for bit.
    "q207_filtered_ivf" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                    WHERE vec_id = 7)
         SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings, q WHERE vec_id <> 7 AND label = 1
         ORDER BY cos DESC, vec_id LIMIT 10""",

    // The resized-PNG corner pixels replayed from the synth formulas and
    // the floor source mapping (first pixel maps to source (0,0)).
    "q206_png_resize" ->
      """WITH p AS (SELECT doc_id,
                  10 + (doc_id % 7) * 2 AS sw,
                  8 + (doc_id % 5) * 2 AS sh,
                  doc_id % 97 AS seed
             FROM documents),
         m AS (SELECT doc_id, seed,
                 (5 * sw) // 6 AS sx, (3 * sh) // 4 AS sy
               FROM p)
         SELECT doc_id AS media_id, CAST(6 AS INT) AS width,
                CAST(4 AS INT) AS height,
                CAST(seed % 256 AS INT) AS first_r,
                CAST((11 * seed) % 256 AS INT) AS first_g,
                CAST(seed % 256 AS INT) AS first_b,
                CAST((sx + sy + seed) % 256 AS INT) AS last_r,
                CAST((3 * sx + 5 * sy + 11 * seed) % 256 AS INT) AS last_g,
                CAST((7 * sx + 13 * sy + seed) % 256 AS INT) AS last_b
         FROM m""",

    // The change images reconstructed relationally from the op chain:
    // v1 = delete tail, v2 = update sub-50k statuses, v3 = merge the
    // %100 keys (matched keys -> pre+post images, deleted-at-v1 keys
    // -> inserts).
    "q205_change_feed" ->
      """WITH v1s AS (SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM orders WHERE o_totalprice <= 450000),
         v2s AS (SELECT o_orderkey,
                  CASE WHEN o_totalprice < 50000 THEN 'X'
                       ELSE o_orderstatus END AS o_orderstatus,
                  o_totalprice FROM v1s),
         upd AS (SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
               FROM orders WHERE o_orderkey % 100 = 0),
         img AS (
           SELECT 1 AS v, 'delete' AS change_type, o_orderstatus,
                  o_totalprice FROM orders WHERE o_totalprice > 450000
           UNION ALL
           SELECT 2, 'update_preimage', o_orderstatus, o_totalprice
             FROM v1s WHERE o_totalprice < 50000
           UNION ALL
           SELECT 2, 'update_postimage', 'X', o_totalprice
             FROM v1s WHERE o_totalprice < 50000
           UNION ALL
           SELECT 3, 'update_preimage', o_orderstatus, o_totalprice
             FROM v2s WHERE o_orderkey IN (SELECT o_orderkey FROM upd)
           UNION ALL
           SELECT 3, 'update_postimage', u.o_orderstatus, u.o_totalprice
             FROM upd u WHERE u.o_orderkey IN (SELECT o_orderkey FROM v2s)
           UNION ALL
           SELECT 3, 'insert', u.o_orderstatus, u.o_totalprice
             FROM upd u WHERE u.o_orderkey NOT IN
               (SELECT o_orderkey FROM v2s))
         SELECT CAST(v AS BIGINT) AS v, change_type,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents,
                CAST(sum(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_x,
                CAST(sum(CASE WHEN o_orderstatus = 'M' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_m
         FROM img GROUP BY 1, 2""",

    // The mismatched-value-set SPJ replayed relationally.
    "q204_spj_multicol" ->
      """WITH b AS (SELECT o_orderstatus, o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n_right
             FROM orders WHERE o_orderstatus <> 'P' GROUP BY 1, 2)
         SELECT o.o_orderstatus, o.o_orderpriority,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents,
                CAST(max(n_right) AS BIGINT) AS n_right
         FROM orders o JOIN b USING (o_orderstatus, o_orderpriority)
         GROUP BY 1, 2""",

    "q181_partitioned_join" ->
      """SELECT c_mktsegment, o_orderstatus,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2""",

    // The metadata COUNT(col)/SUM readout recomputed from raw parquet.
    "q178_metadata_sum" ->
      """WITH w AS (SELECT l_orderkey,
                  CASE WHEN l_linenumber <> 1 THEN l_partkey END AS opt_part,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
             FROM lineitem)
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(opt_part) AS BIGINT) AS n_with_part,
                CAST(sum(opt_part) AS BIGINT) AS sum_part,
                CAST(sum(price_cents) AS BIGINT) AS sum_cents
         FROM w""",

    // Phrase search replayed with the same anchor/slot arithmetic over
    // DuckDB's zipped unnest + generate_subscripts positions.
    "q361_proximity_search" ->
      """WITH toks AS (
           SELECT doc_id, unnest(a) AS term,
                  generate_subscripts(a, 1) - 1 AS pos
           FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS a
                 FROM documents)),
         pa AS (SELECT doc_id, pos AS p1 FROM toks WHERE term = 'scan'),
         pb AS (SELECT doc_id, pos AS p2 FROM toks WHERE term = 'column')
         SELECT pa.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(min(abs(p1 - p2)) AS BIGINT) AS min_dist
         FROM pa JOIN pb ON pa.doc_id = pb.doc_id
         WHERE abs(p1 - p2) <= 5
         GROUP BY 1""",

    "q177_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, unnest(a) AS term,
                  generate_subscripts(a, 1) - 1 AS pos
           FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS a
                 FROM documents)),
         m AS (SELECT doc_id, pos - slot AS anchor, slot
               FROM toks JOIN (VALUES (0, 'value'), (1, 'table'))
                 p(slot, w) ON toks.term = p.w
               WHERE pos - slot >= 0),
         h AS (SELECT doc_id, anchor FROM m GROUP BY 1, 2
               HAVING count(DISTINCT slot) = 2)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                CAST(min(anchor) AS BIGINT) AS first_pos
         FROM h GROUP BY 1""",

    // q82's full portable-LSH replay with a source join on both ends.
    "q194_source_neardup_matrix" ->
      s"""WITH $PortablePairsSql
         SELECT least(d1.source, d2.source) AS src_a,
                greatest(d1.source, d2.source) AS src_b,
                CAST(count(*) AS BIGINT) AS n_neardup_pairs
         FROM pr JOIN documents d1 ON pr.id1 = d1.doc_id
                 JOIN documents d2 ON pr.id2 = d2.doc_id
         GROUP BY 1, 2""",

    // Preference pairs replayed: same cells, same cross-multiplied
    // strict wins, same floor-centi margin gate.
    "q300_preference_pairs" ->
      """WITH cells AS (SELECT user_id AS e, event_type AS i,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS HUGEINT) AS s,
                CAST(count(*) AS HUGEINT) AS n
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2)
         SELECT a.e AS entity, a.i AS chosen, b.i AS rejected,
                CAST((a.s * b.n - b.s * a.n) // (a.n * b.n) AS BIGINT)
                  AS margin_centi
         FROM cells a JOIN cells b ON a.e = b.e AND a.i <> b.i
         WHERE a.s * b.n > b.s * a.n
           AND (a.s * b.n - b.s * a.n) // (a.n * b.n) >= 500""",

    // Bitmap distinct's oracle is plain COUNT(DISTINCT): equality IS
    // the exactness claim.
    "q309_bitmap_distinct" ->
      """SELECT event_type,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
         FROM events WHERE user_id IS NOT NULL GROUP BY 1""",

    // Melt replayed as the explicit three-way UNION ALL.
    "q320_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
                  CAST(l_quantity AS BIGINT) AS value
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'discount_centi',
                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'tax_centi',
                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
           FROM lineitem WHERE l_orderkey % 50 = 0) u""",

    // First-day marking + running sum, replayed with the same windows.
    "q321_running_distinct" ->
      """WITH fd AS (SELECT event_type AS g, user_id AS k,
                CAST(min(ts) AS DATE) AS d
             FROM events
             WHERE event_type IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1, 2),
         daily AS (SELECT g, d, CAST(count(*) AS BIGINT) AS n_new
                   FROM fd GROUP BY 1, 2)
         SELECT g AS event_type, strftime(d, '%Y-%m-%d') AS d, n_new,
                CAST(sum(n_new) OVER (PARTITION BY g ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_distinct
         FROM daily ORDER BY event_type, d""",

    // Widening is metadata-only too: same source recompute.
    "q322_type_widening" ->
      """SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // The rename/drop cycle is metadata-only, so the oracle recomputes
    // the SAME rows straight from the source table.
    "q319_column_mapping" ->
      """SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q341_embedding_drift" ->
      """WITH j AS (SELECT d.source AS s, CAST(e.vec_id % 2 AS INTEGER) AS era,
                  list_transform(CAST(e.embedding AS DOUBLE[]),
                    x -> CAST(floor(x * 1000.0 + 0.5) AS HUGEINT)) AS v
             FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
             WHERE d.source IS NOT NULL),
         q AS (SELECT s, era, CAST(pos AS BIGINT) AS dim, v[pos] AS x
               FROM (SELECT s, era, v, unnest(range(1, len(v) + 1)) AS pos
                     FROM j)),
         sums AS (SELECT s, era, dim, CAST(count(*) AS HUGEINT) AS n,
                         sum(x) AS sm
                  FROM q GROUP BY 1, 2, 3),
         a AS (SELECT s, dim, n AS n0, sm AS s0 FROM sums WHERE era = 0),
         b AS (SELECT s, dim, n AS n1, sm AS s1 FROM sums WHERE era = 1),
         fj AS (SELECT coalesce(a.s, b.s) AS s, a.n0, a.s0, b.n1, b.s1
                FROM a FULL JOIN b ON a.s = b.s AND a.dim = b.dim),
         g AS (SELECT s, max(n0) AS n0, max(n1) AS n1,
                      sum((s0 * n1 - s1 * n0) * (s0 * n1 - s1 * n0)) AS num
               FROM fj GROUP BY 1)
         SELECT s AS source,
                CAST(coalesce(n0, 0) AS BIGINT) AS n_era0,
                CAST(coalesce(n1, 0) AS BIGINT) AS n_era1,
                CAST(CASE WHEN n0 IS NULL OR n1 IS NULL THEN NULL
                  ELSE floor(sqrt(CAST(num AS DOUBLE))
                    / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                    * 1000.0 + 0.5) END AS BIGINT) AS drift_micro
         FROM g""",

    "q340_cohens_d" ->
      """WITH x AS (SELECT l_returnflag = 'R' AS a,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS x
             FROM lineitem
             WHERE l_extendedprice IS NOT NULL
               AND l_returnflag IN ('R', 'N')),
         agg AS (SELECT
                   CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
                   CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS n2,
                   coalesce(sum(CASE WHEN a THEN x END), 0) AS s1,
                   coalesce(sum(CASE WHEN NOT a THEN x END), 0) AS s2,
                   coalesce(sum(CASE WHEN a THEN x * x END), 0) AS q1,
                   coalesce(sum(CASE WHEN NOT a THEN x * x END), 0) AS q2
                 FROM x)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(NULL AS DOUBLE)
                  WHEN (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                   + (CAST(q2 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   <= 0.0 THEN CAST(NULL AS DOUBLE)
                  ELSE round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   / sqrt(((CAST(q1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                     + (CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                    / CAST(n1 + n2 - 2 AS DOUBLE)), 6) END AS cohens_d
         FROM agg""",

    "q339_shapley" ->
      """WITH ev AS (SELECT user_id AS u, ts, event_type AS ch FROM events),
         conv AS (SELECT u, min(ts) AS ct FROM ev
                  WHERE ch = 'purchase' GROUP BY 1),
         touch AS (SELECT DISTINCT e.u, e.ch
                   FROM ev e JOIN conv ON e.u = conv.u
                   WHERE e.ts < conv.ct AND e.ch <> 'purchase'),
         chans AS (SELECT ch, row_number() OVER (ORDER BY ch) - 1 AS bit
                   FROM (SELECT DISTINCT ch FROM touch)),
         kk AS (SELECT CAST(count(*) AS INTEGER) AS k FROM chans),
         umask AS (SELECT u, sum(1 << bit) AS mask
                   FROM touch JOIN chans USING (ch) GROUP BY 1),
         mcnt AS (SELECT mask, count(*) AS c FROM umask GROUP BY 1),
         sets AS (SELECT unnest(range(0, 1 << k)) AS s FROM kk),
         v AS (SELECT s, coalesce(sum(c), 0) AS v
               FROM sets LEFT JOIN mcnt ON (mcnt.mask & sets.s) = mcnt.mask
               GROUP BY 1),
         f AS (SELECT a.n, CAST(coalesce(product(b.i), 1) AS HUGEINT) AS fact
               FROM (SELECT unnest(range(0, k + 1)) AS n FROM kk) a
               LEFT JOIN (SELECT unnest(range(1, k + 1)) AS i FROM kk) b
                 ON b.i <= a.n
               GROUP BY a.n),
         marg AS (SELECT chans.ch, sets.s,
                    CAST(bit_count(CAST(sets.s AS BIGINT)) AS INTEGER) AS sz,
                    (SELECT v FROM v WHERE v.s = (sets.s | (1 << bit)))
                      - (SELECT v FROM v WHERE v.s = sets.s) AS dv
                  FROM chans, sets
                  WHERE (sets.s & (1 << bit)) = 0),
         num AS (SELECT ch, sum(fs.fact * fk.fact * dv) AS num
                 FROM marg
                 JOIN f fs ON fs.n = marg.sz
                 JOIN f fk ON fk.n = (SELECT k FROM kk) - 1 - marg.sz
                 GROUP BY 1),
         tot AS (SELECT (SELECT v FROM v
                         WHERE s = (1 << (SELECT k FROM kk)) - 1) AS vfull,
                        (SELECT fact FROM f
                         WHERE n = (SELECT k FROM kk)) AS kfact)
         SELECT ch AS channel, CAST(num AS BIGINT) AS shapley_kfact,
                CAST(CASE WHEN vfull = 0 THEN 0
                     ELSE num * 1000000 // (kfact * vfull) END AS BIGINT)
                  AS share_ppm
         FROM num, tot""",

    "q337_weighted_median" ->
      """WITH x AS (SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
                  CAST(l_quantity AS BIGINT) AS w
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
               AND l_quantity IS NOT NULL AND l_quantity > 0),
         h AS (SELECT g, x, sum(w) AS m FROM x GROUP BY 1, 2),
         c AS (SELECT g, x, m,
                 sum(m) OVER (PARTITION BY g ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM h),
         ks AS (SELECT g, sum(w) AS tw,
                       (sum(w) + 1) // 2 AS k1,
                       (sum(w) + 2) // 2 AS k2
                FROM x GROUP BY 1)
         SELECT c.g AS l_returnflag,
                CAST(max(tw) AS BIGINT) AS total_weight,
                CAST(min(CASE WHEN cum >= k1 THEN x END)
                   + min(CASE WHEN cum >= k2 THEN x END) AS BIGINT)
                  AS wmedian2_centi
         FROM c JOIN ks ON c.g = ks.g
         GROUP BY 1""",

    "q338_cramers_v" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                  CAST(count(*) AS HUGEINT) AS o
               FROM orders GROUP BY 1, 2),
         r AS (SELECT a, sum(o) AS rt FROM cells GROUP BY 1),
         c AS (SELECT b, sum(o) AS ct FROM cells GROUP BY 1),
         nn AS (SELECT sum(o) AS n,
                       CAST(count(DISTINCT a) AS HUGEINT) AS r,
                       CAST(count(DISTINCT b) AS HUGEINT) AS c
                FROM cells),
         t AS (SELECT nn.n, nn.r, nn.c,
                 (coalesce(o, 0) * nn.n - rt * ct)
                 * (coalesce(o, 0) * nn.n - rt * ct) * 1000
                 // (rt * ct * nn.n) AS tt
               FROM r CROSS JOIN c CROSS JOIN nn
               LEFT JOIN cells ON cells.a = r.a AND cells.b = c.b),
         agg AS (SELECT n, r, c, sum(tt) AS chi2m FROM t GROUP BY 1, 2, 3)
         SELECT CAST(n AS BIGINT) AS n_rows,
                CAST(CASE WHEN r < 2 OR c < 2 THEN NULL ELSE chi2m END
                  AS BIGINT) AS chi2_milli,
                CASE WHEN r < 2 OR c < 2 OR n = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE round(sqrt(CAST(chi2m AS DOUBLE) / 1000.0
                    / (CAST(n AS DOUBLE)
                       * CAST(least(r - 1, c - 1) AS DOUBLE))), 6) END
                  AS cramers_v
         FROM agg""",

    "q336_brown_forsythe" ->
      """WITH x AS (SELECT event_type AS g,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
               FROM events
               WHERE event_type IS NOT NULL AND value IS NOT NULL),
         h AS (SELECT g, x, count(*) AS m FROM x GROUP BY 1, 2),
         c AS (SELECT g, x, m,
                 sum(m) OVER (PARTITION BY g ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM h),
         ks AS (SELECT g, count(*) AS ng,
                       (count(*) + 1) // 2 AS k1,
                       (count(*) + 2) // 2 AS k2
                FROM x GROUP BY 1),
         med AS (SELECT c.g,
                   min(CASE WHEN cum >= k1 THEN x END)
                   + min(CASE WHEN cum >= k2 THEN x END) AS med2
                 FROM c JOIN ks ON c.g = ks.g GROUP BY 1),
         z AS (SELECT x.g, CAST(abs(2 * x.x - med2) AS HUGEINT) AS z
               FROM x JOIN med ON x.g = med.g),
         gs AS (SELECT g, CAST(count(*) AS HUGEINT) AS ng, sum(z) AS sg
                FROM z GROUP BY 1),
         t AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(z) AS sx,
                      sum(z * z) AS sxx
               FROM z),
         b AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                      sum(sg * sg * t.n // ng) AS ssbs,
                      any_value(t.n) AS n, any_value(t.sx) AS sx,
                      any_value(t.sxx) AS sxx
               FROM gs, t)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_groups,
                CAST(CASE WHEN k < 2 OR n <= k
                          OR (n * sxx - sx * sx) - (ssbs - sx * sx) = 0
                     THEN NULL
                     ELSE (ssbs - sx * sx) * (n - k) * 1000
                          // (((n * sxx - sx * sx) - (ssbs - sx * sx))
                             * (k - 1)) END AS BIGINT) AS bf_f_milli
         FROM b""",

    "q335_source_tvd" ->
      """WITH wc AS (SELECT source AS s, w, count(*) AS c
             FROM (SELECT source,
                     unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
                   FROM documents WHERE source IS NOT NULL)
             WHERE length(w) > 0
             GROUP BY 1, 2),
         tot AS (SELECT s, sum(c) AS n FROM wc GROUP BY 1),
         pairs AS (SELECT a.s AS src_a, b.s AS src_b, a.n AS na, b.n AS nb
                   FROM tot a, tot b WHERE a.s < b.s),
         inn AS (SELECT a.s AS src_a, b.s AS src_b,
                        sum(abs(a.c * tb.n - b.c * ta.n)) AS si,
                        sum(a.c) AS sca, sum(b.c) AS scb
                 FROM wc a JOIN wc b ON a.w = b.w AND a.s < b.s
                 JOIN tot ta ON ta.s = a.s
                 JOIN tot tb ON tb.s = b.s
                 GROUP BY 1, 2)
         SELECT p.src_a, p.src_b,
                CAST((coalesce(si, 0)
                   + (na - coalesce(sca, 0)) * nb
                   + (nb - coalesce(scb, 0)) * na) * 1000000
                  // (2 * na * nb) AS BIGINT) AS tvd_ppm
         FROM pairs p LEFT JOIN inn
           ON p.src_a = inn.src_a AND p.src_b = inn.src_b""",

    "q333_mp3_vbr" ->
      """SELECT doc_id,
                CAST(100 + doc_id % 900 AS BIGINT) AS vbr_frames,
                CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END AS BIGINT) AS sample_rate,
                CAST((100 + doc_id % 900) * 1152 * 1000
                  // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                      ELSE 32000 END) AS BIGINT) AS duration_ms
         FROM documents""",

    "q334_avif_dims" ->
      """SELECT doc_id,
                CAST((doc_id % 200 + 1) * 2 AS BIGINT) AS width,
                CAST((doc_id % 100 + 1) * 3 AS BIGINT) AS height
         FROM documents""",

    "q358_zip_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 7 AS BIGINT) AS n_entries,
                CAST((1 + doc_id % 7) * (64 + (doc_id % 5) * 32) AS BIGINT)
                  AS total_bytes,
                CAST((1 + doc_id % 7) * (64 + (doc_id % 5) * 32) AS BIGINT)
                  AS compressed_bytes
         FROM documents""",

    "q359_tar_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 6 AS BIGINT) AS n_entries,
                CAST((1 + doc_id % 6) * (100 + (doc_id % 9) * 50) AS BIGINT)
                  AS total_bytes
         FROM documents""",

    "q352_ogg_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 2 AS BIGINT) AS codec,
                CAST(CASE WHEN doc_id % 2 = 1 THEN 48000
                     ELSE CASE doc_id % 3 WHEN 0 THEN 44100
                          WHEN 1 THEN 48000 ELSE 32000 END
                     END AS BIGINT) AS sample_rate,
                CAST(1 + doc_id % 2 AS BIGINT) AS channels,
                CAST(1000 + doc_id % 9000 AS BIGINT) AS n_samples
         FROM documents""",

    "q332_merge_apply" ->
      """WITH base AS (SELECT o_orderkey AS k,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders),
         final AS (
           SELECT k, cents + 12345 AS cents FROM base WHERE k % 7 = 1
           UNION ALL
           SELECT k, cents FROM base WHERE k % 7 NOT IN (0, 1)
           UNION ALL
           SELECT k + 1000000000 AS k, 77 AS cents FROM base WHERE k % 7 = 2)
         SELECT CAST(k % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM final GROUP BY 1""",

    "q331_column_default" ->
      """WITH t AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'legacy'
                       WHEN CAST(l_quantity AS BIGINT) >= 25 THEN 'high'
                       ELSE 'low' END AS grade,
                    CAST(l_quantity AS BIGINT) AS qty
             FROM lineitem)
         SELECT grade, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(qty) AS BIGINT) AS sum_qty
         FROM t GROUP BY 1""",

    "q330_bfs_hops" ->
      """WITH li AS (SELECT DISTINCT l_suppkey AS sk,
                  l_partkey + 10000000 AS pk FROM lineitem),
         e AS (SELECT sk AS s, pk AS d FROM li
               UNION SELECT pk AS s, sk AS d FROM li),
         v0 AS (SELECT unnest([1, 2, 3]) AS node),
         f1 AS (SELECT DISTINCT e.d AS node FROM e JOIN v0 ON e.s = v0.node
                WHERE e.d NOT IN (SELECT node FROM v0)),
         f2 AS (SELECT DISTINCT e.d AS node FROM e JOIN f1 ON e.s = f1.node
                WHERE e.d NOT IN (SELECT node FROM v0)
                  AND e.d NOT IN (SELECT node FROM f1)),
         f3 AS (SELECT DISTINCT e.d AS node FROM e JOIN f2 ON e.s = f2.node
                WHERE e.d NOT IN (SELECT node FROM v0)
                  AND e.d NOT IN (SELECT node FROM f1)
                  AND e.d NOT IN (SELECT node FROM f2)),
         allv AS (SELECT node, 0 AS hops FROM v0
                  UNION ALL SELECT node, 1 FROM f1
                  UNION ALL SELECT node, 2 FROM f2
                  UNION ALL SELECT node, 3 FROM f3)
         SELECT CAST(hops AS BIGINT) AS hops,
                CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(min(node) AS BIGINT) AS min_node,
                CAST(max(node) AS BIGINT) AS max_node
         FROM allv GROUP BY 1""",

    "q329_concentration" ->
      """WITH x AS (SELECT event_type AS g, user_id AS e, count(*) AS c
               FROM events
               WHERE event_type IS NOT NULL AND user_id IS NOT NULL
               GROUP BY 1, 2),
         h AS (SELECT g, c, count(*) AS m FROM x GROUP BY 1, 2),
         b AS (SELECT g, c, m,
                 coalesce(sum(m) OVER (PARTITION BY g ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
               FROM h),
         a AS (SELECT g, sum(m) AS n, sum(c * m) AS s,
                      sum(c * m * (2 * below + m + 1)) AS tis,
                      sum(m * c * c) AS sq, max(c) AS top
               FROM b GROUP BY 1)
         SELECT g AS event_type, CAST(n AS BIGINT) AS n_entities,
                CAST(s AS BIGINT) AS total,
                CAST((tis - (n + 1) * s) * 1000000 // (n * s) AS BIGINT)
                  AS gini_ppm,
                CAST(sq * 1000000 // (s * s) AS BIGINT) AS hhi_ppm,
                CAST(top * 1000000 // s AS BIGINT) AS top1_ppm
         FROM a""",

    "q356_welch_t" ->
      """WITH rows_ AS (SELECT CAST(l_returnflag AS VARCHAR) AS g,
                      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS q
               FROM lineitem
               WHERE l_extendedprice IS NOT NULL
                 AND l_returnflag IN ('R', 'N')),
         f AS (SELECT
                 CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS HUGEINT) AS na,
                 CAST(coalesce(sum(CASE WHEN g = 'R' THEN q END), 0) AS HUGEINT) AS sa,
                 CAST(coalesce(sum(CASE WHEN g = 'R'
                      THEN CAST(q AS HUGEINT) * q END), 0) AS HUGEINT) AS qa,
                 CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
                 CAST(coalesce(sum(CASE WHEN g = 'N' THEN q END), 0) AS HUGEINT) AS sb,
                 CAST(coalesce(sum(CASE WHEN g = 'N'
                      THEN CAST(q AS HUGEINT) * q END), 0) AS HUGEINT) AS qb
               FROM rows_),
         t AS (SELECT na, nb,
                      CASE WHEN na = 0 OR nb = 0 THEN NULL
                           ELSE (sa * nb - sb * na) * 1000000 // (na * nb) END AS dm,
                      CASE WHEN na < 2 THEN NULL
                           ELSE (na * qa - sa * sa) * 1000
                                // (na * na * (na - 1)) END AS vam,
                      CASE WHEN nb < 2 THEN NULL
                           ELSE (nb * qb - sb * sb) * 1000
                                // (nb * nb * (nb - 1)) END AS vbm
               FROM f)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                CAST(dm AS BIGINT) AS mean_diff_micro,
                CAST(CASE WHEN vam IS NULL OR vbm IS NULL
                          OR vam + vbm <= 0 THEN NULL
                     ELSE dm * dm * 1000 // ((vam + vbm) * 1000000000) END
                  AS BIGINT) AS t2_milli,
                CAST(CASE WHEN vam IS NULL OR vbm IS NULL OR vam + vbm <= 0
                          OR vam * vam * (nb - 1)
                           + vbm * vbm * (na - 1) = 0 THEN NULL
                     ELSE (vam + vbm) * (vam + vbm)
                          * (na - 1) * (nb - 1) * 1000
                          // (vam * vam * (nb - 1)
                            + vbm * vbm * (na - 1)) END
                  AS BIGINT) AS df_milli
         FROM t""",

    "q328_mann_whitney" ->
      """WITH rows_ AS (SELECT CAST(l_returnflag AS VARCHAR) AS g, l_quantity AS v
               FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_returnflag IN ('R', 'N')),
         r AS (SELECT v, count(*) AS m FROM rows_ GROUP BY 1),
         rk AS (SELECT v, m,
                  2 * coalesce(sum(m) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + m + 1 AS r2
                FROM r),
         f AS (SELECT sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS n1,
                      sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS n2,
                      sum(CASE WHEN g = 'R' THEN r2 ELSE 0 END) AS tr1
               FROM rows_ JOIN rk USING (v)),
         t AS (SELECT sum(m * m * m - m) AS tie FROM rk)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CAST(tr1 - n1 * (n1 + 1) AS BIGINT) AS two_u1,
                CAST(tie AS BIGINT) AS tie_term,
                CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE)
                  WHEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                    * (CAST(n1 + n2 + 1 AS DOUBLE)
                       - CAST(tie AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE)
                            * CAST(n1 + n2 - 1 AS DOUBLE))) <= 0.0
                  THEN CAST(NULL AS DOUBLE)
                  ELSE round((CAST(tr1 - n1 * (n1 + 1) AS DOUBLE)
                      - CAST(n1 * n2 AS DOUBLE))
                    / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       / 12.0 * (CAST(n1 + n2 + 1 AS DOUBLE)
                         - CAST(tie AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE)
                              * CAST(n1 + n2 - 1 AS DOUBLE))))), 6)
                  END AS z
         FROM f, t""",

    "q349_span_sweep" -> spanSweepOracleSql,

    "q347_span_incremental" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         store AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
         cov AS (SELECT DISTINCT doc_id, p FROM g
                 JOIN store USING (gram) WHERE doc_id % 2 = 1),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl)
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
                CAST(max(p) + 8 - min(p) AS BIGINT) AS span_len
         FROM sp GROUP BY doc_id, sid""",

    // Shingle semantics mirror q20's (distinct 3-gram sets, lowercased
    // whitespace tokens); the df side joins raw shingle strings where
    // Spark joins their 64-bit hashes — the family's collision trade.
    "q346_novelty" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         df AS (SELECT g, count(DISTINCT doc_id) AS nd FROM sh GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unique,
                CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) * 1000000
                  // count(*) AS BIGINT) AS novelty_ppm
         FROM sh JOIN df USING (g)
         GROUP BY 1""",

    "q342_span_clean" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl),
         spans AS (SELECT doc_id, max(p) + 8 - min(p) AS slen
                   FROM sp GROUP BY doc_id, sid),
         agg AS (SELECT doc_id, CAST(sum(slen) AS BIGINT) AS dup_tokens,
                        CAST(count(*) AS BIGINT) AS n_spans
                 FROM spans GROUP BY 1),
         per AS (SELECT d.source, d.doc_id,
                   CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT)
                     AS n_tokens,
                   coalesce(agg.dup_tokens, 0) AS dup_tokens,
                   coalesce(agg.n_spans, 0) AS n_spans
                 FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS docs_touched,
                CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
                CAST(sum(dup_tokens) AS BIGINT) AS tokens_removed,
                CAST(sum(n_tokens) - sum(dup_tokens) AS BIGINT) AS tokens_after,
                CAST(CASE WHEN sum(n_tokens) = 0 THEN 0
                     ELSE sum(dup_tokens) * 1000000 // sum(n_tokens) END
                  AS BIGINT) AS removed_ppm
         FROM per GROUP BY 1""",

    // The rewrite replayed arithmetically: same span CTEs as q325, then
    // the splice — touched docs rebuild from original-case tokens whose
    // 0-based position falls in no span interval (string_agg ordered by
    // position), untouched docs pass text through verbatim. A fully
    // covered doc collapses to '' via the coalesce, exactly like Spark's
    // empty-array array_join.
    "q350_span_rewrite" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl),
         spans AS (SELECT doc_id, min(p) AS s0, max(p) + 8 - min(p) AS slen
                   FROM sp GROUP BY doc_id, sid),
         agg AS (SELECT doc_id, CAST(sum(slen) AS BIGINT) AS removed
                 FROM spans GROUP BY 1),
         raw AS (SELECT doc_id, text,
                   string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
                     AS rtoks,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                     AS n_tokens
                 FROM documents),
         pos AS (SELECT doc_id, rtoks,
                        unnest(range(1, len(rtoks) + 1)) AS i
                 FROM raw WHERE doc_id IN (SELECT doc_id FROM agg)),
         kept AS (SELECT p.doc_id,
                    string_agg(p.rtoks[p.i], ' ' ORDER BY p.i) AS ctext,
                    CAST(count(*) AS BIGINT) AS nkept
                  FROM pos p
                  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id
                      AND p.i - 1 >= s.s0 AND p.i - 1 < s.s0 + s.slen)
                  GROUP BY 1)
         SELECT r.doc_id, r.n_tokens,
                coalesce(a.removed, 0) AS tokens_removed,
                CAST(CASE WHEN a.doc_id IS NULL THEN r.n_tokens
                     ELSE coalesce(k.nkept, 0) END AS BIGINT) AS tokens_after,
                CASE WHEN a.doc_id IS NULL THEN r.text
                     ELSE coalesce(k.ctext, '') END AS clean_text
         FROM raw r
         LEFT JOIN agg a USING (doc_id)
         LEFT JOIN kept k USING (doc_id)""",

    // Duplicated spans replayed raw: gram explode with positions, grams
    // in ≥2 distinct docs, interval union via gaps-and-islands. The
    // Spark side joins 64-bit gram hashes (collision trade doc'd); the
    // oracle joins the raw gram strings — hash equality proves both.
    "q325_dup_spans" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl)
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
                CAST(max(p) + 8 - min(p) AS BIGINT) AS span_len
         FROM sp GROUP BY doc_id, sid""",

    "q326_span_report" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl),
         spans AS (SELECT doc_id, min(p) AS s0, max(p) + 8 - min(p) AS slen
                   FROM sp GROUP BY doc_id, sid),
         agg AS (SELECT doc_id, CAST(sum(slen) AS BIGINT) AS dup_tokens,
                        CAST(count(*) AS BIGINT) AS n_spans
                 FROM spans GROUP BY 1),
         tot AS (SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                     AS n_tokens
                 FROM documents)
         SELECT tot.doc_id, n_tokens,
                coalesce(dup_tokens, 0) AS dup_tokens,
                coalesce(n_spans, 0) AS n_spans,
                CAST(CASE WHEN n_tokens = 0 THEN 0
                     ELSE coalesce(dup_tokens, 0) * 1000000 // n_tokens END
                  AS BIGINT) AS dup_ppm
         FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id""",

    // BPE encode under the disjoint-alphabet merge table: the token
    // count's closed form (non-space chars minus each pair's
    // leftmost-nonoverlapping occurrences, countable via replace
    // arithmetic) — the oracle derives it WITHOUT replaying the encode
    // loop, so the hash proves the expression's merge semantics.
    "q323_bpe_encode" ->
      """WITH t AS (SELECT doc_id,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents)
         SELECT doc_id,
                CAST(length(replace(nt, ' ', ''))
                  - (length(nt) - length(replace(nt, 'th', ''))) // 2
                  - (length(nt) - length(replace(nt, 'an', ''))) // 2
                  - (length(nt) - length(replace(nt, 'ou', ''))) // 2
                  - (length(nt) - length(replace(nt, 'es', ''))) // 2
                  AS BIGINT) AS n_tokens
         FROM t""",

    "q324_bpe_budget" ->
      """WITH t AS (SELECT doc_id, source, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT doc_id, source, md5(text) AS pick,
                  CAST(length(replace(nt, ' ', ''))
                    - (length(nt) - length(replace(nt, 'th', ''))) // 2
                    - (length(nt) - length(replace(nt, 'an', ''))) // 2
                    - (length(nt) - length(replace(nt, 'ou', ''))) // 2
                    - (length(nt) - length(replace(nt, 'es', ''))) // 2
                    AS BIGINT) AS n_tokens
               FROM t)
         SELECT doc_id, source, n_tokens, cum_tokens
         FROM (SELECT doc_id, source, n_tokens,
                      CAST(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY pick, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM c)
         WHERE cum_tokens <= 4000""",

    // The prefix filter is LOSSLESS, so its oracle is the plain
    // brute-force exact join — hash equality proves the claim.
    "q317_prefix_jaccard" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT id1, id2,
                round(inter * 1.0 / (c1.n + c2.n - inter), 4) AS jaccard
         FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                 JOIN cnt c2 ON pr.id2 = c2.doc_id
         WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.5""",

    // FP-Growth replayed as the explicit 1/2/3-itemset lattice with the
    // same integer support threshold.
    "q318_fp_growth" ->
      """WITH b AS (SELECT DISTINCT user_id AS u, event_type AS i
             FROM events
             WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         th AS (SELECT greatest(2, count(DISTINCT u) // 20) AS t FROM b),
         s1 AS (SELECT i AS itemset, 1 AS n_items, count(*) AS c
                FROM b GROUP BY 1),
         s2 AS (SELECT a.i || ',' || b2.i AS itemset, 2 AS n_items,
                       count(*) AS c
                FROM b a JOIN b b2 ON a.u = b2.u AND a.i < b2.i
                GROUP BY 1),
         s3 AS (SELECT a.i || ',' || b2.i || ',' || c3.i AS itemset,
                       3 AS n_items, count(*) AS c
                FROM b a JOIN b b2 ON a.u = b2.u AND a.i < b2.i
                          JOIN b c3 ON a.u = c3.u AND b2.i < c3.i
                GROUP BY 1)
         SELECT itemset, CAST(n_items AS BIGINT) AS n_items,
                CAST(c AS BIGINT) AS support
         FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
               UNION ALL SELECT * FROM s3) u0, th
         WHERE c >= t
         ORDER BY n_items, itemset""",

    // WebP roundtrip: parse(synth(p)) == p, so the oracle re-derives
    // both the parameters AND the "decoded" columns arithmetically.
    "q315_webp_dims" ->
      """WITH p AS (SELECT doc_id % 3 AS variant, 16 + doc_id % 17 AS w,
                9 + doc_id % 13 AS h
             FROM documents)
         SELECT CAST(variant AS BIGINT) AS variant, CAST(w AS BIGINT) AS w,
                CAST(h AS BIGINT) AS h, CAST(w AS BIGINT) AS w_decoded,
                CAST(h AS BIGINT) AS h_decoded,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // MP3 roundtrip: the walker's table lookups re-derived as CASEs.
    "q316_mp3_meta" ->
      """WITH p AS (SELECT 1 + doc_id % 14 AS br_idx, doc_id % 3 AS sr_idx,
                3 + doc_id % 5 AS frames
             FROM documents)
         SELECT CAST(br_idx AS BIGINT) AS br_idx,
                CAST(sr_idx AS BIGINT) AS sr_idx,
                CAST(frames AS BIGINT) AS frames,
                CAST(frames AS BIGINT) AS frames_decoded,
                CAST(CASE sr_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END AS BIGINT) AS sample_rate,
                CAST(CASE br_idx WHEN 1 THEN 32 WHEN 2 THEN 40
                     WHEN 3 THEN 48 WHEN 4 THEN 56 WHEN 5 THEN 64
                     WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
                     WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
                     WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END
                     AS BIGINT) AS bitrate_kbps,
                CAST(frames * 1152 AS BIGINT) AS n_samples,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM p GROUP BY 1, 2, 3, 4, 5, 6, 7 ORDER BY 1, 2, 3""",

    // Label propagation unrolled: three synchronous argmax rounds
    // (count desc, label asc), identical tie rule via row_number.
    "q313_label_prop" -> {
      def round(prev: String, out: String) =
        s"""$out AS (SELECT node, lbl FROM (
               SELECT e.a AS node, l.lbl, count(*) AS c,
                      row_number() OVER (PARTITION BY e.a
                        ORDER BY count(*) DESC, l.lbl ASC) AS rn
               FROM e JOIN $prev l ON e.b = l.node
               GROUP BY e.a, l.lbl) t
             WHERE rn = 1)"""
      s"""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
                  CAST(l_partkey + 10000000 AS BIGINT) AS b
             FROM lineitem
             WHERE l_suppkey <> l_partkey + 10000000),
         e AS (SELECT DISTINCT a, b FROM
                 (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0) u),
         l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
         ${round("l0", "i1")},
         ${round("i1", "i2")},
         ${round("i2", "i3")}
         SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
         FROM i3 GROUP BY lbl
         ORDER BY n_members DESC, community ASC LIMIT 20"""
    },

    // Poisson bootstrap replayed: identical md5 inverse-CDF weights
    // (8-hex literal thresholds), HUGEINT partials, `//` floors.
    "q314_poisson_boot" ->
      """WITH base AS (SELECT event_type AS g,
                CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                CAST(event_id AS VARCHAR) AS id
             FROM events
             WHERE value IS NOT NULL AND event_id IS NOT NULL),
         reps AS (SELECT g, c, id, CAST(bb.range AS INTEGER) AS b
                  FROM base, range(32) bb),
         wt AS (SELECT g, b, c,
                  CASE WHEN h < '5e2d58d8' THEN 0
                       WHEN h < 'bc5ab1b1' THEN 1
                       WHEN h < 'eb715e1d' THEN 2
                       WHEN h < 'fb239797' THEN 3
                       WHEN h < 'ff1025f5' THEN 4
                       WHEN h < 'ffd90f3b' THEN 5
                       WHEN h < 'fffa8b71' THEN 6
                       WHEN h < 'ffff540c' THEN 7
                       WHEN h < 'ffffed1f' THEN 8
                       ELSE 9 END AS m
                FROM (SELECT g, c, b,
                        substring(md5(id || '#' || CAST(b // 4 AS VARCHAR)),
                          1 + 8 * (b % 4), 8) AS h
                      FROM reps) t),
         pr AS (SELECT g, b, CAST(sum(m) AS HUGEINT) AS nb,
                  CAST(sum(CAST(m AS HUGEINT) * c) AS HUGEINT) AS sb
                FROM wt GROUP BY g, b),
         mb AS (SELECT g, sb // nb AS m FROM pr WHERE nb > 0),
         bt AS (SELECT g, CAST(count(*) AS HUGEINT) AS bl,
                  sum(m) AS sm, sum(m * m) AS sm2
                FROM mb GROUP BY g),
         raw AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(c AS HUGEINT)) // count(*) AS BIGINT)
                     AS mean_centi
                 FROM base GROUP BY g)
         SELECT raw.g AS event_type, n_rows, mean_centi,
                CAST(bl AS BIGINT) AS b_live,
                CAST(CASE WHEN bl < 2 THEN NULL
                     ELSE (bl * sm2 - sm * sm) // (bl * (bl - 1)) END
                     AS BIGINT) AS boot_var_centi2
         FROM raw JOIN bt ON raw.g = bt.g
         ORDER BY event_type""",

    // Rebalance replayed: same md5 ring, same wrap rule, same min-shard
    // position ownership.
    "q308_shard_rebalance" ->
      """WITH ring AS (SELECT s,
                CAST(('0x' || substring(md5(CAST(s AS VARCHAR) || '#'
                  || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS pos
           FROM (SELECT unnest(range(0, 5)) AS s) ss,
                (SELECT unnest(range(0, 8)) AS v) vv),
         h AS (SELECT doc_id,
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                   1, 12)) AS BIGINT) AS hh
               FROM documents),
         b AS (SELECT h.doc_id,
                 coalesce(min(CASE WHEN r.pos >= h.hh THEN r.pos END),
                   min(r.pos)) AS tp
               FROM h, ring r WHERE r.s <= 3 GROUP BY h.doc_id, h.hh),
         sb AS (SELECT b.doc_id, CAST(min(r.s) AS BIGINT) AS shard_before
                FROM b JOIN ring r ON r.pos = b.tp AND r.s <= 3
                GROUP BY 1),
         a AS (SELECT h.doc_id,
                 coalesce(min(CASE WHEN r.pos >= h.hh THEN r.pos END),
                   min(r.pos)) AS tp
               FROM h, ring r WHERE r.s <= 4 GROUP BY h.doc_id, h.hh),
         sa AS (SELECT a.doc_id, CAST(min(r.s) AS BIGINT) AS shard_after
                FROM a JOIN ring r ON r.pos = a.tp AND r.s <= 4
                GROUP BY 1),
         j AS (SELECT sb.shard_before, sa.shard_after
               FROM sb JOIN sa USING (doc_id))
         SELECT shard_before AS shard, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN shard_before <> shard_after
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
                CAST(sum(CASE WHEN shard_before <> shard_after
                  THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
                  AS moved_ppm,
                CAST(max(CASE WHEN shard_before <> shard_after
                  THEN shard_after END) AS BIGINT) AS moved_to
         FROM j GROUP BY 1""",

    // Dropoff replayed: q115's stage CTEs, pairwise floor conversions,
    // the pinned Wilson chain on the two exact counts.
    "q307_funnel_dropoff" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type
                    FROM events),
         s1 AS (SELECT u, min(t) AS t1 FROM e WHERE event_type = 'signup'
                GROUP BY u),
         s2 AS (SELECT e.u, min(t) AS t2, min(t1) AS t1
                FROM e JOIN s1 USING (u)
                WHERE event_type = 'click' AND t > t1
                  AND t <= t1 + 604800000000 GROUP BY e.u),
         s3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN s2 USING (u)
                WHERE event_type = 'purchase' AND t > t2
                  AND t <= t1 + 604800000000 GROUP BY e.u),
         c AS (SELECT 1 AS step_idx, 'signup' AS st,
                      (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n
               UNION ALL SELECT 2, 'click',
                      (SELECT CAST(count(*) AS BIGINT) FROM s2)
               UNION ALL SELECT 3, 'purchase',
                      (SELECT CAST(count(*) AS BIGINT) FROM s3)),
         p AS (SELECT f.step_idx, f.st AS from_step, g.st AS to_step,
                      f.n AS nf, g.n AS nt
               FROM c f JOIN c g ON g.step_idx = f.step_idx + 1)
         SELECT CAST(step_idx AS BIGINT) AS step_idx, from_step, to_step,
                CAST(nf AS BIGINT) AS n_from, CAST(nt AS BIGINT) AS n_to,
                CAST(CASE WHEN nf = 0 THEN NULL
                     ELSE nt * 1000000 // nf END AS BIGINT) AS conv_ppm,
                CAST(CASE WHEN nf = 0 THEN NULL
                     ELSE round((CAST(nt AS DOUBLE) + 1.9208
                       - 1.96 * sqrt(CAST(nt * (nf - nt) AS DOUBLE)
                           / CAST(nf AS DOUBLE) + 0.9604))
                       / (CAST(nf AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_lo_ppm,
                CAST(CASE WHEN nf = 0 THEN NULL
                     ELSE round((CAST(nt AS DOUBLE) + 1.9208
                       + 1.96 * sqrt(CAST(nt * (nf - nt) AS DOUBLE)
                           / CAST(nf AS DOUBLE) + 0.9604))
                       / (CAST(nf AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_hi_ppm
         FROM p""",

    // Sliced AUC replayed: the q167 midrank CTEs partitioned by lang.
    "q306_auc_by_slice" ->
      s"""WITH $SlicedScoredDocsSql,
         per AS (SELECT slice, s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1, 2),
         cum AS (SELECT slice, s, p, n,
                   COALESCE(sum(n) OVER (PARTITION BY slice ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS nlt
                 FROM per),
         agg AS (SELECT slice, sum(p * (2 * nlt + n)) AS num2,
                        sum(p) AS pos, sum(n) AS neg
                 FROM cum GROUP BY 1)
         SELECT slice, CAST(pos AS BIGINT) AS n_pos,
                CAST(neg AS BIGINT) AS n_neg,
                CAST(CASE WHEN pos = 0 OR neg = 0 THEN NULL
                     ELSE num2 * 1000000 // (2 * pos * neg) END AS BIGINT)
                  AS auc_ppm
         FROM agg""",

    // Item CF replayed: same capped incidence, same pair counts and
    // two-sqrt cosine, same neighbor ranks.
    "q305_item_cf" ->
      """WITH pos AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         kept AS (SELECT u, i FROM (SELECT u, i,
                    count(*) OVER (PARTITION BY u) AS n FROM pos) x
                  WHERE n <= 80),
         mg AS (SELECT i, CAST(count(*) AS BIGINT) AS m
                FROM kept GROUP BY 1),
         co AS (SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS c
                FROM kept a JOIN kept b ON a.u = b.u AND a.i < b.i
                GROUP BY 1, 2 HAVING count(*) >= 2),
         sc AS (SELECT ia, ib, c AS n_co,
                  CAST(round(CAST(c AS DOUBLE)
                    / (sqrt(CAST(x.m AS DOUBLE)) * sqrt(CAST(y.m AS DOUBLE)))
                    * 1000000, 0) AS BIGINT) AS cos_micro
                FROM co JOIN mg x ON co.ia = x.i JOIN mg y ON co.ib = y.i),
         bt AS (SELECT ia AS item, ib AS neighbor, n_co, cos_micro FROM sc
                UNION ALL SELECT ib, ia, n_co, cos_micro FROM sc)
         SELECT item, neighbor, n_co, cos_micro,
                CAST(rk AS BIGINT) AS nb_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY item
                 ORDER BY cos_micro DESC, neighbor) AS rk FROM bt) z
         WHERE rk <= 5""",

    // Turnover replayed: same weekly top-k sets, same Jaccard churn.
    "q304_chart_turnover" ->
      """WITH r AS (SELECT graft_w, graft_e FROM (
             SELECT epoch_us(ts) // 604800000000 AS graft_w,
                    user_id AS graft_e, count(*) AS c,
                    row_number() OVER (
                      PARTITION BY epoch_us(ts) // 604800000000
                      ORDER BY count(*) DESC, user_id) AS rk
             FROM events GROUP BY 1, 2) x WHERE rk <= 10),
         sz AS (SELECT graft_w, CAST(count(*) AS BIGINT) AS na
                FROM r GROUP BY 1),
         nz AS (SELECT graft_w - 1 AS graft_w,
                       CAST(count(*) AS BIGINT) AS nb
                FROM r GROUP BY 1),
         iv AS (SELECT a.graft_w, CAST(count(*) AS BIGINT) AS i
                FROM r a JOIN r b ON a.graft_w = b.graft_w - 1
                     AND a.graft_e = b.graft_e
                GROUP BY 1)
         SELECT CAST(sz.graft_w AS BIGINT) AS week,
                CAST(coalesce(iv.i, 0) AS BIGINT) AS n_common,
                CAST(1000000 - coalesce(iv.i, 0) * 1000000
                  // (sz.na + nz.nb - coalesce(iv.i, 0)) AS BIGINT)
                  AS turnover_ppm
         FROM sz JOIN nz USING (graft_w)
              LEFT JOIN iv USING (graft_w)""",

    // Feature/label rows replayed: same strict-cutoff windows, same
    // integer features and future-window label.
    "q303_feature_labels" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events
           WHERE epoch_us(ts) < 1706745600000000 + 1209600000000)
         SELECT user_id,
                CAST(sum(CASE WHEN t < 1706745600000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
                CAST(count(DISTINCT CASE WHEN t < 1706745600000000
                  THEN t // 86400000000 END) AS BIGINT) AS active_days,
                CAST(coalesce(sum(CASE WHEN t < 1706745600000000
                  THEN v END), 0) AS BIGINT) AS cents,
                CAST((1706745600000000 - max(CASE WHEN t < 1706745600000000
                  THEN t END)) // 86400000000 AS BIGINT) AS recency_days,
                CAST(max(CASE WHEN t >= 1706745600000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS label
         FROM e GROUP BY 1
         HAVING sum(CASE WHEN t < 1706745600000000 THEN 1 ELSE 0 END) > 0""",

    // Leave-last-out replayed: same last-row holdout, same leak-free
    // popularity top-k, same floor HR/MRR.
    "q302_leave_last_out" ->
      """WITH m AS (SELECT o_custkey AS e, l_partkey AS i,
                  o_orderdate AS t,
                  CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         r AS (SELECT e, i, row_number() OVER (PARTITION BY e
                 ORDER BY t DESC, id DESC, i DESC) AS rn
               FROM m),
         tg AS (SELECT e, i AS tgt FROM r WHERE rn = 1),
         cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c
                 FROM r WHERE rn > 1 GROUP BY 1),
         tk AS (SELECT tgt, row_number() OVER (ORDER BY c DESC, tgt)
                  AS rk
                FROM (SELECT i AS tgt, c FROM cnt
                      ORDER BY c DESC, i LIMIT 20) lim),
         j AS (SELECT tg.e, tk.rk FROM tg LEFT JOIN tk USING (tgt))
         SELECT CAST(count(*) AS BIGINT) AS n_entities,
                CAST(coalesce(sum(CASE WHEN rk IS NOT NULL
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
                CAST(CASE WHEN count(*) = 0 THEN NULL
                     ELSE coalesce(sum(CASE WHEN rk IS NOT NULL
                       THEN 1 ELSE 0 END), 0) * 1000000 // count(*) END
                  AS BIGINT) AS hr_ppm,
                CAST(CASE WHEN count(*) = 0 THEN NULL
                     ELSE coalesce(sum(CASE WHEN rk IS NOT NULL
                       THEN 1000000 // rk ELSE 0 END), 0) // count(*) END
                  AS BIGINT) AS mrr_micro
         FROM j""",

    // TextRank replayed: same filtered-sequence windows, same unrolled
    // integer walk on word keys.
    "q301_textrank" -> q301OracleSql,

    // Bradley-Terry replayed: same tournament, three unrolled integer
    // MM steps, same max-norm.
    "q299_bradley_terry" -> q299OracleSql,

    // Near-dup SPLIT leakage replayed: the same portable pairs mapped
    // to the q162 hash-split rule on both ends.
    "q298_neardup_split_leakage" ->
      s"""WITH $PortablePairsSql,
         sp AS (SELECT doc_id,
                  CASE WHEN substring(md5(text), 1, 1) < 'd'
                       THEN 'train' ELSE 'test' END AS s
                FROM documents)
         SELECT least(s1.s, s2.s) AS split_a,
                greatest(s1.s, s2.s) AS split_b,
                CAST(count(*) AS BIGINT) AS n_neardup_pairs
         FROM pr JOIN sp s1 ON pr.id1 = s1.doc_id
                 JOIN sp s2 ON pr.id2 = s2.doc_id
         GROUP BY 1, 2""",

    // Spearman replayed: same doubled midranks, same double assembly.
    "q203_spearman" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nx,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cy
               FROM events GROUP BY 1),
         rx AS (SELECT nx, CAST(2 * COALESCE(sum(m) OVER (ORDER BY nx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + m + 1 AS HUGEINT) AS rxv
               FROM (SELECT nx, count(*) AS m FROM u GROUP BY 1)),
         ry AS (SELECT cy, CAST(2 * COALESCE(sum(m) OVER (ORDER BY cy
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + m + 1 AS HUGEINT) AS ryv
               FROM (SELECT cy, count(*) AS m FROM u GROUP BY 1)),
         j AS (SELECT rxv, ryv
               FROM u JOIN rx USING (nx) JOIN ry USING (cy)),
         s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(rxv) AS sx,
                      sum(ryv) AS sy, sum(rxv * rxv) AS sxx,
                      sum(ryv * ryv) AS syy, sum(rxv * ryv) AS sxy
               FROM j)
         SELECT CAST(n AS BIGINT) AS n_rows,
                CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                     THEN NULL
                     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                END AS rho
         FROM s""",

    // Session ordinals replayed on q38's islands.
    "q202_session_conversion" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                  event_type FROM events),
         g AS (SELECT user_id, ts_us, event_id, event_type,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, event_type,
                      sum(news) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         ses AS (SELECT user_id, sid,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS conv
               FROM s GROUP BY 1, 2),
         o AS (SELECT least(sid, 5) AS ordinal, conv FROM ses)
         SELECT CAST(ordinal AS BIGINT) AS ordinal,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(conv) AS BIGINT) AS n_converting,
                CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS conv_ppm
         FROM o GROUP BY 1""",

    // Basket pairs replayed: same distinct item sets, same total order.
    "q201_basket_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
               FROM lineitem),
         n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM it),
         f AS (SELECT i, CAST(count(*) AS BIGINT) AS fi FROM it GROUP BY 1),
         p AS (SELECT a.i AS item_a, c.i AS item_b,
                      CAST(count(*) AS BIGINT) AS support
               FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
               GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT item_a, item_b, support,
                CAST(support * n.nb * 1000000 // (fa.fi * fb.fi) AS BIGINT)
                  AS lift_ppm
         FROM p JOIN f fa ON p.item_a = fa.i
                JOIN f fb ON p.item_b = fb.i, n
         ORDER BY support DESC, lift_ppm DESC, item_a, item_b LIMIT 20""",

    // Theil-Sen replayed: same pair set, same total order, same lower
    // median index.
    "q199_theil_sen" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
         p AS (SELECT a.s, (b.y - a.y) * 1000000 // (b.d - a.d) AS sl,
                      a.d AS d1, b.d AS d2
               FROM daily a JOIN daily b ON a.s = b.s AND a.d < b.d),
         r AS (SELECT s, sl, d1, d2,
                  row_number() OVER (PARTITION BY s
                    ORDER BY sl, d1, d2) AS rk,
                  count(*) OVER (PARTITION BY s) AS np
               FROM p)
         SELECT s AS event_type, CAST(np AS BIGINT) AS n_pairs,
                CAST(sl AS BIGINT) AS median_slope_ppm
         FROM r WHERE rk = (np + 1) // 2""",

    // KS replayed over the same centi-quantized cumulative table.
    "q198_ks_test" ->
      """WITH x AS (SELECT
                  substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS s,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events WHERE event_type = 'purchase'),
         per AS (SELECT v,
                  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
                  CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS HUGEINT) AS c2
               FROM x GROUP BY 1),
         cum AS (SELECT v,
                  sum(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
                  sum(c2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
               FROM per),
         t AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM cum),
         d AS (SELECT any_value(t.n1) AS n1, any_value(t.n2) AS n2,
                      max(abs(f1 * t.n2 - f2 * t.n1)) AS dmax
               FROM cum, t)
         SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
                CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                     ELSE dmax * 1000000 // (n1 * n2) END AS BIGINT)
                  AS ks_ppm
         FROM d""",

    // Chi-square replayed cell by cell (margin cross product covers
    // zero-observation combos identically).
    "q197_chi_square" ->
      """WITH e AS (SELECT event_type AS a, dayofweek(ts) AS b FROM events),
         cells AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS o
               FROM e GROUP BY 1, 2),
         rws AS (SELECT a, sum(o) AS rt FROM cells GROUP BY 1),
         cls AS (SELECT b, sum(o) AS ct FROM cells GROUP BY 1),
         t AS (SELECT sum(o) AS n,
                      CAST(count(DISTINCT a) AS HUGEINT) AS r,
                      CAST(count(DISTINCT b) AS HUGEINT) AS c
               FROM cells),
         terms AS (SELECT COALESCE(cells.o, 0) AS o0, rws.rt, cls.ct,
                          t.n, t.r, t.c
               FROM rws CROSS JOIN cls CROSS JOIN t
                    LEFT JOIN cells ON cells.a = rws.a AND cells.b = cls.b),
         s AS (SELECT any_value(n) AS n, any_value(r) AS r,
                      any_value(c) AS c,
                      sum((o0 * n - rt * ct) * (o0 * n - rt * ct) * 1000
                          // (rt * ct * n)) AS chi2m
               FROM terms)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(r AS BIGINT) AS n_levels_a,
                CAST(c AS BIGINT) AS n_levels_b,
                CAST(CASE WHEN r < 2 OR c < 2 THEN NULL ELSE chi2m END
                  AS BIGINT) AS chi2_milli,
                CAST(CASE WHEN r < 2 OR c < 2 THEN NULL
                     ELSE (r - 1) * (c - 1) END AS BIGINT) AS dof
         FROM s""",

    // Decomposition replayed: same quantization, same floor points.
    "q196_variance_decomposition" ->
      """WITH x AS (SELECT event_type AS g,
                  CAST(floor(value * 100 + 0.5) AS HUGEINT) AS x
               FROM events),
         gs AS (SELECT g, CAST(count(*) AS HUGEINT) AS ng, sum(x) AS sg
               FROM x GROUP BY 1),
         t AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                      sum(x * x) AS sxx
               FROM x),
         b AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                      sum(sg * sg * t.n // ng) AS ssbs,
                      any_value(t.n) AS n, any_value(t.sx) AS sx,
                      any_value(t.sxx) AS sxx
               FROM gs, t)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_groups,
                CAST(CASE WHEN k < 2 OR n * sxx - sx * sx = 0 THEN NULL
                     ELSE (ssbs - sx * sx) * 1000000
                          // (n * sxx - sx * sx) END AS BIGINT) AS eta2_ppm,
                CAST(CASE WHEN k < 2 OR n <= k
                          OR (n * sxx - sx * sx) - (ssbs - sx * sx) = 0
                     THEN NULL
                     ELSE (ssbs - sx * sx) * (n - k) * 1000
                          // (((n * sxx - sx * sx) - (ssbs - sx * sx))
                             * (k - 1)) END AS BIGINT) AS f_milli
         FROM b""",

    "q195_filtered_ann" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                    WHERE vec_id = 0)
         SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings, q WHERE vec_id <> 0 AND label = 1
         ORDER BY cos DESC, vec_id LIMIT 10""",

    // The same per-fingerprint arithmetic, replayed over the mirrored
    // corpus.
    "q193_source_dup_matrix" ->
      """WITH m AS (SELECT source, text FROM documents
               UNION ALL
               SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0),
         fp AS (SELECT source AS s,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
               FROM m),
         c AS (SELECT f, s, CAST(count(*) AS BIGINT) AS n
               FROM fp GROUP BY 1, 2),
         p AS (SELECT a.s AS src_a, b.s AS src_b,
                 CASE WHEN a.s = b.s THEN a.n * (a.n - 1) // 2
                      ELSE a.n * b.n END AS pairs
               FROM c a JOIN c b ON a.f = b.f AND a.s <= b.s)
         SELECT src_a, src_b, CAST(sum(pairs) AS BIGINT) AS n_dup_pairs
         FROM p GROUP BY 1, 2 HAVING sum(pairs) > 0""",

    "q364_source_venn" ->
      """WITH m AS (SELECT source, text FROM documents
               UNION ALL
               SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0),
         fp AS (SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f,
                       source AS s
               FROM m),
         g AS (SELECT f, CAST(count(DISTINCT s) AS BIGINT) AS n_sources,
                      CAST(count(*) AS BIGINT) AS docs
               FROM fp GROUP BY 1)
         SELECT n_sources, CAST(count(*) AS BIGINT) AS n_fingerprints,
                CAST(sum(docs) AS BIGINT) AS n_docs
         FROM g GROUP BY 1""",

    "q365_entry_exit" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           event_type
               FROM events),
         g AS (SELECT user_id, ts_us, event_id, event_type,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us, event_id, event_type,
                      sum(news) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         per AS (SELECT user_id, sid,
                        first(event_type ORDER BY ts_us, event_id) AS ft,
                        last(event_type ORDER BY ts_us, event_id) AS lt,
                        count(*) AS n
                 FROM s GROUP BY 1, 2),
         ent AS (SELECT ft AS event_type,
                        CAST(count(*) AS BIGINT) AS n_entries,
                        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_bounces
                 FROM per GROUP BY 1),
         ex AS (SELECT lt AS event_type,
                       CAST(count(*) AS BIGINT) AS n_exits
                FROM per GROUP BY 1)
         SELECT coalesce(ent.event_type, ex.event_type) AS event_type,
                coalesce(n_entries, 0) AS n_entries,
                coalesce(n_exits, 0) AS n_exits,
                coalesce(n_bounces, 0) AS n_bounces,
                CAST(CASE WHEN coalesce(n_entries, 0) = 0 THEN 0
                     ELSE coalesce(n_bounces, 0) * 1000000 // n_entries END
                  AS BIGINT) AS bounce_ppm
         FROM ent FULL OUTER JOIN ex ON ent.event_type = ex.event_type""",

    "q191_fk_audit" ->
      """SELECT 'lineitem.orderkey' AS relation,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_keys,
                CAST((SELECT count(*) FROM lineitem x
                      WHERE x.l_orderkey IS NOT NULL AND x.l_orderkey
                        NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
                  AS n_orphans
         FROM lineitem
         UNION ALL
         SELECT 'orders.custkey', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST((SELECT count(*) FROM orders x
                      WHERE x.o_custkey IS NOT NULL AND x.o_custkey
                        NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'customer.nationkey', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST((SELECT count(*) FROM customer x
                      WHERE x.c_nationkey IS NOT NULL AND x.c_nationkey
                        NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT)
         FROM customer""",

    // First-significant-digit shares: formatting-independent (the first
    // nonzero char of the plain decimal form is the same in any
    // shortest-round-trip renderer for this value range).
    "q192_benford" ->
      """WITH d AS (SELECT regexp_extract(CAST(o_totalprice AS VARCHAR),
                  '[1-9]', 0) AS digit
               FROM orders)
         SELECT digit, CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) * 1000000 // sum(count(*)) OVER ()
                  AS BIGINT) AS share_ppm
         FROM d WHERE digit <> '' GROUP BY 1""",

    // The oracle sees only base + the audited-clean batch.
    "q190_wap_cycle" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders WHERE o_orderkey % 3 IN (0, 1)
         GROUP BY 1""",

    // Lift replayed over the same distinct (doc, term) pairs.
    "q189_related_terms" ->
      """WITH p AS (SELECT DISTINCT doc_id, t.term
             FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                     '[a-z0-9]+')) AS term FROM documents) t),
         n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM p),
         d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p
               GROUP BY 1),
         sd AS (SELECT doc_id FROM p WHERE term = 'vector'),
         co AS (SELECT p.term, CAST(count(*) AS BIGINT) AS n_co
               FROM p JOIN sd USING (doc_id)
               WHERE p.term <> 'vector'
               GROUP BY 1 HAVING count(*) >= 3),
         ds AS (SELECT df AS dfs FROM d WHERE term = 'vector')
         SELECT co.term, co.n_co, d.df AS df_term,
                CAST(co.n_co * n.nd * 1000000 // (ds.dfs * d.df) AS BIGINT)
                  AS lift_ppm
         FROM co JOIN d USING (term), n, ds
         ORDER BY lift_ppm DESC, co.term LIMIT 20""",

    // Both legs' proven CTEs + the integer RRF fusion.
    "q188_hybrid_retrieval" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                      unnest(toks) AS term
               FROM b),
         tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                FROM h WHERE term IN ('join', 'vector', 'slow')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, dl, term, tf,
                       count(*) OVER (PARTITION BY term) AS df
                FROM tf),
         c AS (SELECT doc_id,
                 CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                        / (tf + 1.2 * (0.25 + 0.75 * dl
                                       / (st.tt * 1.0 / st.nd)))
                        * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM sc, st),
         tl AS (SELECT doc_id, sum(cm) AS score_micro
                FROM c GROUP BY 1 ORDER BY score_micro DESC, doc_id
                LIMIT 20),
         tr AS (SELECT doc_id, CAST(row_number() OVER
                  (ORDER BY score_micro DESC, doc_id) AS BIGINT)
                  AS text_rank
                FROM tl),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = 0),
         vl AS (SELECT vec_id,
                  round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                        / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(qv, qv))), 6) AS cos
                FROM embeddings, q WHERE vec_id <> 0
                ORDER BY cos DESC, vec_id LIMIT 20),
         vr AS (SELECT vec_id AS doc_id,
                  CAST(row_number() OVER (ORDER BY cos DESC, vec_id)
                    AS BIGINT) AS vec_rank
                FROM vl),
         f AS (SELECT COALESCE(tr.doc_id, vr.doc_id) AS doc_id,
                 tr.text_rank, vr.vec_rank,
                 COALESCE(1000000 // (60 + tr.text_rank), 0)
                   + COALESCE(1000000 // (60 + vr.vec_rank), 0) AS rrf_ppm
               FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id)
         SELECT doc_id, text_rank, vec_rank, CAST(rrf_ppm AS BIGINT)
                  AS rrf_ppm
         FROM f ORDER BY rrf_ppm DESC, doc_id LIMIT 10""",

    // The incremental result must equal the one-shot full join.
    "q187_incremental_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",

    // Slope replayed with the same decimal sums and floor division.
    "q186_trend_slope" ->
      """WITH d AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS HUGEINT) AS y
               FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS m,
                      sum(CAST(day AS HUGEINT)) AS sx, sum(y) AS sy,
                      sum(CAST(day AS HUGEINT) * CAST(day AS HUGEINT)) AS sxx,
                      sum(CAST(day AS HUGEINT) * y) AS sxy
               FROM d GROUP BY 1)
         SELECT event_type, CAST(m AS BIGINT) AS n_days,
                CAST(CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                     ELSE (m * sxy - sx * sy) * 1000000
                          // (m * sxx - sx * sx) END AS BIGINT) AS slope_ppm
         FROM s""",

    // Confusion matrix replayed over the q17 guess CTE.
    "q183_lang_confusion" ->
      """WITH t AS (SELECT lang,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT lang,
                  len(regexp_extract_all(nt, '(^| )(the|and|of|is)( |$)')) AS en,
                  len(regexp_extract_all(nt, '(^| )(der|die|und|ist)( |$)')) AS de,
                  len(regexp_extract_all(nt, '(^| )(le|la|et|est)( |$)')) AS fr,
                  len(regexp_extract_all(nt, '(^| )(el|los|y|es)( |$)')) AS es
               FROM t),
         g AS (SELECT lang,
                  CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                       WHEN en = greatest(en, de, fr, es) THEN 'en'
                       WHEN de = greatest(en, de, fr, es) THEN 'de'
                       WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                       ELSE 'es' END AS guess
               FROM c),
         m AS (SELECT lang, guess, CAST(count(*) AS BIGINT) AS n
               FROM g GROUP BY 1, 2)
         SELECT lang, guess, n,
                CAST(n * 1000000 // sum(n) OVER (PARTITION BY lang)
                  AS BIGINT) AS recall_ppm
         FROM m""",

    // Weekday shares replayed: DuckDB dayofweek is 0=Sunday, Spark's is
    // 1=Sunday — the Spark side subtracts 1 to land on the same scale.
    "q184_seasonality" ->
      """WITH b AS (SELECT event_type, dayofweek(ts) AS dow,
                  CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2)
         SELECT event_type, CAST(dow AS INT) AS dow, n,
                CAST(n * 7 * 1000000 // sum(n) OVER (PARTITION BY event_type)
                  AS BIGINT) AS index_ppm
         FROM b""",

    // Linear credits replayed: same user-keyed range join, same floor
    // division, same age bucketing.
    "q182_linear_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                    event_type FROM events),
         c AS (SELECT user_id, ts_us AS cts, event_id AS cid FROM e
               WHERE event_type = 'purchase'),
         t AS (SELECT user_id, ts_us AS tts FROM e
               WHERE event_type = 'view'),
         p AS (SELECT c.user_id, c.cid, c.cts, t.tts
               FROM c JOIN t ON c.user_id = t.user_id
               WHERE t.tts < c.cts AND c.cts - t.tts <= 604800000000),
         n AS (SELECT *, count(*) OVER (PARTITION BY user_id, cid) AS nt
               FROM p)
         SELECT CAST((cts - tts) // 86400000000 AS BIGINT) AS age_days,
                CAST(count(*) AS BIGINT) AS n_touches,
                CAST(sum(1000000 // nt) AS BIGINT) AS credit_ppm_sum
         FROM n GROUP BY 1""",

    // Attribution replayed with the identical preceding-rows window.
    "q174_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                    event_type FROM events),
         t AS (SELECT *, max(CASE WHEN event_type = 'view' THEN ts_us END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch_ts
               FROM e),
         c AS (SELECT ts_us, touch_ts,
                 (touch_ts IS NOT NULL
                  AND ts_us - touch_ts <= 604800000000) AS attr
               FROM t WHERE event_type = 'purchase'),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_conversions,
                 CAST(sum(CASE WHEN attr THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_attributed,
                 CAST(sum(CASE WHEN attr THEN ts_us - touch_ts ELSE 0 END)
                   AS BIGINT) AS sum_gap
               FROM c)
         SELECT n_conversions, n_attributed,
                CAST(CASE WHEN n_conversions = 0 THEN NULL
                     ELSE n_attributed * 1000000 // n_conversions END
                  AS BIGINT) AS attr_ppm,
                CAST(CASE WHEN n_attributed = 0 THEN NULL
                     ELSE sum_gap // n_attributed END AS BIGINT) AS avg_gap_us
         FROM a""",

    "q175_consistent_sample" ->
      """SELECT doc_id, md5(text) AS content_h, source FROM documents
         ORDER BY md5(text), doc_id LIMIT 100""",

    // RFM replayed: same exact metrics, same tie-broken ntile order.
    "q176_rfm" ->
      """WITH pu AS (SELECT user_id AS u, max(epoch_us(ts)) AS last_ts,
                  CAST(count(*) AS BIGINT) AS freq,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
               FROM events GROUP BY 1),
         g AS (SELECT u, last_ts, freq, cents,
                 (1706745600000000 - last_ts) // 86400000000 AS rd
               FROM pu),
         t AS (SELECT *, ntile(5) OVER (ORDER BY last_ts DESC, u) AS r,
                 ntile(5) OVER (ORDER BY freq DESC, u) AS f,
                 ntile(5) OVER (ORDER BY cents DESC, u) AS m
               FROM g)
         SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
                CAST(m AS BIGINT) AS m,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(cents) AS BIGINT) AS sum_cents,
                CAST(min(rd) AS BIGINT) AS min_recency_days,
                CAST(max(rd) AS BIGINT) AS max_recency_days
         FROM t GROUP BY 1, 2, 3""",

    // Evolution replayed as a NULL-padded union of the two generations.
    "q173_warehouse_evolve" ->
      """WITH w AS (SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars
             FROM documents WHERE doc_id % 2 = 0
             UNION ALL
             SELECT doc_id, source, n_chars
             FROM documents WHERE doc_id % 2 = 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars,
                CAST(count(n_chars) AS BIGINT) AS n_with_chars
         FROM w GROUP BY 1""",

    // UPDATE replayed as the equivalent CASE recompute.
    "q172_warehouse_update" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(CAST(floor((CASE WHEN p_partkey >= 500
                         AND p_partkey < 1500
                         THEN p_retailprice + 100.0
                         ELSE p_retailprice END) * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM part GROUP BY 1""",

    // MoR update replayed as the two stacked CASE recomputes — same
    // left-to-right double arithmetic as the engine's post-image chain.
    "q310_mor_update" ->
      """WITH u1 AS (SELECT p_partkey, p_brand,
                CASE WHEN p_partkey >= 500 AND p_partkey < 1500
                     THEN p_retailprice + 100.0
                     ELSE p_retailprice END AS price
         FROM part)
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(CAST(floor((CASE WHEN p_partkey < 800
                         THEN price + 10.0 ELSE price END) * 100)
                  AS BIGINT)) AS BIGINT) AS sum_cents
         FROM u1 GROUP BY 1""",

    "q362_version_diff" ->
      """WITH cls AS (
           SELECT CASE WHEN c_custkey < 50 THEN 'removed'
                       WHEN c_mktsegment = 'BUILDING' THEN 'changed'
                       ELSE 'unchanged' END AS change
           FROM customer
           UNION ALL
           SELECT 'added' FROM customer WHERE c_custkey % 10 = 0)
         SELECT change, CAST(count(*) AS BIGINT) AS n_rows
         FROM cls GROUP BY 1""",

    "q355_mor_reorg" ->
      """WITH fin AS (
           SELECT p_brand,
                  CASE WHEN p_size >= 25 THEN p_retailprice + 50.0
                       ELSE p_retailprice END AS price
           FROM part WHERE p_partkey >= 30)
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(CAST(floor(price * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM fin GROUP BY 1""",

    // MoR merge replayed by set algebra: unmatched table rows survive,
    // every update-batch row (replacement or brand-new key) lands once.
    "q311_mor_merge" ->
      """WITH upd AS (SELECT c_custkey, c_mktsegment,
                             c_acctbal + 1000.0 AS bal
               FROM customer WHERE c_custkey % 7 = 0
             UNION ALL
             SELECT c_custkey + 10000000, 'NEWSEG', c_acctbal + 1000.0
               FROM customer WHERE c_custkey % 7 = 0),
         fin AS (SELECT c_mktsegment AS seg, c_acctbal AS bal
                 FROM customer WHERE c_custkey % 7 <> 0
                 UNION ALL SELECT c_mktsegment, bal FROM upd)
         SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
                CAST(sum(CAST(floor(bal * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM fin GROUP BY 1""",
  )

  /** The q167-q169 scored-docs CTE (DuckDB): the clamped 1e4-quantized
    * heuristic quality score + the n_chars≥300 label — the oracle twin of
    * [[scoredDocs]]. */
  /** The portable-minhash candidate-pair CTE chain (the q82 pipeline):
    * 3-gram shingles → 16 md5 minhashes → 8×2 bands → band-key candidates
    * → signature-agreement filter at 0.5. Ends in `pr(id1, id2)`; shared
    * by every oracle that reasons over near-dup PAIRS (q194, q298). */
  private val PortablePairsSql: String =
    """t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         mh AS (SELECT doc_id, s,
                       min(substr(md5((s // 4)::VARCHAR || ':' || g),
                                  CAST(1 + 8 * (s % 4) AS INTEGER), 8)) AS h
                FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS s) seeds
                GROUP BY doc_id, s),
         sig AS (SELECT doc_id, list(h ORDER BY s) AS sig FROM mh GROUP BY doc_id),
         band AS (SELECT doc_id, b, sig[2*b+1] || '|' || sig[2*b+2] AS bk
                  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bands),
         cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
                  FROM band a JOIN band c
                    ON a.b = c.b AND a.bk = c.bk AND a.doc_id < c.doc_id),
         agr AS (SELECT cand.id1, cand.id2,
                        sum(CASE WHEN s1.sig[k+1] = s2.sig[k+1] THEN 1 ELSE 0 END) AS agree
                 FROM cand JOIN sig s1 ON cand.id1 = s1.doc_id
                           JOIN sig s2 ON cand.id2 = s2.doc_id
                      CROSS JOIN (SELECT unnest(range(0, 16)) AS k) ks
                 GROUP BY 1, 2),
         pr AS (SELECT id1, id2 FROM agr WHERE agree / 16.0 >= 0.5)"""

  /** [[ScoredDocsSql]] with the language slice carried through — the
    * q306 substrate. Derived mechanically so the two can never drift. */
  private lazy val SlicedScoredDocsSql: String = {
    val marker = "sc AS (SELECT "
    require(ScoredDocsSql.startsWith(marker), "ScoredDocsSql shape moved")
    marker + "lang AS slice, " + ScoredDocsSql.stripPrefix(marker)
  }

  /** [[ScoredDocsSql]] with doc identity and length carried through —
    * the q385 substrate. Same mechanical derivation. */
  private lazy val IdScoredDocsSql: String = {
    val marker = "sc AS (SELECT "
    require(ScoredDocsSql.startsWith(marker), "ScoredDocsSql shape moved")
    marker + "doc_id, n_chars, " + ScoredDocsSql.stripPrefix(marker)
  }

  private val ScoredDocsSql: String =
    """sc AS (SELECT greatest(least(CAST(floor(
                round(0.5 * least(length(text) / 500.0, 1.0)
                  + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+')) * 1.0
                          / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
                  - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                    / greatest(length(text), 1), 4) * 10000 + 0.5) AS BIGINT),
                10000), 0) AS s,
              CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
         FROM documents)"""
}
