package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines — the steps
  * between "deduplicated documents" and "token stream on the trainer":
  * context-window chunking, quality gating, test-set decontamination, and
  * sequence packing.
  *
  * Scale posture: chunking is a bounded-fan-out generate (≤ |tokens|/stride
  * rows per doc, no shuffle); the quality gate broadcasts an
  * O(|sources|)-row threshold table; decontamination shuffles 8-byte
  * shingle hashes only; packing windows over per-shard total orders so
  * shards parallelize (a single global order would serialize at 100 TB).
  */
object Corpus {

  /** Overlapping fixed-size token windows per document — context-length
    * chunking for embedding/training pipelines. Chunks start every
    * `stride` tokens; the tail chunk may be short. Tokens are the same
    * `[a-z0-9]+` runs the tf-idf/term operators use, materialized in their
    * own projection (the regex runs once per doc, and the token count
    * rides along so Generate carries scalars, not the re-computed array).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("nt"))
    toks.filter(col("nt") > 0)
      .select(col("doc_id"), col("toks"),
        explode_outer(sequence(lit(1), col("nt"), lit(stride))).as("start"))
      .filter(col("start").isNotNull)
      .select(col("doc_id"),
        expr(s"CAST((start - 1) DIV $stride AS BIGINT)").as("chunk_idx"),
        slice(col("toks"), col("start"), lit(chunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Per-group quality-quantile gate: keep documents whose quality score
    * reaches their group's `q`-quantile. The per-group threshold table is
    * O(|groups|) and broadcast; the gate itself is a narrow filter. The
    * score is the 4-dp-rounded [[TextFunctions.qualityScore]], and the
    * interpolated quantile of those rounded values either equals a data
    * value exactly or sits well clear of one (≥ ~1e-5 vs ~1e-16 float
    * error), so `score >= threshold` is deterministic cross-engine. */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  groupCol: String, quantile: Double): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      T.qualityScore(col(textCol)).as("quality"))
    val thr = scored.groupBy("grp")
      .agg(percentile(col("quality"), lit(quantile)).as("graft_thr"))
    scored.join(broadcast(thr), Seq("grp"))
      .filter(col("quality") >= col("graft_thr"))
      .select(col("doc_id"), col("grp").as(groupCol), col("quality"))
  }

  /** Test-set decontamination: drop every training document that shares at
    * least one word n-gram shingle with any held-out document. The join
    * key is the shingle's 64-bit hash (8-byte shuffle rows — same trade as
    * the near-dup family); the held-out side is distinct shingles only, so
    * the semi-join build side tracks the test SET, not the corpus. Returns
    * the surviving training doc ids. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    isTest: Column, n: Int): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), isTest.as("graft_test"),
        T.wordShinglesNative(col(textCol), n).as("shs"))
      .select(col("doc_id"), col("graft_test"), explode_outer(col("shs")).as("g0"))
      .filter(col("g0").isNotNull)
      .select(col("doc_id"), col("graft_test"), xxhash64(col("g0")).as("g"))
    val testShingles = sh.filter(col("graft_test")).select("g").distinct()
    val contaminated = sh.filter(!col("graft_test"))
      .join(testShingles, Seq("g"), "left_semi")
      .select("doc_id").distinct()
    docs.filter(!isTest).select(col(idCol).as("doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Benchmark-contamination report — the graded sibling of
    * [[decontaminate]]'s boolean gate: per TRAIN document, how much of
    * its distinct n-gram shingle set appears in the held-out/benchmark
    * split (overlap_ppm = hits·10⁶ div total), top-k most contaminated.
    * The audit a pipeline publishes next to the drop decision — "what
    * did we almost train on". Shingles join as STRINGS (not sketch
    * hashes): counts must be collision-free to hash-check.
    *
    * Scale: one tokenize to per-doc DISTINCT shingles, the test set is a
    * distinct projection, the hit count is a shingle-keyed semi-join —
    * the q67 shape plus one aggregate; nothing corpus-pairwise. */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          isTest: Column, n: Int, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be at least 1")
    val sh = docs
      .select(col(idCol).as("doc_id"), isTest.as("graft_test"),
        T.wordShinglesNative(col(textCol), n).as("shs"))
      .select(col("doc_id"), col("graft_test"),
        explode_outer(col("shs")).as("g"))
      .filter(col("g").isNotNull)
      .distinct()
    val testSh = sh.filter(col("graft_test")).select("g").distinct()
    val train = sh.filter(!col("graft_test"))
    val tot = train.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
    val hits = train.join(testSh, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    tot.join(hits, Seq("doc_id"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        expr("n_overlap * 1000000 div n_shingles").as("overlap_ppm"))
      .orderBy(col("overlap_ppm").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Deterministic corpus mixing — per-group downsampling rates (domain
    * reweighting for training mixes). The keep/drop decision is a pure
    * function of CONTENT: the first 16 bits of md5(text) form a uniform
    * u16, kept when below the group's rate·2¹⁶ threshold. Unlike
    * `sample()`, the mix is reproducible across runs, engines, partitioning
    * and cluster size, and a document keeps/loses membership consistently
    * even if the corpus is re-sharded. Narrow filter, no shuffle. */
  def mixSample(docs: DataFrame, idCol: String, textCol: String,
                groupCol: String, rates: Map[String, Double],
                defaultRate: Double): DataFrame = {
    def thr(r: Double) = math.floor(r * 65536).toLong
    val rateMap = map(rates.flatMap { case (s, r) =>
      Seq(lit(s), lit(thr(r))) }.toSeq: _*)
    docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
        conv(substring(md5(col(textCol).cast("binary")), 1, 4), 16, 10)
          .cast("long").as("graft_u16"),
        coalesce(element_at(rateMap, col(groupCol)),
          lit(thr(defaultRate))).as("graft_thr"))
      .filter(col("graft_u16") < col("graft_thr"))
      .select(col("doc_id"), col("grp").as(groupCol))
  }

  /** Deterministic upsampling — the other half of corpus mixing: rates
    * ABOVE 1 repeat documents (the "high-quality source ×3" pattern in
    * training mixes). Every doc emits floor(rate) copies plus one more
    * when its content-hash u16 falls under the fractional part — so the
    * EXPECTED multiplicity is exactly the rate, per-doc multiplicity is a
    * pure function of content, and `copy_idx` disambiguates repeats for
    * downstream shuffling. Bounded generate (fan-out ≤ ⌈rate⌉), no
    * shuffle. */
  def mixUpsample(docs: DataFrame, idCol: String, textCol: String,
                  groupCol: String, rates: Map[String, Double],
                  defaultRate: Double): DataFrame = {
    def whole(r: Double) = math.floor(r).toLong
    def fracThr(r: Double) = math.floor((r - math.floor(r)) * 65536).toLong
    val wholeMap = map(rates.flatMap { case (s, r) =>
      Seq(lit(s), lit(whole(r))) }.toSeq: _*)
    val fracMap = map(rates.flatMap { case (s, r) =>
      Seq(lit(s), lit(fracThr(r))) }.toSeq: _*)
    docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
        conv(substring(md5(col(textCol).cast("binary")), 1, 4), 16, 10)
          .cast("long").as("graft_u16"),
        coalesce(element_at(wholeMap, col(groupCol)), lit(whole(defaultRate)))
          .as("graft_whole"),
        coalesce(element_at(fracMap, col(groupCol)), lit(fracThr(defaultRate)))
          .as("graft_frac"))
      .withColumn("graft_n",
        col("graft_whole") +
          when(col("graft_u16") < col("graft_frac"), 1L).otherwise(0L))
      .filter(col("graft_n") > 0)
      .select(col("doc_id"), col("grp").as(groupCol),
        explode_outer(sequence(lit(1L), col("graft_n"))).as("copy_idx"))
      .filter(col("copy_idx").isNotNull)
  }

  /** Deterministic k-per-group sample — the eval-subset/inspection cut a
    * corpus pipeline needs to be REPRODUCIBLE: rank rows within each group
    * by content hash (uniform, engine-portable order) and keep the first
    * `k`. Unlike a seeded sample, membership survives reruns, engine
    * swaps, and repartitioning; one window shuffle on the group key with
    * WindowGroupLimit pushing the rank cut below the exchange. */
  def sampleKPerGroup(docs: DataFrame, idCol: String, textCol: String,
                      groupCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy("grp")
      .orderBy(col("graft_h").asc, col("doc_id").asc)
    docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
        md5(col(textCol).cast("binary")).as("graft_h"))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= k)
      .select(col("doc_id"), col("grp").as(groupCol))
  }

  /** Length-bucketed batch packing report — the padding-efficiency audit
    * behind bucketed batching (training batches drawn from similar-length
    * documents waste far less padding than random batches; this measures
    * exactly how much). Documents bucket by ⌊tokens/binTokens⌋, rank
    * WITHIN their bucket (descending tokens, id tiebreak), and chop into
    * `batchSize`-doc batches; each batch reports its padded-token waste
    * (max·n − Σ). The window partitions by BUCKET — a bounded-cardinality
    * key — so ranking parallelizes across buckets instead of forcing the
    * global total order a naive sort-by-length batcher needs; padding
    * inside a batch is bounded by the bin width by construction. */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    binTokens: Int, batchSize: Int): DataFrame = {
    require(binTokens > 0 && batchSize > 0, "binTokens/batchSize must be positive")
    val w = Window.partitionBy("bucket")
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    docs
      .select(col(idCol).as("doc_id"),
        T.wordTokens(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", floor(col("n_tokens") / binTokens).cast("long"))
      .withColumn("graft_rn", row_number().over(w))
      .withColumn("batch_in_bucket",
        floor((col("graft_rn") - 1) / batchSize).cast("long"))
      .groupBy("bucket", "batch_in_bucket")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_frac",
        round((col("max_tokens") * col("n_docs") - col("sum_tokens"))
          .cast("double") /
          greatest(col("max_tokens") * col("n_docs"), lit(1L)), 4))
  }

  /** Token-stream sequence packing: documents are laid into fixed-capacity
    * training sequences in id order WITHIN each shard (documents may
    * straddle a boundary — the GPT-style contiguous token stream). Emits
    * each document's token count, its offset in the shard's stream, and
    * the sequence its first token lands in. One window per shard key: the
    * running sum is exact integer math, and sharding keeps the total order
    * per-shard so 1000 executors pack 1000 shards concurrently. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy("shard").orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        T.wordTokens(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"CAST(tok_offset DIV ${capacity}L AS BIGINT)"))
  }

  /** Per-source token-budget sampling: keep documents, in a deterministic
    * content-hash order, until each source's running token total reaches
    * `budget` — the "N tokens from every source" mixing contract, as a
    * pure function of content (reproducible across runs, engines and
    * partitioning; no sampling state).
    *
    * One window per source partition (the cumulative sum is exact long
    * math); sources fill concurrently on as many executors as there are
    * sources, and nothing is ordered globally. */
  def tokenBudgetCap(docs: DataFrame, idCol: String, textCol: String,
                     srcCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy("source")
      .orderBy(col("graft_pick").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        md5(col(textCol).cast("binary")).as("graft_pick"),
        T.wordTokens(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** Temperature-weighted source allocation — the multilingual/training-mix
    * α-sampling rule (sample source i with probability ∝ n_i^α; α < 1
    * flattens the source distribution so head sources stop drowning the
    * tail — the exponent-smoothing scheme multilingual-corpus papers use)
    * reduced to a deterministic per-source budget readout: token counts,
    * fixed-point weights, the α-allocated token target (capped at what the
    * source actually has), and the implied sampling rate in ppm.
    *
    * Determinism across engines: the only floating-point ops are
    * `pow(n, α)` and one fixed multiply-divide tree over scalars, both
    * IEEE-754 correctly-rounded for α = 0.5 (`sqrt`), the exponent the
    * oracle-checked contract pins; weights are floored to integer micro
    * units BEFORE the exact BIGINT sum, so accumulation order can't move
    * the total. General α is supported but spec-verified only (`pow` is
    * not correctly-rounded, so cross-engine bit-equality isn't promised).
    *
    * Scale shape: ONE corpus-width tokenize→source aggregate (map-side
    * combine); everything after runs on the |sources|-row table — a
    * broadcast-sized readout, no second corpus pass, no join. */
  def temperatureMix(docs: DataFrame, textCol: String, srcCol: String,
                     budgetTokens: Long, alpha: Double = 0.5): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val bySource = docs
      .select(col(srcCol).as("source"),
        T.wordTokens(col(textCol)).cast("long").as("graft_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("graft_t").as("n_tokens"))
    // α = 0.5 routes through sqrt, which IS correctly-rounded (pow(x, 0.5)
    // is only 1-ulp-accurate and may disagree with another engine's sqrt
    // at a floor boundary).
    val nD = col("n_tokens").cast("double")
    val weighted = bySource.withColumn("weight_micro",
      floor((if (alpha == 0.5) sqrt(nD) else pow(nD, lit(alpha))) * 1e6)
        .cast("long"))
    // The weight total is a 1-row broadcast aggregate joined back — the
    // |sources|-row table never leaves distributed form.
    val total = weighted.agg(sum("weight_micro").as("graft_wtotal"))
    weighted.crossJoin(broadcast(total))
      .withColumn("target_tokens",
        least(
          floor(lit(budgetTokens.toDouble) * col("weight_micro").cast("double")
            / col("graft_wtotal").cast("double")).cast("long"),
          col("n_tokens")))
      .withColumn("sample_rate_ppm", // token-less source: rate 0, not ÷0
        expr("CASE WHEN n_tokens = 0 THEN 0L" +
          " ELSE target_tokens * 1000000 div n_tokens END"))
      .select("source", "n_docs", "n_tokens", "weight_micro",
        "target_tokens", "sample_rate_ppm")
  }

  /** Corpus-frequency boilerplate strip — the line/paragraph-dedup step of
    * web-corpus pipelines (strip navigation chrome, license banners, any
    * span repeated across many pages), expressed on token segments:
    * documents are cut into consecutive non-overlapping `segTokens`-token
    * segments, each segment's document frequency is counted corpus-wide,
    * and segments appearing in more than `maxDf` documents are dropped.
    * Returns per-document segment counts and the reassembled length —
    * `out_len` is the length the cleaned text would have when the kept
    * segments are re-joined with single spaces.
    *
    * Scale: ONE corpus tokenize pass. The exploded segments reduce
    * immediately to the compact (doc, seg, occurrences) table (one
    * corpus-keyed shuffle with map-side combine); segment df is a window
    * count over that table's distinct (doc, seg) rows — q52's shape, so
    * the expensive regex never runs a second time for the df leg — and
    * the per-doc reassembly aggregates occurrence-weighted scalars, never
    * re-materializing text. */
  def boilerplateStrip(docs: DataFrame, idCol: String, textCol: String,
                       segTokens: Int, maxDf: Long): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    require(maxDf > 0, "maxDf must be positive")
    val occ = docs
      .select(col(idCol).as("doc_id"), T.tokens(col(textCol)).as("graft_toks"))
      .selectExpr("doc_id",
        s"""explode(transform(
              sequence(0, CAST(ceil(size(graft_toks) / $segTokens.0) AS INT) - 1),
              i -> array_join(slice(graft_toks, i * $segTokens + 1, $segTokens), ' '))) AS seg""")
      .groupBy("doc_id", "seg").agg(count(lit(1)).as("graft_n"))
    occ
      // occ is one row per (doc, seg), so rows-per-seg IS the df.
      .withColumn("graft_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("seg")))
      .groupBy("doc_id")
      .agg(
        sum(col("graft_n")).as("n_segs"),
        sum(when(col("graft_df") > maxDf, col("graft_n")).otherwise(0L))
          .as("n_dropped"),
        (coalesce(sum(when(col("graft_df") <= maxDf,
            col("graft_n") * length(col("seg")))), lit(0L))
          + greatest(sum(when(col("graft_df") <= maxDf, col("graft_n"))
            .otherwise(0L)) - 1L, lit(0L)))
          .cast("long").as("out_len"))
  }

  /** Per-language tokenizer-fertility report: documents, word tokens,
    * characters, and tokens-per-100-chars by language — the stat that
    * decides per-language token budgets (a language whose script tokenizes
    * densely eats budget faster). One map-side-combinable aggregation;
    * the division happens once on the exact integer sums. */
  def langFertility(docs: DataFrame, textCol: String,
                    langCol: String): DataFrame =
    docs
      .select(col(langCol).as("lang"),
        T.wordTokens(col(textCol)).cast("long").as("graft_t"),
        length(col(textCol)).cast("long").as("graft_c"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("graft_t").as("n_tokens"),
        sum("graft_c").as("n_chars"),
        round(sum(col("graft_t")) * 100.0 / sum(col("graft_c")), 4)
          .as("tokens_per_100chars"))

  /** Statistical-fluency score — the engine-exact analog of the CCNet /
    * Wikipedia-LM perplexity filter: train a character-bigram model on
    * the corpus itself, score each document by how typical its bigrams
    * are, and surface the least fluent (machine-generated noise, binary
    * junk, wrong-language residue score low because their transitions are
    * rare in the corpus). All arithmetic is integer fixed-point — the
    * conditional probability p(c2|c1) is scaled to parts-per-million and
    * floor-divided, the doc score is the floored mean over its bigram
    * occurrences — so both engines replay bit-for-bit (no log-doubles).
    *
    * Scale posture: one explode of len-1 bigram positions per doc; the
    * model (bigram + head-char counts) is vocab-sized (≤ |charset|²
    * rows), broadcast back onto the occurrences; per-doc score is one
    * map-side-combinable groupBy. At 100 TB the model table is still KBs
    * — the classic tiny-dim broadcast join. */
  def fluencyScore(docs: DataFrame, idCol: String, textCol: String,
                   bottomK: Int): DataFrame = {
    // The per-char bigram explode below fans each doc out to ~|text| rows;
    // spread first so a single-split corpus doesn't run it on one task
    // (guide §2.5; identity once the input has ≥cores partitions).
    val chars = graft.Tables.spread(docs).select(col(idCol).as("id"),
      T.normText(col(textCol)).as("graft_nt"))
      .filter(length(col("graft_nt")) >= 2)
    // ONE explode pass, immediately collapsed to per-(doc, bigram) counts —
    // the only corpus-width shuffle. The model derives from this table:
    // bigram totals roll up over docs, and the head-char totals roll up
    // over the bigram totals (a position's head char IS its bigram's first
    // char, so no second corpus scan is ever needed).
    // Materialized once (artifact): both the model rollup and the final
    // scoring join read it — without truncation the explode+shuffle would
    // replay per consumer.
    val perDoc = Materialize.transient(chars
      .select(col("id"), explode(
        sequence(lit(1), length(col("graft_nt")) - 1)).as("i"),
        col("graft_nt"))
      .select(col("id"), expr("substring(graft_nt, i, 2)").as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("graft_n")))
    val bgCnt = perDoc.groupBy("bg").agg(sum("graft_n").as("graft_nbg"))
    val c1Cnt = bgCnt.groupBy(expr("substring(bg, 1, 1)").as("c1"))
      .agg(sum("graft_nbg").as("graft_nc1"))
    val model = bgCnt.join(c1Cnt, expr("substring(bg, 1, 1) = c1"))
      .select(col("bg"),
        expr("graft_nbg * 1000000 div graft_nc1").as("graft_ppm"))
    perDoc.join(broadcast(model), Seq("bg"))
      .groupBy(col("id").as("doc_id"))
      .agg(sum("graft_n").as("n_bigrams"),
        expr("sum(graft_ppm * graft_n) div sum(graft_n)").as("fluency_ppm"))
      .orderBy(col("fluency_ppm").asc, col("doc_id").asc)
      .limit(bottomK)
  }

  /** Deterministic training-epoch shard assignment: shard =
    * 16-bit-hex-bucket of md5(seed:id) against `nShards` literal string
    * boundaries (fixed-width lowercase hex is order-preserving, so the
    * whole assignment compiles to string compares that replay verbatim in
    * any engine — same discipline as the hash splits). This is the
    * shuffle a trainer needs before packing: a pure function of (seed,
    * id), so shard membership survives repartitioning, retries, and
    * engine swaps, and a NEW seed reshuffles every epoch with zero state.
    * At scale the materialization is `repartitionByRange(nShards, key)` +
    * sortWithinPartitions — one shuffle; no global sort, no driver order.
    */
  def epochShardAssign(docs: DataFrame, idCol: String,
                       seed: Long, nShards: Int): DataFrame = {
    require(nShards > 1 && nShards <= 65536, "nShards must be in 2..65536")
    val h = substring(
      md5(concat(lit(s"$seed:"), col(idCol).cast("string")).cast("binary")),
      1, 4)
    val shard = (1 until nShards).foldLeft(lit(0)) { (acc, i) =>
      acc + when(h >= lit(f"${i * 65536 / nShards}%04x"), 1).otherwise(0)
    }
    docs.withColumn("shard", shard.cast("long")).withColumn("graft_key", h)
  }

  /** Shard-balance readout over [[epochShardAssign]]: per shard, doc and
    * token counts plus the id range — the evenness check a trainer runs
    * before an epoch (a skewed shard is a straggler for the whole step).
    * One map-side key computation into one |nShards|-row aggregate. */
  def epochShardReport(docs: DataFrame, idCol: String, textCol: String,
                       seed: Long, nShards: Int): DataFrame =
    epochShardAssign(docs, idCol, seed, nShards)
      .select(col("shard"), col(idCol),
        T.wordTokens(col(textCol)).cast("long").as("graft_t"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("graft_t").as("n_tokens"),
        min(idCol).as("min_doc"), max(idCol).as("max_doc"))

  /** Per-source frequency cap — the C4/RefinedWeb host-cap rule: keep at
    * most `cap` documents per source, chosen by deterministic seeded-hash
    * rank (not arrival order, which is partitioning-dependent; not
    * quality, which would bias the cap toward long-tail duplication).
    * Spark 4's WindowGroupLimit pushes the rank filter below the
    * exchange, so each partition forwards at most `cap` rows per source
    * BEFORE the shuffle — a mega-source never materializes its full row
    * set on one reducer. */
  def sourceCapSurvivors(docs: DataFrame, idCol: String, sourceCol: String,
                         seed: Long, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val key = md5(concat(lit(s"$seed:"), col(idCol).cast("string"))
      .cast("binary"))
    val w = Window.partitionBy(col(sourceCol)).orderBy(key, col(idCol))
    docs.select(col(sourceCol), col(idCol), key.as("graft_k"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .drop("graft_k")
  }

  /** Release manifest: per (source, split) counts plus an EXACT
    * order-independent content checksum — what a corpus publisher ships
    * next to the shards so any consumer (any engine, any row order) can
    * re-derive and compare. The checksum is the XOR of each document's
    * 48-bit md5 prefix: XOR is commutative/associative (accumulation
    * order free), overflow-free (unlike a sum under ANSI bigints), and
    * any single changed/dropped/added document flips it. conv() parses
    * the 12 hex chars exactly (48 bits < 2^53, also double-safe in
    * engines that route through floats). One narrow aggregate. */
  def releaseManifest(docs: DataFrame, textCol: String,
                      sourceCol: String): DataFrame =
    docs.select(col(sourceCol), T.hashSplit(col(textCol)).as("split"),
        conv(substring(md5(col(textCol).cast("binary")), 1, 12), 16, 10)
          .cast("long").as("graft_h"),
        T.wordTokens(col(textCol)).cast("long").as("graft_t"),
        length(col(textCol)).cast("long").as("graft_c"))
      .groupBy(sourceCol, "split")
      .agg(count(lit(1)).as("n_docs"), sum("graft_t").as("n_tokens"),
        sum("graft_c").as("n_chars"),
        expr("bit_xor(graft_h)").as("checksum48"))

  /** Compression-ratio quality signal — the Gopher/FineWeb-class
    * "compressibility" filter: highly repetitive or templated text
    * deflates far below natural prose, so deflate_ppm (compressed size as
    * ppm of raw UTF-8 size) separates boilerplate from content without
    * any vocabulary model. DEFLATE at a FIXED level (6) over the raw
    * bytes, one typed partition-wise pass (the imperative byte-level leg
    * the multimodal decodes also use — no shuffle, no driver data).
    * Ratios are engine-local (no SQL twin can replay zlib), so the
    * contract query is rows-only; the planted-ordering spec carries the
    * correctness claim (repetitive ≪ varied, empty handled). */
  def compressibility(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("graft_t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val raw = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val d = new java.util.zip.Deflater(6)
          d.setInput(raw); d.finish()
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          d.end()
          (id, raw.length.toLong, n,
            if (raw.length == 0) 1000000L else n * 1000000L / raw.length)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "deflate_ppm")
  }

  /** Consistent bottom-k sample: the k documents with the smallest
    * md5(text) (doc-id tiebreak) — a uniform-like sample that is a PURE
    * FUNCTION OF CONTENT, the corpus-inspection twin of [[mixSample]]'s
    * rate filter. Unlike `sample()`/`limit()`, re-running on a re-sharded,
    * appended, or differently-partitioned corpus returns the SAME
    * documents (appends only displace members whose hash exceeds the new
    * arrivals') — which is what makes eyeball QA samples, labeling
    * batches, and cross-run diff sets stable at 100 TB. Plans as
    * TakeOrderedAndProject: per-partition k-heaps, one k-row driver
    * merge — no global sort. */
  def consistentSample(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, keep: Seq[String]): DataFrame = {
    require(k > 0, "k must be positive")
    docs.select((Seq(col(idCol), md5(col(textCol).cast("binary")).as("content_h"))
        ++ keep.map(col)).toIndexedSeq: _*)
      .orderBy(col("content_h").asc, col(idCol).asc)
      .limit(k)
  }

  /** Stratified EXACT-quota split — per stratum, exactly
    * ⌊n·pct/100⌋ rows go to train and the rest to heldout, membership
    * decided by md5(seed:id) rank within the stratum (id tiebreak). The
    * guarantee [[graft.functions.TextFunctions]]'s hash splits cannot
    * give: independent per-row hashing only APPROXIMATES the split
    * fraction (±√n noise per stratum — a 50-doc language can land
    * 30/70), while an evaluation protocol often requires the quota to
    * hold exactly per language/source. Assignment is still a pure
    * function of (seed, id, stratum composition): re-running on a
    * re-sharded corpus reproduces it; appending to a stratum reassigns
    * only rows near the quota boundary.
    *
    * Scale: one Exchange on the stratum key; the rank window sorts each
    * stratum within its partition (strata parallelize across the
    * cluster — the [[sampleKPerGroup]]/[[sourceCapSurvivors]]
    * discipline). For corpus-scale strata where a per-stratum sort is
    * too hot, fall back to the independent hash split — exactness is
    * what the sort buys. */
  def stratifiedSplit(docs: DataFrame, idCol: String, strataCol: String,
                      seed: Long, trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100, "trainPct must be in (0,100)")
    val key = md5(concat(lit(s"$seed:"), col(idCol).cast("string"))
      .cast("binary"))
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    val wN = Window.partitionBy(col(strataCol))
    docs.select(col(idCol), col(strataCol))
      .withColumn("graft_rn", row_number().over(w).cast("long"))
      .withColumn("graft_n", count(lit(1)).over(wN))
      // rank ≤ ⌊n·pct/100⌋  ⇔  100·rank ≤ n·pct (integer-exact on any engine)
      .withColumn("split",
        when(col("graft_rn") * 100 <= col("graft_n") * trainPct, "train")
          .otherwise("heldout"))
      .select(col(idCol), col(strataCol), col("split"))
  }

  /** Gopher/C4-style heuristic curation rules — the published hard-filter
    * battery a web-corpus pipeline runs BEFORE any learned scoring, as a
    * per-source audit: for each source, how many documents fail each rule
    * and how many are clean. The six rules (all integer-exact, every
    * ratio tested by cross-multiplication so no float division exists on
    * either engine):
    *
    *  - `fail_short` — fewer than `minWords` alphanumeric word tokens
    *    (Gopher's 50-word floor, scaled down for the synthetic corpus);
    *  - `fail_word_len` — mean word length outside [2, 12] chars,
    *    tested as `10·alnumChars > 120·words` / `< 20·words` (Gopher);
    *  - `fail_symbol` — symbol-to-word ratio over 0.1 (`#`, `…`, `...`),
    *    Gopher's symbol screen: `10·symbols > words`;
    *  - `fail_stopword` — fewer than 2 stopword hits (Gopher's "contains
    *    at least 2 of the stop set" hard rule);
    *  - `fail_boiler` — C4's badword markers: lorem ipsum / javascript /
    *    cookie anywhere in the lowercased text;
    *  - `fail_digit` — digit characters over 20% of all characters
    *    (`5·digits > chars`), the numeric-junk screen.
    *
    * Scale: one map-side pass computes every flag inside WholeStageCodegen
    * (regexp_count compositions, no UDFs), then ONE shuffle on the
    * source key reduces to the |sources|-row profile. Cited behaviors:
    * Rae et al. 2021 (Gopher) §A1.1, Raffel et al. 2020 (C4) §2.2. */
  def curationRules(docs: DataFrame, textCol: String, sourceCol: String,
                    minWords: Int = 5): DataFrame = {
    val t = col(textCol)
    val words = T.wordTokens(t).cast("long")
    val alnumChars = length(regexp_replace(t, "[^A-Za-z0-9]", ""))
      .cast("long")
    val symbols = regexp_count(t, lit("#|…|\\.\\.\\.")).cast("long")
    val digits = regexp_count(t, lit("[0-9]")).cast("long")
    val chars = length(t).cast("long")
    val flags = docs.select(
      col(sourceCol).as("source"),
      (words < minWords).cast("long").as("graft_short"),
      (words > 0 && (alnumChars * 10 > words * 120 ||
        alnumChars * 10 < words * 20)).cast("long").as("graft_word_len"),
      (symbols * 10 > words).cast("long").as("graft_symbol"),
      (T.stopwordHits(t) < 2).cast("long").as("graft_stopword"),
      (regexp_count(lower(t), lit("lorem ipsum|javascript|cookie")) > 0)
        .cast("long").as("graft_boiler"),
      (digits * 5 > chars).cast("long").as("graft_digit"))
    flags.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("graft_short").as("fail_short"),
      sum("graft_word_len").as("fail_word_len"),
      sum("graft_symbol").as("fail_symbol"),
      sum("graft_stopword").as("fail_stopword"),
      sum("graft_boiler").as("fail_boiler"),
      sum("graft_digit").as("fail_digit"),
      sum(when(col("graft_short") + col("graft_word_len") +
        col("graft_symbol") + col("graft_stopword") +
        col("graft_boiler") + col("graft_digit") === 0, 1L).otherwise(0L))
        .as("n_clean"))
  }

  /** Per-source readability profile — Flesch reading ease and
    * Flesch-Kincaid grade level, the classic complexity signals a
    * curation mix targets ("grade-8 prose for pretraining, graduate
    * text for the math mix"). The syllable leg is the standard
    * vowel-group heuristic, DOCUMENTED as the contract (not a
    * dictionary): syllables ≈ runs of [aeiouy]+ in the lowercased text,
    * floored at one per word; sentences ≈ runs of [.!?]+, floored at 1.
    *
    * Exactness: both formulas are affine in W/S and Y/W, so per doc
    *   fk_milli  = (390·W) div S + (11800·Y) div W − 15590
    *   ease_milli = 206835 − (1015·W) div S − (84600·Y) div W
    * — two floor divisions each at fixed points (documented, replayed
    * verbatim), negative-safe because every operand is nonnegative and
    * the subtraction happens after the floors. Per-source means floor
    * once more over the doc sums. Empty docs (W = 0) are excluded from
    * both means and surfaced in `n_empty`.
    *
    * One codegen'd map pass, ONE source-keyed shuffle. */
  def readabilityProfile(docs: DataFrame, textCol: String,
                         sourceCol: String): DataFrame = {
    val t = col(textCol)
    val w = regexp_count(t, lit("[A-Za-z0-9]+")).cast("long")
    val y0 = regexp_count(lower(t), lit("[aeiouy]+")).cast("long")
    val sent = greatest(regexp_count(t, lit("[.!?]+")), lit(1)).cast("long")
    val per = docs.select(
      col(sourceCol).as("source"), w.as("graft_w"),
      greatest(y0, w).as("graft_y"), sent.as("graft_s"))
      .select(col("source"), col("graft_w"),
        when(col("graft_w") > 0,
          expr("(390 * graft_w) div graft_s"
            + " + (11800 * graft_y) div graft_w - 15590")).as("graft_fk"),
        when(col("graft_w") > 0,
          expr("206835 - (1015 * graft_w) div graft_s"
            + " - (84600 * graft_y) div graft_w")).as("graft_ease"))
    per.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("graft_w") === 0, 1L).otherwise(0L)).as("n_empty"),
      count(col("graft_fk")).as("graft_nv"),
      sum("graft_fk").as("graft_sfk"), sum("graft_ease").as("graft_se"))
      .select(col("source"), col("n_docs"), col("n_empty"),
        expr("CASE WHEN graft_nv = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_sfk div graft_nv END").as("fk_grade_milli"),
        expr("CASE WHEN graft_nv = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_se div graft_nv END").as("reading_ease_milli"))
  }

  /** Encoding-damage + character-hygiene audit per source — the screen a
    * web-scraped corpus runs BEFORE [[curationRules]]' content rules:
    * text that survived a bad transcode is unsalvageable garbage no
    * quality heuristic should ever score. Three damage detectors and
    * three composition ppms, all map-side regex counts:
    *
    *  - `n_ctrl` — docs with C0 control chars other than tab/LF/CR
    *    (binary spillage, broken escape handling);
    *  - `n_replacement` — docs containing U+FFFD, the decoder's own
    *    "I gave up" marker;
    *  - `n_mojibake` — docs matching the classic UTF-8-read-as-Latin-1
    *    battery (Ã©/Ã¨/Ã¼/Ã¶/Ã¤/Ã±/Ã§ accents, the â€ quote/dash
    *    family, Â£/Â° currency/degree) — a documented finite battery
    *    rather than a byte-range heuristic so both engines match the
    *    exact same artifacts;
    *  - `upper_ppm` / `digit_ppm` / `nonascii_ppm` — uppercase share of
    *    letters, digit and non-ASCII share of all chars (floor-ppm,
    *    NULL on empty denominators): the composition drift a source
    *    mix-shift shows up in first.
    *
    * A clean corpus reads zeros in the damage columns — that IS the
    * readout (the spec plants damaged docs to prove detection). One
    * codegen'd pass, ONE source-keyed shuffle to the |sources|-row
    * profile; character classes only (no backreferences), so Java and
    * RE2 regex agree, and counts are per code point in both engines. */
  def encodingAudit(docs: DataFrame, textCol: String,
                    sourceCol: String): DataFrame = {
    val t = col(textCol)
    val ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
    val moji = MojiBattery
    val flags = docs.select(
      col(sourceCol).as("source"),
      (regexp_count(t, lit(ctrl)) > 0).cast("long").as("graft_ctrl"),
      (regexp_count(t, lit("�")) > 0).cast("long").as("graft_repl"),
      (regexp_count(t, lit(moji)) > 0).cast("long").as("graft_moji"),
      regexp_count(t, lit("[A-Z]")).cast("long").as("graft_up"),
      regexp_count(t, lit("[A-Za-z]")).cast("long").as("graft_let"),
      regexp_count(t, lit("[0-9]")).cast("long").as("graft_dig"),
      regexp_count(t, lit("[^\\x00-\\x7F]")).cast("long").as("graft_na"),
      length(t).cast("long").as("graft_ch"))
    flags.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("graft_ctrl").as("n_ctrl"),
      sum("graft_repl").as("n_replacement"),
      sum("graft_moji").as("n_mojibake"),
      sum(when(col("graft_ctrl") + col("graft_repl") +
        col("graft_moji") === 0, 1L).otherwise(0L)).as("n_clean"),
      sum("graft_up").as("graft_sup"), sum("graft_let").as("graft_slet"),
      sum("graft_dig").as("graft_sdig"), sum("graft_na").as("graft_sna"),
      sum("graft_ch").as("graft_sch"))
      .select(col("source"), col("n_docs"), col("n_ctrl"),
        col("n_replacement"), col("n_mojibake"), col("n_clean"),
        expr("CASE WHEN graft_slet = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_sup * 1000000 div graft_slet END").as("upper_ppm"),
        expr("CASE WHEN graft_sch = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_sdig * 1000000 div graft_sch END").as("digit_ppm"),
        expr("CASE WHEN graft_sch = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE graft_sna * 1000000 div graft_sch END")
          .as("nonascii_ppm"))
  }

  /** Mojibake repair report per source — [[encodingAudit]]'s ACTION
    * step (detect → FIX → re-audit), the ftfy stage of a web pipeline:
    * rows flagged by the q248 mojibake battery are repaired with
    * [[graft.functions.FixEncoding]]'s cp1252→UTF-8 round-trip; rows
    * the battery doesn't flag are never touched (repair exactly what
    * the detector indicts — an audit trail, not a blanket rewrite).
    * Per source: docs, flagged, repaired (flagged AND changed),
    * unrepairable (flagged but the round-trip refused — genuine
    * Latin-1-ish bytes that aren't valid UTF-8), and flagged_after —
    * the residual battery hits after repair (= unrepairable when the
    * repair actually removes the artifacts; the column is the
    * closed-loop proof, recomputed, not echoed).
    *
    * The repaired corpus itself is the `repaired` column of the
    * pre-aggregate frame; callers wanting the cleaned table use
    * [[repairEncodingDocs]].
    *
    * Scale: one codegen'd pass (two regex counts + the byte-loop
    * repair), ONE source-keyed shuffle to the |sources|-row report. */
  def repairEncoding(docs: DataFrame, textCol: String,
                     sourceCol: String): DataFrame =
    repairEncodingDocs(docs, textCol)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("graft_flag").cast("long")).as("n_flagged"),
        sum((col("graft_flag") && col("repaired") =!= col(textCol))
          .cast("long")).as("n_repaired"),
        sum((col("graft_flag") && col("repaired") === col(textCol))
          .cast("long")).as("n_unrepairable"),
        sum((regexp_count(col("repaired"), lit(MojiBattery)) > 0)
          .cast("long")).as("n_flagged_after"))

  /** The cleaned-corpus producer behind [[repairEncoding]]: every input
    * column rides through, plus `graft_flag` (battery hit) and
    * `repaired` (fixed text for flagged rows, verbatim otherwise). */
  def repairEncodingDocs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("graft_flag",
        regexp_count(col(textCol), lit(MojiBattery)) > 0)
      .withColumn("repaired",
        when(col("graft_flag"),
          graft.functions.TextFunctions.fixEncoding(col(textCol)))
          .otherwise(col(textCol)))

  /** The q248 mojibake battery (shared by detector and repair gate). */
  val MojiBattery = "Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|â€|Â£|Â°"

  /** Consistent-hashing shard assignment + the REBALANCE bill — the
    * routing decision every sharded store/cache/queue makes, measured:
    * docs map onto a hash ring (each shard owns `vnodes` md5 positions;
    * a doc belongs to the smallest ring position ≥ its own hash,
    * wrapping to the ring's minimum — Karger et al., STOC'97), and the
    * report compares the `nShards`-ring assignment with the
    * `nShards+1`-ring one: per old shard, how many docs MOVE when one
    * shard joins. Consistent hashing's promise is ~1/(N+1) total
    * movement (only docs the NEW shard's positions capture move, and
    * only to the new shard) versus mod-N hashing's ~N/(N+1) reshuffle —
    * this operator is the proof on your own corpus. Everything is md5
    * arithmetic on 48-bit hex prefixes: exact, engine-replayable.
    *
    * Scale: the ring has NO data dependency — (nShards+1)·vnodes md5
    * positions computed on the driver and shipped as sorted array /
    * map LITERALS inside a single projection. Each doc resolves both
    * its before- and after-ring owner in one map pass (a filter+min
    * fold over the literal, then a literal-map lookup); the ONLY
    * Exchanges in the plan are the final |shards|-row rollup and its
    * orderBy — the corpus itself is never shuffled. */
  def shardRebalanceReport(docs: DataFrame, idCol: String,
                           nShards: Int, vnodes: Int): DataFrame = {
    require(nShards >= 1 && vnodes >= 1, "nShards and vnodes must be >= 1")
    // Driver-side ring: same md5 arithmetic Spark's md5() performs, so
    // positions are bit-identical to the engine-replayed oracle's.
    def md5Pos(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    // Position collisions across shards are 2⁻⁴⁸-rare; if one ever
    // happened, min-shard ownership resolves it — identically to the
    // oracle's min(shard) fold over equal positions.
    def ownerCol(maxShard: Int): Column = {
      val owner = (0 to maxShard).flatMap { s =>
        (0 until vnodes).map(v => (md5Pos(s"$s#$v"), s.toLong))
      }.groupBy(_._1).map { case (p, es) => p -> es.map(_._2).min }
      val ps = owner.keys.toArray.sorted
      val pArr = typedLit(ps)
      val ownerMap = map(ps.flatMap(p => Seq(lit(p), lit(owner(p)))): _*)
      // Smallest ring position ≥ the doc hash, wrapping to the ring
      // minimum — one fold over the 40-entry literal, fully map-side.
      val tp = coalesce(
        array_min(filter(pArr, p => p >= col("graft_h"))), lit(ps.min))
      element_at(ownerMap, tp)
    }
    docs.select(
        conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
          .cast("long").as("graft_h"))
      .select(ownerCol(nShards - 1).as("shard_before"),
        ownerCol(nShards).as("shard_after"))
      .groupBy(col("shard_before"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_before") =!= col("shard_after"), 1L)
          .otherwise(0L)).as("n_moved"),
        max(when(col("shard_before") =!= col("shard_after"),
          col("shard_after"))).as("graft_dest"))
      .select(col("shard_before").cast("long").as("shard"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_moved").cast("long").as("n_moved"),
        expr("n_moved * 1000000 div n_docs").as("moved_ppm"),
        col("graft_dest").cast("long").as("moved_to"))
      .orderBy("shard")
  }

  /** Multi-level public suffixes the registrable-domain heuristic knows:
    * hosts ending in one of these keep THREE labels, every other host
    * keeps two. Honest subset of the Mozilla Public Suffix List — the
    * full list is a runtime data file out of scope here; the common
    * country-code second-level domains below cover the bulk of real
    * crawl traffic that last-two-labels would mis-fold. */
  private val MultiLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz", "co.in", "net.in", "org.in",
    "com.br", "net.br", "org.br", "co.kr", "or.kr",
    "com.cn", "net.cn", "org.cn", "com.mx", "com.sg", "com.tr",
    "com.ar", "com.co", "co.za", "org.za")

  /** URL extraction + registrable-domain rollup — the provenance audit
    * every web-scale curation pipeline runs before mixing (C4 and
    * RefinedWeb both gate and weight by domain; reference dag.py:17
    * tracks per-source provenance at table grain — this is the same
    * question asked of in-text citations): pull every http(s) URL out of
    * `textCol`, normalize to its registrable domain, and report per
    * domain how many URLs and how many distinct documents cite it.
    *
    * Normalization, in order: trailing sentence punctuation stripped
    * (URLs captured mid-prose drag `).,;:!?` along), host = authority up
    * to the first `/?#`, userinfo and `:port` dropped, lowercased;
    * registrable domain = last two labels, or last three when the
    * last-two match [[MultiLevelSuffixes]] (`bbc.co.uk`, not `co.uk`).
    * Non-http(s) schemes never match the capture regex — ftp:// and
    * mailto: text is invisible to the audit by construction.
    *
    * Scale: the regex family runs per row inside whole-stage codegen,
    * the explode fans out only actual matches (bounded by URL count, not
    * text length), and the rollup is one (domain) hash aggregate whose
    * countDistinct Spark plans as the standard two-phase expand — no
    * window, no join, nothing driver-side. */
  def urlDomains(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val urls = docs
      .select(col(idCol).as("graft_id"),
        explode(expr(
          s"regexp_extract_all($textCol, 'https?://[^\\\\s]+', 0)"))
          .as("graft_u"))
      .withColumn("graft_u",
        regexp_replace(col("graft_u"), "[).,;:!?\\]]+$", ""))
      .withColumn("graft_h",
        lower(regexp_extract(col("graft_u"), "^[a-zA-Z]+://([^/?#]+)", 1)))
      .withColumn("graft_h", regexp_replace(col("graft_h"), "^.*@", ""))
      .withColumn("graft_h", regexp_replace(col("graft_h"), ":[0-9]+$", ""))
      .filter(length(col("graft_h")) > 0)
      .withColumn("graft_p", split(col("graft_h"), "\\."))
      .withColumn("graft_k", size(col("graft_p")))
      .withColumn("graft_l2",
        when(col("graft_k") >= 2,
          concat_ws(".", slice(col("graft_p"), -2, 2)))
          .otherwise(col("graft_h")))
    urls
      .withColumn("domain",
        when(col("graft_k") >= 3 &&
          col("graft_l2").isin(MultiLevelSuffixes: _*),
          concat_ws(".", slice(col("graft_p"), -3, 3)))
          .otherwise(col("graft_l2")))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("graft_id")).as("n_docs"))
      .select(col("domain"), col("n_urls").cast("long").as("n_urls"),
        col("n_docs").cast("long").as("n_docs"))
  }

  /** Line-wise document filtering — the RefinedWeb/C4 stage BETWEEN
    * markup strip and document-level quality: a page whose body is fine
    * except for "click here" chrome should lose the LINES, not the
    * document. Four deterministic per-line rules, applied in one pass:
    *
    *  - too short: fewer than `minChars` chars after trim;
    *  - punctuation-heavy: punct count · 100 > len · `maxPunctPct`
    *    (integer compare — no float ratio to disagree on);
    *  - boilerplate: trimmed line equals a literal from the documented
    *    ban list (C4 bans "javascript required" lines the same way);
    *  - within-doc duplicate: an identical earlier line (by position)
    *    already kept the content.
    *
    * Output per doc: original/kept line counts and the reassembled text
    * (kept lines joined by newline, original order) — the cleaned
    * corpus, not just a report.
    *
    * Scale: split + posexplode fan-out (bounded by line count), one
    * (doc, line) window for the dup rule, one doc-keyed ordered
    * reassembly — two shuffles on the doc key, flags all codegen'd. */
  def lineFilter(docs: DataFrame, idCol: String, textCol: String,
                 minChars: Int = 10, maxPunctPct: Int = 30,
                 boilerplate: Seq[String] = Seq.empty): DataFrame = {
    require(minChars >= 0 && maxPunctPct >= 0 && maxPunctPct <= 100,
      "minChars >= 0, maxPunctPct in 0..100")
    val lines = docs
      .select(col(idCol).as("graft_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("graft_pos", "graft_l")))
      .withColumn("graft_t", trim(col("graft_l")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_id", "graft_t")
    val flagged = lines
      .withColumn("graft_short", length(col("graft_t")) < minChars)
      .withColumn("graft_punct",
        regexp_count(col("graft_t"), lit("[.,;:!?]")) * 100 >
          length(col("graft_t")) * maxPunctPct)
      .withColumn("graft_boiler",
        if (boilerplate.isEmpty) lit(false)
        else col("graft_t").isin(boilerplate: _*))
      .withColumn("graft_dup",
        col("graft_pos") > min(col("graft_pos")).over(w))
      .withColumn("graft_keep",
        !col("graft_short") && !col("graft_punct") &&
          !col("graft_boiler") && !col("graft_dup"))
    flagged.groupBy(col("graft_id").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        sum(col("graft_keep").cast("long")).cast("long").as("n_kept"),
        concat_ws("\n",
          transform(array_sort(collect_list(when(col("graft_keep"),
            struct(col("graft_pos"), col("graft_l"))))),
            x => x("graft_l"))).as("clean_text"))
  }

  /** Interpolated Kneser-Ney bigram table — the KenLM-style language
    * model artifact (Kneser & Ney 1995; the smoothing every production
    * n-gram LM ships): with the discount FIXED at D = ¾, the
    * interpolated bigram probability clears to ONE exact rational in
    * quarter-units —
    *   P(w₂|w₁) = [(4c(w₁w₂) − 3)·T + 3·N₁₊(w₁·)·N₁₊(·w₂)]
    *              / (4·c(w₁·)·T)
    * where T = distinct bigram types, N₁₊(w₁·) = distinct continuations
    * of w₁, N₁₊(·w₂) = distinct histories of w₂ (the continuation count
    * that makes KN beat Katz: "francisco" is frequent but follows only
    * "san"). c ≥ 1 ⇒ 4c − 3 ≥ 1, so the max() in the textbook form is
    * vacuous. Emitted as floor-ppm over the top-K bigrams by
    * (count desc, bigram asc) — exact on any engine, no logs.
    *
    * Scale: one adjacent-pair fan-out (the q389 shape) → a bigram-TYPE
    * table; left totals/continuations/histories all derive from that
    * vocab-sized table (the corpus is never rescanned); two vocab-keyed
    * joins + a 1-row type-count broadcast. */
  def kneserNeyBigrams(docs: DataFrame, textCol: String,
                       topK: Int): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val dec = "decimal(38,0)"
    val toks = docs.select(T.tokens(col(textCol)).as("graft_ts"))
    val bi = Materialize.transient(toks
      .select(explode(expr(
        "transform(sequence(1, greatest(size(graft_ts) - 1, 0))," +
          " i -> struct(graft_ts[i - 1] AS w1, graft_ts[i] AS w2))"))
        .as("graft_b"))
      .filter(length(col("graft_b.w1")) > 0 && length(col("graft_b.w2")) > 0)
      .groupBy(col("graft_b.w1").as("w1"), col("graft_b.w2").as("w2"))
      .agg(count(lit(1)).as("n")))
    val left = bi.groupBy("w1")
      .agg(sum("n").as("graft_c1"), count(lit(1)).as("graft_n1l"))
    val right = bi.groupBy("w2").agg(count(lit(1)).as("graft_n1r"))
    val types = bi.agg(count(lit(1)).cast(dec).as("graft_t"))
    bi.join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("n").cast("long").as("n"),
        expr(s"CAST(((4 * CAST(n AS $dec) - 3) * graft_t" +
          s" + 3 * CAST(graft_n1l AS $dec) * graft_n1r) * 1000000" +
          s" div (4 * CAST(graft_c1 AS $dec) * graft_t) AS BIGINT)")
          .as("pkn_ppm"))
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Span-corruption example builder — the T5 denoising objective's
    * data prep (Raffel et al. 2020 §3.1.4): tokens are noise-selected
    * by a PORTABLE content hash (md5(doc:position) bucket — the q308
    * ring arithmetic, so any engine replays the selection bit-for-bit,
    * no RNG state), maximal selected runs become spans, and the example
    * pair is assembled exactly as T5 does — input keeps the clean
    * tokens with each span collapsed to its ordinal `<extra_id_k>`
    * sentinel; target lists each sentinel with its span's tokens and
    * closes with the final sentinel. Emits per doc the token/noise/span
    * counts plus md5s of both assembled sides (the proof the REWRITE is
    * right, not just the counts).
    *
    * `noiseBuckets`/`modulus` set the expected noise rate (3/20 = the
    * paper's 15%).
    *
    * Scale: one posexplode fan-out, one doc-keyed lag/cumsum window,
    * one doc-keyed ordered reassembly — two shuffles on the doc key,
    * everything else codegen'd. */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     modulus: Int = 20, noiseBuckets: Int = 3): DataFrame = {
    require(modulus >= 2 && noiseBuckets >= 1 && noiseBuckets < modulus,
      "need 1 <= noiseBuckets < modulus")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("graft_id").orderBy("graft_pos")
    val toks = docs
      .select(col(idCol).as("graft_id"),
        posexplode(T.tokens(col(textCol))).as(Seq("graft_pos", "graft_tok")))
      .filter(length(col("graft_tok")) > 0)
      .withColumn("graft_sel",
        pmod(conv(substring(md5(concat_ws("",
          col("graft_id").cast("string"), lit(":"),
          (col("graft_pos") + 1).cast("string")).cast("binary")), 1, 12),
          16, 10).cast("long"), lit(modulus)) < noiseBuckets)
      .withColumn("graft_start", col("graft_sel") &&
        !coalesce(lag(col("graft_sel"), 1).over(w), lit(false)))
      .withColumn("graft_k",
        sum(col("graft_start").cast("long")).over(w) - 1)
    val pieces = toks
      .withColumn("graft_in",
        when(!col("graft_sel"), col("graft_tok"))
          .when(col("graft_start"),
            concat(lit("<extra_id_"), col("graft_k"), lit(">"))))
      .withColumn("graft_tg",
        when(col("graft_start"),
          concat(lit("<extra_id_"), col("graft_k"), lit("> "),
            col("graft_tok")))
          .when(col("graft_sel"), col("graft_tok")))
    pieces.groupBy(col("graft_id").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("graft_sel").cast("long")).cast("long").as("n_noise"),
        sum(col("graft_start").cast("long")).cast("long").as("n_spans"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("graft_in").isNotNull,
            struct(col("graft_pos"), col("graft_in"))))),
          x => x("graft_in"))).as("graft_input"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("graft_tg").isNotNull,
            struct(col("graft_pos"), col("graft_tg"))))),
          x => x("graft_tg"))).as("graft_target0"))
      .select(col(idCol), col("n_tokens"), col("n_noise"), col("n_spans"),
        md5(col("graft_input")).as("input_md5"),
        md5(concat_ws(" ",
          when(length(col("graft_target0")) > 0, col("graft_target0")),
          concat(lit("<extra_id_"), col("n_spans"), lit(">"))))
          .as("target_md5"))
  }

  /** URL-pattern exclusion gate — the blocklist stage C4/RefinedWeb run
    * BEFORE fetching or keeping a page (ad/tracker hosts, spam domains,
    * ad-path URLs are dropped at the URL, the cheapest possible point):
    * each URL is classified against three rule families in precedence
    * order — exact banned host, banned domain suffix (`spam.example`
    * bans `sub.spam.example` and itself), banned path prefix — and the
    * verdict carries WHICH rule fired (list order breaks overlaps), so
    * the gate is an auditable filter, not a silent drop. Host
    * normalization is [[urlDomains]]' chain (authority → userinfo/port
    * stripped, lowercased); the path excludes query/fragment.
    *
    * Scale: a per-row when-chain over literal rules in whole-stage
    * codegen — no join against a rule table until the rule list
    * outgrows a literal chain (thousands), at which point a broadcast
    * join on host is the drop-in upgrade. */
  def urlFilter(pages: DataFrame, urlCol: String,
                bannedHosts: Seq[String], bannedSuffixes: Seq[String],
                bannedPathPrefixes: Seq[String]): DataFrame = {
    def firstMatch(rules: Seq[String], cond: String => Column): Column =
      coalesce(rules.map(r => when(cond(r), lit(r))) :+
        lit(null).cast("string"): _*)
    val withParts = pages
      .withColumn("host",
        regexp_replace(regexp_replace(
          lower(regexp_extract(col(urlCol), "^[a-zA-Z]+://([^/?#]+)", 1)),
          "^.*@", ""), ":[0-9]+$", ""))
      .withColumn("path",
        regexp_extract(col(urlCol), "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1))
    val hostRule = firstMatch(bannedHosts, h => col("host") === h)
    val sufRule = firstMatch(bannedSuffixes, sfx =>
      col("host") === sfx || col("host").endsWith("." + sfx))
    val pathRule = firstMatch(bannedPathPrefixes,
      p => col("path").startsWith(p))
    withParts
      .withColumn("rule", coalesce(hostRule, sufRule, pathRule))
      .withColumn("verdict",
        when(hostRule.isNotNull, lit("banned_host"))
          .when(sufRule.isNotNull, lit("banned_suffix"))
          .when(pathRule.isNotNull, lit("banned_path"))
          .otherwise(lit("admit")))
  }

  /** HTML metadata extraction — the provenance fields a crawl pipeline
    * keeps from the page head (title for display/dedup, og:title for
    * the socially-canonical name, rel=canonical for URL-level dedup,
    * the html lang attribute as the author's own language claim, read
    * BEFORE any content-based language ID): each is one anchored
    * non-greedy regexp over the raw page, absent fields NULL (never
    * empty-string — a page without a canonical is different from one
    * with an empty one). Title whitespace collapses; attribute fields
    * are taken verbatim.
    *
    * Scale: four codegen'd per-row regexps — no shuffle, no state. */
  def htmlMeta(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    def nn(c: Column): Column = when(length(c) > 0, c)
    docs.select(col(idCol),
      nn(trim(regexp_replace(regexp_extract(col(htmlCol),
        "(?s)<title[^>]*>(.*?)</title>", 1), "\\s+", " ")))
        .as("title"),
      nn(regexp_extract(col(htmlCol),
        "<meta[^>]*property=\"og:title\"[^>]*content=\"([^\"]*)\"", 1))
        .as("og_title"),
      nn(regexp_extract(col(htmlCol),
        "<link[^>]*rel=\"canonical\"[^>]*href=\"([^\"]*)\"", 1))
        .as("canonical"),
      nn(regexp_extract(col(htmlCol),
        "<html[^>]*lang=\"([^\"]*)\"", 1)).as("html_lang"))
  }

  /** sitemap.xml extraction — crawl discovery's other half next to
    * [[Robots]]' politeness gate: each `<url>` entry yields its `<loc>`
    * (trimmed, NULL when absent or empty — the same absent-means-NULL
    * convention as lastmod and htmlMeta) and optional `<lastmod>` (ISO
    * date string, NULL when absent — never empty), in document order. The regex
    * chain is the q428 two-stage shape (whole `<url>` blocks, then
    * per-block fields), DOTALL non-greedy, codegen'd; `<sitemapindex>`
    * files simply yield zero `<url>` entries (an index's `<sitemap>`
    * blocks are a different element — honest, not a silent misparse).
    *
    * Scale: one entry-count-bounded explode, zero shuffle. */
  def sitemapUrls(docs: DataFrame, idCol: String,
                  xmlCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(expr(
        s"regexp_extract_all($xmlCol, '(?s)<url>.*?</url>', 0)"))
        .as(Seq("graft_i", "graft_u")))
      .select(col(idCol),
        (col("graft_i") + 1).cast("long").as("entry_idx"),
        when(length(trim(regexp_extract(col("graft_u"),
          "(?s)<loc>(.*?)</loc>", 1))) > 0,
          trim(regexp_extract(col("graft_u"),
            "(?s)<loc>(.*?)</loc>", 1))).as("loc"),
        when(length(regexp_extract(col("graft_u"),
          "(?s)<lastmod>(.*?)</lastmod>", 1)) > 0,
          trim(regexp_extract(col("graft_u"),
            "(?s)<lastmod>(.*?)</lastmod>", 1))).as("lastmod"))

  /** Anchor-text extraction — the (href, text) pairs that seed the web
    * link graph (PageRank/HITS input at crawl scale) and anchor-text
    * retrieval (the strongest classic relevance signal for the TARGET
    * page): every `<a … href="…">…</a>` tag yields its href verbatim
    * and its inner text whitespace-collapsed, in document order
    * (`link_idx`). Two-stage regex chain — extract whole tags, then
    * per-tag href/text — all codegen'd, non-greedy DOTALL inner match;
    * href-less anchors are invisible by construction.
    *
    * Scale: one explode bounded by actual link count, zero shuffle. */
  def anchorText(docs: DataFrame, idCol: String,
                 htmlCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(expr(
        s"""regexp_extract_all($htmlCol,
           |'(?s)<a [^>]*href="[^"]*"[^>]*>.*?</a>', 0)""".stripMargin
          .replace("\n", " ")))
        .as(Seq("graft_i", "graft_a")))
      .select(col(idCol),
        (col("graft_i") + 1).cast("long").as("link_idx"),
        regexp_extract(col("graft_a"), "href=\"([^\"]*)\"", 1)
          .as("href"),
        trim(regexp_replace(
          regexp_extract(col("graft_a"), "(?s)>(.*?)</a>", 1),
          "\\s+", " ")).as("anchor_text"))

  /** HTML main-text extraction — the markup-strip step every web-crawl
    * curation pipeline runs before any text operator sees a page (C4
    * strips boilerplate markup before its heuristics; this is the
    * deterministic core of that step): script and style blocks die WITH
    * their content, links and images are counted before the generic tag
    * strip, the five ubiquitous entities decode (&lt; &gt; &quot; &#39;
    * &nbsp; — then &amp; LAST, so "&amp;lt;" correctly yields "&lt;"
    * and never double-decodes), and whitespace collapses. Every step is
    * a fixed-order regexp/replace chain (DOTALL non-greedy block
    * removal — both engines' regex dialects agree on this subset),
    * `markup_ppm` = (html_len − clean_len)·10⁶ div html_len.
    *
    * Honest boundary: this is a MARKUP stripper, not a boilerplate
    * CLASSIFIER — nav/footer text survives (that judgment call is the
    * q126 corpus-frequency strip's job downstream).
    *
    * Scale: one codegen'd per-row expression chain — no shuffle, no
    * join, no state. */
  def htmlExtract(docs: DataFrame, idCol: String,
                  htmlCol: String): DataFrame = {
    val noScript = regexp_replace(col(htmlCol),
      "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?s)<style[^>]*>.*?</style>", " ")
    val entityPairs = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val decoded = entityPairs.foldLeft(
      regexp_replace(noStyle, "<[^>]+>", " ")) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }
    docs.select(col(idCol),
        col(htmlCol).as("graft_h"), noStyle.as("graft_ns"),
        trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"))
      .select(col(idCol),
        col("clean_text"),
        size(expr("regexp_extract_all(graft_ns, '<a[\\\\s>]', 0)"))
          .cast("long").as("n_links"),
        size(expr("regexp_extract_all(graft_ns, '<img[\\\\s/>]', 0)"))
          .cast("long").as("n_images"),
        size(expr("regexp_extract_all(graft_ns, '<[^>]+>', 0)"))
          .cast("long").as("n_tags"),
        expr("CASE WHEN length(graft_h) = 0 THEN 0" +
          " ELSE (length(graft_h) - length(clean_text)) * 1000000" +
          " div length(graft_h) END").as("markup_ppm"))
  }

  /** Bigram collocation mining by LIFT — "which word pairs travel
    * together far beyond chance" (the phrase/terminology discovery next
    * to [[graft.operators.Search]]'s relatedTerms, which looks at
    * doc-level co-occurrence; this is ADJACENCY): for adjacent tokens
    * (a, b), lift = P(ab) / (P(a)·P(b)) with P(ab) over the corpus's N₂
    * bigram slots and the unigram Ps over its N tokens — all exact
    * counts, lift emitted as one floor-ppm rational
    * n_ab·N²·10⁶ div (N₂·n_a·n_b) (inside DECIMAL(38,0) up to
    * N ≈ 10¹⁰ tokens with n_ab bounded by N₂; beyond that the caller
    * shards by source — documented bound). PMI is log(lift): same
    * ranking, no transcendental (the family rule). `minSupport` floors
    * n_ab so one-off juxtapositions don't top the list; top-k by
    * (lift desc, bigram asc) — deterministic.
    *
    * Scale: the bigram stream comes from an in-array adjacent zip (one
    * bounded explode per doc — no position join, no shuffle before the
    * counts), then one bigram count + one unigram count (both
    * map-combinable), two count-table joins, distributed top-k. */
  def collocations(docs: DataFrame, textCol: String, minSupport: Long,
                   topK: Int): DataFrame = {
    require(minSupport >= 1 && topK >= 1,
      "minSupport and topK must be positive")
    val dec = "decimal(38,0)"
    val base = Materialize.transient(docs
      .select(T.tokens(col(textCol)).as("graft_toks")))
    val uni = base.select(explode(col("graft_toks")).as("graft_t"))
      .filter(length(col("graft_t")) > 0)
      .groupBy(col("graft_t")).agg(count(lit(1)).as("graft_nu"))
    val tot = uni.agg(sum("graft_nu").cast(dec).as("graft_nn"))
    val bi = base.filter(size(col("graft_toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(graft_toks) - 2)," +
          " i -> struct(element_at(graft_toks, i + 1) AS w1," +
          " element_at(graft_toks, i + 2) AS w2))")).as("graft_bg"))
      .select(col("graft_bg.w1").as("graft_w1"),
        col("graft_bg.w2").as("graft_w2"))
      .filter(length(col("graft_w1")) > 0 && length(col("graft_w2")) > 0)
      .groupBy("graft_w1", "graft_w2")
      .agg(count(lit(1)).as("graft_nab"))
    val n2 = bi.agg(sum("graft_nab").cast(dec).as("graft_n2"))
    bi.filter(col("graft_nab") >= minSupport)
      .join(uni.select(col("graft_t").as("graft_w1"),
        col("graft_nu").as("graft_na")), Seq("graft_w1"))
      .join(uni.select(col("graft_t").as("graft_w2"),
        col("graft_nu").as("graft_nb")), Seq("graft_w2"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n2))
      .select(col("graft_w1").as("word_1"), col("graft_w2").as("word_2"),
        col("graft_nab").cast("long").as("n_pair"),
        expr(s"CAST(CAST(graft_nab AS $dec) * graft_nn * graft_nn" +
          " * 1000000 div (graft_n2 * graft_na * graft_nb) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("word_1").asc, col("word_2").asc)
      .limit(topK)
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the canonical
    * key web archives sort their CDX indexes on: the lowercased host's
    * labels REVERSED and comma-joined, then `)` and the lowercased
    * path+query ("http://www.Example.COM/A?X=1" →
    * "com,example,www)/a?x=1"). Reversal puts a domain's subdomains in
    * one contiguous key range, which is what makes per-domain index
    * scans range-prunable. This variant drops scheme, fragment,
    * userinfo, and port (the canonicalized-SURT convention; pair with
    * [[graft.functions.TextFunctions.canonicalUrl]] upstream for the
    * rest); an empty path becomes "/". Non-URLs (no `://`) yield NULL —
    * a sort key for a non-URL would be a lie. Pure built-in expression
    * chain (regexp extracts + split/reverse/array_join), fully
    * codegen'd, zero shuffle. */
  def surtKey(url: Column): Column = {
    val host = lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    val pathq = lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1))
    when(length(host) > 0,
      concat(array_join(reverse(split(host, "\\.")), ","), lit(")"),
        when(length(pathq) > 0, pathq).otherwise(lit("/"))))
  }

  /** Per-page robots META directive gate — the in-page half of
    * [[Robots]]' politeness story (the REP's `<meta name="robots">`):
    * extracts the first robots meta tag's content (NULL when absent),
    * splits the comma list case-insensitively, and reports the two
    * flags an indexing/corpus gate consumes: `indexable` (no `noindex`
    * / `none`) and `followable` (no `nofollow` / `none`) — both
    * default-open like robots.txt. One regexp + an exists() over the
    * bounded token list, codegen'd, zero shuffle. */
  def metaRobots(docs: DataFrame, idCol: String,
                 htmlCol: String): DataFrame = {
    val content = regexp_extract(col(htmlCol),
      "(?i)<meta[^>]*name=\"robots\"[^>]*content=\"([^\"]*)\"", 1)
    val toks = transform(split(lower(content), ","),
      t => trim(t))
    def has(v: String): Column =
      exists(toks, t => t === lit(v))
    docs.select(col(idCol),
      when(length(content) > 0, content).as("robots_content"),
      (!(has("noindex") || has("none"))).as("indexable"),
      (!(has("nofollow") || has("none"))).as("followable"))
  }

  /** Registered-domain (eTLD+1) extraction against a DECLARED public-
    * suffix table — the rollup key every crawl pipeline groups hosts by
    * (per-site quotas, domain dedup, host-graph contraction): the
    * longest suffix in the table that the lowercased host equals or
    * ends a label boundary before wins (char-longest == label-longest
    * when one table suffix ends another), `registered_domain` is that
    * suffix plus one more label. A host matching no suffix — or BEING a
    * bare suffix — reports NULL rather than inventing a domain. The
    * suffix table is the caller's (ship the real PSL as a dim at
    * production scale); it BROADCASTS, and the longest-match pick is a
    * per-row window keyed by row identity (duplicate host values each
    * survive — row-level enrichment never merges rows). */
  def registeredDomain(hosts: DataFrame, hostCol: String,
                       suffixes: DataFrame, sufCol: String): DataFrame = {
    val sfx = suffixes.select(lower(col(sufCol)).as("graft_sfx"),
      length(col(sufCol)).cast("long").as("graft_slen"))
    val w = Window.partitionBy("graft_rid")
      .orderBy(col("graft_slen").desc, col("graft_sfx").asc)
    hosts
      .withColumn("graft_rid", monotonically_increasing_id())
      .withColumn("graft_hl", lower(col(hostCol)))
      .join(broadcast(sfx),
        col("graft_hl") === col("graft_sfx") ||
          col("graft_hl").endsWith(concat(lit("."), col("graft_sfx"))),
        "left")
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .withColumn("public_suffix", col("graft_sfx"))
      .withColumn("registered_domain",
        when(col("graft_sfx").isNotNull &&
          col("graft_hl") =!= col("graft_sfx"),
          concat(element_at(split(expr(
            "substring(graft_hl, 1, length(graft_hl) - graft_slen - 1)"),
            "\\."), -1), lit("."), col("graft_sfx"))))
      .drop("graft_rid", "graft_hl", "graft_sfx", "graft_slen", "graft_rn")
  }

  /** The Unicode bidi control characters a "Trojan Source"-style
    * attack hides reordered text behind (embeddings U+202A–U+202E,
    * isolates U+2066–U+2069, marks U+200E/U+200F/U+061C) — regex char
    * class shared by [[bidiScrub]] and its oracle. */
  val BidiControls: String =
    "[\\u202A-\\u202E\\u2066-\\u2069\\u200E\\u200F\\u061C]"

  /** Bidi-control scrub — the code-corpus poisoning defense (Boucher &
    * Anderson, "Trojan Source", USENIX Sec '22): text that RENDERS one
    * way and tokenizes another rides these controls; a training corpus
    * wants them counted (the suspicion signal) and stripped. One
    * codegen'd regexp pass, zero shuffle. */
  def bidiScrub(docs: DataFrame, idCol: String,
                textCol: String): DataFrame =
    docs.select(col(idCol),
        regexp_count(col(textCol), lit(BidiControls)).cast("long")
          .as("n_bidi"),
        regexp_replace(col(textCol), BidiControls, "").as("scrubbed"))
      .withColumn("suspicious", col("n_bidi") > 0)

  /** Mixed-script profile — the homoglyph-spoofing signal (a Cyrillic
    * о inside a Latin word survives every exact matcher while reading
    * identically): per doc the Latin/Cyrillic/Greek letter counts and
    * the number of whitespace tokens mixing Latin with a confusable
    * script — the per-doc row a curation gate thresholds. Counts ride
    * `regexp_count` with Java script classes; the token check is one
    * bounded filter over the split — all codegen, zero shuffle. */
  def scriptProfile(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs.select(col(idCol),
        regexp_count(col(textCol), lit("\\p{IsLatin}")).cast("long")
          .as("n_latin"),
        regexp_count(col(textCol), lit("\\p{IsCyrillic}")).cast("long")
          .as("n_cyrillic"),
        regexp_count(col(textCol), lit("\\p{IsGreek}")).cast("long")
          .as("n_greek"),
        size(filter(split(col(textCol), "\\s+"),
          t => t.rlike("\\p{IsLatin}") &&
            t.rlike("[\\p{IsCyrillic}\\p{IsGreek}]"))).cast("long")
          .as("n_mixed_tokens"))
      .withColumn("suspicious", col("n_mixed_tokens") > 0)

  /** Host-level link graph — the edge list host-rank pipelines
    * (Common Crawl's harmonic-centrality ranking, OPIC frontiers) are
    * built from: every absolute outlink of every page becomes a
    * (src_host, dst_host) edge, rolled up to edge weight (link count)
    * and page support (distinct linking pages); intra-host self-loops
    * are dropped (host ranking ignores them by convention). Rides
    * [[anchorText]]'s bounded explode; the rollup is one
    * edge-keyed aggregate — |hosts|² bounded output, map-side
    * combinable. */
  def hostGraph(pages: DataFrame, idCol: String, hostCol: String,
                htmlCol: String): DataFrame = {
    val links = anchorText(pages, idCol, htmlCol)
      .join(pages.select(col(idCol), col(hostCol).as("src_host")),
        Seq(idCol))
    val dst = regexp_replace(regexp_replace(
      lower(regexp_extract(col("href"), "^[a-zA-Z]+://([^/?#]+)", 1)),
      "^.*@", ""), ":[0-9]+$", "")
    links
      .withColumn("dst_host", when(length(dst) > 0, dst))
      .filter(col("dst_host").isNotNull &&
        col("dst_host") =!= col("src_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).cast("long").as("n_links"),
        countDistinct(col(idCol)).cast("long").as("n_pages"))
  }
}
