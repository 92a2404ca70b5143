package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: a 100 TB pipeline's operators see empty
  * partitions, empty sources, and single-row groups constantly — none may
  * throw, and shapes must stay stable. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val noEvents = Seq.empty[(Long, Long, Long)]
    .toDF("user_id", "ts_us", "event_id")
  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("sessionize/rollingAvg/rangeJoin on empty input → empty, same schema") {
    val s = Sessions.sessionize(noEvents, "user_id", "ts_us", "event_id", 1000L)
    assert(s.count() === 0)
    assert(s.columns.toSeq ===
      Seq("user_id", "session_idx", "n_events", "start_us", "end_us", "duration_us"))
    val r = Sessions.rollingAvg(
      noEvents.withColumn("value", lit(0.0)), "user_id", "ts_us", "event_id",
      "value", 1000L)
    assert(r.count() === 0)
    assert(Sessions.rangeJoinPairCounts(noEvents, "user_id", "ts_us",
      "event_id", 1000L).count() === 0)
  }

  test("dedup family on empty corpus → empty pair sets") {
    assert(Dedup.exact(noDocs, "doc_id", "text").count() === 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 0.1).count() === 0)
    assert(Dedup.minhashPairs(noDocs, "doc_id", "text", 3, 4, 2, 0.1).count() === 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text", 3, 16).count() === 0)
    assert(Dedup.minhashPairsPortable(noDocs, "doc_id", "text", 3, 8, 2, 0.5)
      .count() === 0)
    assert(Dedup.simhashPairsPortable(noDocs, "doc_id", "text", 3, 6)
      .count() === 0)
  }

  test("portable LSH on single and too-short docs → no pairs, no throw") {
    val d = Seq((1L, "only two words"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    assert(Dedup.minhashPairsPortable(d, "doc_id", "text", 3, 8, 2, 0.5)
      .count() === 0)
    assert(Dedup.simhashPairsPortable(d, "doc_id", "text", 3, 6).count() === 0)
  }

  test("writeZorderLayout on empty input writes an empty layout, no NPE") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zempty").toString
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    Etl.writeZorderLayout(empty, s"$dir/t", nFiles = 4, "x", "y")
    assert(spark.read.parquet(s"$dir/t").count() === 0)
  }

  test("round-5 analytics on empty and degenerate inputs") {
    val noVals = Seq.empty[(String, Long, Double)].toDF("g", "id", "v")
    assert(Analytics.madOutliers(noVals, "g", "id", "v", 3.0).count() === 0)
    assert(Analytics.winsorizedStats(noVals, "g", "v", 0.05, 0.95).count() === 0)
    assert(Analytics.labelBalance(noVals.select("g"), "g").count() === 0)
    // constant column: corr denominator 0 → NaN row, not a throw
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    val m = Analytics.corrMatrix(const, Seq("a", "b")).collect()
    assert(m.length === 1 && m.head.getDouble(2).isNaN)
    val noTs = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(Sessions.transitionCounts(noTs, "user_id", "ts", "event_id",
      "event_type").count() === 0)
    assert(Analytics.cohortRetention(noTs, "user_id", "ts").count() === 0)
  }

  test("connected components on empty edges → empty labels") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Components.connected(noPairs, "id1", "id2").count() === 0)
  }

  test("analytics on empty and single-row inputs") {
    val noSales = Seq.empty[(String, String, Double)].toDF("d1", "d2", "v")
    // Spark emits NO rows for rollup over empty input (not even the
    // grand-total grouping set) — document it so a change gets noticed.
    assert(Analytics.rollup2(noSales, "d1", "d2", "v").count() === 0)
    assert(Analytics.topTerms(noDocs, "text", 5).count() === 0)
    assert(Analytics.repetitionProfile(noDocs, "doc_id", "text").count() === 0)
    val one = Seq(("g", 5)).toDF("grp", "m")
    val q = Analytics.quartiles(one, "grp", "m").collect()(0)
    assert(q.getAs[Double]("p25") === 5.0 && q.getAs[Double]("p75") === 5.0)
  }

  test("corpus-prep family on empty and degenerate inputs") {
    assert(Corpus.chunkTokens(noDocs, "doc_id", "text", 64, 48).count() === 0)
    assert(Corpus.packSequences(noDocs.withColumn("source", lit("s")),
      "doc_id", "text", "source", 2048L).count() === 0)
    // No test docs → nothing is contaminated, every train doc survives.
    val docs = Seq((1L, "some text here"), (2L, "other text there")).toDF("doc_id", "text")
    assert(Corpus.decontaminate(docs, "doc_id", "text", lit(false), 3)
      .as[Long].collect().toSet === Set(1L, 2L))
    // Everything-is-test → empty training output.
    assert(Corpus.decontaminate(docs, "doc_id", "text", lit(true), 3).count() === 0)
    // Single doc per group: threshold = its own quality → it survives.
    val one = Seq((1L, "a reasonable document with several words", "g")).toDF("doc_id", "text", "source")
    assert(Corpus.qualityGate(one, "doc_id", "text", "source", 0.75).count() === 1)
    // Single member per label: cosine to its own (scaled) centroid ≈ 1.
    val singleton = Seq((1L, Array(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(singleton, "vec_id", "embedding", "label", 3).collect()
    assert(out.length === 1 && out(0).getAs[Double]("cos") > 0.999)
  }

  test("round-6 curation ops on empty and degenerate inputs") {
    // dimStats: empty corpus → no rows; single vector → zero variance
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Analytics.dimStats(noVecs, "embedding").count() === 0)
    val one = Seq((1L, Array(0.5f, -0.5f))).toDF("vec_id", "embedding")
    val oneStats = Analytics.dimStats(one, "embedding")
      .select("n", "var_micro").as[(Long, Long)].collect().toSeq
    assert(oneStats === Seq((1L, 0L), (1L, 0L)))
    // sourceOverlap: single source → no pairs; empty docs → no rows
    val oneSrc = Seq(("a", "x y z")).toDF("source", "text")
    assert(Analytics.sourceOverlap(oneSrc, "source", "text").count() === 0)
    val noSrcDocs = Seq.empty[(String, String)].toDF("source", "text")
    assert(Analytics.sourceOverlap(noSrcDocs, "source", "text").count() === 0)
    // tokenBudgetCap: empty input → empty result with a stable schema
    val empty = Corpus.tokenBudgetCap(
      Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", 10L)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq ===
      Seq("doc_id", "source", "n_tokens", "cum_tokens"))
    // keySkewReport: uniform single-occurrence keys → ratio exactly 1.0
    val uni = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val rep = Skew.keySkewReport(uni, Seq("k"))
      .select("n_rows", "n_keys", "max_cnt", "skew_ratio")
      .as[(Long, Long, Long, Double)].head()
    assert(rep === ((3L, 3L, 1L, 1.0)))
  }

  test("docs with empty/whitespace text flow through text metrics") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val rep = Analytics.repetitionProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rep.length === 3)
    assert(rep(0).getAs[Long]("n_tokens") === 0L)
    assert(rep(0).getAs[Double]("top_share") === 0.0)
    assert(rep(2).getAs[Long]("n_tokens") === 1L)
    assert(Dedup.pairShingleStats(docs, "doc_id", "text", 3).count() === 0)
  }

  test("round-8 operators on empty/degenerate input → empty, no throw") {
    val noEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Dedup.semanticDedup(noEmb, "vec_id", "embedding", 4, 0.9)
      .count() === 0)
    assert(Similarity.hardNegatives(noEmb, "vec_id", "embedding", "label",
      4, 2).count() === 0)
    // all docs shorter than the window → zero windows, zero rows
    val short = Seq((1L, "just three words"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.passageDuplication(short, "doc_id", "text", 8, 4)
      .count() === 0)
    assert(Dedup.passageDuplication(noDocs, "doc_id", "text", 8, 4)
      .count() === 0)
    assert(Corpus.fluencyScore(noDocs, "doc_id", "text", 20).count() === 0)
    assert(Analytics.kAnonymityRisk(noDocs, Seq(col("text")), Seq("t"), 3L)
      .count() === 0)
  }

  test("bpeMerges on a pairless corpus learns nothing and does not throw") {
    // single-char words only → no adjacent symbol pairs → zero merges
    val docs = Seq("a b c", "a a b").toDF("text")
    assert(Vocab.bpeMerges(docs, "text", merges = 2).count() === 0)
    assert(Vocab.bpeMerges(noDocs.select("text"), "text", 2).count() === 0)
  }

  test("round-9 eval/experiment operators on empty input: stable, no throw") {
    val noScored = Seq.empty[(Long, Long)].toDF("s", "y")
    // AUC over nothing: one row, zero counts, NULL metrics
    val auc = graft.ml.Eval.rocAuc(noScored, "s", "y").collect()
    assert(auc.length === 1)
    assert(auc(0).getAs[Long]("n_pos") === 0L)
    assert(auc(0).isNullAt(auc(0).fieldIndex("auc_ppm")))
    assert(graft.ml.Eval.calibration(noScored, "s", "y", 10, 100L)
      .count() === 0L)
    // sweep over nothing: the per-score table is empty, so the threshold
    // cross join yields no rows (thresholds exist only against data)
    assert(graft.ml.Eval.thresholdSweep(noScored, "s", "y", Seq(5L))
      .count() === 0L)
    // CUPED over no events: a cross join of empty arms → zero rows
    val noVals = Seq.empty[(Long, String, Double, Long)]
      .toDF("user_id", "event_type", "value", "ts_us")
    assert(Experiment.cuped(noVals, "user_id", "event_type", "value",
      "ts_us", "purchase", 0L).count() === 0L)
  }

  test("round-9 session/analytics operators on empty input") {
    val noTyped = Seq.empty[(Long, Long, Long, String)]
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val lt = Sessions.lastTouchAttribution(noTyped, "user_id", "ts_us",
      "event_id", "event_type", "view", "purchase", 1000L).collect()
    assert(lt.length === 1 && lt(0).getAs[Long]("n_conversions") === 0L)
    assert(Sessions.linearAttribution(noTyped, "user_id", "ts_us",
      "event_id", "event_type", "view", "purchase", 1000L).count() === 0L)
    val noVal = Seq.empty[(Long, Long, Double)].toDF("user_id", "ts_us", "value")
    assert(Analytics.rfmSegments(noVal, "user_id", "ts_us", "value",
      refTsUs = 0L).count() === 0L)
    assert(Analytics.trendSlope(noTyped, "event_type", "ts_us").count() === 0L)
    assert(Analytics.heavyHitters(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", 5)
      .count() === 0L)
  }

  test("round-9 search/corpus operators on empty input") {
    val noDocs2 = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Search.phraseSearch(noDocs2, "doc_id", "text", Seq("a", "b"))
      .count() === 0L)
    assert(Search.relatedTerms(noDocs2, "doc_id", "text", "seed", 1L, 5)
      .count() === 0L)
    assert(Corpus.consistentSample(noDocs2, "doc_id", "text", 5, Nil)
      .count() === 0L)
    assert(Corpus.compressibility(noDocs2, "doc_id", "text").count() === 0L)
    // hybrid retrieval with both legs empty: no rows, no throw
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Search.hybridRrf(noDocs2, noEmb, "doc_id", "text", "vec_id",
      "embedding", Seq("q"), 0L, 5, 5).count() === 0L)
  }

  test("fixEncoding corruption grid: repair, refuse, pass through") {
    import graft.functions.FixEncoding
    import org.apache.spark.unsafe.types.UTF8String
    def fix(s: String): String =
      FixEncoding.repair(UTF8String.fromString(s)).toString
    def corrupt(s: String): String =
      new String(s.getBytes("UTF-8"), "windows-1252")
    // the classic double-encode round-trips back, incl. cp1252 specials
    Seq("café", "naïve – déjà", "“smart quotes‘’", "€99 ™", "Œuvre žŠ")
      .foreach { clean =>
        assert(fix(corrupt(clean)) == clean, s"repair of <$clean>") }
    // ISO-8859-1 mis-decode (C1 controls instead of cp1252 specials)
    val viaLatin1 = new String("– “x".getBytes("UTF-8"), "ISO-8859-1")
    assert(fix(viaLatin1) == "– “x")
    // pure ASCII and genuine Latin-1-looking text are untouched
    assert(fix("plain ascii") == "plain ascii")
    assert(fix("café") == "café") // 0xE9 alone is not valid UTF-8
    assert(fix("price £5 café") == "price £5 café")
    // stray continuation byte: flagged shape, but refuses
    assert(fix("x Ã© ¿") == "x Ã© ¿")
    // chars outside cp1252's image (CJK, emoji surrogates): untouched
    assert(fix("中文 text") == "中文 text")
    assert(fix("emoji 😀") == "emoji 😀")
    // U+FFFD (the destroyed-byte marker) refuses to map
    assert(fix("a�b") == "a�b")
    // double-double encoding repairs one layer per application
    val twice = corrupt(corrupt("café"))
    assert(fix(fix(twice)) == "café")
    // empty string
    assert(fix("") == "")
    // the expression survives codegen inside a real plan
    val df = Seq((1L, corrupt("café")), (2L, "ok"), (3L, null))
      .toDF("id", "t")
      .select(col("id"),
        graft.functions.TextFunctions.fixEncoding(col("t")).as("f"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "café" && got(2L) == "ok" && got(3L) == null)
  }
}
