package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens windows overlap correctly and cover every token") {
    // 10 tokens, chunkSize 4, stride 3 → starts 1,4,7,10.
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.chunkTokens(d, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    assert(got.forall(_._1 == 1L)) // empty doc yields no chunks
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L)) // tail chunk short
    assert(got.head._4 == "t1 t2 t3 t4")
    assert(got(1)._4 == "t4 t5 t6 t7") // stride 3 → one-token overlap
    assert(got.last._4 == "t10")
  }

  test("qualityGate keeps only docs at or above their group's quantile") {
    // Quality rises with text length (length saturation term); group g1's
    // p75 must exclude the shortest docs.
    val d = (1 to 8).map(i => (i.toLong, "word " * (i * 20), "g1"))
      .toDF("doc_id", "text", "source")
    val kept = Corpus.qualityGate(d, "doc_id", "text", "source", 0.75)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size < 8)
    assert(kept.forall(_ >= 5L)) // only the longest (highest-quality) docs
  }

  test("decontaminate drops train docs sharing shingles with the test set") {
    val d = Seq(
      (97L, "the secret held out evaluation passage stays here"), // test (97%97==0)
      (1L, "completely unrelated training text about other things entirely"),
      (2L, "contains the secret held out evaluation passage verbatim inside"),
      (3L, "more clean training material with no overlap at all present"))
      .toDF("doc_id", "text")
    val kept = Corpus.decontaminate(d, "doc_id", "text",
      pmod(col("doc_id"), lit(97)) === 0, n = 3)
      .as[Long].collect().toSet
    assert(kept === Set(1L, 3L)) // 2 contaminated, 97 is the test doc itself
  }

  test("packSequences assigns contiguous offsets per shard, straddle allowed") {
    // Shard A: docs with 1000/1500/600 tokens, capacity 2048:
    // offsets 0/1000/2500 → seqs 0/0/1 (doc 2 straddles 2048, starts in 0).
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val d = Seq((1L, words(1000), "A"), (2L, words(1500), "A"),
      (3L, words(600), "A"), (10L, words(100), "B"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.packSequences(d, "doc_id", "text", "source", 2048L)
      .select("shard", "doc_id", "tok_offset", "seq_id")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.map(r => (r._2, r._3, r._4)).toSeq ===
      Seq((1L, 0L, 0L), (2L, 1000L, 0L), (3L, 2500L, 1L), (10L, 0L, 0L)))
  }

  test("mixSample rates hold approximately and membership is content-stable") {
    val d = (1 to 400).map(i => (i.toLong, s"document body number $i", if (i % 2 == 0) "keepall" else "quarter"))
      .toDF("doc_id", "text", "source")
    val kept = Corpus.mixSample(d, "doc_id", "text", "source",
      rates = Map("keepall" -> 1.0), defaultRate = 0.25)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("keepall") === 200L) // rate 1.0 keeps everything
    val q = bySource.getOrElse("quarter", 0L).toDouble / 200.0
    assert(q > 0.1 && q < 0.45, s"quarter-rate kept fraction $q")
    // Content-determinism: same input → identical membership.
    val again = Corpus.mixSample(d.repartition(7), "doc_id", "text", "source",
      rates = Map("keepall" -> 1.0), defaultRate = 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept.select("doc_id").as[Long].collect().toSet)
  }

  test("mixUpsample repeats docs deterministically with the expected multiplicity") {
    val d = (1 to 300).map(i => (i.toLong, s"unique body $i", if (i % 2 == 0) "triple" else "half"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.mixUpsample(d, "doc_id", "text", "source",
      rates = Map("triple" -> 3.0), defaultRate = 0.5)
    val byDoc = out.groupBy("doc_id", "source").count()
      .as[(Long, String, Long)].collect()
    // Integer rate: exactly 3 copies each, with distinct copy indices.
    assert(byDoc.filter(_._2 == "triple").forall(_._3 == 3L))
    assert(out.filter($"source" === "triple")
      .select("copy_idx").distinct().as[Long].collect().toSet === Set(1L, 2L, 3L))
    // Fractional rate: 0 or 1 copies, roughly half the docs.
    val halfCount = byDoc.count(_._2 == "half")
    assert(byDoc.filter(_._2 == "half").forall(_._3 == 1L))
    assert(halfCount > 150 / 3 && halfCount < 150, s"kept $halfCount of 150")
  }

  test("lengthBatches buckets by token bin, chops by rank, reports padding exactly") {
    // Tokens per doc are the word count of "w " * k: ids 1..5 → 10 tokens,
    // ids 6..7 → 40 tokens. binTokens=32 → buckets 0 and 1; batchSize=3
    // chops the five 10-token docs into batches of 3 and 2.
    val docs = ((1 to 5).map(i => (i.toLong, ("w " * 10).trim)) ++
      (6 to 7).map(i => (i.toLong, ("w " * 40).trim))).toDF("doc_id", "text")
    val got = Corpus.lengthBatches(docs, "doc_id", "text",
      binTokens = 32, batchSize = 3)
      .select("bucket", "batch_in_bucket", "n_docs", "max_tokens",
        "sum_tokens", "pad_frac")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (0L, 0L, 3L, 10L, 30L, 0.0), // equal lengths: zero padding
      (0L, 1L, 2L, 10L, 20L, 0.0),
      (1L, 0L, 2L, 40L, 80L, 0.0)))
    // Mixed lengths in one bucket: padding = max·n − Σ over the batch.
    val mixed = Seq((1L, ("w " * 10).trim), (2L, ("w " * 20).trim))
      .toDF("doc_id", "text")
    val row = Corpus.lengthBatches(mixed, "doc_id", "text", 32, 16)
      .select("n_docs", "max_tokens", "sum_tokens", "pad_frac")
      .as[(Long, Long, Long, Double)].head()
    assert(row === ((2L, 20L, 30L, 0.25))) // (40 − 30) / 40
  }

  test("tokenBudgetCap keeps a hash-ordered prefix per source, exact boundary") {
    // Source s1: 3 docs of 4 tokens each, budget 8 → exactly 2 kept.
    // Source s2: first doc alone exceeds the budget → nothing kept.
    val docs = Seq(
      (1L, "s1", "one two three four"), (2L, "s1", "a b c d"),
      (3L, "s1", "w x y z"),
      (4L, "s2", "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "source", "text")
    val got = Corpus.tokenBudgetCap(docs, "doc_id", "text", "source", 8L)
      .select("doc_id", "source", "cum_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(got.count(_._2 == "s1") === 2)
    assert(got.forall(_._3 <= 8L))
    assert(!got.exists(_._2 == "s2"))
    // determinism: same input, repartitioned differently → same pick set
    val again = Corpus.tokenBudgetCap(docs.repartition(5), "doc_id", "text",
      "source", 8L).select("doc_id").as[Long].collect().toSeq.sorted
    assert(again === got.map(_._1).sorted)
  }

  test("centroidOutliers flags the planted off-cluster member first") {
    // Label 0: four near-identical vectors + one pointing the other way.
    val base = Array.fill(8)(1.0f)
    val outlier = Array.fill(8)(-1.0f)
    val rows = (1 to 4).map(i => (i.toLong, base.map(x => x + i * 0.001f), 0)) :+
      ((9L, outlier, 0))
    val d = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidOutliers(d, "vec_id", "embedding", "label", 2)
      .orderBy("rnk").select("vec_id").as[Long].collect()
    assert(got.head === 9L) // the planted outlier ranks first (lowest cos)
    assert(got.length === 2)
  }

  test("boilerplateStrip drops only the over-df segment, keeps content") {
    // Segment "nav bar home" (3 tokens) planted in 3 docs → df 3 > maxDf 2
    // → stripped; each doc's unique tail survives. Doc 4 has no chrome.
    val docs = Seq(
      (1L, "nav bar home alpha beta gamma"),
      (2L, "nav bar home delta eps zeta"),
      (3L, "nav bar home eta theta iota"),
      (4L, "kappa lambda mu")).toDF("doc_id", "text")
    val got = Corpus.boilerplateStrip(docs, "doc_id", "text",
      segTokens = 3, maxDf = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: 2 segments, 1 dropped, kept "alpha beta gamma" → 16 chars.
    assert(got(1L) === ((2L, 1L, 16L)))
    assert(got(2L) === ((2L, 1L, 14L))) // "delta eps zeta"
    assert(got(4L) === ((1L, 0L, 15L))) // "kappa lambda mu" untouched
  }

  test("boilerplateStrip reassembled length counts the joining spaces") {
    // Two kept 3-token segments → lengths 5+5 plus ONE joining space.
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = Corpus.boilerplateStrip(docs, "doc_id", "text", 3, 2)
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((1L, 2L, 0L, 11L)))
  }

  test("langFertility aggregates exact sums and one final division") {
    val docs = Seq(
      ("ab cd", "en"), ("abcd", "en"), ("a-b", "de")).toDF("text", "lang")
    val got = Corpus.langFertility(docs, "text", "lang")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // en: 3 tokens, 9 chars → 33.3333; de: 2 tokens, 3 chars → 66.6667.
    assert(got("en") === ((2L, 3L, 9L, 33.3333)))
    assert(got("de") === ((1L, 2L, 3L, 66.6667)))
  }

  test("temperatureMix flattens head sources and caps targets at availability") {
    // head: 10 docs × 16 tokens = 160; tail: 1 doc × 10 tokens.
    val docs = ((1 to 10).map(i => (s"${"w " * 16}", "head")) :+
      (("t " * 10), "tail")).toDF("text", "source")
    val out = Corpus.temperatureMix(docs, "text", "source",
      budgetTokens = 100L, alpha = 0.5)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val (h, t) = (out("head"), out("tail"))
    assert(h.getAs[Long]("n_tokens") === 160L)
    assert(t.getAs[Long]("n_tokens") === 10L)
    // sqrt weights: √160 ≈ 12.649, √10 ≈ 3.162 → micro units floored
    assert(h.getAs[Long]("weight_micro") === 12649110L)
    assert(t.getAs[Long]("weight_micro") === 3162277L)
    // α-allocation flattens: head gets 80.0%, not its 94.1% token share
    val wt = 12649110L + 3162277L
    assert(h.getAs[Long]("target_tokens") ===
      math.floor(100.0 * 12649110L / wt).toLong)
    assert(t.getAs[Long]("target_tokens") === 10L) // capped at availability
    assert(t.getAs[Long]("sample_rate_ppm") === 1000000L)
    assert(h.getAs[Long]("sample_rate_ppm") < 1000000L)
    // α = 1 reproduces proportional allocation (no flattening)
    val prop = Corpus.temperatureMix(docs, "text", "source",
      budgetTokens = 170L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("target_tokens")).toMap
    assert(prop("head") === 160L && prop("tail") === 10L)
  }

  test("temperatureMix pins the token-less source to rate 0 (no div-zero)") {
    val docs = Seq(("", "empty"), ("a b c", "full")).toDF("text", "source")
    val out = Corpus.temperatureMix(docs, "text", "source", 10L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("empty").getAs[Long]("sample_rate_ppm") === 0L)
    assert(out("empty").getAs[Long]("target_tokens") === 0L)
    assert(out("full").getAs[Long]("target_tokens") === 3L)
  }

  test("fluencyScore ranks corpus-atypical bigrams lowest") {
    // Three docs of common English-ish text plus one of rare-transition
    // noise: the noise doc's bigrams occur once each, so its ppm mean is
    // far below the repeated-text docs', and it ranks first (least fluent).
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "the cat sat on the mat and the dog sat too"),
      (3L, "the mat sat on the cat and the dog ran off"),
      (4L, "zq xv qj vx jz qx zj xq"))
      .toDF("doc_id", "text")
    val out = Corpus.fluencyScore(docs, "doc_id", "text", bottomK = 2).collect()
    assert(out(0).getAs[Long]("doc_id") === 4L)
    assert(out(0).getAs[Long]("fluency_ppm")
      < out(1).getAs[Long]("fluency_ppm"))
    // score is the floored mean of per-occurrence ppms: bounded by 10⁶
    assert(out.forall(_.getAs[Long]("fluency_ppm") <= 1000000L))
  }

  test("epochShardAssign is a pure function of (seed, id): partition-stable, seed-sensitive") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    def assign(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Corpus.epochShardAssign(df, "doc_id", seed, nShards = 8)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val a = assign(docs, seed = 1L)
    assert(a === assign(docs.repartition(13), seed = 1L),
      "assignment must not depend on partitioning")
    val b = assign(docs, seed = 2L)
    assert(a !== b, "a new seed must reshuffle")
    // every shard in range, all docs assigned, and roughly even (hash
    // balance: no shard further than 40% from the uniform share)
    assert(a.values.forall(s => s >= 0 && s < 8) && a.size === 2000)
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.size === 8 && sizes.forall(n => n > 150 && n < 350), sizes)
  }

  test("epochShardReport preserves totals across shards") {
    val docs = Seq.tabulate(300)(i => (i.toLong, s"w$i x y z")).toDF("doc_id", "text")
    val rep = Corpus.epochShardReport(docs, "doc_id", "text", seed = 3L, nShards = 4)
      .collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum === 300L)
    assert(rep.map(_.getAs[Long]("n_tokens")).sum === 1200L)
  }

  test("sourceCapSurvivors caps each source at k by seeded rank, not arrival order") {
    val docs = (1L to 100L).map(i => (i, "big")) ++ (101L to 105L).map(i => (i, "small"))
    val df = docs.toDF("doc_id", "source")
    val out = Corpus.sourceCapSurvivors(df, "doc_id", "source", seed = 5L, cap = 10)
      .as[(String, Long, Long)].collect()
    val bySrc = out.groupBy(_._1)
    assert(bySrc("big").length === 10 && bySrc("small").length === 5)
    assert(out.forall(_._3 <= 10L))
    // survivors are the hash-rank winners — identical under repartition
    val again = Corpus.sourceCapSurvivors(df.repartition(7), "doc_id", "source",
      seed = 5L, cap = 10).as[(String, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet === again.map(r => (r._1, r._2)).toSet)
    // a different seed elects a different committee for the big source
    val reseeded = Corpus.sourceCapSurvivors(df, "doc_id", "source", seed = 6L, cap = 10)
      .as[(String, Long, Long)].collect()
    assert(reseeded.map(r => (r._1, r._2)).toSet !== out.map(r => (r._1, r._2)).toSet)
  }

  test("releaseManifest checksum is order-independent and flips on any content change") {
    val docs = Seq((1L, "alpha beta", "s1"), (2L, "gamma delta", "s1"),
      (3L, "epsilon", "s2")).toDF("doc_id", "text", "source")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Corpus.releaseManifest(df, "text", "source")
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getAs[Long]("n_docs"), r.getAs[Long]("checksum48")))).toMap
    val base = sums(docs)
    assert(base === sums(docs.orderBy(desc("doc_id")).repartition(5)),
      "checksum must not depend on row order or partitioning")
    // flip one character in one doc: only that (source, split) cell moves
    val tweaked = sums(Seq((1L, "alpha betA", "s1"), (2L, "gamma delta", "s1"),
      (3L, "epsilon", "s2")).toDF("doc_id", "text", "source"))
    assert(tweaked.keySet.flatMap(k => base.get(k).map(v => k -> (v != tweaked(k))))
      .exists(_._2), "a changed document must change some checksum")
    assert(base.map(_._2._1).sum === 3L)
  }

  test("consistentSample: stable across re-partitioning, content-keyed membership") {
    val docs = (1L to 50L).map(i => (i, s"document body number $i", "s"))
      .toDF("doc_id", "text", "source")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Corpus.consistentSample(df, "doc_id", "text", k = 10,
        keep = Seq("source")).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
    val a = ids(docs)
    assert(a.size === 10 && a.distinct.size === 10)
    // membership is a pure function of content: any partitioning agrees
    assert(ids(docs.repartition(7)) === a)
    assert(ids(docs.orderBy(org.apache.spark.sql.functions.rand(42))) === a)
    // appending documents only DISPLACES members (never reshuffles the
    // survivors' relative order): the new sample is a subset of old
    // members + new arrivals
    val more = docs.unionByName((51L to 60L)
      .map(i => (i, s"fresh addition $i", "s")).toDF("doc_id", "text", "source"))
    val b = ids(more)
    assert(b.toSet.subsetOf(a.toSet ++ (51L to 60L)))
  }

  test("compressibility: repetitive text deflates far below varied text") {
    val docs = Seq(
      (1L, "spam spam spam " * 100),
      (2L, (1 to 300).map(i => s"w${i * 7919}").mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val got = Corpus.compressibility(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (raw1, _, ppm1) = got(1L)
    val (raw2, _, ppm2) = got(2L)
    assert(raw1 === 1500L && raw2 > 0L)
    // the repetitive doc compresses at least 4x harder than the varied one
    assert(ppm1 * 4 < ppm2, s"repetitive $ppm1 vs varied $ppm2")
    // empty doc: defined sentinel, no crash
    assert(got(3L) === ((0L, got(3L)._2, 1000000L)))
    // re-partitioning does not change any ratio (pure per-row function)
    val again = Corpus.compressibility(docs.repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again === got.view.mapValues(_._3).toMap)
  }

  test("contaminationReport: planted overlap grades exactly, clean docs absent") {
    import org.apache.spark.sql.functions._
    // test doc 0 holds the phrase; train doc 1 shares a 3-shingle window,
    // train doc 2 shares nothing
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma zeta eta theta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val got = Corpus.contaminationReport(docs, "doc_id", "text",
      isTest = col("doc_id") === 0L, n = 3, topK = 10).collect()
    assert(got.length === 1)
    val r = got(0)
    // doc 1 has 4 distinct shingles, 2 of which ("alpha beta gamma",
    // "beta gamma delta"? no — doc 1 lacks delta) -> only 1 overlap
    assert(r.getAs[Long]("doc_id") === 1L)
    assert(r.getAs[Long]("n_shingles") === 4L)
    assert(r.getAs[Long]("n_overlap") === 1L)
    assert(r.getAs[Long]("overlap_ppm") === 250000L)
  }

  test("stratifiedSplit: exact floor quotas per stratum") {
    // strata of 10 and 15 at 80% → exactly 8 and 12 train (independent
    // hashing would only approximate this)
    val docs = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 25).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val got = Corpus.stratifiedSplit(docs, "doc_id", "source", 7L, 80)
      .groupBy("source", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("a", "train") -> 8L, ("a", "heldout") -> 2L,
      ("b", "train") -> 12L, ("b", "heldout") -> 3L))
  }

  test("stratifiedSplit: assignment is a pure function of (seed, id)") {
    val docs = (1 to 40).map(i => (i.toLong, if (i % 3 == 0) "x" else "y"))
      .toDF("doc_id", "source")
    val a = Corpus.stratifiedSplit(docs, "doc_id", "source", 5L, 60)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Corpus.stratifiedSplit(docs.repartition(9), "doc_id", "source",
      5L, 60).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
    // a different seed reshuffles membership (overwhelmingly likely to
    // differ on 40 rows) while quotas hold exactly
    val c = Corpus.stratifiedSplit(docs, "doc_id", "source", 6L, 60)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(c.count(_._2 == "train") === a.count(_._2 == "train"))
    assert(c !== a)
  }

  test("curationRules: each planted violation trips exactly its rule") {
    val clean = "the quick brown fox and the lazy dog ran off to the barn in fog"
    val docs = Seq(
      ("w", clean),                                    // clean
      ("w", "tiny doc"),                               // short (+ stopword: 0 hits)
      ("w", "the of supercalifragilistic extraordinarily incomprehensible " +
        "antidisestablishmentarian verylongwordsareeverywhere " +
        "pneumonoultramicroscopic"),                   // word_len (mean > 12)
      ("w", clean + " # … ... # #"),                   // symbol (5 symbols, 14 words)
      ("w", "cats run fast dogs walk slow birds fly high very far"), // stopword
      ("w", "please accept our cookie policy " + clean), // boiler
      ("w", clean + " 111 222 333 444 555 666 777 888 999 000 111 222")) // digit
      .toDF("source", "text")
    val r = Corpus.curationRules(docs, "text", "source").collect()(0)
    assert(r.getAs[Long]("n_docs") === 7L)
    assert(r.getAs[Long]("fail_short") === 1L)
    assert(r.getAs[Long]("fail_word_len") === 1L)
    assert(r.getAs[Long]("fail_symbol") === 1L)
    // short doc (0 hits), no-stopword doc (0), and the word_len doc:
    // its only stopwords are ADJACENT ("the of"), and non-overlapping
    // matching consumes the shared delimiter, so it counts 1 hit — the
    // documented stopwordHits contract, same on both engines
    assert(r.getAs[Long]("fail_stopword") === 3L)
    assert(r.getAs[Long]("fail_boiler") === 1L)
    assert(r.getAs[Long]("fail_digit") === 1L)
    assert(r.getAs[Long]("n_clean") === 1L)
  }

  test("readabilityProfile: hand-computed FK grade and reading ease") {
    // "The cat sat. The dog ran." → W=6, sentences=2, vowel groups:
    // e/a/a/e/o/a = 6 → Y = max(6,6) = 6.
    // fk = 390·6//2 + 11800·6//6 − 15590 = 1170+11800−15590 = −2620
    // ease = 206835 − 1015·6//2 − 84600·6//6 = 206835−3045−84600 = 119190
    val docs = Seq(("s", "The cat sat. The dog ran.")).toDF("source", "text")
    val r = Corpus.readabilityProfile(docs, "text", "source").collect()(0)
    assert(r.getAs[Long]("n_docs") === 1L)
    assert(r.getAs[Long]("fk_grade_milli") === -2620L)
    assert(r.getAs[Long]("reading_ease_milli") === 119190L)
  }

  test("readabilityProfile: polysyllabic text grades harder; empties out") {
    val simple = "He is big. She is not. We go out. It is day."
    val dense = "Incomprehensible organizational bureaucratization " +
      "characterizes interdepartmental rationalization initiatives " +
      "notwithstanding considerable organizational heterogeneity."
    val docs = Seq(("a", simple), ("b", dense), ("b", ""))
      .toDF("source", "text")
    val got = Corpus.readabilityProfile(docs, "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("a").getAs[Long]("fk_grade_milli") <
      got("b").getAs[Long]("fk_grade_milli"))
    assert(got("a").getAs[Long]("reading_ease_milli") >
      got("b").getAs[Long]("reading_ease_milli"))
    // the empty doc is excluded from the mean and counted
    assert(got("b").getAs[Long]("n_empty") === 1L)
    assert(got("b").getAs[Long]("n_docs") === 2L)
  }

  test("encodingAudit: planted damage trips exactly its detector") {
    val docs = Seq(
      ("w", "Clean Text With 2 digits"),              // clean
      ("w", "binary\u0001spill"),                     // control char
      ("w", "decoder gave up � here"),           // replacement
      ("w", "the cafÃ© was nice"),                    // mojibake Ã©
      ("w", "a quote â€œlike thisâ€"),          // mojibake â€ family
      ("w", "tabs\tand\nnewlines are fine"))          // NOT control-flagged
      .toDF("source", "text")
    val r = Corpus.encodingAudit(docs, "text", "source").collect()(0)
    assert(r.getAs[Long]("n_docs") === 6L)
    assert(r.getAs[Long]("n_ctrl") === 1L)
    assert(r.getAs[Long]("n_replacement") === 1L)
    assert(r.getAs[Long]("n_mojibake") === 2L)
    assert(r.getAs[Long]("n_clean") === 2L)
  }

  test("encodingAudit: exact composition ppms, NULL on empty denominators") {
    // "AAbb12" per doc: 2 upper of 4 letters, 2 digits + 2 nonascii of
    // 8 chars → upper 500000, digit 250000, nonascii 250000.
    val docs = Seq(("s", "AAbb12éé"), ("s", "AAbb12éé")).toDF("source", "text")
    val r = Corpus.encodingAudit(docs, "text", "source").collect()(0)
    assert(r.getAs[Long]("upper_ppm") === 500000L)
    assert(r.getAs[Long]("digit_ppm") === 250000L)
    assert(r.getAs[Long]("nonascii_ppm") === 250000L)
    val empty = Seq(("s", "")).toDF("source", "text")
    val e = Corpus.encodingAudit(empty, "text", "source").collect()(0)
    assert(e.isNullAt(e.fieldIndex("upper_ppm")))
    assert(e.isNullAt(e.fieldIndex("digit_ppm")))
  }

  test("shardRebalanceReport: movement only TO the new shard, bounded") {
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Corpus.shardRebalanceReport(docs, "doc_id",
      nShards = 4, vnodes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    // every pre-existing shard appears; docs that move go ONLY to the
    // new shard (id 4) — the consistent-hashing property mod-N lacks
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(got.forall(r => r._4 == 4L || r._4 == -1L),
      s"moved elsewhere than the new shard: ${got.toSeq}")
    val (n, moved) = (got.map(_._2).sum, got.map(_._3).sum)
    assert(n === 400L)
    // ~1/5 expected; generous band for 8 vnodes of ring variance
    assert(moved > 0L && moved < 200L, s"moved $moved of $n")
    // deterministic under partitioning
    val re = Corpus.shardRebalanceReport(docs.repartition(7), "doc_id",
      nShards = 4, vnodes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(re === got.map(r => (r._1, r._2, r._3)).toSeq)
  }

  test("urlDomains normalizes hosts and folds registrable domains") {
    val docs = Seq(
      (1L, "see https://www.example.com/a and http://example.com/b."),
      (2L, "read https://sub.deep.bbc.co.uk/path?q=1) not ftp://nope.com/x"),
      (3L, "no urls here, not even a@b.com"),
      (4L, "http://user:pw@host.org:8080/x, then https://example.com"))
      .toDF("doc_id", "text")
    val got = Corpus.urlDomains(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      // www stripped as a subdomain, trailing '.'/',' stripped,
      // userinfo + port dropped; ftp/mailto invisible
      ("bbc.co.uk", 1L, 1L),
      ("example.com", 3L, 2L),
      ("host.org", 1L, 1L)))
  }

  test("collocations: planted pair tops by exact lift, support floor holds") {
    // "aa bb" always adjacent (lift high); "cc" and "dd" frequent but
    // never adjacent to each other; "ee ff" appears once (below
    // support).
    val docs = (Seq.fill(6)("aa bb cc xx dd") :+ "ee ff cc yy dd")
      .map(Tuple1(_)).toDF("text")
    val got = Corpus.collocations(docs, "text", minSupport = 2L,
      topK = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // N = 35 tokens, N2 = 28 bigram slots. "aa bb": nab=6, na=nb=6 →
    // lift = 6·35²·1e6 div (28·36) = 7291666 ppm.
    assert(got.head === ("aa", "bb", 6L, 7291666L))
    // every reported pair meets the support floor
    assert(got.forall(_._3 >= 2L))
    assert(!got.exists(p => p._1 == "ee" && p._2 == "ff"))
  }

  test("htmlExtract strips blocks with content, counts, decodes in order") {
    val docs = Seq(
      (1L, "<html><script>ignore me</script><style>x{}</style>" +
        "<p>Hello &amp;lt;world&gt;</p><a href=\"/a\">x</a>" +
        "<a href=\"/b\">y</a><img src=\"i.png\"/></html>"),
      (2L, "no markup at all"),
      (3L, "<p>&nbsp;spaced&nbsp;</p>"))
      .toDF("doc_id", "html")
    val got = Corpus.htmlExtract(docs, "doc_id", "html")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    // &amp;lt; decodes to the LITERAL "&lt;" (amp last, no double pass);
    // script/style text never leaks into the clean text
    assert(r1.getString(1) === "Hello &lt;world> x y")
    assert(r1.getLong(2) === 2L && r1.getLong(3) === 1L) // links, images
    assert(r1.getLong(4) > 5L) // generic tags counted
    val r2 = got(1)
    assert(r2.getString(1) === "no markup at all")
    assert(r2.getLong(2) === 0L && r2.getLong(4) === 0L)
    assert(r2.getLong(5) === 0L) // zero markup_ppm
    assert(got(2).getString(1) === "spaced")
  }

  test("surtKey: reversal, strip rules, bare path, non-URL NULL") {
    import spark.implicits._
    val got = Seq(
      "HTTP://WWW.Example.COM/A/B?X=1#frag",
      "https://u:p@Sub.Ex.ORG:8080/Path",
      "https://single.NET",
      "https://one-label/x",
      "plain text").toDF("u")
      .select(Corpus.surtKey(col("u"))).as[String].collect().toSeq
    assert(got === Seq(
      "com,example,www)/a/b?x=1",
      "org,ex,sub)/path",
      "net,single)/",
      "one-label)/x",
      null))
    // SURT's point: a domain's subdomains sort contiguously
    val keys = Seq("https://b.ex.com/", "https://a.ex.com/",
      "https://ex.com/", "https://ey.com/").map(u =>
      Seq(u).toDF("u").select(Corpus.surtKey(col("u")))
        .as[String].head())
    assert(keys.sorted === Seq("com,ex)/", "com,ex,a)/", "com,ex,b)/",
      "com,ey)/"))
  }

  test("metaRobots: case-insensitive list, default-open, none kills both") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<head><meta name=\"robots\" content=\" NoIndex , nofollow \"/></head>"),
      (2L, "<head><meta name=\"robots\" content=\"none\"/></head>"),
      (3L, "<head><meta name=\"keywords\" content=\"noindex\"/></head>"),
      (4L, "<head><meta name=\"robots\" content=\"noarchive\"/></head>"))
      .toDF("doc_id", "html")
    val got = Corpus.metaRobots(docs, "doc_id", "html")
      .as[(Long, String, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((Option(r._2), r._3, r._4))).toMap
    assert(got(1L) === ((Some(" NoIndex , nofollow "), false, false)))
    assert(got(2L) === ((Some("none"), false, false)))
    assert(got(3L) === ((None, true, true))) // keywords meta is not robots
    assert(got(4L) === ((Some("noarchive"), true, true)))
  }

  test("hostGraph: self-loops dropped, relative links invisible," +
    " weights vs page support") {
    import spark.implicits._
    val pages = Seq(
      (1L, "a.com", "<a href=\"https://b.com/x\">1</a>" +
        "<a href=\"https://b.com/y\">2</a>" +
        "<a href=\"https://A.COM/self\">s</a>" +
        "<a href=\"/rel\">r</a>"),
      (2L, "a.com", "<a href=\"https://b.com/z\">3</a>"))
      .toDF("doc_id", "host", "html")
    val got = Corpus.hostGraph(pages, "doc_id", "host", "html")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a.com", "b.com", 3L, 2L)))
  }

  test("registeredDomain: longest suffix wins, label boundaries," +
    " bare-suffix and no-match NULLs, duplicate hosts survive") {
    import spark.implicits._
    val sfx = Seq("uk", "co.uk", "com", "github.io", "io").toDF("s")
    val hosts = Seq("A.B.Example.CO.UK", "notco.uk", "xco.uk",
      "co.uk", "internal", "x.github.io", "A.B.Example.CO.UK")
      .toDF("host")
    val got = Corpus.registeredDomain(hosts, "host", sfx, "s")
      .select("host", "public_suffix", "registered_domain")
      .as[(String, String, String)].collect()
      .map(r => (r._1, Option(r._2), Option(r._3)))
    // duplicate host rows BOTH survive (row-level enrichment)
    assert(got.count(_._1 == "A.B.Example.CO.UK") === 2)
    val byHost = got.distinct.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byHost("A.B.Example.CO.UK") ===
      ((Some("co.uk"), Some("example.co.uk"))))
    // ".uk" boundary: notco.uk ends in ".uk" but NOT ".co.uk"
    assert(byHost("notco.uk") === ((Some("uk"), Some("notco.uk"))))
    assert(byHost("xco.uk") === ((Some("uk"), Some("xco.uk"))))
    assert(byHost("co.uk") === ((Some("co.uk"), None))) // bare suffix
    assert(byHost("internal") === ((None, None)))
    assert(byHost("x.github.io") ===
      ((Some("github.io"), Some("x.github.io"))))
  }

  test("unicode hygiene: NFC composes, bidi controls scrub, mixed" +
    " scripts flag") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // NFC: decomposed composes; already-NFC and ASCII pass through
    val nfc = Seq("Cafe\u0301", "caf\u00e9", "ascii")
      .toDF("t").select(graft.functions.TextFunctions.nfc(col("t")))
      .as[String].collect().toSeq
    assert(nfc === Seq("caf\u00e9".replace("c", "C"), "caf\u00e9",
      "ascii"))
    // bidi: all nine control classes counted and stripped
    val bid = Seq((1L,
      "a\u202a\u202b\u202c\u202d\u202eb\u2066\u2067\u2068\u2069" +
        "c\u200e\u200f\u061cd")).toDF("id", "t")
    val r = Corpus.bidiScrub(bid, "id", "t").collect()(0)
    assert(r.getAs[Long]("n_bidi") === 12L)
    assert(r.getAs[String]("scrubbed") === "abcd")
    assert(r.getAs[Boolean]("suspicious"))
    val clean = Corpus.bidiScrub(Seq((1L, "plain")).toDF("id", "t"),
      "id", "t").collect()(0)
    assert(clean.getAs[Long]("n_bidi") === 0L &&
      !clean.getAs[Boolean]("suspicious"))
    // mixed script: Cyrillic-inside-Latin token flags; pure-Cyrillic
    // token does NOT (it is consistent, not spoofed)
    val ms = Corpus.scriptProfile(Seq(
      (1L, "p\u0430y \u043f\u0440\u0438\u0432\u0435\u0442 ok"))
      .toDF("id", "t"), "id", "t").collect()(0)
    assert(ms.getAs[Long]("n_cyrillic") === 7L)
    assert(ms.getAs[Long]("n_mixed_tokens") === 1L) // only "p\u0430y"
  }
}
