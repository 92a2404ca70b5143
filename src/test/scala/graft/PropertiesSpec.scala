package graft

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.operators.{Charts, Dedup, Etl, Skew}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the invariants the oracle compare leans on:
  * native expressions must match their composable twins on arbitrary
  * input, and skew/dedup rewrites must be result-identical to the plain
  * plans. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic scalacheck sampling (scalatestplus isn't on the
    * offline classpath; explicit seeds are better for reproduction anyway). */
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val wordGen = Gen.oneOf("the", "fox", "a", "Über", "naïve", "x1",
    "", " ", "tab\there", "multi  space", "日本語", "mixedCASE")
  private val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("property: native shingles == composable chain on arbitrary text") {
    for (seed <- 1L to 8L) {
      val texts = sample(Gen.listOfN(30, textGen), seed)
      val df = texts.toDF("text")
      val got = df.select(
        T.wordShinglesNative($"text", 3).as("nat"),
        T.shinglesOf(T.tokens($"text"), 3).as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      got.foreach { case (nat, hof) => assert(nat.sorted == hof.sorted) }
    }
  }

  test("property: native minhash == composable crc32 chain on arbitrary unicode text") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val P = 2147483647L // the sketches' Mersenne prime 2^31 - 1
    val numHashes = 8
    val shs = T.wordShinglesNative($"text", 2)
    val nat = ColumnBridge.column(functions.MinHashSig(
      ColumnBridge.expression(shs), numHashes))
    // Composable twin: the same permutation family over Spark's built-in
    // crc32 — an independent evaluation path (catalyst builtins + HOFs)
    // for the identical math. Empty shingle sets map to -1 on both sides.
    val twin = transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(array_min(transform(shs, s =>
        (crc32(encode(s, "UTF-8")) % P * (i * 2 + 1) + lit(7919L) * (i + 1)) % P)),
        lit(-1L)))
    for (seed <- 1L to 8L) {
      val texts = sample(Gen.listOfN(25, textGen), seed)
      val got = texts.toDF("text")
        .select(nat.as("nat"), twin.as("twin"))
        .as[(Seq[Long], Seq[Long])].collect()
      got.foreach { case (n, t) => assert(n == t) }
    }
  }

  test("property: native md5 minhash == the interpreted HOF chain it replaced") {
    // The q82 oracle replays the HOF formulation in SQL — the native
    // expression must stay byte-identical to it on arbitrary unicode text.
    val numHashes = 6 // not a multiple of 4: exercises the tail digest
    val numDigests = (numHashes + 3) / 4
    val shs = T.wordShinglesNative($"text", 2)
    val hof = {
      val hs = transform(shs, g =>
        array((0 until numDigests).map(s => md5(concat(lit(s + ":"), g))): _*))
      array((0 until numHashes).map { i =>
        array_min(transform(hs, h =>
          substring(element_at(h, i / 4 + 1), 1 + 8 * (i % 4), 8)))
      }: _*)
    }
    for (seed <- 1L to 8L) {
      val texts = sample(Gen.listOfN(25, textGen), seed)
      val got = texts.toDF("text")
        .select(T.md5MinhashNative(shs, numHashes).as("nat"), hof.as("hof"))
        .as[(Seq[String], Seq[String])].collect()
      got.foreach { case (n, h) => assert(n == h) }
    }
  }

  test("property: native md5 simhash32 == the interpreted vote folds it replaced") {
    val shs = T.wordShinglesNative($"text", 2)
    val packExpr = transform(shs, g =>
      conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
    val hof = concat((0 until 32).map { j =>
      val vote = aggregate(packExpr, lit(0), (acc, v) =>
        acc + (shiftright(v, 31 - j).bitwiseAND(lit(1L)).cast("int") * 2 - 1))
      when(vote > 0, "1").otherwise("0")
    }: _*)
    for (seed <- 1L to 8L) {
      val texts = sample(Gen.listOfN(25, textGen), seed)
      val got = texts.toDF("text")
        .select(T.md5SimhashNative(shs).as("nat"), hof.as("hof"))
        .as[(String, String)].collect()
      got.foreach { case (n, h) => assert(n == h) }
    }
  }

  test("property: native simhash == scala reference model; both order-invariant") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // Independent reference model (FNV-1a bit votes) computed in plain
    // Scala over the collected shingles — pins the generated code to the
    // published algorithm on arbitrary unicode input.
    def fnvModel(s: String): Long = {
      var h = 0xcbf29ce484222325L
      for (b <- s.getBytes("UTF-8")) { h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    def simModel(shingles: Seq[String]): Long = {
      val votes = new Array[Int](64)
      for (sh <- shingles; i <- 0 until 64)
        if (((fnvModel(sh) >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
      (0 until 64).foldLeft(0L)((acc, i) =>
        if (votes(i) > 0) acc | (1L << i) else acc)
    }
    val shs = T.wordShinglesNative($"text", 2)
    def natOf(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(functions.SimHash64(ColumnBridge.expression(c)))
    for (seed <- 1L to 8L) {
      val texts = sample(Gen.listOfN(25, textGen), seed)
      val got = texts.toDF("text")
        .select(shs.as("shs"), natOf(shs).as("sig"), natOf(reverse(shs)).as("sigRev"))
        .as[(Seq[String], Long, Long)].collect()
      got.foreach { case (shingles, sig, sigRev) =>
        assert(sig == simModel(shingles)) // codegen == reference model
        assert(sig == sigRev)             // bit votes are order-invariant
      }
    }
  }

  test("property: minhash signatures are shingle-order-invariant") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val shs = T.wordShinglesNative($"text", 2)
    def natOf(c: org.apache.spark.sql.Column) =
      ColumnBridge.column(functions.MinHashSig(ColumnBridge.expression(c), 8))
    for (seed <- 1L to 4L) {
      val texts = sample(Gen.listOfN(25, textGen), seed)
      texts.toDF("text")
        .select(natOf(shs).as("a"), natOf(reverse(shs)).as("b"))
        .as[(Seq[Long], Seq[Long])].collect()
        .foreach { case (a, b) => assert(a == b) }
    }
  }

  test("property: native dot == interpreted fold on arbitrary vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1e3f, 1e3f))
    for (seed <- 1L to 8L) {
      val pairs = sample(Gen.listOfN(10, Gen.zip(vecGen, vecGen)), seed)
      val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      df.select(V.dot($"a", $"b").as("n"), V.dotHof($"a", $"b").as("h"))
        .as[(Double, Double)].collect()
        .foreach { case (n, h) => assert(n == h) }
    }
  }

  test("property: salted top-k per group == plain for random data") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(1L, 10000L),
      Gen.chooseNum(-1e6, 1e6))
    for (seed <- 1L to 4L) {
      val rows = sample(Gen.listOfN(300, rowGen), seed)
        .distinctBy(_._2) // unique ids for a total order
      val df = rows.map { case (g, id, v) => (s"g$g", id, v) }.toDF("g", "id", "v")
      val plain = Charts.topKPerGroup(df, "g", "v", "id", 3)
        .select("g", "id").as[(String, Long)].collect().toSet
      val salted = Skew.saltedTopKPerGroup(df, "g", "v", "id", 3, salts = 4)
        .select("g", "id").as[(String, Long)].collect().toSet
      assert(salted == plain)
    }
  }

  test("property: sessionize partitions events exactly (counts and bounds)") {
    val evGen = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 500000L))
    for (seed <- 1L to 4L) {
      val rows = sample(Gen.listOfN(200, evGen), seed)
        .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      val df = rows.toDF("user_id", "ts_us", "event_id")
      val sess = operators.Sessions.sessionize(df, "user_id", "ts_us",
        "event_id", gapUs = 50000L).collect()
      // Every event lands in exactly one session.
      assert(sess.map(_.getAs[Long]("n_events")).sum === rows.length)
      // Sessions of one user never overlap: sort by start, check gaps.
      sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
        val sorted = ss.sortBy(_.getAs[Long]("start_us"))
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > 50000L)
          case _ => ()
        }
      }
    }
  }

  test("property: connected components are label-consistent and idempotent") {
    val edgeGen = Gen.zip(Gen.chooseNum(1L, 40L), Gen.chooseNum(1L, 40L))
      .suchThat { case (a, b) => a != b }
    for (seed <- 1L to 4L) {
      val edges = sample(Gen.listOfN(30, edgeGen), seed)
      val df = edges.toDF("id1", "id2")
      val labels = operators.Components.connected(df, "id1", "id2")
        .as[(Long, Long)].collect().toMap
      // Every edge's endpoints share a label (the defining invariant).
      edges.foreach { case (a, b) => assert(labels(a) === labels(b)) }
      // Each label is its component's minimum member id.
      labels.groupBy(_._2).foreach { case (root, members) =>
        assert(members.keys.min === root)
      }
    }
  }

  test("property: results are invariant under input repartitioning") {
    // The determinism contract behind the oracle compare: physical layout
    // (partition count/assignment) must never leak into results.
    val rowGen = Gen.zip(Gen.chooseNum(1L, 300L), Gen.chooseNum(0, 20),
      Gen.chooseNum(-1e3, 1e3))
    for (seed <- 1L to 3L) {
      val rows = sample(Gen.listOfN(400, rowGen), seed).distinctBy(_._1)
      val base = rows.map { case (id, g, v) => (id, s"g$g", v) }
        .toDF("id", "g", "v")
      for (parts <- Seq(1, 7)) {
        val df = base.repartition(parts)
        assert(Charts.topK(df, "v", "id", 10).select("id").as[Long].collect().toSeq
          === Charts.topK(base, "v", "id", 10).select("id").as[Long].collect().toSeq)
        assert(Charts.topKPerGroup(df, "g", "v", "id", 3)
          .select("g", "id").as[(String, Long)].collect().toSet
          === Charts.topKPerGroup(base, "g", "v", "id", 3)
            .select("g", "id").as[(String, Long)].collect().toSet)
      }
      val docs = rows.map { case (id, g, _) => (id, s"doc text $g common words") }
        .toDF("doc_id", "text")
      val exact1 = Dedup.exact(docs.repartition(1), "doc_id", "text")
        .as[(Long, String)].collect().toSet
      val exact7 = Dedup.exact(docs.repartition(7), "doc_id", "text")
        .as[(Long, String)].collect().toSet
      assert(exact1 === exact7)
    }
  }

  test("property: chunking tiles every token; packing offsets are prefix sums") {
    val docGen = Gen.chooseNum(0, 40)
    for (seed <- 1L to 4L) {
      val sizes = sample(Gen.listOfN(25, docGen), seed)
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(t => s"w$t").mkString(" "), s"s${i % 3}")
      }.toDF("doc_id", "text", "source")
      val chunkSize = 8; val stride = 5
      val chunks = operators.Corpus.chunkTokens(docs, "doc_id", "text",
        chunkSize, stride).collect()
      val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
      sizes.zipWithIndex.foreach { case (n, i) =>
        val cs = byDoc.getOrElse(i.toLong, Array.empty)
        if (n == 0) assert(cs.isEmpty)
        else {
          // starts tile the token range at `stride`: chunk count is exact
          // and the tokens covered are precisely [1, n].
          assert(cs.length === (n + stride - 1) / stride)
          assert(cs.map(_.getAs[Long]("chunk_tokens")).sum >=  n,
            "every token appears in at least one chunk")
          val firsts = cs.sortBy(_.getAs[Long]("chunk_idx"))
            .map(_.getAs[String]("chunk_text").split(" ").head)
          assert(firsts.toSeq === (1 to n by stride).map(t => s"w$t"))
        }
      }
      val packed = operators.Corpus.packSequences(docs, "doc_id", "text",
        "source", capacity = 16L).collect()
      packed.groupBy(_.getAs[String]("shard")).foreach { case (_, rows) =>
        val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
        var expect = 0L
        ordered.foreach { r =>
          assert(r.getAs[Long]("tok_offset") === expect)
          assert(r.getAs[Long]("seq_id") === expect / 16L)
          expect += r.getAs[Long]("n_tokens")
        }
      }
    }
  }

  test("property: upsert is idempotent and key-unique") {
    val rowGen = Gen.zip(Gen.chooseNum(1L, 50L), Gen.alphaStr.map(_.take(5)))
    for (seed <- 1L to 4L) {
      val t = sample(Gen.listOfN(40, rowGen), seed)
      val s0 = sample(Gen.listOfN(40, rowGen), seed + 100)
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s0.toDF("k", "v").dropDuplicates("k")
      val once = Etl.upsert(target, source, "k")
      val twice = Etl.upsert(once, source, "k")
      val onceSet = once.as[(Long, String)].collect().toSet
      assert(twice.as[(Long, String)].collect().toSet == onceSet)
      assert(once.select("k").distinct().count() == once.count())
    }
  }

  test("property: semanticDedup conserves rows and never drops a cell's min id") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-100, 100).map(_ / 100.0f))
    for (seed <- 1L to 4L) {
      val vecs = sample(Gen.listOfN(60, vecGen), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        // zero-norm vectors are the caller's hygiene problem (q107 screens
        // them); the property holds on the screened corpus
        .filter { case (_, v) => v.exists(_ != 0f) }
      val df = vecs.toDF("vec_id", "embedding")
      val out = Dedup.semanticDedup(df, "vec_id", "embedding", 3, 0.8)
        .collect()
      // partition: every input row is counted exactly once, dropped+kept
      assert(out.map(_.getAs[Long]("n_total")).sum === vecs.length.toLong)
      out.foreach { r =>
        assert(r.getAs[Long]("n_total") ===
          r.getAs[Long]("n_dropped") + r.getAs[Long]("n_kept"))
        // greedy lowest-id-wins can never empty a cell
        assert(r.getAs[Long]("n_kept") >= 1L)
      }
    }
  }

  test("property: passageDuplication bounds and self-repeat exclusion") {
    val wordGen2 = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa")
    val docGen = Gen.listOfN(20, wordGen2).map(_.mkString(" "))
    for (seed <- 1L to 4L) {
      val docs = sample(Gen.listOfN(20, docGen), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = operators.Dedup.passageDuplication(
        docs.toDF("doc_id", "text"), "doc_id", "text", 8, 4).collect()
      // 20 tokens, w=8, stride 4 → windows at 1,5,9,13 = 4 per doc
      assert(out.forall(_.getAs[Long]("n_windows") === 4L))
      out.foreach { r =>
        val dup = r.getAs[Long]("n_dup_windows")
        assert(dup >= 0L && dup <= r.getAs[Long]("n_windows"))
        val frac = r.getAs[Double]("dup_frac")
        assert(frac >= 0.0 && frac <= 1.0)
      }
    }
  }

  test("property: bpeEncode token counts shrink monotonically, never below one per word") {
    val wordGen3 = Gen.oneOf("aaab", "ab", "aab", "bb", "abab", "a")
    val docGen = Gen.listOfN(8, wordGen3).map(_.mkString(" "))
    for (seed <- 1L to 3L) {
      val docs = sample(Gen.listOfN(10, docGen), seed)
        .map(t => ("s", t)).toDF("source", "text")
      val r = operators.Vocab.bpeEncode(docs, "text", "source", merges = 3)
        .collect()(0)
      val chars = r.getAs[Long]("tokens_chars")
      val bpe = r.getAs[Long]("tokens_bpe")
      val words = r.getAs[Long]("n_words")
      assert(bpe <= chars)     // a merge can only shrink
      assert(bpe >= words)     // and never below one symbol per word
      assert(r.getAs[Long]("saved_ppm") === (chars - bpe) * 1000000L / chars)
    }
  }

  test("property: prefix-filter join == brute-force join on random corpora") {
    // The losslessness claim under scalacheck fire: random word soup with
    // injected shared phrases, across thresholds.
    val phrase = "alpha beta gamma delta epsilon zeta"
    val soup = Gen.listOfN(10, Gen.oneOf("red", "blue", "sun", "moon",
      "tree", "rock", "fish", "bird")).map(_.mkString(" "))
    for (seed <- 1L to 4L; t <- Seq(0.3, 0.6)) {
      val texts = sample(Gen.listOfN(14, soup), seed)
        .zipWithIndex.map { case (s, i) =>
          (i.toLong, if (i % 3 == 0) s + " " + phrase else s) }
      val df = texts.toDF("doc_id", "text")
      val brute = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, t)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.prefixJaccardPairs(df, "doc_id", "text", 2, t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref === brute, s"seed=$seed t=$t")
    }
  }

  test("property: dupSpans emits disjoint in-bounds spans of length >= k") {
    val soup = Gen.listOfN(15, Gen.oneOf("aa", "bb", "cc", "dd", "ee",
      "ff", "gg")).map(_.mkString(" "))
    for (seed <- 1L to 4L) {
      val texts = sample(Gen.listOfN(12, soup), seed)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = texts.toDF("doc_id", "text")
      val k = 3
      val spans = Dedup.dupSpans(df, "doc_id", "text", k)
        .as[(Long, Long, Long)].collect().toSeq
      val nTok = texts.map { case (i, s) =>
        i -> s.split("\\s+").count(_.nonEmpty).toLong }.toMap
      spans.foreach { case (id, s, l) =>
        assert(l >= k, s"span shorter than k: ($id, $s, $l)")
        assert(s >= 0 && s + l <= nTok(id), s"span out of bounds: ($id, $s, $l)")
      }
      // disjoint and non-adjacent per doc (adjacent runs must have merged)
      spans.groupBy(_._1).values.foreach { g =>
        val sorted = g.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq((_, s1, l1), (_, s2, _)) =>
            assert(s2 > s1 + l1, s"overlapping/adjacent spans: $sorted")
          case _ =>
        }
      }
    }
  }

  test("property: BPE token count bounded by codepoints and empty-merge identity") {
    for (seed <- 10L to 14L) {
      val texts = sample(Gen.listOfN(20, textGen), seed)
      val df = texts.toDF("text")
      val got = df.select(
        graft.operators.Vocab.bpeTokenCount($"text",
          graft.operators.Vocab.DisjointMerges).as("n"),
        graft.operators.Vocab.bpeTokenCount($"text", Seq.empty).as("n0"),
        length(regexp_replace(lower(trim($"text")), "\\s+", "")).as("chars"))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (n, n0, chars) =>
        // empty merge table: one token per codepoint (chars counts UTF-16
        // units, so it upper-bounds the codepoint count)
        assert(n0 <= chars)
        assert(n <= n0) // merging never grows the token count
        assert(n >= n0 / 2) // each merge halves at most
      }
    }
  }
}
