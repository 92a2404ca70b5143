package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi encode vs brute-force enumeration,
  * trainer hybrid equality (distributed == driver-local), prune/char
  * guarantees, degradation. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Unigram
  import org.apache.spark.unsafe.types.UTF8String

  private def enc(s: String, pieces: Seq[(String, Double)]): Seq[String] = {
    val arr = Unigram.encode(UTF8String.fromString(s),
      Unigram.pieceTable(pieces))
    (0 until arr.numElements()).map(i =>
      arr.getUTF8String(i).toString)
  }

  /** Brute-force best segmentation log-prob over ALL segmentations. */
  private def bruteBest(w: String, pieces: Map[String, Double]): Double = {
    if (w.isEmpty) return 0.0
    var best = Double.NegativeInfinity
    for (len <- 1 to w.length) {
      val head = w.substring(0, len)
      val lp = pieces.get(head) match {
        case Some(v) => v
        case None if len == 1 => Unigram.UnkLogProb
        case None => Double.NegativeInfinity
      }
      if (lp != Double.NegativeInfinity) {
        val rest = bruteBest(w.substring(len), pieces)
        if (lp + rest > best) best = lp + rest
      }
    }
    best
  }

  private val table = Seq(
    "a" -> math.log(0.05), "b" -> math.log(0.05), "c" -> math.log(0.05),
    "ab" -> math.log(0.2), "bc" -> math.log(0.15), "abc" -> math.log(0.3))

  test("viterbi matches brute-force optimum on every small word") {
    val pieces = table.toMap
    for (w <- Seq("abc", "abcabc", "ababab", "cab", "aabbcc", "cba",
      "abcbcab", "a", "bb")) {
      val got = enc(w, table)
      val score = got.map(t =>
        pieces.getOrElse(t, Unigram.UnkLogProb)).sum
      assert(math.abs(score - bruteBest(w, pieces)) < 1e-9,
        s"word $w: got $got")
      assert(got.mkString("") == w, s"tokens must concat back to $w")
    }
    // abc as one piece beats ab+c and a+bc
    assert(enc("abc", table) == Seq("abc"))
  }

  test("unknown chars fall back to single UNK tokens, never derail") {
    assert(enc("axb", table) == Seq("a", "x", "b"))
    assert(enc("xyz", table) == Seq("x", "y", "z"))
    // normalization: uppercase + whitespace runs
    assert(enc(" AB  c ", table) == Seq("ab", "c"))
    assert(enc("", table).isEmpty)
  }

  test("codegen plan: expression encodes inside a real projection") {
    val df = Seq((1L, "ABC abc"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), UnigramLm.unigramTokens(col("t"), table).as("toks"))
    val got = df.collect().map(r => r.getLong(0) ->
      Option(r.getSeq[String](1))).toMap
    assert(got(1L).get == Seq("abc", "abc"))
    assert(got(2L).isEmpty)
  }

  test("disjoint piece table: count closed form = chars - occurrences") {
    val texts = Seq("the quick thounderes", "an ant than", "no pieces here!")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"),
        UnigramLm.unigramTokenCount(col("t"), UnigramLm.DisjointPieces)
          .as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expected(t: String): Long = {
      val s = t.toLowerCase.trim
      val nospace = s.replaceAll("\\s+", "")
      val occ = Seq("th", "an", "ou", "es").map { p =>
        (nospace.length - nospace.replace(p, "").length) / p.length
      }.sum
      nospace.length - occ
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"text <$t>") }
  }

  private val fixture = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cats eat the rats"),
    (3L, "that hat is the best hat"),
    (4L, "rats and cats and bats"),
    (5L, "the the the mat mat")).toDF("doc_id", "text")

  test("trainer: hybrid paths produce identical fits, deterministically") {
    val target = 30
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("piece").collect().map(r =>
        (r.getString(0), r.getBoolean(1), r.getLong(2), r.getLong(3))).toSeq
    val dist = run(UnigramLm.unigramDistributed(fixture, "text", target,
      emIters = 2, seedFactor = 4, maxLen = UnigramLm.MaxPieceLen))
    val local = run(UnigramLm.unigramLocal(fixture, "text", target,
      emIters = 2, seedFactor = 4, maxLen = UnigramLm.MaxPieceLen,
      maxVocabRows = 100000))
    assert(dist == local) // the hybrid seam: bit-identical fits
    val again = run(UnigramLm.unigramDistributed(fixture, "text", target,
      emIters = 2, seedFactor = 4, maxLen = UnigramLm.MaxPieceLen))
    assert(dist == again) // run-to-run determinism (quantized EM)
    val chars = dist.count(_._2)
    // a tiny fixture may not SUPPORT target-many viable pieces (EM
    // zeroes the rest) — the contract is ≤ target, ≥ char inventory
    assert(dist.length <= target && dist.length > chars)
    assert(chars > 0)
    // every multi-char piece decomposes into in-vocab chars
    val charSet = dist.filter(_._2).map(_._1).toSet
    assert(dist.filter(!_._2).forall(_._1.forall(c => charSet(c.toString))))
  }

  test("local trainer refuses past the word-table budget") {
    intercept[IllegalArgumentException] {
      UnigramLm.unigramLocal(fixture, "text", 30, emIters = 1,
        seedFactor = 4, maxLen = UnigramLm.MaxPieceLen, maxVocabRows = 3)
    }
  }

  test("trainer learns the corpus's dominant unit") {
    val out = UnigramLm.unigramVocab(fixture, "text", 30, emIters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // 'the' appears constantly: some piece of it must survive the prune
    assert(out.keys.exists(p => p.length > 1 && "the".contains(p) ||
      p == "the"))
  }

  test("trainer refuses a vocab smaller than the char inventory") {
    intercept[IllegalArgumentException] {
      UnigramLm.unigramVocab(fixture, "text", 3, emIters = 1)
    }
  }
}
