package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (SentencePiece, Kudo 2018) — the OTHER
  * production tokenizer next to [[Vocab.bpeMerges]]: seed a candidate
  * vocabulary from frequent substrings, EM the piece probabilities over
  * the corpus, prune by likelihood LOSS toward the target size, and
  * hand the fit table to the Viterbi encoder
  * ([[graft.functions.UnigramTokens]]).
  *
  * Scale shape (the [[Vocab.bpeMerges]] discipline from day one): ONE
  * corpus scan collapses text to the (word, freq) table — ~10⁶ rows at
  * ANY corpus size (Zipf tail) — and every E-step is one pass over that
  * table with the vocab-sized piece table riding the closure; expected
  * counts aggregate as LONG micro-units (quantized per (word, piece)
  * BEFORE the shuffle), so float summation order can never make two
  * runs disagree — the repo's ppm/centi determinism rule applied to EM.
  * M-step, loss ranking, and pruning are vocab-sized driver folds.
  * Above [[LocalThreshold]] the whole loop runs driver-local over the
  * budget-guarded collected word table (a production fit is k ≈ 32,000:
  * dozens of EM+prune rounds as Spark jobs is scheduler overhead, not
  * data work — the bpeMergesLocal rationale); both paths share the
  * per-word EM arithmetic function, so output is bit-identical
  * (spec-pinned equality in UnigramSpec).
  *
  * Float honesty: probabilities and log-likelihood losses are genuine
  * Doubles (EM cannot be integer-exact), so the fit is a rows+spec
  * contract like the ML family — the ENCODE side (q406) carries the
  * cross-engine oracle instead, on a pinned piece table. */
object UnigramLm {

  /** Above this target size the trainer collects the word table and
    * loops driver-local (see the scale note above). */
  val LocalThreshold = 512

  /** Candidate piece length cap (chars). Production SentencePiece uses
    * 16; 4 keeps the seed table lean while exercising every code path —
    * a caller fitting a real vocabulary raises it. */
  val MaxPieceLen = 4

  /** EM-fit unigram vocabulary: (piece, is_char, count_micro,
    * logp_micro), `vocabSize` rows (all single chars always survive —
    * every word must stay segmentable; `vocabSize` must cover the
    * char inventory). */
  def unigramVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                   emIters: Int = 2, seedFactor: Int = 4,
                   maxPieceLen: Int = MaxPieceLen,
                   maxVocabRows: Int = 4000000): DataFrame = {
    require(vocabSize >= 2, "vocabSize must be at least 2")
    require(emIters >= 1 && seedFactor >= 1, "emIters/seedFactor >= 1")
    if (vocabSize <= LocalThreshold)
      unigramDistributed(docs, textCol, vocabSize, emIters, seedFactor,
        maxPieceLen)
    else
      unigramLocal(docs, textCol, vocabSize, emIters, seedFactor,
        maxPieceLen, maxVocabRows)
  }

  /** The corpus-width (word, freq) pass both paths share. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(T.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))

  // ---------------------------------------------------------------
  // Shared per-word arithmetic (the determinism seam: both paths call
  // EXACTLY these functions, in the same within-word order).

  /** All substring occurrences up to maxLen CODE POINTS (surrogate-pair
    * safe): (piece, occurrences·freq) — integer seed counts, one entry
    * per distinct piece per word. */
  private[operators] def wordSubstrings(w: String, n: Long, maxLen: Int):
      Iterator[(String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < w.length) {
      var j = i
      var cps = 0
      while (cps < maxLen && j < w.length) {
        j = w.offsetByCodePoints(j, 1)
        cps += 1
        val p = w.substring(i, j)
        m.update(p, m.getOrElse(p, 0L) + n)
      }
      i = w.offsetByCodePoints(i, 1)
    }
    m.iterator
  }

  /** Forward-backward expected piece counts for one word, quantized to
    * Long micro-units per (word, piece) BEFORE any cross-word sum. The
    * DP runs over char positions; a piece of maxLen code points spans
    * up to 2·maxLen chars (surrogate pairs), and splits that land
    * inside a pair simply miss the piece map. */
  private[operators] def wordExpectedCounts(
      w: String, n: Long, probs: java.util.HashMap[String, java.lang.Double],
      maxLenCp: Int): Iterator[(String, Long)] = {
    val maxLen = maxLenCp * 2
    val ln = w.length
    val alpha = new Array[Double](ln + 1)
    val beta = new Array[Double](ln + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= ln) {
      var len = 1
      while (len <= maxLen && len <= i) {
        val lp = probs.get(w.substring(i - len, i))
        if (lp != null && alpha(i - len) != Double.NegativeInfinity)
          alpha(i) = logAdd(alpha(i), alpha(i - len) + lp.doubleValue())
        len += 1
      }
      i += 1
    }
    if (alpha(ln) == Double.NegativeInfinity) return Iterator.empty
    beta(ln) = 0.0
    i = ln - 1
    while (i >= 0) {
      var len = 1
      while (len <= maxLen && i + len <= ln) {
        val lp = probs.get(w.substring(i, i + len))
        if (lp != null && beta(i + len) != Double.NegativeInfinity)
          beta(i) = logAdd(beta(i), beta(i + len) + lp.doubleValue())
        len += 1
      }
      i -= 1
    }
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    i = 0
    while (i < ln) {
      var len = 1
      while (len <= maxLen && i + len <= ln) {
        val p = w.substring(i, i + len)
        val lp = probs.get(p)
        if (lp != null && alpha(i) != Double.NegativeInfinity &&
          beta(i + len) != Double.NegativeInfinity) {
          val post = math.exp(
            alpha(i) + lp.doubleValue() + beta(i + len) - alpha(ln))
          acc.update(p, acc.getOrElse(p, 0.0) + post * n)
        }
        len += 1
      }
      i += 1
    }
    acc.iterator.map { case (p, c) => (p, math.round(c * 1e6)) }
      .filter(_._2 > 0L)
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Viterbi log-prob of segmenting `s` with `excl` removed — the
    * "best alternative" in the prune loss. -Inf if unsegmentable
    * (never happens while chars survive). */
  private[operators] def viterbiAlt(
      s: String, probs: java.util.HashMap[String, java.lang.Double],
      excl: String, maxLenCp: Int): Double = {
    val maxLen = maxLenCp * 2
    val ln = s.length
    val best = new Array[Double](ln + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= ln) {
      var len = 1
      while (len <= maxLen && len <= i) {
        val p = s.substring(i - len, i)
        if (p != excl) {
          val lp = probs.get(p)
          if (lp != null && best(i - len) != Double.NegativeInfinity) {
            val sc = best(i - len) + lp.doubleValue()
            if (sc > best(i)) best(i) = sc
          }
        }
        len += 1
      }
      i += 1
    }
    best(ln)
  }

  /** One driver fold shared by both paths: M-step probs from quantized
    * counts, prune multi-char pieces by likelihood loss to `keepMulti`.
    * Returns the updated (piece → logp) table, chars always kept. */
  private[operators] def mStepAndPrune(
      counts: Seq[(String, Long)], keepMulti: Int, maxLen: Int,
      chars: Seq[String]): java.util.HashMap[String, java.lang.Double] = {
    // chars floor at one micro-count — a char may never die, even when
    // its whole posterior mass rides multi-char pieces and its expected
    // count quantizes to zero (the E-step then never emits it)
    val present = counts.map(_._1).toSet
    val withChars = counts ++
      chars.filterNot(present).map(c => (c, 0L))
    val floored = withChars.map { case (p, c) =>
      (p, if (p.codePointCount(0, p.length) == 1) math.max(c, 1L) else c)
    }.filter(_._2 > 0L)
    // Double total (deterministic: floored order is the caller's sorted
    // order) — a Long sum of micro-counts could overflow past ~9e12
    // corpus word instances
    val total = floored.foldLeft(0.0) { case (s, (_, c)) => s + c.toDouble }
    val probs = new java.util.HashMap[String, java.lang.Double](
      floored.size * 2)
    floored.foreach { case (p, c) =>
      probs.put(p, java.lang.Double.valueOf(math.log(c / total)))
    }
    val countMap = floored.toMap
    val multi = floored.collect {
      case (p, _) if p.codePointCount(0, p.length) > 1 => p
    }
    // hold probs fixed while ranking: loss = count · (logp − best alt)
    val losses = multi.map { p =>
      val alt = viterbiAlt(p, probs, p, maxLen)
      val lp = probs.get(p).doubleValue()
      (p, countMap(p) * (lp - alt))
    }
    val keep = losses.sortWith { case ((pa, la), (pb, lb)) =>
      if (la != lb) la > lb else Vocab.utf8Lt(pa, pb)
    }.take(keepMulti).map(_._1).toSet
    val out = new java.util.HashMap[String, java.lang.Double](probs.size)
    floored.foreach { case (p, _) =>
      if (p.codePointCount(0, p.length) == 1 || keep.contains(p))
        out.put(p, probs.get(p))
    }
    out
  }

  // ---------------------------------------------------------------

  private def fitLoop(eStep: java.util.HashMap[String, java.lang.Double]
                        => Seq[(String, Long)],
                      vocabSize: Int, emIters: Int, seedFactor: Int,
                      maxLen: Int,
                      seedCounts: Seq[(String, Long)]): Seq[(String, Long, Double)] = {
    val charPieces = seedCounts.collect {
      case (p, _) if p.codePointCount(0, p.length) == 1 => p }
    val chars = charPieces.length
    require(vocabSize > chars,
      s"vocabSize $vocabSize must exceed the $chars-char inventory")
    val targetMulti = vocabSize - chars
    // seed: all chars + top multi by (count·len desc, piece asc)
    val seedMulti = seedCounts
      .filter(p => p._1.codePointCount(0, p._1.length) > 1)
      .sortWith { case ((pa, ca), (pb, cb)) =>
        val sa = ca * pa.length; val sb = cb * pb.length
        if (sa != sb) sa > sb else Vocab.utf8Lt(pa, pb)
      }
      .take(targetMulti * seedFactor).map(_._1).toSet
    var counts = seedCounts.filter { case (p, _) =>
      p.codePointCount(0, p.length) == 1 || seedMulti.contains(p) }
      .map { case (p, c) => (p, c * 1000000L) } // seed counts as micro
    var probs = mStepAndPrune(counts, seedMulti.size, maxLen, charPieces)
    var multiNow = probs.size - chars
    var done = multiNow <= targetMulti
    while (!done) {
      var it = 0
      while (it < emIters) {
        counts = eStep(probs)
        val keep = math.max(targetMulti, multiNow) // no prune inside EM
        probs = mStepAndPrune(counts, keep, maxLen, charPieces)
        it += 1
      }
      multiNow = probs.size - chars
      val next = math.max(targetMulti, multiNow * 3 / 4)
      counts = eStep(probs)
      probs = mStepAndPrune(counts, next, maxLen, charPieces)
      multiNow = probs.size - chars
      done = multiNow <= targetMulti
    }
    // settle probabilities once at the final size
    counts = eStep(probs)
    probs = mStepAndPrune(counts, targetMulti, maxLen, charPieces)
    val countMap = counts.toMap
    import scala.jdk.CollectionConverters._
    probs.keySet().asScala.toSeq
      .sortWith(Vocab.utf8Lt)
      .map(p => (p, countMap.getOrElse(p, 0L),
        probs.get(p).doubleValue()))
  }

  private def toFrame(spark: org.apache.spark.sql.SparkSession,
                      fit: Seq[(String, Long, Double)]): DataFrame = {
    import spark.implicits._
    fit.map { case (p, c, lp) =>
      (p, p.codePointCount(0, p.length) == 1, c, math.round(lp * 1e6))
    }.toDF("piece", "is_char", "count_micro", "logp_micro")
  }

  private[operators] def unigramDistributed(docs: DataFrame, textCol: String,
                                 vocabSize: Int, emIters: Int,
                                 seedFactor: Int, maxLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordsDf = Materialize.transient(wordFreq(docs, textCol))
    val words = wordsDf.as[(String, Long)]
    // integer seed counts: map-combined LONG sums, order-free
    val seedCounts = words
      .flatMap { case (w, n) => wordSubstrings(w, n, maxLen) }
      .toDF("piece", "c").groupBy("piece").agg(sum("c").as("c"))
      .as[(String, Long)].collect().toSeq
      .sortWith { case ((pa, _), (pb, _)) => Vocab.utf8Lt(pa, pb) }
    def eStep(probs: java.util.HashMap[String, java.lang.Double]):
        Seq[(String, Long)] =
      words.flatMap { case (w, n) => wordExpectedCounts(w, n, probs, maxLen) }
        .toDF("piece", "c").groupBy("piece").agg(sum("c").as("c"))
        .as[(String, Long)].collect().toSeq
        .sortWith { case ((pa, _), (pb, _)) => Vocab.utf8Lt(pa, pb) }
    toFrame(spark,
      fitLoop(eStep, vocabSize, emIters, seedFactor, maxLen, seedCounts))
  }

  private[operators] def unigramLocal(docs: DataFrame, textCol: String,
                           vocabSize: Int, emIters: Int, seedFactor: Int,
                           maxLen: Int, maxVocabRows: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = wordFreq(docs, textCol).limit(maxVocabRows + 1)
      .as[(String, Long)].collect()
    require(rows.length <= maxVocabRows,
      s"unigramLocal: word table exceeds the $maxVocabRows-row driver " +
        "budget — raise maxVocabRows deliberately or lower the target " +
        "below LocalThreshold to train distributed")
    val words = rows.toSeq
    def agg(it: Iterator[(String, Long)]): Seq[(String, Long)] = {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (p, c) => m.update(p, m.getOrElse(p, 0L) + c) }
      m.toSeq.sortWith { case ((pa, _), (pb, _)) => Vocab.utf8Lt(pa, pb) }
    }
    val seedCounts = agg(words.iterator.flatMap { case (w, n) =>
      wordSubstrings(w, n, maxLen) })
    def eStep(probs: java.util.HashMap[String, java.lang.Double]):
        Seq[(String, Long)] =
      agg(words.iterator.flatMap { case (w, n) =>
        wordExpectedCounts(w, n, probs, maxLen) })
    toFrame(spark,
      fitLoop(eStep, vocabSize, emIters, seedFactor, maxLen, seedCounts))
  }

  // ---------------------------------------------------------------
  // Encode-side helpers (mirroring Vocab.bpeTokens / DisjointMerges)

  /** Fixed disjoint-alphabet piece table for the oracle-backed encoder
    * queries (the [[Vocab.DisjointMerges]] discipline): the four
    * 2-char pieces share no characters, so occurrences never interact
    * and the Viterbi token count has the closed form
    * |non-space chars| − Σ maximal-nonoverlapping occurrences(piece) —
    * which DuckDB replays via `replace` length arithmetic. Piece
    * log-probs make any piece use beat its char split (log ¼ > 2·log
    * small), so Viterbi always takes every available occurrence. */
  val DisjointPieces: Seq[(String, Double)] = {
    val charLp = math.log(1.0 / 4096)
    val pieceLp = math.log(1.0 / 4)
    val chars = (('a' to 'z') ++ ('0' to '9')).map(c => (c.toString, charLp))
    val punct = Seq(".", ",", ";", ":", "!", "?", "'", "\"", "-", "&",
      "(", ")", "/").map(c => (c, charLp))
    chars ++ punct ++
      Seq(("th", pieceLp), ("an", pieceLp), ("ou", pieceLp), ("es", pieceLp))
  }

  /** Viterbi tokens of a text column under a fixed (piece, logp) table —
    * the codegen'd [[graft.functions.UnigramTokens]] expression. */
  def unigramTokens(c: org.apache.spark.sql.Column,
                    pieces: Seq[(String, Double)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.UnigramTokens(ColumnBridge.expression(c), pieces))
  }

  /** Unigram token count (long). */
  def unigramTokenCount(c: org.apache.spark.sql.Column,
                        pieces: Seq[(String, Double)]): org.apache.spark.sql.Column =
    size(unigramTokens(c, pieces)).cast("long")
}
