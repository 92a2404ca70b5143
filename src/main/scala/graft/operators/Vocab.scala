package graft.operators

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-vocabulary induction — the first `k` BPE merge steps
  * (Sennrich-style byte/char-pair encoding), learned the way production
  * BPE trainers actually learn them at corpus scale: ONE corpus scan
  * collapses the text to a (word, frequency) table (map-combinable, the
  * wordcount shape), and every merge iteration runs over that vocab-sized
  * table — pair counting, argmax, and the merge rewrite never touch the
  * corpus again. At 100 TB the word table is still ~10⁶ rows; the
  * iterations are executor-trivial.
  *
  * Engine-portable by construction (the q129/q131 unrolled-oracle
  * discipline): symbols are space-joined char sequences, pair counts are
  * exact integer sums, the winning pair is (weight DESC, pair ASC) — a
  * total order — and the merge rewrite is leftmost non-overlapping
  * `replace` on the space-padded symbol string, which Spark and DuckDB
  * implement identically. No floats anywhere.
  */
object Vocab {

  /** Above this merge count [[bpeMerges]] runs the DRIVER-LOCAL merge
    * loop instead of one distributed round per merge: a production
    * tokenizer train is k ≈ 32,000, and 32k sequential Spark jobs + 32k
    * checkpoint artifacts is a scheduler/wall-clock killer even though
    * each round's DATA is only vocab-sized. The (word, freq) table is
    * ~10⁶ rows at ANY corpus size (hapax-heavy Zipf tail), so every real
    * trainer collects it once and loops in memory — the hybrid both
    * paths produce IDENTICAL output for (same pair counts, same
    * (weight DESC, pair ASC) total order, same leftmost-nonoverlapping
    * rewrite; spec-pinned equality at k=64). */
  val LocalMergeThreshold = 256

  /** Learn the first `merges` BPE merges from the corpus. Returns one row
    * per merge: (merge_idx, pair, merged, weight) where weight is the
    * pair's corpus frequency AT THE TIME it was chosen. Dispatches on
    * [[LocalMergeThreshold]]: small k (the audit/oracle contracts) trains
    * distributed, large k collects the word table under `maxVocabRows`
    * and loops driver-local (identical output — see the threshold doc). */
  def bpeMerges(docs: DataFrame, textCol: String, merges: Int,
                maxVocabRows: Int = 4000000): DataFrame =
    if (merges <= LocalMergeThreshold) bpeMergesDistributed(docs, textCol, merges)
    else bpeMergesLocal(docs, textCol, merges, maxVocabRows)

  /** The corpus-width (word, freq) pass both trainers share. Symbols
    * start as chars; regexp '.' per char avoids split("")'s
    * engine-specific edge cases. */
  private def wordSyms(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(T.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat_ws(" ",
        regexp_extract_all(col("w"), lit("."), lit(0))).as("sym"), col("n"))

  /** Distributed per-round trainer — one vocab-sized pair count + 1-row
    * argmax + rewrite per merge. Right for small k (each round is a
    * Spark job); see [[LocalMergeThreshold]] for why large k must not
    * take this path. */
  private[operators] def bpeMergesDistributed(docs: DataFrame,
                                              textCol: String,
                                              merges: Int): DataFrame = {
    require(merges > 0, "merges must be positive")
    var vocab = Materialize.transient(wordSyms(docs, textCol))
    var out: DataFrame = null
    for (k <- 1 to merges) {
      // Adjacent-symbol pairs weighted by word frequency. Words reduced
      // to a single symbol stop contributing (sequence guard: size ≥ 2).
      val pairs = vocab
        .select(col("n"), split(col("sym"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> concat(syms[i - 1], ' ', syms[i]))")).as("pair"))
        .groupBy("pair").agg(sum("n").as("weight"))
      // One-row argmax with a total-order tiebreak; materialized so the
      // TakeOrdered subtree runs once, not once per downstream consumer.
      val best = Materialize.artifact(pairs
        .orderBy(col("weight").desc, col("pair").asc)
        .limit(1)
        .select(lit(k).as("merge_idx"), col("pair"),
          regexp_replace(col("pair"), " ", "").as("merged"), col("weight")))
      out = if (out == null) best else out.unionByName(best)
      // Space-padding makes the replace symbol-exact (a pair can never
      // match inside a longer symbol). The rewrite is ONE leftmost
      // non-overlapping replace pass: inside an unbroken run it merges
      // alternate occurrences ("a a a a" → "aa a a", because the match
      // consumes the shared delimiter) rather than exhaustively like a
      // per-word BPE trainer loop would — a deterministic greedy variant
      // that both engines implement identically, which is what the
      // unrolled oracle requires; later rounds pick up the leftovers.
      vocab = Materialize.transient(vocab
        .crossJoin(broadcast(best.select(col("pair").as("graft_p"),
          col("merged").as("graft_m"))))
        .select(trim(expr(
          "replace(' ' || sym || ' ', ' ' || graft_p || ' ', ' ' || graft_m || ' ')"))
          .as("sym"), col("n")))
    }
    out
  }

  /** UTF-8 binary comparison — Spark orders strings by unsigned UTF-8
    * bytes (UTF8String), which differs from Java's UTF-16 compareTo for
    * supplementary characters; the local trainer must break weight ties
    * by EXACTLY the engine's order or the two paths diverge. */
  private[operators] def utf8Lt(a: String, b: String): Boolean =
    compareUtf8(a, b) < 0

  private[operators] def compareUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Driver-local trainer — the large-k path: ONE corpus scan builds the
    * (word, freq) table, which is collected under an EXPLICIT row budget
    * (refuses loudly past `maxVocabRows` — the caller raises it
    * deliberately or trains distributed), then the k merge rounds run in
    * memory: same pair counts (adjacent symbols weighted by word freq),
    * same (weight DESC, pair ASC-by-UTF-8) winner, same space-padded
    * leftmost-nonoverlapping rewrite (Java String.replace == Spark
    * `replace` — literal, left-to-right, non-overlapping). Output is
    * bit-identical to [[bpeMergesDistributed]]; VocabSpec pins equality
    * at k=64. */
  private[operators] def bpeMergesLocal(docs: DataFrame, textCol: String,
                                        merges: Int,
                                        maxVocabRows: Int): DataFrame = {
    require(merges > 0, "merges must be positive")
    require(maxVocabRows > 0, "maxVocabRows must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = wordSyms(docs, textCol).limit(maxVocabRows + 1).collect()
    require(rows.length <= maxVocabRows,
      s"bpeMergesLocal: word table exceeds the $maxVocabRows-row driver " +
        "budget — raise maxVocabRows deliberately (it is ~16B+2·|word| " +
        "bytes/row) or train distributed")
    var vocab = rows.map(r => (r.getString(0), r.getLong(1)))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= merges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (sym, n) =>
        val syms = sym.split(' ')
        var i = 1
        while (i < syms.length) {
          val p = syms(i - 1) + " " + syms(i)
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true // every word is one symbol
      else {
        var bp: String = null
        var bw = Long.MinValue
        counts.foreach { case (p, w) =>
          if (w > bw || (w == bw && compareUtf8(p, bp) < 0)) { bp = p; bw = w }
        }
        val merged = bp.replace(" ", "")
        out += ((k, bp, merged, bw))
        val from = " " + bp + " "
        val to = " " + merged + " "
        vocab = vocab.map { case (sym, n) =>
          ((" " + sym + " ").replace(from, to).trim, n)
        }
      }
      k += 1
    }
    out.toSeq.toDF("merge_idx", "pair", "merged", "weight")
  }

  /** Fixed "disjoint-alphabet digraph" merge table for the oracle-backed
    * encoder queries: the four pairs share no characters, so merges
    * cannot interact (no merge creates, destroys, or overlaps another's
    * occurrence) and the BPE token count has the closed form
    * |non-space chars| − Σ leftmost-nonoverlapping occurrences(pair) —
    * which the DuckDB oracle computes independently via `replace`
    * arithmetic, proving the encoder end-to-end on real corpus text.
    * (Interacting merge tables — rank priority, cascaded merges — are
    * spec-verified in BpeSpec; SQL cannot replay the exhaustive loop.) */
  val DisjointMerges: Seq[(String, String)] =
    Seq(("t", "h"), ("a", "n"), ("o", "u"), ("e", "s"))

  /** Real BPE tokens of a text column under a fixed merge table — the
    * codegen'd [[graft.functions.BpeTokens]] expression (see its scaladoc
    * for the encode-loop semantics and the trainer-flavor note). */
  def bpeTokens(c: org.apache.spark.sql.Column,
                merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.BpeTokens(ColumnBridge.expression(c), merges))
  }

  /** Real-tokenizer token count (long). */
  def bpeTokenCount(c: org.apache.spark.sql.Column,
                    merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    size(bpeTokens(c, merges)).cast("long")

  /** [[Corpus.tokenBudgetCap]] recounted with the REAL tokenizer: per
    * source, admit documents in deterministic (content-hash, id) order
    * until the cumulative BPE token count exceeds the budget. Token
    * counting is the codegen'd encode — one narrow pass; the only
    * shuffle is the per-source cumulative window, same shape as q104. */
  def bpeTokenBudgetCap(docs: DataFrame, idCol: String, textCol: String,
                        srcCol: String, budget: Long,
                        merges: Seq[(String, String)]): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("graft_pick").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        md5(col(textCol).cast("binary")).as("graft_pick"),
        bpeTokenCount(col(textCol), merges).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** Encode with a learned merge table: apply the k merges IN LEARNED
    * ORDER to per-group word-frequency tables and report the token-count
    * compression per group — the "did the vocabulary help, and for which
    * source/language?" readout (tokenizer fertility with the corpus's own
    * tokenizer instead of a char baseline).
    *
    * Scale posture: one corpus scan per side (the learning scan inside
    * [[bpeMerges]] and the per-group wordcount here); the merge table
    * pivots to a single broadcast row, so applying k merges is k nested
    * string replaces in ONE narrow projection over the vocab-sized table —
    * no joins, no extra shuffles. */
  def bpeEncode(docs: DataFrame, textCol: String, groupCol: String,
                merges: Int,
                precomputed: Option[DataFrame] = None): DataFrame = {
    val mergeTable = precomputed.getOrElse(bpeMerges(docs, textCol, merges))
    // (pair, merged) per round as one broadcast row of 2k scalar columns.
    val aggs = (1 to merges).flatMap { k =>
      Seq(max(when(col("merge_idx") === k, col("pair"))).as(s"graft_p$k"),
        max(when(col("merge_idx") === k, col("merged"))).as(s"graft_m$k"))
    }
    val m = mergeTable.groupBy().agg(aggs.head, aggs.tail: _*)
    val words = docs
      .select(col(groupCol).as("grp"),
        explode(T.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w").agg(count(lit(1)).as("n"))
      .select(col("grp"), concat_ws(" ",
        regexp_extract_all(col("w"), lit("."), lit(0))).as("sym"), col("n"))
    val rewritten = (1 to merges).foldLeft("sym") { (e, k) =>
      s"trim(replace(' ' || $e || ' ', ' ' || graft_p$k || ' ', ' ' || graft_m$k || ' '))"
    }
    words.crossJoin(broadcast(m))
      .select(col("grp").as(groupCol), col("n"),
        (size(split(col("sym"), " ")) * col("n")).as("graft_tc"),
        (size(split(expr(rewritten), " ")) * col("n")).as("graft_tb"))
      .groupBy(groupCol)
      .agg(sum("n").as("n_words"),
        sum("graft_tc").as("tokens_chars"),
        sum("graft_tb").as("tokens_bpe"))
      .withColumn("saved_ppm", expr(
        "(tokens_chars - tokens_bpe) * 1000000 div tokens_chars"))
  }

  /** Feature-hashing collision audit — "how many bits does the hashing
    * trick need on THIS vocabulary" (the question every hashed
    * bag-of-words model, [[graft.ml.QualityClassifier]] included,
    * answers by folklore instead of measurement): for each candidate
    * bucket width 2^bits, the distinct-term table maps through the
    * PORTABLE md5 bucket (first 8 hex digits mod 2^bits — the
    * [[graft.operators.Corpus.shardRebalanceReport]] arithmetic, so
    * any engine replays the buckets bit-for-bit) and reports occupied
    * buckets, terms sharing a bucket with at least one other
    * (`n_colliding`), and the floor-ppm collision rate — the
    * bits-vs-quality trade read off a table instead of guessed.
    *
    * Scale: ONE distinct-term reduction, a bounded |bits| explode, two
    * (bits, bucket)-keyed aggregates — vocabulary-sized, never
    * corpus-sized. */
  def hashCollisionAudit(docs: DataFrame, textCol: String,
                         bucketBits: Seq[Int]): DataFrame = {
    require(bucketBits.nonEmpty && bucketBits.forall(b => b >= 1 && b <= 31),
      "bucketBits must be in 1..31")
    val terms = docs
      .select(explode(T.tokens(col(textCol))).as("graft_t"))
      .filter(length(col("graft_t")) > 0)
      .distinct()
    terms
      .withColumn("graft_bits", explode(typedLit(bucketBits.toList)))
      .withColumn("graft_b",
        pmod(conv(substring(md5(col("graft_t")), 1, 8), 16, 10)
          .cast("long"), expr("shiftleft(1L, graft_bits)")))
      .groupBy("graft_bits", "graft_b")
      .agg(count(lit(1)).as("graft_m"))
      .groupBy("graft_bits")
      .agg(sum("graft_m").as("graft_nt"),
        count(lit(1)).as("graft_occ"),
        sum(when(col("graft_m") >= 2, col("graft_m")).otherwise(0L))
          .as("graft_coll"))
      .select(col("graft_bits").cast("long").as("bits"),
        col("graft_nt").cast("long").as("n_terms"),
        col("graft_occ").cast("long").as("n_buckets_occupied"),
        col("graft_coll").cast("long").as("n_colliding"),
        expr("CASE WHEN graft_nt = 0 THEN 0" +
          " ELSE graft_coll * 1000000 div graft_nt END")
          .as("collision_ppm"))
  }
}
