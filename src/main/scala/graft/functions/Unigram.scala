package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM ENCODE (SentencePiece's runtime half, Kudo 2018):
  * Viterbi best segmentation of each word against a fixed
  * (piece, log-prob) table — the OTHER production tokenizer next to
  * [[BpeTokens]] (training lives in
  * [[graft.operators.UnigramLm.unigramVocab]]; this expression applies
  * a fit table per document at scan speed).
  *
  * Semantics: text normalizes exactly like [[BpeTokens]] (lowercase,
  * trim, whitespace-run split); per word, dynamic programming over end
  * positions picks the segmentation maximizing Σ log p(piece) over
  * pieces in the table (pieces are codepoint sequences; max piece
  * length bounds the inner scan). A character with no piece covering
  * it falls back to a single-codepoint UNK token with
  * [[Unigram.UnkLogProb]] (far below any real piece, so UNK never
  * displaces a viable segmentation). Ties break toward the LONGER
  * final piece, then lexicographically smaller — one answer on any
  * run. Null text → null; empty text → empty array.
  *
  * Scale: the piece table rides into generated code as ONE reference
  * object; encode is a per-row DP with zero shuffles, zero UDF boxing,
  * inside whole-stage codegen via a static call (the [[BpeTokens]]
  * pattern). */
case class UnigramTokens(child: Expression, pieces: Seq[(String, Double)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_tokens"

  @transient private lazy val table = Unigram.pieceTable(pieces)

  override protected def nullSafeEval(input: Any): Any =
    Unigram.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftUnigramPieces", table,
      classOf[Unigram.PieceTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Unigram.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokens =
    copy(child = newChild)
}

object Unigram {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Log-prob of the single-codepoint UNK fallback: below any piece a
    * trainer can emit (a fit prob is ≥ one micro-count over the corpus
    * total), so a real segmentation always wins. */
  val UnkLogProb: Double = -1e4

  /** Piece map + max piece length (in chars), precomputed once. */
  final class PieceTable(val probs: java.util.HashMap[String, java.lang.Double],
                         val maxLen: Int) extends Serializable

  def pieceTable(pieces: Seq[(String, Double)]): PieceTable = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    var maxLen = 1
    pieces.foreach { case (p, lp) =>
      require(p.nonEmpty, "empty piece")
      m.putIfAbsent(p, java.lang.Double.valueOf(lp))
      maxLen = math.max(maxLen, p.length)
    }
    new PieceTable(m, maxLen)
  }

  /** Encode one text; called from interpreted eval and generated code. */
  def encode(text: UTF8String, table: PieceTable): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String]
    for (w <- Ws.split(s)) encodeWord(w, table, out)
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Token count without keeping the array — same DP. */
  def count(text: UTF8String, table: PieceTable): Long = {
    val arr = encode(text, table)
    if (arr == null) 0L else arr.numElements().toLong
  }

  /** Viterbi over end positions: best(i) = max over pieces p ending at
    * i of best(i - |p|) + log p(piece); UNK covers a single codepoint.
    * Tie-break: longer piece, then UTF-16-lexicographically smaller —
    * deterministic on any engine. */
  private def encodeWord(w: String, table: PieceTable,
                         out: java.util.ArrayList[UTF8String]): Unit = {
    if (w.isEmpty) return
    val n = w.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // start index of the winning piece
    val unk = new Array[Boolean](n + 1)
    var i = 1
    while (i <= n) {
      // UNK fallback for one codepoint ending at i (surrogate-safe)
      val unkStart =
        if (i >= 2 && Character.isSurrogatePair(w.charAt(i - 2), w.charAt(i - 1))) i - 2
        else i - 1
      best(i) = best(unkStart) + UnkLogProb
      back(i) = unkStart
      unk(i) = true
      var len = math.min(table.maxLen, i)
      while (len >= 1) {
        val start = i - len
        val cand = w.substring(start, i)
        val lp = table.probs.get(cand)
        if (lp != null) {
          val sc = best(start) + lp.doubleValue()
          val better = sc > best(i) ||
            (sc == best(i) && (unk(i) ||
              len > i - back(i) ||
              (len == i - back(i) && cand.compareTo(w.substring(back(i), i)) < 0)))
          if (better) { best(i) = sc; back(i) = start; unk(i) = false }
        }
        len -= 1
      }
      i += 1
    }
    // reconstruct (positions walk right-to-left, emit in order)
    val stack = new java.util.ArrayDeque[String]()
    var p = n
    while (p > 0) {
      stack.push(w.substring(back(p), p))
      p = back(p)
    }
    while (!stack.isEmpty) out.add(UTF8String.fromString(stack.pop()))
  }
}
