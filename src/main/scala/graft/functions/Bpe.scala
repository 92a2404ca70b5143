package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE ENCODE against a fixed merge table — the runtime half of
  * the tokenizer family (training lives in
  * [[graft.operators.Vocab.bpeMerges]], which learns the ranked merge
  * list distributed; this expression applies it per document at scan
  * speed).
  *
  * Semantics (standard BPE runtime, the Sennrich/GPT-2 encode loop):
  * the text normalizes exactly like [[WordShingles]] (lowercase, trim,
  * whitespace-run split); each word starts as its codepoint sequence;
  * then, repeatedly, the adjacent symbol pair with the LOWEST rank in
  * the merge table merges ALL of its leftmost-nonoverlapping
  * occurrences, until no adjacent pair is in the table. Output is the
  * concatenated token sequence across words (order preserved,
  * whitespace is a separator, never a token). Null text → null; empty
  * text → empty array.
  *
  * NOTE the deliberate flavor difference from the TRAINER's rewrite:
  * [[graft.operators.Vocab.bpeMerges]] advances its working vocabulary
  * with ONE space-padded SQL `replace` pass per round (the
  * engine-portable greedy variant its unrolled DuckDB oracle replays),
  * while this encoder is the EXHAUSTIVE per-pair loop every production
  * BPE runtime ships. The merge TABLE is interchangeable (ranks are
  * ranks); the within-round application differs exactly the way
  * fast trainers and runtime encoders differ in practice.
  *
  * Scale: the rank table rides into generated code as ONE reference
  * object (broadcast-by-closure, ~|merges| entries); encode is a
  * per-row loop with zero shuffles, zero UDF boxing, inside
  * whole-stage codegen via a static call — the same pattern as
  * [[WordShingles]]/[[MinHashSig]].
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_tokens"

  @transient private lazy val ranks = Bpe.rankTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    Bpe.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("graftBpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Bpe.encode($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object Bpe {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** pair "left right" → rank (lower merges first), as learned order. */
  def rankTable(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  /** Encode one text; called from interpreted eval and generated code. */
  def encode(text: UTF8String,
             ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String]
    for (w <- Ws.split(s)) encodeWord(w, ranks, out)
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Token count without materializing the token array — same loop. */
  def count(text: UTF8String,
            ranks: java.util.HashMap[String, Integer]): Long = {
    val arr = encode(text, ranks)
    if (arr == null) 0L else arr.numElements().toLong
  }

  private def encodeWord(w: String,
                         ranks: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    if (w.isEmpty) return
    // codepoint-wise initial symbols (surrogate-pair safe)
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    // standard encode loop: find the lowest-rank adjacent pair present,
    // merge ALL its leftmost-nonoverlapping occurrences, repeat
    var done = syms.size < 2
    while (!done) {
      var best = Integer.MAX_VALUE
      var bestL: String = null
      var bestR: String = null
      var j = 0
      while (j < syms.size - 1) {
        val rk = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (rk != null && rk.intValue() < best) {
          best = rk.intValue(); bestL = syms.get(j); bestR = syms.get(j + 1)
        }
        j += 1
      }
      if (bestL == null) done = true
      else {
        val l = bestL
        val r = bestR
        val merged = l + r
        val next = new java.util.ArrayList[String](syms.size)
        var p = 0
        while (p < syms.size) {
          if (p < syms.size - 1 && syms.get(p) == l && syms.get(p + 1) == r) {
            next.add(merged); p += 2
          } else { next.add(syms.get(p)); p += 1 }
        }
        syms = next
        if (syms.size < 2) done = true
      }
    }
    var q = 0
    while (q < syms.size) { out.add(UTF8String.fromString(syms.get(q))); q += 1 }
  }
}
