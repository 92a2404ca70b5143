package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-sequence alignment expressions for generation eval — the
  * WORD-level counterparts of the char-level [[DamerauLevenshtein]]:
  * both split on whitespace runs (leading/trailing whitespace and empty
  * tokens ignored) and run the classic two-row DP, O(m·n) time /
  * O(min) space per row, fully inside whole-stage codegen via static
  * calls (the [[FixEncoding]] pattern).
  *
  *  - [[WordLevenshtein]]: insert/delete/substitute edit count — the
  *    numerator of WER (Levenshtein 1966, the ASR/eval standard).
  *  - [[TokenLcs]]: longest-common-subsequence token count — the
  *    numerator of ROUGE-L (Lin 2004). */
case class WordLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_word_levenshtein"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    WordLevenshtein.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.WordLevenshtein.distance($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordLevenshtein =
    copy(left = newLeft, right = newRight)
}

case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_lcs"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    WordLevenshtein.lcs(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.WordLevenshtein.lcs($l, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcs =
    copy(left = newLeft, right = newRight)
}

object WordLevenshtein {

  private[functions] def toks(u: UTF8String): Array[String] = {
    val s = u.toString.trim
    if (s.isEmpty) Array.empty[String] else s.split("\\s+")
  }

  /** Word-level Levenshtein edit count; static for generated code. */
  def distance(ua: UTF8String, ub: UTF8String): Long = {
    val a = toks(ua)
    val b = toks(ub)
    if (a.isEmpty) return b.length.toLong
    if (b.isEmpty) return a.length.toLong
    // two-row DP over the shorter side
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.tabulate(s.length + 1)(_.toLong)
    var cur = new Array[Long](s.length + 1)
    var i = 1
    while (i <= t.length) {
      cur(0) = i.toLong
      var j = 1
      while (j <= s.length) {
        val sub = prev(j - 1) + (if (t(i - 1) == s(j - 1)) 0L else 1L)
        cur(j) = math.min(sub, math.min(prev(j) + 1L, cur(j - 1) + 1L))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(s.length)
  }

  /** Longest common subsequence of the token sequences; static for
    * generated code. */
  def lcs(ua: UTF8String, ub: UTF8String): Long = {
    val a = toks(ua)
    val b = toks(ub)
    if (a.isEmpty || b.isEmpty) return 0L
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Long](s.length + 1)
    var cur = new Array[Long](s.length + 1)
    var i = 1
    while (i <= t.length) {
      var j = 1
      while (j <= s.length) {
        cur(j) = if (t(i - 1) == s(j - 1)) prev(j - 1) + 1L
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      cur(0) = 0L
      i += 1
    }
    prev(s.length)
  }
}
