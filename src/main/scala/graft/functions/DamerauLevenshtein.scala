package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native TRUE Damerau-Levenshtein distance (Lowrance-Wagner, the
  * unrestricted variant with the alphabet-indexed DP — "ca"→"abc" is 2,
  * where the restricted OSA recurrence says 3) — the edit-distance rung
  * that counts a transposition as ONE operation, which is what typo'd
  * identifiers actually are. The built-in `levenshtein` charges a swap
  * 2 (substitute twice); entity resolution over human-typed keys wants
  * the 1-cost swap. Matches DuckDB's `damerau_levenshtein` exactly
  * (integer distances — no float parity question), so the q367 oracle
  * replays it natively.
  *
  * Per-row compute, O(|a|·|b|) time and O(|a|·|b|) ints of scratch —
  * intended INSIDE a blocked join like [[JaroWinkler]]; codegens to one
  * static call, zero boxing. Comparison is per UTF-16 char (identical
  * to codepoints on the ASCII identifiers this runs on). */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.distance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance-Wagner DP; called from generated code. */
  def distance(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString.toCharArray
    val b = ub.toString.toCharArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // H is (la+2) x (lb+2), flattened
    val w = lb + 2
    val h = new Array[Int]((la + 2) * w)
    h(0) = inf
    var i = 0
    while (i <= la) { h((i + 1) * w) = inf; h((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(j + 1) = inf; h(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = { val v = da.get(b(j - 1)); if (v == null) 0 else v.intValue }
        val j1 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = h(i * w + j) + cost
        val ins = h((i + 1) * w + j) + 1
        val del = h(i * w + j + 1) + 1
        val trans = h(i1 * w + j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h((i + 1) * w + j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    h((la + 1) * w + lb + 1)
  }
}
