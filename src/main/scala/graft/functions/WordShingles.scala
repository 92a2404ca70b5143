package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, natively.
  *
  * Semantics (identical to the composable normText→split→transform chain
  * and the SQL oracle): lowercase, trim, split on whitespace runs, join
  * each n consecutive tokens with a single space, distinct. Texts with
  * fewer than n tokens yield an empty array; null text yields null.
  *
  * Why native: the higher-order-function formulation builds a ~40-node
  * interpreted expression tree that (a) costs seconds of Janino compile
  * per plan and (b) re-splits the text per lambda element whenever
  * Catalyst re-substitutes it into pushed-down filters. This expression
  * is one generated call into [[WordShingles.compute]] — a single pass
  * per row with a precompiled regex.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Single-pass shingle computation; called from both interpreted eval and
    * generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    val toks = if (s.isEmpty) Array("") else Ws.split(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[UTF8String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }
}
