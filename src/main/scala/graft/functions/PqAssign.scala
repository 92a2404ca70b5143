package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization code assignment as ONE native expression.
  *
  * A composed-Column formulation needs m·k separate dot-product expression
  * trees (hundreds of literals — whole-stage codegen compiles seconds of
  * generated source for what is a triple loop); this expression embeds the
  * codebooks as a referenced object and assigns all `m` subspace codes in
  * tight JVM loops: per vector, code_j = argmax over centroids c of
  * (x_j·c − |c|²/2) — the squared-distance argmin without the constant
  * |x|² term. Ties break to the first centroid. Cost is the PQ-definitional
  * m·k·dsub multiply-adds per vector.
  */
object PqOps {
  def assign(vec: ArrayData, cb: Array[Array[Array[Double]]],
             halfNorms: Array[Array[Double]]): ArrayData = {
    val m = cb.length
    val dim = cb.map(c => if (c.isEmpty) 0 else c(0).length).sum
    if (vec.numElements() < dim)
      throw new IllegalArgumentException(
        s"graft_pq_assign: vector has ${vec.numElements()} elements, codebooks cover $dim")
    val out = new Array[Any](m)
    var j = 0
    var off = 0
    while (j < m) {
      val centroids = cb(j)
      val dsub = if (centroids.isEmpty) 0 else centroids(0).length
      var best = 0
      var bestS = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val cen = centroids(c)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += vec.getDouble(off + i) * cen(i); i += 1 }
        s -= halfNorms(j)(c)
        if (s > bestS) { bestS = s; best = c }
        c += 1
      }
      out(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<double>` vector → `array<int>` of per-subspace PQ codes. */
case class PqAssign(child: Expression,
                    codebooks: Array[Array[Array[Double]]]) extends UnaryExpression {
  @transient private lazy val halfNorms: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum / 2.0))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_assign"
  override protected def nullSafeEval(input: Any): Any =
    PqOps.assign(input.asInstanceOf[ArrayData], codebooks, halfNorms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCb", codebooks, "double[][][]")
    val hnRef = ctx.addReferenceObj("graftPqHn", halfNorms, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqOps.assign($c, $cbRef, $hnRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}
