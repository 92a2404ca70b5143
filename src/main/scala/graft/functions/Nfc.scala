package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * first hygiene pass every tokenizer-bound corpus wants: visually
  * identical strings with different codepoint sequences ("e" +
  * U+0301 vs "é") hash differently, split differently under BPE, and
  * evade exact dedup until composed. Wraps the JDK's
  * `java.text.Normalizer` (ICU-conformant UAX #15, the same standard
  * DuckDB's nfc_normalize implements — the q452 oracle leans on that
  * independence). Pure-ASCII input short-circuits via
  * `Normalizer.isNormalized` (the corpus fast path).
  *
  * Scale: per-row static call inside whole-stage codegen — zero
  * shuffle, zero UDF boxing (the [[FixEncoding]] pattern). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.normalize($c)")
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def normalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s,
      java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFC))
  }
}
