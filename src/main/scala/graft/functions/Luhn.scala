package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Checksum-validated payment-card scrub — the precision upgrade over
  * [[TextFunctions.piiScrub]]'s blanket long-number mask: a 16-digit
  * order id and a card number look identical to a length regex, but
  * only the card passes the Luhn mod-10 checksum (ISO/IEC 7812), so
  * validating before masking removes the false positives that make
  * blanket scrubs destroy shipping manifests. One pass per value:
  * maximal contiguous digit runs of PAN length (13–19) that pass Luhn
  * are replaced by `<CARD>`; everything else — shorter/longer runs,
  * checksum failures — is left byte-intact for the generic scrub to
  * judge. Deterministic; no lookaround regex (maximal-run scanning is
  * explicit), so the behavior is engine-portable by construction.
  *
  * Scale: per-row byte loop inside whole-stage codegen via a static
  * call (the [[FixEncoding]] pattern) — zero shuffle, zero UDF boxing. */
case class LuhnScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_luhn_scrub"

  override protected def nullSafeEval(input: Any): Any =
    Luhn.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Luhn.scrub($c)")

  override protected def withNewChildInternal(newChild: Expression): LuhnScrub =
    copy(child = newChild)
}

object Luhn {

  /** Mod-10 over a digit string (Luhn 1960): from the rightmost digit,
    * every second digit doubles (minus 9 past 9); valid iff the sum
    * divides by 10. Caller guarantees digits only. */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var dbl = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    sum % 10 == 0
  }

  /** The check digit completing `body` to a Luhn-valid number. */
  def checkDigit(body: String): Int = {
    var sum = 0
    var dbl = true // the appended check digit occupies the undoubled slot
    var i = body.length - 1
    while (i >= 0) {
      var d = body.charAt(i) - '0'
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      dbl = !dbl
      i -= 1
    }
    (10 - sum % 10) % 10
  }

  /** Scrub one value; called from interpreted eval and generated code. */
  def scrub(text: UTF8String): UTF8String = {
    val s = text.toString
    var i = 0
    var changed = false
    val out = new java.lang.StringBuilder(s.length)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val run = s.substring(i, j)
        if (run.length >= 13 && run.length <= 19 && luhnValid(run)) {
          out.append("<CARD>")
          changed = true
        } else out.append(run)
        i = j
      } else {
        out.append(c)
        i += 1
      }
    }
    if (changed) UTF8String.fromString(out.toString) else text
  }
}
