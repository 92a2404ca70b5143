package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDN → Unicode host decoding (RFC 3492 Punycode bootstring + the
  * RFC 5890 `xn--` ACE label convention) — the missing piece
  * [[CanonicalUrl]] documents out of scope: a crawl frontier sees
  * `xn--mnchen-3ya.example` and `münchen.example` as different hosts
  * until ACE labels decode. Each dot-separated label starting with
  * `xn--` (case-insensitive) runs the bootstring decoder (base 36,
  * tmin 1, tmax 26, skew 38, damp 700, initial bias 72, initial
  * n 128 — the RFC's parameter set, implemented from the spec); other
  * labels pass through lowercased. A label that fails to decode (bad
  * digit, overflow, malformed) stays VERBATIM (lowercased) — degrade,
  * never mangle; the paired [[PunyIsAce]]-style audit signal is simply
  * whether `xn--` remains in the output.
  *
  * Scale: per-row arithmetic inside whole-stage codegen via a static
  * call (the [[FixEncoding]] pattern), zero shuffle. */
case class IdnToUnicode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_idn_to_unicode"
  override protected def nullSafeEval(input: Any): Any =
    Punycode.idnToUnicode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Punycode.idnToUnicode($c)")
  override protected def withNewChildInternal(
      newChild: Expression): IdnToUnicode = copy(child = newChild)
}

object Punycode {

  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** RFC 3492 §6.2 decode of one label BODY (the part after `xn--`);
    * None on any malformed input or overflow. */
  def decodeLabel(s: String): Option[String] = {
    val out = new java.lang.StringBuilder()
    var i = 0
    var n = InitialN
    var bias = InitialBias
    val d = s.lastIndexOf('-')
    var p = 0
    if (d >= 0) {
      var j = 0
      while (j < d) {
        val c = s.charAt(j)
        if (c >= 128) return None // basic part must be ASCII
        out.append(c)
        j += 1
      }
      p = d + 1
    }
    while (p < s.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (p >= s.length) return None
        val dg = digit(s.charAt(p))
        p += 1
        if (dg < 0) return None
        if (dg > (Int.MaxValue - i) / w) return None // overflow
        i += dg * w
        val t = if (k <= bias) TMin
          else if (k >= bias + TMax) TMax else k - bias
        if (dg < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None
          w *= Base - t
          k += Base
        }
      }
      val numPoints = out.codePointCount(0, out.length) + 1
      bias = adapt(i - oldi, numPoints, oldi == 0)
      if (i / numPoints > Int.MaxValue - n) return None
      n += i / numPoints
      i %= numPoints
      if (n < InitialN || !Character.isValidCodePoint(n)) return None
      // insert code point n at (code point) position i
      val charIdx = out.offsetByCodePoints(0, i)
      out.insert(charIdx, Character.toChars(n))
      i += 1
    }
    Some(out.toString)
  }

  /** Decode every `xn--` label of a host; non-ACE labels lowercase and
    * pass through; failed labels stay verbatim (lowercased). */
  def idnToUnicode(host: UTF8String): UTF8String = {
    val s = host.toString.toLowerCase(Locale.ROOT)
    if (!s.contains("xn--")) return UTF8String.fromString(s)
    val labels = s.split("\\.", -1).map { lbl =>
      // an ACE label must carry a non-empty body (RFC 5890) — a bare
      // "xn--" is malformed and stays verbatim
      if (lbl.startsWith("xn--") && lbl.length > 4)
        decodeLabel(lbl.substring(4)).getOrElse(lbl)
      else lbl
    }
    UTF8String.fromString(labels.mkString("."))
  }
}
