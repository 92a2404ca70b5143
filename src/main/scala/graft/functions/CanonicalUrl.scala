package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization (RFC 3986 §6 syntax-based normalization + the
  * tracking-param strip every crawl frontier runs) — the re-key step
  * that lets URL-level dedup ([[graft.operators.Robots]]' frontier,
  * q427's revisit economics) see "HTTPS://Ex.COM:443/p?utm_source=x&a=1#s"
  * and "https://ex.com/p?a=1" as ONE capture:
  *
  *  - scheme and host lowercase (userinfo preserved verbatim);
  *  - fragment stripped;
  *  - default port stripped (http:80, https:443); other ports kept;
  *  - percent-encodings of UNRESERVED octets (ALPHA / DIGIT / "-" /
  *    "." / "_" / "~") decoded, all other percent triplets uppercased
  *    (%2f → %2F) — RFC 3986 §6.2.2.1/.2; a malformed triplet stays
  *    verbatim (degrade, never throw);
  *  - query params from the declared tracking list dropped (exact key
  *    match after percent-normalization), empty params dropped, the
  *    rest sorted by full `key=value` byte order (deterministic
  *    re-key, not RFC — documented); an emptied query drops its "?";
  *  - an empty path with an authority becomes "/" (§6.2.3).
  *
  * Dot-segment removal and IDN/punycode are documented out of scope
  * (path semantics differ per server; the rules above are the
  * always-safe subset). A value with no `scheme://` is returned
  * UNCHANGED — not a URL, never mangled.
  *
  * Scale: per-row char walk inside whole-stage codegen via a static
  * call with the tracking set as a broadcast reference object — zero
  * shuffle, zero UDF boxing (the [[FixEncoding]] pattern). */
case class CanonicalUrl(child: Expression, dropParams: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_canonical_url"

  private lazy val dropSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](dropParams.size * 2)
    dropParams.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    CanonicalUrl.canonical(input.asInstanceOf[UTF8String], dropSet)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftDropParams", dropSet,
      "java.util.HashSet<String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CanonicalUrl.canonical($c, $setRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalUrl = copy(child = newChild)
}

object CanonicalUrl {

  /** The common tracker keys (Google Analytics UTM family, click ids)
    * — callers can pass their own list. */
  val DefaultTrackers: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "utm_id", "gclid", "fbclid", "msclkid", "mc_eid",
    "igshid", "ref_src")

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' ||
      b == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode unreserved percent-triplets, uppercase the rest; malformed
    * triplets pass through verbatim. */
  private def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Canonicalize one value; called from interpreted eval and generated
    * code. */
  def canonical(url: UTF8String,
                drop: java.util.HashSet[String]): UTF8String = {
    val s = url.toString
    val si = s.indexOf("://")
    if (si <= 0) return url
    var ok = true
    var k = 0
    while (k < si) {
      val c = s.charAt(k)
      if (!(Character.isLetterOrDigit(c) && c < 128) &&
        c != '+' && c != '-' && c != '.') ok = false
      k += 1
    }
    if (!ok) return url
    val scheme = s.substring(0, si).toLowerCase(Locale.ROOT)
    var rest = s.substring(si + 3)
    val hi = rest.indexOf('#')
    if (hi >= 0) rest = rest.substring(0, hi) // fragment stripped
    var pi = rest.length
    var j = 0
    var found = false
    while (j < rest.length && !found) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?') { pi = j; found = true }
      j += 1
    }
    val auth = rest.substring(0, pi)
    val pathq = rest.substring(pi)
    val ai = auth.lastIndexOf('@')
    val userinfo = if (ai >= 0) auth.substring(0, ai + 1) else ""
    val hostport = auth.substring(ai + 1)
    // port split: the colon must follow any IPv6 bracket
    val br = hostport.lastIndexOf(']')
    val ci = hostport.lastIndexOf(':')
    var host = hostport
    var port = ""
    if (ci > br && ci >= 0 && ci + 1 <= hostport.length &&
      hostport.substring(ci + 1).forall(c => c >= '0' && c <= '9')) {
      host = hostport.substring(0, ci)
      port = hostport.substring(ci) // ":NNN" (possibly ":")
    }
    host = host.toLowerCase(Locale.ROOT)
    if ((scheme == "http" && port == ":80") ||
      (scheme == "https" && port == ":443") || port == ":") port = ""
    val qi = pathq.indexOf('?')
    var path = if (qi >= 0) pathq.substring(0, qi) else pathq
    val query = if (qi >= 0) pathq.substring(qi + 1) else null
    if (path.isEmpty) path = "/"
    path = pctNormalize(path)
    val qOut = if (query == null) "" else {
      val parts = query.split("&", -1).iterator
        .filter(_.nonEmpty)
        .map(pctNormalize)
        .filter { p =>
          val eq = p.indexOf('=')
          val key = if (eq >= 0) p.substring(0, eq) else p
          !drop.contains(key)
        }
        .toArray
      java.util.Arrays.sort(parts, java.util.Comparator.naturalOrder[String]())
      if (parts.isEmpty) "" else "?" + parts.mkString("&")
    }
    UTF8String.fromString(
      scheme + "://" + userinfo + host + port + path + qOut)
  }
}
