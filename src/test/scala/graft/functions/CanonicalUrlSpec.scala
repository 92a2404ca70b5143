package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** RFC 3986 §6 normalization grid for [[CanonicalUrl]] — interpreted
  * path via direct calls, codegen path via a DataFrame select. */
class CanonicalUrlSpec extends SparkSpec {
  import spark.implicits._

  private val drop = {
    val s = new java.util.HashSet[String]()
    CanonicalUrl.DefaultTrackers.foreach(s.add)
    s
  }

  private def c(u: String): String =
    CanonicalUrl.canonical(
      org.apache.spark.unsafe.types.UTF8String.fromString(u), drop)
      .toString

  test("scheme/host lowercase, default port and fragment stripped") {
    assert(c("HTTPS://WWW.Ex.COM:443/P/q#frag") === "https://www.ex.com/P/q")
    assert(c("HTTP://A.B:80") === "http://a.b/")
    assert(c("http://a.b:8080/x") === "http://a.b:8080/x") // kept
    assert(c("ftp://Host.Z:21/f") === "ftp://host.z:21/f") // not a default
  }

  test("percent normalization: unreserved decoded, rest uppercased," +
    " malformed verbatim") {
    assert(c("https://a.b/%41%7e%2f%3d") === "https://a.b/A~%2F%3D")
    assert(c("https://a.b/x%zz/%4") === "https://a.b/x%zz/%4")
    assert(c("https://a.b/?k=%61%26") === "https://a.b/?k=a%26")
  }

  test("query: trackers dropped, empties dropped, rest sorted," +
    " emptied query loses its ?") {
    assert(c("https://a.b/p?z=1&utm_source=x&a=2&&b") ===
      "https://a.b/p?a=2&b&z=1")
    assert(c("https://a.b/p?utm_medium=m&gclid=g") === "https://a.b/p")
    // the key match is post-normalization: %75tm_source is utm_source
    assert(c("https://a.b/p?%75tm_source=x&k=1") === "https://a.b/p?k=1")
  }

  test("userinfo preserved, IPv6 bracket port split, non-URLs verbatim") {
    assert(c("https://U:p@Host.X/q") === "https://U:p@host.x/q")
    assert(c("http://[2001:DB8::1]:80/x") === "http://[2001:db8::1]/x")
    assert(c("http://[2001:DB8::1]:8080/x") === "http://[2001:db8::1]:8080/x")
    assert(c("not a url") === "not a url")
    assert(c("mailto:x@y.z") === "mailto:x@y.z") // no ://
    assert(c("weird scheme://a/b") === "weird scheme://a/b") // bad scheme
  }

  test("codegen path matches interpreted on a mixed column") {
    val urls = Seq(
      "HTTPS://A.B:443/x?utm_source=1&b=2&a=%41#f",
      "http://c.d:8080/%7Eu?z=9&y=8",
      "plain text",
      null).toDF("u")
    val got = urls.select(
        graft.functions.TextFunctions.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "https://a.b/x?a=A&b=2",
      "http://c.d:8080/~u?y=8&z=9",
      "plain text",
      null))
  }
}
