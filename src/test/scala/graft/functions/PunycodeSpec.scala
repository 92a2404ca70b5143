package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3492 decode vs the JDK's own java.net.IDN (an independent
  * implementation of the same RFC) + degradation grid. */
class PunycodeSpec extends SparkSpec {
  import spark.implicits._

  private def dec(host: String): String =
    Punycode.idnToUnicode(UTF8String.fromString(host)).toString

  test("known ACE labels decode; plain hosts lowercase-pass") {
    assert(dec("xn--mnchen-3ya.example") === "m\u00fcnchen.example")
    assert(dec("XN--BCHER-KVA.de") === "b\u00fccher.de")
    assert(dec("www.Example.COM") === "www.example.com")
    assert(dec("xn--80akhbyknj4f.test") ===
      "\u0438\u0441\u043f\u044b\u0442\u0430\u043d\u0438\u0435.test")
  }

  test("agrees with java.net.IDN on a generated label set") {
    // encode a spread of unicode labels with the JDK, decode with ours
    val labels = Seq("m\u00fcnchen", "b\u00fccher",
      "\u4f8b\u3048.jp".split("\\.")(0), "caf\u00e9-bar",
      "\u03b2\u03cc\u03bb\u03bf\u03c2", "plain", "a-b-c",
      "x\u00e4y\u00f6z\u00fc")
    labels.foreach { l =>
      val ace = java.net.IDN.toASCII(l)
      assert(dec(ace) === java.net.IDN.toUnicode(ace)
        .toLowerCase(java.util.Locale.ROOT), s"label $l (ace $ace)")
    }
  }

  test("malformed ACE stays verbatim, never throws or mangles") {
    assert(dec("xn--!!!.x") === "xn--!!!.x") // bad digits
    assert(dec("xn--.x") === "xn--.x") // empty body... decodes empty?
    assert(dec("xn--mnchen-3ya.xn--!!!") === "m\u00fcnchen.xn--!!!")
    assert(dec("") === "")
  }

  test("codegen column path matches the static call") {
    val got = Seq("xn--mnchen-3ya.DE", "plain.org", null).toDF("h")
      .select(TextFunctions.idnToUnicode(col("h")))
      .as[String].collect().toSeq
    assert(got === Seq("m\u00fcnchen.de", "plain.org", null))
  }
}
