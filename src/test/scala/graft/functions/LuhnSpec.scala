package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LuhnSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.unsafe.types.UTF8String

  private def scrub(s: String): String =
    Luhn.scrub(UTF8String.fromString(s)).toString

  test("checksum: textbook vectors and the checkDigit inverse") {
    assert(Luhn.luhnValid("4111111111111111"))
    assert(!Luhn.luhnValid("4111111111111112"))
    assert(Luhn.luhnValid("79927398713")) // the canonical example
    // checkDigit completes any body to a valid number, and +1 breaks it
    for (body <- Seq("411111111111111", "4000123456789", "99", "123456789012345678")) {
      val d = Luhn.checkDigit(body)
      assert(Luhn.luhnValid(body + d), s"body $body")
      assert(!Luhn.luhnValid(body + ((d + 1) % 10)), s"body $body broken")
    }
  }

  test("scrub masks only PAN-length checksum-valid runs") {
    assert(scrub("pay 4111111111111111 now") == "pay <CARD> now")
    assert(scrub("pay 4111111111111112 now") == "pay 4111111111111112 now")
    // 12 digits: too short even if Luhn-valid
    val twelve = "49927398716" // 11 digits, valid
    assert(scrub(s"id $twelve x") == s"id $twelve x")
    // 20 digits: too long — NOT a PAN, untouched even with valid checksum
    val b20 = "1234567890123456789"
    val valid20 = b20 + Luhn.checkDigit(b20)
    assert(valid20.length == 20 && scrub(s"n $valid20") == s"n $valid20")
    // 13- and 19-digit boundaries mask
    val b13 = "402400712345"
    val b19 = "601111111111111111"
    assert(scrub("a " + b13 + Luhn.checkDigit(b13) + " b") == "a <CARD> b")
    assert(scrub("a " + b19 + Luhn.checkDigit(b19) + " b") == "a <CARD> b")
    // multiple runs, mixed validity, adjacency to letters
    val v = "411111111111111" + Luhn.checkDigit("411111111111111")
    assert(scrub(s"$v and 4111111111111112 and x${v}y") ==
      s"<CARD> and 4111111111111112 and x<CARD>y")
    assert(scrub("") == "")
    assert(scrub("no digits at all") == "no digits at all")
  }

  test("expression works inside a codegen'd projection with nulls") {
    val v = "411111111111111" + Luhn.checkDigit("411111111111111")
    val got = Seq((1L, s"x $v"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.cardScrub(col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).get == "x <CARD>" && got(2L).isEmpty)
  }
}
