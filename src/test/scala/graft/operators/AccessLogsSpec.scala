package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AccessLogsSpec extends SparkSpec {
  import spark.implicits._

  test("ipv4ToLong: boundary quads and invalid forms") {
    val got = Seq("0.0.0.0", "255.255.255.255", "1.2.3.4",
      "256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "01.2.3.4")
      .toDF("ip").select(AccessLogs.ipv4ToLong(col("ip")))
      .as[Option[Long]].collect().toSeq
    assert(got === Seq(Some(0L), Some(4294967295L), Some(16909060L),
      None, None, None, None, Some(16909060L))) // leading zero tolerated
  }

  test("cidrFilter: range edges inclusive-lo/exclusive-hi, /32 and /0," +
    " unlisted IPs survive unblocked") {
    val rows = Seq("10.1.0.0", "10.1.255.255", "10.2.0.0",
      "9.255.255.255", "7.7.7.7", "bad").toDF("ip")
    val block = Seq("10.1.0.0/16", "7.7.7.7/32").toDF("cidr")
    val got = AccessLogs.cidrFilter(rows, "ip", block, "cidr")
      .select("ip", "blocked", "matched_cidr")
      .as[(String, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("10.1.0.0") === ((true, Some("10.1.0.0/16")))) // lo edge
    assert(got("10.1.255.255") === ((true, Some("10.1.0.0/16")))) // hi-1
    assert(got("10.2.0.0") === ((false, None))) // hi is exclusive
    assert(got("9.255.255.255") === ((false, None)))
    assert(got("7.7.7.7") === ((true, Some("7.7.7.7/32"))))
    assert(got("bad") === ((false, None)))
    // a /0 matches everything valid; longest prefix still reported
    val all = Seq("0.0.0.0/0", "7.0.0.0/8").toDF("cidr")
    val g2 = AccessLogs.cidrFilter(Seq("7.1.2.3", "8.8.8.8").toDF("ip"),
        "ip", all, "cidr")
      .select("ip", "matched_cidr").as[(String, String)].collect().toMap
    assert(g2("7.1.2.3") === "7.0.0.0/8") // /8 beats /0
    assert(g2("8.8.8.8") === "0.0.0.0/0")
    // an unmasked base (10.1.2.3/16) still covers its whole /16
    val sloppy = Seq("10.1.2.3/16").toDF("cidr")
    val g3 = AccessLogs.cidrFilter(Seq("10.1.0.1").toDF("ip"),
      "ip", sloppy, "cidr").select("blocked").as[Boolean].head()
    assert(g3)
  }

  test("uaClassify precedence: Edge before Chrome before Safari;" +
    " bots never get a family") {
    val (isBot, fam) = AccessLogs.uaClassify(col("ua"))
    val got = Seq(
      "Mozilla/5.0 Chrome/1 Safari/2 Edg/3",
      "Mozilla/5.0 Chrome/1 Safari/2",
      "Mozilla/5.0 Version/17 Safari/605",
      "Mozilla/5.0 Firefox/128.0",
      "Mozilla/5.0 (compatible; YandexBot/3.0) Chrome/1",
      "weird client").toDF("ua")
      .select(isBot, fam).as[(Boolean, Option[String])].collect().toSeq
    assert(got === Seq((false, Some("Edge")), (false, Some("Chrome")),
      (false, Some("Safari")), (false, Some("Firefox")),
      (true, None), (false, None)))
  }

  test("parseCombined: quoted referer/UA with spaces, '-' conventions") {
    val line = """1.2.3.4 - bob [17/Aug/2026:10:00:00 +0000] """ +
      """"POST /api/x HTTP/2.0" 201 77 "http://r.ex/a b" "UA with spaces""""
    val r = AccessLogs.parseCombined(Seq((1L, line)).toDF("id", "l"),
      "id", "l").collect()(0)
    assert(r.getAs[String]("ip") === "1.2.3.4")
    assert(r.getAs[String]("user") === "bob")
    assert(r.getAs[String]("method") === "POST")
    assert(r.getAs[String]("path") === "/api/x")
    assert(r.getAs[Long]("status") === 201L)
    assert(r.getAs[Long]("bytes") === 77L)
    assert(r.getAs[String]("referer") === "http://r.ex/a b")
    assert(r.getAs[String]("user_agent") === "UA with spaces")
  }
}
