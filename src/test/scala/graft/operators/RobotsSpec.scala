package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** robots.txt gate semantics: REP longest-match resolution, row-level
  * enrichment invariants (never drops or merges rows), deterministic
  * matched_rule under ties. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parseRules: star group only, shared UA runs, comments, empties") {
    val txt =
      """# header comment
        |User-agent: googlebot
        |Disallow: /g/
        |User-agent: *
        |User-agent: other
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok/
        |Disallow:
        |Crawl-delay: 5
        |User-agent: bingbot
        |Disallow: /b/
        |""".stripMargin
    assert(Robots.parseRules(txt) ===
      Seq(("/private/", false), ("/private/ok/", true)))
    assert(Robots.parseRules("") === Seq.empty)
  }

  test("robotsFilter: duplicate URL values each survive (row-level)") {
    // Two frontier rows share a URL (discovered from different pages):
    // the gate must emit BOTH, not collapse them to one.
    val urls = Seq(
      ("p1", "https://a.example/private/x"),
      ("p2", "https://a.example/private/x"),
      ("p3", "https://a.example/ok")).toDF("src_page", "url")
    val robots = Seq(("a.example",
      "User-agent: *\nDisallow: /private/\n")).toDF("h", "txt")
    val out = Robots.robotsFilter(urls, "url", robots, "h", "txt")
    assert(out.count() === 3L)
    val dup = out.filter(col("url") === "https://a.example/private/x")
      .select("src_page", "allowed").as[(String, Boolean)]
      .collect().sortBy(_._1)
    assert(dup === Array(("p1", false), ("p2", false)))
  }

  test("robotsFilter: longest match wins, Allow breaks length ties," +
    " rule-path breaks same-verdict ties deterministically") {
    val urls = Seq(
      ("https://a.example/private/ok/1"), // allow /private/ok/ (longest)
      ("https://a.example/aaa/zz"),       // /aaa/ vs /aab/ same len: only /aaa/ matches
      ("https://a.example/dup/x"),        // two identical-length disallow rules match
      ("https://nobots.example/q")        // no robots row → default open
    ).toDF("url")
    val robots = Seq(("a.example",
      "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n" +
        "Disallow: /aaa/\nDisallow: /aab/\n" +
        "Disallow: /dup/\nDisallow: /du p/\n".replace(" ", "") +
        "Allow: /dup\n")).toDF("h", "txt")
    val out = Robots.robotsFilter(urls, "url", robots, "h", "txt")
      .select("url", "allowed", "matched_rule")
      .as[(String, Boolean, String)].collect()
      .map { case (k, v, m) => (k, (v, m)) }.toMap
    assert(out("https://a.example/private/ok/1") ===
      ((true, "allow:/private/ok/")))
    assert(out("https://a.example/aaa/zz") === ((false, "disallow:/aaa/")))
    // /dup/ matched by "disallow:/dup/" (len 5) twice-planted and
    // "allow:/dup" (len 4): longest wins → disallowed; the same-length
    // same-verdict pair resolves by rule path asc — stable across runs.
    assert(out("https://a.example/dup/x") === ((false, "disallow:/dup/")))
    assert(out("https://nobots.example/q")._1 === true)
    assert(out("https://nobots.example/q")._2 === null)
  }
}
