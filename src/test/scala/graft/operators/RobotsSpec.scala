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

  private def m(path: String, pat: String): Boolean =
    Robots.repMatch(
      org.apache.spark.unsafe.types.UTF8String.fromString(path),
      org.apache.spark.unsafe.types.UTF8String.fromString(pat))

  test("repMatch: RFC 9309 wildcard/anchor grid") {
    // plain prefixes (the no-special-char fast path)
    assert(m("/a/b", "/a"))
    assert(!m("/a/b", "/b"))
    // '*' spans any sequence, including empty
    assert(m("/x/file.pdf", "/*.pdf"))
    assert(m("/file.pdf", "/*.pdf")) // empty span
    assert(m("/a/b/c/private/x", "/*/private/"))
    assert(!m("/a/b/c/xprivate/x", "/*/private/"))
    // unanchored matches a PREFIX under expansion
    assert(m("/x/file.pdf.txt", "/*.pdf"))
    // '$' anchors at the path end
    assert(m("/x/file.pdf", "/*.pdf$"))
    assert(!m("/x/file.pdf.txt", "/*.pdf$"))
    assert(m("/tmp/keep", "/tmp/keep$"))
    assert(!m("/tmp/keeper", "/tmp/keep$"))
    // trailing '*' eats the rest; '*$' is any suffix
    assert(m("/tmp/anything", "/tmp*"))
    assert(m("/tmp/anything", "/tmp*$"))
    // consecutive stars collapse
    assert(m("/a/b/c", "/a**c"))
    // two placements needed: greedy leftmost still finds it
    assert(m("/ab/cd/ab/ef", "/ab*ef"))
    assert(m("/abcbc", "/*bc$")) // later placement satisfies the anchor
  }

  test("parseDirectives: star-scoped crawl-delay, global sitemaps," +
    " sitemap lines do not break UA runs") {
    val txt =
      """User-agent: gbot
        |Crawl-delay: 7
        |Sitemap: https://h.ex/a.xml
        |User-agent: x
        |Sitemap: https://h.ex/b.xml
        |User-agent: *
        |Crawl-delay: 3
        |Crawl-delay: 9
        |Disallow: /p
        |""".stripMargin
    val (d, sm) = Robots.parseDirectives(txt)
    assert(d === Some(3L)) // first star-group value wins; gbot's invisible
    assert(sm === Seq("https://h.ex/a.xml", "https://h.ex/b.xml"))
    assert(Robots.parseDirectives("") === ((None, Seq())))
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: fast\n")._1 === None) // unparseable
    // a sitemap between consecutive UA lines leaves the run intact
    val run = "User-agent: a\nSitemap: s\nUser-agent: *\nDisallow: /q\n"
    assert(Robots.parseRules(run) === Seq(("/q", false)))
  }

  test("politenessSchedule: slots per host, default delay for unknown" +
    " hosts") {
    val urls = Seq(("h1", 10L), ("h1", 20L), ("h1", 30L), ("h2", 5L))
      .toDF("host", "ord")
    val delays = Seq(("h1", 4L)).toDF("hd", "dd")
    val got = Robots.politenessSchedule(urls, "host", "ord",
        delays, "hd", "dd", defaultDelaySec = 2L)
      .select("host", "ord", "delay_sec", "slot", "start_sec")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("h1", 10L, 4L, 1L, 0L), ("h1", 20L, 4L, 2L, 4L),
      ("h1", 30L, 4L, 3L, 8L), ("h2", 5L, 2L, 1L, 0L)))
  }
}
