package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Server-access-log analytics — the OTHER side of the crawl story
  * ([[Robots]] is the crawler being polite; this is the server seeing
  * crawlers arrive): NCSA Combined Log Format parsing, IPv4/CIDR
  * blocklist containment, and user-agent classification. All pure
  * codegen'd expression work — regex extracts and integer arithmetic,
  * zero shuffle except where a broadcast dim is the point.
  */
object AccessLogs {

  /** NCSA Combined Log Format parse:
    * `ip - user [ts] "METHOD path HTTP/v" status bytes "referer" "ua"`.
    * Unparseable lines keep their row with NULL fields (the
    * absent-means-NULL family convention); `bytes` of `-` is NULL (the
    * CLF convention for no body), status/bytes are longs. */
  def parseCombined(logs: DataFrame, idCol: String,
                    lineCol: String): DataFrame = {
    val re = "^(\\S+) \\S+ (\\S+) \\[([^\\]]+)\\] " +
      "\"(\\S+) (\\S+) [^\"]*\" (\\d{3}) (\\S+) \"([^\"]*)\" \"([^\"]*)\"$"
    def part(i: Int): Column = {
      val v = regexp_extract(col(lineCol), re, i)
      when(length(v) > 0, v)
    }
    logs.select(col(idCol),
      part(1).as("ip"),
      part(2).as("user"),
      part(3).as("ts_raw"),
      part(4).as("method"),
      part(5).as("path"),
      part(6).cast("long").as("status"),
      when(part(7) === "-", lit(null).cast("long"))
        .otherwise(part(7).cast("long")).as("bytes"),
      when(part(8) =!= "-", part(8)).as("referer"),
      part(9).as("user_agent"))
  }

  /** Dotted-quad IPv4 → uint32 (as LONG); NULL for anything that is
    * not four in-range octets. Pure integer arithmetic — replayable on
    * any engine. */
  def ipv4ToLong(ip: Column): Column = {
    // guard the cast: a no-match extract is '' and ANSI cast throws
    def oct(i: Int): Column = {
      val v = regexp_extract(ip,
        "^(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})\\.(\\d{1,3})$", i)
      when(length(v) > 0, v.cast("long"))
    }
    val a = oct(1); val b = oct(2); val c = oct(3); val d = oct(4)
    when(a.isNotNull && b.isNotNull && c.isNotNull && d.isNotNull &&
      a <= 255 && b <= 255 && c <= 255 && d <= 255,
      a * 16777216L + b * 65536L + c * 256L + d)
  }

  /** Rows gated by a CIDR blocklist: the blocklist dim (cidr strings
    * `a.b.c.d/p`) BROADCASTS as [base, top) ranges; a row is blocked
    * iff its ip32 falls in any range (longest-prefix rule is
    * irrelevant for a pure block/allow verdict — any hit blocks).
    * Row-level enrichment: every input row survives, gaining `ip32`,
    * `blocked`, and the first (longest-prefix, then lexical) matching
    * cidr as `matched_cidr`. */
  def cidrFilter(rows: DataFrame, ipCol: String,
                 blocklist: DataFrame, cidrCol: String): DataFrame = {
    val base = ipv4ToLong(regexp_extract(col(cidrCol), "^([^/]+)/", 1))
    val plenRaw = regexp_extract(col(cidrCol), "/(\\d{1,2})$", 1)
    val plen = when(length(plenRaw) > 0, plenRaw.cast("int"))
    val dim = blocklist.select(col(cidrCol).as("graft_cidr"),
        base.as("graft_b0"), plen.as("graft_p"))
      .filter(col("graft_b0").isNotNull && col("graft_p").between(0, 32))
      // mask the base down to the prefix and compute the exclusive top
      .select(col("graft_cidr"), col("graft_p"),
        (col("graft_b0") - pmod(col("graft_b0"),
          pow(lit(2.0), lit(32) - col("graft_p")).cast("long")))
          .as("graft_lo"))
      .select(col("graft_cidr"), col("graft_p"), col("graft_lo"),
        (col("graft_lo") + pow(lit(2.0), lit(32) - col("graft_p"))
          .cast("long")).as("graft_hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_rid")
      .orderBy(col("graft_p").desc_nulls_last,
        col("graft_cidr").asc_nulls_last)
    rows
      .withColumn("graft_rid", monotonically_increasing_id())
      .withColumn("ip32", ipv4ToLong(col(ipCol)))
      .join(broadcast(dim),
        col("ip32").isNotNull && col("ip32") >= col("graft_lo") &&
          col("ip32") < col("graft_hi"), "left")
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .withColumn("blocked", col("graft_cidr").isNotNull)
      .withColumn("matched_cidr", col("graft_cidr"))
      .drop("graft_rid", "graft_cidr", "graft_p", "graft_lo",
        "graft_hi", "graft_rn")
  }

  /** The documented default bot markers (substring match on the UA,
    * case-insensitive) — callers pass their own list at scale. */
  val DefaultBotMarkers: Seq[String] = Seq(
    "googlebot", "bingbot", "yandexbot", "duckduckbot", "baiduspider",
    "python-requests", "curl/", "wget/", "scrapy", "bot/", "spider")

  /** User-agent classification: `is_bot` (any marker substring,
    * case-insensitive) and the browser family with the REAL precedence
    * rules — Edge before Chrome (Edge UAs contain Chrome), Chrome
    * before Safari (Chrome UAs contain Safari), Firefox standalone;
    * bots and unknowns report family NULL. */
  def uaClassify(ua: Column, botMarkers: Seq[String] = DefaultBotMarkers)
      : (Column, Column) = {
    val l = lower(ua)
    val isBot = botMarkers.map(m => l.contains(lit(m)))
      .reduce(_ || _)
    val family = when(isBot, lit(null).cast("string"))
      .when(l.contains("edg/") || l.contains("edge/"), "Edge")
      .when(l.contains("chrome/"), "Chrome")
      .when(l.contains("firefox/"), "Firefox")
      .when(l.contains("safari/"), "Safari")
    (isBot, family)
  }
}
