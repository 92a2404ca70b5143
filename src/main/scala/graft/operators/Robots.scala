package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt politeness gate — the crawl-side counterpart of
  * [[Corpus.urlFilter]]'s curation blocklist (REP, RFC 9309): a host's
  * robots.txt is parsed into its `User-agent: *` group's Allow/Disallow
  * path prefixes, and each URL takes the verdict of the LONGEST
  * matching rule (the most-specific-wins resolution Google documents),
  * Allow winning length ties. A URL with no matching rule — or a host
  * with no robots.txt at all — is allowed (REP's default-open rule).
  *
  * Parsing is line-oriented and deliberately minimal-but-real:
  * case-insensitive field names, `#` comments stripped, groups split at
  * `User-agent` lines (consecutive UA lines share a group), only the
  * `*` group's rules apply, empty Disallow ("allow everything" in the
  * original spec) ignored as a rule. Wildcards inside paths are out of
  * scope (documented; prefix rules cover the overwhelming majority of
  * real robots files).
  *
  * Scale: the robots dim is host-cardinality (tiny) — rules explode
  * from it and BROADCAST onto the URL table; the longest-match pick is
  * a per-URL window over the matched-rule fan-out (bounded by rules
  * per host), never a corpus-wide sort. */
object Robots {

  /** The `User-agent: *` group's rules: (pathPrefix, isAllow), in file
    * order. Pure line arithmetic — deterministic on any engine. */
  def parseRules(txt: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    var inStar = false
    var uaRun = false // consecutive User-agent lines share a group
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!uaRun) inStar = false // a NEW group starts
            if (value == "*") inStar = true
            uaRun = true
          case "allow" | "disallow" =>
            uaRun = false
            if (inStar && value.nonEmpty)
              out += ((value, key == "allow"))
          case _ => uaRun = false
        }
      }
    }
    out.toSeq
  }

  /** URLs gated by their host's robots.txt: adds `host`, `path`,
    * `allowed`, and `matched_rule` (NULL when no rule matched). */
  def robotsFilter(urls: DataFrame, urlCol: String,
                   robots: DataFrame, hostCol: String,
                   txtCol: String): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val rules = robots.select(col(hostCol).as("graft_h"),
        col(txtCol).as("graft_txt"))
      .as[(String, String)]
      .flatMap { case (h, txt) =>
        parseRules(Option(txt).getOrElse("")).map { case (p, a) =>
          (h, p, a, p.length.toLong) }
      }
      .toDF("graft_h", "graft_rp", "graft_allow", "graft_rlen")
    val parts = urls
      .withColumn("graft_rid", monotonically_increasing_id())
      .withColumn("host",
        regexp_replace(regexp_replace(
          lower(regexp_extract(col(urlCol), "^[a-zA-Z]+://([^/?#]+)", 1)),
          "^.*@", ""), ":[0-9]+$", ""))
      .withColumn("path",
        regexp_extract(col(urlCol), "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1))
    // Partition by a per-row identity, not the URL value: two input
    // rows sharing a URL must each survive (row-level enrichment never
    // drops rows). Final graft_rp tiebreak pins matched_rule when two
    // same-length same-verdict rules both match.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_rid"))
      .orderBy(col("graft_rlen").desc, col("graft_allow").desc,
        col("graft_rp").asc)
    parts
      .join(broadcast(rules), col("host") === col("graft_h") &&
        col("path").startsWith(col("graft_rp")), "left")
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .withColumn("allowed",
        coalesce(col("graft_allow"), lit(true))) // default-open
      .withColumn("matched_rule",
        when(col("graft_allow").isNotNull,
          concat(when(col("graft_allow"), lit("allow:"))
            .otherwise(lit("disallow:")), col("graft_rp"))))
      .drop("graft_h", "graft_rp", "graft_allow", "graft_rlen",
        "graft_rn", "graft_rid")
  }
}
