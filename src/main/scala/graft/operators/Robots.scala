package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

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
  * original spec) ignored as a rule. Rule paths support the full RFC
  * 9309 §2.2.3 special characters: `*` matches any character sequence,
  * a trailing `$` anchors the rule at the path end; a rule without `$`
  * matches any path it PREFIXES under expansion. Specificity stays the
  * documented most-octets rule — raw pattern length, wildcards
  * included (the Google implementation's tiebreak).
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
          case "sitemap" => () // file-global line: not a group member
          case _ => uaRun = false
        }
      }
    }
    out.toSeq
  }

  /** RFC 9309 §2.2.3 rule-path match: `*` spans any character
    * sequence, a trailing `$` anchors at the path end, and an
    * unanchored rule matches any path it prefixes under expansion.
    * Greedy leftmost segment placement decides existence exactly (each
    * literal segment between stars is placed at its earliest feasible
    * offset; any later placement only shrinks what remains for the
    * rest). Static so both interpreted eval and generated code call it. */
  def repMatch(path: UTF8String, pattern: UTF8String): Boolean = {
    if (path == null || pattern == null) return false
    val p = path.toString
    var pat = pattern.toString
    val anchored = pat.endsWith("$")
    if (anchored) pat = pat.substring(0, pat.length - 1)
    // char-wise split on '*' — no per-call regex compile in the hot loop
    val segs = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var from = 0
      var at = pat.indexOf('*')
      while (at >= 0) {
        out += pat.substring(from, at)
        from = at + 1
        at = pat.indexOf('*', from)
      }
      out += pat.substring(from)
      out.toArray
    }
    if (!p.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length) {
      val sg = segs(i)
      val last = i == segs.length - 1
      if (sg.isEmpty) {
        if (last) return true // trailing '*' (anchored or not) eats the rest
        // consecutive '*' collapses — nothing to place
      } else if (last && anchored) {
        return p.endsWith(sg) && p.length - sg.length >= pos
      } else {
        val at = p.indexOf(sg, pos)
        if (at < 0) return false
        pos = at + sg.length
      }
      i += 1
    }
    // no wildcard tail: anchored needs exact end, a prefix match else
    if (anchored && segs.length == 1) p.length == pos else true
  }

  /** Codegen'd boolean predicate over (path, rulePattern) — lets the
    * broadcast rules join keep its hash-join shape with the wildcard
    * match as a residual filter. */
  case class RepMatchExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_rep_match"
    override protected def nullSafeEval(l: Any, r: Any): Any =
      repMatch(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (l, r) =>
        s"graft.operators.Robots.repMatch($l, $r)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): RepMatchExpr =
      copy(left = newLeft, right = newRight)
  }

  private def repMatchCol(path: org.apache.spark.sql.Column,
      pattern: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(RepMatchExpr(ColumnBridge.expression(path),
      ColumnBridge.expression(pattern)))
  }

  /** The `User-agent: *` group's Crawl-delay (first occurrence, whole
    * seconds — unparseable or absent → None) and the file-global
    * Sitemap URLs in file order. The de-facto directives next to
    * [[parseRules]]' REP core: Crawl-delay is group-scoped like the
    * rules; Sitemap is defined outside any group (RFC 9309 treats
    * unknown lines as non-group-members). */
  def parseDirectives(txt: String): (Option[Long], Seq[String]) = {
    var inStar = false
    var uaRun = false
    var delay: Option[Long] = None
    val maps = scala.collection.mutable.ArrayBuffer.empty[String]
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (!uaRun) inStar = false
            if (value == "*") inStar = true
            uaRun = true
          case "crawl-delay" =>
            uaRun = false
            if (inStar && delay.isEmpty)
              delay = value.toLongOption
          case "sitemap" =>
            // global: scoped to the file, not the group
            if (value.nonEmpty) maps += value
          case _ => uaRun = false
        }
      }
    }
    (delay, maps.toSeq)
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
        repMatchCol(col("path"), col("graft_rp")), "left")
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

  /** Per-host politeness schedule — the queue arithmetic a polite
    * fetcher runs per host shard: URLs take fetch slots in `orderCol`
    * order within their host, each slot `delaySecCol` seconds after
    * the previous (`start_sec = (slot − 1) · delay_sec`); hosts absent
    * from the delay dim get `defaultDelaySec` (the de-facto 1 s floor).
    *
    * Scale: the delay dim is host-cardinality and BROADCASTS; the slot
    * assignment is one host-keyed window — the same partitioning a
    * host-sharded fetcher fleet uses, so the schedule column costs the
    * shuffle the fetch itself already needs. */
  def politenessSchedule(urls: DataFrame, hostCol: String,
                         orderCol: String, delays: DataFrame,
                         dHostCol: String, delaySecCol: String,
                         defaultDelaySec: Long = 1L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(hostCol)).orderBy(col(orderCol).asc)
    urls
      .join(broadcast(delays.select(col(dHostCol).as("graft_dh"),
        col(delaySecCol).cast("long").as("graft_delay"))),
        col(hostCol) === col("graft_dh"), "left")
      .withColumn("delay_sec",
        coalesce(col("graft_delay"), lit(defaultDelaySec)))
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("start_sec", (col("slot") - 1) * col("delay_sec"))
      .drop("graft_dh", "graft_delay")
  }
}
