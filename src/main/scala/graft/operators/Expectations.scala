package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the contract-check layer a
  * warehouse runs before publishing a table (the Deequ/Great-Expectations
  * role, re-expressed as plain Catalyst aggregates). Each rule yields one
  * report row `(rule, target, n_checked, n_violations, pass)`; a suite is
  * a Seq of rules evaluated together.
  *
  * Scale posture: every ROW-level rule (not-null, range, regex, accepted
  * set) compiles into ONE shared aggregation pass over the table — a
  * map-side-combinable conditional-sum per rule, unpivoted from the single
  * 1-row aggregate via explode, so adding a rule adds a column, never a
  * scan. Key-level rules need their own shapes: uniqueness is one
  * count-distinct aggregate; referential integrity is one left join
  * against the DISTINCT dimension keys (dimension key sets are
  * AQE-broadcast-sized in a star schema) with a conditional-sum on the
  * miss side — no anti-join second pass, one scan per rule.
  *
  * Null semantics (documented, not accidental): range / regex / accepted
  * set rules SKIP nulls (a null is `NotNull`'s business — counting it
  * twice double-reports one defect); referential integrity checks only
  * non-null foreign keys (nullable FKs are legal in a star schema);
  * uniqueness counts whole-row key duplicates beyond the first occurrence.
  */
object Expectations {

  sealed trait Rule
  /** `column` must never be null. */
  final case class NotNull(column: String) extends Rule
  /** The tuple `columns` must be unique across the table. */
  final case class Unique(columns: Seq[String]) extends Rule
  /** Non-null values of `column` must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule
  /** Non-null values of `column` must match `regex` (Spark `rlike`). */
  final case class Matches(column: String, regex: String) extends Rule
  /** Non-null values of `column` must be one of `allowed`. */
  final case class OneOf(column: String, allowed: Seq[String]) extends Rule
  /** Non-null `column` values must exist in `dim.dimCol` (FK integrity);
    * `dimName` labels the report row. */
  final case class RefIntegrity(column: String, dim: DataFrame,
                                dimCol: String, dimName: String) extends Rule

  /** Referential-integrity audit across tables — the FK leg the in-table
    * [[check]] rules deliberately exclude: per (fact, dimension) pair,
    * the fact rows whose key has no dimension match (orphans) and the
    * null-key rows (which can never join), counted exactly. One LEFT
    * ANTI join per pair — broadcast when the dim is small, shuffled
    * otherwise; Catalyst picks. The dangling-reference readout every
    * warehouse load gate wants next to its range/set checks. */
  def fkAudit(pairs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(pairs.nonEmpty, "fkAudit needs at least one (fact, dim) pair")
    pairs.map { case (name, fact, fkCol, dim, pkCol) =>
      val keyed = fact.select(col(fkCol).as("graft_k"))
      val nonNull = keyed.filter(col("graft_k").isNotNull)
      val orphans = nonNull.join(
        dim.select(col(pkCol).as("graft_k")).distinct(),
        Seq("graft_k"), "left_anti")
      keyed.agg(count(lit(1)).as("n_rows"),
        sum(col("graft_k").isNull.cast("long")).as("n_null_keys"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("relation"), col("n_rows"),
          coalesce(col("n_null_keys"), lit(0L)).as("n_null_keys"),
          col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency audit — the schema-knowledge profiler next
    * to [[fkAudit]]'s referential one: for each DECLARED candidate
    * "lhs → rhs", how many lhs keys map to more than one rhs value (a
    * true dependency audits clean; a believed-but-false one is exactly
    * the data-model bug this surfaces — denormalization drift, dirty
    * merges, non-unique "natural keys"). NULL rhs values count as a
    * value of their own (a key mapping to {x, NULL} is two behaviors).
    *
    * Per dependency: ONE lhs-keyed aggregate (countDistinct rhs — the
    * map-combinable shape), then a bounded rollup; dependencies are a
    * declared handful, so the report unions a handful of aggregates.
    * Violation ratio in floor-ppm over the key count. */
  def fdAudit(df: DataFrame,
              deps: Seq[(Seq[String], String)]): DataFrame = {
    require(deps.nonEmpty, "fdAudit needs at least one lhs -> rhs pair")
    deps.map { case (lhs, rhs) =>
      require(lhs.nonEmpty, "dependency lhs must name at least one column")
      val name = s"${lhs.mkString("+")}->$rhs"
      val perKey = df
        .select((lhs :+ rhs).map(col): _*)
        .groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("graft_d"),
          max(col(rhs).isNull.cast("long")).as("graft_hasnull"))
        // NULL is its own behavior: {x, NULL} under one key violates
        .select((col("graft_d") + col("graft_hasnull")).as("graft_n"))
      perKey.agg(count(lit(1)).as("n_keys"),
        sum(when(col("graft_n") > 1, 1L).otherwise(0L))
          .as("n_violating_keys"),
        max("graft_n").as("max_rhs_per_key"))
        .select(lit(name).as("dependency"), col("n_keys"),
          col("n_violating_keys"), col("max_rhs_per_key"),
          expr("CASE WHEN n_keys = 0 THEN CAST(NULL AS BIGINT)"
            + " ELSE n_violating_keys * 1000000 div n_keys END")
            .as("violation_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Evaluate `rules` against `df`. Returns one row per rule, in a
    * deterministic report schema: rule name, target column(s),
    * rows checked, violations found, pass flag. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check needs at least one rule")
    val rowRules = rules.collect {
      case r: NotNull => ("not_null", r.column, col(r.column).isNull)
      case r: InRange => ("in_range", r.column,
        !(col(r.column) >= r.lo && col(r.column) <= r.hi))
      case r: Matches => ("matches", r.column, !col(r.column).rlike(r.regex))
      case r: OneOf   => ("one_of", r.column,
        !col(r.column).isInCollection(r.allowed))
    }
    val rowReport: Option[DataFrame] = if (rowRules.isEmpty) None else {
      val aggs = count(lit(1)).as("graft_n") +:
        rowRules.zipWithIndex.map { case ((_, _, bad), i) =>
          // when() treats a null predicate as false, giving the SKIP-null
          // semantics documented above.
          sum(when(bad, 1L).otherwise(0L)).as(s"graft_v$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // Unpivot the single aggregate row — one report row per rule off
      // the SAME 1-row frame, so the table is scanned exactly once.
      Some(one.select(explode(array(rowRules.zipWithIndex.map {
        case ((name, target, _), i) =>
          struct(lit(name).as("rule"), lit(target).as("target"),
            col("graft_n").as("n_checked"),
            col(s"graft_v$i").as("n_violations"))
      }: _*)).as("graft_r")).select("graft_r.*"))
    }
    val keyReports = rules.collect {
      case Unique(cols) =>
        df.agg(count(lit(1)).as("n_checked"),
            countDistinct(cols.head, cols.tail: _*).as("graft_d"))
          .select(lit("unique").as("rule"),
            lit(cols.mkString(",")).as("target"), col("n_checked"),
            (col("n_checked") - col("graft_d")).as("n_violations"))
      case RefIntegrity(fk, dim, dimCol, dimName) =>
        // One scan: left join against the distinct dimension keys, count
        // misses. The distinct key set of a dimension is broadcast-sized;
        // AQE picks BroadcastHashJoin on its post-shuffle size.
        df.select(col(fk).as("graft_fk")).filter(col("graft_fk").isNotNull)
          .join(dim.select(col(dimCol).as("graft_fk")).distinct()
            .withColumn("graft_hit", lit(1)), Seq("graft_fk"), "left")
          .agg(count(lit(1)).as("n_checked"),
            sum(when(col("graft_hit").isNull, 1L).otherwise(0L))
              .as("n_violations"))
          .select(lit("ref_integrity").as("rule"),
            lit(s"$fk->$dimName.$dimCol").as("target"),
            col("n_checked"), col("n_violations"))
    }
    (rowReport.toSeq ++ keyReports).reduce(_ unionByName _)
      .select(col("rule"), col("target"), col("n_checked").cast("long"),
        coalesce(col("n_violations"), lit(0L)).cast("long")
          .as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Row-level verdicts for ROW-LOCAL rules: every row annotated with a
    * `violated` column — a comma-joined list of `rule:column` labels in
    * rule order, empty string for a clean row. The quarantine primitive:
    * map-only (no shuffle, no aggregate), so it composes into a streaming
    * micro-batch gate unchanged. Uniqueness and referential integrity are
    * deliberately rejected here — the first needs a survivor policy
    * (that's [[Dedup]]'s business), the second a dimension join that a
    * quarantine split would re-run per sink. */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val parts = rules.map {
      case NotNull(c) => (s"not_null:$c", col(c).isNull)
      case InRange(c, lo, hi) =>
        (s"in_range:$c", !(col(c) >= lo && col(c) <= hi))
      case Matches(c, re) => (s"matches:$c", !col(c).rlike(re))
      case OneOf(c, a) => (s"one_of:$c", !col(c).isInCollection(a))
      case r => throw new IllegalArgumentException(
        s"violations() takes row-local rules only, got $r")
    }
    // concat_ws drops the nulls from non-violated rules on any engine.
    df.withColumn("violated", concat_ws(",",
      parts.map { case (n, bad) => when(bad, lit(n)) }: _*))
  }

  /** Just the rows that violate at least one row-local rule, with their
    * `violated` labels — the dead-letter side of the split. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame =
    violations(df, rules).filter(col("violated") =!= "")
}
