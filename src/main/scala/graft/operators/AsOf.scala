package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join: attach to each left row the most recent right
  * value with right.ts ≤ left.ts for the same key — the snapshot-enrichment
  * join relational engines special-case (DuckDB ASOF JOIN); Spark has no
  * built-in, so this composes it as union + last-value window:
  *
  * tag sides → unionByName → one shuffle on (key), sort by (ts, side) →
  * running `last(value, ignoreNulls)` → keep left rows.
  *
  * That is the scalable formulation: a single hash shuffle and sort per
  * side (identical to what a dedicated merge-join ASOF operator would do),
  * no range cross-product, and AQE-friendly. Ties at equal ts resolve
  * right-before-left, so a right row at exactly left.ts matches (ASOF
  * inclusive semantics). Right rows sharing (key, ts) need a caller-side
  * tiebreak to be deterministic — at nanosecond precision ties don't occur.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String, outCol: String): DataFrame = {
    val rv = right.schema(valueCol).dataType
    val l = left
      .withColumn("graft_side", lit(1))
      .withColumn("graft_rv", lit(null).cast(rv))
    val r = right
      .select(col(key), col(ts), col(valueCol).as("graft_rv"))
      .withColumn("graft_side", lit(0))
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol, last(col("graft_rv"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 1)
      .drop("graft_side", "graft_rv")
  }

  /** The full pandas-`merge_asof` surface over the same one-shuffle
    * union formulation: `direction` picks the most recent right row at
    * or before (`backward`) or the earliest at or after (`forward`)
    * each left timestamp, and `toleranceUs` voids matches farther than
    * the tolerance (both the value AND the matched timestamp column
    * null out together — a stale match must not half-survive). Equal
    * timestamps match in BOTH directions (inclusive ASOF semantics:
    * the side ordering scans the right row first either way). Output
    * adds `outCol` and `outCol_ts` (the matched right timestamp — the
    * lag/lead distance is usually the point of a tolerance join).
    *
    * Determinism: right rows tied on (key, ts) resolve by VALUE — the
    * window ordering breaks the tie on `valueCol` ascending, so the
    * greatest value among equal-timestamp right rows wins, every run.
    * This requires an orderable value type (numeric/string/array —
    * not map); callers wanting a different tie policy (e.g. q399's
    * max-cents) should pre-collapse the right side to one row per
    * (key, ts) before calling.
    *
    * Scale: identical to [[asofJoin]] — one hash shuffle + sort per
    * side, a running last over the union, never a range product. */
  def asofJoinDirected(left: DataFrame, right: DataFrame, key: String,
                       ts: String, valueCol: String, outCol: String,
                       direction: String,
                       toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    toleranceUs.foreach(t => require(t >= 0, "tolerance must be >= 0"))
    val rv = right.schema(valueCol).dataType
    val l = left
      .withColumn("graft_side", lit(1))
      .withColumn("graft_rv", lit(null).cast(rv))
      .withColumn("graft_rts", lit(null).cast("long"))
    val r = right
      .select(col(key), col(ts), col(valueCol).as("graft_rv"),
        col(ts).cast("long").as("graft_rts"))
      .withColumn("graft_side", lit(0))
    val ord = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(key)
      .orderBy(ord, col("graft_side").asc,
        col("graft_rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap =
      if (direction == "backward") expr(s"$ts - graft_mts")
      else expr(s"graft_mts - $ts")
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("graft_mv", last(col("graft_rv"), ignoreNulls = true).over(w))
      .withColumn("graft_mts", last(col("graft_rts"), ignoreNulls = true).over(w))
      .filter(col("graft_side") === 1)
      .withColumn("graft_ok", toleranceUs match {
        case Some(t) => col("graft_mts").isNotNull && gap <= t
        case None => col("graft_mts").isNotNull
      })
      .withColumn(outCol, when(col("graft_ok"), col("graft_mv")))
      .withColumn(outCol + "_ts", when(col("graft_ok"), col("graft_mts")))
      .drop("graft_side", "graft_rv", "graft_rts", "graft_mv",
        "graft_mts", "graft_ok")
  }

  /** NEAREST as-of join (pandas `merge_asof(direction='nearest')`, the
    * Wayback closest-capture lookup): each left row takes the right row
    * whose timestamp is closest in EITHER direction, ties going to the
    * earlier (backward) side — deterministic, and the exact-match case
    * falls out of it (distance 0 is backward). Composed as one backward
    * + one forward [[asofJoinDirected]] pass and a per-row distance
    * pick, so the cost is two key-hash shuffles + sorts — never a range
    * product (the same scale posture as the directed joins). An
    * optional tolerance bounds the match distance symmetrically. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      ts: String, valueCol: String, outCol: String,
                      toleranceUs: Option[Long] = None): DataFrame = {
    val b = asofJoinDirected(left, right, key, ts, valueCol,
      "graft_nb", "backward", toleranceUs)
    val f = asofJoinDirected(b, right, key, ts, valueCol,
      "graft_nf", "forward", toleranceUs)
    val db = col(ts).cast("long") - col("graft_nb_ts")
    val df_ = col("graft_nf_ts") - col(ts).cast("long")
    val takeBack = col("graft_nb_ts").isNotNull &&
      (col("graft_nf_ts").isNull || db <= df_)
    f
      .withColumn(outCol, when(takeBack, col("graft_nb"))
        .otherwise(col("graft_nf")))
      .withColumn(outCol + "_ts", when(takeBack, col("graft_nb_ts"))
        .otherwise(col("graft_nf_ts")))
      .drop("graft_nb", "graft_nb_ts", "graft_nf", "graft_nf_ts")
  }
}
