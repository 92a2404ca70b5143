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
}
