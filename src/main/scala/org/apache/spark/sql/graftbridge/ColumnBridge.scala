package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 gates this conversion
  * behind private[sql] (`classic.ExpressionUtils`), so a library defining
  * its own native expressions needs this one-file shim inside the sql
  * package namespace — the standard pattern used by Spark-extension
  * libraries. No Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Native bloom-filter membership probe: `BloomFilterMightContain` over a
    * pre-built serialized filter (the codegen'd expression Spark itself
    * uses for runtime join filtering, which it does not expose in the
    * public registry). `value` must be the same 64-bit hash family the
    * filter was populated with (xxhash64 longs → putLong). */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(
        bloomBytes, org.apache.spark.sql.types.BinaryType),
      expression(value)))
}
