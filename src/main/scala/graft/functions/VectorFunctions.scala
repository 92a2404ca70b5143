package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns. The dot product is a
  * native codegen'd Catalyst expression ([[DotProduct]]) with a strict
  * left-to-right double fold, so results are bit-identical to the ANSI-SQL
  * oracle formulation and reproducible across engines.
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Dot product in double precision, sequential accumulation (native). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Interpreted reference implementation (higher-order functions); kept
    * for cross-checking the native expression in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers round before thresholding/ranking so
    * inclusion and tiebreaks are deterministic cross-engine. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
