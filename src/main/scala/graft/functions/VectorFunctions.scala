package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns using higher-order
  * functions (`zip_with`/`aggregate`) — codegen-friendly, no UDFs, and a
  * left-to-right fold so the double-precision result is reproducible
  * across engines for oracle parity.
  */
object VectorFunctions {

  /** Dot product in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; callers round before thresholding/ranking so
    * inclusion and tiebreaks are deterministic cross-engine. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
