package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-mitigation variants of shuffle-heavy operators.
  *
  * Window-function top-k per group shuffles every row of a group into one
  * partition; at 100 TB a hot group (one brand with 10% of all rows) stalls
  * the stage. The salted variants split hot groups across `salts`
  * sub-partitions, take a bounded local top-k, then reduce the (≤ groups ×
  * salts × k)-row remainder exactly — same result, bounded partition size.
  */
object Skew {

  /** Exact top-k per group via two-phase salted ranking. */
  def saltedTopKPerGroup(df: DataFrame, group: String, metric: String,
                         tiebreak: String, k: Int, salts: Int): DataFrame = {
    val localW = Window.partitionBy(col(group), col("graft_salt"))
      .orderBy(col(metric).desc, col(tiebreak).asc)
    val local = df
      .withColumn("graft_salt", pmod(hash(col(tiebreak)), lit(salts)))
      .withColumn("graft_rn", row_number().over(localW))
      .filter(col("graft_rn") <= k)
      .drop("graft_salt", "graft_rn")
    // Final exact pass over the bounded survivor set.
    Charts.topKPerGroup(local, group, metric, tiebreak, k)
  }

  /** Exact global top-k with a salted pre-pass (useful when even the
    * single-reducer TakeOrdered merge is too wide: local top-k first). */
  def saltedTopK(df: DataFrame, metric: String, tiebreak: String,
                 k: Int, salts: Int): DataFrame = {
    val localW = Window.partitionBy(col("graft_salt"))
      .orderBy(col(metric).desc, col(tiebreak).asc)
    val local = df
      .withColumn("graft_salt", pmod(hash(col(tiebreak)), lit(salts)))
      .withColumn("graft_rn", row_number().over(localW))
      .filter(col("graft_rn") <= k)
      .drop("graft_salt", "graft_rn")
    Charts.topK(local, metric, tiebreak, k)
  }

  /** Salted equi-join for a skewed left (fact) side against a right side
    * too large to broadcast: left rows salt by a deterministic hash of
    * `saltSrc` (any column unique-ish within a key — an id, a timestamp),
    * the right side replicates `salts`× via a bounded explode, and the
    * join key becomes (key, salt) — a hot key's rows now spread over
    * `salts` reducers instead of stalling one. Inner-join semantics are
    * exactly preserved for any key multiplicity (every left row still
    * meets every matching right row exactly once, in its salt slice).
    *
    * Use when AQE's skew-join split can't apply: stream-static joins,
    * joins feeding a co-partitioned aggregate, or engines/plans where the
    * runtime re-plan is disabled. Cost model: right side grows `salts`×,
    * so pick salts ≈ (hot-key rows / target partition rows), and keep the
    * right side the SMALLER input. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSrc: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("graft_salt",
      pmod(hash(col(saltSrc)), lit(salts)))
    val r = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "graft_salt")).drop("graft_salt")
  }
}
