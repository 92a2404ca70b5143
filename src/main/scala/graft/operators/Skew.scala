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

  /** Key-skew diagnostic for prospective join/agg keys: per column, the
    * row count, distinct-key count, the heaviest key's count, and the
    * skew ratio (max / mean rows-per-key) — the number that decides
    * whether a shuffle on this key needs salting (rule of thumb: ratio >
    * ~20 × stalls its reducer). One two-phase aggregate per audited
    * column over its (key → count) table; nothing key-cardinality-sized
    * ever reaches the driver. Integer inputs make the ratio the same
    * double on any engine. */
  def keySkewReport(df: DataFrame, keys: Seq[String]): DataFrame =
    keys.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("graft_cnt"))
        .agg(sum(col("graft_cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("graft_cnt")).as("max_cnt"))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_cnt"),
          round(col("max_cnt").cast("double") * col("n_keys").cast("double")
            / col("n_rows").cast("double"), 4).as("skew_ratio"))
    }.reduce(_ unionByName _)

  /** Join-cardinality pre-flight — the question to ask BEFORE shipping
    * any 100 TB join: exactly how many output rows will `left ⋈ right`
    * on this key produce, and which keys produce them. Computed from
    * the two per-key histograms (pairs(k) = n_left(k)·n_right(k) — the
    * textbook identity, EXACT, not a sample or sketch), so the audit
    * costs two keyed aggregates plus a histogram-sized join instead of
    * the join itself. The readout is the `topK` heaviest keys with
    * their pair counts and floor-ppm share of the total — the keys a
    * salting/skew-hint decision needs ([[saltedJoin]]'s `salts` pick),
    * and the total is the bill. DECIMAL(38,0) pair products (n_l·n_r
    * caps at n², past int64 on real tables).
    *
    * Scale: per-key counts are map-combinable; the histogram join is
    * keyed on the audited key; the 1-row total broadcasts back; top-k
    * is TakeOrdered. Nothing corpus-row-sized survives the first
    * aggregates. */
  def joinCardinalityAudit(left: DataFrame, right: DataFrame,
                           leftKey: String, rightKey: String,
                           topK: Int): DataFrame = {
    require(topK >= 1, "topK must be at least 1")
    val l = left.select(col(leftKey).as("join_key"))
      .groupBy("join_key")
      .agg(count(lit(1)).cast("decimal(38,0)").as("graft_nl"))
    val r = right.select(col(rightKey).as("join_key"))
      .groupBy("join_key")
      .agg(count(lit(1)).cast("decimal(38,0)").as("graft_nr"))
    // Pinned: the pair table feeds the 1-row total AND the final
    // projection — without the pin both histograms re-aggregate twice.
    val pairs = Materialize.transient(l.join(r, Seq("join_key"))
      .select(col("join_key"), col("graft_nl"), col("graft_nr"),
        expr("graft_nl * graft_nr").as("graft_p")))
    val total = pairs.agg(
      coalesce(sum("graft_p"), lit(0).cast("decimal(38,0)"))
        .as("graft_tot"))
    pairs.crossJoin(broadcast(total))
      .select(col("join_key"),
        col("graft_nl").cast("long").as("n_left"),
        col("graft_nr").cast("long").as("n_right"),
        col("graft_p").cast("long").as("n_pairs"),
        expr("CASE WHEN graft_tot = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE CAST(graft_p * 1000000 div graft_tot AS BIGINT) END")
          .as("share_ppm"),
        col("graft_tot").cast("long").as("total_pairs"))
      .orderBy(col("n_pairs").desc, col("join_key").asc)
      .limit(topK)
  }
}
