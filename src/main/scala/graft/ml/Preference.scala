package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference modeling over pairwise comparisons — the primitive under
  * every human-feedback reward pipeline: turn "A beat B" counts into a
  * strength per item. Reference analog: none (the reference ranks by raw
  * popularity); this is the principled aggregate when the raw data is
  * COMPARISONS, where win-rate alone is confounded by who you happened
  * to face.
  */
object Preference {

  /** Bradley-Terry strengths via the classic MM iteration (Hunter 2004),
    * ENGINE-PORTABLE: strengths live in integer milli and every MM step
    * is exact floor arithmetic — d_i = Σ_j ⌊(n_ij+n_ji)·10⁶ div
    * (p_i+p_j)⌋, p_i' = ⌊W_i·10⁶ div d_i⌋, max-normed back to 1000 per
    * iteration (scale-invariance makes the norm free; the q272
    * discipline) — so the oracle unrolls the identical `iters` steps and
    * a preference model hash-checks. Items never compared (d_i = 0)
    * keep their previous strength rather than dividing by zero.
    *
    * The comparison tournament: for each entity (user), every pair of
    * items BOTH observed for that entity is compared on the exact
    * centi-unit cell mean — a win iff strictly greater by integer
    * cross-multiplication (sum_a·cnt_b > sum_b·cnt_a — no division, no
    * ties counted). One (entity, item)-keyed reduction of the corpus,
    * a ≤k² per-entity pair compare, and a ≤k²-row wins matrix collected
    * as a bounded driver artifact (the markov-attribution contract —
    * the MM loop runs on |items|² integers, never on rows).
    *
    * Output: one row per item — wins, losses, bt_milli (final
    * strength), sorted by strength desc then item. */
  def bradleyTerry(rows: DataFrame, entityCol: String, itemCol: String,
                   valueCol: String, iters: Int = 3,
                   maxItems: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    require(maxItems >= 2, "need at least two items")
    // Pinned: the cell table feeds the cardinality guard and BOTH pair
    // legs (no common-subplan reuse in Spark).
    val cells = graft.operators.Materialize.transient(rows
      .select(col(entityCol).as("graft_e"), col(itemCol).as("graft_i"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("graft_v"))
      .filter(col("graft_e").isNotNull && col("graft_i").isNotNull &&
        col("graft_v").isNotNull)
      .groupBy("graft_e", "graft_i")
      .agg(sum("graft_v").cast("decimal(38,0)").as("graft_s"),
        count(lit(1)).cast("decimal(38,0)").as("graft_n")))
    val a = cells.select(col("graft_e"), col("graft_i").as("graft_ia"),
      col("graft_s").as("graft_sa"), col("graft_n").as("graft_na"))
    val b = cells.select(col("graft_e"), col("graft_i").as("graft_ib"),
      col("graft_s").as("graft_sb"), col("graft_n").as("graft_nb"))
    // Guard BEFORE anything reaches the driver: the wins matrix is
    // |items|²-bounded only if the item domain is.
    val nItems = cells.select("graft_i").distinct().count()
    require(nItems <= maxItems,
      s"bradleyTerry: $nItems items exceed maxItems=$maxItems — " +
        "the wins matrix must stay a bounded driver artifact")
    val winRows = a.join(b, Seq("graft_e"))
      .filter(col("graft_ia") =!= col("graft_ib"))
      .filter(expr("graft_sa * graft_nb > graft_sb * graft_na"))
      .groupBy(col("graft_ia").as("graft_w"), col("graft_ib").as("graft_l"))
      .agg(count(lit(1)).as("graft_n"))
      .collect()
    val items = winRows.flatMap(r => Seq(r.get(0), r.get(1))).distinct.toSeq
    val wins: Map[(Any, Any), Long] = winRows
      .map(r => ((r.get(0), r.get(1)), r.getLong(2))).toMap
    def nTotal(i: Any, j: Any): Long =
      wins.getOrElse((i, j), 0L) + wins.getOrElse((j, i), 0L)
    val wTot: Map[Any, Long] = items.map { i =>
      i -> items.filter(_ != i).map(j => wins.getOrElse((i, j), 0L)).sum
    }.toMap
    var p: Map[Any, Long] = items.map(_ -> 1000L).toMap
    for (_ <- 1 to iters) {
      val raw = items.map { i =>
        val d = items.filter(_ != i).map { j =>
          val n = nTotal(i, j)
          if (n == 0L) 0L else n * 1000000L / (p(i) + p(j))
        }.sum
        i -> (if (d == 0L) p(i) else wTot(i) * 1000000L / d)
      }.toMap
      val mx = math.max(1L, raw.values.max)
      p = raw.map { case (i, v) => i -> v * 1000L / mx }
    }
    val spark = rows.sparkSession
    import spark.implicits._
    val out = items.map { i =>
      val losses = items.filter(_ != i)
        .map(j => wins.getOrElse((j, i), 0L)).sum
      (i.toString, wTot(i), losses, p(i))
    }.sortBy { case (i, _, _, s) => (-s, i) }
    out.toDF("item", "wins", "losses", "bt_milli")
  }

  /** Preference-PAIR extraction — the (chosen, rejected) training rows
    * a DPO/reward-model pipeline actually consumes, built from the same
    * per-entity tournament [[bradleyTerry]] aggregates: for every
    * entity and every item pair BOTH observed for it, emit one row with
    * the strictly-preferred side as `chosen` and the exact floor-centi
    * mean margin — thin margins are ambiguous labels, so
    * `minMarginCenti` is the quality gate (the reward-data filtering
    * every RLHF recipe applies). The margin never touches a float:
    * mean_a − mean_b = (s_a·n_b − s_b·n_a) div (n_a·n_b), already in
    * centi because the cells are.
    *
    * Scale: one (entity, item)-keyed reduction, a per-entity ≤k² pair
    * join on the entity key — output is pair-bounded per entity, never
    * corpus²; no driver artifact at all. */
  def preferencePairs(rows: DataFrame, entityCol: String, itemCol: String,
                      valueCol: String,
                      minMarginCenti: Long): DataFrame = {
    require(minMarginCenti >= 0L, "minMarginCenti must be nonnegative")
    val cells = graft.operators.Materialize.transient(rows
      .select(col(entityCol).as("graft_e"), col(itemCol).as("graft_i"),
        floor(col(valueCol) * 100 + 0.5).cast("long").as("graft_v"))
      .filter(col("graft_e").isNotNull && col("graft_i").isNotNull &&
        col("graft_v").isNotNull)
      .groupBy("graft_e", "graft_i")
      .agg(sum("graft_v").cast("decimal(38,0)").as("graft_s"),
        count(lit(1)).cast("decimal(38,0)").as("graft_n")))
    val a = cells.select(col("graft_e"), col("graft_i").as("graft_ia"),
      col("graft_s").as("graft_sa"), col("graft_n").as("graft_na"))
    val b = cells.select(col("graft_e"), col("graft_i").as("graft_ib"),
      col("graft_s").as("graft_sb"), col("graft_n").as("graft_nb"))
    a.join(b, Seq("graft_e"))
      .filter(col("graft_ia") =!= col("graft_ib"))
      .filter(expr("graft_sa * graft_nb > graft_sb * graft_na"))
      .withColumn("margin_centi",
        expr("CAST((graft_sa * graft_nb - graft_sb * graft_na)" +
          " div (graft_na * graft_nb) AS BIGINT)"))
      .filter(col("margin_centi") >= minMarginCenti)
      .select(col("graft_e").as("entity"),
        col("graft_ia").as("chosen"), col("graft_ib").as("rejected"),
        col("margin_centi"))
  }
}
