package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic A/B experiment readout over the event log. Assignment is
  * a content hash of the user id (md5 first nibble < '8' → arm A), not an
  * RNG draw: the same user lands in the same arm on every engine and
  * every re-run, so the readout is audit-replayable — the same property
  * the train/test hash split (q43) gives dataset curation.
  *
  * All rates are exact integer arithmetic in parts-per-million (floor
  * division), so the report hash-checks across engines — no float
  * division anywhere.
  *
  * Scale posture: exposure and conversion each reduce to a DISTINCT user
  * set (one user-keyed shuffle each — at 100 TB the event scan dominates
  * and both sets are user-cardinality); the arm rollups are two tiny
  * aggregates broadcast into a single cross-joined report row. */
object Experiment {

  /** One-row lift report: exposed users (those with an `exposureType`
    * event) split into arms A/B by id hash; a user converts if they have
    * a `conversionType` event with value > `minValue`. `lift_ppm` =
    * rate_B · 10⁶ div rate_A (ppm of the A rate; 1 000 000 = parity).
    *
    * Degenerate arm: when arm A has ZERO conversions, `rate_ppm_a` = 0
    * and `lift_ppm` is NULL via an explicit CASE — lift against a zero
    * base rate is undefined, and NULL survives the cross-engine hash
    * compare (the oracle replays the same CASE) where a sentinel value
    * would be indistinguishable from a real measurement. The guard must
    * be explicit: under ANSI SQL (Spark 4 default) a bare `div 0` THROWS
    * at runtime rather than returning NULL, so without the CASE a
    * zero-conversion control arm would crash the whole readout. Callers
    * read NULL as "no measurable base rate" and fall back to the per-arm
    * counts, which are always present. Pinned by the zero-conversion
    * fixture in ExperimentSpec. */
  def abLift(events: DataFrame, userCol: String, typeCol: String,
             valueCol: String, exposureType: String, conversionType: String,
             minValue: Double): DataFrame = {
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val exposed = events.filter(col(typeCol) === exposureType)
      .select(col(userCol).as("graft_u")).distinct()
      .withColumn("graft_arm", arm)
    val converted = events
      .filter(col(typeCol) === conversionType && col(valueCol) > minValue)
      .select(col(userCol).as("graft_u")).distinct()
      .withColumn("graft_conv", lit(1L))
    val perArm = exposed.join(converted, Seq("graft_u"), "left")
      .groupBy("graft_arm")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("graft_conv"), lit(0L))).as("c"))
      .withColumn("rate_ppm", expr("c * 1000000 div n"))
    val a = perArm.filter(col("graft_arm") === "A")
      .select(col("n").as("n_users_a"), col("c").as("n_conv_a"),
        col("rate_ppm").as("rate_ppm_a"))
    val b = perArm.filter(col("graft_arm") === "B")
      .select(col("n").as("n_users_b"), col("c").as("n_conv_b"),
        col("rate_ppm").as("rate_ppm_b"))
    a.crossJoin(b)
      .withColumn("lift_ppm",
        expr("CASE WHEN rate_ppm_a = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE rate_ppm_b * 1000000 div rate_ppm_a END"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13:
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"). Per user: covariate x = pre-period
    * metric, outcome y = post-period metric (event values summed, split
    * at `cutTsUs`); arms by the same md5 hash as [[abLift]]. The pooled
    * regression coefficient θ = Cov(x,y)/Var(x) removes the
    * pre-period-explained variance: adjusted mean per arm =
    * ȳ_arm − θ·(x̄_arm − x̄).
    *
    * Exactness: values quantize to centi-units (the event generator emits
    * 2-dp values, so ×100 is lossless), all sums/products accumulate in
    * decimal(38,0) (order-independent), and every division is an explicit
    * floor `div` at a fixed point in the formula — so θ, the raw means,
    * and the adjusted means are integers (ppm of centi-units) that replay
    * bit-identically in the DuckDB oracle. θ is NULL (and adjusted means
    * fall back to raw) when Var(x) = 0 — a degenerate pre-period.
    *
    * Scale posture: ONE user-keyed aggregate over the event scan builds
    * the per-user (x, y) table; the θ sums and per-arm rollups are two
    * tiny aggregates over it; the report assembles by cross-joining
    * broadcast 1-row aggregates. At 100 TB the event scan dominates —
    * the same shape as [[abLift]]. */
  def cuped(events: DataFrame, userCol: String, typeCol: String,
            valueCol: String, tsUsCol: String, metricType: String,
            cutTsUs: Long): DataFrame = {
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val perUser = events.filter(col(typeCol) === metricType)
      .select(col(userCol).as("graft_u"),
        when(col(tsUsCol) < cutTsUs, cents).otherwise(lit(0L)).as("graft_x"),
        when(col(tsUsCol) >= cutTsUs, cents).otherwise(lit(0L)).as("graft_y"))
      .groupBy("graft_u")
      .agg(sum("graft_x").cast("decimal(38,0)").as("x"),
        sum("graft_y").cast("decimal(38,0)").as("y"))
      .withColumn("graft_arm", arm)
    // Pooled θ over ALL users: θ_ppm = (n·Sxy − Sx·Sy)·10⁶ div (n·Sxx − Sx²)
    val theta = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("tn"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
      .select(col("tn"), col("sx"),
        expr("CASE WHEN tn * sxx - sx * sx = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE (tn * sxy - sx * sy) * 1000000 div (tn * sxx - sx * sx)" +
          " END").as("theta_ppm"))
    val perArm = perUser.groupBy("graft_arm")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("ax"), sum("y").as("ay"))
    // adj_ppm = (Sy_arm·10⁶ − θ_ppm·Sx_arm) div n_arm + (θ_ppm·Sx) div n
    // (floor divisions in this fixed order; NULL θ → raw mean).
    val adj = perArm.crossJoin(broadcast(theta))
      .withColumn("raw_ppm", expr("ay * 1000000 div n"))
      .withColumn("adj_ppm",
        expr("CASE WHEN theta_ppm IS NULL THEN ay * 1000000 div n" +
          " ELSE (ay * 1000000 - theta_ppm * ax) div n" +
          " + (theta_ppm * sx) div tn END"))
      .select(col("graft_arm"), col("n").cast("long").as("n"),
        col("raw_ppm"), col("adj_ppm"), col("theta_ppm"))
    val a = adj.filter(col("graft_arm") === "A")
      .select(col("n").as("n_users_a"), col("raw_ppm").as("raw_ppm_a"),
        col("adj_ppm").as("adj_ppm_a"), col("theta_ppm"))
    val b = adj.filter(col("graft_arm") === "B")
      .select(col("n").as("n_users_b"), col("raw_ppm").as("raw_ppm_b"),
        col("adj_ppm").as("adj_ppm_b"))
    a.crossJoin(b)
      .select(col("n_users_a"), col("n_users_b"), col("theta_ppm"),
        col("raw_ppm_a"), col("raw_ppm_b"), col("adj_ppm_a"),
        col("adj_ppm_b"),
        (col("adj_ppm_b") - col("adj_ppm_a")).as("adj_diff_ppm"))
  }

  /** Difference-in-differences — the quasi-experimental rung of the
    * family ([[abLift]] point lift, [[cuped]] variance reduction,
    * [[jackknifeDiff]] uncertainty): when the arms were NOT balanced at
    * baseline, the raw post-period gap conflates treatment effect with
    * pre-existing level difference, so subtract each arm's own pre-trend:
    * DiD = (ȳ_B,post − ȳ_B,pre) − (ȳ_A,post − ȳ_A,pre). The parallel-
    * trends assumption is made CHECKABLE by a placebo replay — the same
    * estimator run entirely inside the pre-period, split at
    * `placeboCutUs`: a placebo "effect" far from 0 says the arms were
    * already diverging and the real DiD is not causal.
    *
    * Repeated cross-section cells: a user enters an (arm, period) cell
    * iff they have ≥1 metric event in that period; cell mean =
    * Σcenti·1000 div n (floor milli-cents), NULL when a cell is empty
    * (CASE — under ANSI a bare div 0 throws, the [[abLift]] lesson), and
    * NULL propagates through the differences. Values quantize to
    * lossless centi-units, sums ride DECIMAL(38,0) — every division is a
    * fixed-point floor, so the oracle replays bit-exact.
    *
    * Scale posture: ONE user-keyed aggregate over the metric-filtered
    * scan carries all four per-user period sums/counts (real pre/post
    * AND the placebo halves — no second pass for the placebo); the arm
    * rollup is 2 rows, the report one cross-joined row. */
  def diffInDiff(events: DataFrame, userCol: String, typeCol: String,
                 valueCol: String, tsUsCol: String, metricType: String,
                 cutTsUs: Long, placeboCutUs: Long): DataFrame = {
    require(placeboCutUs < cutTsUs,
      "placebo cut must fall inside the pre-period")
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val ts = col(tsUsCol)
    val perUser = events.filter(col(typeCol) === metricType)
      .select(col(userCol).as("graft_u"),
        when(ts < cutTsUs, cents).otherwise(lit(0L)).as("s_pre"),
        when(ts >= cutTsUs, cents).otherwise(lit(0L)).as("s_post"),
        when(ts < placeboCutUs, cents).otherwise(lit(0L)).as("s_pl1"),
        when(ts >= placeboCutUs && ts < cutTsUs, cents)
          .otherwise(lit(0L)).as("s_pl2"),
        when(ts < cutTsUs, lit(1L)).otherwise(lit(0L)).as("c_pre"),
        when(ts >= cutTsUs, lit(1L)).otherwise(lit(0L)).as("c_post"),
        when(ts < placeboCutUs, lit(1L)).otherwise(lit(0L)).as("c_pl1"),
        when(ts >= placeboCutUs && ts < cutTsUs, lit(1L))
          .otherwise(lit(0L)).as("c_pl2"))
      .groupBy("graft_u")
      .agg(sum("s_pre").cast("decimal(38,0)").as("s_pre"),
        (Seq("s_post", "s_pl1", "s_pl2").map(c =>
          sum(c).cast("decimal(38,0)").as(c)) ++
          Seq("c_pre", "c_post", "c_pl1", "c_pl2").map(c =>
            sum(c).as(c))): _*)
      .withColumn("graft_arm", arm)
    // Per (arm, period): n = users ACTIVE in the period, mean over them.
    def cell(p: String) = Seq(
      sum(when(col(s"c_$p") > 0, lit(1L)).otherwise(lit(0L)))
        .cast("decimal(38,0)").as(s"n_$p"),
      sum(col(s"s_$p")).as(s"t_$p"))
    def mean(p: String) =
      expr(s"CASE WHEN n_$p = 0 THEN CAST(NULL AS BIGINT)" +
        s" ELSE t_$p * 1000 div n_$p END").as(s"m_$p")
    val perArm = perUser.groupBy("graft_arm")
      .agg(cell("pre").head,
        (cell("pre").tail ++ cell("post") ++ cell("pl1") ++ cell("pl2")): _*)
      .select((col("graft_arm") +:
        Seq("pre", "post", "pl1", "pl2").flatMap(p =>
          Seq(col(s"n_$p").cast("long").as(s"n_$p"), mean(p)))): _*)
    def side(a: String) = perArm.filter(col("graft_arm") === a.toUpperCase)
      .select(Seq("pre", "post", "pl1", "pl2").flatMap(p =>
        Seq(col(s"n_$p").as(s"n_${a}_$p"), col(s"m_$p").as(s"m_${a}_$p"))): _*)
    side("a").crossJoin(side("b"))
      .select(col("n_a_pre"), col("n_a_post"), col("n_b_pre"),
        col("n_b_post"), col("m_a_pre"), col("m_a_post"), col("m_b_pre"),
        col("m_b_post"),
        ((col("m_b_post") - col("m_b_pre")) -
          (col("m_a_post") - col("m_a_pre"))).as("did_milli"),
        ((col("m_b_pl2") - col("m_b_pl1")) -
          (col("m_a_pl2") - col("m_a_pl1"))).as("placebo_did_milli"))
  }

  /** Coarsened-exact-matching ATT (Iacus/King/Porro, Political Analysis
    * 2012) — the OBSERVATIONAL rung of the family: when assignment was
    * not randomized (or is suspected broken), compare treated and
    * control only INSIDE strata of coarsened pre-treatment covariates,
    * and weight stratum effects by their treated mass:
    * ATT = Σ_s n_ts·(ȳ_ts − ȳ_cs) / Σ_s n_ts over strata holding BOTH
    * arms; units in single-arm strata are PRUNED and reported (the
    * honesty CEM buys — off-support units never silently extrapolate).
    *
    * Coarsening: covariate 1 = log₂ bucket of pre-period event count
    * (the power-of-two literal-threshold fold — no float log), covariate
    * 2 = pre-period active days capped at `maxDaysBucket`. Universe =
    * users with ≥1 pre-period event (no covariates, no match). Outcome =
    * post-period `metricType` centi-value sum per user.
    *
    * Exactness: stratum means are floor milli-cents over DECIMAL(38,0)
    * sums; the ATT numerator Σ n_ts·(m_ts − m_cs) stays integer and is
    * REPORTED alongside the denominator — the single signed division is
    * done in double (one correctly-rounded op, round 4) because signed
    * floor-vs-truncate integer division differs across engines; the
    * rational pair lets any consumer re-divide exactly.
    *
    * Scale: ONE user-keyed aggregate over the event scan (count-distinct
    * days rides the same pass), a \|strata\|×2 rollup, a 1-row report. */
  def cemAtt(events: DataFrame, userCol: String, typeCol: String,
             valueCol: String, tsUsCol: String, metricType: String,
             cutTsUs: Long, maxDaysBucket: Int = 7): DataFrame = {
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val ts = col(tsUsCol)
    val perUser = events
      .select(col(userCol).as("graft_u"), ts.as("graft_ts"),
        col(typeCol).as("graft_ty"), cents.as("graft_cv"))
      .groupBy("graft_u")
      .agg(sum(when(col("graft_ts") < cutTsUs, 1L).otherwise(0L))
          .as("graft_pc"),
        countDistinct(when(col("graft_ts") < cutTsUs,
          expr(s"graft_ts div ${86400L * 1000000L}L"))).as("graft_pd"),
        sum(when(col("graft_ts") >= cutTsUs &&
          col("graft_ty") === metricType, col("graft_cv")).otherwise(0L))
          .cast("decimal(38,0)").as("graft_y"))
      .filter(col("graft_pc") > 0L)
      .withColumn("graft_arm", arm)
    val chain = (1 to 20).map(i =>
      s"(CASE WHEN graft_pc >= ${1L << i} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val strata = perUser
      .withColumn("b1", expr(s"CAST($chain AS BIGINT)"))
      .withColumn("b2", least(col("graft_pd"), lit(maxDaysBucket.toLong)))
      .groupBy("b1", "b2", "graft_arm")
      .agg(count(lit(1)).cast("decimal(38,0)").as("graft_n"),
        sum("graft_y").as("graft_s"))
    val t = strata.filter(col("graft_arm") === "B")
      .select(col("b1"), col("b2"), col("graft_n").as("graft_nt"),
        col("graft_s").as("graft_st"))
    val c = strata.filter(col("graft_arm") === "A")
      .select(col("b1"), col("b2"), col("graft_n").as("graft_nc"),
        col("graft_s").as("graft_sc"))
    t.join(c, Seq("b1", "b2"), "full_outer")
      .select(col("graft_nt"), col("graft_nc"),
        (col("graft_nt").isNotNull && col("graft_nc").isNotNull)
          .as("graft_m"),
        expr("CASE WHEN graft_nt IS NOT NULL AND graft_nc IS NOT NULL" +
          " THEN graft_nt * (graft_st * 1000 div graft_nt" +
          "   - graft_sc * 1000 div graft_nc)" +
          " ELSE CAST(NULL AS DECIMAL(38,0)) END").as("graft_contrib"))
      .agg(
        sum(when(col("graft_m"), 1L).otherwise(0L)).as("n_strata_matched"),
        sum(when(col("graft_m"), col("graft_nt")).otherwise(lit(0)))
          .cast("long").as("n_treated_matched"),
        sum(when(!col("graft_m"), coalesce(col("graft_nt"), lit(0)))
          .otherwise(lit(0))).cast("long").as("n_treated_pruned"),
        sum(when(col("graft_m"), col("graft_nc")).otherwise(lit(0)))
          .cast("long").as("n_control_matched"),
        sum(when(!col("graft_m"), coalesce(col("graft_nc"), lit(0)))
          .otherwise(lit(0))).cast("long").as("n_control_pruned"),
        sum(col("graft_contrib")).cast("long").as("att_num_milli"))
      .withColumn("att_milli",
        expr("CASE WHEN n_treated_matched = 0 THEN CAST(NULL AS DOUBLE)" +
          " ELSE round(CAST(att_num_milli AS DOUBLE)" +
          " / n_treated_matched, 4) END"))
  }

  /** Qini uplift curve (Radcliffe, Direct Marketing Analytics J. 2007)
    * — the uplift twin of the single-model gains chart (q226): rank ALL
    * users by a targeting score, then at each score decile compare
    * CUMULATIVE treated conversions against the control conversions
    * scaled to the treated exposure:
    * Qini(k) = CT_k − CC_k·(NT_k/NC_k). A score that targets persuadable
    * users front-loads the curve; a useless score tracks 0. The score
    * here is the model-free baseline any platform owns — pre-period
    * activity volume — which is exactly what a real uplift model must
    * beat to justify itself.
    *
    * Determinism: deciles are ntile over (score desc, user id) — the
    * q176 tie discipline, no enumeration order anywhere; conversions are
    * binary flags; the single ratio is ONE floor division at a fixed
    * point (CT·1000 − CC·1000·NT div NC, DECIMAL(38,0) products), NULL
    * when a prefix holds no control users. Universe = users with ≥1
    * pre-period event (no score otherwise) — the [[cemAtt]] rule.
    *
    * Scale: one user-keyed pass; the ntile sort runs on the per-user
    * table (user-cardinality, the q176 posture), the decile rollup and
    * cumulative window on `buckets` rows. */
  def upliftCurve(events: DataFrame, userCol: String, typeCol: String,
                  valueCol: String, tsUsCol: String, metricType: String,
                  cutTsUs: Long, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least two score buckets")
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val ts = col(tsUsCol)
    val perUser = events
      .select(col(userCol).as("graft_u"), ts.as("graft_ts"),
        col(typeCol).as("graft_ty"), col(valueCol).as("graft_v"))
      .groupBy("graft_u")
      .agg(sum(when(col("graft_ts") < cutTsUs, 1L).otherwise(0L))
          .as("graft_pc"),
        max(when(col("graft_ts") >= cutTsUs &&
          col("graft_ty") === metricType, 1L).otherwise(0L)).as("graft_cv"))
      .filter(col("graft_pc") > 0L)
      .withColumn("graft_arm", arm)
      .withColumn("decile", ntile(buckets).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("graft_pc").desc, col("graft_u").asc))
        .cast("long"))
    val byDec = perUser.groupBy("decile")
      .agg(sum(when(col("graft_arm") === "B", 1L).otherwise(0L)).as("graft_nt"),
        sum(when(col("graft_arm") === "A", 1L).otherwise(0L)).as("graft_nc"),
        sum(when(col("graft_arm") === "B", col("graft_cv"))
          .otherwise(0L)).as("graft_ct"),
        sum(when(col("graft_arm") === "A", col("graft_cv"))
          .otherwise(0L)).as("graft_cc"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byDec
      .select(col("decile"),
        sum("graft_nt").over(wCum).cast("decimal(38,0)").as("graft_cnt"),
        sum("graft_nc").over(wCum).cast("decimal(38,0)").as("graft_cnc"),
        sum("graft_ct").over(wCum).cast("decimal(38,0)").as("graft_cct"),
        sum("graft_cc").over(wCum).cast("decimal(38,0)").as("graft_ccc"))
      .select(col("decile"),
        col("graft_cnt").cast("long").as("cum_n_t"),
        col("graft_cnc").cast("long").as("cum_n_c"),
        col("graft_cct").cast("long").as("cum_conv_t"),
        col("graft_ccc").cast("long").as("cum_conv_c"),
        expr("CASE WHEN graft_cnc = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE CAST(graft_cct * 1000" +
          " - graft_ccc * 1000 * graft_cnt div graft_cnc AS BIGINT)" +
          " END").as("qini_milli"))
  }

  /** Bucketed-jackknife variance for the arm mean difference — the
    * experimentation-platform machinery [[abLift]] and [[cuped]] lack: a
    * point estimate without a standard error can't say whether the lift
    * is signal. Users hash into `buckets` groups (md5 chars 2-5, disjoint
    * from the arm nibble at char 1 — the same literal-hex-threshold trick
    * as the epoch shards, so assignment replays on any engine); each
    * delete-one-group replicate d_g re-computes the mean difference with
    * bucket g removed, and the jackknife variance
    *   var = (G−1)/G · Σ (d_g − d̄)²
    *       = (G−1)·(G·Σd_g² − (Σd_g)²) / G²
    * needs only the per-bucket (n, sum) table — O(G) driver-free rows,
    * never a resample of the corpus (the reason experiment platforms
    * jackknife over buckets instead of bootstrapping users at 100 TB).
    *
    * Exactness: metric in lossless centi-units, per-arm and per-replicate
    * means floor-micro (each d_g is a difference of two floored
    * divisions, deterministic), the variance numerator pure integer. Only
    * z touches floats: THREE pinned IEEE ops — CAST(diff)·G, divided by
    * the correctly-rounded sqrt(var_num), ×1000 — then round to milli;
    * every op is individually correctly-rounded, so the bits replay
    * (the Mann-Kendall z argument). NULLs: variance/z when any replicate
    * leaves an arm empty (n_valid < G surfaces it) or var_num = 0.
    *
    * Scale: ONE user-keyed aggregate over the event scan, a G·2-row
    * rollup, a one-row report. */
  def jackknifeDiff(events: DataFrame, userCol: String, typeCol: String,
                    valueCol: String, metricType: String,
                    buckets: Int = 32): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, "buckets must be in 2..65536")
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val h = substring(md5(col("graft_u").cast("string")), 2, 4)
    val g = (1 until buckets).foldLeft(lit(0)) { (acc, i) =>
      acc + when(h >= lit(f"${i * 65536 / buckets}%04x"), 1).otherwise(0)
    }
    val cents = floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
    val perUser = events.filter(col(typeCol) === metricType)
      .select(col(userCol).as("graft_u"), cents.as("graft_c"))
      .groupBy("graft_u").agg(sum("graft_c").cast("decimal(38,0)").as("y"))
      .select(col("y"), arm.as("graft_arm"), g.cast("long").as("graft_g"))
    jackknifeCore(perUser, buckets)
  }

  /** The replicate/variance assembly over a per-unit (y, graft_arm,
    * graft_g) table — split out so specs can drive it with hand-assigned
    * arms and buckets. */
  private[graft] def jackknifeCore(perUser: DataFrame,
                                   buckets: Int): DataFrame = {
    val spark = perUser.sparkSession
    val perBucket = perUser.groupBy("graft_g").agg(
      sum(when(col("graft_arm") === "A", lit(1L)).otherwise(lit(0L)))
        .cast("decimal(38,0)").as("n_ag"),
      sum(when(col("graft_arm") === "A", col("y")).otherwise(lit(0L)))
        .as("s_ag"),
      sum(when(col("graft_arm") === "B", lit(1L)).otherwise(lit(0L)))
        .cast("decimal(38,0)").as("n_bg"),
      sum(when(col("graft_arm") === "B", col("y")).otherwise(lit(0L)))
        .as("s_bg"))
    // Empty buckets still contribute a (no-change) replicate: enumerate
    // all G explicitly and zero-fill.
    val allG = spark.range(buckets).select(col("id").as("graft_g"))
    val filled = allG.join(perBucket, Seq("graft_g"), "left")
      .select(col("graft_g"),
        coalesce(col("n_ag"), lit(0)).cast("decimal(38,0)").as("n_ag"),
        coalesce(col("s_ag"), lit(0)).cast("decimal(38,0)").as("s_ag"),
        coalesce(col("n_bg"), lit(0)).cast("decimal(38,0)").as("n_bg"),
        coalesce(col("s_bg"), lit(0)).cast("decimal(38,0)").as("s_bg"))
    val totals = filled.agg(
      sum("n_ag").as("tna"), sum("s_ag").as("tsa"),
      sum("n_bg").as("tnb"), sum("s_bg").as("tsb"))
    val reps = filled.crossJoin(broadcast(totals))
      .select(expr("CASE WHEN tna - n_ag = 0 OR tnb - n_bg = 0"
        + " THEN CAST(NULL AS DECIMAL(38,0))"
        + " ELSE CAST((tsb - s_bg) * 1000000 div (tnb - n_bg)"
        + "    - (tsa - s_ag) * 1000000 div (tna - n_ag)"
        + "    AS DECIMAL(38,0)) END").as("dg"))
      .agg(count(col("dg")).cast("decimal(38,0)").as("n_valid"),
        sum("dg").as("sd"), sum(expr("dg * dg")).as("sd2"))
    totals.crossJoin(broadcast(reps))
      .select(
        col("tna").cast("long").as("n_users_a"),
        col("tnb").cast("long").as("n_users_b"),
        expr("CASE WHEN tna = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE tsa * 1000000 div tna END").as("mean_a_micro"),
        expr("CASE WHEN tnb = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE tsb * 1000000 div tnb END").as("mean_b_micro"),
        expr("CASE WHEN tna = 0 OR tnb = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE tsb * 1000000 div tnb - tsa * 1000000 div tna END")
          .as("diff_micro"),
        col("n_valid").cast("long").as("n_valid_buckets"),
        // the standard error, not the raw variance — micro² overflows
        // int64 on real data; se = sqrt(var_num)/G via TWO pinned IEEE
        // ops (correctly-rounded sqrt, then divide) + round.
        expr(s"CASE WHEN n_valid < $buckets"
          + s"   OR ($buckets - 1) * ($buckets * sd2 - sd * sd) < 0"
          + " THEN CAST(NULL AS BIGINT)"
          + s" ELSE CAST(round(sqrt(CAST(($buckets - 1)"
          + s"     * ($buckets * sd2 - sd * sd) AS DOUBLE))"
          + s"   / $buckets, 0) AS BIGINT) END").as("se_micro"),
        expr(s"CASE WHEN n_valid < $buckets OR tna = 0 OR tnb = 0"
          + s"   OR ($buckets - 1) * ($buckets * sd2 - sd * sd) <= 0"
          + " THEN CAST(NULL AS BIGINT)"
          + s" ELSE CAST(round(CAST(tsb * 1000000 div tnb"
          + s"     - tsa * 1000000 div tna AS DOUBLE) * $buckets"
          + s"   / sqrt(CAST(($buckets - 1)"
          + s"     * ($buckets * sd2 - sd * sd) AS DOUBLE)) * 1000, 0)"
          + " AS BIGINT) END").as("z_milli"))
  }

  /** Poisson-bootstrap variance for per-group means — THE at-scale
    * bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams", Google 2012): a classic resample draws n rows with
    * replacement B times (B full shuffles of the corpus — impossible at
    * 100 TB); the Poisson trick observes that each row's multiplicity in
    * a resample is asymptotically Poisson(1), so ONE pass can weight
    * every row into all B replicates simultaneously and the "resample"
    * never materializes. Deterministic and ENGINE-PORTABLE here: row
    * multiplicity m(row, b) inverts the Poisson(1) CDF at a 32-bit
    * integer drawn from md5(id·'#'·⌊b/4⌋) — each 128-bit digest slices
    * into FOUR independent 8-hex draws (slice b mod 4), so the hash
    * work is one md5 per 4 replicates rather than per replicate — with
    * the CDF quantized to fixed 8-hex literal thresholds
    * (P≤8 ≈ 0.9999989; the residual tail pins to m = 9). The same
    * (id, b) yields the same multiplicity on any engine, partitioning,
    * or retry, and a SQL oracle replays every slice bit-for-bit. Per group: `mean_centi` the plain data mean
    * (floor-centi), `b_live` the replicates with nonzero weight (a
    * replicate zeroing out an entire group — P ≈ e^(−n) — drops out
    * honestly), and `boot_var_centi2` the across-replicate variance of
    * the replicate means, (B'·Σm² − (Σm)²) div (B'·(B'−1)) in exact
    * DECIMAL(38,0); NULL when B' < 2. The VARIANCE is reported rather
    * than an SE: per-group SEs are consumed squared (pooling, z-tests),
    * and leaving the single sqrt to the caller keeps this row pure
    * integer.
    *
    * Scale: the explode produces B weighted copies of each row, but
    * they combine MAP-SIDE — the shuffle carries |groups|·B partial
    * rows, never B corpus copies; the raw-stats pass shares the pinned
    * base scan. This is the uncertainty machinery for per-group means
    * the bucketed jackknife ([[jackknifeDiff]]) provides for the
    * two-arm DIFFERENCE. */
  /** The shared deterministic-Poisson replicate fan-out: each (row,
    * replicate b < `replicas`) gets a Poisson(1) multiplicity from the
    * md5("id#⌊b/4⌋") digest's b-th 8-hex slice against the quantized
    * CDF thresholds — the q314 recipe, used by both the mean and the
    * median bootstrap. Two-level explode so each digest is COMPUTED
    * once and sliced four ways (the generator boundary stops
    * CollapseProject from inlining the digest into every slice).
    * In: (graft_g, graft_c, graft_id); out: (graft_g, graft_b,
    * graft_m, graft_c). */
  private def poissonWeighted(base: DataFrame, replicas: Int): DataFrame = {
    // Poisson(1) CDF at k = 0..8, quantized to floor(16⁸·P) as 8-hex
    // literals — the same literal-threshold trick as the jackknife's
    // bucket hash, so DuckDB replays the CASE verbatim.
    val cdfHex = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
      "ff1025f5", "ffd90f3b", "fffa8b71", "ffff540c", "ffffed1f")
    val m = cdfHex.zipWithIndex.reverse
      .foldLeft(lit(9): Column) { case (acc, (th, k)) =>
        when(col("graft_hex") < th, lit(k)).otherwise(acc)
      }
    base
      .select(col("graft_g"), col("graft_c"), col("graft_id"),
        explode(sequence(lit(0), lit((replicas + 3) / 4 - 1)))
          .as("graft_q"))
      .select(col("graft_g"), col("graft_c"), col("graft_q"),
        md5(concat(col("graft_id"), lit("#"),
          col("graft_q").cast("string"))).as("graft_h4"))
      .select(col("graft_g"), col("graft_c"), col("graft_q"),
        posexplode(array((0 until 4).map(sl =>
          substring(col("graft_h4"), 1 + 8 * sl, 8)): _*))
          .as(Seq("graft_sl", "graft_hex")))
      .withColumn("graft_b", col("graft_q") * 4 + col("graft_sl"))
      .filter(col("graft_b") < replicas)
      .select(col("graft_g"), col("graft_b"),
        m.cast("long").as("graft_m"), col("graft_c"))
  }

  def poissonBootstrap(df: DataFrame, groupCol: String, valueCol: String,
                       idCol: String, replicas: Int = 32): DataFrame = {
    require(replicas >= 2 && replicas <= 256, "replicas must be in 2..256")
    // Spread before materializing: the ×replicas explode + per-row md5
    // downstream is the dominant cost, and a single-split input would
    // otherwise run it on one task (guide §2.5; Tables.spread is an
    // identity once the input has ≥cores partitions).
    val base = Materialize.transient(graft.Tables.spread(df
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("graft_g"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
          .as("graft_c"),
        col(idCol).cast("string").as("graft_id"))))
    val perRep = poissonWeighted(base, replicas)
      .groupBy("graft_g", "graft_b")
      .agg(sum("graft_m").cast("decimal(38,0)").as("graft_nb"),
        sum(expr("CAST(graft_m AS DECIMAL(38,0)) * graft_c"))
          .cast("decimal(38,0)").as("graft_sb"))
    val boot = perRep.filter(col("graft_nb") > 0)
      .select(col("graft_g"),
        expr("CAST(graft_sb div graft_nb AS DECIMAL(38,0))").as("graft_mb"))
      .groupBy("graft_g")
      .agg(count(lit(1)).cast("decimal(38,0)").as("graft_bl"),
        sum("graft_mb").as("graft_sm"),
        sum(expr("graft_mb * graft_mb")).as("graft_sm2"))
    val raw = base.groupBy("graft_g")
      .agg(count(lit(1)).as("graft_n"),
        sum(col("graft_c").cast("decimal(38,0)")).as("graft_s"))
    raw.join(boot, Seq("graft_g"))
      .select(col("graft_g").as(groupCol),
        col("graft_n").cast("long").as("n_rows"),
        expr("CAST(CAST(graft_s AS DECIMAL(38,0))"
          + " div graft_n AS BIGINT)").as("mean_centi"),
        col("graft_bl").cast("long").as("b_live"),
        expr("CASE WHEN graft_bl < 2 THEN CAST(NULL AS BIGINT)"
          + " ELSE CAST((graft_bl * graft_sm2 - graft_sm * graft_sm)"
          + "   div (graft_bl * (graft_bl - 1)) AS BIGINT) END")
          .as("boot_var_centi2"))
      .orderBy(groupCol)
  }

  /** Poisson-bootstrap confidence interval for the MEDIAN — the
    * quantile rung next to [[poissonBootstrap]]'s mean variance (a
    * median has no closed-form standard error; resampling is the
    * standard answer, and the deterministic-Poisson construction makes
    * it hash-exact): per replicate the LOWER WEIGHTED MEDIAN over the
    * Poisson multiplicities (first value whose doubled cumulative
    * weight reaches the replicate total — the 48b' weighted-median
    * convention), then the percentile CI as exact lower order
    * statistics over the R replicate medians: lo rank = R·25 div 1000
    * + 1, hi rank = (R·975 + 999) div 1000 (R = 32 → ranks 1 and 32).
    * The point estimate is the same lower median on the RAW data.
    * Empty replicates (all multiplicities 0) drop; `b_live` reports
    * how many survived.
    *
    * Scale: replicate medians live on the (group × replicate ×
    * distinct-centi-value) table — the value axis is cardinality-gated
    * like every rank operator here; windows are (group, replicate)-
    * partitioned, never global. */
  def bootstrapMedian(df: DataFrame, groupCol: String, valueCol: String,
                      idCol: String, replicas: Int = 32,
                      maxDistinct: Long = 1L << 20): DataFrame = {
    require(replicas >= 2 && replicas <= 256, "replicas must be in 2..256")
    val dec = "decimal(38,0)"
    // Spread before materializing — same rationale as [[poissonBootstrap]].
    val base = Materialize.transient(graft.Tables.spread(df
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).as("graft_g"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long")
          .as("graft_c"),
        col(idCol).cast("string").as("graft_id"))))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val gate = base.groupBy("graft_g", "graft_c").agg(count(lit(1)).as("graft_w"))
      .withColumn("graft_card", count(lit(1)).over(wAll))
      .filter(assert_true(col("graft_card") <= lit(maxDistinct),
        lit(s"bootstrapMedian: more than $maxDistinct distinct " +
          "(group, centi value) pairs — quantize coarser")).isNull)
    def lowerMedian(t: DataFrame, wCol: String): DataFrame = {
      // per partition key: first c whose doubled running weight reaches
      // the total — the lower weighted median
      val keys = t.columns.filterNot(c => c == "graft_c" || c == wCol)
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col).toIndexedSeq: _*).orderBy("graft_c")
      val wt = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col).toIndexedSeq: _*)
      t.withColumn("graft_cum", sum(wCol).over(wp.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .withColumn("graft_tot", sum(wCol).over(wt))
        .filter(col("graft_tot") > 0 &&
          col("graft_cum") * 2 >= col("graft_tot"))
        .groupBy(keys.map(col).toIndexedSeq: _*)
        .agg(min("graft_c").as("graft_med"))
    }
    val rawMed = lowerMedian(gate.drop("graft_card"), "graft_w")
      .select(col("graft_g"), col("graft_med").as("graft_raw"))
    val perRep = poissonWeighted(base, replicas)
      .groupBy("graft_g", "graft_b", "graft_c")
      .agg(sum("graft_m").as("graft_wm"))
      .filter(col("graft_wm") > 0)
    val repMed = lowerMedian(perRep, "graft_wm")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("graft_g").orderBy(col("graft_med"), col("graft_b"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy("graft_g")
    val ci = repMed
      .withColumn("graft_rn", row_number().over(wOrd).cast("long"))
      .withColumn("graft_bl", count(lit(1)).over(wG))
      .withColumn("graft_lo", expr("graft_bl * 25 div 1000 + 1"))
      .withColumn("graft_hi", expr("(graft_bl * 975 + 999) div 1000"))
      .groupBy("graft_g")
      .agg(max("graft_bl").as("graft_bl"),
        max(when(col("graft_rn") === col("graft_lo"), col("graft_med")))
          .as("graft_cilo"),
        max(when(col("graft_rn") === col("graft_hi"), col("graft_med")))
          .as("graft_cihi"))
    val n = base.groupBy("graft_g").agg(count(lit(1)).as("graft_n"))
    n.join(rawMed, Seq("graft_g")).join(ci, Seq("graft_g"))
      .select(col("graft_g").as(groupCol),
        col("graft_n").cast("long").as("n_rows"),
        col("graft_raw").cast("long").as("median_centi"),
        col("graft_bl").cast("long").as("b_live"),
        col("graft_cilo").cast("long").as("ci_lo_centi"),
        col("graft_cihi").cast("long").as("ci_hi_centi"))
      .orderBy(groupCol)
  }

  /** Sample-ratio-mismatch (SRM) check — the FIRST gate every
    * experimentation platform runs before reading any metric: if the
    * observed arm split drifts from the DESIGNED split, assignment
    * itself is broken (redirect bugs, bot filtering hitting one arm,
    * logging loss) and every downstream readout is invalid — a tiny
    * ratio drift at scale is a huge chi-square, which is exactly the
    * point (Fabijan et al., "Diagnosing Sample Ratio Mismatch", KDD'19).
    * One-sided binomial chi-square with 1 df, cleared denominators:
    * χ²·1000 = (1000·O_A − n·m)²·1000 div (n·m·(1000−m)) for design
    * share m milli of arm A — DECIMAL(38,0) through the square (the
    * numerator reaches n²·10⁶, past int64 at n > 3·10⁶), ONE floor
    * division, no float anywhere. `srm` flags χ² > 3.841 (the 1-df 95%
    * critical value — the standard alarm line; callers own any other α
    * via chi2_milli). Degenerate designs (m ∉ (0,1000)) and an empty
    * exposure set return NULL χ² rather than divide-by-zero.
    *
    * Scale: one DISTINCT-user reduction (single user-keyed shuffle) and
    * a 2-row arm rollup folded into a 1-row report — the q137 posture. */
  def srmCheck(events: DataFrame, userCol: String, typeCol: String,
               exposureType: String, designMilliA: Long): DataFrame = {
    require(designMilliA >= 0L && designMilliA <= 1000L,
      "designMilliA is the designed arm-A share in milli")
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val exposed = events.filter(col(typeCol) === exposureType)
      .select(col(userCol).as("graft_u")).distinct()
      .withColumn("graft_arm", arm)
    exposed.agg(
      count(lit(1)).as("graft_n"),
      // empty exposure: SUM is NULL — pin to 0 like the oracle's coalesce
      coalesce(sum(when(col("graft_arm") === "A", 1L).otherwise(0L)),
        lit(0L)).as("graft_oa"))
      .select(
        col("graft_n").cast("long").as("n_exposed"),
        col("graft_oa").cast("long").as("n_a"),
        expr("graft_n - graft_oa").cast("long").as("n_b"),
        expr(s"graft_n * $designMilliA div 1000").cast("long")
          .as("expected_a"),
        expr(s"CASE WHEN graft_n = 0 OR $designMilliA <= 0"
          + s"   OR $designMilliA >= 1000 THEN CAST(NULL AS BIGINT)"
          + s" ELSE CAST((CAST(1000 AS DECIMAL(38,0)) * graft_oa"
          + s"       - CAST(graft_n AS DECIMAL(38,0)) * $designMilliA)"
          + s"   * (CAST(1000 AS DECIMAL(38,0)) * graft_oa"
          + s"       - CAST(graft_n AS DECIMAL(38,0)) * $designMilliA)"
          + s"   * 1000 div (CAST(graft_n AS DECIMAL(38,0))"
          + s"       * $designMilliA * ${1000L - designMilliA})"
          + "  AS BIGINT) END").as("chi2_milli"))
      .withColumn("srm", // 0/1 BIGINT, not BOOLEAN — hash-stable
        when(col("chi2_milli").isNull, lit(null).cast("long"))
          .otherwise((col("chi2_milli") > 3841L).cast("long")))
  }

  /** Per-arm Wilson 95% interval — the UNCERTAINTY the point-rate
    * readout ([[abLift]]) can't carry: a 2%-vs-2.1% "lift" on 300
    * users is noise, and the Wilson score interval is the standard way
    * to say so (unlike the naive Wald interval it never leaves [0,1]
    * and stays honest at extreme rates / small n — Brown, Cai,
    * DasGupta 2001). lo/hi = (c + z²/2 ± z·√(c(n−c)/n + z²/4)) /
    * (n + z²) at z = 1.96, emitted floor-independent: the chain is
    * PINNED correctly-rounded IEEE ops from the two exact integers
    * (c, n) — one inner divide, one sqrt, the assembly, round 0 on the
    * ppm scale (the q280 argument) — so both engines produce the same
    * longs. Empty arm → NULL bounds.
    *
    * Scale: the abLift reduction (distinct users, one keyed shuffle)
    * plus a 2-row fold — nothing new touches the corpus. */
  def wilsonArms(events: DataFrame, userCol: String, typeCol: String,
                 valueCol: String, exposureType: String,
                 conversionType: String, minValue: Double): DataFrame = {
    val arm = when(substring(md5(col("graft_u").cast("string")), 1, 1) < "8",
      "A").otherwise("B")
    val exposed = events.filter(col(typeCol) === exposureType)
      .select(col(userCol).as("graft_u")).distinct()
      .withColumn("graft_arm", arm)
    val converted = events
      .filter(col(typeCol) === conversionType && col(valueCol) > minValue)
      .select(col(userCol).as("graft_u")).distinct()
      .withColumn("graft_conv", lit(1L))
    def bound(sign: String): String =
      "CAST(round((CAST(c AS DOUBLE) + 1.9208 " + sign +
        " 1.96 * sqrt(CAST(c * (n - c) AS DOUBLE) / CAST(n AS DOUBLE)" +
        " + 0.9604))" +
        " / (CAST(n AS DOUBLE) + 3.8416) * 1000000, 0) AS BIGINT)"
    exposed.join(converted, Seq("graft_u"), "left")
      .groupBy(col("graft_arm").as("arm"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        coalesce(sum(col("graft_conv")), lit(0L)).cast("decimal(38,0)")
          .as("c"))
      .select(col("arm"), col("n").cast("long").as("n_users"),
        col("c").cast("long").as("n_conv"),
        expr("CASE WHEN n = 0 THEN CAST(NULL AS BIGINT)"
          + " ELSE c * 1000000 div n END").as("rate_ppm"),
        expr("CASE WHEN n = 0 THEN CAST(NULL AS BIGINT) ELSE "
          + bound("-") + " END").as("wilson_lo_ppm"),
        expr("CASE WHEN n = 0 THEN CAST(NULL AS BIGINT) ELSE "
          + bound("+") + " END").as("wilson_hi_ppm"))
      .orderBy("arm")
  }

  /** Cochran-Armitage trend test — the DOSE-RESPONSE rung the 2×k
    * chi-square can't give (chi-square asks "are the k levels
    * different AT ALL"; CA asks the sharper, higher-powered question
    * "does the outcome rate move MONOTONICALLY with the ordered
    * dose"): per exposure level i with integer score s_i, n_i subjects
    * and r_i positives, z = numc·√N div √(R(N−R)·(N·Σs²n − (Σsn)²))
    * with numc = Σ s_i(r_i·N − n_i·R) — every radicand an exact
    * DECIMAL(38,0) (numc reaches s·N², the variance term N²·s²·n —
    * inside 38 digits at any real N), the finish the pinned
    * two-sqrt/one-divide/round chain (the q280 argument). Degenerate
    * inputs (all-positive/all-negative outcomes, a single level, zero
    * score variance) → NULL. `dose` here is the exposure level's own
    * integer score — callers own the scoring (equally-spaced integers
    * are the standard choice).
    *
    * Scale: one (dose)-keyed aggregate over the per-subject table
    * (itself one user-keyed reduction of the corpus), a k-row fold. */
  def cochranArmitage(subjects: DataFrame, doseCol: String,
                      outcomeCol: String): DataFrame = {
    val lvl = subjects
      .select(col(doseCol).cast("long").as("graft_s"),
        col(outcomeCol).cast("long").as("graft_y"))
      .filter(col("graft_s").isNotNull && col("graft_y").isNotNull)
      .groupBy("graft_s")
      .agg(count(lit(1)).cast("decimal(38,0)").as("graft_n"),
        sum("graft_y").cast("decimal(38,0)").as("graft_r"))
    lvl.agg(
      count(lit(1)).as("graft_k"),
      sum("graft_n").cast("decimal(38,0)").as("graft_nn"),
      sum("graft_r").cast("decimal(38,0)").as("graft_rr"),
      sum(expr("graft_s * graft_n")).cast("decimal(38,0)").as("graft_sn"),
      sum(expr("graft_s * graft_s * graft_n")).cast("decimal(38,0)")
        .as("graft_s2n"),
      sum(expr("graft_s * graft_r")).cast("decimal(38,0)").as("graft_sr"))
      .select(col("graft_k").cast("long").as("n_levels"),
        col("graft_nn").cast("long").as("n_subjects"),
        col("graft_rr").cast("long").as("n_positive"),
        expr("CASE WHEN graft_k < 2 OR graft_rr = 0"
          + "   OR graft_rr = graft_nn"
          + "   OR graft_nn * graft_s2n - graft_sn * graft_sn <= 0"
          + " THEN CAST(NULL AS BIGINT)"
          + " ELSE CAST(round("
          + "   CAST(graft_sr * graft_nn - graft_sn * graft_rr AS DOUBLE)"
          + "   * sqrt(CAST(graft_nn AS DOUBLE))"
          + "   / sqrt(CAST(graft_rr * (graft_nn - graft_rr)"
          + "       * (graft_nn * graft_s2n - graft_sn * graft_sn)"
          + "       AS DOUBLE)) * 1000, 0) AS BIGINT) END")
          .as("z_milli"))
      .withColumn("significant_05",
        expr("CASE WHEN z_milli IS NULL THEN CAST(NULL AS BIGINT)"
          + " WHEN abs(z_milli) >= 1960 THEN 1L ELSE 0L END"))
  }

  /** Multiple-testing correction panel — what an experiment platform
    * runs over a FAMILY of metric p-values before anyone reads them
    * (the many-metrics guard): per test the Bonferroni,
    * Holm step-down, and Benjamini-Hochberg step-up decisions at
    * `alphaPpm`, all EXACT — every threshold compare is cross-
    * multiplied to integers (p·m ≤ k·α), no division anywhere:
    *
    *  - Bonferroni: reject iff p·m ≤ α.
    *  - Holm: ranks ascending by (p, id); reject ranks before the
    *    FIRST k with p₍ₖ₎·(m−k+1) > α.
    *  - BH (FDR): reject ranks ≤ max{k : p₍ₖ₎·m ≤ k·α}.
    *
    * The (p, id) total order makes rank assignment — and therefore
    * every decision — engine-replayable even under tied p-values.
    *
    * Scale: one family-keyed window (families are metric panels —
    * bounded), one family-wide running aggregate over the same
    * partitioning; nothing corpus-sized. */
  def multipleTesting(tests: DataFrame, familyCol: String, idCol: String,
                      pPpmCol: String, alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      "alphaPpm must be inside (0, 1e6)")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(familyCol))
      .orderBy(col("p_ppm").asc, col(idCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(familyCol))
    val ranked = tests
      .select(col(familyCol), col(idCol),
        col(pPpmCol).cast("long").as("p_ppm"))
      .filter(assert_true(col("p_ppm") >= 0L && col("p_ppm") <= 1000000L,
        lit("multipleTesting: p_ppm outside [0, 1e6]")).isNull)
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll).cast("long"))
    ranked
      .withColumn("graft_holm_fail",
        col("p_ppm") * (col("m") - col("rank") + 1L) > alphaPpm)
      .withColumn("graft_first_fail",
        min(when(col("graft_holm_fail"), col("rank"))).over(wAll))
      .withColumn("graft_bh_ok",
        col("p_ppm") * col("m") <= col("rank") * alphaPpm)
      .withColumn("graft_bh_kmax",
        max(when(col("graft_bh_ok"), col("rank"))).over(wAll))
      .select(col(familyCol), col(idCol), col("p_ppm"), col("rank"),
        col("m"),
        (col("p_ppm") * col("m") <= alphaPpm).as("bonferroni_rej"),
        (col("rank") < coalesce(col("graft_first_fail"),
          col("m") + 1L)).as("holm_rej"),
        (col("rank") <= coalesce(col("graft_bh_kmax"), lit(0L)))
          .as("bh_rej"))
  }
}
