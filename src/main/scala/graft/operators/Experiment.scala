package graft.operators

import org.apache.spark.sql.DataFrame
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
}
