package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** The reference DAG run end-to-end on one engine — the "switch path" for
  * a DataBEATS user: extract → transform (dag.py:442-491) → load
  * (dag.py:725-849) → analytics surface (app.py) → ML (recommendation.py),
  * each stage consuming the previous stage's OUTPUT, with the invariants
  * the reference relies on asserted at every handoff. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("reference DAG end-to-end: extract → transform → load → analytics → ML") {
    // 1) EXTRACT — the API/Mongo pulls (dag.py:369-406) are table reads.
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val events = Tables.events(spark, dir)

    // 2) TRANSFORM — the pandas chain as declarative plans.
    val filtered = Etl.filterProject(orders, 150000.0)
    assert(filtered.count() > 0)
    assert(filtered.filter(col("total") <= 150000.0).isEmpty)

    val merged = Etl.unionHistory(orders, 730, 365) // history ∪ fresh batch
    assert(merged.count() > 0)

    val enriched = Etl.enrichRevenueByBrand(lineitem, part) // tracks⋈audio
    assert(enriched.count() > 0)
    assert(!enriched.columns.contains("l_partkey")) // aligned/projected

    val streaks = Charts.weeksOnChart(events, "user_id", "ts_t", "value", 10)
    val streakRows = streaks.collect()
    assert(streakRows.nonEmpty)
    assert(streakRows.map(_.getLong(0)).distinct.length === streakRows.length,
      "one streak row per entity")

    // 3) LOAD — truncate+append with dedup-on-load (dag.py:725-849), then
    // the reloaded table IS the analytics input (not the in-memory frame).
    val warehouse = java.nio.file.Files.createTempDirectory("graft_dag").toString
    val chartTable = s"$warehouse/chart"
    val snapshot = Charts.latestSnapshot(events, "user_id", "ts", "event_id")
      .select("user_id", "event_id", "event_type", "value")
      .join(streaks, Seq("user_id"))
    snapshot.write.mode("overwrite").parquet(chartTable)       // truncate
    snapshot.limit(0).write.mode("append").parquet(chartTable) // append cycle
    val loaded = spark.read.parquet(chartTable)
    assert(loaded.count() === snapshot.count())

    // 4) ANALYTICS SURFACE — app.py reads the loaded table.
    val top = Charts.topK(loaded.select("user_id", "value", "weeks_on_chart"),
      "value", "user_id", 20)
    assert(top.count() === math.min(20L, loaded.count()))
    val stats = Charts.featureStats(loaded, "event_type", "value")
    assert(stats.count() > 0)
    assert(stats.columns.toSet === Set("event_type", "n", "avg_v", "min_v", "max_v", "std_v"))

    // 5) ML — recommendation over the catalog, prediction over the facts.
    val clustered = ml.Recommend.clusterItems(part, "p_partkey", "p_brand",
      Seq("p_retailprice", "p_size"))
    val rec = ml.Recommend.recommendFor(clustered, "p_partkey", 1L,
      Seq("p_partkey", "p_name"))
    val recIds = rec.select("p_partkey").as[Long].collect()
    assert(recIds.nonEmpty && !recIds.contains(1L))

    val fit = ml.Popularity.train(
      lineitem.filter(pmod(col("l_orderkey"), lit(40)) === 0)
        .select("l_quantity", "l_discount", "l_tax", "l_extendedprice"),
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")
    val predicted = ml.Popularity.predict(fit,
      lineitem.filter(col("l_partkey") === 1L)
        .select("l_quantity", "l_discount", "l_tax"))
    assert(predicted.select("prediction").as[Double].collect().forall(p => !p.isNaN))
  }
}
