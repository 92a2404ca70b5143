package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  // Synthetic items: two well-separated price/size regimes per "brand" so
  // clustering has structure; y = 3x1 - 2x2 + noise for regression.
  private def items = (1 to 120).map { i =>
    val brand = if (i % 2 == 0) "A" else "B"
    val base = if (i <= 60) 10.0 else 1000.0
    (i.toLong, brand, base + i % 7, (i % 5) + 1)
  }.toDF("id", "brand", "price", "size")

  private def regData = {
    val rnd = new scala.util.Random(5)
    (1 to 800).map { _ =>
      val x1 = rnd.nextDouble() * 10; val x2 = rnd.nextDouble() * 10
      val x3 = rnd.nextDouble()
      (x1, x2, x3, 3 * x1 - 2 * x2 + rnd.nextGaussian() * 0.1)
    }.toDF("x1", "x2", "x3", "y")
  }

  test("kmeans recommendation returns same-cluster items, excludes query") {
    val clustered = Recommend.clusterItems(items, "id", "brand",
      Seq("price", "size"), itemsPerCluster = 30)
    val rec = Recommend.recommendFor(clustered, "id", 1L, Seq("id", "brand"))
    val ids = rec.select("id").as[Long].collect()
    assert(ids.nonEmpty && !ids.contains(1L))
    val qCluster = clustered.filter($"id" === 1L).select("cluster").as[Int].head()
    val recClusters = clustered.filter(col("id").isin(ids.take(5).map(Long.box): _*))
      .select("cluster").as[Int].collect()
    assert(recClusters.forall(_ == qCluster))
  }

  test("multi-item recommendation votes the modal cluster, excludes all inputs") {
    // Hand-built cluster assignments so the vote is fully controlled:
    // queries 1,2 → cluster 0; query 3 → cluster 1. Mode = 0.
    val clustered = Seq(
      (1L, "a", 0), (2L, "b", 0), (3L, "c", 1),
      (10L, "m0", 0), (11L, "m0", 0), (20L, "m1", 1), (21L, "m1", 1)
    ).toDF("id", "name", "cluster")
    val got = Recommend.recommendForAll(clustered, "id", Seq(1L, 2L, 3L),
      Seq("id", "name")).select("id").as[Long].collect().toSet
    assert(got === Set(10L, 11L)) // modal cluster's mates, no query ids
  }

  test("multi-item vote ties break to the earliest query item's cluster") {
    // 1 → cluster 5, 2 → cluster 9: one vote each; statistics.mode picks
    // the first encountered, i.e. query 1's cluster.
    val clustered = Seq(
      (1L, "a", 5), (2L, "b", 9), (50L, "x", 5), (90L, "y", 9)
    ).toDF("id", "name", "cluster")
    val got = Recommend.recommendForAll(clustered, "id", Seq(1L, 2L),
      Seq("id")).as[Long].collect().toSet
    assert(got === Set(50L))
    // Reversing the query order flips the tie.
    val rev = Recommend.recommendForAll(clustered, "id", Seq(2L, 1L),
      Seq("id")).as[Long].collect().toSet
    assert(rev === Set(90L))
  }

  test("planted clusters: recommendation surfaces return the exact membership (q62/q63 family)") {
    // Two regimes separated by orders of magnitude in feature space AND by
    // the ×100 group weight; n=30 → k = max(2, 30/15) = 2, so the planted
    // split IS the clustering (seeded KMeans + deterministic indexer make
    // it stable) — which upgrades the rows-only q62/q63 checks to an exact
    // membership assertion.
    val planted = (1 to 30).map { i =>
      val low = i <= 15
      (i.toLong, if (low) "A" else "B",
        (if (low) 10.0 else 5000.0) + i % 3, (i % 2) + 1)
    }.toDF("id", "brand", "price", "size")
    val clustered = Recommend.clusterItems(planted, "id", "brand",
      Seq("price", "size"))
    val rec = Recommend.recommendFor(clustered, "id", 3L, Seq("id"))
      .as[Long].collect().toSet
    assert(rec === ((1L to 15L).toSet - 3L))
    // Multi-item: queries 1,2 (low regime) + 16 (high) → modal cluster is
    // the low regime; mates exclude every query id including the outvoted 16.
    val multi = Recommend.recommendForAll(clustered, "id", Seq(1L, 2L, 16L),
      Seq("id")).as[Long].collect().toSet
    assert(multi === (3L to 15L).toSet)
  }

  test("predict scores new rows with a trained fit (composed surface)") {
    val fit = Popularity.train(regData, Seq("x1", "x2", "x3"), "y")
    val probe = Seq((5.0, 1.0, 0.5), (1.0, 9.0, 0.2)).toDF("x1", "x2", "x3")
    val preds = Popularity.predict(fit, probe)
      .select("prediction").as[Double].collect()
    assert(preds.length == 2)
    // y = 3x1 - 2x2: first probe ≈ 13, second ≈ -15 — the model must at
    // least order them correctly and land in the right regions.
    assert(preds(0) > preds(1))
    assert(preds(0) > 5 && preds(1) < 0)
  }

  test("RF training produces sane metrics and importances") {
    val fit = Popularity.train(regData, Seq("x1", "x2", "x3"), "y")
    assert(fit.r2 > 0.8)          // learnable signal
    assert(fit.nTrain > fit.nTest)
    val imp = Popularity.importancesDf(spark, fit)
      .as[(String, Double)].collect().toMap
    assert(imp("x1") > imp("x3")) // x3 is noise
    assert(math.abs(imp.values.sum - 1.0) < 0.01)
  }

  test("model artifact save/load round-trip (weekly-retrain persistence)") {
    // ml_training_dag.py persists the tuned model (joblib.dump analog);
    // the Spark-native artifact is MLWritable save + typed load, and the
    // reloaded model must predict identically.
    val fit = Popularity.train(regData, Seq("x1", "x2", "x3"), "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    fit.model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.regression.RandomForestRegressionModel.load(dir)
    assert(loaded.numTrees === fit.model.numTrees)
    assert(loaded.featureImportances === fit.model.featureImportances)
    val probe = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x1", "x2", "x3")).setOutputCol("graft_features")
      .transform(regData.limit(20))
    val a = fit.model.transform(probe).select("prediction").as[Double].collect()
    val b = loaded.transform(probe).select("prediction").as[Double].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("model comparison trains all three model families") {
    val got = Popularity.compareModels(spark, regData, Seq("x1", "x2", "x3"), "y")
      .as[(String, Double, Double)].collect()
    assert(got.map(_._1).toSet == Set("linear_regression", "random_forest", "gbt"))
    // linear data: LR should fit near-perfectly
    assert(got.find(_._1 == "linear_regression").get._3 > 0.99)
  }

  test("RFE keeps the informative features") {
    val kept = Popularity.rfeSelect(regData, Seq("x1", "x2", "x3"), "y", keep = 2)
    assert(kept.toSet == Set("x1", "x2"))
  }
}
