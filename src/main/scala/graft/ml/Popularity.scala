package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Random-forest target-metric regression — the Spark ML re-expression of
  * ml_training_dag.py: read the feature table, train/test split
  * (ml_training_dag.py:62, randomSplit with seed), RandomForestRegressor
  * with hyperparameter search over k-fold CV (BayesSearchCV →
  * CrossValidator + ParamGridBuilder, ml_training_dag.py:66-88), refit on
  * the full data, and expose feature importances (app.py:121-144).
  *
  * Scale posture: tree training is Spark ML's distributed impl; CV folds
  * are data splits, not driver loops. The grid is intentionally small —
  * tuning belongs to config, not hardcode.
  */
object Popularity {

  final case class Fit(model: RandomForestRegressionModel,
                       features: Seq[String], rmse: Double, r2: Double,
                       nTrain: Long, nTest: Long)

  def train(data: DataFrame, features: Seq[String], target: String,
            numTrees: Int = 20, folds: Int = 2, seed: Long = 42L): Fit = {
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("graft_features")
    val rf = new RandomForestRegressor()
      .setFeaturesCol("graft_features").setLabelCol(target)
      .setNumTrees(numTrees).setSeed(seed)
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(4, 6))
      .build()
    val evaluator = new RegressionEvaluator()
      .setLabelCol(target).setPredictionCol("prediction").setMetricName("rmse")
    val cv = new CrossValidator()
      .setEstimator(new Pipeline().setStages(Array(assembler, rf)))
      .setEstimatorParamMaps(grid).setEvaluator(evaluator)
      .setNumFolds(folds).setSeed(seed).setParallelism(2)
    val Array(trainDf, testDf) = data.randomSplit(Array(0.8, 0.2), seed)
    val best = cv.fit(trainDf)
    val predictions = best.transform(testDf)
    val rmse = evaluator.evaluate(predictions)
    val r2 = evaluator.setMetricName("r2").evaluate(predictions)
    val model = best.bestModel.asInstanceOf[org.apache.spark.ml.PipelineModel]
      .stages(1).asInstanceOf[RandomForestRegressionModel]
    Fit(model, features, rmse, r2, trainDf.count(), testDf.count())
  }

  /** One-row metrics frame (rows-only correctness check). */
  def metricsDf(spark: SparkSession, fit: Fit): DataFrame = {
    import spark.implicits._
    Seq((math.round(fit.rmse * 100) / 100.0, math.round(fit.r2 * 10000) / 10000.0,
      fit.nTrain, fit.nTest))
      .toDF("rmse", "r2", "n_train", "n_test")
  }

  /** (feature, importance) frame — the feature-importance dashboard. */
  def importancesDf(spark: SparkSession, fit: Fit): DataFrame = {
    import spark.implicits._
    fit.features.zip(fit.model.featureImportances.toArray)
      .map { case (f, v) => (f, math.round(v * 10000) / 10000.0) }
      .toDF("feature", "importance")
  }
}
