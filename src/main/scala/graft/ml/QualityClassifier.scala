package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the CCNet / GPT-3-corpus
  * "quality classifier" stage: a linear classifier over hashed
  * bag-of-words features separates a trusted reference slice ("good")
  * from raw crawl ("junk"), and its score becomes the per-document keep
  * signal. The heuristic quality score (TextFunctions.qualityScore) is a
  * fixed formula; this learns corpus-specific vocabulary evidence from
  * labeled examples and generalizes to wording the heuristic can't see.
  *
  * Spark-first shape:
  *  - **Featurize**: HashingTF — the hashing trick into `dim` buckets.
  *    No vocabulary fit, no broadcast dictionary, identical featurization
  *    at train and score time at any corpus size; empty docs become empty
  *    sparse vectors (scored, not dropped).
  *  - **Train**: Spark ML LogisticRegression (L2, LBFGS) — fit
  *    distributes over the feature table; only the `dim`-sized
  *    coefficient vector lives on the driver.
  *  - **Score**: one narrow transform; the coefficients ship with the
  *    closure as a `dim`-double literal, and `vector_to_array` (not a
  *    hand UDF) exposes P(good).
  *
  * Scale posture: featurization is a per-row map (no shuffle at all);
  * training cost is O(dim × passes); scoring is embarrassingly parallel.
  * Nothing corpus-sized is ever collected. Scores are model-dependent
  * doubles — contract queries over this are rows-only (like the other ML
  * surfaces), with the planted-separability spec carrying the
  * correctness claim.
  */
object QualityClassifier {

  /** Hashed bag-of-words featurization: `dim`-bucket sparse tf vectors. */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                dim: Int = 4096): DataFrame = {
    require(dim > 0, "dim must be positive")
    val toks = docs.select(col(idCol).as("graft_id"),
      regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))
        .as("graft_toks"))
    new HashingTF().setInputCol("graft_toks").setOutputCol("graft_features")
      .setNumFeatures(dim).transform(toks)
      .select("graft_id", "graft_features")
  }

  /** Fit the classifier on (id, text, label∈{0,1}) examples. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 4096,
            regParam: Double = 0.01, maxIter: Int = 50): LogisticRegressionModel = {
    val feats = featurize(labeled, idCol, textCol, dim)
      .join(labeled.select(col(idCol).as("graft_id"),
        col(labelCol).cast("double").as("graft_label")), Seq("graft_id"))
    new LogisticRegression()
      .setFeaturesCol("graft_features").setLabelCol("graft_label")
      .setRegParam(regParam).setMaxIter(maxIter).setStandardization(false)
      .fit(feats)
  }

  /** Score documents: (id, quality_prob = P(label=1)) per doc. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            idCol: String, textCol: String, dim: Int = 4096): DataFrame =
    model.transform(featurize(docs, idCol, textCol, dim))
      .select(col("graft_id").as(idCol),
        vector_to_array(col("probability")).getItem(1).as("quality_prob"))

  /** Train on weak labels derived from a heuristic threshold, score the
    * whole corpus — the one-call pipeline the contract query uses.
    * `labelOf` marks the weak positive class (evaluated over the doc
    * columns). This is the CCNet bootstrap: a cheap rule labels the
    * extremes, the classifier interpolates everything in between. */
  def weakLabelPipeline(docs: DataFrame, idCol: String, textCol: String,
                        labelOf: org.apache.spark.sql.Column,
                        dim: Int = 4096): DataFrame = {
    val labeled = docs.withColumn("graft_weak", labelOf.cast("int"))
    val model = train(labeled, idCol, textCol, "graft_weak", dim)
    score(model, docs, idCol, textCol, dim)
  }
}
