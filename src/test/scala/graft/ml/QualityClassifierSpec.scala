package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Two separable vocabularies: "prose" docs draw from a clean word
  // pool, "junk" docs from noise tokens. Deterministic construction —
  // doc i's words are a pure function of i.
  private val goodWords = Vector("the", "quick", "brown", "fox", "jumps",
    "over", "lazy", "dog", "reads", "daily", "news", "with", "coffee")
  private val junkWords = Vector("zzxq", "qqzv", "xjzz", "vvqx", "jjqz",
    "zxqv", "click", "here", "free", "win")
  private def doc(i: Int, good: Boolean): (Long, String, Int) = {
    val pool = if (good) goodWords else junkWords
    val words = (0 until 12).map(k => pool((i * 7 + k * 3) % pool.size))
    (i.toLong, words.mkString(" "), if (good) 1 else 0)
  }
  private def corpus = ((0 until 60).map(doc(_, good = true)) ++
    (60 until 120).map(doc(_, good = false)))
    .toDF("doc_id", "text", "label")

  test("featurize: fixed-dim sparse vectors, empty doc kept") {
    val df = Seq((1L, "a b a"), (2L, "")).toDF("doc_id", "text")
    val out = QualityClassifier.featurize(df, "doc_id", "text", dim = 64)
      .orderBy("graft_id").collect()
    assert(out.length === 2)
    val v1 = out(0).getAs[org.apache.spark.ml.linalg.Vector]("graft_features")
    assert(v1.size === 64 && v1.toArray.sum === 3.0) // tf counts: a=2, b=1
    val v2 = out(1).getAs[org.apache.spark.ml.linalg.Vector]("graft_features")
    assert(v2.numActives === 0, "empty doc scores as an empty vector, not dropped")
  }

  test("planted separability: classifier generalizes to held-out docs") {
    val train = corpus.filter(col("doc_id") % 2 === 0)
    val holdout = corpus.filter(col("doc_id") % 2 === 1)
    val model = QualityClassifier.train(train, "doc_id", "text", "label",
      dim = 256)
    val scored = QualityClassifier.score(model, holdout, "doc_id", "text",
      dim = 256)
      .join(holdout.select("doc_id", "label"), "doc_id")
    val acc = scored.select(
      avg(when((col("quality_prob") > 0.5).cast("int") === col("label"), 1.0)
        .otherwise(0.0))).as[Double].head()
    assert(acc >= 0.95, s"held-out accuracy $acc — vocabularies are separable")
    // scores order the classes, not just threshold them
    val meanBy = scored.groupBy("label").agg(avg("quality_prob").as("p"))
      .as[(Int, Double)].collect().toMap
    assert(meanBy(1) > 0.8 && meanBy(0) < 0.2, meanBy)
  }

  test("weakLabelPipeline scores every doc exactly once, probabilities in [0,1]") {
    val out = QualityClassifier.weakLabelPipeline(corpus, "doc_id", "text",
      labelOf = col("label") === 1, dim = 256).collect()
    assert(out.length === 120)
    assert(out.map(_.getLong(0)).distinct.length === 120)
    assert(out.forall { r =>
      val p = r.getDouble(1); p >= 0.0 && p <= 1.0 })
  }
}
