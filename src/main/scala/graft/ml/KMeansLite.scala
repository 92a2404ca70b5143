package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-portable Lloyd clustering on an integer feature grid — the
  * deterministic twin of the MLlib KMeans path (ml/Recommend.scala), built
  * so an external engine can replay every step bit-for-bit:
  *
  *  - features are quantized to longs BEFORE clustering, so distances are
  *    exact integer arithmetic (no float accumulation order to disagree
  *    on);
  *  - centroids are initialized from the k smallest ids (no RNG) and
  *    updated by FLOOR-dividing exact integer sums — `sum div n` — so an
  *    updated centroid lands back on the integer grid identically in any
  *    engine;
  *  - assignment ties break on the lower centroid id.
  *
  * This is the same promotion the portable MinHash/SimHash variants made
  * for the sketch family (ref dedup coverage): the seeded MLlib path keeps
  * its rows-only check, and this path is hash-checkable against a SQL
  * oracle that unrolls the same iterations.
  *
  * Scale posture: each iteration is one broadcast of k centroid rows and
  * one map-side-combinable groupBy — the textbook distributed-Lloyd shape.
  * Centroids are collected to the driver between iterations (bounded by
  * `k`, required ≤ 1024) exactly as MLlib's KMeans holds its centers on
  * the driver; nothing row-scale ever leaves the executors. */
object KMeansLite {

  /** Cluster rows of `df` on two quantized features. Returns one row per
    * centroid: (cluster, n, cx, cy) after `iters` Lloyd iterations — `n`
    * from a final assignment pass against the final centroids. Clusters
    * that lose all members keep their previous centroid and report n=0. */
  def fit(df: DataFrame, idCol: String, f1: Column, f2: Column,
          k: Int, iters: Int): DataFrame = {
    require(k > 0 && k <= 1024, "k must be in [1, 1024]")
    require(iters >= 0, "iters must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val feats = df.select(col(idCol).as("id"),
      f1.cast("long").as("f1"), f2.cast("long").as("f2"))
    // Init: the k smallest ids, numbered 0..k-1 in id order. The window
    // runs over k rows post-limit, so the single-partition sort is O(k).
    var cents: Seq[(Long, Long, Long)] = feats.orderBy("id").limit(k)
      .withColumn("j",
        (row_number().over(Window.orderBy("id")) - 1).cast("long"))
      .select("j", "f1", "f2").as[(Long, Long, Long)].collect().toSeq
    for (_ <- 1 to iters) {
      val upd = assign(feats, centDf(spark, cents))
        .groupBy("j")
        .agg(sum("f1").as("sx"), sum("f2").as("sy"), count(lit(1)).as("n"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (j, sx, sy, n) => j -> ((sx / n, sy / n)) }.toMap
      cents = cents.map { case (j, cx, cy) =>
        upd.get(j).map { case (nx, ny) => (j, nx, ny) }.getOrElse((j, cx, cy))
      }
    }
    val sizes = assign(feats, centDf(spark, cents))
      .groupBy("j").agg(count(lit(1)).as("n"))
    centDf(spark, cents).join(sizes, Seq("j"), "left")
      .select(col("j").as("cluster"), coalesce(col("n"), lit(0L)).as("n"),
        col("f1").as("cx"), col("f2").as("cy"))
  }

  private def centDf(spark: org.apache.spark.sql.SparkSession,
                     cents: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    cents.toDF("j", "f1", "f2")
  }

  /** Nearest-centroid assignment: broadcast the k centroids, take the
    * lexicographic min of (squared-distance, j) per row — exact longs, so
    * the argmin and its lower-j tiebreak are engine-portable. */
  private def assign(feats: DataFrame, cents: DataFrame): DataFrame = {
    val c = cents.select(col("j"), col("f1").as("cx"), col("f2").as("cy"))
    val d2 = (col("f1") - col("cx")) * (col("f1") - col("cx")) +
      (col("f2") - col("cy")) * (col("f2") - col("cy"))
    feats.crossJoin(broadcast(c))
      .select(col("id"), col("f1"), col("f2"),
        struct(d2.as("d"), col("j")).as("graft_pick"))
      .groupBy("id", "f1", "f2").agg(min("graft_pick").as("p"))
      .select(col("id"), col("f1"), col("f2"), col("p.j").as("j"))
  }
}
