package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansLiteSpec extends SparkSpec {
  import spark.implicits._

  test("fit separates two planted blobs and lands centroids on their means") {
    // Blob A near (0, 0): ids 1..3; blob B near (1000, 1000): ids 4..6.
    // Seeds are the 2 lowest ids — both inside blob A — so convergence to
    // one-centroid-per-blob exercises real reassignment, not luck.
    val rows = Seq(
      (1L, 0L, 0L), (2L, 4L, 0L), (3L, 2L, 6L),
      (4L, 1000L, 1000L), (5L, 1004L, 1000L), (6L, 1002L, 1006L))
    val df = rows.toDF("id", "x", "y")
    val got = KMeansLite.fit(df, "id", col("x"), col("y"), k = 2, iters = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // Iter 1: seed 0 at (0,0) takes ids 1,3; seed 1 at (4,0) takes 2,4,5,6
    // — then the centroids split the blobs and it converges:
    // cluster 0 = blob A mean (2, 2), cluster 1 = blob B mean (1002, 1002).
    assert(got === Array(
      (0L, 3L, 2L, 2L),
      (1L, 3L, 1002L, 1002L)))
  }

  test("an emptied cluster keeps its previous centroid and reports n=0") {
    // k=3 over two tight blobs: one seed must end up memberless (its two
    // co-located seeds split 4 near rows; all far rows go to one of them).
    val rows = Seq(
      (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 500L, 500L), (5L, 500L, 500L))
    val df = rows.toDF("id", "x", "y")
    val got = KMeansLite.fit(df, "id", col("x"), col("y"), k = 3, iters = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).sum === 5L) // every row assigned exactly once
    // Seeds 0,1,2 all start at (0,0); ties break to the LOWER j, so j=0
    // keeps the origin blob, one centroid takes the far blob after the
    // first update, and the third stays where it was with no members.
    val empty = got.filter(_._2 == 0L)
    assert(empty.nonEmpty)
    assert(empty.forall(c => c._3 == 0L && c._4 == 0L))
  }

  test("fit is invariant to input partitioning") {
    val rows = (1L to 40L).map(i => (i, i * 7 % 13, i * 11 % 17))
    val df = rows.toDF("id", "x", "y")
    val a = KMeansLite.fit(df, "id", col("x"), col("y"), 4, 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = KMeansLite.fit(df.repartition(7), "id", col("x"), col("y"), 4, 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
