package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("sq8Encode maps min→0, max→255, midpoint→128, constant dim→0") {
    val df = emb(
      (1L, Seq(0.0f, 10.0f, 7.5f)),
      (2L, Seq(4.0f, 30.0f, 7.5f)),
      (3L, Seq(2.0f, 20.0f, 7.5f)))
    val got = Quantize.sq8Encode(df, "vec_id", "embedding")
      .select("vec_id", "codes_csv").as[(Long, String)].collect().toMap
    // dim1 range [0,4]: 0→0, 4→255, 2→128 (floor(127.5+0.5)).
    // dim2 range [10,30]: 10→0, 30→255, 20→128. dim3 constant → 0.
    assert(got(1L) === "0,0,0")
    assert(got(2L) === "255,255,0")
    assert(got(3L) === "128,128,0")
  }

  test("sq8TopK ranks by exact integer dot product, query excluded") {
    // Codes (dim range [0,10] → x*25.5): q=(10,0) → (255,0);
    // near=(9,1)→(230,26); mid=(5,5)→(128,128); far=(0,10)→(0,255).
    val df = emb(
      (0L, Seq(10.0f, 0.0f)), (1L, Seq(9.0f, 1.0f)),
      (2L, Seq(5.0f, 5.0f)), (3L, Seq(0.0f, 10.0f)))
    val got = Quantize.sq8TopK(df, "vec_id", "embedding", 0L, 3)
      .as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(got(0)._2 === 230L * 255L)   // only dim1 overlaps the query
    assert(got(1)._2 === 128L * 255L)
    assert(got(2)._2 === 0L)
  }

  test("sq8 recall: quantized top-k finds the true nearest cluster") {
    // Two tight clusters far apart; query in cluster A — every quantized
    // top-(|A|-1) hit must be the other A members (SQ8 at 8 bits can't
    // confuse clusters separated by half the value range).
    val a = (0L to 9L).map(i => (i, Seq(100.0f + i % 3, 100.0f - i % 3, 0.1f * i)))
    val b = (10L to 19L).map(i => (i, Seq(-100.0f - i % 3, -100.0f + i % 3, 0.1f * i)))
    val got = Quantize.sq8TopK(emb(a ++ b: _*), "vec_id", "embedding", 0L, 9)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(got === (1L to 9L).toSet)
  }

  test("sq8 is invariant to input partitioning") {
    val rows = (0L to 40L).map(i =>
      (i, Seq((i * 7 % 13).toFloat, (i * 11 % 17).toFloat, (i % 5).toFloat)))
    val df = emb(rows: _*)
    val a = Quantize.sq8TopK(df, "vec_id", "embedding", 0L, 10)
      .as[(Long, Long)].collect().toSeq
    val b = Quantize.sq8TopK(df.repartition(7), "vec_id", "embedding", 0L, 10)
      .as[(Long, Long)].collect().toSeq
    assert(a === b)
  }
}
