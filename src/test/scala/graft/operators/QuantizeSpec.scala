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

  test("binaryEncode packs sign bits LSB-first into 32-bit words") {
    // 34 dims: word 0 gets dims 0..31, word 1 gets dims 32..33.
    // Positive dims 0, 2, 33; zero counts as set (x >= 0) at dim 5.
    val v = Array.fill(34)(-1.0f)
    v(0) = 0.5f; v(2) = 3.0f; v(5) = 0.0f; v(33) = 7.0f
    val got = Quantize.binaryEncode(emb((1L, v.toSeq)), "vec_id", "embedding")
      .select("words_csv").as[String].head()
    assert(got === s"${1L + 4L + 32L},${2L}")
  }

  test("binaryEncode: a 64-dim vector spans exactly two words") {
    val allPos = Quantize.binaryEncode(
      emb((1L, Seq.fill(64)(1.0f))), "vec_id", "embedding")
      .select("words_csv").as[String].head()
    assert(allPos === s"${(1L << 32) - 1},${(1L << 32) - 1}")
  }

  test("hammingTopK: distance counts sign disagreements, ties to low id") {
    val q = Seq(1.0f, 1.0f, 1.0f, -1.0f)
    val df = emb(
      (0L, q),
      (1L, Seq(1.0f, 1.0f, 1.0f, -1.0f)),   // hamming 0
      (2L, Seq(-1.0f, 1.0f, 1.0f, -1.0f)),  // hamming 1
      (3L, Seq(1.0f, -1.0f, 1.0f, 1.0f)),   // hamming 2
      (4L, Seq(-1.0f, -1.0f, -1.0f, 1.0f))) // hamming 4
    val got = Quantize.hammingTopK(df, "vec_id", "embedding", 0L, 4)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 4L)))
  }

  test("hammingRerankTopK: shortlist then exact-cosine order") {
    // 2 & 6 tie at hamming 0 (identical sign patterns), but exact cosine
    // ranks 6 above 2: the re-rank must reorder INSIDE the shortlist.
    val df = emb(
      (0L, Seq(10.0f, 10.0f, -10.0f)),
      (2L, Seq(1.0f, 10.0f, -1.0f)),
      (6L, Seq(10.0f, 9.0f, -10.0f)),
      (9L, Seq(-10.0f, -10.0f, 10.0f)))
    val got = Quantize.hammingRerankTopK(df, "vec_id", "embedding",
        0L, candidates = 2, k = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === Seq(6L, 2L))
  }

  test("jlDistortion: single-coordinate pairs distort to exactly 1e6") {
    // For ±1 sign entries, a pair differing in ONE coordinate by δ has
    // d_proj = Σ_j (s_j·δq)² = k·(δq)² EXACTLY — distortion_ppm = 10⁶
    // whatever the md5 signs are. Zero-distance pairs are excluded.
    val z = Seq.fill(4)(0.0f)
    def v(d3: Float) = z.updated(3, d3)
    val df = Seq((0L, z), (1L, v(0.5f)), (2L, v(1.0f)), (3L, v(1.0f)))
      .toDF("vec_id", "embedding")
    val r = Quantize.jlDistortion(df, "vec_id", "embedding",
      dim = 4, k = 3, sampleMod = 1L).collect()(0)
    // pair (2,3) is identical → excluded; the other 5 pairs all sit on
    // coordinate 3 alone → every distortion exactly 1e6
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(r.getAs[Long]("min_ppm") === 1000000L)
    assert(r.getAs[Long]("median_ppm") === 1000000L)
    assert(r.getAs[Long]("max_ppm") === 1000000L)
    // the sample gate fires loudly instead of building a huge pair set
    intercept[Exception] {
      Quantize.jlDistortion(df, "vec_id", "embedding", 4, 3,
        sampleMod = 1L, maxSample = 2L).collect()
    }
  }
}
