package graft.ml

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // planted anisotropy: coordinate 0 spreads ±8, coordinate 1 spreads
  // ±2, the rest carry small deterministic residue — PC1 must recover
  // axis 0, PC2 axis 1.
  private def planted(n: Int) = (0 until n).map { i =>
    val v = Array.fill(dim)(0.0f)
    v(0) = (if (i % 2 == 0) 8.0f else -8.0f) + (i % 5) * 0.01f
    v(1) = (if (i % 3 == 0) 2.0f else -1.0f) + (i % 7) * 0.01f
    v(2) = (i % 11) * 0.001f
    (i.toLong, v.toSeq)
  }

  test("power iteration recovers the planted dominant axes, in order") {
    val df = planted(600).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, k = 2)
    assert(m.n === 600L)
    assert(math.abs(m.components(0)(0)) > 0.99)
    assert(math.abs(m.components(1)(1)) > 0.99)
    assert(m.explained(0) > m.explained(1))
    assert(m.explained(0) > 0.9) // axis 0 dominates the variance
    // sign convention: first nonzero coordinate positive
    assert(m.components(0).find(math.abs(_) > 1e-12).exists(_ > 0))
  }

  test("integer moments make the fit partitioning-invariant, bit-exact") {
    val rows = planted(400)
    val a = Pca.fit(rows.toDF("vec_id", "embedding"), "embedding", dim, k = 2)
    val b = Pca.fit(rows.toDF("vec_id", "embedding").repartition(13),
      "embedding", dim, k = 2)
    assert(a.components.map(_.toSeq).toSeq === b.components.map(_.toSeq).toSeq)
    assert(a.mean.toSeq === b.mean.toSeq)
    assert(a.explained.toSeq === b.explained.toSeq)
  }

  test("transform projects onto the centered axes in milli units") {
    val df = planted(200).toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", dim, k = 2)
    val proj = Pca.transform(df, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // row 0 has x0 = +8.0: its pc1 must sit near (8 − mean0)·1000 up to
    // the tiny residue the other coordinates contribute
    val expect = math.round((8.0 - m.mean(0)) * 1000.0)
    assert(math.abs(proj(0L)._1 - expect) < 100)
    // opposite-sign rows project to opposite sides
    assert(proj(0L)._1 > 0 && proj(1L)._1 < 0)
  }
}
