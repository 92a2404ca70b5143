package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA by exact integer covariance + driver-side power iteration — the
  * dimensionality-reduction leg of the embedding family (SQ8 quantizes,
  * PQ codes, Matryoshka truncates; PCA finds the axes that MATTER —
  * whitening, 2-D corpus maps, variance auditing before an index build).
  *
  * Determinism is the design constraint a naive `ds.agg(sum of doubles)`
  * cannot meet (float accumulation order varies per partitioning, so the
  * fitted axes would differ run to run): vectors quantize to
  * `round(x · 2^scaleBits)` longs, and ONE typed aggregation accumulates
  * the exact integer sums Σq_i and Σq_i·q_j (upper triangle) — integer
  * addition is associative, so the accumulated moments are identical
  * under any shard layout or retry. The d×d covariance assembled from
  * those exact integers on the driver is therefore bit-identical every
  * run; power iteration from a FIXED start vector is then plain
  * deterministic double math on a d×d matrix.
  *
  * Scale shape: the corpus pass is map-side only (one partial aggregate,
  * d + d(d+1)/2 longs per partition ≈ 17 KB at d=64 — smaller than one
  * embedding batch), one k-free shuffle of those buffers; the model that
  * reaches the driver is O(d²) — the same artifact contract as KMeans
  * centroids or PQ codebooks. Quantization bound: |q| ≤ |x|·2^16, so the
  * product sums stay < 2⁶³ up to ~10⁹ rows at |x| ≤ 8; widen scaleBits
  * down (or the buffer to BigInt) past that — same plan shape.
  *
  * Reference: dimensionality reduction is the standard pre-index /
  * visualization step next to recommendation.py's KMeans feature
  * pipeline (same StandardScaler-style preprocessing family). */
object Pca {

  /** Fitted components (rows = components, unit-norm) + per-component
    * explained-variance fractions. Pure data — broadcastable. */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                      components: Array[Array[Double]],
                      explained: Array[Double])

  private class MomentAgg(d: Int, scale: Double)
      extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
      require(v.length == d, s"expected dim $d, got ${v.length}")
      val q = new Array[Long](d)
      var i = 0
      while (i < d) { q(i) = math.round(v(i) * scale); i += 1 }
      b(0) += 1L
      var off = 1 + d
      i = 0
      while (i < d) {
        b(1 + i) += q(i)
        var j = i
        while (j < d) { b(off) += q(i) * q(j); j += 1; off += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  def fit(emb: DataFrame, vecCol: String, dim: Int, k: Int = 2,
          scaleBits: Int = 16, iters: Int = 50): PcaModel = {
    require(k >= 1 && k <= dim, "k must be in [1, dim]")
    val spark = emb.sparkSession
    import spark.implicits._
    val scale = math.pow(2.0, scaleBits)
    val agg = new MomentAgg(dim, scale)
    val m = emb.select(col(vecCol).cast("array<float>").as("v"))
      .as[Seq[Float]]
      .select(agg.toColumn)
      .head()
    val n = m(0)
    require(n >= 2, "need at least two vectors")
    // exact integer moments → double covariance (deterministic: the
    // integers are exact, so this arithmetic is the same every run)
    val mean = Array.tabulate(dim)(i => m(1 + i).toDouble / n / scale)
    val cov = Array.ofDim[Double](dim, dim)
    var off = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val e2 = m(off).toDouble / n / (scale * scale)
        val c = e2 - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; off += 1
      }
      i += 1
    }
    val totalVar = (0 until dim).map(i => cov(i)(i)).sum
    // power iteration with deflation, fixed deterministic start
    def matVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim)(r => {
        var s = 0.0; var c = 0
        while (c < dim) { s += a(r)(c) * v(c); c += 1 }
        s
      })
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val work = cov.map(_.clone())
    val comps = new Array[Array[Double]](k)
    val explained = new Array[Double](k)
    var c = 0
    while (c < k) {
      var v = Array.tabulate(dim)(i => 1.0 / math.sqrt(dim.toDouble))
      var it = 0
      while (it < iters) {
        val w = matVec(work, v)
        val nw = norm(w)
        // a zero image means no variance left in this subspace
        v = if (nw == 0.0) v else w.map(_ / nw)
        it += 1
      }
      val lambda = {
        val w = matVec(work, v)
        (0 until dim).map(i => v(i) * w(i)).sum
      }
      // sign convention: first nonzero coordinate positive — the fitted
      // axis is unique up to sign, so pin it for replayability
      val flip = v.find(math.abs(_) > 1e-12).exists(_ < 0)
      comps(c) = if (flip) v.map(-_) else v
      explained(c) = if (totalVar == 0.0) 0.0 else lambda / totalVar
      // deflate: work -= lambda v vᵀ
      var r = 0
      while (r < dim) {
        var s = 0
        while (s < dim) { work(r)(s) -= lambda * v(r) * v(s); s += 1 }
        r += 1
      }
      c += 1
    }
    PcaModel(dim, n, mean, comps, explained)
  }

  /** Project each vector onto the fitted components: mean-centered dot
    * products in fixed milli units. The model broadcasts (O(k·d));
    * projection is map-side only — no shuffle. */
  def transform(emb: DataFrame, idCol: String, vecCol: String,
                model: PcaModel): DataFrame = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    val k = model.components.length
    emb.select(col(idCol).cast("long").as("graft_id"),
        col(vecCol).cast("array<float>").as("graft_v"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        val m = bc.value
        val pcs = Array.tabulate(k) { c =>
          var s = 0.0; var i = 0
          while (i < m.dim) {
            s += (v(i) - m.mean(i)) * m.components(c)(i); i += 1
          }
          math.round(s * 1000.0)
        }
        (id, pcs.toSeq)
      }
      .toDF(idCol, "pc_milli")
      .select(col(idCol) +: (0 until k).map(c =>
        element_at(col("pc_milli"), c + 1).as(s"pc${c + 1}_milli")): _*)
  }
}
