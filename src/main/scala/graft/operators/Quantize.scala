package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the memory-bound
  * scale path next to [[Similarity]]'s PQ: each dimension is linearly
  * mapped to an 8-bit code against its corpus-wide [min, max], cutting a
  * float32 vector store 4× (the difference between a 100 TB corpus's
  * vectors fitting executor memory or not). Unlike PQ's trained
  * codebooks, SQ8 is training-free and — because quantized similarity is
  * pure INTEGER arithmetic — every downstream score is hash-exact across
  * engines, no float-accumulation caveats.
  *
  * Scale posture: the per-dimension stats are a (dim → min, max)
  * aggregate — one corpus pass, map-side combinable, collected as a
  * dim-count-row artifact to the driver (same bounded-artifact contract
  * as the IVF centroids / PQ codebooks) and re-broadcast as literal
  * arrays, so encoding is a map-only projection with NO shuffle and no
  * join. Search is one scan + TakeOrderedAndProject. */
object Quantize {

  /** Per-dimension (0-based dim → min, max) over `vecCol`, as driver
    * arrays. Bounded by the embedding dimension. */
  private def dimStats(emb: DataFrame, vecCol: String):
      (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("graft_i", "graft_x")))
      .groupBy("graft_i")
      .agg(min("graft_x").as("mn"), max("graft_x").as("mx"))
      .collect()
    val dim = rows.length
    val mins = new Array[Double](dim); val maxs = new Array[Double](dim)
    rows.foreach { r =>
      val i = r.getInt(0); mins(i) = r.getDouble(1); maxs(i) = r.getDouble(2)
    }
    (mins, maxs)
  }

  /** The code expression: element i of the double-cast vector mapped to
    * floor((x−mn)·255/(mx−mn) + 0.5) — in [0, 255] by construction for
    * in-range x, constant dimensions (mx = mn) code to 0. The expression
    * tree is fixed so any engine replays the same bits pre-floor. */
  private def codesExpr(vecCol: String, mins: Array[Double],
                        maxs: Array[Double]): Column = {
    val mnA = array(mins.map(lit): _*); val mxA = array(maxs.map(lit): _*)
    transform(col(vecCol).cast("array<double>"), (x, i) => {
      val mn = element_at(mnA, i + 1); val mx = element_at(mxA, i + 1)
      when(mx > mn,
        floor((x - mn) * lit(255.0) / (mx - mn) + lit(0.5)).cast("int"))
        .otherwise(lit(0))
    })
  }

  /** Encode every vector: (id, codes array<int>, codes_csv) — the CSV
    * form exists so an external engine can hash-check the exact codes. */
  def sq8Encode(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (mins, maxs) = dimStats(emb, vecCol)
    emb.select(col(idCol).as("vec_id"),
        codesExpr(vecCol, mins, maxs).as("codes"))
      .withColumn("codes_csv",
        array_join(transform(col("codes"), _.cast("string")), ","))
  }

  /** Top-k by quantized dot product against `queryId`'s codes — integer
    * scores (≤ dim·255², long-safe), ties to the lower id, query row
    * excluded. One map-only scoring scan; the driver holds only the
    * query's code vector. */
  def sq8TopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int): DataFrame = {
    val codes = sq8Encode(emb, idCol, vecCol)
    val q = codes.filter(col("vec_id") === queryId)
      .select("codes").collect()
    require(q.nonEmpty, s"query id $queryId not found")
    val qCodes = array(q.head.getSeq[Int](0).map(c => lit(c.toLong)): _*)
    codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        aggregate(zip_with(col("codes"), qCodes,
            (a, b) => a.cast("long") * b),
          lit(0L), (acc, x) => acc + x).as("score_q"))
      .orderBy(col("score_q").desc, col("vec_id").asc)
      .limit(k)
  }
}
