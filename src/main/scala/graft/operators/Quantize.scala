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

  /** Binary (sign-bit) quantization — the most aggressive rung of the
    * quantization ladder (float32 → SQ8 → PQ → 1 bit/dim): each
    * dimension contributes only its sign, packed into integer words, and
    * similarity becomes Hamming distance — XOR + popcount, the cheapest
    * similarity computable (a 100 TB vector corpus shrinks 32× and a
    * scoring pass does dim/32 integer ops/row instead of dim FMAs).
    *
    * Packing contract (what the oracle replays): 0-based dimension d
    * lands in word d div wordBits at bit position d mod wordBits
    * (LSB-first); bit = 1 iff x ≥ 0. wordBits defaults to 32 so a packed
    * word is a small NONNEGATIVE long both engines assemble as a plain
    * integer sum — no signed-bit-63 wraparound to disagree on.
    *
    * Map-only: no stats pass (sign needs no corpus min/max — the one
    * quantizer that is training-free AND stats-free), no shuffle, no
    * join. */
  def binaryEncode(emb: DataFrame, idCol: String, vecCol: String,
                   wordBits: Int = 32): DataFrame = {
    require(wordBits >= 1 && wordBits <= 62,
      "wordBits must stay below the sign bit")
    // SQL-text lambda because shiftleft by a COLUMN (the fold variable)
    // isn't exposed through the Scala functions API.
    val packed = expr(
      s"""transform(
            sequence(0, (size($vecCol) - 1) div $wordBits),
            j -> aggregate(
              sequence(0, least($wordBits - 1,
                                size($vecCol) - j * $wordBits - 1)),
              0L,
              (acc, i) -> acc + if(element_at($vecCol,
                                 CAST(j * $wordBits + i + 1 AS INT)) >= 0,
                                   shiftleft(1L, CAST(i AS INT)), 0L)))""")
    emb.select(col(idCol).as("vec_id"), packed.as("words"))
      .withColumn("words_csv",
        array_join(transform(col("words"), _.cast("string")), ","))
  }

  /** Top-k by Hamming distance over the packed sign bits: per word
    * bit_count(a XOR b), summed — integer-exact, hash-checkable, one
    * map-only scoring scan + TakeOrderedAndProject (the driver holds only
    * the query's packed words). Ties break to the lower id. */
  def hammingTopK(emb: DataFrame, idCol: String, vecCol: String,
                  queryId: Long, k: Int): DataFrame = {
    val codes = binaryEncode(emb, idCol, vecCol)
    val q = codes.filter(col("vec_id") === queryId)
      .select("words").collect()
    require(q.nonEmpty, s"query id $queryId not found")
    val qWords = array(q.head.getSeq[Long](0).map(lit): _*)
    codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        aggregate(zip_with(col("words"), qWords,
            (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
      .limit(k)
  }

  /** Two-stage retrieval: Hamming shortlist → exact cosine re-rank — the
    * production binary-quantization shape (the 1-bit scan finds
    * `candidates` cheap approximate neighbors; only those re-read their
    * float vectors). The shortlist cut is deterministic (hamming asc, id
    * asc), so the oracle replays the exact candidate set; re-rank scores
    * round to 6dp before ordering like every cosine leg. At corpus scale
    * the shortlist is a semi-join back to the float store — candidates
    * rows, not corpus rows, pay the full-precision arithmetic. */
  def hammingRerankTopK(emb: DataFrame, idCol: String, vecCol: String,
                        queryId: Long, candidates: Int, k: Int): DataFrame = {
    require(candidates >= k, "shortlist must be at least k wide")
    val shortlist = hammingTopK(emb, idCol, vecCol, queryId, candidates)
      .select(col("vec_id").as(idCol))
    val qv = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("graft_qv")).limit(1)
    emb.join(shortlist, Seq(idCol), "left_semi")
      .crossJoin(broadcast(qv))
      .withColumn("cos", round(graft.functions.VectorFunctions
        .cosine(col(vecCol), col("graft_qv")), 6))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos"))
  }
}
