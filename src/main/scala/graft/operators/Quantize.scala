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

  /** Johnson–Lindenstrauss random-projection distortion audit — "can
    * this corpus's distance structure survive a k-dim sketch": project
    * with a DETERMINISTIC ±1 matrix (sign of md5("j:i") — the
    * hash-split discipline applied to Achlioptas' database-friendly JL
    * variant, JCSS 2003) and report how pairwise squared distances
    * distort on a consistent sample. For ±1 entries E‖Px‖² = k·‖x‖², so
    * `distortion_ppm` = 10⁶·d²_proj div (k·d²_orig) centers on 10⁶; the
    * min/median/max spread over sampled pairs is the go/no-go readout
    * before committing a store to k dims.
    *
    * Exactness: coordinates quantize to 10⁴ fixed point (the float→int
    * contract every exact vector op here uses), the sign matrix is a
    * pure md5 function both engines compute identically, projections
    * and distances are integer sums, the median is the LOWER order
    * statistic under a total (distortion, id, id) order.
    *
    * Scale: the sample is consistent-hash chosen (`sampleMod`) and
    * GATED at `maxSample` vectors — the pair table is |S|², a bounded
    * audit artifact, never corpus²; the projection itself is one
    * narrow map over |S|·dim·k rows. Auditing projects the SAMPLE
    * only; projecting the full corpus is the same map without the
    * pair join. */
  def jlDistortion(emb: DataFrame, idCol: String, vecCol: String,
                   dim: Int, k: Int, sampleMod: Long,
                   maxSample: Long = 512L): DataFrame = {
    require(dim >= 1 && k >= 1 && sampleMod >= 1,
      "dim, k and sampleMod must be positive")
    def sign(j: Int, i: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    val signs = typedLit((0 until k).map(j =>
      (0 until dim).map(i => sign(j, i))))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val sample = emb
      .filter(pmod(col(idCol), lit(sampleMod)) === 0)
      .select(col(idCol).cast("long").as("graft_id"), col(vecCol))
      .withColumn("graft_ns", count(lit(1)).over(wAll))
      .filter(assert_true(col("graft_ns") <= lit(maxSample),
        lit(s"jlDistortion: sample exceeds $maxSample vectors — raise " +
          "sampleMod")).isNull)
      .drop("graft_ns")
    val q = Materialize.transient(sample
      .select(col("graft_id"), posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col("graft_id"), col("i"),
        floor(col("v") * 10000 + 0.5).cast("long").as("graft_q")))
    val proj = Materialize.transient(q
      .withColumn("j", explode(typedLit((0 until k).toList)))
      .select(col("graft_id"), col("j"),
        (element_at(element_at(signs, col("j") + 1), col("i") + 1) *
          col("graft_q")).as("graft_t"))
      .groupBy("graft_id", "j")
      .agg(sum("graft_t").as("graft_p")))
    def pairDist(t: DataFrame, posCol: String, valCol: String,
                 out: String): DataFrame = {
      val a = t.select(col("graft_id").as("id1"),
        col(posCol).as("graft_x"), col(valCol).as("va"))
      val b = t.select(col("graft_id").as("id2"),
        col(posCol).as("graft_x"), col(valCol).as("vb"))
      a.join(b, Seq("graft_x")).filter(col("id1") < col("id2"))
        .groupBy("id1", "id2")
        .agg(sum(expr("CAST(va - vb AS DECIMAL(38,0))" +
          " * CAST(va - vb AS DECIMAL(38,0))")).as(out))
    }
    val pairs = pairDist(q, "i", "graft_q", "d_orig")
      .join(pairDist(proj, "j", "graft_p", "d_proj"), Seq("id1", "id2"))
      .filter(col("d_orig") > 0)
      .select(col("id1"), col("id2"),
        expr(s"CAST(d_proj * 1000000 div (${k}L * d_orig) AS BIGINT)")
          .as("graft_dist"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .orderBy(col("graft_dist"), col("id1"), col("id2"))
    pairs
      .withColumn("graft_rn", row_number().over(wOrd).cast("long"))
      .withColumn("graft_np", count(lit(1)).over(wAll))
      .filter(col("graft_rn") === expr("(graft_np + 1) div 2") ||
        col("graft_rn") === 1L || col("graft_rn") === col("graft_np"))
      .agg(max("graft_np").as("n_pairs"),
        min("graft_dist").as("min_ppm"),
        max(when(col("graft_rn") === expr("(graft_np + 1) div 2"),
          col("graft_dist"))).as("median_ppm"),
        max("graft_dist").as("max_ppm"))
      .select(col("n_pairs").cast("long").as("n_pairs"),
        col("min_ppm").cast("long").as("min_ppm"),
        col("median_ppm").cast("long").as("median_ppm"),
        col("max_ppm").cast("long").as("max_ppm"))
  }
}
