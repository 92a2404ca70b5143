package graft.operators

import graft.SparkSpec

/** Quality evaluation of the approximate dedup family against the exact
  * n-gram Jaccard operator as ground truth, on a synthetic corpus with
  * planted near-duplicates (seeded — deterministic). */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  // 60 base docs of 40 random words; every third doc gets a near-dup clone
  // with ~5% of words replaced (expected 3-shingle jaccard ≈ 0.7-0.85).
  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(400)(i => s"w$i")
    def doc() = Vector.fill(40)(vocab(rnd.nextInt(vocab.size)))
    val bases = Vector.tabulate(60)(i => (i.toLong, doc()))
    val clones = bases.collect { case (i, words) if i % 3 == 0 =>
      val mutated = words.map(w =>
        if (rnd.nextDouble() < 0.05) vocab(rnd.nextInt(vocab.size)) else w)
      (1000L + i, mutated)
    }
    (bases ++ clones).map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  test("minhash LSH recall >= 0.9 against exact jaccard >= 0.5 pairs") {
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.size >= 18, s"planted pairs missing: ${exact.size}")
    val approx = Dedup.minhashPairs(corpus, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 2, minAgree = 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (found ${approx.size}, exact ${exact.size})")
  }

  test("portable md5 minhash recall >= 0.9 on the same planted corpus") {
    // Same ground truth and banding geometry as the native-sketch test:
    // the portable variant must be the crc32 path's quality equal, not
    // just its deterministic twin.
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val rows = Dedup.minhashPairsPortable(corpus, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 2, minAgree = 0.4)
      .as[(Long, Long, Double)].collect()
    val approx = rows.map(r => (r._1, r._2)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"portable recall $recall of ${exact.size}")
    // estimates track true jaccard: planted pairs agree on most positions
    assert(rows.forall(r => r._3 >= 0.4 && r._3 <= 1.0))
  }

  test("portable simhash finds the planted near-dup clones") {
    val found = Dedup.simhashPairsPortable(corpus, "doc_id", "text",
      n = 3, maxHamming = 10)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // the planted clone pairs (i, 1000+i) must dominate the result; a
    // 32-bit fingerprint's collision floor admits SOME unrelated pairs at
    // this threshold (~0.3% of the 3160 possible pairs here) — that's the
    // portability trade vs the 64-bit native sketch, and it's fine for a
    // candidate set that downstream verification filters
    val planted = found.filter { case (a, b) => b == 1000L + a }
    assert(planted.size >= 12, s"only ${planted.size} planted pairs found")
    val unrelated = found.filter { case (a, b) => a < 1000 && b < 1000 }
    assert(unrelated.size <= found.size / 2,
      s"${unrelated.size} unrelated pairs vs ${found.size} total")
    assert(unrelated.size <= 3160 / 100, // collision floor stays sub-1%
      s"unrelated FP rate too high: ${unrelated.size}/3160")
  }

  test("simhash block banding surfaces every hamming<=8 pair") {
    // Simhash's design point (Manku et al.): tight dups at small hamming.
    // 4x16-bit block banding guarantees hamming<=3 candidates and catches
    // hamming<=8 with high probability; beyond that (noisy short docs)
    // minhash is the right tool — asserted above. Ground truth here is the
    // signature table itself via an exhaustive cross join.
    import org.apache.spark.sql.functions._
    val s = Dedup.simhash(corpus, "doc_id", "text", 3)
    val truth = s.toDF("id1", "h1").crossJoin(s.toDF("id2", "h2"))
      .filter($"id1" < $"id2")
      .withColumn("hamming", bit_count($"h1".bitwiseXOR($"h2")))
      .filter($"hamming" <= 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val found = Dedup.simhashPairs(corpus, "doc_id", "text", n = 3,
      maxHamming = 8, blocks = 8) // blocks-1 = 7 guaranteed; 8 near-certain
    val foundSet = found.select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = (truth intersect foundSet).size.toDouble / truth.size
    assert(recall >= 0.9, s"simhash candidate recall $recall of ${truth.size}")
    // hard pigeonhole guarantee at hamming <= blocks-1
    val guaranteed = s.toDF("id1", "h1").crossJoin(s.toDF("id2", "h2"))
      .filter($"id1" < $"id2")
      .withColumn("hamming", bit_count($"h1".bitwiseXOR($"h2")))
      .filter($"hamming" <= 7)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert((guaranteed -- foundSet).isEmpty, "pigeonhole guarantee violated")
  }
}
