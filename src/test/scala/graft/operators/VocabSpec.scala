package graft.operators

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMerges learns the hand-computed merge sequence with tiebreaks") {
    // Corpus: "aaab" x3, "ab" x2.
    //   round 1: pairs  a a -> 2*3 = 6,  a b -> 3+2 = 5       => merge "a a"
    //   round 2: vocab "aa a b"(3), "a b"(2): aa a -> 3, a b -> 5 => "a b"
    //   round 3: vocab "aa ab"(3), "ab"(2): aa ab -> 3          => "aa ab"
    val docs = Seq("aaab aaab", "aaab ab ab").toDF("text")
    val got = Vocab.bpeMerges(docs, "text", merges = 3)
      .collect().sortBy(_.getAs[Int]("merge_idx"))
      .map(r => (r.getAs[Int]("merge_idx"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("weight")))
    assert(got(0) === ((1, "a a", "aa", 6L)))
    assert(got(1) === ((2, "a b", "ab", 5L)))
    assert(got(2) === ((3, "aa ab", "aaab", 3L)))
  }

  test("bpeMerges rewrite merges alternate slots of a run, leftmost first") {
    // "aaaa" = a a a a: pair "a a" counts every adjacent slot (3). The
    // single padded-replace pass consumes the shared delimiter, so the run
    // rewrites to "aa a a" (alternate occurrences), NOT "aa aa" — and
    // round 2's counts are over that vocab: "aa a" (1) and "a a" (1), the
    // lexicographic tiebreak picking "a a".
    val docs = Seq("aaaa").toDF("text")
    val got = Vocab.bpeMerges(docs, "text", merges = 2)
      .collect().sortBy(_.getAs[Int]("merge_idx"))
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("weight")))
    assert(got(0) === (("a a", 3L)))
    assert(got(1) === (("a a", 1L)))
  }

  test("local trainer equals distributed bit-for-bit at k=64") {
    // A fixture rich enough that 64 rounds exercise ties, cascaded
    // merges (merged symbols re-pairing), run-alternation and
    // exhaustion-free depth: mixed-length pseudo-words with heavy reuse.
    val docs = Seq(
      "the theory there then theme other ether lather",
      "banana bandana band ban bananas cabana",
      "mississippi missive mission miss misfit",
      "abracadabra arcade arcana cascade abode",
      "the then there banana miss band arcade other",
      "zzz zzzz zzzzz zz zzzzzz").toDF("text")
    val dist = Vocab.bpeMergesDistributed(docs, "text", merges = 64)
      .collect().map(r => (r.getAs[Int]("merge_idx"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("weight"))).sortBy(_._1)
    val local = Vocab.bpeMergesLocal(docs, "text", merges = 64,
        maxVocabRows = 1000)
      .collect().map(r => (r.getAs[Int]("merge_idx"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("weight"))).sortBy(_._1)
    assert(dist.length === 64)
    assert(local.toSeq === dist.toSeq)
  }

  test("local trainer stops when every word is a single symbol") {
    val docs = Seq("ab ab ab cd cd").toDF("text")
    // 3 merges possible at most: "a b", "c d", then nothing pairs
    val got = Vocab.bpeMergesLocal(docs, "text", merges = 10,
        maxVocabRows = 100)
      .collect().map(r => (r.getAs[String]("pair"), r.getAs[Long]("weight")))
    assert(got.toSeq === Seq(("a b", 3L), ("c d", 2L)))
  }

  test("local trainer refuses past the driver row budget") {
    val docs = Seq("one two three four five six").toDF("text")
    val e = intercept[IllegalArgumentException] {
      Vocab.bpeMergesLocal(docs, "text", merges = 300, maxVocabRows = 3)
    }
    assert(e.getMessage.contains("driver"))
  }

  test("dispatcher routes large k to the local path") {
    // merges > LocalMergeThreshold with a tiny budget must hit the local
    // path's refusal — proof the dispatch happened.
    val docs = Seq("one two three four five six").toDF("text")
    intercept[IllegalArgumentException] {
      Vocab.bpeMerges(docs, "text", merges = Vocab.LocalMergeThreshold + 1,
        maxVocabRows = 3)
    }
    // and a real large-k train completes fast (no 300 Spark jobs)
    val got = Vocab.bpeMerges(docs, "text",
      merges = Vocab.LocalMergeThreshold + 44)
    assert(got.count() <= Vocab.LocalMergeThreshold + 44L)
  }

  test("bpeEncode applies merges in learned order and reports savings") {
    // Learned on the whole corpus ("aaab" x3, "ab" x2 — see the first
    // test): merge1 "a a"->aa, merge2 "a b"->ab, merge3 "aa ab"->aaab.
    // Encoding "aaab": a a a b -> aa a b -> aa ab -> aaab = 1 token (from
    // 4 chars); "ab": a b -> a b -> ab -> ab = 1 token (from 2 chars).
    val docs = Seq(("s1", "aaab aaab"), ("s1", "aaab ab ab"))
      .toDF("source", "text")
    val r = Vocab.bpeEncode(docs, "text", "source", merges = 3).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_words") === 5L)
    assert(r(0).getAs[Long]("tokens_chars") === 3 * 4L + 2 * 2L)
    assert(r(0).getAs[Long]("tokens_bpe") === 5L)
    assert(r(0).getAs[Long]("saved_ppm") === (16L - 5L) * 1000000L / 16L)
  }
}
