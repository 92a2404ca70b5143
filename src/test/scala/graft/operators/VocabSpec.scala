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
