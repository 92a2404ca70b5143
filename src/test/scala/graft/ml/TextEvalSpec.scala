package graft.ml

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)
  private def wl(a: String, b: String): Long =
    graft.functions.WordLevenshtein.distance(u(a), u(b))
  private def lc(a: String, b: String): Long =
    graft.functions.WordLevenshtein.lcs(u(a), u(b))

  test("word levenshtein: hand cases, whitespace robustness") {
    assert(wl("the cat sat", "the cat sat") === 0L)
    assert(wl("the cat sat", "the dog sat") === 1L) // sub
    assert(wl("the cat", "the cat sat") === 1L)     // ins
    assert(wl("the cat sat on mats", "cat sat mats") === 2L)
    assert(wl("", "a b c") === 3L)
    assert(wl("  a   b  ", "a b") === 0L) // runs + padding collapse
    // a swap costs 2 at word level (no transposition op in WER)
    assert(wl("a b", "b a") === 2L)
    // symmetric
    assert(wl("x y z", "x z") === wl("x z", "x y z"))
  }

  test("token lcs: hand cases") {
    assert(lc("the cat sat", "the cat sat") === 3L)
    assert(lc("a b c d", "b x d") === 2L) // b, d
    assert(lc("a b c", "c b a") === 1L)
    assert(lc("", "a") === 0L)
    assert(lc("police killed the gunman",
      "the gunman kill police") === 2L) // Lin 2004's W-LCS example pair
  }

  test("werCer: rates floor over reference size, empty ref NULLs") {
    val pairs = Seq(
      (1L, "the dog sat", "the cat sat"),
      (2L, "whatever", "")).toDF("id", "hyp", "ref")
    val got = TextEval.werCer(pairs, "id", "hyp", "ref")
      .orderBy("id").collect()
    assert(got(0).getAs[Long]("word_edits") === 1L)
    assert(got(0).getAs[Long]("wer_ppm") === 333333L)
    assert(got(0).getAs[Long]("char_edits") === 3L) // cat→dog shares nothing
    assert(got(0).getAs[Long]("cer_ppm") === 3L * 1000000L / 11L)
    assert(got(1).isNullAt(got(1).fieldIndex("wer_ppm")))
    assert(got(1).isNullAt(got(1).fieldIndex("cer_ppm")))
  }

  test("rougeN: CLIPPED overlap (repeated hyp grams cannot overclaim)") {
    // ref has one 'the'; hyp repeats it 3x: clipped unigram overlap
    // counts min(3,1)=1 for 'the' + 1 for 'cat' = 2.
    val pairs = Seq((1L, "the the the cat", "the cat sat"))
      .toDF("id", "hyp", "ref")
    val r1 = TextEval.rougeN(pairs, "id", "hyp", "ref", 1).collect()(0)
    assert(r1.getAs[Long]("overlap") === 2L)
    assert(r1.getAs[Long]("ref_ngrams") === 3L)
    assert(r1.getAs[Long]("hyp_ngrams") === 4L)
    assert(r1.getAs[Long]("recall_ppm") === 666666L)
    assert(r1.getAs[Long]("precision_ppm") === 500000L)
    assert(r1.getAs[Long]("f1_ppm") === 2L * 2L * 1000000L / 7L)
    // bigrams: hyp {the the ×2, the cat}; ref {the cat, cat sat} → ov 1
    val r2 = TextEval.rougeN(pairs, "id", "hyp", "ref", 2).collect()(0)
    assert(r2.getAs[Long]("overlap") === 1L)
    // a doc too short for bigrams still reports a row (NULL rates)
    val short = Seq((1L, "a", "b")).toDF("id", "hyp", "ref")
    val rs = TextEval.rougeN(short, "id", "hyp", "ref", 2).collect()(0)
    assert(rs.getAs[Long]("ref_ngrams") === 0L)
    assert(rs.isNullAt(rs.fieldIndex("recall_ppm")))
    assert(rs.isNullAt(rs.fieldIndex("f1_ppm")))
  }

  test("rougeL: Lin 2004 example rates") {
    val pairs = Seq((1L, "police kill the gunman",
      "police killed the gunman")).toDF("id", "hyp", "ref")
    val r = TextEval.rougeL(pairs, "id", "hyp", "ref").collect()(0)
    assert(r.getAs[Long]("lcs") === 3L) // police, the, gunman
    assert(r.getAs[Long]("recall_ppm") === 750000L)
    assert(r.getAs[Long]("precision_ppm") === 750000L)
    assert(r.getAs[Long]("f1_ppm") === 750000L)
  }
}
