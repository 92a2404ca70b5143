package graft.functions

import graft.SparkSpec
import graft.operators.Vocab
import org.apache.spark.sql.functions._

/** The native BPE encoder: exhaustive lowest-rank-first merge loop,
  * hand-computed fixtures including the INTERACTING merge tables the SQL
  * oracle cannot replay (q323's oracle covers the non-interacting
  * closed-form leg on real corpus text). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Vocab.bpeTokens(col("t"), merges).as("tok"))
      .as[Seq[String]].collect().head

  test("cascaded merges apply in rank order (the Sennrich low/lower fixture)") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(enc("low", merges) === Seq("low"))
    assert(enc("lower", merges) === Seq("low", "er"))
    assert(enc("lowest", merges) === Seq("low", "e", "s", "t"))
    assert(enc("low lower lowest", merges) ===
      Seq("low", "low", "er", "low", "e", "s", "t"))
  }

  test("rank priority decides overlapping candidates") {
    // (a,b) outranks (b,c): "abc" → [ab, c]; swapped ranks → [a, bc]
    assert(enc("abc", Seq(("a", "b"), ("b", "c"))) === Seq("ab", "c"))
    assert(enc("abc", Seq(("b", "c"), ("a", "b"))) === Seq("a", "bc"))
  }

  test("a round merges ALL leftmost-nonoverlapping occurrences") {
    // true BPE runtime behavior: one round of (a,a) on "aaaa" gives
    // [aa, aa] — not the trainer's single-replace alternation
    assert(enc("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(enc("aaaaa", Seq(("a", "a"))) === Seq("aa", "aa", "a"))
    // and a follow-up rank can consume the merged symbols
    assert(enc("aaaa", Seq(("a", "a"), ("aa", "aa"))) === Seq("aaaa"))
  }

  test("normalization, word isolation, and edge cases") {
    val m = Seq(("t", "h"))
    assert(enc("The THeta", m) === Seq("th", "e", "th", "e", "t", "a"))
    // merges never span whitespace
    assert(enc("cat hat", m) === Seq("c", "a", "t", "h", "a", "t"))
    assert(enc("", m) === Seq.empty)
    assert(enc("   ", m) === Seq.empty)
    // null in, null out
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(Vocab.bpeTokens(col("t"), m).as("tok"))
      .collect().head
    assert(n.isNullAt(0))
    // surrogate-safe: an astral codepoint is one symbol, not two
    assert(enc("a😀b", Seq.empty) === Seq("a", "😀", "b"))
  }

  test("disjoint-alphabet closed form holds (the q323 oracle identity)") {
    val texts = Seq("the thousand answers", "es an ou th", "anthology south",
      "thanes outhouse", "mixed CASE Thanks")
    for (t <- texts) {
      val got = enc(t, Vocab.DisjointMerges).length
      val nt = t.toLowerCase.trim.replaceAll("\\s+", " ")
      def occ(p: String) = (nt.length - nt.replace(p, "").length) / 2
      val want = nt.replace(" ", "").length -
        occ("th") - occ("an") - occ("ou") - occ("es")
      assert(got === want, s"closed form diverged on '$t'")
    }
  }

  test("trained merge table feeds the encoder (rank compatibility)") {
    val docs = Seq.fill(8)("hug hug pug pun").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val merges = Vocab.bpeMerges(docs, "t", merges = 2)
      .orderBy("merge_idx")
      .select("pair").as[String].collect()
      .map { p => val a = p.split(" "); (a(0), a(1)) }.toSeq
    assert(merges.nonEmpty)
    // whatever was learned, encoding with it reduces token count vs chars
    val toks = enc("hug hug pug pun", merges)
    assert(toks.length < "hughugpugpun".length)
    // and the encoder honors the learned FIRST merge everywhere it applies
    val (l, r) = merges.head
    assert(!toks.sliding(2).exists(s => s.length == 2 && s(0) == l && s(1) == r),
      s"first-rank pair ($l,$r) left unmerged in $toks")
  }

  test("whole-stage codegen keeps the expression inline (no UDF fallback)") {
    // a parquet-backed scan (a local relation constant-folds away before
    // the physical plan can show the codegen span)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(
      Vocab.bpeTokenCount(col("text"), Vocab.DisjointMerges).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the compact plan print
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") &&
      !plan.contains("ScalaUDF"), plan)
    assert(df.agg(sum("n")).as[Long].collect().head > 0L)
    // exact value sanity on a known string
    assert(enc("the answer", Vocab.DisjointMerges).length === 7)
  }
}
