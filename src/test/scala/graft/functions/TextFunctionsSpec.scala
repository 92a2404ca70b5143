package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{TextFunctions => T}

  test("tokens + shingles basics and edges") {
    val df = Seq("the quick brown fox", "one two", "solo", "  spaced   out  words here ")
      .toDF("text")
    val got = df.select(T.wsTokens($"text").as("ws"),
      size(T.shinglesOf(T.tokens($"text"), 3)).as("sh3")).as[(Int, Int)].collect()
    assert(got(0) == ((4, 2)))  // 4 tokens -> 2 distinct 3-shingles
    assert(got(1) == ((2, 0)))  // too short for 3-shingles
    assert(got(2) == ((1, 0)))
    assert(got(3) == ((4, 2)))  // whitespace collapsed
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq(("a", "Hello  World"), ("b", "hello world"), ("c", "hello worlds"))
      .toDF("id", "text")
    val fps = df.select($"id", T.fingerprint($"text").as("fp"))
      .as[(String, String)].collect().toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("langGuess picks dominant marker language, 'und' when none") {
    val df = Seq("the cat and the dog is here", "der hund und die katze ist",
      "le chat et la mer est", "el gato y los perros es", "zzz qqq").toDF("text")
    val got = df.select(T.langGuess($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "es", "und"))
  }

  test("qualityScore is in [-1, 1] and penalizes punctuation noise") {
    val clean = "a sentence of reasonable length with many words in it"
    val noisy = "a,,,b..;;;c!!!???...,,,"
    val got = Seq(clean, noisy).toDF("text")
      .select(T.qualityScore($"text")).as[Double].collect()
    assert(got(0) > got(1))
  }

  test("native shingles match the composable chain exactly") {
    val texts = Seq("the quick brown fox jumps", "one two", "", "  ",
      "a  b\tc\nd e",
      "Mixed CASE Words repeated mixed case words repeated")
    val df = texts.toDF("text")
    val got = df.select(
      T.wordShinglesNative($"text", 3).as("nat"),
      T.shinglesOf(T.tokens($"text"), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    got.zip(texts).foreach { case ((nat, hof), t) =>
      assert(nat.sorted == hof.sorted, s"mismatch for '$t'")
    }
  }

  test("wordTokens counts alphanumeric runs") {
    val got = Seq("ab1 cd, ef-gh 22").toDF("text")
      .select(T.wordTokens($"text")).as[Int].head()
    assert(got == 5) // ab1 cd ef gh 22
  }

  test("hashSplit3: deterministic, content-pure, near the requested weights") {
    val docs = (1 to 2000).map(i => s"document number $i with filler")
      .toDF("text")
    val counts = docs.select(T.hashSplit3($"text", 80, 10).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    // 16-bit buckets: binomial noise at n=2000 stays well inside ±4pp
    assert(math.abs(counts("train") - 1600L) < 80)
    assert(math.abs(counts("val") - 200L) < 60)
    // same content → same split on a re-run (no seed, no partitioning)
    val again = docs.repartition(7)
      .select(T.hashSplit3($"text", 80, 10).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }
}
