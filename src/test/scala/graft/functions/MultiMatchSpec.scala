package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String, pats: Seq[String]): Seq[Long] =
    new AhoAutomaton(pats).counts(text).toSeq

  test("the Aho-Corasick 1975 example: he/she/his/hers over ushers") {
    assert(counts("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1L, 1L, 0L, 1L))
  }

  test("overlapping, nested, and repeated matches all count") {
    assert(counts("aaaa", Seq("aa")) === Seq(3L)) // sliding overlaps
    assert(counts("abab", Seq("ab", "aba", "bab")) === Seq(2L, 1L, 1L))
    assert(counts("xyz", Seq("q")) === Seq(0L))
    assert(counts("", Seq("a")) === Seq(0L))
    // one pattern a prefix of another: both fire at the long match
    assert(counts("prefixes", Seq("pre", "prefix")) === Seq(1L, 1L))
    // duplicate pattern entries each keep their own count slot
    assert(counts("zz", Seq("z", "z")) === Seq(2L, 2L))
  }

  test("codegen path matches the direct automaton on a column") {
    val pats = Seq("he", "she", "hers")
    val got = Seq("ushers and he", "nothing", null)
      .toDF("t")
      .select(TextFunctions.ahoCounts(col("t"), pats))
      .as[Seq[Long]].collect().toSeq
    assert(got === Seq(Seq(2L, 1L, 1L), Seq(0L, 0L, 0L), null))
  }
}
