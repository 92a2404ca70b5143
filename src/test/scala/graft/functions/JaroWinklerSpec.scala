package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jwCol = ColumnBridge.column(JaroWinkler(
    ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))

  test("textbook fixtures match the published values through codegen") {
    // the canonical record-linkage examples (Winkler boost, no 0.7 gate)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111),
      ("dwayne", "duane", 0.84),
      ("dixon", "dicksonx", 0.8133333333),
      ("kitten", "sitting", 0.7460317460),
      ("crate", "trace", 0.7333333333),
      ("hello", "hello", 1.0),
      ("abc", "", 0.0),
      ("a", "b", 0.0))
    val got = cases.map { case (x, y, _) => (x, y) }.toDF("a", "b")
      .select(col("a"), round(jwCol, 10).as("jw"))
      .as[(String, Double)].collect().toMap
    cases.foreach { case (x, _, want) =>
      assert(math.abs(got(x) - want) < 1e-9, s"jw($x) = ${got(x)}") }
  }

  test("symmetry, null propagation, and the prefix boost cap at 4") {
    val sym = Seq(("information", "informant"), ("informant", "information"))
      .toDF("a", "b").select(jwCol).as[Double].collect()
    assert(sym(0) === sym(1))
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jwCol).collect()(0)
    assert(n.isNullAt(0))
    // prefixes longer than 4 must not boost further: compare two pairs
    // with identical jaro but prefix 4 vs 6 — equal jw
    val p = Seq(("abcdefxx", "abcdefyy"), ("abcdzzxx", "abcdzzyy"))
      .toDF("a", "b").select(jwCol).as[Double].collect()
    assert(p(0) === p(1))
  }

  test("DamerauLevenshtein: TRUE DL fixtures incl. the OSA-divergent witness") {
    val dlCol = ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    val cases = Seq(
      ("ca", "abc", 2),      // true DL; restricted OSA would say 3
      ("abc", "acb", 1),     // one swap (levenshtein charges 2)
      ("martha", "marhta", 1),
      ("kitten", "sitting", 3),
      ("abcdef", "abcfad", 3),
      ("", "xyz", 3), ("xyz", "", 3), ("same", "same", 0))
    val got = cases.map { case (x, y, _) => (x, y) }.toDF("a", "b")
      .select(col("a"), col("b"), dlCol.as("d"))
      .as[(String, String, Int)].collect()
      .map { case (x, y, dd) => (x, y) -> dd }.toMap
    cases.foreach { case (x, y, want) =>
      assert(got((x, y)) === want, s"dl($x, $y)") }
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(dlCol).collect()(0)
    assert(n.isNullAt(0))
  }

  test("jwNameMatch keeps only blocked pairs at or above the threshold") {
    val names = Seq("acme corp", "acme corps", "acme inc", "zeta corp")
      .toDF("n")
    val got = graft.operators.Dedup
      .jwNameMatch(names, "n", "n", minJw = 0.9)
      .as[(String, String, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    // same first-token block only; "zeta corp" never pairs with acme
    assert(got.map(r => (r._1, r._2)).forall { case (x, y) =>
      x.startsWith("acme") && y.startsWith("acme") })
    assert(got.exists { case (x, y, s) =>
      x == "acme corp" && y == "acme corps" && s > 0.97 })
  }
}
