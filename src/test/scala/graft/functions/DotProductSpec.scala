package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{VectorFunctions => V}

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)),
    (3L, Array.tabulate(64)(i => (math.sin(i) * 0.1).toFloat),
      Array.tabulate(64)(i => (math.cos(i) * 0.1).toFloat)))
    .toDF("id", "a", "b")

  test("native dot matches the interpreted higher-order fold bitwise") {
    val got = vecs.select(V.dot($"a", $"b").as("n"), V.dotHof($"a", $"b").as("h"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, h) => assert(n == h) } // exact, not approx
  }

  test("native dot value is correct") {
    val d = vecs.filter($"id" === 1).select(V.dot($"a", $"b")).as[Double].head()
    assert(d == (4.0 + 10.0 + 18.0))
  }

  test("null array yields null") {
    val df = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
    val got = df.select(V.dot($"a", $"b")).collect()(0)
    assert(got.isNullAt(0))
  }

  test("cosine of identical vectors is 1") {
    val c = vecs.select(round(V.cosine($"a", $"a"), 9)).as[Double].collect()
    assert(c.forall(_ == 1.0))
  }

  test("native dot survives whole-stage codegen inside a real plan") {
    val df = vecs.select($"id", V.dot($"a", $"b").as("d"))
      .filter($"d" > -1e9).groupBy().agg(count(lit(1)))
    assert(df.as[Long].head() == 3L)
  }
}
