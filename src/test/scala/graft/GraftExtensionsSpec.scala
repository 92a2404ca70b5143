package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("graft_vecs")
    val got = spark.sql("SELECT graft_dot(a, b) AS d FROM graft_vecs")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("extensions class injects into SparkSessionExtensions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on malformed injection
  }

  test("registered function works on an independent session sharing the context") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    import s2.implicits._
    Seq((Array(1.0, 1.0), Array(2.0, 5.0))).toDF("a", "b")
      .createOrReplaceTempView("graft_vecs2")
    assert(s2.sql("SELECT graft_dot(a, b) AS d FROM graft_vecs2")
      .as[Double].head() == 7.0)
  }
}
