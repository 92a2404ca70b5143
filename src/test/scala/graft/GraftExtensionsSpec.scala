package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_bpe_tokens is callable from SQL with a literal merge table") {
    GraftExtensions.register(spark)
    Seq(Tuple1("low lower")).toDF("t").createOrReplaceTempView("graft_bpe_t")
    val got = spark.sql(
      "SELECT graft_bpe_tokens(t, 'l o;lo w;e r') AS tok FROM graft_bpe_t")
      .as[Seq[String]].head()
    assert(got === Seq("low", "low", "er"))
    // non-literal merge tables are rejected at plan time
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bpe_tokens(t, t) FROM graft_bpe_t").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("graft_jaro_winkler is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT round(graft_jaro_winkler('martha', 'marhta'), 10) AS jw")
      .as[Double].head()
    assert(math.abs(got - 0.9611111111) < 1e-9)
  }

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("graft_vecs")
    val got = spark.sql("SELECT graft_dot(a, b) AS d FROM graft_vecs")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("sketch family is callable from SQL: shingles -> minhash/simhash") {
    GraftExtensions.register(spark)
    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").createOrReplaceTempView("graft_docs")
    val row = spark.sql(
      """SELECT size(graft_shingles(text, 3)) AS nsh,
                size(graft_minhash(graft_shingles(text, 3), 32)) AS sig_len,
                graft_simhash(graft_shingles(text, 3)) AS sh
         FROM graft_docs""").head()
    assert(row.getAs[Int]("nsh") === 7)      // 9 tokens → 7 trigrams
    assert(row.getAs[Int]("sig_len") === 32)
    // Deterministic: same text → same simhash on a second evaluation.
    val again = spark.sql(
      "SELECT graft_simhash(graft_shingles(text, 3)) AS sh FROM graft_docs")
      .head().getAs[Long]("sh")
    assert(again === row.getAs[Long]("sh"))
  }

  test("sketch-size argument must be a literal") {
    GraftExtensions.register(spark)
    Seq(("abc def ghi", 2)).toDF("text", "n").createOrReplaceTempView("graft_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, n) FROM graft_bad").collect()
    }
    assert(e.getMessage.contains("literal"))
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
