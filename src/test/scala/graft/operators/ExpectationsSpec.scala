package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private val facts = Seq(
    // (id, fk, price, status)
    (1L, Some(10L), 50.0, "OK"),
    (2L, Some(10L), 150.0, "OK"),   // price out of [0,100]
    (3L, None, 70.0, "BAD"),        // null fk; status outside {OK, NEW}
    (3L, Some(99L), 80.0, "NEW"))   // dup id; fk 99 has no dim row
    .map { case (a, b, c, d) => (a, b, c, d) }
    .toDF("id", "fk", "price", "status")
  private val dim = Seq(10L, 11L).toDF("k")

  test("each rule counts its planted violations exactly once") {
    val got = check(facts, Seq(
      NotNull("fk"),
      InRange("price", 0.0, 100.0),
      OneOf("status", Seq("OK", "NEW")),
      Matches("status", "^[A-Z]+$"),
      Unique(Seq("id")),
      RefIntegrity("fk", dim, "k", "dim")))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("not_null", "fk")) === ((4L, 1L, false)))
    assert(got(("in_range", "price")) === ((4L, 1L, false)))
    assert(got(("one_of", "status")) === ((4L, 1L, false)))
    assert(got(("matches", "status")) === ((4L, 0L, true)))
    assert(got(("unique", "id")) === ((4L, 1L, false)))
    // FK checks only the 3 non-null keys; one (99) is an orphan.
    assert(got(("ref_integrity", "fk->dim.k")) === ((3L, 1L, false)))
  }

  test("range, regex, and set rules skip nulls (NotNull's business)") {
    val df = Seq((Some(5.0), Some("OK")), (None, None))
      .toDF("price", "status")
    val got = check(df, Seq(
      InRange("price", 0.0, 100.0),
      OneOf("status", Seq("OK")),
      Matches("status", "^[A-Z]+$")))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(got.forall(r => r._3 == 2L && r._4 == 0L && r._5))
  }

  test("quarantine labels each row with its violated rules, in order") {
    val got = quarantine(facts, Seq(
      InRange("price", 0.0, 100.0), OneOf("status", Seq("OK", "NEW"))))
      .selectExpr("id", "violated").as[(Long, String)].collect().toSet
    assert(got === Set(2L -> "in_range:price", 3L -> "one_of:status"))
  }

  test("violations rejects table-level rules explicitly") {
    intercept[IllegalArgumentException] {
      violations(facts, Seq(Unique(Seq("id"))))
    }
  }

  test("a clean table passes every rule") {
    val got = check(facts.filter(col("id") < 3), Seq(
      NotNull("fk"), Unique(Seq("id")),
      RefIntegrity("fk", dim, "k", "dim")))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(got.length === 3)
    assert(got.forall(_._5))
  }

  test("fkAudit counts orphans and null keys exactly") {
    import graft.operators.Expectations
    val fact = Seq((Some(1L), "a"), (Some(2L), "b"), (Some(99L), "orphan"),
      (None, "nullkey"), (Some(98L), "orphan2"))
      .toDF("fk", "v")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = Expectations.fkAudit(Seq(("t.fk", fact, "fk", dim, "pk")))
      .collect()(0)
    assert(r.getAs[String]("relation") === "t.fk")
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("n_null_keys") === 1L)
    assert(r.getAs[Long]("n_orphans") === 2L)
    // a clean relation reports zeros
    val clean = Expectations.fkAudit(Seq(
      ("c", Seq(Tuple1(1L)).toDF("fk"), "fk", dim, "pk"))).collect()(0)
    assert(clean.getAs[Long]("n_orphans") === 0L
      && clean.getAs[Long]("n_null_keys") === 0L)
  }

  test("fdAudit: true FD clean, false FD counted, NULL is a behavior") {
    import graft.operators.Expectations
    val df = Seq(
      (1L, 10L, Some("x")), (1L, 11L, Some("x")),  // key 1 → {x}: clean
      (2L, 12L, Some("x")), (2L, 13L, Some("y")),  // key 2 → {x,y}: bad
      (3L, 14L, Some("z")), (3L, 15L, None))       // key 3 → {z,NULL}: bad
      .toDF("k", "u", "v")
    val got = Expectations.fdAudit(df, Seq(
        (Seq("k"), "v"),       // 2 of 3 keys violate
        (Seq("k", "u"), "v"))) // (k,u) unique → always clean
      .collect().map(r => r.getAs[String]("dependency") -> r).toMap
    val kv = got("k->v")
    assert(kv.getAs[Long]("n_keys") === 3L)
    assert(kv.getAs[Long]("n_violating_keys") === 2L)
    assert(kv.getAs[Long]("max_rhs_per_key") === 2L)
    assert(kv.getAs[Long]("violation_ppm") === 666666L)
    val kuv = got("k+u->v")
    assert(kuv.getAs[Long]("n_keys") === 6L)
    assert(kuv.getAs[Long]("n_violating_keys") === 0L)
    assert(kuv.getAs[Long]("violation_ppm") === 0L)
  }
}
