package graft.operators

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // md5 first hex digit of the decimal user id string decides the arm:
  // < '8' → A. Verified per-id below rather than assumed.
  private def armOf(u: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    if ((((d(0) >> 4) & 0xf)) < 8) "A" else "B"
  }

  test("abLift counts exposure, thresholded conversion, and exact ppm") {
    // Users 1..8: all view-exposed; conversions planted per arm.
    val users = (1L to 8L)
    val (as, bs) = users.partition(armOf(_) == "A")
    assert(as.nonEmpty && bs.nonEmpty) // fixture sanity
    // Every A user converts (value 60 > 50); B users don't (value 10,
    // or a conversion-type event filtered by the threshold).
    val events =
      users.map(u => (u, "view", 0.0)) ++
        as.map(u => (u, "purchase", 60.0)) ++
        bs.map(u => (u, "purchase", 10.0)) ++
        Seq((999L, "purchase", 500.0)) // converted but never exposed
    val got = Experiment.abLift(events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._1 === as.size.toLong && got._2 === as.size.toLong)
    assert(got._3 === 1000000L)              // A converts fully
    assert(got._4 === bs.size.toLong && got._5 === 0L)
    assert(got._6 === 0L)                    // B: thresholded out
    assert(got._7 === 0L)                    // lift 0/1M
  }

  test("abLift deduplicates repeat events per user") {
    val u = (1L to 20L).find(armOf(_) == "A").get
    val v = (1L to 20L).find(armOf(_) == "B").get
    val events = Seq(
      (u, "view", 0.0), (u, "view", 0.0), (u, "purchase", 99.0),
      (u, "purchase", 99.0), (v, "view", 0.0))
    val got = Experiment.abLift(events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._1 === 1L && got._2 === 1L && got._3 === 1000000L)
    assert(got._4 === 1L && got._5 === 0L)
  }

  test("abLift degenerate arm: zero A conversions yields NULL lift, counts intact") {
    val u = (1L to 20L).find(armOf(_) == "A").get
    val v = (1L to 20L).find(armOf(_) == "B").get
    // A exposed but never converts; B converts — rate_ppm_a = 0, so
    // lift_ppm must be NULL (documented contract), never an exception or
    // a fabricated number.
    val events = Seq((u, "view", 0.0), (v, "view", 0.0), (v, "purchase", 99.0))
    val row = Experiment.abLift(events.toDF("user_id", "event_type", "value"),
      "user_id", "event_type", "value", "view", "purchase", 50.0).head()
    assert(row.getLong(row.fieldIndex("n_users_a")) === 1L)
    assert(row.getLong(row.fieldIndex("n_conv_a")) === 0L)
    assert(row.getLong(row.fieldIndex("rate_ppm_a")) === 0L)
    assert(row.getLong(row.fieldIndex("rate_ppm_b")) === 1000000L)
    assert(row.isNullAt(row.fieldIndex("lift_ppm")))
  }
}
