package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The warehouse as a Spark catalog: SQL DDL/DML over manifest tables,
  * and the FunctionCatalog leg that makes bucket-transform layouts
  * storage-partition-join with zero Exchange. */
class WarehouseCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val root = java.nio.file.Files
    .createTempDirectory("graft_catalog").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    new java.io.File(root, "db").mkdirs()
  }

  test("SQL DDL + DML round-trip: create, insert, select, drop") {
    spark.sql("CREATE TABLE graft.db.t1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.db.t1 SELECT id + 10, concat(v, '!') " +
      "FROM graft.db.t1")
    assert(spark.sql("SELECT id, v FROM graft.db.t1 ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (11L, "a!"), (12L, "b!")))
    // the catalog table IS a manifest table: the path API reads it too
    assert(spark.read.format("graft.sources.WarehouseSink")
      .option("path", s"$root/db/t1").load().count() === 4L)
    assert(spark.sql("SHOW TABLES IN graft.db").collect()
      .map(_.getString(1)).contains("t1"))
    spark.sql("DROP TABLE graft.db.t1")
    assert(!spark.catalog.tableExists("graft.db.t1"))
  }

  test("SQL DELETE FROM: row-level predicate delete through the catalog") {
    spark.sql("CREATE TABLE graft.db.del1 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.db.del1 " +
      "SELECT id, concat('v', id) FROM range(0, 20)")
    spark.sql("DELETE FROM graft.db.del1 WHERE id >= 15")
    assert(spark.sql("SELECT count(*) FROM graft.db.del1")
      .as[Long].head() === 15L)
    spark.sql("DELETE FROM graft.db.del1 WHERE id IN (0, 1) OR v = 'v2'")
    assert(spark.sql("SELECT min(id) FROM graft.db.del1")
      .as[Long].head() === 3L)
    // unconditional DELETE = a fresh empty generation; history survives
    spark.sql("DELETE FROM graft.db.del1")
    assert(spark.sql("SELECT count(*) FROM graft.db.del1")
      .as[Long].head() === 0L)
    assert(spark.read.format("graft.sources.WarehouseSink")
      .option("path", s"$root/db/del1").option("versionAsOf", "1").load()
      .count() === 20L)
    spark.sql("DROP TABLE graft.db.del1")
  }

  test("SQL time travel: VERSION AS OF reads a retained generation") {
    spark.sql("CREATE TABLE graft.db.tt (id BIGINT)")
    spark.sql("INSERT INTO graft.db.tt VALUES (1), (2)") // v1
    spark.sql("INSERT INTO graft.db.tt VALUES (3)")      // v2
    assert(spark.sql("SELECT count(*) FROM graft.db.tt").as[Long].head === 3L)
    assert(spark.sql("SELECT count(*) FROM graft.db.tt VERSION AS OF 1")
      .as[Long].head === 2L)
  }

  test("PARTITIONED BY bucket(...) via SQL writes the transform layout") {
    spark.sql("CREATE TABLE graft.db.bk (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("graft_src")
    spark.sql("INSERT INTO graft.db.bk SELECT id, v FROM graft_src")
    val m = WarehouseSink.readManifest(s"$root/db/bk").get
    assert(m.partitionCol === "bucket(4,id)")
    m.files.foreach(f =>
      assert(WarehouseSink.readTpart(s"$root/db/bk", f).isDefined))
    assert(spark.sql("SELECT sum(id) FROM graft.db.bk").as[Long].head
      === (0L until 100L).sum)
  }

  test("bucket-transform storage-partitioned join runs with zero Exchange") {
    spark.sql("CREATE TABLE graft.db.facts (k BIGINT, x BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE graft.db.dims (k BIGINT, label STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 200L).map(i => (i % 40L, i)).toDF("k", "x")
      .createOrReplaceTempView("graft_facts_src")
    (0L until 40L).map(i => (i, s"d$i")).toDF("k", "label")
      .createOrReplaceTempView("graft_dims_src")
    spark.sql("INSERT INTO graft.db.facts SELECT k, x FROM graft_facts_src")
    spark.sql("INSERT INTO graft.db.dims SELECT k, label FROM graft_dims_src")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      // join on k AND aggregate by k: both ride the bucket(4,k) layout,
      // so the whole plan — join and aggregation — needs no Exchange
      val q = spark.sql(
        """SELECT f.k, max(d.label) AS label, sum(f.x) AS sx
           FROM graft.db.facts f JOIN graft.db.dims d ON f.k = d.k
           GROUP BY f.k""")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket SPJ should plan no Exchange:\n$plan")
      val got = q.as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = (0L until 200L).groupBy(_ % 40L)
        .map { case (k, xs) => k -> ((s"d$k", xs.sum)) }
      assert(got === want)
    }
  }

  test("SQL VERSION AS OF resolves named refs (tags and branch heads)") {
    spark.sql("CREATE TABLE graft.db.reft (id BIGINT)")
    spark.sql("INSERT INTO graft.db.reft VALUES (1), (2)")
    WarehouseSink.createTag(s"$root/db/reft", "rel-1")
    spark.sql("INSERT INTO graft.db.reft VALUES (3)")
    assert(spark.sql("SELECT count(*) FROM graft.db.reft").as[Long].head
      === 3L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.reft VERSION AS OF 'rel-1'")
      .as[Long].head === 2L)
    // numeric strings still resolve as plain versions
    assert(spark.sql(
      "SELECT count(*) FROM graft.db.reft VERSION AS OF 1").as[Long].head
      === 2L)
    // unknown ref names fail loudly as a missing table, not silently live
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM graft.db.reft VERSION AS OF 'nope'")
        .collect()
    }
  }

  test("three-way SPJ: co-bucketed join chain plans zero Exchange") {
    // The 100 TB star-schema play one rung further: THREE tables on the
    // same bucket(4,k) layout — the SPJ must chain through both joins
    // and the final aggregate without a single shuffle.
    spark.sql("CREATE TABLE graft.db.t3a (k BIGINT, a BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE graft.db.t3b (k BIGINT, b BIGINT) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE graft.db.t3c (k BIGINT, c STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 120L).map(i => (i % 30L, i)).toDF("k", "a")
      .createOrReplaceTempView("graft_t3a_src")
    (0L until 30L).map(i => (i, i * 10L)).toDF("k", "b")
      .createOrReplaceTempView("graft_t3b_src")
    (0L until 30L).map(i => (i, s"c$i")).toDF("k", "c")
      .createOrReplaceTempView("graft_t3c_src")
    spark.sql("INSERT INTO graft.db.t3a SELECT k, a FROM graft_t3a_src")
    spark.sql("INSERT INTO graft.db.t3b SELECT k, b FROM graft_t3b_src")
    spark.sql("INSERT INTO graft.db.t3c SELECT k, c FROM graft_t3c_src")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val q = spark.sql(
        """SELECT x.k, sum(x.a) AS sa, max(y.b) AS mb, max(z.c) AS mc
           FROM graft.db.t3a x
           JOIN graft.db.t3b y ON x.k = y.k
           JOIN graft.db.t3c z ON x.k = z.k
           GROUP BY x.k""")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"three-way SPJ should plan no Exchange:\n$plan")
      val got = q.as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = (0L until 120L).groupBy(_ % 30L)
        .map { case (k, xs) => k -> ((xs.sum, k * 10L, s"c$k")) }
      assert(got === want)
    }
  }

  test("SQL UPDATE rewrites matching groups copy-on-write") {
    spark.sql("CREATE TABLE graft.db.up1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.up1 SELECT id, id * 10 FROM range(0, 40)")
    spark.sql("UPDATE graft.db.up1 SET v = v + 7 WHERE id % 4 = 1")
    assert(spark.sql("SELECT sum(v), count(*) FROM graft.db.up1")
      .as[(Long, Long)].head() ===
      ((0L until 40L).map(i => i * 10 + (if (i % 4 == 1) 7 else 0)).sum,
        40L))
    // the pre-update generation stays time-travelable
    val m = WarehouseSink.readManifest(s"$root/db/up1").get
    assert(m.op === "sql_update")
    assert(spark.read.format("graft.sources.WarehouseSink")
      .option("path", s"$root/db/up1")
      .option("versionAsOf", (m.version - 1).toString).load()
      .agg(sum("v")).as[Long].head() === (0L until 40L).map(_ * 10).sum)
    spark.sql("DROP TABLE graft.db.up1")
  }

  test("SQL MERGE INTO: matched update + not-matched insert, one generation") {
    spark.sql("CREATE TABLE graft.db.mg1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.mg1 SELECT id, id FROM range(0, 10)")
    spark.sql("""MERGE INTO graft.db.mg1 t
                 USING (SELECT id, id * 100 AS nv FROM range(8, 12)) s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.nv
                 WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
    assert(spark.sql("SELECT id, v FROM graft.db.mg1 ORDER BY id")
      .as[(Long, Long)].collect().toSeq ===
      ((0L until 8L).map(i => (i, i)) ++
        (8L until 12L).map(i => (i, i * 100))))
    assert(WarehouseSink.readManifest(s"$root/db/mg1").get.op === "sql_merge")
    spark.sql("DROP TABLE graft.db.mg1")
  }

  test("row-level commit swaps ONLY the files the scan actually read") {
    // Two stats-disjoint files; the UPDATE condition is a subquery, so
    // plan-time candidates = every file and ONLY the runtime group
    // filter narrows the scan. The unread file's rows must survive —
    // the commit must take its file list from the post-runtime scan.
    spark.sql("CREATE TABLE graft.db.rt1 (id BIGINT, v BIGINT)")
    (0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .writeTo("graft.db.rt1").append()
    (10L until 20L).map(i => (i, i)).toDF("id", "v").coalesce(1)
      .writeTo("graft.db.rt1").append()
    assert(WarehouseSink.readManifest(s"$root/db/rt1").get.files.size === 2)
    spark.sql("UPDATE graft.db.rt1 SET v = v + 1000 " +
      "WHERE id IN (SELECT id FROM graft.db.rt1 WHERE id < 3)")
    assert(spark.sql("SELECT sum(v), count(*) FROM graft.db.rt1")
      .as[(Long, Long)].head() ===
      ((0L until 20L).sum + 3 * 1000L, 20L))
    spark.sql("DROP TABLE graft.db.rt1")
  }

  test("metadata columns: __graft_file / __graft_pos address file provenance") {
    spark.sql("CREATE TABLE graft.db.meta1 (id BIGINT)")
    (0L until 6L).toDF("id").coalesce(1).writeTo("graft.db.meta1").append()
    (6L until 9L).toDF("id").coalesce(1).writeTo("graft.db.meta1").append()
    val got = spark.sql("SELECT count(DISTINCT __graft_file), max(__graft_pos) " +
      "FROM graft.db.meta1").as[(Long, Long)].head()
    assert(got === ((2L, 5L))) // positions restart per file
    // metadata columns never leak into SELECT *
    assert(spark.sql("SELECT * FROM graft.db.meta1").columns.toSeq === Seq("id"))
    spark.sql("DROP TABLE graft.db.meta1")
  }

  test("CTAS and INSERT OVERWRITE run through the catalog") {
    spark.sql("CREATE TABLE graft.db.ctas1 AS " +
      "SELECT id, id * 2 AS v FROM range(0, 10)")
    assert(spark.sql("SELECT sum(v) FROM graft.db.ctas1")
      .as[Long].head() === 90L)
    // INSERT OVERWRITE starts a new generation; history stays readable
    spark.sql("INSERT OVERWRITE graft.db.ctas1 " +
      "SELECT id, id AS v FROM range(0, 5)")
    assert(spark.sql("SELECT sum(v), count(*) FROM graft.db.ctas1")
      .as[(Long, Long)].head() === ((10L, 5L)))
    val m = WarehouseSink.readManifest(s"$root/db/ctas1").get
    assert(spark.read.format("graft.sources.WarehouseSink")
      .option("path", s"$root/db/ctas1")
      .option("versionAsOf", (m.version - 1).toString).load()
      .count() === 10L)
    spark.sql("DROP TABLE graft.db.ctas1")
  }

  test("SQL ALTER TABLE: rename, add-with-null-default, drop — old files keep decoding") {
    spark.sql("CREATE TABLE graft.db.alt1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.alt1 SELECT id, id * 3 FROM range(0, 8)")
    // rename: pre-rename files decode under the new name via field ids
    spark.sql("ALTER TABLE graft.db.alt1 RENAME COLUMN v TO val")
    assert(spark.sql("SELECT sum(val) FROM graft.db.alt1")
      .as[Long].head() === (0L until 8L).map(_ * 3).sum)
    // add: old rows read NULL, new writes store real values
    spark.sql("ALTER TABLE graft.db.alt1 ADD COLUMN tag STRING")
    spark.sql("INSERT INTO graft.db.alt1 VALUES (100, 1, 'new')")
    assert(spark.sql("SELECT count(*) FROM graft.db.alt1 " +
      "WHERE tag IS NULL").as[Long].head() === 8L)
    assert(spark.sql("SELECT tag FROM graft.db.alt1 WHERE id = 100")
      .as[String].head() === "new")
    // drop: the column disappears; the rest keeps reading
    spark.sql("ALTER TABLE graft.db.alt1 DROP COLUMN tag")
    assert(spark.sql("SELECT * FROM graft.db.alt1").columns.toSeq ===
      Seq("id", "val"))
    assert(spark.sql("SELECT count(*) FROM graft.db.alt1")
      .as[Long].head() === 9L)
    // non-column changes refuse loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.alt1 SET TBLPROPERTIES ('a'='b')")
    }
    spark.sql("DROP TABLE graft.db.alt1")
  }

  test("SQL UPDATE refuses a CDF table loudly") {
    spark.sql("CREATE TABLE graft.db.cdf1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft.db.cdf1 VALUES (1, 1)")
    WarehouseSink.enableChangeFeed(s"$root/db/cdf1")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.db.cdf1 SET v = 2 WHERE id = 1")
    }
    assert(e.getMessage.contains("change feed") ||
      Option(e.getCause).exists(_.getMessage.contains("change feed")))
    spark.sql("DROP TABLE graft.db.cdf1")
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
