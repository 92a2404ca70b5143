package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("parseJson extracts typed fields, null on malformed rows") {
    val df = Seq("""{"k": 42}""", """{"k": 7, "extra": true}""", "not json", null)
      .toDF("props")
    val got = Semi.parseJson(df, "props", "k INT")
      .select(Semi.jsonField("props", "k")).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(42), Some(7), None, None))
  }

  test("CSV sink/source round-trip with explicit schema (GCS->BQ load analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val path = s"$dir/t"
    val orig = Seq((1L, "a,b", 1.5), (2L, "plain", -0.25)).toDF("id", "name", "v")
    orig.write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(path)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      orig.as[(Long, String, Double)].collect().toSet)
  }

  test("JSON-lines sink/source round-trip (Mongo export analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val path = s"$dir/t"
    val orig = Seq((1L, Seq("pop", "rock"), 9), (2L, Seq("jazz"), 5))
      .toDF("id", "genres", "score")
    orig.write.mode("overwrite").json(path)
    val back = spark.read.json(path).select("id", "genres", "score")
    assert(back.as[(Long, Seq[String], Long)].collect().toSet ==
      Set((1L, Seq("pop", "rock"), 9L), (2L, Seq("jazz"), 5L)))
  }
}
