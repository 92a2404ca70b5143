package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured ingestion: the Spark-native counterpart of the
  * reference's document/REST sources (MongoDB collections and Spotify API
  * JSON, dag.py:369-406). Documents land as JSON strings in a column and
  * are parsed with an explicit schema via `from_json` — typed, codegen'd,
  * and null-safe on malformed rows (PERMISSIVE semantics), instead of
  * driver-side dict munging. */
object Semi {

  /** Parse a JSON-string column with a DDL schema, e.g. "k INT, tag STRING". */
  def parseJson(df: DataFrame, jsonCol: String, ddl: String): DataFrame =
    df.withColumn(s"${jsonCol}_parsed", from_json(col(jsonCol), ddl, Map.empty[String, String]))

  /** Typed field accessor for a parsed JSON column. */
  def jsonField(jsonCol: String, field: String): Column =
    col(s"${jsonCol}_parsed").getField(field)

  /** JSONL corpus ingestion with corrupt-line quarantine — the standard
    * LLM training-corpus format (one JSON doc per line, web-scale dumps
    * always contain malformed lines) read the production way: explicit
    * schema + PERMISSIVE mode, with every unparseable line routed to a
    * `_corrupt_record` column instead of killing the job or being
    * silently dropped. Returns the parsed frame with a `graft_status`
    * column ('ok' / 'corrupt'); callers split on it — clean rows to the
    * pipeline, corrupt lines to the dead-letter store with their raw text
    * intact for forensics.
    *
    * Scale posture: the JSON parse is Jackson-per-partition inside the
    * scan (no shuffle); quarantine is a map-side column. Spark refuses
    * queries that reference ONLY the corrupt column from a raw file scan
    * (internal pushdown restriction), so status is derived alongside the
    * payload columns — which is also what keeps this shape plannable. */
  def readJsonlQuarantine(spark: org.apache.spark.sql.SparkSession,
                          path: String, ddl: String): DataFrame =
    spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .withColumn("graft_status",
        when(col("_corrupt_record").isNotNull, lit("corrupt"))
          .otherwise(lit("ok")))
}
