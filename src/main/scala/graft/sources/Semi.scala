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
}
