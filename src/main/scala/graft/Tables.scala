package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the graft test schema.
  *
  * Loads are plain `spark.read.parquet` so Catalyst owns column pruning and
  * predicate pushdown: every operator downstream selects only the columns it
  * needs *before* wide transforms, which at 100 TB turns these into narrow
  * columnar scans with PushedFilters instead of full-table reads.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp. We read it as exact int64 nanoseconds (lossless — and
    * ns-exact ordering/windowing matches the oracle engine bit-for-bit) and
    * derive `ts_t`, a µs-truncated TimestampType column, for calendar ops
    * like `date_trunc('week', …)` where sub-µs precision is irrelevant.
    * Integer `div` keeps the µs math exact (doubles can't hold epoch-nanos). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn(
      "ts_t", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
