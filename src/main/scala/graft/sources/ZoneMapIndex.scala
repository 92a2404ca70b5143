package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max sidecar index (zone maps) over a parquet directory —
  * file skipping for RANGE predicates. This is the third data-skipping
  * leg next to directory partitioning (low-cardinality keys) and the
  * bloom sidecar (equality on high-cardinality keys): zone maps prune
  * orderable columns, and they only bite when the file layout correlates
  * with the indexed column — pair the build with
  * `Etl.writeRangeLayout`/`writeZorderLayout`, which is exactly the
  * min-max-stats contract Delta/Iceberg/ORC encode as file metadata.
  *
  * Build: one distributed aggregate keyed by source file → one row of
  * (min, max) per indexed column per file. The sidecar is O(nFiles) rows
  * stored as parquet next to the data; rebuilding after a layout rewrite
  * is a single cheap pass.
  *
  * Probe: the sidecar — never the data — is filtered for files whose
  * [min, max] interval intersects the queried range; only those files
  * are read, with the exact predicate re-applied on top (interval
  * intersection is a "maybe", never a wrong answer). A file whose stats
  * row carries NULL min/max (all-null column) is skipped: a range
  * predicate cannot match NULL values.
  */
object ZoneMapIndex {

  /** Build the sidecar for `cols` of the parquet directory at
    * `storePath`. */
  def build(spark: SparkSession, storePath: String, sidecarPath: String,
            cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(storePath)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(sidecarPath)
  }

  /** Files whose [min, max] interval for `column` intersects [lo, hi] —
    * a filter over the O(nFiles) sidecar; only matching names reach the
    * driver. */
  def candidateFiles(spark: SparkSession, sidecarPath: String,
                     column: String, lo: Column, hi: Column): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(sidecarPath)
      // NULL stats make the conjunction NULL → filtered out, which is
      // the correct skip (see class doc).
      .filter(col(s"max_$column") >= lo && col(s"min_$column") <= hi)
      .select("file").as[String].collect().toSeq
  }

  /** Range scan through the index: read ONLY the candidate files, then
    * re-apply the exact predicate. Empty candidate set short-circuits to
    * an empty frame with the store's schema. */
  def rangeScan(spark: SparkSession, storePath: String, sidecarPath: String,
                column: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(spark, sidecarPath, column, lo, hi)
    val store = spark.read.parquet(storePath)
    if (files.isEmpty) store.limit(0)
    else spark.read.schema(store.schema).parquet(files: _*)
      .filter(col(column) >= lo && col(column) <= hi)
  }
}
