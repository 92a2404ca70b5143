package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time enrichment of an EVENT STREAM against an SCD-2 interval
  * dimension — the continuous twin of the batch as-of/interval lookup
  * (q37/q77): every event picks up the dimension attributes that were
  * valid AT ITS EVENT TIME, not the dimension's latest state (joining a
  * late-arriving event against current attributes is the classic
  * training-serving skew bug; interval semantics make replays and
  * backfills produce byte-identical enrichment).
  *
  * Shape: a stream-STATIC left join — stateless, so it runs in any
  * output mode with no watermark requirement; the dimension BROADCASTS
  * per micro-batch (SCD dimensions are key-cardinality, not
  * event-cardinality — the q05 dim-join posture). The static side's plan
  * is re-evaluated each micro-batch, so a dimension stored as
  * parquet/warehouse picks up slowly-changing updates between batches
  * without restarting the query (an in-memory dimension stays fixed —
  * documented Spark semantics, same for either engine of this operator).
  *
  * Interval contract = [[graft.operators.Etl.scd2]]'s: [valid_from,
  * valid_to), NULL valid_to = current. SCD-2 intervals are disjoint per
  * key by construction, so the join emits at most one enriched row per
  * event; an event before its key's first interval (or with no key
  * match) keeps NULL attributes rather than dropping — the left join is
  * the honest choice for a pipeline that must not lose events. */
object ScdEnrich {

  def pointInTime(events: DataFrame, dim: DataFrame, keyCol: String,
                  tsUsCol: String, fromCol: String, toCol: String,
                  attrs: Seq[String]): DataFrame = {
    val d = broadcast(dim.select(
      (Seq(col(keyCol).as("graft_k"), col(fromCol).as("graft_s"),
        col(toCol).as("graft_e")) ++ attrs.map(col)).toIndexedSeq: _*))
    events.join(d,
        events(keyCol) === col("graft_k") &&
          events(tsUsCol) >= col("graft_s") &&
          (col("graft_e").isNull || events(tsUsCol) < col("graft_e")),
        "left_outer")
      .drop("graft_k", "graft_s", "graft_e")
  }
}
