package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Continuous per-source TOKEN-BUDGET admission — the streaming twin of
  * the batch token-budget cap (q104, and q324's real-BPE recount): each
  * source admits documents until its CUMULATIVE token count would cross
  * the budget, then every later document routes to overflow. The gate a
  * continuously-ingesting corpus build runs so no source drowns the mix
  * — and unlike [[RateCap]]'s per-window row counts, the budget here is
  * token-WEIGHTED and LIFETIME-cumulative (the training-mix contract),
  * so state never needs eviction: ONE long per source, forever.
  *
  * Token counting can ride the codegen'd BPE encoder
  * ([[graft.operators.Vocab.bpeTokenCount]]) in the caller's projection
  * — the gate takes the count as a column and stays tokenizer-agnostic.
  *
  * Determinism contract (the [[RateCap]] one): WITHIN a micro-batch,
  * documents admit in (docId) order per source, so a replayed batch
  * admits the same rows; ACROSS batches admission is arrival-order
  * dependent — inherent to online admission and documented (q104 is the
  * engine-portable total-order batch form of the same policy). Skip
  * semantics match the batch twin: a document that would overflow is
  * rejected, and LATER smaller documents may still admit (cum ≤ budget
  * is per-candidate, not a hard stop).
  *
  * TimeMode.None: no event-time, no timers, no watermark — admission is
  * a pure running sum per key. */
object BudgetCap {

  final case class DocIn(source: String, docId: Long, nTokens: Long)
  /** Verdict row: cumTokens is the source's spent budget AFTER this
    * document (unchanged when rejected). */
  final case class Budgeted(source: String, docId: Long, nTokens: Long,
                            cumTokens: Long, admitted: Boolean)

  private class BudgetProcessor(budget: Long)
      extends StatefulProcessor[String, DocIn, Budgeted] {
    @transient private var spent: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      spent = getHandle.getValueState[Long]("spent",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[DocIn],
                                 timerValues: TimerValues): Iterator[Budgeted] = {
      var cum = if (spent.exists()) spent.get() else 0L
      val out = rows.toSeq.sortBy(_.docId).map { r =>
        val admit = cum + r.nTokens <= budget
        if (admit) cum += r.nTokens
        Budgeted(source, r.docId, r.nTokens, cum, admit)
      }
      spent.update(cum)
      out.iterator
    }

    override def handleExpiredTimer(source: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Budgeted] =
      Iterator.empty
  }

  /** `docs` must carry (`srcCol`, `idCol`, `tokenCol`); emits every
    * document labeled with its admission verdict and the source's
    * cumulative spend. */
  def admit(docs: DataFrame, srcCol: String, idCol: String,
            tokenCol: String, budget: Long): Dataset[Budgeted] = {
    require(budget > 0, "budget must be positive")
    import docs.sparkSession.implicits._
    implicit val enc = Encoders.product[Budgeted]
    docs.select(col(srcCol).cast("string").as("source"),
      col(idCol).cast("long").as("docId"),
      col(tokenCol).cast("long").as("nTokens"))
      .as[DocIn]
      .groupByKey(_.source)
      .transformWithState(new BudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
