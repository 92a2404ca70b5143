package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-eval metrics — the reference-based scores every
  * summarization/translation/ASR eval harness reports, kept EXACT
  * (integer edit counts and n-gram overlaps, floor-ppm rationals; no
  * geometric means, no libm): WER/CER (Levenshtein 1966), ROUGE-N and
  * ROUGE-L (Lin 2004). BLEU's corpus score is deliberately absent — it
  * is exp(Σln pₙ/4)·BP, transcendental by construction; its exact
  * ingredients (per-n precisions = [[rougeN]]'s precision with the
  * hyp/ref roles swapped, and the length ratio) are all here.
  *
  * Scale posture: WER/CER and ROUGE-L are per-row codegen'd DP
  * expressions (zero shuffle — candidate/reference pairs are already
  * co-located rows). ROUGE-N explodes BOTH sides' n-grams and
  * intersects with one (id, gram)-keyed aggregate + full-outer count
  * merge — documents can be arbitrarily long without per-row memory
  * risk, and the shuffle carries grams, not documents. */
object TextEval {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  /** Word-level edit distance (see [[graft.functions.WordLevenshtein]]). */
  def wordLevenshtein(hyp: Column, ref: Column): Column =
    bridge(graft.functions.WordLevenshtein(ex(hyp), ex(ref)))

  /** Token LCS length (see [[graft.functions.TokenLcs]]). */
  def tokenLcs(hyp: Column, ref: Column): Column =
    bridge(graft.functions.TokenLcs(ex(hyp), ex(ref)))

  private def wsTokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** WER + CER per (hypothesis, reference) row: word edits over the
    * word-level DP, char edits over the builtin `levenshtein`; ppm
    * rates floor-divided by the reference size (NULL on an empty
    * reference — a rate against nothing is not 0). */
  def werCer(pairs: DataFrame, idCol: String, hypCol: String,
             refCol: String): DataFrame = {
    pairs.select(col(idCol),
        size(wsTokens(col(refCol))).cast("long").as("n_ref_tokens"),
        size(wsTokens(col(hypCol))).cast("long").as("n_hyp_tokens"),
        wordLevenshtein(col(hypCol), col(refCol)).as("word_edits"),
        levenshtein(col(hypCol), col(refCol)).cast("long")
          .as("char_edits"),
        length(col(refCol)).cast("long").as("graft_rc"))
      .select(col(idCol), col("n_ref_tokens"), col("n_hyp_tokens"),
        col("word_edits"),
        expr("CASE WHEN n_ref_tokens = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE word_edits * 1000000 div n_ref_tokens END")
          .as("wer_ppm"),
        col("char_edits"),
        expr("CASE WHEN graft_rc = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE char_edits * 1000000 div graft_rc END").as("cer_ppm"))
  }

  private def grams(c: Column, n: Int): Column = {
    val arr = wsTokens(c)
    when(size(arr) >= n, transform(sequence(lit(0), size(arr) - n),
      i => array_join(slice(arr, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** ROUGE-N per id: clipped n-gram overlap Σ min(count_hyp, count_ref)
    * with exact floor-ppm recall (over ref grams), precision (over hyp
    * grams), and F1 = 2·ov/(ref+hyp) — the denominators make F1 one
    * floor division, no float mean. Zero-gram sides NULL their rate. */
  def rougeN(pairs: DataFrame, idCol: String, hypCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    def side(c: String, tag: String): DataFrame = pairs
      .select(col(idCol), explode(grams(col(c), n)).as("graft_g"))
      .groupBy(col(idCol), col("graft_g"))
      .agg(count(lit(1)).as(tag))
    val merged = side(hypCol, "graft_ch")
      .join(side(refCol, "graft_cr"), Seq(idCol, "graft_g"), "full_outer")
      .groupBy(idCol)
      .agg(coalesce(sum(least(coalesce(col("graft_ch"), lit(0L)),
          coalesce(col("graft_cr"), lit(0L)))), lit(0L)).as("overlap"),
        coalesce(sum(coalesce(col("graft_ch"), lit(0L))), lit(0L))
          .as("hyp_ngrams"),
        coalesce(sum(coalesce(col("graft_cr"), lit(0L))), lit(0L))
          .as("ref_ngrams"))
    // docs whose BOTH sides had < n tokens vanished in the explode —
    // restore them with zero counts (their rates are NULL, not absent)
    pairs.select(col(idCol)).join(merged, Seq(idCol), "left")
      .select(col(idCol), lit(n.toLong).as("n"),
        coalesce(col("ref_ngrams"), lit(0L)).as("ref_ngrams"),
        coalesce(col("hyp_ngrams"), lit(0L)).as("hyp_ngrams"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .select(col(idCol), col("n"), col("ref_ngrams"), col("hyp_ngrams"),
        col("overlap"),
        expr("CASE WHEN ref_ngrams = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE overlap * 1000000 div ref_ngrams END").as("recall_ppm"),
        expr("CASE WHEN hyp_ngrams = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE overlap * 1000000 div hyp_ngrams END")
          .as("precision_ppm"),
        expr("CASE WHEN ref_ngrams + hyp_ngrams = 0" +
          " THEN CAST(NULL AS BIGINT)" +
          " ELSE 2 * overlap * 1000000 div (ref_ngrams + hyp_ngrams)" +
          " END").as("f1_ppm"))
  }

  /** ROUGE-L per row: token LCS with the same exact rate family
    * (recall over ref tokens, precision over hyp tokens, F1 as one
    * floor division). */
  def rougeL(pairs: DataFrame, idCol: String, hypCol: String,
             refCol: String): DataFrame = {
    pairs.select(col(idCol),
        size(wsTokens(col(refCol))).cast("long").as("ref_tokens"),
        size(wsTokens(col(hypCol))).cast("long").as("hyp_tokens"),
        tokenLcs(col(hypCol), col(refCol)).as("lcs"))
      .select(col(idCol), col("ref_tokens"), col("hyp_tokens"),
        col("lcs"),
        expr("CASE WHEN ref_tokens = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE lcs * 1000000 div ref_tokens END").as("recall_ppm"),
        expr("CASE WHEN hyp_tokens = 0 THEN CAST(NULL AS BIGINT)" +
          " ELSE lcs * 1000000 div hyp_tokens END").as("precision_ppm"),
        expr("CASE WHEN ref_tokens + hyp_tokens = 0" +
          " THEN CAST(NULL AS BIGINT)" +
          " ELSE 2 * lcs * 1000000 div (ref_tokens + hyp_tokens) END")
          .as("f1_ppm"))
  }
}
