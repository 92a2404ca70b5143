package graft.ml

import graft.operators.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over transaction logs — the market-basket
  * primitive beyond pairwise co-occurrence (q201's basketPairs stops at
  * pairs; FP-Growth surfaces the full lattice up to `maxLen`). Runs
  * Spark ML's parallel FP-Growth (PFP, Li et al. RecSys'08 — baskets
  * group-partitioned by item so each partition mines a conditional
  * FP-tree locally; no candidate-generation explosion, unlike Apriori).
  *
  * Determinism/exactness contract: supports are EXACT row counts; the
  * output itemset is the comma-joined ascending sort of its members, so
  * the row set is engine-comparable. `minCount` is an exact integer row
  * threshold — Spark's API takes a support FRACTION and applies
  * ceil(fraction·n), whose float rounding can flip a boundary itemset
  * (0.1·3000 = 300.00000000000006 → ceil 301); passing the half-integer
  * fraction (2·minCount−1)/(2n) makes the ceil land on exactly
  * `minCount` regardless of float error. The basket count `n` is the
  * one driver-side scalar (the API demands a fraction up front).
  *
  * Scale: one distinct + basket collect_set (basket-keyed shuffle),
  * then PFP's item-keyed conditional-tree mining; output is
  * lattice-sized (bounded by minCount), never corpus-sized. */
object Fpm {

  def frequentItemsets(transactions: DataFrame, basketCol: String,
                       itemCol: String, minCount: Long,
                       maxLen: Int): DataFrame = {
    require(minCount >= 1 && maxLen >= 1, "minCount and maxLen >= 1")
    val baskets = Materialize.transient(transactions
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("graft_b"),
        col(itemCol).cast("string").as("graft_i"))
      .distinct()
      .groupBy("graft_b").agg(collect_set("graft_i").as("graft_items")))
    val n = baskets.count()
    require(n > 0, "no baskets")
    val model = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("graft_items")
      .setMinSupport((2.0 * minCount - 1.0) / (2.0 * n))
      .fit(baskets)
    model.freqItemsets
      .filter(size(col("items")) <= maxLen)
      .select(concat_ws(",", array_sort(col("items"))).as("itemset"),
        size(col("items")).cast("long").as("n_items"),
        col("freq").cast("long").as("support"))
      .orderBy(col("n_items").asc, col("itemset").asc)
  }
}
