package graft

/** Plan-SHAPE regression guards for the scale story: each assertion pins a
  * property the 100 TB design depends on — a filter reaching the parquet
  * scan, a narrow zero-Exchange pipeline staying narrow, a dimension
  * staying broadcast — so a refactor that silently de-optimizes a plan
  * fails here, not in a cluster bill. Assertions target pre-execution
  * plans (AQE's initial plan), which are deterministic; properties AQE
  * may legitimately rewrite at runtime (e.g. shuffle→broadcast) are
  * asserted only in the direction that holds either way.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  /** Memoized query substrates (pair stats, fits) must release even when
    * an assertion throws — a leaked cache would distort later suites on
    * the shared session. */
  private def withCleanCaches(body: => Unit): Unit =
    try body finally SparkEntry.releaseCaches()

  test("narrow corpus ops plan ZERO exchanges (embarrassingly parallel)") {
    withCleanCaches {
      for (q <- Seq("q65_chunk_tokens", "q72_corpus_mix", "q78_corpus_upsample")) {
        val p = planOf(q)
        assert(exchanges(p) === 0, s"$q grew a shuffle:\n$p")
      }
    }
  }

  test("q04's filter and projection reach the parquet scan") {
    withCleanCaches {
      val p = planOf("q04_filter_project")
      assert(p.contains("PushedFilters: ["), s"no pushdown:\n$p")
      // the scan must not read every column: the query projects a subset
      assert(p.contains("ReadSchema"), p)
    }
  }

  test("q66/q67 build sides broadcast; the corpus side never shuffles for them") {
    withCleanCaches {
      for (q <- Seq("q66_quality_gate", "q67_decontaminate")) {
        val p = planOf(q)
        assert(p.contains("BroadcastExchange"), s"$q lost its broadcast:\n$p")
      }
    }
  }

  test("q50 star join broadcasts both dims and aggregates through one exchange") {
    withCleanCaches {
      val p = planOf("q50_star_join")
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
      assert(exchanges(p) === 1, s"expected only the group-by exchange:\n$p")
    }
  }

  test("q87 transitions: the user-key window exchange is the only row shuffle") {
    withCleanCaches {
      val p = planOf("q87_transitions")
      // window exchange on user + the final small aggregate exchange on the
      // (from, to) pair; no join, no extra repartition
      assert(exchanges(p) <= 2, s"q87 grew shuffles:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q96 retraction: min/max rescan reads the base through a SEMI join on affected keys") {
    withCleanCaches {
      val p = planOf("q96_retract_rollup")
      // The rescan must be keyed (LeftSemi), never a full-base rescan fed
      // into a plain join — the affected-groups bound is the whole point.
      assert(p.contains("LeftSemi"), s"q96 lost its semi-join rescan:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q98 batched IVF probe: probe table broadcasts onto ONE corpus pass") {
    withCleanCaches {
      val p = planOf("q98_ann_ivf_batch")
      assert(p.contains("BroadcastHashJoin"), s"probe table must broadcast:\n$p")
      // One window exchange on the query key is the only row shuffle.
      assert(exchanges(p) <= 1, s"q98 grew shuffles:\n$p")
    }
  }

  test("q102 dim stats: the single exchange carries |dims| groups, no join") {
    withCleanCaches {
      val p = planOf("q102_dim_stats")
      // posexplode → partial agg → ONE exchange keyed by dim → final agg
      assert(exchanges(p) === 1, s"q102 grew shuffles:\n$p")
      assert(!p.contains("Join"), s"q102 must not join:\n$p")
      assert(p.contains("Generate"), p) // the columnar explode is the point
    }
  }

  test("q103 vocab overlap: join keyed on term, per-source sizes broadcast") {
    withCleanCaches {
      val p = planOf("q103_source_overlap")
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
        s"size lookups must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q104 token budget: one window exchange per source partitioning") {
    withCleanCaches {
      val p = planOf("q104_token_budget")
      assert(exchanges(p) === 1, s"q104 grew shuffles:\n$p")
      assert(!p.contains("Join"), p)
    }
  }

  test("q106/q107/q108 audits: aggregate-shaped, never joined") {
    withCleanCaches {
      // q106: one (key-group + final) aggregate pair per audited column
      val p6 = planOf("q106_key_skew")
      assert(exchanges(p6) <= 3 && !p6.contains("Join"), s"q106 shape:\n$p6")
      // q107: narrow per-row norm → ONE bucket-keyed exchange
      val p7 = planOf("q107_norm_histogram")
      assert(exchanges(p7) === 1 && !p7.contains("Join"), s"q107 shape:\n$p7")
      // q108: (source,split) aggregate + per-source window, nothing wider
      val p8 = planOf("q108_split_balance")
      assert(exchanges(p8) <= 2 && !p8.contains("Join"), s"q108 shape:\n$p8")
    }
  }

  test("q84 correlation matrix is one aggregate pass, no joins") {
    withCleanCaches {
      val p = planOf("q84_feature_corr")
      assert(!p.contains("Join"), s"corrMatrix must not join:\n$p")
    }
  }

  test("q86 MAD outliers broadcast group stats; rows never hash-shuffle") {
    withCleanCaches {
      val p = planOf("q86_mad_outliers")
      assert(p.contains("BroadcastExchange"), p)
      // Hash exchanges exist only to feed the tiny percentile aggregates
      // (group-key cardinality): the median subtree appears twice in the
      // pre-AQE tree (it feeds the MAD build AND the final scan; runtime
      // dedupes it via ReusedExchange), so ≤ 4 — what matters is that every
      // one of them sits under an Aggregate, and the output row path joins
      // by BROADCAST, which the surrounding asserts pin.
      assert(exchanges(p) <= 4, s"q86 shuffles rows:\n$p")
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    }
  }

  test("q111 prefix dups: one hash aggregate, no join anywhere") {
    withCleanCaches {
      val p = planOf("q111_prefix_dups")
      assert(!p.contains("Join"), s"q111 grew a join:\n$p")
      assert(exchanges(p) === 1, s"one prefix-hash exchange expected:\n$p")
    }
  }

  test("q112 concentration: rows shuffle only into the per-user aggregate") {
    withCleanCaches {
      val p = planOf("q112_user_concentration")
      // user agg + count-of-counts agg, each appearing twice pre-AQE
      // because the cumulative subtree feeds BOTH the level filter and
      // the totals aggregate (runtime dedupes via ReusedExchange, the
      // q86 pattern) — so ≤ 4 hash exchanges, none of them row-sized
      // beyond the per-user aggregate.
      assert(exchanges(p) <= 4, s"q112 shuffles beyond the two aggs:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"q112 totals/levels should broadcast:\n$p")
    }
  }

  test("q116 session paths: ONE user-keyed exchange feeds window and position") {
    withCleanCaches {
      val p = planOf("q116_session_paths")
      // user window + per-session aggregate + path count; the top-N must
      // be distributed (TakeOrdered), never a global Sort+Limit.
      assert(exchanges(p) <= 3, s"q116 re-shuffles the window input:\n$p")
      assert(p.contains("TakeOrderedAndProject"), s"q116 global-sorts:\n$p")
    }
  }

  test("q117 anomalies: events reduce to (type, day) BEFORE the window") {
    withCleanCaches {
      val p = planOf("q117_daily_anomaly")
      // partial_count proves the two-phase aggregate runs map-side before
      // the (type, day) table ever shuffles; the window rides the same
      // type-keyed exchange or one more tiny one.
      assert(p.contains("partial_count") || p.contains("HashAggregate"),
        s"q117 lost the pre-aggregate:\n$p")
      assert(exchanges(p) <= 2, s"q117 shuffles events twice:\n$p")
      assert(!p.contains("Join"), s"q117 grew a join:\n$p")
    }
  }

  test("q121 reconcile: one key-shuffled full-outer join, status agg reduces map-side") {
    withCleanCaches {
      val p = planOf("q121_reconcile")
      assert(p.contains("FullOuter"), s"q121 lost the full-outer join:\n$p")
      assert(!p.contains("CartesianProduct"), p)
      // two join inputs + the ≤4-group status aggregate; nothing else may
      // shuffle (the perturbed side derives from the same scan family).
      assert(exchanges(p) <= 4, s"q121 shuffles more than join+agg:\n$p")
      assert(p.contains("partial_count") || p.contains("HashAggregate"),
        s"q121 lost the map-side status reduce:\n$p")
    }
  }

  test("q122 drift: ONE scan of the fact table, no join, bin-bounded windows") {
    withCleanCaches {
      val p = planOf("q122_feature_drift")
      assert(!p.contains("Join"), s"q122 grew a join:\n$p")
      // one scan: both slices are tag columns off the same read, never a
      // union of two passes over the table
      assert("Scan parquet".r.findAllIn(p).length === 1,
        s"q122 scans the table more than once:\n$p")
      // bin hash-agg exchange + the single-partition window over ≤bins
      // rows; anything more means the windows leaked onto the fact rows
      assert(exchanges(p) <= 1, s"q122 shuffles fact rows twice:\n$p")
    }
  }

  test("q141 semantic dedup: cell-keyed self-join only, no cartesian") {
    withCleanCaches {
      val p = planOf("q141_semantic_dedup")
      assert(!p.contains("CartesianProduct"),
        s"q141 degenerated to all-pairs:\n$p")
      // pair join keyed on the cell bucket: join-side exchanges + the
      // distinct + final group-by; beyond that the fan-out leaked
      assert(exchanges(p) <= 6, s"q141 shuffles more than join+agg:\n$p")
    }
  }

  test("q142 passage dedup: no pair join — window df is an aggregate, not pairs") {
    withCleanCaches {
      val p = planOf("q142_passage_dedup")
      assert(!p.contains("CartesianProduct"), p)
      // window hash agg, the df>1 back-join, and the per-doc rollup; a
      // pair-style self-join would add exchanges beyond these
      assert(exchanges(p) <= 5, s"q142 grew beyond wordcount shape:\n$p")
    }
  }

  test("q143 k-anonymity: one map-combinable aggregate, filter on the agg side") {
    withCleanCaches {
      val p = planOf("q143_k_anonymity")
      assert(!p.contains("Join"), s"q143 grew a join:\n$p")
      assert(exchanges(p) === 1, s"q143 must be one group-by exchange:\n$p")
      assert(p.contains("partial_count"),
        s"q143 lost the map-side combine:\n$p")
    }
  }

  test("q147 incremental minhash: bucketed stores add no store-side shuffle") {
    withCleanCaches {
      // Force the 100 TB join regime (a corpus-scale signature store
      // never broadcasts), then bound the shuffle count: probe-side
      // exchanges only — if either store lost its bucketed layout the
      // join would add its Exchange and break the bound.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = planOf("q147_incremental_minhash")
        assert(!p.contains("CartesianProduct"), p)
        assert(exchanges(p) <= 6,
          s"q147 grew a store-side shuffle:\n$p")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // and the layout itself is a catalog fact, not an inference:
      val cat = spark.sessionState.catalog
      val specs = Seq("bands", "sigs").map { kind =>
        cat.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
          cat.listTables("default").map(_.table)
            .find(t => t.startsWith(s"graft_q147_$kind")).get)).bucketSpec
      }
      assert(specs.forall(_.isDefined), s"q147 store lost bucketSpec: $specs")
      assert(specs.head.get.bucketColumnNames === Seq("band", "bk"))
      assert(specs(1).get.bucketColumnNames === Seq("id"))
    }
  }

  test("q144 fluency: model joins back as BROADCAST onto per-doc counts") {
    withCleanCaches {
      val p = planOf("q144_fluency")
      assert(p.contains("BroadcastExchange"),
        s"q144's charset^2 model must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("TakeOrderedAndProject"),
        s"q144 bottom-k must not global-sort:\n$p")
    }
  }

  test("q175 consistent sample: per-partition k-heaps, never a global sort") {
    withCleanCaches {
      val p = planOf("q175_consistent_sample")
      assert(p.contains("TakeOrderedAndProject"),
        s"bottom-k must plan TakeOrderedAndProject:\n$p")
      assert(!p.contains("Exchange rangepartitioning"),
        s"a range-partitioned global sort defeats the point:\n$p")
    }
  }

  test("q177 phrase search: slot table broadcasts; one anchor aggregate") {
    withCleanCaches {
      val p = planOf("q177_phrase_search")
      assert(p.contains("BroadcastExchange"),
        s"the |phrase|-row slot table must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"joining the slot list must never sort-merge:\n$p")
    }
  }

  test("q167 AUC: the rank window runs AFTER the per-score collapse") {
    withCleanCaches {
      val p = planOf("q167_roc_auc")
      // the corpus-side aggregate must come before the single-partition
      // window — i.e. the plan holds a hash aggregate below the Window
      assert(p.contains("Window"), p)
      assert(p.contains("HashAggregate"), p)
      assert(p.indexOf("Window") < p.indexOf("Scan parquet"),
        "plan prints top-down: Window must sit above the scan")
      // the single-partition exchange carries the bounded per-score
      // table, so exactly one SinglePartition exchange is expected
      assert("Exchange SinglePartition".r.findAllIn(p).length === 1, p)
    }
  }

  test("q283/q284 one-row reports stay a single map-combinable fold") {
    withCleanCaches {
      // SRM: one distinct-user exchange, then the 1-row fold — no join,
      // no window, nothing corpus-sized past the reduction.
      val srm = planOf("q283_srm")
      assert(!srm.contains("SortMergeJoin") && !srm.contains("Window"), srm)
      // MCC: a bare conditional aggregate — ZERO keyed exchanges (only
      // the 1-row final fold moves data).
      val mcc = planOf("q284_mcc")
      assert(exchanges(mcc) === 0,
        s"q284 must not shuffle on any key:\n$mcc")
      assert(!mcc.contains("Join"), mcc)
    }
  }

  test("q285 PRF: every term join broadcasts; the corpus never sort-merges") {
    withCleanCaches {
      val p = planOf("q285_prf_expand")
      assert(!p.contains("SortMergeJoin"),
        s"a term-set join fell off broadcast:\n$p")
      assert(p.contains("BroadcastExchange"), p)
    }
  }

  test("q286 link prediction: wedge join is keyed, edges never broadcast-explode") {
    withCleanCaches {
      val p = planOf("q286_link_prediction")
      // the z-keyed self-join and pair aggregate are hash exchanges;
      // no cartesian anywhere
      assert(!p.contains("CartesianProduct"), p)
      assert(exchanges(p) >= 1, p)
    }
  }

  test("shingle df is a partial-combining aggregate, never a g-keyed window") {
    // q317's prefix pick and q64's maxDf cap both need per-shingle
    // document frequencies. A count().over(Window.partitionBy(g)) would
    // pile EVERY occurrence of a hot boilerplate shingle onto one
    // reducer (windows have no map-side combine and AQE cannot split
    // them); the two-phase groupBy+join absorbs hot keys in partial
    // aggregation. Inspect the UN-materialized plan variants (the
    // production entry points checkpoint, which collapses lineage).
    import org.apache.spark.sql.DataFrame
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text")
    val id: DataFrame => DataFrame = d => d
    val plans = Seq(
      "prefixJaccardPlan" -> graft.operators.Dedup
        .prefixJaccardPlan(docs, "doc_id", "text", 3, 0.5, id),
      "pairShingleStatsPlan(maxDf)" -> graft.operators.Dedup
        .pairShingleStatsPlan(docs, "doc_id", "text", 3, Some(50L), id))
    for ((name, df) <- plans) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("count(1) windowspecdefinition"),
        s"$name computes df with a corpus-sized count window:\n$p")
      assert(p.contains("partial_count"),
        s"$name lost the partial (map-side) df combine:\n$p")
    }
    // the only Window in the prefix plan is the per-doc rank (row_number
    // partitioned by id) — a bounded, per-document key
    val pp = plans.head._2.queryExecution.executedPlan.toString
    assert(pp.contains("row_number()"), pp)
  }

  test("q308 shard rebalance: ring is a literal; zero doc-keyed Exchange") {
    withCleanCaches {
      val p = planOf("q308_shard_rebalance")
      // Both ring assignments resolve in one map pass over literals —
      // the only hash Exchange is the |shards|-row rollup; no join, no
      // doc-id partitioning anywhere.
      assert(exchanges(p) === 1, s"q308 shuffled the corpus:\n$p")
      assert(!p.contains("Join"), s"q308 must not join the ring:\n$p")
      assert(!p.toLowerCase.contains("cartesian"), p)
    }
  }

  test("q426 bandit replay: one scan, one Exchange (policy explode," +
    " not a filter+agg leg per policy)") {
    withCleanCaches {
      val p = planOf("q426_bandit_replay")
      assert(exchanges(p) === 1, s"q426 grew per-policy legs:\n$p")
      assert(!p.contains("Union"), s"q426 must not union agg legs:\n$p")
      // ONE events scan feeds all policies
      assert("Scan parquet".r.findAllIn(p).length === 1, p)
    }
  }

  test("q434 robots wildcards: rules broadcast, wildcard match is a" +
    " hash-join residual, longest-match pick window-group-limited") {
    withCleanCaches {
      val p = planOf("q434_robots_wildcards")
      assert(p.contains("BroadcastHashJoin"), p)
      assert(p.contains("graft_rep_match"),
        s"wildcard predicate fell out of the join residual:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"rank-1 pick lost its pushed group limit:\n$p")
      assert(exchanges(p) === 1, s"q434 over-shuffled:\n$p")
    }
  }

  test("q443 ROUGE-N: gram-keyed aggregates only — documents never" +
    " carry through the shuffle") {
    withCleanCaches {
      val p = planOf("q443_rouge_n")
      assert(p.contains("partial_count"),
        s"gram counts lost the map-side combine:\n$p")
      assert(!p.toLowerCase.contains("cartesian"), p)
      // the only sort-ish operator allowed is join/agg machinery — no
      // global Sort for ranking anywhere in this metric
      assert(!p.contains("TakeOrderedAndProject"), p)
    }
  }

  test("q455 binary ANN: both stages TakeOrdered, query broadcast," +
    " never a global sort") {
    withCleanCaches {
      val p = planOf("q455_binary_ann")
      assert("TakeOrderedAndProject".r.findAllIn(p).length === 2,
        s"a stage lost its TakeOrdered:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastExchange"), s"query vector not broadcast:\n$p")
      assert(exchanges(p) === 0, s"binary ANN grew a hash shuffle:\n$p")
    }
  }

  test("q433 canonical dedup: explode feeds canonical-keyed Exchanges" +
    " only (two-phase count-distinct, nothing doc-keyed)") {
    withCleanCaches {
      val p = planOf("q433_canonical_dedup")
      // count(DISTINCT raw_url) legitimately runs the two-phase
      // distinct aggregate: (canonical, url)-keyed then canonical-keyed
      assert(exchanges(p) === 2, s"q433 shuffle count changed:\n$p")
      assert(p.contains("canonical_url"), p)
      assert(!p.toLowerCase.contains("cartesian"), p)
    }
  }
}
