package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mechanical split of the `SparkEntry.oracleSql` registry (chunk 2 of
  * 6) — SQL verbatim from the original single map;
  * `SparkEntry` concatenates the chunks, so the contract is unchanged. */
private[graft] trait OracleRegistry2 { this: SparkEntry.type =>

  private[graft] def oracleChunk2: Map[String, String] = Map(

    // Exact-sum Pearson: quantize to ints, exact decimal sums, assemble
    // in double — the same formula the Spark side evaluates, term by term.
    "q84_feature_corr" ->
      """WITH z AS (SELECT CAST(floor(l_quantity*100 + 0.5) AS DECIMAL(38,0)) AS x0,
                         CAST(floor(l_extendedprice*100 + 0.5) AS DECIMAL(38,0)) AS x1,
                         CAST(floor(l_discount*100 + 0.5) AS DECIMAL(38,0)) AS x2,
                         CAST(floor(l_tax*100 + 0.5) AS DECIMAL(38,0)) AS x3
                  FROM lineitem),
         s AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
                      sum(x0) AS s0, sum(x0*x0) AS s00,
                      sum(x1) AS s1, sum(x1*x1) AS s11,
                      sum(x2) AS s2, sum(x2*x2) AS s22,
                      sum(x3) AS s3, sum(x3*x3) AS s33,
                      sum(x0*x1) AS s01, sum(x0*x2) AS s02, sum(x0*x3) AS s03,
                      sum(x1*x2) AS s12, sum(x1*x3) AS s13, sum(x2*x3) AS s23
               FROM z)
         SELECT 'l_quantity' AS f1, 'l_extendedprice' AS f2,
                round(CAST(n*s01 - s0*s1 AS DOUBLE) /
                      (sqrt(CAST(n*s00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*s11 - s1*s1 AS DOUBLE))), 6) AS corr FROM s
         UNION ALL SELECT 'l_quantity', 'l_discount',
                round(CAST(n*s02 - s0*s2 AS DOUBLE) /
                      (sqrt(CAST(n*s00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_quantity', 'l_tax',
                round(CAST(n*s03 - s0*s3 AS DOUBLE) /
                      (sqrt(CAST(n*s00 - s0*s0 AS DOUBLE)) * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_extendedprice', 'l_discount',
                round(CAST(n*s12 - s1*s2 AS DOUBLE) /
                      (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE)) * sqrt(CAST(n*s22 - s2*s2 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_extendedprice', 'l_tax',
                round(CAST(n*s13 - s1*s3 AS DOUBLE) /
                      (sqrt(CAST(n*s11 - s1*s1 AS DOUBLE)) * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))), 6) FROM s
         UNION ALL SELECT 'l_discount', 'l_tax',
                round(CAST(n*s23 - s2*s3 AS DOUBLE) /
                      (sqrt(CAST(n*s22 - s2*s2 AS DOUBLE)) * sqrt(CAST(n*s33 - s3*s3 AS DOUBLE))), 6) FROM s""",

    // Per-query replay of q23's exact scoring for ten query vectors.
    "q85_ann_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 10),
         scored AS (SELECT q.query_id, e.vec_id,
                           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                          CAST(e.embedding AS DOUBLE[])))
                                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                    FROM embeddings e CROSS JOIN q
                    WHERE e.vec_id <> q.query_id)
         SELECT query_id, vec_id, cos
         FROM (SELECT query_id, vec_id, cos,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, vec_id) AS rn
               FROM scored)
         WHERE rn <= 5""",

    // All-cells IVF batch probe == brute force per query, so the oracle
    // is the same replay as q85's over this query set: the index changes
    // WHICH FILES a probe reads, never the rows it returns.
    "q98_ann_ivf_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id >= 10 AND vec_id < 20),
         scored AS (SELECT q.query_id, e.vec_id,
                           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                          CAST(e.embedding AS DOUBLE[])))
                                    * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                    FROM embeddings e CROSS JOIN q
                    WHERE e.vec_id <> q.query_id)
         SELECT query_id, vec_id, cos
         FROM (SELECT query_id, vec_id, cos,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, vec_id) AS rn
               FROM scored)
         WHERE rn <= 5""",

    // Median and MAD via quantile_cont (= Spark's exact percentile); the
    // unrounded |x−med| > k·MAD filter replays identically because both
    // engines compute the same doubles from the same exact percentiles.
    "q86_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                    FROM events GROUP BY 1),
         mad AS (SELECT e.event_type,
                        quantile_cont(abs(e.value - m.med), 0.5) AS mad
                 FROM events e JOIN med m USING (event_type) GROUP BY 1)
         SELECT e.event_id, e.event_type,
                round(abs(e.value - m.med) / d.mad, 4) AS score
         FROM events e JOIN med m USING (event_type)
                       JOIN mad d USING (event_type)
         WHERE d.mad > 0 AND abs(e.value - m.med) > 3 * d.mad""",

    // µs-grain ordering with the event_id tiebreak (the q38-q40/q59
    // convention) so the lag pairing is engine-independent.
    "q87_transitions" ->
      """WITH x AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
                  FROM events),
         y AS (SELECT user_id, event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id) AS prev
               FROM x)
         SELECT prev AS from_type, event_type AS to_type,
                CAST(count(*) AS BIGINT) AS n
         FROM y WHERE prev IS NOT NULL GROUP BY 1, 2""",

    // Monday-start weeks both sides; the day-diff is divisible by 7
    // exactly, so the offset arithmetic is integer-exact.
    "q88_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
                  FROM events GROUP BY 1),
         x AS (SELECT e.user_id, strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
                      CAST(datediff('day', CAST(f.cohort AS DATE),
                                    CAST(date_trunc('week', e.ts) AS DATE)) / 7
                           AS BIGINT) AS week_offset
               FROM events e JOIN f USING (user_id))
         SELECT cohort_week, week_offset,
                CAST(count(DISTINCT user_id) AS BIGINT) AS users
         FROM x GROUP BY 1, 2""",

    // min/max surface as DOUBLE both sides (string-formatting a double
    // differs between engines; the double value itself doesn't).
    "q89_profile" ->
      """SELECT 'l_quantity' AS "column",
                CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
                CAST(min(l_quantity) AS DOUBLE) AS min_v,
                CAST(max(l_quantity) AS DOUBLE) AS max_v FROM lineitem
         UNION ALL SELECT 'l_extendedprice',
                CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT l_extendedprice) AS BIGINT),
                CAST(min(l_extendedprice) AS DOUBLE),
                CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem
         UNION ALL SELECT 'l_discount',
                CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT l_discount) AS BIGINT),
                CAST(min(l_discount) AS DOUBLE),
                CAST(max(l_discount) AS DOUBLE) FROM lineitem
         UNION ALL SELECT 'l_tax',
                CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(count(DISTINCT l_tax) AS BIGINT),
                CAST(min(l_tax) AS DOUBLE),
                CAST(max(l_tax) AS DOUBLE) FROM lineitem""",

    // quantile_cont = Spark percentile (q47 parity); the clamp and the
    // rounded mean replay on identical doubles.
    "q90_winsorized" ->
      """WITH b AS (SELECT source, quantile_cont(n_chars, 0.05) AS lo,
                         quantile_cont(n_chars, 0.95) AS hi
                  FROM documents GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n,
                round(min(lo), 2) AS p_lo, round(min(hi), 2) AS p_hi,
                round(sum(greatest(least(CAST(n_chars AS DOUBLE), hi), lo))
                      / count(n_chars), 2) AS wmean
         FROM documents JOIN b USING (source) GROUP BY source""",

    // Counts aggregate first; the share/cumulative window runs over the
    // O(|labels|) result only.
    "q91_label_balance" ->
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
         SELECT label, CAST(n AS BIGINT) AS n,
                round(n / sum(n) OVER (), 6) AS share,
                round(sum(n) OVER (ORDER BY n DESC, label)
                      / sum(n) OVER (), 6) AS cum_share
         FROM c""",

    // The merged-state read view MUST equal the one-shot recompute — so
    // the oracle IS the one-shot recompute (merge associativity is the
    // property under test; the 2-dp rounds absorb double-sum ordering).
    "q92_incremental_rollup" ->
      """WITH a AS (SELECT event_type, date_trunc('week', ts) AS wk, value
                  FROM events)
         SELECT strftime(wk, '%Y-%m-%d') AS wk, event_type,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(value), 2) AS sum_v,
                round(min(value), 4) AS min_v,
                round(max(value), 4) AS max_v,
                round(sum(value) / count(*), 2) AS avg_v
         FROM a GROUP BY 1, 2""",

    // The retracted view MUST equal the one-shot recompute AFTER the CDC
    // deletes applied — so the oracle recomputes over the post-CDC base
    // (initial rows with event_id%5=0 deleted, the %3=2 third inserted).
    "q96_retract_rollup" ->
      """WITH a AS (SELECT event_type, date_trunc('week', ts) AS wk, value
                  FROM events
                  WHERE NOT (event_id % 3 <> 2 AND event_id % 5 = 0))
         SELECT strftime(wk, '%Y-%m-%d') AS wk, event_type,
                CAST(count(*) AS BIGINT) AS n,
                round(sum(value), 2) AS sum_v,
                round(min(value), 4) AS min_v,
                round(max(value), 4) AS max_v,
                round(round(sum(value), 2) / count(*), 2) AS avg_v
         FROM a GROUP BY 1, 2""",

    // Trailing-window membership replayed as a BETWEEN join against the
    // observed-day set.
    "q95_rolling_active" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
         days AS (SELECT DISTINCT d FROM du),
         x AS (SELECT days.d AS d, du.user_id
               FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d)
         SELECT strftime(d, '%Y-%m-%d') AS d,
                CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
         FROM x GROUP BY 1""",

    // File skipping never changes the answer: the oracle is the plain
    // equality filter over the whole table.
    "q97_bloom_lookup" ->
      """SELECT doc_id, source, n_chars FROM documents WHERE doc_id = 7""",

    // Anti-join churn replayed as NOT EXISTS over the weekly user sets.
    "q94_weekly_churn" ->
      """WITH wu AS (SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk,
                          user_id
                   FROM events)
         SELECT strftime(a.wk, '%Y-%m-%d') AS wk,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS churned
         FROM wu a
         WHERE NOT EXISTS (SELECT 1 FROM wu b
                           WHERE b.user_id = a.user_id AND b.wk = a.wk + 7)
         GROUP BY 1""",

    // Salting changes the physical join, never the result: the oracle is
    // the plain three-way join + rollup.
    "q93_salted_join" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n,
                round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                       JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""",

    // The same deterministic perturbation replayed, classified by a
    // FULL OUTER JOIN; IS DISTINCT FROM mirrors Spark's null-safe <=>.
    "q121_reconcile" ->
      """WITH l AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
         r AS (SELECT o_orderkey AS k,
                      CASE WHEN o_orderkey % 7 = 0
                           THEN round(o_totalprice * 1.1, 2)
                           ELSE o_totalprice END AS p
               FROM orders WHERE o_orderkey % 13 <> 0
               UNION ALL
               SELECT o_orderkey + 10000000 AS k, o_totalprice AS p
               FROM orders WHERE o_orderkey % 11 = 0),
         j AS (SELECT coalesce(l.k, r.k) AS k,
                      CASE WHEN l.k IS NULL THEN 'right_only'
                           WHEN r.k IS NULL THEN 'left_only'
                           WHEN l.p IS DISTINCT FROM r.p THEN 'changed'
                           ELSE 'same' END AS status
               FROM l FULL OUTER JOIN r ON l.k = r.k)
         SELECT status, CAST(count(*) AS BIGINT) AS n,
                CAST(min(k) AS BIGINT) AS min_key,
                CAST(max(k) AS BIGINT) AS max_key
         FROM j GROUP BY status""",

    // Fractions are integer-ratio doubles; the cumulative L1 keeps an
    // exact-integer numerator and divides once at the end (a windowed
    // DOUBLE sum would have engine-specific accumulation order).
    "q122_feature_drift" ->
      """WITH u AS (SELECT CAST(least(greatest(
                    floor((l_extendedprice - 0.0) / 5000.0), 0), 21) AS BIGINT)
                    AS bin,
                  CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END AS ir,
                  CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS ic
           FROM lineitem),
         c AS (SELECT bin, CAST(sum(ir) AS BIGINT) AS ref_n,
                      CAST(sum(ic) AS BIGINT) AS cur_n
               FROM u GROUP BY bin),
         t AS (SELECT bin, ref_n, cur_n,
                      CAST(sum(ref_n) OVER () AS BIGINT) AS rt,
                      CAST(sum(cur_n) OVER () AS BIGINT) AS ct
               FROM c)
         SELECT bin, ref_n, cur_n,
                round(CAST(ref_n AS DOUBLE) / CAST(rt AS DOUBLE), 4) AS ref_frac,
                round(CAST(cur_n AS DOUBLE) / CAST(ct AS DOUBLE), 4) AS cur_frac,
                round(CAST(CAST(sum(abs(cur_n * rt - ref_n * ct))
                            OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS DOUBLE)
                      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)), 4) AS cum_l1
         FROM t""",

    // Counting-only stats keep every dtype engine-exact (no cross-dtype
    // min/max formatting); the boolean flag is emitted as 0/1 BIGINT.
    "q123_column_hygiene" ->
      """WITH s AS (SELECT count(*) AS nr,
                count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS d1,
                count(o_custkey) AS c2, count(DISTINCT o_custkey) AS d2,
                count(o_orderstatus) AS c3, count(DISTINCT o_orderstatus) AS d3,
                count(o_totalprice) AS c4, count(DISTINCT o_totalprice) AS d4,
                count(o_orderpriority) AS c5, count(DISTINCT o_orderpriority) AS d5
           FROM orders)
         SELECT col_name, CAST(n_nulls AS BIGINT) AS n_nulls,
                CAST(n_distinct AS BIGINT) AS n_distinct,
                CAST(CASE WHEN n_distinct = 1 THEN 1 ELSE 0 END AS BIGINT)
                  AS is_constant
         FROM (SELECT 'o_orderkey' AS col_name, nr - c1 AS n_nulls,
                      d1 AS n_distinct FROM s
               UNION ALL SELECT 'o_custkey', nr - c2, d2 FROM s
               UNION ALL SELECT 'o_orderstatus', nr - c3, d3 FROM s
               UNION ALL SELECT 'o_totalprice', nr - c4, d4 FROM s
               UNION ALL SELECT 'o_orderpriority', nr - c5, d5 FROM s)""",

    // Zone maps change which FILES are read, never which rows come back:
    // the oracle is the plain range filter.
    "q124_zonemap_scan" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE n_chars >= 200 AND n_chars <= 400""",

    // The AS-OF-version read must reproduce generation 0's predicate
    // exactly, ignoring the later append.
    "q125_time_travel" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_totalprice < 100000 GROUP BY 1""",

    // Non-overlapping 3-token segments on the canonical tokenization
    // (same split as q20); out_len = kept lengths + single-space joins.
    "q126_boilerplate_strip" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         seg AS (SELECT doc_id, array_to_string(list_slice(toks, i*3+1, i*3+3), ' ') AS seg
                 FROM (SELECT doc_id, toks,
                              unnest(range(0, CAST(ceil(len(toks) / 3.0) AS BIGINT))) AS i
                       FROM t)),
         d AS (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM seg GROUP BY 1),
         m AS (SELECT s.doc_id, s.seg, d.seg_df FROM seg s JOIN d USING (seg))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                CAST(sum(CASE WHEN seg_df > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                CAST(COALESCE(sum(CASE WHEN seg_df <= 2 THEN len(seg) END), 0)
                     + greatest(count(CASE WHEN seg_df <= 2 THEN 1 END) - 1, 0)
                     AS BIGINT) AS out_len
         FROM m GROUP BY doc_id""",

    "q127_lang_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT) AS n_tokens,
                CAST(sum(len(text)) AS BIGINT) AS n_chars,
                round(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) * 100.0
                      / sum(len(text)), 4) AS tokens_per_100chars
         FROM documents GROUP BY lang""",

    // q24's near-dup pairs × q43's hash split: pairs straddling the
    // train/test boundary.
    "q128_split_leakage" ->
      """WITH pr AS (
           SELECT a.vec_id AS id1, b.vec_id AS id2,
                  round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                        / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(a.embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(b.embedding AS DOUBLE[])))), 6) AS cos
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id),
         sp AS (SELECT doc_id,
                       CASE WHEN substring(md5(text), 1, 1) < 'd'
                            THEN 'train' ELSE 'test' END AS split
                FROM documents)
         SELECT pr.id1, pr.id2, pr.cos, s1.split AS split1, s2.split AS split2
         FROM pr JOIN sp s1 ON pr.id1 = s1.doc_id
                 JOIN sp s2 ON pr.id2 = s2.doc_id
         WHERE pr.cos >= 0.3 AND s1.split <> s2.split""",

    "q129_kmeans_portable" -> q129OracleSql,

    // One scalar-aggregate leg per rule; range/regex/set rules skip nulls
    // (CASE over a null predicate falls to ELSE on both engines), FK
    // checks count only non-null keys, uniqueness counts rows beyond the
    // first per key.
    "q130_expectations" ->
      """WITH u AS (
           SELECT 'not_null' AS rule, 'o_custkey' AS target,
                  CAST(count(*) AS BIGINT) AS n_checked,
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'in_range', 'o_totalprice', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT (o_totalprice >= 0.0
                                     AND o_totalprice <= 400000.0)
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'matches', 'o_orderpriority', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority,
                                     '^[1-5]-')
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'one_of', 'o_orderstatus', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT (o_orderstatus IN ('O', 'F'))
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'unique', 'o_orderkey', CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'ref_integrity', 'o_custkey->customer.c_custkey',
                  CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey
           UNION ALL
           SELECT 'in_range', 'l_discount', CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN NOT (l_discount >= 0.0
                                     AND l_discount <= 0.05)
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'unique', 'l_orderkey,l_linenumber',
                  CAST(count(*) AS BIGINT),
                  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
                       AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'ref_integrity', 'l_orderkey->orders.o_orderkey',
                  CAST(count(*) AS BIGINT),
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM (SELECT l_orderkey FROM lineitem
                 WHERE l_orderkey IS NOT NULL) l
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey)
         SELECT rule, target, n_checked, n_violations,
                n_violations = 0 AS pass
         FROM u""",

    "q131_pagerank" -> q131OracleSql,

    // HITS replayed: the same three max-normed integer half-steps.
    "q272_hits" -> q272OracleSql,

    // Negative sampling replayed: same modular md5 draws, same
    // hole/positive discards, same (draw, item) pick order.
    "q297_negative_sample" ->
      """WITH pos AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
                    CAST(l_partkey AS BIGINT) AS it
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         us AS (SELECT DISTINCT u FROM pos),
         items AS (SELECT DISTINCT it FROM pos),
         mx AS (SELECT CAST(max(it) AS BIGINT) AS mi FROM pos),
         c AS (SELECT u, j,
                 CAST(('0x' || substring(md5(CAST(u AS VARCHAR) || '#'
                   || CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % mi + 1
                   AS it
               FROM us, (SELECT unnest(range(1, 11)) AS j) jj, mx),
         v AS (SELECT c.u, c.it, CAST(min(j) AS BIGINT) AS j
               FROM c JOIN items USING (it) GROUP BY 1, 2),
         neg AS (SELECT v.* FROM v LEFT JOIN pos p
                   ON v.u = p.u AND v.it = p.it
                 WHERE p.u IS NULL),
         r AS (SELECT u, it, j, row_number() OVER (PARTITION BY u
                 ORDER BY j, it) AS rk
               FROM neg)
         SELECT u AS user_id, it AS neg_item, j AS draw
         FROM r WHERE rk <= 3""",

    // Quantile-CI replayed: same cumulative ranks, same integer-radicand
    // sqrt chain (identical association order).
    "q296_quantile_ci" ->
      """WITH pv AS (SELECT event_type AS g,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
            GROUP BY 1, 2),
         w AS (SELECT g, v, c,
                 sum(c) OVER (PARTITION BY g ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(c) OVER (PARTITION BY g) AS n
               FROM pv),
         r AS (SELECT g, v, cum, n,
                 (n * 500 + 999) // 1000 AS rm,
                 greatest(1, CAST(floor(CAST(n * 500 AS DOUBLE) / 1000.0
                   - 1.96 * sqrt(CAST(n * 500 * 500 AS DOUBLE)) / 1000.0)
                   AS BIGINT)) AS rl,
                 least(n, CAST(ceil(CAST(n * 500 AS DOUBLE) / 1000.0
                   + 1.96 * sqrt(CAST(n * 500 * 500 AS DOUBLE)) / 1000.0)
                   AS BIGINT) + 1) AS ru
               FROM w)
         SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n_rows,
                CAST(min(CASE WHEN cum >= rm THEN v END) AS BIGINT)
                  AS q_centi,
                CAST(min(CASE WHEN cum >= rl THEN v END) AS BIGINT)
                  AS ci_lo_centi,
                CAST(min(CASE WHEN cum >= ru THEN v END) AS BIGINT)
                  AS ci_hi_centi
         FROM r GROUP BY 1""",

    // Wilson replayed: same md5 arms, same pinned score-interval chain.
    "q295_wilson_arms" ->
      """WITH ex AS (SELECT DISTINCT user_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8' THEN 'A' ELSE 'B' END AS arm
                FROM events WHERE event_type = 'view'),
         cv AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase' AND value > 50.0),
         pa AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
                       CAST(sum(CASE WHEN cv.user_id IS NOT NULL
                                THEN 1 ELSE 0 END) AS HUGEINT) AS c
                FROM ex LEFT JOIN cv USING (user_id) GROUP BY 1)
         SELECT arm, CAST(n AS BIGINT) AS n_users,
                CAST(c AS BIGINT) AS n_conv,
                CAST(CASE WHEN n = 0 THEN NULL
                     ELSE c * 1000000 // n END AS BIGINT) AS rate_ppm,
                CAST(CASE WHEN n = 0 THEN NULL
                     ELSE round((CAST(c AS DOUBLE) + 1.9208
                       - 1.96 * sqrt(CAST(c * (n - c) AS DOUBLE)
                           / CAST(n AS DOUBLE) + 0.9604))
                       / (CAST(n AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_lo_ppm,
                CAST(CASE WHEN n = 0 THEN NULL
                     ELSE round((CAST(c AS DOUBLE) + 1.9208
                       + 1.96 * sqrt(CAST(c * (n - c) AS DOUBLE)
                           / CAST(n AS DOUBLE) + 0.9604))
                       / (CAST(n AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_hi_ppm
         FROM pa ORDER BY arm""",

    // CA trend replayed: same dose bucketing, same cleared-denominator
    // radicands, same pinned finish.
    "q294_cochran_armitage" ->
      """WITH pu AS (SELECT user_id,
                   least(sum(CASE WHEN event_type = 'view'
                             THEN 1 ELSE 0 END) // 3, 3) AS s,
                   max(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS y
            FROM events GROUP BY 1),
         lvl AS (SELECT s, CAST(count(*) AS HUGEINT) AS n,
                        CAST(sum(y) AS HUGEINT) AS r
                 FROM pu GROUP BY 1),
         a AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(n) AS nn,
                      sum(r) AS rr, sum(s * n) AS sn,
                      sum(s * s * n) AS s2n, sum(s * r) AS sr
               FROM lvl),
         z AS (SELECT k, nn, rr,
                 CASE WHEN k < 2 OR rr = 0 OR rr = nn
                        OR nn * s2n - sn * sn <= 0 THEN NULL
                 ELSE round(CAST(sr * nn - sn * rr AS DOUBLE)
                   * sqrt(CAST(nn AS DOUBLE))
                   / sqrt(CAST(rr * (nn - rr) * (nn * s2n - sn * sn)
                       AS DOUBLE)) * 1000, 0) END AS zm
               FROM a)
         SELECT CAST(k AS BIGINT) AS n_levels,
                CAST(nn AS BIGINT) AS n_subjects,
                CAST(rr AS BIGINT) AS n_positive,
                CAST(zm AS BIGINT) AS z_milli,
                CAST(CASE WHEN zm IS NULL THEN NULL
                     WHEN abs(zm) >= 1960 THEN 1 ELSE 0 END AS BIGINT)
                  AS significant_05
         FROM z""",

    // Good-Turing replayed: same spectrum, same r+1 self-join, same
    // floor arithmetic.
    "q293_good_turing" ->
      """WITH tk AS (SELECT string_split(lower(trim(
                  regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         f AS (SELECT t, CAST(count(*) AS BIGINT) AS r
           FROM (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    AS t
                 FROM (SELECT toks,
                         unnest(range(1, greatest(len(toks) - 2, 0) + 1))
                           AS i
                       FROM tk)) u
           GROUP BY 1),
         sp AS (SELECT r, CAST(count(*) AS BIGINT) AS nr
                FROM f GROUP BY 1),
         tot AS (SELECT CAST(coalesce(sum(r * nr), 0) AS BIGINT) AS n,
                        CAST(coalesce(sum(CASE WHEN r = 1 THEN nr END), 0)
                          AS BIGINT) AS n1
                 FROM sp)
         SELECT sp.r, sp.nr AS n_types,
                CAST((sp.r + 1) * coalesce(nx.nr, 0) * 1000 // sp.nr
                  AS BIGINT) AS r_star_milli,
                CAST(CASE WHEN tot.n = 0 THEN NULL
                     ELSE tot.n1 * 1000000 // tot.n END AS BIGINT)
                  AS p0_ppm
         FROM sp LEFT JOIN sp nx ON nx.r = sp.r + 1, tot
         WHERE sp.r <= 5""",

    // Capture-recapture replayed: same marks, same per-fingerprint
    // capture max, same Lincoln-Petersen and Chapman arithmetic.
    "q292_capture_recapture" ->
      """WITH m AS (SELECT
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             CASE WHEN substring(md5(concat('a',
                    CAST(doc_id AS VARCHAR))), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ia,
             CASE WHEN substring(md5(concat('b',
                    CAST(doc_id AS VARCHAR))), 1, 1) < '8'
                  THEN 1 ELSE 0 END AS ib
           FROM documents),
         f AS (SELECT fp, max(ia) AS ia, max(ib) AS ib FROM m GROUP BY 1),
         a AS (SELECT CAST(coalesce(sum(ia), 0) AS BIGINT) AS da,
                      CAST(coalesce(sum(ib), 0) AS BIGINT) AS db,
                      CAST(coalesce(sum(ia * ib), 0) AS BIGINT) AS dab
               FROM f)
         SELECT da AS d_a, db AS d_b, dab AS d_both,
                CAST(CASE WHEN dab = 0 THEN NULL
                     ELSE da * db // dab END AS BIGINT) AS n_hat,
                CAST((da + 1) * (db + 1) // (dab + 1) - 1 AS BIGINT)
                  AS n_hat_chapman
         FROM a""",

    // Join cardinality replayed: two histograms, exact products, same
    // floor-ppm shares and (pairs desc, key) top-k.
    "q291_join_cardinality" ->
      """WITH l AS (SELECT l_orderkey AS join_key,
                  CAST(count(*) AS HUGEINT) AS nl
           FROM lineitem GROUP BY 1),
         r AS (SELECT o_orderkey AS join_key,
                      CAST(count(*) AS HUGEINT) AS nr
               FROM orders GROUP BY 1),
         p AS (SELECT join_key, nl, nr, nl * nr AS pr
               FROM l JOIN r USING (join_key)),
         t AS (SELECT coalesce(sum(pr), 0) AS tot FROM p)
         SELECT join_key, CAST(nl AS BIGINT) AS n_left,
                CAST(nr AS BIGINT) AS n_right,
                CAST(pr AS BIGINT) AS n_pairs,
                CAST(CASE WHEN tot = 0 THEN NULL
                     ELSE pr * 1000000 // tot END AS BIGINT) AS share_ppm,
                CAST(tot AS BIGINT) AS total_pairs
         FROM p, t ORDER BY n_pairs DESC, join_key LIMIT 20""",

    // EXIF expected values derived arithmetically — a decode that
    // misreads either byte order breaks the group-count hash.
    "q290_exif_tags" ->
      """SELECT CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
                concat('2024:01:',
                  CASE WHEN 1 + doc_id % 28 < 10
                       THEN concat('0', CAST(1 + doc_id % 28 AS VARCHAR))
                       ELSE CAST(1 + doc_id % 28 AS VARCHAR) END,
                  ' 10:00:00') AS taken_at,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2""",

    // CCF replayed: same paired-day join per lag, same exact sums and
    // two-sqrt finish.
    "q289_ccf" ->
      """WITH dl AS (SELECT event_type AS s,
                   epoch_us(ts) // 86400000000 AS d,
                   CAST(count(*) AS BIGINT) AS y
            FROM events WHERE event_type IN ('error', 'purchase')
            GROUP BY 1, 2),
         a AS (SELECT d, y AS x FROM dl WHERE s = 'error'),
         b AS (SELECT d, y AS yy FROM dl WHERE s = 'purchase'),
         l AS (SELECT unnest(range(-3, 4)) AS lag),
         p AS (SELECT a.d + l.lag AS d, l.lag, a.x FROM a, l),
         j AS (SELECT p.lag, p.x, b.yy FROM p JOIN b USING (d)),
         g AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(yy) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(yy AS HUGEINT) * yy) AS HUGEINT) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * yy) AS HUGEINT) AS sxy
               FROM j GROUP BY 1)
         SELECT CAST(lag AS BIGINT) AS lag,
                CAST(n AS BIGINT) AS n_pairs,
                CASE WHEN n < 2 OR n * sxx - sx * sx <= 0
                       OR n * syy - sy * sy <= 0 THEN NULL
                ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                END AS ccf
         FROM g""",

    // Best passage replayed: hit-anchored windows, coverage-dominant
    // integer score, identical tiebreaks, list_slice snippet.
    "q288_best_passage" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         h AS (SELECT doc_id, unnest(toks) AS term,
                      generate_subscripts(toks, 1) - 1 AS pos
               FROM b),
         q AS (SELECT doc_id, term, pos FROM h
               WHERE term IN ('join', 'vector')),
         win AS (SELECT s.doc_id, s.pos AS st,
                        CAST(count(*) AS BIGINT) AS n_hits,
                        CAST(count(DISTINCT o.term) AS BIGINT) AS n_terms
                 FROM q s JOIN q o ON s.doc_id = o.doc_id
                      AND o.pos >= s.pos AND o.pos < s.pos + 8
                 GROUP BY 1, 2),
         best AS (SELECT doc_id, st, n_terms, n_hits,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY n_terms * 1000 + n_hits DESC, st) AS rk
                  FROM win),
         top AS (SELECT doc_id, st, n_terms, n_hits FROM best
                 WHERE rk = 1
                 ORDER BY n_terms * 1000 + n_hits DESC, doc_id LIMIT 10)
         SELECT t.doc_id, CAST(t.st AS BIGINT) AS start_pos,
                t.n_terms, t.n_hits,
                array_to_string(list_slice(b.toks, t.st + 1, t.st + 8),
                  ' ') AS snippet
         FROM top t JOIN b USING (doc_id)""",

    // Friedman replayed: same complete-block cells, doubled midranks
    // via the k²-bounded block self-join, cleared-denominator finish.
    "q287_friedman" ->
      """WITH c0 AS (SELECT user_id AS b, event_type AS t,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS v
            FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
            GROUP BY 1, 2),
         cb AS (SELECT b FROM c0 GROUP BY b HAVING count(*) = 3),
         c AS (SELECT c0.* FROM c0 JOIN cb USING (b)),
         r AS (SELECT x.b, x.t,
                 CAST(2 * sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END)
                   + sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1
                   AS BIGINT) AS d
               FROM c x JOIN c y ON x.b = y.b GROUP BY x.b, x.t, x.v),
         pt AS (SELECT t, CAST(sum(d) AS HUGEINT) AS dj,
                       CAST(count(*) AS HUGEINT) AS n
                FROM r GROUP BY 1),
         dn AS (SELECT CAST(sum((d - 4) * (d - 4)) AS HUGEINT) AS den
                FROM r),
         nm AS (SELECT max(n) AS nb,
                       sum((dj - n * 4) * (dj - n * 4)) AS num
                FROM pt)
         SELECT CAST(nb AS BIGINT) AS n_blocks,
                CAST(3 AS BIGINT) AS k_treatments,
                CAST(CASE WHEN den = 0 THEN NULL
                     ELSE 2 * num * 1000 // den END AS BIGINT)
                  AS chi2_milli
         FROM nm, dn""",

    // Link prediction replayed: same canonical edges, same deg cap,
    // same wedge join and integer RA fold.
    "q286_link_prediction" ->
      """WITH e AS (SELECT DISTINCT
                  least(CAST(l_suppkey AS BIGINT),
                        CAST(l_partkey + 10000000 AS BIGINT)) AS x,
                  greatest(CAST(l_suppkey AS BIGINT),
                           CAST(l_partkey + 10000000 AS BIGINT)) AS y
           FROM lineitem),
         dg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg
                FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) u
                GROUP BY 1),
         adj AS (SELECT a.z, a.v, dg.deg
                 FROM (SELECT x AS z, y AS v FROM e
                       UNION ALL SELECT y, x FROM e) a
                 JOIN dg ON a.z = dg.n WHERE dg.deg <= 25),
         w AS (SELECT a1.v AS v1, a2.v AS v2, a1.deg
               FROM adj a1 JOIN adj a2 ON a1.z = a2.z AND a1.v < a2.v),
         sc AS (SELECT v1, v2, CAST(count(*) AS BIGINT) AS n_common,
                       CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro
                FROM w GROUP BY 1, 2),
         ne AS (SELECT s.* FROM sc s
                LEFT JOIN e ON s.v1 = e.x AND s.v2 = e.y
                WHERE e.x IS NULL)
         SELECT v1 AS node_a, v2 AS node_b, n_common, ra_micro
         FROM ne ORDER BY ra_micro DESC, n_common DESC, node_a, node_b
         LIMIT 20""",

    // PRF replayed end to end: pass-1 BM25 → feedback tf & corpus df →
    // floor-micro Σtf·idf selection → weighted pass-2 BM25.
    "q285_prf_expand" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h1 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                       unnest(toks) AS term
                FROM b),
         tf1 AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                 FROM h1 WHERE term IN ('join', 'vector', 'slow')
                 GROUP BY 1, 2, 3),
         sc1 AS (SELECT doc_id, dl, term, tf,
                        count(*) OVER (PARTITION BY term) AS df
                 FROM tf1),
         c1 AS (SELECT doc_id,
                  CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + 0.75 * dl
                                        / (st.tt * 1.0 / st.nd)))
                         * 1000000.0 + 0.5) AS BIGINT) AS cm
                FROM sc1, st),
         fbd AS (SELECT doc_id FROM c1 GROUP BY doc_id
                 ORDER BY CAST(sum(cm) AS BIGINT) DESC, doc_id LIMIT 4),
         ftf AS (SELECT term, CAST(count(*) AS BIGINT) AS ftf
                 FROM (SELECT unnest(toks) AS term
                       FROM b JOIN fbd USING (doc_id)) u
                 WHERE term NOT IN ('join', 'vector', 'slow')
                 GROUP BY 1),
         dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS cdf
                 FROM (SELECT DISTINCT doc_id, unnest(toks) AS term
                       FROM b) u
                 WHERE term IN (SELECT term FROM ftf) GROUP BY 1),
         expq AS (SELECT f.term,
                    CAST(400 AS BIGINT) AS wm
                  FROM ftf f JOIN dfc d USING (term), st
                  ORDER BY CAST(floor((st.nd - d.cdf + 0.5) / (d.cdf + 0.5)
                           * f.ftf * 1000000.0 + 0.5) AS BIGINT) DESC,
                           f.term LIMIT 8),
         allt AS (SELECT term, wm FROM expq
                  UNION ALL
                  SELECT t.term, CAST(1000 AS BIGINT)
                  FROM (VALUES ('join'), ('vector'), ('slow')) t(term)),
         tf2 AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                 FROM h1 WHERE term IN (SELECT term FROM allt)
                 GROUP BY 1, 2, 3),
         sc2 AS (SELECT doc_id, dl, term, tf,
                        count(*) OVER (PARTITION BY term) AS df
                 FROM tf2),
         c2 AS (SELECT doc_id, a.wm,
                  CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                         / (tf + 1.2 * (0.25 + 0.75 * dl
                                        / (st.tt * 1.0 / st.nd)))
                         * 1000000.0 + 0.5) AS BIGINT) AS cm
                FROM sc2 JOIN allt a USING (term), st)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
                CAST(sum(wm * cm // 1000) AS BIGINT) AS score_micro
         FROM c2 GROUP BY 1
         ORDER BY score_micro DESC, doc_id LIMIT 20""",

    // MCC replayed: same confusion counts, same two-sqrt IEEE finish.
    "q284_mcc" ->
      s"""WITH $ScoredDocsSql,
         c AS (SELECT
             CAST(coalesce(sum(CASE WHEN s >= 5000 AND y = 1 THEN 1 END), 0)
               AS HUGEINT) AS tp,
             CAST(coalesce(sum(CASE WHEN s >= 5000 AND y = 0 THEN 1 END), 0)
               AS HUGEINT) AS fp,
             CAST(coalesce(sum(CASE WHEN s < 5000 AND y = 1 THEN 1 END), 0)
               AS HUGEINT) AS fn,
             CAST(coalesce(sum(CASE WHEN s < 5000 AND y = 0 THEN 1 END), 0)
               AS HUGEINT) AS tn
           FROM sc)
         SELECT CAST(tp AS BIGINT) AS n_tp, CAST(fp AS BIGINT) AS n_fp,
                CAST(fn AS BIGINT) AS n_fn, CAST(tn AS BIGINT) AS n_tn,
                CAST(CASE WHEN tp + fp + fn + tn = 0 THEN NULL
                     ELSE (tp + tn) * 1000000 // (tp + fp + fn + tn) END
                  AS BIGINT) AS accuracy_ppm,
                CAST(CASE WHEN tp + fp = 0 OR tp + fn = 0
                       OR tn + fp = 0 OR tn + fn = 0 THEN NULL
                     ELSE round(CAST(tp * tn - fp * fn AS DOUBLE)
                       / (sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE))
                          * sqrt(CAST((tn + fp) * (tn + fn) AS DOUBLE)))
                       * 1000000, 0) END AS BIGINT) AS mcc_micro
         FROM c""",

    // SRM replayed: same md5 arm split, HUGEINT cleared-denominator
    // chi-square, same 3.841 alarm line.
    "q283_srm" ->
      """WITH ex AS (SELECT DISTINCT user_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8' THEN 1 ELSE 0 END AS isa
                FROM events WHERE event_type = 'view'),
         a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                      CAST(coalesce(sum(isa), 0) AS HUGEINT) AS oa FROM ex),
         c AS (SELECT n, oa,
                      CASE WHEN n = 0 THEN NULL
                           ELSE (1000 * oa - n * 500) * (1000 * oa - n * 500)
                                * 1000 // (n * 500 * 500) END AS chi
               FROM a)
         SELECT CAST(n AS BIGINT) AS n_exposed, CAST(oa AS BIGINT) AS n_a,
                CAST(n - oa AS BIGINT) AS n_b,
                CAST(n * 500 // 1000 AS BIGINT) AS expected_a,
                CAST(chi AS BIGINT) AS chi2_milli,
                CAST(CASE WHEN chi IS NULL THEN NULL
                          WHEN chi > 3841 THEN 1 ELSE 0 END AS BIGINT) AS srm
         FROM c""",

    // MMR replayed: same pool, same pairwise sims, six unrolled greedy
    // argmax steps over BIGINT nano-unit scores.
    "q282_mmr_topk" -> q282OracleSql,

    // Expected tag size derived arithmetically: 2 frames (11+len) + 200
    // padding = 224 + len variance — proving the synchsafe round-trip.
    "q281_id3_tags" ->
      """SELECT concat('T', repeat('x', CAST(doc_id % 7 AS INT))) AS title,
                concat('A', repeat('y', CAST(doc_id % 3 AS INT))) AS artist,
                CAST(224 + doc_id % 7 + doc_id % 3 AS BIGINT) AS tag_size,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2, 3""",

    // Same symmetrized degree join, same integral-sums Pearson finish.
    "q280_assortativity" ->
      """WITH d0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
                  CAST(l_partkey + 10000000 AS BIGINT) AS b FROM lineitem),
         e AS (SELECT a, b FROM d0 UNION SELECT b, a FROM d0),
         dg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
                FROM e GROUP BY 1),
         p AS (SELECT x.deg AS dx, y.deg AS dy
               FROM e JOIN dg x ON e.a = x.node JOIN dg y ON e.b = y.node),
         s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dx) AS HUGEINT) AS sx,
                 CAST(sum(dy) AS HUGEINT) AS sy,
                 CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
                 CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy
               FROM p)
         SELECT CAST(n AS BIGINT) AS n_edges_directed,
                CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                     THEN NULL
                     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                END AS assortativity
         FROM s""",

    // Same ntile tie discipline, same cumulative fixed-point Qini.
    "q279_qini" ->
      """WITH pu AS (SELECT user_id AS u,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS pc,
                  CAST(max(CASE WHEN epoch_us(ts) >= 1705363200000000
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS cv,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events GROUP BY 1
               HAVING sum(CASE WHEN epoch_us(ts) < 1705363200000000
                     THEN 1 ELSE 0 END) > 0),
         dd AS (SELECT *, CAST(ntile(10) OVER (ORDER BY pc DESC, u)
                  AS BIGINT) AS decile FROM pu),
         bd AS (SELECT decile,
                  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS nt,
                  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                    AS HUGEINT) AS nc,
                  CAST(sum(CASE WHEN arm = 'B' THEN cv ELSE 0 END)
                    AS HUGEINT) AS ct,
                  CAST(sum(CASE WHEN arm = 'A' THEN cv ELSE 0 END)
                    AS HUGEINT) AS cc
                FROM dd GROUP BY 1),
         cm AS (SELECT decile,
                  CAST(sum(nt) OVER w AS HUGEINT) AS cnt,
                  CAST(sum(nc) OVER w AS HUGEINT) AS cnc,
                  CAST(sum(ct) OVER w AS HUGEINT) AS cct,
                  CAST(sum(cc) OVER w AS HUGEINT) AS ccc
                FROM bd
                WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
         SELECT decile, CAST(cnt AS BIGINT) AS cum_n_t,
                CAST(cnc AS BIGINT) AS cum_n_c,
                CAST(cct AS BIGINT) AS cum_conv_t,
                CAST(ccc AS BIGINT) AS cum_conv_c,
                CASE WHEN cnc = 0 THEN NULL
                     ELSE CAST(cct * 1000 - ccc * 1000 * cnt // cnc
                       AS BIGINT) END AS qini_milli
         FROM cm""",

    // Same strata, same floor milli means, same rational-pair ATT.
    "q278_cem" -> {
      val chain = (1 to 20).map(i =>
        s"(CASE WHEN pc >= ${1L << i} THEN 1 ELSE 0 END)")
        .mkString("\n                   + ")
      s"""WITH pu AS (SELECT user_id AS u,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN 1 ELSE 0 END) AS BIGINT) AS pc,
                  CAST(count(DISTINCT CASE
                       WHEN epoch_us(ts) < 1705363200000000
                       THEN epoch_us(ts) // 86400000000 END) AS BIGINT) AS pd,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                        AND event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS y,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events GROUP BY 1
               HAVING sum(CASE WHEN epoch_us(ts) < 1705363200000000
                     THEN 1 ELSE 0 END) > 0),
         su AS (SELECT CAST($chain AS BIGINT) AS b1,
                  least(pd, 7) AS b2, arm,
                  CAST(count(*) AS HUGEINT) AS n, sum(y) AS s
                FROM pu GROUP BY 1, 2, 3),
         tt AS (SELECT b1, b2, n AS nt, s AS st FROM su WHERE arm = 'B'),
         cc AS (SELECT b1, b2, n AS nc, s AS sc FROM su WHERE arm = 'A'),
         j AS (SELECT tt.nt, cc.nc,
                 (tt.nt IS NOT NULL AND cc.nc IS NOT NULL) AS m,
                 CASE WHEN tt.nt IS NOT NULL AND cc.nc IS NOT NULL
                      THEN tt.nt * (tt.st * 1000 // tt.nt
                                    - cc.sc * 1000 // cc.nc) END AS contrib
               FROM tt FULL OUTER JOIN cc USING (b1, b2)),
         a AS (SELECT
                 CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_strata_matched,
                 CAST(sum(CASE WHEN m THEN nt ELSE 0 END) AS BIGINT)
                   AS n_treated_matched,
                 CAST(sum(CASE WHEN NOT m THEN COALESCE(nt, 0)
                   ELSE 0 END) AS BIGINT) AS n_treated_pruned,
                 CAST(sum(CASE WHEN m THEN nc ELSE 0 END) AS BIGINT)
                   AS n_control_matched,
                 CAST(sum(CASE WHEN NOT m THEN COALESCE(nc, 0)
                   ELSE 0 END) AS BIGINT) AS n_control_pruned,
                 CAST(sum(contrib) AS BIGINT) AS att_num_milli
               FROM j)
         SELECT a.*, CASE WHEN n_treated_matched = 0 THEN NULL
                  ELSE round(CAST(att_num_milli AS DOUBLE)
                       / n_treated_matched, 4) END AS att_milli
         FROM a"""
    },

    // q218's ACF CTEs + a pivot; the same fixed-shape Q expression.
    "q277_ljung_box" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         dev AS (SELECT daily.s, daily.d, st.n,
                  st.n * daily.y - st.tot AS dv
               FROM daily JOIN st USING (s)),
         den AS (SELECT s, CAST(sum(dv * dv) AS BIGINT) AS dn,
                  CAST(max(n) AS BIGINT) AS n_days FROM dev GROUP BY 1),
         num AS (SELECT a.s, CAST(l.lag AS BIGINT) AS lag,
                  CAST(sum(a.dv * b.dv) AS BIGINT) AS nm
               FROM dev a CROSS JOIN (VALUES (1), (2), (3)) l(lag)
               JOIN dev b ON a.s = b.s AND b.d = a.d + l.lag
               GROUP BY 1, 2),
         acfv AS (SELECT num.s, num.lag, den.n_days,
                  CASE WHEN den.dn = 0 THEN NULL
                       ELSE round(CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE), 6)
                  END AS acf
               FROM num JOIN den ON num.s = den.s),
         pv AS (SELECT s, max(n_days) AS n_days,
                  max(CASE WHEN acf IS NULL THEN 1 ELSE 0 END) AS degen,
                  COALESCE(max(CASE WHEN lag = 1 THEN acf END), 0.0) AS r1,
                  COALESCE(max(CASE WHEN lag = 2 THEN acf END), 0.0) AS r2,
                  COALESCE(max(CASE WHEN lag = 3 THEN acf END), 0.0) AS r3
                FROM acfv GROUP BY 1)
         SELECT s AS event_type, CAST(n_days AS BIGINT) AS n_days,
                CAST(3 AS BIGINT) AS lags,
                CASE WHEN degen = 1 OR n_days <= 3 THEN NULL
                     ELSE round(n_days * (n_days + 2) *
                       (r1 * r1 / (n_days - 1) + r2 * r2 / (n_days - 2)
                        + r3 * r3 / (n_days - 3)), 4)
                END AS q_stat
         FROM pv""",

    // The box probe recomputed relationally — layout cannot change rows.
    "q276_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
                CAST(sum(l_partkey) AS BIGINT) AS sum_pk
         FROM lineitem
         WHERE l_orderkey >= 1000 AND l_orderkey < 2500
           AND l_partkey >= 500 AND l_partkey < 1500""",

    // Same session window, same min/max-position pair collapse.
    "q275_seq_patterns" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
                 event_type AS ty FROM events),
         g AS (SELECT u, t, eid, ty,
                 CASE WHEN lag(t) OVER w IS NULL
                           OR t - lag(t) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS news,
                 row_number() OVER w AS pos
               FROM e WINDOW w AS (PARTITION BY u ORDER BY t, eid)),
         s AS (SELECT u, ty, CAST(pos AS BIGINT) AS pos,
                 CAST(sum(news) OVER (PARTITION BY u ORDER BY t, eid
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
               FROM g),
         st AS (SELECT u, sess, ty, min(pos) AS mn, max(pos) AS mx
                FROM s GROUP BY 1, 2, 3),
         pr AS (SELECT a.ty AS ante, b.ty AS cons,
                  CAST(count(*) AS BIGINT) AS n_sessions
                FROM st a JOIN st b
                  ON a.u = b.u AND a.sess = b.sess AND a.mn < b.mx
                GROUP BY 1, 2),
         an AS (SELECT ty AS ante, CAST(count(*) AS BIGINT) AS na
                FROM st GROUP BY 1)
         SELECT p.ante, p.cons, p.n_sessions,
                CAST(p.n_sessions * 1000000 // a.na AS BIGINT) AS conf_ppm
         FROM pr p JOIN an a USING (ante)
         WHERE p.n_sessions >= 2""",

    // Same one-pass four-period user table, floor milli-cent cell means.
    "q274_did" ->
      """WITH pu AS (SELECT user_id AS u,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_pre,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_post,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1704672000000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_pl1,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1704672000000000
                        AND epoch_us(ts) < 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS s_pl2,
                  max(CASE WHEN epoch_us(ts) < 1705363200000000
                      THEN 1 ELSE 0 END) AS a_pre,
                  max(CASE WHEN epoch_us(ts) >= 1705363200000000
                      THEN 1 ELSE 0 END) AS a_post,
                  max(CASE WHEN epoch_us(ts) < 1704672000000000
                      THEN 1 ELSE 0 END) AS a_pl1,
                  max(CASE WHEN epoch_us(ts) >= 1704672000000000
                       AND epoch_us(ts) < 1705363200000000
                      THEN 1 ELSE 0 END) AS a_pl2,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         pa AS (SELECT arm,
                  CAST(sum(a_pre) AS HUGEINT) AS n_pre,
                  CAST(sum(a_post) AS HUGEINT) AS n_post,
                  CAST(sum(a_pl1) AS HUGEINT) AS n_pl1,
                  CAST(sum(a_pl2) AS HUGEINT) AS n_pl2,
                  sum(s_pre) AS t_pre, sum(s_post) AS t_post,
                  sum(s_pl1) AS t_pl1, sum(s_pl2) AS t_pl2
                FROM pu GROUP BY 1),
         m AS (SELECT arm,
                 CAST(n_pre AS BIGINT) AS n_pre,
                 CAST(n_post AS BIGINT) AS n_post,
                 CASE WHEN n_pre = 0 THEN NULL
                      ELSE CAST(t_pre * 1000 // n_pre AS BIGINT)
                      END AS m_pre,
                 CASE WHEN n_post = 0 THEN NULL
                      ELSE CAST(t_post * 1000 // n_post AS BIGINT)
                      END AS m_post,
                 CASE WHEN n_pl1 = 0 THEN NULL
                      ELSE CAST(t_pl1 * 1000 // n_pl1 AS BIGINT)
                      END AS m_pl1,
                 CASE WHEN n_pl2 = 0 THEN NULL
                      ELSE CAST(t_pl2 * 1000 // n_pl2 AS BIGINT)
                      END AS m_pl2
               FROM pa)
         SELECT a.n_pre AS n_a_pre, a.n_post AS n_a_post,
                b.n_pre AS n_b_pre, b.n_post AS n_b_post,
                a.m_pre AS m_a_pre, a.m_post AS m_a_post,
                b.m_pre AS m_b_pre, b.m_post AS m_b_post,
                (b.m_post - b.m_pre) - (a.m_post - a.m_pre) AS did_milli,
                (b.m_pl2 - b.m_pl1) - (a.m_pl2 - a.m_pl1)
                  AS placebo_did_milli
         FROM (SELECT * FROM m WHERE arm = 'A') a
              CROSS JOIN (SELECT * FROM m WHERE arm = 'B') b""",

    // Same doubled-midrank table, floor-milli H and tie-corrected H.
    "q273_kruskal_wallis" ->
      """WITH r AS (SELECT event_type AS g, value AS v FROM events
                WHERE event_type IS NOT NULL AND value IS NOT NULL),
         d AS (SELECT v, CAST(count(*) AS BIGINT) AS m FROM r GROUP BY 1),
         rk AS (SELECT v, m, CAST(2 * COALESCE(sum(m) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + m + 1 AS HUGEINT) AS r2 FROM d),
         g AS (SELECT r.g, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(rk.r2) AS HUGEINT) AS s
               FROM r JOIN rk ON r.v = rk.v GROUP BY 1),
         t AS (SELECT CAST(sum(CAST(m AS HUGEINT) * m * m - m)
                 AS HUGEINT) AS tie FROM d),
         a AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(s * s // n) AS HUGEINT) AS st FROM g)
         SELECT CAST(nn AS BIGINT) AS n_rows, n_groups,
           CAST(greatest(0, 3000 * st // (nn * (nn + 1))
             - 3000 * (nn + 1)) AS BIGINT) AS h_milli,
           CASE WHEN nn * nn * nn - nn - tie = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST(greatest(0, (3000 * st // (nn * (nn + 1))
                       - 3000 * (nn + 1)) * (nn * nn * nn - nn)
                       // (nn * nn * nn - nn - tie)) AS BIGINT)
                END AS hc_milli
         FROM a CROSS JOIN t""",

    // q131's unrolled walk with the teleport CASE-gated to the seeds.
    "q256_ppr" -> q256OracleSql,

    // Rational-idf BM25 in micro-units: every double derives from exact
    // integer stats through the same expression tree as the Spark side,
    // and per-term contributions quantize to BIGINT before the per-doc
    // sum so accumulation order can't flip a bit.
    "q132_bm25" ->
      """WITH b AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
         st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                       CAST(sum(len(toks)) AS BIGINT) AS tt
                FROM b),
         h AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                      unnest(toks) AS term
               FROM b),
         tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                FROM h WHERE term IN ('join', 'vector', 'slow')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, dl, term, tf,
                       count(*) OVER (PARTITION BY term) AS df
                FROM tf),
         c AS (SELECT doc_id,
                 CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                        / (tf + 1.2 * (0.25 + 0.75 * dl
                                       / (st.tt * 1.0 / st.nd)))
                        * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM sc, st)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
                CAST(sum(cm) AS BIGINT) AS score_micro
         FROM c GROUP BY 1 ORDER BY score_micro DESC, doc_id LIMIT 20""",

    // Per-dim [min,max] from the same double-cast values both engines
    // see; code = floor((x-mn)*255/(mx-mn) + 0.5), constant dims → 0.
    "q133_sq8_codes" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(e, 1) AS i,
                      unnest(e) AS val
               FROM v),
         st AS (SELECT i, min(val) AS mn, max(val) AS mx FROM x GROUP BY 1),
         c AS (SELECT vec_id, x.i,
                 CASE WHEN mx > mn
                      THEN CAST(floor((val - mn) * 255.0 / (mx - mn) + 0.5)
                                AS INT)
                      ELSE 0 END AS code
               FROM x JOIN st ON x.i = st.i)
         SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY i)
                  AS codes_csv
         FROM c WHERE vec_id < 20 GROUP BY 1""",

    "q134_sq8_ann" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings),
         x AS (SELECT vec_id, generate_subscripts(e, 1) AS i,
                      unnest(e) AS val
               FROM v),
         st AS (SELECT i, min(val) AS mn, max(val) AS mx FROM x GROUP BY 1),
         c AS (SELECT vec_id, x.i,
                 CASE WHEN mx > mn
                      THEN CAST(floor((val - mn) * 255.0 / (mx - mn) + 0.5)
                                AS INT)
                      ELSE 0 END AS code
               FROM x JOIN st ON x.i = st.i),
         q AS (SELECT i, code FROM c WHERE vec_id = 0)
         SELECT c.vec_id, CAST(sum(c.code * q.code) AS BIGINT) AS score_q
         FROM c JOIN q ON c.i = q.i WHERE c.vec_id <> 0
         GROUP BY 1 ORDER BY score_q DESC, vec_id LIMIT 20""",

    "q135_inverted_index" ->
      """WITH tok AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
         tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY 1, 2),
         r AS (SELECT term, doc_id, tf,
                 count(*) OVER (PARTITION BY term) AS df,
                 row_number() OVER (PARTITION BY term
                   ORDER BY tf DESC, doc_id) AS rk
               FROM tf)
         SELECT term, CAST(df AS BIGINT) AS df,
                CAST(count(*) AS BIGINT) AS n_postings,
                string_agg(doc_id || ':' || tf, '|' ORDER BY rk) AS postings
         FROM r WHERE rk <= 5
         GROUP BY term, df
         ORDER BY df DESC, term LIMIT 30""",

    // concat_ws drops NULLs on both engines, so the label list is the
    // rule order with clean rules skipped.
    "q136_quarantine" ->
      """SELECT o_orderkey, violated FROM (
           SELECT o_orderkey, concat_ws(',',
             CASE WHEN NOT (o_totalprice >= 0.0 AND o_totalprice <= 400000.0)
                  THEN 'in_range:o_totalprice' END,
             CASE WHEN NOT (o_orderstatus IN ('O', 'F'))
                  THEN 'one_of:o_orderstatus' END) AS violated
           FROM orders)
         WHERE violated <> ''""",

    "q137_ab_lift" ->
      """WITH ex AS (SELECT DISTINCT user_id,
                   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                             < '8'
                        THEN 'A' ELSE 'B' END AS arm
                FROM events WHERE event_type = 'view'),
         cv AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase' AND value > 50.0),
         pa AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN cv.user_id IS NOT NULL
                                THEN 1 ELSE 0 END) AS BIGINT) AS c
                FROM ex LEFT JOIN cv USING (user_id) GROUP BY 1),
         pr AS (SELECT arm, n, c, CAST(c * 1000000 // n AS BIGINT)
                         AS rate_ppm
                FROM pa)
         SELECT a.n AS n_users_a, a.c AS n_conv_a, a.rate_ppm AS rate_ppm_a,
                b.n AS n_users_b, b.c AS n_conv_b, b.rate_ppm AS rate_ppm_b,
                CAST(CASE WHEN a.rate_ppm = 0 THEN NULL
                          ELSE b.rate_ppm * 1000000 // a.rate_ppm END
                     AS BIGINT) AS lift_ppm
         FROM (SELECT * FROM pr WHERE arm = 'A') a,
              (SELECT * FROM pr WHERE arm = 'B') b""",

    // µs-grain ages (DuckDB truncates the parquet ns — q38's rule);
    // hyperbolic decay in pure integer floor division.
    "q138_trending" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS mt FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(1000000 // (1 + (mt - epoch_us(ts)) // 86400000000))
                     AS BIGINT) AS decayed_score
         FROM events, m GROUP BY 1""",

    // The four stages are the q16/q18/q67/q104 oracle fragments chained:
    // same quality formula, same md5(nt) fingerprint survivor, same
    // 3-gram contamination semi-join, same md5-ordered budget window.
    "q140_corpus_pipeline" ->
      """WITH t AS (SELECT doc_id, source, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         q AS (SELECT doc_id, source, text, nt FROM (
                SELECT doc_id, source, text, nt,
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                        / greatest(length(text), 1), 4) AS quality
                FROM t WHERE doc_id % 97 <> 0)
               WHERE quality >= 0.5),
         s2 AS (SELECT doc_id, source, text FROM (
                 SELECT *, row_number() OVER (PARTITION BY md5(nt)
                            ORDER BY doc_id) AS rk FROM q)
                WHERE rk = 1),
         tok AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM t),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1))
                               AS i
                      FROM tok)),
         test_g AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
         contaminated AS (SELECT DISTINCT doc_id FROM sh
                          WHERE doc_id % 97 <> 0
                            AND g IN (SELECT g FROM test_g)),
         s3 AS (SELECT doc_id, source, text FROM s2
                WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         s4 AS (SELECT doc_id, source,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       AS BIGINT) AS n_tokens,
                  CAST(sum(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                           AS BIGINT))
                       OVER (PARTITION BY source ORDER BY md5(text), doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM s3)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
         FROM s4 WHERE cum <= 800 GROUP BY 1""",
  )
}
