package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mechanical split of the `SparkEntry.oracleSql` registry (chunk 6 of
  * 6) — SQL verbatim from the original single map;
  * `SparkEntry` concatenates the chunks, so the contract is unchanged. */
private[graft] trait OracleRegistry6 { this: SparkEntry.type =>

  private[graft] def oracleChunk6: Map[String, String] = Map(

    "q331_column_default" ->
      """WITH t AS (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'legacy'
                       WHEN CAST(l_quantity AS BIGINT) >= 25 THEN 'high'
                       ELSE 'low' END AS grade,
                    CAST(l_quantity AS BIGINT) AS qty
             FROM lineitem)
         SELECT grade, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(qty) AS BIGINT) AS sum_qty
         FROM t GROUP BY 1""",

    "q330_bfs_hops" ->
      """WITH li AS (SELECT DISTINCT l_suppkey AS sk,
                  l_partkey + 10000000 AS pk FROM lineitem),
         e AS (SELECT sk AS s, pk AS d FROM li
               UNION SELECT pk AS s, sk AS d FROM li),
         v0 AS (SELECT unnest([1, 2, 3]) AS node),
         f1 AS (SELECT DISTINCT e.d AS node FROM e JOIN v0 ON e.s = v0.node
                WHERE e.d NOT IN (SELECT node FROM v0)),
         f2 AS (SELECT DISTINCT e.d AS node FROM e JOIN f1 ON e.s = f1.node
                WHERE e.d NOT IN (SELECT node FROM v0)
                  AND e.d NOT IN (SELECT node FROM f1)),
         f3 AS (SELECT DISTINCT e.d AS node FROM e JOIN f2 ON e.s = f2.node
                WHERE e.d NOT IN (SELECT node FROM v0)
                  AND e.d NOT IN (SELECT node FROM f1)
                  AND e.d NOT IN (SELECT node FROM f2)),
         allv AS (SELECT node, 0 AS hops FROM v0
                  UNION ALL SELECT node, 1 FROM f1
                  UNION ALL SELECT node, 2 FROM f2
                  UNION ALL SELECT node, 3 FROM f3)
         SELECT CAST(hops AS BIGINT) AS hops,
                CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(min(node) AS BIGINT) AS min_node,
                CAST(max(node) AS BIGINT) AS max_node
         FROM allv GROUP BY 1""",

    "q329_concentration" ->
      """WITH x AS (SELECT event_type AS g, user_id AS e, count(*) AS c
               FROM events
               WHERE event_type IS NOT NULL AND user_id IS NOT NULL
               GROUP BY 1, 2),
         h AS (SELECT g, c, count(*) AS m FROM x GROUP BY 1, 2),
         b AS (SELECT g, c, m,
                 coalesce(sum(m) OVER (PARTITION BY g ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
               FROM h),
         a AS (SELECT g, sum(m) AS n, sum(c * m) AS s,
                      sum(c * m * (2 * below + m + 1)) AS tis,
                      sum(m * c * c) AS sq, max(c) AS top
               FROM b GROUP BY 1)
         SELECT g AS event_type, CAST(n AS BIGINT) AS n_entities,
                CAST(s AS BIGINT) AS total,
                CAST((tis - (n + 1) * s) * 1000000 // (n * s) AS BIGINT)
                  AS gini_ppm,
                CAST(sq * 1000000 // (s * s) AS BIGINT) AS hhi_ppm,
                CAST(top * 1000000 // s AS BIGINT) AS top1_ppm
         FROM a""",

    "q356_welch_t" ->
      """WITH rows_ AS (SELECT CAST(l_returnflag AS VARCHAR) AS g,
                      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS q
               FROM lineitem
               WHERE l_extendedprice IS NOT NULL
                 AND l_returnflag IN ('R', 'N')),
         f AS (SELECT
                 CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS HUGEINT) AS na,
                 CAST(coalesce(sum(CASE WHEN g = 'R' THEN q END), 0) AS HUGEINT) AS sa,
                 CAST(coalesce(sum(CASE WHEN g = 'R'
                      THEN CAST(q AS HUGEINT) * q END), 0) AS HUGEINT) AS qa,
                 CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
                 CAST(coalesce(sum(CASE WHEN g = 'N' THEN q END), 0) AS HUGEINT) AS sb,
                 CAST(coalesce(sum(CASE WHEN g = 'N'
                      THEN CAST(q AS HUGEINT) * q END), 0) AS HUGEINT) AS qb
               FROM rows_),
         t AS (SELECT na, nb,
                      CASE WHEN na = 0 OR nb = 0 THEN NULL
                           ELSE (sa * nb - sb * na) * 1000000 // (na * nb) END AS dm,
                      CASE WHEN na < 2 THEN NULL
                           ELSE (na * qa - sa * sa) * 1000
                                // (na * na * (na - 1)) END AS vam,
                      CASE WHEN nb < 2 THEN NULL
                           ELSE (nb * qb - sb * sb) * 1000
                                // (nb * nb * (nb - 1)) END AS vbm
               FROM f)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                CAST(dm AS BIGINT) AS mean_diff_micro,
                CAST(CASE WHEN vam IS NULL OR vbm IS NULL
                          OR vam + vbm <= 0 THEN NULL
                     ELSE dm * dm * 1000 // ((vam + vbm) * 1000000000) END
                  AS BIGINT) AS t2_milli,
                CAST(CASE WHEN vam IS NULL OR vbm IS NULL OR vam + vbm <= 0
                          OR vam * vam * (nb - 1)
                           + vbm * vbm * (na - 1) = 0 THEN NULL
                     ELSE (vam + vbm) * (vam + vbm)
                          * (na - 1) * (nb - 1) * 1000
                          // (vam * vam * (nb - 1)
                            + vbm * vbm * (na - 1)) END
                  AS BIGINT) AS df_milli
         FROM t""",

    "q328_mann_whitney" ->
      """WITH rows_ AS (SELECT CAST(l_returnflag AS VARCHAR) AS g, l_quantity AS v
               FROM lineitem
               WHERE l_quantity IS NOT NULL AND l_returnflag IN ('R', 'N')),
         r AS (SELECT v, count(*) AS m FROM rows_ GROUP BY 1),
         rk AS (SELECT v, m,
                  2 * coalesce(sum(m) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + m + 1 AS r2
                FROM r),
         f AS (SELECT sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS n1,
                      sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS n2,
                      sum(CASE WHEN g = 'R' THEN r2 ELSE 0 END) AS tr1
               FROM rows_ JOIN rk USING (v)),
         t AS (SELECT sum(m * m * m - m) AS tie FROM rk)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CAST(tr1 - n1 * (n1 + 1) AS BIGINT) AS two_u1,
                CAST(tie AS BIGINT) AS tie_term,
                CASE WHEN n1 = 0 OR n2 = 0 THEN CAST(NULL AS DOUBLE)
                  WHEN CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                    * (CAST(n1 + n2 + 1 AS DOUBLE)
                       - CAST(tie AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE)
                            * CAST(n1 + n2 - 1 AS DOUBLE))) <= 0.0
                  THEN CAST(NULL AS DOUBLE)
                  ELSE round((CAST(tr1 - n1 * (n1 + 1) AS DOUBLE)
                      - CAST(n1 * n2 AS DOUBLE))
                    / (2.0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       / 12.0 * (CAST(n1 + n2 + 1 AS DOUBLE)
                         - CAST(tie AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE)
                              * CAST(n1 + n2 - 1 AS DOUBLE))))), 6)
                  END AS z
         FROM f, t""",

    "q349_span_sweep" -> spanSweepOracleSql,

    "q347_span_incremental" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         store AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
         cov AS (SELECT DISTINCT doc_id, p FROM g
                 JOIN store USING (gram) WHERE doc_id % 2 = 1),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl)
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
                CAST(max(p) + 8 - min(p) AS BIGINT) AS span_len
         FROM sp GROUP BY doc_id, sid""",

    // Shingle semantics mirror q20's (distinct 3-gram sets, lowercased
    // whitespace tokens); the df side joins raw shingle strings where
    // Spark joins their 64-bit hashes — the family's collision trade.
    "q346_novelty" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         df AS (SELECT g, count(DISTINCT doc_id) AS nd FROM sh GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unique,
                CAST(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) * 1000000
                  // count(*) AS BIGINT) AS novelty_ppm
         FROM sh JOIN df USING (g)
         GROUP BY 1""",

    "q342_span_clean" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl),
         spans AS (SELECT doc_id, max(p) + 8 - min(p) AS slen
                   FROM sp GROUP BY doc_id, sid),
         agg AS (SELECT doc_id, CAST(sum(slen) AS BIGINT) AS dup_tokens,
                        CAST(count(*) AS BIGINT) AS n_spans
                 FROM spans GROUP BY 1),
         per AS (SELECT d.source, d.doc_id,
                   CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT)
                     AS n_tokens,
                   coalesce(agg.dup_tokens, 0) AS dup_tokens,
                   coalesce(agg.n_spans, 0) AS n_spans
                 FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN n_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS docs_touched,
                CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
                CAST(sum(dup_tokens) AS BIGINT) AS tokens_removed,
                CAST(sum(n_tokens) - sum(dup_tokens) AS BIGINT) AS tokens_after,
                CAST(CASE WHEN sum(n_tokens) = 0 THEN 0
                     ELSE sum(dup_tokens) * 1000000 // sum(n_tokens) END
                  AS BIGINT) AS removed_ppm
         FROM per GROUP BY 1""",

    // The rewrite replayed arithmetically: same span CTEs as q325, then
    // the splice — touched docs rebuild from original-case tokens whose
    // 0-based position falls in no span interval (string_agg ordered by
    // position), untouched docs pass text through verbatim. A fully
    // covered doc collapses to '' via the coalesce, exactly like Spark's
    // empty-array array_join.
    "q350_span_rewrite" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl),
         spans AS (SELECT doc_id, min(p) AS s0, max(p) + 8 - min(p) AS slen
                   FROM sp GROUP BY doc_id, sid),
         agg AS (SELECT doc_id, CAST(sum(slen) AS BIGINT) AS removed
                 FROM spans GROUP BY 1),
         raw AS (SELECT doc_id, text,
                   string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
                     AS rtoks,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                     AS n_tokens
                 FROM documents),
         pos AS (SELECT doc_id, rtoks,
                        unnest(range(1, len(rtoks) + 1)) AS i
                 FROM raw WHERE doc_id IN (SELECT doc_id FROM agg)),
         kept AS (SELECT p.doc_id,
                    string_agg(p.rtoks[p.i], ' ' ORDER BY p.i) AS ctext,
                    CAST(count(*) AS BIGINT) AS nkept
                  FROM pos p
                  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id
                      AND p.i - 1 >= s.s0 AND p.i - 1 < s.s0 + s.slen)
                  GROUP BY 1)
         SELECT r.doc_id, r.n_tokens,
                coalesce(a.removed, 0) AS tokens_removed,
                CAST(CASE WHEN a.doc_id IS NULL THEN r.n_tokens
                     ELSE coalesce(k.nkept, 0) END AS BIGINT) AS tokens_after,
                CASE WHEN a.doc_id IS NULL THEN r.text
                     ELSE coalesce(k.ctext, '') END AS clean_text
         FROM raw r
         LEFT JOIN agg a USING (doc_id)
         LEFT JOIN kept k USING (doc_id)""",

    // Duplicated spans replayed raw: gram explode with positions, grams
    // in ≥2 distinct docs, interval union via gaps-and-islands. The
    // Spark side joins 64-bit gram hashes (collision trade doc'd); the
    // oracle joins the raw gram strings — hash equality proves both.
    "q325_dup_spans" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl)
         SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
                CAST(max(p) + 8 - min(p) AS BIGINT) AS span_len
         FROM sp GROUP BY doc_id, sid""",

    "q326_span_report" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         g AS (SELECT doc_id, i - 1 AS p,
                      array_to_string(toks[i:i+7], ' ') AS gram
               FROM (SELECT doc_id, toks,
                            unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS i
                     FROM t WHERE len(toks) >= 8)),
         sh AS (SELECT gram FROM
                  (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
                WHERE nd >= 2),
         cov AS (SELECT DISTINCT doc_id, p FROM g JOIN sh USING (gram)),
         isl AS (SELECT doc_id, p,
                   CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
                          OR p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 8
                        THEN 1 ELSE 0 END AS ns
                 FROM cov),
         sp AS (SELECT doc_id, p,
                  sum(ns) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM isl),
         spans AS (SELECT doc_id, min(p) AS s0, max(p) + 8 - min(p) AS slen
                   FROM sp GROUP BY doc_id, sid),
         agg AS (SELECT doc_id, CAST(sum(slen) AS BIGINT) AS dup_tokens,
                        CAST(count(*) AS BIGINT) AS n_spans
                 FROM spans GROUP BY 1),
         tot AS (SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                     AS n_tokens
                 FROM documents)
         SELECT tot.doc_id, n_tokens,
                coalesce(dup_tokens, 0) AS dup_tokens,
                coalesce(n_spans, 0) AS n_spans,
                CAST(CASE WHEN n_tokens = 0 THEN 0
                     ELSE coalesce(dup_tokens, 0) * 1000000 // n_tokens END
                  AS BIGINT) AS dup_ppm
         FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id""",

    // BPE encode under the disjoint-alphabet merge table: the token
    // count's closed form (non-space chars minus each pair's
    // leftmost-nonoverlapping occurrences, countable via replace
    // arithmetic) — the oracle derives it WITHOUT replaying the encode
    // loop, so the hash proves the expression's merge semantics.
    "q323_bpe_encode" ->
      """WITH t AS (SELECT doc_id,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents)
         SELECT doc_id,
                CAST(length(replace(nt, ' ', ''))
                  - (length(nt) - length(replace(nt, 'th', ''))) // 2
                  - (length(nt) - length(replace(nt, 'an', ''))) // 2
                  - (length(nt) - length(replace(nt, 'ou', ''))) // 2
                  - (length(nt) - length(replace(nt, 'es', ''))) // 2
                  AS BIGINT) AS n_tokens
         FROM t""",

    "q324_bpe_budget" ->
      """WITH t AS (SELECT doc_id, source, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT doc_id, source, md5(text) AS pick,
                  CAST(length(replace(nt, ' ', ''))
                    - (length(nt) - length(replace(nt, 'th', ''))) // 2
                    - (length(nt) - length(replace(nt, 'an', ''))) // 2
                    - (length(nt) - length(replace(nt, 'ou', ''))) // 2
                    - (length(nt) - length(replace(nt, 'es', ''))) // 2
                    AS BIGINT) AS n_tokens
               FROM t)
         SELECT doc_id, source, n_tokens, cum_tokens
         FROM (SELECT doc_id, source, n_tokens,
                      CAST(sum(n_tokens) OVER (PARTITION BY source
                        ORDER BY pick, doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
               FROM c)
         WHERE cum_tokens <= 4000""",

    // The prefix filter is LOSSLESS, so its oracle is the plain
    // brute-force exact join — hash equality proves the claim.
    "q317_prefix_jaccard" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
         SELECT id1, id2,
                round(inter * 1.0 / (c1.n + c2.n - inter), 4) AS jaccard
         FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                 JOIN cnt c2 ON pr.id2 = c2.doc_id
         WHERE round(inter * 1.0 / (c1.n + c2.n - inter), 4) >= 0.5""",

    // FP-Growth replayed as the explicit 1/2/3-itemset lattice with the
    // same integer support threshold.
    "q318_fp_growth" ->
      """WITH b AS (SELECT DISTINCT user_id AS u, event_type AS i
             FROM events
             WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         th AS (SELECT greatest(2, count(DISTINCT u) // 20) AS t FROM b),
         s1 AS (SELECT i AS itemset, 1 AS n_items, count(*) AS c
                FROM b GROUP BY 1),
         s2 AS (SELECT a.i || ',' || b2.i AS itemset, 2 AS n_items,
                       count(*) AS c
                FROM b a JOIN b b2 ON a.u = b2.u AND a.i < b2.i
                GROUP BY 1),
         s3 AS (SELECT a.i || ',' || b2.i || ',' || c3.i AS itemset,
                       3 AS n_items, count(*) AS c
                FROM b a JOIN b b2 ON a.u = b2.u AND a.i < b2.i
                          JOIN b c3 ON a.u = c3.u AND b2.i < c3.i
                GROUP BY 1)
         SELECT itemset, CAST(n_items AS BIGINT) AS n_items,
                CAST(c AS BIGINT) AS support
         FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
               UNION ALL SELECT * FROM s3) u0, th
         WHERE c >= t
         ORDER BY n_items, itemset""",

    // WebP roundtrip: parse(synth(p)) == p, so the oracle re-derives
    // both the parameters AND the "decoded" columns arithmetically.
    "q315_webp_dims" ->
      """WITH p AS (SELECT doc_id % 3 AS variant, 16 + doc_id % 17 AS w,
                9 + doc_id % 13 AS h
             FROM documents)
         SELECT CAST(variant AS BIGINT) AS variant, CAST(w AS BIGINT) AS w,
                CAST(h AS BIGINT) AS h, CAST(w AS BIGINT) AS w_decoded,
                CAST(h AS BIGINT) AS h_decoded,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // MP3 roundtrip: the walker's table lookups re-derived as CASEs.
    "q316_mp3_meta" ->
      """WITH p AS (SELECT 1 + doc_id % 14 AS br_idx, doc_id % 3 AS sr_idx,
                3 + doc_id % 5 AS frames
             FROM documents)
         SELECT CAST(br_idx AS BIGINT) AS br_idx,
                CAST(sr_idx AS BIGINT) AS sr_idx,
                CAST(frames AS BIGINT) AS frames,
                CAST(frames AS BIGINT) AS frames_decoded,
                CAST(CASE sr_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END AS BIGINT) AS sample_rate,
                CAST(CASE br_idx WHEN 1 THEN 32 WHEN 2 THEN 40
                     WHEN 3 THEN 48 WHEN 4 THEN 56 WHEN 5 THEN 64
                     WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
                     WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
                     WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END
                     AS BIGINT) AS bitrate_kbps,
                CAST(frames * 1152 AS BIGINT) AS n_samples,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM p GROUP BY 1, 2, 3, 4, 5, 6, 7 ORDER BY 1, 2, 3""",

    // Label propagation unrolled: three synchronous argmax rounds
    // (count desc, label asc), identical tie rule via row_number.
    "q313_label_prop" -> {
      def round(prev: String, out: String) =
        s"""$out AS (SELECT node, lbl FROM (
               SELECT e.a AS node, l.lbl, count(*) AS c,
                      row_number() OVER (PARTITION BY e.a
                        ORDER BY count(*) DESC, l.lbl ASC) AS rn
               FROM e JOIN $prev l ON e.b = l.node
               GROUP BY e.a, l.lbl) t
             WHERE rn = 1)"""
      s"""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
                  CAST(l_partkey + 10000000 AS BIGINT) AS b
             FROM lineitem
             WHERE l_suppkey <> l_partkey + 10000000),
         e AS (SELECT DISTINCT a, b FROM
                 (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0) u),
         l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
         ${round("l0", "i1")},
         ${round("i1", "i2")},
         ${round("i2", "i3")}
         SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
         FROM i3 GROUP BY lbl
         ORDER BY n_members DESC, community ASC LIMIT 20"""
    },

    // Poisson bootstrap replayed: identical md5 inverse-CDF weights
    // (8-hex literal thresholds), HUGEINT partials, `//` floors.
    "q314_poisson_boot" ->
      """WITH base AS (SELECT event_type AS g,
                CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                CAST(event_id AS VARCHAR) AS id
             FROM events
             WHERE value IS NOT NULL AND event_id IS NOT NULL),
         reps AS (SELECT g, c, id, CAST(bb.range AS INTEGER) AS b
                  FROM base, range(32) bb),
         wt AS (SELECT g, b, c,
                  CASE WHEN h < '5e2d58d8' THEN 0
                       WHEN h < 'bc5ab1b1' THEN 1
                       WHEN h < 'eb715e1d' THEN 2
                       WHEN h < 'fb239797' THEN 3
                       WHEN h < 'ff1025f5' THEN 4
                       WHEN h < 'ffd90f3b' THEN 5
                       WHEN h < 'fffa8b71' THEN 6
                       WHEN h < 'ffff540c' THEN 7
                       WHEN h < 'ffffed1f' THEN 8
                       ELSE 9 END AS m
                FROM (SELECT g, c, b,
                        substring(md5(id || '#' || CAST(b // 4 AS VARCHAR)),
                          1 + 8 * (b % 4), 8) AS h
                      FROM reps) t),
         pr AS (SELECT g, b, CAST(sum(m) AS HUGEINT) AS nb,
                  CAST(sum(CAST(m AS HUGEINT) * c) AS HUGEINT) AS sb
                FROM wt GROUP BY g, b),
         mb AS (SELECT g, sb // nb AS m FROM pr WHERE nb > 0),
         bt AS (SELECT g, CAST(count(*) AS HUGEINT) AS bl,
                  sum(m) AS sm, sum(m * m) AS sm2
                FROM mb GROUP BY g),
         raw AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(c AS HUGEINT)) // count(*) AS BIGINT)
                     AS mean_centi
                 FROM base GROUP BY g)
         SELECT raw.g AS event_type, n_rows, mean_centi,
                CAST(bl AS BIGINT) AS b_live,
                CAST(CASE WHEN bl < 2 THEN NULL
                     ELSE (bl * sm2 - sm * sm) // (bl * (bl - 1)) END
                     AS BIGINT) AS boot_var_centi2
         FROM raw JOIN bt ON raw.g = bt.g
         ORDER BY event_type""",

    // Rebalance replayed: same md5 ring, same wrap rule, same min-shard
    // position ownership.
    "q308_shard_rebalance" ->
      """WITH ring AS (SELECT s,
                CAST(('0x' || substring(md5(CAST(s AS VARCHAR) || '#'
                  || CAST(v AS VARCHAR)), 1, 12)) AS BIGINT) AS pos
           FROM (SELECT unnest(range(0, 5)) AS s) ss,
                (SELECT unnest(range(0, 8)) AS v) vv),
         h AS (SELECT doc_id,
                 CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                   1, 12)) AS BIGINT) AS hh
               FROM documents),
         b AS (SELECT h.doc_id,
                 coalesce(min(CASE WHEN r.pos >= h.hh THEN r.pos END),
                   min(r.pos)) AS tp
               FROM h, ring r WHERE r.s <= 3 GROUP BY h.doc_id, h.hh),
         sb AS (SELECT b.doc_id, CAST(min(r.s) AS BIGINT) AS shard_before
                FROM b JOIN ring r ON r.pos = b.tp AND r.s <= 3
                GROUP BY 1),
         a AS (SELECT h.doc_id,
                 coalesce(min(CASE WHEN r.pos >= h.hh THEN r.pos END),
                   min(r.pos)) AS tp
               FROM h, ring r WHERE r.s <= 4 GROUP BY h.doc_id, h.hh),
         sa AS (SELECT a.doc_id, CAST(min(r.s) AS BIGINT) AS shard_after
                FROM a JOIN ring r ON r.pos = a.tp AND r.s <= 4
                GROUP BY 1),
         j AS (SELECT sb.shard_before, sa.shard_after
               FROM sb JOIN sa USING (doc_id))
         SELECT shard_before AS shard, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN shard_before <> shard_after
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
                CAST(sum(CASE WHEN shard_before <> shard_after
                  THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
                  AS moved_ppm,
                CAST(max(CASE WHEN shard_before <> shard_after
                  THEN shard_after END) AS BIGINT) AS moved_to
         FROM j GROUP BY 1""",

    // Dropoff replayed: q115's stage CTEs, pairwise floor conversions,
    // the pinned Wilson chain on the two exact counts.
    "q307_funnel_dropoff" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type
                    FROM events),
         s1 AS (SELECT u, min(t) AS t1 FROM e WHERE event_type = 'signup'
                GROUP BY u),
         s2 AS (SELECT e.u, min(t) AS t2, min(t1) AS t1
                FROM e JOIN s1 USING (u)
                WHERE event_type = 'click' AND t > t1
                  AND t <= t1 + 604800000000 GROUP BY e.u),
         s3 AS (SELECT e.u, min(t) AS t3 FROM e JOIN s2 USING (u)
                WHERE event_type = 'purchase' AND t > t2
                  AND t <= t1 + 604800000000 GROUP BY e.u),
         c AS (SELECT 1 AS step_idx, 'signup' AS st,
                      (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n
               UNION ALL SELECT 2, 'click',
                      (SELECT CAST(count(*) AS BIGINT) FROM s2)
               UNION ALL SELECT 3, 'purchase',
                      (SELECT CAST(count(*) AS BIGINT) FROM s3)),
         p AS (SELECT f.step_idx, f.st AS from_step, g.st AS to_step,
                      f.n AS nf, g.n AS nt
               FROM c f JOIN c g ON g.step_idx = f.step_idx + 1)
         SELECT CAST(step_idx AS BIGINT) AS step_idx, from_step, to_step,
                CAST(nf AS BIGINT) AS n_from, CAST(nt AS BIGINT) AS n_to,
                CAST(CASE WHEN nf = 0 THEN NULL
                     ELSE nt * 1000000 // nf END AS BIGINT) AS conv_ppm,
                CAST(CASE WHEN nf = 0 THEN NULL
                     ELSE round((CAST(nt AS DOUBLE) + 1.9208
                       - 1.96 * sqrt(CAST(nt * (nf - nt) AS DOUBLE)
                           / CAST(nf AS DOUBLE) + 0.9604))
                       / (CAST(nf AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_lo_ppm,
                CAST(CASE WHEN nf = 0 THEN NULL
                     ELSE round((CAST(nt AS DOUBLE) + 1.9208
                       + 1.96 * sqrt(CAST(nt * (nf - nt) AS DOUBLE)
                           / CAST(nf AS DOUBLE) + 0.9604))
                       / (CAST(nf AS DOUBLE) + 3.8416) * 1000000, 0) END
                  AS BIGINT) AS wilson_hi_ppm
         FROM p""",

    // Sliced AUC replayed: the q167 midrank CTEs partitioned by lang.
    "q306_auc_by_slice" ->
      s"""WITH $SlicedScoredDocsSql,
         per AS (SELECT slice, s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1, 2),
         cum AS (SELECT slice, s, p, n,
                   COALESCE(sum(n) OVER (PARTITION BY slice ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS nlt
                 FROM per),
         agg AS (SELECT slice, sum(p * (2 * nlt + n)) AS num2,
                        sum(p) AS pos, sum(n) AS neg
                 FROM cum GROUP BY 1)
         SELECT slice, CAST(pos AS BIGINT) AS n_pos,
                CAST(neg AS BIGINT) AS n_neg,
                CAST(CASE WHEN pos = 0 OR neg = 0 THEN NULL
                     ELSE num2 * 1000000 // (2 * pos * neg) END AS BIGINT)
                  AS auc_ppm
         FROM agg""",

    // Item CF replayed: same capped incidence, same pair counts and
    // two-sqrt cosine, same neighbor ranks.
    "q305_item_cf" ->
      """WITH pos AS (SELECT DISTINCT o_custkey AS u, l_partkey AS i
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         kept AS (SELECT u, i FROM (SELECT u, i,
                    count(*) OVER (PARTITION BY u) AS n FROM pos) x
                  WHERE n <= 80),
         mg AS (SELECT i, CAST(count(*) AS BIGINT) AS m
                FROM kept GROUP BY 1),
         co AS (SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS c
                FROM kept a JOIN kept b ON a.u = b.u AND a.i < b.i
                GROUP BY 1, 2 HAVING count(*) >= 2),
         sc AS (SELECT ia, ib, c AS n_co,
                  CAST(round(CAST(c AS DOUBLE)
                    / (sqrt(CAST(x.m AS DOUBLE)) * sqrt(CAST(y.m AS DOUBLE)))
                    * 1000000, 0) AS BIGINT) AS cos_micro
                FROM co JOIN mg x ON co.ia = x.i JOIN mg y ON co.ib = y.i),
         bt AS (SELECT ia AS item, ib AS neighbor, n_co, cos_micro FROM sc
                UNION ALL SELECT ib, ia, n_co, cos_micro FROM sc)
         SELECT item, neighbor, n_co, cos_micro,
                CAST(rk AS BIGINT) AS nb_rank
         FROM (SELECT *, row_number() OVER (PARTITION BY item
                 ORDER BY cos_micro DESC, neighbor) AS rk FROM bt) z
         WHERE rk <= 5""",

    // Turnover replayed: same weekly top-k sets, same Jaccard churn.
    "q304_chart_turnover" ->
      """WITH r AS (SELECT graft_w, graft_e FROM (
             SELECT epoch_us(ts) // 604800000000 AS graft_w,
                    user_id AS graft_e, count(*) AS c,
                    row_number() OVER (
                      PARTITION BY epoch_us(ts) // 604800000000
                      ORDER BY count(*) DESC, user_id) AS rk
             FROM events GROUP BY 1, 2) x WHERE rk <= 10),
         sz AS (SELECT graft_w, CAST(count(*) AS BIGINT) AS na
                FROM r GROUP BY 1),
         nz AS (SELECT graft_w - 1 AS graft_w,
                       CAST(count(*) AS BIGINT) AS nb
                FROM r GROUP BY 1),
         iv AS (SELECT a.graft_w, CAST(count(*) AS BIGINT) AS i
                FROM r a JOIN r b ON a.graft_w = b.graft_w - 1
                     AND a.graft_e = b.graft_e
                GROUP BY 1)
         SELECT CAST(sz.graft_w AS BIGINT) AS week,
                CAST(coalesce(iv.i, 0) AS BIGINT) AS n_common,
                CAST(1000000 - coalesce(iv.i, 0) * 1000000
                  // (sz.na + nz.nb - coalesce(iv.i, 0)) AS BIGINT)
                  AS turnover_ppm
         FROM sz JOIN nz USING (graft_w)
              LEFT JOIN iv USING (graft_w)""",

    // Feature/label rows replayed: same strict-cutoff windows, same
    // integer features and future-window label.
    "q303_feature_labels" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events
           WHERE epoch_us(ts) < 1706745600000000 + 1209600000000)
         SELECT user_id,
                CAST(sum(CASE WHEN t < 1706745600000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
                CAST(count(DISTINCT CASE WHEN t < 1706745600000000
                  THEN t // 86400000000 END) AS BIGINT) AS active_days,
                CAST(coalesce(sum(CASE WHEN t < 1706745600000000
                  THEN v END), 0) AS BIGINT) AS cents,
                CAST((1706745600000000 - max(CASE WHEN t < 1706745600000000
                  THEN t END)) // 86400000000 AS BIGINT) AS recency_days,
                CAST(max(CASE WHEN t >= 1706745600000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS label
         FROM e GROUP BY 1
         HAVING sum(CASE WHEN t < 1706745600000000 THEN 1 ELSE 0 END) > 0""",

    // Leave-last-out replayed: same last-row holdout, same leak-free
    // popularity top-k, same floor HR/MRR.
    "q302_leave_last_out" ->
      """WITH m AS (SELECT o_custkey AS e, l_partkey AS i,
                  o_orderdate AS t,
                  CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         r AS (SELECT e, i, row_number() OVER (PARTITION BY e
                 ORDER BY t DESC, id DESC, i DESC) AS rn
               FROM m),
         tg AS (SELECT e, i AS tgt FROM r WHERE rn = 1),
         cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS c
                 FROM r WHERE rn > 1 GROUP BY 1),
         tk AS (SELECT tgt, row_number() OVER (ORDER BY c DESC, tgt)
                  AS rk
                FROM (SELECT i AS tgt, c FROM cnt
                      ORDER BY c DESC, i LIMIT 20) lim),
         j AS (SELECT tg.e, tk.rk FROM tg LEFT JOIN tk USING (tgt))
         SELECT CAST(count(*) AS BIGINT) AS n_entities,
                CAST(coalesce(sum(CASE WHEN rk IS NOT NULL
                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
                CAST(CASE WHEN count(*) = 0 THEN NULL
                     ELSE coalesce(sum(CASE WHEN rk IS NOT NULL
                       THEN 1 ELSE 0 END), 0) * 1000000 // count(*) END
                  AS BIGINT) AS hr_ppm,
                CAST(CASE WHEN count(*) = 0 THEN NULL
                     ELSE coalesce(sum(CASE WHEN rk IS NOT NULL
                       THEN 1000000 // rk ELSE 0 END), 0) // count(*) END
                  AS BIGINT) AS mrr_micro
         FROM j""",

    // TextRank replayed: same filtered-sequence windows, same unrolled
    // integer walk on word keys.
    "q301_textrank" -> q301OracleSql,

    // Bradley-Terry replayed: same tournament, three unrolled integer
    // MM steps, same max-norm.
    "q299_bradley_terry" -> q299OracleSql,

    // Near-dup SPLIT leakage replayed: the same portable pairs mapped
    // to the q162 hash-split rule on both ends.
    "q298_neardup_split_leakage" ->
      s"""WITH $PortablePairsSql,
         sp AS (SELECT doc_id,
                  CASE WHEN substring(md5(text), 1, 1) < 'd'
                       THEN 'train' ELSE 'test' END AS s
                FROM documents)
         SELECT least(s1.s, s2.s) AS split_a,
                greatest(s1.s, s2.s) AS split_b,
                CAST(count(*) AS BIGINT) AS n_neardup_pairs
         FROM pr JOIN sp s1 ON pr.id1 = s1.doc_id
                 JOIN sp s2 ON pr.id2 = s2.doc_id
         GROUP BY 1, 2""",

    // Spearman replayed: same doubled midranks, same double assembly.
    "q203_spearman" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nx,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cy
               FROM events GROUP BY 1),
         rx AS (SELECT nx, CAST(2 * COALESCE(sum(m) OVER (ORDER BY nx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + m + 1 AS HUGEINT) AS rxv
               FROM (SELECT nx, count(*) AS m FROM u GROUP BY 1)),
         ry AS (SELECT cy, CAST(2 * COALESCE(sum(m) OVER (ORDER BY cy
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + m + 1 AS HUGEINT) AS ryv
               FROM (SELECT cy, count(*) AS m FROM u GROUP BY 1)),
         j AS (SELECT rxv, ryv
               FROM u JOIN rx USING (nx) JOIN ry USING (cy)),
         s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(rxv) AS sx,
                      sum(ryv) AS sy, sum(rxv * rxv) AS sxx,
                      sum(ryv * ryv) AS syy, sum(rxv * ryv) AS sxy
               FROM j)
         SELECT CAST(n AS BIGINT) AS n_rows,
                CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
                     THEN NULL
                     ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                END AS rho
         FROM s""",

    // Session ordinals replayed on q38's islands.
    "q202_session_conversion" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                  event_type FROM events),
         g AS (SELECT user_id, ts_us, event_id, event_type,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, event_type,
                      sum(news) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         ses AS (SELECT user_id, sid,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS conv
               FROM s GROUP BY 1, 2),
         o AS (SELECT least(sid, 5) AS ordinal, conv FROM ses)
         SELECT CAST(ordinal AS BIGINT) AS ordinal,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(conv) AS BIGINT) AS n_converting,
                CAST(sum(conv) * 1000000 // count(*) AS BIGINT) AS conv_ppm
         FROM o GROUP BY 1""",

    // Basket pairs replayed: same distinct item sets, same total order.
    "q201_basket_pairs" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
               FROM lineitem),
         n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM it),
         f AS (SELECT i, CAST(count(*) AS BIGINT) AS fi FROM it GROUP BY 1),
         p AS (SELECT a.i AS item_a, c.i AS item_b,
                      CAST(count(*) AS BIGINT) AS support
               FROM it a JOIN it c ON a.b = c.b AND a.i < c.i
               GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT item_a, item_b, support,
                CAST(support * n.nb * 1000000 // (fa.fi * fb.fi) AS BIGINT)
                  AS lift_ppm
         FROM p JOIN f fa ON p.item_a = fa.i
                JOIN f fb ON p.item_b = fb.i, n
         ORDER BY support DESC, lift_ppm DESC, item_a, item_b LIMIT 20""",

    // Theil-Sen replayed: same pair set, same total order, same lower
    // median index.
    "q199_theil_sen" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
         p AS (SELECT a.s, (b.y - a.y) * 1000000 // (b.d - a.d) AS sl,
                      a.d AS d1, b.d AS d2
               FROM daily a JOIN daily b ON a.s = b.s AND a.d < b.d),
         r AS (SELECT s, sl, d1, d2,
                  row_number() OVER (PARTITION BY s
                    ORDER BY sl, d1, d2) AS rk,
                  count(*) OVER (PARTITION BY s) AS np
               FROM p)
         SELECT s AS event_type, CAST(np AS BIGINT) AS n_pairs,
                CAST(sl AS BIGINT) AS median_slope_ppm
         FROM r WHERE rk = (np + 1) // 2""",

    // KS replayed over the same centi-quantized cumulative table.
    "q198_ks_test" ->
      """WITH x AS (SELECT
                  substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS s,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events WHERE event_type = 'purchase'),
         per AS (SELECT v,
                  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
                  CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS HUGEINT) AS c2
               FROM x GROUP BY 1),
         cum AS (SELECT v,
                  sum(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
                  sum(c2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
               FROM per),
         t AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM cum),
         d AS (SELECT any_value(t.n1) AS n1, any_value(t.n2) AS n2,
                      max(abs(f1 * t.n2 - f2 * t.n1)) AS dmax
               FROM cum, t)
         SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
                CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                     ELSE dmax * 1000000 // (n1 * n2) END AS BIGINT)
                  AS ks_ppm
         FROM d""",

    // Chi-square replayed cell by cell (margin cross product covers
    // zero-observation combos identically).
    "q197_chi_square" ->
      """WITH e AS (SELECT event_type AS a, dayofweek(ts) AS b FROM events),
         cells AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS o
               FROM e GROUP BY 1, 2),
         rws AS (SELECT a, sum(o) AS rt FROM cells GROUP BY 1),
         cls AS (SELECT b, sum(o) AS ct FROM cells GROUP BY 1),
         t AS (SELECT sum(o) AS n,
                      CAST(count(DISTINCT a) AS HUGEINT) AS r,
                      CAST(count(DISTINCT b) AS HUGEINT) AS c
               FROM cells),
         terms AS (SELECT COALESCE(cells.o, 0) AS o0, rws.rt, cls.ct,
                          t.n, t.r, t.c
               FROM rws CROSS JOIN cls CROSS JOIN t
                    LEFT JOIN cells ON cells.a = rws.a AND cells.b = cls.b),
         s AS (SELECT any_value(n) AS n, any_value(r) AS r,
                      any_value(c) AS c,
                      sum((o0 * n - rt * ct) * (o0 * n - rt * ct) * 1000
                          // (rt * ct * n)) AS chi2m
               FROM terms)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(r AS BIGINT) AS n_levels_a,
                CAST(c AS BIGINT) AS n_levels_b,
                CAST(CASE WHEN r < 2 OR c < 2 THEN NULL ELSE chi2m END
                  AS BIGINT) AS chi2_milli,
                CAST(CASE WHEN r < 2 OR c < 2 THEN NULL
                     ELSE (r - 1) * (c - 1) END AS BIGINT) AS dof
         FROM s""",

    // Decomposition replayed: same quantization, same floor points.
    "q196_variance_decomposition" ->
      """WITH x AS (SELECT event_type AS g,
                  CAST(floor(value * 100 + 0.5) AS HUGEINT) AS x
               FROM events),
         gs AS (SELECT g, CAST(count(*) AS HUGEINT) AS ng, sum(x) AS sg
               FROM x GROUP BY 1),
         t AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
                      sum(x * x) AS sxx
               FROM x),
         b AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                      sum(sg * sg * t.n // ng) AS ssbs,
                      any_value(t.n) AS n, any_value(t.sx) AS sx,
                      any_value(t.sxx) AS sxx
               FROM gs, t)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_groups,
                CAST(CASE WHEN k < 2 OR n * sxx - sx * sx = 0 THEN NULL
                     ELSE (ssbs - sx * sx) * 1000000
                          // (n * sxx - sx * sx) END AS BIGINT) AS eta2_ppm,
                CAST(CASE WHEN k < 2 OR n <= k
                          OR (n * sxx - sx * sx) - (ssbs - sx * sx) = 0
                     THEN NULL
                     ELSE (ssbs - sx * sx) * (n - k) * 1000
                          // (((n * sxx - sx * sx) - (ssbs - sx * sx))
                             * (k - 1)) END AS BIGINT) AS f_milli
         FROM b""",

    "q195_filtered_ann" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                    WHERE vec_id = 0)
         SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings, q WHERE vec_id <> 0 AND label = 1
         ORDER BY cos DESC, vec_id LIMIT 10""",

    // The same per-fingerprint arithmetic, replayed over the mirrored
    // corpus.
    "q193_source_dup_matrix" ->
      """WITH m AS (SELECT source, text FROM documents
               UNION ALL
               SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0),
         fp AS (SELECT source AS s,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
               FROM m),
         c AS (SELECT f, s, CAST(count(*) AS BIGINT) AS n
               FROM fp GROUP BY 1, 2),
         p AS (SELECT a.s AS src_a, b.s AS src_b,
                 CASE WHEN a.s = b.s THEN a.n * (a.n - 1) // 2
                      ELSE a.n * b.n END AS pairs
               FROM c a JOIN c b ON a.f = b.f AND a.s <= b.s)
         SELECT src_a, src_b, CAST(sum(pairs) AS BIGINT) AS n_dup_pairs
         FROM p GROUP BY 1, 2 HAVING sum(pairs) > 0""",

    "q364_source_venn" ->
      """WITH m AS (SELECT source, text FROM documents
               UNION ALL
               SELECT 'mirror', text FROM documents WHERE doc_id % 7 = 0),
         fp AS (SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f,
                       source AS s
               FROM m),
         g AS (SELECT f, CAST(count(DISTINCT s) AS BIGINT) AS n_sources,
                      CAST(count(*) AS BIGINT) AS docs
               FROM fp GROUP BY 1)
         SELECT n_sources, CAST(count(*) AS BIGINT) AS n_fingerprints,
                CAST(sum(docs) AS BIGINT) AS n_docs
         FROM g GROUP BY 1""",

    "q365_entry_exit" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                           event_type
               FROM events),
         g AS (SELECT user_id, ts_us, event_id, event_type,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us, event_id, event_type,
                      sum(news) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         per AS (SELECT user_id, sid,
                        first(event_type ORDER BY ts_us, event_id) AS ft,
                        last(event_type ORDER BY ts_us, event_id) AS lt,
                        count(*) AS n
                 FROM s GROUP BY 1, 2),
         ent AS (SELECT ft AS event_type,
                        CAST(count(*) AS BIGINT) AS n_entries,
                        CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_bounces
                 FROM per GROUP BY 1),
         ex AS (SELECT lt AS event_type,
                       CAST(count(*) AS BIGINT) AS n_exits
                FROM per GROUP BY 1)
         SELECT coalesce(ent.event_type, ex.event_type) AS event_type,
                coalesce(n_entries, 0) AS n_entries,
                coalesce(n_exits, 0) AS n_exits,
                coalesce(n_bounces, 0) AS n_bounces,
                CAST(CASE WHEN coalesce(n_entries, 0) = 0 THEN 0
                     ELSE coalesce(n_bounces, 0) * 1000000 // n_entries END
                  AS BIGINT) AS bounce_ppm
         FROM ent FULL OUTER JOIN ex ON ent.event_type = ex.event_type""",

    "q191_fk_audit" ->
      """SELECT 'lineitem.orderkey' AS relation,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null_keys,
                CAST((SELECT count(*) FROM lineitem x
                      WHERE x.l_orderkey IS NOT NULL AND x.l_orderkey
                        NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
                  AS n_orphans
         FROM lineitem
         UNION ALL
         SELECT 'orders.custkey', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST((SELECT count(*) FROM orders x
                      WHERE x.o_custkey IS NOT NULL AND x.o_custkey
                        NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
         FROM orders
         UNION ALL
         SELECT 'customer.nationkey', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST((SELECT count(*) FROM customer x
                      WHERE x.c_nationkey IS NOT NULL AND x.c_nationkey
                        NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT)
         FROM customer""",

    // First-significant-digit shares: formatting-independent (the first
    // nonzero char of the plain decimal form is the same in any
    // shortest-round-trip renderer for this value range).
    "q192_benford" ->
      """WITH d AS (SELECT regexp_extract(CAST(o_totalprice AS VARCHAR),
                  '[1-9]', 0) AS digit
               FROM orders)
         SELECT digit, CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) * 1000000 // sum(count(*)) OVER ()
                  AS BIGINT) AS share_ppm
         FROM d WHERE digit <> '' GROUP BY 1""",

    // The oracle sees only base + the audited-clean batch.
    "q190_wap_cycle" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders WHERE o_orderkey % 3 IN (0, 1)
         GROUP BY 1""",

    // Lift replayed over the same distinct (doc, term) pairs.
    "q189_related_terms" ->
      """WITH p AS (SELECT DISTINCT doc_id, t.term
             FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                     '[a-z0-9]+')) AS term FROM documents) t),
         n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM p),
         d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p
               GROUP BY 1),
         sd AS (SELECT doc_id FROM p WHERE term = 'vector'),
         co AS (SELECT p.term, CAST(count(*) AS BIGINT) AS n_co
               FROM p JOIN sd USING (doc_id)
               WHERE p.term <> 'vector'
               GROUP BY 1 HAVING count(*) >= 3),
         ds AS (SELECT df AS dfs FROM d WHERE term = 'vector')
         SELECT co.term, co.n_co, d.df AS df_term,
                CAST(co.n_co * n.nd * 1000000 // (ds.dfs * d.df) AS BIGINT)
                  AS lift_ppm
         FROM co JOIN d USING (term), n, ds
         ORDER BY lift_ppm DESC, co.term LIMIT 20""",

    // Both legs' proven CTEs + the integer RRF fusion.
    "q188_hybrid_retrieval" ->
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
               FROM sc, st),
         tl AS (SELECT doc_id, sum(cm) AS score_micro
                FROM c GROUP BY 1 ORDER BY score_micro DESC, doc_id
                LIMIT 20),
         tr AS (SELECT doc_id, CAST(row_number() OVER
                  (ORDER BY score_micro DESC, doc_id) AS BIGINT)
                  AS text_rank
                FROM tl),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = 0),
         vl AS (SELECT vec_id,
                  round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                        / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                 CAST(embedding AS DOUBLE[])))
                           * sqrt(list_dot_product(qv, qv))), 6) AS cos
                FROM embeddings, q WHERE vec_id <> 0
                ORDER BY cos DESC, vec_id LIMIT 20),
         vr AS (SELECT vec_id AS doc_id,
                  CAST(row_number() OVER (ORDER BY cos DESC, vec_id)
                    AS BIGINT) AS vec_rank
                FROM vl),
         f AS (SELECT COALESCE(tr.doc_id, vr.doc_id) AS doc_id,
                 tr.text_rank, vr.vec_rank,
                 COALESCE(1000000 // (60 + tr.text_rank), 0)
                   + COALESCE(1000000 // (60 + vr.vec_rank), 0) AS rrf_ppm
               FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.doc_id)
         SELECT doc_id, text_rank, vec_rank, CAST(rrf_ppm AS BIGINT)
                  AS rrf_ppm
         FROM f ORDER BY rrf_ppm DESC, doc_id LIMIT 10""",

    // The incremental result must equal the one-shot full join.
    "q187_incremental_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",

    // Slope replayed with the same decimal sums and floor division.
    "q186_trend_slope" ->
      """WITH d AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS HUGEINT) AS y
               FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS m,
                      sum(CAST(day AS HUGEINT)) AS sx, sum(y) AS sy,
                      sum(CAST(day AS HUGEINT) * CAST(day AS HUGEINT)) AS sxx,
                      sum(CAST(day AS HUGEINT) * y) AS sxy
               FROM d GROUP BY 1)
         SELECT event_type, CAST(m AS BIGINT) AS n_days,
                CAST(CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                     ELSE (m * sxy - sx * sy) * 1000000
                          // (m * sxx - sx * sx) END AS BIGINT) AS slope_ppm
         FROM s""",

    // Confusion matrix replayed over the q17 guess CTE.
    "q183_lang_confusion" ->
      """WITH t AS (SELECT lang,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT lang,
                  len(regexp_extract_all(nt, '(^| )(the|and|of|is)( |$)')) AS en,
                  len(regexp_extract_all(nt, '(^| )(der|die|und|ist)( |$)')) AS de,
                  len(regexp_extract_all(nt, '(^| )(le|la|et|est)( |$)')) AS fr,
                  len(regexp_extract_all(nt, '(^| )(el|los|y|es)( |$)')) AS es
               FROM t),
         g AS (SELECT lang,
                  CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                       WHEN en = greatest(en, de, fr, es) THEN 'en'
                       WHEN de = greatest(en, de, fr, es) THEN 'de'
                       WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                       ELSE 'es' END AS guess
               FROM c),
         m AS (SELECT lang, guess, CAST(count(*) AS BIGINT) AS n
               FROM g GROUP BY 1, 2)
         SELECT lang, guess, n,
                CAST(n * 1000000 // sum(n) OVER (PARTITION BY lang)
                  AS BIGINT) AS recall_ppm
         FROM m""",

    // Weekday shares replayed: DuckDB dayofweek is 0=Sunday, Spark's is
    // 1=Sunday — the Spark side subtracts 1 to land on the same scale.
    "q184_seasonality" ->
      """WITH b AS (SELECT event_type, dayofweek(ts) AS dow,
                  CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2)
         SELECT event_type, CAST(dow AS INT) AS dow, n,
                CAST(n * 7 * 1000000 // sum(n) OVER (PARTITION BY event_type)
                  AS BIGINT) AS index_ppm
         FROM b""",

    // Linear credits replayed: same user-keyed range join, same floor
    // division, same age bucketing.
    "q182_linear_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                    event_type FROM events),
         c AS (SELECT user_id, ts_us AS cts, event_id AS cid FROM e
               WHERE event_type = 'purchase'),
         t AS (SELECT user_id, ts_us AS tts FROM e
               WHERE event_type = 'view'),
         p AS (SELECT c.user_id, c.cid, c.cts, t.tts
               FROM c JOIN t ON c.user_id = t.user_id
               WHERE t.tts < c.cts AND c.cts - t.tts <= 604800000000),
         n AS (SELECT *, count(*) OVER (PARTITION BY user_id, cid) AS nt
               FROM p)
         SELECT CAST((cts - tts) // 86400000000 AS BIGINT) AS age_days,
                CAST(count(*) AS BIGINT) AS n_touches,
                CAST(sum(1000000 // nt) AS BIGINT) AS credit_ppm_sum
         FROM n GROUP BY 1""",

    // Attribution replayed with the identical preceding-rows window.
    "q174_attribution" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                    event_type FROM events),
         t AS (SELECT *, max(CASE WHEN event_type = 'view' THEN ts_us END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch_ts
               FROM e),
         c AS (SELECT ts_us, touch_ts,
                 (touch_ts IS NOT NULL
                  AND ts_us - touch_ts <= 604800000000) AS attr
               FROM t WHERE event_type = 'purchase'),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_conversions,
                 CAST(sum(CASE WHEN attr THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_attributed,
                 CAST(sum(CASE WHEN attr THEN ts_us - touch_ts ELSE 0 END)
                   AS BIGINT) AS sum_gap
               FROM c)
         SELECT n_conversions, n_attributed,
                CAST(CASE WHEN n_conversions = 0 THEN NULL
                     ELSE n_attributed * 1000000 // n_conversions END
                  AS BIGINT) AS attr_ppm,
                CAST(CASE WHEN n_attributed = 0 THEN NULL
                     ELSE sum_gap // n_attributed END AS BIGINT) AS avg_gap_us
         FROM a""",

    "q175_consistent_sample" ->
      """SELECT doc_id, md5(text) AS content_h, source FROM documents
         ORDER BY md5(text), doc_id LIMIT 100""",

    // RFM replayed: same exact metrics, same tie-broken ntile order.
    "q176_rfm" ->
      """WITH pu AS (SELECT user_id AS u, max(epoch_us(ts)) AS last_ts,
                  CAST(count(*) AS BIGINT) AS freq,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
               FROM events GROUP BY 1),
         g AS (SELECT u, last_ts, freq, cents,
                 (1706745600000000 - last_ts) // 86400000000 AS rd
               FROM pu),
         t AS (SELECT *, ntile(5) OVER (ORDER BY last_ts DESC, u) AS r,
                 ntile(5) OVER (ORDER BY freq DESC, u) AS f,
                 ntile(5) OVER (ORDER BY cents DESC, u) AS m
               FROM g)
         SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
                CAST(m AS BIGINT) AS m,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(cents) AS BIGINT) AS sum_cents,
                CAST(min(rd) AS BIGINT) AS min_recency_days,
                CAST(max(rd) AS BIGINT) AS max_recency_days
         FROM t GROUP BY 1, 2, 3""",

    // Evolution replayed as a NULL-padded union of the two generations.
    "q173_warehouse_evolve" ->
      """WITH w AS (SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars
             FROM documents WHERE doc_id % 2 = 0
             UNION ALL
             SELECT doc_id, source, n_chars
             FROM documents WHERE doc_id % 2 = 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars,
                CAST(count(n_chars) AS BIGINT) AS n_with_chars
         FROM w GROUP BY 1""",

    // UPDATE replayed as the equivalent CASE recompute.
    "q172_warehouse_update" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(CAST(floor((CASE WHEN p_partkey >= 500
                         AND p_partkey < 1500
                         THEN p_retailprice + 100.0
                         ELSE p_retailprice END) * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM part GROUP BY 1""",

    // MoR update replayed as the two stacked CASE recomputes — same
    // left-to-right double arithmetic as the engine's post-image chain.
    "q310_mor_update" ->
      """WITH u1 AS (SELECT p_partkey, p_brand,
                CASE WHEN p_partkey >= 500 AND p_partkey < 1500
                     THEN p_retailprice + 100.0
                     ELSE p_retailprice END AS price
         FROM part)
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(CAST(floor((CASE WHEN p_partkey < 800
                         THEN price + 10.0 ELSE price END) * 100)
                  AS BIGINT)) AS BIGINT) AS sum_cents
         FROM u1 GROUP BY 1""",

    "q362_version_diff" ->
      """WITH cls AS (
           SELECT CASE WHEN c_custkey < 50 THEN 'removed'
                       WHEN c_mktsegment = 'BUILDING' THEN 'changed'
                       ELSE 'unchanged' END AS change
           FROM customer
           UNION ALL
           SELECT 'added' FROM customer WHERE c_custkey % 10 = 0)
         SELECT change, CAST(count(*) AS BIGINT) AS n_rows
         FROM cls GROUP BY 1""",

    "q355_mor_reorg" ->
      """WITH fin AS (
           SELECT p_brand,
                  CASE WHEN p_size >= 25 THEN p_retailprice + 50.0
                       ELSE p_retailprice END AS price
           FROM part WHERE p_partkey >= 30)
         SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(CAST(floor(price * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM fin GROUP BY 1""",

    // MoR merge replayed by set algebra: unmatched table rows survive,
    // every update-batch row (replacement or brand-new key) lands once.
    "q311_mor_merge" ->
      """WITH upd AS (SELECT c_custkey, c_mktsegment,
                             c_acctbal + 1000.0 AS bal
               FROM customer WHERE c_custkey % 7 = 0
             UNION ALL
             SELECT c_custkey + 10000000, 'NEWSEG', c_acctbal + 1000.0
               FROM customer WHERE c_custkey % 7 = 0),
         fin AS (SELECT c_mktsegment AS seg, c_acctbal AS bal
                 FROM customer WHERE c_custkey % 7 <> 0
                 UNION ALL SELECT c_mktsegment, bal FROM upd)
         SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
                CAST(sum(CAST(floor(bal * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM fin GROUP BY 1""",

    // Falling factorials unrolled per k (never a product aggregate —
    // DuckDB's product() is a double); HUGEINT keeps them exact.
    "q407_pass_at_k" ->
      """WITH per AS (SELECT o_custkey AS task,
                CAST(count(*) AS HUGEINT) AS n,
                CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS c
             FROM orders GROUP BY 1),
         ks AS (SELECT task, n, c, k
                FROM per, (VALUES (1), (3), (5)) t(k) WHERE n >= k),
         ex AS (SELECT k,
                  CASE WHEN k = 1 THEN n - c
                       WHEN k = 3 THEN (n-c) * (n-c-1) * (n-c-2)
                       ELSE (n-c) * (n-c-1) * (n-c-2) * (n-c-3) * (n-c-4)
                  END AS num,
                  CASE WHEN k = 1 THEN n
                       WHEN k = 3 THEN n * (n-1) * (n-2)
                       ELSE n * (n-1) * (n-2) * (n-3) * (n-4)
                  END AS den
                FROM ks)
         SELECT CAST(k AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n_tasks,
                CAST(sum(1000000 - num * 1000000 // den) // count(*)
                  AS BIGINT) AS mean_pass_ppm
         FROM ex GROUP BY 1""",

    // The check digit recomputed from first principles: body digit at
    // 1-based index i sits at right-offset 17−i of the 16-digit PAN and
    // doubles when that offset is even (Luhn's alternation).
    "q408_luhn_scrub" ->
      """WITH b AS (SELECT doc_id, text,
                '4' || lpad(CAST(doc_id % 100000000000000 AS VARCHAR),
                            14, '0') AS body
             FROM documents),
         s AS (SELECT doc_id,
                 sum(CASE WHEN (17 - i) % 2 = 0
                       THEN CASE WHEN 2 * dg > 9 THEN 2 * dg - 9
                                 ELSE 2 * dg END
                       ELSE dg END) AS lsum
               FROM (SELECT doc_id,
                       CAST(t.i AS INTEGER) AS i,
                       CAST(substr(body, CAST(t.i AS INTEGER), 1)
                         AS INTEGER) AS dg
                     FROM b, (SELECT unnest(range(1, 16)) AS i) t)
               GROUP BY 1),
         n AS (SELECT b.doc_id, b.text, b.body,
                 (10 - s.lsum % 10) % 10 AS chk
               FROM b JOIN s ON b.doc_id = s.doc_id)
         SELECT doc_id,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                  AS BIGINT) AS n_masked,
                CASE WHEN doc_id % 2 = 0
                  THEN md5(text || ' card <CARD> ok')
                  ELSE md5(text || ' card ' || body
                    || CAST((chk + 1) % 10 AS VARCHAR) || ' ok')
                END AS scrub_md5
         FROM n""",

    "q409_url_filter" ->
      """SELECT doc_id,
                CASE doc_id % 5
                  WHEN 0 THEN 'ads.tracker.example'
                  WHEN 1 THEN 'good.example.org'
                  WHEN 2 THEN 'sub.spam.example'
                  WHEN 3 THEN 'good.example.org'
                  ELSE 'spam.example' END AS host,
                CASE doc_id % 5
                  WHEN 0 THEN '/x/' || doc_id
                  WHEN 1 THEN '/page/' || doc_id
                  WHEN 2 THEN '/y/' || doc_id
                  WHEN 3 THEN '/ads/banner'
                  ELSE '/z/' || doc_id END AS path,
                CASE doc_id % 5
                  WHEN 0 THEN 'banned_host'
                  WHEN 1 THEN 'admit'
                  WHEN 2 THEN 'banned_suffix'
                  WHEN 3 THEN 'banned_path'
                  ELSE 'banned_suffix' END AS verdict,
                CASE doc_id % 5
                  WHEN 0 THEN 'ads.tracker.example'
                  WHEN 1 THEN NULL
                  WHEN 2 THEN 'spam.example'
                  WHEN 3 THEN '/ads/'
                  ELSE 'spam.example' END AS rule
         FROM documents""",

    "q410_html_meta" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 4 = 1 THEN NULL
                  ELSE 'Doc ' || doc_id || ' title' END AS title,
                CASE WHEN doc_id % 4 = 2 THEN NULL
                  ELSE 'OG ' || doc_id END AS og_title,
                CASE WHEN doc_id % 4 = 3 THEN NULL
                  ELSE 'https://ex.org/c/' || doc_id END AS canonical,
                'en-US' AS html_lang
         FROM documents""",

    // Kept = the body line only (corpus text has no punctuation and is
    // ≥ 44 chars, so it always survives; the four planted chrome lines
    // each trip exactly one rule).
    "q411_line_filter" ->
      """SELECT doc_id, CAST(5 AS BIGINT) AS n_lines,
                CAST(1 AS BIGINT) AS n_kept,
                md5(text) AS clean_md5
         FROM documents""",

    "q412_truncation_loss" ->
      """WITH t AS (SELECT source,
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
             FROM documents),
         c AS (SELECT source,
                 CAST(length(replace(nt, ' ', ''))
                   - (length(nt) - length(replace(nt, 'th', ''))) // 2
                   - (length(nt) - length(replace(nt, 'an', ''))) // 2
                   - (length(nt) - length(replace(nt, 'ou', ''))) // 2
                   - (length(nt) - length(replace(nt, 'es', ''))) // 2
                   AS BIGINT) AS n FROM t),
         l AS (SELECT source, n, CAST(cl.len AS BIGINT) AS context_len
               FROM c, (VALUES (64), (128)) cl(len))
         SELECT source, context_len,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN n > context_len THEN 1 ELSE 0 END)
                  AS BIGINT) AS docs_over,
                CAST(sum(greatest(n - context_len, 0)) AS BIGINT)
                  AS tokens_lost
         FROM l GROUP BY 1, 2""",

    "q413_span_corruption" ->
      """WITH t AS (SELECT doc_id,
                string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                  'g'))), ' ') AS toks
             FROM documents),
         tok AS (SELECT doc_id, CAST(i AS INTEGER) AS i, toks[i] AS tok
                 FROM (SELECT doc_id, toks,
                         unnest(range(1, len(toks) + 1)) AS i
                       FROM t)),
         sel AS (SELECT doc_id, i, tok,
                   CAST(('0x' || substring(md5(doc_id || ':' || i), 1,
                     12)) AS BIGINT) % 20 < 3 AS s
                 FROM tok),
         st AS (SELECT doc_id, i, tok, s,
                  s AND NOT coalesce(lag(s) OVER
                    (PARTITION BY doc_id ORDER BY i), false) AS st
                FROM sel),
         k AS (SELECT doc_id, i, tok, s, st,
                 sum(CASE WHEN st THEN 1 ELSE 0 END) OVER
                   (PARTITION BY doc_id ORDER BY i) - 1 AS k
               FROM st),
         p AS (SELECT doc_id, i, s, st,
                 CASE WHEN NOT s THEN tok
                      WHEN st THEN '<extra_id_' || k || '>' END AS ip,
                 CASE WHEN st THEN '<extra_id_' || k || '> ' || tok
                      WHEN s THEN tok END AS tp
               FROM k)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_noise,
                CAST(sum(CASE WHEN st THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_spans,
                md5(coalesce(string_agg(ip, ' ' ORDER BY i), ''))
                  AS input_md5,
                md5(CASE WHEN string_agg(tp, ' ' ORDER BY i) IS NULL
                  THEN '<extra_id_'
                    || sum(CASE WHEN st THEN 1 ELSE 0 END) || '>'
                  ELSE string_agg(tp, ' ' ORDER BY i) || ' <extra_id_'
                    || sum(CASE WHEN st THEN 1 ELSE 0 END) || '>'
                END) AS target_md5
         FROM p GROUP BY 1""",

    "q414_fim_transform" ->
      """WITH t AS (SELECT doc_id,
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
             FROM documents),
         c AS (SELECT doc_id, nt, length(nt) AS l,
                 CAST(('0x' || substring(md5(doc_id || ':a'), 1, 12))
                   AS BIGINT) % length(nt) + 1 AS c1,
                 CAST(('0x' || substring(md5(doc_id || ':b'), 1, 12))
                   AS BIGINT) % length(nt) + 1 AS c2
               FROM t),
         s AS (SELECT doc_id, nt, l, least(c1, c2) AS lo,
                 greatest(c1, c2) AS hi
               FROM c)
         SELECT doc_id, CAST(lo - 1 AS BIGINT) AS len_prefix,
                CAST(hi - lo AS BIGINT) AS len_middle,
                CAST(l - hi + 1 AS BIGINT) AS len_suffix,
                md5('<PRE> ' || substr(nt, 1, CAST(lo - 1 AS INTEGER))
                  || ' <SUF> ' || substr(nt, CAST(hi AS INTEGER))
                  || ' <MID> ' || substr(nt, CAST(lo AS INTEGER),
                       CAST(hi - lo AS INTEGER))) AS psm_md5
         FROM s""",

    "q415_self_consistency" ->
      """WITH a AS (SELECT o_custkey AS task, o_orderkey % 5 AS ans,
                count(*) AS n
             FROM orders GROUP BY 1, 2),
         m AS (SELECT task, ans FROM (
                 SELECT task, ans, row_number() OVER (PARTITION BY task
                   ORDER BY n DESC, ans ASC) AS rn
                 FROM a)
               WHERE rn = 1)
         SELECT CAST(count(*) AS BIGINT) AS n_tasks,
                CAST(sum(CASE WHEN ans = task % 5 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct,
                CAST(sum(CASE WHEN ans = task % 5 THEN 1 ELSE 0 END)
                  * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
         FROM m""",

    "q416_reward_normalize" ->
      """WITH r AS (SELECT event_id, event_type,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS reward_centi
             FROM events
             WHERE value IS NOT NULL AND event_id % 23 = 0),
         m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(reward_centi) AS HUGEINT) AS s,
                 sum(CAST(reward_centi AS HUGEINT) * reward_centi) AS s2
               FROM r GROUP BY 1)
         SELECT event_id, r.event_type, reward_centi,
                CASE WHEN n * s2 - s * s <= 0 THEN NULL
                  ELSE round(CAST(n * reward_centi - s AS DOUBLE)
                    / sqrt(CAST(n * s2 - s * s AS DOUBLE)), 6)
                END AS advantage_z
         FROM r JOIN m ON r.event_type = m.event_type""",

    "q417_hierarchy" ->
      """WITH RECURSIVE n AS (SELECT doc_id AS id,
                CASE WHEN doc_id >= 10 THEN doc_id // 10 END AS parent
             FROM documents),
         walk AS (
           SELECT id, id AS root_id, CAST(0 AS BIGINT) AS depth,
                  CAST(id AS VARCHAR) AS path
           FROM n WHERE parent IS NULL
           UNION ALL
           SELECT n.id, w.root_id, w.depth + 1, w.path || '/' || n.id
           FROM n JOIN walk w ON n.parent = w.id)
         SELECT id AS doc_id, CAST(root_id AS BIGINT) AS root_id,
                depth, path
         FROM walk""",

    "q418_kneser_ney" ->
      """WITH t AS (SELECT string_split(
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
                  AS toks
             FROM documents),
         bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2,
                  CAST(count(*) AS HUGEINT) AS n
                FROM (SELECT toks,
                        unnest(range(1, greatest(len(toks), 1))) AS i
                      FROM t)
                WHERE length(toks[i]) > 0 AND length(toks[i + 1]) > 0
                GROUP BY 1, 2),
         lft AS (SELECT w1, sum(n) AS c1, CAST(count(*) AS HUGEINT)
                   AS n1l
                 FROM bi GROUP BY 1),
         rgt AS (SELECT w2, CAST(count(*) AS HUGEINT) AS n1r
                 FROM bi GROUP BY 1),
         ty AS (SELECT CAST(count(*) AS HUGEINT) AS tt FROM bi)
         SELECT bi.w1, bi.w2, CAST(bi.n AS BIGINT) AS n,
                CAST(((4 * bi.n - 3) * tt + 3 * n1l * n1r) * 1000000
                  // (4 * c1 * tt) AS BIGINT) AS pkn_ppm
         FROM bi JOIN lft ON bi.w1 = lft.w1
                 JOIN rgt ON bi.w2 = rgt.w2, ty
         ORDER BY n DESC, bi.w1 ASC, bi.w2 ASC LIMIT 30""",

    "q419_chat_sft" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                event_id AS i, event_type AS c
             FROM events),
         p AS (SELECT u, c,
                 row_number() OVER (PARTITION BY u ORDER BY t, i) AS pos
               FROM e),
         r AS (SELECT u, pos, c,
                 CASE WHEN pos % 2 = 1 THEN 'user'
                   ELSE 'assistant' END AS role
               FROM p)
         SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_turns,
                md5(string_agg('<|' || role || '|> ' || c, ' '
                  ORDER BY pos)) AS rendered_md5,
                CAST(sum(CASE WHEN role = 'assistant'
                  THEN len(regexp_split_to_array(trim(c), '\s+'))
                  ELSE 0 END) AS BIGINT) AS train_tokens,
                CAST(sum(len(regexp_split_to_array(trim(c), '\s+')))
                  AS BIGINT) AS total_tokens
         FROM r GROUP BY 1""",

    "q420_survivorship" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                event_id AS i, event_type AS c,
                CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)
                  AS cents
             FROM events),
         l AS (SELECT u, c AS last_type FROM (
                 SELECT u, c, row_number() OVER (PARTITION BY u
                   ORDER BY t DESC, i DESC) AS rn
                 FROM e)
               WHERE rn = 1),
         mc AS (SELECT u, c, count(*) AS n FROM e GROUP BY 1, 2),
         m AS (SELECT u, c AS modal_type FROM (
                 SELECT u, c, row_number() OVER (PARTITION BY u
                   ORDER BY n DESC, c ASC) AS rn
                 FROM mc)
               WHERE rn = 1),
         a AS (SELECT u, CAST(count(*) AS BIGINT) AS n_records,
                 CAST(max(cents) AS BIGINT) AS max_cents
               FROM e GROUP BY 1)
         SELECT a.u AS user_id, n_records, last_type, modal_type,
                max_cents
         FROM a JOIN l ON a.u = l.u JOIN m ON a.u = m.u""",

    "q421_lang_consistency" ->
      """WITH t AS (SELECT doc_id, source,
                string_split(lower(trim(regexp_replace(text, '\s+', ' ',
                  'g'))), ' ') AS toks
             FROM documents),
         h AS (SELECT doc_id, source,
                 array_to_string(toks[1 : len(toks) // 2], ' ') AS ha,
                 array_to_string(toks[len(toks) // 2 + 1 : len(toks)],
                   ' ') AS hb
               FROM t),
         g AS (SELECT doc_id, source,
                 CASE WHEN greatest(ena, dea, fra, esa) = 0 THEN 'und'
                      WHEN ena = greatest(ena, dea, fra, esa) THEN 'en'
                      WHEN dea = greatest(ena, dea, fra, esa) THEN 'de'
                      WHEN fra = greatest(ena, dea, fra, esa) THEN 'fr'
                      ELSE 'es' END AS la,
                 CASE WHEN greatest(enb, deb, frb, esb) = 0 THEN 'und'
                      WHEN enb = greatest(enb, deb, frb, esb) THEN 'en'
                      WHEN deb = greatest(enb, deb, frb, esb) THEN 'de'
                      WHEN frb = greatest(enb, deb, frb, esb) THEN 'fr'
                      ELSE 'es' END AS lb
               FROM (SELECT doc_id, source,
                 len(regexp_extract_all(ha, '(^| )(the|and|of|is)( |$)')) AS ena,
                 len(regexp_extract_all(ha, '(^| )(der|die|und|ist)( |$)')) AS dea,
                 len(regexp_extract_all(ha, '(^| )(le|la|et|est)( |$)')) AS fra,
                 len(regexp_extract_all(ha, '(^| )(el|los|y|es)( |$)')) AS esa,
                 len(regexp_extract_all(hb, '(^| )(the|and|of|is)( |$)')) AS enb,
                 len(regexp_extract_all(hb, '(^| )(der|die|und|ist)( |$)')) AS deb,
                 len(regexp_extract_all(hb, '(^| )(le|la|et|est)( |$)')) AS frb,
                 len(regexp_extract_all(hb, '(^| )(el|los|y|es)( |$)')) AS esb
               FROM h))
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN la <> lb AND la <> 'und'
                  AND lb <> 'und' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_mixed,
                CAST(sum(CASE WHEN la = 'und' OR lb = 'und'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_undetermined,
                CAST(sum(CASE WHEN la <> lb AND la <> 'und'
                  AND lb <> 'und' THEN 1 ELSE 0 END) * 1000000
                  // count(*) AS BIGINT) AS mixed_ppm
         FROM g GROUP BY 1""",

    "q422_capped_topk" ->
      """WITH sc AS (SELECT doc_id, source,
                greatest(least(CAST(floor(
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(
                        len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                          * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                      / greatest(length(text), 1), 4) * 10000 + 0.5)
                  AS BIGINT), 10000), 0) AS score_q
             FROM documents),
         r AS (SELECT doc_id, source, score_q,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY score_q DESC, doc_id ASC) AS BIGINT)
                   AS src_rank
               FROM sc)
         SELECT doc_id, source, score_q, src_rank
         FROM r WHERE src_rank <= 2
         ORDER BY score_q DESC, doc_id ASC LIMIT 20""",

    // Verdicts by construction: the planted rule set resolves each URL
    // class to a known longest match.
    "q423_robots_filter" ->
      """SELECT doc_id,
                CASE doc_id % 5
                  WHEN 0 THEN 'a.example' WHEN 1 THEN 'a.example'
                  WHEN 2 THEN 'a.example' WHEN 3 THEN 'b.example'
                  ELSE 'c.example' END AS host,
                doc_id % 5 <> 1 AS allowed,
                CASE doc_id % 5
                  WHEN 1 THEN 'disallow:/private/'
                  WHEN 2 THEN 'allow:/private/ok/'
                  ELSE NULL END AS matched_rule
         FROM documents""",

    "q424_grid_ffill" ->
      """WITH daily AS (SELECT event_type AS etype,
                epoch_us(ts) // 86400000000 AS day,
                CAST(count(*) AS BIGINT) AS n
             FROM events GROUP BY 1, 2),
         span AS (SELECT etype, min(day) AS d0, max(day) AS d1
                  FROM daily GROUP BY 1),
         grid AS (SELECT etype, CAST(unnest(range(d0, d1 + 1))
                    AS BIGINT) AS day
                  FROM span),
         j AS (SELECT grid.etype, grid.day, daily.n
               FROM grid LEFT JOIN daily
                 ON grid.etype = daily.etype AND grid.day = daily.day)
         SELECT etype, day,
                CAST(last_value(n IGNORE NULLS) OVER (PARTITION BY etype
                  ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
                  CURRENT ROW) AS BIGINT) AS value_ffill,
                n IS NOT NULL AS is_observed
         FROM j""",

    "q425_mix_shift" ->
      """WITH e AS (SELECT event_type AS segment,
                epoch_us(ts) // 86400000000 AS d,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             FROM events WHERE value IS NOT NULL),
         sp AS (SELECT (min(d) + max(d) + 1) // 2 AS ds FROM e),
         t AS (SELECT segment, v, d >= ds AS b FROM e, sp),
         per AS (SELECT segment,
                   sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS n_a,
                   sum(CASE WHEN b THEN 1 ELSE 0 END) AS n_b,
                   sum(CASE WHEN NOT b THEN v ELSE 0 END) AS va,
                   sum(CASE WHEN b THEN v ELSE 0 END) AS vb
                 FROM t GROUP BY 1),
         tot AS (SELECT sum(n_a) AS nta, sum(n_b) AS ntb FROM per),
         r AS (SELECT segment, n_a, n_b,
                 n_a * 1000000 // nta AS share_a_ppm,
                 n_b * 1000000 // ntb AS share_b_ppm,
                 CASE WHEN n_a = 0 THEN NULL ELSE va // n_a END
                   AS rate_a_centi,
                 CASE WHEN n_b = 0 THEN NULL ELSE vb // n_b END
                   AS rate_b_centi
               FROM per, tot)
         SELECT segment, CAST(n_a AS BIGINT) AS n_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(share_a_ppm AS BIGINT) AS share_a_ppm,
                CAST(share_b_ppm AS BIGINT) AS share_b_ppm,
                CAST(rate_a_centi AS BIGINT) AS rate_a_centi,
                CAST(rate_b_centi AS BIGINT) AS rate_b_centi,
                CAST((share_b_ppm - share_a_ppm) * rate_a_centi
                  // 1000000 AS BIGINT) AS mix_effect_centi,
                CAST(share_b_ppm * (rate_b_centi - rate_a_centi)
                  // 1000000 AS BIGINT) AS rate_effect_centi
         FROM r""",

    "q426_bandit_replay" ->
      """WITH p AS (SELECT user_id % 4 AS ctx, event_type AS act,
                CASE WHEN floor(value * 100 + 0.5) >= 500
                  THEN 1 ELSE 0 END AS r
             FROM events WHERE value IS NOT NULL),
         pol(policy, a0, a1, a2, a3) AS (VALUES
           ('always_view', 'view', 'view', 'view', 'view'),
           ('ctx_rotate', 'view', 'click', 'purchase', 'signup')),
         matched AS (SELECT pol.policy, p.r
                     FROM p JOIN pol ON p.act = CASE p.ctx
                       WHEN 0 THEN a0 WHEN 1 THEN a1
                       WHEN 2 THEN a2 ELSE a3 END),
         named AS (SELECT policy, CAST(count(*) AS BIGINT) AS n_matched,
                     CAST(CASE WHEN count(*) = 0 THEN NULL
                       ELSE sum(r) * 1000000 // count(*) END AS BIGINT)
                       AS reward_ppm
                   FROM matched GROUP BY 1
                   UNION ALL
                   SELECT 'logged', CAST(count(*) AS BIGINT),
                     CAST(sum(r) * 1000000 // count(*) AS BIGINT)
                   FROM p)
         SELECT policy, n_matched, reward_ppm FROM named""",

    // Per-URL revisit arithmetic by construction: doc_id gets
    // 1 + id%3 identical captures; the synth html wraps text in 33
    // chars of fixed markup.
    "q427_crawl_dedup" ->
      """SELECT source || '.example.org' AS host,
                CAST(sum(1 + doc_id % 3) AS BIGINT) AS n_captures,
                CAST(count(*) AS BIGINT) AS n_unique,
                CAST(sum(doc_id % 3) AS BIGINT) AS n_revisits,
                CAST(0 AS BIGINT) AS n_changed,
                CAST(sum((doc_id % 3) * (length(text) + 33)) AS BIGINT)
                  AS bytes_saved
         FROM documents GROUP BY 1""",

    "q428_anchor_text" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS link_idx,
                'https://ex.org/t/' || doc_id AS href,
                'target ' || doc_id AS anchor_text
         FROM documents
         UNION ALL
         SELECT doc_id, 2, '/rel/' || doc_id % 7, 'padded text'
         FROM documents
         UNION ALL
         SELECT doc_id, 3, 'https://ex.org/dup', 'dup'
         FROM documents WHERE doc_id % 2 = 0""",

    "q429_sitemap" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS entry_idx,
                'https://s.org/p/' || doc_id AS loc,
                '2024-0' || (doc_id % 9 + 1) || '-15' AS lastmod
         FROM documents
         UNION ALL
         SELECT doc_id, 2, 'https://s.org/q/' || doc_id % 50, NULL
         FROM documents""",

    "q430_outlink_profile" ->
      """SELECT doc_id,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END
                  AS BIGINT) AS n_links,
                CAST(1 AS BIGINT) AS n_internal,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
                  AS BIGINT) AS n_external,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
                  AS BIGINT) AS n_ext_hosts
         FROM documents""",

    // De-chunked body == synth html byte-exactly; the % 11 terminator
    // tear nulls every parsed field (whole-split degradation).
    "q431_http_chunked" ->
      """WITH h AS (SELECT doc_id,
                '<html><body><p>' || text || '</p></body></html>' AS html
             FROM documents)
         SELECT doc_id,
                CAST(1 + doc_id % 7 AS BIGINT) AS chunk_size,
                CASE WHEN doc_id % 11 = 5 THEN NULL
                     ELSE CAST(200 AS BIGINT) END AS status,
                CASE WHEN doc_id % 11 = 5 THEN NULL
                     ELSE 'text/html; charset=utf-8' END AS mime,
                CASE WHEN doc_id % 11 = 5 THEN NULL
                     ELSE CAST(octet_length(encode(html)) AS BIGINT) END
                  AS body_len,
                CASE WHEN doc_id % 11 = 5 THEN NULL
                     ELSE md5(html) END AS body_md5
         FROM h""",

    // Each arm's canonical form replayed by the RFC 3986 rules:
    // lowercase scheme/host, default port + fragment stripped, %41→A,
    // %2f→%2F, %7E→~, trackers dropped, query sorted, bare path → "/".
    "q432_canonical_url" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 4 = 0 THEN
                  'HTTPS://WWW.Example' || (doc_id % 5) || '.COM:443/Path/'
                    || doc_id || '?utm_source=news&b=' || (doc_id % 7)
                    || '&a=%41%2f1#frag'
                WHEN doc_id % 4 = 1 THEN
                  'http://ex' || (doc_id % 5) || '.org:8080/p%7Euser/'
                    || doc_id || '?z=1&y=2&gclid=abc'
                WHEN doc_id % 4 = 2 THEN
                  'HTTP://Bare' || (doc_id % 5) || '.NET:80'
                ELSE 'not a url ' || doc_id END AS url,
                CASE WHEN doc_id % 4 = 0 THEN
                  'https://www.example' || (doc_id % 5) || '.com/Path/'
                    || doc_id || '?a=A%2F1&b=' || (doc_id % 7)
                WHEN doc_id % 4 = 1 THEN
                  'http://ex' || (doc_id % 5) || '.org:8080/p~user/'
                    || doc_id || '?y=2&z=1'
                WHEN doc_id % 4 = 2 THEN
                  'http://bare' || (doc_id % 5) || '.net/'
                ELSE 'not a url ' || doc_id END AS canonical_url
         FROM documents""",

    // The collapse replayed: noise variants map to the base canonical,
    // the genuine ?page=2 arm stays its own key.
    "q433_canonical_dedup" ->
      """WITH v AS (
           SELECT doc_id,
                  'https://site.example/art/' || (doc_id % 97) AS c,
                  'https://site.example/art/' || (doc_id % 97) AS raw
           FROM documents
           UNION ALL
           SELECT doc_id,
                  'https://site.example/art/' || (doc_id % 97),
                  'HTTPS://Site.Example:443/art/' || (doc_id % 97)
                    || '?utm_campaign=x#top'
           FROM documents
           UNION ALL
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0
                    THEN 'https://site.example/art/' || (doc_id % 97)
                      || '?page=2'
                    ELSE 'https://site.example/art/' || (doc_id % 97) END,
                  CASE WHEN doc_id % 3 = 0
                    THEN 'https://site.example/art/' || (doc_id % 97)
                      || '?page=2&utm_source=y'
                    ELSE 'https://site.example/art/' || (doc_id % 97)
                      || '?utm_source=y&utm_medium=z' END
           FROM documents)
         SELECT c AS canonical_url,
                CAST(count(*) AS BIGINT) AS n_captures,
                CAST(count(DISTINCT raw) AS BIGINT) AS n_raw_forms,
                CAST(min(doc_id) AS BIGINT) AS first_doc
         FROM v GROUP BY 1""",

    // Each arm resolves one wildcard rule by construction; the oracle
    // replays the planted verdicts.
    "q434_robots_wildcards" ->
      """SELECT doc_id,
                CASE doc_id % 6
                  WHEN 0 THEN '/doc' || doc_id || '.pdf'
                  WHEN 1 THEN '/pub/x' || doc_id || '.pdf'
                  WHEN 2 THEN '/tmp/file' || doc_id
                  WHEN 3 THEN '/tmp/keep'
                  WHEN 4 THEN '/a' || doc_id || '/private/x'
                  ELSE '/clean/' || doc_id END AS path,
                CASE doc_id % 6
                  WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
                  WHEN 3 THEN true WHEN 4 THEN false ELSE true END
                  AS allowed,
                CASE doc_id % 6
                  WHEN 0 THEN 'disallow:/*.pdf$'
                  WHEN 1 THEN 'allow:/pub/*.pdf$'
                  WHEN 2 THEN 'disallow:/tmp*'
                  WHEN 3 THEN 'allow:/tmp/keep$'
                  WHEN 4 THEN 'disallow:/*/private/'
                  ELSE NULL END AS matched_rule
         FROM documents""",

    // Star-group crawl-delay (foreign-group delays invisible) +
    // file-global sitemap list, replayed per planted arm.
    "q435_robots_directives" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                  THEN CAST(1 + doc_id % 9 AS BIGINT) END
                  AS crawl_delay_sec,
                CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 1
                  ELSE 0 END AS BIGINT) AS n_sitemaps,
                CASE WHEN doc_id % 3 = 0
                    THEN 'https://h' || doc_id || '.ex/sm1.xml'
                  WHEN doc_id % 3 = 1
                    THEN 'https://h' || doc_id || '.ex/only.xml'
                  END AS first_sitemap
         FROM documents""",

    // Slot = per-host row_number, start = (slot-1)*delay; odd hosts
    // take the 1s default.
    "q436_politeness_schedule" ->
      """WITH s AS (SELECT doc_id, doc_id % 20 AS hn,
                row_number() OVER (PARTITION BY doc_id % 20
                  ORDER BY doc_id) AS rn
           FROM documents)
         SELECT doc_id, 'h' || hn AS host,
                CAST(CASE WHEN hn % 2 = 0 THEN hn % 5 + 1 ELSE 1 END
                  AS BIGINT) AS delay_sec,
                CAST(rn AS BIGINT) AS slot,
                CAST((rn - 1) * (CASE WHEN hn % 2 = 0 THEN hn % 5 + 1
                  ELSE 1 END) AS BIGINT) AS start_sec
         FROM s""",

    // Reversed-host sort key replayed per planted arm.
    "q437_surt_key" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 4 = 0 THEN
                  'HTTP://WWW.Example' || (doc_id % 5) || '.COM/A/B'
                    || doc_id || '?X=1#f'
                WHEN doc_id % 4 = 1 THEN
                  'https://U:p@S' || (doc_id % 5) || '.Ex.ORG:8080/P'
                    || doc_id
                WHEN doc_id % 4 = 2 THEN
                  'https://Host' || (doc_id % 5) || '.NET'
                ELSE 'no url ' || doc_id END AS url,
                CASE WHEN doc_id % 4 = 0 THEN
                  'com,example' || (doc_id % 5) || ',www)/a/b'
                    || doc_id || '?x=1'
                WHEN doc_id % 4 = 1 THEN
                  'org,ex,s' || (doc_id % 5) || ')/p' || doc_id
                WHEN doc_id % 4 = 2 THEN
                  'net,host' || (doc_id % 5) || ')/'
                ELSE NULL END AS surt_key
         FROM documents""",

    // Robots meta flags replayed per planted arm; default-open.
    "q438_meta_robots" ->
      """SELECT doc_id,
                CASE doc_id % 5
                  WHEN 1 THEN 'noindex'
                  WHEN 2 THEN 'NOINDEX, NOFOLLOW'
                  WHEN 3 THEN 'none'
                  WHEN 4 THEN 'nofollow, noarchive'
                  ELSE NULL END AS robots_content,
                doc_id % 5 IN (0, 4) AS indexable,
                doc_id % 5 IN (0, 1) AS followable
         FROM documents""",

    // Edge weights replayed from the planted links: every page links
    // ex.org once; even pages add other.net; relative links invisible.
    "q439_host_graph" ->
      """SELECT source || '.example.org' AS src_host,
                'ex.org' AS dst_host,
                CAST(count(*) AS BIGINT) AS n_links,
                CAST(count(*) AS BIGINT) AS n_pages
         FROM documents GROUP BY source
         UNION ALL
         SELECT source || '.example.org', 'other.net',
                CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT)
         FROM documents WHERE doc_id % 2 = 0 GROUP BY source""",

    // eTLD+1 per planted arm: co.uk beats uk; bare suffix / no match
    // NULL out.
    "q440_registered_domain" ->
      """SELECT doc_id,
                CASE doc_id % 5
                  WHEN 0 THEN 'X' || doc_id || '.Sub.Example.CO.UK'
                  WHEN 1 THEN 'www.test' || (doc_id % 7) || '.COM'
                  WHEN 2 THEN 'deep.a.b' || (doc_id % 7) || '.github.io'
                  WHEN 3 THEN 'localhost' || doc_id
                  ELSE 'com' END AS host,
                CASE doc_id % 5
                  WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com'
                  WHEN 2 THEN 'github.io' WHEN 3 THEN NULL
                  ELSE 'com' END AS public_suffix,
                CASE doc_id % 5
                  WHEN 0 THEN 'example.co.uk'
                  WHEN 1 THEN 'test' || (doc_id % 7) || '.com'
                  WHEN 2 THEN 'b' || (doc_id % 7) || '.github.io'
                  ELSE NULL END AS registered_domain
         FROM documents""",

    // Nearest capture to T = base+id+100000: the k=1 capture (+86400,
    // dist 13600) when it exists, else the single k=0 (dist 100000).
    "q441_wayback_lookup" ->
      """SELECT doc_id,
                CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END
                  AS BIGINT) AS cap_k,
                CAST(1600000000 + doc_id
                  + 86400 * (CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS capture_ts,
                CAST(CASE WHEN doc_id % 3 = 0 THEN 100000 ELSE 13600 END
                  AS BIGINT) AS dist_sec
         FROM documents""",

    // Word edits = planted sub+tail count (disjoint positions, novel
    // symbols); char edits re-derived by DuckDB's own levenshtein.
    "q442_wer_cer" ->
      """WITH h AS (SELECT doc_id,
                (CASE WHEN 0 < doc_id % 3 THEN 'x0_' ELSE 'w0_' END
                  || doc_id)
                || ' ' || (CASE WHEN 1 < doc_id % 3 THEN 'x1_'
                  ELSE 'w1_' END || doc_id)
                || ' w2_' || doc_id || ' w3_' || doc_id
                || (CASE WHEN doc_id % 4 = 3 THEN ''
                    ELSE ' w4_' || doc_id END)
                || (CASE WHEN doc_id % 4 IN (1, 3) THEN ''
                    ELSE ' w5_' || doc_id END)
                || (CASE WHEN doc_id % 4 = 2 THEN ' z_' || doc_id
                    ELSE '' END) AS hyp,
                'w0_' || doc_id || ' w1_' || doc_id || ' w2_' || doc_id
                || ' w3_' || doc_id || ' w4_' || doc_id || ' w5_'
                || doc_id AS ref,
                doc_id % 3 + (CASE doc_id % 4 WHEN 1 THEN 1
                  WHEN 2 THEN 1 WHEN 3 THEN 2 ELSE 0 END) AS ed
           FROM documents)
         SELECT doc_id,
                CAST(6 AS BIGINT) AS n_ref_tokens,
                CAST(6 - (CASE WHEN doc_id % 4 = 1 THEN 1
                    WHEN doc_id % 4 = 3 THEN 2 ELSE 0 END)
                  + (CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hyp_tokens,
                CAST(ed AS BIGINT) AS word_edits,
                CAST(ed * 1000000 // 6 AS BIGINT) AS wer_ppm,
                CAST(levenshtein(hyp, ref) AS BIGINT) AS char_edits,
                CAST(levenshtein(hyp, ref) * 1000000 // length(ref)
                  AS BIGINT) AS cer_ppm
         FROM h""",

    // Overlap k (unigrams) / k-1 (bigrams) by prefix construction;
    // novel tokens never collide.
    "q443_rouge_n" ->
      """WITH b AS (SELECT doc_id, 6 - doc_id % 4 AS k, doc_id % 3 AS a
           FROM documents)
         SELECT doc_id, CAST(1 AS BIGINT) AS n,
                CAST(6 AS BIGINT) AS ref_ngrams,
                CAST(k + a AS BIGINT) AS hyp_ngrams,
                CAST(k AS BIGINT) AS overlap,
                CAST(k * 1000000 // 6 AS BIGINT) AS recall_ppm,
                CAST(k * 1000000 // (k + a) AS BIGINT) AS precision_ppm,
                CAST(2 * k * 1000000 // (6 + k + a) AS BIGINT) AS f1_ppm
         FROM b
         UNION ALL
         SELECT doc_id, 2,
                5,
                CAST(k + a - 1 AS BIGINT),
                CAST(k - 1 AS BIGINT),
                CAST((k - 1) * 1000000 // 5 AS BIGINT),
                CAST((k - 1) * 1000000 // (k + a - 1) AS BIGINT),
                CAST(2 * (k - 1) * 1000000 // (5 + k + a - 1) AS BIGINT)
         FROM b""",

    // LCS = prefix length minus one when the adjacent swap is planted.
    "q444_rouge_l" ->
      """WITH b AS (SELECT doc_id, 6 - doc_id % 4 AS k,
                CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS sw
           FROM documents)
         SELECT doc_id,
                CAST(6 AS BIGINT) AS ref_tokens,
                CAST(k AS BIGINT) AS hyp_tokens,
                CAST(k - sw AS BIGINT) AS lcs,
                CAST((k - sw) * 1000000 // 6 AS BIGINT) AS recall_ppm,
                CAST((k - sw) * 1000000 // k AS BIGINT) AS precision_ppm,
                CAST(2 * (k - sw) * 1000000 // (6 + k) AS BIGINT)
                  AS f1_ppm
         FROM b""",

    // Fleiss replayed from the same votes CTE in HUGEINT rationals.
    "q445_fleiss_kappa" ->
      """WITH v AS (SELECT doc_id,
                CASE WHEN r < 3 THEN doc_id % 3
                  ELSE (doc_id % 3 + doc_id % 2) % 3 END AS cat
           FROM documents, (SELECT unnest([0, 1, 2, 3]) AS r)),
         cells AS (SELECT doc_id, cat, count(*) AS c FROM v GROUP BY 1, 2),
         per AS (SELECT doc_id, sum(c * c) AS ssq, sum(c) AS n
           FROM cells GROUP BY 1),
         it AS (SELECT CAST(count(*) AS HUGEINT) AS ni,
                CAST(max(n) AS HUGEINT) AS n,
                CAST(sum(ssq - n) AS HUGEINT) AS a FROM per),
         ct AS (SELECT CAST(sum(t * t) AS HUGEINT) AS b FROM
           (SELECT cat, sum(c) AS t FROM cells GROUP BY 1))
         SELECT CAST(ni AS BIGINT) AS n_items,
                CAST(n AS BIGINT) AS n_raters,
                CAST(a * 1000000 // (ni * n * (n - 1)) AS BIGINT)
                  AS pbar_ppm,
                CAST(b * 1000000 // (ni * n * ni * n) AS BIGINT)
                  AS pe_ppm,
                CAST((a * ni * n * ni * n - b * ni * n * (n - 1))
                  * 1000000 // (ni * n * (n - 1)
                    * (ni * n * ni * n - b)) AS BIGINT) AS kappa_ppm
         FROM it, ct""",

    // Alpha's Do/De with the T−1 expected-disagreement denominator.
    "q446_krippendorff" ->
      """WITH v AS (SELECT doc_id,
                CASE WHEN r < 3 THEN doc_id % 3
                  ELSE (doc_id % 3 + doc_id % 2) % 3 END AS cat
           FROM documents, (SELECT unnest([0, 1, 2, 3]) AS r)),
         cells AS (SELECT doc_id, cat, count(*) AS c FROM v GROUP BY 1, 2),
         per AS (SELECT doc_id, sum(c * c) AS ssq, sum(c) AS n
           FROM cells GROUP BY 1),
         it AS (SELECT CAST(count(*) AS HUGEINT) AS ni,
                CAST(max(n) AS HUGEINT) AS n,
                CAST(sum(ssq) AS HUGEINT) AS sq FROM per),
         ct AS (SELECT CAST(sum(t * t) AS HUGEINT) AS tsq FROM
           (SELECT cat, sum(c) AS t FROM cells GROUP BY 1))
         SELECT CAST(ni AS BIGINT) AS n_items,
                CAST(ni * n AS BIGINT) AS n_ratings,
                CAST((ni * n * n - sq) * 1000000
                  // (ni * n * (n - 1)) AS BIGINT) AS do_ppm,
                CAST((ni * n * ni * n - tsq) * 1000000
                  // (ni * n * (ni * n - 1)) AS BIGINT) AS de_ppm,
                CAST(((ni * n * (n - 1)) * (ni * n * ni * n - tsq)
                   - (ni * n * n - sq) * (ni * n * (ni * n - 1)))
                  * 1000000 // ((ni * n * (n - 1))
                   * (ni * n * ni * n - tsq)) AS BIGINT) AS alpha_ppm
         FROM it, ct""",

    // Tournament readout replayed: pair counts, both orientations,
    // Copeland sign sum.
    "q447_leaderboard" ->
      """WITH m AS (SELECT doc_id % 5 AS a,
                (doc_id % 5 + 1 + doc_id % 3) % 5 AS b,
                doc_id % 7 < 4 AS awin FROM documents),
         mm AS (SELECT 'm' || (CASE WHEN awin THEN a ELSE b END) AS w,
                'm' || (CASE WHEN awin THEN b ELSE a END) AS l FROM m),
         pc AS (SELECT w, l, count(*) AS c FROM mm GROUP BY 1, 2),
         sym AS (SELECT COALESCE(p.w, r.l) AS a, COALESCE(p.l, r.w) AS b,
                COALESCE(p.c, 0) AS wab, COALESCE(r.c, 0) AS wba
           FROM pc p FULL OUTER JOIN pc r ON p.w = r.l AND p.l = r.w)
         SELECT a AS model,
                CAST(sum(wab) AS BIGINT) AS n_wins,
                CAST(sum(wba) AS BIGINT) AS n_losses,
                CAST(sum(wab) * 1000000 // (sum(wab) + sum(wba))
                  AS BIGINT) AS win_rate_ppm,
                CAST(sum(CASE WHEN wab > wba THEN 1
                  WHEN wab < wba THEN -1 ELSE 0 END) AS BIGINT)
                  AS copeland
         FROM sym GROUP BY 1""",

    // Cross-multiplied threshold compares replayed over the same
    // (p, id)-ranked windows.
    "q448_multiple_testing" ->
      """WITH t AS (SELECT doc_id % 10 AS family, doc_id,
                (doc_id * 7919) % 997 * 1000 + doc_id % 1000 AS p_ppm
           FROM documents),
         r AS (SELECT family, doc_id, p_ppm,
                row_number() OVER (PARTITION BY family
                  ORDER BY p_ppm, doc_id) AS rnk,
                count(*) OVER (PARTITION BY family) AS m
           FROM t),
         f AS (SELECT *,
                min(CASE WHEN p_ppm * (m - rnk + 1) > 50000
                  THEN rnk END) OVER (PARTITION BY family) AS ff,
                max(CASE WHEN p_ppm * m <= rnk * 50000
                  THEN rnk END) OVER (PARTITION BY family) AS kmax
           FROM r)
         SELECT CAST(family AS BIGINT) AS family, doc_id,
                CAST(p_ppm AS BIGINT) AS p_ppm,
                CAST(rnk AS BIGINT) AS rank,
                CAST(m AS BIGINT) AS m,
                p_ppm * m <= 50000 AS bonferroni_rej,
                rnk < COALESCE(ff, m + 1) AS holm_rej,
                rnk <= COALESCE(kmax, 0) AS bh_rej
         FROM f""",

    // Synth round-trip: the tear keeps exactly the first block, the
    // unknown codec keeps zero records; sums/names replayed as list
    // arithmetic over the surviving record count.
    "q449_avro_walk" ->
      """WITH b AS (SELECT doc_id,
                CASE doc_id % 3 WHEN 0 THEN 'deflate' WHEN 1 THEN 'null'
                  ELSE 'snappy' END AS codec,
                CASE WHEN doc_id % 3 = 2 THEN 0
                  WHEN doc_id % 9 = 4 THEN 1 + doc_id % 4
                  ELSE 2 * (1 + doc_id % 4) END AS cnt
           FROM documents)
         SELECT doc_id, codec,
                true AS schema_ok,
                CAST(cnt AS BIGINT) AS n_records,
                doc_id % 3 = 2 OR doc_id % 9 = 4 AS truncated,
                CAST(COALESCE(list_sum(list_transform(range(cnt),
                  j -> (doc_id + j) % 1000)), 0) AS BIGINT) AS sum_score,
                CASE WHEN cnt = 0 THEN NULL
                  ELSE md5(array_to_string(list_transform(range(cnt),
                    j -> 'n' || doc_id || '_' || j), ',')) END
                  AS names_md5
         FROM b""",

    // Both degrade arms drop exactly the final record.
    "q450_tfrecord_walk" ->
      """WITH b AS (SELECT doc_id,
                CASE WHEN doc_id % 9 IN (4, 7) THEN doc_id % 5
                  ELSE 1 + doc_id % 5 END AS cnt,
                doc_id % 9 IN (4, 7) AS trunc
           FROM documents)
         SELECT doc_id,
                CAST(cnt AS BIGINT) AS n_records,
                trunc AS truncated,
                CAST(COALESCE(list_sum(list_transform(range(cnt),
                  j -> (doc_id + j) % 1000)), 0) AS BIGINT) AS sum_score,
                CASE WHEN cnt = 0 THEN NULL
                  ELSE md5(array_to_string(list_transform(range(cnt),
                    j -> 'n' || doc_id || '_' || j), ',')) END
                  AS names_md5
         FROM b""",

    // DuckDB's OWN nfc_normalize over the same planted raws — two
    // independent UAX #15 implementations must agree on every field.
    "q452_nfc_audit" ->
      """WITH r AS (SELECT doc_id,
                CASE WHEN doc_id % 4 = 0
                    THEN 'Cafe' || chr(769) || ' nr ' || doc_id
                  WHEN doc_id % 4 = 1
                    THEN 'caf' || chr(233) || ' ' || doc_id
                  WHEN doc_id % 4 = 2
                    THEN 'A' || chr(778) || 'ngstro' || chr(776)
                      || 'm ' || doc_id
                  ELSE 'plain ' || doc_id END AS raw
           FROM documents)
         SELECT doc_id,
                nfc_normalize(raw) != raw AS changed,
                CAST(length(raw) AS BIGINT) AS n_before,
                CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_after,
                md5(nfc_normalize(raw)) AS norm_md5
         FROM r""",

    // Planted-count replay: one confusable letter and one mixed token
    // per spoofed arm; digits are Common script, not Latin.
    "q453_mixed_script" ->
      """SELECT doc_id,
                CAST(CASE WHEN doc_id % 3 = 2 THEN 13 ELSE 12 END
                  AS BIGINT) AS n_latin,
                CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  AS BIGINT) AS n_cyrillic,
                CAST(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END
                  AS BIGINT) AS n_greek,
                CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END
                  AS BIGINT) AS n_mixed_tokens,
                doc_id % 3 != 2 AS suspicious
         FROM documents""",

    // Scrub replayed with the same control-char class; counts planted.
    "q454_bidi_scrub" ->
      ("""WITH r AS (SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                    THEN 'start ' || chr(8238) || 'evil' || chr(8236)
                      || ' end ' || doc_id
                  WHEN doc_id % 3 = 1
                    THEN 'a ' || chr(8294) || 'iso' || chr(8297)
                      || chr(8207) || ' b ' || doc_id
                  ELSE 'clean text ' || doc_id END AS raw
           FROM documents)
         SELECT doc_id,
                CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3
                  ELSE 0 END AS BIGINT) AS n_bidi,
                doc_id % 3 IN (0, 1) AS suspicious,
                md5(regexp_replace(raw,
                  '[""" + "\u202a-\u202e\u2066-\u2069" +
        "\u200e\u200f\u061c" + """]', '', 'g')) AS scrubbed_md5
         FROM r"""),

    // Field replay per arm; '-' user stays verbatim, '-' bytes and
    // referer NULL, malformed lines all-NULL.
    "q457_access_log" ->
      """SELECT doc_id,
                CASE doc_id % 3 WHEN 0 THEN '10.0.0.' || (doc_id % 9)
                  WHEN 1 THEN '172.16.0.' || (doc_id % 9) END AS ip,
                CASE doc_id % 3 WHEN 0 THEN 'alice'
                  WHEN 1 THEN '-' END AS user,
                CASE WHEN doc_id % 3 < 2 THEN 'ts' || doc_id END
                  AS ts_raw,
                CASE doc_id % 3 WHEN 0 THEN 'GET'
                  WHEN 1 THEN 'HEAD' END AS method,
                CASE doc_id % 3 WHEN 0 THEN '/p/' || doc_id
                  WHEN 1 THEN '/missing' END AS path,
                CASE doc_id % 3 WHEN 0 THEN CAST(200 AS BIGINT)
                  WHEN 1 THEN 404 END AS status,
                CASE WHEN doc_id % 3 = 0
                  THEN CAST(doc_id % 1000 AS BIGINT) END AS bytes,
                CASE WHEN doc_id % 3 = 0 THEN 'https://ref.ex/' END
                  AS referer,
                CASE doc_id % 3 WHEN 0 THEN 'Mozilla/5.0 Chrome/120.0'
                  WHEN 1 THEN 'curl/8.0' END AS user_agent
         FROM documents""",

    // ip32 arithmetic + containment replay; the /24 beats the /8.
    "q458_cidr_blocklist" ->
      """SELECT doc_id,
                CASE doc_id % 5
                  WHEN 0 THEN '10.1.' || (doc_id % 256) || '.'
                    || (doc_id % 250)
                  WHEN 1 THEN '10.2.3.' || (doc_id % 250)
                  WHEN 2 THEN '192.168.' || (doc_id % 256) || '.'
                    || (doc_id % 250)
                  WHEN 3 THEN '172.16.' || (doc_id % 256) || '.'
                    || (doc_id % 250)
                  ELSE '999.1.2.3' END AS ip,
                CASE doc_id % 5
                  WHEN 0 THEN CAST(10 * 16777216 + 1 * 65536
                    + (doc_id % 256) * 256 + doc_id % 250 AS BIGINT)
                  WHEN 1 THEN CAST(10 AS BIGINT) * 16777216 + 2 * 65536 + 3 * 256
                    + doc_id % 250
                  WHEN 2 THEN CAST(192 AS BIGINT) * 16777216 + 168 * 65536
                    + (doc_id % 256) * 256 + doc_id % 250
                  WHEN 3 THEN CAST(172 AS BIGINT) * 16777216 + 16 * 65536
                    + (doc_id % 256) * 256 + doc_id % 250
                  END AS ip32,
                doc_id % 5 IN (0, 1, 2) AS blocked,
                CASE doc_id % 5 WHEN 0 THEN '10.0.0.0/8'
                  WHEN 1 THEN '10.2.3.0/24'
                  WHEN 2 THEN '192.168.0.0/16' END AS matched_cidr
         FROM documents""",

    // Precedence replay: Edge beats Chrome beats Safari; bots NULL.
    "q459_bot_detect" ->
      """SELECT doc_id,
                doc_id % 6 IN (4, 5) AS is_bot,
                CASE doc_id % 6 WHEN 0 THEN 'Chrome'
                  WHEN 1 THEN 'Safari' WHEN 2 THEN 'Firefox'
                  WHEN 3 THEN 'Edge' END AS family
         FROM documents""",

    // The NIST soundex example codes; Robert/Rupert and Smith/Smyth
    // share blocks.
    "q460_soundex_blocking" ->
      """SELECT doc_id,
                CASE doc_id % 8 WHEN 0 THEN 'Robert' WHEN 1 THEN 'Rupert'
                  WHEN 2 THEN 'Tymczak' WHEN 3 THEN 'Honeyman'
                  WHEN 4 THEN 'Smith' WHEN 5 THEN 'Smyth'
                  WHEN 6 THEN 'Jackson' ELSE 'Washington' END AS name,
                CASE doc_id % 8 WHEN 0 THEN 'R163' WHEN 1 THEN 'R163'
                  WHEN 2 THEN 'T522' WHEN 3 THEN 'H555'
                  WHEN 4 THEN 'S530' WHEN 5 THEN 'S530'
                  WHEN 6 THEN 'J250' ELSE 'W252' END AS soundex_code,
                CAST(CASE WHEN doc_id % 8 IN (0, 1, 4, 5) THEN 2
                  ELSE 1 END AS BIGINT) AS n_names_in_block
         FROM documents""",

    // Decoded forms replayed as codepoint literals (chr(252) = u-uml);
    // the malformed arm keeps its verbatim lowercased label.
    "q462_idn_hosts" ->
      """SELECT doc_id,
                CASE doc_id % 4
                  WHEN 0 THEN 'XN--MNCHEN-3YA.s' || doc_id || '.example'
                  WHEN 1 THEN 'xn--bcher-kva.h' || doc_id || '.de'
                  WHEN 2 THEN 'WWW' || doc_id || '.Example.COM'
                  ELSE 'xn--!!!.b' || doc_id || '.x' END AS host,
                CASE doc_id % 4
                  WHEN 0 THEN 'm' || chr(252) || 'nchen.s' || doc_id
                    || '.example'
                  WHEN 1 THEN 'b' || chr(252) || 'cher.h' || doc_id
                    || '.de'
                  WHEN 2 THEN 'www' || doc_id || '.example.com'
                  ELSE 'xn--!!!.b' || doc_id || '.x' END AS unicode_host,
                doc_id % 4 != 3 AS is_decoded
         FROM documents""",

    // Same closed-form weekday arithmetic over DuckDB date math; the
    // Saturday holiday stays inert.
    "q461_business_days" ->
      """WITH b AS (SELECT doc_id,
                DATE '2026-01-05' + CAST(doc_id % 60 AS INT) AS s
           FROM documents),
         c AS (SELECT doc_id, s,
                s + CAST(doc_id % 90 AS INT) AS e FROM b),
         g AS (SELECT doc_id, s, e,
                (s - DATE '1970-01-05') AS ds,
                (e - DATE '1970-01-05') AS de FROM c)
         SELECT doc_id,
                CAST(s AS VARCHAR) AS start_day,
                CAST(e AS VARCHAR) AS end_day,
                CAST(greatest(
                  (5 * (de // 7) + least(de % 7, 5))
                  - (5 * (ds // 7) + least(ds % 7, 5))
                  - (SELECT count(*) FROM (VALUES
                       (DATE '2026-01-26'), (DATE '2026-02-16'),
                       (DATE '2026-03-02'), (DATE '2026-02-14'),
                       (DATE '2026-04-06')) AS h(hd)
                     WHERE (hd - DATE '1970-01-05') >= ds
                       AND (hd - DATE '1970-01-05') < de
                       AND (hd - DATE '1970-01-05') % 7 < 5),
                  0) AS BIGINT) AS n_business_days
         FROM g""",

    // Planted-count replay: he x2 + she x1 inside "hershey" pins the
    // overlap semantics, spamterm doubles on evens.
    "q456_blocklist_scan" ->
      """SELECT doc_id,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 6 ELSE 4 END
                  AS BIGINT) AS n_hits,
                CAST(CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END
                  AS BIGINT) AS n_patterns,
                CAST(1 AS BIGINT) AS n_planted
         FROM documents""",

    // Hamming re-derived per dimension (the packed-word path must land
    // on the same candidates), then the q23 cosine rerank form.
    "q455_binary_ann" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 3),
         h AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                list_sum(list_transform(range(64), i ->
                  CASE WHEN (embedding[i+1] > 0) <> (qv[i+1] > 0)
                    THEN 1 ELSE 0 END)) AS hamming
           FROM embeddings, q WHERE vec_id <> 3),
         c AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT 60)
         SELECT vec_id, CAST(hamming AS BIGINT) AS hamming,
                round(list_dot_product(v, qv)
                  / (sqrt(list_dot_product(v, v))
                     * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM c, q ORDER BY cos DESC, vec_id LIMIT 15""",

    // Each ring block is its own SCC (min id = block base); the cross
    // edges are one-directional and merge nothing; the chain nodes are
    // singleton SCCs.
    "q451_scc" ->
      """WITH n AS (SELECT DISTINCT doc_id % 60 AS v FROM documents)
         SELECT CAST(v AS BIGINT) AS node,
                CAST(v // 10 * 10 AS BIGINT) AS scc FROM n
         UNION ALL SELECT 100, 100
         UNION ALL SELECT 101, 101""",
  )
}
