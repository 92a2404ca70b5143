package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mechanical split of the `SparkEntry.oracleSql` registry (chunk 4 of
  * 6) — SQL verbatim from the original single map;
  * `SparkEntry` concatenates the chunks, so the contract is unchanged. */
private[graft] trait OracleRegistry4 { this: SparkEntry.type =>

  private[graft] def oracleChunk4: Map[String, String] = Map(

    // 80*65536/100 = 0xcccc, 90*65536/100 = 0xe666 — the same literal
    // bounds the Scala split compiles to.
    "q151_hash_split3" ->
      """SELECT source,
                CASE WHEN substring(md5(text), 1, 4) < 'cccc' THEN 'train'
                     WHEN substring(md5(text), 1, 4) < 'e666' THEN 'val'
                     ELSE 'test' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2""",

    // The quarantine readout is fully determined by the planted corruption
    // rule, so the oracle recomputes it from the source table directly.
    "q150_jsonl_quarantine" ->
      """SELECT CASE WHEN doc_id % 97 = 0 THEN '_corrupt' ELSE source END
                  AS source,
                CAST(count(*) AS BIGINT) AS n_lines,
                CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 0
                              ELSE length(text) END) AS BIGINT) AS clean_chars
         FROM documents GROUP BY 1""",

    "q149_etl_pipeline" ->
      """WITH mxs AS (SELECT max(ts) AS mt FROM events),
         hist AS (SELECT event_id, user_id, ts, value FROM events, mxs
                  WHERE ts <= mt - INTERVAL 7 DAY),
         batch AS (SELECT event_id, user_id, ts, value FROM events, mxs
                   WHERE ts > mt - INTERVAL 14 DAY),
         merged AS (SELECT * FROM hist UNION ALL SELECT * FROM batch),
         store AS (SELECT event_id, user_id, ts, value
                   FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                                      ORDER BY ts) AS rn
                         FROM merged) WHERE rn = 1),
         weekly AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
                           round(sum(value), 2) AS score
                    FROM store GROUP BY 1, 2),
         wk2 AS (SELECT *, CAST((wk - DATE '1970-01-05') / 7 AS BIGINT) AS weeknum
                 FROM weekly),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY wk
                      ORDER BY score DESC, user_id) AS rnk FROM wk2),
         charted AS (SELECT user_id, weeknum FROM ranked WHERE rnk <= 10),
         mx AS (SELECT max(weeknum) AS maxwk FROM wk2),
         islands AS (SELECT user_id, weeknum,
                            weeknum - row_number() OVER (PARTITION BY user_id
                                                         ORDER BY weeknum) AS grp
                     FROM charted),
         li AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS cnt,
                       max(weeknum) AS mxw
                FROM islands GROUP BY 1, 2),
         st AS (SELECT li.user_id, li.cnt FROM li, mx WHERE li.mxw = mx.maxwk)
         SELECT u.user_id, COALESCE(st.cnt, 0) AS weeks_on_chart
         FROM (SELECT DISTINCT user_id FROM weekly) u
         LEFT JOIN st ON u.user_id = st.user_id""",

    "q148_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, label, v,
                 (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bk
               FROM e),
         p AS (SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id,
                      round(list_dot_product(a.v, c.v)
                            / (sqrt(list_dot_product(a.v, a.v))
                               * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
               FROM b a JOIN b c ON a.bk = c.bk AND a.label <> c.label),
         r AS (SELECT anchor_id, neg_id, cos,
                      CAST(row_number() OVER (PARTITION BY anchor_id
                        ORDER BY cos DESC, neg_id ASC) AS INTEGER) AS rank
               FROM p)
         SELECT anchor_id, neg_id, cos, rank FROM r WHERE rank <= 2""",

    // q82's signature pipeline with the candidate join split store-side
    // (doc_id % 3 = 0) vs batch-side — the incremental probe replayed.
    "q147_incremental_minhash" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         mh AS (SELECT doc_id, s,
                       min(substr(md5((s // 4)::VARCHAR || ':' || g),
                                  CAST(1 + 8 * (s % 4) AS INTEGER), 8)) AS h
                FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS s) seeds
                GROUP BY doc_id, s),
         sig AS (SELECT doc_id, list(h ORDER BY s) AS sig FROM mh GROUP BY doc_id),
         band AS (SELECT doc_id, b, sig[2*b+1] || '|' || sig[2*b+2] AS bk
                  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) bands),
         cand AS (SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
                  FROM band a JOIN band c ON a.b = c.b AND a.bk = c.bk
                  WHERE a.doc_id % 3 = 0 AND c.doc_id % 3 <> 0),
         agr AS (SELECT cand.id1, cand.id2,
                        sum(CASE WHEN s1.sig[k+1] = s2.sig[k+1] THEN 1 ELSE 0 END) AS agree
                 FROM cand JOIN sig s1 ON cand.id1 = s1.doc_id
                           JOIN sig s2 ON cand.id2 = s2.doc_id
                      CROSS JOIN (SELECT unnest(range(0, 16)) AS k) ks
                 GROUP BY 1, 2)
         SELECT id1, id2, round(agree / 16.0, 4) AS est_jaccard
         FROM agr WHERE agree / 16.0 >= 0.5""",

    // q141's sign-cell + 6-dp cosine replay, split store (id%3=0) vs
    // batch (id%3<>0) like q147.
    "q154_incremental_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, v,
                 (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bk
               FROM e)
         SELECT a.vec_id AS id1, c.vec_id AS id2,
                round(list_dot_product(a.v, c.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
         FROM b a JOIN b c ON a.bk = c.bk
         WHERE a.vec_id % 3 = 0 AND c.vec_id % 3 <> 0
           AND round(list_dot_product(a.v, c.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.35""",

    // Mann-Whitney midrank AUC replayed literally: per-distinct-score
    // (p, n) counts, a cumulative negatives-below window over the
    // bounded per-score table, 2U kept integral, floor-ppm at the end.
    "q167_roc_auc" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         cum AS (SELECT s, p, n,
                   COALESCE(sum(n) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS nlt
                 FROM per),
         agg AS (SELECT sum(p * (2 * nlt + n)) AS num2,
                        sum(p) AS pos, sum(n) AS neg
                 FROM cum)
         SELECT CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
                CAST(CASE WHEN pos = 0 OR neg = 0 THEN NULL
                     ELSE num2 * 1000000 // (2 * pos * neg) END AS BIGINT)
                  AS auc_ppm,
                CAST(CASE WHEN pos = 0 OR neg = 0 THEN NULL
                     ELSE 2 * (num2 * 1000000 // (2 * pos * neg)) - 1000000
                     END AS BIGINT) AS gini_ppm
         FROM agg""",

    "q366_avg_precision" ->
      s"""WITH sc AS (SELECT greatest(least(CAST(floor(
                round(0.5 * least(length(text) / 500.0, 1.0)
                  + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+')) * 1.0
                          / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 1.0)
                  - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                    / greatest(length(text), 1), 4) * 10000 + 0.5) AS BIGINT),
                10000), 0) AS s,
              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         cum AS (SELECT s, p, n,
                   COALESCE(sum(p) OVER (ORDER BY s DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cp,
                   COALESCE(sum(p + n) OVER (ORDER BY s DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS cr
                 FROM per),
         terms AS (SELECT (cp + j) * 1000000000 // (cr + j) AS t_opt,
                          (cp + j) * 1000000000 // (cr + n + j) AS t_pess
                   FROM (SELECT n, cp, cr,
                           unnest(generate_series(1, CAST(p AS BIGINT))) AS j
                         FROM cum WHERE p > 0)),
         tot AS (SELECT COALESCE(sum(p), 0) AS pos,
                        COALESCE(sum(n), 0) AS neg FROM per),
         agg AS (SELECT COALESCE(sum(t_opt), 0) AS so,
                        COALESCE(sum(t_pess), 0) AS sp FROM terms)
         SELECT CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
                CAST(CASE WHEN pos = 0 THEN NULL
                     ELSE sp // (1000 * pos) END AS BIGINT) AS ap_pess_ppm,
                CAST(CASE WHEN pos = 0 THEN NULL
                     ELSE so // (1000 * pos) END AS BIGINT) AS ap_opt_ppm
         FROM agg CROSS JOIN tot""",

    // Reliability bins: equal-width on the 1e4 scale (top edge folded
    // into bin 9), exact mean score and positive rate in floor-ppm.
    "q168_calibration" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         b AS (SELECT least(s * 10 // 10000, 9) AS bin, p, n, s FROM per)
         SELECT CAST(bin AS BIGINT) AS bin,
                CAST(sum(p + n) AS BIGINT) AS n_docs,
                CAST(sum(s * (p + n)) * 1000000
                     // (sum(p + n) * 10000) AS BIGINT) AS mean_score_ppm,
                CAST(sum(p) * 1000000 // sum(p + n) AS BIGINT)
                  AS pos_rate_ppm
         FROM b GROUP BY 1""",

    // Confusion sweep: per-score counts joined to the 9-threshold list,
    // exact TP/FP/FN/TN, floor-ppm precision/recall, F1 from the ppm
    // pair with the same NULL guards as the Spark side.
    "q169_threshold_sweep" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         th AS (SELECT CAST(t AS BIGINT) AS t FROM (VALUES (1000), (2000),
                 (3000), (4000), (5000), (6000), (7000), (8000), (9000))
                 x(t)),
         cf AS (SELECT th.t,
                  sum(CASE WHEN per.s >= th.t THEN per.p ELSE 0 END) AS tp,
                  sum(CASE WHEN per.s >= th.t THEN per.n ELSE 0 END) AS fp,
                  sum(CASE WHEN per.s < th.t THEN per.p ELSE 0 END) AS fn,
                  sum(CASE WHEN per.s < th.t THEN per.n ELSE 0 END) AS tn
                FROM th CROSS JOIN per GROUP BY th.t),
         pr AS (SELECT t, tp, fp, fn, tn,
                  CASE WHEN tp + fp = 0 THEN NULL
                       ELSE tp * 1000000 // (tp + fp) END AS prec,
                  CASE WHEN tp + fn = 0 THEN NULL
                       ELSE tp * 1000000 // (tp + fn) END AS rec
                FROM cf)
         SELECT t AS threshold, CAST(tp AS BIGINT) AS tp,
                CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
                CAST(tn AS BIGINT) AS tn,
                CAST(prec AS BIGINT) AS precision_ppm,
                CAST(rec AS BIGINT) AS recall_ppm,
                CAST(CASE WHEN COALESCE(prec, 0) + COALESCE(rec, 0) = 0
                     THEN NULL
                     ELSE 2 * COALESCE(prec, 0) * COALESCE(rec, 0)
                          // (COALESCE(prec, 0) + COALESCE(rec, 0)) END
                  AS BIGINT) AS f1_ppm
         FROM pr""",

    // CUPED replayed step by step: centi-quantized purchase values split
    // at the Jan-16 midpoint, per-user (x, y) sums, pooled θ in floor
    // ppm from exact HUGEINT sums, per-arm adjusted means with the
    // divisions in the same fixed order as the Spark side.
    "q170_cuped" ->
      """WITH pu AS (SELECT user_id,
                  CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS x,
                  CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS HUGEINT) AS y,
                  CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS arm
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         th AS (SELECT CAST(count(*) AS HUGEINT) AS tn,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(x * y) AS sxy
                FROM pu),
         t2 AS (SELECT tn, sx,
                  CASE WHEN tn * sxx - sx * sx = 0 THEN NULL
                       ELSE (tn * sxy - sx * sy) * 1000000
                            // (tn * sxx - sx * sx) END AS theta_ppm
                FROM th),
         pa AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
                       sum(x) AS ax, sum(y) AS ay
                FROM pu GROUP BY 1),
         adj AS (SELECT arm, n, ay * 1000000 // n AS raw_ppm,
                   CASE WHEN t2.theta_ppm IS NULL THEN ay * 1000000 // n
                        ELSE (ay * 1000000 - t2.theta_ppm * ax) // n
                             + (t2.theta_ppm * t2.sx) // t2.tn END
                     AS adj_ppm,
                   t2.theta_ppm
                 FROM pa CROSS JOIN t2)
         SELECT CAST(a.n AS BIGINT) AS n_users_a,
                CAST(b.n AS BIGINT) AS n_users_b,
                CAST(a.theta_ppm AS BIGINT) AS theta_ppm,
                CAST(a.raw_ppm AS BIGINT) AS raw_ppm_a,
                CAST(b.raw_ppm AS BIGINT) AS raw_ppm_b,
                CAST(a.adj_ppm AS BIGINT) AS adj_ppm_a,
                CAST(b.adj_ppm AS BIGINT) AS adj_ppm_b,
                CAST(b.adj_ppm - a.adj_ppm AS BIGINT) AS adj_diff_ppm
         FROM (SELECT * FROM adj WHERE arm = 'A') a
              CROSS JOIN (SELECT * FROM adj WHERE arm = 'B') b""",

    // The oracle replays MERGE relationally: base rows whose key is NOT
    // in the update set, plus the update set itself — exact equality is
    // the upsert soundness claim (no lost carried rows, no surviving
    // stale versions, all inserts present).
    "q171_warehouse_merge" ->
      """WITH upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                    o_totalprice * 2 AS o_totalprice
             FROM orders WHERE o_orderkey % 10 = 0
             UNION ALL
             SELECT o_orderkey + 10000000, 'N', 50.25
             FROM orders WHERE o_orderkey % 97 = 0),
         m AS (SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
             FROM orders o
             WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
             UNION ALL SELECT * FROM upd)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM m GROUP BY 1""",

    // The resize replayed arithmetically: out pixel (7,5) maps to source
    // (7·srcW div 8, 5·srcH div 6); BGR from the synth formulas.
    "q179_image_resize" ->
      """WITH p AS (SELECT doc_id,
                  16 + (doc_id % 8) * 2 AS sw,
                  12 + (doc_id % 6) * 2 AS sh,
                  doc_id % 251 AS seed
             FROM documents),
         m AS (SELECT doc_id, seed,
                 (7 * sw) // 8 AS sx, (5 * sh) // 6 AS sy
               FROM p)
         SELECT doc_id AS media_id, CAST(8 AS INT) AS width,
                CAST(6 AS INT) AS height, CAST(198 AS BIGINT) AS size_bytes,
                CAST((7 * sx + 13 * sy + seed) % 256 AS INT) AS last_b,
                CAST((3 * sx + 5 * sy + 11 * seed) % 256 AS INT) AS last_g,
                CAST((sx + sy + seed) % 256 AS INT) AS last_r
         FROM m""",

    // Energy stats recomputed from the same integer waveform formula.
    "q180_audio_energy" ->
      """WITH d AS (SELECT doc_id, 100 + doc_id % 50 AS n FROM documents),
         s AS (SELECT doc_id, unnest(range(0, n)) AS k FROM d),
         v AS (SELECT doc_id,
                 ((31 * k + 7 + doc_id) % 65536) - 32768 AS x
               FROM s)
         SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_samples,
                CAST(max(abs(x)) AS BIGINT) AS peak_abs,
                CAST(sum(x * x) AS BIGINT) AS sum_sq
         FROM v GROUP BY 1""",

    // q140's CTE chain, counted per stage instead of collapsed.
    // Residuals vs the trailing same-dow floor mean, then the q86 MAD
    // rule (quantile_cont == Spark's exact interpolating percentile).
    "q230_seasonal_anomaly" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         w AS (SELECT s, d, y,
                 sum(y) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ssum,
                 count(*) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS scnt
               FROM daily),
         r AS (SELECT s, d, y, ssum // 3 AS fc, y - ssum // 3 AS resid
               FROM w WHERE scnt = 3),
         med AS (SELECT s, quantile_cont(resid, 0.5) AS m FROM r GROUP BY 1),
         mad AS (SELECT r.s, quantile_cont(abs(resid - m), 0.5) AS md
               FROM r JOIN med ON r.s = med.s GROUP BY 1)
         SELECT r.s AS event_type, r.d AS day, r.y AS n_events,
                CAST(fc AS BIGINT) AS expected,
                CAST(resid AS BIGINT) AS residual
         FROM r JOIN med ON r.s = med.s JOIN mad ON r.s = mad.s
         WHERE abs(resid - m) > 3.0 * md""",

    // Cohort week = first event week; cumulative centi-value per user.
    "q231_cohort_ltv" ->
      """WITH ev AS (SELECT user_id,
                  epoch_us(ts) // 604800000000 AS w,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             FROM events),
         fw AS (SELECT user_id, min(w) AS w0 FROM ev GROUP BY 1),
         cs AS (SELECT w0, CAST(count(*) AS BIGINT) AS users
               FROM fw GROUP BY 1),
         cells AS (SELECT fw.w0, ev.w - fw.w0 AS weeks_since,
                  CAST(sum(ev.c) AS BIGINT) AS cents
               FROM ev JOIN fw ON ev.user_id = fw.user_id
               GROUP BY 1, 2),
         g AS (SELECT w0, weeks_since, cents,
                  CAST(sum(cents) OVER (PARTITION BY w0 ORDER BY weeks_since
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
               FROM cells)
         SELECT g.w0 AS cohort_week, g.weeks_since, cs.users AS n_users,
                g.cents AS week_cents, g.cum AS cum_cents,
                CAST(g.cum // cs.users AS BIGINT) AS ltv_centi_per_user
         FROM g JOIN cs ON g.w0 = cs.w0""",

    // Integer S and V18; the z assembly replays the same IEEE op order.
    "q232_mann_kendall" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         p AS (SELECT a.s,
                  CAST(sum(CASE WHEN b.y > a.y THEN 1
                               WHEN b.y < a.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
               FROM daily a JOIN daily b
                 ON a.s = b.s AND a.d < b.d
               GROUP BY 1),
         n AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
         t AS (SELECT s, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
               FROM (SELECT s, y, CAST(count(*) AS BIGINT) AS t
                     FROM daily GROUP BY 1, 2) GROUP BY 1)
         SELECT p.s AS event_type, n.n AS n_days, p.s_stat,
                CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tt AS BIGINT)
                  AS var18,
                CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tt <= 0
                     THEN NULL
                     ELSE round(CAST(p.s_stat - sign(p.s_stat) AS DOUBLE)
                       * sqrt(18.0)
                       / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tt
                           AS DOUBLE)), 3)
                END AS z_corrected
         FROM p JOIN n ON p.s = n.s JOIN t ON p.s = t.s""",

    // The peel unrolled to the operator's maxRounds: rounds past
    // convergence are identity (monotone peel), so fixed-depth replay
    // equals the short-circuited run.
    "q229_kcore" -> {
      val rounds = 8
      // MATERIALIZED: each round references its predecessor three times,
      // so default CTE inlining would expand the chain exponentially
      // (3^8 base-table scans — DuckDB runs out of file handles).
      val peel = (1 to rounds).map { r =>
        s"""d$r AS MATERIALIZED (SELECT n, count(*) AS deg
               FROM (SELECT x AS n FROM e${r - 1}
                     UNION ALL SELECT y FROM e${r - 1}) GROUP BY 1),
         s$r AS MATERIALIZED (SELECT n FROM d$r WHERE deg >= 4),
         e$r AS MATERIALIZED (SELECT x, y FROM e${r - 1}
               WHERE x IN (SELECT n FROM s$r)
                 AND y IN (SELECT n FROM s$r))"""
      }.mkString(",\n         ")
      s"""WITH items AS MATERIALIZED (
               SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem WHERE l_partkey % 17 = 0),
         e0 AS MATERIALIZED (SELECT DISTINCT a.i AS x, b.i AS y
               FROM items a JOIN items b ON a.o = b.o AND a.i < b.i),
         $peel
         SELECT n AS node, CAST(count(*) AS BIGINT) AS core_degree
         FROM (SELECT x AS n FROM e$rounds UNION ALL SELECT y FROM e$rounds)
         GROUP BY 1"""
    },

    // The schedule is arithmetic on the decoded duration: frames
    // 0..min(⌊(dur−1)/step⌋, max−1), i.e. f·step < dur, f < max.
    "q228_frame_schedule" ->
      """WITH f AS (SELECT CAST(x AS BIGINT) AS frame_idx
               FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
         m AS (SELECT doc_id,
                  (600 + doc_id % 1000) * 1000 // 600 AS dur
               FROM documents)
         SELECT m.doc_id AS media_id, f.frame_idx,
                f.frame_idx * 400 AS ts_ms
         FROM m CROSS JOIN f WHERE f.frame_idx * 400 < m.dur""",

    // Same groups-atomic bucket rule over the shared scored substrate:
    // bucket = cumBefore·10 // total + 1 on the per-score table.
    "q226_gains" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                  CAST(count(*) AS HUGEINT) AS t
               FROM sc GROUP BY 1),
         c AS (SELECT s, p, t,
                  COALESCE(sum(t) OVER (ORDER BY s DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cb,
                  sum(t) OVER () AS total, sum(p) OVER () AS tp
               FROM per),
         b AS (SELECT cb * 10 // total + 1 AS bucket,
                  sum(t) AS bt, sum(p) AS bp,
                  max(total) AS total, max(tp) AS tp
               FROM c GROUP BY 1),
         g AS (SELECT bucket, bt, bp, total, tp,
                  sum(bt) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS ct,
                  sum(bp) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS cp
               FROM b)
         SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(bt AS BIGINT) AS n_rows, CAST(bp AS BIGINT) AS n_pos,
                CAST(ct AS BIGINT) AS cum_rows,
                CAST(cp AS BIGINT) AS cum_pos,
                CAST(CASE WHEN tp = 0 THEN NULL
                     ELSE cp * 1000000 // tp END AS BIGINT) AS gain_ppm,
                CAST(CASE WHEN tp = 0 OR ct = 0 THEN NULL
                     ELSE cp * total * 1000000 // (ct * tp) END AS BIGINT)
                  AS lift_ppm
         FROM g""",

    // The divergence both tables must show after clone + independent DML
    // + source vacuum, reconstructed relationally.
    "q225_clone" ->
      """SELECT 'source' AS side, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders WHERE NOT (o_totalprice < 50000)
         UNION ALL
         SELECT 'clone', CAST(count(*) AS BIGINT),
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT)
         FROM orders WHERE NOT (o_totalprice > 300000)""",

    // Integer deviation products (dev = n·y − Σy); the n² factors cancel
    // in the ratio, so acf needs ONE exact int/int double division.
    "q218_acf" ->
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
                  CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(a.dv * b.dv) AS BIGINT) AS nm
               FROM dev a CROSS JOIN (VALUES (1), (2), (3)) l(lag)
               JOIN dev b ON a.s = b.s AND b.d = a.d + l.lag
               GROUP BY 1, 2)
         SELECT num.s AS event_type, num.lag, den.n_days, num.n_pairs,
                CASE WHEN den.dn = 0 THEN NULL
                     ELSE round(CAST(nm AS DOUBLE) / CAST(dn AS DOUBLE), 6)
                END AS acf
         FROM num JOIN den ON num.s = den.s""",

    // Integer CUSUM of the ×n mean-centered counts; earliest argmax day.
    "q219_cusum" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         c AS (SELECT daily.s, daily.d, st.n, st.tot,
                 CAST(sum(st.n * daily.y - st.tot) OVER (PARTITION BY daily.s
                   ORDER BY daily.d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
               FROM daily JOIN st USING (s)),
         r AS (SELECT s, n, tot, d, abs(cs) AS sc,
                 row_number() OVER (PARTITION BY s
                   ORDER BY abs(cs) DESC, d ASC) AS rk
               FROM c)
         SELECT s AS event_type, n AS n_days, d AS changepoint_day,
                CAST(sc * 1000000 // (n * tot) AS BIGINT) AS cusum_ppm
         FROM r WHERE rk = 1""",

    // Pair statistics are enumeration-order-free: any once-per-unordered-
    // pair join (here by day; Spark by rank) yields the same counts.
    "q220_kendall" ->
      """WITH u AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS x,
                  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS y
             FROM events GROUP BY 1),
         p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
               FROM u a JOIN u b ON a.d < b.d),
         s AS (SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(CASE WHEN (x1 < x2 AND y1 < y2)
                               OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END)
                  AS BIGINT) AS concordant,
                CAST(sum(CASE WHEN (x1 < x2 AND y1 > y2)
                               OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END)
                  AS BIGINT) AS discordant,
                CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ty
               FROM p)
         SELECT n_rows, n_pairs, concordant, discordant,
                CASE WHEN n_pairs = tx OR n_pairs = ty THEN NULL
                     ELSE round(CAST(concordant - discordant AS DOUBLE)
                       / (sqrt(CAST(n_pairs - tx AS DOUBLE))
                          * sqrt(CAST(n_pairs - ty AS DOUBLE))), 6)
                END AS tau_b
         FROM s""",

    // Exact per-stratum quota: rank·100 ≤ n·80 (integer), md5(seed:id)
    // order; xor of member ids pins MEMBERSHIP, not just counts.
    "q221_stratified_split" ->
      """WITH a AS (SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))),
                      doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
             FROM documents)
         SELECT source,
                CASE WHEN rn * 100 <= n * 80 THEN 'train'
                     ELSE 'heldout' END AS split,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
         FROM a GROUP BY 1, 2""",

    // Levenshtein pairs on the distinct-name substrate, first-token
    // blocks, pair volume by count arithmetic.
    "q368_soft_dedup" ->
      """WITH m AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, 'mirror', text
               FROM documents WHERE doc_id % 7 = 0),
         f AS (SELECT source,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
               FROM m),
         c AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_copies
               FROM f GROUP BY 1),
         w AS (SELECT source, 1000000 // n_copies AS w
               FROM f JOIN c ON f.fp = c.fp)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(w) AS BIGINT) AS effective_micro,
                CAST(sum(w) // count(*) AS BIGINT) AS mean_weight_ppm
         FROM w GROUP BY 1""",

    "q369_entity_resolution" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
         p AS (SELECT a.p_name AS id1, b.p_name AS id2
               FROM n a JOIN n b
                 ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
                AND a.p_name < b.p_name
               WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
                     >= 0.88),
         e AS (SELECT id1 AS a, id2 AS b FROM p
               UNION SELECT id2, id1 FROM p),
         r(x, y) AS (SELECT a, b FROM e
                     UNION SELECT r.x, e.b FROM r JOIN e ON r.y = e.a)
         SELECT x AS name, least(x, min(y)) AS entity FROM r GROUP BY x""",

    // The planted-URL arithmetic: domain = name(id%5).tld(id%3), one
    // URL per doc plus a mirror URL on even ids; the ftp decoy and the
    // trailing punctuation exist only to exercise the Spark-side regex.
    "q370_url_domains" ->
      """WITH d AS (SELECT doc_id,
              CASE doc_id % 5 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                WHEN 2 THEN 'gamma' WHEN 3 THEN 'delta'
                ELSE 'epsilon' END || '.' ||
              CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                ELSE 'co.uk' END AS dom
             FROM documents),
         one AS (SELECT dom AS domain, count(*) AS n_urls,
                   count(DISTINCT doc_id) AS n_docs
                 FROM d GROUP BY 1
                 UNION ALL
                 SELECT 'example.net', count(*), count(*)
                 FROM documents WHERE doc_id % 2 = 0)
         SELECT domain, CAST(n_urls AS BIGINT) AS n_urls,
                CAST(n_docs AS BIGINT) AS n_docs
         FROM one""",

    // Exact centered power sums per event type, then the same ordered
    // double expressions (one sqrt, round 6) the operator documents.
    "q371_jarque_bera" ->
      """WITH daily AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY 1, 2),
         mu AS (SELECT event_type,
                  CAST(sum(cnt) AS HUGEINT) // count(*) AS mu
               FROM daily GROUP BY 1),
         c AS (SELECT daily.event_type,
                 CAST(cnt - mu AS HUGEINT) AS c
               FROM daily JOIN mu ON daily.event_type = mu.event_type),
         f AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 sum(c) AS s1, sum(c * c) AS s2,
                 sum(c * c * c) AS s3, sum(c * c * c * c) AS s4
               FROM c GROUP BY 1),
         mm AS (SELECT event_type, n,
                 n * s2 - s1 * s1 AS m2,
                 n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1 AS m3,
                 n * n * n * s4 - 4 * n * n * s3 * s1
                   + 6 * n * s2 * s1 * s1
                   - 3 * s1 * s1 * s1 * s1 AS m4
               FROM f),
         st AS (SELECT event_type, CAST(n AS BIGINT) AS n,
                 CASE WHEN n < 4 OR m2 <= 0 THEN NULL
                   ELSE round(CAST(m3 AS DOUBLE)
                     / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))), 6)
                   END AS skew,
                 CASE WHEN n < 4 OR m2 <= 0 THEN NULL
                   ELSE round(CAST(m4 AS DOUBLE)
                     / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3.0, 6)
                   END AS exkurt
               FROM mm)
         SELECT event_type, n, skew, exkurt,
                CASE WHEN skew IS NULL OR exkurt IS NULL THEN NULL
                  ELSE round(CAST(n AS DOUBLE) / 6.0
                    * (skew * skew + exkurt * exkurt / 4.0), 6)
                  END AS jb
         FROM st""",

    // Doubled midranks over the distinct-|d| table, 2W+ and the tie
    // term exact; z replays the operator's ordered double expression.
    "q372_wilcoxon_signed" ->
      """WITH pairs AS (SELECT o_custkey,
                  CAST(sum(CASE WHEN o_orderkey % 2 = 1
                       THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT)
                  - CAST(sum(CASE WHEN o_orderkey % 2 = 0
                       THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS d
               FROM orders GROUP BY 1),
         nz AS (SELECT d, abs(d) AS a FROM pairs WHERE d <> 0),
         g AS (SELECT a, CAST(count(*) AS HUGEINT) AS m,
                 CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS p
               FROM nz GROUP BY 1),
         r AS (SELECT a, m, p,
                 CAST(coalesce(sum(m) OVER (ORDER BY a
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS HUGEINT) AS below
               FROM g),
         f AS (SELECT CAST(coalesce(sum(m), 0) AS HUGEINT) AS n,
                 CAST(coalesce(sum((2 * below + m + 1) * p), 0) AS HUGEINT)
                   AS twp,
                 CAST(coalesce(sum(m * m * m - m), 0) AS HUGEINT) AS tie
               FROM r)
         SELECT CAST(n AS BIGINT) AS n_pairs,
                CAST(twp AS BIGINT) AS two_w_plus,
                CAST(tie AS BIGINT) AS tie_term,
                CASE WHEN n = 0 THEN NULL
                  WHEN CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                    * CAST(2 * n + 1 AS DOUBLE) / 24.0
                    - CAST(tie AS DOUBLE) / 48.0 <= 0.0 THEN NULL
                  ELSE round((CAST(twp AS DOUBLE) / 2.0
                    - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 4.0)
                   / sqrt(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                      * CAST(2 * n + 1 AS DOUBLE) / 24.0
                      - CAST(tie AS DOUBLE) / 48.0), 6) END AS z
         FROM f""",

    "q373_gzip_meta" ->
      """SELECT doc_id,
                CAST(1600000000 + doc_id AS BIGINT) AS mtime,
                CAST((100 + doc_id % 1000 + 255) // 256 AS BIGINT)
                  AS n_blocks,
                CAST(100 + doc_id % 1000 AS BIGINT) AS isize,
                true AS crc_ok
         FROM documents""",

    // Final table = snapshot ∪ protected stragglers (absent from the
    // snapshot AND matching the keepWhere guard).
    "q374_sync_merge" ->
      """WITH base AS (SELECT o_orderkey AS k,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders),
         final AS (
           SELECT k, CASE WHEN k % 5 = 0 THEN cents + 500 ELSE cents END
             AS cents
           FROM base WHERE k % 3 <> 0
           UNION ALL
           SELECT k + 2000000000 AS k, 99 AS cents FROM base
           WHERE k % 11 = 0
           UNION ALL
           SELECT k, cents FROM base WHERE k % 3 = 0 AND cents % 10 = 3)
         SELECT CAST(k % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM final GROUP BY 1""",

    // Unrolled 3-hop per-seed BFS with EXCEPT level separation; the
    // harmonic sum replays the integer 1000000 // d contributions.
    "q375_closeness" ->
      """WITH li AS (SELECT DISTINCT l_suppkey AS a,
                  l_partkey + 10000000 AS b FROM lineitem),
         ed AS (SELECT a AS src, b AS dst FROM li
                UNION SELECT b, a FROM li),
         s(seed) AS (SELECT CAST(x AS BIGINT)
                     FROM (VALUES (1), (2), (3)) t(x)),
         d0 AS (SELECT seed, seed AS node FROM s),
         n1 AS (SELECT DISTINCT d0.seed, ed.dst AS node
                FROM d0 JOIN ed ON ed.src = d0.node),
         d1 AS (SELECT * FROM n1 EXCEPT SELECT * FROM d0),
         n2 AS (SELECT DISTINCT d1.seed, ed.dst AS node
                FROM d1 JOIN ed ON ed.src = d1.node),
         d2 AS (SELECT * FROM n2 EXCEPT SELECT * FROM d0
                EXCEPT SELECT * FROM d1),
         n3 AS (SELECT DISTINCT d2.seed, ed.dst AS node
                FROM d2 JOIN ed ON ed.src = d2.node),
         d3 AS (SELECT * FROM n3 EXCEPT SELECT * FROM d0
                EXCEPT SELECT * FROM d1 EXCEPT SELECT * FROM d2),
         allv AS (SELECT seed, node, 1 AS hops FROM d1
                  UNION ALL SELECT seed, node, 2 FROM d2
                  UNION ALL SELECT seed, node, 3 FROM d3)
         SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
                CAST(sum(1000000 // hops) AS BIGINT) AS harmonic_micro
         FROM allv GROUP BY seed""",

    // The q198 substrate with the squared-gap integral instead of the
    // sup: num = Σ m·(f1·n2 − f2·n1)², den = N²·n1·n2, floor-ppm.
    "q376_cvm_test" ->
      """WITH x AS (SELECT
                  substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS s,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events WHERE event_type = 'purchase'),
         per AS (SELECT v,
                  CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
                  CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS HUGEINT) AS c2
               FROM x GROUP BY 1),
         cum AS (SELECT v, c1, c2,
                  sum(c1) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
                  sum(c2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
               FROM per),
         t AS (SELECT max(f1) AS n1, max(f2) AS n2 FROM cum),
         d AS (SELECT any_value(t.n1) AS n1, any_value(t.n2) AS n2,
                      sum((c1 + c2) * (f1 * t.n2 - f2 * t.n1)
                          * (f1 * t.n2 - f2 * t.n1)) AS num
               FROM cum, t)
         SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
                CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                     ELSE num * 1000000
                       // ((n1 + n2) * (n1 + n2) * n1 * n2) END
                  AS BIGINT) AS cvm_ppm
         FROM d""",

    // Doubled midranks per series, running rank sums over the day
    // order, U2_t = S2_t − t(n+1); the 5% flag replays the pinned
    // constant compare (no exp materializes on either engine).
    "q377_pettitt" ->
      """WITH daily AS (SELECT event_type AS et,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
         g AS (SELECT et, y, CAST(count(*) AS HUGEINT) AS m
               FROM daily GROUP BY 1, 2),
         rk AS (SELECT et, y,
                  2 * CAST(coalesce(sum(m) OVER (PARTITION BY et
                    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND
                    1 PRECEDING), 0) AS HUGEINT) + m + 1 AS r2
                FROM g),
         u AS (SELECT daily.et, daily.d,
                 CAST(row_number() OVER (PARTITION BY daily.et
                   ORDER BY daily.d) AS HUGEINT) AS t,
                 sum(rk.r2) OVER (PARTITION BY daily.et ORDER BY daily.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s2,
                 CAST(count(*) OVER (PARTITION BY daily.et) AS HUGEINT)
                   AS n
               FROM daily JOIN rk
                 ON daily.et = rk.et AND daily.y = rk.y),
         uu AS (SELECT et, d, n, s2 - t * (n + 1) AS u2
                FROM u WHERE t < n),
         best AS (SELECT et, max(abs(u2)) AS k2 FROM uu GROUP BY 1),
         pick AS (SELECT uu.et, max(uu.n) AS n, best.k2,
                    min(uu.d) AS change_day
                  FROM uu JOIN best
                    ON uu.et = best.et AND abs(uu.u2) = best.k2
                  GROUP BY uu.et, best.k2)
         SELECT et AS event_type, CAST(n AS BIGINT) AS n_days,
                CAST(k2 AS BIGINT) AS k_stat,
                CAST(change_day AS BIGINT) AS change_day,
                CASE WHEN CAST(6 * k2 * k2 AS DOUBLE)
                  >= 3.6888794541139363
                    * CAST(n * n * n + n * n AS DOUBLE)
                  THEN 1 ELSE 0 END AS significant_05
         FROM pick""",

    // Brute-force pair replay on the bounded distinct-point table,
    // recursive-CTE components for the core graph (q369's closure),
    // min-cluster border attach, noise = -1.
    "q378_dbscan" ->
      """WITH RECURSIVE e AS (SELECT
                  CAST(floor(embedding[1] * 20) + 20 AS BIGINT) AS x,
                  CAST(floor(embedding[2] * 20) + 20 AS BIGINT) AS y,
                  vec_id
               FROM embeddings),
         pl AS (SELECT x, y FROM e
                UNION ALL
                SELECT x + 18, y + 18 FROM e WHERE vec_id % 5 = 0),
         p AS (SELECT x, y, CAST(count(*) AS BIGINT) AS w,
                 x * 2147483648 + y AS pid
               FROM pl GROUP BY 1, 2),
         nb AS (SELECT a.pid AS pa, b.pid AS pb, b.w AS wb
                FROM p a JOIN p b
                  ON (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) <= 1),
         mass AS (SELECT pa AS pid, sum(wb) AS m FROM nb GROUP BY 1),
         core AS (SELECT pid FROM mass WHERE m >= 8),
         ce AS (SELECT nb.pa AS a, nb.pb AS b FROM nb
                JOIN core c1 ON nb.pa = c1.pid
                JOIN core c2 ON nb.pb = c2.pid
                WHERE nb.pa < nb.pb),
         sym AS (SELECT a, b FROM ce UNION SELECT b, a FROM ce),
         r(s, t) AS (SELECT a, b FROM sym
                     UNION SELECT r.s, sym.b
                     FROM r JOIN sym ON r.t = sym.a),
         comp AS (SELECT s AS pid, least(s, min(t)) AS cl
                  FROM r GROUP BY s),
         corelab AS (SELECT core.pid, coalesce(comp.cl, core.pid) AS cl
                     FROM core LEFT JOIN comp ON core.pid = comp.pid),
         borderlab AS (SELECT nb.pa AS pid, min(corelab.cl) AS cl
                       FROM nb JOIN corelab ON nb.pb = corelab.pid
                       WHERE nb.pa NOT IN (SELECT pid FROM core)
                       GROUP BY 1),
         asg AS (SELECT p.x, p.y, p.w,
                   CASE WHEN cl1.pid IS NOT NULL THEN 1 ELSE 0 END
                     AS is_core,
                   coalesce(cl1.cl, bl.cl, -1) AS cluster
                 FROM p
                 LEFT JOIN corelab cl1 ON p.pid = cl1.pid
                 LEFT JOIN borderlab bl ON p.pid = bl.pid)
         SELECT cluster, CAST(sum(w) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN is_core = 1 THEN w ELSE 0 END)
                  AS BIGINT) AS n_core_docs,
                CAST(count(*) AS BIGINT) AS n_points,
                CAST(min(x) AS BIGINT) AS min_x,
                CAST(max(x) AS BIGINT) AS max_x,
                CAST(min(y) AS BIGINT) AS min_y,
                CAST(max(y) AS BIGINT) AS max_y
         FROM asg GROUP BY 1""",

    "q379_svg_dims" ->
      """SELECT doc_id,
                CAST((doc_id % 300 + 1) * 2 AS BIGINT) AS width,
                CAST((doc_id % 150 + 1) * 3 AS BIGINT) AS height
         FROM documents""",

    "q380_pdf_meta" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS ver_major,
                CAST(4 + doc_id % 4 AS BIGINT) AS ver_minor,
                CAST(1 + doc_id % 9 AS BIGINT) AS n_pages,
                true AS xref_ok
         FROM documents""",

    // Latest 32 observed days per series, dyadic block signs, integer
    // coefficient energies per level.
    "q381_haar_energy" ->
      """WITH daily AS (SELECT event_type AS et,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
         w AS (SELECT et, d, y,
                 row_number() OVER (PARTITION BY et ORDER BY d DESC)
                   AS rn
               FROM daily),
         win0 AS (SELECT et, y, rn FROM w WHERE rn <= 16),
         nw AS (SELECT et, count(*) AS n FROM win0 GROUP BY 1),
         win AS (SELECT win0.et, win0.y, 16 - win0.rn AS idx
                 FROM win0 JOIN nw ON win0.et = nw.et WHERE nw.n = 16),
         lev AS (SELECT et, y, idx, CAST(l AS BIGINT) AS l
                 FROM win, (SELECT unnest(range(1, 5)) AS l) ls),
         co AS (SELECT et, l, idx // (1 << l) AS b,
                  CAST(sum(CASE WHEN (idx // (1 << (l - 1))) % 2 = 0
                    THEN y ELSE -y END) AS HUGEINT) AS c
                FROM lev GROUP BY 1, 2, 3)
         SELECT et AS event_type, CAST(l AS BIGINT) AS level,
                CAST(count(*) AS BIGINT) AS n_blocks,
                CAST(sum(c * c) AS BIGINT) AS energy
         FROM co GROUP BY 1, 2""",

    // Deterministic md5-sign ±1 projection replayed end-to-end:
    // fixed-point coordinates, integer distances, lower-median order
    // statistic under the (distortion, id, id) total order.
    "q382_jl_distortion" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id % 13 = 0),
         q AS (SELECT vec_id, i,
                 CAST(floor(embedding[i + 1] * 10000 + 0.5) AS BIGINT)
                   AS v
               FROM s, (SELECT unnest(range(0, 64)) AS i) t),
         sg AS (SELECT j, i,
                  CASE WHEN substr(md5(j || ':' || i), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS sgn
                FROM (SELECT unnest(range(0, 16)) AS j) a,
                     (SELECT unnest(range(0, 64)) AS i) b),
         pr AS (SELECT q.vec_id, sg.j,
                  CAST(sum(sg.sgn * q.v) AS HUGEINT) AS p
                FROM q JOIN sg ON q.i = sg.i GROUP BY 1, 2),
         dor AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                   CAST(sum((a.v - b.v) * (a.v - b.v)) AS HUGEINT)
                     AS d_orig
                 FROM q a JOIN q b
                   ON a.i = b.i AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
         dpr AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                   CAST(sum((a.p - b.p) * (a.p - b.p)) AS HUGEINT)
                     AS d_proj
                 FROM pr a JOIN pr b
                   ON a.j = b.j AND a.vec_id < b.vec_id
                 GROUP BY 1, 2),
         pp AS (SELECT dor.id1, dor.id2,
                  CAST(dpr.d_proj * 1000000 // (16 * dor.d_orig)
                    AS BIGINT) AS dist
                FROM dor JOIN dpr
                  ON dor.id1 = dpr.id1 AND dor.id2 = dpr.id2
                WHERE dor.d_orig > 0),
         r AS (SELECT dist,
                 row_number() OVER (ORDER BY dist, id1, id2) AS rn,
                 count(*) OVER () AS np
               FROM pp)
         SELECT CAST(max(np) AS BIGINT) AS n_pairs,
                CAST(min(dist) AS BIGINT) AS min_ppm,
                CAST(max(CASE WHEN rn = (np + 1) // 2 THEN dist END)
                  AS BIGINT) AS median_ppm,
                CAST(max(dist) AS BIGINT) AS max_ppm
         FROM r""",

    "q383_ico_meta" ->
      """SELECT doc_id, CAST(1 + doc_id % 4 AS BIGINT) AS n_images,
                CAST(doc_id % 200 + 1 + doc_id % 4 AS BIGINT)
                  AS max_width,
                CAST(doc_id % 100 + 1 + doc_id % 4 AS BIGINT)
                  AS max_height
         FROM documents""",

    // UPDATE then MERGE replayed arithmetically: matched k%9=0 rows
    // take source cents + 13 (overwriting the earlier +250 where both
    // hit), unmatched shifted keys insert at 77.
    "q384_sql_update" ->
      """WITH base AS (SELECT o_orderkey AS k,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders),
         au AS (SELECT k, CASE WHEN k % 7 = 2 THEN cents + 250
                  ELSE cents END AS cents
                FROM base),
         final AS (
           SELECT a.k, CASE WHEN a.k % 9 = 0 THEN b.cents + 13
             ELSE a.cents END AS cents
           FROM au a JOIN base b ON a.k = b.k
           UNION ALL
           SELECT k + 1000000000 AS k, 77 AS cents FROM base
           WHERE k % 11 = 0)
         SELECT CAST(k % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM final GROUP BY 1""",

    // One six-sum moment pass, the cleared 2x2 inverse, one integer
    // rational per point, deterministic top-k.
    "q385_mahalanobis" ->
      s"""WITH $IdScoredDocsSql,
         pts AS (SELECT doc_id, CAST(s // 100 AS HUGEINT) AS x,
                   CAST(n_chars AS HUGEINT) AS y
                 FROM sc),
         mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                   sum(y * y) AS syy, sum(x * y) AS sxy
                 FROM pts),
         ab AS (SELECT n, sx, sy, n * sxx - sx * sx AS a,
                  n * syy - sy * sy AS b, n * sxy - sx * sy AS c
                FROM mom),
         sc3 AS (SELECT pts.doc_id, pts.x, pts.y,
                   (n * pts.x - sx) AS u, (n * pts.y - sy) AS v,
                   a, b, c, a * b - c * c AS det
                 FROM pts CROSS JOIN ab)
         SELECT doc_id, CAST(x AS BIGINT) AS q,
                CAST(y AS BIGINT) AS n_chars,
                CAST((u * u * b - 2 * u * v * c + v * v * a) * 1000
                  // det AS BIGINT) AS d2_milli
         FROM sc3 WHERE det > 0
         ORDER BY d2_milli DESC, doc_id ASC LIMIT 20""",

    // The q314 weight recipe + per-replicate lower weighted medians +
    // exact order-statistic CI ranks.
    "q386_boot_median" ->
      """WITH base AS (SELECT event_type AS g,
                CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
                CAST(event_id AS VARCHAR) AS id
             FROM events
             WHERE value IS NOT NULL AND event_id IS NOT NULL),
         rawg AS (SELECT g, c, CAST(count(*) AS HUGEINT) AS w
                  FROM base GROUP BY 1, 2),
         rawm AS (SELECT g, min(c) AS med FROM (
                    SELECT g, c,
                      sum(w) OVER (PARTITION BY g ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      sum(w) OVER (PARTITION BY g) AS tot
                    FROM rawg)
                  WHERE tot > 0 AND cum * 2 >= tot GROUP BY g),
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
         pw AS (SELECT g, b, c, CAST(sum(m) AS HUGEINT) AS wm
                FROM wt GROUP BY 1, 2, 3 HAVING sum(m) > 0),
         repm AS (SELECT g, b, min(c) AS med FROM (
                    SELECT g, b, c,
                      sum(wm) OVER (PARTITION BY g, b ORDER BY c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS cum,
                      sum(wm) OVER (PARTITION BY g, b) AS tot
                    FROM pw)
                  WHERE tot > 0 AND cum * 2 >= tot GROUP BY g, b),
         ci AS (SELECT g, max(bl) AS bl,
                  max(CASE WHEN rn = bl * 25 // 1000 + 1 THEN med END)
                    AS cilo,
                  max(CASE WHEN rn = (bl * 975 + 999) // 1000 THEN med
                    END) AS cihi
                FROM (SELECT g, med,
                        row_number() OVER (PARTITION BY g
                          ORDER BY med, b) AS rn,
                        count(*) OVER (PARTITION BY g) AS bl
                      FROM repm)
                GROUP BY g),
         nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base
                GROUP BY 1)
         SELECT nn.g AS event_type, nn.n AS n_rows,
                CAST(rawm.med AS BIGINT) AS median_centi,
                CAST(ci.bl AS BIGINT) AS b_live,
                CAST(ci.cilo AS BIGINT) AS ci_lo_centi,
                CAST(ci.cihi AS BIGINT) AS ci_hi_centi
         FROM nn JOIN rawm ON nn.g = rawm.g JOIN ci ON nn.g = ci.g
         ORDER BY event_type""",

    // The q211 ranking CTEs with ranks kept; shared-literal depth
    // weights, entry depth = max rank, one floor per depth term.
    "q387_rbo" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                  CAST(embedding[1:16] AS DOUBLE[]) AS qp
               FROM embeddings WHERE vec_id IN (0, 7, 21, 42, 63)),
         fr AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id) AS rn
               FROM (SELECT q.qid, e.vec_id,
                       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(e.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                     FROM embeddings e, q WHERE e.vec_id <> q.qid)),
         pr AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                  ORDER BY cos DESC, vec_id) AS rn
               FROM (SELECT q.qid, e.vec_id,
                       round(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]), q.qp)
                         / (sqrt(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]),
                                                  CAST(e.embedding[1:16] AS DOUBLE[])))
                            * sqrt(list_dot_product(q.qp, q.qp))), 6) AS cos
                     FROM embeddings e, q WHERE e.vec_id <> q.qid)),
         j AS (SELECT f.qid, greatest(f.rn, p.rn) AS d0
               FROM fr f JOIN pr p
                 ON f.qid = p.qid AND f.vec_id = p.vec_id
               WHERE f.rn <= 10 AND p.rn <= 10),
         ov AS (SELECT qid, CAST(t.d AS BIGINT) AS d,
                  CAST(count(*) AS HUGEINT) AS ov
                FROM j, (SELECT unnest(range(1, 11)) AS d) t
                WHERE t.d >= j.d0 GROUP BY 1, 2),
         wts(d, w) AS (VALUES ${Similarity.rboWeightsNano(10, 900L)
             .zipWithIndex.map { case (wv, i) =>
               s"(${i + 1}, CAST($wv AS HUGEINT))" }.mkString(", ")}),
         agg AS (SELECT ov.qid,
                CAST(coalesce(max(CASE WHEN ov.d = 10 THEN ov.ov END), 0)
                  AS BIGINT) AS n_overlap,
                CAST(sum(wts.w * ov.ov // ov.d) // 1000 AS BIGINT)
                  AS rbo_micro
         FROM ov JOIN wts ON ov.d = wts.d
         GROUP BY 1),
         qids(qid) AS (VALUES (0), (7), (21), (42), (63))
         SELECT CAST(qids.qid AS BIGINT) AS query_id,
                coalesce(agg.n_overlap, 0) AS n_overlap,
                coalesce(agg.rbo_micro, 0) AS rbo_micro
         FROM qids LEFT JOIN agg ON agg.qid = qids.qid""",

    "q388_webm_meta" ->
      """SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN 'webm'
                  ELSE 'matroska' END AS doc_type,
                CAST(1000 + doc_id % 9000 AS BIGINT) AS duration_ms,
                CAST(1 AS BIGINT) AS n_video,
                CAST(doc_id % 3 AS BIGINT) AS n_audio,
                CAST((doc_id % 200 + 1) * 4 AS BIGINT) AS width,
                CAST((doc_id % 100 + 1) * 4 AS BIGINT) AS height
         FROM documents""",

    // Adjacent zip of the normalized token arrays; lift cleared to one
    // floor-ppm rational; deterministic (lift, pair) top-k.
    "q389_collocations" ->
      """WITH t AS (SELECT string_split(
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
                  AS toks
               FROM documents),
         uni AS (SELECT u.t AS w, CAST(count(*) AS HUGEINT) AS nu
                 FROM (SELECT unnest(toks) AS t FROM t) u
                 WHERE length(u.t) > 0 GROUP BY 1),
         tot AS (SELECT sum(nu) AS nn FROM uni),
         bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2,
                  CAST(count(*) AS HUGEINT) AS nab
                FROM (SELECT toks,
                        unnest(range(1, greatest(len(toks), 1))) AS i
                      FROM t)
                WHERE length(toks[i]) > 0 AND length(toks[i + 1]) > 0
                GROUP BY 1, 2),
         n2 AS (SELECT sum(nab) AS n2 FROM bi)
         SELECT w1 AS word_1, w2 AS word_2,
                CAST(nab AS BIGINT) AS n_pair,
                CAST(nab * nn * nn * 1000000 // (n2.n2 * a.nu * b.nu)
                  AS BIGINT) AS lift_ppm
         FROM bi JOIN uni a ON bi.w1 = a.w
                 JOIN uni b ON bi.w2 = b.w, tot, n2
         WHERE nab >= 5
         ORDER BY lift_ppm DESC, word_1 ASC, word_2 ASC LIMIT 25""",

    // Lower median of the non-null centi values per type, planted-null
    // counts, exact post-fill sum.
    "q390_impute" ->
      """WITH r AS (SELECT event_type AS g,
                  CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
                    END AS c
               FROM events),
         pv AS (SELECT g, c, CAST(count(*) AS HUGEINT) AS w
                FROM r WHERE c IS NOT NULL GROUP BY 1, 2),
         med AS (SELECT g, min(c) AS fill FROM (
                   SELECT g, c,
                     sum(w) OVER (PARTITION BY g ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     sum(w) OVER (PARTITION BY g) AS tot
                   FROM pv)
                 WHERE cum * 2 >= tot GROUP BY g),
         agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_null,
                   CAST(coalesce(sum(CAST(c AS HUGEINT)), 0) AS HUGEINT)
                     AS s
                 FROM r GROUP BY 1)
         SELECT agg.g AS event_type, n_rows, n_null,
                CAST(med.fill AS BIGINT) AS fill_centi,
                CAST(CASE WHEN med.fill IS NULL AND n_null > 0 THEN NULL
                  ELSE s + n_null * coalesce(med.fill, 0) END AS BIGINT)
                  AS sum_after_centi
         FROM agg LEFT JOIN med ON agg.g = med.g""",

    // Even-day-fit argmax predictor scored on odd-day pairs; NULL
    // prediction for eval-only from-types.
    "q391_next_event" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS i,
                  event_type AS ty
               FROM events),
         pr AS (SELECT u, ty,
                  lag(ty) OVER (PARTITION BY u ORDER BY t, i) AS prev,
                  lag(t) OVER (PARTITION BY u ORDER BY t, i) AS pts
                FROM e),
         pairs AS (SELECT prev AS f, ty AS tt,
                     pts // 86400000000 AS pday
                   FROM pr WHERE prev IS NOT NULL),
         train AS (SELECT f, tt, CAST(count(*) AS BIGINT) AS n
                   FROM pairs WHERE ((pday % 2) + 2) % 2 = 0 GROUP BY 1, 2),
         pred AS (SELECT f, max(nt) AS n_train, max(p) AS pred FROM (
                    SELECT f, tt AS p,
                      row_number() OVER (PARTITION BY f
                        ORDER BY n DESC, tt ASC) AS rn,
                      sum(n) OVER (PARTITION BY f) AS nt
                    FROM train)
                  WHERE rn = 1 GROUP BY f),
         ev AS (SELECT f, tt, CAST(count(*) AS BIGINT) AS ne
                FROM pairs WHERE ((pday % 2) + 2) % 2 = 1 GROUP BY 1, 2)
         SELECT ev.f AS from_type,
                CAST(coalesce(max(pred.n_train), 0) AS BIGINT) AS n_train,
                max(pred.pred) AS predicted_type,
                CAST(sum(ne) AS BIGINT) AS n_eval,
                CAST(coalesce(sum(CASE WHEN ev.tt = pred.pred THEN ne
                  END), 0) AS BIGINT) AS n_hits,
                CAST(CASE WHEN sum(ne) = 0 THEN NULL
                  ELSE coalesce(sum(CASE WHEN ev.tt = pred.pred THEN ne
                    END), 0) * 1000000 // sum(ne) END AS BIGINT)
                  AS hit_ppm
         FROM ev LEFT JOIN pred ON ev.f = pred.f
         GROUP BY 1""",

    // Three forward levels with exact path counts, two backward folds
    // with the per-edge floor, anti-joins per level, summed over seeds.
    "q392_betweenness" ->
      """WITH li AS (SELECT DISTINCT l_suppkey AS a,
                  l_partkey + 10000000 AS b FROM lineitem),
         ed AS (SELECT a AS src, b AS dst FROM li
                UNION SELECT b, a FROM li),
         s(seed) AS (SELECT CAST(x AS BIGINT)
                     FROM (VALUES (1), (2), (3)) t(x)),
         l0 AS (SELECT seed, seed AS node, CAST(1 AS HUGEINT) AS sigma
                FROM s),
         c1 AS (SELECT l0.seed, ed.dst AS node,
                  CAST(sum(l0.sigma) AS HUGEINT) AS sigma
                FROM l0 JOIN ed ON ed.src = l0.node GROUP BY 1, 2),
         l1 AS (SELECT c1.seed, c1.node, c1.sigma FROM c1
                ANTI JOIN l0 USING (seed, node)),
         c2 AS (SELECT l1.seed, ed.dst AS node,
                  CAST(sum(l1.sigma) AS HUGEINT) AS sigma
                FROM l1 JOIN ed ON ed.src = l1.node GROUP BY 1, 2),
         v1 AS (SELECT seed, node FROM l0
                UNION ALL SELECT seed, node FROM l1),
         l2 AS (SELECT c2.seed, c2.node, c2.sigma FROM c2
                ANTI JOIN v1 USING (seed, node)),
         c3 AS (SELECT l2.seed, ed.dst AS node,
                  CAST(sum(l2.sigma) AS HUGEINT) AS sigma
                FROM l2 JOIN ed ON ed.src = l2.node GROUP BY 1, 2),
         v2 AS (SELECT seed, node FROM v1
                UNION ALL SELECT seed, node FROM l2),
         l3 AS (SELECT c3.seed, c3.node, c3.sigma FROM c3
                ANTI JOIN v2 USING (seed, node)),
         d2r AS (SELECT l2.seed, l2.node,
                   CAST(sum(l2.sigma * 1000000 // l3.sigma) AS HUGEINT)
                     AS delta
                 FROM l2 JOIN ed ON ed.src = l2.node
                 JOIN l3 ON l3.seed = l2.seed AND l3.node = ed.dst
                 GROUP BY 1, 2),
         dd2 AS (SELECT l2.seed, l2.node, l2.sigma,
                   coalesce(d2r.delta, 0) AS delta
                 FROM l2 LEFT JOIN d2r
                   ON d2r.seed = l2.seed AND d2r.node = l2.node),
         d1r AS (SELECT l1.seed, l1.node,
                   CAST(sum(l1.sigma * (1000000 + dd2.delta)
                     // dd2.sigma) AS HUGEINT) AS delta
                 FROM l1 JOIN ed ON ed.src = l1.node
                 JOIN dd2 ON dd2.seed = l1.seed AND dd2.node = ed.dst
                 GROUP BY 1, 2),
         dd1 AS (SELECT l1.seed, l1.node, coalesce(d1r.delta, 0) AS delta
                 FROM l1 LEFT JOIN d1r
                   ON d1r.seed = l1.seed AND d1r.node = l1.node),
         contrib AS (SELECT seed, node, delta FROM dd2
                     UNION ALL SELECT seed, node, delta FROM dd1)
         SELECT node, CAST(sum(delta) AS BIGINT) AS bc_micro
         FROM contrib GROUP BY 1
         ORDER BY bc_micro DESC, node ASC LIMIT 20""",

    // The identical regex/replace chain, 'g'-flagged, entities decoded
    // in the same order with &amp; last.
    "q393_html_extract" ->
      """WITH h AS (SELECT doc_id,
                '<html><head><style>p{color:red}</style>'
                || '<script>var x=1;</script></head><body><h1>T&amp;'
                || doc_id || '</h1><p>' || text
                || '</p><a href="/x">link</a>'
                || CASE WHEN doc_id % 2 = 0
                     THEN '<img src="a.png"/>' ELSE '' END
                || '</body></html>' AS html
             FROM documents),
         ns AS (SELECT doc_id, html,
                  regexp_replace(regexp_replace(html,
                    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                    '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS ns
                FROM h),
         de AS (SELECT doc_id, html, ns,
                  trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(ns, '<[^>]+>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS clean
                FROM ns)
         SELECT doc_id, md5(clean) AS text_md5,
                CAST(len(regexp_extract_all(ns, '<a[\s>]')) AS BIGINT)
                  AS n_links,
                CAST(len(regexp_extract_all(ns, '<img[\s/>]')) AS BIGINT)
                  AS n_images,
                CAST(len(regexp_extract_all(ns, '<[^>]+>')) AS BIGINT)
                  AS n_tags,
                CAST(CASE WHEN length(html) = 0 THEN 0
                  ELSE (length(html) - length(clean)) * 1000000
                    // length(html) END AS BIGINT) AS markup_ppm
         FROM de""",
  )
}
