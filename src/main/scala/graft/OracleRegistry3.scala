package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mechanical split of the `SparkEntry.oracleSql` registry (chunk 3 of
  * 6) — SQL verbatim from the original single map;
  * `SparkEntry` concatenates the chunks, so the contract is unchanged. */
private[graft] trait OracleRegistry3 { this: SparkEntry.type =>

  private[graft] def oracleChunk3: Map[String, String] = Map(

    // The generation-diff legs restated as source predicates: gen 1
    // dropped the >450k tail (left_only), rewrote sub-50k statuses
    // (changed), and kept the middle band byte-identical (same).
    "q139_table_changes" ->
      """SELECT 'left_only' AS status, CAST(count(*) AS BIGINT) AS n,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders WHERE o_totalprice > 450000.0
         UNION ALL
         SELECT 'changed', CAST(count(*) AS BIGINT),
                min(o_orderkey), max(o_orderkey)
         FROM orders WHERE o_totalprice < 50000.0
         UNION ALL
         SELECT 'same', CAST(count(*) AS BIGINT),
                min(o_orderkey), max(o_orderkey)
         FROM orders
         WHERE o_totalprice >= 50000.0 AND o_totalprice <= 450000.0""",

    // Sign-bit cells over DOUBLE-cast embeddings; greedy lowest-id-wins
    // inside each cell at the same 6-dp-rounded cosine as q24.
    "q141_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, v,
                 (CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) ||
                 (CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END) AS bk
               FROM e),
         drp AS (SELECT DISTINCT c.bk, c.vec_id
                 FROM b a JOIN b c ON a.bk = c.bk AND a.vec_id < c.vec_id
                 WHERE round(list_dot_product(a.v, c.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.35)
         SELECT b.bk AS bucket, CAST(count(*) AS BIGINT) AS n_total,
                CAST(count(drp.vec_id) AS BIGINT) AS n_dropped,
                CAST(count(*) - count(drp.vec_id) AS BIGINT) AS n_kept
         FROM b LEFT JOIN drp ON b.bk = drp.bk AND b.vec_id = drp.vec_id
         GROUP BY b.bk""",

    // 8-token windows at stride 4 over the q82 tokenization; a window is
    // duplicated when its md5 occurs in more than one document.
    "q142_passage_dedup" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
         w AS (SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
               FROM (SELECT doc_id, toks,
                            unnest(range(1, len(toks) - 6, 4)) AS i
                     FROM f)),
         d AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                              FROM w GROUP BY h) WHERE nd > 1)
         SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                CAST(count(d.h) AS BIGINT) AS n_dup_windows,
                round(count(d.h) * 1.0 / count(*), 4) AS dup_frac
         FROM w LEFT JOIN d ON w.h = d.h
         GROUP BY w.doc_id""",

    "q143_k_anonymity" ->
      """SELECT c_nationkey AS nation, c_mktsegment AS segment,
                CAST(floor(c_acctbal / 2000) AS BIGINT) AS balance_band,
                CAST(count(*) AS BIGINT) AS n_rows
         FROM customer
         GROUP BY 1, 2, 3 HAVING count(*) < 3""",

    // Character-bigram model in integer ppm; doc score = floored mean of
    // its bigram-occurrence ppms; 20 least fluent, id tiebreak.
    "q144_fluency" ->
      """WITH c AS (SELECT doc_id,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         f AS (SELECT doc_id, nt FROM c WHERE length(nt) >= 2),
         o AS (SELECT doc_id, substr(nt, CAST(i AS INTEGER), 2) AS bg,
                      substr(nt, CAST(i AS INTEGER), 1) AS c1
               FROM (SELECT doc_id, nt, unnest(range(1, length(nt))) AS i
                     FROM f)),
         bc AS (SELECT bg, count(*) AS nbg FROM o GROUP BY 1),
         cc AS (SELECT c1, count(*) AS nc1 FROM o GROUP BY 1),
         m AS (SELECT bg, nbg * 1000000 // nc1 AS ppm
               FROM bc JOIN cc ON substr(bg, 1, 1) = cc.c1)
         SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(sum(m.ppm) // count(*) AS BIGINT) AS fluency_ppm
         FROM o JOIN m ON o.bg = m.bg
         GROUP BY o.doc_id
         ORDER BY fluency_ppm ASC, doc_id ASC LIMIT 20""",

    "q145_bpe_merges" -> q145OracleSql,
    "q146_bpe_encode" -> q146OracleSql,

    // Per-doc quality replayed exactly as q16's formula, quantized to
    // The paged-connector round-trip preserves every row and field, so
    // the oracle is the same rollup directly over the parquet.
    "q153_paged_source" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                CAST(max(doc_id) AS BIGINT) AS max_doc_id
         FROM documents GROUP BY 1, 2""",

    // Every decoded field is a pure function of doc_id (the query
    // synthesized the WAV container from exactly these formulas), so the
    // oracle recomputes them arithmetically: a hash match proves the RIFF
    // parse returned what the writer wrote. blockAlign = ch*bits/8
    // collapses to (1 + doc_id%2)^2; duration is floor'd integer ms.
    "q155_audio_meta" ->
      """SELECT doc_id AS media_id,
                CAST(44 + (200 + doc_id % 100)
                     * ((1 + doc_id % 2) * (1 + doc_id % 2)) AS BIGINT) AS size_bytes,
                CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
                CAST(1 + doc_id % 2 AS INT) AS channels,
                CAST(8 * (1 + doc_id % 2) AS INT) AS bits_per_sample,
                CAST(200 + doc_id % 100 AS BIGINT) AS n_samples,
                CAST((200 + doc_id % 100) * 1000
                     // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
         FROM documents""",

    // q155's contract for the video leg: every decoded field re-derived
    // from doc_id; duration floor'd at the synth timescale of 600.
    "q156_video_meta" ->
      """SELECT doc_id AS media_id,
                CAST(160 * (1 + doc_id % 8) AS INT) AS width,
                CAST(120 * (1 + doc_id % 6) AS INT) AS height,
                CAST((600 + doc_id % 1000) * 1000 // 600 AS BIGINT) AS duration_ms
         FROM documents""",

    // The warehouse round-trip preserves rows bit-exactly and skipping is
    // planning-only, so the oracle is the predicate on the parquet.
    "q158_warehouse_skip" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM orders
         WHERE o_orderkey >= 1000 AND o_orderkey < 3000
         GROUP BY 1""",

    // The warehouse answers this from sidecar metadata; the oracle runs
    // the honest full aggregate over the raw table — exact equality IS
    // the soundness claim (min/max compare single stored values, count
    // sums per-file longs: nothing accumulation-order-sensitive).
    "q159_metadata_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
                min(CAST(l_quantity AS DOUBLE)) AS min_qty,
                max(CAST(l_quantity AS DOUBLE)) AS max_qty,
                min(strftime(l_shipdate, '%Y-%m-%d')) AS min_ship,
                max(strftime(l_shipdate, '%Y-%m-%d')) AS max_ship
         FROM lineitem""",

    // Shard = count of 16-bit hex boundaries ≤ the md5(seed:id) prefix —
    // fixed-width lowercase hex compares replay the Spark assignment
    // verbatim (8 shards → boundaries at i*0x2000).
    "q160_epoch_shards" ->
      """WITH t AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tok,
                  substring(md5(concat('7:', CAST(doc_id AS VARCHAR))), 1, 4) AS h
           FROM documents),
         a AS (SELECT doc_id, tok,
                  CAST((CASE WHEN h >= '2000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= '4000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= '6000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= '8000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= 'a000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= 'c000' THEN 1 ELSE 0 END)
                     + (CASE WHEN h >= 'e000' THEN 1 ELSE 0 END) AS BIGINT)
                    AS shard
               FROM t)
         SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM a GROUP BY shard""",

    "q161_source_cap" ->
      """SELECT source, doc_id, rk FROM (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(concat('7:', CAST(doc_id AS VARCHAR))), doc_id)
                    AS rk
           FROM documents) WHERE rk <= 40""",

    // 48-bit md5 prefix parsed exactly via the 0x-literal cast; XOR is
    // order-independent, so the checksum replays under any row order.
    "q162_release_manifest" ->
      """WITH t AS (SELECT source,
                  CASE WHEN substring(md5(text), 1, 1) < 'd'
                       THEN 'train' ELSE 'test' END AS split,
                  CAST(('0x' || substring(md5(text), 1, 12)) AS BIGINT) AS h,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tok,
                  CAST(length(text) AS BIGINT) AS nc
           FROM documents)
         SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                CAST(sum(nc) AS BIGINT) AS n_chars,
                CAST(bit_xor(h) AS BIGINT) AS checksum48
         FROM t GROUP BY 1, 2""",

    // q155's contract for the FLAC leg: a lone-STREAMINFO container is
    // exactly 42 bytes; every other field is doc_id arithmetic.
    "q166_flac_meta" ->
      """SELECT doc_id AS media_id,
                CAST(42 AS BIGINT) AS size_bytes,
                CAST(8000 * (1 + doc_id % 4) AS INT) AS sample_rate,
                CAST(1 + doc_id % 2 AS INT) AS channels,
                CAST(8 + (doc_id % 3) * 4 AS INT) AS bits_per_sample,
                CAST(300 + doc_id % 200 AS BIGINT) AS n_samples,
                CAST((300 + doc_id % 200) * 1000
                     // (8000 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms
         FROM documents""",

    // The oracle applies the delete as a WHERE NOT — exact equality is
    // the copy-on-write soundness claim (no lost rows from carried
    // files, no surviving rows from rewritten ones).
    "q165_warehouse_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM orders
         WHERE NOT (o_orderkey >= 2000 AND o_orderkey < 4000)
         GROUP BY 1""",

    // Same confusion counts; kappa with denominators cleared — both
    // engines truncate toward zero so the possibly-negative numerator
    // divides identically.
    "q243_agreement" ->
      s"""WITH $ScoredDocsSql,
         c AS (SELECT
             CAST(sum(CASE WHEN s >= 5000 THEN y ELSE 0 END) AS HUGEINT) AS tp,
             CAST(sum(CASE WHEN s >= 5000 THEN 1 - y ELSE 0 END) AS HUGEINT) AS fp,
             CAST(sum(CASE WHEN s < 5000 THEN y ELSE 0 END) AS HUGEINT) AS fn,
             CAST(sum(CASE WHEN s < 5000 THEN 1 - y ELSE 0 END) AS HUGEINT) AS tn
           FROM sc)
         SELECT CAST(5000 AS BIGINT) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CAST(CASE WHEN tp + fp + fn + tn = 0 THEN NULL
             ELSE (tp + tn) * 1000000 // (tp + fp + fn + tn) END AS BIGINT)
             AS accuracy_ppm,
           CAST(CASE WHEN tp + fn = 0 OR tn + fp = 0 THEN NULL
             ELSE (tp * 1000000 // (tp + fn)
                 + tn * 1000000 // (tn + fp)) // 2 END AS BIGINT)
             AS balanced_accuracy_ppm,
           CAST(CASE WHEN (tp + fp + fn + tn) * (tp + fp + fn + tn)
                   - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) = 0
             THEN NULL
             ELSE ((tp + fp + fn + tn) * (tp + tn)
                 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn))) * 1000000
               // ((tp + fp + fn + tn) * (tp + fp + fn + tn)
                 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)))
             END AS BIGINT) AS kappa_ppm
         FROM c""",

    // Exact token membership (substring hits of longer tokens do NOT
    // count — list_contains over the same tokenizer).
    "q270_term_lookup" ->
      """SELECT doc_id, source FROM documents
         WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'),
                             'dup')""",

    // Same cleared-denominator cumulative EMD, one floor-div into ppm.
    "q271_t_closeness" ->
      """WITH k AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
             FROM customer),
         cell AS (SELECT nation, segment, band,
                    CAST(count(*) AS BIGINT) AS c
                  FROM k GROUP BY 1, 2, 3),
         gdist AS (SELECT band, CAST(count(*) AS BIGINT) AS g
                  FROM k GROUP BY 1),
         tot AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
                   CAST(count(*) AS BIGINT) AS m
                 FROM gdist),
         grp AS (SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n
                 FROM cell GROUP BY 1, 2),
         filled AS (SELECT gr.nation, gr.segment, gl.band, gl.g, gr.n,
                      COALESCE(cl.c, 0) AS c
                    FROM grp gr CROSS JOIN gdist gl
                    LEFT JOIN cell cl ON cl.nation = gr.nation
                      AND cl.segment = gr.segment AND cl.band = gl.band),
         cum AS (SELECT nation, segment, n,
                   CAST(sum(c) OVER (PARTITION BY nation, segment
                     ORDER BY band) AS BIGINT) AS cc,
                   CAST(sum(g) OVER (PARTITION BY nation, segment
                     ORDER BY band) AS BIGINT) AS gc
                 FROM filled),
         s AS (SELECT nation, segment, n, nn, m,
                 CAST(sum(abs(cc * nn - gc * n)) AS BIGINT) AS sv
               FROM cum CROSS JOIN tot GROUP BY 1, 2, 3, 4, 5)
         SELECT nation, segment, n AS n_rows,
                CAST(sv * 1000000 // (n * nn * (m - 1)) AS BIGINT) AS emd_ppm
         FROM s WHERE sv * 1000000 // (n * nn * (m - 1)) > 100000""",

    // Same cumulative window and (metric desc, threshold asc) argmax.
    "q269_operating_point" ->
      s"""WITH $ScoredDocsSql,
         g AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                 CAST(count(*) - sum(y) AS HUGEINT) AS n
               FROM sc GROUP BY 1),
         c AS (SELECT s,
                 sum(p) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
                   AS tp,
                 sum(n) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
                   AS fp,
                 sum(p) OVER () AS pt, sum(n) OVER () AS nt
               FROM g),
         m AS (SELECT s,
                 CASE WHEN pt = 0 OR nt = 0 THEN NULL
                      ELSE tp * 1000000 // pt
                         + (nt - fp) * 1000000 // nt - 1000000 END AS j,
                 CASE WHEN pt = 0 THEN NULL
                      ELSE 2 * tp * 1000000
                           // (2 * tp + fp + (pt - tp)) END AS f1
               FROM c)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_thresholds,
           (SELECT CAST(s AS BIGINT) FROM m WHERE j IS NOT NULL
            ORDER BY j DESC, s ASC LIMIT 1) AS best_j_threshold,
           (SELECT CAST(j AS BIGINT) FROM m WHERE j IS NOT NULL
            ORDER BY j DESC, s ASC LIMIT 1) AS best_j_ppm,
           (SELECT CAST(s AS BIGINT) FROM m WHERE f1 IS NOT NULL
            ORDER BY f1 DESC, s ASC LIMIT 1) AS best_f1_threshold,
           (SELECT CAST(f1 AS BIGINT) FROM m WHERE f1 IS NOT NULL
            ORDER BY f1 DESC, s ASC LIMIT 1) AS best_f1_ppm""",

    // The decode is the identity on the synth fixtures, so the oracle
    // replays the arithmetic alone.
    "q268_gif_frames" ->
      """SELECT 1 + doc_id % 5 AS frames,
                1 + doc_id % 5 AS frames_decoded,
                CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1, 2""",

    // One rational per series over the daily table.
    "q267_fano" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS HUGEINT) AS y
             FROM events GROUP BY 1, 2)
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS n_events,
           CAST(CASE WHEN sum(y) = 0 THEN NULL
                ELSE (count(*) * sum(y * y) - sum(y) * sum(y)) * 1000000
                     // (count(*) * sum(y)) END AS BIGINT) AS fano_ppm
         FROM daily GROUP BY 1""",

    // The same md5 fold thresholds (65536/4 = 16384 → '4000', '8000',
    // 'c000') and exact out-of-fold means.
    "q266_target_encoding" ->
      """WITH r AS (SELECT lang AS category,
           CAST((CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      >= '4000' THEN 1 ELSE 0 END)
              + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      >= '8000' THEN 1 ELSE 0 END)
              + (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      >= 'c000' THEN 1 ELSE 0 END) AS BIGINT) AS fold,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
         FROM documents),
         cf AS (SELECT category, fold, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS s
                FROM r GROUP BY 1, 2),
         c AS (SELECT category, sum(n) AS nt, sum(s) AS st
               FROM cf GROUP BY 1),
         p AS (SELECT sum(nt) AS na, sum(st) AS sa FROM c)
         SELECT cf.category, cf.fold,
           CAST(c.nt - cf.n AS BIGINT) AS n_out,
           CAST(CASE WHEN c.nt - cf.n = 0 THEN NULL
                ELSE (c.st - cf.s) * 1000000 // (c.nt - cf.n) END
                AS BIGINT) AS encoding_ppm,
           CAST(CASE WHEN p.na = 0 THEN NULL
                ELSE p.sa * 1000000 // p.na END AS BIGINT) AS prior_ppm
         FROM cf JOIN c USING (category), p""",

    // Same md5 arm, same suffix-sum risk table, same quotient/remainder
    // micro splits and pinned z.
    "q264_logrank" ->
      """WITH u AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
               FROM events GROUP BY 1),
         mx AS (SELECT max(l) AS maxd FROM u),
         life AS (SELECT (l - f) AS t,
                    CASE WHEN maxd - l < 7 THEN 1 ELSE 0 END AS cens,
                    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                              1, 1) < '8' THEN 1 ELSE 0 END AS g1
                  FROM u, mx),
         byt AS (SELECT t,
                   CAST(sum(CASE WHEN g1 = 1 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS a1,
                   CAST(sum(CASE WHEN g1 = 0 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS a0,
                   CAST(sum(CASE WHEN g1 = 1 AND cens = 0 THEN 1 ELSE 0
                        END) AS HUGEINT) AS d1,
                   CAST(sum(CASE WHEN g1 = 0 AND cens = 0 THEN 1 ELSE 0
                        END) AS HUGEINT) AS d0
                 FROM life GROUP BY 1),
         rk AS (SELECT d1, d1 + d0 AS dd,
                  (sum(a1) OVER ()) - coalesce(sum(a1) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n1,
                  (sum(a0) OVER ()) - coalesce(sum(a0) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n0
                FROM byt),
         ev AS (SELECT d1, dd, n1, n0, n1 + n0 AS nn,
                  dd * n1 AS en,
                  dd * n1 * n0 * (n1 + n0 - dd) AS vn,
                  (n1 + n0) * (n1 + n0) * (n1 + n0 - 1) AS vd
                FROM rk WHERE dd > 0),
         ag AS (SELECT CAST(count(*) AS BIGINT) AS n_event_times,
                  sum(d1) AS o1,
                  sum(en // nn) * 1000000
                    + sum(((en - (en // nn) * nn) * 1000000) // nn)
                    AS e1m,
                  sum(CASE WHEN nn <= 1 THEN 0 ELSE vn // vd END) * 1000000
                    + sum(CASE WHEN nn <= 1 THEN 0
                          ELSE ((vn - (vn // vd) * vd) * 1000000) // vd
                          END) AS vm
                FROM ev)
         SELECT n_event_times, CAST(o1 AS BIGINT) AS o1_events,
           CAST(e1m AS BIGINT) AS e1_micro, CAST(vm AS BIGINT) AS v_micro,
           CAST(CASE WHEN vm IS NULL OR vm <= 0 THEN NULL
                ELSE CAST(round(CAST(o1 * 1000000 - e1m AS DOUBLE)
                     / sqrt(CAST(vm AS DOUBLE)), 0) AS BIGINT) END
                AS BIGINT) AS z_milli,
           CAST(CASE WHEN vm IS NULL OR vm <= 0 THEN NULL
                WHEN abs(CAST(round(CAST(o1 * 1000000 - e1m AS DOUBLE)
                     / sqrt(CAST(vm AS DOUBLE)), 0) AS BIGINT)) >= 1960
                THEN 1 ELSE 0 END AS BIGINT) AS significant_05
         FROM ag""",

    // Identical Cramer determinants in HUGEINT; the intercept's two
    // div-1000 floor points replay verbatim.
    "q263_ols2" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS d,
                  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS HUGEINT) AS y,
                  CAST(sum(CASE WHEN event_type = 'view' THEN 1
                           ELSE 0 END) AS HUGEINT) AS x,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS HUGEINT) AS z
               FROM events GROUP BY 1),
         s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(z) AS sz, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(z * z) AS szz,
                 sum(x * z) AS sxz, sum(x * y) AS sxy,
                 sum(z * y) AS szy
               FROM daily),
         t AS (SELECT CAST(n AS BIGINT) AS n_days, n, sx, sz, sy,
                 n * sxx - sx * sx AS a, n * sxz - sx * sz AS b,
                 n * szz - sz * sz AS c, n * sxy - sx * sy AS dd,
                 n * szy - sz * sy AS e
               FROM s)
         SELECT n_days,
           CAST(CASE WHEN a * c - b * b = 0 THEN NULL
                ELSE (c * dd - b * e) * 1000000 // (a * c - b * b) END
                AS BIGINT) AS beta_x_ppm,
           CAST(CASE WHEN a * c - b * b = 0 THEN NULL
                ELSE (a * e - b * dd) * 1000000 // (a * c - b * b) END
                AS BIGINT) AS beta_z_ppm,
           CAST(CASE WHEN a * c - b * b = 0 OR n = 0 THEN NULL
                ELSE (sy * 1000
                  - ((c * dd - b * e) * 1000000 // (a * c - b * b))
                    * sx // 1000
                  - ((a * e - b * dd) * 1000000 // (a * c - b * b))
                    * sz // 1000) // n END AS BIGINT) AS intercept_milli
         FROM t""",

    // Three per-key countDistinct rollups unioned; lineitem columns are
    // non-null so the NULL-behavior term contributes zero here.
    "q262_fd_audit" ->
      """WITH a AS (SELECT count(DISTINCT l_suppkey)
                    + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                      AS n
               FROM lineitem GROUP BY l_orderkey),
         b AS (SELECT count(DISTINCT l_suppkey)
                    + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                      AS n
               FROM lineitem GROUP BY l_partkey),
         c AS (SELECT count(DISTINCT l_partkey)
                    + max(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
                      AS n
               FROM lineitem GROUP BY l_orderkey, l_linenumber)
         SELECT 'l_orderkey->l_suppkey' AS dependency,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_keys,
           CAST(max(n) AS BIGINT) AS max_rhs_per_key,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS violation_ppm
         FROM a
         UNION ALL
         SELECT 'l_partkey->l_suppkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(n) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT)
         FROM b
         UNION ALL
         SELECT 'l_orderkey+l_linenumber->l_partkey',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(n) AS BIGINT),
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT)
         FROM c""",

    // The same md5 order, signatures, union-bottom-k and membership
    // joins — the sketch replays because its randomness is a hash.
    "q261_kmv_overlap" ->
      """WITH v AS (SELECT DISTINCT src, term
               FROM (SELECT source AS src,
                       unnest(regexp_extract_all(lower(text),
                         '[a-z0-9]+')) AS term
                     FROM documents)),
         hh AS (SELECT src, md5(term) AS h FROM v),
         s AS (SELECT src, h
               FROM (SELECT src, h, row_number() OVER (PARTITION BY src
                       ORDER BY h) AS rk FROM hh)
               WHERE rk <= 64),
         p AS (SELECT a.src AS s1, b.src AS s2
               FROM (SELECT DISTINCT src FROM s) a
               JOIN (SELECT DISTINCT src FROM s) b ON a.src < b.src),
         m AS (SELECT DISTINCT x.s1, x.s2, x.h FROM (
                 SELECT p.s1, p.s2, s.h FROM p JOIN s ON s.src = p.s1
                 UNION ALL
                 SELECT p.s1, p.s2, s.h FROM p JOIN s ON s.src = p.s2) x),
         bt AS (SELECT s1, s2, h
                FROM (SELECT s1, s2, h, row_number() OVER (
                        PARTITION BY s1, s2 ORDER BY h) AS rk FROM m)
                WHERE rk <= 64),
         j AS (SELECT bt.s1, bt.s2, CAST(count(*) AS BIGINT) AS k_used,
                 CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_both
               FROM bt
               LEFT JOIN s a ON a.src = bt.s1 AND a.h = bt.h
               LEFT JOIN s b ON b.src = bt.s2 AND b.h = bt.h
               GROUP BY 1, 2)
         SELECT s1, s2, k_used, n_both,
                CAST(n_both * 1000000 // k_used AS BIGINT)
                  AS jaccard_est_ppm
         FROM j""",

    // The identical threshold-fold bucket (generated power-of-two CASE
    // chain), so no float log exists on either engine.
    "q260_zipf_profile" -> {
      val chain = (1 to 40).map(i =>
        s"(CASE WHEN f >= ${1L << i} THEN 1 ELSE 0 END)")
        .mkString("\n                   + ")
      s"""WITH tf AS (SELECT unnest(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) AS t
               FROM documents),
         f AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM tf GROUP BY 1)
         SELECT CAST($chain AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_terms,
                CAST(sum(f) AS BIGINT) AS n_occurrences,
                min(t) AS min_term
         FROM f GROUP BY 1"""
    },

    // Same per-user min-collapse and day quantization; quantile_cont =
    // Spark percentile (q47 parity), round 2.
    "q259_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v
               FROM events WHERE event_type = 'view' GROUP BY 1),
         p AS (SELECT v.user_id,
                 min(epoch_us(e.ts)) AS p, any_value(v.v) AS v2
               FROM v JOIN events e ON e.user_id = v.user_id
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v
               GROUP BY 1),
         dly AS (SELECT (p - v2) // 86400000000 AS days FROM p)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_from,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(CASE WHEN (SELECT count(*) FROM v) = 0 THEN NULL
                ELSE count(*) * 1000000 // (SELECT count(*) FROM v) END
                AS BIGINT) AS conv_ppm,
           round(quantile_cont(days, 0.25), 2) AS p25_days,
           round(quantile_cont(days, 0.50), 2) AS p50_days,
           round(quantile_cont(days, 0.75), 2) AS p75_days,
           round(quantile_cont(days, 0.90), 2) AS p90_days
         FROM dly""",

    // The identical two-level window replay: level-1 argmax, side split
    // at the break day (inclusive left), side-local stats.
    "q258_cusum_segments" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         st AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS tot FROM daily GROUP BY 1),
         c AS (SELECT daily.s, daily.d, st.n, st.tot,
                 CAST(sum(st.n * daily.y - st.tot) OVER (
                   PARTITION BY daily.s ORDER BY daily.d
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
               FROM daily JOIN st USING (s)),
         l1 AS (SELECT s, d AS changepoint_day,
                  CAST(abs(cs) * 1000000 // (n * tot) AS BIGINT)
                    AS cusum_ppm
                FROM (SELECT s, d, n, tot, cs,
                        row_number() OVER (PARTITION BY s
                          ORDER BY abs(cs) DESC, d ASC) AS rk
                      FROM c)
                WHERE rk = 1 AND n >= 2),
         sided AS (SELECT daily.s, daily.d, daily.y,
                     CASE WHEN daily.d <= l1.changepoint_day
                          THEN 'L' ELSE 'R' END AS side
                   FROM daily JOIN l1 USING (s)),
         st2 AS (SELECT s, side, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS tot
                 FROM sided GROUP BY 1, 2),
         c2 AS (SELECT sided.s, sided.side, sided.d, st2.n, st2.tot,
                  CAST(sum(st2.n * sided.y - st2.tot) OVER (
                    PARTITION BY sided.s, sided.side ORDER BY sided.d
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cs
                FROM sided JOIN st2 USING (s, side)),
         l2 AS (SELECT s, side, d AS cp_day,
                  CAST(abs(cs) * 1000000 // (n * tot) AS BIGINT) AS cp_ppm
                FROM (SELECT s, side, d, n, tot, cs,
                        row_number() OVER (PARTITION BY s, side
                          ORDER BY abs(cs) DESC, d ASC) AS rk
                      FROM c2)
                WHERE rk = 1 AND n >= 2)
         SELECT l1.s AS event_type, l1.changepoint_day, l1.cusum_ppm,
                CAST(lf.cp_day AS BIGINT) AS left_day,
                CAST(lf.cp_ppm AS BIGINT) AS left_ppm,
                CAST(rt.cp_day AS BIGINT) AS right_day,
                CAST(rt.cp_ppm AS BIGINT) AS right_ppm
         FROM l1
         LEFT JOIN (SELECT * FROM l2 WHERE side = 'L') lf USING (s)
         LEFT JOIN (SELECT * FROM l2 WHERE side = 'R') rt USING (s)""",

    // The nested form is engine-side; the data contract is the flat
    // per-order readout. The struct sort key is (ln, pk, price), so the
    // first item's pk = min pk among the min-linenumber rows (line
    // numbers are NOT unique per order in this generator).
    "q257_nested_export" ->
      """WITH w AS (SELECT l_orderkey, l_partkey, l_linenumber,
                  l_extendedprice,
                  min(l_linenumber) OVER (PARTITION BY l_orderkey) AS mln
               FROM lineitem)
         SELECT l_orderkey,
                CAST(count(*) AS BIGINT) AS n_items,
                CAST(min(CASE WHEN l_linenumber = mln THEN l_partkey END)
                     AS BIGINT) AS first_pk,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS total_cents
         FROM w GROUP BY 1""",

    // Replays the full IJG scale→estimate round trip arithmetically:
    // the Annex-K base as a literal list, Σbase = 3688.
    "q255_jpeg_quality" ->
      """WITH d AS (SELECT 1 + doc_id % 100 AS q FROM documents),
         s AS (SELECT q, CASE WHEN q < 50 THEN 5000 // q
                         ELSE 200 - 2 * q END AS sc,
                 CAST(count(*) AS BIGINT) AS n
               FROM d GROUP BY 1),
         b AS (SELECT unnest([16,11,10,16,24,40,51,61,
                              12,12,14,19,26,58,60,55,
                              14,13,16,24,40,57,69,56,
                              14,17,22,29,51,87,80,62,
                              18,22,37,56,68,109,103,77,
                              24,35,55,64,81,104,113,92,
                              49,64,78,87,103,121,120,101,
                              72,92,95,98,112,100,103,99]) AS bq),
         t AS (SELECT q, n,
                 sum(least(255, greatest(1, (bq * sc + 50) // 100))) AS sq
               FROM s, b GROUP BY 1, 2),
         e AS (SELECT q, n, (100 * sq + 1844) // 3688 AS spct FROM t)
         SELECT CAST(q AS BIGINT) AS quality,
           CAST(CASE WHEN spct <= 0 THEN 100
                WHEN spct <= 100 THEN (200 - spct) // 2
                ELSE 5000 // spct END AS BIGINT) AS quality_est,
           n AS n_docs
         FROM e""",

    // Same md5 split, same order-statistic k = ceil((n+1)(1−α)) and
    // cumulative-count q̂; coverage one floor-ppm.
    "q254_conformal" ->
      """WITH t AS (SELECT doc_id,
           greatest(least(CAST(floor(
             round(0.5 * least(length(text) / 500.0, 1.0)
               + 0.5 * least(len(regexp_extract_all(text,
                       '[A-Za-z0-9]+')) * 1.0
                   / greatest(len(regexp_split_to_array(trim(text),
                       '\s+')), 1), 1.0)
               - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                 / greatest(length(text), 1), 4) * 10000 + 0.5)
             AS BIGINT), 10000), 0) AS pred,
           CASE WHEN n_chars >= 300 THEN 10000 ELSE 0 END AS actual
         FROM documents),
         r AS (SELECT abs(actual - pred) AS r,
                 CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                           < '8' THEN 1 ELSE 0 END AS cal
               FROM t),
         n AS (SELECT CAST(count(*) AS BIGINT) AS ncal,
                 ((count(*) + 1) * 900000 + 999999) // 1000000 AS k
               FROM r WHERE cal = 1),
         cum AS (SELECT r, sum(cnt) OVER (ORDER BY r) AS cum
                 FROM (SELECT r, count(*) AS cnt FROM r WHERE cal = 1
                       GROUP BY 1)),
         qh AS (SELECT min(r) AS qhat FROM cum, n WHERE cum >= n.k)
         SELECT n.ncal AS n_cal,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(CASE WHEN n.k > n.ncal THEN NULL ELSE qh.qhat END
                AS BIGINT) AS qhat,
           CAST(CASE WHEN n.k > n.ncal OR count(*) = 0 THEN NULL
                ELSE sum(CASE WHEN r.r <= qh.qhat THEN 1 ELSE 0 END)
                     * 1000000 // count(*) END AS BIGINT) AS coverage_ppm,
           CAST(900000 AS BIGINT) AS target_ppm
         FROM r, n, qh WHERE r.cal = 0
         GROUP BY n.ncal, n.k, qh.qhat""",

    // Same binning, same cancelled-denominator identity in HUGEINT.
    "q253_ece" ->
      s"""WITH $ScoredDocsSql,
         g AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                 CAST(count(*) AS HUGEINT) AS ns
               FROM sc GROUP BY 1),
         b AS (SELECT least(s * 10 // 10000, 9) AS bin,
                 sum(ns) AS cnt,
                 sum(CAST(s AS HUGEINT) * ns) AS sum_s,
                 sum(p) AS pos
               FROM g GROUP BY 1),
         a AS (SELECT sum(cnt) AS nn, CAST(count(*) AS HUGEINT)
                 AS n_bins_used,
                 sum(abs(sum_s - pos * 10000)) AS gap,
                 max(abs(sum_s - pos * 10000) * 1000000
                     // (cnt * 10000)) AS mce
               FROM b)
         SELECT CAST(nn AS BIGINT) AS n,
           CAST(n_bins_used AS BIGINT) AS n_bins_used,
           CAST(CASE WHEN nn = 0 THEN NULL
                ELSE gap * 1000000 // (nn * 10000) END AS BIGINT)
             AS ece_ppm,
           CAST(mce AS BIGINT) AS mce_ppm
         FROM a""",

    // Identical vowel-group/sentence heuristics and floor points; doc
    // sums can be negative — both engines truncate toward zero.
    "q252_readability" ->
      """WITH p AS (SELECT source,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
             AS w,
           greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                         AS BIGINT),
                    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                         AS BIGINT)) AS y,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                AS BIGINT) AS s2
         FROM documents),
         d AS (SELECT source, w,
           CASE WHEN w > 0 THEN (390 * w) // s2 + (11800 * y) // w - 15590
                END AS fk,
           CASE WHEN w > 0
                THEN 206835 - (1015 * w) // s2 - (84600 * y) // w
                END AS ease
         FROM p)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty,
           CAST(CASE WHEN count(fk) = 0 THEN NULL
                ELSE sum(fk) // count(fk) END AS BIGINT) AS fk_grade_milli,
           CAST(CASE WHEN count(ease) = 0 THEN NULL
                ELSE sum(ease) // count(ease) END AS BIGINT)
             AS reading_ease_milli
         FROM d GROUP BY 1""",

    // Main after fast-forward = all orders; the tag = the even half.
    "q251_refs" ->
      """SELECT 'main' AS leg, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS price_cents
         FROM orders
         UNION ALL
         SELECT 'tag_v1', CAST(count(*) AS BIGINT),
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                     AS BIGINT)
         FROM orders WHERE o_orderkey % 2 = 0""",

    // The warehouse legs are engine-side mechanics; the data contract is
    // just the per-group rollup over the full customer slice.
    "q250_partition_evolution" ->
      """SELECT c_custkey % 7 AS grp, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  AS bal_cents
         FROM customer GROUP BY 1""",

    // The q16/q243 quality expression inline (same row must carry both
    // classifiers + the label); discordant counts then one rational.
    "q249_mcnemar" ->
      """WITH t AS (SELECT
           CASE WHEN greatest(least(CAST(floor(
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(len(regexp_extract_all(text,
                            '[A-Za-z0-9]+')) * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                      / greatest(length(text), 1), 4) * 10000 + 0.5)
                  AS BIGINT), 10000), 0) >= 5000 THEN 1 ELSE 0 END AS p1,
           CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9]+')) >= 50
                THEN 1 ELSE 0 END AS p2,
           CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y
         FROM documents),
         r AS (SELECT CASE WHEN p1 = y THEN 1 ELSE 0 END AS r1,
                      CASE WHEN p2 = y THEN 1 ELSE 0 END AS r2 FROM t),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS b,
                 CAST(sum(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c
               FROM r)
         SELECT n, b, c,
           CAST(CASE WHEN b + c = 0 THEN NULL
                WHEN abs(b - c) <= 1 THEN 0
                ELSE (abs(b - c) - 1) * (abs(b - c) - 1) * 1000 // (b + c)
                END AS BIGINT) AS stat_milli,
           CAST(CASE WHEN b + c = 0 THEN NULL
                WHEN (CASE WHEN abs(b - c) <= 1 THEN 0
                      ELSE (abs(b - c) - 1) * (abs(b - c) - 1) * 1000
                           // (b + c) END) > 3841 THEN 1 ELSE 0 END
                AS BIGINT) AS significant_05
         FROM a""",

    // Character-class-only regexes (Java and RE2 agree per code point);
    // DuckDB counts matches via len(regexp_extract_all).
    "q248_encoding_audit" ->
      """WITH f AS (SELECT source,
           CASE WHEN regexp_matches(text,
                '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS ctl,
           CASE WHEN regexp_matches(text, '�') THEN 1 ELSE 0 END AS rpl,
           CASE WHEN regexp_matches(text,
                'Ã©|Ã¨|Ã¼|Ã¶|Ã¤|Ã±|Ã§|â€|Â£|Â°') THEN 1 ELSE 0 END AS mji,
           len(regexp_extract_all(text, '[A-Z]')) AS up,
           len(regexp_extract_all(text, '[A-Za-z]')) AS lt,
           len(regexp_extract_all(text, '[0-9]')) AS dg,
           len(regexp_extract_all(text, '[^\x00-\x7F]')) AS na,
           length(text) AS ch
         FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ctl) AS BIGINT) AS n_ctrl,
           CAST(sum(rpl) AS BIGINT) AS n_replacement,
           CAST(sum(mji) AS BIGINT) AS n_mojibake,
           CAST(sum(CASE WHEN ctl + rpl + mji = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clean,
           CAST(CASE WHEN sum(lt) = 0 THEN NULL
                ELSE sum(up) * 1000000 // sum(lt) END AS BIGINT)
             AS upper_ppm,
           CAST(CASE WHEN sum(ch) = 0 THEN NULL
                ELSE sum(dg) * 1000000 // sum(ch) END AS BIGINT)
             AS digit_ppm,
           CAST(CASE WHEN sum(ch) = 0 THEN NULL
                ELSE sum(na) * 1000000 // sum(ch) END AS BIGINT)
             AS nonascii_ppm
         FROM f GROUP BY 1""",

    // Same md5 arm/bucket assignment (fixed-width hex thresholds), same
    // replicate arithmetic in HUGEINT; z replays the three pinned IEEE
    // ops verbatim.
    "q247_jackknife" -> {
      val g = 16
      val chain = (1 until g).map(i =>
        f"(CASE WHEN h >= '${i * 65536 / g}%04x' THEN 1 ELSE 0 END)")
        .mkString("\n                   + ")
      s"""WITH pu AS (SELECT user_id,
                  CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                       AS HUGEINT) AS y
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
         t AS (SELECT y,
                 CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                           < '8' THEN 'A' ELSE 'B' END AS arm,
                 substring(md5(CAST(user_id AS VARCHAR)), 2, 4) AS h
               FROM pu),
         tb AS (SELECT CAST($chain AS HUGEINT) AS g, arm, y FROM t),
         pb0 AS (SELECT g,
                  CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                       AS HUGEINT) AS n_ag,
                  CAST(sum(CASE WHEN arm = 'A' THEN y ELSE 0 END)
                       AS HUGEINT) AS s_ag,
                  CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                       AS HUGEINT) AS n_bg,
                  CAST(sum(CASE WHEN arm = 'B' THEN y ELSE 0 END)
                       AS HUGEINT) AS s_bg
                 FROM tb GROUP BY 1),
         pb AS (SELECT gs.g, coalesce(n_ag, 0) AS n_ag,
                  coalesce(s_ag, 0) AS s_ag, coalesce(n_bg, 0) AS n_bg,
                  coalesce(s_bg, 0) AS s_bg
                FROM (SELECT CAST(range AS HUGEINT) AS g FROM range($g)) gs
                LEFT JOIN pb0 ON pb0.g = gs.g),
         tot AS (SELECT sum(n_ag) AS tna, sum(s_ag) AS tsa,
                   sum(n_bg) AS tnb, sum(s_bg) AS tsb FROM pb),
         reps AS (SELECT CASE WHEN tna - n_ag = 0 OR tnb - n_bg = 0
                    THEN NULL
                    ELSE (tsb - s_bg) * 1000000 // (tnb - n_bg)
                       - (tsa - s_ag) * 1000000 // (tna - n_ag) END AS dg
                  FROM pb, tot),
         rs AS (SELECT CAST(count(dg) AS HUGEINT) AS n_valid,
                  sum(dg) AS sd, sum(dg * dg) AS sd2 FROM reps)
         SELECT CAST(tna AS BIGINT) AS n_users_a,
           CAST(tnb AS BIGINT) AS n_users_b,
           CAST(CASE WHEN tna = 0 THEN NULL
                ELSE tsa * 1000000 // tna END AS BIGINT) AS mean_a_micro,
           CAST(CASE WHEN tnb = 0 THEN NULL
                ELSE tsb * 1000000 // tnb END AS BIGINT) AS mean_b_micro,
           CAST(CASE WHEN tna = 0 OR tnb = 0 THEN NULL
                ELSE tsb * 1000000 // tnb - tsa * 1000000 // tna END
                AS BIGINT) AS diff_micro,
           CAST(n_valid AS BIGINT) AS n_valid_buckets,
           CAST(CASE WHEN n_valid < $g
                  OR ($g - 1) * ($g * sd2 - sd * sd) < 0 THEN NULL
                ELSE CAST(round(sqrt(CAST(($g - 1)
                       * ($g * sd2 - sd * sd) AS DOUBLE))
                     / $g, 0) AS BIGINT) END AS BIGINT) AS se_micro,
           CAST(CASE WHEN n_valid < $g OR tna = 0 OR tnb = 0
                  OR ($g - 1) * ($g * sd2 - sd * sd) <= 0 THEN NULL
                ELSE CAST(round(CAST(tsb * 1000000 // tnb
                       - tsa * 1000000 // tna AS DOUBLE) * $g
                     / sqrt(CAST(($g - 1) * ($g * sd2 - sd * sd)
                            AS DOUBLE)) * 1000, 0) AS BIGINT) END
                AS BIGINT) AS z_milli
         FROM tot, rs"""
    },

    // Same per-score quotient/remainder splits in HUGEINT; every
    // division is `//` so the floors replay bit-identically.
    "q246_brier" ->
      s"""WITH $ScoredDocsSql,
         g AS (SELECT s, CAST(sum(y) AS HUGEINT) AS p,
                 CAST(count(*) AS HUGEINT) AS ns
               FROM sc GROUP BY 1),
         d AS (SELECT s, p, ns,
                 CAST(s AS HUGEINT) * ns - p * 10000 AS tlin,
                 p * p AS psq
               FROM g),
         e AS (SELECT sum(ns) AS nn, sum(p) AS oo,
                 sum(ns * CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS a,
                 sum(CAST(s AS HUGEINT) * p) AS b,
                 sum((tlin * tlin) // ns) AS relq,
                 sum(((tlin * tlin - ((tlin * tlin) // ns) * ns) * 1000000)
                     // ns) AS relr,
                 sum(psq // ns) AS resq,
                 sum(((psq - (psq // ns) * ns) * 1000000) // ns) AS resr
               FROM d)
         SELECT CAST(nn AS BIGINT) AS n,
           CAST((a - 2 * 10000 * b + 10000 * 10000 * oo) * 1000000
                // (nn * 10000 * 10000) AS BIGINT) AS brier_ppm,
           CAST((relq * 1000000 + relr) // (nn * 10000 * 10000) AS BIGINT)
             AS reliability_ppm,
           CAST((resq * 1000000 + resr) // nn
                - (oo * oo * 1000000) // (nn * nn) AS BIGINT)
             AS resolution_ppm,
           CAST((oo * (nn - oo) * 1000000) // (nn * nn) AS BIGINT)
             AS uncertainty_ppm,
           CAST((a - 2 * 10000 * b + 10000 * 10000 * oo) * 1000000
                // (nn * 10000 * 10000)
              - ((relq * 1000000 + relr) // (nn * 10000 * 10000)
                 - ((resq * 1000000 + resr) // nn
                    - (oo * oo * 1000000) // (nn * nn))
                 + (oo * (nn - oo) * 1000000) // (nn * nn)) AS BIGINT)
             AS decomp_gap_ppm
         FROM e""",

    // Identical packing (dim d → word d//32, bit d%32, set iff x >= 0),
    // Hamming = per-word bit_count(xor), summed.
    "q244_binary_ann" ->
      """WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding) AS val FROM embeddings),
         wd AS (SELECT vec_id, (i - 1) // 32 AS wi,
                  CAST(sum(CASE WHEN val >= 0
                    THEN CAST(1 AS BIGINT) << CAST((i - 1) % 32 AS INT)
                    ELSE 0 END) AS BIGINT) AS word
                FROM x GROUP BY 1, 2),
         q AS (SELECT wi, word FROM wd WHERE vec_id = 3)
         SELECT wd.vec_id,
                CAST(sum(bit_count(xor(wd.word, q.word))) AS BIGINT)
                  AS hamming
         FROM wd JOIN q ON wd.wi = q.wi WHERE wd.vec_id <> 3
         GROUP BY 1 ORDER BY hamming, vec_id LIMIT 20""",

    // Same Hamming CTE cut at 64 (deterministic tiebreak), then the q23
    // cosine re-rank over only the shortlist.
    "q245_binary_rerank" ->
      """WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  unnest(embedding) AS val FROM embeddings),
         wd AS (SELECT vec_id, (i - 1) // 32 AS wi,
                  CAST(sum(CASE WHEN val >= 0
                    THEN CAST(1 AS BIGINT) << CAST((i - 1) % 32 AS INT)
                    ELSE 0 END) AS BIGINT) AS word
                FROM x GROUP BY 1, 2),
         q AS (SELECT wi, word FROM wd WHERE vec_id = 3),
         h AS (SELECT wd.vec_id,
                 sum(bit_count(xor(wd.word, q.word))) AS hamming
               FROM wd JOIN q ON wd.wi = q.wi WHERE wd.vec_id <> 3
               GROUP BY 1),
         cand AS (SELECT vec_id FROM h ORDER BY hamming, vec_id LIMIT 64),
         qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                WHERE vec_id = 3)
         SELECT e.vec_id,
                round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qv)
                  / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[])))
                     * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings e JOIN cand USING (vec_id), qv
         ORDER BY cos DESC, vec_id LIMIT 10""",

    // The identical per-step floor, walked by a recursive CTE.
    "q343_nelson_aalen" ->
      """WITH u AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
             FROM events GROUP BY 1),
         lab AS (SELECT l - f AS t,
                  CASE WHEN (SELECT max(l) FROM u) - l < 7
                       THEN 1 ELSE 0 END AS cens
               FROM u),
         life0 AS (SELECT t, CAST(count(*) AS BIGINT) AS al,
                  CAST(sum(1 - cens) AS BIGINT) AS ev,
                  CAST(sum(cens) AS BIGINT) AS c
               FROM lab GROUP BY 1),
         life AS (SELECT t, ev, c,
                  CAST(sum(al) OVER () -
                    coalesce(sum(al) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk
               FROM life0)
         SELECT t AS t_days, n_risk, ev AS n_events, c AS n_censored,
                CAST(sum(ev * 1000000 // n_risk) OVER (ORDER BY t
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_ppm
         FROM life""",

    "q242_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
                  min(epoch_us(ts) // 86400000000) AS f,
                  max(epoch_us(ts) // 86400000000) AS l
             FROM events GROUP BY 1),
         lab AS (SELECT l - f AS t,
                  CASE WHEN (SELECT max(l) FROM u) - l < 7
                       THEN 1 ELSE 0 END AS cens
               FROM u),
         life0 AS (SELECT t, CAST(count(*) AS BIGINT) AS al,
                  CAST(sum(1 - cens) AS BIGINT) AS ev,
                  CAST(sum(cens) AS BIGINT) AS c
               FROM lab GROUP BY 1),
         life AS (SELECT t, ev, c,
                  CAST(sum(al) OVER () -
                    coalesce(sum(al) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_risk,
                  row_number() OVER (ORDER BY t) AS rn
               FROM life0)
         SELECT t AS t_days, n_risk, ev AS n_events, c AS n_censored,
                CAST(surv AS BIGINT) AS surv_ppm
         FROM (WITH RECURSIVE km(rn, surv) AS (
                 SELECT 0, CAST(1000000 AS HUGEINT)
                 UNION ALL
                 SELECT l.rn, km.surv * (l.n_risk - l.ev) // l.n_risk
                 FROM km JOIN life l ON l.rn = km.rn + 1)
               SELECT life.*, km.surv FROM life
               JOIN km ON life.rn = km.rn)""",

    // Same two-level aggregate; the filter keeps under-diverse groups.
    "q241_l_diversity" ->
      """WITH sv AS (SELECT c_nationkey AS nation, c_mktsegment AS segment,
                  CAST(floor(c_acctbal / 2000) AS BIGINT) AS band,
                  CAST(count(*) AS BIGINT) AS c
             FROM customer GROUP BY 1, 2, 3)
         SELECT nation, segment, CAST(sum(c) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_sensitive,
                CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top_share_ppm
         FROM sv GROUP BY 1, 2 HAVING count(*) < 5""",

    // The chain replayed with the SAME 8 unrolled ppm-floored steps.
    "q240_markov_attribution" -> {
      val iterCtes = (1 to 8).map { i =>
        s"""v$i AS (SELECT tv.variant, tv.f AS state,
                  CAST(sum(tv.p_ppm * v.v) // 1000000 AS HUGEINT) AS v
               FROM tv JOIN v${i - 1} v
                 ON tv.variant = v.variant AND tv.t = v.state
               GROUP BY 1, 2
             UNION ALL
             SELECT variant, 'CONV', CAST(1000000 AS HUGEINT)
             FROM variants)"""
      }.mkString(",\n         ")
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id AS id,
                  CASE WHEN event_type = 'purchase' THEN 'CONV'
                       ELSE event_type END AS st
             FROM events),
         ord AS (SELECT user_id, st,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY t, id) AS rn
               FROM ev),
         fc AS (SELECT user_id, min(rn) AS fc FROM ord
               WHERE st = 'CONV' GROUP BY 1),
         stp AS (SELECT o.user_id, o.st, o.rn,
                  lead(o.st) OVER (PARTITION BY o.user_id
                    ORDER BY o.rn) AS nxt
               FROM ord o LEFT JOIN fc ON o.user_id = fc.user_id
               WHERE fc.fc IS NULL OR o.rn <= fc.fc),
         trans AS (
           SELECT 'START' AS f, st AS t FROM stp WHERE rn = 1
           UNION ALL
           SELECT st, nxt FROM stp WHERE nxt IS NOT NULL
           UNION ALL
           SELECT st, 'NULL' FROM stp WHERE nxt IS NULL AND st <> 'CONV'),
         cnt AS (SELECT f, t, CAST(count(*) AS HUGEINT) AS c
               FROM trans GROUP BY 1, 2),
         channels AS (SELECT DISTINCT st AS ch FROM ev WHERE st <> 'CONV'),
         variants AS (SELECT ch AS variant FROM channels
               UNION ALL SELECT 'none'),
         tv AS (SELECT variant, f, t2 AS t, c,
                  CAST(c * 1000000 // sum(c) OVER (PARTITION BY variant, f)
                    AS HUGEINT) AS p_ppm
               FROM (SELECT v.variant, cnt.f,
                       CASE WHEN cnt.t = v.variant THEN 'NULL'
                            ELSE cnt.t END AS t2,
                       CAST(sum(cnt.c) AS HUGEINT) AS c
                     FROM cnt CROSS JOIN variants v
                     GROUP BY 1, 2, 3)),
         v0 AS (SELECT variant, 'CONV' AS state,
                  CAST(1000000 AS HUGEINT) AS v FROM variants),
         $iterCtes,
         strt AS (SELECT variant, v FROM v8 WHERE state = 'START'),
         b AS (SELECT coalesce(max(CASE WHEN variant = 'none' THEN v END),
                  0) AS base FROM strt),
         rr AS (SELECT ch, base,
                  greatest(0, base - coalesce(
                    (SELECT v FROM strt WHERE variant = ch), 0)) AS d
               FROM channels CROSS JOIN b)
         SELECT ch AS channel, CAST(base AS BIGINT) AS base_conv_ppm,
                CASE WHEN base = 0 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(d * 1000000 // base AS BIGINT)
                END AS removal_ppm,
                CASE WHEN sum(d) OVER () = 0 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(d * 1000000 // sum(d) OVER () AS BIGINT)
                END AS share_ppm
         FROM rr"""
    },

    // The same minimax chain: per-point substrate → prefix sums → pair
    // join (j ≤ k) → per-start running min over descending k → per-point
    // max. Floors commute with min/max, so micro-rates stay exact.
    "q239_isotonic" ->
      s"""WITH $ScoredDocsSql,
         per AS (SELECT s // 50 AS s, CAST(sum(y) AS HUGEINT) AS p,
                        CAST(count(*) - sum(y) AS HUGEINT) AS n
                 FROM sc GROUP BY 1),
         pre AS (SELECT s, p, n,
                  sum(p) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cp,
                  sum(p + n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS ct
                 FROM per),
         pair AS (SELECT a.s AS j, b.s AS k, b.p, b.n, b.cp, b.ct,
                  (b.cp - (a.cp - a.p)) * 1000000
                    // (b.ct - (a.ct - a.p - a.n)) AS rate
                 FROM pre a JOIN pre b ON a.s <= b.s),
         rm AS (SELECT j, k, p, n,
                  min(rate) OVER (PARTITION BY j ORDER BY k DESC
                    ROWS UNBOUNDED PRECEDING) AS run_min
                 FROM pair)
         SELECT k AS score, CAST(max(p + n) AS BIGINT) AS n_docs,
                CAST(max(p) AS BIGINT) AS n_pos,
                CAST(max(p * 1000000 // (p + n)) AS BIGINT) AS raw_ppm,
                CAST(max(run_min) AS BIGINT) AS fitted_ppm
         FROM rm GROUP BY k""",

    // The catalog round-trip is pure plumbing to SQL: a plain aggregate.
    "q237_sql_catalog" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders GROUP BY o_orderstatus""",

    // The SPJ is a plan property; the answer is a plain join-aggregate.
    "q238_bucket_spj" ->
      """SELECT o_custkey AS custkey, max(c_mktsegment) AS segment,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY o_custkey""",

    // The layout is invisible to SQL: a plain key lookup.
    "q236_bucket_lookup" ->
      """SELECT c_custkey, c_name,
                CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
         FROM customer WHERE c_custkey IN (7, 19, 83)""",

    // The same dyadic-weight integer sum; NULL lags unscore the day.
    "q360_holt_backtest" -> {
      val lNext = "(300 * q.y * 1000000 + 700 * (r.l + r.b)) // 1000"
      s"""WITH RECURSIVE daily AS (
           SELECT event_type AS s, epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         seq AS (SELECT s, y,
                        row_number() OVER (PARTITION BY s ORDER BY d) AS t
                 FROM daily),
         rec AS (
           SELECT s, t, y AS prev, y * 1000000 AS l, CAST(0 AS BIGINT) AS b,
                  CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS saen,
                  CAST(0 AS BIGINT) AS nf
           FROM seq WHERE t = 1
           UNION ALL
           SELECT q.s, q.t, q.y,
                  $lNext,
                  (100 * (($lNext) - r.l) + 900 * r.b) // 1000,
                  r.sae + abs(q.y * 1000000 - (r.l + r.b)),
                  r.saen + abs(q.y - r.prev) * 1000000,
                  r.nf + 1
           FROM rec r JOIN seq q ON q.s = r.s AND q.t = r.t + 1),
         fin AS (SELECT s, t, l, b, sae, saen, nf,
                        row_number() OVER (PARTITION BY s ORDER BY t DESC) AS rn
                 FROM rec)
         SELECT s AS event_type, CAST(t AS BIGINT) AS n_days,
                CAST(l AS BIGINT) AS level_micro,
                CAST(b AS BIGINT) AS trend_micro,
                CAST(CASE WHEN nf = 0 THEN NULL ELSE sae // nf END AS BIGINT)
                  AS mae_micro_holt,
                CAST(CASE WHEN nf = 0 THEN NULL ELSE saen // nf END AS BIGINT)
                  AS mae_micro_naive
         FROM fin WHERE rn = 1"""
    },

    "q235_ewma_backtest" -> {
      val terms = (1 to 20)
        .map(k => s"lag(y, $k) OVER w * ${1L << (20 - k)}").mkString(" + ")
      s"""WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         sc AS (SELECT s, d, y,
                  $terms AS wsum,
                  lag(y, 1) OVER w AS prev
               FROM daily WINDOW w AS (PARTITION BY s ORDER BY d)),
         f AS (SELECT s, y, wsum // ${(1L << 20) - 1} AS fc, prev
               FROM sc WHERE wsum IS NOT NULL)
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(abs(y - fc)) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_ewma,
                CAST(sum(abs(y - prev)) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_naive
         FROM f GROUP BY 1"""
    },

    // The six rules with the same integer cross-multiplied ratio tests.
    "q234_curation_rules" ->
      """WITH c AS (SELECT source,
              CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS words,
              CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) AS ac,
              CAST(len(regexp_extract_all(text, '#|…|\.\.\.')) AS BIGINT) AS symbols,
              CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits,
              CAST(length(text) AS BIGINT) AS chars,
              CAST(len(regexp_extract_all(
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                '(^| )(the|a|an|and|or|of|to|in|is|it)( |$)')) AS BIGINT) AS stop_hits,
              CASE WHEN regexp_matches(lower(text),
                'lorem ipsum|javascript|cookie') THEN 1 ELSE 0 END AS boiler
            FROM documents),
         f AS (SELECT source,
              CASE WHEN words < 5 THEN 1 ELSE 0 END AS r_short,
              CASE WHEN words > 0 AND (ac * 10 > words * 120
                OR ac * 10 < words * 20) THEN 1 ELSE 0 END AS r_wl,
              CASE WHEN symbols * 10 > words THEN 1 ELSE 0 END AS r_sy,
              CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END AS r_st,
              boiler AS r_bo,
              CASE WHEN digits * 5 > chars THEN 1 ELSE 0 END AS r_dg
            FROM c)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(r_short) AS BIGINT) AS fail_short,
                CAST(sum(r_wl) AS BIGINT) AS fail_word_len,
                CAST(sum(r_sy) AS BIGINT) AS fail_symbol,
                CAST(sum(r_st) AS BIGINT) AS fail_stopword,
                CAST(sum(r_bo) AS BIGINT) AS fail_boiler,
                CAST(sum(r_dg) AS BIGINT) AS fail_digit,
                CAST(sum(CASE WHEN r_short + r_wl + r_sy + r_st + r_bo + r_dg
                  = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
         FROM f GROUP BY 1""",

    // Both MoR deletes relationally: rows surviving EVERY vector.
    "q233_mor_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM orders
         WHERE NOT (o_totalprice > 250000)
           AND NOT (o_orderkey >= 1000 AND o_orderkey < 3000)
         GROUP BY 1""",

    // First-appearance reformulation replayed literally: vocab at a
    // checkpoint = terms whose min(doc_id) ≤ it.
    "q163_vocab_growth" ->
      """WITH cp AS (SELECT CAST(c AS BIGINT) AS checkpoint
             FROM (VALUES (50), (500), (5000), (50000), (500000)) t(c)),
         fs AS (SELECT term, min(doc_id) AS first_seen
             FROM (SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
                   FROM documents)
             GROUP BY term),
         v AS (SELECT cp.checkpoint, CAST(count(*) AS BIGINT) AS vocab_size
             FROM cp JOIN fs ON fs.first_seen <= cp.checkpoint
             GROUP BY cp.checkpoint),
         tk AS (SELECT cp.checkpoint, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(regexp_extract_all(d.text, '[A-Za-z0-9]+')))
                    AS BIGINT) AS n_tokens
             FROM cp JOIN documents d ON d.doc_id <= cp.checkpoint
             GROUP BY cp.checkpoint)
         SELECT tk.checkpoint, tk.n_docs, tk.n_tokens,
                COALESCE(v.vocab_size, 0) AS vocab_size
         FROM tk LEFT JOIN v ON tk.checkpoint = v.checkpoint""",

    // α-sampling weights replayed exactly: sqrt is correctly-rounded in
    // both engines, weights floor to micro units BEFORE the exact BIGINT
    // sum, and the budget split is one fixed double multiply-divide tree.
    "q157_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
                    AS n_tokens
           FROM documents GROUP BY source),
         w AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
                    AS weight_micro FROM c),
         t AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS wt FROM w),
         a AS (SELECT w.*, least(
                  CAST(floor(1000000.0 * CAST(weight_micro AS DOUBLE)
                             / CAST(wt AS DOUBLE)) AS BIGINT),
                  n_tokens) AS target_tokens
               FROM w, t)
         SELECT source, n_docs, n_tokens, weight_micro, target_tokens,
                CAST(CASE WHEN n_tokens = 0 THEN 0
                     ELSE target_tokens * 1000000 // n_tokens END AS BIGINT)
                  AS sample_rate_ppm
         FROM a""",

    // integer basis points BEFORE aggregation (floored means, no
    // accumulation-order doubles); fingerprints as in q81.
    "q152_data_card" ->
      """WITH t AS (SELECT source, lang, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         c AS (SELECT source, lang,
                  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tok,
                  CAST(floor(round(0.5 * least(length(text) / 500.0, 1.0)
                         + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+')) * 1.0
                                       / greatest(len(regexp_split_to_array(trim(text), '\s+')), 1), 1.0)
                         - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                           / greatest(length(text), 1), 4) * 10000 + 0.5) AS BIGINT) AS qbp,
                  md5(nt) AS fp
               FROM t)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                CAST(sum(qbp) // count(*) AS BIGINT) AS mean_quality_bp,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*) AS BIGINT)
                  AS dup_ppm
         FROM c GROUP BY source""",
  )
}
