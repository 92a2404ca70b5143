package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mechanical split of the `SparkEntry.oracleSql` registry (chunk 5 of
  * 6) — SQL verbatim from the original single map;
  * `SparkEntry` concatenates the chunks, so the contract is unchanged. */
private[graft] trait OracleRegistry5 { this: SparkEntry.type =>

  private[graft] def oracleChunk5: Map[String, String] = Map(

    "q394_diversity" ->
      """WITH t AS (SELECT source,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS term
               FROM documents),
         c AS (SELECT source, term, CAST(count(*) AS HUGEINT) AS c
               FROM t GROUP BY 1, 2),
         f AS (SELECT source, CAST(sum(c) AS HUGEINT) AS n,
                 CAST(count(*) AS HUGEINT) AS s,
                 CAST(sum(c * (c - 1)) AS HUGEINT) AS p2,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS f1,
                 CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS HUGEINT)
                   AS f2
               FROM c GROUP BY 1)
         SELECT source, CAST(n AS BIGINT) AS n_tokens,
                CAST(s AS BIGINT) AS n_types,
                CAST(CASE WHEN n < 2 THEN NULL
                  ELSE 1000000 - p2 * 1000000 // (n * (n - 1)) END
                  AS BIGINT) AS simpson_ppm,
                CAST(s * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
                  AS BIGINT) AS chao1_milli
         FROM f""",

    // Same md5-hex bucket arithmetic (the q308 conv trick), same
    // two-level rollup.
    "q395_hash_collisions" ->
      """WITH terms AS (SELECT DISTINCT unnest(string_split(
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
                  AS t
               FROM documents),
         tt AS (SELECT t FROM terms WHERE length(t) > 0),
         b AS (SELECT bb.bits,
                 CAST(('0x' || substring(md5(t), 1, 8)) AS BIGINT)
                   % (1 << bb.bits) AS bkt
               FROM tt, (SELECT unnest([6, 8, 10, 12]) AS bits) bb),
         c AS (SELECT bits, bkt, CAST(count(*) AS BIGINT) AS m
               FROM b GROUP BY 1, 2)
         SELECT CAST(bits AS BIGINT) AS bits,
                CAST(sum(m) AS BIGINT) AS n_terms,
                CAST(count(*) AS BIGINT) AS n_buckets_occupied,
                CAST(sum(CASE WHEN m >= 2 THEN m ELSE 0 END) AS BIGINT)
                  AS n_colliding,
                CAST(CASE WHEN sum(m) = 0 THEN 0
                  ELSE sum(CASE WHEN m >= 2 THEN m ELSE 0 END) * 1000000
                    // sum(m) END AS BIGINT) AS collision_ppm
         FROM c GROUP BY 1""",

    // The q38 session CTE, the generated window table, and a plain
    // inequality overlap join (the small-scale reference for the
    // binned equi-join's exactly-once dedup).
    "q396_interval_overlap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
               FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                 CAST(sum(news) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS session_idx
               FROM g),
         sess AS (SELECT user_id * 1000000 + session_idx AS sid,
                    min(ts_us) AS st, max(ts_us) + 1 AS en
                  FROM s GROUP BY user_id, session_idx),
         wins AS (SELECT day * 2 + slot AS wid,
                    day * 86400000000 + (3 + slot * 12) * 3600000000
                      AS ws,
                    day * 86400000000 + (5 + slot * 12) * 3600000000
                      AS we
                  FROM (SELECT DISTINCT ts_us // 86400000000 AS day
                        FROM (SELECT epoch_us(ts) AS ts_us FROM events)),
                       (SELECT unnest([0, 1]) AS slot)),
         ov AS (SELECT sess.sid, wins.wid,
                  least(sess.en, wins.we) - greatest(sess.st, wins.ws)
                    AS o
                FROM sess JOIN wins
                  ON sess.st < wins.we AND wins.ws < sess.en)
         SELECT CAST(wid AS BIGINT) AS wid,
                CAST(count(*) AS BIGINT) AS n_sessions,
                CAST(sum(o) AS BIGINT) AS overlap_us_total
         FROM ov GROUP BY 1""",

    // The q396 CTEs plus the same nine-way Allen CASE.
    "q397_allen_relations" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
               FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                 CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                 CAST(sum(news) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS session_idx
               FROM g),
         sess AS (SELECT user_id * 1000000 + session_idx AS sid,
                    min(ts_us) AS st, max(ts_us) + 1 AS en
                  FROM s GROUP BY user_id, session_idx),
         wins AS (SELECT day * 2 + slot AS wid,
                    day * 86400000000 + (3 + slot * 12) * 3600000000
                      AS ws,
                    day * 86400000000 + (5 + slot * 12) * 3600000000
                      AS we
                  FROM (SELECT DISTINCT ts_us // 86400000000 AS day
                        FROM (SELECT epoch_us(ts) AS ts_us FROM events)),
                       (SELECT unnest([0, 1]) AS slot)),
         ov AS (SELECT least(sess.en, wins.we)
                    - greatest(sess.st, wins.ws) AS o,
                  CASE
                    WHEN st = ws AND en = we THEN 'equals'
                    WHEN st = ws AND en < we THEN 'starts'
                    WHEN st = ws THEN 'started_by'
                    WHEN en = we AND st > ws THEN 'finishes'
                    WHEN en = we THEN 'finished_by'
                    WHEN st > ws AND en < we THEN 'during'
                    WHEN st < ws AND en > we THEN 'contains'
                    WHEN st < ws THEN 'overlaps'
                    ELSE 'overlapped_by' END AS relation
                FROM sess JOIN wins
                  ON sess.st < wins.we AND wins.ws < sess.en)
         SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(sum(o) AS BIGINT) AS overlap_us_total
         FROM ov GROUP BY 1""",

    "q398_hour_heatmap" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 168 AS how
               FROM events),
         c AS (SELECT how, CAST(count(*) AS BIGINT) AS n_events
               FROM h GROUP BY 1)
         SELECT CAST(how // 24 AS BIGINT) AS dow_from_thu,
                CAST(how % 24 AS BIGINT) AS hour, n_events,
                CAST(n_events * 1000000 // (SELECT sum(n_events) FROM c)
                  AS BIGINT) AS share_ppm
         FROM c""",

    // The forward-ASOF as a decorrelated min-next-timestamp lookup;
    // identical tolerance voiding and per-(user, ts) max-cents tiebreak.
    "q399_asof_forward" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
               FROM events WHERE event_type <> 'purchase'),
         r AS (SELECT user_id, epoch_us(ts) AS ts_us,
                 max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         m AS (SELECT l.user_id, l.ts_us, l.event_type,
                 (SELECT min(r.ts_us) FROM r
                  WHERE r.user_id = l.user_id AND r.ts_us >= l.ts_us)
                   AS mts
               FROM l),
         mm AS (SELECT m.event_type, m.ts_us, m.mts, r.cents
                FROM m LEFT JOIN r
                  ON r.user_id = m.user_id AND r.ts_us = m.mts),
         ok AS (SELECT event_type, ts_us,
                  CASE WHEN mts IS NOT NULL
                    AND mts - ts_us <= 86400000000 THEN cents END AS nc,
                  CASE WHEN mts IS NOT NULL
                    AND mts - ts_us <= 86400000000 THEN mts END AS nts
                FROM mm)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CASE WHEN nc IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_matched,
                CAST(coalesce(sum(nc), 0) AS BIGINT) AS sum_next_cents,
                CAST(coalesce(sum(nts - ts_us), 0) AS BIGINT)
                  AS sum_wait_us
         FROM ok GROUP BY 1""",

    // The q393 markup chain, the quality formula over the CLEAN text,
    // md5 min-id canonicals among survivors, per-source funnel.
    "q400_web_pipeline" ->
      """WITH d0 AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, 'mirror', text FROM documents
               WHERE doc_id % 5 = 0),
         h AS (SELECT doc_id, source,
                '<html><head><style>p{color:red}</style>'
                || '<script>var x=1;</script></head><body><h1>T&amp;X'
                || '</h1><p>' || text
                || '</p><a href="/x">link</a>'
                || CASE WHEN doc_id % 2 = 0
                     THEN '<img src="a.png"/>' ELSE '' END
                || '</body></html>' AS html
             FROM d0),
         cl AS (SELECT doc_id, source,
                  trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(
                        regexp_replace(regexp_replace(html,
                          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                        '<[^>]+>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS ct
                FROM h),
         sc AS (SELECT doc_id, source, ct,
                  greatest(least(CAST(floor(
                    round(0.5 * least(length(ct) / 500.0, 1.0)
                      + 0.5 * least(
                          len(regexp_extract_all(ct, '[A-Za-z0-9]+'))
                            * 1.0
                          / greatest(len(regexp_split_to_array(trim(ct),
                              '\s+')), 1), 1.0)
                      - len(regexp_extract_all(ct, '[.,;:!?]')) * 1.0
                        / greatest(length(ct), 1), 4) * 10000 + 0.5)
                    AS BIGINT), 10000), 0) AS q
                FROM cl),
         f AS (SELECT doc_id, source, ct, q >= 8000 AS pass,
                 CASE WHEN q >= 8000 THEN md5(lower(trim(
                   regexp_replace(ct, '\s+', ' ', 'g')))) END AS fp
               FROM sc),
         c AS (SELECT f.*, pass AND doc_id = min(CASE WHEN pass
                 THEN doc_id END) OVER (PARTITION BY fp) AS canon
               FROM f)
         SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
                CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quality,
                CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unique,
                CAST(coalesce(sum(CASE WHEN canon THEN
                  len(regexp_split_to_array(trim(ct), '\s+')) END), 0)
                  AS BIGINT) AS tokens_final
         FROM c GROUP BY 1""",

    // Synth round-trip (q155/q373 discipline): every parsed field is
    // doc_id arithmetic; the % 7 tear drops exactly the WET member.
    "q401_warc_walk" ->
      """WITH h AS (SELECT doc_id, source, text,
                '<html><body><h1>T&amp;' || doc_id || '</h1><p>' || text
                  || '</p></body></html>' AS html
             FROM documents)
         SELECT doc_id,
                CAST(CASE WHEN doc_id % 7 = 3 THEN 2 ELSE 3 END
                  AS BIGINT) AS n_records,
                doc_id % 7 = 3 AS truncated,
                CAST(200 AS BIGINT) AS status,
                'https://' || source || '.example.org/doc/' || doc_id
                  AS url,
                CAST(1600000000 + doc_id AS BIGINT) AS fetch_ts,
                'text/html; charset=utf-8' AS mime,
                CAST(octet_length(encode(html)) AS BIGINT) AS content_len,
                md5(html) AS body_md5,
                CASE WHEN doc_id % 7 = 3 THEN NULL ELSE md5(text) END
                  AS wet_md5
         FROM h""",

    // q400's funnel replayed from the WARC host: the walk's
    // (host, html) is pure synth arithmetic, the chain is q400's.
    "q402_warc_pipeline" ->
      """WITH d0 AS (SELECT doc_id, source, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, 'mirror', text FROM documents
               WHERE doc_id % 5 = 0),
         h AS (SELECT doc_id, source || '.example.org' AS host,
                '<html><head><style>p{color:red}</style>'
                || '<script>var x=1;</script></head><body><h1>T&amp;X'
                || '</h1><p>' || text
                || '</p><a href="/x">link</a>'
                || CASE WHEN doc_id % 2 = 0
                     THEN '<img src="a.png"/>' ELSE '' END
                || '</body></html>' AS html
             FROM d0),
         cl AS (SELECT doc_id, host,
                  trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                      regexp_replace(
                        regexp_replace(regexp_replace(html,
                          '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                          '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                        '<[^>]+>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS ct
                FROM h),
         sc AS (SELECT doc_id, host, ct,
                  greatest(least(CAST(floor(
                    round(0.5 * least(length(ct) / 500.0, 1.0)
                      + 0.5 * least(
                          len(regexp_extract_all(ct, '[A-Za-z0-9]+'))
                            * 1.0
                          / greatest(len(regexp_split_to_array(trim(ct),
                              '\s+')), 1), 1.0)
                      - len(regexp_extract_all(ct, '[.,;:!?]')) * 1.0
                        / greatest(length(ct), 1), 4) * 10000 + 0.5)
                    AS BIGINT), 10000), 0) AS q
                FROM cl),
         f AS (SELECT doc_id, host, ct, q >= 8000 AS pass,
                 CASE WHEN q >= 8000 THEN md5(lower(trim(
                   regexp_replace(ct, '\s+', ' ', 'g')))) END AS fp
               FROM sc),
         c AS (SELECT f.*, pass AND doc_id = min(CASE WHEN pass
                 THEN doc_id END) OVER (PARTITION BY fp) AS canon
               FROM f)
         SELECT host, CAST(count(*) AS BIGINT) AS n_raw,
                CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quality,
                CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_unique,
                CAST(coalesce(sum(CASE WHEN canon THEN
                  len(regexp_split_to_array(trim(ct), '\s+')) END), 0)
                  AS BIGINT) AS tokens_final
         FROM c GROUP BY 1""",

    // The repaired text for the double-encoded third IS the clean
    // suffix appended — DuckDB replays the recovery, not the bytes.
    "q403_fix_encoding" ->
      """SELECT doc_id,
                doc_id % 3 IN (0, 1) AS flagged,
                doc_id % 3 = 0 AS changed,
                CASE WHEN doc_id % 3 = 0 THEN md5(text || ' café – “x')
                     WHEN doc_id % 3 = 1 THEN md5(text || ' Ã© ¿')
                     ELSE md5(text) END AS text_md5
         FROM documents""",

    "q404_repair_report" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0
                  END) AS BIGINT) AS n_flagged,
                CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_repaired,
                CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_unrepairable,
                CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_flagged_after
         FROM documents GROUP BY 1""",

    // Disjoint pieces: every occurrence is position-disjoint (no shared
    // chars piece-to-piece or within a piece), so Viterbi token count =
    // chars − matches, and replace-length arithmetic counts matches.
    "q406_unigram_encode" ->
      """WITH t AS (SELECT source,
                lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
             FROM documents),
         c AS (SELECT source,
                 length(replace(s, ' ', '')) AS nch,
                 (length(s) - length(replace(s, 'th', ''))) // 2
                 + (length(s) - length(replace(s, 'an', ''))) // 2
                 + (length(s) - length(replace(s, 'ou', ''))) // 2
                 + (length(s) - length(replace(s, 'es', ''))) // 2 AS occ
               FROM t)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(nch - occ) AS BIGINT) AS tokens_unigram,
                CAST(sum(nch) AS BIGINT) AS n_chars,
                CAST(CASE WHEN sum(nch) = 0 THEN NULL
                  ELSE sum(nch - occ) * 1000000 // sum(nch) END
                  AS BIGINT) AS tokens_per_char_ppm
         FROM c GROUP BY 1""",

    "q367_damerau_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
         SELECT a.p_name AS name_1, b.p_name AS name_2,
                CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT)
                  AS dl_dist,
                CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist
         FROM n a JOIN n b
           ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
          AND a.p_name < b.p_name
         WHERE damerau_levenshtein(a.p_name, b.p_name) <= 3""",

    "q363_jw_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
         SELECT name_1, name_2, jw FROM (
           SELECT a.p_name AS name_1, b.p_name AS name_2,
                  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
           FROM n a JOIN n b
             ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
            AND a.p_name < b.p_name)
         WHERE jw >= 0.85""",

    "q222_fuzzy_pairs" ->
      """WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS nn
             FROM part GROUP BY 1),
         p AS (SELECT a.p_name AS name_1, b.p_name AS name_2,
                  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
                  a.nn * b.nn AS n_pairs
               FROM n a JOIN n b
                 ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
                AND a.p_name < b.p_name)
         SELECT name_1, name_2, dist, n_pairs FROM p WHERE dist <= 3""",

    // q38's sessions swept: ends before starts at equal instants
    // (delta asc), running sum IS the concurrency curve.
    "q223_peak_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
         g AS (SELECT user_id, ts_us, event_id,
                      CASE WHEN lag(ts_us) OVER w IS NULL
                                OR ts_us - lag(ts_us) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS news
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id, ts_us,
                      sum(news) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
               FROM g),
         sess AS (SELECT min(ts_us) AS st, max(ts_us) AS en
               FROM s GROUP BY user_id, sid),
         d AS (SELECT st // 86400000000 AS k, st AS t,
                  CAST(1 AS BIGINT) AS delta FROM sess
               UNION ALL
               SELECT st // 86400000000, en, CAST(-1 AS BIGINT) FROM sess),
         r AS (SELECT k, t, delta,
                  CAST(sum(delta) OVER (PARTITION BY k ORDER BY t, delta
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run,
                  CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS nd
               FROM d),
         pk AS (SELECT k, nd, run, t,
                  row_number() OVER (PARTITION BY k
                    ORDER BY run DESC, t ASC) AS rk
               FROM r)
         SELECT k AS sweep_key, CAST(nd // 2 AS BIGINT) AS n_intervals,
                run AS peak_concurrency, t AS peak_at_us
         FROM pk WHERE rk = 1""",

    // Trapezoid in exact centi·µs integers; one floor division at the end.
    "q224_twa" ->
      """WITH e AS (SELECT event_type AS s, epoch_us(ts) AS t, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             FROM events),
         l AS (SELECT s, t, c, lag(t) OVER w AS pt, lag(c) OVER w AS pc
               FROM e WINDOW w AS (PARTITION BY s ORDER BY t, event_id))
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(max(t) - min(t) AS BIGINT) AS span_us,
                CASE WHEN max(t) = min(t) THEN NULL
                     ELSE CAST(sum(CASE WHEN pt IS NOT NULL
                            THEN CAST(pc + c AS HUGEINT) * (t - pt)
                            ELSE 0 END)
                       // (2 * CAST(max(t) - min(t) AS HUGEINT)) AS BIGINT)
                END AS twa_centi
         FROM l GROUP BY 1""",

    "q217_curation_funnel" ->
      """WITH t AS (SELECT doc_id, source, text,
                  lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
           FROM documents),
         tr AS (SELECT * FROM t WHERE doc_id % 97 <> 0),
         q AS (SELECT doc_id, source, text, nt FROM (
                SELECT doc_id, source, text, nt,
                  round(0.5 * least(length(text) / 500.0, 1.0)
                    + 0.5 * least(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                        * 1.0
                        / greatest(len(regexp_split_to_array(trim(text),
                            '\s+')), 1), 1.0)
                    - len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                        / greatest(length(text), 1), 4) AS quality
                FROM tr)
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
                  CAST(sum(CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                           AS BIGINT))
                       OVER (PARTITION BY source ORDER BY md5(text), doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM s3)
         SELECT r.source,
                CAST(count(*) AS BIGINT) AS n_raw,
                CAST(COALESCE(qn.n, 0) AS BIGINT) AS n_quality,
                CAST(COALESCE(dn.n, 0) AS BIGINT) AS n_dedup,
                CAST(COALESCE(cn.n, 0) AS BIGINT) AS n_clean,
                CAST(COALESCE(bn.n, 0) AS BIGINT) AS n_budget
         FROM tr r
         LEFT JOIN (SELECT source, count(*) AS n FROM q GROUP BY 1) qn
           ON r.source = qn.source
         LEFT JOIN (SELECT source, count(*) AS n FROM s2 GROUP BY 1) dn
           ON r.source = dn.source
         LEFT JOIN (SELECT source, count(*) AS n FROM s3 GROUP BY 1) cn
           ON r.source = cn.source
         LEFT JOIN (SELECT source, count(*) AS n FROM s4
                    WHERE cum <= 800 GROUP BY 1) bn
           ON r.source = bn.source
         GROUP BY 1, qn.n, dn.n, cn.n, bn.n""",

    // q20's pair build, swept over integer ppm cutoffs.
    "q216_dedup_sweep" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM sh GROUP BY 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                  CAST(count(*) AS BIGINT) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         j AS (SELECT inter * 1000000 // (c1.n + c2.n - inter) AS jac
               FROM pr JOIN cnt c1 ON pr.id1 = c1.doc_id
                       JOIN cnt c2 ON pr.id2 = c2.doc_id),
         th AS (SELECT unnest([200000, 300000, 400000, 500000, 600000,
                  700000, 800000, 900000]) AS threshold_ppm)
         SELECT CAST(threshold_ppm AS BIGINT) AS threshold_ppm,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM th JOIN j ON j.jac >= th.threshold_ppm
         GROUP BY 1 ORDER BY 1""",

    // The aHash replayed arithmetically: same synth formulas, same 8x8
    // grid (w=16,h=12: x=2i, y=3j//2), same floor grayscale/mean/bits.
    "q215_image_phash" ->
      """WITH seeds AS (SELECT doc_id, doc_id % 17 AS s FROM documents),
         g AS (SELECT doc_id, s, k,
                 ((((k % 8) * 2) + ((k // 8) * 12 // 8) + s) % 256
                  + ((3 * ((k % 8) * 2) + 5 * ((k // 8) * 12 // 8)
                      + 11 * s) % 256)
                  + ((7 * ((k % 8) * 2) + 13 * ((k // 8) * 12 // 8)
                      + s) % 256)) // 3 AS gray
               FROM seeds, (SELECT unnest(range(0, 64)) AS k)),
         m AS (SELECT doc_id, s, CAST(sum(gray) // 64 AS BIGINT) AS mean
               FROM g GROUP BY 1, 2),
         h AS (SELECT g.doc_id,
                 CAST(sum(CASE WHEN gray > mean THEN
                     CASE WHEN k = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                          ELSE CAST(CAST(1 AS BIGINT) << k AS HUGEINT) END
                   ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS ahash
               FROM g JOIN m ON g.doc_id = m.doc_id
               GROUP BY 1)
         SELECT ahash, CAST(count(*) AS BIGINT) AS n_images,
                CAST(min(doc_id) AS BIGINT) AS min_doc
         FROM h GROUP BY 1""",

    // q67's shingle build, graded: distinct-shingle totals vs held-out
    // hits, floor-ppm.
    "q214_contamination" ->
      """WITH t AS (SELECT doc_id,
                  string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
           FROM documents),
         sh AS (SELECT DISTINCT doc_id,
                       toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM (SELECT doc_id, toks,
                             unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                      FROM t)),
         test_g AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
         train AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
               FROM train GROUP BY 1),
         hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
               FROM train WHERE g IN (SELECT g FROM test_g) GROUP BY 1)
         SELECT tot.doc_id, tot.n_shingles, hit.n_overlap,
                CAST(n_overlap * 1000000 // n_shingles AS BIGINT)
                  AS overlap_ppm
         FROM tot JOIN hit ON tot.doc_id = hit.doc_id
         ORDER BY overlap_ppm DESC, tot.doc_id ASC LIMIT 25""",

    // The q132 score replay, ranked two ways and folded through the
    // SAME integer discount constants.
    "q348_trimmed_mean" ->
      """WITH x AS (SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
         h AS (SELECT g, v, count(*) AS m FROM x GROUP BY 1, 2),
         c AS (SELECT g, v, m, sum(m) OVER (PARTITION BY g ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         ns AS (SELECT g, count(*) AS n,
                       count(*) * 100000 // 1000000 AS t
                FROM x GROUP BY 1),
         k AS (SELECT c.g, v, n,
                 greatest(0, least(cum, n - t) - greatest(cum - m, t)) AS keep
               FROM c JOIN ns ON c.g = ns.g)
         SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n_rows,
                CAST(sum(keep) AS BIGINT) AS n_kept,
                CAST(CASE WHEN sum(keep) = 0 THEN NULL
                     ELSE floor(CAST(sum(v * keep) AS DOUBLE) * 10.0
                       / CAST(sum(keep) AS DOUBLE) + 0.5) END AS BIGINT)
                  AS trimmed_mean_milli
         FROM k GROUP BY 1""",

    "q345_equidepth" ->
      """WITH x AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
             FROM lineitem WHERE l_extendedprice IS NOT NULL),
         h AS (SELECT v, count(*) AS m FROM x GROUP BY 1),
         c AS (SELECT v, m, sum(m) OVER (ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         n AS (SELECT count(*) AS n FROM x),
         ks AS (SELECT i AS bucket, (i * n.n + 8 - 1) // 8 AS t
                FROM range(1, 9) r(i), n),
         bounds AS (SELECT bucket, min(v) AS hi_centi
                    FROM c JOIN ks ON c.cum >= ks.t GROUP BY 1),
         cnt AS (SELECT v, m, min(bucket) AS bucket
                 FROM c JOIN bounds ON c.v <= bounds.hi_centi
                 GROUP BY 1, 2),
         bc AS (SELECT bucket, sum(m) AS n_rows FROM cnt GROUP BY 1)
         SELECT bounds.bucket, CAST(hi_centi AS BIGINT) AS hi_centi,
                CAST(coalesce(n_rows, 0) AS BIGINT) AS n_rows
         FROM bounds LEFT JOIN bc ON bounds.bucket = bc.bucket""",

    "q344_mrr_recall" ->
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
                FROM h WHERE term IN ('join', 'vector', 'slow', 'data')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, term,
                       CASE WHEN tf >= 2 THEN 1 ELSE 0 END AS rel,
                       CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                              / (tf + 1.2 * (0.25 + 0.75 * dl
                                             / (st.tt * 1.0 / st.nd)))
                              * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM (SELECT *, count(*) OVER (PARTITION BY term) AS df
                     FROM tf), st),
         rk AS (SELECT term, rel, row_number() OVER (PARTITION BY term
                  ORDER BY cm DESC, doc_id) AS rn FROM sc),
         tot AS (SELECT term, CAST(sum(rel) AS BIGINT) AS nrel
                 FROM sc GROUP BY 1),
         ink AS (SELECT term,
                   min(CASE WHEN rel = 1 THEN rn END) AS first_rk,
                   CAST(sum(rel) AS BIGINT) AS n_ink
                 FROM rk WHERE rn <= 10 GROUP BY 1)
         SELECT ink.term, tot.nrel AS n_relevant,
                CAST(coalesce(first_rk, 0) AS BIGINT) AS first_rank,
                CAST(CASE WHEN first_rk IS NULL THEN 0
                     ELSE 1000000 // first_rk END AS BIGINT) AS rr_ppm,
                CAST(CASE WHEN nrel = 0 THEN 0
                     ELSE n_ink * 1000000 // least(nrel, 10) END AS BIGINT)
                  AS recall_ppm
         FROM ink JOIN tot ON ink.term = tot.term""",

    "q213_ndcg" ->
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
                FROM h WHERE term IN ('join', 'vector', 'slow', 'data')
                GROUP BY 1, 2, 3),
         sc AS (SELECT doc_id, term, tf,
                       CAST(floor((st.nd - df + 0.5) / (df + 0.5) * (tf * 2.2)
                              / (tf + 1.2 * (0.25 + 0.75 * dl
                                             / (st.tt * 1.0 / st.nd)))
                              * 1000000.0 + 0.5) AS BIGINT) AS cm
               FROM (SELECT *, count(*) OVER (PARTITION BY term) AS df
                     FROM tf), st),
         d AS (SELECT i, w FROM (VALUES (1, 1000000), (2, 630929),
                 (3, 500000), (4, 430676), (5, 386852), (6, 356207),
                 (7, 333333), (8, 315464), (9, 301029), (10, 289064))
                 v(i, w)),
         rk AS (SELECT term, tf, row_number() OVER (PARTITION BY term
                  ORDER BY cm DESC, doc_id) AS rn FROM sc),
         ik AS (SELECT term, tf, row_number() OVER (PARTITION BY term
                  ORDER BY tf DESC, doc_id) AS rn FROM sc),
         dcg AS (SELECT term, CAST(sum(tf * w) AS BIGINT) AS dcg_micro
               FROM rk JOIN d ON rk.rn = d.i WHERE rn <= 10 GROUP BY 1),
         idcg AS (SELECT term, CAST(sum(tf * w) AS BIGINT) AS idcg_micro
               FROM ik JOIN d ON ik.rn = d.i WHERE rn <= 10 GROUP BY 1)
         SELECT dcg.term, dcg.dcg_micro, idcg.idcg_micro,
                CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT)
                  AS ndcg_ppm
         FROM dcg JOIN idcg ON dcg.term = idcg.term""",

    // Both rankings replayed with DuckDB list slicing + windows.
    "q211_matryoshka" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
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
                     FROM embeddings e, q WHERE e.vec_id <> q.qid))
         SELECT f.qid AS query_id, CAST(count(*) AS BIGINT) AS n_overlap,
                CAST(count(*) * 1000000 // 10 AS BIGINT) AS overlap_ppm
         FROM fr f JOIN pr p ON f.qid = p.qid AND f.vec_id = p.vec_id
         WHERE f.rn <= 10 AND p.rn <= 10
         GROUP BY 1""",

    // Per-probe neighbor-label matches replayed, then the same label
    // summary.
    "q212_label_noise" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv,
                  label AS qlabel
               FROM embeddings WHERE vec_id % 7 = 0),
         r AS (SELECT qid, qlabel, e.label,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
                     e.vec_id) AS rn
               FROM embeddings e, q WHERE e.vec_id <> q.qid),
         m AS (SELECT qid, qlabel,
                 CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                   AS BIGINT) AS nm
               FROM r WHERE rn <= 10 GROUP BY 1, 2)
         SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
                CAST(sum(nm) * 1000000 // (count(*) * 10) AS BIGINT)
                  AS agreement_ppm,
                CAST(sum(CASE WHEN nm * 2 < 10 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_suspect
         FROM m GROUP BY 1""",

    // Same two windows over the same observed-day table, floor-exact.
    "q210_seasonal_backtest" ->
      """WITH daily AS (SELECT event_type AS s,
                  epoch_us(ts) // 86400000000 AS d,
                  CAST(count(*) AS BIGINT) AS y
             FROM events GROUP BY 1, 2),
         w AS (SELECT s, d, y, d % 7 AS dow,
                 sum(y) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS ssum,
                 count(*) OVER (PARTITION BY s, d % 7 ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS scnt,
                 lag(y, 1) OVER (PARTITION BY s ORDER BY d) AS prev
               FROM daily),
         b AS (SELECT s, abs(y - ssum // 3) AS efc, abs(y - prev) AS env
               FROM w WHERE scnt = 3 AND prev IS NOT NULL)
         SELECT s AS event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(efc) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_seasonal,
                CAST(sum(env) * 1000 // count(*) AS BIGINT)
                  AS mae_milli_naive
         FROM b GROUP BY 1""",

    // Triangles replayed with the id-orientation (orientation-free
    // result): all three edges of a < b < c present.
    "q354_modularity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem WHERE l_partkey % 5 = 0),
         e AS (SELECT DISTINCT a.i AS x, b.i AS y
               FROM items a JOIN items b ON a.o = b.o AND a.i < b.i),
         deg AS (SELECT n, count(*) AS dg
               FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
               GROUP BY 1),
         m AS (SELECT count(*) AS m FROM e),
         perc AS (SELECT p.p_brand AS community,
                         CAST(count(*) AS BIGINT) AS n_nodes,
                         CAST(sum(coalesce(dg, 0)) AS BIGINT) AS degree_sum
                  FROM part p LEFT JOIN deg ON p.p_partkey = deg.n
                  WHERE p.p_partkey % 5 = 0
                  GROUP BY 1),
         intra AS (SELECT pa.p_brand AS community,
                          CAST(count(*) AS BIGINT) AS intra_edges
                   FROM e JOIN part pa ON e.x = pa.p_partkey
                          JOIN part pb ON e.y = pb.p_partkey
                   WHERE pa.p_brand = pb.p_brand
                   GROUP BY 1)
         SELECT perc.community, n_nodes,
                CAST(coalesce(intra_edges, 0) AS BIGINT) AS intra_edges,
                degree_sum,
                CAST((4 * m.m * coalesce(intra_edges, 0)
                      - degree_sum * degree_sum) * 1000000
                     // (4 * m.m * m.m) AS BIGINT) AS q_contrib_ppm
         FROM perc LEFT JOIN intra ON perc.community = intra.community
         CROSS JOIN m""",

    "q209_triangles" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
               FROM lineitem WHERE l_partkey % 5 = 0),
         e AS (SELECT DISTINCT a.i AS x, b.i AS y
               FROM items a JOIN items b ON a.o = b.o AND a.i < b.i),
         deg AS (SELECT n, CAST(count(*) AS BIGINT) AS degree
               FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e)
               GROUP BY 1),
         t AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
               FROM e e1 JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
               JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y),
         tn AS (SELECT n, CAST(count(*) AS BIGINT) AS nt
               FROM (SELECT a AS n FROM t UNION ALL SELECT b FROM t
                     UNION ALL SELECT c FROM t)
               GROUP BY 1)
         SELECT deg.n AS node, deg.degree,
                CAST(COALESCE(tn.nt, 0) AS BIGINT) AS n_triangles,
                CASE WHEN deg.degree < 2 THEN CAST(NULL AS BIGINT)
                     ELSE CAST(2 * COALESCE(tn.nt, 0) * 1000000
                       // (deg.degree * (deg.degree - 1)) AS BIGINT)
                END AS clustering_ppm
         FROM deg LEFT JOIN tn ON deg.n = tn.n
         ORDER BY n_triangles DESC, node ASC LIMIT 50""",

    // Ground truth: the aggregate over the FINAL table state, which the
    // maintained view must reproduce having seen only v0 + the feed.
    "q208_cdf_refresh" ->
      """WITH v1s AS (SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM orders WHERE o_totalprice <= 450000),
         v2s AS (SELECT o_orderkey,
                  CASE WHEN o_totalprice < 50000 THEN 'X'
                       ELSE o_orderstatus END AS o_orderstatus,
                  o_totalprice FROM v1s),
         upd AS (SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
               FROM orders WHERE o_orderkey % 100 = 0),
         v3 AS (SELECT * FROM v2s WHERE o_orderkey NOT IN
                  (SELECT o_orderkey FROM upd)
               UNION ALL SELECT * FROM upd)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM v3 GROUP BY 1""",

    // Pre-filtered brute force at q61's query point — exactness means the
    // IVF plan must reproduce it bit for bit.
    "q207_filtered_ivf" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
                    WHERE vec_id = 7)
         SELECT vec_id,
                round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                      / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                         * sqrt(list_dot_product(qv, qv))), 6) AS cos
         FROM embeddings, q WHERE vec_id <> 7 AND label = 1
         ORDER BY cos DESC, vec_id LIMIT 10""",

    // The resized-PNG corner pixels replayed from the synth formulas and
    // the floor source mapping (first pixel maps to source (0,0)).
    "q206_png_resize" ->
      """WITH p AS (SELECT doc_id,
                  10 + (doc_id % 7) * 2 AS sw,
                  8 + (doc_id % 5) * 2 AS sh,
                  doc_id % 97 AS seed
             FROM documents),
         m AS (SELECT doc_id, seed,
                 (5 * sw) // 6 AS sx, (3 * sh) // 4 AS sy
               FROM p)
         SELECT doc_id AS media_id, CAST(6 AS INT) AS width,
                CAST(4 AS INT) AS height,
                CAST(seed % 256 AS INT) AS first_r,
                CAST((11 * seed) % 256 AS INT) AS first_g,
                CAST(seed % 256 AS INT) AS first_b,
                CAST((sx + sy + seed) % 256 AS INT) AS last_r,
                CAST((3 * sx + 5 * sy + 11 * seed) % 256 AS INT) AS last_g,
                CAST((7 * sx + 13 * sy + seed) % 256 AS INT) AS last_b
         FROM m""",

    // The change images reconstructed relationally from the op chain:
    // v1 = delete tail, v2 = update sub-50k statuses, v3 = merge the
    // %100 keys (matched keys -> pre+post images, deleted-at-v1 keys
    // -> inserts).
    "q205_change_feed" ->
      """WITH v1s AS (SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM orders WHERE o_totalprice <= 450000),
         v2s AS (SELECT o_orderkey,
                  CASE WHEN o_totalprice < 50000 THEN 'X'
                       ELSE o_orderstatus END AS o_orderstatus,
                  o_totalprice FROM v1s),
         upd AS (SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice
               FROM orders WHERE o_orderkey % 100 = 0),
         img AS (
           SELECT 1 AS v, 'delete' AS change_type, o_orderstatus,
                  o_totalprice FROM orders WHERE o_totalprice > 450000
           UNION ALL
           SELECT 2, 'update_preimage', o_orderstatus, o_totalprice
             FROM v1s WHERE o_totalprice < 50000
           UNION ALL
           SELECT 2, 'update_postimage', 'X', o_totalprice
             FROM v1s WHERE o_totalprice < 50000
           UNION ALL
           SELECT 3, 'update_preimage', o_orderstatus, o_totalprice
             FROM v2s WHERE o_orderkey IN (SELECT o_orderkey FROM upd)
           UNION ALL
           SELECT 3, 'update_postimage', u.o_orderstatus, u.o_totalprice
             FROM upd u WHERE u.o_orderkey IN (SELECT o_orderkey FROM v2s)
           UNION ALL
           SELECT 3, 'insert', u.o_orderstatus, u.o_totalprice
             FROM upd u WHERE u.o_orderkey NOT IN
               (SELECT o_orderkey FROM v2s))
         SELECT CAST(v AS BIGINT) AS v, change_type,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents,
                CAST(sum(CASE WHEN o_orderstatus = 'X' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_x,
                CAST(sum(CASE WHEN o_orderstatus = 'M' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_m
         FROM img GROUP BY 1, 2""",

    // The mismatched-value-set SPJ replayed relationally.
    "q204_spj_multicol" ->
      """WITH b AS (SELECT o_orderstatus, o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n_right
             FROM orders WHERE o_orderstatus <> 'P' GROUP BY 1, 2)
         SELECT o.o_orderstatus, o.o_orderpriority,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents,
                CAST(max(n_right) AS BIGINT) AS n_right
         FROM orders o JOIN b USING (o_orderstatus, o_orderpriority)
         GROUP BY 1, 2""",

    "q181_partitioned_join" ->
      """SELECT c_mktsegment, o_orderstatus,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2""",

    // The metadata COUNT(col)/SUM readout recomputed from raw parquet.
    "q178_metadata_sum" ->
      """WITH w AS (SELECT l_orderkey,
                  CASE WHEN l_linenumber <> 1 THEN l_partkey END AS opt_part,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_cents
             FROM lineitem)
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(opt_part) AS BIGINT) AS n_with_part,
                CAST(sum(opt_part) AS BIGINT) AS sum_part,
                CAST(sum(price_cents) AS BIGINT) AS sum_cents
         FROM w""",

    // Phrase search replayed with the same anchor/slot arithmetic over
    // DuckDB's zipped unnest + generate_subscripts positions.
    "q361_proximity_search" ->
      """WITH toks AS (
           SELECT doc_id, unnest(a) AS term,
                  generate_subscripts(a, 1) - 1 AS pos
           FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS a
                 FROM documents)),
         pa AS (SELECT doc_id, pos AS p1 FROM toks WHERE term = 'scan'),
         pb AS (SELECT doc_id, pos AS p2 FROM toks WHERE term = 'column')
         SELECT pa.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(min(abs(p1 - p2)) AS BIGINT) AS min_dist
         FROM pa JOIN pb ON pa.doc_id = pb.doc_id
         WHERE abs(p1 - p2) <= 5
         GROUP BY 1""",

    "q177_phrase_search" ->
      """WITH toks AS (
           SELECT doc_id, unnest(a) AS term,
                  generate_subscripts(a, 1) - 1 AS pos
           FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS a
                 FROM documents)),
         m AS (SELECT doc_id, pos - slot AS anchor, slot
               FROM toks JOIN (VALUES (0, 'value'), (1, 'table'))
                 p(slot, w) ON toks.term = p.w
               WHERE pos - slot >= 0),
         h AS (SELECT doc_id, anchor FROM m GROUP BY 1, 2
               HAVING count(DISTINCT slot) = 2)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                CAST(min(anchor) AS BIGINT) AS first_pos
         FROM h GROUP BY 1""",

    // q82's full portable-LSH replay with a source join on both ends.
    "q194_source_neardup_matrix" ->
      s"""WITH $PortablePairsSql
         SELECT least(d1.source, d2.source) AS src_a,
                greatest(d1.source, d2.source) AS src_b,
                CAST(count(*) AS BIGINT) AS n_neardup_pairs
         FROM pr JOIN documents d1 ON pr.id1 = d1.doc_id
                 JOIN documents d2 ON pr.id2 = d2.doc_id
         GROUP BY 1, 2""",

    // Preference pairs replayed: same cells, same cross-multiplied
    // strict wins, same floor-centi margin gate.
    "q300_preference_pairs" ->
      """WITH cells AS (SELECT user_id AS e, event_type AS i,
                CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS HUGEINT) AS s,
                CAST(count(*) AS HUGEINT) AS n
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             AND value IS NOT NULL
           GROUP BY 1, 2)
         SELECT a.e AS entity, a.i AS chosen, b.i AS rejected,
                CAST((a.s * b.n - b.s * a.n) // (a.n * b.n) AS BIGINT)
                  AS margin_centi
         FROM cells a JOIN cells b ON a.e = b.e AND a.i <> b.i
         WHERE a.s * b.n > b.s * a.n
           AND (a.s * b.n - b.s * a.n) // (a.n * b.n) >= 500""",

    // Bitmap distinct's oracle is plain COUNT(DISTINCT): equality IS
    // the exactness claim.
    "q309_bitmap_distinct" ->
      """SELECT event_type,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
         FROM events WHERE user_id IS NOT NULL GROUP BY 1""",

    // Melt replayed as the explicit three-way UNION ALL.
    "q320_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
                  CAST(l_quantity AS BIGINT) AS value
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'discount_centi',
                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'tax_centi',
                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
           FROM lineitem WHERE l_orderkey % 50 = 0) u""",

    // First-day marking + running sum, replayed with the same windows.
    "q321_running_distinct" ->
      """WITH fd AS (SELECT event_type AS g, user_id AS k,
                CAST(min(ts) AS DATE) AS d
             FROM events
             WHERE event_type IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1, 2),
         daily AS (SELECT g, d, CAST(count(*) AS BIGINT) AS n_new
                   FROM fd GROUP BY 1, 2)
         SELECT g AS event_type, strftime(d, '%Y-%m-%d') AS d, n_new,
                CAST(sum(n_new) OVER (PARTITION BY g ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_distinct
         FROM daily ORDER BY event_type, d""",

    // Widening is metadata-only too: same source recompute.
    "q322_type_widening" ->
      """SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // The rename/drop cycle is metadata-only, so the oracle recomputes
    // the SAME rows straight from the source table.
    "q319_column_mapping" ->
      """SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q341_embedding_drift" ->
      """WITH j AS (SELECT d.source AS s, CAST(e.vec_id % 2 AS INTEGER) AS era,
                  list_transform(CAST(e.embedding AS DOUBLE[]),
                    x -> CAST(floor(x * 1000.0 + 0.5) AS HUGEINT)) AS v
             FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
             WHERE d.source IS NOT NULL),
         q AS (SELECT s, era, CAST(pos AS BIGINT) AS dim, v[pos] AS x
               FROM (SELECT s, era, v, unnest(range(1, len(v) + 1)) AS pos
                     FROM j)),
         sums AS (SELECT s, era, dim, CAST(count(*) AS HUGEINT) AS n,
                         sum(x) AS sm
                  FROM q GROUP BY 1, 2, 3),
         a AS (SELECT s, dim, n AS n0, sm AS s0 FROM sums WHERE era = 0),
         b AS (SELECT s, dim, n AS n1, sm AS s1 FROM sums WHERE era = 1),
         fj AS (SELECT coalesce(a.s, b.s) AS s, a.n0, a.s0, b.n1, b.s1
                FROM a FULL JOIN b ON a.s = b.s AND a.dim = b.dim),
         g AS (SELECT s, max(n0) AS n0, max(n1) AS n1,
                      sum((s0 * n1 - s1 * n0) * (s0 * n1 - s1 * n0)) AS num
               FROM fj GROUP BY 1)
         SELECT s AS source,
                CAST(coalesce(n0, 0) AS BIGINT) AS n_era0,
                CAST(coalesce(n1, 0) AS BIGINT) AS n_era1,
                CAST(CASE WHEN n0 IS NULL OR n1 IS NULL THEN NULL
                  ELSE floor(sqrt(CAST(num AS DOUBLE))
                    / (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE))
                    * 1000.0 + 0.5) END AS BIGINT) AS drift_micro
         FROM g""",

    "q340_cohens_d" ->
      """WITH x AS (SELECT l_returnflag = 'R' AS a,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS x
             FROM lineitem
             WHERE l_extendedprice IS NOT NULL
               AND l_returnflag IN ('R', 'N')),
         agg AS (SELECT
                   CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
                   CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS HUGEINT) AS n2,
                   coalesce(sum(CASE WHEN a THEN x END), 0) AS s1,
                   coalesce(sum(CASE WHEN NOT a THEN x END), 0) AS s2,
                   coalesce(sum(CASE WHEN a THEN x * x END), 0) AS q1,
                   coalesce(sum(CASE WHEN NOT a THEN x * x END), 0) AS q2
                 FROM x)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(NULL AS DOUBLE)
                  WHEN (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                   + (CAST(q2 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   <= 0.0 THEN CAST(NULL AS DOUBLE)
                  ELSE round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                   / sqrt(((CAST(q1 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                     + (CAST(q2 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
                    / CAST(n1 + n2 - 2 AS DOUBLE)), 6) END AS cohens_d
         FROM agg""",

    "q339_shapley" ->
      """WITH ev AS (SELECT user_id AS u, ts, event_type AS ch FROM events),
         conv AS (SELECT u, min(ts) AS ct FROM ev
                  WHERE ch = 'purchase' GROUP BY 1),
         touch AS (SELECT DISTINCT e.u, e.ch
                   FROM ev e JOIN conv ON e.u = conv.u
                   WHERE e.ts < conv.ct AND e.ch <> 'purchase'),
         chans AS (SELECT ch, row_number() OVER (ORDER BY ch) - 1 AS bit
                   FROM (SELECT DISTINCT ch FROM touch)),
         kk AS (SELECT CAST(count(*) AS INTEGER) AS k FROM chans),
         umask AS (SELECT u, sum(1 << bit) AS mask
                   FROM touch JOIN chans USING (ch) GROUP BY 1),
         mcnt AS (SELECT mask, count(*) AS c FROM umask GROUP BY 1),
         sets AS (SELECT unnest(range(0, 1 << k)) AS s FROM kk),
         v AS (SELECT s, coalesce(sum(c), 0) AS v
               FROM sets LEFT JOIN mcnt ON (mcnt.mask & sets.s) = mcnt.mask
               GROUP BY 1),
         f AS (SELECT a.n, CAST(coalesce(product(b.i), 1) AS HUGEINT) AS fact
               FROM (SELECT unnest(range(0, k + 1)) AS n FROM kk) a
               LEFT JOIN (SELECT unnest(range(1, k + 1)) AS i FROM kk) b
                 ON b.i <= a.n
               GROUP BY a.n),
         marg AS (SELECT chans.ch, sets.s,
                    CAST(bit_count(CAST(sets.s AS BIGINT)) AS INTEGER) AS sz,
                    (SELECT v FROM v WHERE v.s = (sets.s | (1 << bit)))
                      - (SELECT v FROM v WHERE v.s = sets.s) AS dv
                  FROM chans, sets
                  WHERE (sets.s & (1 << bit)) = 0),
         num AS (SELECT ch, sum(fs.fact * fk.fact * dv) AS num
                 FROM marg
                 JOIN f fs ON fs.n = marg.sz
                 JOIN f fk ON fk.n = (SELECT k FROM kk) - 1 - marg.sz
                 GROUP BY 1),
         tot AS (SELECT (SELECT v FROM v
                         WHERE s = (1 << (SELECT k FROM kk)) - 1) AS vfull,
                        (SELECT fact FROM f
                         WHERE n = (SELECT k FROM kk)) AS kfact)
         SELECT ch AS channel, CAST(num AS BIGINT) AS shapley_kfact,
                CAST(CASE WHEN vfull = 0 THEN 0
                     ELSE num * 1000000 // (kfact * vfull) END AS BIGINT)
                  AS share_ppm
         FROM num, tot""",

    "q337_weighted_median" ->
      """WITH x AS (SELECT l_returnflag AS g,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
                  CAST(l_quantity AS BIGINT) AS w
             FROM lineitem
             WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
               AND l_quantity IS NOT NULL AND l_quantity > 0),
         h AS (SELECT g, x, sum(w) AS m FROM x GROUP BY 1, 2),
         c AS (SELECT g, x, m,
                 sum(m) OVER (PARTITION BY g ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM h),
         ks AS (SELECT g, sum(w) AS tw,
                       (sum(w) + 1) // 2 AS k1,
                       (sum(w) + 2) // 2 AS k2
                FROM x GROUP BY 1)
         SELECT c.g AS l_returnflag,
                CAST(max(tw) AS BIGINT) AS total_weight,
                CAST(min(CASE WHEN cum >= k1 THEN x END)
                   + min(CASE WHEN cum >= k2 THEN x END) AS BIGINT)
                  AS wmedian2_centi
         FROM c JOIN ks ON c.g = ks.g
         GROUP BY 1""",

    "q338_cramers_v" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                  CAST(count(*) AS HUGEINT) AS o
               FROM orders GROUP BY 1, 2),
         r AS (SELECT a, sum(o) AS rt FROM cells GROUP BY 1),
         c AS (SELECT b, sum(o) AS ct FROM cells GROUP BY 1),
         nn AS (SELECT sum(o) AS n,
                       CAST(count(DISTINCT a) AS HUGEINT) AS r,
                       CAST(count(DISTINCT b) AS HUGEINT) AS c
                FROM cells),
         t AS (SELECT nn.n, nn.r, nn.c,
                 (coalesce(o, 0) * nn.n - rt * ct)
                 * (coalesce(o, 0) * nn.n - rt * ct) * 1000
                 // (rt * ct * nn.n) AS tt
               FROM r CROSS JOIN c CROSS JOIN nn
               LEFT JOIN cells ON cells.a = r.a AND cells.b = c.b),
         agg AS (SELECT n, r, c, sum(tt) AS chi2m FROM t GROUP BY 1, 2, 3)
         SELECT CAST(n AS BIGINT) AS n_rows,
                CAST(CASE WHEN r < 2 OR c < 2 THEN NULL ELSE chi2m END
                  AS BIGINT) AS chi2_milli,
                CASE WHEN r < 2 OR c < 2 OR n = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE round(sqrt(CAST(chi2m AS DOUBLE) / 1000.0
                    / (CAST(n AS DOUBLE)
                       * CAST(least(r - 1, c - 1) AS DOUBLE))), 6) END
                  AS cramers_v
         FROM agg""",

    "q336_brown_forsythe" ->
      """WITH x AS (SELECT event_type AS g,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
               FROM events
               WHERE event_type IS NOT NULL AND value IS NOT NULL),
         h AS (SELECT g, x, count(*) AS m FROM x GROUP BY 1, 2),
         c AS (SELECT g, x, m,
                 sum(m) OVER (PARTITION BY g ORDER BY x
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM h),
         ks AS (SELECT g, count(*) AS ng,
                       (count(*) + 1) // 2 AS k1,
                       (count(*) + 2) // 2 AS k2
                FROM x GROUP BY 1),
         med AS (SELECT c.g,
                   min(CASE WHEN cum >= k1 THEN x END)
                   + min(CASE WHEN cum >= k2 THEN x END) AS med2
                 FROM c JOIN ks ON c.g = ks.g GROUP BY 1),
         z AS (SELECT x.g, CAST(abs(2 * x.x - med2) AS HUGEINT) AS z
               FROM x JOIN med ON x.g = med.g),
         gs AS (SELECT g, CAST(count(*) AS HUGEINT) AS ng, sum(z) AS sg
                FROM z GROUP BY 1),
         t AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(z) AS sx,
                      sum(z * z) AS sxx
               FROM z),
         b AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                      sum(sg * sg * t.n // ng) AS ssbs,
                      any_value(t.n) AS n, any_value(t.sx) AS sx,
                      any_value(t.sxx) AS sxx
               FROM gs, t)
         SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_groups,
                CAST(CASE WHEN k < 2 OR n <= k
                          OR (n * sxx - sx * sx) - (ssbs - sx * sx) = 0
                     THEN NULL
                     ELSE (ssbs - sx * sx) * (n - k) * 1000
                          // (((n * sxx - sx * sx) - (ssbs - sx * sx))
                             * (k - 1)) END AS BIGINT) AS bf_f_milli
         FROM b""",

    "q335_source_tvd" ->
      """WITH wc AS (SELECT source AS s, w, count(*) AS c
             FROM (SELECT source,
                     unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
                   FROM documents WHERE source IS NOT NULL)
             WHERE length(w) > 0
             GROUP BY 1, 2),
         tot AS (SELECT s, sum(c) AS n FROM wc GROUP BY 1),
         pairs AS (SELECT a.s AS src_a, b.s AS src_b, a.n AS na, b.n AS nb
                   FROM tot a, tot b WHERE a.s < b.s),
         inn AS (SELECT a.s AS src_a, b.s AS src_b,
                        sum(abs(a.c * tb.n - b.c * ta.n)) AS si,
                        sum(a.c) AS sca, sum(b.c) AS scb
                 FROM wc a JOIN wc b ON a.w = b.w AND a.s < b.s
                 JOIN tot ta ON ta.s = a.s
                 JOIN tot tb ON tb.s = b.s
                 GROUP BY 1, 2)
         SELECT p.src_a, p.src_b,
                CAST((coalesce(si, 0)
                   + (na - coalesce(sca, 0)) * nb
                   + (nb - coalesce(scb, 0)) * na) * 1000000
                  // (2 * na * nb) AS BIGINT) AS tvd_ppm
         FROM pairs p LEFT JOIN inn
           ON p.src_a = inn.src_a AND p.src_b = inn.src_b""",

    "q333_mp3_vbr" ->
      """SELECT doc_id,
                CAST(100 + doc_id % 900 AS BIGINT) AS vbr_frames,
                CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                     ELSE 32000 END AS BIGINT) AS sample_rate,
                CAST((100 + doc_id % 900) * 1152 * 1000
                  // (CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                      ELSE 32000 END) AS BIGINT) AS duration_ms
         FROM documents""",

    "q334_avif_dims" ->
      """SELECT doc_id,
                CAST((doc_id % 200 + 1) * 2 AS BIGINT) AS width,
                CAST((doc_id % 100 + 1) * 3 AS BIGINT) AS height
         FROM documents""",

    "q358_zip_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 7 AS BIGINT) AS n_entries,
                CAST((1 + doc_id % 7) * (64 + (doc_id % 5) * 32) AS BIGINT)
                  AS total_bytes,
                CAST((1 + doc_id % 7) * (64 + (doc_id % 5) * 32) AS BIGINT)
                  AS compressed_bytes
         FROM documents""",

    "q359_tar_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 6 AS BIGINT) AS n_entries,
                CAST((1 + doc_id % 6) * (100 + (doc_id % 9) * 50) AS BIGINT)
                  AS total_bytes
         FROM documents""",

    "q352_ogg_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 2 AS BIGINT) AS codec,
                CAST(CASE WHEN doc_id % 2 = 1 THEN 48000
                     ELSE CASE doc_id % 3 WHEN 0 THEN 44100
                          WHEN 1 THEN 48000 ELSE 32000 END
                     END AS BIGINT) AS sample_rate,
                CAST(1 + doc_id % 2 AS BIGINT) AS channels,
                CAST(1000 + doc_id % 9000 AS BIGINT) AS n_samples
         FROM documents""",

    "q332_merge_apply" ->
      """WITH base AS (SELECT o_orderkey AS k,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
             FROM orders),
         final AS (
           SELECT k, cents + 12345 AS cents FROM base WHERE k % 7 = 1
           UNION ALL
           SELECT k, cents FROM base WHERE k % 7 NOT IN (0, 1)
           UNION ALL
           SELECT k + 1000000000 AS k, 77 AS cents FROM base WHERE k % 7 = 2)
         SELECT CAST(k % 10 AS BIGINT) AS bucket,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM final GROUP BY 1""",
  )
}
