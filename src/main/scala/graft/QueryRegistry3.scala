package graft

import graft.functions.{TextFunctions => T}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mechanical split of the `SparkEntry.queries` registry (chunk 3 of
  * 4) — entries verbatim from the original single map;
  * `SparkEntry` concatenates the chunks, so the contract is unchanged. */
private[graft] trait QueryRegistry3 { this: SparkEntry.type =>

  private[graft] def queriesChunk3: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Allen-relation histogram over the q396 substrate: HOW sessions
    // intersect the maintenance windows, not just whether.
    "q397_allen_relations" -> ((s, d) => {
      val sess = Sessions.sessionize(eventsUs(s, d), "user_id", "ts_us",
        "event_id", gapUs = 1800L * 1000000L)
        .select((col("user_id") * 1000000L + col("session_idx"))
          .as("sid"), col("start_us"),
          (col("end_us") + 1L).as("end_pad_us"))
      val dayUs = 86400L * 1000000L
      val windows = eventsUs(s, d)
        .select(expr(s"ts_us div ${dayUs}L").as("day")).distinct()
        .withColumn("slot", explode(typedLit(Seq(0, 1))))
        .select((col("day") * 2 + col("slot")).as("wid"),
          (col("day") * dayUs +
            (lit(3L) + col("slot") * 12L) * 3600000000L).as("w_start"),
          (col("day") * dayUs +
            (lit(5L) + col("slot") * 12L) * 3600000000L).as("w_end"))
      Sessions.intervalOverlapJoin(
          sess, "sid", "start_us", "end_pad_us",
          windows, "wid", "w_start", "w_end",
          binUs = 3600L * 1000000L)
        .groupBy("relation")
        .agg(count(lit(1)).as("n_pairs"),
          sum("overlap_us").cast("long").as("overlap_us_total"))
    }),

    // Hour-of-week activity heatmap: 168 exact cells (week anchored at
    // the epoch — hour 0 = Thursday 00:00 UTC), share in floor-ppm.
    "q398_hour_heatmap" -> ((s, d) =>
      eventsUs(s, d)
        .select(expr("(ts_us div 3600000000L) % 168").as("how"))
        .groupBy("how").agg(count(lit(1)).as("n_events"))
        .select(expr("how div 24").cast("long").as("dow_from_thu"),
          expr("how % 24").cast("long").as("hour"),
          col("n_events"),
          expr("n_events * 1000000 div (sum(n_events) OVER ())")
            .cast("long").as("share_ppm"))),

    // FORWARD as-of join with tolerance (the full merge_asof surface):
    // each non-purchase event enriched with the user's NEXT purchase
    // value within one day; per-type match rate + exact cents.
    "q399_asof_forward" -> ((s, d) => {
      val ev = eventsUs(s, d)
      val leftE = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts_us"), col("event_type"))
      // one right row per (user, ts): equal-timestamp right rows have
      // no deterministic ASOF order, so the max-cents collapse IS the
      // documented tiebreak
      val rightE = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us")
        .agg(max(floor(col("value") * 100 + 0.5).cast("long"))
          .as("cents"))
      AsOf.asofJoinDirected(leftE, rightE, "user_id", "ts_us",
          "cents", "next_cents", direction = "forward",
          toleranceUs = Some(86400L * 1000000L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("next_cents").isNotNull, 1L).otherwise(0L))
            .as("n_matched"),
          coalesce(sum("next_cents"), lit(0L)).cast("long")
            .as("sum_next_cents"),
          coalesce(sum(expr("next_cents_ts - ts_us")), lit(0L))
            .cast("long").as("sum_wait_us"))
    }),

    // End-to-end WEB corpus build: planted markup → htmlExtract →
    // quality gate on the CLEAN text → exact dedup among survivors →
    // per-source funnel with final token mass — q140's funnel with the
    // markup-strip stage in front, the full crawl-curation chain.
    "q400_web_pipeline" -> ((s, d) => {
      val docs0 = Tables.documents(s, d)
      // mirrored fifth: true duplicates under a different source — the
      // dedup stage must fold them onto the original (min id wins)
      val base = docs0.select(col("doc_id"), col("source"), col("text"))
        .unionByName(docs0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            lit("mirror").as("source"), col("text")))
      val planted = base.select(col("doc_id"),
        col("source"), concat(
          lit("<html><head><style>p{color:red}</style>" +
            "<script>var x=1;</script></head><body><h1>T&amp;X</h1><p>"),
          col("text"),
          lit("</p><a href=\"/x\">link</a>"),
          when(col("doc_id") % 2 === 0, lit("<img src=\"a.png\"/>"))
            .otherwise(lit("")),
          lit("</body></html>")).as("html"))
      val cleaned = Corpus.htmlExtract(planted, "doc_id", "html")
        .join(planted.select("doc_id", "source"), Seq("doc_id"))
      val scored = cleaned.withColumn("graft_q",
        greatest(least(floor(T.qualityScore(col("clean_text")) * 10000
          + 0.5), lit(10000L)), lit(0L)).cast("long"))
        .withColumn("graft_pass", col("graft_q") >= 8000L)
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy("graft_fp")
      val flagged = scored
        .withColumn("graft_fp",
          when(col("graft_pass"), T.fingerprint(col("clean_text"))))
        .withColumn("graft_canon",
          col("graft_pass") &&
            col("doc_id") === min(when(col("graft_pass"),
              col("doc_id"))).over(wFp))
      flagged.groupBy("source")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("graft_pass"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("graft_canon"), 1L).otherwise(0L)).as("n_unique"),
          coalesce(sum(when(col("graft_canon"),
            T.wsTokens(col("clean_text")).cast("long"))), lit(0L))
            .cast("long").as("tokens_final"))
    }),

    // WARC container walk (ISO 28500): each doc becomes a 3-record
    // .warc.gz (warcinfo + HTTP response carrying HTML + WET
    // conversion), one gzip member per record (the CommonCrawl shape);
    // the real walk inflates members, parses records, splits the HTTP
    // payload. Every emitted field is synth arithmetic the oracle
    // replays; doc_id % 7 == 3 tears the last member mid-block —
    // partial-count degradation keeps the response, drops the WET.
    "q401_warc_walk" -> ((s, d) => {
      import s.implicits._
      // gzip synth + container walk per row is heavy typed-map work:
      // spread a low-split scan first (guide §2.5; identity at scale).
      Tables.spread(Tables.documents(s, d).select(col("doc_id"),
          col("source"), col("text")))
        .as[(Long, String, String)]
        .map { case (id, src, text) =>
          val html = s"<html><body><h1>T&amp;$id</h1><p>$text" +
            "</p></body></html>"
          val uri = s"https://$src.example.org/doc/$id"
          val full = multimodal.Warc.synthWarcGz(uri, 1600000000L + id,
            html, text)
          val bytes = if (id % 7 == 3) full.take(full.length - 12) else full
          val (recs, torn) = multimodal.Warc.walkGz(bytes)
          val resp = recs.find(_.warcType == "response")
          val http = resp.flatMap(r =>
            multimodal.Warc.httpResponse(r.payload))
          val wet = recs.find(_.warcType == "conversion")
          (id, recs.size.toLong, torn,
            http.map(_._1.toLong),
            resp.map(_.targetUri),
            resp.map(r => multimodal.Warc.dateEpochSec(r.date)),
            http.map(_._2),
            http.map(_._3.length.toLong),
            http.map(h => new String(h._3, "UTF-8")),
            wet.map(w => new String(w.payload, "UTF-8")))
        }
        .toDF("doc_id", "n_records", "truncated", "status", "url",
          "fetch_ts", "mime", "content_len", "graft_body", "graft_wet")
        .select(col("doc_id"), col("n_records"), col("truncated"),
          col("status"), col("url"), col("fetch_ts"), col("mime"),
          col("content_len"), md5(col("graft_body")).as("body_md5"),
          md5(col("graft_wet")).as("wet_md5"))
    }),

    // q400 re-plumbed to START from the crawl container: synthesize
    // the mirrored corpus INTO .warc.gz bytes, walk them back to the
    // (host, html) table with the real record walk + HTTP split, then
    // run the same extract → quality gate → exact dedup → funnel,
    // grouped by the crawl host instead of the source label.
    "q402_warc_pipeline" -> ((s, d) => {
      import s.implicits._
      val docs0 = Tables.documents(s, d)
      val base = docs0.select(col("doc_id"), col("source"), col("text"))
        .unionByName(docs0.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            lit("mirror").as("source"), col("text")))
      val pages = Tables.spread(base).as[(Long, String, String)]
        .map { case (id, src, text) =>
          val html = "<html><head><style>p{color:red}</style>" +
            "<script>var x=1;</script></head><body><h1>T&amp;X</h1><p>" +
            text + "</p><a href=\"/x\">link</a>" +
            (if (id % 2 == 0) "<img src=\"a.png\"/>" else "") +
            "</body></html>"
          val uri = s"https://$src.example.org/doc/$id"
          val bytes = multimodal.Warc.synthWarcGz(uri,
            1600000000L + id, html, text)
          val (recs, _) = multimodal.Warc.walkGz(bytes)
          val resp = recs.find(_.warcType == "response").get
          val body = multimodal.Warc.httpResponse(resp.payload).get._3
          val host = resp.targetUri
            .stripPrefix("https://").takeWhile(_ != '/')
          (id, host, new String(body, "UTF-8"))
        }.toDF("doc_id", "host", "html")
      val cleaned = Corpus.htmlExtract(pages, "doc_id", "html")
        .join(pages.select("doc_id", "host"), Seq("doc_id"))
      val scored = cleaned.withColumn("graft_q",
        greatest(least(floor(T.qualityScore(col("clean_text")) * 10000
          + 0.5), lit(10000L)), lit(0L)).cast("long"))
        .withColumn("graft_pass", col("graft_q") >= 8000L)
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy("graft_fp")
      val flagged = scored
        .withColumn("graft_fp",
          when(col("graft_pass"), T.fingerprint(col("clean_text"))))
        .withColumn("graft_canon",
          col("graft_pass") &&
            col("doc_id") === min(when(col("graft_pass"),
              col("doc_id"))).over(wFp))
      flagged.groupBy("host")
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("graft_pass"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("graft_canon"), 1L).otherwise(0L)).as("n_unique"),
          coalesce(sum(when(col("graft_canon"),
            T.wsTokens(col("clean_text")).cast("long"))), lit(0L))
            .cast("long").as("tokens_final"))
    }),

    // Mojibake repair round-trip (ftfy stage): a third of the docs get
    // REAL double-encoding damage (the clean suffix's UTF-8 bytes
    // mis-decoded as cp1252 — computed, not hand-typed), a third get a
    // flagged-but-invalid tail (stray continuation byte 0xBF: the
    // strict re-decode must refuse), a third stay clean. The repair
    // recovers the clean suffix byte-exactly; md5 proves it.
    "q403_fix_encoding" -> ((s, d) => {
      val cleanSuffix = " café – “x"
      val corrupt = new String(cleanSuffix.getBytes("UTF-8"),
        "windows-1252")
      val planted = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(corrupt)))
          .when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" Ã© ¿")))
          .otherwise(col("text")).as("text"))
      Corpus.repairEncodingDocs(planted, "text")
        .select(col("doc_id"), col("graft_flag").as("flagged"),
          (col("repaired") =!= col("text")).as("changed"),
          md5(col("repaired")).as("text_md5"))
    }),

    // The per-source repair report over the same plant: detect → fix →
    // re-audit closed loop (flagged_after is RECOMPUTED on the repaired
    // text, so it proves the artifacts are gone, not just counted).
    "q404_repair_report" -> ((s, d) => {
      val cleanSuffix = " café – “x"
      val corrupt = new String(cleanSuffix.getBytes("UTF-8"),
        "windows-1252")
      val planted = Tables.documents(s, d).select(col("doc_id"),
        col("source"),
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(corrupt)))
          .when(col("doc_id") % 3 === 1,
            concat(col("text"), lit(" Ã© ¿")))
          .otherwise(col("text")).as("text"))
      Corpus.repairEncoding(planted, "text", "source")
    }),

    // Unigram-LM (SentencePiece) tokenizer fit: substring seed → EM
    // with micro-quantized expected counts → likelihood-loss prune to
    // 64 pieces. Float EM ⇒ rows-only contract (the ML-family rule);
    // UnigramSpec pins distributed==local bit-equality and the encode
    // key (q406) carries the cross-engine oracle.
    "q405_unigram_vocab" -> ((s, d) =>
      UnigramLm.unigramVocab(Tables.documents(s, d), "text",
        vocabSize = 64, emIters = 2)),

    // Viterbi unigram ENCODE under the pinned disjoint-alphabet piece
    // table: token count has the closed form chars − Σ occurrences
    // (pieces share no characters, so Viterbi takes every occurrence
    // and DuckDB replays the count by replace-length arithmetic).
    "q406_unigram_encode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          UnigramLm.unigramTokenCount(col("text"),
            UnigramLm.DisjointPieces).as("graft_tok"),
          length(regexp_replace(T.normText(col("text")), " ", ""))
            .cast("long").as("graft_ch"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("graft_tok").cast("long").as("tokens_unigram"),
          sum("graft_ch").cast("long").as("n_chars"))
        .withColumn("tokens_per_char_ppm",
          expr("CASE WHEN n_chars = 0 THEN CAST(NULL AS BIGINT)" +
            " ELSE tokens_unigram * 1000000 div n_chars END"))),

    // Cross-source duplication Venn (q193's mirrored corpus): content
    // bucketed by how many distinct sources carry it — the syndication
    // spread histogram a dedup rollout is sized by.
    "q364_source_venn" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mirrored = docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("source", lit("mirror")))
      Dedup.sourceVenn(mirrored, "doc_id", "text", "source")
    }),

    // Session entry/exit profile: which event types open and close the
    // q38 gap-rule sessions, and which bounce — landing/leave-page
    // analytics in exact integers.
    "q365_entry_exit" -> ((s, d) =>
      Sessions.entryExit(eventsUs(s, d), "user_id", "ts_us", "event_id",
        "event_type", gapUs = 1800L * 1000000L)),

    // Bitmap exact distinct: OR-merged Roaring-style containers per
    // event type — exact where HLL is ±2%, partials combine map-side.
    "q309_bitmap_distinct" -> ((s, d) =>
      Analytics.bitmapDistinct(Tables.events(s, d), "event_type",
        "user_id")),

    // Label-propagation communities on the supplier↔part co-supply
    // graph (the q131 substrate): synchronous min-tiebreak rounds,
    // oracle unrolls all three.
    "q313_label_prop" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      Graph.labelPropagation(li, "sk", "pk", iters = 3, topK = 20)
    }),

    // Poisson-bootstrap variance of per-type mean value: the at-scale
    // bootstrap — one pass, 32 hash-weighted replicates, map-combined.
    "q314_poisson_boot" -> ((s, d) =>
      Experiment.poissonBootstrap(Tables.events(s, d), "event_type",
        "value", "event_id", replicas = 32)),

    // Wide→long melt (pandas .melt / SQL UNPIVOT): the reshape every
    // feature-comparison surface runs before a per-metric groupBy —
    // Spark's native unpivot, so Catalyst sees one Expand, not 3 scans.
    "q320_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("quantity"),
          floor(col("l_discount") * 100 + 0.5).cast("long")
            .as("discount_centi"),
          floor(col("l_tax") * 100 + 0.5).cast("long").as("tax_centi"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount_centi"), col("tax_centi")),
          "metric", "value")),

    // Cumulative distinct users per event type by day: each key counted
    // on its FIRST day only (one keyed aggregate), running sum over the
    // tiny (type, day) table — never a per-day expanding re-scan.
    "q321_running_distinct" -> ((s, d) =>
      Analytics.runningDistinct(Tables.events(s, d), "event_type",
        "ts_t", "user_id")),

    // Type widening end-to-end: int data files under a widened-to-long
    // schema, plus post-widen rows only a long can hold — the oracle
    // recomputes from the source, proving both eras decode exactly.
    "q322_type_widening" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_wid_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity").cast("int").as("qty"))
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.widenColumnType(dir, "qty", "bigint")
      li.filter(col("l_orderkey") % 2 === 1)
        .select(col("l_orderkey"), col("qty").cast("bigint").as("qty"))
        .write.format(fmt).option("path", dir).mode("append").save()
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_qty").cast("long").as("sum_qty"))
    }),

    // Per-source embedding-centroid drift between doc_id-parity eras:
    // exact integer numerator, float only in the final sqrt/divide.
    "q341_embedding_drift" -> ((s, d) =>
      Analytics.centroidDrift(
        Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding"))
          .join(Tables.documents(s, d).select("doc_id", "source"),
            Seq("doc_id"))
          .withColumn("era", (col("doc_id") % 2).cast("int")),
        "source", "era", "embedding")),

    // Exact 10%-trimmed mean per return flag: histogram rank-interval
    // overlap arithmetic, no sort, no approx.
    "q348_trimmed_mean" -> ((s, d) =>
      Analytics.trimmedMean(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", trimPpm = 100000L)),

    // Exact equi-depth histogram of prices: order-statistic boundaries
    // on the cumulative value histogram, honest tie-skewed depths.
    "q345_equidepth" -> ((s, d) =>
      Analytics.equiDepthHistogram(Tables.lineitem(s, d),
        "l_extendedprice", k = 8)),

    // Cohen's d effect size between the R and N return cohorts' prices.
    "q340_cohens_d" -> ((s, d) =>
      Analytics.cohensD(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", groupA = "R", groupB = "N")),

    // Exact Shapley attribution: coalition subset-sums from ONE corpus
    // pass, k!-scaled integer Shapley values on the 2^k lattice.
    "q339_shapley" -> ((s, d) =>
      Sessions.shapleyAttribution(Tables.events(s, d), "user_id", "ts",
        "event_type", convChannel = "purchase")),

    // Exact weighted median: price order statistic weighted by quantity
    // per return flag — histogram + cumulative weight, doubled centi.
    "q337_weighted_median" -> ((s, d) =>
      Analytics.weightedMedian(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", "l_quantity")),

    // Cramér's V effect size over the order-priority × status table —
    // exact chi-square arithmetic, one round-6 sqrt.
    "q338_cramers_v" -> ((s, d) =>
      Analytics.cramersV(Tables.orders(s, d), "o_orderpriority",
        "o_orderstatus")),

    // Brown-Forsythe variance-homogeneity test: exact ANOVA on doubled
    // absolute deviations from per-group medians (histogram order-stats).
    "q336_brown_forsythe" -> ((s, d) =>
      Analytics.brownForsythe(Tables.events(s, d), "event_type", "value")),

    // Pairwise source-distribution total-variation distance in exact
    // ppm: shared-word inner join + closed-form exclusive-mass
    // corrections — no ratios, no full-outer join.
    "q335_source_tvd" -> ((s, d) =>
      Analytics.sourceTvdMatrix(Tables.documents(s, d), "source", "text")),

    // Xing VBR header decode: real first-frame tag walk over
    // deterministic fixtures; the declared frame count and the duration
    // arithmetic replay in SQL.
    "q333_mp3_vbr" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val sr = (id % 3L).toInt
          val fr = 100L + id % 900L
          val got = multimodal.Binary.mp3VbrMeta(
            multimodal.Binary.synthXingMp3(sr, fr, mono = id % 2L == 0L))
          (id, got.map(_._1).getOrElse(-1L),
            got.map(_._2.toLong).getOrElse(-1L),
            got.map(_._3).getOrElse(-1L))
        }.toDF("doc_id", "vbr_frames", "sample_rate", "duration_ms")
    }),

    // ZIP central-directory walk over JDK-written STORED fixtures: the
    // archive-indexing question (members, bytes) answered from EOCD+CD
    // only, payloads never read; counts/sizes replay arithmetically.
    "q358_zip_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val entries = 1 + (id % 7L).toInt
          val per = 64 + (id % 5L).toInt * 32
          val got = multimodal.Binary.zipMeta(
            multimodal.Binary.synthZip(entries, per))
            .getOrElse((-1, -1L, -1L))
          (id, got._1.toLong, got._2, got._3)
        }.toDF("doc_id", "n_entries", "total_bytes", "compressed_bytes")
    }),

    // POSIX ustar header walk: hop by declared octal sizes, count
    // regular members, never read payloads.
    "q359_tar_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val entries = 1 + (id % 6L).toInt
          val per = 100 + (id % 9L).toInt * 50
          val got = multimodal.Binary.tarMeta(
            multimodal.Binary.synthTar(entries, per))
            .getOrElse((-1, -1L))
          (id, got._1.toLong, got._2)
        }.toDF("doc_id", "n_entries", "total_bytes")
    }),

    // OGG Vorbis/Opus identification-header decode: real page walk over
    // deterministic fixtures (even ids Vorbis with a table rate, odd
    // ids Opus at the RFC-fixed 48 kHz granule rate); the synth
    // arithmetic replays in SQL.
    "q352_ogg_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val codec = 1 + (id % 2L).toInt
          val rate = Seq(44100, 48000, 32000)((id % 3L).toInt)
          val ch = 1 + (id % 2L).toInt
          val n = 1000L + id % 9000L
          val got = multimodal.Binary.oggMeta(
            multimodal.Binary.synthOgg(codec, rate, ch, n))
            .getOrElse((-1, -1, -1, -1L))
          (id, got._1.toLong, got._2.toLong, got._3.toLong, got._4)
        }.toDF("doc_id", "codec", "sample_rate", "channels", "n_samples")
    }),

    // AVIF/HEIC dimensions via the ISO-BMFF ispe item property — the
    // modern-codec leg of the dimension family, fixture-driven with
    // SQL-derivable expected values.
    "q334_avif_dims" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val w = ((id % 200L).toInt + 1) * 2
          val h = ((id % 100L).toInt + 1) * 3
          val brand = if (id % 2L == 0L) "avif" else "heic"
          val got = multimodal.Binary.avifDims(
            multimodal.Binary.synthAvif(w, h, brand))
          (id, got.map(_._1.toLong).getOrElse(-1L),
            got.map(_._2.toLong).getOrElse(-1L))
        }.toDF("doc_id", "width", "height")
    }),

    // MoR MERGE with a DELETE clause (CDC apply at the table-format
    // level): one change batch carrying tombstones, updates and inserts;
    // matched rows die behind vectors, only non-tombstones append. The
    // oracle recomputes the final table from source arithmetic.
    "q332_merge_apply" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_app_")
      val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      base.write.format(fmt).option("path", dir).mode("overwrite").save()
      val changes = base.filter(col("k") % 7 === 0)
        .select(col("k"), col("cents"), lit(true).as("is_delete"))
        .unionByName(base.filter(col("k") % 7 === 1)
          .select(col("k"), (col("cents") + 12345L).as("cents"),
            lit(false).as("is_delete")))
        .unionByName(base.filter(col("k") % 7 === 2)
          .select((col("k") + 1000000000L).as("k"),
            lit(77L).as("cents"), lit(false).as("is_delete")))
      sources.WarehouseSink.applyChangesMoR(s, dir, changes,
        keyCols = Seq("k"), deleteCol = "is_delete")
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_cents").cast("long").as("sum_cents"))
    }),

    // Initial-default column end-to-end: write an era WITHOUT the
    // column, addColumnWithDefault (metadata-only), append an era WITH
    // real values — old-era rows must read the default, new-era rows
    // their stored values; the oracle recomputes both eras from source.
    "q331_column_default" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_def_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qty"))
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.addColumnWithDefault(dir, "grade", "string",
        "legacy")
      li.filter(col("l_orderkey") % 2 === 1)
        .withColumn("grade",
          when(col("qty") >= 25, "high").otherwise("low"))
        .write.format(fmt).option("path", dir).mode("append").save()
      s.read.format(fmt).option("path", dir).load()
        .groupBy("grade")
        .agg(count(lit(1)).as("n_rows"),
          sum("qty").cast("long").as("sum_qty"))
    }),

    // Multi-seed BFS over the supplier↔part bipartite graph: exact
    // shortest-hop expansion curve, frontier-driven, 3 unrolled rounds.
    "q330_bfs_hops" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey").as("sk"),
        (col("l_partkey") + lit(10000000L)).cast("long").as("pk"))
      // Both edge directions from ONE scan (explode of a 2-struct array)
      // — the union form scanned the input twice (guide §2.4).
      val edges = li.select(explode(array(
          struct(col("sk").as("src"), col("pk").as("dst")),
          struct(col("pk").as("src"), col("sk").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      Graph.bfsHops(edges, "src", "dst", seeds = Seq(1L, 2L, 3L),
        maxHops = 3)
    }),

    // Concentration panel: exact Gini / HHI / top-share of per-user
    // event volume within each event type — pure ppm integer arithmetic.
    "q329_concentration" -> ((s, d) =>
      Analytics.concentrationPanel(Tables.events(s, d), "event_type",
        "user_id")),

    // Mann-Whitney U on a heavily-tied integer metric (quantity 1..50):
    // doubled midranks keep U and the tie term exact; z replays through
    // the explicitly-ordered double/sqrt expression.
    "q328_mann_whitney" -> ((s, d) =>
      Analytics.mannWhitneyU(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity", groupA = "R", groupB = "N")),

    // Welch's unequal-variance t-test (t² + Welch–Satterthwaite df,
    // integral milli/micro fixed points, three documented floors the
    // oracle mirrors): do returned and kept line items differ in mean
    // extended price?
    "q356_welch_t" -> ((s, d) =>
      Analytics.welchT(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", groupA = "R", groupB = "N")),

    // Span-dedup sensitivity: corpus removal volume at k in {6, 8, 12}
    // — the knob audit before committing to one anchor length.
    "q349_span_sweep" -> ((s, d) =>
      Dedup.spanSensitivity(Tables.documents(s, d), "doc_id", "text",
        ks = Seq(6, 8, 12))),

    // Incremental span dedup: odd-doc batch checked against the
    // even-doc corpus gram store — spans found at admission, zero
    // corpus re-scan.
    "q347_span_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = Dedup.gramStore(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", k = 8)
      Dedup.dupSpansVsStore(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", k = 8,
        store)
    }),

    // Per-doc novelty: share of shingles unique to the doc corpus-wide
    // (the inverse near-dup readout; template sludge scores ~0).
    "q346_novelty" -> ((s, d) =>
      Dedup.noveltyRate(Tables.documents(s, d), "doc_id", "text", n = 3)),

    // Span-dedup action readout: what the removal pass deletes per
    // source — the corpus-curation decision table over q326.
    "q342_span_clean" -> ((s, d) =>
      Dedup.spanCleanReportFromSpans(Tables.documents(s, d), "doc_id",
        "text", "source", dupSpans8(s, d))),

    // Span-removal REWRITE: splice every duplicated-span interval out of
    // the token stream and re-materialize clean_text — untouched docs
    // byte-identical, touched docs rebuilt from original-case tokens;
    // tokens_after == n_tokens - tokens_removed asserted in-query.
    "q350_span_rewrite" -> ((s, d) =>
      Dedup.removeSpansFromSpans(Tables.documents(s, d), "doc_id", "text",
        dupSpans8(s, d))),

    // Exact duplicated-SPAN detection (substring-level dedup, the Lee
    // et al. suffix-array rung in bucketed k-gram-anchor form): spans of
    // ≥ 8 tokens shared verbatim across documents, found exactly via
    // shared-gram coverage + doc-keyed island merge. No pair join.
    "q325_dup_spans" -> ((s, d) => dupSpans8(s, d)),

    // Per-doc duplicated-span rollup: how much of each document is
    // copied verbatim elsewhere in the corpus (integer-ppm).
    "q326_span_report" -> ((s, d) =>
      Dedup.dupSpanReportFromSpans(Tables.documents(s, d), "doc_id",
        "text", dupSpans8(s, d))),

    // REAL BPE tokenizer encode, oracle-proven: the codegen'd BpeTokens
    // expression under Vocab.DisjointMerges, whose non-interacting pairs
    // give the token count a closed form the DuckDB oracle computes
    // independently (|non-space chars| − Σ pair occurrences). Interacting
    // merge tables are BpeSpec territory (SQL can't replay the loop).
    "q323_bpe_encode" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        Vocab.bpeTokenCount(col("text"), Vocab.DisjointMerges)
          .as("n_tokens"))),

    // q104's token budget recounted with the REAL tokenizer: per-source
    // deterministic admission until the cumulative BPE token count
    // crosses the budget.
    "q324_bpe_budget" -> ((s, d) =>
      Vocab.bpeTokenBudgetCap(Tables.documents(s, d), "doc_id", "text",
        "source", budget = 4000L, Vocab.DisjointMerges)),

    // Column mapping end-to-end: write → RENAME (metadata-only, field
    // ids) → append under the new name → DROP a column → read both file
    // eras back; the oracle recomputes from the source, so the hash
    // proves the id resolution returned every pre-rename value.
    "q319_column_mapping" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_ren_")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_partkey"), col("l_quantity").cast("long").as("q0"))
      li.filter(col("l_orderkey") % 2 === 0)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      sources.WarehouseSink.renameColumn(dir, "q0", "qty")
      li.filter(col("l_orderkey") % 2 === 1)
        .select(col("l_orderkey"), col("l_partkey"), col("q0").as("qty"))
        .write.format(fmt).option("path", dir).mode("append").save()
      sources.WarehouseSink.dropColumn(dir, "l_partkey")
      s.read.format(fmt).option("path", dir).load()
        .groupBy((col("l_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("qty").as("sum_qty"))
        .select(col("bucket").cast("long").as("bucket"), col("n_rows"),
          col("sum_qty").cast("long").as("sum_qty"))
    }),

    // Prefix-filter EXACT similarity self-join: identical answer to the
    // brute-force all-pairs oracle — the rarest-first prefix index is
    // provably lossless, and the hash match IS the losslessness proof.
    "q317_prefix_jaccard" -> ((s, d) =>
      Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.5)),

    // FP-Growth frequent itemsets (PFP) over per-user event-type
    // baskets, exact integer support threshold, lattice to triples.
    "q318_fp_growth" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"))
      val n = ev.filter(col("user_id").isNotNull &&
        col("event_type").isNotNull).select("user_id").distinct().count()
      ml.Fpm.frequentItemsets(ev, "user_id", "event_type",
        minCount = math.max(2L, n / 20L), maxLen = 3)
    }),

    // WebP dims across all three container variants (lossy VP8 /
    // lossless VP8L / extended VP8X chosen per doc), synth-roundtrip:
    // decode(synth(w,h,v)) must reproduce the id-derived dims.
    "q315_webp_dims" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val w = 16 + (id % 17L).toInt
          val h = 9 + (id % 13L).toInt
          val v = (id % 3L).toInt
          val got = multimodal.Binary.webpDims(
            multimodal.Binary.synthWebp(w, h, v)).getOrElse((-1, -1))
          (v.toLong, w.toLong, h.toLong, got._1.toLong, got._2.toLong)
        }.toDF("variant", "w", "h", "w_decoded", "h_decoded")
        .groupBy("variant", "w", "h", "w_decoded", "h_decoded")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // MP3 frame-header walk over id-derived CBR fixtures (1/3 behind an
    // ID3v2 prefix): frame count, rate/bitrate tables, sample totals.
    "q316_mp3_meta" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val brIdx = 1 + (id % 14L).toInt
          val srIdx = (id % 3L).toInt
          val frames = 3 + (id % 5L).toInt
          val id3 = if (id % 3L == 0L) 32 else 0
          val m = multimodal.Binary.mp3Meta(
            multimodal.Binary.synthMp3(brIdx, srIdx, frames, id3))
            .getOrElse((-1, -1, -1, -1L))
          (brIdx.toLong, srIdx.toLong, frames.toLong,
            m._1.toLong, m._2.toLong, m._3.toLong, m._4)
        }.toDF("br_idx", "sr_idx", "frames", "frames_decoded",
          "sample_rate", "bitrate_kbps", "n_samples")
        .groupBy("br_idx", "sr_idx", "frames", "frames_decoded",
          "sample_rate", "bitrate_kbps", "n_samples")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Consistent-hash rebalance bill: 4→5 shards on the md5 ring —
    // the ~1/(N+1) movement promise proved on the corpus itself.
    "q308_shard_rebalance" -> ((s, d) =>
      Corpus.shardRebalanceReport(Tables.documents(s, d), "doc_id",
        nShards = 4, vnodes = 8)),

    // Merge-on-read UPDATE WHERE SET: two composed DV updates (the
    // second one hits the first's appended post-images, proving old
    // versions die behind vectors and assignments see CURRENT values);
    // data files never rewritten — readback through the vectors vs the
    // CASE recompute proves row-exact semantics at O(matched rows) write.
    "q310_mor_update" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_morupd_")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .repartitionByRange(8, col("p_partkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.updateWhereMoR(s, dir,
        Seq(GreaterThanOrEqual("p_partkey", 500L), LessThan("p_partkey", 1500L)),
        Map("p_retailprice" -> (col("p_retailprice") + 100.0)))
      graft.sources.WarehouseSink.updateWhereMoR(s, dir,
        Seq(LessThan("p_partkey", 800L)),
        Map("p_retailprice" -> (col("p_retailprice") + 10.0)))
      s.read.format(fmt).option("path", dir).load()
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(floor(col("p_retailprice") * 100).cast("long")).as("sum_cents"))
    }),

    // Keyed snapshot diff across table VERSIONS: v0 (time travel) vs
    // the live state after a CoW delete + append + CoW update —
    // added/removed/changed/unchanged per key, null-safe payload
    // compare; the release-audit readout of the time-travel family.
    "q362_version_diff" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_vdiff_")
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      cust.repartition(4)
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{EqualTo, LessThan}
      graft.sources.WarehouseSink.deleteWhere(s, dir,
        Seq(LessThan("c_custkey", 50L)))
      cust.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          lit("NEWSEG").as("c_mktsegment"), col("c_acctbal"))
        .write.format(fmt).option("path", dir).mode("append").save()
      graft.sources.WarehouseSink.updateWhere(s, dir,
        Seq(EqualTo("c_mktsegment", "BUILDING")),
        Map("c_acctbal" -> (col("c_acctbal") + 100.0)))
      val v0 = s.read.format(fmt).option("path", dir)
        .option("versionAsOf", "0").load()
      val live = s.read.format(fmt).option("path", dir).load()
      Etl.snapshotDiff(v0, live, Seq("c_custkey"))
        .groupBy("change").agg(count(lit(1)).as("n_rows"))
    }),

    // MoR DML chain materialized by maintenance (REORG/PURGE): a delete
    // and an update land as deletion vectors (O(matched) writes), then
    // maintain rewrites the table THROUGH the vectors into clean
    // vector-free files — the readback after the purge must replay the
    // same set/CASE arithmetic the vectors encoded.
    "q355_mor_reorg" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_morreorg_")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_retailprice"))
        .repartitionByRange(8, col("p_partkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
      graft.sources.WarehouseSink.deleteWhereMoR(s, dir,
        Seq(LessThan("p_partkey", 30L)))
      graft.sources.WarehouseSink.updateWhereMoR(s, dir,
        Seq(GreaterThanOrEqual("p_size", 25)),
        Map("p_retailprice" -> (col("p_retailprice") + 50.0)))
      val rep = graft.sources.WarehouseSink.maintain(s, dir)
      require(rep.compacted, "REORG must rewrite a DV-carrying table")
      s.read.format(fmt).option("path", dir).load()
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(floor(col("p_retailprice") * 100).cast("long"))
            .as("sum_cents"))
    }),

    // Merge-on-read MERGE: matched customer keys die behind deletion
    // vectors and the whole upsert batch (replacements + brand-new keys)
    // appends ONCE — O(|updates| + matched positions) against a table
    // whose data files never rewrite; readback vs the set-algebra oracle.
    "q311_mor_merge" -> ((s, d) => {
      val fmt = "graft.sources.WarehouseSink"
      val dir = tempTableDir("graft_mormrg_")
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .repartitionByRange(8, col("c_custkey"))
        .write.format(fmt).option("path", dir).mode("overwrite").save()
      val base = Tables.customer(s, d).filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          (col("c_acctbal") + 1000.0).as("c_acctbal"))
      val updates = base.unionByName(base.select(
        (col("c_custkey") + 10000000L).as("c_custkey"),
        lit("NEWSEG").as("c_mktsegment"), col("c_acctbal")))
      graft.sources.WarehouseSink.mergeMoR(s, dir, updates, Seq("c_custkey"))
      s.read.format(fmt).option("path", dir).load()
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_cust"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("sum_cents"))
    }),

    // Funnel drop-off with Wilson CIs: which step bleeds, and is the
    // drop signal or noise — pairwise conversions over q115's stages.
    "q307_funnel_dropoff" -> ((s, d) =>
      Analytics.funnelDropoff(eventsUs(s, d), "user_id", "ts_us",
        "event_type", Seq("signup", "click", "purchase"),
        windowUs = 7L * 86400L * 1000000L)),

    // Per-slice AUC: the model-card readout — q167's exact midrank AUC
    // partitioned by language, surfacing slices the global number hides.
    "q306_auc_by_slice" -> ((s, d) =>
      ml.Eval.rocAucBy(Tables.documents(s, d).select(
        col("lang").as("slice"),
        greatest(least(floor(T.qualityScore(col("text")) * 10000 + 0.5),
          lit(10000L)), lit(0L)).cast("long").as("score_q"),
        (col("n_chars") >= 300).cast("long").as("label")),
        "slice", "score_q", "label")),

    // Item-item cosine CF: "bought this, also bought" neighbors with
    // popularity damped by the cosine denominator, hub users capped.
    "q305_item_cf" -> ((s, d) =>
      ml.Recommend.itemCosineCf(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id")),
        "user_id", "item_id", maxUserItems = 80, k = 5, minCo = 2)),

    // Chart turnover: week-over-week Jaccard churn of the top-10 user
    // leaderboard — the ranking-surface volatility metric.
    "q304_chart_turnover" -> ((s, d) =>
      Charts.chartTurnover(eventsUs(s, d), "user_id", "ts_us", k = 10)),

    // Leak-free feature/label rows: features strictly before the
    // cutoff, the label from the 14-day future window — the temporal
    // training-table builder.
    "q303_feature_labels" -> ((s, d) =>
      Analytics.featureLabelTable(eventsUs(s, d), "user_id", "ts_us",
        "value", cutoffUs = 1706745600000000L,
        labelWindowUs = 14L * 86400L * 1000000L)),

    // Leave-last-out recommender eval: HR@20 / MRR of the popularity
    // baseline on each customer's held-out last purchase.
    "q302_leave_last_out" -> ((s, d) =>
      ml.Recommend.leaveLastOutEval(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey"), col("l_linenumber")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id"), col("o_orderdate").as("ts"),
            (col("l_orderkey") * lit(10L) + col("l_linenumber"))
              .cast("long").as("row_id")),
        "user_id", "item_id", "ts", "row_id", k = 20)),

    // ALS implicit-feedback recommender vs the popularity baseline,
    // both through the q302 leave-last-out protocol — the learned-model
    // rung recommendation.py's KMeans recommender approximates.
    // Rows-only: ALS factors are seeded but float-reduction-order
    // specific; MlSpec pins planted-structure recovery instead.
    "q312_als_eval" -> ((s, d) =>
      ml.Recommend.alsVsPopularityEval(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey"), col("l_linenumber")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id"), col("o_orderdate").as("ts"),
            (col("l_orderkey") * lit(10L) + col("l_linenumber"))
              .cast("long").as("row_id")),
        // rank/maxIter sized for the bench budget: the contract claim
        // is the protocol (rows-only), not model quality — MlSpec owns
        // the planted-recovery assertion at full strength.
        "user_id", "item_id", "ts", "row_id", k = 20, rank = 8,
        maxIter = 5)),

    // TextRank keywords: PageRank centrality over the word
    // co-occurrence graph — integer walk, oracle unrolls 3 steps.
    "q301_textrank" -> ((s, d) =>
      Search.textRank(Tables.documents(s, d), "doc_id", "text",
        coWindow = 2, iters = 3, topK = 20)),

    // Preference pairs: the (chosen, rejected, margin) training rows a
    // DPO/reward pipeline consumes — exact floor-centi margins, thin
    // margins gated out.
    "q300_preference_pairs" -> ((s, d) =>
      ml.Preference.preferencePairs(Tables.events(s, d), "user_id",
        "event_type", "value", minMarginCenti = 500L)),

    // Bradley-Terry preference strengths over per-user pairwise value
    // comparisons — integer MM iterations, oracle unrolls the same
    // three steps.
    "q299_bradley_terry" -> ((s, d) =>
      ml.Preference.bradleyTerry(Tables.events(s, d), "user_id",
        "event_type", "value", iters = 3)),

    // Near-dup SPLIT leakage: the same portable pairs mapped to the
    // train/test hash split on both ends — the paraphrase-leakage audit
    // q128's exact-fingerprint check can't see (a train doc's light
    // rewrite sitting in test inflates eval).
    "q298_neardup_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = portableMinhashPairs(s, d)
      val sp = docs.select(col("doc_id"),
        when(substring(md5(col("text").cast("binary")), 1, 1) < "d",
          "train").otherwise("test").as("graft_sp"))
      pairs
        .join(sp.withColumnRenamed("doc_id", "id1")
          .withColumnRenamed("graft_sp", "graft_p1"), Seq("id1"))
        .join(sp.withColumnRenamed("doc_id", "id2")
          .withColumnRenamed("graft_sp", "graft_p2"), Seq("id2"))
        .select(least(col("graft_p1"), col("graft_p2")).as("split_a"),
          greatest(col("graft_p1"), col("graft_p2")).as("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_neardup_pairs"))
    }),

    // Near-dup contamination matrix: the oracle-exact portable-LSH pairs
    // mapped to their sources — which sources SHARE near-duplicate
    // content (the exact-copy matrix q193 can't see paraphrases).
    "q194_source_neardup_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = portableMinhashPairs(s, d)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.withColumnRenamed("doc_id", "id1")
          .withColumnRenamed("source", "graft_s1"), Seq("id1"))
        .join(src.withColumnRenamed("doc_id", "id2")
          .withColumnRenamed("source", "graft_s2"), Seq("id2"))
        .select(least(col("graft_s1"), col("graft_s2")).as("src_a"),
          greatest(col("graft_s1"), col("graft_s2")).as("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_neardup_pairs"))
    }),

    // Filtered vector search: top-k nearest within one label only —
    // pre-filtered (exact), same scoring as q23.
    "q195_filtered_ann" -> ((s, d) =>
      Similarity.cosineTopKFiltered(Tables.embeddings(s, d), "vec_id",
        "embedding", queryId = 0L, k = 10, predicate = col("label") === 1)),

    // One-way ANOVA of purchase value by event type: exact η² and F in
    // fixed-point from decimal sums — "does the grouping explain the
    // metric" as a hash-checkable readout.
    "q196_variance_decomposition" -> ((s, d) =>
      Analytics.varianceDecomposition(Tables.events(s, d), "event_type",
        "value")),

    // Robust trend: lower-median of pairwise daily slopes per type —
    // the outlier-proof twin of q186's least squares.
    "q199_theil_sen" -> ((s, d) =>
      Analytics.theilSenSlope(eventsUs(s, d), "event_type", "ts_us")),

    // Seasonal-adjusted anomaly screen: q117's blind spot fixed — the
    // MAD rule applies to residuals vs the same-weekday expectation, so
    // a weekly-cyclic series stops flagging every weekend.
    "q230_seasonal_anomaly" -> ((s, d) =>
      Analytics.seasonalAnomaly(eventsUs(s, d), "event_type", "ts_us",
        k = 3, madK = 3.0)),

    // Weekly cohort LTV: q88 retention's monetary twin — the cumulative
    // centi-value-per-user curve a growth team reads payback off.
    "q231_cohort_ltv" -> ((s, d) =>
      Analytics.cohortLtv(eventsUs(s, d), "user_id", "ts_us", "value")),

    // Mann-Kendall trend test: the significance readout completing the
    // trend family (q186 slope, q199 robust slope) — integer S and
    // tie-corrected V18, pinned-order IEEE assembly.
    "q232_mann_kendall" -> ((s, d) =>
      Analytics.mannKendall(eventsUs(s, d), "event_type", "ts_us")),

    // Kaplan-Meier churn survival: censoring-correct retention — the
    // per-step ppm-floored product limit, replayed by the oracle as a
    // recursive CTE walking the identical recurrence.
    "q242_kaplan_meier" -> ((s, d) =>
      Analytics.kaplanMeier(eventsUs(s, d), "user_id", "ts_us",
        censorDays = 7)),

    // Nelson-Aalen cumulative hazard: KM's additive twin — the same
    // censoring-correct life table, but the SUM estimator stays fully
    // distributed (one ordered window, no driver fold, no recursion).
    "q343_nelson_aalen" -> ((s, d) =>
      Analytics.nelsonAalen(eventsUs(s, d), "user_id", "ts_us",
        censorDays = 7)),

    // Chance-corrected agreement at the q169 mid threshold: accuracy,
    // balanced accuracy, Cohen's kappa — the imbalance-honest readout
    // (all rationals in the confusion counts, truncated ppm).
    "q243_agreement" -> ((s, d) =>
      ml.Eval.agreementStats(scoredDocs(s, d), "score_q", "label",
        threshold = 5000L)),

    // Negative sampling: per customer, 3 deterministic hash-drawn parts
    // they never bought — the implicit-feedback training-data op.
    "q297_negative_sample" -> ((s, d) =>
      ml.Recommend.negativeSample(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"),
            col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("user_id"),
            col("l_partkey").as("item_id")),
        "user_id", "item_id", k = 3)),

    // Median with a distribution-free order-statistic CI per event
    // type — binomial rank bounds, exact centi values.
    "q296_quantile_ci" -> ((s, d) =>
      Analytics.quantileCi(Tables.events(s, d), "event_type", "value",
        qMilli = 500L)),

    // Wilson intervals per arm: the uncertainty the q137 point rates
    // can't carry — score intervals that never leave [0,1].
    "q295_wilson_arms" -> ((s, d) =>
      Experiment.wilsonArms(Tables.events(s, d), "user_id", "event_type",
        "value", exposureType = "view", conversionType = "purchase",
        minValue = 50.0)),

    // Cochran-Armitage: does purchase rate rise MONOTONICALLY with
    // view-exposure dose — the trend test chi-square can't sharpen to.
    "q294_cochran_armitage" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("graft_v"),
          max((col("event_type") === "purchase").cast("long"))
            .as("outcome"))
        .select(expr("least(graft_v div 3, 3L)").as("dose"),
          col("outcome"))
      Experiment.cochranArmitage(perUser, "dose", "outcome")
    }),

    // Good-Turing: unseen-vocabulary mass (n1/N) + adjusted counts for
    // the low-frequency tail — the corpus-coverage readout.
    "q293_good_turing" -> ((s, d) =>
      Analytics.goodTuring(Tables.documents(s, d), "text", gramN = 3,
        maxR = 5)),

    // Capture-recapture: Lincoln-Petersen estimate of the corpus's
    // distinct-content count from two independent hash half-samples —
    // the dedup-scoping estimate that never pays for a global distinct.
    "q292_capture_recapture" -> ((s, d) =>
      Dedup.captureRecapture(Tables.documents(s, d), "doc_id", "text")),

    // Join-cardinality pre-flight: exact pair counts per key from the
    // two histograms — the audit that prices a 100 TB join before
    // running it (lineitem ⋈ orders on orderkey).
    "q291_join_cardinality" -> ((s, d) =>
      Skew.joinCardinalityAudit(Tables.lineitem(s, d), Tables.orders(s, d),
        "l_orderkey", "o_orderkey", topK = 20)),

    // EXIF tag walk: APP1/TIFF IFD0 in BOTH byte orders (half the docs
    // synthesize Intel "II", half Motorola "MM") — the oracle derives
    // the expected orientation/timestamp arithmetically, so the hash
    // match proves both endianness walks decode identically.
    "q290_exif_tags" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val dt = f"2024:01:${1 + id % 28}%02d 10:00:00"
          multimodal.Binary.exifTags(multimodal.Binary.synthExifJpeg(
            orientation = (1 + id % 8).toInt, dateTime = dt,
            littleEndian = id % 2 == 0)) match {
            case Some((o, t)) => (o, t)
            case None => (-1L, "?")
          }
        }.toDF("orientation", "taken_at")
        .groupBy("orientation", "taken_at")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Cross-correlation: does the error series LEAD the purchase
    // series — per-lag exact-sums Pearson over paired observed days.
    "q289_ccf" -> ((s, d) =>
      Analytics.crossCorrelation(eventsUs(s, d), "event_type", "ts_us",
        seriesA = "error", seriesB = "purchase", maxLag = 3)),

    // Best-passage extraction: the 8-token window with max distinct
    // query-term coverage per doc, snippet text reassembled from the
    // normalized tokens — the highlighting/RAG-context picker.
    "q288_best_passage" -> ((s, d) =>
      Search.bestPassage(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "vector"), windowTokens = 8, topK = 10)),

    // Friedman repeated-measures rank test: within-user ranks across
    // three event types — blocks cancel user-level heterogeneity.
    "q287_friedman" -> ((s, d) =>
      Analytics.friedman(Tables.events(s, d), "user_id", "event_type",
        "value", treatments = Seq("view", "click", "purchase"))),

    // Link prediction: CN + resource-allocation over the supplier↔part
    // graph — hub intermediaries df-capped, exact integer RA.
    "q286_link_prediction" -> ((s, d) =>
      Graph.linkPrediction(Tables.lineitem(s, d)
        .select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + lit(10000000L)).cast("long").as("dst")),
        "src", "dst", maxDeg = 25, topK = 20)),

    // Rocchio PRF expansion: top-4 feedback docs → top-8 Σtf·idf
    // expansion terms at weight 400 milli → weighted BM25 re-retrieval.
    "q285_prf_expand" -> ((s, d) =>
      Search.prfExpand(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("join", "vector", "slow"), fbDocs = 4,
        fbTerms = 8, betaMilli = 400L, topK = 20)),

    // MCC at the mid-scale threshold: the imbalance-honest confusion
    // summary — exact DECIMAL counts/products, pinned IEEE finish.
    "q284_mcc" -> ((s, d) =>
      ml.Eval.mcc(scoredDocs(s, d), "score_q", "label",
        thresholdScore = 5000L)),

    // SRM check: the assignment-integrity gate — cleared-denominator
    // 1-df chi-square of the observed arm split vs the designed share,
    // DECIMAL(38,0) through the square, flag at the 95% critical value.
    "q283_srm" -> ((s, d) =>
      Experiment.srmCheck(Tables.events(s, d), "user_id", "event_type",
        exposureType = "view", designMilliA = 500L)),

    // MMR diversified top-k: greedy λ·rel − (1−λ)·max-sim re-ranking
    // over a bounded candidate pool — all integer nano-unit scores, the
    // oracle unrolls the same six greedy steps.
    "q282_mmr_topk" -> ((s, d) =>
      Similarity.mmrTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 6, poolN = 16, lambdaMilli = 700L)),
  )
}
