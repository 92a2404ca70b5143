package graft.operators

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 prefers the shorter document at equal term frequency") {
    val docs = Seq(
      (1L, "apple banana cherry banana date fig grape kiwi lemon mango"),
      (2L, "apple banana"),
      (3L, "cherry date fig")).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text", Seq("apple"), 10)
      .as[(Long, Long, Long)].collect()
    // Doc 3 has no hit and must be absent; both hits have tf=1, so the
    // shorter doc 2 wins on length normalization.
    assert(got.map(_._1).toSeq === Seq(2L, 1L))
    assert(got.forall(_._2 == 1L))
    assert(got.head._3 > got.last._3 && got.last._3 > 0L)
  }

  test("bm25 weights the rarer term higher at equal tf and dl") {
    // "rare" appears in 1 of 4 docs, "common" in 3; docs 1 and 2 have the
    // same length and tf=1 for their respective term.
    val docs = Seq(
      (1L, "rare pad pad"),
      (2L, "common pad pad"),
      (3L, "common x y"),
      (4L, "common a b")).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text",
      Seq("rare", "common"), 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) > got(2L))
  }

  test("bm25 sums one quantized contribution per matched term") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha alpha"),
      (3L, "beta gamma")).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text", Seq("alpha", "beta"), 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) === 2L) // both query terms hit
    assert(got(2L) === 1L)
    assert(got(3L) === 1L)
  }

  test("invertedIndex caps postings at the window rank, keeps true df") {
    val docs = Seq(
      (1L, "x x x common"), (2L, "x x common"), (3L, "x common"),
      (4L, "common"), (5L, "solo")).toDF("doc_id", "text")
    val got = Search.invertedIndex(docs, "doc_id", "text",
      maxPostings = 2, topTerms = 10)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // df counts ALL 4 docs even though only 2 postings are kept; postings
    // are impact-ordered (tf desc, doc asc).
    assert(got("common") === ((4L, 2L, "1:1|2:1")))
    assert(got("x") === ((3L, 2L, "1:3|2:2")))
    assert(got("solo") === ((1L, 1L, "5:1")))
  }

  test("invertedIndex reports the topTerms highest-df terms, ties by term") {
    val docs = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "aa")).toDF("doc_id", "text")
    val got = Search.invertedIndex(docs, "doc_id", "text", 5, 1)
      .as[(String, Long, Long, String)].collect()
    assert(got.map(_._1).toSeq === Seq("aa"))
    assert(got.head._2 === 3L)
  }

  test("relatedTerms ranks planted co-occurrents by exact lift") {
    // "pal" appears in ALL 4 seed docs (co=4, df=4); "buddy" in 2 of 4
    // (co=2 — below minCo=3 at minCo=3, kept at minCo=1); "noise" only
    // in non-seed docs (co=0, absent).
    val docs = Seq(
      (1L, "seed pal buddy"), (2L, "seed pal"), (3L, "seed pal buddy x"),
      (4L, "seed pal"), (5L, "noise y"), (6L, "noise z"))
      .toDF("doc_id", "text")
    val got = Search.relatedTerms(docs, "doc_id", "text", "seed",
      minCo = 3L, k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // pal: co=4, df_pal=4, df_seed=4, N=6 → 4*6*1e6/(4*4) = 1500000
    assert(got === Map("pal" -> ((4L, 4L, 1500000L))))
    val loose = Search.relatedTerms(docs, "doc_id", "text", "seed",
      minCo = 1L, k = 10).collect().map(_.getString(0)).toSet
    assert(loose.contains("buddy") && !loose.contains("noise")
      && !loose.contains("seed"))
  }

  test("phraseSearch finds exact adjacent runs only") {
    val docs = Seq(
      (1L, "the quick brown fox"),          // hit at 1
      (2L, "quick stop brown fox"),          // gap breaks adjacency
      (3L, "brown quick"),                   // reversed order
      (4L, "x quick brown y quick brown z"), // two hits
      (5L, "quick"))                         // prefix only
      .toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "doc_id", "text",
      Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_hits"),
        r.getAs[Long]("first_pos"))).toMap
    assert(got === Map(1L -> ((1L, 1L)), 4L -> ((2L, 1L))))
  }

  test("phraseSearch handles repeated words in the phrase soundly") {
    val docs = Seq(
      (1L, "a table table b"), // hit: same word fills both slots
      (2L, "a table b table")) // non-adjacent repeats: no hit
      .toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "doc_id", "text",
      Seq("table", "table")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("bm25 is invariant to input partitioning") {
    val docs = (1L to 30L)
      .map(i => (i, s"term$i filler pad alpha " * (i % 3 + 1).toInt))
      .toDF("doc_id", "text")
    val a = Search.bm25(docs, "doc_id", "text", Seq("alpha", "term3"), 10)
      .as[(Long, Long, Long)].collect().toSeq
    val b = Search.bm25(docs.repartition(7), "doc_id", "text",
      Seq("alpha", "term3"), 10).as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("hybridRrf fuses planted leg ranks with exact reciprocal credits") {
    // text corpus: doc 1 dominates the term; docs 2,3 mention it less.
    val docs = Seq(
      (1L, "zebra zebra zebra zebra"),
      (2L, "zebra filler filler filler"),
      (3L, "zebra filler"),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    // embeddings: doc 0 is the query; 2 is closest, then 3, then 1.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.7f, 0.7f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Search.hybridRrf(docs, emb, "doc_id", "text", "vec_id",
      "embedding", Seq("zebra"), queryVecId = 0L, legK = 3, k = 5)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("rrf_ppm")).toMap
    def c(rank: Long) = 1000000L / (60L + rank)
    // text ranks (BM25 length normalization lifts the shorter doc 3 over
    // doc 2 at equal tf): 1->1, 3->2, 2->3; vec ranks: 2->1, 3->2, 1->3
    assert(got(1L) === c(1) + c(3))
    assert(got(2L) === c(3) + c(1))
    assert(got(3L) === c(2) + c(2))
    assert(!got.contains(4L), s"doc 4 is in neither leg: $got")
  }

  test("ndcgAtK: perfect ranking scores 1.0, planted inversion scores less") {
    import org.apache.spark.sql.functions._
    // docs where tf ordering == score ordering (equal lengths): ndcg = 1
    val even = Seq(
      (1L, "cat cat cat cat pad1 pad2 pad3 pad4"),
      (2L, "cat cat cat pad1 pad2 pad3 pad4 pad5"),
      (3L, "cat cat pad1 pad2 pad3 pad4 pad5 pad6"),
      (4L, "cat pad1 pad2 pad3 pad4 pad5 pad6 pad7"),
      (5L, "nohit pad pad pad pad pad pad pad")).toDF("doc_id", "text")
    val p = Search.ndcgAtK(even, "doc_id", "text", Seq("cat"), k = 4)
      .collect()(0)
    assert(p.getAs[Long]("ndcg_ppm") === 1000000L)
    assert(p.getAs[Long]("dcg_micro") === p.getAs[Long]("idcg_micro"))
    // a SHORT low-tf doc outscores a long high-tf doc under length
    // normalization -> the gain ordering inverts and ndcg < 1
    val skewed = Seq(
      (1L, "cat cat"), // tf 2, tiny doc: huge normalized score
      (2L, "cat cat cat cat cat " + Seq.fill(200)("pad").mkString(" ")))
      .toDF("doc_id", "text")
    val q = Search.ndcgAtK(skewed, "doc_id", "text", Seq("cat"), k = 2)
      .collect()(0)
    assert(q.getAs[Long]("ndcg_ppm") < 1000000L,
      s"inversion must cost ndcg: ${q}")
    // discount-table contract: k beyond the table refuses loudly
    intercept[IllegalArgumentException] {
      Search.ndcgAtK(even, "doc_id", "text", Seq("cat"), k = 11)
    }
  }

  test("prfExpand surfaces vocabulary-mismatched documents") {
    // d3 never mentions the query term but shares the feedback set's
    // dominant term — only the expanded query can retrieve it. The
    // corpus carries distractor docs so idf doesn't collapse.
    // banana must WIN the Σtf·idf selection: it repeats across the
    // feedback set (tf 5) while snack/fruit are singletons whose higher
    // idf would otherwise outvote a low-tf banana.
    val docs = Seq(
      (1L, "apple banana banana snack"),
      (2L, "apple banana banana banana fruit"),
      (3L, "banana cherry smoothie"),
      (4L, "kernel module driver"),
      (5L, "socket packet buffer"))
      .toDF("doc_id", "text")
    val plain = Search.bm25(docs, "doc_id", "text", Seq("apple"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(plain === Set(1L, 2L))
    val got = Search.prfExpand(docs, "doc_id", "text", Seq("apple"),
      fbDocs = 2, fbTerms = 1, betaMilli = 500L, topK = 10)
    val ids = got.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(3L), s"expansion must surface d3: $ids")
    assert(ids.intersect(Set(4L, 5L)).isEmpty, s"distractors stay out: $ids")
    // original-term hits outrank expansion-only hits at beta < 1000
    val top = got.orderBy($"score_micro".desc, $"doc_id")
      .select("doc_id").as[Long].head()
    assert(Set(1L, 2L).contains(top))
  }

  test("bestPassage picks the max-coverage window with exact tiebreaks") {
    val docs = Seq(
      (1L, "pad pad join you vector pad pad pad pad"),
      (2L, "join a join b join c d e f"),
      (3L, "nothing relevant here"))
      .toDF("doc_id", "text")
    val got = Search.bestPassage(docs, "doc_id", "text",
      Seq("join", "vector"), windowTokens = 4, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // doc 1: window at the join (pos 2) covers both terms — coverage
    // dominates doc 2's repeated single term; doc 3 never appears
    assert(got.length === 2)
    assert(got(0) === ((1L, 2L, 2L, 2L, "join you vector pad")))
    // doc 2: windows at 0 and 2 both hold two hits of one term —
    // earliest start wins the tie
    assert(got(1) === ((2L, 0L, 1L, 2L, "join a join b")))
  }

  test("textRank: the co-occurrence hub outranks its satellites") {
    // alpha neighbors four distinct words; everyone else neighbors two.
    // Short tokens (len < 3) never enter the graph.
    val docs = Seq(
      (1L, "beta alpha gamma"),
      (2L, "delta alpha epsilon"),
      (3L, "of to by")) // all filtered out
      .toDF("doc_id", "text")
    val got = Search.textRank(docs, "doc_id", "text", coWindow = 2,
      iters = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.head._1 === "alpha", s"hub must rank first: ${got.toSeq}")
    assert(!got.exists(p => Set("of", "to", "by").contains(p._1)))
    assert(got.length === 5)
    // partitioning invariance of the integer walk
    val re = Search.textRank(docs.repartition(7), "doc_id", "text",
      coWindow = 2, iters = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(re.toSeq === got.toSeq)
  }

  test("prfExpand with no expandable vocabulary degrades to weighted bm25") {
    val docs = Seq((1L, "apple"), (2L, "apple"), (3L, "pear"))
      .toDF("doc_id", "text")
    val got = Search.prfExpand(docs, "doc_id", "text", Seq("apple"),
      fbDocs = 2, fbTerms = 3, betaMilli = 400L, topK = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }
}
