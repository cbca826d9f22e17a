package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "Spark scans the table. spark JOINS the table"),
    (2L, "spark spark spark joins"),
    (3L, "joins only, no engine word"),
    (4L, "spark alone"),
    (5L, "")).toDF("doc_id", "text")

  test("postings: case-folded alnum terms with exact per-doc tf") {
    val p = TextSearch.postings(docs, "doc_id", "text")
      .filter(col("term").isin("spark", "joins", "table"))
      .as[(String, Long, Long)].collect().toSet
    assert(p == Set(
      ("spark", 1L, 2L), ("spark", 2L, 3L), ("spark", 4L, 1L),
      ("joins", 1L, 1L), ("joins", 2L, 1L), ("joins", 3L, 1L),
      ("table", 1L, 2L)))
  }

  test("docFrequencies and rarityTable: df counts documents, rarity = (N*1000) div df") {
    val post = TextSearch.postings(docs, "doc_id", "text")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val r = TextSearch.rarityTable(post, n)
      .filter(col("term").isin("spark", "joins"))
      .as[(String, Long, Long)].collect().toSet
    // N = 5 docs; spark df=3 → 5000 div 3 = 1666; joins df=3 → 1666
    assert(r == Set(("spark", 3L, 1666L), ("joins", 3L, 1666L)))
  }

  test("searchTopK: conjunctive match, tf·rarity scoring, deterministic tiebreak, k cut") {
    // terms spark+joins: docs 1 and 2 match (3 and 4 lack one term).
    // rarity(spark)=rarity(joins)=1666;
    // doc1 = (2+1)·1666 = 4998, doc2 = (3+1)·1666 = 6664.
    val got = TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("Spark", "JOINS"), k = 10).as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 6664L), (1L, 4998L)))
    // k cut keeps the top scorer only
    val top1 = TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("spark", "joins"), k = 1).as[(Long, Long)].collect().toSeq
    assert(top1 == Seq((2L, 6664L)))
  }

  test("topTermsPerDoc: per-doc tf·rarity rank, term-asc ties, empty docs absent") {
    val got = TextSearch.topTermsPerDoc(docs, "doc_id", "text", k = 2)
      .select("doc_id", "term", "score", "rank")
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq)
      .toMap
    // doc2: spark tf3·1666 = 4998 > joins 1666
    assert(got(2L) == Seq(("spark", 4998L), ("joins", 1666L)))
    // doc4: hapax "alone" (rarity 5000) outranks spark
    assert(got(4L) == Seq(("alone", 5000L), ("spark", 1666L)))
    // doc3: three hapaxes tie at 5000 → term-ascending wins
    assert(got(3L) == Seq(("engine", 5000L), ("no", 5000L)))
    // the empty doc has no terms, hence no rows
    assert(!got.contains(5L))
  }

  test("collocations: hand-computed lifts, doc-end handling, tie order, minCount cut") {
    val corpus = Seq((1L, "a b a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    // T = 6 tokens; n_a = 2, n_b = 3, n_c = 1
    // bigrams: (a,b)×2, (b,a)×1, (b,c)×1
    // lift(a,b) = 2·6·10^6 div (2·3) = 2e6; (b,c) = 1·6·10^6 div 3 = 2e6;
    // (b,a) = 1·6·10^6 div 6 = 1e6. Tie (a,b)=(b,c) → a ascending.
    val got = TextSearch.collocations(corpus, "doc_id", "text",
      minCount = 1L, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 2L, 2000000L),
      ("b", "c", 1L, 2000000L),
      ("b", "a", 1L, 1000000L)))
    // minCount cuts the singletons; k cuts the head
    assert(TextSearch.collocations(corpus, "doc_id", "text", 2L, 10)
      .as[(String, String, Long, Long)].collect().toSeq ==
      Seq(("a", "b", 2L, 2000000L)))
    assert(TextSearch.collocations(corpus, "doc_id", "text", 1L, 1)
      .count() == 1L)
    // an all-empty corpus yields no rows (and no division by anything)
    assert(TextSearch.collocations(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text", 1L, 5).isEmpty)
  }

  test("searchTopK: a term absent from the corpus empties the conjunction") {
    assert(TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("spark", "zzzmissing"), k = 10).count() == 0)
  }

  test("searchTopK minShouldMatch: the OR/minimum-should-match dial") {
    // terms (spark, joins, table): conjunctive → doc 1 only; ≥2 adds
    // doc 2 (spark+joins); ≥1 (pure OR) adds docs 3 and 4 too. Scores
    // sum over MATCHED terms only: N=5, df(spark)=df(joins)=3 →
    // rarity 1666, df(table)=1 → rarity 5000.
    def q(msm: Int) = TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("spark", "joins", "table"), k = 10,
      minShouldMatch = Some(msm)).as[(Long, Long)].collect().toSeq
    // doc1 = 2·1666 + 1·1666 + 2·5000 = 14998
    assert(q(3) == Seq((1L, 14998L)))
    // conjunctive default ≡ msm = |terms|
    assert(TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("spark", "joins", "table"), k = 10)
      .as[(Long, Long)].collect().toSeq == q(3))
    // doc2 = 3·1666 + 1·1666 = 6664
    assert(q(2) == Seq((1L, 14998L), (2L, 6664L)))
    // doc3 = 1666 (joins), doc4 = 1666 (spark) — tie breaks by id
    assert(q(1) == Seq((1L, 14998L), (2L, 6664L), (3L, 1666L), (4L, 1666L)))
    // a missing term no longer empties the result under OR
    val or = TextSearch.searchTopK(docs, "doc_id", "text",
      Seq("spark", "zzzmissing"), k = 10, minShouldMatch = Some(1))
      .as[(Long, Long)].collect().toSeq
    // only spark matches: df=3, rarity=1666 → docs 2 (3·1666), 1 (2·1666), 4
    assert(or == Seq((2L, 4998L), (1L, 3332L), (4L, 1666L)))
    // the dial is validated against the DEDUPED term count
    intercept[IllegalArgumentException] {
      TextSearch.searchTopK(docs, "doc_id", "text", Seq("spark"), 10,
        minShouldMatch = Some(2))
    }
    intercept[IllegalArgumentException] {
      TextSearch.searchTopK(docs, "doc_id", "text", Seq("spark", "joins"),
        10, minShouldMatch = Some(0))
    }
  }

  test("searchTopKBm25 minShouldMatch: OR equals per-term union semantics") {
    // BM25-OR over (spark, table): doc 4 (spark only) and doc 1 (both)
    // both appear; conjunctive keeps doc 1 only
    val orIds = TextSearch.searchTopKBm25(docs, "doc_id", "text",
      Seq("spark", "table"), k = 10, minShouldMatch = Some(1))
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(orIds == Set(1L, 2L, 4L))
    val andIds = TextSearch.searchTopKBm25(docs, "doc_id", "text",
      Seq("spark", "table"), k = 10)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(andIds == Set(1L))
    // per-doc OR score = Σ of its single-term conjunctive scores (BM25
    // is additive over matched terms at fixed df/avgdl)
    val single = (for (t <- Seq("spark", "table")) yield
      TextSearch.searchTopKBm25(docs, "doc_id", "text", Seq(t), k = 10)
        .as[(Long, Long)].collect().toSeq).flatten
      .groupMapReduce(_._1)(_._2)(_ + _)
    val or = TextSearch.searchTopKBm25(docs, "doc_id", "text",
      Seq("spark", "table"), k = 10, minShouldMatch = Some(1))
      .as[(Long, Long)].collect().toMap
    assert(or == single)
  }

  test("searchTopK: duplicate query terms collapse; score ties break by id ascending") {
    val tied = Seq((7L, "alpha beta"), (3L, "beta alpha")).toDF("doc_id", "text")
    val got = TextSearch.searchTopK(tied, "doc_id", "text",
      Seq("alpha", "alpha", "beta"), k = 10).as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(3L, 7L))
    assert(got.map(_._2).distinct.size == 1)
  }

  test("searchTopKBm25: hand-computed saturated, length-normalized scores") {
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // N=2, Σdl=5 → avgdl_milli 2500; df(a)=2 → rarity 1000
    // doc1: tf 2, nf 250+900=1150, denom 2000+1380=3380 → 4400000/3380 = 1301
    // doc2: tf 1, nf 250+600=850,  denom 1000+1020=2020 → 2200000/2020 = 1089
    val got = TextSearch.searchTopKBm25(df, "doc_id", "text", Seq("a"), k = 5)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1301L), (2L, 1089L)))
    // saturation: doubling tf must NOT double the score
    assert(got.head._2 < 2 * got(1)._2)
    // conjunction still applies: b AND c co-occur nowhere
    assert(TextSearch.searchTopKBm25(df, "doc_id", "text", Seq("b", "c"), 5)
      .count() == 0)
  }

  test("moreLikeThis: rarity-weighted overlap, self excluded, k cut per query") {
    val corpus = Seq(
      (1L, "apple banana"), (2L, "apple banana"),
      (3L, "apple cherry"), (4L, "zzz")).toDF("doc_id", "text")
    val queries = corpus.filter($"doc_id" === 1L)
    // N=4; df(apple)=3 → rarity 1333; df(banana)=2 → rarity 2000
    // score(1→2) = 1333 + 2000 = 3333; score(1→3) = 1333; doc 4 shares nothing
    val got = TextSearch.moreLikeThis(corpus, queries, "doc_id", "text", k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3333L), (1L, 3L, 1333L)))
    val top1 = TextSearch.moreLikeThis(corpus, queries, "doc_id", "text", k = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(top1 == Set((1L, 2L, 3333L)))
  }

  test("moreLikeThis: maxQueryTerms keeps only the rarest terms per query") {
    val corpus = Seq(
      (1L, "common rare"), (2L, "common rare"),
      (3L, "common"), (4L, "common")).toDF("doc_id", "text")
    val queries = corpus.filter($"doc_id" === 1L)
    // N=4: rarity(common)=1000 (df 4), rarity(rare)=2000 (df 2)
    val unc = TextSearch.moreLikeThis(corpus, queries, "doc_id", "text", k = 9)
      .as[(Long, Long, Long)].collect().toSet
    assert(unc == Set((1L, 2L, 3000L), (1L, 3L, 1000L), (1L, 4L, 1000L)))
    // cap 1 → only "rare" survives the per-query selection: candidates
    // shrink to docs containing it, and "common" contributes no score
    val capped = TextSearch.moreLikeThis(corpus, queries, "doc_id", "text",
      k = 9, maxQueryTerms = Some(1)).as[(Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L, 2000L)))
  }

  test("phraseSearchTopK: exact token sequence, order matters, tiebreak, k cut") {
    val df = Seq(
      (1L, "a b a b"), (2L, "b a"), (3L, "a a"), (4L, "")).toDF("doc_id", "text")
    val ab = TextSearch.phraseSearchTopK(df, "doc_id", "text", Seq("a", "b"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(ab == Seq((1L, 2L))) // "b a" is NOT "a b"; short/empty docs absent
    val ba = TextSearch.phraseSearchTopK(df, "doc_id", "text", Seq("b", "a"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(ba == Seq((1L, 1L), (2L, 1L))) // count tie → id ascending
    // single-token phrase degenerates to term-occurrence ranking
    val justA = TextSearch.phraseSearchTopK(df, "doc_id", "text", Seq("a"), 2)
      .as[(Long, Long)].collect().toSeq
    assert(justA == Seq((1L, 2L), (3L, 2L))) // k cut drops doc 2
    intercept[IllegalArgumentException] {
      TextSearch.phraseSearchTopK(df, "doc_id", "text", Seq("two words"), 5)
    }
  }

  test("proximityTopK: min adjacent-opposite-label distance, window cut, order-insensitive") {
    val df = Seq(
      (1L, "red x x x blue"),        // min |a−b| = 4
      (2L, "blue red"),              // adjacent, order reversed → 1
      (3L, "red x red blue x blue"), // multiple occurrences → min 1
      (4L, "red only here"),         // one term only → absent
      (5L, "blue z z z z z z red blue") // far pair 7 AND near pair 1 → 1
    ).toDF("doc_id", "text")
    val got = TextSearch.proximityTopK(df, "doc_id", "text",
      "red", "blue", maxDistance = 4L, k = 10)
      .as[(Long, Long)].collect().toSeq
    // dist asc, id asc: docs 2/3/5 at 1, doc 1 at 4
    assert(got == Seq((2L, 1L), (3L, 1L), (5L, 1L), (1L, 4L)))
    // the window cut: maxDistance 3 drops doc 1
    assert(TextSearch.proximityTopK(df, "doc_id", "text", "red", "blue", 3L, 10)
      .as[(Long, Long)].collect().toSeq == Seq((2L, 1L), (3L, 1L), (5L, 1L)))
    intercept[IllegalArgumentException] {
      TextSearch.proximityTopK(df, "doc_id", "text", "red", "RED", 3L, 10)
    }
    intercept[IllegalArgumentException] {
      TextSearch.proximityTopK(df, "doc_id", "text", "red", "two words", 3L, 10)
    }
  }

  test("positionalPostings + searchStoreProximity: store search equals the direct operator") {
    val df = Seq(
      (1L, "red x x x blue"), (2L, "blue red"), (3L, "red x red blue x blue"),
      (4L, "red only"), (5L, "")).toDF("doc_id", "text")
    val pp = TextSearch.positionalPostings(df, "doc_id", "text")
    // the prox-file shape: sorted 0-based positions, tf = |positions|
    val redRows = pp.filter(col("term") === "red")
      .select("doc_id", "positions", "tf")
      .as[(Long, Seq[Int], Long)].collect()
      .map { case (d, p, t) => d -> ((p, t)) }.toMap
    assert(redRows(3L) == (Seq(0, 2), 2L))
    assert(redRows(2L) == (Seq(1), 1L))
    val viaStore = TextSearch.searchStoreProximity(pp, "doc_id",
      "red", "blue", 4L, 10).as[(Long, Long)].collect().toSeq
    val direct = TextSearch.proximityTopK(df, "doc_id", "text",
      "red", "blue", 4L, 10).as[(Long, Long)].collect().toSeq
    assert(viaStore == direct && direct.nonEmpty)
  }

  test("searchStorePhrase: consecutive search tokens, duplicate-term phrases, the punctuation contrast") {
    val df = Seq(
      (1L, "a b a b"),        // "a b" twice, "a b a" once
      (2L, "b a"), (3L, "a a"),
      (4L, "a, b")            // punctuation: search tokens are (a, b)
    ).toDF("doc_id", "text")
    val pp = TextSearch.positionalPostings(df, "doc_id", "text")
    val ab = TextSearch.searchStorePhrase(pp, "doc_id", Seq("a", "b"), 10)
      .as[(Long, Long)].collect().toSeq
    // the documented semantic difference: search tokens ignore the
    // comma, so doc 4 matches here but NOT in phraseSearchTopK's
    // whitespace-token stream ("a," != "a"); doc 2 is the REVERSED
    // bigram and matches in neither
    assert(ab == Seq((1L, 2L), (4L, 1L)))
    assert(TextSearch.phraseSearchTopK(df, "doc_id", "text",
      Seq("a", "b"), 10).as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    // duplicate phrase terms: "a b a" needs the SAME term at two offsets
    assert(TextSearch.searchStorePhrase(pp, "doc_id", Seq("a", "b", "a"), 10)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L)))
    intercept[IllegalArgumentException] {
      TextSearch.searchStorePhrase(pp, "doc_id", Seq("two words"), 5)
    }
  }

  test("moreLikeThis: an oversized probe set throws — the bounded-probe contract is code, not prose") {
    val corpus = spark.range(50).selectExpr("id AS doc_id",
      "concat('alpha beta doc ', id) AS text")
    val probes = corpus.limit(20)
    val e = intercept[IllegalArgumentException] {
      TextSearch.moreLikeThis(corpus, probes, "doc_id", "text", k = 3,
        maxQueryDocs = 10L)
    }
    assert(e.getMessage.contains("maxQueryDocs") &&
      e.getMessage.contains("LSH"))
    // at or under the bound the operator runs
    assert(TextSearch.moreLikeThis(corpus, probes.limit(2), "doc_id",
      "text", k = 3, maxQueryDocs = 10L).count() > 0)
  }

  test("searchTopK rejects empty and non-alnum query terms") {
    intercept[IllegalArgumentException] {
      TextSearch.searchTopK(docs, "doc_id", "text", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      TextSearch.searchTopK(docs, "doc_id", "text", Seq("two words"), 5)
    }
    intercept[IllegalArgumentException] {
      TextSearch.searchTopK(docs, "doc_id", "text", Seq("ok"), 0)
    }
  }

  test("windowProximityTopK: hand-computed minimal cover, window cut, k=2 law") {
    val d = Seq(
      // a(0) x(1) b(2) x(3) c(4) ... a(8): covers {a,b,c} as [0,4]=5 and [2,8]=7
      (1L, "a x b x c x x x a"),
      // all three adjacent → span 3
      (2L, "x a b c x"),
      // missing c entirely → never covered
      (3L, "a b a b a b"),
      // c before a,b: cover is [c..b] = positions 0..2 → 3
      (4L, "c a b")).toDF("doc_id", "text")
    val r = TextSearch.windowProximityTopK(d, "doc_id", "text",
      Seq("a", "b", "c"), window = 5L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((2L, 3L), (4L, 3L), (1L, 5L)))
    // the k=2 special case IS proximityTopK with window = maxDistance+1
    val two = TextSearch.windowProximityTopK(docs, "doc_id", "text",
      Seq("spark", "joins"), window = 4L, k = 10)
      .as[(Long, Long)].collect().toSeq
    val prox = TextSearch.proximityTopK(docs, "doc_id", "text",
      "spark", "joins", maxDistance = 3L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(two.map { case (id, span) => (id, span - 1) } == prox)
  }

  test("searchStoreWindowProximity equals the direct operator; contracts reject bad args") {
    val store = TextSearch.positionalPostings(docs, "doc_id", "text")
    val direct = TextSearch.windowProximityTopK(docs, "doc_id", "text",
      Seq("spark", "joins", "table"), 8L, 10).as[(Long, Long)].collect().toSeq
    val stored = TextSearch.searchStoreWindowProximity(store, "doc_id",
      Seq("spark", "joins", "table"), 8L, 10).as[(Long, Long)].collect().toSeq
    assert(direct.nonEmpty && direct == stored)
    intercept[IllegalArgumentException] { // < 2 distinct terms
      TextSearch.windowProximityTopK(docs, "doc_id", "text", Seq("a", "A"), 5L, 1)
    }
    intercept[IllegalArgumentException] { // window < distinct term count
      TextSearch.windowProximityTopK(docs, "doc_id", "text", Seq("a", "b", "c"), 2L, 1)
    }
    intercept[IllegalArgumentException] { // non-token term
      TextSearch.searchStoreWindowProximity(store, "doc_id", Seq("a", "b c"), 5L, 1)
    }
  }

  test("orderedWindowTopK: minimal ordered-subsequence span, order matters, store ≡ direct") {
    val d = Seq(
      // a(0) b(2) c(4): ordered span 5; ALSO c(5) a(6) b(7) — wrong order
      (1L, "a x b x c c a b"),
      // only the reverse order c b a: no ordered match
      (2L, "c x b x a"),
      // a(0) ... b(5) c(6): span 7; but a(4) b(5) c(6): span 3 (latest-start DP)
      (3L, "a x x x a b c"),
      (4L, "a b x c")).toDF("doc_id", "text")
    val r = TextSearch.orderedWindowTopK(d, "doc_id", "text",
      Seq("a", "b", "c"), window = 7L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((3L, 3L), (4L, 4L), (1L, 5L)))
    // order is a REAL constraint: the unordered form admits doc 2
    val un = TextSearch.windowProximityTopK(d, "doc_id", "text",
      Seq("a", "b", "c"), window = 7L, k = 10)
      .as[(Long, Long)].collect().toMap
    assert(un.contains(2L) && !r.exists(_._1 == 2L))
    // store twin equals the direct operator
    val store = TextSearch.positionalPostings(d, "doc_id", "text")
    assert(TextSearch.searchStoreOrderedWindow(store, "doc_id",
      Seq("a", "b", "c"), 7L, 10).as[(Long, Long)].collect().toSeq == r)
    // duplicate terms are rejected (the chain cannot tell a reused
    // occurrence from a genuine repeat)
    intercept[IllegalArgumentException] {
      TextSearch.orderedWindowTopK(d, "doc_id", "text", Seq("a", "a"), 5L, 1)
    }
    // slop-0 sanity: an adjacent ordered pair scores span 2
    val adj = TextSearch.orderedWindowTopK(d, "doc_id", "text",
      Seq("a", "b"), window = 2L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(adj == Seq((3L, 2L), (4L, 2L), (1L, 2L)).sortBy(x => (x._2, x._1)))
  }

  test("snippetTopK: the argmin cover window with earliest-start ties; store ≡ direct") {
    val d = Seq(
      // covers: [0,4] span 5 and [2,8] span 7 → pick [0,4]
      (1L, "a x b x c x x x a"),
      // two span-3 covers [1,3] and [5,7] → earliest start wins
      (2L, "x a b c x a b c"),
      (3L, "a b only")).toDF("doc_id", "text")
    val r = TextSearch.snippetTopK(d, "doc_id", "text",
      Seq("a", "b", "c"), window = 7L, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((2L, 3L, 1L, 3L), (1L, 5L, 0L, 4L)))
    // span is always end − start + 1, and the ranking matches the
    // windowProximityTopK contract on the same inputs
    assert(r.forall { case (_, span, s, e) => span == e - s + 1 })
    assert(r.map(x => (x._1, x._2)) ==
      TextSearch.windowProximityTopK(d, "doc_id", "text",
        Seq("a", "b", "c"), 7L, 10).as[(Long, Long)].collect().toSeq)
    // store twin equals the direct operator
    val store = TextSearch.positionalPostings(d, "doc_id", "text")
    assert(TextSearch.searchStoreSnippet(store, "doc_id",
      Seq("a", "b", "c"), 7L, 10)
      .as[(Long, Long, Long, Long)].collect().toSeq == r)
  }

  test("searchStoreMoreLikeThis equals moreLikeThis; probe caps are enforced") {
    val corpus = docs
    val probes = docs.filter(col("doc_id").isin(1L, 3L))
    val store = TextSearch.positionalPostings(corpus, "doc_id", "text")
    val direct = TextSearch.moreLikeThis(corpus, probes, "doc_id", "text", 3)
      .orderBy("q_doc_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    val stored = TextSearch.searchStoreMoreLikeThis(store, probes,
        "doc_id", "text", 3, nDocs = Some(corpus.count()))
      .orderBy("q_doc_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(direct.nonEmpty && direct == stored)
    // maxQueryTerms trims identically on both forms
    val directT = TextSearch.moreLikeThis(corpus, probes, "doc_id", "text", 3,
        maxQueryTerms = Some(2))
      .orderBy("q_doc_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    val storedT = TextSearch.searchStoreMoreLikeThis(store, probes,
        "doc_id", "text", 3, nDocs = Some(corpus.count()),
        maxQueryTerms = Some(2))
      .orderBy("q_doc_id", "doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(directT == storedT)
    // the bounded-probe contract carries over
    val eDocs = intercept[IllegalArgumentException] {
      TextSearch.searchStoreMoreLikeThis(store, corpus, "doc_id", "text", 3,
        maxQueryDocs = 2L)
    }
    assert(eDocs.getMessage.contains("maxQueryDocs"))
    // a dense probe universe trips maxProbeTerms with a maxQueryTerms hint
    val eTerms = intercept[IllegalArgumentException] {
      TextSearch.searchStoreMoreLikeThis(store, probes, "doc_id", "text", 3,
        maxProbeTerms = 2)
    }
    assert(eTerms.getMessage.contains("maxQueryTerms"))
    // an empty probe set yields an empty, correctly-shaped result
    assert(TextSearch.searchStoreMoreLikeThis(store,
      probes.filter(col("doc_id") < 0), "doc_id", "text", 3).isEmpty)
    // ... whose q_<idCol> carries the PROBE's id type even when it
    // differs from the store's (long-keyed store, string-keyed probe):
    // both branches must agree or unions across probe batches break
    // (advisor r17 finding)
    val strProbes = probes.filter(col("doc_id") < 0)
      .withColumn("doc_id", col("doc_id").cast("string"))
    val emptyR = TextSearch.searchStoreMoreLikeThis(store, strProbes,
      "doc_id", "text", 3)
    assert(emptyR.isEmpty)
    assert(emptyR.schema("q_doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(emptyR.schema("doc_id").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("suggestTerms: frequency-aware typo correction over the vocabulary; store slices work") {
    val d = Seq(
      (1L, "spark sparks the table"), (2L, "spark spark parks"),
      (3L, "shark joins"), (4L, "spork")).toDF("doc_id", "text")
    val post = TextSearch.postings(d, "doc_id", "text")
    val r = TextSearch.suggestTerms(post, "doc_id", "spark", 1, 10)
      .as[(String, Long, Long)].collect().toSeq
    // d=1 candidates ranked by df desc then term: sparks(1), shark(1),
    // spork(1) tie on df → term asc; parks is d=1 too (drop 's', add
    // nothing? parks→spark = 1 substitution? p-a-r-k-s vs s-p-a-r-k:
    // distance 2) — excluded at maxDist 1
    assert(r == Seq(("shark", 1L, 1L), ("sparks", 1L, 1L), ("spork", 1L, 1L)))
    // the query term itself is never suggested; df ranks corrections
    val r2 = TextSearch.suggestTerms(post, "doc_id", "sprak", 2, 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(r2.head._1 == "spark" && r2.head._2 == 2L)
    // a positional-store slice serves as the vocabulary source
    val store = TextSearch.positionalPostings(d, "doc_id", "text")
    assert(TextSearch.suggestTerms(store, "doc_id", "spark", 1, 10)
      .as[(String, Long, Long)].collect().toSeq == r)
    // UNCOMPACTED-store law: a store holding one row per (term, id,
    // batch) — the same document's postings split across two batch
    // generations — suggests IDENTICALLY to the compacted form: df is
    // the distinct-document count, not the raw row count (the advisor's
    // r17 finding: a row count doubles df for every recurring term)
    val uncompacted = post.withColumn("batch_id", lit(0L)).unionByName(
      post.withColumn("batch_id", lit(1L)))
    assert(TextSearch.suggestTerms(uncompacted, "doc_id", "spark", 1, 10)
      .as[(String, Long, Long)].collect().toSeq == r)
    intercept[IllegalArgumentException] {
      TextSearch.suggestTerms(post, "doc_id", "two words", 1, 5)
    }
    intercept[IllegalArgumentException] {
      TextSearch.suggestTerms(post, "doc_id", "ok", 0, 5)
    }
  }

  // ------------------------------------------------ Unicode tokenization

  private val mlSamples = Seq(
    "Hello, World! 42 times",
    "数据库查询引擎 spark数据",          // Han bigrams + a latin/han MIXED run
    "分散処理システム データストリーム", // Kana+Han, prolonged mark ー in-run
    "검색 엔진 데이터 처리",             // Hangul syllables
    "большие данные поиск",             // Cyrillic: a non-CJK Unicode run
    "mixed 日本語とEnglish words",       // CJK/latin boundary inside a run
    "中", "a中b", "",                    // unigram; 1-char CJK segments
    "  punctuation... only !!! ")

  test("searchTerms: the Unicode/CJK-bigram contract, hand-checked") {
    def toks(s: String) = TextSearch.searchTermsJvm(s)
    assert(toks("Hello, World! 42x") == Seq("hello", "world", "42x"))
    // a CJK segment of n chars emits n−1 overlapping bigrams
    assert(toks("数据库") == Seq("数据", "据库"))
    // mixed run: CJK and non-CJK segments split, order preserved
    assert(toks("spark数据库v2") == Seq("spark", "数据", "据库", "v2"))
    // lone CJK char is a unigram; non-letters separate runs
    assert(toks("中!中") == Seq("中", "中"))
    // the prolonged-sound mark (U+30FC, Lm) bigrams with kana
    assert(toks("データ") == Seq("デー", "ータ"))
    // Cyrillic (any non-CJK script) indexes as whole words
    assert(toks("Большие данные") == Seq("большие", "данные"))
  }

  test("searchTermsJvm is the exact JVM mirror of the column tokenizer") {
    val colToks = mlSamples.map(Tuple1(_)).toDF("t")
      .select(TextSearch.searchTerms(col("t")).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(colToks == mlSamples.map(TextSearch.searchTermsJvm))
  }

  test("triple tokenizer law: native expression ≡ declarative chain ≡ JVM mirror on adversarial generated strings") {
    // a seeded pool crossing every classification boundary the native
    // walk has: ASCII alnum/punct, every CJK range edge (incl. the
    // U+30FC prolonged mark and range endpoints), non-CJK Unicode
    // letters, combining marks (Mn — split runs), non-BMP letters
    // (surrogate pairs in \p{L}), number categories Nd/Nl/No beyond
    // ASCII, uppercase needing multi-char folds (İ ß ΣΟΣ), and symbols
    val pool: IndexedSeq[String] = IndexedSeq(
      "a", "Z", "7", " ", ".", "_", "-", "!", "\t", "\n",
      "中", "ぁ", "ゖ", "ァ", "ヺ", "ー",
      "㐀", "䶿", "一", "鿿", "豈", "﫿",
      "가", "힣",
      "д", "Б", "ع", "ا", "İ", "ı", "ß", "Σ", "Ο", "ς",
      "̇", "́", // combining marks (Mn)
      new String(Character.toChars(0x1D538)), // 𝔸 MATHEMATICAL A (Lu, non-BMP)
      new String(Character.toChars(0x10348)), // 𐍈 GOTHIC LETTER (Lo, non-BMP)
      new String(Character.toChars(0x1F600)), // 😀 (So — separator)
      "٤", // ٤ ARABIC-INDIC DIGIT FOUR (Nd)
      "Ⅲ", // Ⅲ ROMAN NUMERAL (Nl)
      "²", // ² SUPERSCRIPT TWO (No)
      "゙", // combining kana voicing mark (Mn, inside the CJK block)
      "・") // katakana middle dot (Po, inside the CJK block)
    val rnd = new scala.util.Random(180) // deterministic: failures replay
    val gen = (1 to 300).map { _ =>
      val len = rnd.nextInt(24)
      (0 until len).map(_ => pool(rnd.nextInt(pool.size))).mkString
    } ++ mlSamples
    val df = gen.map(Tuple1(_)).toDF("t")
    val both = df.select(
        TextSearch.searchTerms(col("t")).as("native"),
        graft.operators.TextSearch.searchTermsDeclarative(col("t")).as("decl"))
      .as[(Seq[String], Seq[String])].collect().toSeq
    both.zip(gen).foreach { case ((nat, dec), s) =>
      // THE contract law: corpus-side native ≡ query-side JVM mirror,
      // byte-exact on EVERY input — one ROOT fold on both sides is what
      // makes indexed terms and query terms meet (the r17 advisor's
      // locale residual, closed)
      assert(nat == TextSearch.searchTermsJvm(s),
        s"native != JVM mirror on ${s.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"$nat vs ${TextSearch.searchTermsJvm(s)}")
      // the retired declarative chain agrees everywhere EXCEPT the
      // Greek-final-sigma conditional casing: Spark 4's collation-aware
      // lower() applies the Unicode Final_Cased rule with ICU context
      // detection, while the JDK heuristic the contract pins diverges
      // near surrogate pairs (Σ → ς vs σ; found by this generator) —
      // exactly the class of silent corpus/query mismatch that made the
      // old lower()-based chain worth retiring
      if (!s.contains('Σ'))
        assert(nat == dec,
          s"native != declarative on ${s.map(c => f"\\u${c.toInt}%04x").mkString}: $nat vs $dec")
    }
    // null flows through like the old chain (null in → null out)
    assert(df.limit(1).select(
      TextSearch.searchTerms(lit(null).cast("string"))).head().isNullAt(0))
  }

  test("isToken: tokens are fixpoints; strings that re-tokenize are rejected") {
    assert(Seq("spark", "42", "数据", "中", "данные").forall(TextSearch.isToken))
    assert(Seq("two words", "数据库", "spark数据", "", "UP").forall(t => !TextSearch.isToken(t)))
    intercept[IllegalArgumentException] { // a trigram is NOT a store token
      TextSearch.searchTopK(docs, "doc_id", "text", Seq("数据库"), 5)
    }
  }

  test("CJK search end-to-end: bigram postings, phrase = consecutive bigrams, store ≡ direct") {
    val ml = Seq(
      (1L, "数据库查询引擎 runs fast"),
      (2L, "the 数据 catalog"),        // has 数据 but NOT the phrase 数据库
      (3L, "数据库 twice: 数据库!"),
      (4L, "no cjk at all")).toDF("doc_id", "text")
    // conjunctive bigram search: docs containing BOTH 数据 and 据库
    val hits = TextSearch.searchTopK(ml, "doc_id", "text",
      TextSearch.searchTermsJvm("数据库"), 10)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(hits == Set(1L, 3L))
    // phrase over a positional store: consecutive-bigram occurrences
    val store = TextSearch.positionalPostings(ml, "doc_id", "text")
    val occ = TextSearch.searchStorePhrase(store, "doc_id",
      TextSearch.searchTermsJvm("数据库"), 10)
      .as[(Long, Long)].collect().toSeq
    assert(occ == Seq((3L, 2L), (1L, 1L)))
    // proximity across scripts: doc 1 tokens are 数据(0) 据库(1) 库查(2)
    // 查询(3) 询引(4) 引擎(5) runs(6) fast(7) → min |据库 − runs| = 5
    val prox = TextSearch.proximityTopK(ml, "doc_id", "text",
      "据库", "runs", maxDistance = 5L, k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(prox == Seq((1L, 5L)))
  }
}
