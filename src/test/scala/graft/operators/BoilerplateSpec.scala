package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // Four docs; "COOKIE NOTICE" appears in 3, "footer (c) corp" in 2
  // (twice inside doc 4 — occurrence counting), "unique line N" never
  // repeats. Blank / whitespace-only lines are structure: never counted,
  // never stripped. Doc 3's notice carries stray spaces — identity is
  // the trimmed form, but the ORIGINAL spelling is what survives or goes.
  private def corpus = Seq(
    (1L, "s1", "COOKIE NOTICE\nunique line 1\n\nfooter (c) corp"),
    (2L, "s1", "unique line 2\nCOOKIE NOTICE"),
    (3L, "s2", "  COOKIE NOTICE  \nunique line 3\n   "),
    (4L, "s2", "footer (c) corp\nunique line 4\nfooter (c) corp")
  ).toDF("doc_id", "source", "text")

  private val lines = split(col("text"), "\n", -1)

  test("unitDocFreq counts distinct docs per trimmed unit, ignoring blanks") {
    val freq = Boilerplate.unitDocFreq(corpus, "doc_id", lines)
      .as[(String, Long)].collect().toMap
    assert(freq("COOKIE NOTICE") == 3)
    assert(freq("footer (c) corp") == 2) // doc 4's two copies count once
    assert(freq("unique line 1") == 1)
    assert(!freq.contains("")) // blank and whitespace-only lines absent
    assert(freq.size == 6)
  }

  test("repeatedUnits applies the minDocs threshold and refuses minDocs < 2") {
    val at2 = Boilerplate.repeatedUnits(corpus, "doc_id", lines, minDocs = 2)
      .select("unit").as[String].collect().toSet
    assert(at2 == Set("COOKIE NOTICE", "footer (c) corp"))
    val at3 = Boilerplate.repeatedUnits(corpus, "doc_id", lines, minDocs = 3)
      .select("unit").as[String].collect().toSet
    assert(at3 == Set("COOKIE NOTICE"))
    intercept[IllegalArgumentException] {
      Boilerplate.repeatedUnits(corpus, "doc_id", lines, minDocs = 1)
    }
  }

  test("stripBoilerplateLines removes every occurrence, keeps order and blanks") {
    val out = Boilerplate.stripBoilerplateLines(corpus, "doc_id", "text", minDocs = 2)
      .select("doc_id", "text_kept", "n_units", "n_stripped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "unique line 1\n", 4L, 2L))) // blank line kept
    assert(out(1) == ((2L, "unique line 2", 2L, 1L)))
    assert(out(2) == ((3L, "unique line 3\n   ", 3L, 1L))) // ws-only line kept
    assert(out(3) == ((4L, "unique line 4", 3L, 2L))) // both copies stripped
  }

  test("perCol scopes frequency to the group (per-site templates)") {
    // "COOKIE NOTICE" is in s1 twice (docs 1,2) but s2 once (doc 3);
    // "footer (c) corp" spans s1/s2 once each → repeats in NEITHER group.
    val out = Boilerplate.stripBoilerplateLines(corpus, "doc_id", "text",
      minDocs = 2, perCol = Some("source"))
      .select("doc_id", "text_kept", "n_stripped")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "unique line 1\n\nfooter (c) corp", 1L)))
    assert(out(1) == ((2L, "unique line 2", 1L)))
    assert(out(2) == ((3L, "  COOKIE NOTICE  \nunique line 3\n   ", 0L)))
    assert(out(3) == ((4L, "footer (c) corp\nunique line 4\nfooter (c) corp", 0L)))
  }

  test("a doc whose every line is boilerplate survives with empty kept text") {
    val df = Seq((1L, "SAME"), (2L, "SAME"), (3L, "SAME\nSAME")).toDF("doc_id", "text")
    val out = Boilerplate.stripBoilerplateLines(df, "doc_id", "text", minDocs = 2)
      .select("doc_id", "text_kept", "n_stripped")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // no doc vanishes
    assert(out.forall(_._2 == ""))
    assert(out.map(_._3).toSeq == Seq(1L, 1L, 2L))
  }

  // --------------------------- token-level exact-substring dedup (spans)

  test("stripRepeatedSpans removes a repeated span that straddles line boundaries") {
    // the 4-token span "P Q R S" repeats across both docs but straddles
    // a newline in doc 1 and sits mid-line in doc 2 — invisible to the
    // unit form, removed by the span form
    val df = Seq(
      (1L, "alpha beta P Q\nR S gamma"),
      (2L, "x P Q R S y")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
        "kept", k = 4, minDocs = 2)
      .select(col("doc_id"), array_join(col("kept"), " ").as("t"),
        col("n_tokens"), col("n_removed"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "alpha beta gamma", 7L, 4L)))
    assert(out(1) == ((2L, "x y", 6L, 4L)))
  }

  test("spans longer than k are removed whole; order of survivors preserved") {
    // 6-token repeated span with k = 4: all three 4-windows are heavy,
    // their union covers the whole span and nothing else
    val df = Seq(
      (1L, "keepA s1 s2 s3 s4 s5 s6 keepB"),
      (2L, "other s1 s2 s3 s4 s5 s6 tail")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
        "kept", k = 4, minDocs = 2)
      .select(col("doc_id"), array_join(col("kept"), " ").as("t"), col("n_removed"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "keepA keepB", 6L)))
    assert(out(1) == ((2L, "other tail", 6L)))
  }

  test("intra-document repetition alone never triggers span removal") {
    val df = Seq(
      (1L, "a b c d a b c d"), // the 4-gram repeats, but only inside doc 1
      (2L, "totally different words here")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
        "kept", k = 4, minDocs = 2)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)]
      .collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("docs shorter than k tokens are untouched; empty text yields zero tokens") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "  "), (4L, "")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
        "kept", k = 4, minDocs = 2)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        array_join(col("kept"), " ").as("t"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 3L, 0L, "a b c"))) // 3 < k: no anchors, kept whole
    assert(out(1) == ((2L, 3L, 0L, "a b c")))
    assert(out(2) == ((3L, 0L, 0L, "")))
    assert(out(3) == ((4L, 0L, 0L, "")))
  }

  test("law: the span form strips at least what the unit form strips on unit-aligned repeats") {
    // every repeated LINE of ≥ k tokens is a repeated span, so the
    // span form's removal set (as token text) must cover the unit
    // form's stripped lines
    val df = Seq(
      (1L, "THE COOKIE BANNER LINE HERE\nunique tail one"),
      (2L, "THE COOKIE BANNER LINE HERE\nunique tail two"),
      (3L, "something else entirely on its own")
    ).toDF("doc_id", "text")
    val unit = Boilerplate.stripBoilerplateLines(df, "doc_id", "text", minDocs = 2)
      .select(col("doc_id"), col("text_kept")).as[(Long, String)].collect().toMap
    val span = Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
        "kept", k = 5, minDocs = 2)
      .select(col("doc_id"), array_join(col("kept"), " ").as("t"))
      .as[(Long, String)].collect().toMap
    // the banner is gone under both; what the span form keeps is a
    // token-subset of what the unit form keeps
    for (id <- Seq(1L, 2L, 3L)) {
      val unitToks = unit(id).split("\\s+").filter(_.nonEmpty).toSet
      val spanToks = span(id).split("\\s+").filter(_.nonEmpty).toSet
      assert(spanToks.subsetOf(unitToks), s"doc $id: $spanToks ⊄ $unitToks")
    }
    assert(!span(1L).contains("COOKIE") && !span(2L).contains("COOKIE"))
  }

  test("repeatedSpanAnchors reports the heavy relation; k and minDocs validated") {
    val df = Seq(
      (1L, "a b c d e"), (2L, "z a b c d e"), (3L, "a b c d e q")
    ).toDF("doc_id", "text")
    val rep = Boilerplate.repeatedSpanAnchors(df, "doc_id", "text",
      k = 5, minDocs = 3).as[(Long, Long)].collect()
    assert(rep.length == 1 && rep.head._2 == 3L) // "a b c d e" in all three
    intercept[IllegalArgumentException] {
      Boilerplate.stripRepeatedSpans(df, "doc_id", "text", "kept", k = 1, minDocs = 2)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.stripRepeatedSpans(df, "doc_id", "text", "kept", k = 4, minDocs = 1)
    }
  }

  test("generic units: fixed-width token chunks (the q109 derivation)") {
    val df = Seq(
      (1L, "a b c d e f g h tail one"),
      (2L, "a b c d e f g h tail two")
    ).toDF("doc_id", "text")
    val words = split(trim(col("text")), "\\s+")
    val chunks = transform(
      sequence(lit(0), ((size(words) - lit(1)) / lit(8)).cast("int")),
      i => array_join(slice(words, i * lit(8) + lit(1), lit(8)), " "))
    val out = Boilerplate.stripRepeatedUnits(df, "doc_id", chunks, "kept", minDocs = 2)
      .select(col("doc_id"), array_join(col("kept"), "\n").as("t"), col("n_stripped"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // shared full chunk "a b c d e f g h" stripped; distinct tails kept
    assert(out(0) == ((1L, "tail one", 1L)))
    assert(out(1) == ((2L, "tail two", 1L)))
  }

  test("keep-first: the canonical carrier keeps the span; every other carrier loses it") {
    val df = Seq(
      (5L, "keep A B C D E tail"), // min-id carrier: canonical, untouched
      (9L, "x A B C D E y"),
      (12L, "A B C D E solo end here")
    ).toDF("doc_id", "text")
    val out = Boilerplate.stripRepeatedSpansKeepFirst(df, "doc_id", "text",
        "kept", k = 5, minDocs = 2)
      .select(col("doc_id"), array_join(col("kept"), " ").as("t"), col("n_removed"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((5L, "keep A B C D E tail", 0L)), s"${out(0)}")
    assert(out(1) == ((9L, "x y", 5L)))
    assert(out(2) == ((12L, "solo end here", 5L)))
  }

  test("law: keep-first removes a subset of the strip-all form's removals") {
    val df = Seq(
      (1L, "alpha beta P Q R S gamma"),
      (2L, "x P Q R S y"),
      (3L, "P Q R S and then entirely different words"),
      (4L, "nothing shared at all in this one")
    ).toDF("doc_id", "text")
    val all = Boilerplate.stripRepeatedSpans(df, "doc_id", "text",
        "kept", k = 4, minDocs = 2)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    val first = Boilerplate.stripRepeatedSpansKeepFirst(df, "doc_id", "text",
        "kept", k = 4, minDocs = 2)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    for (id <- all.keys) assert(first(id) <= all(id), s"doc $id: ${first(id)} > ${all(id)}")
    // exactly one carrier of the shared span kept its copy
    assert(first(1L) == 0L && first(2L) > 0L && first(3L) > 0L)
    assert(first(4L) == 0L && all(4L) == 0L)
  }

  test("intra-doc span dedup: later occurrences lose their windows; first survives; cross-doc untouched") {
    val df = Seq(
      (1L, "a b c X a b c"), // "a b" and "b c" re-occur: positions 4-6 covered
      (2L, "no repeats in here at all"),
      (3L, "a b c d"), // shares bigrams with doc 1 — cross-doc must NOT trigger
      (4L, "w w w w") // self-overlapping run: all but the first window covered
    ).toDF("doc_id", "text")
    val out = Boilerplate.dedupeIntraDocSpans(df, "doc_id", "text", "kept", k = 2)
      .select(col("doc_id"), array_join(col("kept"), " ").as("t"),
        col("n_tokens"), col("n_removed"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a b c X", 7L, 3L)), s"${out(0)}")
    assert(out(1) == ((2L, "no repeats in here at all", 6L, 0L)))
    assert(out(2) == ((3L, "a b c d", 4L, 0L)), "intra-doc only")
    // "w w" at 0,1,2: windows 1 and 2 are dups -> positions 1,2,3 covered
    assert(out(3) == ((4L, "w", 4L, 3L)), s"${out(3)}")
    // docs under k tokens untouched; empty text is empty
    val tiny = Seq((9L, "solo"), (10L, "")).toDF("doc_id", "text")
    val t2 = Boilerplate.dedupeIntraDocSpans(tiny, "doc_id", "text", "kept", k = 2)
      .select(col("doc_id"), col("n_removed")).as[(Long, Long)].collect().toMap
    assert(t2 == Map(9L -> 0L, 10L -> 0L))
  }
}
