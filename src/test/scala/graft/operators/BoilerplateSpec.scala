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
}
