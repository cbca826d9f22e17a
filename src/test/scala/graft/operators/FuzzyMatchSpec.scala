package graft.operators

import graft.SparkSpec

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyPairs: pigeonhole completeness for 1 substitution under 2 segments") {
    val df = Seq(
      (1L, "abcd"), (2L, "abxd"), // dist 1 (position 3)
      (3L, "zbcd"),               // dist 1 from #1 (position 1)
      (4L, "qqqq")                // far from everything
    ).toDF("id", "s")
    val got = FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = 1, nSegments = 2)
      .as[(Long, Long, Long)].collect().toSet
    // 1–2 share segment "ab"; 1–3 share segment "cd"; 2–3 differ in both
    // segments (dist 2 anyway); 4 shares nothing
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("fuzzyPairs: a pair touching every segment is missed — the documented blocking contract") {
    val df = Seq((1L, "axcx"), (2L, "aycy")).toDF("id", "s")
    // true distance 2, but both 2-segments differ → never a candidate
    assert(FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = 2, nSegments = 2)
      .count() == 0)
    // with 3 segments ('a','xc'/'yc' — still differing, 'x…'): boundaries
    // shift; the pair is found exactly when SOME whole segment agrees
    val seg3 = FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = 2, nSegments = 3)
      .as[(Long, Long, Long)].collect().toSet
    // len 4, 3 segments → (1,1),(2,1),(3,2): "a"|"x"|"cx" vs "a"|"y"|"cy"
    // — segment "a" agrees, so the pair IS recovered
    assert(seg3 == Set((1L, 2L, 2L)))
  }

  test("fuzzyPairs: variable lengths verify with true Levenshtein; big shifts block out") {
    val df = Seq((1L, "red widget"), (2L, "red widgets"), (3L, "red wid")).toDF("id", "s")
    val got = FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = 3, nSegments = 3)
      .as[(Long, Long, Long)].collect().toSet
    // one trailing insertion: lengths 10/11 still share segment "red"
    // (boundaries 3/3 — floor((1·len)/3) agrees), and the VERIFY is true
    // Levenshtein, not a per-segment bound
    assert(got.contains((1L, 2L, 1L)))
    // three deletions (len 7 vs 10) shift every boundary — no shared
    // block, pair missed: the documented variable-length approximation
    // (choose blockCol to normalize lengths when this matters)
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("fuzzyPairs: oversized blocks are skipped; null strings drop") {
    val same = (1L to 10L).map(i => (i, "identical")).toDF("id", "s")
    // every segment block holds all 10 rows; cap 5 skips them all
    assert(FuzzyMatch.fuzzyPairs(same, "id", "s", maxDist = 0,
      nSegments = 2, maxBlockRows = 5L).count() == 0)
    // uncapped, all 45 identical pairs at dist 0
    assert(FuzzyMatch.fuzzyPairs(same, "id", "s", maxDist = 0,
      nSegments = 2).count() == 45)
    val withNull = Seq((1L, "abc"), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
    assert(FuzzyMatch.fuzzyPairs(withNull, "id", "s", maxDist = 9).count() == 0)
  }

  test("fuzzyPairs: short strings — no empty-segment mega-block, equal-length rescue holds") {
    // lengths < nSegments=3 produce empty segments; those must NOT block
    val df = Seq(
      (1L, "ab"), (2L, "cd"),  // equal length, ALL positions differ —
                               // only the same-length rescue block can
                               // surface them (dist 2)
      (3L, "a"),               // length 1: cross-length vs #1/#2 — the
                               // insertion regime, outside the contract
      (4L, "xy")               // equal length to #1/#2, dist 2 from both
    ).toDF("id", "s")
    val got = FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = 2, nSegments = 3)
      .as[(Long, Long, Long)].collect().toSet
    // every equal-length short pair is a candidate (the substitution
    // contract: equal-length L<n strings are within L ≤ n−1 edits)
    assert(got == Set((1L, 2L, 2L), (1L, 4L, 2L), (2L, 4L, 2L)))
    // the documented cross-length miss: ed("a","ab")=1 but the pair
    // shares no positioned non-empty segment and lengths differ
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
    // and the rescue block discriminates BY LENGTH — a mixed-length short
    // corpus no longer forms one all-short block: same-length blocks are
    // cappable like any other
    val many = ((1L to 20L).map(i => (i, "q" + (i % 2))) :+ (99L, "zz"))
      .toDF("id", "s")
    val capped = FuzzyMatch.fuzzyPairs(many, "id", "s", maxDist = 2,
      nSegments = 3, maxBlockRows = 10L)
    // the 21-row length-2 rescue block exceeds the cap and is skipped;
    // surviving candidates come only from positioned single-char segments
    // (the "q?" family shares seg "q"), never from an all-short block
    assert(capped.as[(Long, Long, Long)].collect()
      .forall { case (a, b, _) => a != 99L && b != 99L })
  }

  test("fuzzyPairs rejects bad parameters") {
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = -1)
    }
    intercept[IllegalArgumentException] {
      FuzzyMatch.fuzzyPairs(df, "id", "s", maxDist = 1, nSegments = 0)
    }
  }
}
