package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScriptSharesSpec extends SparkSpec {
  import spark.implicits._

  private def analyze(texts: (Long, String)*) = {
    val df = texts.toSeq.toDF("id", "text")
    val shares = TextAnalysis.scriptShares(col("text")).toMap
    df.select(col("id"),
        shares("latin_permille").as("latin"),
        shares("cjk_permille").as("cjk"),
        shares("cyrillic_permille").as("cyr"),
        TextAnalysis.dominantScript(col("text")).as("dom"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
  }

  test("script shares: pure, mixed, and empty texts") {
    val out = analyze(
      1L -> "hello world",
      2L -> "你好世界", // four CJK chars
      3L -> "abc 你好", // 3 latin + 2 cjk: 600 / 400 permille
      4L -> "привет", // cyrillic
      5L -> "12345 .,!?", // no script letters at all
      6L -> "")
    assert(out(1L) == ((1000L, 0L, 0L, "latin")))
    assert(out(2L) == ((0L, 1000L, 0L, "cjk")))
    assert(out(3L) == ((600L, 400L, 0L, "latin")))
    assert(out(4L) == ((0L, 0L, 1000L, "cyrillic")))
    assert(out(5L) == ((0L, 0L, 0L, "none")))
    assert(out(6L) == ((0L, 0L, 0L, "none")))
  }

  test("dominant ties break to range order; accented latin counts as latin") {
    val out = analyze(
      1L -> "ab 你好", // 2 latin vs 2 cjk: tie -> latin (range order)
      2L -> "café über") // accents in the latin supplement range
    assert(out(1L)._4 == "latin")
    assert(out(2L) == ((1000L, 0L, 0L, "latin")))
  }
}
