package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.clean.Clean

class FixMojibakeSpec extends SparkSpec {
  import spark.implicits._

  /** JVM-side corruption: the UTF-8 bytes read back under the wrong
    * charset — exactly the double-encoding the expression inverts.
    * cp1252 is simulated byte-for-byte as WINDOWS decodes it (the 27
    * defined 0x80–0x9F punctuation codepoints, undefined bytes passed
    * through as C1 controls) — the JVM's own windows-1252 decoder maps
    * the five undefined bytes to U+FFFD, destroying the byte, which is
    * not what real-world mojibake looks like. */
  private def garble(s: String, charset: String): String = {
    val latin1 = new String(s.getBytes(StandardCharsets.UTF_8),
      StandardCharsets.ISO_8859_1)
    if (charset == "ISO-8859-1") latin1
    else {
      val table = Map(
        0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
        0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
        0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
        0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
        0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
        0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
        0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
      latin1.map(c => table.getOrElse(c.toInt, c))
    }
  }

  private def repair(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Clean.fixMojibake(col("t")).as("r")).as[String].head()

  private val Multilingual =
    "Émile's café — 数据库 test – price €1,50 ™ done… 😀 кошка"

  test("inverts a Latin-1 read and a Windows-1252 read exactly") {
    for (cs <- Seq("ISO-8859-1", "windows-1252")) {
      val bad = garble(Multilingual, cs)
      assert(bad != Multilingual)
      assert(repair(bad) == Multilingual, cs)
    }
  }

  test("clean text passes through unchanged") {
    for (s <- Seq(
      "plain ascii only",
      "café déjà-vu naïve", // real accents: invalid UTF-8 when inverted
      "数据库テスト한국어",  // unmappable beyond U+00FF
      "mixed é and 数 together",
      "")) assert(repair(s) == s, s)
  }

  test("double corruption needs exactly two applications") {
    val twice = garble(garble(Multilingual, "ISO-8859-1"), "ISO-8859-1")
    val once = repair(twice)
    assert(once == garble(Multilingual, "ISO-8859-1"))
    assert(repair(once) == Multilingual)
  }

  test("repair is idempotent on its own output") {
    val fixed = repair(garble(Multilingual, "windows-1252"))
    assert(repair(fixed) == fixed)
  }

  test("cp1252-undefined bytes (0x81 etc.) round-trip through the C1 identity arm") {
    // U+0081's UTF-8 bytes C2 81 read as cp1252 → Â + the undefined
    // 0x81, which the JVM decodes to the C1 control itself
    val s = "x\u0081y\u008Dz"
    val bad = garble(s, "windows-1252")
    assert(repair(bad) == s)
  }

  test("null propagates; SQL surface matches the Scala wrapper") {
    val rows = Seq(Some(garble("Ünïcodé 数", "ISO-8859-1")), None).toDF("t")
    rows.createOrReplaceTempView("moji_probe")
    val sql = spark.sql("SELECT fix_mojibake(t) AS r FROM moji_probe")
      .as[Option[String]].collect().toSeq
    val scala = rows.select(Clean.fixMojibake(col("t")).as("r"))
      .as[Option[String]].collect().toSeq
    assert(sql == scala)
    assert(sql == Seq(Some("Ünïcodé 数"), None))
  }
}
