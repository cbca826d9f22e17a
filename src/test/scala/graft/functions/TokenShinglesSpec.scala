package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec

class TokenShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: org.apache.spark.sql.Column, n: Int) =
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(c), n))

  /** The HOF composition this expression replaces. */
  private def fold(c: org.apache.spark.sql.Column, n: Int) =
    when(size(c) >= n,
      array_distinct(transform(sequence(lit(1), size(c) - (n - 1)),
        i => array_join(slice(c, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))

  test("equals the composition it replaces on seeded random token arrays") {
    val r = new scala.util.Random(13)
    val rows = (1 to 400).map { i =>
      val len = r.nextInt(30)
      (i, (0 until len).map(_ => s"w${r.nextInt(6)}"))
    }.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = rows
        .select(col("id"), native(col("toks"), n).as("a"), fold(col("toks"), n).as("b"))
        .filter(!(col("a") <=> col("b")))
      assert(bad.isEmpty, s"n=$n: " + bad.collect().mkString(", "))
    }
  }

  test("edges: short input -> empty, null input -> empty, null elements skipped") {
    val rows = Seq(
      (1, Some(Seq("a", "b"))),
      (2, Some(Seq.empty[String])),
      (3, None),
      (4, Some(Seq("a", null, "c"))))
      .toDF("id", "toks")
    val got = rows.select(col("id"), native(col("toks"), 3).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1) == Nil && got(2) == Nil && got(3) == Nil)
    assert(got(4) == List("a c")) // array_join semantics: nulls skipped
  }

  test("registered in SQL as token_shingles") {
    ColumnBridge.registerInjectedFunctions(
      { val e = new org.apache.spark.sql.SparkSessionExtensions
        new graft.GraftExtensions().apply(e); e },
      spark.sessionState.functionRegistry)
    val got = spark.sql("SELECT token_shingles(array('a','b','c'), 2) AS s")
      .head().getSeq[String](0).toList
    assert(got == List("a b", "b c"))
  }

  test("first-occurrence order and distinctness") {
    val rows = Seq((1, Seq("x", "y", "x", "y", "x"))).toDF("id", "toks")
    val got = rows.select(native(col("toks"), 2)).head().getSeq[String](0).toList
    assert(got == List("x y", "y x"))
  }
}
