package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec

class TokenModeCountSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(TokenModeCount(ColumnBridge.expression(c)))

  /** The interpreted higher-order fold this expression replaces. */
  private def fold(c: org.apache.spark.sql.Column) =
    array_max(transform(array_distinct(c), t => size(filter(c, x => x === t))))

  test("equals the higher-order fold on seeded random token arrays") {
    val r = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      val n = r.nextInt(40)
      (i, (0 until n).map(_ => s"t${r.nextInt(8)}"))
    }.toDF("id", "toks")
    val got = rows.select(col("id"), native(col("toks")).as("m"),
        fold(col("toks")).as("f"))
      .filter(!(col("m") <=> col("f")))
    assert(got.isEmpty, got.collect().mkString(", "))
  }

  test("edge cases: empty -> null, singleton -> 1, all-same -> n") {
    val rows = Seq(
      (1, Seq.empty[String]), (2, Seq("x")), (3, Seq("x", "x", "x")),
      (4, Seq("a", "b", "a", "b", "a"))).toDF("id", "toks")
    val got = rows.select(col("id"), native(col("toks")))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(got == Map(1 -> null, 2 -> 1, 3 -> 3, 4 -> 3))
  }

  test("null elements count as a value of their own") {
    val rows = Seq((1, Seq[String](null, null, "x"))).toDF("id", "toks")
    assert(rows.select(native(col("toks"))).head().getInt(0) == 2)
  }

  test("registered in SQL as token_mode_count") {
    ColumnBridge.registerInjectedFunctions(
      { val e = new org.apache.spark.sql.SparkSessionExtensions
        new graft.GraftExtensions().apply(e); e },
      spark.sessionState.functionRegistry)
    val got = spark.sql("SELECT token_mode_count(array('a','b','a')) AS m").head().getInt(0)
    assert(got == 2)
  }
}
