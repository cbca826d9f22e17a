package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec

/** The extensions entry point, exercised through the real injection path
  * (applied to the shared session's registry — a fresh builder would be
  * silently reused by getOrCreate): SQL users can call the native
  * expression without the Scala API. */
class GraftExtensionsSpec extends SparkSpec {

  test("float_dot is callable from SQL once the extension's injections apply") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ColumnBridge.registerInjectedFunctions(ext, spark.sessionState.functionRegistry)
    val got = spark.sql(
      """SELECT float_dot(
        |  CAST(array(1.0, 2.0, 3.0) AS array<float>),
        |  CAST(array(4.0, 5.0, 6.0) AS array<float>)) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(got == 32.0)
    // analyzer-level type check rejects wrong element types
    val e = intercept[Exception](
      spark.sql("SELECT float_dot(array(1.0), array(2.0))").collect())
    assert(e.getMessage.contains("array<float>"))
  }

  test("simhash60 and minhash_sig are callable from SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ColumnBridge.registerInjectedFunctions(ext, spark.sessionState.functionRegistry)
    val row = spark.sql(
      """SELECT simhash60(array('a', 'b', 'a')) AS s,
        |       minhash_sig(array('a b c', 'b c d'), 4) AS m,
        |       simhash60(CAST(array() AS array<string>)) AS s_empty""".stripMargin).collect()(0)
    // values must equal the Scala-API operators over the same inputs
    import spark.implicits._
    val viaApi = graft.operators.Dedup.simhash(
      Seq((1L, "a b a")).toDF("id", "text"), "id", "text").collect()(0).getLong(1)
    assert(row.getLong(0) == viaApi)
    assert(row.getSeq[Long](1).length == 4)
    assert(row.isNullAt(2))
    // degenerate SQL inputs return null per the help text, never throw
    val edge = spark.sql(
      "SELECT minhash_sig(array(CAST(NULL AS STRING)), 4) AS m").collect()(0)
    assert(edge.isNullAt(0))
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('x'), 'k')").collect())
    assert(e.getMessage.contains("integral constant"))
  }
}
