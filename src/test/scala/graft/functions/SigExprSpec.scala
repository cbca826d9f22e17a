package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec
import graft.functions.Hashing.{h31Affine, h60}
import graft.operators.Dedup

/** Value-identity proofs for the per-row signature expressions
  * ([[SimHash60]], [[MinHashSig]]) against the explode + aggregate
  * compositions they replaced — the compositions are reproduced here
  * verbatim as the executable specification. */
class SigExprSpec extends SparkSpec {
  import spark.implicits._

  private val docs: DataFrame = {
    val r = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val len = r.nextInt(40)
      (i.toLong, (0 until len).map(_ => s"tok${r.nextInt(9)}").mkString(" "))
    } :+ ((300L, "")) :+ ((301L, "   ")) :+ ((302L, "one two"))
    rows.toDF("doc_id", "text")
  }

  private def tokens: Column = split(trim(col("text")), "\\s+")

  /** The former simhash shape: explode → 60 conditional sums → rebuild. */
  private def composedSimhash(df: DataFrame): DataFrame = {
    val exploded = df
      .select(col("doc_id"), explode(tokens).as("__t"))
      .withColumn("__h", h60(col("__t")))
    val bitSums = (0 until 60).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)).as(s"__b$i"))
    val grouped = exploded.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 60)
      .map(i => when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    grouped.select(col("doc_id"), sig.as("simhash"))
  }

  /** The former minhashSignature shape: explode shingles → k min-aggs. */
  private def composedMinhash(df: DataFrame, n: Int, k: Int): DataFrame = {
    val sh = df.select(col("doc_id"),
      explode(Dedup.tokenShingles(tokens, n)).as("shingle"))
      .withColumn("__base", h60(col("shingle")))
    val mins = (0 until k).map(i => min(h31Affine(i, col("__base"))).as(s"mh$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  test("SimHash60 equals the explode+aggregate composition on 300 random docs") {
    val nat = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val old = composedSimhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat == old)
    assert(nat.nonEmpty)
  }

  test("MinHashSig equals the explode+k-min composition, including doc drop parity") {
    val k = 16
    val nat = Dedup.minhashSignature(docs, "doc_id", "text", n = 3, k = k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    val old = composedMinhash(docs, n = 3, k = k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    assert(nat == old)
    // docs shorter than n tokens must be absent on BOTH sides
    assert(!nat.contains(302L) && !old.contains(302L))
    assert(nat.nonEmpty)
  }

  test("null/empty token array yields null signature (old shape dropped the doc)") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("doc_id", "toks")
      .select(col("doc_id"),
        ColumnBridge.column(SimHash60(ColumnBridge.expression(col("toks")))).as("s"),
        ColumnBridge.column(MinHashSig(ColumnBridge.expression(col("toks")), 4)).as("m"))
    val byId = df.collect().map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(byId(1L) == ((false, false)))
    assert(byId(2L) == ((true, true)))
  }

  test("native H60 equals the conv(substring(md5)) composition it replaced") {
    val r = new scala.util.Random(11)
    val strs = (0 until 500).map(_ => r.nextString(r.nextInt(40))) :+ "" :+ "a"
    val df = strs.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
      .withColumn("nat", h60(col("s")))
      .withColumn("old", conv(substring(md5(col("s").cast("string")), 1, 15), 16, 10).cast("long"))
    assert(df.filter(col("nat") =!= col("old")).count() == 0)
    // null propagation matches md5(null)
    val n = Seq((1, Option.empty[String])).toDF("i", "s").select(h60(col("s"))).head()
    assert(n.isNullAt(0))
    // and the plan-build-time twin agrees
    assert(Hashing.h60Jvm("a") ==
      df.filter(col("s") === "a").select(col("nat")).head().getLong(0))
  }
}
