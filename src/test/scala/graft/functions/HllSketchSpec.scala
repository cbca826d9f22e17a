package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketch

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[String], p: Int): Seq[Int] =
    values.map(v => Tuple1(Hashing.h60Jvm(v))).toDF("h")
      .agg(Sketch.hllSketch(col("h"), p).as("sk"))
      .as[Seq[Int]].head()

  test("registers match the hand arithmetic from the portable hash") {
    val vals = Seq("a", "b", "c", "duplicate", "duplicate")
    val p = 4
    val got = sketchOf(vals, p)
    val expected = new Array[Int](1 << p)
    vals.foreach { v =>
      val h = Hashing.h60Jvm(v)
      val bucket = (h & ((1 << p) - 1)).toInt
      val w = h >>> p
      val rho =
        if (w == 0) 61 - p
        else 61 - p - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > expected(bucket)) expected(bucket) = rho
    }
    assert(got == expected.toSeq)
  }

  test("merge law: union of slice sketches equals the direct sketch") {
    val rows = (1 to 2000).map(i => (i % 3, Hashing.h60Jvm(s"user$i")))
    val df = rows.toDF("slice", "h")
    val direct = df.agg(Sketch.hllSketch(col("h"), 8).as("sk"))
      .as[Seq[Int]].head()
    val merged = df.groupBy("slice")
      .agg(Sketch.hllSketch(col("h"), 8).as("sk"))
      .agg(Sketch.hllMerge(col("sk")).as("sk"))
      .as[Seq[Int]].head()
    assert(merged == direct)
  }

  test("merging mismatched widths fails loudly, never estimates garbage") {
    val df = Seq(
      (1, Seq.fill(16)(1)), (2, Seq.fill(32)(1))
    ).toDF("g", "sk")
    val e = intercept[Exception] {
      df.agg(Sketch.hllMerge(col("sk"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("estimate: ±10% on 10k distinct at p=12; linear counting exact-ish when tiny; empty → 0") {
    val big = (1 to 10000).map(i => Tuple1(Hashing.h60Jvm(s"v$i"))).toDF("h")
      .agg(Sketch.hllEstimate(Sketch.hllSketch(col("h"), 12)).as("e"))
      .as[Double].head()
    assert(math.abs(big - 10000) < 1000, s"estimate $big")
    val small = (1 to 20).map(i => Tuple1(Hashing.h60Jvm(s"v$i"))).toDF("h")
      .agg(Sketch.hllEstimate(Sketch.hllSketch(col("h"), 12)).as("e"))
      .as[Double].head()
    assert(math.abs(small - 20) < 2, s"estimate $small")
    val empty = Seq(Tuple1(Option.empty[Long])).toDF("h")
      .agg(Sketch.hllEstimate(Sketch.hllSketch(col("h"), 6)).as("e"))
      .as[Double].head()
    assert(empty == 0.0)
  }

  test("SQL surface equals the Scala wrappers") {
    val df = (1 to 500).map(i => (i % 5, Hashing.h60Jvm(s"u$i"))).toDF("g", "h")
    df.createOrReplaceTempView("hll_probe")
    val sql = spark.sql(
      """SELECT g, hll_estimate(hll_merge(sk)) AS e
        |FROM (SELECT g, g2, hll_sketch(h, 8) AS sk
        |      FROM (SELECT g, g % 2 AS g2, h FROM hll_probe)
        |      GROUP BY g, g2)
        |GROUP BY g ORDER BY g""".stripMargin)
      .as[(Int, Double)].collect().toSeq
    val scala = df.withColumn("g2", col("g") % 2)
      .groupBy("g", "g2").agg(Sketch.hllSketch(col("h"), 8).as("sk"))
      .groupBy("g").agg(Sketch.hllEstimate(Sketch.hllMerge(col("sk"))).as("e"))
      .orderBy("g")
      .as[(Int, Double)].collect().toSeq
    assert(sql == scala)
  }
}
