package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketch

class HistSketchSpec extends SparkSpec {
  import spark.implicits._

  private def histOf(values: Seq[Long], lo: Long, w: Long, n: Int): Seq[Long] =
    values.map(Tuple1(_)).toDF("v")
      .agg(Sketch.histSketch(col("v"), lo, w, n).as("hs"))
      .as[Seq[Long]].head()

  test("bucket assignment: interior, boundaries, and edge-bucket clamps") {
    // lo=10, width=5, n=4: buckets [10,15) [15,20) [20,25) [25,30)
    val got = histOf(Seq(10L, 14L, 15L, 24L, 9L, -100L, 30L, 1000L), 10L, 5L, 4)
    //           b0: 10,14 + clamped 9,-100   b1: 15   b2: 24   b3: clamped 30,1000
    assert(got == Seq(4L, 1L, 1L, 2L))
  }

  test("merge law: hist_merge of slice histograms equals the direct histogram") {
    val rows = (1 to 1000).map(i => (i % 7, (i % 83).toLong))
    val df = rows.toDF("slice", "v")
    val direct = df.agg(Sketch.histSketch(col("v"), 0L, 10L, 9).as("hs"))
      .as[Seq[Long]].head()
    val merged = df.groupBy("slice")
      .agg(Sketch.histSketch(col("v"), 0L, 10L, 9).as("hs"))
      .agg(Sketch.histMerge(col("hs")).as("hs"))
      .as[Seq[Long]].head()
    assert(merged == direct)
    assert(direct.sum == 1000L)
  }

  test("quantile bucket: smallest bucket with 1000*cumsum >= p*total; empty → null") {
    // counts [2, 0, 3, 5]: total 10; cum [2, 2, 5, 10]
    val df = Seq(Tuple1(Seq(2L, 0L, 3L, 5L))).toDF("hs")
    def q(p: Int): Any = df.select(Sketch.histQuantileBucket(col("hs"), p)).head().get(0)
    assert(q(200) == 0)   // 1000*2 >= 200*10
    assert(q(201) == 2)   // needs cum > 2 → bucket 2
    assert(q(500) == 2)   // 1000*5 >= 500*10 exactly
    assert(q(501) == 3)
    assert(q(1000) == 3)
    val empty = Seq(Tuple1(Seq(0L, 0L))).toDF("hs")
    assert(empty.select(Sketch.histQuantileBucket(col("hs"), 500)).head().isNullAt(0))
  }

  test("quantile bucket agrees with the exact rank over a generated distribution") {
    val values = (1 to 5000).map(i => ((i * i) % 997).toLong)
    val hs = histOf(values, 0L, 10L, 100)
    val sorted = values.sorted
    for (p <- Seq(100, 250, 500, 750, 900, 990, 1000)) {
      val bucket = Seq(Tuple1(hs)).toDF("hs")
        .select(Sketch.histQuantileBucket(col("hs"), p)).head().getInt(0)
      // the exact p-quantile value (smallest v with 1000*rank >= p*n)
      val rank = (p.toLong * sorted.length + 999) / 1000
      val exact = sorted(math.max(rank.toInt - 1, 0))
      assert(bucket == (exact / 10).toInt,
        s"p=$p: bucket $bucket vs exact value $exact")
    }
  }

  test("width mismatch in hist_merge fails loudly (the cms_merge contract)") {
    val df = Seq(Tuple1(Seq(1L, 2L)), Tuple1(Seq(1L, 2L, 3L))).toDF("hs")
    val e = intercept[Exception] {
      df.agg(Sketch.histMerge(col("hs"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("double measures are rejected at type check — micro-scale upstream") {
    val df = Seq(Tuple1(1.5)).toDF("v")
    val e = intercept[Exception] {
      df.agg(Sketch.histSketch(col("v"), 0L, 1L, 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("SQL surface equals the Scala surface") {
    val rows = (1 to 500).map(i => (i % 3, (i % 40).toLong))
    rows.toDF("slice", "v").createOrReplaceTempView("hist_in")
    val sql = spark.sql(
      """SELECT hist_quantile_bucket(hist_merge(hs), 900) AS b FROM (
        |  SELECT slice, hist_sketch(v, CAST(0 AS BIGINT), CAST(5 AS BIGINT), 8) AS hs
        |  FROM hist_in GROUP BY slice)""".stripMargin).as[Int].head()
    val scala = rows.toDF("slice", "v").groupBy("slice")
      .agg(Sketch.histSketch(col("v"), 0L, 5L, 8).as("hs"))
      .agg(Sketch.histQuantileBucket(Sketch.histMerge(col("hs")), 900).as("b"))
      .as[Int].head()
    assert(sql == scala)
  }
}
