package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketch

class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private def filterOf(values: Seq[String], m: Int, k: Int): Seq[Long] =
    values.map(v => Tuple1(Hashing.h60Jvm(v))).toDF("h")
      .agg(Sketch.bloomSketch(col("h"), m, k).as("bf"))
      .as[Seq[Long]].head()

  test("words match the hand arithmetic from the affine positions") {
    val vals = Seq("a", "b", "c")
    val (m, k) = (64, 3)
    val got = filterOf(vals, m, k)
    val expected = new Array[Long](m / 32)
    vals.foreach { v =>
      val h = Hashing.h60Jvm(v) & ((1L << 60) - 1)
      (0 until k).foreach { i =>
        val (a, b) = Hashing.affineParams(i)
        val pos = (((a * (h % Hashing.P31) + b) % Hashing.P31) % m).toInt
        expected(pos / 32) |= 1L << (pos % 32)
      }
    }
    assert(got == expected.toSeq)
    assert(got.forall(w => w >= 0 && w < (1L << 32)))
  }

  test("no false negatives: every built-over hash probes true, before and after merge") {
    val rows = (1 to 500).map(i => (i % 5, Hashing.h60Jvm(s"id$i")))
    val merged = rows.toDF("slice", "h").groupBy("slice")
      .agg(Sketch.bloomSketch(col("h"), 4096, 4).as("bf"))
      .agg(Sketch.bloomMerge(col("bf")).as("bf"))
    val misses = merged
      .crossJoin(rows.map(_._2).toDF("h"))
      .select(Sketch.bloomMightContain(col("bf"), col("h"), 4).as("might"))
      .filter(!col("might")).count()
    assert(misses == 0L)
  }

  test("merge law: OR of slice filters equals the direct filter") {
    val rows = (1 to 1000).map(i => (i % 7, Hashing.h60Jvm(s"v$i")))
    val df = rows.toDF("slice", "h")
    val direct = df.agg(Sketch.bloomSketch(col("h"), 2048, 3).as("bf"))
      .as[Seq[Long]].head()
    val merged = df.groupBy("slice")
      .agg(Sketch.bloomSketch(col("h"), 2048, 3).as("bf"))
      .agg(Sketch.bloomMerge(col("bf")).as("bf"))
      .as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("false-positive rate is near the analytic (1-e^(-kn/m))^k, not catastrophically off") {
    val n = 1000
    val (m, k) = (8192, 4)
    val bf = (1 to n).map(i => Tuple1(Hashing.h60Jvm(s"in$i"))).toDF("h")
      .agg(Sketch.bloomSketch(col("h"), m, k).as("bf"))
    val probes = (1 to 2000).map(i => Tuple1(Hashing.h60Jvm(s"out$i"))).toDF("h")
    val fp = bf.crossJoin(probes)
      .select(Sketch.bloomMightContain(col("bf"), col("h"), k).as("might"))
      .filter(col("might")).count()
    val expected = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp / 2000.0 < expected * 4 + 0.01, s"fp rate ${fp / 2000.0} vs analytic $expected")
  }

  test("merging mismatched widths fails loudly, never answers garbage") {
    val df = Seq(
      Tuple1(Seq.fill(2)(0L)), Tuple1(Seq.fill(4)(0L))
    ).toDF("bf")
    val e = intercept[Exception] {
      df.agg(Sketch.bloomMerge(col("bf"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("malformed filters (word out of 32-bit range) null the probe, never garbage") {
    val bad = Seq(Tuple1(Seq(1L << 33))).toDF("bf")
    val out = bad.select(
      Sketch.bloomMightContain(col("bf"), lit(42L), 2).as("p")).collect()
    assert(out.head.isNullAt(0))
  }

  test("build rejects m not a multiple of 32 (probe recovers m from word count)") {
    val df = Seq(Tuple1(1L)).toDF("h")
    val e = intercept[Exception] {
      df.agg(Sketch.bloomSketch(col("h"), 100, 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("multiple of 32"))
  }

  test("SQL surface equals the Scala surface") {
    val rows = (1 to 200).map(i => (i % 3, Hashing.h60Jvm(s"u$i")))
    rows.toDF("slice", "h").createOrReplaceTempView("bloom_in")
    val sqlHits = spark.sql(
      """SELECT count(*) AS c FROM (
        |  SELECT bloom_might_contain(
        |    (SELECT bloom_merge(bf) FROM (
        |       SELECT slice, bloom_sketch(h, 1024, 3) AS bf
        |       FROM bloom_in GROUP BY slice)),
        |    h, 3) AS might
        |  FROM bloom_in) WHERE might""".stripMargin).as[Long].head()
    assert(sqlHits == 200L)
  }
}
