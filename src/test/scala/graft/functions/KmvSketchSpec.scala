package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketch

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(values: Seq[String], k: Int): Seq[Long] =
    values.map(v => Tuple1(Hashing.h60Jvm(v))).toDF("h")
      .agg(Sketch.kmvSketch(col("h"), k).as("sk"))
      .as[Seq[Long]].head()

  test("sketch is the k smallest distinct hashes, sorted") {
    val vals = Seq("a", "b", "c", "d", "e", "f", "duplicate", "duplicate")
    val got = sketchOf(vals, 4)
    val expected = vals.map(Hashing.h60Jvm).distinct.sorted.take(4)
    assert(got == expected)
  }

  test("below k the sketch IS the whole hashed set and the estimate is exact") {
    val vals = Seq("x", "y", "z")
    assert(sketchOf(vals, 16) == vals.map(Hashing.h60Jvm).distinct.sorted)
    val est = vals.map(v => Tuple1(Hashing.h60Jvm(v))).toDF("h")
      .agg(Sketch.kmvEstimate(Sketch.kmvSketch(col("h"), 16), 16).as("e"))
      .as[Long].head()
    assert(est == 3L)
  }

  test("merge law: bottom-k of slice sketches equals the direct bottom-k") {
    val rows = (1 to 2000).map(i => (i % 7, Hashing.h60Jvm(s"user$i")))
    val df = rows.toDF("slice", "h")
    val direct = df.agg(Sketch.kmvSketch(col("h"), 32).as("sk"))
      .as[Seq[Long]].head()
    val merged = df.groupBy("slice")
      .agg(Sketch.kmvSketch(col("h"), 32).as("sk"))
      .agg(Sketch.kmvMerge(col("sk"), 32).as("sk"))
      .as[Seq[Long]].head()
    assert(merged == direct)
    assert(direct == rows.map(_._2).distinct.sorted.take(32))
  }

  test("estimate matches the 128-bit floor arithmetic and lands within ±15% at k=256") {
    val n = 5000
    val hashes = (1 to n).map(i => Hashing.h60Jvm(s"v$i"))
    val est = hashes.map(Tuple1(_)).toDF("h")
      .agg(Sketch.kmvEstimate(Sketch.kmvSketch(col("h"), 256), 256).as("e"))
      .as[Long].head()
    val hk = hashes.distinct.sorted.apply(255)
    val expected = java.math.BigInteger.valueOf(255L).shiftLeft(60)
      .divide(java.math.BigInteger.valueOf(hk)).longValueExact()
    assert(est == expected)
    assert(math.abs(est - n) < n * 0.15, s"estimate $est for $n distinct")
  }

  test("merging a sketch longer than k fails loudly (parameter mismatch)") {
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L))).toDF("sk")
    val e = intercept[Exception] {
      df.agg(Sketch.kmvMerge(col("sk"), 4)).collect()
    }
    assert(e.getMessage.contains("kmv_merge") || e.getCause != null)
  }

  test("malformed sketches (unsorted / out of range) null the estimate, never garbage") {
    val bad = Seq(
      Tuple1(Seq(5L, 3L)),            // not increasing
      Tuple1(Seq(1L, 1L << 61))       // out of 60-bit range
    ).toDF("sk")
    val out = bad.select(Sketch.kmvEstimate(col("sk"), 4).as("e"))
      .collect().map(r => r.isNullAt(0))
    assert(out.forall(identity))
  }

  test("resemblance: exact Jaccard when both sets fit under k; identical sets → 1000") {
    val a = (1 to 30).map(i => s"k$i")
    val b = (16 to 45).map(i => s"k$i")   // |∩| = 15, |∪| = 45
    def skDf(vals: Seq[String]) =
      vals.map(v => Tuple1(Hashing.h60Jvm(v))).toDF("h")
        .agg(Sketch.kmvSketch(col("h"), 64).as("sk"))
    val df = skDf(a).crossJoin(skDf(b).withColumnRenamed("sk", "sk2"))
    val perm = df.select(
      Sketch.kmvResemblancePermille(col("sk"), col("sk2"), 64).as("p"))
      .as[Long].head()
    assert(perm == 1000L * 15 / 45)
    val same = skDf(a).select(
      Sketch.kmvResemblancePermille(col("sk"), col("sk"), 64).as("p"))
      .as[Long].head()
    assert(same == 1000L)
  }

  test("resemblance estimates within ±0.12 absolute at k=256 over 4k-element sets") {
    val a = (1 to 4000).map(i => s"e$i")
    val b = (2001 to 6000).map(i => s"e$i")  // true J = 2000/6000 = 1/3
    def skDf(vals: Seq[String], name: String) =
      vals.map(v => Tuple1(Hashing.h60Jvm(v))).toDF("h")
        .agg(Sketch.kmvSketch(col("h"), 256).as(name))
    val perm = skDf(a, "ska").crossJoin(skDf(b, "skb"))
      .select(Sketch.kmvResemblancePermille(col("ska"), col("skb"), 256).as("p"))
      .as[Long].head()
    assert(math.abs(perm - 333) < 120, s"got $perm permille, true 333")
  }

  test("empty input yields the empty sketch; resemblance of two empties is null") {
    val empty = Seq.empty[Tuple1[Long]].toDF("h")
      .agg(Sketch.kmvSketch(col("h"), 8).as("sk"))
    assert(empty.as[Seq[Long]].head().isEmpty)
    val r = empty.select(
      Sketch.kmvResemblancePermille(col("sk"), col("sk"), 8).as("p"))
    assert(r.collect().head.isNullAt(0))
  }

  test("SQL surface equals the Scala surface") {
    val rows = (1 to 100).map(i => (i % 3, Hashing.h60Jvm(s"u$i")))
    rows.toDF("slice", "h").createOrReplaceTempView("kmv_in")
    val sql = spark.sql(
      """SELECT kmv_estimate(kmv_merge(sk, 16), 16) AS e FROM (
        |  SELECT slice, kmv_sketch(h, 16) AS sk FROM kmv_in GROUP BY slice)
        |""".stripMargin).as[Long].head()
    val scala = rows.toDF("slice", "h").groupBy("slice")
      .agg(Sketch.kmvSketch(col("h"), 16).as("sk"))
      .agg(Sketch.kmvEstimate(Sketch.kmvMerge(col("sk"), 16), 16).as("e"))
      .as[Long].head()
    assert(sql == scala)
    val sqlRes = spark.sql(
      """SELECT kmv_resemblance_permille(kmv_sketch(h, 16), kmv_sketch(h, 16), 16)
        |  AS p FROM kmv_in""".stripMargin).as[Long].head()
    assert(sqlRes == 1000L)
  }
}
