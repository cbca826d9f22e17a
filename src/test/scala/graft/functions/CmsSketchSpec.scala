package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketch

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(keys: Seq[String]): Seq[Long] = keys.map(Hashing.h60Jvm)

  test("point estimates are >= the true count and exact absent collisions") {
    // 3 distinct keys, small enough that a 4x512 sketch has no collisions
    val keys = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val df = hashed(keys).map(Tuple1(_)).toDF("h")
    val sk = df.agg(Sketch.cmsSketch(col("h"), 4, 512).as("sk"))
    val est = Seq("a", "b", "c").map { k =>
      sk.select(Sketch.cmsQuery(col("sk"), lit(Hashing.h60Jvm(k)), 4).as("e"))
        .as[Long].head()
    }
    assert(est == Seq(5L, 3L, 1L))
    // an absent key reads the collision mass only — here zero
    val absent = sk.select(
      Sketch.cmsQuery(col("sk"), lit(Hashing.h60Jvm("zzz")), 4)).as[Long].head()
    assert(absent == 0L)
  }

  test("merge law: sum of slice sketches equals the direct sketch, estimates included") {
    val rows = (1 to 3000).map(i => (i % 4, Hashing.h60Jvm(s"k${i % 97}")))
    val df = rows.toDF("slice", "h")
    val direct = df.agg(Sketch.cmsSketch(col("h"), 4, 64).as("sk"))
      .as[Seq[Long]].head()
    val merged = df.groupBy("slice")
      .agg(Sketch.cmsSketch(col("h"), 4, 64).as("sk"))
      .agg(Sketch.cmsMerge(col("sk")).as("sk"))
      .as[Seq[Long]].head()
    assert(merged == direct)
    // with 97 keys over width 64 collisions EXIST: every estimate still
    // bounds the true count from above
    val sk = df.agg(Sketch.cmsSketch(col("h"), 4, 64).as("sk"))
    (0 until 97).foreach { k =>
      val truth = rows.count(_._2 == Hashing.h60Jvm(s"k$k")).toLong
      val e = sk.select(
        Sketch.cmsQuery(col("sk"), lit(Hashing.h60Jvm(s"k$k")), 4)).as[Long].head()
      assert(e >= truth, s"k$k: est $e < true $truth")
    }
  }

  test("merging mismatched sizes fails loudly") {
    val df = Seq((1, Seq.fill(8)(1L)), (2, Seq.fill(16)(1L))).toDF("g", "sk")
    val e = intercept[Exception] {
      df.agg(Sketch.cmsMerge(col("sk"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL surface equals the Scala wrappers") {
    val df = (1 to 400).map(i => (i % 3, Hashing.h60Jvm(s"u${i % 11}")))
      .toDF("g", "h")
    df.createOrReplaceTempView("cms_probe")
    val sql = spark.sql(
      s"""SELECT g, cms_query(cms_merge(sk), ${Hashing.h60Jvm("u3")}L, 4) AS e
         |FROM (SELECT g, g2, cms_sketch(h, 4, 128) AS sk
         |      FROM (SELECT g, g % 2 AS g2, h FROM cms_probe) GROUP BY g, g2)
         |GROUP BY g ORDER BY g""".stripMargin)
      .as[(Int, Long)].collect().toSeq
    val scala = df.withColumn("g2", col("g") % 2)
      .groupBy("g", "g2").agg(Sketch.cmsSketch(col("h"), 4, 128).as("sk"))
      .groupBy("g").agg(Sketch.cmsMerge(col("sk")).as("sk"))
      .select(col("g"),
        Sketch.cmsQuery(col("sk"), lit(Hashing.h60Jvm("u3")), 4).as("e"))
      .orderBy("g")
      .as[(Int, Long)].collect().toSeq
    assert(sql == scala)
  }
}
