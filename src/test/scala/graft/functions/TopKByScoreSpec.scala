package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  // adversarial: duplicate scores (tie-break on id), one-row groups,
  // a group smaller than k, many partitions (forces partial-heap
  // serialize/merge through the shuffle)
  private lazy val rows = {
    val r = new scala.util.Random(7)
    val data = (1 to 2000).map { i =>
      (r.nextInt(20).toLong, r.nextInt(50).toLong, i.toLong)
    } ++ Seq((90L, 1L, 9001L)) // singleton group, fewer rows than k
    data.toDF("grp", "score", "id").repartition(13)
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp"), col("score"), col("id"), col("rank").cast("long").as("rank"))
  }

  private def viaAgg(k: Int) =
    rows.groupBy("grp")
      .agg(Similarity.topKBy(col("score"), col("id"), k).as("topk"))
      .select(col("grp"), posexplode(col("topk")))
      .select(col("grp"), col("col.score").as("score"), col("col.id").as("id"),
        (col("pos") + 1).as("rank"))

  test("heap aggregate equals the row_number window for every k") {
    for (k <- Seq(1, 3, 7, 100)) assertSameRows(viaAgg(k), viaWindow(k))
  }

  test("ties break on id ascending, deterministically") {
    val t = Seq((1L, 5L, 30L), (1L, 5L, 10L), (1L, 5L, 20L)).toDF("grp", "score", "id")
    val got = t.groupBy("grp").agg(Similarity.topKBy(col("score"), col("id"), 2).as("k"))
      .select(explode(col("k.id"))).as[Long].collect().toSeq
    assert(got == Seq(10L, 20L))
  }

  test("null scores are ignored; an all-null group yields an empty array") {
    val t = Seq((1L, Some(5L), 10L), (1L, None, 11L), (2L, None, 12L))
      .toDF("grp", "score", "id")
    val got = t.groupBy("grp").agg(Similarity.topKBy(col("score"), col("id"), 3).as("k"))
      .select(col("grp"), size(col("k")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 0))
  }

  test("topk_by is callable from SQL through the extension registry") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.registerInjectedFunctions(
      { val e = new org.apache.spark.sql.SparkSessionExtensions
        new graft.GraftExtensions().apply(e); e },
      spark.sessionState.functionRegistry)
    rows.createOrReplaceTempView("topk_rows")
    val got = spark.sql(
      """SELECT grp, topk_by(score, id, 2) AS k FROM topk_rows GROUP BY grp""")
      .select(col("grp"), posexplode(col("k")))
      .select(col("grp"), col("col.score").as("score"), col("col.id").as("id"),
        (col("pos") + 1).as("rank"))
    assertSameRows(got, viaAgg(2))
  }

  test("annTopKAgg matches annTopK's rows (modulo the bucket column)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.annTopKAgg(emb, "vec_id", "embedding",
      k = 3, planes = 6, dims = 64, queryFilter = col("vec_id") % 50 === 0)
    val b = Similarity.annTopK(emb, "vec_id", "embedding",
      k = 3, planes = 6, dims = 64, queryFilter = col("vec_id") % 50 === 0)
      .select(col("query_id"), col("neighbor_id"), col("cos_micro"),
        col("rank").cast("long").as("rank"))
    assertSameRows(a, b)
  }
}
