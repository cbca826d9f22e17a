package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class FloatDotProductSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted higher-order fold the native expression replaces —
    * kept here as the semantic reference. */
  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def vecs = Seq(
    (1L, Array(1.0f, 2.5f, -3.25f, 0.125f), Array(4.0f, -1.5f, 2.0f, 8.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f, 0.4f), Array(0.4f, 0.3f, 0.2f, 0.1f)),
    (3L, Array.fill(64)(0.015625f), Array.fill(64)(-2.0f))
  ).toDF("id", "a", "b")

  test("bit-identical to the aggregate/zip_with fold") {
    val both = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      foldDot(col("a"), col("b")).as("fold")).collect()
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("null array, mismatched lengths and null elements all yield null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // length mismatch
      (null, Array(1.0f))                           // null side
    ).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("participates in whole-stage codegen (not CodegenFallback)") {
    // a range source (not a local relation, which would constant-fold the
    // whole projection away) and plain array() construction (a transform()
    // builder is itself CodegenFallback and would poison the collapsed
    // Project) so the generated code path actually runs
    val df = spark.range(100).select(
      array((1 to 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((1 to 8).map(i => (col("id") * i).cast("float")): _*).as("b"))
    // native-only projection: an interpreted fold column in the same
    // Project would push the whole operator out of codegen
    val native = df.select(Similarity.dot(col("a"), col("b")).as("native"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(native.queryExecution.executedPlan.toString.contains("*(1) Project [float_dot"))
    val nat = native.collect().map(_.getDouble(0))
    val fold = df.select(foldDot(col("a"), col("b")).as("fold")).collect().map(_.getDouble(0))
    nat.zip(fold).foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(f))
    }
  }
}
