package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All hyperplane-LSH bucket ids of a vector in ONE native expression:
  * for each of `tables` sign families, bit p of bucket t is set iff the
  * ±1-weighted projection of the vector onto plane (t, p) is positive.
  * Returns `array<long>` of length `tables` (index = table id).
  *
  * Exists because the composed form — tables × planes CASE WHEN
  * [[FloatDotProduct]](vec, array(±1 literals)) > 0 expressions summed
  * per table — inlines tables·planes·dims(≈ 3,000+) generated-code
  * operations into one method: past the JVM's JIT bytecode limit the
  * whole projection runs in the bytecode INTERPRETER, measured at
  * ~180 µs per dot (134 CPU core-s just to bucket 20k vectors × 6
  * tables at the sf1 study point). This expression is one small
  * JIT-friendly loop over a reference-held sign matrix: same values,
  * ~50× less CPU, and constant code size at any (tables, planes).
  *
  * Arithmetic parity (oracle-hash-critical): projections accumulate in
  * DOUBLE left-to-right over (double)vec[i] · (double)(±1.0f), exactly
  * [[FloatDotProduct]]'s fold over the former weight literals and
  * exactly the DuckDB oracle's `list_reduce`. Null semantics replicate
  * the composed `when(dot > 0, bit).otherwise(0)` form: a null array →
  * null; a null element or a length ≠ dims (null dot) → no plane fires,
  * bucket 0 for every table.
  *
  * `signs` is kept as Seq-of-Seq (structural equality — plan
  * canonicalization and exchange reuse would silently break on an
  * Array-identity field) and flattened to primitives once per executor.
  */
case class LshBuckets(child: Expression, signs: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val matrix: Array[Array[Array[Float]]] =
    signs.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    LshBuckets.compute(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("signsMatrix", matrix, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshBuckets.compute($a, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  /** Shared by interpreted eval and codegen: one JIT-compiled loop. */
  def compute(x: ArrayData, signs: Array[Array[Array[Float]]]): ArrayData = {
    val tables = signs.length
    val buckets = new Array[Long](tables)
    val dims = if (tables > 0 && signs(0).length > 0) signs(0)(0).length else 0
    val n = x.numElements()
    var clean = n == dims
    val v = new Array[Double](n)
    var i = 0
    while (clean && i < n) {
      if (x.isNullAt(i)) clean = false else v(i) = x.getFloat(i).toDouble
      i += 1
    }
    // length mismatch or null element → null projections → no plane
    // fires (buckets stay 0), matching when(dot > 0, ...).otherwise(0)
    if (clean) {
      var t = 0
      while (t < tables) {
        val planes = signs(t)
        var bucket = 0L
        var p = 0
        while (p < planes.length) {
          val w = planes(p)
          var acc = 0.0
          var j = 0
          while (j < dims) {
            acc += v(j) * w(j).toDouble
            j += 1
          }
          if (acc > 0) bucket |= 1L << p
          p += 1
        }
        buckets(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(buckets)
  }
}
