package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) primitives — the third compression rung of
  * the ANN family ([[graft.operators.Similarity]] raw / [[PqCodes]]
  * product-quantized / this): each NORMALIZED vector stored as one
  * signed byte per dimension plus a single per-vector scale, a 4× cut
  * over float32 with far less distortion than PQ's 32× (the industry
  * trade-off: SQ8 when memory merely hurts, PQ when it binds). No
  * codebook, no training — the quantizer is closed-form per row, so
  * ingest is embarrassingly parallel and nothing is broadcast.
  *
  * Both expressions are native and codegen'd for the [[PqCodes]]
  * reason: they run once per corpus row in a 100 TB scan's hottest
  * loop.
  *
  * Cross-engine arithmetic contract (the oracle recomputes every step
  * in DuckDB): xn_d = double(float_d) / nrm with the [[FloatDotProduct]]
  * left-to-right norm fold; ma = max_d |xn_d| (order-independent);
  * code_d = ⌊xn_d · 127 / ma + 0.5⌋ ∈ [−127, 127] (round-half-up via
  * floor — `round()` tie-breaking differs across engines);
  * scale_micro = ⌊10⁶ · ma / 127⌋. The asymmetric score against a
  * query's exact micro vector qm_d = ⌊10⁶ · xn_d⌋ is
  * Σ_d qm_d · code_d — pure integer, then × scale_micro in the plan —
  * so ranking ties break identically on any engine. Envelope:
  * |qm| ≤ 10⁶, |code| ≤ 127 ⇒ the sum stays under 2^63 past 7·10¹³
  * dims — no real vector. */
object SqCodes {

  /** struct(codes: binary, scale_micro: long) of one vector; null for
    * null/zero-norm/null-element input. */
  def encode(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val sq = PqCodes.sqNorm(arr)
    if (sq <= 0) return null
    val nrm = math.sqrt(sq)
    var ma = 0.0
    var d = 0
    while (d < n) {
      val a = math.abs(arr.getFloat(d).toDouble / nrm)
      if (a > ma) ma = a
      d += 1
    }
    if (ma <= 0) return null
    val codes = new Array[Byte](n)
    d = 0
    while (d < n) {
      codes(d) = math.floor((arr.getFloat(d).toDouble / nrm) * 127.0 / ma + 0.5)
        .toInt.toByte
      d += 1
    }
    val scale = math.floor(1e6 * ma / 127.0).toLong
    new GenericInternalRow(Array[Any](codes, scale))
  }

  /** Σ_d qm_d · code_d (exact long); null on length mismatch or a null
    * query slot. Boxed for the expression layer. */
  def adc(codes: Array[Byte], qm: ArrayData): java.lang.Long = {
    val n = codes.length
    if (n == 0 || qm.numElements() != n) return null
    var acc = 0L
    var d = 0
    while (d < n) {
      if (qm.isNullAt(d)) return null
      acc += qm.getLong(d) * codes(d)
      d += 1
    }
    acc
  }
}

/** SQ8 quantization of one `array<float>` vector — see
  * [[SqCodes.encode]]. Output: `struct<codes: binary, scale_micro:
  * long>` (signed code bytes; the scale dequantizes codes back to
  * micro-normalized components). */
case class SqEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    PqCodes.checkVec(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("scale_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "sq_encode"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SqCodes.encode(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SqCodes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $cls.encode($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric SQ8 score of a code array against a query's exact micro
  * vector — see [[SqCodes.adc]]. `binary × array<long> → long`;
  * multiply by the candidate's `scale_micro` to land on the
  * micro²-cosine estimate scale. */
case class SqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<long>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_adc"

  override def nullSafeEval(codes: Any, qm: Any): Any =
    SqCodes.adc(codes.asInstanceOf[Array[Byte]], qm.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SqCodes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("sqadc")
      s"""
         |java.lang.Long $boxed = $cls.adc($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
