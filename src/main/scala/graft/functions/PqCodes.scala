package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Product-quantization primitives (encode / query lookup table / ADC
  * score), the compressed-domain half of [[graft.operators.Pq]].
  *
  * All three are native codegen'd expressions for the same reason as
  * [[FloatDotProduct]]: they run once per corpus row in the hottest
  * loop of a 100 TB scan, where interpreted higher-order functions pay
  * per-element lambda dispatch. The codebook (a few hundred KB) is a
  * driver-side reference object baked into the expression — broadcast
  * once with the compiled plan, never a join.
  *
  * Cross-engine arithmetic contract (the oracle recomputes every step
  * in DuckDB): vectors are normalized element-wise as
  * `double(float) / nrm` with `nrm = sqrt(Σ x·x)` in the left-to-right
  * double fold of [[FloatDotProduct]]; every dot product is the same
  * fold; every comparison and every ADC term is micro-floored to a
  * LONG (`floor(1e6·v)`) before it is compared or summed, so argmax
  * ties break on the code id identically on any engine and the ADC
  * sum is exact integer arithmetic — immune to engines summing float
  * terms in different orders.
  */
object PqCodes {

  private[functions] def checkVec(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float>, got ${other.simpleString}")
    }

  /** Left-to-right double fold of Σ x_i², [[FloatDotProduct]]'s order;
    * returns -1 on a null element (caller maps to null result). */
  def sqNorm(arr: ArrayData): Double = {
    val n = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return -1.0
      val f = arr.getFloat(i).toDouble
      acc += f * f
      i += 1
    }
    acc
  }

  /** codes[s] = argmax_j floor(1e6·(dot(xn_s, c_{s,j}) − cc_{s,j}/2))
    * (ties → smaller j) — argmin L2 on the unit sphere phrased through
    * dots so both engines reuse the one bit-identical fold. Null for a
    * null/zero-norm/wrong-length/null-element vector. */
  def encode(arr: ArrayData, cb: Array[Double], cc: Array[Double],
      nSub: Int): Array[Byte] = {
    val k = cc.length / nSub
    val dsub = cb.length / cc.length
    if (arr.numElements() != nSub * dsub) return null
    val sq = sqNorm(arr)
    if (sq <= 0) return null
    val nrm = math.sqrt(sq)
    val codes = new Array[Byte](nSub)
    var s = 0
    while (s < nSub) {
      var bestScore = Long.MinValue
      var bestJ = 0
      var j = 0
      while (j < k) {
        val base = (s * k + j) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          dot += (arr.getFloat(s * dsub + d).toDouble / nrm) * cb(base + d)
          d += 1
        }
        val score = math.floor(1e6 * (dot - 0.5 * cc(s * k + j))).toLong
        if (score > bestScore) { bestScore = score; bestJ = j }
        j += 1
      }
      codes(s) = bestJ.toByte
      s += 1
    }
    codes
  }

  /** lut[s·k + j] = dot(qn_s, c_{s,j}) — the query's per-(subspace,
    * code) inner-product table, computed ONCE per query row; every ADC
    * candidate then costs nSub array lookups instead of nSub·dsub
    * multiplies. Null for a degenerate query vector. */
  def lut(arr: ArrayData, cb: Array[Double], nSub: Int, k: Int): ArrayData = {
    val dsub = cb.length / (nSub * k)
    if (arr.numElements() != nSub * dsub) return null
    val sq = sqNorm(arr)
    if (sq <= 0) return null
    val nrm = math.sqrt(sq)
    val out = new Array[Double](nSub * k)
    var s = 0
    while (s < nSub) {
      var j = 0
      while (j < k) {
        val base = (s * k + j) * dsub
        var dot = 0.0
        var d = 0
        while (d < dsub) {
          dot += (arr.getFloat(s * dsub + d).toDouble / nrm) * cb(base + d)
          d += 1
        }
        out(s * k + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_s floor(1e6·lut[s·k + codes[s]]) — the asymmetric-distance
    * score as an exact long sum of micro-floored terms (summation
    * order cannot matter). Null on shape mismatch or null lut slot.
    * Boxed Long (null = java null) for the expression layer. */
  def adc(codes: Array[Byte], lutArr: ArrayData): java.lang.Long = {
    val nSub = codes.length
    if (nSub == 0 || lutArr.numElements() % nSub != 0) return null
    val k = lutArr.numElements() / nSub
    var acc = 0L
    var s = 0
    while (s < nSub) {
      val idx = s * k + (codes(s) & 0xFF)
      if (lutArr.isNullAt(idx)) return null
      acc += math.floor(1e6 * lutArr.getDouble(idx)).toLong
      s += 1
    }
    acc
  }
}

/** PQ code assignment of one `array<float>` vector against a baked-in
  * codebook — see [[PqCodes.encode]]. Output: `binary` of nSub bytes
  * (code j stored as the unsigned byte j; k ≤ 256 enforced at
  * construction). */
case class PqEncode(child: Expression, cb: Array[Double], cc: Array[Double],
    nSub: Int) extends UnaryExpression {

  require(nSub >= 1 && cc.length % nSub == 0 && cb.length % cc.length == 0,
    s"inconsistent codebook shape: |cb|=${cb.length} |cc|=${cc.length} nSub=$nSub")
  require(cc.length / nSub <= 256, s"k=${cc.length / nSub} codes do not fit a byte")

  override def checkInputDataTypes(): TypeCheckResult =
    PqCodes.checkVec(child, prettyName)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PqCodes.encode(v.asInstanceOf[ArrayData], cb, cc, nSub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqCodes.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    val ccRef = ctx.addReferenceObj("pqCc", cc, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $cls.encode($a, $cbRef, $ccRef, $nSub);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table over a baked-in codebook — see
  * [[PqCodes.lut]]. Output: `array<double>` of nSub·k entries. */
case class PqLut(child: Expression, cb: Array[Double], nSub: Int, k: Int)
    extends UnaryExpression {

  require(nSub >= 1 && k >= 1 && cb.length % (nSub * k) == 0,
    s"inconsistent codebook shape: |cb|=${cb.length} nSub=$nSub k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    PqCodes.checkVec(child, prettyName)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else PqCodes.lut(v.asInstanceOf[ArrayData], cb, nSub, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqCodes.getClass.getName.stripSuffix("$")
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $cls.lut($a, $cbRef, $nSub, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score of a code array against a query's lookup table — see
  * [[PqCodes.adc]]. `binary × array<double> → long` (micro-cosine
  * estimate, comparable to the exact `cos_micro` scale). */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<double>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codes: Any, lutArr: Any): Any =
    PqCodes.adc(codes.asInstanceOf[Array[Byte]], lutArr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqCodes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("adc")
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
