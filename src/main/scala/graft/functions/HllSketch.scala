package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable HyperLogLog distinct sketches — the pre-aggregation
  * primitive `approx_count_distinct` cannot give you: Spark's built-in
  * computes one estimate and discards its state, so a daily rollup
  * cannot be re-aggregated into weekly/monthly distincts without
  * re-scanning raw data. [[HllSketch]] emits the REGISTER ARRAY itself
  * (`array<int>` of 2^p registers), [[HllMerge]] re-aggregates persisted
  * sketches by element-wise max (the HLL union is exact — merging
  * sketches of two sets yields the sketch of their union, so rollups
  * compose associatively at any granularity), and [[HllEstimate]] turns
  * any sketch into the standard corrected estimate.
  *
  * Input contract: a 60-bit non-negative PORTABLE hash (the engine-wide
  * [[Hashing.h60]]), NOT raw values — hashing stays one definition
  * shared with the DuckDB oracle, and the sketch math is pure integer:
  * bucket = low p bits, w = the remaining 60−p bits,
  * rho = leading-zero count of w within its width + 1 = 61 − p −
  * bitlen(w), register = max rho. Every register is
  * oracle-replayable exactly; the RAW estimate (α·m²/Σ2^−reg) is
  * deterministic IEEE arithmetic both engines reproduce bit-for-bit
  * (dyadic terms, one fold order, no libm). [[HllEstimate]]'s
  * small-range linear-counting branch uses ln — a LIBRARY function with
  * no cross-engine bit contract — so oracle queries verify registers +
  * the raw-form estimate and the spec covers the corrected estimator's
  * accuracy instead.
  *
  * Scale posture: a sketch is 2^p ints (p=12 → 16 KB) regardless of
  * cardinality; partial aggregation merges map-side, so the shuffle
  * carries one sketch per group per mapper, never the value stream. */
object HllSketch {
  private[functions] def rho(w: Long, p: Int): Int =
    if (w == 0) 61 - p
    else 61 - p - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** A register is a rho in [0, 57] (p ≥ 4 on a 60-bit hash ⇒ rho ≤
    * 57). Values outside that range cannot come from this engine —
    * they would also silently truncate through the one-byte-per-
    * register serialization, making results depend on whether a
    * shuffle spilled the buffer. Reject loudly at the boundary. */
  private[functions] def requireRegister(r: Int, who: String): Unit =
    if (r < 0 || r > 57) throw new IllegalArgumentException(
      s"$who: register value $r is outside [0, 57] — not an engine-built " +
        "HLL sketch")

  private[functions] def toBytes(buffer: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](buffer.length)
    var i = 0
    while (i < buffer.length) { out(i) = buffer(i).toByte; i += 1 }
    out
  }
  private[functions] def fromBytes(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xFF; i += 1 }
    out
  }

  private[functions] def checkP(pExpr: Expression, name: String): TypeCheckResult =
    if (!pExpr.foldable || pExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name p must be an int literal")
    else {
      val p = pExpr.eval()
      if (p == null || p.asInstanceOf[Number].intValue() < 4 ||
        p.asInstanceOf[Number].intValue() > 16)
        TypeCheckResult.TypeCheckFailure(s"$name p must be in [4, 16]")
      else TypeCheckResult.TypeCheckSuccess
    }
}

/** `hll_sketch(h60_hash, p)` — build a 2^p-register HLL sketch from a
  * 60-bit hash column ([[HllSketch]] doc). Null hashes are ignored; an
  * empty group yields the all-zero sketch. Hash values are masked into
  * 60 bits so out-of-contract inputs stay deterministic. */
case class HllSketchAgg(
    hash: Expression,
    pExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  private lazy val p: Int = pExpr.eval().asInstanceOf[Number].intValue()
  private lazy val m: Int = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got ${hash.dataType.simpleString}")
    else HllSketch.checkP(pExpr, prettyName)

  override def children: Seq[Expression] = Seq(hash, pExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = hash.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      val bucket = (h & (m - 1)).toInt
      val r = HllSketch.rho(h >>> p, p)
      if (r > buffer(bucket)) buffer(bucket) = r
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Int]): Array[Byte] = HllSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Int] = HllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), pExpr = newChildren(1))
}

/** `hll_merge(sketch)` — re-aggregate persisted sketches by
  * element-wise max (exact HLL union): the rollup path that turns
  * daily sketches into weekly distincts without touching raw data.
  * Mixing sketch widths is a build-parameter mismatch and fails
  * loudly (the [[graft.operators.IndexStamp]] discipline — a silent
  * zip would estimate garbage). Null sketches are ignored; an empty
  * group yields an empty array (no width to default to). */
case class HllMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> sketches, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_merge"

  override def createAggregationBuffer(): Array[Int] = Array.empty[Int]

  private def mergeInto(buffer: Array[Int], arr: Array[Int]): Array[Int] = {
    if (arr.length == 0) return buffer
    if (buffer.length == 0) return arr.clone()
    if (buffer.length != arr.length) throw new IllegalArgumentException(
      s"hll_merge: sketch width mismatch — ${buffer.length} vs ${arr.length} " +
        "registers. Merging sketches built with different p estimates garbage; " +
        "rebuild one side.")
    var i = 0
    while (i < buffer.length) {
      if (arr(i) > buffer(i)) buffer(i) = arr(i)
      i += 1
    }
    buffer
  }

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = sketch.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val in = new Array[Int](arr.numElements())
      var i = 0
      while (i < in.length) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          "hll_merge: null register slot — not an engine-built HLL sketch")
        in(i) = arr.getInt(i)
        HllSketch.requireRegister(in(i), "hll_merge")
        i += 1
      }
      mergeInto(buffer, in)
    }
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] =
    mergeInto(buffer, other)

  override def eval(buffer: Array[Int]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Int]): Array[Byte] = HllSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Int] = HllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))
}

/** `hll_estimate(sketch)` — the standard corrected HLL estimator:
  * raw α·m²/Σ2^−reg, linear counting (m·ln(m/V)) when the raw estimate
  * is ≤ 2.5m with empty registers remaining. Double output for users;
  * oracle queries verify the registers and the raw form instead
  * ([[HllSketch]] doc — ln has no cross-engine bit contract). Null for
  * an empty (zero-width) sketch. */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<int> sketch, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hll_estimate"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    var s = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      // a null or out-of-range slot is not an engine-built sketch; null
      // out rather than let `1L << r` wrap (shift is mod 64) into a
      // plausible-looking garbage estimate
      if (arr.isNullAt(i)) return null
      val r = arr.getInt(i)
      if (r < 0 || r > 57) return null
      s += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / s
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
