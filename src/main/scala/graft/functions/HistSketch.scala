package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable equi-width histograms — the QUANTILE sketch beside
  * [[HllSketch]] / [[CmsSketch]] / [[KmvSketch]] / [[BloomSketch]]:
  * per-slice bucket-count arrays that re-aggregate by element-wise sum
  * (histograms are linear, so the merge is EXACT — the merged array is
  * the histogram of the union) and answer rank queries to one-bucket
  * resolution from persisted state alone. The rollup complement of
  * [[graft.operators.Quality.quantileProfile]]: that one is exact but
  * re-reads raw values; this one answers from manifest-sized arrays a
  * daily job persisted.
  *
  * Integer end to end: the input is a LONG measure (micro-scaled
  * upstream by the caller — the q173 discipline), the bucket index is
  * `(v − lo) div width` clamped into the catch-all edge buckets (below
  * `lo` → bucket 0, at or past `lo + n·width` → bucket n−1 — clamped,
  * never dropped: a silently dropped tail would corrupt every rank),
  * and rank extraction multiplies instead of divides (smallest bucket
  * with 1000·cumsum ≥ permille·total), so the DuckDB oracle replays
  * every count and every picked bucket exactly.
  *
  * Merging uses [[CmsMergeAgg]] verbatim (`cms_merge` — element-wise
  * long sum, loud on width mismatch): both sketches are linear count
  * arrays, and one merge implementation means one set of overflow and
  * mismatch contracts. [[graft.operators.Sketch.histMerge]] is that
  * alias.
  *
  * Scale posture: a histogram is n longs regardless of input size;
  * partial aggregation sums map-side, so the shuffle carries one array
  * per group per mapper, never the value stream. */
object HistSketch {
  private[functions] def checkParams(loExpr: Expression, widthExpr: Expression,
      nExpr: Expression, name: String): TypeCheckResult =
    if (!loExpr.foldable || loExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$name lo must be a bigint literal")
    else if (!widthExpr.foldable || widthExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$name width must be a bigint literal")
    else if (!nExpr.foldable || nExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name nBuckets must be an int literal")
    else {
      val w = widthExpr.eval()
      val n = nExpr.eval()
      if (w == null || w.asInstanceOf[Number].longValue() < 1L)
        TypeCheckResult.TypeCheckFailure(s"$name width must be positive")
      else if (n == null || n.asInstanceOf[Number].intValue() < 1 ||
        n.asInstanceOf[Number].intValue() > (1 << 20))
        TypeCheckResult.TypeCheckFailure(s"$name nBuckets must be in [1, 2^20]")
      else if (loExpr.eval() == null)
        TypeCheckResult.TypeCheckFailure(s"$name lo must not be null")
      else TypeCheckResult.TypeCheckSuccess
    }
}

/** `hist_sketch(value, lo, width, n)` — aggregate a LONG measure into
  * an n-bucket equi-width histogram over [lo, lo + n·width)
  * (`array<bigint>`; [[HistSketch]] doc). Out-of-range values clamp
  * into the edge buckets; null values are ignored; an empty group
  * yields the all-zero histogram. */
case class HistSketchAgg(
    value: Expression,
    loExpr: Expression,
    widthExpr: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val lo: Long = loExpr.eval().asInstanceOf[Number].longValue()
  private lazy val width: Long = widthExpr.eval().asInstanceOf[Number].longValue()
  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint measure, got ${value.dataType.simpleString} " +
          "- micro-scale doubles upstream so the bucket arithmetic stays exact")
    else HistSketch.checkParams(loExpr, widthExpr, nExpr, prettyName)

  override def children: Seq[Expression] = Seq(value, loExpr, widthExpr, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = value.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val idx =
        if (x < lo) 0
        else {
          // subtractExact: a span past Long range is a caller scaling
          // bug — fail loudly rather than wrap into a plausible bucket
          val d = Math.subtractExact(x, lo) / width
          if (d >= n) n - 1 else d.toInt
        }
      buffer(idx) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BloomSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), loExpr = newChildren(1),
      widthExpr = newChildren(2), nExpr = newChildren(3))
}

/** `hist_quantile_bucket(counts, permille)` — the p-permille bucket of
  * a histogram: smallest index with 1000·cumsum ≥ permille·total
  * (int). Multiplication-only rank arithmetic — exact, and the DuckDB
  * oracle replays it with a window cumsum. Null for an all-zero or
  * empty histogram, and for malformed (negative-count or null-slot)
  * input — not an engine-built histogram. */
case class HistQuantileBucket(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) =>
      if (!right.foldable || right.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(s"$prettyName permille must be an int literal")
      else {
        val p = right.eval()
        if (p == null || p.asInstanceOf[Number].intValue() < 1 ||
          p.asInstanceOf[Number].intValue() > 1000)
          TypeCheckResult.TypeCheckFailure(s"$prettyName permille must be in [1, 1000]")
        else TypeCheckResult.TypeCheckSuccess
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> histogram, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "hist_quantile_bucket"

  private lazy val permille: Long =
    right.eval().asInstanceOf[Number].longValue()

  override def nullSafeEval(countsV: Any, pV: Any): Any = {
    val arr = countsV.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val c = arr.getLong(i)
      if (c < 0L) return null
      total = Math.addExact(total, c)
      i += 1
    }
    if (total == 0L) return null
    val target = Math.multiplyExact(permille, total)
    var cum = 0L
    i = 0
    while (i < n) {
      cum += arr.getLong(i)
      if (Math.multiplyExact(1000L, cum) >= target) return i
      i += 1
    }
    n - 1
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
