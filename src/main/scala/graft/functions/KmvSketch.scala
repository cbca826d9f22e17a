package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable k-minimum-values (KMV / bottom-k) distinct sketches — the
  * third rung of the sketch family beside [[HllSketch]] (cardinality)
  * and [[CmsSketch]] (frequency). A KMV sketch IS a deterministic
  * coordinated sample: the k smallest DISTINCT 60-bit portable hashes
  * of a set ([[Hashing.h60]] — the same engine-wide hash the oracle
  * computes), sorted ascending. That buys what HLL cannot:
  *
  *   - **set resemblance**: because min-hashing is coordinated, the
  *     bottom-k of A ∪ B is a uniform sample of the union, and the
  *     fraction of it present in BOTH sketches estimates Jaccard(A, B)
  *     — the rollup-layer "how much do these two audiences overlap"
  *     primitive, computable from persisted sketches alone
  *     ([[KmvResemblancePermille]]);
  *   - **exact small sets**: a sketch with fewer than k entries IS the
  *     whole hashed set, so the estimate is exact below k;
  *   - **exact merge**: bottom-k of a union of bottom-k's — persisted
  *     slice sketches union associatively at any granularity
  *     ([[KmvMergeAgg]]), never re-reading raw data.
  *
  * Everything is integer: the sketch is `array<bigint>` of strictly
  * increasing values in [0, 2^60); the cardinality estimate is the
  * classic (k−1)·2^60 / h_(k−1) computed in 128-bit integer arithmetic
  * (floor division — the DuckDB oracle replays it with HUGEINT `//`);
  * resemblance is a permille count ratio. No float anywhere.
  *
  * Scale posture: a sketch is ≤ k longs regardless of cardinality;
  * partial aggregation merges map-side (TreeSet bounded at k), so the
  * shuffle carries one ≤ k-long array per group per mapper, never the
  * value stream. */
object KmvSketch {
  private[functions] def checkK(kExpr: Expression, name: String): TypeCheckResult =
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name k must be an int literal")
    else {
      val k = kExpr.eval()
      if (k == null || k.asInstanceOf[Number].intValue() < 2 ||
        k.asInstanceOf[Number].intValue() > 65536)
        TypeCheckResult.TypeCheckFailure(s"$name k must be in [2, 65536]")
      else TypeCheckResult.TypeCheckSuccess
    }

  /** Read a sketch column value into a long array, validating the
    * engine-built invariant (strictly increasing, in [0, 2^60)).
    * Returns null on a malformed sketch when `loud` is false (the
    * estimate/resemblance contract — mirror [[HllEstimate]]); throws
    * when true (the merge contract — mirror [[HllMergeAgg]]). */
  private[functions] def readSketch(v: Any, who: String, loud: Boolean): Array[Long] = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var prev = -1L
    var i = 0
    while (i < out.length) {
      if (arr.isNullAt(i)) {
        if (loud) throw new IllegalArgumentException(
          s"$who: null slot — not an engine-built KMV sketch")
        return null
      }
      val h = arr.getLong(i)
      if (h <= prev || h >= (1L << 60)) {
        if (loud) throw new IllegalArgumentException(
          s"$who: values must be strictly increasing in [0, 2^60) — not an " +
            "engine-built KMV sketch")
        return null
      }
      out(i) = h
      prev = h
      i += 1
    }
    out
  }

  private[functions] def toBytes(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  private[functions] def fromBytes(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) set.add(bb.getLong)
    set
  }

  /** Insert into a bounded bottom-k TreeSet. */
  private[functions] def offer(set: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit =
    if (set.size() < k) { set.add(h); () }
    else if (h < set.last()) {
      if (set.add(h)) { set.pollLast(); () }
    }

  private[functions] def evalSet(set: java.util.TreeSet[java.lang.Long]): GenericArrayData = {
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `kmv_sketch(h60_hash, k)` — aggregate the k smallest distinct 60-bit
  * hashes of a group into a sorted `array<bigint>` ([[KmvSketch]] doc).
  * Null hashes are ignored; an empty group yields the empty sketch.
  * Hash values are masked into 60 bits so out-of-contract inputs stay
  * deterministic. */
case class KmvSketchAgg(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got ${hash.dataType.simpleString}")
    else KmvSketch.checkK(kExpr, prettyName)

  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = hash.eval(input)
    if (v != null)
      KmvSketch.offer(buffer, v.asInstanceOf[Long] & ((1L << 60) - 1), k)
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.offer(buffer, it.next(), k)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    KmvSketch.evalSet(buffer)
  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), kExpr = newChildren(1))
}

/** `kmv_merge(sketch, k)` — exact KMV union of persisted sketches:
  * bottom-k of the union of bottom-k's. `k` must be the build
  * parameter: a sketch LONGER than k proves a parameter mismatch and
  * fails loudly (the [[graft.operators.IndexStamp]] discipline — a
  * shorter sketch is legitimately a small set, so length alone cannot
  * recover k, which is why merge takes it explicitly). Null sketches
  * are ignored; an empty group yields the empty sketch. */
case class KmvMergeAgg(
    sketch: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case ArrayType(LongType, _) => KmvSketch.checkK(kExpr, prettyName)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> sketches, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(sketch, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_merge"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = sketch.eval(input)
    if (v != null) {
      val in = KmvSketch.readSketch(v, "kmv_merge", loud = true)
      if (in.length > k) throw new IllegalArgumentException(
        s"kmv_merge: sketch has ${in.length} entries but k = $k — built with a " +
          "different k; merging mismatched sketches estimates garbage")
      var i = 0
      while (i < in.length) { KmvSketch.offer(buffer, in(i), k); i += 1 }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) KmvSketch.offer(buffer, it.next(), k)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    KmvSketch.evalSet(buffer)
  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), kExpr = newChildren(1))
}

/** `kmv_estimate(sketch, k)` — distinct-count estimate of a KMV sketch
  * (bigint). Below k entries the sketch IS the hashed set, so the
  * answer is its exact size; at k entries the classic estimator
  * (k−1)·2^60 / h_(k−1) in 128-bit floor division — pure integer, the
  * DuckDB oracle replays it with HUGEINT `//`. Null on a malformed
  * sketch (not engine-built). */
case class KmvEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) => KmvSketch.checkK(right, prettyName)
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> sketch, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_estimate"

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def nullSafeEval(sketchV: Any, kV: Any): Any = {
    val s = KmvSketch.readSketch(sketchV, prettyName, loud = false)
    if (s == null || s.length > k) null
    else if (s.length < k) s.length.toLong
    else {
      // h_(k-1) ≥ k-1 ≥ 1 here: k ≥ 2 strictly increasing non-negatives
      val num = BigInteger.valueOf(k - 1L).shiftLeft(60)
      num.divide(BigInteger.valueOf(s(k - 1))).longValueExact()
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kmv_resemblance_permille(a, b, k)` — Jaccard estimate between the
  * two SETS two KMV sketches summarize, in permille (bigint): take M =
  * the bottom-min(k, |a ∪ b|) of the sketch union (a uniform
  * coordinated sample of A ∪ B), count how many of M appear in BOTH
  * sketches, return floor(1000·|M ∩ a ∩ b| / |M|). Exact when both
  * sets are smaller than k; null if both sketches are empty or either
  * is malformed. */
case class KmvResemblancePermille(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        KmvSketch.checkK(third, prettyName)
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> sketches, got " +
          s"${first.dataType.simpleString}, ${second.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_resemblance_permille"

  private lazy val k: Int = third.eval().asInstanceOf[Number].intValue()

  override def nullSafeEval(aV: Any, bV: Any, kV: Any): Any = {
    val a = KmvSketch.readSketch(aV, prettyName, loud = false)
    val b = KmvSketch.readSketch(bV, prettyName, loud = false)
    if (a == null || b == null || a.length > k || b.length > k) return null
    if (a.length == 0 && b.length == 0) return null
    // merge-walk the two sorted arrays: first min(k, |union|) union
    // values, counting those present in both
    var i = 0
    var j = 0
    var taken = 0
    var inter = 0
    while (taken < k && (i < a.length || j < b.length)) {
      val av = if (i < a.length) a(i) else Long.MaxValue
      val bv = if (j < b.length) b(j) else Long.MaxValue
      if (av == bv) { inter += 1; i += 1; j += 1 }
      else if (av < bv) i += 1
      else j += 1
      taken += 1
    }
    1000L * inter / taken
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
