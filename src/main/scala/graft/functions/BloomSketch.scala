package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable Bloom filters — the MEMBERSHIP sketch beside
  * [[HllSketch]] (cardinality), [[CmsSketch]] (frequency) and
  * [[KmvSketch]] (resemblance). The 100 TB use is data skipping: build
  * one filter per shard/partition of a persisted corpus, keep the
  * filters (a few KB each) in a manifest-sized side relation, and
  * answer "which shards can contain id X" without opening a single
  * file — the point-lookup complement of min/max pruning, and the
  * shard-level pre-screen a takedown pipeline runs before rewriting
  * anything. No false negatives ever; false positives at the standard
  * (1 − e^(−kn/m))^k rate.
  *
  * Portability contract: bit positions come from the engine-wide
  * affine family over ONE 60-bit hash — position_i(x) =
  * [[Hashing.h31Affine]](i, h60(x)) mod m — so the DuckDB oracle
  * constructs the EXACT filter words and replays every membership
  * answer, false positives included. The filter is `array<bigint>` of
  * ceil(m/32) words, each holding 32 bits (values in [0, 2^32) — small
  * enough that `1 << (pos % 32)` is portable integer arithmetic with
  * no sign games on any engine; a 64-bit packing would need
  * `1 << 63`, which signed engines disagree about).
  *
  * Scale posture: a filter is m/32 longs regardless of input size;
  * partial aggregation ORs map-side, so the shuffle carries one word
  * array per group per mapper, never the value stream. */
object BloomSketch {
  /** m (bits) bounded to keep a filter comfortably manifest-sized:
    * 2^25 bits = 2^20 long-backed words = 8 MB. k up to 16 covers
    * every sensible false-positive target. */
  private[functions] def checkParams(mExpr: Expression, kExpr: Expression,
      name: String): TypeCheckResult =
    if (!mExpr.foldable || mExpr.dataType != IntegerType ||
      !kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name m and k must be int literals")
    else {
      val m = mExpr.eval()
      val k = kExpr.eval()
      if (m == null || m.asInstanceOf[Number].intValue() < 32 ||
        m.asInstanceOf[Number].intValue() > (1 << 25) ||
        m.asInstanceOf[Number].intValue() % 32 != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$name m must be a multiple of 32 in [32, 2^25] — probes recover " +
            "m from the word count, so a ragged tail would shift every probe")
      else if (k == null || k.asInstanceOf[Number].intValue() < 1 ||
        k.asInstanceOf[Number].intValue() > 16)
        TypeCheckResult.TypeCheckFailure(s"$name k must be in [1, 16]")
      else TypeCheckResult.TypeCheckSuccess
    }

  private[functions] def nWords(m: Int): Int = (m + 31) / 32

  private[functions] def toBytes(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }
  private[functions] def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** Read a filter column value, validating the engine-built invariant
    * (every word in [0, 2^32)). Null on malformed when `loud` is
    * false; throws when true (merge). */
  private[functions] def readWords(v: Any, who: String, loud: Boolean): Array[Long] = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Long](arr.numElements())
    var i = 0
    while (i < out.length) {
      if (arr.isNullAt(i)) {
        if (loud) throw new IllegalArgumentException(
          s"$who: null word slot — not an engine-built Bloom filter")
        return null
      }
      val w = arr.getLong(i)
      if (w < 0 || w >= (1L << 32)) {
        if (loud) throw new IllegalArgumentException(
          s"$who: word $w outside [0, 2^32) — not an engine-built Bloom filter")
        return null
      }
      out(i) = w
      i += 1
    }
    out
  }
}

/** `bloom_sketch(h60_hash, m, k)` — aggregate a group's hashes into an
  * m-bit Bloom filter with k affine probes ([[BloomSketch]] doc):
  * `array<bigint>` of ceil(m/32) 32-bit words. Null hashes are
  * ignored; an empty group yields the all-zero filter. */
case class BloomSketchAgg(
    hash: Expression,
    mExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val m: Int = mExpr.eval().asInstanceOf[Number].intValue()
  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val ab: Array[(Long, Long)] = CmsSketch.params(k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got ${hash.dataType.simpleString}")
    else BloomSketch.checkParams(mExpr, kExpr, prettyName)

  override def children: Seq[Expression] = Seq(hash, mExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomSketch.nWords(m))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = hash.eval(input)
    if (v != null) {
      // masked + CmsSketch.pos: ONE position definition across the
      // affine-family sketches, params precomputed (two MD5s each)
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      var i = 0
      while (i < k) {
        val (a, b) = ab(i)
        val pos = CmsSketch.pos(h, a, b, m)
        buffer(pos / 32) |= 1L << (pos % 32)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BloomSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), mExpr = newChildren(1), kExpr = newChildren(2))
}

/** `bloom_merge(filter)` — union persisted Bloom filters by
  * element-wise OR (exact: the filter of the union of the inputs'
  * sets, by construction). Mixing widths is a build-parameter
  * mismatch and fails loudly; null filters are ignored; an empty
  * group yields an empty array (no width to default to). */
case class BloomMergeAgg(
    filter: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = filter.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> filters, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(filter)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_merge"

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def mergeInto(buffer: Array[Long], arr: Array[Long]): Array[Long] = {
    if (arr.length == 0) return buffer
    if (buffer.length == 0) return arr.clone()
    if (buffer.length != arr.length) throw new IllegalArgumentException(
      s"bloom_merge: filter width mismatch — ${buffer.length} vs ${arr.length} " +
        "words. Merging filters built with different m answers garbage; " +
        "rebuild one side.")
    var i = 0
    while (i < buffer.length) { buffer(i) |= arr(i); i += 1 }
    buffer
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = filter.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, BloomSketch.readWords(v, "bloom_merge", loud = true))
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    mergeInto(buffer, other)

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BloomSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(filter = newChildren(0))
}

/** `bloom_might_contain(filter, h60_hash, k)` — true iff all k probe
  * bits are set (boolean). m is recovered from the filter width as
  * 32·words — exact because the build contract requires m to be a
  * multiple of 32 ([[BloomSketch.checkParams]]), so probe and build
  * reduce positions by the same modulus. Never a false negative for a
  * hash the filter was built over; null for a null hash or a
  * malformed filter. */
case class BloomMightContain(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(LongType, _) =>
      if (second.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a bigint hash, got ${second.dataType.simpleString}")
      else if (!third.foldable || third.dataType != IntegerType)
        TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an int literal")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> filter, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  private lazy val k: Int = third.eval().asInstanceOf[Number].intValue()
  private lazy val ab: Array[(Long, Long)] = CmsSketch.params(k)

  override def nullSafeEval(filterV: Any, hashV: Any, kV: Any): Any = {
    val words = BloomSketch.readWords(filterV, prettyName, loud = false)
    if (words == null || words.length == 0) return null
    val m = words.length * 32
    val h = hashV.asInstanceOf[Long] & ((1L << 60) - 1)
    var i = 0
    while (i < k) {
      val (a, b) = ab(i)
      val pos = CmsSketch.pos(h, a, b, m)
      if ((words(pos / 32) & (1L << (pos % 32))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
