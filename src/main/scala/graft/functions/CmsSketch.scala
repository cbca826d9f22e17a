package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable Count-Min frequency sketches — the heavy-hitter primitive
  * beside [[HllSketch]]'s distinct counts: depth×width long counters,
  * one bounded-size object per group regardless of key cardinality,
  * answering "how often did key x occur" with a one-sided guarantee
  * (estimate ≥ true count; overestimate bounded by the collision mass
  * per row, shrinking with width). Merging is element-wise SUM — exact
  * and associative, so per-shard/per-day sketches roll up without
  * re-reading raw data, and the merged estimate equals the
  * direct-build estimate by linearity.
  *
  * Everything here is INTEGER arithmetic end to end — unlike HLL's
  * estimator there is no float anywhere, so a SQL oracle replays not
  * just the counters but the ESTIMATES bit-for-bit: row i of the
  * sketch indexes at `h31Affine(i, h60(x)) mod width` (the engine's
  * portable universal family, [[Hashing.affineParams]] — identical
  * literals on any engine), and a point query is the min over rows.
  *
  * Scale posture: the [[HllSketch]] posture — partial aggregation
  * merges map-side, the shuffle carries one depth·width array per
  * group per mapper, never the key stream. */
object CmsSketch {
  /** Row-i counter index — callers pass PRECOMPUTED affine params (the
    * [[MinHashSig]] rule: affineParams runs two MD5s, so deriving it
    * per row would dwarf the counter increment it feeds). */
  private[functions] def pos(h: Long, a: Long, b: Long, width: Int): Int =
    (((a * (h % Hashing.P31) + b) % Hashing.P31) % width).toInt

  private[functions] def params(depth: Int): Array[(Long, Long)] =
    Array.tabulate(depth)(Hashing.affineParams)

  private[functions] def checkConst(e: Expression, name: String, lo: Int,
      hi: Int): TypeCheckResult =
    if (!e.foldable || e.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$name must be an int literal")
    else {
      val v = e.eval()
      if (v == null || v.asInstanceOf[Number].intValue() < lo ||
        v.asInstanceOf[Number].intValue() > hi)
        TypeCheckResult.TypeCheckFailure(s"$name must be in [$lo, $hi]")
      else TypeCheckResult.TypeCheckSuccess
    }

  private[functions] def toBytes(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }
  private[functions] def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

/** `cms_sketch(h60_hash, depth, width)` — build a depth×width Count-Min
  * sketch (`array<long>`, row-major) from a 60-bit portable hash
  * column. Null hashes are ignored; hash values are masked into 60
  * bits like [[HllSketchAgg]]. */
case class CmsSketchAgg(
    hash: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val ab: Array[(Long, Long)] = CmsSketch.params(depth)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash input, got ${hash.dataType.simpleString}")
    else CmsSketch.checkConst(depthExpr, s"$prettyName depth", 1, 16) match {
      case TypeCheckResult.TypeCheckSuccess =>
        CmsSketch.checkConst(widthExpr, s"$prettyName width", 1, 1 << 20)
      case f => f
    }

  override def children: Seq[Expression] = Seq(hash, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = hash.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      var i = 0
      while (i < depth) {
        val (a, b) = ab(i)
        buffer(i * width + CmsSketch.pos(h, a, b, width)) += 1
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = CmsSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))
}

/** `cms_merge(sketch)` — element-wise SUM of persisted Count-Min
  * sketches (exact, associative; merged estimates equal direct-build
  * estimates by linearity). Length mismatch fails loudly — the
  * [[HllMergeAgg]] discipline. */
case class CmsMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> sketches, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_merge"

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def mergeInto(buffer: Array[Long], arr: Array[Long]): Array[Long] = {
    if (arr.length == 0) return buffer
    if (buffer.length == 0) return arr.clone()
    if (buffer.length != arr.length) throw new IllegalArgumentException(
      s"cms_merge: sketch size mismatch — ${buffer.length} vs ${arr.length} " +
        "counters. Merging sketches built with different depth/width sums " +
        "garbage; rebuild one side.")
    var i = 0
    while (i < buffer.length) { buffer(i) += arr(i); i += 1 }
    buffer
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = sketch.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val in = new Array[Long](arr.numElements())
      var i = 0
      while (i < in.length) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          "cms_merge: null counter slot — not an engine-built Count-Min sketch")
        in(i) = arr.getLong(i)
        i += 1
      }
      mergeInto(buffer, in)
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    mergeInto(buffer, other)

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = CmsSketch.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))
}

/** `cms_query(sketch, h60_hash)` — the Count-Min point estimate:
  * min over rows of the counter each row hashes to. The expression
  * carries the DEPTH the sketch was built with (width follows as
  * length / depth — a flat array cannot disambiguate the pair on its
  * own). Integer end to end; null for null inputs or a length not
  * divisible by the depth. */
case class CmsQuery(left: Expression, right: Expression, depth: Int)
    extends BinaryExpression with CodegenFallback {

  require(depth >= 1 && depth <= 16, s"cms_query: depth must be in [1, 16], got $depth")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_query"

  private lazy val ab: Array[(Long, Long)] = CmsSketch.params(depth)

  override def nullSafeEval(sk: Any, hv: Any): Any = {
    val arr = sk.asInstanceOf[ArrayData]
    if (arr.numElements() == 0 || arr.numElements() % depth != 0) return null
    val width = arr.numElements() / depth
    val h = hv.asInstanceOf[Long] & ((1L << 60) - 1)
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val (a, b) = ab(i)
      val at = i * width + CmsSketch.pos(h, a, b, width)
      // a null counter slot means the sketch is not one this engine
      // built — null out rather than read it as 0 and UNDERestimate,
      // which would silently break the one-sided >=-true guarantee
      if (arr.isNullAt(at)) return null
      val c = arr.getLong(at)
      if (c < best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
