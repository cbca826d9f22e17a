package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a k-capped min-heap ordered worst-first, so a
  * better candidate evicts the current worst in O(log k). (score desc,
  * id asc) is the keep-order — identical to the `row_number` window
  * ordering it replaces. */
final class TopKHeap(val k: Int) {
  // worst-kept at the head: lower score first, then HIGHER id first
  private val ord = new java.util.Comparator[Array[Long]] {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val s = java.lang.Long.compare(a(0), b(0))
      if (s != 0) s else java.lang.Long.compare(b(1), a(1))
    }
  }
  val heap = new java.util.PriorityQueue[Array[Long]](math.max(k, 1), ord)

  def offer(score: Long, id: Long): Unit = {
    if (heap.size < k) heap.add(Array(score, id))
    else {
      // allocation-free reject test: this runs once per input row, and
      // losing to the current worst is the common case
      val worst = heap.peek()
      if (score > worst(0) || (score == worst(0) && id < worst(1))) {
        heap.poll(); heap.add(Array(score, id))
      }
    }
  }

  /** Entries best-first: (score desc, id asc). */
  def sortedDesc: Array[Array[Long]] = {
    val out = heap.toArray(Array.empty[Array[Long]])
    java.util.Arrays.sort(out, ord.reversed())
    out
  }
}

/** `topk_by(score, id, k)` — per-group top-k (score desc, id asc) as a
  * native `TypedImperativeAggregate`, returning
  * `array<struct<score:bigint, id:bigint>>` best-first.
  *
  * This is the scale-correct form of "rank within group, keep k": the
  * `row_number()`-window idiom shuffles every candidate row and SORTS
  * each partition (O(n log n) per group, all candidates materialized)
  * only to discard all but k; this aggregate keeps a k-capped heap per
  * group (O(n log k), constant memory), is partial-aggregation friendly
  * (map-side heaps merge associatively, so the shuffle carries at most
  * k rows per group per mapper — not the candidate set), and needs no
  * sort at all.
  *
  * Null scores/ids are ignored (standard aggregate-input semantics); a
  * group with no valid input yields an empty array.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != LongType || id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint score, bigint id), got " +
          s"${score.dataType.simpleString}, ${id.dataType.simpleString}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be an int literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); buffer.offer(e(0), e(1)) }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedDesc.map(e => InternalRow(e(0), e(1))))

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val entries = buffer.sortedDesc
    val bb = ByteBuffer.allocate(8 + entries.length * 16)
    bb.putInt(buffer.k).putInt(entries.length)
    entries.foreach(e => bb.putLong(e(0)).putLong(e(1)))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach(_ => heap.offer(bb.getLong(), bb.getLong()))
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
