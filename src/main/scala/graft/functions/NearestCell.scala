package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid pick as a PURE PER-ROW expression over a bounded,
  * plan-embedded centroid table: returns the `cell_id` maximizing
  * `floor(1e6 · dot(vec, c_vec) / (nrm · c_nrm))` (ties → smaller
  * cell_id) — exactly the [[graft.operators.Similarity.ivfAssign]]
  * argmax, with the dot computed in [[FloatDotProduct]]'s sequential
  * double accumulation so the value (and therefore every IVF oracle)
  * is bit-identical to the relational phrasing.
  *
  * WHY an expression and not a join: the relational argmax needs the
  * n × nCells candidate cross to EXIST — and then either a rank window
  * (shuffles the full cross, each row carrying both vectors: measured
  * 3.6 GB at the sf3 auto-cells point) or a max_by aggregation (Spark
  * plans the struct-keyed form as SortAggregate, which SORTS the
  * cross). The centroid table is bounded by construction — the same
  * bound that lets every IVF path broadcast it — so embedding it in
  * the plan and picking per row turns the whole assignment into a
  * narrow projection: no cross, no exchange, no sort, nothing but
  * nCells · dims multiply-adds per row.
  *
  * Null vec/nrm → null. CodegenFallback: the per-row centroid loop is
  * the work ([[KgramFingerprint]] rationale). */
case class NearestCell(left: Expression, right: Expression,
    cellIds: Array[Long], cellVecs: Array[Array[Float]],
    cellNrms: Array[Double])
    extends BinaryExpression with CodegenFallback {

  require(cellIds.nonEmpty, "NearestCell needs at least one centroid")
  require(cellIds.length == cellVecs.length && cellIds.length == cellNrms.length,
    "centroid arrays must align")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, double), got $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(vecAny: Any, nrmAny: Any): Any = {
    val arr = vecAny.asInstanceOf[ArrayData]
    val nrm = nrmAny.asInstanceOf[Double]
    val nv = arr.numElements()
    // null-element scan once (FloatDotProduct nulls the dot on any)
    var hasNullElem = false
    var i = 0
    while (i < nv && !hasNullElem) { hasNullElem = arr.isNullAt(i); i += 1 }
    var bestCos = Long.MinValue
    var bestId = Long.MaxValue
    var sawCos = false
    var minId = Long.MaxValue
    var c = 0
    while (c < cellIds.length) {
      if (cellIds(c) < minId) minId = cellIds(c)
      val cv = cellVecs(c)
      // a length mismatch or null element nulls FloatDotProduct's dot,
      // and a null cos sorts LAST under the relational desc ordering —
      // mirror by skipping the candidate
      if (nv == cv.length && !hasNullElem) {
        // FloatDotProduct's sequential double accumulation, verbatim
        var d = 0.0
        var j = 0
        while (j < nv) { d += arr.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
        val cos = math.floor(1000000.0 * d / (nrm * cellNrms(c))).toLong
        if (cos > bestCos || (cos == bestCos && cellIds(c) < bestId)) {
          bestCos = cos
          bestId = cellIds(c)
        }
        sawCos = true
      }
      c += 1
    }
    // every candidate null (the relational all-null-ordering edge):
    // rank 1 falls to the smallest cell_id
    if (sawCos) bestId else minId
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
