package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-member MinHash signature of a shingle array, one pass per row.
  *
  * Replaces `explode(shingles)` → `groupBy(id).agg(k × min(affine_i))`:
  * a signature is a pure function of the row's own shingle set, so the
  * exchange + k-column min-aggregation bought nothing but a corpus-wide
  * shuffle of exploded shingles. Here each row costs one md5 per shingle
  * ([[Hashing.h60]] base) plus k multiply-adds ([[Hashing.h31Affine]]
  * family, identical literal coefficients), and the scan stays narrow —
  * the first shuffle of an LSH plan becomes the banded candidate join.
  *
  * Output: array of the k per-member minima (slot i = old `mh$i`
  * column). Null/empty shingle array → null (the old groupBy simply had
  * no rows for such docs — callers filter nulls to keep row parity);
  * null shingle elements are skipped (min over null affine hashes), and
  * an all-null array also yields null.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "signature width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // one family-coefficient table per expression instance, not per row
  private lazy val coeffs: (Array[Long], Array[Long]) = MinHashSig.coeffs(k)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null
      else MinHashSig.compute(arr, coeffs._1, coeffs._2)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSig.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    val co = ctx.addReferenceObj("minhashCoeffs", coeffs, "scala.Tuple2")
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = true;
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      |if (!${c.isNull} && ${c.value}.numElements() > 0) {
      |  ${ev.value} = $cls.compute(${c.value},
      |    (long[]) $co._1(), (long[]) $co._2());
      |  ${ev.isNull} = ${ev.value} == null;
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  private[functions] def coeffs(k: Int): (Array[Long], Array[Long]) = {
    val ab = (0 until k).map(Hashing.affineParams)
    (ab.map(_._1).toArray, ab.map(_._2).toArray)
  }

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val md = Md5.get()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val bm = SimHash60.h60Of(md, arr.getUTF8String(i)) % Hashing.P31
        var j = 0
        while (j < k) {
          val v = (as(j) * bm + bs(j)) % Hashing.P31
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    // all-null elements → null signature (impossible from TokenShingles,
    // whose arrays are containsNull=false, but reachable through the SQL
    // registration — and the SQL contract is "null for degenerate input",
    // not a job-killing exception)
    if (!any) null else new GenericArrayData(mins)
  }
}
