package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, single pass.
  *
  * Replaces the `array_distinct(transform(sequence(...), i =>
  * array_join(slice(toks, i, n), " ")))` composition, whose per-position
  * `slice` copy makes it O(len²) per document with an interpreted lambda
  * dispatch per shingle (HigherOrderFunction is CodegenFallback) — this
  * construction sits under every set-similarity operator (Jaccard,
  * MinHash banding, decontamination, bigram repetition), i.e. in the
  * corpus-scan hot path of the whole dedup family.
  *
  * Semantics are identical to the composition it replaces:
  * first-occurrence order, `" "`-joined, null elements skipped (as
  * `array_join` does), fewer than `n` tokens → empty array, null input
  * array → empty array.
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "token_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TokenShingles.Empty()
    else TokenShingles.distinctShingles(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenShingles.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  ${c.isNull} ? $cls.Empty() : $cls.distinctShingles(${c.value}, $n);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingles {
  private val EmptyArray = new GenericArrayData(Array.empty[Any])
  def Empty(): ArrayData = EmptyArray

  // hoisted: allocating the separator per window position would sit in
  // the very hot loop this expression exists to optimize
  private val Space = UTF8String.fromString(" ")

  /** One pass: a sliding window of joined tokens into an insertion-order
    * set. */
  def distinctShingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return EmptyArray
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    var i = 0
    while (i + n <= len) {
      var j = 0
      var nonNull = 0
      while (j < n) {
        val e = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        if (e != null) { window(nonNull) = e; nonNull += 1 }
        j += 1
      }
      seen.add(UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(window, 0, nonNull): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
