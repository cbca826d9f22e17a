package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mode-frequency count over an `array<string>`: the number of
  * occurrences of the MOST frequent element (empty array → null, like
  * the `array_max(transform(array_distinct(...)))` fold it replaces).
  *
  * That fold is O(distinct·n) with an interpreted per-element lambda
  * dispatch (HigherOrderFunction is CodegenFallback) — for repetition
  * scoring it sat in the corpus-scan hot path at ~n·d lambda calls per
  * document. This expression is one sort + one linear run-scan,
  * O(n log n) with zero lambda dispatch, invoked from whole-stage
  * codegen.
  *
  * Null elements are counted as a value of their own (they sort
  * together); the engine's tokenizers never emit null tokens.
  */
case class TokenModeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "token_mode_count"

  override def nullSafeEval(input: Any): Any = {
    val r = TokenModeCount.modeCount(input.asInstanceOf[ArrayData])
    if (r == 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = TokenModeCount.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.modeCount($a);
         |if (${ev.value} == 0) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenModeCount {
  // hoisted: a per-call closure allocation would run once per row
  private val NullsFirst = new java.util.Comparator[UTF8String] {
    override def compare(x: UTF8String, y: UTF8String): Int =
      if (x eq y) 0
      else if (x == null) -1
      else if (y == null) 1
      else x.compareTo(y)
  }

  /** Max element frequency; 0 for an empty array (mapped to null above). */
  def modeCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a, NullsFirst)
    var best = 1
    var run = 1
    i = 1
    while (i < n) {
      val same = if (a(i) == null) a(i - 1) == null
        else a(i - 1) != null && a(i).equals(a(i - 1))
      run = if (same) run + 1 else 1
      if (run > best) best = run
      i += 1
    }
    best
  }
}
