package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** The engine's 60-bit portable hash ([[Hashing.h60]]) as a native
  * expression: md5 digest → first 15 hex chars as a long, computed
  * digest-direct (top 60 bits of the first 8 digest bytes).
  *
  * Value-identical to the `conv(substring(md5(s), 1, 15), 16, 10)`
  * composition it replaces, which paid for a 32-char hex rendering of
  * the digest, a substring copy, and a base-16 string parse on every
  * row — pure overhead in the hot sites (table checksums, LSH band
  * keys, hash-derived split/sample bucketing, decontamination n-gram
  * probes). Null input → null, like `md5(null)`.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "h60"

  override def nullSafeEval(v: Any): Any =
    H60.hash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = H60.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H60 {
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(s: org.apache.spark.unsafe.types.UTF8String): Long =
    SimHash60.h60Of(Md5.get(), s)
}
