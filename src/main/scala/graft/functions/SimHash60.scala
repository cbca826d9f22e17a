package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit frequency-weighted SimHash of a token array, one pass per row.
  *
  * A document's SimHash is a pure function of its own tokens, so
  * computing it as `explode` → 60 conditional `sum`s → `groupBy(id)`
  * (the composition this replaces) pays a full shuffle of every
  * (doc, token) row plus a 60-column hash aggregation — per-partition
  * work masquerading as a distributed aggregation. As a scalar
  * expression the signature costs the same md5s but zero exchanges:
  * the corpus is scanned once, narrowly, and the first shuffle in a
  * dedup plan is the (much smaller) candidate-pair join.
  *
  * Value-identical to the composition (and the DuckDB oracle): token
  * hash = first 15 md5 hex chars as a long ([[Hashing.h60]]); bit i set
  * iff Σ_tokens (2·bit_i − 1) > 0; a null token contributes −1 to every
  * bit (what `when(bit(null)===1, 1).otherwise(-1)` evaluated to).
  * Null or empty token array → null (those docs vanished at the old
  * explode, so callers filter nulls to keep row parity).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null else SimHash60.compute(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash60.getClass.getName.stripSuffix("$")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |boolean ${ev.isNull} = true;
      |long ${ev.value} = 0L;
      |if (!${c.isNull} && ${c.value}.numElements() > 0) {
      |  ${ev.isNull} = false;
      |  ${ev.value} = $cls.compute(${c.value});
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {

  // MessageDigest is stateful; per-row allocation would dominate short
  // documents, so one instance per task thread
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 md5 hex chars as a long — bit-identical to
    * [[Hashing.h60]]'s `conv(substring(md5(s), 1, 15), 16, 10)`:
    * 15 hex chars = the first 8 digest bytes big-endian, low nibble
    * dropped. */
  private[functions] def h60Of(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  def compute(arr: ArrayData): Long = {
    val md = Md5.get()
    val counts = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 60) { counts(b) -= 1; b += 1 }
      } else {
        val h = h60Of(md, arr.getUTF8String(i))
        var b = 0
        while (b < 60) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}
