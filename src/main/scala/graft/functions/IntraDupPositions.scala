package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token positions covered by an INTRA-document repeated k-window —
  * the removal mask of within-document span dedup (the repetition a
  * generation-time corpus actually suffers from; the cross-document
  * forms are [[graft.operators.Boilerplate.stripRepeatedSpans]] /
  * `KeepFirst`). A position is reported iff some k-token window
  * containing it is a NON-FIRST occurrence of that window's hash
  * inside the same document — the first occurrence (smallest start
  * position) is canonical and keeps its tokens.
  *
  * Window hashes are [[TokenWindowHashes]]' 60-bit values over the
  * same byte-scan tokenization, so the relational oracle (per-doc
  * min-position per anchor → covered positions of the rest) replays
  * the mask exactly. Entirely per-row — a corpus-wide repetition
  * strip with NO shuffle anywhere: the whole operator is this
  * projection plus an array filter. Returns a sorted int array of
  * 0-based removed token positions (empty when nothing repeats or the
  * doc has fewer than k tokens). */
case class IntraDupPositions(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "intra_dup_positions"

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nTok = 0
    val starts = new Array[Int](bytes.length / 2 + 1)
    val ends = new Array[Int](bytes.length / 2 + 1)
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        starts(nTok) = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    if (nTok < k) return new GenericArrayData(Array.empty[Int])
    val md = MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[java.lang.Long]()
    val covered = new Array[Boolean](nTok)
    var any = false
    var w = 0
    while (w <= nTok - k) {
      md.reset()
      var j = w
      while (j < w + k) {
        md.update(bytes, starts(j), ends(j) - starts(j))
        if (j < w + k - 1) md.update(' '.toByte)
        j += 1
      }
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      h = (h << 4) | ((d(7) & 0xF0L) >> 4)
      if (!seen.add(h)) { // non-first occurrence: its window is covered
        var p = w
        while (p < w + k) { covered(p) = true; p += 1 }
        any = true
      }
      w += 1
    }
    if (!any) return new GenericArrayData(Array.empty[Int])
    val out = Array.newBuilder[Int]
    var p = 0
    while (p < nTok) { if (covered(p)) out += p; p += 1 }
    new GenericArrayData(out.result().map(Int.box(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
