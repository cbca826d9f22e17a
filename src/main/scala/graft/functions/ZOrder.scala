package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving as pure Catalyst arithmetic.
  *
  * Two order-preserving 16-bit bucket coordinates interleave into one
  * 32-bit key whose sort order clusters rows that are close in BOTH
  * dimensions — the standard multi-dimensional layout trick (classic
  * in OLAP stores): sort a table by `z(a, b)` and parquet row-group
  * min/max stats become selective for predicates on `a`, on `b`, or on
  * both, where a single-column sort serves only its own column.
  *
  * Everything here is shifts/masks/integer division on longs — inside
  * whole-stage codegen on the Spark side, and reproducible literally in
  * the DuckDB oracle (the `*Sql` twins), so the key itself is
  * value-checked cross-engine like every other hash/placement function
  * in this repo.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i —
    * the classic mask ladder (5 steps, not a 16-term sum). */
  def spread16(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
    v
  }

  /** DuckDB-SQL twin of [[spread16]]. */
  def spread16Sql(x: String): String = {
    var v = s"(($x) & 65535)"
    v = s"((($v | ($v << 8)) & 16711935))"
    v = s"((($v | ($v << 4)) & 252645135))"
    v = s"((($v | ($v << 2)) & 858993459))"
    v = s"((($v | ($v << 1)) & 1431655765))"
    v
  }

  /** Interleave two 16-bit coordinates: bit i of `a` → 2i, bit i of
    * `b` → 2i+1. Monotone in each argument with the other fixed. */
  def zorder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** DuckDB-SQL twin of [[zorder2]]. */
  def zorder2Sql(a: String, b: String): String =
    s"(${spread16Sql(a)} | (${spread16Sql(b)} << 1))"

  /** Order-preserving 16-bit bucket of `v` over the CLOSED range
    * [lo, hi]: `(v - lo) * 65535 div (hi - lo)`, in decimal so the
    * multiply cannot overflow for any long range; lo = hi maps to 0.
    * Null maps to bucket 0 (nulls cluster at the z-origin — they must
    * land somewhere deterministic, and 0 keeps them co-located). */
  def bucket16(v: Column, lo: Long, hi: Long): Column = {
    if (hi <= lo) lit(0L)
    else {
      val d = (v.cast("decimal(38,0)") - lit(lo)) * lit(65535L)
      val n = lit(hi - lo).cast("decimal(38,0)")
      // exact floor without an integral-divide builder: subtract the
      // remainder first, so the decimal division is exact and immune
      // to the round-at-scale-then-floor hazard (see Export.scala)
      coalesce(((d - pmod(d, n)) / n).cast("long"), lit(0L))
    }
  }

  /** DuckDB-SQL twin of [[bucket16]] — `lo`/`hi` are SQL expressions
    * (typically scalar-subquery columns), since the oracle recomputes
    * the range from the raw table rather than receiving literals. */
  def bucket16Sql(v: String, lo: String, hi: String): String =
    s"(CASE WHEN ($hi) <= ($lo) THEN 0 ELSE " +
      s"COALESCE(CAST(((CAST(($v) AS HUGEINT) - ($lo)) * 65535) // (($hi) - ($lo)) AS BIGINT), 0) END)"

  // ------------------------------------------------------ three dimensions

  /** Spread the low 21 bits of `x` so bit i lands at position 3i — the
    * 3-D Morton ladder (5 steps; 3 × 21 = 63 bits fits a long with the
    * sign bit clear, so the interleaved key sorts correctly as a
    * signed long). */
  def spread21(x: Column): Column = {
    var v = x.bitwiseAND(lit(0x1FFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 32))).bitwiseAND(lit(0x1F00000000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x1F0000FF0000FFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x100F00F00F00F00FL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x10C30C30C30C30C3L))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x1249249249249249L))
    v
  }

  /** DuckDB-SQL twin of [[spread21]] (masks in decimal — hex literals
    * are engine-dialect territory). The ladder runs in HUGEINT: the
    * JVM's long `<<` silently truncates the transient high bits the
    * next mask would discard anyway, but DuckDB RAISES on BIGINT shift
    * overflow — int128 gives the intermediate headroom, and the final
    * value is ≤ 2^63−1 by the last mask, so the BIGINT cast is exact. */
  def spread21Sql(x: String): String = {
    var v = s"(CAST(($x) & 2097151 AS HUGEINT))"
    v = s"((($v | ($v << 32)) & 8725724278095871))"
    v = s"((($v | ($v << 16)) & 8725728556220671))"
    v = s"((($v | ($v << 8)) & 1157144660301377551))"
    v = s"((($v | ($v << 4)) & 1207822528635744451))"
    v = s"((($v | ($v << 2)) & 1317624576693539401))"
    s"(CAST($v AS BIGINT))"
  }

  /** Interleave three 21-bit coordinates: bit i of `a` → 3i, of `b` →
    * 3i+1, of `c` → 3i+2. Monotone in each argument with the others
    * fixed — the (time, lat, lon)-style layout key. */
  def zorder3(a: Column, b: Column, c: Column): Column =
    spread21(a)
      .bitwiseOR(shiftleft(spread21(b), 1))
      .bitwiseOR(shiftleft(spread21(c), 2))

  /** DuckDB-SQL twin of [[zorder3]]. */
  def zorder3Sql(a: String, b: String, c: String): String =
    s"(${spread21Sql(a)} | (${spread21Sql(b)} << 1) | (${spread21Sql(c)} << 2))"

  /** Order-preserving 21-bit bucket over the CLOSED range [lo, hi] —
    * [[bucket16]]'s arithmetic at 3-D resolution (each dimension keeps
    * 21 of the key's 63 bits instead of 16 of 32). */
  def bucket21(v: Column, lo: Long, hi: Long): Column = {
    if (hi <= lo) lit(0L)
    else {
      val d = (v.cast("decimal(38,0)") - lit(lo)) * lit(2097151L)
      val n = lit(hi - lo).cast("decimal(38,0)")
      coalesce(((d - pmod(d, n)) / n).cast("long"), lit(0L))
    }
  }

  /** DuckDB-SQL twin of [[bucket21]]. */
  def bucket21Sql(v: String, lo: String, hi: String): String =
    s"(CASE WHEN ($hi) <= ($lo) THEN 0 ELSE " +
      s"COALESCE(CAST(((CAST(($v) AS HUGEINT) - ($lo)) * 2097151) // (($hi) - ($lo)) AS BIGINT), 0) END)"
}
