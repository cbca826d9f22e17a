package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Every hash here is defined purely in terms of `md5` over UTF-8 text, so
  * the *same value* is computable in any ANSI-ish SQL engine (the DuckDB
  * oracle computes `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`): that
  * portability is what lets MinHash/SimHash/fingerprint results be
  * hash-verified cross-engine instead of "rows-only" checked.
  *
  * 15 hex chars = 60 bits: always positive in a signed 64-bit long, so
  * `%`, `>>`, `&` behave identically everywhere. Everything stays inside
  * whole-stage codegen: the base hash is the native [[H60]] expression,
  * the affine family is built-in arithmetic — no UDFs.
  */
object Hashing {

  /** 60-bit positive hash of a string column — the native [[H60]]
    * expression (digest-direct; value-identical to the former
    * `conv(substring(md5(s), 1, 15), 16, 10)` composition, minus its
    * per-row hex render + substring + base-16 parse). */
  def h60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(H60(ColumnBridge.expression(c.cast("string"))))
  }

  /** Seeded variant: one independent-ish hash family member per seed
    * (standard MinHash construction: h_i(x) = H(i || x)). */
  def h60(seed: Int, c: Column): Column =
    h60(concat(lit(s"$seed:"), c))

  /** The DuckDB-SQL text of [[h60]] — used to build oracle queries from
    * the same definition. */
  def h60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Plain-JVM twin of [[h60]] for plan-build-time constants (e.g. LSH
    * hyperplane signs embedded as literals on both engines). */
  def h60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ---------------------------------------------------- affine hash family

  /** Mersenne prime 2^31 − 1: the modulus of the affine family. Products
    * a·(base mod p) stay under 2^62, so the arithmetic is exact in signed
    * 64-bit on every engine. */
  val P31: Long = 2147483647L

  /** Deterministic per-member coefficients (a ∈ [1, p−1], b ∈ [0, p−1]),
    * derived from md5 so both engines embed identical literals. */
  def affineParams(i: Int): (Long, Long) =
    (h60Jvm(s"a:$i") % (P31 - 1) + 1, h60Jvm(s"b:$i") % P31)

  /** Member `i` of a universal hash family over ONE base hash:
    * h_i(x) = (a_i·(h60(x) mod p) + b_i) mod p. The standard MinHash
    * construction — k family members cost ONE md5 per element plus k
    * multiply-adds, not k md5s. */
  def h31Affine(i: Int, base: Column): Column = {
    val (a, b) = affineParams(i)
    (lit(a) * (base % lit(P31)) + lit(b)) % lit(P31)
  }

  /** DuckDB-SQL twin of [[h31Affine]]. */
  def h31AffineSql(i: Int, baseExpr: String): String = {
    val (a, b) = affineParams(i)
    s"(($a * (($baseExpr) % $P31) + $b) % $P31)"
  }
}
