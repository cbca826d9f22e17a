package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpec
import graft.functions.{TextAnalysis => TA}

class KgramFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: Column, k: Int = 8, mod: Int = 64): Column =
    ColumnBridge.column(KgramFingerprint(ColumnBridge.expression(c), k, mod))

  /** The declarative construction the expression replaces. */
  private def declarative(c: Column, k: Int = 8, mod: Int = 64): (Column, Column) = {
    val hashes = transform(TA.charKgrams(c, k), g => Hashing.h60(g))
    (array_min(hashes), size(filter(hashes, h => h % mod === 0)).cast("long"))
  }

  test("value-identical to the declarative transform+h60 form") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaa", // repeated grams
      "exactly8!",       // just over k
      "12345678",        // exactly k: one gram
      "short",           // under k: null fp
      "",                // empty
      "héllo wörld — ünïcode ẞtraße test ✓ done", // multi-byte codepoints
      "tab\tand\nnewline  spaced"
    ).toDF("text")
    val (fp, ns) = declarative(col("text"))
    val both = docs.select(
      native(col("text")).as("n"),
      fp.as("d_fp"), ns.as("d_ns")).collect()
    both.foreach { r =>
      val nat = r.getStruct(0)
      assert(Option(if (nat.isNullAt(0)) null else nat.getLong(0)) ==
        Option(if (r.isNullAt(1)) null else r.getLong(1)), s"fp mismatch: $r")
      assert(nat.getLong(1) == r.getLong(2), s"n_sampled mismatch: $r")
    }
  }

  test("seeded random strings agree with the declarative form") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh ij.klmnop"
    val docs = (0 until 50).map(_ =>
      (0 until (rnd.nextInt(60) + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .toDF("text")
    val (fp, ns) = declarative(col("text"))
    docs.select(native(col("text")).as("n"), fp.as("d_fp"), ns.as("d_ns"))
      .collect().foreach { r =>
        val nat = r.getStruct(0)
        assert((nat.isNullAt(0) && r.isNullAt(1)) ||
          nat.getLong(0) == r.getLong(1))
        assert(nat.getLong(1) == r.getLong(2))
      }
  }
}
