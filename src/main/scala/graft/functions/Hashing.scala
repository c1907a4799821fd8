package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing primitives shared by dedup/similarity operators.
  *
  * Everything is built from `md5` + integer arithmetic so that (a) results
  * are engine-independent (a DuckDB oracle computes bit-identical values)
  * and (b) the expressions stay inside whole-stage codegen.
  */
object Hashing {

  /** Modulus for MinHash permutations: 2^31 − 1 (prime). */
  val MinHashP = 2147483647L

  /** 60-bit non-negative hash of a string: first 15 hex chars of md5.
    * `conv` is fine here because 15 hex digits < 2^60 never overflows.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic per-permutation coefficients (odd multiplier,
    * arbitrary offset), engine-independent.
    */
  def minhashCoeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (2L * i + 1L) * 2654435761L % MinHashP // Knuth multiplicative
      val b = (i.toLong * 40503L + 2166136261L) % MinHashP
      (if (a == 0) 1L else a, b)
    }

  /** MinHash signature (array<long> of length k) over an array<string>
    * of shingles: sig_i = min over shingles of (a_i*(h60(s) mod p)+b_i) mod p.
    * Native one-pass codegen Expression
    * ([[graft.functions.expr.MinHashSig]]); NULL when the array is NULL
    * or has no non-null element.
    */
  def minhashSig(shingleSet: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.MinHashSig(
        org.apache.spark.sql.GraftColumnShim.expression(shingleSet), k))

  /** Reference HOF implementation of [[minhashSig]] — kept ONLY as the
    * differential-test twin of the native expression (and as executable
    * documentation of the arithmetic). Re-hashes every shingle per
    * permutation and its lambdas are CodegenFallback — never on a hot
    * path. All ops fit in int64: a < 2^31, h mod p < 2^31 ⇒ product < 2^62.
    */
  def minhashSignature(shingleSet: Column, k: Int): Column = {
    val coeffs = minhashCoeffs(k)
    // null elements are skipped and a set with no non-null element
    // yields NULL — the native expression's exact null contract
    val nn = filter(shingleSet, s => s.isNotNull)
    val hs = transform(nn, s => pmod(h60(s), lit(MinHashP)))
    val sig = array(coeffs.map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * lit(a) + lit(b), lit(MinHashP))))
    }: _*)
    when(size(nn) > 0, sig)
  }

  /** LSH band keys for a MinHash signature: r rows per band, b = k/r
    * bands; key = band index + joined row values. Any pair with Jaccard
    * similarity high enough to agree on one full band collides.
    */
  def minhashBands(sig: Column, k: Int, rowsPerBand: Int): Column = {
    require(k % rowsPerBand == 0, s"k=$k not divisible by r=$rowsPerBand")
    val b = k / rowsPerBand
    array((0 until b).map { band =>
      val parts = (0 until rowsPerBand).map(r => sig.getItem(band * rowsPerBand + r))
      concat_ws("_", (lit(band) +: parts).map(_.cast("string")): _*)
    }: _*)
  }

  /** 60-bit SimHash over a token array: bit j of the result is 1 iff
    * Σ_tokens (2·bit_j(h60(tok)) − 1) > 0. Native one-pass codegen
    * Expression ([[graft.functions.expr.SimHash60]]); NULL/empty/
    * all-null token arrays code to 0.
    */
  def simhash(tokensCol: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.SimHash60(
        org.apache.spark.sql.GraftColumnShim.expression(tokensCol)))

  /** Reference HOF implementation of [[simhash]] — kept ONLY as the
    * differential-test twin of the native expression (and as executable
    * documentation of the arithmetic): its 60 `aggregate` folds are
    * CodegenFallback and it re-walks the hash array per bit — never on
    * a hot path.
    */
  private[graft] def simhash60(tokensCol: Column): Column = {
    // skip null tokens like the native expression (an unfiltered fold
    // would null-poison every bit sum and code the array to 0)
    val hs = transform(filter(tokensCol, t => t.isNotNull), t => h60(t))
    val bitSums = (0 until 60).map { j =>
      aggregate(
        hs,
        lit(0L),
        (acc, h) => acc + shiftright(h, j).bitwiseAND(lit(1L)) * 2L - 1L
      )
    }
    bitSums.zipWithIndex
      .map { case (s, j) => when(s > 0, lit(1L << j)).otherwise(lit(0L)) }
      .reduce(_ + _)
  }

  /** Hamming distance between two long-encoded bit vectors. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split a 60-bit code into `bands` equal bit-slices (pigeonhole: two
    * codes within Hamming distance < bands share at least one slice).
    */
  def bitBands(code: Column, bands: Int, bits: Int = 60): Column = {
    require(bits % bands == 0)
    val w = bits / bands
    val mask = (1L << w) - 1
    array((0 until bands).map { i =>
      concat_ws("_", lit(i), shiftright(code, i * w).bitwiseAND(lit(mask)).cast("string"))
    }: _*)
  }
}
