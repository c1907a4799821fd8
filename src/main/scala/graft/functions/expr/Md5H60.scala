package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** Single owner of the native h60 hot path: the value of the first 15
  * hex chars of md5(s) — i.e. the top 60 bits of the digest — matching
  * `conv(substring(md5(s),1,15),16,10)` and the DuckDB oracle digit-fold
  * ([[graft.queries.DuckOracle.h60]]) bit-for-bit.
  *
  * This arithmetic is bit-parity-critical for every minhash/simhash
  * oracle; keeping it in one place means an engine-parity tweak cannot
  * update one native expression and silently leave another diverging.
  */
private[expr] object Md5H60 {

  // MessageDigest is stateful and not thread-safe; one per task thread
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def h60(s: UTF8String): Long = {
    val digest = md5.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var bi = 0
    while (bi < 7) { v = (v << 8) | (d(bi) & 0xffL); bi += 1 }
    (v << 4) | ((d(7) & 0xffL) >> 4)
  }
}
