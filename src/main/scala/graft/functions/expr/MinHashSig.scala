package graft.functions.expr


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `minhash_sig(shingles, k)` — full k-permutation MinHash signature of
  * an `array<string>` shingle set as ONE native pass, replacing the
  * explode → hash → k min-aggregates shape of
  * [[graft.operators.Dedup.minhashSignaturesFromSets]].
  *
  * Why an Expression and not the agg pipeline: the exploded form
  * streams every shingle through the row pipeline and a 64-column
  * HashAggregate (per-row hash-map probe + 64 column updates), then
  * crosses a shuffle boundary to merge partials — all to compute a
  * value that is a pure per-document fold. Here the whole signature is
  * produced inside whole-stage codegen by a static primitive loop: one
  * md5 per shingle, all k permutations folded in registers, no explode,
  * no aggregate, no exchange. (Same disease/cure as [[SignLsh]] and
  * [[VecDot]].)
  *
  * Exact-arithmetic contract (bit-parity with the agg form and the
  * DuckDB oracle, which both replay it): for shingle s,
  * `h = top-60-bits(md5(utf8(s))) mod p` with p = 2^31−1 (the value of
  * `conv(substring(md5(s),1,15),16,10) mod p`), and
  * `sig_i = min over s of (h*a_i + b_i) mod p` with the Knuth
  * coefficients of [[graft.functions.Hashing.minhashCoeffs]]. All
  * intermediates fit in int64: a < 2^31 and h < 2^31 ⇒ h*a+b < 2^62.
  *
  * Null contract: NULL array → NULL; NULL elements are skipped (in the
  * agg form a NULL shingle hashes to NULL and `min` ignores it); an
  * array with no non-null elements → NULL signature (the agg form emits
  * no group at all for such a document — callers filter NULLs to keep
  * that semantics).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"minhash_sig k must be in [1, 1024], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else MinHashSig.signature(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expr.MinHashSig.signature($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val P = graft.functions.Hashing.MinHashP // 2^31 − 1

  // coefficient arrays per k (tiny; k is a plan-time constant so the
  // map holds one entry per distinct k in the job)
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]

  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, k2 => {
      val cs = graft.functions.Hashing.minhashCoeffs(k2)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })

  /** Static hot-path entry used by both interpreted eval and codegen:
    * one md5 ([[Md5H60]]) + k fused multiply-mod-min updates per shingle.
    */
  def signature(a: ArrayData, k: Int): ArrayData = {
    val (ca, cb) = coeffs(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        seen = true
        val h = Md5H60.h60(a.getUTF8String(i)) % P // non-negative, so % == pmod
        var j = 0
        while (j < k) {
          val m = (h * ca(j) + cb(j)) % P
          if (m < mins(j)) mins(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }
}
