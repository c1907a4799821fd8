package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `pq_recon_norm(codes, cent)` — the L2 norm of a PQ-reconstructed
  * vector `cent + decode(codes)`, fused into one native expression: the
  * norm is the ONLY thing the encode pipeline needs the reconstruction
  * for (it is the denominator of every compressed-domain cosine), so
  * materializing the D-float decoded array per base row — via THREE
  * CodegenFallback higher-order functions (`zip_with` lookup, `flatten`,
  * `zip_with` centroid add) — just to fold it into one double was the
  * residual-encoding hot-path cost. This computes it in registers.
  *
  * Bit-parity contract (load-bearing: persisted `d_nrm` values and the
  * persisted ≡ on-the-fly specs compare against the decode form):
  * per element, the float add `cent[i] + (float) codebook(j, codes[j])[t]`
  * matches `unresidExpr(cent, decodeExpr(codes))`'s float arithmetic
  * exactly, and the accumulation `acc += (double) x * (double) x` then
  * `sqrt` matches `norm2` = `sqrt(vec_dot(dec, dec))`'s strict
  * left-to-right double fold. The RAW (non-residual) layout passes a
  * zero centroid: `0.0f + x == x` exactly, so the same owner serves
  * both layouts.
  *
  * The codebook ships flattened (row-major (j·kSub + code)·sub + t)
  * through `ctx.references`, like [[NearestCentroid]]. NULL codes/cent
  * array, null element, out-of-range code, or a cent/codebook dimension
  * mismatch yields NULL (the row then drops from the scoreable set like
  * a null key — same posture as the encode filters).
  */
case class PqReconNorm(
    left: Expression, right: Expression,
    codebook: Array[Double], m: Int, sub: Int, kSub: Int)
    extends BinaryExpression {
  require(m >= 1 && sub >= 1 && kSub >= 1 && codebook.length == m * kSub * sub,
    s"codebook shape mismatch: ${codebook.length} != $m x $kSub x $sub")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_recon_norm requires (ARRAY<INT> codes, ARRAY<FLOAT> cent), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_recon_norm"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    PqReconNorm.reconNorm(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], codebook, m, sub, kSub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (c, ce) => {
      val nrm = ctx.freshName("reconNrm")
      s"""
         |Double $nrm = graft.functions.expr.PqReconNorm.reconNorm($c, $ce, $cb, $m, $sub, $kSub);
         |${ev.isNull} = $nrm == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $nrm.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconNorm =
    copy(left = newLeft, right = newRight)
}

object PqReconNorm {

  /** Static hot-path entry for both interpreted eval and codegen.
    * Returns a boxed Double or null.
    */
  def reconNorm(codes: ArrayData, cent: ArrayData,
      cb: Array[Double], m: Int, sub: Int, kSub: Int): java.lang.Double = {
    if (codes.numElements() != m || cent.numElements() != m * sub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= kSub) return null
      val off = (j * kSub + c) * sub
      var t = 0
      while (t < sub) {
        val i = j * sub + t
        if (cent.isNullAt(i)) return null
        val x = cent.getFloat(i) + cb(off + t).toFloat
        acc += x.toDouble * x.toDouble
        t += 1
      }
      j += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }
}
