package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_adc(codes, lut)` — asymmetric-distance-computation scoring for
  * product-quantized vectors (the FAISS ADC formulation): with a
  * per-QUERY lookup table `lut[j·kSub + t] = q_subⱼ · codeword(j, t)`,
  * the query/candidate inner product in the compressed domain is
  *
  *   q · decode(codes) = Σⱼ lut[j·kSub + codes[j]]   (+ q·centroid,
  *                        added by the caller on residual layouts)
  *
  * — `m` array lookups and adds per candidate instead of reconstructing
  * a D-float vector and folding a D-term dot product. This is the
  * compressed-domain scan's hot path: it runs once per
  * (candidate × probing query) pair, so it must stay inside
  * whole-stage codegen (the decode-then-`vec_dot` form it replaces
  * paid an interpreted `zip_with` reconstruction per candidate).
  *
  * Mathematically equal to `vec_dot(q, decode(codes))` up to float
  * summation order (subspace partial sums vs one long fold) — an
  * engine-side shortlist-ranking quantity, never a reported score, so
  * bit-parity with the decode form is NOT part of its contract (the
  * reported sims are exact cosines from the rerank stage regardless).
  *
  * NULL contract: null codes/lut array, null element, or an
  * out-of-range code (shape drift between codes and lut) yields NULL —
  * the pair then drops from the shortlist like a null key.
  */
case class PqAdc(left: Expression, right: Expression, kSub: Int)
    extends BinaryExpression {
  require(kSub >= 1, s"kSub must be >= 1, got $kSub")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (ARRAY<INT> codes, ARRAY<DOUBLE> lut), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    PqAdc.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], kSub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val acc = ctx.freshName("adcAcc")
      s"""
         |Double $acc = graft.functions.expr.PqAdc.adc($c, $t, $kSub);
         |${ev.isNull} = $acc == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $acc.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  /** Static hot-path entry for both interpreted eval and codegen.
    * Returns a boxed Double or null.
    */
  def adc(codes: ArrayData, lut: ArrayData, kSub: Int): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m.toLong * kSub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= kSub) return null
      val idx = j * kSub + c
      if (lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
