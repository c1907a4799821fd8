package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `NearestCentroid(vec)` — index of the squared-L2-nearest centroid of
  * a small fixed codebook, as a native codegen expression. The IVF
  * assignment hot path: one pass per row over `k × dim` doubles in
  * registers, replacing MLlib's `model.transform` UDF (per-row boxing +
  * Vector conversion) on a scan that touches EVERY corpus row.
  *
  * The codebook ships flattened (row-major `k × dim`) through
  * `ctx.references` — broadcast-by-closure is fine at IVF codebook
  * sizes (≤ a few thousand × dim doubles). Ties break toward the lower
  * centroid index (strict `<`), matching the driver-side
  * [[graft.operators.Quantizer]] loop. A NULL array or NULL element
  * yields NULL (the row then drops from the cell equi-join, like a
  * null key).
  */
case class NearestCentroid(child: Expression, centroids: Array[Double], k: Int, dim: Int)
    extends UnaryExpression {
  require(k >= 1 && dim >= 1 && centroids.length == k * dim,
    s"codebook shape mismatch: ${centroids.length} != $k x $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires an ARRAY<FLOAT|DOUBLE> input, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else NearestCentroid.nearest(v.asInstanceOf[ArrayData], centroids, k, dim, elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[]")
    // freshName: two NearestCentroid calls in one codegen method must
    // not collide on the local holding the boxed result
    val nc = ctx.freshName("nearestCell")
    nullSafeCodeGen(ctx, ev, c => s"""
      Integer $nc = graft.functions.expr.NearestCentroid.nearest($c, $cents, $k, $dim, $elemIsFloat);
      ${ev.isNull} = $nc == null;
      ${ev.value} = ${ev.isNull} ? -1 : $nc.intValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Static hot-path entry for both interpreted eval and codegen.
    * Returns a boxed Integer or null (null element → null row).
    */
  def nearest(a: ArrayData, cents: Array[Double], k: Int, dim: Int,
      elemFloat: Boolean): Integer = {
    val n = math.min(a.numElements(), dim)
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      i = 0
      while (i < n) {
        val x = (if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)) - cents(off + i)
        s += x * x
        i += 1
      }
      // dims beyond the vector length count the centroid's own mass —
      // consistent across centroids, and unreachable for fixed-dim data
      while (i < dim) { s += cents(off + i) * cents(off + i); i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    Integer.valueOf(best)
  }
}
