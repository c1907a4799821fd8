package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, FloatType}

/** `vec_sub(a, b)` — elementwise float difference of two float-array
  * columns as a native codegen expression: the residual-encoding hot
  * path (`x − centroid(cell)`) runs once per base row of an IVF-PQ
  * build/add, and the `zip_with` form it replaces is CodegenFallback
  * (interpreted boxed lambda per element).
  *
  * Arithmetic contract: per-element Java float subtraction — identical
  * bits to `zip_with(a, b, (x, c) => x - c)` over float arrays. A NULL
  * array or a LENGTH MISMATCH yields NULL (call sites gate exact
  * dimensions first; `zip_with`'s null-padding would hide a ragged
  * input instead). A null ELEMENT yields a null element, preserving the
  * null-code propagation the encode pipeline's filters rely on.
  */
case class VecSub(left: Expression, right: Expression) extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub requires ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DataTypes.createArrayType(FloatType, true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VecSub.sub(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("subOut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.expr.VecSub.sub($a, $b);
         |${ev.isNull} = $out == null;
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSub =
    copy(left = newLeft, right = newRight)
}

object VecSub {

  /** Static hot-path entry for both interpreted eval and codegen.
    * Returns an ArrayData of (nullable) floats, or null on a length
    * mismatch.
    */
  def sub(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        out(i) = java.lang.Float.valueOf(a.getFloat(i) - b.getFloat(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
