package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `sign_lsh(vec, bits, table)` — sign-hyperplane LSH bucket id of a
  * float/double array as a native Catalyst expression with `doGenCode`.
  *
  * Replaces the `zip_with`+`aggregate` HOF form previously used by
  * [[graft.functions.Vectors.signLsh]]: those higher-order functions
  * are CodegenFallback, so every row paid `bits × dim` interpreted
  * boxed-lambda evaluations — the dominant cost of the LSH bucketing
  * stage at corpus scale (the same disease [[VecDot]] cured for pair
  * scoring). This expression makes ONE pass over the array, folding all
  * `bits` plane projections simultaneously through a static primitive
  * loop called directly from whole-stage codegen — no boxing, no
  * per-plane re-walk of the array.
  *
  * Exact-arithmetic contract (bit-parity with the HOF form, asserted by
  * a differential spec; the DuckDB oracle replays it): for plane j0 in
  * [0, bits), with j = j0 + table*7919, the component sign for dim i
  * (0-based) is bit 13 of `(i*2654435761 + j*40503) mod 2^31`; each
  * plane projection is a strict left-to-right double sum starting at
  * 0.0; bucket bit j0 is set iff its projection is > 0 under Spark/
  * DuckDB comparison semantics, where NaN is GREATER than every value —
  * a NaN projection sets its bit (Java's `NaN > 0 == false` would
  * silently diverge from both engines).
  *
  * Null parity with the HOF form: a NULL array OR any NULL element
  * yields bucket 0 (in the HOF form the null propagates through the
  * fold into `when(proj > 0, …).otherwise(0)`, so every plane
  * contributes its `otherwise`). Hence `nullable = false`.
  */
case class SignLsh(child: Expression, bits: Int, table: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"sign_lsh bits must be in [1, 63], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh requires an ARRAY<FLOAT|DOUBLE> input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sign_lsh"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else SignLsh.bucket(v.asInstanceOf[ArrayData], bits, table, elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L :
          graft.functions.expr.SignLsh.bucket(${childGen.value}, $bits, $table, $elemIsFloat);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLsh =
    copy(child = newChild)
}

object SignLsh {

  /** Static hot-path entry used by both interpreted eval and codegen:
    * one pass over the array, all planes folded simultaneously.
    */
  def bucket(a: ArrayData, bits: Int, table: Int, elemFloat: Boolean): Long = {
    val n = a.numElements()
    // j*40503 offset per plane (j = j0 + table*7919), hoisted off the
    // element loop
    val offs = new Array[Long](bits)
    var j0 = 0
    while (j0 < bits) { offs(j0) = (j0 + table * 7919).toLong * 40503L; j0 += 1 }
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L // null element: every plane folds to null → 0
      val x = if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val base = i.toLong * 2654435761L
      j0 = 0
      while (j0 < bits) {
        // floorMod, not Java % (sign-following): the HOF twin and the
        // DuckDB oracle use pmod, and (base + offs) goes negative when
        // `table` is negative or table*7919 wraps Int — Java % would
        // silently flip the sign bit source there and break parity
        val rem = (base + offs(j0)) % 2147483648L
        val mix = if (rem < 0) rem + 2147483648L else rem
        acc(j0) += (if (((mix >> 13) & 1L) == 1L) x else -x)
        j0 += 1
      }
      i += 1
    }
    var out = 0L
    j0 = 0
    while (j0 < bits) {
      // Spark SQL (and DuckDB) comparison semantics, NOT Java's: NaN is
      // greater than every numeric value, so a NaN projection sets its
      // bit. A NaN element poisons every plane's fold, making the
      // bucket (1<<bits)-1 — parity with the HOF twin and the oracle.
      if (acc(j0) > 0 || java.lang.Double.isNaN(acc(j0))) out |= (1L << j0)
      j0 += 1
    }
    out
  }
}
