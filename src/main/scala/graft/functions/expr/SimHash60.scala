package graft.functions.expr


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash60(tokens)` — 60-bit SimHash of an `array<string>` token
  * list as ONE native pass, replacing the explode_outer → h60 → 60
  * sum-aggregates shape of [[graft.operators.Dedup.simhashes]] (and the
  * 60-interpreted-`aggregate`-folds HOF form
  * [[graft.functions.Hashing.simhash60]]).
  *
  * Like [[MinHashSig]]: the code is a pure per-document fold, so it
  * should cost one narrow projection — one md5 per token and 60 bit-sum
  * updates in registers, inside whole-stage codegen; no explode, no
  * 60-column HashAggregate, no exchange.
  *
  * Exact-arithmetic contract (bit-parity with both prior forms and the
  * DuckDB oracle): `h = top-60-bits(md5(utf8(tok)))` (the value of
  * `conv(substring(md5(tok),1,15),16,10)`); bit j of the result is 1
  * iff `Σ_tokens (2·bit_j(h) − 1) > 0`. Token multiplicity counts
  * (frequency-weighted SimHash) — inputs are token LISTS, not sets.
  *
  * Null contract (parity with the explode_outer agg form, which keeps
  * tokenless docs at simhash 0): NULL array → 0; NULL tokens are
  * skipped (their h60 is NULL and `sum` ignores it); empty/all-null →
  * all bit-sums 0, none > 0 → code 0. Hence `nullable = false`.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires an ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash60"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHash60.code(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L :
          graft.functions.expr.SimHash60.code(${childGen.value});
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Static hot-path entry used by both interpreted eval and codegen:
    * one md5 ([[Md5H60]]) + 60 bit-sum updates per token.
    */
  def code(a: ArrayData): Long = {
    val sums = new Array[Int](60)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = Md5H60.h60(a.getUTF8String(i))
        var j = 0
        while (j < 60) {
          sums(j) += (((h >> j) & 1L).toInt << 1) - 1 // 2·bit − 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
