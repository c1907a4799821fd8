package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(str)` — polynomial rolling hash of a string's Unicode
  * code points: h = Σ h·B + cp (mod P), B=31, P=2^31−1.
  *
  * A native Catalyst expression with `doGenCode` (not a Scala UDF): the
  * generated code is a direct static call inside whole-stage codegen —
  * no boxing, no serialization, null-safe via nullSafeCodeGen. The
  * modulus keeps every intermediate < 2^36 so the same arithmetic is
  * reproducible in integer SQL on any engine (the DuckDB oracle
  * recomputes it with a list fold).
  *
  * This is the primitive under document fingerprinting / winnowing
  * (reference analogue: content hashing,
  * /root/reference/src/file_indexing_system.py:100-118, applied to the
  * training-data fingerprinting ops the engine adds).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.RollingHash.hash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 31L
  val Mod = 2147483647L // 2^31 − 1 (prime)

  /** Static hot-path entry used by both interpreted eval and codegen. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}
