package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{RollingHash, VecDot}

/** Engine extensions, installed via
  * `spark.sql.extensions=graft.GraftExtensions`: registers native
  * Catalyst expressions into the session FunctionRegistry so they are
  * first-class in SQL (`SELECT rolling_hash(text) FROM docs`) as well as
  * the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(
        classOf[RollingHash].getName, null, "rolling_hash",
        "rolling_hash(str) - polynomial rolling hash of str's code points (base 31, mod 2^31-1)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_hash expects exactly 1 argument, got ${children.size}")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDot].getName, null, "vec_dot",
        "vec_dot(a, b) - double-precision dot product of two float/double arrays " +
          "(strict left-to-right fold; NULL on length mismatch or null elements)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot expects exactly 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      }))
  }
}
