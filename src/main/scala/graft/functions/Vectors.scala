package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns as pure
  * Column expressions (`zip_with` + `aggregate` stay in codegen; no UDF,
  * no driver collect).
  *
  * All arithmetic is double-precision with a strict left-to-right fold,
  * so results are bit-reproducible across engines and runs.
  */
object Vectors {

  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Native codegen dot product (functions.expr.VecDot): the HOF
    * `zip_with`+`aggregate` form is CodegenFallback — an interpreted
    * boxed lambda per element, ruinous across millions of candidate
    * pairs. Arithmetic is the identical strict left-to-right double
    * fold, so results stay bit-equal to the HOF form and the DuckDB
    * oracles.
    *
    * Built directly from the Expression (not `call_function`) so it
    * works on ANY SparkSession — sessions without
    * `spark.sql.extensions=graft.GraftExtensions` still get the native
    * path; the registration only adds the SQL-text surface.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.VecDot(
        org.apache.spark.sql.GraftColumnShim.expression(a),
        org.apache.spark.sql.GraftColumnShim.expression(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Squared L2 distance (monotone with L2 — cheaper for ranking). */
  def l2sq(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /** Sign-bit LSH bucket: `bits` pseudo-random hyperplanes whose
    * components are deterministic ±1 derived from (bit, dim) — engine
    * independent, no stored model. Returns a long bucket id.
    */
  def signLsh(a: Column, bits: Int): Column = signLsh(a, bits, 0)

  /** As [[signLsh]] but for hash table `table` of a multi-table LSH
    * scheme — each table draws an independent hyperplane family, so
    * unioning candidates over L tables trades compute for recall
    * (the standard scale knob for LSH ANN).
    *
    * Native codegen Expression (functions.expr.SignLsh) — the HOF form
    * it replaced ([[signLshHof]]) is CodegenFallback, interpreted per
    * row per plane; the native form folds all planes in one array pass.
    * Bit-parity between the two is asserted by a differential spec.
    */
  def signLsh(a: Column, bits: Int, table: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.SignLsh(
        org.apache.spark.sql.GraftColumnShim.expression(a), bits, table))

  /** Reference HOF implementation of [[signLsh]] — kept ONLY as the
    * differential-test twin of the native expression (and as executable
    * documentation of the exact arithmetic the oracle replays).
    */
  private[graft] def signLshHof(a: Column, bits: Int, table: Int): Column = {
    val planes = (0 until bits).map { j0 =>
      val j = j0 + table * 7919 // disjoint plane family per table
      // component sign for dim i: a fully-mixed middle bit of an integer
      // mix of (j, i). NOT bit 0 of the raw mix — both multipliers are
      // odd, so bit 0 reduces to parity(i + j) and every plane collapses
      // to one of two patterns; bit 13 of the product genuinely depends
      // on the multiplications.
      val proj = aggregate(
        zip_with(a, sequence(lit(0), size(a) - 1), (x, i) => {
          val mix = pmod(i.cast("long") * 2654435761L + lit(j.toLong) * 40503L, lit(1L << 31))
          when(shiftright(mix, 13).bitwiseAND(lit(1L)) === 1L, x.cast("double"))
            .otherwise(-x.cast("double"))
        }),
        lit(0.0),
        (acc, x) => acc + x
      )
      when(proj > 0, lit(1L << j0)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }
}
