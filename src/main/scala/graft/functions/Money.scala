package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic over double-typed 2-decimal columns.
  *
  * Summing raw doubles is order-dependent (Spark's partial aggregation
  * order is nondeterministic), which breaks both run-to-run stability and
  * cross-engine oracle comparison. Converting to integer cents first
  * makes every aggregate exact: the sums fit comfortably in int64, and
  * the final division by a power of ten is a single correctly-rounded
  * IEEE op — bit-identical in any engine.
  */
object Money {

  /** 2-decimal double → exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Integer cents → display double (one exact IEEE division). */
  def fromCents(c: Column): Column = c.cast("double") / 100.0

  /** Exact sum of a 2-decimal column, returned as double. */
  def sumMoney(c: Column): Column = fromCents(sum(cents(c)))

  /** Exact, deterministic mean of a 2-decimal column. */
  def avgMoney(c: Column): Column =
    sum(cents(c)).cast("double") / count(c) / 100.0
}
