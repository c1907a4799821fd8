package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic corpus sampling for data-mixing pipelines.
  *
  * Training-data recipes keep strata at different rates ("downsample
  * web crawl to 25%, keep books at 100%"). Doing that with `rand()` is
  * wrong twice at scale: task retries resample (non-deterministic
  * lineage), and two pipelines can't agree on the same subset. The
  * standard fix is hash-threshold sampling: keep a row iff
  * `h(salt || id) mod M < rate·M` — deterministic, re-runnable,
  * stratum-independent, and a pure narrow filter (no shuffle, no state,
  * survives any scale).
  *
  * The hash is [[Hashing.h60]] (md5-based), so a DuckDB oracle replays
  * membership bit-for-bit; changing `salt` draws an independent sample.
  */
object Sampling {

  val Modulus = 1000000L

  /** Per-stratum keep rates with a default; rates are exact to 1/M
    * (1e-6). The row is kept iff
    * `h60(salt:id) mod M < floor(rate(stratum)·M)`.
    */
  def stratifiedSample(
      df: DataFrame,
      stratum: Column,
      id: Column,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    val threshold = rates.foldLeft(lit((defaultRate * Modulus).toLong)) {
      case (acc, (k, r)) => when(stratum === lit(k), lit((r * Modulus).toLong)).otherwise(acc)
    }
    df.filter(sampleKey(id, salt) < threshold)
  }

  /** The sampling key: `h60(salt || ':' || id) mod M`. Exposed so
    * oracle twins and uniform (non-stratified) call sites share the
    * single owner.
    */
  def sampleKey(id: Column, salt: String): Column =
    pmod(Hashing.h60(concat(lit(salt + ":"), id.cast("string"))), lit(Modulus))

  /** Uniform deterministic sample at `rate`. */
  def uniformSample(df: DataFrame, id: Column, rate: Double, salt: String): DataFrame =
    stratifiedSample(df, lit(null).cast("string"), id, Map.empty, rate, salt)
}
