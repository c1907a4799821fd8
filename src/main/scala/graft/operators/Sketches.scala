package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Distinct-count sketching via K-minimum-values (KMV / bottom-k) —
  * the Θ-sketch family (Bar-Yossef et al., RANDOM'02; Apache
  * DataSketches' theta sketch): hash every value to (0, 1], keep the k
  * smallest DISTINCT hashes, and estimate the distinct count from how
  * tightly they crowd zero: `D ≈ (k−1) / h_(k)` with `h_(k)` the k-th
  * smallest normalized hash. Standard error ≈ 1/√(k−2) (~12% at k=64,
  * ~6% at k=256).
  *
  * Why not `approx_count_distinct`? Spark's HLL++ is engine-internal:
  * its registers are neither portable nor replayable, so a result can
  * only be spot-checked against tolerance. KMV built on the repo's
  * [[Hashing.h60]] is fully DETERMINISTIC: the bottom-k hash set is a
  * pure function of the value set, so the DuckDB oracle replays the
  * sketch bit-for-bit (q22) — the same engine-independence argument
  * that picked hash-threshold sampling over `rand()` in
  * [[Sampling]].
  *
  * Scale shape: the bottom-k per group is exactly the [[TopK]]
  * k-buffer with the metric negated — map-side partial bottom-k, so
  * the shuffle carries ≤ k hashes per (partition, group) no matter the
  * corpus; the sketch is MERGEABLE by construction (union the hash
  * sets, re-take the bottom k — min-k is order-independent), which is
  * what makes it a sketch and not just a sample.
  */
object Sketches {

  /** Per-group distinct-count estimates: one row per key with
    * `n_kept` (≤ k distinct hashes seen), `kth_hash` (the largest kept
    * hash), and `est_distinct`. A group holding fewer than k distinct
    * hashes is EXACT (`est = n_kept`); at ≥ k the KMV estimator kicks
    * in: `(k−1) · 2^60 / kth_hash` (h60 is uniform on [0, 2^60), so
    * `kth_hash / 2^60` is the normalized k-th minimum). Null values
    * are excluded (COUNT DISTINCT semantics).
    */
  def kmvDistinctByKey(
      df: DataFrame, key: Column, value: Column, k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 for a finite-variance estimate, got $k")
    // distinct (key, hash) first: duplicate values must not occupy
    // bottom-k slots — partial aggregation dedups map-side, so the
    // exchange carries distinct hashes only
    val hashed = df
      .filter(value.isNotNull)
      .select(key.as("key"), Hashing.h60(value.cast("string")).as("h"))
      .distinct()
    // bottom-k = TopK on the negated hash; h < 2^60 so -h never
    // overflows. The aggregator id slot carries the hash itself.
    val bottom = hashed
      .groupBy("key")
      .agg(TopK.topK(k)(-col("h"), col("h")).as("mins"))
      .select(
        col("key"),
        size(col("mins")).as("n_kept"),
        // mins is (metric desc) = (-h desc) = h asc; last entry = k-th min
        element_at(col("mins"), size(col("mins"))).getField("id").as("kth_hash"))
    bottom.select(
      col("key"),
      col("n_kept"),
      col("kth_hash"),
      when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise(
          (lit((k - 1).toDouble) * lit(1152921504606846976.0)) / col("kth_hash").cast("double"))
        .as("est_distinct"))
  }
}
