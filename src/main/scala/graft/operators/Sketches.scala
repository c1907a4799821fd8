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
  * Scale shape: a dedup-aware bottom-k buffer (the [[TopK]] k-buffer
  * discipline with an in-buffer distinct check) — map-side partial
  * bottom-k, so the shuffle carries ≤ k hashes per (partition, group)
  * no matter the corpus or its duplication; the sketch is MERGEABLE
  * by construction (union the hash sets, re-take the bottom k — min-k
  * is order-independent), which is what makes it a sketch and not
  * just a sample.
  */
object Sketches {

  /** A built Bloom filter: `mBits` bits in `words` (64 per entry),
    * `kHash` probe positions per value. Driver-held and broadcast as a
    * literal into membership expressions — mBits = 2^20 is 128 KiB, the
    * same order as a quantizer codebook. No false negatives, tunable
    * false-positive rate ≈ (1 − e^(−k·n/m))^k.
    */
  case class BloomFilter(mBits: Int, kHash: Int, words: Array[Long])

  /** The `kHash` probe positions for a 60-bit hash, Kirsch–Mitzenmacher
    * double hashing: `h1 = h & (m−1)`, `h2 = ((h >> log2 m) & (m−1)) | 1`
    * (odd, so the probe sequence walks the whole table),
    * `pos_i = (h1 + i·h2) & (m−1)`. Pure bit arithmetic — an oracle
    * replays it with `&`/`>>` on the same h60.
    */
  private def probes(h: Column, mBits: Int, kHash: Int): Seq[Column] = {
    val mask = lit((mBits - 1).toLong)
    val log2m = java.lang.Integer.numberOfTrailingZeros(mBits)
    val h1 = h.bitwiseAND(mask)
    val h2 = shiftright(h, log2m).bitwiseAND(mask).bitwiseOR(lit(1L))
    (0 until kHash).map(i => (h1 + lit(i.toLong) * h2).bitwiseAND(mask))
  }

  /** Catalyst ShiftRight with a COLUMN shift amount (the functions API
    * only takes a literal Int).
    */
  private def shrCol(a: Column, bits: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRight(
        org.apache.spark.sql.GraftColumnShim.expression(a),
        org.apache.spark.sql.GraftColumnShim.expression(bits)))

  /** Build a Bloom filter over a value column in one distributed pass:
    * hash → probe positions → per-word `bit_or` aggregate → ≤ mBits/64
    * driver rows. Null values are skipped (membership of null is
    * false, like `IN`).
    */
  def bloomBuild(df: DataFrame, value: Column, mBits: Int, kHash: Int): BloomFilter = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(kHash >= 1 && kHash <= 16, s"kHash must be in 1..16, got $kHash")
    val wordRows = df
      .filter(value.isNotNull)
      .select(Hashing.h60(value.cast("string")).as("h"))
      .select(explode(array(probes(col("h"), mBits, kHash): _*)).as("pos"))
      .select(
        shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("word"))
      .collect()
    val words = new Array[Long](mBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    BloomFilter(mBits, kHash, words)
  }

  /** Membership test as a pure Column expression over the broadcast
    * literal bitmap: every probe position's bit must be set. False ⇒
    * definitely absent (the no-false-negative guarantee downstream
    * pre-filters lean on); true ⇒ present with probability
    * 1 − fp-rate. Null values test false.
    */
  def bloomContains(b: BloomFilter, value: Column): Column =
    when(value.isNull, lit(false))
      .otherwise(bloomContainsHash(b, Hashing.h60(value.cast("string"))))

  /** [[bloomContains]] over an ALREADY-COMPUTED h60 hash — callers in
    * higher-order lambdas bind the hash to an attribute first
    * (`transform(xs, x -> h60(x))` then `exists(hs, h -> …)`) so the
    * md5 runs once per value instead of once per probe term (HOF
    * lambdas are interpreted — no common-subexpression elimination
    * rescues a repeated hash there).
    */
  def bloomContainsHash(b: BloomFilter, h: Column): Column = {
    val wordsLit = typedLit(b.words.toSeq)
    val checks = probes(h, b.mBits, b.kHash).map { pos =>
      val word = element_at(wordsLit, shiftright(pos, 6).cast("int") + 1)
      shrCol(word, pos.bitwiseAND(lit(63L)).cast("int")).bitwiseAND(lit(1L)) === 1L
    }
    checks.reduce(_ && _)
  }

  /** Per-group distinct-count estimates: one row per key with
    * `n_kept` (≤ k distinct hashes seen), `kth_hash` (the largest kept
    * hash), and `est_distinct`. A group holding fewer than k distinct
    * hashes is EXACT (`est = n_kept`); at ≥ k the KMV estimator kicks
    * in: `(k−1) · 2^60 / kth_hash` (h60 is uniform on [0, 2^60), so
    * `kth_hash / 2^60` is the normalized k-th minimum). Null values
    * are excluded (COUNT DISTINCT semantics).
    */
  /** Dedup-aware bottom-k buffer: keeps the k SMALLEST DISTINCT longs
    * per group. This is what makes the documented shuffle bound true —
    * a plain TopK buffer keeps duplicates (forcing a corpus-wide
    * `.distinct()` exchange first), while this one dedups inside the
    * map-side partial, so the exchange carries ≤ k hashes per
    * (partition, group) no matter how many duplicate values the corpus
    * holds.
    *
    * Buffer is a MUTABLE array with a cached worst (max) value (kryo —
    * it crosses the wire once per partition-group): the previous
    * immutable `Seq` (List) paid O(k) node-hops per index inside O(k)
    * scans — O(k²) per row, which at k=64 over a corpus made the
    * SKETCH aggregation the dominant cost (measured 8.5 s → <1 s at
    * sf0.1; the same disease TopK had). Hot path now: a hash ≥ the
    * cached worst rejects in ONE comparison — the common case once the
    * buffer holds the true bottom-k (a duplicate of a kept hash below
    * the worst still pays one O(k) array scan).
    */
  private[operators] final class BottomBuf(val k: Int) extends Serializable {
    val arr = new Array[Long](k)
    var n = 0
    var worst = Long.MinValue // valid max-of-buffer once n == k
  }

  private class BottomKDistinct(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, BottomBuf, Seq[Long]] {
    private def rescan(b: BottomBuf): Unit = {
      var m = Long.MinValue
      var i = 0
      while (i < b.n) { if (b.arr(i) > m) m = b.arr(i); i += 1 }
      b.worst = m
    }
    private def contains(b: BottomBuf, h: Long): Boolean = {
      var i = 0
      while (i < b.n) { if (b.arr(i) == h) return true; i += 1 }
      false
    }
    override def zero: BottomBuf = new BottomBuf(k)
    override def reduce(b: BottomBuf, h: Long): BottomBuf = {
      if (b.n < k) {
        if (!contains(b, h)) {
          b.arr(b.n) = h; b.n += 1
          if (h > b.worst) b.worst = h
        }
      } else if (h < b.worst && !contains(b, h)) {
        // replace the worst slot, recompute the cached max
        var i = 0
        while (b.arr(i) != b.worst) i += 1
        b.arr(i) = h
        rescan(b)
      } // h >= worst: cannot enter a full bottom-k buffer — O(1) reject
      b
    }
    override def merge(a: BottomBuf, b: BottomBuf): BottomBuf = {
      var i = 0
      while (i < b.n) { reduce(a, b.arr(i)); i += 1 }
      a
    }
    override def finish(buf: BottomBuf): Seq[Long] =
      buf.arr.take(buf.n).sorted.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[BottomBuf] =
      org.apache.spark.sql.Encoders.kryo[BottomBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def kmvDistinctByKey(
      df: DataFrame, key: Column, value: Column, k: Int): DataFrame =
    kmvEstimate(kmvSketchByKey(df, key, value, k), k)

  /** The KMV sketch itself: one row per key with `mins` = the k
    * smallest DISTINCT h60 hashes of the key's values, sorted
    * ascending. This is the PERSISTABLE form of the bottom-k family —
    * write it as parquet per increment (per day, per source), then
    * [[kmvMergeSketches]] unions increments WITHOUT re-scanning their
    * corpora: bottom-k-distinct is a semilattice, so
    * merge(sketch(A), sketch(B)) is BIT-IDENTICAL to sketch(A ∪ B)
    * (q23's oracle replays exactly that equivalence). Each sketch row
    * is ≤ k longs — increments ship kilobytes, not corpora.
    */
  def kmvSketchByKey(
      df: DataFrame, key: Column, value: Column, k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 for a finite-variance estimate, got $k")
    val hashed = df
      .filter(value.isNotNull)
      .select(key.as("key"), Hashing.h60(value.cast("string")).as("h"))
    // bottom-k distinct in ONE aggregate — no corpus-wide distinct()
    // exchange; the buffer dedups map-side (see [[BottomKDistinct]])
    hashed
      .groupBy("key")
      .agg(udaf(new BottomKDistinct(k),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
        .apply(col("h")).as("mins"))
  }

  /** Merge per-increment sketches down to one sketch per `key`:
    * bottom-k distinct of the union of the `mins` arrays, as pure
    * column algebra (each input row is ≤ k longs, so the collect_list
    * is bounded by increments × k per key — never corpus-sized).
    */
  def kmvMergeSketches(
      sketches: DataFrame, key: Column, mins: Column, k: Int): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3 for a finite-variance estimate, got $k")
    sketches.groupBy(key.as("key"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(mins)))), 1, k)
        .as("mins"))
  }

  /** Estimator tail shared by the one-shot and the merged forms —
    * single owner of the estimate arithmetic so the q22/q23 oracles
    * replay one formula: exact under k, `(k−1)·2^60 / kth_hash` at
    * capacity.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.select(
      col("key"),
      size(col("mins")).as("n_kept"),
      // mins sorted ascending; last entry = the k-th smallest
      element_at(col("mins"), size(col("mins"))).as("kth_hash"),
      col("mins"))
      .select(
        col("key"),
        col("n_kept"),
        col("kth_hash"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(
            // greatest(…, 1): h60 CAN be exactly 0 (15 leading md5 hex
            // zeros, p = 2^-60) and ANSI division by zero would kill the
            // job; the clamp trades one pathological estimate for
            // liveness and the oracle mirrors it
            (lit((k - 1).toDouble) * lit(1152921504606846976.0)) /
              greatest(col("kth_hash"), lit(1L)).cast("double"))
          .as("est_distinct"))
}
