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

  // ------------------------------------------------------------------ //
  // Heavy hitters (Misra–Gries + exact verify)                         //
  // ------------------------------------------------------------------ //

  /** Misra–Gries summary state: ≤ k (item → count) counters plus the
    * total row count seen. Counters are a bounded map — the classic
    * frequency-estimation guarantee is that after processing n rows,
    * every item with true frequency > n/(k+1) still holds a counter,
    * whatever the arrival or merge order (Misra & Gries 1982; merge
    * bound per Agarwal et al., "Mergeable Summaries", PODS'12).
    */
  private[operators] final class MgBuf(val k: Int) extends Serializable {
    val m = new scala.collection.mutable.HashMap[String, Long]()
    var total = 0L
  }

  /** The aggregator's finish shape: the surviving candidate items
    * (sorted for stable display; the GUARANTEE is about membership,
    * not order) and the exact total row count from the same pass.
    */
  case class MgSummary(candidates: Seq[String], total: Long)

  private class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, MgBuf, MgSummary] {
    override def zero: MgBuf = new MgBuf(k)
    override def reduce(b: MgBuf, key: String): MgBuf = {
      b.total += 1L
      val cur = b.m.getOrElse(key, 0L)
      if (cur > 0L || b.m.size < k) b.m.update(key, cur + 1L)
      else {
        // full and absent: the decrement-all sweep (the incoming item's
        // implicit count of 1 is decremented away with the rest). Each
        // sweep retires k+1 units of count, so it amortizes to O(1)
        // map operations per row.
        val dead = new scala.collection.mutable.ArrayBuffer[String]()
        b.m.foreach { case (key2, c) =>
          if (c == 1L) dead += key2 else b.m.update(key2, c - 1L)
        }
        dead.foreach(b.m.remove)
      }
      b
    }
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      b.m.foreach { case (key2, c) => a.m.update(key2, a.m.getOrElse(key2, 0L) + c) }
      a.total += b.total
      if (a.m.size > k) {
        // reduce back to ≤ k counters by subtracting the (k+1)-th
        // largest count from every counter and keeping the strictly
        // positive ones — the merge rule that preserves the n/(k+1)
        // survival bound across arbitrary merge trees
        val counts = a.m.values.toArray
        java.util.Arrays.sort(counts)
        val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
        val dead = new scala.collection.mutable.ArrayBuffer[String]()
        a.m.foreach { case (key2, c) =>
          if (c - sub <= 0L) dead += key2 else a.m.update(key2, c - sub)
        }
        dead.foreach(a.m.remove)
      }
      a
    }
    override def finish(buf: MgBuf): MgSummary =
      MgSummary(buf.m.keys.toSeq.sorted, buf.total)
    override def bufferEncoder: org.apache.spark.sql.Encoder[MgBuf] =
      org.apache.spark.sql.Encoders.kryo[MgBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[MgSummary] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgSummary]()
  }

  /** One-pass Misra–Gries candidate summary over `key` (cast to
    * string; nulls excluded): ≤ k candidate items, guaranteed to
    * include EVERY item with true frequency > total/(k+1). The partial
    * buffers carry ≤ k counters per partition — the aggregation ships
    * kilobytes to one reducer regardless of key cardinality, which is
    * the whole point: a plain `groupBy(key).count()` to find hot keys
    * shuffles every distinct key, and on a skewed 100 TB corpus the
    * hot-key QUESTION is exactly when that shuffle is dangerous.
    */
  def frequentCandidates(df: DataFrame, key: Column, k: Int): MgSummary = {
    require(k >= 1, s"Misra-Gries needs k >= 1, got $k")
    val row = df
      .filter(key.isNotNull)
      .select(key.cast("string").as("key"))
      .agg(udaf(new MisraGries(k), org.apache.spark.sql.Encoders.STRING)
        .apply(col("key")).as("s"))
      .select(col("s.candidates"), col("s.total"))
      .head()
    MgSummary(row.getSeq[String](0), row.getLong(1))
  }

  /** EXACT heavy hitters above the canonical Misra–Gries threshold
    * n/(k+1), sketch-pruned: pass 1 runs [[frequentCandidates]] (one
    * scan, ≤ k counters shuffled); pass 2 exactly counts ONLY the ≤ k
    * candidate keys (the IN-list is a pushed parquet filter, so the
    * second scan skips with row-group stats, and the groupBy shuffles
    * ≤ k keys). Because MG guarantees the candidate set is a SUPERSET
    * of the true heavy hitters, the verified output is exactly
    * `{key : count(key) > n/(k+1)}` with exact counts — deterministic
    * and oracle-replayable even though the intermediate candidate set
    * is merge-order dependent (q24 gates this end to end).
    *
    * This is the skew detector that sizes
    * [[ScaleJoins.saltedJoin]]'s bucket count: run it on the join key
    * before committing a shuffle strategy, and salt exactly the keys
    * it returns.
    */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    val mg = frequentCandidates(df, key, k)
    val thresh = mg.total.toDouble / (k + 1).toDouble
    // candidates come back as strings; round-trip them to the key's
    // native type where that's exact (integral/string/boolean keys —
    // the categorical shapes hot keys actually take) so the IN-list is
    // a PUSHED parquet filter (In(key, …)) instead of a post-scan
    // predicate over cast(key as string). Other types keep the cast
    // comparison — still correct, just not skippable at the row group.
    import org.apache.spark.sql.types._
    val keyType = df.select(key).schema.head.dataType
    val typed: Option[Seq[Any]] = keyType match {
      case LongType    => Some(mg.candidates.map(_.toLong))
      case IntegerType => Some(mg.candidates.map(_.toInt))
      case ShortType   => Some(mg.candidates.map(_.toShort))
      case ByteType    => Some(mg.candidates.map(_.toByte))
      case StringType  => Some(mg.candidates)
      case BooleanType => Some(mg.candidates.map(_.toBoolean))
      case _           => None
    }
    val pruned = typed match {
      case Some(vals) => df.filter(key.isNotNull && key.isin(vals: _*))
      case None => df.filter(key.isNotNull &&
        key.cast("string").isin(mg.candidates: _*))
    }
    pruned
      .select(key.cast("string").as("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > thresh)
      .withColumn("n_total", lit(mg.total))
      .withColumn("share", col("cnt").cast("double") / col("n_total").cast("double"))
      .orderBy(desc("cnt"), asc("key"))
  }

  // ------------------------------------------------------------------ //
  // Sample quantiles (bottom-k hash row sample)                        //
  // ------------------------------------------------------------------ //

  /** Bottom-k (hash, value) pair buffer — the [[BottomBuf]] discipline
    * without the distinct check (the hash input is a unique row id, so
    * pairs never repeat): mutable arrays, cached lexicographic-worst
    * slot, O(1) reject once full.
    */
  private[operators] final class PairBuf(val k: Int) extends Serializable {
    val hs = new Array[Long](k)
    val vs = new Array[Long](k)
    var n = 0
    var wi = -1 // index of the lexicographically largest (h, v); valid once n == k
  }

  private class BottomKPairs(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Long, Long), PairBuf, Seq[(Long, Long)]] {
    private def lt(h1: Long, v1: Long, h2: Long, v2: Long): Boolean =
      h1 < h2 || (h1 == h2 && v1 < v2)
    private def rescanWorst(b: PairBuf): Unit = {
      var w = 0
      var i = 1
      while (i < b.n) {
        if (lt(b.hs(w), b.vs(w), b.hs(i), b.vs(i))) w = i
        i += 1
      }
      b.wi = w
    }
    override def zero: PairBuf = new PairBuf(k)
    override def reduce(b: PairBuf, p: (Long, Long)): PairBuf = {
      if (b.n < k) {
        b.hs(b.n) = p._1; b.vs(b.n) = p._2; b.n += 1
        if (b.n == k) rescanWorst(b)
      } else if (lt(p._1, p._2, b.hs(b.wi), b.vs(b.wi))) {
        b.hs(b.wi) = p._1; b.vs(b.wi) = p._2
        rescanWorst(b)
      } // not smaller than the worst kept pair: O(1) reject
      b
    }
    override def merge(a: PairBuf, b: PairBuf): PairBuf = {
      var i = 0
      while (i < b.n) { reduce(a, (b.hs(i), b.vs(i))); i += 1 }
      a
    }
    override def finish(buf: PairBuf): Seq[(Long, Long)] = {
      val pairs = (0 until buf.n).map(i => (buf.hs(i), buf.vs(i)))
      pairs.sortBy(identity)
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[PairBuf] =
      org.apache.spark.sql.Encoders.kryo[PairBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Per-key quantile estimates from a DETERMINISTIC uniform row
    * sample: hash a unique row id with [[Hashing.h60]], keep the k
    * rows with the smallest hashes per key (a uniform sample — the
    * hash order is independent of the value), and read nearest-rank
    * quantiles off the sorted sample. `n` is the exact group size from
    * the same single pass; groups under k rows keep EVERYTHING, so
    * their quantiles are exact.
    *
    * Why not `approx_percentile`? Same argument as [[kmvSketchByKey]]
    * vs HLL++: Spark's Greenwald–Khanna summary is engine-internal and
    * merge-order sensitive, so it can only be tolerance-checked. The
    * bottom-k row sample is a pure function of the (id, value) set —
    * the DuckDB oracle replays sample membership, the selection rule,
    * and a sample fingerprint bit-for-bit (q25), and the statistical
    * contract (rank error ≈ √(ln(2/δ)/2k) by DKW on the sample) is
    * spec-pinned separately.
    *
    * Scale shape: the pair buffer dedups nothing but bounds everything
    * — ≤ k (hash, value) pairs per (partition, key) cross the wire, so
    * a 100 TB corpus ships megabytes per key group. Values are read as
    * longs (integer-valued metrics: char/token counts, money cents —
    * exact cross-engine arithmetic); `qs` are percentile fractions in
    * [0, 1], emitted as `p<percent>` columns.
    */
  def sampleQuantilesByKey(
      df: DataFrame, key: Column, id: Column, value: Column,
      k: Int, qs: Seq[Double]): DataFrame = {
    require(k >= 2, s"sample quantiles need k >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile fractions must be in [0, 1], got $qs")
    val hashed = df
      .filter(id.isNotNull && value.isNotNull)
      .select(key.as("key"), Hashing.h60(id.cast("string")).as("h"),
        value.cast("long").as("v"))
    val agg = hashed
      .groupBy("key")
      .agg(
        count(lit(1)).as("n"),
        udaf(new BottomKPairs(k),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
          .apply(col("h"), col("v")).as("pairs"))
    // sample values sorted ascending; nearest-rank-lower selection.
    // Ties in v make every admissible tiebreak return the same v, so
    // the OUTPUT is deterministic even though the v-sort alone isn't.
    val vals = array_sort(transform(col("pairs"), p => p.getField("_2")))
    val m = size(col("pairs"))
    val sel = qs.map { q =>
      val name = s"p${math.round(q * 100)}"
      element_at(vals,
        (floor(lit(q) * (m - lit(1)).cast("double")) + lit(1)).cast("int"))
        .as(name)
    }
    val fp = md5(concat_ws(",", transform(col("pairs"),
      p => concat_ws(":", p.getField("_1").cast("string"),
        p.getField("_2").cast("string"))))).as("sample_fp")
    agg.select(col("key") +: col("n") +: m.as("m_sample") +: sel :+ fp: _*)
  }
}
