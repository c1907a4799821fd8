package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    *
    * Rate-map keys match against `stratum.cast("string")` — ONE
    * canonical representation shared with [[temperatureMix]]'s
    * grouping, so a non-string stratum column (decimal, timestamp,
    * double) cannot silently fall through to the default rate because
    * a `===`-with-string implicit cast disagreed with the map key's
    * toString. CALLER CONTRACT for non-string strata: spell map keys
    * in Spark's cast-string canonical form (a DOUBLE 2 is `"2.0"`,
    * not `"2"`; a timestamp is its session-zone ISO form) — the
    * previous `===` numeric coercion accepted loose spellings for
    * SOME types while silently defaulting others, which is exactly
    * the ambiguity the single canonical form removes. Keys that
    * CANNOT be canonical for the stratum's resolved type (a key `"2"`
    * against a DOUBLE stratum, whose canonical form is `"2.0"`) are
    * rejected loudly at call time — a driver-only round-trip through
    * Spark's own cast, no corpus scan — so a loose-spelling caller
    * discovers the contract instead of silently sampling every row of
    * that stratum at `defaultRate`. A key that is well-formed but
    * matches no observed stratum (a typo'd category string) is NOT
    * detectable without an extra full-corpus pass and stays the
    * caller's responsibility.
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
    val clash = df.columns.toSet.intersect(Set("__strat_key", "__strat_thr"))
    require(clash.isEmpty,
      s"input column(s) collide with stratifiedSample scratch names: ${clash.toSeq.sorted.mkString(", ")}")
    requireCanonicalRateKeys(df, stratum, rates.keys.toSeq)
    val sNorm = stratum.cast("string")
    if (rates.size <= CaseLookupMax) {
      val threshold = rates.foldLeft(lit((defaultRate * Modulus).toLong)) {
        case (acc, (k, r)) => when(sNorm === lit(k), lit((r * Modulus).toLong)).otherwise(acc)
      }
      df.filter(sampleKey(id, salt) < threshold)
    } else {
      // machine-sized rate maps (temperatureMix over a 10^5-domain
      // stratum) take the broadcast-threshold-join form — the
      // mixtureSampleAt switch, for the same reason: a 10^5-branch
      // CASE is a codegen hazard (method-size blowup, superlinear
      // compile), while a broadcast hash lookup is O(1) per row at any
      // map size. LEFT join: unmatched strata ride defaultRate, the
      // CASE form's otherwise-arm.
      val spark = df.sparkSession
      import spark.implicits._
      val thrDf = rates.toSeq
        .map { case (k, r) => (k, (r * Modulus).toLong) }
        .toDF("__strat_key", "__strat_thr")
      df.join(broadcast(thrDf), sNorm === col("__strat_key"), "left")
        .filter(sampleKey(id, salt) <
          coalesce(col("__strat_thr"), lit((defaultRate * Modulus).toLong)))
        .drop("__strat_key", "__strat_thr")
    }
  }

  /** Loud canonical-form gate for [[stratifiedSample]]'s rate-map
    * keys: each key must survive a round-trip through Spark's own
    * cast into the stratum's RESOLVED type and back to string
    * unchanged (`"2"` against a DOUBLE stratum comes back `"2.0"` —
    * refused; an uncastable key comes back null — refused). The
    * round-trip is evaluated over `range(1)` — a driver-local one-row
    * job, never a corpus scan — so the check is free at any scale. A
    * string stratum is skipped: every key is trivially canonical
    * there, and catching a typo'd-but-well-formed key would need a
    * full observed-strata pass.
    */
  private def requireCanonicalRateKeys(
      df: DataFrame, stratum: Column, keys: Seq[String]): Unit = {
    if (keys.isEmpty) return
    val dt = df.select(stratum).schema.head.dataType
    if (dt == org.apache.spark.sql.types.StringType) return
    val spark = df.sparkSession
    // chunked: a machine-sized map (10^5 temperatureMix strata) as ONE
    // select would pay superlinear analysis on a 10^5-column row
    val roundTripped = keys.grouped(256).flatMap { chunk =>
      spark.range(1)
        // try_cast, not cast: under ANSI mode a malformed key would
        // THROW with a bare CAST_INVALID_INPUT instead of reaching the
        // contract-naming message below
        .select(chunk.map(k => lit(k).try_cast(dt).cast("string")): _*)
        .head().toSeq.map(Option(_).map(_.toString))
    }.toSeq
    val bad = keys.zip(roundTripped).collect {
      case (k, rt) if !rt.contains(k) =>
        s""""$k" (canonical: ${rt.fold("uncastable")(c => s""""$c"""")})"""
    }
    require(bad.isEmpty,
      s"stratifiedSample rate keys ${bad.mkString(", ")} are not in the " +
        s"stratum's ($dt) cast-string canonical form and would silently " +
        "sample at defaultRate -- spell keys exactly as " +
        "stratum.cast(\"string\") renders them (a DOUBLE 2 is \"2.0\")")
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

  /** Temperature-weighted source mixing — the `p_s ∝ n_s^α` rule LLM
    * data recipes use to keep a dominant stratum from drowning the
    * rest (α = 1 reproduces the natural distribution, α → 0
    * equalizes; multilingual pipelines run α ≈ 0.3–0.7). The expected
    * kept count per stratum is `T · n_s^α / Σ_t n_t^α`, i.e. the
    * per-row keep rate `min(1, T · n_s^(α−1) / Σ_t n_t^α)` — computed
    * here from the OBSERVED stratum counts (one aggregate, ≤ #strata
    * driver rows) and applied through [[stratifiedSample]]'s
    * hash-threshold membership, so the draw stays deterministic,
    * retry-stable, and oracle-replayable.
    *
    * Determinism of the rates themselves: `Σ n_t^α` is a strict fold
    * in stratum-key order (nulls last — the DuckDB `LIST(… ORDER BY)`
    * convention the c12 oracle mirrors). At the default α = 0.5 every
    * operation is IEEE-exact (sqrt, ·, /, min), so the oracle
    * reproduces each rate BIT-identically; other α go through
    * `math.pow`, which is not correctly-rounded — cross-engine replay
    * then rides the 1e-6 threshold quantization (same posture as the
    * r01 `ln` terms), fine in practice but only α = 0.5 is
    * hash-gated.
    *
    * A null stratum participates like any other (its rate rides the
    * `defaultRate` slot of [[stratifiedSample]]).
    */
  def temperatureMix(
      df: DataFrame, stratum: Column, id: Column,
      targetDocs: Long, alpha: Double = 0.5, salt: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetDocs >= 0, s"targetDocs must be >= 0, got $targetDocs")
    // group on the SAME cast("string") canonicalization the rate map
    // is matched with — the grouped value IS the Spark cast result, so
    // map keys and filter predicate agree by construction for any
    // stratum type
    val counts = df.groupBy(stratum.cast("string").as("__s")).count()
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
      // strict fold order: stratum key ascending, null LAST (DuckDB's
      // LIST(... ORDER BY) default, so the oracle folds identically)
      .sortBy { case (k, _) => (k.isEmpty, k.getOrElse("")) }
    val powN: Long => Double =
      if (alpha == 0.5) n => math.sqrt(n.toDouble)
      else n => math.pow(n.toDouble, alpha)
    val s = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + powN(n) }
    def rate(n: Long): Double = {
      val r =
        if (alpha == 0.5) targetDocs.toDouble / (math.sqrt(n.toDouble) * s)
        else targetDocs.toDouble * math.pow(n.toDouble, alpha - 1.0) / s
      math.min(r, 1.0)
    }
    val named = counts.collect { case (Some(k), n) => k -> rate(n) }.toMap
    val dflt = counts.collectFirst { case (None, n) => rate(n) }.getOrElse(1.0)
    stratifiedSample(df, stratum, id, named, dflt, salt)
  }

  /** Deterministic train/val/test split + k-fold assignment — the
    * reproducibility backbone of every training pipeline: the same doc
    * lands in the same split on every machine, every re-run, every
    * engine, with NO coordination (no global sort, no persisted
    * assignment table). Split membership is the hash-threshold rule
    * ([[sampleKey]] over `splitSalt`): cumulative fraction thresholds
    * over `h mod M` partition the key space into len(fractions)
    * disjoint bands. The fold id is an INDEPENDENT hash draw
    * (`foldSalt`, pmod k), so folds stratify uniformly WITHIN each
    * split rather than correlating with it.
    *
    * Scale shape: one narrow projection — two md5s per row, no
    * shuffle, no state; the assignment column then rides any
    * downstream partitioning for free. This is why hash-splits beat
    * `randomSplit` at corpus scale: Spark's randomSplit is
    * per-partition seeded (layout-dependent — a repartition reshuffles
    * the split) and resamples on task retry; h(id) depends on the row
    * alone.
    *
    * `fractions` are (name, weight) in declaration order; weights are
    * normalized (they need not sum to 1) and each band is exact to
    * 1/M = 1e-6. The LAST band absorbs the rounding remainder so the
    * bands tile the full key space. A NULL id hashes to a null key and
    * gets null split/fold — visibly unassigned rather than silently
    * dumped into one band; filter or synthesize ids first.
    */
  def assignSplits(
      df: DataFrame,
      id: Column,
      fractions: Seq[(String, Double)],
      kFolds: Int,
      splitSalt: String,
      foldSalt: String): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._1).distinct.size == fractions.size,
      "split fractions must be nonempty with distinct names")
    require(fractions.forall(_._2 > 0.0), "split weights must be positive")
    require(kFolds >= 1, s"kFolds must be >= 1, got $kFolds")
    // refuse, don't clobber: a frame that already carries split/fold
    // (re-assigning with a new salt while the old assignment is
    // attached) must rename first — withColumn would silently replace
    val clash = df.columns.toSet.intersect(Set("split", "fold"))
    require(clash.isEmpty,
      s"input already has ${clash.toSeq.sorted.mkString("/")} column(s) -- rename them first")
    val cums = splitBounds(fractions)
    val key = sampleKey(id, splitSalt)
    val split = fractions.map(_._1).zip(cums).reverse
      .foldLeft(lit(null).cast("string")) {
        case (acc, (name, bound)) => when(key < bound, lit(name)).otherwise(acc)
      }
    df.withColumn("split", split)
      .withColumn("fold",
        pmod(Hashing.h60(concat(lit(foldSalt + ":"), id.cast("string"))),
          lit(kFolds.toLong)).cast("int"))
  }

  /** Per-stratum quota cap — "at most `cap` docs per domain/source",
    * the curation rule that stops a single crawled host from dominating
    * a mixture. Selection is DETERMINISTIC: the `cap` rows with the
    * smallest sample keys ([[sampleKey]], doc-id tiebreak) win, so
    * re-runs, engines, and incremental refreshes agree on the same
    * survivors (and a different `salt` draws an independent quota).
    *
    * Exact AND skew-proof via two-level top-N: a plain
    * `row_number() OVER (PARTITION BY stratum)` ships every row of a
    * hot stratum to ONE task — the 10⁸-doc domain is precisely the row
    * this operator exists for. Instead, phase 1 ranks within
    * (stratum, bucket) where bucket = h(id) mod `nBuckets` (partitions
    * are stratum-size/nBuckets) and keeps `cap` per bucket; phase 2
    * ranks the ≤ nBuckets·cap survivors per stratum. This is exact by
    * the standard argument: any row outside its bucket's top-`cap`
    * has ≥ cap bucket-mates ranked above it, all of whom also rank
    * above it stratum-wide, so it cannot be in the stratum's top-`cap`.
    */
  def capPerStratum(
      df: DataFrame, stratum: Column, id: Column,
      cap: Int, salt: String, nBuckets: Int = 32): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val scratch = Set("__skey", "__bkt", "__rn1", "__rn2")
    val clash = df.columns.toSet.intersect(scratch)
    require(clash.isEmpty,
      s"input column(s) collide with capPerStratum scratch names: ${clash.toSeq.sorted.mkString(", ")}")
    // null-id guard, the prioritySample discipline: a null id hashes to
    // a NULL sort key, which Spark asc orders FIRST — null-id rows
    // would hijack ranks 1..cap nondeterministically (all-null keys
    // give row_number an arbitrary order), displacing every real row
    // and breaking the operator's determinism contract. Guard-first on
    // the Add so the assertion cannot be short-circuited by the null
    // it rejects; the coalesce is never null and adds exact 0.
    val guard = coalesce(
      assert_true(id.isNotNull,
        lit("capPerStratum: null id -- a hash-keyed quota cannot " +
          "arbitrate rows without identity; filter or synthesize ids first"))
        .cast("long"),
      lit(0L))
    val key = guard + sampleKey(id, salt)
    val keyed = df.withColumn("__skey", key)
      .withColumn("__bkt", pmod(Hashing.h60(concat(lit("bkt:"), id.cast("string"))),
        lit(nBuckets.toLong)))
    val ord = Seq(col("__skey").asc, id.asc)
    val w1 = Window.partitionBy(stratum, col("__bkt")).orderBy(ord: _*)
    val w2 = Window.partitionBy(stratum).orderBy(ord: _*)
    keyed
      .withColumn("__rn1", row_number().over(w1)).filter(col("__rn1") <= cap)
      .withColumn("__rn2", row_number().over(w2)).filter(col("__rn2") <= cap)
      .drop("__skey", "__bkt", "__rn1", "__rn2")
  }

  /** Priority sampling per stratum (Duffield–Lund–Thorup, "Priority
    * sampling for estimation of arbitrary subset sums", JACM 54(6),
    * 2007): keep the k rows with the LARGEST priorities q_i = w_i/u_i
    * in each stratum, u_i a hash-uniform in (0, 1]; the (k+1)-th
    * priority τ makes ŵ_i = max(w_i, τ) an unbiased estimator of any
    * subset sum over the stratum. This is the weighted-selection shape
    * a curation pipeline wants when "keep k docs per source, biased
    * toward weight (tokens, quality), but keep corpus statistics
    * estimable from the sample alone".
    *
    * Determinism discipline: u_i = (h60(salt:id)+1)/2^60 and the sort
    * key is key_i = (h+1)/w — one long→double cast per operand and ONE
    * IEEE division, bit-identical in any engine (q desc ⟺ key asc), so
    * a DuckDB oracle replays membership, ranks, τ = 2^60/key_(k+1),
    * and every HT weight exactly; the id tiebreak pins the order even
    * at double-key collisions. No rand(), no transcendentals — the
    * [[sampleKey]] argument extended to weighted draws.
    *
    * Scale shape: the per-stratum rank runs the [[capPerStratum]]
    * two-level discipline — a bucketed row_number caps each (stratum,
    * bucket) at k+1, the stratum-level window then sees ≤
    * nBuckets·(k+1) rows — so a hot stratum never funnels its whole
    * corpus through one task. Weight validation rides the key column
    * itself (an `assert_true` folded into an exact `+0.0`, the e07
    * range-join guard pattern): null / non-positive / non-numeric /
    * fractional weights fail the job loudly in the same pass — a null
    * weight would silently vanish from its stratum, a fractional one
    * would flap the priority order between engines — and the guard
    * costs no extra scan.
    *
    * Output per kept row: stratum, id, w (the long weight), rnk
    * (1-based, priority desc), tau (0.0 when the stratum has ≤ k rows
    * — everything kept, estimator exact), ht_w = max(w, τ).
    */
  def prioritySample(
      df: DataFrame, stratum: Column, id: Column, weight: Column,
      k: Int, salt: String, nBuckets: Int = 32): DataFrame =
    priorityEstimate(
      priorityCapped(df, stratum, id, weight, k, salt, nBuckets), k)

  /** The PERSISTABLE per-increment form of [[prioritySample]]: one row
    * per kept candidate — `(stratum, id, w, skey)`, the k+1
    * smallest-key (= largest-priority) rows per stratum — ready for a
    * sample lake (stamp increments however the pipeline shards; rows
    * must PARTITION across increments, the [[Sketches.pairSampleByKey]]
    * contract). DLT priority samples over row-disjoint increments merge
    * by re-ranking the POOLED keys and recomputing τ from the merged
    * (k+1)-th ([[mergePrioritySamples]]): any row in the union's top
    * k+1 priorities is in its own increment's top k+1 (priorities are
    * per-row, independent of the split), so the pooled candidates are a
    * superset of the one-shot candidate set and the merged sample —
    * ranks, τ, and every HT weight — is BIT-identical to the one-shot,
    * the same semilattice argument as the pair buffer. ≤ k+1 rows × 3
    * longs + 1 double per (stratum, increment): kilobytes whatever the
    * corpus.
    */
  def prioritySketch(
      df: DataFrame, stratum: Column, id: Column, weight: Column,
      k: Int, salt: String, nBuckets: Int = 32): DataFrame =
    priorityCapped(df, stratum, id, weight, k, salt, nBuckets)
      .select(col("stratum"), col("id"), col("w"), col("__key").as("skey"))

  /** Merge per-increment priority sketches ([[prioritySketch]] rows)
    * down to one sample per stratum WITHOUT re-scanning any corpus:
    * re-rank the pooled `(skey, id)` pairs per stratum, keep k+1,
    * recompute τ from the merged (k+1)-th key — bit-identical to the
    * one-shot [[prioritySample]] over the union (see
    * [[prioritySketch]] for the superset argument). The pooled frame is
    * ≤ increments × (k+1) rows per stratum — never corpus-sized — so
    * the single stratum-keyed window needs no bucketing here.
    */
  def mergePrioritySamples(samples: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w2 = Window.partitionBy(col("stratum"))
      .orderBy(col("__key").asc, col("id").asc)
    priorityEstimate(
      samples.select(col("stratum"), col("id"), col("w"),
        col("skey").as("__key"))
        .withColumn("rnk", row_number().over(w2))
        .filter(col("rnk") <= k + 1),
      k)
  }

  /** The guarded, two-level-bucketed candidate selection shared by the
    * one-shot and persistable forms: rows (stratum, id, w, __key, rnk)
    * with rnk ≤ k+1 per stratum, key ascending (priority descending).
    */
  private def priorityCapped(
      df: DataFrame, stratum: Column, id: Column, weight: Column,
      k: Int, salt: String, nBuckets: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val wL = weight.cast("long")
    // id.isNotNull: a null id would hash to a NULL sort key, which
    // Spark orders NULLS FIRST — the row would silently take rank 1 in
    // its stratum (and flap vs engines that order nulls last); reject
    // it in the same guard as the weight classes
    val good = id.isNotNull && weight.isNotNull && wL.isNotNull && wL > 0 &&
      wL.cast("double") === weight.cast("double")
    // assert_true is NULL on pass; coalesce→0.0 keeps the key exact
    // (key > 0 always, so 0.0+ is the identity) while making the guard
    // un-prunable — it lives inside the consumed sort key. The guard
    // must be the LEFT operand: Add's codegen short-circuits on a null
    // left, so `key + guard` would skip the guard exactly on the null
    // weights it exists to reject; the coalesce is never null, so
    // guard-first forces both sides to evaluate on every row.
    val guard = coalesce(
      assert_true(good, concat(lit("prioritySample: null id or null/"),
        lit("non-positive/non-numeric/fractional weight at id="),
        coalesce(id.cast("string"), lit("NULL")),
        lit(" weight="),
        coalesce(weight.cast("string"), lit("NULL")))).cast("double"),
      lit(0.0))
    val h = Hashing.h60(concat(lit(salt + ":"), id.cast("string")))
    val key = guard + (h + lit(1L)).cast("double") / wL.cast("double")
    val base = df.select(
      stratum.as("stratum"), id.as("id"), wL.as("w"), key.as("__key"),
      pmod(Hashing.h60(concat(lit("bkt:"), id.cast("string"))),
        lit(nBuckets.toLong)).as("__bkt"))
    val ord = Seq(col("__key").asc, col("id").asc)
    val w1 = Window.partitionBy(col("stratum"), col("__bkt")).orderBy(ord: _*)
    val w2 = Window.partitionBy(col("stratum")).orderBy(ord: _*)
    // k+1 everywhere: the (k+1)-th row IS τ; consumed twice (τ + kept)
    base
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k + 1)
      .withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= k + 1)
      .drop("__rn1", "__bkt")
  }

  /** Estimator tail shared by the one-shot and merged forms (the
    * [[Sketches.quantilesFromSample]] discipline): τ from the (k+1)-th
    * key, HT weights over the kept k.
    */
  private def priorityEstimate(capped0: DataFrame, k: Int): DataFrame = {
    val capped = Dedup.scopedCache(capped0)
    val tau = capped.filter(col("rnk") === k + 1)
      .select(col("stratum"),
        (lit(1.152921504606846976e18) / col("__key")).as("__tau"))
    capped.filter(col("rnk") <= k)
      // ≤ 1 row per stratum on the build side; build-RIGHT of a left
      // outer join is a broadcastable side (the c21 hint lesson)
      .join(broadcast(tau), Seq("stratum"), "left")
      .select(col("stratum"), col("id"), col("w"), col("rnk"),
        coalesce(col("__tau"), lit(0.0)).as("tau"),
        greatest(col("w").cast("double"), coalesce(col("__tau"), lit(0.0)))
          .as("ht_w"))
  }

  /** Per-source integer sampling thresholds that hit an explicit
    * TARGET MIXTURE under a token budget — the recipe step LLM
    * pipelines run when the mix is prescribed ("50% web, 30% wiki,
    * 20% books of a 1T-token budget") rather than derived from counts
    * ([[temperatureMix]] owns that case). For each recipe source:
    * target tokens `D_s = (wNum_s·budget) div wDen_s`, and the
    * acceptance threshold `min(M, (D_s·M) div T_s)` over the observed
    * available tokens `T_s` — i.e. the exact integer form of rate
    * `min(1, D_s/T_s)`, floor semantics throughout, so an oracle
    * replays every threshold from the same aggregates. A recipe
    * source absent from the corpus yields threshold 0 (visible
    * shortfall, never a crash); weights are exact RATIONALS and must
    * sum to exactly 1 (BigInt cross-multiplication — doubles would
    * make "sums to 1" flap at the boundary).
    *
    * Driver-side on ≤ recipe-size inputs; BigInt internally, so
    * `budget·M` cannot overflow at real corpus scale (2.5e13 tokens ×
    * 1e6 is past Long.Max — measured-class bug, not hypothetical).
    *
    * Returns (source, tTarget, threshold) in recipe order.
    */
  def mixtureThresholds(
      availTokens: Map[String, Long],
      weights: Seq[(String, (Long, Long))],
      budgetTokens: Long): Seq[(String, Long, Long)] = {
    require(weights.nonEmpty, "mixture recipe is empty")
    require(budgetTokens >= 1, s"token budget must be >= 1, got $budgetTokens")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in the mixture recipe: ${weights.map(_._1).mkString(", ")}")
    weights.foreach { case (s, (num, den)) =>
      require(num >= 0 && den > 0,
        s"weight for $s must be a non-negative rational with positive " +
          s"denominator, got $num/$den")
    }
    // Σ num_i/den_i == 1 exactly ⇔ Σ num_i·(L/den_i) == L for the
    // common multiple L = Π den_i (BigInt — no overflow, no rounding)
    val l = weights.map(w => BigInt(w._2._2)).product
    val sum = weights.map { case (_, (num, den)) => BigInt(num) * (l / den) }.sum
    require(sum == l,
      s"mixture weights must sum to exactly 1, got $sum/$l")
    weights.map { case (s, (num, den)) =>
      val tTarget = (BigInt(num) * budgetTokens / den).toLong
      val tAvail = availTokens.getOrElse(s, 0L)
      require(tAvail >= 0, s"negative available tokens for $s: $tAvail")
      val thr =
        if (tAvail == 0L) 0L
        else (BigInt(tTarget) * Modulus / tAvail).min(BigInt(Modulus)).toLong
      (s, tTarget, thr)
    }
  }

  /** Observed per-source token totals for [[mixtureThresholds]] — one
    * aggregate over the recipe-filtered corpus, ≤ recipe-size driver
    * rows. Null or negative token counts among recipe rows are
    * rejected loudly IN THE SAME PASS (sum would silently skip nulls,
    * under-counting T_s and over-sampling the source).
    */
  def mixtureAvail(
      df: DataFrame, source: Column, tokens: Column,
      recipeSources: Seq[String]): Map[String, Long] = {
    // probe the CAST column, the one SUM actually folds — same
    // discipline as PageRank.prepare's weight probe: a non-numeric
    // token string casts to NULL (sum skips it silently) and a
    // fractional one floors (sum truncates it silently); both
    // under-count T_s and inflate every threshold downstream
    val tokL = tokens.cast("long")
    val rows = df
      .filter(source.isin(recipeSources: _*))
      .groupBy(source.as("__src"))
      .agg(
        sum(tokL).as("__t"),
        count(when(
          tokens.isNull || tokL.isNull || tokL < 0 ||
            tokL.cast("double") =!= tokens.cast("double"),
          lit(1))).as("__bad"))
      .collect()
    val bad = rows.filter(_.getLong(2) > 0).map(_.getString(0))
    require(bad.isEmpty,
      s"null/negative/non-numeric/fractional token counts in recipe source(s): ${bad.sorted.mkString(", ")}")
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** The sampled rows for a mixture recipe: hash-threshold membership
    * (`sampleKey(id) < threshold_source`), deterministic and
    * retry-stable like every draw in this module. Rows from sources
    * outside the recipe are excluded BY the recipe (that is what a
    * prescribed mix means); the summary shape belongs to the caller
    * (c21 reports target/available/kept per source).
    */
  def mixtureSample(
      df: DataFrame, source: Column, id: Column, tokens: Column,
      weights: Seq[(String, (Long, Long))],
      budgetTokens: Long, salt: String): DataFrame =
    mixtureSampleAt(df, source, id,
      mixtureThresholds(
        mixtureAvail(df, source, tokens, weights.map(_._1)),
        weights, budgetTokens),
      salt)

  /** The membership primitive behind [[mixtureSample]], split out so a
    * caller that already computed the thresholds (c21 reports them in
    * its summary) does not pay the availability aggregate twice.
    *
    * The threshold lookup has two result-identical forms, switched on
    * recipe size: a folded CASE for a recipe's natural size (a
    * human-prescribed mixture is tens of sources — stays inside
    * whole-stage codegen, no join at all), and a broadcast equi-join
    * against the threshold table for machine-generated "recipes" past
    * [[CaseLookupMax]] entries — a 10⁴-branch CASE is a codegen
    * hazard (method-size blowup, compile-time superlinear in
    * branches), while a broadcast hash join is O(1) per row at any
    * recipe size. Both forms filter to recipe sources and apply the
    * SAME `sampleKey(id) < threshold` predicate.
    */
  def mixtureSampleAt(
      df: DataFrame, source: Column, id: Column,
      thresholds: Seq[(String, Long, Long)], salt: String): DataFrame = {
    // [[mixtureThresholds]] already enforces this, but this is an
    // independent public entry: a duplicate source would make the two
    // forms DIVERGE (CASE keeps each row once under the last threshold;
    // the join would emit one output row per duplicate entry)
    require(thresholds.map(_._1).distinct.size == thresholds.size,
      s"duplicate sources in thresholds: ${thresholds.map(_._1).mkString(", ")}")
    if (thresholds.size <= CaseLookupMax) {
      val thrCol = thresholds.foldLeft(lit(0L)) { case (acc, (s, _, thr)) =>
        when(source === lit(s), lit(thr)).otherwise(acc)
      }
      df.filter(source.isin(thresholds.map(_._1): _*))
        .filter(sampleKey(id, salt) < thrCol)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      // the inner join IS the recipe-membership filter; broadcast is
      // honorable (inner join, build side explicit) and the table is
      // recipe-size by construction
      val thrDf = thresholds.map { case (s, _, thr) => (s, thr) }
        .toDF("__mix_src", "__mix_thr")
      df.join(broadcast(thrDf), source === col("__mix_src"))
        .filter(sampleKey(id, salt) < col("__mix_thr"))
        .drop("__mix_src", "__mix_thr")
    }
  }

  /** CASE-vs-join switch point for [[mixtureSampleAt]]: recipes at or
    * under this stay a folded CASE (codegen-friendly, zero join);
    * larger ones become a broadcast threshold-table join.
    */
  private[graft] val CaseLookupMax = 100

  /** Integer band upper bounds for [[assignSplits]]:
    * cum_i = floor(M · (w_1+…+w_i)/Σw), with the last bound forced to
    * M so the bands tile the whole key space. Exposed so an oracle twin
    * derives the SAME thresholds from the same doubles (0.8·M is not
    * 800000 exactly in binary — both sides must floor the same value).
    */
  private[graft] def splitBounds(fractions: Seq[(String, Double)]): Seq[Long] = {
    val total = fractions.map(_._2).sum
    fractions.inits.toSeq.reverse.tail
      .map(p => (Modulus * (p.map(_._2).sum / total)).toLong)
      .dropRight(1) :+ Modulus
  }
}
