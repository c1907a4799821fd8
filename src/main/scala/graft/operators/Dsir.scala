package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents that LOOK LIKE a target
  * domain by importance weights between two cheap hashed bag-of-words
  * language models, then resample with the Gumbel top-k trick so the
  * selection is a weighted sample, not a hard head (a hard head is
  * brittle: it keeps only the most target-like slice and collapses
  * diversity; Gumbel perturbation keeps the selection distribution
  * proportional to the importance weights).
  *
  * Model: tokens hash into `buckets` feature buckets ([[Hashing.h60]]
  * mod B — the md5 hash every oracle can replay); each corpus reduces
  * to ONE count row per occupied bucket (≤ B rows, broadcastable at
  * any corpus size — the [[LangModel]] posture). The per-document
  * log-weight under add-one smoothing is
  *   log w(x) = Σ_tokens ln[(ct(b)+1)/(Nt+B)] − ln[(cr(b)+1)/(Nr+B)]
  * with each token's term computed as ONE `ln` of a ratio and rounded
  * to integer MICRO-nats before the per-document sum — the repo's
  * standard trick (BM25, t09) that makes the grouped sum
  * order-independent and the whole pipeline bit-replayable by a DuckDB
  * oracle.
  *
  * Resampling: key(x) = lw_micro(x) + gumbel_micro(x) and take the
  * top k keys. The Gumbel noise is DETERMINISTIC — u derives from
  * `h60(salt:doc_id)` folded to 50 bits so (u = (h%2^50 + 0.5)/2^50)
  * is EXACT double arithmetic, strictly inside (0,1), and
  * g = −ln(−ln(u)) is finite; task retries and re-runs select the
  * same set, and changing `salt` draws an independent sample (the
  * [[Sampling]] discipline applied to weighted selection).
  *
  * Scale shape: count fits are one explode-aggregate pass each
  * (map-side partials absorb hot buckets — the aggregate is the skew
  * absorber); scoring joins the two ≤ B-row count tables back as
  * BROADCASTS, so the corpus-side token stream never repartitions by
  * token key and hot-token join skew cannot exist; the final top-k is
  * an `orderBy.limit` that plans as TakeOrderedAndProject (per-partition
  * k-buffers + one k-row driver merge — never a full sort). At the
  * 100 TB deployment the two count tables are the MODEL: fit once on
  * the target sample and a raw-corpus sample, then daily selection
  * jobs pay one narrow scoring pass.
  *
  * Reference anchor: quality gating in
  * `/root/reference/src/audit/pipeline.py` filters documents by static
  * heuristics; DSIR is the corpus-relative upgrade of that gate a
  * training-data pipeline runs at scale.
  */
object Dsir {

  private val Micro = 1000000.0

  /** 2^50 — the Gumbel seed keeps 50 hash bits so `h + 0.5` and the
    * division are EXACT in double (no rounding at the 2^60 edge where
    * `u` could collapse to 1.0 and the double-log blow up).
    */
  private val GumbelRange = 1L << 50

  /** Hashed bag-of-words counts — the DSIR feature LM. ≤ `buckets`
    * rows of (bucket, cnt): bounded, broadcastable, persistable.
    */
  def hashedCounts(docs: DataFrame, text: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    docs.select(Text.tokens(Text.normalize(text)).as("toks"))
      .filter(col("toks").isNotNull)
      .select(explode(col("toks")).as("tok"))
      .select(pmod(Hashing.h60(col("tok")), lit(buckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Per-document importance log-weight in micro-nats:
    * (doc_id, n_tokens, lw_micro). Documents with no tokens (null or
    * blank text) report n_tokens = 0, lw_micro = 0 — neutral weight,
    * still eligible for selection by Gumbel noise alone.
    *
    * Both count frames must be [[hashedCounts]] outputs fit at the SAME
    * `buckets` (the bucket spaces must agree for the joins to mean
    * anything); totals Nt/Nr are ≤ B-row aggregations — driver scalars
    * that are part of the model, like the bigram LM's vocabulary size.
    */
  def logWeights(
      raw: DataFrame,
      id: Column,
      text: Column,
      targetCounts: DataFrame,
      rawCounts: DataFrame,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = raw.select(id.as("doc_id"), Text.tokens(Text.normalize(text)).as("toks"))
    val toks = base
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"),
        pmod(Hashing.h60(col("tok")), lit(buckets.toLong)).as("bucket"))
    weightsCore(base, toks, targetCounts, rawCounts, buckets)
  }

  /** Shared scoring core over a prepared (doc_id, toks) frame and its
    * bucketed token stream — single owner of the smoothing arithmetic
    * so [[logWeights]] and [[selectByPredicate]] cannot drift.
    */
  private def weightsCore(
      base: DataFrame,
      stream: DataFrame,
      targetCounts: DataFrame,
      rawCounts: DataFrame,
      buckets: Int): DataFrame = {
    val nt = targetCounts.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
    val nr = rawCounts.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)

    // counts broadcast — the corpus stream keeps its partitioning (no
    // token-keyed shuffle, no hot-bucket join skew; see scaladoc). A
    // bucket unseen in either fit coalesces to 0 and add-one smoothing
    // carries it, so the left joins cannot drop a token.
    val tc = targetCounts.select(col("bucket"), col("cnt").as("ct"))
    val rc = rawCounts.select(col("bucket"), col("cnt").as("cr"))
    val terms = stream.select("doc_id", "bucket")
      .join(broadcast(tc), Seq("bucket"), "left")
      .join(broadcast(rc), Seq("bucket"), "left")
      .select(col("doc_id"),
        // ONE ln of a ratio (not a difference of lns): identical IEEE
        // op order in the DuckDB replay, and micro-rounding absorbs
        // any sub-ulp libm disagreement
        round(log(
          ((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) * lit((nr + buckets).toDouble)) /
            ((coalesce(col("cr"), lit(0L)).cast("double") + lit(1.0)) * lit((nt + buckets).toDouble)))
          * lit(Micro)).cast("long").as("t_micro"))

    val perDoc = terms.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("t_micro").as("lw_micro"))

    base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("lw_micro"), lit(0L)).as("lw_micro"))
  }

  /** Deterministic Gumbel top-k over [[logWeights]] output: adds
    * gumbel_micro and key_micro = lw_micro + gumbel_micro, returns the
    * k largest keys (ties broken by doc_id — a total order, so the
    * selected SET is unique). Plans as TakeOrderedAndProject: no full
    * sort at any corpus size.
    */
  def resampleTopK(weights: DataFrame, k: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    // u ∈ (0,1) strictly, from 50 exact hash bits; g = −ln(−ln(u))
    val h = Hashing.h60(concat(lit(salt + ":"), col("doc_id").cast("string")))
    val u = (pmod(h, lit(GumbelRange)).cast("double") + lit(0.5)) / lit(GumbelRange.toDouble)
    val g = round(-log(-log(u)) * lit(Micro)).cast("long")
    weights
      .withColumn("gumbel_micro", g)
      .withColumn("key_micro", col("lw_micro") + col("gumbel_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** The composed verb: fit both hashed LMs, weight the raw corpus,
    * Gumbel-top-k select. `target` is typically a small curated frame
    * (the domain you want more of); `raw` is the corpus being mined.
    */
  def select(
      raw: DataFrame,
      id: Column,
      text: Column,
      target: DataFrame,
      targetText: Column,
      buckets: Int,
      k: Int,
      salt: String): DataFrame = {
    val tc = hashedCounts(target, targetText, buckets)
    val rc = hashedCounts(raw, text, buckets)
    resampleTopK(logWeights(raw, id, text, tc, rc, buckets), k, salt)
  }

  /** Persist a [[hashedCounts]] LM — ≤ `buckets` count rows plus one
    * meta row (bucket = −1 carrying the bucket count), kilobytes, one
    * write. The fit/transform split the 100 TB deployment runs: fit
    * the target LM once on the curated corpus, persist, and daily
    * selection jobs load it instead of re-reading the target.
    */
  def saveCounts(
      spark: org.apache.spark.sql.SparkSession,
      counts: DataFrame, buckets: Int, path: String): Unit = {
    require(buckets > 0, "buckets must be positive")
    counts.select(col("bucket"), col("cnt"))
      .unionByName(spark.range(1)
        .select(lit(-1L).as("bucket"), lit(buckets.toLong).as("cnt")))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted counts LM, returning (counts, buckets). Refuses
    * loudly a lake without exactly one meta row (half-written) or with
    * a bucket outside the declared feature space (fit at a different
    * bucket count — scoring against it would silently mis-smooth).
    */
  def loadCounts(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, Int) = {
    val df = spark.read.parquet(path).select("bucket", "cnt")
    val metas = df.filter(col("bucket") === -1L).collect()
    require(metas.length == 1,
      s"$path is not a complete DSIR counts lake (${metas.length} meta rows, " +
        "want 1) -- refusing a half-written model; re-run saveCounts")
    val buckets = metas.head.getLong(1).toInt
    val bad = df.filter(col("bucket") >= buckets).count()
    require(bad == 0,
      s"$path holds $bad buckets outside [0, $buckets) -- lake was fit at a " +
        "different bucket count; refusing")
    (df.filter(col("bucket") >= 0), buckets)
  }

  /** [[select]] for the common case where the target IS a predicate
    * over the raw corpus (curated sources, a language tag): tokenizes
    * and hashes the corpus ONCE — the bucketed token stream is
    * scoped-cached and shared by the target fit, the raw fit, and the
    * scoring join (3× fewer tokenize/md5 passes than composing
    * [[hashedCounts]] twice plus [[logWeights]]; the [[LangModel]]
    * shared-stream precedent). Result is bit-identical to
    * `select(raw, …, raw.filter(isTarget), …)`.
    */
  def selectByPredicate(
      raw: DataFrame,
      id: Column,
      text: Column,
      isTarget: Column,
      buckets: Int,
      k: Int,
      salt: String): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val base = Dedup.scopedCache(raw.select(
      id.as("doc_id"), isTarget.as("is_target"),
      Text.tokens(Text.normalize(text)).as("toks")))
    val stream = Dedup.scopedCache(base
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .select(col("doc_id"), col("is_target"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("is_target"),
        pmod(Hashing.h60(col("tok")), lit(buckets.toLong)).as("bucket")))
    val tc = stream.filter(col("is_target"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val rc = stream.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    resampleTopK(weightsCore(base, stream, tc, rc, buckets), k, salt)
  }
}
