package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}

/** Hashed-feature logistic-regression document classifier — the
  * GPT-3/CCNet-style QUALITY FILTER (Brown et al. 2020 §A: a linear
  * classifier trained "curated corpora = positive, raw crawl =
  * negative" scores every crawl document; FineWeb and CCNet run the
  * same shape). This is the LEARNED upgrade of the static heuristic
  * gate (t03 quality ratios): the decision boundary comes from labeled
  * corpus statistics, not hand-picked thresholds.
  *
  * Architecture follows the repo's quantizer-fit posture:
  *  - FIT runs full-batch gradient descent on a bounded deterministic
  *    hash sample (the [[Pca]]/[[Ann.sampleVectors]] discipline):
  *    per-document hashed bag-of-words features are built DISTRIBUTED
  *    (tokenize → h60-bucket → sparse count rows; the corpus is never
  *    collected raw). Each iteration's GRADIENT sums per-document
  *    contributions quantized to 1e-12 fixed point (Long) — integer
  *    addition is exact and commutative, so the sum is bit-identical
  *    in any order, over any partitioning, on the driver or on the
  *    cluster (the [[graft.functions.Money]] integer-cents argument
  *    applied to GD). Small samples collect once and iterate
  *    driver-side; past `distributeOver` docs the SAME arithmetic runs
  *    as one `treeAggregate` per iteration (per-partition Long
  *    partials, tree-combined) with the weight vector broadcast — the
  *    two paths produce bit-identical models, and only the driver-side
  *    WEIGHT UPDATE (a buckets-length double pass) is sequential.
  *    Duplicate doc ids cannot perturb the fit (order-independence),
  *    though the hash sample bound is in-expectation (~maxFit rows),
  *    mirroring Ann.sampleVectors' caveat.
  *  - The MODEL quantizes to integer micro-units (per-bucket w_micro,
  *    bias_micro) — kilobytes, broadcastable, persistable, and the
  *    published contract a DuckDB oracle replays exactly.
  *  - SCORING is one executor-side pass: tokens → buckets → broadcast
  *    join against the ≤ B-row weight table → per-doc LONG sum (order
  *    independent by construction) → sigmoid. The corpus never
  *    repartitions by token key (the [[LangModel]] skew-immune
  *    broadcast posture), and the hot path is codegen'd expressions.
  *
  * Features are length-normalized hashed token counts x_b = c_b / n
  * (plus an intercept), so the margin is
  *   m(doc) = bias + (Σ_tokens w[bucket(tok)]) / n
  * and with micro-quantized weights the token sum is an exact integer:
  *   m = bias_micro/1e6 + (s_micro/1e6)/n,  score = σ(m).
  */
object Classifier {

  private val Micro = 1000000.0

  /** Quantized logistic model: dense per-bucket micro-weights + bias.
    * `buckets` is part of the model — scoring must hash into the same
    * feature space the fit used.
    */
  case class LogRegModel(buckets: Int, biasMicro: Long, weightsMicro: Array[Long]) {
    require(weightsMicro.length == buckets, "weight table must cover every bucket")
  }

  /** Per-doc gradient arithmetic, shared verbatim by the driver loop
    * and the `treeAggregate` seqOp so the two fit paths cannot drift.
    * Contributions quantize to [[Scale]] fixed point before summing:
    * Long addition is exact and commutative, so the iteration gradient
    * is bit-identical in any accumulation order. `gq` is the
    * buckets+1-slot accumulator (slot `buckets` = bias). Each doc adds
    * at most 1.0 (= [[Scale]]) per slot, so the accumulator holds
    * [[MaxFitCap]] docs with an order of magnitude of Long headroom.
    */
  private[graft] object Grad extends Serializable {
    val Scale = 1e12

    def accumulate(
        w: Array[Double], b: Double, buckets: Int,
        y: Double, nTok: Long, ub: Array[Int], uc: Array[Long],
        gq: Array[Long]): Unit = {
      // the per-doc margin folds the doc's OWN pairs in bucket order
      // (sorted at feature construction) — bit-exact per doc, so the
      // quantized contribution is a pure function of (w, b, doc)
      var m = 0.0
      var i = 0
      while (i < ub.length) { m += w(ub(i)) * uc(i); i += 1 }
      val margin = b + (if (nTok > 0) m / nTok else 0.0)
      val err = 1.0 / (1.0 + math.exp(-margin)) - y
      gq(buckets) += math.round(err * Scale)
      i = 0
      while (i < ub.length) { gq(ub(i)) += math.round(err * uc(i) / nTok * Scale); i += 1 }
    }
  }

  /** Docs past which the fixed-point bias/weight accumulators could
    * overflow a Long (each doc adds ≤ 1e12 per slot; 8e6 × 1e12 keeps
    * ~10% headroom under Long.MaxValue).
    */
  private val MaxFitCap = 8000000L

  /** Fit by full-batch gradient descent on a bounded deterministic
    * sample. `label` must cast to 0.0/1.0 (null-label rows are
    * excluded from the fit); `l2` regularizes weights but not the
    * intercept. Deterministic: the sample is a pure function of the
    * (id, text, label) SET, and the fixed-point gradient sum
    * ([[Grad]]) is order-independent, so re-runs, repartitionings,
    * duplicate doc ids, and the driver-vs-distributed path choice all
    * produce the SAME model bit-for-bit. Samples expected to exceed
    * `distributeOver` docs iterate as one `treeAggregate` job per
    * iteration instead of collecting — set it to 0 to force the
    * cluster path, or above maxFit to force the driver path.
    */
  def fit(
      docs: DataFrame,
      id: Column,
      text: Column,
      label: Column,
      buckets: Int,
      maxFit: Long = 20000L,
      iters: Int = 200,
      lr: Double = 1.0,
      l2: Double = 1e-4,
      distributeOver: Long = 100000L): LogRegModel = {
    require(buckets > 0, "buckets must be positive")
    require(iters > 0 && lr > 0.0 && l2 >= 0.0, "bad GD hyperparameters")
    require(maxFit <= MaxFitCap,
      s"maxFit=$maxFit exceeds $MaxFitCap: the fixed-point gradient accumulator " +
        "would lose its Long overflow headroom")

    val base = docs
      .select(id.cast("string").as("doc_id"), label.cast("double").as("y"),
        Text.tokens(Text.normalize(text)).as("toks"))
      .filter(col("y").isNotNull)
    // cheap narrow count to size the sample fraction, then the same
    // hash filter every fit in this repo uses — deterministic, no
    // rand(). The bound is in-expectation (~maxFit rows survive).
    val total = base.select("doc_id").count()
    require(total > 0, "classifier fit needs at least one labeled document")
    val sampled =
      if (total > maxFit)
        base.filter(pmod(xxhash64(col("doc_id")), lit(total)) < lit(maxFit))
      else base
    // per-doc sparse hashed counts built DISTRIBUTED and run-length
    // encoded: a doc costs min(doc tokens, buckets) pairs, never raw
    // token count — a 100k-token document is ≤ `buckets` pairs
    val featRdd = sampled
      .select(col("doc_id"), col("y"), explode_outer(col("toks")).as("tok"))
      .select(col("doc_id"), col("y"),
        when(col("tok").isNotNull,
          pmod(Hashing.h60(col("tok")), lit(buckets.toLong))).as("bucket"))
      .groupBy("doc_id", "y", "bucket")
      .agg(count(col("bucket")).as("c")) // count(bucket): empty doc → c = 0
      .groupBy("doc_id", "y")
      .agg(collect_list( // collect_list drops nulls: empty doc → empty list
        when(col("bucket").isNotNull, struct(col("bucket"), col("c")))).as("bks"))
      .rdd
      .map { r =>
        val pairs = r.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getLong(0).toInt, p.getLong(1)))
          .sortBy(_._1) // fixed per-doc fold order keeps the margin bit-exact
        val y = r.getDouble(1)
        require(y == 0.0 || y == 1.0, s"labels must be 0/1, got $y")
        (y, pairs.map(_._2).sum, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
      }

    val w = new Array[Double](buckets)
    var b = 0.0
    def update(gq: Array[Long], n: Long): Unit = {
      b -= lr * (gq(buckets).toDouble / Grad.Scale) / n
      var k = 0
      while (k < buckets) {
        w(k) -= lr * ((gq(k).toDouble / Grad.Scale) / n + l2 * w(k)); k += 1
      }
    }

    if (math.min(total, maxFit) <= distributeOver) {
      // small sample: collect the RLE rows once, iterate driver-side
      val feats = featRdd.collect()
      val n = feats.length.toLong
      require(n > 0, "classifier fit needs at least one labeled document")
      var it = 0
      while (it < iters) {
        val gq = new Array[Long](buckets + 1)
        feats.foreach { case (y, nTok, ub, uc) =>
          Grad.accumulate(w, b, buckets, y, nTok, ub, uc, gq)
        }
        update(gq, n)
        it += 1
      }
    } else {
      // large sample: the SAME per-doc arithmetic as a per-iteration
      // treeAggregate — per-partition Long partials, tree-combined,
      // weights broadcast; only the buckets-length update runs on the
      // driver. Bit-identical to the collect path by the fixed-point
      // argument above.
      val sc = docs.sparkSession.sparkContext
      val cached = featRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = cached.count()
        require(n > 0, "classifier fit needs at least one labeled document")
        var it = 0
        while (it < iters) {
          val bw = sc.broadcast((w.clone(), b))
          try {
            val gq = cached.treeAggregate(new Array[Long](buckets + 1))(
              (acc, doc) => {
                Grad.accumulate(bw.value._1, bw.value._2, buckets,
                  doc._1, doc._2, doc._3, doc._4, acc)
                acc
              },
              (a, c) => {
                var i = 0
                while (i < a.length) { a(i) += c(i); i += 1 }
                a
              })
            update(gq, n)
          } finally bw.destroy()
          it += 1
        }
      } finally { cached.unpersist(blocking = false): Unit }
    }
    LogRegModel(buckets, math.round(b * Micro),
      w.map(x => math.round(x * Micro)))
  }

  /** Score documents with a (possibly loaded) model: one broadcast-join
    * pass. Output: (doc_id, n_tokens, s_micro, score_micro) where
    * s_micro = Σ_tokens w_micro[bucket] (an exact long — order
    * independent), and score_micro = round(1e6·σ(bias + (s/1e6)/n)).
    * Token-less documents (null/blank text) score at the intercept.
    */
  def scoreWith(
      spark: SparkSession,
      model: LogRegModel,
      docs: DataFrame,
      id: Column,
      text: Column): DataFrame = {
    import spark.implicits._
    val wDf = model.weightsMicro.zipWithIndex.collect {
      case (wm, bk) if wm != 0L => (bk.toLong, wm)
    }.toSeq.toDF("bucket", "w_micro")

    val base = docs.select(id.as("doc_id"), Text.tokens(Text.normalize(text)).as("toks"))
    val perDoc = base
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), pmod(Hashing.h60(col("tok")), lit(model.buckets.toLong)).as("bucket"))
      .join(broadcast(wDf), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("w_micro"), lit(0L))).as("s_micro"))

    val bias = model.biasMicro.toDouble / Micro
    base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("s_micro"), lit(0L)).as("s_micro"))
      .withColumn("score_micro",
        round(lit(Micro) / (lit(1.0) + exp(-(lit(bias) +
          when(col("n_tokens") > 0,
            (col("s_micro").cast("double") / lit(Micro)) / col("n_tokens").cast("double"))
            .otherwise(lit(0.0)))))).cast("long"))
  }

  /** Persist the quantized model — kilobytes, one write. Rows:
    * one `meta` (bucket = B), one `bias`, and a `w` row per NONZERO
    * weight bucket.
    */
  def saveModel(spark: SparkSession, model: LogRegModel, path: String): Unit = {
    import spark.implicits._
    val rows =
      Seq(("meta", model.buckets.toLong, 0L), ("bias", -1L, model.biasMicro)) ++
        model.weightsMicro.zipWithIndex.collect {
          case (wm, bk) if wm != 0L => ("w", bk.toLong, wm)
        }
    rows.toDF("kind", "bucket", "w_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted model, refusing a half-written lake loudly (a
    * missing meta/bias row or an out-of-range bucket would silently
    * change every score).
    */
  def loadModel(spark: SparkSession, path: String): LogRegModel = {
    val rows = spark.read.parquet(path)
      .select("kind", "bucket", "w_micro").collect()
    val metas = rows.filter(_.getString(0) == "meta")
    val biases = rows.filter(_.getString(0) == "bias")
    require(metas.length == 1 && biases.length == 1,
      s"$path is not a complete classifier model (need exactly one meta " +
        s"and one bias row; got ${metas.length}/${biases.length}) -- " +
        "refusing a half-written model; re-run saveModel")
    val buckets = metas.head.getLong(1).toInt
    val w = new Array[Long](buckets)
    rows.filter(_.getString(0) == "w").foreach { r =>
      val bk = r.getLong(1)
      require(bk >= 0 && bk < buckets,
        s"$path weight bucket $bk outside feature space [0, $buckets) -- " +
          "model was fit at a different bucket count; refusing")
      w(bk.toInt) = r.getLong(2)
    }
    LogRegModel(buckets, biases.head.getLong(2), w)
  }
}
