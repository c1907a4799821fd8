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
  *  - FIT is driver-side on a bounded deterministic hash sample
  *    (the [[Pca]]/[[Ann.sampleVectors]] discipline): per-document
  *    hashed bag-of-words features are built DISTRIBUTED (tokenize →
  *    h60-bucket → sparse count rows; the corpus is never collected),
  *    then ≤ maxFit sparse rows collect and full-batch gradient
  *    descent runs sequentially in canonical doc-id order — bit-
  *    deterministic across partitionings and re-runs, like every other
  *    model fit in this repo.
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

  /** Fit by full-batch gradient descent on a bounded deterministic
    * sample. `label` must cast to 0.0/1.0 (null-label rows are
    * excluded from the fit); `l2` regularizes weights but not the
    * intercept. Deterministic: the sample is a pure function of the
    * (id, text, label) SET, and the GD loop walks it in canonical
    * doc-id order with sequential double arithmetic.
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
      l2: Double = 1e-4): LogRegModel = {
    require(buckets > 0, "buckets must be positive")
    require(iters > 0 && lr > 0.0 && l2 >= 0.0, "bad GD hyperparameters")

    val base = docs
      .select(id.cast("string").as("doc_id"), label.cast("double").as("y"),
        Text.tokens(Text.normalize(text)).as("toks"))
      .filter(col("y").isNotNull)
    // cheap narrow count to size the sample fraction, then the same
    // hash filter every fit in this repo uses — deterministic, no rand()
    val total = base.select("doc_id").count()
    require(total > 0, "classifier fit needs at least one labeled document")
    val sampled =
      if (total > maxFit)
        base.filter(pmod(xxhash64(col("doc_id")), lit(total)) < lit(maxFit))
      else base
    // per-doc sparse hashed counts built DISTRIBUTED and run-length
    // encoded BEFORE the collect: the driver copy is bounded by
    // min(doc tokens, buckets) pairs per sampled doc, never by raw
    // token count — a 100k-token document costs ≤ `buckets` rows
    val feats = sampled
      .select(col("doc_id"), col("y"), explode_outer(col("toks")).as("tok"))
      .select(col("doc_id"), col("y"),
        when(col("tok").isNotNull,
          pmod(Hashing.h60(col("tok")), lit(buckets.toLong))).as("bucket"))
      .groupBy("doc_id", "y", "bucket")
      .agg(count(col("bucket")).as("c")) // count(bucket): empty doc → c = 0
      .groupBy("doc_id", "y")
      .agg(collect_list( // collect_list drops nulls: empty doc → empty list
        when(col("bucket").isNotNull, struct(col("bucket"), col("c")))).as("bks"))
      .collect()
      .map { r =>
        val pairs = r.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (p.getLong(0).toInt, p.getLong(1)))
          .sortBy(_._1) // fixed bucket order keeps gradient sums deterministic
        (Option(r.getString(0)).getOrElse(""), r.getDouble(1), pairs)
      }
      .sortBy(_._1) // canonical order: the fit is a function of the SET
      .map { case (_, y, pairs) =>
        require(y == 0.0 || y == 1.0, s"labels must be 0/1, got $y")
        (y, pairs.map(_._2).sum, pairs.map(_._1).toArray, pairs.map(_._2).toArray)
      }

    val n = feats.length
    // loud cost telegraph BEFORE the sequential loop: GD walks every
    // (doc, bucket) pair each iteration, single-threaded on the driver
    val nPairs = feats.iterator.map(_._3.length.toLong).sum
    if (nPairs * iters > 2000000000L)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"classifier fit will walk $nPairs feature pairs x $iters iterations " +
          "sequentially on the driver -- lower maxFit/iters (or distribute the " +
          "gradient) if this job stalls")
    val w = new Array[Double](buckets)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val gw = new Array[Double](buckets)
      var gb = 0.0
      feats.foreach { case (y, nTok, ub, uc) =>
        var m = 0.0
        var i = 0
        while (i < ub.length) { m += w(ub(i)) * uc(i); i += 1 }
        val margin = b + (if (nTok > 0) m / nTok else 0.0)
        val err = 1.0 / (1.0 + math.exp(-margin)) - y
        gb += err
        i = 0
        while (i < ub.length) { gw(ub(i)) += err * uc(i) / nTok; i += 1 }
      }
      b -= lr * gb / n
      var k = 0
      while (k < buckets) { w(k) -= lr * (gw(k) / n + l2 * w(k)); k += 1 }
      it += 1
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
