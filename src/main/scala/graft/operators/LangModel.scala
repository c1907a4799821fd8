package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-fit n-gram language-model scoring — the CCNet-style quality
  * signal (Wenzek et al., LREC'20: filter/bucket web text by LM
  * perplexity): documents whose token transitions are typical of the
  * corpus score high, gibberish and boilerplate-mangled text score
  * low. This is the modeling step up from [[graft.functions.Text]]'s
  * closed-form ratios (t03/t06/t07): the score depends on CORPUS
  * statistics, not just the document.
  *
  * Model: add-one-smoothed bigram LM fit on the scored corpus itself.
  *   P(w₂|w₁) = (c(w₁,w₂) + 1) / (c(w₁,·) + V)
  * with V the distinct-unigram vocabulary size. Per-document score is
  * the mean log-likelihood over its bigrams (log-perplexity negated) —
  * each bigram's ln term rounds to integer MICRO-units before the
  * per-document sum, the repo's standard trick (BM25, RRF) that makes
  * the grouped sum order-independent and the whole pipeline (counts →
  * smoothing → ln → sum) bit-replayable by the t09 DuckDB oracle.
  *
  * Scale shape: one explode pass builds the bigram stream (shuffle ∝
  * corpus tokens — the same cost envelope as the d02 posting lists);
  * counts aggregate map-side (a hot bigram collapses to ONE partial
  * row per partition — the aggregate is the skew absorber); scoring
  * then joins the count tables back as BROADCASTS. The counts ARE the
  * model — one aggregated row per distinct bigram, vocabulary-bounded
  * — so broadcasting them means the corpus-side bigram stream NEVER
  * repartitions by token key and hot-bigram join skew cannot exist at
  * any corpus size (PlanSpec pins this shape). This matters doubly
  * because the shuffle-join alternative is NOT rescued by AQE: its
  * count side plans as aggregate-over-reused-partitioning, and an
  * aggregate between the shuffle stage and the SMJ makes
  * OptimizeSkewedJoin's pattern structurally inapplicable (verified
  * empirically — the earlier "AQE handles it" claim was wrong). A
  * corpus whose OBSERVED bigram vocabulary outgrows broadcast capacity
  * needs a pruned persisted model first (the CCNet setting; the
  * fit/transform split every quantizer in this repo uses). At the
  * 100 TB deployment the count tables are the MODEL one fit job
  * persists while daily scoring jobs only pay the join. The tokenized
  * stream and the bigram stream are SCOPED-cached (the shingle-frame
  * precedent): each has multiple consumers (counts + V + scoring /
  * count fit + score join), and the tokenize→zip_with explode is an
  * interpreted-HOF pipeline expensive enough that recomputing it per
  * consumer costs more than the cache (measured 3.7 → 1.6 s at
  * sf0.1); [[graft.operators.Dedup.scoped]] bounds the cache's
  * lifetime, and MEMORY_AND_DISK eviction bounds its footprint.
  */
object LangModel {

  /** Per-document bigram log-likelihood: (doc_id, n_bigrams, ll_micro,
    * mean_ll). Documents with < 2 tokens (or null text) report
    * n_bigrams = 0, ll_micro = 0, mean_ll = null.
    */
  def bigramScore(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val base = Dedup.scopedCache(
      docs.select(id.as("doc_id"), Text.tokens(Text.normalize(text)).as("toks")))

    val pairs = Dedup.scopedCache(base
      .filter(col("toks").isNotNull && size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))

    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    // distinct-unigram vocabulary: one exact distinct-count job (the
    // scalar V is part of the model, like a quantizer's codebook)
    val v = base.filter(col("toks").isNotNull)
      .select(explode(col("toks")).as("w"))
      .agg(count_distinct(col("w"))).head().getLong(0)

    // every scored bigram came from this corpus, so the count joins
    // always match (inner joins cannot drop rows). Counts broadcast:
    // the corpus-side stream keeps its partitioning — no token-keyed
    // shuffle, no hot-bigram join skew (see the scale-shape scaladoc)
    val terms = pairs
      .join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .select(col("doc_id"),
        round(log(
          (col("c2").cast("double") + lit(1.0)) /
            (col("c1").cast("double") + lit(v.toDouble))) * lit(1000000.0))
          .cast("long").as("t_micro"))

    val perDoc = terms.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"), sum("t_micro").as("ll_micro"))

    base.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("ll_micro"), lit(0L)).as("ll_micro"),
        // back to NATS for the consumer-facing mean (the micro scale
        // exists only to make the sum order-independent) — a CCNet
        // perplexity cutoff applies to this column directly
        when(col("n_bigrams").isNotNull,
          (col("ll_micro").cast("double") / lit(1000000.0)) / col("n_bigrams").cast("double"))
          .as("mean_ll"))
  }
}
