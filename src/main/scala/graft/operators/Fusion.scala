package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — merge N
  * ranked retrieval runs (e.g. a [[Bm25]] lexical leg and an [[Ann]]
  * dense leg) into one consensus ranking:
  * `rrf(d) = Σ_runs 1 / (c + rank_run(d))`, documents absent from a
  * run contribute nothing. Rank-only fusion deliberately ignores the
  * runs' incomparable score scales (BM25 micro-units vs cosine), which
  * is exactly why it is the standard hybrid-search combiner.
  *
  * Contributions are rounded to integer micro-units per (run, doc)
  * BEFORE the sum, so fusion is order-independent and exactly
  * replayable by the oracle (`ROUND(1e6 / (c + rank))` — pure
  * exactly-rounded IEEE ops, no libm). The fused top-k goes through
  * the k-buffer [[TopK]] aggregator like every other ranking tail.
  *
  * Scale: each run is already a top-k' per query (bounded rows per
  * query), so the union + groupBy shuffles ≤ Σ k' rows per query —
  * fusion cost is ∝ the runs' output, never the corpus.
  */
object Fusion {

  /** The hybrid SERVING verb: one call answers a (text, embedding)
    * query batch from TWO persisted indexes — the bucket-pruned
    * lexical index ([[Bm25.queryLexIndex]]) and the cell-pruned ANN
    * index ([[Ann.queryIvfIndex]]) — and fuses the legs by reciprocal
    * rank. This is the deployment shape of hybrid search at 100 TB:
    * neither leg scans its corpus (both reads are partition-pruned to
    * the batch's vocabulary buckets / probed cells), the fusion cost
    * is ∝ the legs' top-`kPerLeg` output, and the whole pipeline is
    * one lazy plan per leg plus the [[rrf]] tail.
    *
    * `queries` carries BOTH modalities per query id (qText for the
    * lexical leg, qVec for the dense leg); a query with a zero-norm
    * vector still gets lexical contributions and vice versa — absence
    * from a leg simply contributes nothing, the standard RRF
    * convention. With `nprobe` ≥ the index's nlist the dense leg is
    * EXHAUSTIVE over live cells and bit-equal to
    * [[Ann.knnBruteForce]], which is what lets the r06 oracle replay
    * the persisted composition against the one-shot r02 pipeline
    * verbatim; production serving dials nprobe back down for the
    * recall/cost trade. `eligible` pre-filters the dense leg (the v14
    * contract) for metadata-gated retrieval.
    */
  def hybridTopK(
      spark: org.apache.spark.sql.SparkSession,
      lexPath: String, annPath: String,
      queries: DataFrame,
      qId: org.apache.spark.sql.Column,
      qText: org.apache.spark.sql.Column,
      qVec: org.apache.spark.sql.Column,
      k: Int, kPerLeg: Int = 20, nprobe: Int = 4, c: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      eligible: Option[(DataFrame, org.apache.spark.sql.Column)] = None): DataFrame = {
    require(kPerLeg >= 1, s"per-leg top-k requires kPerLeg >= 1, got $kPerLeg")
    val q = queries.select(qId.as("q_id"), qText.as("qtext"), qVec.as("qvec"))
    val lex = Bm25.queryLexIndex(
      spark, lexPath, q, col("q_id"), col("qtext"), kPerLeg, k1, b)
      .select("q_id", "doc_id", "rank")
    val dense = Ann.queryIvfIndex(
      spark, annPath, q, col("q_id"), col("qvec"), kPerLeg, nprobe, eligible)
      .select(col("q_id"), col("b_id").as("doc_id"), col("rank"))
    rrf(Seq(lex, dense), k, c)
  }

  /** Fuse ranked runs, each a frame with columns
    * `(q_id, doc_id, rank)` (1-based ranks; extra columns are
    * dropped). Returns `(q_id, doc_id, rank, rrf_micro)`, the top `k`
    * per query by (rrf desc, doc_id asc).
    */
  def rrf(runs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame =
    rrfWeighted(runs.map(r => (r, 1L)), k, c)

  /** [[rrf]] with a per-run INTEGER weight — the production hybrid
    * knob ("trust the dense leg 2× the lexical leg while the BM25
    * params are retuned"). Each run's micro contribution is
    * `w · round(1e6 / (c + rank))`: the weight multiplies AFTER the
    * rounding, so weighted fusion stays order-independent and exactly
    * replayable, and `w = 1` for every run is bit-identical to the
    * unweighted form (the r02/r06 oracles gate that path). Integer
    * weights rather than doubles for the same reason scores are
    * micro-units: no float summation anywhere in the fusion. Relative
    * precision beyond integers is a non-goal — RRF's c-constant
    * already dominates fine-grained weight tuning (per the original
    * paper, results are remarkably insensitive to these knobs).
    */
  def rrfWeighted(runs: Seq[(DataFrame, Long)], k: Int, c: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrf requires at least one run")
    require(k >= 1, s"top-k requires k >= 1, got $k")
    require(c >= 0, s"rrf constant must be >= 0, got $c")
    require(runs.forall(_._2 >= 1), "run weights must be >= 1")
    val contribs = runs
      .map { case (r, w) => r.select(col("q_id"), col("doc_id"),
        (lit(w) * round(lit(1000000.0) / (lit(c) + col("rank")).cast("double")).cast("long"))
          .as("c_micro")) }
      .reduce(_ union _)
    val fused = contribs
      .groupBy("q_id", "doc_id")
      .agg(sum(col("c_micro")).as("rrf_micro"))
    TopK.perGroup(fused, Seq("q_id"), col("rrf_micro"), col("doc_id"), k)
      .select(col("q_id"), col("id").as("doc_id"), col("rank"),
        col("metric").as("rrf_micro"))
  }
}
