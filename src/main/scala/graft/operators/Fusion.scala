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

  /** Fuse ranked runs, each a frame with columns
    * `(q_id, doc_id, rank)` (1-based ranks; extra columns are
    * dropped). Returns `(q_id, doc_id, rank, rrf_micro)`, the top `k`
    * per query by (rrf desc, doc_id asc).
    */
  def rrf(runs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrf requires at least one run")
    require(k >= 1, s"top-k requires k >= 1, got $k")
    require(c >= 0, s"rrf constant must be >= 0, got $c")
    val contribs = runs
      .map(_.select(col("q_id"), col("doc_id"),
        round(lit(1000000.0) / (lit(c) + col("rank")).cast("double"))
          .cast("long").as("c_micro")))
      .reduce(_ union _)
    val fused = contribs
      .groupBy("q_id", "doc_id")
      .agg(sum(col("c_micro")).as("rrf_micro"))
    TopK.perGroup(fused, Seq("q_id"), col("rrf_micro"), col("doc_id"), k)
      .select(col("q_id"), col("id").as("doc_id"), col("rank"),
        col("metric").as("rrf_micro"))
  }
}
