package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical top-k search — the sparse-retrieval complement to the
  * [[Ann]] family (a training-data pipeline needs BOTH: dense ANN for
  * semantic neighbors, lexical relevance for decontamination probes,
  * more-like-this expansion, and hybrid fusion — see [[Fusion]]).
  *
  * Shape, not a search server: one corpus scan builds query-vocabulary
  * postings (the inverted-index join), corpus statistics ride a
  * broadcast one-row frame, and the per-term BM25 contributions are
  * rounded to integer micro-units BEFORE the per-document sum — so the
  * grouped aggregation is order-independent (bit-stable under any
  * partitioning / AQE replan) and the DuckDB oracle can replay the
  * whole pipeline exactly. Top-k per query goes through the k-buffer
  * [[TopK]] aggregator (map-side partial top-k, shuffle ≤ k rows per
  * partition-group, no Window sort of the full candidate stream).
  *
  * Scale posture (100 TB corpus, query batch ≪ corpus):
  *  - ONE wide scan of the corpus (tokenize + explode); the explode is
  *    immediately semi-joined against the BROADCAST query vocabulary,
  *    so the postings shuffle carries only rows for terms someone
  *    asked about — ∝ matched postings, never ∝ corpus tokens.
  *  - document frequencies aggregate over that restricted postings
  *    frame (vocabulary-sized result, broadcast back).
  *  - nothing here collects to the driver; corpus scalars (N, Σdl)
  *    are a 1-row agg joined in by broadcast.
  *
  * Reference anchor: the reference's name/content search surface
  * (/root/reference/src/file_indexing_system.py:246-272) is exact
  * predicate match; ranked lexical relevance is part of the
  * LLM-pipeline mandate (curation/decontamination probes), scored with
  * the standard BM25 formulation (Robertson/Sparck Jones; the
  * ln(1 + (N-df+0.5)/(df+0.5)) idf is the Lucene-style positive form).
  */
object Bm25 {

  /** Analyzer: lowercase, maximal `[a-z0-9]+` runs. Deliberately the
    * simplest exactly-replayable analyzer (DuckDB twin:
    * `regexp_extract_all(lower(text), '[a-z0-9]+')` — see
    * [[graft.queries.SearchQueries]]); punctuation and unicode word
    * characters fall out, which is the right default for the synthetic
    * corpus and keeps the oracle byte-exact.
    */
  def analyze(text: Column): Column =
    regexp_extract_all(lower(coalesce(text, lit(""))), lit("[a-z0-9]+"), lit(0))

  /** Per-term BM25 contribution in integer micro-units. All operands
    * double, the expression TREE mirrored token-for-token by the oracle
    * SQL (IEEE ops are exactly rounded, so an identical tree is an
    * identical double; `ln` is the one libm call — boundary-safe after
    * the 1e6 rounding, verified empirically by the exact-compare gate).
    */
  private def contribMicro(
      tf: Column, df: Column, dl: Column,
      nDocs: Column, totalTokens: Column, k1: Double, b: Double): Column = {
    val tfD = tf.cast("double")
    val dfD = df.cast("double")
    val dlD = dl.cast("double")
    val nD = nDocs.cast("double")
    val avgdl = totalTokens.cast("double") / nD
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val tfn = tfD * (lit(k1) + lit(1.0)) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / avgdl))
    round(idf * tfn * lit(1000000.0)).cast("long")
  }

  /** Top-k BM25 search: `queries` is a (qId, qText) batch — each query
    * is analyzed to a DISTINCT term set (bag-of-words weight 1, the
    * short-query convention), scored against `docs`, and the k best
    * documents per query returned as
    * `(q_id, doc_id, rank, score_micro)` with rank 1-based by
    * (score desc, doc_id asc). Documents sharing no term with a query
    * do not appear; a query with k' < k matches returns k' rows.
    *
    * The query batch is assumed bounded (it rides broadcast joins —
    * the same contract as the ANN probe frames); the corpus side is
    * unbounded.
    */
  def searchTopK(
      docs: DataFrame, docId: Column, text: Column,
      queries: DataFrame, qId: Column, qText: Column,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"top-k requires k >= 1, got $k")
    val toks = docs
      .select(docId.as("doc_id"), analyze(text).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    // corpus scalars as a broadcast 1-row frame — keeps the operator
    // fully lazy (no driver action) and re-usable under one cache scope
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
    val qt = queries.select(
      qId.as("q_id"), explode(array_distinct(analyze(qText))).as("term"))
    val vocab = qt.select("term").distinct()
    // inverted-index postings, restricted to the query vocabulary AT
    // THE SCAN: the broadcast semi-join fires before the groupBy, so
    // only matched (term, doc) pairs ever shuffle
    val post = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(vocab), Seq("term"), "left_semi")
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    val dft = post.groupBy("term").agg(count(lit(1)).as("df"))
    val scores = post
      .join(broadcast(dft), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"),
        contribMicro(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("total_tokens"), k1, b).as("c_micro"))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("c_micro")).as("score_micro"))
    TopK.perGroup(scores, Seq("q_id"), col("score_micro"), col("doc_id"), k)
      .select(col("q_id"), col("id").as("doc_id"), col("rank"),
        col("metric").as("score_micro"))
  }
}
