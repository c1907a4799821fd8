package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Overlapping token-window document chunking — the splitter every
  * embedding/RAG/long-context pipeline runs before vectorizing: a
  * document becomes ⌈(n−w)/s⌉+1 windows of `window` tokens starting
  * every `stride` tokens, so consecutive chunks overlap by `window −
  * stride` tokens and no sentence is ever cut without appearing whole
  * in a neighbor.
  *
  * Pure NARROW columnar work: tokenize → per-row `sequence` of chunk
  * starts → explode → `slice`. No shuffle at any corpus size, no UDF —
  * every step is a codegen'd built-in, and the whole pipeline (token
  * split, start arithmetic, slicing, the md5 chunk fingerprint) is
  * engine-replayable, so the t13 oracle recomputes every chunk from
  * the raw documents.
  *
  * Chunk count: n ≤ window → exactly one chunk (the whole document);
  * otherwise ⌊(n − window + stride − 1) / stride⌋ + 1 — the last
  * chunk may be shorter than `window` but every start is < n, so the
  * windows COVER the token sequence (requires stride ≤ window, gated).
  * Token-less documents (null/blank text) produce no chunks.
  *
  * Output: (doc_id, chunk_idx, n_tokens, chunk_text, chunk_fp) —
  * `chunk_fp` is md5 of the chunk text, the join key downstream
  * chunk-level dedup ([[Dedup]]) and embedding jobs key on.
  */
object Chunking {

  def chunk(
      df: DataFrame, id: Column, text: Column,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"need 1 <= stride <= window for gap-free coverage, got stride=$stride window=$window")
    val base = df
      .select(id.as("doc_id"), Text.tokens(Text.normalize(text)).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
      .withColumn("n", size(col("toks")))
    val nChunks = when(col("n") <= window, lit(1))
      .otherwise(floor((col("n") - lit(window) + lit(stride) - lit(1))
        .cast("double") / lit(stride.toDouble)).cast("int") + lit(1))
    base
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(window)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctoks")).as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
      .withColumn("chunk_fp", md5(col("chunk_text")))
  }

  /** Chunk-level duplication profile — the fine-grained dup report
    * whole-document fingerprints miss: a long document that embeds a
    * duplicated boilerplate block hashes unique as a whole, but its
    * CHUNKS give it away. Per document: how many of its chunks'
    * fingerprints appear in at least one OTHER document, and the
    * share. (Modern pipelines dedup long documents at exactly this
    * granularity; NON-overlapping windows — stride = window — so a
    * shared block isn't multiply counted by overlap.)
    *
    * Scale shape: [[chunk]]'s narrow fan-out, then one fp-keyed
    * aggregation for the cross-doc counts (map-side partials absorb
    * hot boilerplate fingerprints) and one doc-keyed rollup. The
    * cross-doc test is `count_distinct(doc_id) > 1` folded into the
    * same fp aggregation — no self-join.
    */
  def chunkDupShare(
      df: DataFrame, id: Column, text: Column, window: Int): DataFrame = {
    val chunks = chunk(df, id, text, window, stride = window)
      .select(col("doc_id"), col("chunk_fp"))
    val fpDocs = chunks.distinct() // a doc's own repeats are not "cross-doc"
      .groupBy("chunk_fp").agg(count(lit(1)).as("n_docs"))
    chunks
      .join(fpDocs, "chunk_fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_share",
        col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
  }
}
