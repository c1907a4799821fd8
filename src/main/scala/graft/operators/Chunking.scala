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
}
