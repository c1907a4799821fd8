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
    * Scale shape: [[chunk]]'s narrow fan-out collapses straight to
    * per-(doc, fp) instance counts (map-side partials absorb within-doc
    * repeats), the cross-doc fp table derives from THAT (one more
    * count — no distinct pass), and the fp-count attach is skew-split:
    * a fp's fact-side row count IS its n_docs, so fingerprints at or
    * above `hotMinDocs` — the boilerplate block shared by millions of
    * documents that would flood one reducer of a plain shuffle join —
    * form a BOUNDED set (≤ rows/hotMinDocs) that broadcast-joins
    * shuffle-free, while the cold remainder (≤ hotMinDocs rows per key
    * by construction) takes the ordinary equi-join. Broadcasting the
    * hot slice beats salting it ([[ScaleJoins.saltedJoin]]): the
    * attached side is one row per key, so there is no replication cost
    * and the hot keys leave the shuffle entirely. The doc-keyed rollup
    * shuffles on doc_id, which a hot FP does not skew.
    *
    * The hot-slice join is AQE-DECIDED, not hint-forced: whether the
    * hot set fits a broadcast is a data-dependent fact (|hot| ≤
    * |distinct (doc,fp) pairs|/hotMinDocs — a bound on the CHUNK table,
    * which no metadata of `df` predicts), so the only correct decider
    * is the one that sees the hot slice's ACTUAL runtime size: AQE
    * converts the join to broadcast when the built slice is under the
    * threshold and keeps the shuffled join otherwise — identical
    * output either way, no driver OOM risk, no eager job at
    * plan-construction time. (Round 12 tried both wrong versions
    * first: an eager hot-set count — executes the whole chunk fan-out
    * during plan construction, a 10× build regression the bench's
    * build/serve split caught — and a docs/hotMinDocs pigeonhole
    * "bound" that is not actually a bound, since n_docs counts
    * (doc, fp) PAIRS and one doc contributes thousands of fps.)
    */
  def chunkDupShare(
      df: DataFrame, id: Column, text: Column, window: Int,
      hotMinDocs: Int = 100000): DataFrame = {
    require(hotMinDocs >= 2,
      s"hotMinDocs must be >= 2 (a hot fp is by definition cross-doc), got $hotMinDocs")
    // instances of each fp per doc; a doc's own repeats collapse here
    // and are not "cross-doc". Cached ([[Dedup.scopedCache]]): it feeds
    // the fp-count derivation AND both attach branches — uncached, the
    // tokenize+chunk fan-out would replay three times.
    val perDocFp = Dedup.scopedCache(
      chunk(df, id, text, window, stride = window)
        .groupBy("doc_id", "chunk_fp").agg(count(lit(1)).as("c")))
    val fpDocs = perDocFp
      .groupBy("chunk_fp").agg(count(lit(1)).as("n_docs"))
    val hot = fpDocs.filter(col("n_docs") >= hotMinDocs)
    val cold = fpDocs.filter(col("n_docs") < hotMinDocs)
    val tagged = perDocFp.join(hot, Seq("chunk_fp"), "left")
    val attached = tagged.filter(col("n_docs").isNotNull)
      .unionByName(
        tagged.filter(col("n_docs").isNull).drop("n_docs")
          .join(cold, Seq("chunk_fp")))
    attached
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_chunks"),
        sum(when(col("n_docs") > 1, col("c")).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_share",
        col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  /** Similarity EDGES from shared chunk fingerprints: (d1, d2) with
    * d1 < d2 whenever two documents share at least one non-overlapping
    * `window`-token chunk — the edge set [[Dedup.groupPairs]] turns into
    * duplicate clusters (d10).
    *
    * `dfCap` is the posting-list discipline of the d02 Jaccard join: a
    * fingerprint shared by k documents emits k²/2 edges, so fingerprints
    * hotter than the cap (universal boilerplate — quadratic noise, not
    * duplication signal) are SKIPPED, exactly like df-capped shingles.
    * Under the cap every join key carries ≤ dfCap rows per side — no
    * skewed reducer at any corpus size; the candidate `distinct`
    * collapses multi-chunk pairs before they reach the component step.
    */
  def chunkShareEdges(
      df: DataFrame, id: Column, text: Column, window: Int,
      dfCap: Int = 100): DataFrame = {
    require(dfCap >= 2, s"dfCap must be >= 2 (an edge needs two docs), got $dfCap")
    // scopedCache (chunkDupShare's posture): the tokenize+chunk fan-out
    // feeds the df-count derivation AND both sides of the self-join —
    // uncached, only physical exchange reuse (a disableable optimizer
    // courtesy, not a contract) would stop it replaying three times
    // over the corpus.
    val fps = Dedup.scopedCache(
      chunk(df, id, text, window, stride = window)
        .select(col("doc_id"), col("chunk_fp").as("fp"))
        .distinct())
    val keptFps = fps.groupBy("fp").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2 && col("n_docs") <= dfCap)
      .select("fp")
    val kept = fps.join(keptFps, Seq("fp"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }
}
