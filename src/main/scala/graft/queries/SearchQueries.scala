package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ann, Bm25, Fusion}

/** Ranked-retrieval coverage over `documents` (+ `embeddings` for the
  * hybrid leg): BM25 lexical top-k ([[Bm25]]) and reciprocal-rank
  * fusion of a lexical and a dense leg ([[Fusion]]) — the retrieval
  * surface of a training-data pipeline (decontamination probes,
  * more-like-this expansion, hybrid search). Every score is integer
  * micro-units (per-term/per-leg rounding BEFORE grouped sums), so the
  * DuckDB oracles replay the full pipelines exactly — same posture as
  * the t/d-queries.
  */
object SearchQueries {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.t(s, dir, "embeddings")

  /** Fixed query batch: one rare-term probe (`dup`, df≈5% of the
    * corpus) plus two common-vocabulary queries — exercises the idf
    * spread of the synthetic corpus.
    */
  private val r01Batch: Seq[(Long, String)] = Seq(
    (0L, "dup merge table"),
    (1L, "spark window agg stream"),
    (2L, "vector scan filter hash"))

  /** BM25 top-10 for a 3-query batch over the full corpus. */
  def r01Bm25Search(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qdf = r01Batch.toDF("q_id", "qtext")
    Bm25.searchTopK(
      docs(s, dir), col("doc_id"), col("text"),
      qdf, col("q_id"), col("qtext"), k = 10)
      .orderBy("q_id", "rank")
  }

  /** The BM25 CTE chain (tokenize → stats → query-vocab postings → df
    * → per-term micro contributions → per-doc score), mirroring
    * [[Bm25.searchTopK]]'s expression tree token-for-token: every
    * constant that is not exactly binary-representable is written as
    * the same CAST the Scala `lit` produces, every association is
    * parenthesized to the Scala parse, and contributions round to
    * BIGINT micro-units before the order-independent SUM. Ends at
    * `bmscore(q_id, doc_id, score_micro)`.
    */
  private def bm25Ctes(corpusWhere: String, qtSelect: String): String =
    s"""d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents$corpusWhere),
       |dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS total_tokens FROM dd),
       |qt AS ($qtSelect),
       |post AS (
       |  SELECT term, doc_id, dl, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd) x
       |  WHERE term IN (SELECT term FROM qt)
       |  GROUP BY term, doc_id, dl),
       |dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY term),
       |contrib AS (
       |  SELECT qt.q_id, post.doc_id,
       |    CAST(ROUND((ln(CAST(1 AS DOUBLE) + GREATEST((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5, 0.5) / (CAST(df AS DOUBLE) + 0.5))
       |      * ((CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))
       |         / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * ((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)) + (CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE)) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
       |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS c_micro
       |  FROM post JOIN dft USING (term) JOIN qt USING (term) CROSS JOIN stats),
       |bmscore AS (SELECT q_id, doc_id, CAST(SUM(c_micro) AS BIGINT) AS score_micro FROM contrib GROUP BY q_id, doc_id)""".stripMargin

  val r01Oracle: String = {
    val qv = r01Batch
      .map { case (i, t) => s"(CAST($i AS BIGINT), '${t.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH qv(q_id, qtext) AS (VALUES $qv),
       |${bm25Ctes("",
      "SELECT DISTINCT q_id, unnest(regexp_extract_all(lower(qtext), '[a-z0-9]+')) AS term FROM qv")}
       |SELECT q_id, doc_id,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       |  score_micro
       |FROM bmscore
       |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Persisted-lexical-index round trip ([[Bm25.buildLexIndex]] →
    * [[Bm25.addToLexIndex]] → [[Bm25.queryLexIndex]]): the index is
    * built from the even-id half of the corpus, the odd-id half is
    * APPENDED (pure posting append + stats refresh — df derives from
    * the posting lists at query time, so an add rewrites nothing), and
    * the query reads ONLY the bucket directories the query vocabulary
    * hashes into (partition pruning — the serving shape that answers a
    * 3-term query without scanning a 100 TB corpus). Same scoring
    * arithmetic as [[r01Bm25Search]] over the same corpus and batch,
    * so the r01 oracle applies VERBATIM — the strongest statement of
    * build+add ≡ one-shot equivalence the gate can make.
    */
  def r03LexIndexSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val path = Scratch.wiped(s, "lex_index", dir)
    graft.operators.Bm25.buildLexIndex(
      d.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"), path, nBuckets = 8)
    graft.operators.Bm25.addToLexIndex(
      s, path, d.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"))
    graft.operators.Bm25.queryLexIndex(
      s, path, r01Batch.toDF("q_id", "qtext"), col("q_id"), col("qtext"), k = 10)
      .orderBy("q_id", "rank")
  }

  private val r04Phrases: Seq[(Long, String)] = Seq(
    (0L, "key agg"), (1L, "table table"), (2L, "slow fast"))

  /** Exact-phrase search ([[graft.operators.Bm25.phraseTopK]]): the
    * positional-intersection algebra (slot i at token position pos ⇒
    * anchor pos−i; full slot cover at an anchor = one occurrence),
    * ranked by occurrence count. Pure integer relational algebra, so
    * the oracle replays it completely — including the repeated-term
    * phrase ("table table") and overlapping occurrences, which a
    * naive LIKE or split-window replay would miscount.
    */
  def r04PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Bm25.phraseTopK(
      docs(s, dir), col("doc_id"), col("text"),
      r04Phrases.toDF("q_id", "qtext"), col("q_id"), col("qtext"), k = 10)
      .orderBy("q_id", "rank")
  }

  /** DuckDB positional replay: 1-based positions/slots make
    * `pos − i` a shifted-but-consistent anchor key (Spark's 0-based
    * twin groups on the same differences), so covers and occurrence
    * counts agree exactly.
    */
  val r04Oracle: String = {
    val qv = r04Phrases
      .map { case (i, t) => s"(CAST($i AS BIGINT), '${t.replace("'", "''")}')" }
      .mkString(", ")
    s"""WITH qv(q_id, phrase) AS (VALUES $qv),
       |qa AS (SELECT q_id, regexp_extract_all(lower(phrase), '[a-z0-9]+') AS ptoks FROM qv),
       |qt0 AS (SELECT q_id, unnest(list_transform(generate_series(1, len(ptoks)), j -> STRUCT_PACK(i := j, term := ptoks[j]))) AS pt FROM qa),
       |qt AS (SELECT q_id, pt.i AS i, pt.term AS term FROM qt0),
       |qlen AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS phrase_len FROM qt GROUP BY q_id),
       |dtoks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
       |ptk0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)), j -> STRUCT_PACK(pos := j, term := toks[j]))) AS pt FROM dtoks),
       |ptk AS (SELECT doc_id, pt.pos AS pos, pt.term AS term FROM ptk0 WHERE pt.term IN (SELECT term FROM qt)),
       |anch AS (SELECT qt.q_id, ptk.doc_id, ptk.pos - qt.i AS anchor FROM ptk JOIN qt USING (term)),
       |occ AS (
       |  SELECT q_id, doc_id, anchor, CAST(COUNT(*) AS BIGINT) AS cover
       |  FROM anch GROUP BY q_id, doc_id, anchor),
       |full_occ AS (
       |  SELECT occ.q_id, occ.doc_id FROM occ JOIN qlen USING (q_id)
       |  WHERE cover = phrase_len AND anchor >= 0),
       |counts AS (SELECT q_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ FROM full_occ GROUP BY q_id, doc_id)
       |SELECT q_id, doc_id,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY n_occ DESC, doc_id) AS INT) AS rank,
       |  n_occ
       |FROM counts
       |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY n_occ DESC, doc_id) <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Exact-phrase search SERVED FROM the persisted positional index
    * ([[graft.operators.Bm25.buildLexIndex]] →
    * [[graft.operators.Bm25.addToLexIndex]] →
    * [[graft.operators.Bm25.queryPhraseIndex]]): the index is built
    * from the even-id half, the odd-id half appended, and the phrase
    * batch answered from the bucket-pruned positional postings — the
    * serving deployment of [[r04PhraseSearch]], which re-tokenizes the
    * corpus per batch. Same anchor algebra over the same corpus and
    * phrases, so the r04 oracle applies VERBATIM — build+add+index ≡
    * one-shot, the strongest equivalence statement the gate can make.
    */
  def r05PhraseIndexSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val path = Scratch.wiped(s, "phrase_index", dir)
    graft.operators.Bm25.buildLexIndex(
      d.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"), path, nBuckets = 8)
    graft.operators.Bm25.addToLexIndex(
      s, path, d.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"))
    graft.operators.Bm25.queryPhraseIndex(
      s, path, r04Phrases.toDF("q_id", "qtext"), col("q_id"), col("qtext"), k = 10)
      .orderBy("q_id", "rank")
  }

  /** Hybrid retrieval, more-like-this form: for each query document
    * (doc_id < 10), a BM25 leg (its distinct terms against the
    * doc_id >= 10 corpus, top-20) and a dense leg (exact cosine top-20
    * over the row-aligned `embeddings` table) are fused by
    * reciprocal rank — [[Fusion.rrf]]. Both legs are themselves
    * exactly replayable, so the oracle replays lexical leg, dense leg,
    * and fusion end-to-end.
    */
  def r02HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val e = emb(s, dir)
    val bm = Bm25.searchTopK(
      d.filter(col("doc_id") >= 10), col("doc_id"), col("text"),
      d.filter(col("doc_id") < 10), col("doc_id"), col("text"), k = 20)
      .select("q_id", "doc_id", "rank")
    val vec = Ann.knnBruteForce(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"), k = 20)
      .select(col("q_id"), col("b_id").as("doc_id"), col("rank"))
    Fusion.rrf(Seq(bm, vec), k = 10)
      .orderBy("q_id", "rank")
  }

  val r02Oracle: String = {
    import DuckOracle.{duckDot, duckNorm}
    val sim = s"${duckDot("q_emb", "b_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    // ROUND(1e6 / (c + rank)) — Fusion.rrf's exact contribution tree
    def rrfC(src: String) =
      s"SELECT q_id, doc_id, CAST(ROUND(CAST(1000000 AS DOUBLE) / CAST((60 + rank) AS DOUBLE)) AS BIGINT) AS c_micro FROM $src"
    s"""WITH ${bm25Ctes(" WHERE doc_id >= 10",
      "SELECT DISTINCT doc_id AS q_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents WHERE doc_id < 10")},
       |bm AS (
       |  SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) AS INT) AS rank
       |  FROM bmscore
       |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) <= 20),
       |vq AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |vb AS (SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings WHERE vec_id >= 10),
       |vscored AS (SELECT q_id, b_id AS doc_id, $sim AS sim FROM vb, vq),
       |vec AS (
       |  SELECT q_id, doc_id,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS INT) AS rank
       |  FROM vscored
       |  WHERE NOT isnan(sim)
       |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) <= 20),
       |legs AS (${rrfC("bm")} UNION ALL ${rrfC("vec")}),
       |fused AS (SELECT q_id, doc_id, CAST(SUM(c_micro) AS BIGINT) AS rrf_micro FROM legs GROUP BY q_id, doc_id)
       |SELECT q_id, doc_id,
       |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf_micro DESC, doc_id) AS INT) AS rank,
       |  rrf_micro
       |FROM fused
       |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY rrf_micro DESC, doc_id) <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Hybrid retrieval SERVED FROM two persisted indexes
    * ([[graft.operators.Fusion.hybridTopK]]): the lexical leg reads
    * the bucket-pruned lex index (built even + added odd — the
    * lifecycle flavor), the dense leg reads the cell-pruned IVF index
    * with nprobe = nlist (exhaustive over live cells, so bit-equal to
    * the brute-force leg), and reciprocal rank fuses them — the
    * one-call serving deployment of [[r02HybridRrf]], whose oracle
    * therefore applies VERBATIM: persisted composition ≡ one-shot
    * pipeline, end to end.
    */
  def r06HybridIndexSearch(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val e = emb(s, dir)
    val lexPath = Scratch.wiped(s, "hybrid_lex", dir)
    val annPath = Scratch.wiped(s, "hybrid_ann", dir)
    // the two index builds are INDEPENDENT (different source tables,
    // different output trees) — submit them from two threads so their
    // jobs overlap on the cluster, the production shape for building
    // sibling indexes (Spark schedulers are thread-safe; each build's
    // small stages leave cores idle the other fills). The lex chain
    // (build → add) stays sequential within its thread by contract.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val lexF = Future {
      graft.operators.Bm25.buildLexIndex(
        d.filter(col("doc_id") >= 10 && col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), lexPath, nBuckets = 8)
      graft.operators.Bm25.addToLexIndex(
        s, lexPath, d.filter(col("doc_id") >= 10 && col("doc_id") % 2 === 1),
        col("doc_id"), col("text"))
    }
    val annF = Future {
      Ann.buildIvfIndex(
        e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"), annPath, nlist = 8)
    }
    Await.result(lexF, Duration.Inf)
    Await.result(annF, Duration.Inf)
    val q = d.filter(col("doc_id") < 10).select(col("doc_id"), col("text"))
      .join(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    Fusion.hybridTopK(
      s, lexPath, annPath, q, col("doc_id"), col("text"), col("embedding"),
      k = 10, kPerLeg = 20, nprobe = 8)
      .orderBy("q_id", "rank")
  }

  /** MMR diversification ([[graft.operators.Mmr.diversify]]) of a
    * dense top-20 retrieval: the serving-side re-rank that spends a
    * little relevance for neighborhood coverage. Candidates are the
    * exact brute-force cosine top-20 per query (replayable), so the
    * DuckDB oracle replays the WHOLE pipeline: candidate set, pairwise
    * candidate cosines, and all five greedy selection steps as chained
    * CTEs — selection order, tie-breaks, and marginal scores included.
    * λ is written as `CAST(0.7 AS DOUBLE)` and its complement as
    * `(1 - CAST(0.7 AS DOUBLE))` so both engines compute the identical
    * double complement (a literal 0.3 would be DuckDB DECIMAL
    * arithmetic, not the engine's `1.0 - 0.7` double).
    */
  def r07MmrDiversify(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cands = Ann.knnBruteForce(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 20)
      .join(
        e.select(col("vec_id").as("b_id"), col("embedding").as("emb")), "b_id")
      .select(col("q_id"), col("b_id"), col("sim").as("rel"), col("emb"))
    graft.operators.Mmr.diversify(cands, k = 5, lambda = 0.7)
      .orderBy("q_id", "rank")
  }

  val r07Oracle: String = {
    val k = 5
    val topn = 20
    val lam = "CAST(0.7 AS DOUBLE)"
    import DuckOracle.{duckDot, duckNorm}
    val relSim = s"${duckDot("b_emb", "q_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    val pairSim = s"${duckDot("x.a_emb", "y.a_emb")} / (${duckNorm("x.a_emb")} * ${duckNorm("y.a_emb")})"
    // greedy step r: score remaining candidates against sel{r-1}, pick
    // the (score desc, id) winner — the exact marginal the engine's
    // in-memory greedy computes
    def step(r: Int): String =
      s"""s$r AS (
         |  SELECT q_id, b_id, score, $r AS rank FROM (
         |    SELECT c.q_id, c.b_id,
         |      ($lam * c.rel) - ((1 - $lam) * m.mx) AS score
         |    FROM cand c
         |    JOIN (
         |      SELECT p.q_id, p.a_id, MAX(p.sim) AS mx
         |      FROM psim p JOIN sel${r - 1} s ON p.q_id = s.q_id AND p.s_id = s.b_id
         |      GROUP BY p.q_id, p.a_id) m
         |      ON m.q_id = c.q_id AND m.a_id = c.b_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${r - 1} s WHERE s.q_id = c.q_id AND s.b_id = c.b_id)
         |  ) QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score DESC, b_id) = 1
         |),
         |sel$r AS (SELECT q_id, b_id FROM sel${r - 1} UNION ALL SELECT q_id, b_id FROM s$r)""".stripMargin
    val steps = (2 to k).map(step).mkString(",\n")
    val unions = (1 to k).map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")
    s"""WITH b AS (
       |  SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings WHERE vec_id >= 10
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10
       |), scored AS (
       |  SELECT q_id, b_id, $relSim AS rel FROM b, q
       |), cand AS (
       |  SELECT q_id, b_id, rel FROM scored WHERE NOT isnan(rel)
       |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, b_id) <= $topn
       |), cemb AS (
       |  SELECT c.q_id, c.b_id, c.rel, b.b_emb AS emb FROM cand c JOIN b ON b.b_id = c.b_id
       |), psim AS (
       |  SELECT x.q_id, x.a_id, y.a_id AS s_id, $pairSim AS sim
       |  FROM (SELECT q_id, b_id AS a_id, emb AS a_emb FROM cemb) x
       |  JOIN (SELECT q_id, b_id AS a_id, emb AS a_emb FROM cemb) y
       |    ON x.q_id = y.q_id AND x.a_id <> y.a_id
       |), s1 AS (
       |  SELECT q_id, b_id, score, 1 AS rank FROM (
       |    SELECT q_id, b_id, ($lam * rel) - ((1 - $lam) * CAST(0 AS DOUBLE)) AS score FROM cand
       |  ) QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score DESC, b_id) = 1
       |),
       |sel1 AS (SELECT q_id, b_id FROM s1),
       |$steps
       |SELECT q_id, b_id, CAST(rank AS INT) AS rank, score FROM ($unions)
       |ORDER BY q_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r07_mmr_diversify" -> (r07MmrDiversify _),
    "r01_bm25_search" -> (r01Bm25Search _),
    "r02_hybrid_rrf" -> (r02HybridRrf _),
    "r03_lex_index" -> (r03LexIndexSearch _),
    "r04_phrase_search" -> (r04PhraseSearch _),
    "r05_phrase_index" -> (r05PhraseIndexSearch _),
    "r06_hybrid_index" -> (r06HybridIndexSearch _)
  )

  val oracles: Map[String, String] = Map(
    "r07_mmr_diversify" -> r07Oracle,
    "r01_bm25_search" -> r01Oracle,
    "r02_hybrid_rrf" -> r02Oracle,
    // build(even)+add(odd) must serve the SAME answer as one-shot BM25
    // over the whole corpus — the r01 replay IS the oracle
    "r03_lex_index" -> r01Oracle,
    "r04_phrase_search" -> r04Oracle,
    // build(even)+add(odd)+positional-index serving must answer the
    // SAME phrase results as one-shot phraseTopK over the whole
    // corpus — the r04 replay IS the oracle
    "r05_phrase_index" -> r04Oracle,
    // persisted lex index + exhaustive-probe persisted IVF index +
    // RRF must answer the SAME fused ranking as the one-shot r02
    // pipeline — the r02 replay IS the oracle
    "r06_hybrid_index" -> r02Oracle
  )
}
