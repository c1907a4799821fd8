package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Deduplication coverage over `documents`: exact, inverted-index
  * Jaccard (df-capped candidates, exact scores), MinHash+LSH, and
  * SimHash band-join. The SimHash band join is
  * *lossless* for its distance bound (pigeonhole), so its oracle is the
  * brute-force all-pairs SQL — a strong differential test of the whole
  * shingle→hash→band pipeline. MinHash+LSH is deterministic given its
  * fixed hash family, so its oracle replays the identical signature and
  * banding arithmetic in DuckDB.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private def duckH60(e: String): String = DuckOracle.h60(e)

  def d01ExactDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.exactKeepFirst(docs(s, dir), col("doc_id"), col("text"))
      .orderBy("doc_id")

  val d01Oracle: String =
    """SELECT min(doc_id) AS doc_id, fp FROM (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents
      |) WHERE fp IS NOT NULL GROUP BY fp ORDER BY doc_id""".stripMargin

  /** Candidate-generation df cap for d02 — threaded into BOTH the Spark
    * call and the oracle SQL so the hash gate stays valid at any SF.
    */
  private val d02DfCap = 1000

  /** 3-gram Jaccard pairs within (lang, source) blocks. Candidate
    * generation is df-capped (shingles hotter than [[d02DfCap]] are
    * skipped — see Dedup.jaccardPairs); reported inter/uni/jaccard are
    * exact over the full shingle sets. The oracle replays the SAME cap.
    */
  def d02JaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(
      docs(s, dir), col("doc_id"), col("text"),
      concat_ws("|", col("lang"), col("source")), n = 3, minJaccard = 0.1,
      dfCap = d02DfCap)
      .orderBy("d1", "d2")

  val d02Oracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang || '|' || source AS blk,
      |    string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, blk,
      |    list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [array_to_string(toks, ' ')] END) AS shset
      |  FROM t
      |), ex AS (
      |  SELECT doc_id, blk, unnest(shset) AS shingle FROM sh
      |), keep AS (
      |  SELECT blk, shingle FROM ex GROUP BY blk, shingle
      |  HAVING COUNT(*) > 1 AND COUNT(*) <= $d02DfCap
      |), exk AS (
      |  SELECT ex.doc_id, ex.blk, ex.shingle FROM ex JOIN keep USING (blk, shingle)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      |  FROM exk a JOIN exk b ON a.blk = b.blk AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      |), pairs AS (
      |  SELECT c.d1, c.d2, COUNT(*) AS inter
      |  FROM cand c
      |  JOIN ex e1 ON e1.doc_id = c.d1
      |  JOIN ex e2 ON e2.doc_id = c.d2 AND e2.shingle = e1.shingle
      |  GROUP BY c.d1, c.d2
      |), sz AS (SELECT doc_id, len(shset) AS sz FROM sh)
      |SELECT d1, d2, inter, s1.sz + s2.sz - inter AS uni,
      |  CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
      |FROM pairs JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
      |WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.1
      |ORDER BY d1, d2""".stripMargin

  /** MinHash+LSH candidates verified by exact Jaccard. The pipeline is
    * fully deterministic — md5-derived h60 minhash under fixed Knuth
    * coefficients, 32×2 banding, exact-Jaccard verify — so the DuckDB
    * oracle replays it end to end (recall is "probabilistic" only over
    * the choice of hash family, which both engines share bit-for-bit).
    */
  def d03MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(docs(s, dir), col("doc_id"), col("text"),
      n = 3, k = 64, rowsPerBand = 2, minJaccard = 0.1)
      .orderBy("d1", "d2")

  /** DuckDB replay of the full MinHash+LSH pipeline with the SAME
    * k=64 / r=2 / minJaccard=0.1 parameters as [[d03MinhashLsh]]:
    * shingle → h60 mod p → 64 min-aggregates under
    * [[graft.functions.Hashing.minhashCoeffs]] (inlined as literals) →
    * 32 band keys → band equi-join candidates → exact-Jaccard verify
    * over the full shingle sets.
    */
  val d03Oracle: String = {
    val p = graft.functions.Hashing.MinHashP
    val k = 64
    val rowsPerBand = 2
    val coeffs = graft.functions.Hashing.minhashCoeffs(k)
    // separator has no margin bar: the outer stripMargin leaves these
    // interpolated lines untouched
    val sigCols = coeffs.zipWithIndex.map { case ((a, b), i) =>
      s"min((hv * $a + $b) % $p) AS m$i"
    }.mkString(",\n    ")
    val bandItems = (0 until k / rowsPerBand).map { band =>
      s"'${band}_' || CAST(m${2 * band} AS VARCHAR) || '_' || CAST(m${2 * band + 1} AS VARCHAR)"
    }.mkString(", ")
    val h = duckH60("shingle")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(toks) >= 3
       |      THEN list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [array_to_string(toks, ' ')] END) AS shset
       |  FROM t
       |), ex AS (
       |  SELECT doc_id, unnest(shset) AS shingle FROM sh
       |), h AS (
       |  SELECT doc_id, $h % $p AS hv FROM ex
       |), sig AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM h GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, unnest([$bandItems]) AS band FROM sig
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT c.d1, c.d2, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN ex e1 ON e1.doc_id = c.d1
       |  JOIN ex e2 ON e2.doc_id = c.d2 AND e2.shingle = e1.shingle
       |  GROUP BY c.d1, c.d2
       |), sz AS (SELECT doc_id, len(shset) AS sz FROM sh)
       |SELECT d1, d2, inter, s1.sz + s2.sz - inter AS uni,
       |  CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
       |FROM pairs JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
       |WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.1
       |ORDER BY d1, d2""".stripMargin
  }

  /** SimHash pairs within Hamming distance 3 via 4×15-bit band join —
    * oracle is brute-force all-pairs (identical result set by pigeonhole).
    */
  def d04SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(s, dir), col("doc_id"), col("text"), maxDist = 3)
      .orderBy("d1", "d2")

  val d04Oracle: String = {
    val h = duckH60("tok")
    // `WHERE tok <> ''` + LEFT JOIN/COALESCE(…, 0): DuckDB's
    // string_split_regex('') yields [''] (one empty token) where Spark's
    // tokenizer yields no tokens — an empty/whitespace-only document
    // must get simhash 0 in BOTH engines, not the hash of ''.
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+')) AS tok
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, $h AS h FROM toks WHERE tok <> ''
       |), bits AS (
       |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM h, generate_series(0, 59) t(j) GROUP BY doc_id, j
       |), sh0 AS (
       |  SELECT doc_id, SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS simhash
       |  FROM bits GROUP BY doc_id
       |), sh AS (
       |  SELECT d.doc_id, COALESCE(sh0.simhash, 0) AS simhash
       |  FROM documents d LEFT JOIN sh0 ON sh0.doc_id = d.doc_id
       |)
       |SELECT a.doc_id AS d1, b.doc_id AS d2, bit_count(xor(a.simhash, b.simhash)) AS dist
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY d1, d2""".stripMargin
  }

  /** SimHash signature dump — direct differential test of the 60-bit
    * SimHash computation itself.
    */
  def d05Simhashes(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashes(docs(s, dir), col("doc_id"), col("text"))
      .orderBy("doc_id")

  val d05Oracle: String = {
    val h = duckH60("tok")
    // same empty-token guard as d04 (see comment there)
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+')) AS tok
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, $h AS h FROM toks WHERE tok <> ''
       |), bits AS (
       |  SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM h, generate_series(0, 59) t(j) GROUP BY doc_id, j
       |), sh0 AS (
       |  SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT d.doc_id AS doc_id, CAST(COALESCE(sh0.simhash, 0) AS BIGINT) AS simhash
       |FROM documents d LEFT JOIN sh0 ON sh0.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The shared window algebra of d07/d08's oracles: 5-token windows
    * (with multiplicity) per document, the exact SQL twin of
    * `Text.shingles(text, 5)` — same normalize/split, same short-doc
    * whole-text fallback as d02's 3-gram form.
    */
  private val spanWindowsSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS toks
      |  FROM documents WHERE text IS NOT NULL
      |), ex AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
      |    THEN list_transform(generate_series(1, len(toks)-4),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
      |    ELSE [array_to_string(toks, ' ')] END) AS span
      |  FROM t
      |)""".stripMargin

  /** Exact repeated 5-token spans across ≥ 3 documents
    * ([[Dedup.repeatedSpans]]). The fingerprint pruning inside the
    * operator is exact-preserving (equal spans always collide), so the
    * oracle is the hash-free GROUP BY…HAVING over the same windows.
    */
  def d07RepeatedSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedSpans(docs(s, dir), col("doc_id"), col("text"),
      n = 5, minDocs = 3)
      .orderBy(desc("n_docs"), desc("n_occ"), asc("span"))

  val d07Oracle: String =
    s"""$spanWindowsSql
       |SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
       |FROM ex GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 3
       |ORDER BY n_docs DESC, n_occ DESC, span""".stripMargin

  /** Per-document repeated-span share at minDocs = 2
    * ([[Dedup.repeatedSpanShare]]) — the "mostly boilerplate" curation
    * signal. The share is an exact ratio of two exact longs, so the
    * double divides bit-identically in both engines.
    */
  def d08DupShare(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedSpanShare(docs(s, dir), col("doc_id"), col("text"),
      n = 5, minDocs = 2)
      .orderBy("doc_id")

  val d08Oracle: String =
    s"""$spanWindowsSql, rep AS (
       |  SELECT span FROM ex GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
       |)
       |SELECT e.doc_id, COUNT(*) AS n_spans,
       |  CAST(SUM(CASE WHEN r.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
       |  CAST(SUM(CASE WHEN r.span IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_share
       |FROM ex e LEFT JOIN rep r ON e.span = r.span
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  /** Chunk-level duplication share
    * ([[graft.operators.Chunking.chunkDupShare]]): per document, the
    * share of its NON-overlapping 32-token chunks whose fingerprint
    * appears in at least one other document — the fine-grained dup
    * profile whole-doc fingerprints (d01) miss. Fully replayable:
    * chunking, md5 fingerprints, cross-doc counts, and the division.
    */
  def d09ChunkDupShare(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunkDupShare(
      docs(s, dir), col("doc_id"), col("text"), window = 32)
      .orderBy("doc_id")

  val d09Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, ${DuckOracle.toksNorm} AS toks FROM documents
       |  WHERE text IS NOT NULL
       |    AND trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= 32 THEN 1
       |         ELSE (len(toks) - 32 + 32 - 1) // 32 + 1 END AS n_chunks
       |  FROM d
       |), c AS (
       |  SELECT doc_id,
       |    md5(array_to_string(toks[g.i * 32 + 1 : LEAST(g.i * 32 + 32, n)], ' ')) AS fp
       |  FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
       |), fd AS (
       |  SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM (SELECT DISTINCT doc_id, fp FROM c) GROUP BY fp
       |), per AS (
       |  SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |    CAST(SUM(CASE WHEN fd.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
       |  FROM c JOIN fd USING (fp) GROUP BY c.doc_id
       |)
       |SELECT doc_id, n_chunks, n_dup_chunks,
       |  CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS dup_share
       |FROM per ORDER BY doc_id""".stripMargin

  /** Edge-generation df cap for d10 — fingerprints shared by more than
    * this many documents are skipped (a fp shared by k docs would emit
    * k²/2 edges; past the cap that is quadratic boilerplate noise, the
    * same posting-list discipline as [[d02DfCap]]). Threaded into BOTH
    * the Spark call and the oracle SQL.
    */
  private val d10DfCap = 100

  /** Duplicate GROUPS via connected components
    * ([[Dedup.groupPairs]] — O(log diameter) min-label rounds with
    * pointer jumping): docs are edges when they share a non-overlapping
    * 32-token chunk fingerprint (the d09 chunking, df-capped), and each
    * component labels every member with its minimum doc id — the
    * keep-one-per-cluster primitive of corpus dedup. The oracle
    * recomputes the SAME components by a structurally different
    * algorithm (DuckDB recursive-CTE transitive closure), so the hash
    * match gates the fixpoint itself, not a shared implementation.
    */
  def d10CcGroups(s: SparkSession, dir: String): DataFrame =
    Dedup.groupPairs(
      graft.operators.Chunking.chunkShareEdges(
        docs(s, dir), col("doc_id"), col("text"), window = 32, dfCap = d10DfCap))
      .orderBy("doc_id")

  val d10Oracle: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, ${DuckOracle.toksNorm} AS toks FROM documents
       |  WHERE text IS NOT NULL
       |    AND trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= 32 THEN 1
       |         ELSE (len(toks) - 32 + 32 - 1) // 32 + 1 END AS n_chunks
       |  FROM d
       |), c AS (
       |  SELECT doc_id,
       |    md5(array_to_string(toks[g.i * 32 + 1 : LEAST(g.i * 32 + 32, n)], ' ')) AS fp
       |  FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
       |), fset AS (
       |  SELECT DISTINCT doc_id, fp FROM c
       |), fd AS (
       |  SELECT fp FROM fset GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $d10DfCap
       |), fk AS (
       |  SELECT doc_id, fp FROM fset JOIN fd USING (fp)
       |), e0 AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |), edges AS (
       |  SELECT d1, d2 FROM e0 UNION ALL SELECT d2, d1 FROM e0
       |), reach(doc_id, lbl) AS (
       |  SELECT d1, d1 FROM edges
       |  UNION
       |  SELECT e.d1, r.lbl FROM edges e JOIN reach r ON e.d2 = r.doc_id
       |)
       |SELECT doc_id, MIN(lbl) AS group_id FROM reach
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** End-to-end dedup APPLY ([[Dedup.keepComponentMin]]): the corpus
    * with every chunk-share duplicate cluster reduced to its min-id
    * representative — what a pipeline actually ships downstream. The
    * oracle recomputes d10's components (recursive CTE) and applies the
    * keep rule independently.
    */
  def d11DedupApply(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val groups = Dedup.groupPairs(
      graft.operators.Chunking.chunkShareEdges(
        d, col("doc_id"), col("text"), window = 32, dfCap = d10DfCap))
    Dedup.keepComponentMin(d, col("doc_id"), groups)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  val d11Oracle: String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, ${DuckOracle.toksNorm} AS toks FROM documents
       |  WHERE text IS NOT NULL
       |    AND trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= 32 THEN 1
       |         ELSE (len(toks) - 32 + 32 - 1) // 32 + 1 END AS n_chunks
       |  FROM d
       |), c AS (
       |  SELECT doc_id,
       |    md5(array_to_string(toks[g.i * 32 + 1 : LEAST(g.i * 32 + 32, n)], ' ')) AS fp
       |  FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
       |), fset AS (
       |  SELECT DISTINCT doc_id, fp FROM c
       |), fd AS (
       |  SELECT fp FROM fset GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $d10DfCap
       |), fk AS (
       |  SELECT doc_id, fp FROM fset JOIN fd USING (fp)
       |), e0 AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |), edges AS (
       |  SELECT d1, d2 FROM e0 UNION ALL SELECT d2, d1 FROM e0
       |), reach(doc_id, lbl) AS (
       |  SELECT d1, d1 FROM edges
       |  UNION
       |  SELECT e.d1, r.lbl FROM edges e JOIN reach r ON e.d2 = r.doc_id
       |), lab AS (
       |  SELECT doc_id, MIN(lbl) AS group_id FROM reach GROUP BY doc_id
       |)
       |SELECT x.doc_id, x.lang, x.source, x.n_chars
       |FROM documents x LEFT JOIN lab ON lab.doc_id = x.doc_id
       |WHERE lab.doc_id IS NULL OR lab.group_id = x.doc_id
       |ORDER BY x.doc_id""".stripMargin

  /** Incremental exact dedup ([[Dedup.incrementalKeepFirst]]): docs
    * with `doc_id % 10 < 8` play the already-indexed historical corpus
    * (fingerprints only — the index side never carries text); the rest
    * are today's batch. Survivors: batch-internal keep-first, then
    * anti-join against the index.
    */
  def d12IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val existing = d.filter(pmod(col("doc_id"), lit(10L)) < 8)
    val incoming = d.filter(pmod(col("doc_id"), lit(10L)) >= 8)
    Dedup.incrementalKeepFirst(
      Dedup.exactKeepFirst(existing, col("doc_id"), col("text")),
      incoming, col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  val d12Oracle: String =
    """WITH f AS (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents
      |), ex AS (
      |  SELECT DISTINCT fp FROM f WHERE doc_id % 10 < 8 AND fp IS NOT NULL
      |), inc AS (
      |  SELECT min(doc_id) AS doc_id, fp FROM f
      |  WHERE doc_id % 10 >= 8 AND fp IS NOT NULL GROUP BY fp
      |)
      |SELECT doc_id, fp FROM inc WHERE fp NOT IN (SELECT fp FROM ex)
      |ORDER BY doc_id""".stripMargin

  /** Edit-distance near-dup pairs ([[Dedup.editDistancePairs]],
    * Pass-Join blocking, k=2) over a normalized 24-char prefix key —
    * the fuzzy-title dedup a curation pipeline runs where token-set
    * similarity is too coarse (transposed words hash apart; one-char
    * typos stay within Levenshtein 2). The blocking is pigeonhole-
    * lossless, so the oracle is the brute-force all-pairs
    * `levenshtein` join — a full differential test of the segment
    * window algebra. Key normalization strips to ASCII FIRST and
    * lowercases after (locale-proof), keeping Spark and DuckDB
    * `lower`/`levenshtein` on the same pure-ASCII footing.
    */
  def d13EditDistPairs(s: SparkSession, dir: String): DataFrame = {
    val key = substring(
      trim(regexp_replace(
        lower(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")),
        " +", " ")),
      1, 24)
    Dedup.editDistancePairs(
      docs(s, dir).filter(length(key) >= 8), col("doc_id"), key, maxDist = 2)
      .orderBy("d1", "d2")
  }

  val d13Oracle: String =
    """WITH k AS (
      |  SELECT doc_id,
      |    substr(trim(regexp_replace(
      |      lower(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')),
      |      ' +', ' ', 'g')), 1, 24) AS key
      |  FROM documents
      |), kk AS (
      |  SELECT doc_id, key FROM k WHERE length(key) >= 8
      |)
      |SELECT a.doc_id AS d1, b.doc_id AS d2,
      |  CAST(levenshtein(a.key, b.key) AS INT) AS dist
      |FROM kk a JOIN kk b
      |  ON a.doc_id < b.doc_id AND abs(length(a.key) - length(b.key)) <= 2
      |WHERE levenshtein(a.key, b.key) <= 2
      |ORDER BY d1, d2""".stripMargin

  /** Prefix-filtered Jaccard pairs ([[Dedup.prefixJaccardPairs]],
    * AllPairs/PPJoin blocking, J ≥ 3/5) over distinct token sets — the
    * LOSSLESS complement to d02's df-capped posting join (which drops
    * pairs meeting only on hot tokens, by contract). The oracle
    * replays the whole pipeline — df order, integer-ceiling prefix,
    * candidate join, integer cross-multiplied threshold — so the
    * blocking theorem is differentially tested cross-engine.
    */
  def d14PrefixJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(
      docs(s, dir), col("doc_id"), col("text"), tNum = 3, tDen = 5, n = 3)
      .orderBy("d1", "d2")

  val d14Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${DuckOracle.toksNorm} AS toks FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
       |    THEN list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |    ELSE [array_to_string(toks, ' ')] END)) AS token
       |  FROM t
       |), dfreq AS (
       |  SELECT token, COUNT(*) AS tdf FROM tok GROUP BY token
       |), ord AS (
       |  SELECT doc_id, token,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tdf, token) AS pos,
       |    COUNT(*) OVER (PARTITION BY doc_id) AS sz
       |  FROM tok JOIN dfreq USING (token)
       |), pref AS (
       |  SELECT doc_id, token, sz FROM ord WHERE pos <= sz - ((3*sz + 4)//5) + 1
       |), cand AS (
       |  SELECT DISTINCT p1.doc_id AS d1, p2.doc_id AS d2
       |  FROM pref p1 JOIN pref p2 ON p1.token = p2.token
       |    AND p1.doc_id < p2.doc_id
       |    AND 5 * least(p1.sz, p2.sz) >= 3 * greatest(p1.sz, p2.sz)
       |), szs AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INT) AS sz FROM tok GROUP BY doc_id
       |), ix AS (
       |  SELECT c.d1, c.d2, CAST(COUNT(*) AS INT) AS i
       |  FROM cand c
       |  JOIN tok a ON a.doc_id = c.d1
       |  JOIN tok b ON b.doc_id = c.d2 AND b.token = a.token
       |  GROUP BY c.d1, c.d2
       |)
       |SELECT ix.d1, ix.d2, ix.i AS inter, sa.sz + sb.sz - ix.i AS uni,
       |  CAST(ix.i AS DOUBLE) / (sa.sz + sb.sz - ix.i) AS jaccard
       |FROM ix JOIN szs sa ON sa.doc_id = ix.d1 JOIN szs sb ON sb.doc_id = ix.d2
       |WHERE 5 * ix.i >= 3 * (sa.sz + sb.sz - ix.i)
       |ORDER BY d1, d2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d14_prefix_jaccard" -> (d14PrefixJaccard _),
    "d13_editdist_pairs" -> (d13EditDistPairs _),
    "d12_incremental_dedup" -> (d12IncrementalDedup _),
    "d11_dedup_apply" -> (d11DedupApply _),
    "d10_cc_groups" -> (d10CcGroups _),
    "d09_chunk_dup_share" -> (d09ChunkDupShare _),
    "d01_exact_dedup" -> (d01ExactDedup _),
    "d02_jaccard_pairs" -> (d02JaccardPairs _),
    "d03_minhash_lsh" -> (d03MinhashLsh _),
    "d04_simhash_pairs" -> (d04SimhashPairs _),
    "d05_simhashes" -> (d05Simhashes _),
    "d07_repeated_spans" -> (d07RepeatedSpans _),
    "d08_dup_share" -> (d08DupShare _)
  )

  val oracles: Map[String, String] = Map(
    "d14_prefix_jaccard" -> d14Oracle,
    "d13_editdist_pairs" -> d13Oracle,
    "d12_incremental_dedup" -> d12Oracle,
    "d11_dedup_apply" -> d11Oracle,
    "d10_cc_groups" -> d10Oracle,
    "d09_chunk_dup_share" -> d09Oracle,
    "d01_exact_dedup" -> d01Oracle,
    "d02_jaccard_pairs" -> d02Oracle,
    "d03_minhash_lsh" -> d03Oracle,
    "d04_simhash_pairs" -> d04Oracle,
    "d05_simhashes" -> d05Oracle,
    "d07_repeated_spans" -> d07Oracle,
    "d08_dup_share" -> d08Oracle
  )
}
