package graft.queries

/** Shared DuckDB oracle fragments that mirror graft.functions.Text —
  * single-owner so the SQL twin of the tokenizer cannot drift between
  * query packs (t-queries and the curation composites both lean on it).
  */
object DuckOracle {

  /** Whitespace tokens of the RAW text — regex trim mirrors Text.tokens
    * (SQL trim() only strips spaces).
    */
  val toksRaw: String =
    """string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')"""

  /** Whitespace tokens of the NORMALIZED (lowercased, collapsed) text —
    * mirrors Text.tokens(Text.normalize(...)).
    *
    * Known cross-engine caveat: Java `\s` includes vertical tab (0x0B),
    * RE2's does not — a VT character in a document diverges the token
    * split. Testdata contains none; fragments that must be VT-proof use
    * the explicit class below instead.
    */
  val toksNorm: String =
    """string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')"""

  /** SQL twin of Text.NonPunctClass — the SAME string (valid in both
    * Java regex and RE2), referenced rather than copied so the engines
    * cannot drift.
    */
  val nonPunctClass: String = graft.functions.Text.NonPunctClass

  /** Quote a literal word list for an IN/list expression, doubling any
    * embedded single quotes (a future stopword like "qu'" must not
    * produce invalid oracle SQL).
    */
  def quoteList(words: Seq[String]): String =
    words.map(w => "'" + w.replace("'", "''") + "'").mkString(", ")

  /** DuckDB strict left fold of `body(i)` over the elements of list
    * column `arr` (1-based `i`), starting at 0.0 — matches Spark's
    * `aggregate(..., lit(0.0), _+_)` exactly. Single owner of the
    * vector-arithmetic replay shared by the v-queries and the hybrid
    * retrieval oracle.
    */
  def duckFold(arr: String, body: String): String =
    s"list_reduce([CAST(0 AS DOUBLE)] || list_transform(generate_series(1, len($arr)), i -> $body), (a, b) -> a + b)"

  /** Strict-fold dot product — Spark `Vectors.dot` twin. */
  def duckDot(a: String, b: String): String =
    duckFold(a, s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)")

  /** Strict-fold L2 norm — Spark `Vectors.norm2` twin. */
  def duckNorm(a: String): String =
    s"sqrt(${duckFold(a, s"CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)")})"

  /** DuckDB twin of [[graft.functions.Hashing.h60]]: first 15 hex chars
    * of md5 folded to a BIGINT digit-by-digit — bit-identical to Spark's
    * `conv(substring(md5(x),1,15),16,10)`. Single owner for every oracle
    * that replays an h60-derived key (dedup postings, sampling
    * membership, bucket/shard assignment).
    */
  def h60(e: String): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split(substr(md5($e), 1, 15), ''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a*16 + b)"

  /** The full deterministic-HLL register pipeline (p=6, the
    * [[graft.operators.Sketches.hllSketchByKey]] twin) as oracle CTEs
    * ending in `${sfx}_est(key, v_zero, est_micro, regs_fp)`: h60 →
    * (idx = top 6 bits, rest = low 54) → rho via ltrim-of-bin bit
    * length (integer-exact — both engines emit minimal binary) →
    * register max → the 64-cell grid → exact HUGEINT harmonic sum →
    * the branchy estimate in micro-units. The divide constant is
    * [[graft.operators.Sketches.hllEstimateConstant]]'s exact double,
    * interpolated so both engines divide from identical bits. Single
    * owner for every HLL replay (q43/q44 on lineitem, e15 on events).
    */
  /** The bottom-k (h60(id), value) pair-sample pipeline (the
    * [[graft.operators.Sketches.pairSampleByKey]] →
    * [[graft.operators.Sketches.quantilesFromSample]] twin) as oracle
    * CTEs ending in `${sfx}_est(key, n, m_sample, p<q>…, sample_fp)`:
    * membership = the k lexicographically smallest (h, v) pairs per
    * key, quantiles = nearest-rank-lower over the v-sorted sample,
    * `sample_fp` pinning every kept pair. Null key/id/value rows are
    * excluded exactly like the operator. Single owner for every
    * pair-sample replay (q25/q27 on documents, e16 on events).
    */
  def pairSampleSql(
      sfx: String, fromSql: String, keySql: String, idSql: String,
      valueSql: String, k: Int, qs: Seq[Double],
      extraWhere: String = ""): String = {
    val h = h60(idSql)
    // same whole-percent naming (and the same collision refusal) as
    // Sketches.quantilesFromSample — drifting fractions would emit
    // duplicate SQL columns
    val pnamesAll = qs.map(q => s"p${math.round(q * 100)}")
    require(pnamesAll.distinct.size == pnamesAll.size,
      s"quantile fractions $qs collide on column name(s) " +
        s"${pnamesAll.diff(pnamesAll.distinct).distinct.mkString(", ")}")
    val pcols = qs.map { q =>
      s"    MAX(CASE WHEN vr = CAST(floor($q*(m-1)) AS BIGINT)+1 THEN v END)" +
        s" AS p${math.round(q * 100)}"
    }.mkString(",\n")
    val pnames = qs.map(q => s"p${math.round(q * 100)}").mkString(", ")
    s"""${sfx}_h AS (
       |  SELECT $keySql AS key, $h AS h, $valueSql AS v
       |  FROM $fromSql
       |  WHERE ($keySql) IS NOT NULL AND ($idSql) IS NOT NULL
       |    AND ($valueSql) IS NOT NULL$extraWhere
       |), ${sfx}_n AS (SELECT key, COUNT(*) AS n FROM ${sfx}_h GROUP BY key),
       |${sfx}_kept AS (
       |  SELECT key, h, v FROM ${sfx}_h
       |  QUALIFY row_number() OVER (PARTITION BY key ORDER BY h, v) <= $k
       |), ${sfx}_fp AS (
       |  SELECT key, CAST(COUNT(*) AS INT) AS m_sample,
       |    md5(string_agg(CAST(h AS VARCHAR) || ':' || CAST(v AS VARCHAR), ',' ORDER BY h, v)) AS sample_fp
       |  FROM ${sfx}_kept GROUP BY key
       |), ${sfx}_s AS (
       |  SELECT key, v,
       |    row_number() OVER (PARTITION BY key ORDER BY v, h) AS vr,
       |    COUNT(*) OVER (PARTITION BY key) AS m
       |  FROM ${sfx}_kept
       |), ${sfx}_q AS (
       |  SELECT key,
       |$pcols
       |  FROM ${sfx}_s GROUP BY key
       |), ${sfx}_est AS (
       |  SELECT n.key, n.n, fp.m_sample, $pnames, fp.sample_fp
       |  FROM ${sfx}_n n JOIN ${sfx}_fp fp ON n.key = fp.key
       |  JOIN ${sfx}_q q ON n.key = q.key
       |)""".stripMargin
  }

  def hllSql(
      sfx: String, fromSql: String, keySql: String, valueSql: String,
      extraWhere: String = ""): String = {
    val h = h60(valueSql)
    val c = graft.operators.Sketches.hllEstimateConstant(6)
    s"""${sfx}_h AS (
       |  SELECT DISTINCT $keySql AS key, $h AS h
       |  FROM $fromSql WHERE $valueSql IS NOT NULL$extraWhere
       |), ${sfx}_rr AS (
       |  SELECT key, CAST(h // 18014398509481984 AS INT) AS idx,
       |    h % 18014398509481984 AS rest FROM ${sfx}_h
       |), ${sfx}_reg AS (
       |  SELECT key, idx,
       |    MAX(CASE WHEN rest = 0 THEN 55
       |             ELSE 55 - length(ltrim(bin(rest), '0')) END) AS r
       |  FROM ${sfx}_rr GROUP BY key, idx
       |), ${sfx}_regs AS (
       |  SELECT g.key, g.idx, COALESCE(r.r, 0) AS r
       |  FROM (SELECT k.key, gs.i AS idx
       |        FROM (SELECT DISTINCT key FROM ${sfx}_h) k,
       |             generate_series(0, 63) gs(i)) g
       |  LEFT JOIN ${sfx}_reg r ON g.key = r.key AND g.idx = r.idx
       |), ${sfx}_agg AS (
       |  SELECT key,
       |    CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
       |    SUM(CAST(1 AS BIGINT) << (60 - r)) AS s_scaled,
       |    md5(string_agg(CAST(r AS VARCHAR), ',' ORDER BY idx)) AS regs_fp
       |  FROM ${sfx}_regs GROUP BY key
       |), ${sfx}_est AS (
       |  SELECT key, v_zero, regs_fp,
       |    CAST(ROUND(CASE WHEN ($c / CAST(s_scaled AS DOUBLE)) <= 160.0
       |                         AND v_zero > 0
       |        THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
       |        ELSE $c / CAST(s_scaled AS DOUBLE) END * 1000000.0) AS BIGINT)
       |      AS est_micro
       |  FROM ${sfx}_agg
       |)""".stripMargin
  }
}
