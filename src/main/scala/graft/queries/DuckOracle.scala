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
}
