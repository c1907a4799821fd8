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
    */
  val toksNorm: String =
    """string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')"""
}
