package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale document pipelines, all as
  * pure Column expressions (whole-stage-codegen friendly; no UDFs in the
  * hot path). Used by dedup (shingles→MinHash/Jaccard), language ID,
  * quality scoring, token counting, and fingerprinting.
  *
  * Counting conventions are chosen so a DuckDB oracle can reproduce them
  * with `string_split_regex`/`len` exactly.
  */
object Text {

  /** Whitespace normalization: lower, collapse runs of whitespace, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) — native codegen
    * expression ([[graft.functions.expr.UnicodeNorm]]) with an
    * ASCII identity fast path. Pipelines run this BEFORE any hashing or
    * shingling step: composed vs decomposed encodings of the same
    * visible text must not fingerprint as distinct documents.
    */
  def unicodeNorm(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.UnicodeNorm(
        org.apache.spark.sql.GraftColumnShim.expression(c), form))

  /** Whitespace tokens of the *raw* string (empty string → 0 tokens).
    * Trims with a regex, not `trim()`: SQL trim strips only ' ' and a
    * trailing tab/newline would otherwise produce a trailing "" token.
    */
  def tokens(c: Column): Column = {
    val t = regexp_replace(c, "^\\s+|\\s+$", "")
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols each count as one token (a common pre-tokenizer
    * approximation; deterministic and regex-reproducible in any engine).
    */
  def subwordCount(c: Column): Column =
    size(tokens(regexp_replace(c, "([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])", " $1 ")))

  /** Word n-gram shingles over whitespace tokens, joined by single
    * spaces. Documents shorter than n shingle to the full normalized
    * text (so every doc has ≥1 shingle).
    *
    * Implementation note: built by zipping n shifted copies of the token
    * array rather than `transform(sequence(...), i => slice(toks, i, n))`.
    * A lambda that captures an outer non-attribute expression re-evaluates
    * it per element — with `toks` that meant re-running the regex split
    * once per shingle position (quadratic per document; a 5k-doc corpus
    * scan took ~16 s instead of ~1 s). zip_with's array operands are
    * evaluated once per row and its lambda sees only elements, so this
    * form is linear.
    */
  def shingles(c: Column, n: Int): Column = shinglesOfToks(tokens(normalize(c)), n)

  /** As [[shingles]] over an existing token-array column — native
    * one-pass codegen Expression ([[graft.functions.expr.WordNgrams]]).
    * The historical zip_with-fold form survives as the
    * differential-test twin [[shinglesOfToksHof]]; its n−1 chained
    * higher-order functions were CodegenFallback, taxing every shingle
    * consumer (Jaccard, MinHash, decontamination, fingerprints) with
    * interpreted per-element lambdas.
    */
  def shinglesOfToks(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.expr.WordNgrams(
        org.apache.spark.sql.GraftColumnShim.expression(toks), n))

  /** Reference HOF implementation of [[shinglesOfToks]] — kept ONLY as
    * the differential-test twin of the native expression (and as
    * executable documentation of the exact null/short-doc semantics).
    */
  private[graft] def shinglesOfToksHof(toks: Column, n: Int): Column = {
    val m = size(toks)
    // n−1 shifted copies: shifted(k) = toks[k+1 ..] (1-based slice)
    val shifted = (1 until n).map(k => slice(toks, lit(k + 1), greatest(m - k, lit(0))))
    // fold with concat; zip_with pads the shorter side with null and
    // concat propagates it, so the invalid tail becomes nulls we slice off
    val combined = shifted.foldLeft(toks) { (acc, arr) =>
      zip_with(acc, arr, (a, b) => concat(a, lit(" "), b))
    }
    when(m >= n, slice(combined, lit(1), m - (n - 1)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Distinct shingle set (order-normalized so set semantics are stable). */
  def shingleSet(c: Column, n: Int): Column =
    array_sort(array_distinct(shingles(c, n)))

  /** Content fingerprint: md5 of the normalized text — the exact-dedup
    * key (reference analogue: content hash per file,
    * /root/reference/src/file_indexing_system.py:100-118).
    */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** HTML → text extraction, the first step of every web-corpus
    * pipeline (CommonCrawl-style): drop script/style/comment blocks
    * wholesale, strip remaining tags to spaces, decode the common
    * entities, collapse whitespace. Pure codegen'd `regexp_replace` /
    * `replace` chain — one narrow projection pass at any corpus size.
    *
    * Decode order is load-bearing: `&amp;` decodes LAST, so the
    * double-encoded `&amp;lt;` yields the literal text `&lt;` (correct)
    * instead of `<` (a double decode). The t16 oracle replays the
    * identical chain in DuckDB (both engines' regex dialects accept the
    * inline `(?is)` flags), pinning every step byte-for-byte.
    */
  def htmlStrip(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Native rolling hash (graft.functions.expr.RollingHash, registered
    * by GraftExtensions — whole-stage-codegen, engine-reproducible).
    */
  def rollingHash(c: Column): Column = call_function("rolling_hash", c)

  /** Winnowing document fingerprints (Schleimer et al., MOSS): rolling
    * hashes of word n-gram shingles, then the min of every w-window,
    * deduplicated — a compact, position-robust fingerprint set for
    * near-dup detection at corpus scale. Guarantees any shared run of
    * ≥ n+w−1 tokens yields a shared fingerprint.
    *
    * NOTE: single-Column convenience form — fine for ad-hoc use, but a
    * lambda referencing an outer non-attribute array re-evaluates it per
    * element (quadratic). Corpus scans must use
    * [[withWinnowFingerprints]], which materializes the hash array as an
    * attribute first.
    */
  /** Sliding-min winnow over a hash-array Column — the one shared
    * implementation behind both winnow entry points (they must never
    * drift in window bounds or the short-document branch).
    */
  private def winnowOfHashes(hs: Column, w: Int): Column =
    when(
      size(hs) >= w,
      array_sort(array_distinct(
        transform(sequence(lit(1), size(hs) - (w - 1)), i => array_min(slice(hs, i, lit(w))))))
    ).otherwise(array(array_min(hs)))

  def winnowFingerprints(c: Column, n: Int = 3, w: Int = 4): Column =
    winnowOfHashes(transform(shingles(c, n), s => rollingHash(s)), w)

  /** Scalable winnowing: appends `outCol` (array<long> fingerprint set)
    * to `df`. The shingle-hash array lands in its own projection so the
    * sliding-min lambdas reference a cheap attribute — linear work per
    * document.
    */
  def withWinnowFingerprints(
      df: org.apache.spark.sql.DataFrame,
      text: Column,
      outCol: String,
      n: Int = 3,
      w: Int = 4): org.apache.spark.sql.DataFrame = {
    val hsCol = "__graft_winnow_hs"
    df.withColumn(hsCol, transform(shingles(text, n), s => rollingHash(s)))
      .withColumn(outCol, winnowOfHashes(col(hsCol), w))
      .drop(hsCol)
  }

  /** Stopword-profile language ID. Counts hits of a tiny per-language
    * stopword regex over the token stream and returns the argmax with a
    * deterministic tiebreak (language code ascending). Pure heuristic —
    * the point is the *shape* (scalable scoring + argmax), not NLP
    * accuracy.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "is", "to", "in"),
    "es" -> Seq("el", "los", "las", "es", "y", "que"),
    "fr" -> Seq("le", "les", "est", "et", "une", "dans"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在")
  )

  /** Number of tokens of `c` that are in `words` (exact token match). */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(normalize(c)), t => t.isInCollection(words)))

  /** Language id from an ALREADY-tokenized column — the per-row
    * tokenize pipeline runs once no matter how many language profiles
    * score it. [[langId]]'s text form inlines `tokens(normalize(c))`
    * into every profile's hit count, and the `filter` HOF is
    * interpreted (no codegen, no common-subexpression elimination), so
    * the regex pipeline re-runs per profile — hoist the token array
    * through a projection boundary (CollapseProject keeps a non-cheap
    * multiply-referenced alias) and score with this form instead
    * (measured ~N_profiles× on the scoring stage).
    */
  def langIdFromToks(toksCol: Column, textNotNull: Column): Column = {
    // struct(score, negated-lang) max ⇒ argmax with asc-code tiebreak:
    // greatest() on structs compares fields left-to-right, so equal
    // scores fall back to comparing codes; negate by mapping code →
    // its rank descending so the *smallest* code wins ties.
    val scored = langProfiles.zipWithIndex.map { case ((code, words), i) =>
      struct(
        size(filter(toksCol, t => t.isInCollection(words))).as("score"),
        lit(langProfiles.size - i).as("pri"),
        lit(code).as("code")
      )
    }
    // NULL text: every score is NULL, struct comparison would fall
    // through to the pri tiebreak and confidently answer the
    // highest-priority language — return NULL instead
    when(textNotNull, greatest(scored: _*).getField("code"))
  }

  def langId(c: Column): Column =
    langIdFromToks(tokens(normalize(c)), c.isNotNull)

  /** Characters that are NOT punctuation: Unicode letters and digits
    * (`ü`, `ß`, `的` are letters, not markup) plus an EXPLICIT
    * whitespace class — Java `\s` includes vertical tab while RE2
    * (DuckDB) `\s` does not, so the shared class must spell the
    * characters out for cross-engine bit-parity.
    */
  val NonPunctClass: String = "[\\p{L}\\p{N}\\t\\n\\x0B\\f\\r ]"

  /** Punctuation ratio: non-letter, non-digit, non-whitespace characters
    * per character (0.0 for empty docs). High values mark
    * markup/boilerplate — in ANY script, not just ASCII.
    */
  def punctRatio(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nPunct = length(regexp_replace(c, NonPunctClass, "")).cast("double")
    when(nChars > 0, nPunct / nChars).otherwise(lit(0.0))
  }

  /** Stopword ratio: fraction of tokens that are stopwords of ANY
    * profiled language (0.0 for tokenless docs). Natural prose sits
    * well above machine-generated or keyword-stuffed text. (Whitespace
    * tokenization means unsegmented CJK text scores 0 — pair with
    * [[langId]] before gating on it.)
    *
    * The token subtree appears in condition/numerator/divisor; codegen's
    * common-subexpression elimination evaluates it once per row.
    */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(normalize(c))
    when(size(toks) > 0,
      stopwordHits(c, langProfiles.flatMap(_._2)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length docs, real
    * word lengths, and alphabetic content. All integer/ratio arithmetic
    * (deterministic across engines).
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nToks = tokenCount(c).cast("double")
    val alpha = length(regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    val avgTokLen = when(nToks > 0, nChars / nToks).otherwise(lit(0.0))
    val lenScore = least(nChars / lit(200.0), lit(1.0))
    val alphaRatio = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    val tokScore = when(avgTokLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    // no rounding: Spark round() (BigDecimal HALF_UP) and DuckDB round()
    // (multiply-round-divide) can differ in the last ulp; the raw ops
    // here are bit-identical across engines.
    lenScore * 0.4 + alphaRatio * 0.4 + tokScore * 0.2
  }

  // --------------------------------------------------------------- PII

  /** PII patterns — single owners shared by the Column functions and the
    * DuckDB oracle twins so the engines cannot drift. Every pattern is
    * chosen to mean the same thing in Java regex AND RE2 (no \b, no
    * backrefs, no lookaround — RE2 lacks the latter two and the shared
    * subset keeps redaction bit-identical cross-engine).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val IdNumberPattern: String = "\\d{3}-\\d{2}-\\d{4}" // SSN-shaped

  /** Non-overlapping match counts per document (reference analogue: the
    * finding scanners of /root/reference/src/analyzers; here as corpus
    * hygiene for training-data pipelines).
    */
  def piiEmailCount(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def piiIpv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Pattern))
  def piiIdCount(c: Column): Column = regexp_count(c, lit(IdNumberPattern))

  /** Redacted text: emails first (an address may contain digit runs
    * that would otherwise half-match the narrower patterns), then IPv4,
    * then id numbers — the SAME order as the oracle twin. Pure
    * composition of codegen'd regexp_replace, no UDF.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      IdNumberPattern, "[ID]")
}
