package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Text-analysis coverage over the `documents` table: token counting,
  * language ID, quality scoring, fingerprinting, shingling, and binary
  * (multimodal-ish) metadata. DuckDB oracle fragments mirror the Column
  * expressions op-for-op so doubles come out bit-identical.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  /** DuckDB tokenizer twins — shared, single-owner (see DuckOracle). */
  private val duckToksRaw = DuckOracle.toksRaw
  private val duckToksNorm = DuckOracle.toksNorm

  /** Token counting: whitespace + BPE-ish subword counts (SURVEY add-on:
    * training-data token accounting).
    */
  def t01TokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        Text.tokenCount(col("text")).as("n_tokens"),
        Text.subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id")

  val t01Oracle: String =
    s"""SELECT doc_id, length(text) AS n_chars_calc,
       |  CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_tokens,
       |  CASE WHEN regexp_replace(regexp_replace(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', ' \\1 ', 'g'), '^\\s+|\\s+$$', '', 'g') = '' THEN 0
       |       ELSE len(string_split_regex(regexp_replace(regexp_replace(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', ' \\1 ', 'g'), '^\\s+|\\s+$$', '', 'g'), '\\s+')) END AS n_subwords
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Language ID via stopword-profile argmax (generated CASE chain keeps
    * the oracle in lockstep with [[Text.langProfiles]]).
    */
  def t02LangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // token array hoisted through a projection boundary so the
      // tokenize pipeline runs ONCE per row, not once per language
      // profile (see Text.langIdFromToks)
      .select(col("doc_id"), col("lang"), col("text"),
        Text.tokens(Text.normalize(col("text"))).as("__toks"))
      .select(col("doc_id"), col("lang"),
        Text.langIdFromToks(col("__toks"), col("text").isNotNull).as("pred_lang"))
      .orderBy("doc_id")

  /** The t02 prediction as a bare SELECT (doc_id, lang, pred_lang) —
    * shared verbatim by the t02 oracle and t22's confusion rollup, so
    * the two can never replay different predictors.
    */
  private val langPredSql: String = {
    val hits = Text.langProfiles.map { case (code, words) =>
      code -> s"len(list_filter($duckToksNorm, x -> list_contains([${DuckOracle.quoteList(words)}], x)))"
    }
    val codes = hits.map(_._1)
    // argmax with earliest-code tiebreak: code_i wins iff its hits >= all later codes'
    val cases = codes.dropRight(1).zipWithIndex.map { case (c, i) =>
      val ge = codes.drop(i + 1).map(o => s"h_$c >= h_$o").mkString(" AND ")
      s"WHEN $ge THEN '$c'"
    }
    s"""SELECT doc_id, lang,
       |  CASE WHEN text IS NULL THEN NULL ${cases.mkString(" ")} ELSE '${codes.last}' END AS pred_lang
       |FROM (SELECT doc_id, lang, text,
       |  ${hits.map { case (c, e) => s"$e AS h_$c" }.mkString(",\n  ")}
       |FROM documents)""".stripMargin
  }

  val t02Oracle: String = s"$langPredSql ORDER BY doc_id"

  /** Confusion matrix of the t02 language-ID predictor against the
    * labeled `lang` column — the classifier-eval query every langid
    * gate needs before it filters a corpus (which languages leak into
    * which buckets, and at what rate). Counts and row totals are exact
    * longs; recall shares are one exact-long division per cell. The
    * predictor is the SAME deterministic profile argmax as t02 (shared
    * SQL, shared Column expression), so the whole matrix replays. One
    * corpus pass + a dim-keyed rollup; the row-total attach broadcasts.
    */
  def t22LangidConfusion(s: SparkSession, dir: String): DataFrame = {
    val preds = docs(s, dir)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("text"),
        Text.tokens(Text.normalize(col("text"))).as("__toks"))
      .select(col("lang"),
        Text.langIdFromToks(col("__toks"), col("text").isNotNull).as("pred_lang"))
    val cells = preds.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    val rows = preds.groupBy("lang").agg(count(lit(1)).as("row_n"))
    cells.join(broadcast(rows), "lang")
      .select(col("lang"), col("pred_lang"), col("n"), col("row_n"),
        (col("n").cast("double") / col("row_n").cast("double")).as("recall_share"))
      .orderBy("lang", "pred_lang")
  }

  val t22Oracle: String =
    s"""WITH p0 AS ($langPredSql), p AS (
       |  -- pred_lang is null iff text is null: the Spark side's
       |  -- text-not-null filter, replayed on the prediction
       |  SELECT lang, pred_lang FROM p0 WHERE pred_lang IS NOT NULL
       |), cells AS (
       |  SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY lang, pred_lang
       |), r AS (
       |  SELECT lang, COUNT(*) AS row_n FROM p GROUP BY lang
       |)
       |SELECT cells.lang, cells.pred_lang, CAST(cells.n AS BIGINT) AS n,
       |  CAST(r.row_n AS BIGINT) AS row_n,
       |  CAST(cells.n AS DOUBLE) / CAST(r.row_n AS DOUBLE) AS recall_share
       |FROM cells JOIN r ON r.lang = cells.lang
       |ORDER BY cells.lang, cells.pred_lang""".stripMargin

  /** Quality scoring: length/alpha/token-shape heuristics, raw doubles
    * from identical op sequences in both engines.
    */
  def t03Quality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        Text.tokenCount(col("text")).as("n_tokens"),
        Text.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val t03Oracle: String =
    s"""SELECT doc_id, n_chars_calc, n_tokens,
       |  (least(CAST(n_chars_calc AS DOUBLE) / 200.0, 1.0) * 0.4
       |   + (CASE WHEN n_chars_calc > 0 THEN n_alpha / CAST(n_chars_calc AS DOUBLE) ELSE 0.0 END) * 0.4
       |   + (CASE WHEN CASE WHEN n_tokens > 0 THEN CAST(n_chars_calc AS DOUBLE) / n_tokens ELSE 0.0 END BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2) AS quality
       |FROM (SELECT doc_id, length(text) AS n_chars_calc,
       |        CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_tokens,
       |        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha
       |      FROM documents) ORDER BY doc_id""".stripMargin

  /** Punctuation + stopword ratios (the remaining quality-signal pair
    * of the text-analysis family) — division only where the denominator
    * is proven positive, so both engines agree bit-for-bit.
    */
  def t06Ratios(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        Text.punctRatio(col("text")).as("punct_ratio"),
        Text.stopwordRatio(col("text")).as("stopword_ratio"))
      .orderBy("doc_id")

  val t06Oracle: String = {
    val allStops = DuckOracle.quoteList(Text.langProfiles.flatMap(_._2))
    s"""SELECT doc_id,
       |  CASE WHEN length(text) > 0
       |    THEN CAST(length(regexp_replace(text, '${DuckOracle.nonPunctClass}', '', 'g')) AS DOUBLE) / length(text)
       |    ELSE 0.0 END AS punct_ratio,
       |  CASE WHEN n_toks > 0
       |    THEN CAST(n_stop AS DOUBLE) / n_toks ELSE 0.0 END AS stopword_ratio
       |FROM (
       |  SELECT doc_id, text,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksNorm) END AS n_toks,
       |    len(list_filter($duckToksNorm, x -> list_contains([$allStops], x))) AS n_stop
       |  FROM documents
       |) ORDER BY doc_id""".stripMargin
  }

  /** Fingerprint + shingle stats (the primitives under MinHash dedup). */
  def t04Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        Text.fingerprint(col("text")).as("fp"),
        size(Text.shingles(col("text"), 3)).as("n_shingles"),
        size(Text.shingleSet(col("text"), 3)).as("n_distinct_shingles"))
      .orderBy("doc_id")

  val t04Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       |    string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, fp,
       |    CASE WHEN len(toks) >= 3
       |         THEN list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |         ELSE [array_to_string(toks, ' ')] END AS shingles
       |  FROM t
       |)
       |SELECT doc_id, fp, len(shingles) AS n_shingles, len(list_distinct(shingles)) AS n_distinct_shingles
       |FROM sh ORDER BY doc_id""".stripMargin

  /** Multimodal plumbing: opaque binary column + typed metadata —
    * byte length and sha256 over the content bytes (stands in for
    * image/audio payloads; decode itself is stubbed in
    * graft.multimodal).
    */
  def m01BinaryMeta(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha256"))
      .orderBy("doc_id")

  val m01Oracle: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprints over the native rolling_hash Catalyst
    * expression (MOSS-style): whole-document rolling hash + windowed-min
    * fingerprint stats. The oracle refolds the identical integer
    * arithmetic in DuckDB — differential proof of the custom expression
    * AND the winnowing pipeline.
    */
  def t05Winnow(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      col("doc_id"), col("text"),
      Text.rollingHash(Text.normalize(col("text"))).as("rh"))
    Text.withWinnowFingerprints(base, col("text"), "fps", n = 3, w = 4)
      .select(
        col("doc_id"), col("rh"),
        size(col("fps")).as("n_fps"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy("doc_id")
  }

  val t05Oracle: String = {
    def rh(x: String): String =
      s"list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split($x, ''), c -> CAST(unicode(c) AS BIGINT)), (a, b) -> (a*31 + b) % 2147483647)"
    s"""WITH t AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
       |    string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id, norm,
       |    CASE WHEN len(toks) >= 3
       |      THEN list_transform(generate_series(1, len(toks)-2), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [array_to_string(toks, ' ')] END AS shingles
       |  FROM t
       |), h AS (
       |  SELECT doc_id, ${rh("norm")} AS rh,
       |    list_transform(shingles, s -> ${rh("s")}) AS hs
       |  FROM sh
       |), w AS (
       |  SELECT doc_id, rh,
       |    CASE WHEN len(hs) >= 4
       |      THEN list_transform(generate_series(1, len(hs)-3), i -> list_min(hs[i:i+3]))
       |      ELSE [list_min(hs)] END AS wins
       |  FROM h
       |)
       |SELECT doc_id, rh, len(list_distinct(wins)) AS n_fps,
       |  list_min(wins) AS min_fp, list_max(wins) AS max_fp
       |FROM w ORDER BY doc_id""".stripMargin
  }

  /** Multimodal feature-extraction plumbing as a runnable query:
    * documents' bytes ride the canonical media schema through the
    * partition-parallel (stubbed) decoder. The stub's modular fold is
    * replayed in DuckDB byte-for-byte (UTF-8 bytes recovered from the
    * hex dump of the blob), so the mapPartitions plumbing AND the
    * feature values are oracle-gated.
    */
  def m02MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = docs(s, dir).select(
      col("doc_id").as("media_id"),
      lit("binary").as("modality"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("content"))
    graft.multimodal.Media.extractFeatures(media, dim = 8)
      .select(col("media_id"), col("n_bytes"), element_at(col("features"), 1).as("f0"))
      .orderBy("media_id")
  }

  /** DuckDB replay of [[graft.multimodal.Media.fakeFeatures]]: bytes of
    * the UTF-8 blob via hex-pair decode → base-31 rolling hash mod
    * 2^31−1 (seed 1) → one LCG step → (h mod 4096)/4096 as REAL
    * (n/2^12 is exactly representable in float32, so the cast is
    * lossless in both engines).
    */
  val m02Oracle: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id, COALESCE(encode(text), encode('')) AS blob FROM documents
      |), hx AS (
      |  SELECT media_id, octet_length(blob) AS n_bytes, hex(blob) AS hs FROM b
      |), h0 AS (
      |  SELECT media_id, n_bytes,
      |    list_reduce([CAST(1 AS BIGINT)] || list_transform(generate_series(1, n_bytes),
      |      i -> CAST(strpos('0123456789ABCDEF', substr(hs, 2*i-1, 1)) - 1 AS BIGINT) * 16
      |         + CAST(strpos('0123456789ABCDEF', substr(hs, 2*i, 1)) - 1 AS BIGINT)),
      |      (a, b) -> (a*31 + b) % 2147483647) AS h
      |  FROM hx
      |)
      |SELECT media_id, CAST(n_bytes AS INT) AS n_bytes,
      |  CAST((((h * 1103515245 + 12345) % 2147483647) % 4096) / 4096.0 AS REAL) AS f0
      |FROM h0 ORDER BY media_id""".stripMargin

  /** WAV leg of the multimodal family, end to end through the REAL
    * audio parser: document bytes ride a canonical RIFF container
    * ([[graft.multimodal.Media.buildWav]]) and are decoded back by
    * [[graft.multimodal.Media.parseWav]] — header fields, 16-bit LE
    * sample extraction and the integer feature fold are all exercised,
    * and DuckDB replays every value from the blob's hex dump (samples
    * are just the byte pairs the container carries). The spectral
    * fingerprint over the same parser is pinned in MultimodalSpec
    * (trig folds aren't portably replayable in SQL).
    */
  def m03WavFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Media
    val wavUdf = udf((b: Array[Byte]) => {
      val data = if (b == null) Array.empty[Byte] else b
      Media.parseWav(Media.buildWav(8000, 1, data)).map(Media.wavIntFeatures)
    })
    docs(s, dir)
      .select(col("doc_id").as("media_id"), wavUdf(col("text").cast("binary")).as("f"))
      .select(
        col("media_id"),
        col("f._1").as("n_samples"),
        col("f._2").as("sample_rate"),
        col("f._3").as("zero_cross"),
        col("f._4").as("abs_sum"),
        col("f._5").as("samp_hash"))
      .orderBy("media_id")
  }

  /** DuckDB replay of the WAV leg: UTF-8 blob bytes via hex-pair
    * decode → 16-bit LE samples (lo + 256·hi, sign-fold at 32768) →
    * sample count / sign changes / Σ|s| / base-31 rolling hash of the
    * unsigned stream (seed 1, mod 2^31−1) — integer arithmetic only,
    * so the gate is exact at any SF.
    */
  val m03Oracle: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id, COALESCE(encode(text), encode('')) AS blob FROM documents
      |), hx AS (
      |  SELECT media_id, octet_length(blob) AS nb, hex(blob) AS hs FROM b
      |), s AS (
      |  SELECT media_id, nb // 2 AS ns,
      |    list_transform(generate_series(1, nb // 2), j ->
      |      CAST(strpos('0123456789ABCDEF', substr(hs, 4*j-3, 1)) - 1 AS BIGINT)*16
      |      + CAST(strpos('0123456789ABCDEF', substr(hs, 4*j-2, 1)) - 1 AS BIGINT)
      |      + (CAST(strpos('0123456789ABCDEF', substr(hs, 4*j-1, 1)) - 1 AS BIGINT)*16
      |         + CAST(strpos('0123456789ABCDEF', substr(hs, 4*j, 1)) - 1 AS BIGINT)) * 256
      |    ) AS us
      |  FROM hx
      |), f AS (
      |  SELECT media_id, ns, us,
      |    list_transform(us, u -> CASE WHEN u < 32768 THEN u ELSE u - 65536 END) AS ss
      |  FROM s
      |)
      |SELECT media_id,
      |  CAST(ns AS INT) AS n_samples,
      |  CAST(8000 AS INT) AS sample_rate,
      |  CAST(len(list_filter(generate_series(2, ns), j -> (ss[j-1] >= 0) <> (ss[j] >= 0))) AS INT) AS zero_cross,
      |  CAST(COALESCE(list_sum(list_transform(ss, x -> abs(x))), 0) AS BIGINT) AS abs_sum,
      |  CAST(list_reduce([CAST(1 AS BIGINT)] || us, (a, b) -> (a*31 + b) % 2147483647) AS BIGINT) AS samp_hash
      |FROM f ORDER BY media_id""".stripMargin

  /** Gopher/RefinedWeb-style repetition signals per document: distinct-
    * token ratio and top-bigram mass. Machine-generated or boilerplate
    * text repeats itself; these are the standard cheap gates before the
    * expensive dedup passes.
    *
    * Plan shape: the per-doc bigram histogram is an explode + two-level
    * partial aggregate — explode preserves row locality, so the map-side
    * combine finishes each document's counts locally and the shuffle
    * carries one row per doc. The narrow stats join back on doc_id.
    */
  def t07Repetition(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(
      col("doc_id"),
      Text.tokens(Text.normalize(col("text"))).as("toks"))
    val stats = base.select(
      col("doc_id"),
      size(col("toks")).as("n_tokens"),
      size(array_distinct(col("toks"))).as("n_distinct"),
      Text.shinglesOfToks(col("toks"), 2).as("grams"))
    // ONE corpus scan: the per-doc token stats ride the gram explode as
    // constant columns (first() through both aggregates) instead of a
    // second tokenizer pass + join — the same double-scan disease the
    // c01 rewrite removed
    val gramStats = stats
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        explode(col("grams")).as("g"))
      .groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c"),
        first("n_tokens").as("n_tokens"), first("n_distinct").as("n_distinct"))
      .groupBy("doc_id")
      .agg(max("c").as("top2_cnt"), sum("c").as("n_grams"),
        first("n_tokens").as("n_tokens"), first("n_distinct").as("n_distinct"))
    gramStats
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        when(col("n_tokens") > 0,
          col("n_distinct").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("distinct_frac"),
        col("top2_cnt"), col("n_grams"),
        (col("top2_cnt").cast("double") / col("n_grams")).as("top2_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB replay: same tokenizer twin, same 2-gram CASE fallback as
    * the d03 shingle oracle (docs shorter than 2 tokens contribute the
    * whole normalized text as their one "gram", so n_grams ≥ 1 and the
    * top2 division never hits zero).
    */
  val t07Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, $duckToksNorm AS toks FROM documents
       |), g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
       |    THEN list_transform(generate_series(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1])
       |    ELSE [array_to_string(toks, ' ')] END) AS g
       |  FROM t
       |), gc AS (
       |  SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g
       |), gs AS (
       |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top2_cnt, CAST(sum(c) AS BIGINT) AS n_grams
       |  FROM gc GROUP BY doc_id
       |)
       |SELECT t.doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct,
       |  CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS distinct_frac,
       |  gs.top2_cnt, gs.n_grams,
       |  CAST(gs.top2_cnt AS DOUBLE) / gs.n_grams AS top2_frac
       |FROM t JOIN gs ON gs.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** PII detection + redaction per document (corpus hygiene): match
    * counts for email/IPv4/SSN-shaped patterns and the fingerprint of
    * the redacted text. Pure codegen'd regexp over one narrow scan —
    * the redaction pass a 100 TB pipeline would run before anything
    * else ships downstream. Patterns are single-owner constants on
    * [[Text]] (valid in both Java regex and RE2, so the oracle replays
    * the same matches).
    */
  def t08Pii(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        Text.piiEmailCount(col("text")).as("n_emails"),
        Text.piiIpv4Count(col("text")).as("n_ipv4"),
        Text.piiIdCount(col("text")).as("n_ids"),
        md5(Text.redactPii(col("text"))).as("redacted_fp"))
      .orderBy("doc_id")

  val t08Oracle: String = {
    val em = graft.functions.Text.EmailPattern
    val ip = graft.functions.Text.Ipv4Pattern
    val id = graft.functions.Text.IdNumberPattern
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '$em')) AS n_emails,
       |  len(regexp_extract_all(text, '$ip')) AS n_ipv4,
       |  len(regexp_extract_all(text, '$id')) AS n_ids,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$em', '[EMAIL]', 'g'),
       |    '$ip', '[IP]', 'g'),
       |    '$id', '[ID]', 'g')) AS redacted_fp
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Video temporal hash (F4) over the documents' bytes as the
    * stand-in payload — [[graft.multimodal.Media.videoHash60]]: the
    * stubbed frame sampling, per-frame average-hash and majority-vote
    * combine are ALL integer arithmetic, so the oracle replays every
    * bit from the blob's hex dump (same gate strength as m02/m03 —
    * the plumbing AND the numbers are cross-engine checked, only the
    * frame-grab stage itself is a documented stub).
    */
  def m04VideoHash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id").as("media_id"),
        // coalesce mirrors the oracle's COALESCE(encode(text), encode('')):
        // a NULL-text doc must count 0 bytes on BOTH sides, not NULL here
        // and 0 there (latent gate divergence — review finding)
        octet_length(coalesce(col("text"), lit(""))).as("n_bytes"),
        graft.multimodal.Media.videoHash60Col(col("text").cast("binary")).as("vhash60"))
      .orderBy("media_id")

  /** DuckDB replay of [[graft.multimodal.Media.videoHash60]] (8
    * frames): window w of n bytes is [w·n/8, (w+1)·n/8); pixel j of a
    * non-empty window is the byte at start + j·wlen/64 (hex-pair
    * decode); a frame sets bit j<60 iff pixel j > Σpixels//64; the
    * hash sets bit j iff more than 4 of the 8 frames set it. Empty
    * payloads and all-zero-vote docs come back 0 via the left join.
    */
  val m04Oracle: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id, COALESCE(encode(text), encode('')) AS blob FROM documents
      |), hx AS (
      |  SELECT media_id, octet_length(blob) AS n, hex(blob) AS hs FROM b
      |), wj AS (
      |  SELECT media_id, gw.w AS w, gj.j AS j, hs,
      |    (gw.w*n)//8 + (gj.j * (((gw.w+1)*n)//8 - (gw.w*n)//8))//64 AS idx
      |  FROM hx, generate_series(0, 7) AS gw(w), generate_series(0, 63) AS gj(j)
      |  WHERE ((gw.w+1)*n)//8 - (gw.w*n)//8 > 0
      |), pv AS (
      |  SELECT media_id, w, j,
      |    CAST(strpos('0123456789ABCDEF', substr(hs, CAST(2*idx+1 AS INT), 1)) - 1 AS BIGINT)*16
      |    + CAST(strpos('0123456789ABCDEF', substr(hs, CAST(2*idx+2 AS INT), 1)) - 1 AS BIGINT) AS v
      |  FROM wj
      |), fm AS (
      |  SELECT media_id, w, SUM(v)//64 AS mean FROM pv GROUP BY media_id, w
      |), votes AS (
      |  SELECT pv.media_id, pv.j, COUNT(*) AS c
      |  FROM pv JOIN fm ON pv.media_id = fm.media_id AND pv.w = fm.w
      |  WHERE pv.j < 60 AND pv.v > fm.mean
      |  GROUP BY pv.media_id, pv.j
      |), h AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN c*2 > 8 THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS vhash60
      |  FROM votes GROUP BY media_id
      |)
      |SELECT hx.media_id, CAST(hx.n AS INT) AS n_bytes,
      |  COALESCE(h.vhash60, 0) AS vhash60
      |FROM hx LEFT JOIN h USING (media_id) ORDER BY media_id""".stripMargin

  /** Deterministic Y4M (YUV4MPEG2) fixture: 32×24 C420, 10 frames,
    * luma(vid, frame, row, col) = (vid·37 + frame·11 + row·5 + col·3)
    * mod 256, chroma planes pinned to 128 (the hash must ignore them —
    * a wrong plane offset in the parser would read chroma bytes and
    * the oracle replay below would catch every bit). Built driver-side
    * (~11 KB per video); the PIXEL FORMULA is the replayable ground
    * truth, so the oracle needs no blob hex-dump.
    */
  private def y4mFixture(vid: Int): Array[Byte] = {
    val (w, h, f) = (32, 24, 10)
    val out = new java.io.ByteArrayOutputStream(64 + f * (6 + w * h * 3 / 2))
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    var fi = 0
    while (fi < f) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) { out.write((vid * 37 + fi * 11 + r * 5 + c * 3) % 256); c += 1 }
        r += 1
      }
      var k = 0
      while (k < (w / 2) * (h / 2) * 2) { out.write(128); k += 1 }
      fi += 1
    }
    out.toByteArray
  }

  /** REAL video-container temporal hash (the round-8 F3 stub closed):
    * [[graft.multimodal.Media.videoHash60]] detects the Y4M container,
    * parses its frame structure, and hashes genuine luma planes — 8
    * frames sampled at even temporal stride from the 10 on disk, 8×8
    * even-stride spatial resample, per-frame mean threshold, majority
    * vote. The oracle replays EVERY bit from the fixture's pixel
    * formula (frame selection, spatial sampling, means, votes), so the
    * whole decode-and-hash pipeline is cross-engine gated — only
    * compressed codecs remain out of scope (they fall back to the
    * documented content-hash path, gated by m04).
    */
  def m05Y4mVideoHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    (0 until 12).map(v => (v.toLong, y4mFixture(v))).toDF("media_id", "payload")
      .select(col("media_id"),
        graft.multimodal.Media.videoHash60Col(col("payload")).as("vhash60"))
      .orderBy("media_id")
  }

  /** DuckDB replay of the Y4M path: sampled frame fi = (w·10)//8 for
    * window w < 8; pixel j reads luma row (j//8)·(24//8), col
    * (j%8)·(32//8) of frame fi via the fixture formula; bit j < 60 set
    * per frame iff pixel > Σpx//64; hash bit set iff > 4 of 8 windows
    * vote it.
    */
  val m05Oracle: String =
    """WITH vids AS (
      |  SELECT CAST(v AS BIGINT) AS media_id FROM generate_series(0, 11) AS g(v)
      |), win AS (
      |  SELECT media_id, gw.w AS w, (gw.w*10)//8 AS fi
      |  FROM vids, generate_series(0, 7) AS gw(w)
      |), pix AS (
      |  SELECT media_id, w, gj.j AS j,
      |    (media_id*37 + fi*11 + ((gj.j//8)*3)*5 + ((gj.j%8)*4)*3) % 256 AS v
      |  FROM win, generate_series(0, 63) AS gj(j)
      |), fm AS (
      |  SELECT media_id, w, SUM(v)//64 AS mean FROM pix GROUP BY media_id, w
      |), votes AS (
      |  SELECT pix.media_id, pix.j, COUNT(*) AS c
      |  FROM pix JOIN fm ON pix.media_id = fm.media_id AND pix.w = fm.w
      |  WHERE pix.j < 60 AND pix.v > fm.mean
      |  GROUP BY pix.media_id, pix.j
      |), h AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN c*2 > 8 THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS vhash60
      |  FROM votes GROUP BY media_id
      |)
      |SELECT vids.media_id, COALESCE(h.vhash60, 0) AS vhash60
      |FROM vids LEFT JOIN h USING (media_id) ORDER BY media_id""".stripMargin

  /** Precomputed-hash escape hatch for alien codecs (SURVEY §2.8 F3's
    * own prescription, closed): an H.264 corpus hashed ffmpeg-side
    * joins its hashes in as a column, and
    * [[graft.multimodal.Media.videoHash60OrPrecomputed]] uses them
    * verbatim — the decode path runs ONLY for rows without one
    * (coalesce short-circuits in codegen). Fixture: the m05 Y4M videos
    * with even media_ids carrying a deterministic "upstream" hash
    * (media_id·1000003 + 7 — values no decode could produce, so a
    * precedence bug flips the oracle) and odd ids decoding for real.
    * The oracle replays BOTH legs: the precomputed passthrough and the
    * m05 pixel-formula decode.
    */
  def m07PrecomputedVideoHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    (0 until 12).map { v =>
      val pre = if (v % 2 == 0) Some(v.toLong * 1000003L + 7L) else None
      (v.toLong, y4mFixture(v), pre)
    }.toDF("media_id", "payload", "pre_hash")
      .select(
        col("media_id"),
        graft.multimodal.Media.videoHash60OrPrecomputed(
          col("payload"), col("pre_hash")).as("vhash60"),
        when(col("pre_hash").isNotNull, lit(1)).otherwise(lit(0))
          .as("used_precomputed"))
      .orderBy("media_id")
  }

  /** m07's oracle IS m05's decode replay with the precomputed branch
    * spliced over the final SELECT — derived textually so the two
    * replays cannot drift.
    */
  val m07Oracle: String = {
    val anchor = "SELECT vids.media_id, COALESCE(h.vhash60, 0) AS vhash60"
    require(m05Oracle.contains(anchor),
      "m07 oracle derives from m05's decode replay — keep the final SELECT anchored")
    m05Oracle.replace(anchor,
      """SELECT vids.media_id,
        |  CASE WHEN vids.media_id % 2 = 0 THEN CAST(vids.media_id * 1000003 + 7 AS BIGINT)
        |       ELSE COALESCE(h.vhash60, 0) END AS vhash60,
        |  CAST(CASE WHEN vids.media_id % 2 = 0 THEN 1 ELSE 0 END AS INT) AS used_precomputed""".stripMargin)
  }

  /** Deterministic MJPEG-in-AVI fixture: a RIFF/AVI container (minimal
    * `hdrl`, then `movi` with one `00dc` chunk per frame) holding 10
    * grayscale 64×64 JPEG frames. Each frame is a checker of SOLID
    * 8×8 blocks — block (r,c) of frame fi is white (255) iff
    * `(r + 2c + vid + 3·(fi/4)) % 5 < 2`, else black (0) — aligned to the
    * JPEG DCT grid, so every block encodes as DC-only and decodes to
    * a CONSTANT value within a few units of its source level (no
    * cross-block ringing: AC coefficients are exactly zero). The
    * videoHash60 sampling grid (row (j/8)·64/8, col (j%8)·64/8) lands
    * on block corners, one block per bit, and every frame mixes both
    * levels — so the threshold votes are invariant to JPEG's small DC
    * quantization error and the BLOCK FORMULA (not the decoded bytes)
    * is the replayable ground truth the m06 oracle recomputes. The
    * temporal term `3·(fi/4)` is chosen so the majority-vote hash is
    * nonzero, varies across vids, AND flips under plausible
    * frame-selection bugs (fi = w, end-of-window sampling) — a
    * degenerate pattern whose bits never reach 5-of-8 would gate
    * nothing.
    */
  private def aviMjpegFixture(vid: Int): Array[Byte] = {
    import graft.multimodal.AviFixture
    AviFixture.avi((0 until 10).map(fi => AviFixture.chunk("00dc",
      AviFixture.blockJpeg((r, c) => (r + 2 * c + vid + 3 * (fi / 4)) % 5 < 2))))
  }

  /** REAL compressed-container temporal hash (the last F3 gap closed):
    * [[graft.multimodal.Media.videoHash60]] walks the RIFF/AVI
    * structure, JPEG-decodes sampled `00dc` frames via `javax.imageio`
    * (in the JDK — still dependency-free), and hashes genuine decoded
    * pixels — 8 frames sampled at even temporal stride from 10 on
    * disk, the m05 pipeline with a real codec in the loop. The oracle
    * replays every bit from the fixture's BLOCK formula (the sampled
    * grid lands on solid DCT-aligned blocks, so JPEG's DC quantization
    * error cannot flip a threshold vote — see [[aviMjpegFixture]]):
    * frame selection, chunk walk, decode plumbing, sampling geometry,
    * means, and votes are all cross-engine gated.
    */
  def m06AviVideoHash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    (0 until 12).map(v => (v.toLong, aviMjpegFixture(v))).toDF("media_id", "payload")
      .select(col("media_id"),
        graft.multimodal.Media.videoHash60Col(col("payload")).as("vhash60"))
      .orderBy("media_id")
  }

  /** DuckDB replay of the MJPEG-AVI path from the block formula:
    * sampled frame fi = (w·10)//8 for window w < 8; sample j reads
    * block (j//8, j%8) of frame fi — idealized 255/0 per the formula;
    * bit j < 60 set per frame iff pixel > Σpx//64 (with pure 0/255
    * levels that is exactly "white and the frame is not all-white",
    * and every fixture frame mixes levels); hash bit set iff > 4 of 8
    * windows vote it.
    */
  val m06Oracle: String =
    """WITH vids AS (
      |  SELECT CAST(v AS BIGINT) AS media_id FROM generate_series(0, 11) AS g(v)
      |), win AS (
      |  SELECT media_id, gw.w AS w, (gw.w*10)//8 AS fi
      |  FROM vids, generate_series(0, 7) AS gw(w)
      |), pix AS (
      |  SELECT media_id, w, gj.j AS j,
      |    CASE WHEN ((gj.j//8) + 2*(gj.j%8) + media_id + 3*(fi//4)) % 5 < 2
      |         THEN 255 ELSE 0 END AS v
      |  FROM win, generate_series(0, 63) AS gj(j)
      |), fm AS (
      |  SELECT media_id, w, SUM(v)//64 AS mean FROM pix GROUP BY media_id, w
      |), votes AS (
      |  SELECT pix.media_id, pix.j, COUNT(*) AS c
      |  FROM pix JOIN fm ON pix.media_id = fm.media_id AND pix.w = fm.w
      |  WHERE pix.j < 60 AND pix.v > fm.mean
      |  GROUP BY pix.media_id, pix.j
      |), h AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN c*2 > 8 THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS vhash60
      |  FROM votes GROUP BY media_id
      |)
      |SELECT vids.media_id, COALESCE(h.vhash60, 0) AS vhash60
      |FROM vids LEFT JOIN h USING (media_id) ORDER BY media_id""".stripMargin

  /** Corpus-fit bigram LM scoring ([[graft.operators.LangModel]]) —
    * the CCNet-style perplexity quality signal. The oracle replays the
    * ENTIRE model: tokenization, bigram/prefix counts, the
    * distinct-vocabulary size, add-one smoothing, and each bigram's ln
    * term in micro-units before the order-independent per-doc sum
    * (the r01 BM25 discipline applied to an LM).
    */
  def t09BigramLl(s: SparkSession, dir: String): DataFrame =
    graft.operators.LangModel.bigramScore(docs(s, dir), col("doc_id"), col("text"))
      .orderBy("doc_id")

  /** Persisted-model twin of t09 ([[graft.operators.LangModel.fit]] →
    * parquet model → [[graft.operators.LangModel.scoreWith]]) — the
    * fit/transform split the 100 TB deployment runs (fit once on the
    * reference corpus; scoring jobs read the model). On the fit corpus
    * itself the left-join-with-zero-coalesce scoring is arithmetically
    * identical to the one-shot form, so the oracle is t09's VERBATIM —
    * the r01/r03 persisted-twin pattern applied to the LM.
    */
  def t10BigramLlModel(s: SparkSession, dir: String): DataFrame = {
    val path = graft.queries.Scratch.wiped(s, "lm_model", dir)
    val d = docs(s, dir)
    graft.operators.LangModel.fit(d, col("doc_id"), col("text"), path)
    graft.operators.LangModel.scoreWith(s, path, d, col("doc_id"), col("text"))
      .orderBy("doc_id")
  }

  val t09Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL THEN NULL
       |         WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = '' THEN []
       |         ELSE $duckToksNorm END AS toks
       |  FROM documents
       |), dd AS (
       |  SELECT doc_id, toks FROM d WHERE toks IS NOT NULL AND len(toks) >= 2
       |), bg AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM dd, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
       |), c2 AS (
       |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
       |), c1 AS (
       |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
       |), v AS (
       |  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
       |  FROM (SELECT unnest(toks) AS w FROM d WHERE toks IS NOT NULL)
       |), terms AS (
       |  SELECT b.doc_id,
       |    CAST(ROUND(ln((CAST(c2.c2 AS DOUBLE) + 1.0) / (CAST(c1.c1 AS DOUBLE) + CAST(v.v AS DOUBLE))) * 1000000.0) AS BIGINT) AS t_micro
       |  FROM bg b
       |  JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
       |  JOIN c1 ON c1.w1 = b.w1
       |  CROSS JOIN v
       |), per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |         CAST(SUM(t_micro) AS BIGINT) AS ll_micro
       |  FROM terms GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  COALESCE(per.n_bigrams, 0) AS n_bigrams,
       |  COALESCE(per.ll_micro, 0) AS ll_micro,
       |  CASE WHEN per.n_bigrams IS NOT NULL
       |       THEN (CAST(per.ll_micro AS DOUBLE) / 1000000.0) / CAST(per.n_bigrams AS DOUBLE) END AS mean_ll
       |FROM d LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Trainable BPE tokenizer ([[graft.operators.Bpe]]): fit 200 merges
    * on the corpus word-frequency table, persist the merge table, and
    * segment the first 200 documents THROUGH the loaded model. The dump
    * carries the merge table and every segmentation, so the oracle
    * proves in SQL — from the dump plus the raw documents alone — that
    * (a) each document's tokens concatenate back to EXACTLY the
    * normalized tokenized source with one `</w>` per word (the
    * segmentation is a true partition of the text), (b) every emitted
    * multi-character token is a merge output, (c) the merge table is
    * rank-contiguous and CLOSED under its own ranks (each side of merge
    * i is a character, the end marker, or the output of an earlier
    * merge), and (d) every nonempty queried doc is served. WHICH merges
    * the fit chose and the greedy-apply order are engine-specific —
    * pinned instead by BpeSpec's hand-computed Sennrich cases.
    */
  def t11BpeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val fitted = graft.operators.Bpe.fit(
      d, col("text"), numMerges = 200, maxWords = 5000)
    val path = Scratch.wiped(s, "bpe_model", dir)
    graft.operators.Bpe.saveModel(s, fitted, path)
    val model = graft.operators.Bpe.loadModel(s, path)
    val mergeDf = model.merges.zipWithIndex
      .map { case ((a, b), i) =>
        ("merge", i, -1L, Option(a), Option(b), Option.empty[String], Option.empty[Int])
      }
      .toDF("kind", "idx", "doc_id", "a", "b", "toks", "n_tokens")
    val docDf = graft.operators.Bpe.encode(
      d.filter(col("doc_id") < 200), col("text"), model)
      .filter(size(col("bpe_tokens")) > 0)
      .select(
        lit("doc").as("kind"), lit(-1).as("idx"), col("doc_id"),
        lit(null).cast("string").as("a"), lit(null).cast("string").as("b"),
        concat_ws(" ", col("bpe_tokens")).as("toks"),
        size(col("bpe_tokens")).as("n_tokens"))
    mergeDf.unionByName(docDf).orderBy("kind", "idx", "doc_id")
  }

  val t11Oracle: String =
    """WITH d AS (
      |  SELECT kind, idx, doc_id, a, b, toks, n_tokens
      |  FROM read_parquet('__GRAFT_OUT__/t11_bpe_tokens/*.parquet')
      |), mg AS (SELECT idx, a, b, a || b AS ab FROM d WHERE kind = 'merge'),
      |dk AS (SELECT doc_id, toks, n_tokens, string_split(toks, ' ') AS tl
      |       FROM d WHERE kind = 'doc'),
      |src AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
      |  FROM documents WHERE doc_id < 200
      |),
      |badrecon AS (
      |  SELECT COUNT(*) AS n FROM dk JOIN src USING (doc_id)
      |  WHERE array_to_string(dk.tl, '') IS DISTINCT FROM
      |        array_to_string(list_transform(string_split(src.norm, ' '),
      |                                       w -> w || '</w>'), '')
      |), badcount AS (
      |  SELECT COUNT(*) AS n FROM dk WHERE n_tokens IS DISTINCT FROM len(tl)
      |), badvocab AS (
      |  SELECT COUNT(*) AS n FROM (
      |    SELECT u.t FROM dk, UNNEST(dk.tl) AS u(t)
      |    WHERE length(u.t) > 1 AND u.t <> '</w>'
      |      AND u.t NOT IN (SELECT ab FROM mg)
      |  )
      |), badclosure AS (
      |  SELECT COUNT(*) AS n FROM mg m
      |  WHERE NOT (
      |    (length(m.a) = 1 OR m.a = '</w>'
      |      OR EXISTS (SELECT 1 FROM mg p WHERE p.idx < m.idx AND p.ab = m.a))
      |    AND
      |    (length(m.b) = 1 OR m.b = '</w>'
      |      OR EXISTS (SELECT 1 FROM mg p WHERE p.idx < m.idx AND p.ab = m.b)))
      |), badrank AS (
      |  SELECT CASE WHEN (SELECT COUNT(*) FROM mg) = 0 THEN 1
      |              WHEN (SELECT COUNT(*) FROM mg) <> (SELECT MAX(idx) + 1 FROM mg) THEN 1
      |              WHEN (SELECT COUNT(DISTINCT idx) FROM mg) <> (SELECT COUNT(*) FROM mg) THEN 1
      |              ELSE 0 END AS n
      |), cov AS (
      |  SELECT (SELECT COUNT(DISTINCT doc_id) FROM dk) =
      |         (SELECT COUNT(*) FROM src WHERE norm <> '') AS ok
      |), gate AS (
      |  SELECT (SELECT n FROM badrecon) = 0
      |     AND (SELECT n FROM badcount) = 0
      |     AND (SELECT n FROM badvocab) = 0
      |     AND (SELECT n FROM badclosure) = 0
      |     AND (SELECT n FROM badrank) = 0
      |     AND (SELECT ok FROM cov) AS ok
      |)
      |SELECT kind, idx, doc_id, a, b, toks, n_tokens FROM d
      |WHERE (SELECT ok FROM gate)
      |UNION ALL
      |SELECT '__gate_failed', -1, -1, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |       CAST(NULL AS VARCHAR), CAST(NULL AS INT)
      |WHERE NOT (SELECT ok FROM gate)
      |ORDER BY kind, idx, doc_id""".stripMargin

  /** Hashed-feature logistic-regression quality classifier
    * ([[graft.operators.Classifier]]) — the GPT-3-style curated-vs-rest
    * filter: weak labels from the source column (top curated sources
    * positive), driver-deterministic GD fit, micro-quantized model
    * persisted and RELOADED before scoring (the fit/transform split).
    * The dump carries the model (meta/bias/w rows) and every document's
    * score, so the oracle proves from dump + raw documents that every
    * served (n_tokens, s_micro, score_micro) replays bit-for-bit from
    * the dumped weights — tokenization, bucketing, the exact long
    * token-weight sum, and the sigmoid — and that the learned scores
    * actually SEPARATE the classes (mean curated score > mean rest).
    * WHICH weights the GD converged to is engine-specific — pinned by
    * ClassifierSpec's hand-computed gradient steps instead.
    */
  def t12QualityClf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val labeled = d.withColumn("label",
      col("source").isin(t12Curated: _*).cast("double"))
    val fitted = graft.operators.Classifier.fit(
      labeled, col("doc_id"), col("text"), col("label"),
      buckets = 1024, maxFit = 20000L, iters = 200, lr = 1.0, l2 = 1e-4)
    val path = Scratch.wiped(s, "clf_model", dir)
    graft.operators.Classifier.saveModel(s, fitted, path)
    val model = graft.operators.Classifier.loadModel(s, path)

    val modelRows = (Seq(
      ("meta", model.buckets.toLong, 0L),
      ("bias", -1L, model.biasMicro)) ++
      model.weightsMicro.zipWithIndex.collect {
        case (wm, bk) if wm != 0L => ("w", bk.toLong, wm)
      })
      .toDF("kind", "bucket", "w_micro")
      .select(col("kind"), col("bucket"), col("w_micro"),
        lit(-1L).as("doc_id"), lit(null).cast("long").as("n_tokens"),
        lit(null).cast("long").as("s_micro"), lit(null).cast("long").as("score_micro"))
    val docRows = graft.operators.Classifier
      .scoreWith(s, model, d, col("doc_id"), col("text"))
      .select(lit("doc").as("kind"), lit(-1L).as("bucket"),
        lit(null).cast("long").as("w_micro"),
        col("doc_id"), col("n_tokens"), col("s_micro"), col("score_micro"))
    modelRows.unionByName(docRows).orderBy("kind", "bucket", "doc_id")
  }

  private val t12Curated = Seq("src18", "src7", "src6", "src19", "src14")

  val t12Oracle: String = {
    val hTok = DuckOracle.h60("tok")
    val curated = DuckOracle.quoteList(t12Curated)
    s"""WITH dump AS (
       |  SELECT kind, bucket, w_micro, doc_id, n_tokens, s_micro, score_micro
       |  FROM read_parquet('__GRAFT_OUT__/t12_quality_clf/*.parquet')
       |), meta AS (SELECT bucket AS nb FROM dump WHERE kind = 'meta'),
       |bias AS (SELECT w_micro AS b FROM dump WHERE kind = 'bias'),
       |wt AS (SELECT bucket, w_micro FROM dump WHERE kind = 'w'),
       |d AS (
       |  SELECT doc_id, source,
       |    CASE WHEN text IS NULL THEN NULL
       |         WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = '' THEN []
       |         ELSE $duckToksNorm END AS toks
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, $hTok % (SELECT nb FROM meta) AS bucket
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM d WHERE toks IS NOT NULL)
       |), per AS (
       |  SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(COALESCE(wt.w_micro, 0)) AS BIGINT) AS s_micro
       |  FROM tok LEFT JOIN wt USING (bucket) GROUP BY tok.doc_id
       |), docrow AS (
       |  SELECT d.doc_id, d.source,
       |    COALESCE(per.n_tokens, 0) AS n_tokens,
       |    COALESCE(per.s_micro, 0) AS s_micro,
       |    CAST(ROUND(1000000.0 / (1.0 + exp(-(
       |      CAST(bias.b AS DOUBLE) / 1000000.0 +
       |      CASE WHEN COALESCE(per.n_tokens, 0) > 0
       |           THEN (CAST(per.s_micro AS DOUBLE) / 1000000.0) / CAST(per.n_tokens AS DOUBLE)
       |           ELSE 0.0 END)))) AS BIGINT) AS score_micro
       |  FROM d LEFT JOIN per USING (doc_id) CROSS JOIN bias
       |), gate AS (
       |  SELECT (SELECT COUNT(*) FROM meta) = 1
       |     AND (SELECT COUNT(*) FROM bias) = 1
       |     AND (SELECT COUNT(*) FROM wt
       |          WHERE bucket < 0 OR bucket >= (SELECT nb FROM meta)) = 0
       |     AND (SELECT AVG(CASE WHEN source IN ($curated) THEN CAST(score_micro AS DOUBLE) END)
       |            > AVG(CASE WHEN source NOT IN ($curated) THEN CAST(score_micro AS DOUBLE) END)
       |          FROM docrow) AS ok
       |)
       |SELECT kind, bucket, w_micro, CAST(-1 AS BIGINT) AS doc_id,
       |       CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS s_micro,
       |       CAST(NULL AS BIGINT) AS score_micro
       |FROM dump WHERE kind IN ('meta', 'bias', 'w') AND (SELECT ok FROM gate)
       |UNION ALL
       |SELECT 'doc' AS kind, CAST(-1 AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS w_micro,
       |       doc_id, n_tokens, s_micro, score_micro
       |FROM docrow WHERE (SELECT ok FROM gate)
       |UNION ALL
       |SELECT '__gate_failed', -1, NULL, -1, NULL, NULL, NULL
       |WHERE NOT (SELECT ok FROM gate)
       |ORDER BY kind, bucket, doc_id""".stripMargin
  }

  /** Overlapping token-window chunking ([[graft.operators.Chunking]])
    * — window 64, stride 48 (25% overlap) over every document. The
    * whole pipeline is built-ins (split, sequence, slice, md5), so the
    * oracle recomputes every chunk — starts, slices, texts,
    * fingerprints — from the raw documents, bit-for-bit.
    */
  def t13Chunking(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunk(
      docs(s, dir), col("doc_id"), col("text"), window = 64, stride = 48)
      .orderBy("doc_id", "chunk_idx")

  val t13Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, $duckToksNorm AS toks
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
       |), n AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    CASE WHEN len(toks) <= 64 THEN 1
       |         ELSE (len(toks) - 64 + 48 - 1) // 48 + 1 END AS n_chunks
       |  FROM d
       |), c AS (
       |  SELECT doc_id, CAST(g.i AS INT) AS chunk_idx,
       |    toks[g.i * 48 + 1 : LEAST(g.i * 48 + 64, n)] AS ctoks
       |  FROM n, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
       |)
       |SELECT doc_id, chunk_idx,
       |  CAST(len(ctoks) AS INT) AS n_tokens,
       |  array_to_string(ctoks, ' ') AS chunk_text,
       |  md5(array_to_string(ctoks, ' ')) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** TF-IDF keyword extraction ([[graft.operators.Tfidf.topTerms]]):
    * top-3 terms per document with micro-rounded scores. The oracle
    * replays tf, df, N, every ln term, and the (score desc, term)
    * ranking bit-for-bit.
    */
  def t14TfidfKeywords(s: SparkSession, dir: String): DataFrame =
    graft.operators.Tfidf.topTerms(docs(s, dir), col("doc_id"), col("text"), k = 3)
      .orderBy("doc_id", "rank")

  val t14Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, $duckToksNorm AS toks FROM documents
       |  WHERE text IS NOT NULL
       |    AND trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> ''
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS term FROM d
       |), tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
       |), dft AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), nn AS (
       |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf
       |), s AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
       |    CAST(ROUND(CAST(tf.tf AS DOUBLE) *
       |      ln(CAST(nn.n + 1 AS DOUBLE) / (CAST(dft.df AS DOUBLE) + 1.0)) *
       |      1000000.0) AS BIGINT) AS score_micro
       |  FROM tf JOIN dft USING (term) CROSS JOIN nn
       |), r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score_micro DESC, term) AS rnk FROM s
       |)
       |SELECT doc_id, CAST(rnk AS INT) AS rank, term, tf, df, score_micro
       |FROM r WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Unicode NFC normalization ([[Text.unicodeNorm]] — native codegen
    * expression with an ASCII identity fast path). The corpus is
    * ASCII-synthetic, so the query SYNTHESIZES decomposed text first —
    * every 'a'/'e' gains a combining grave/acute (U+0300/U+0301), the
    * exact byte sequences NFC must re-compose to 'à'/'é' — and both
    * engines then normalize: character counts shrink by exactly the
    * combining-mark count and the composed strings must match
    * byte-for-byte (JDK Normalizer vs DuckDB's utf8proc, both UAX #15).
    * Nulls propagate in both engines.
    */
  def t15UnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    val dec = replace(
      replace(col("text"), lit("a"), lit("a\u0300")),
      lit("e"), lit("e\u0301"))
    docs(s, dir)
      .select(
        col("doc_id"),
        length(dec).as("n_decomposed"),
        Text.unicodeNorm(dec, "NFC").as("norm_text"),
        length(Text.unicodeNorm(dec, "NFC")).as("n_normalized"))
      .orderBy("doc_id")
  }

  val t15Oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    replace(replace(text, 'a', 'a' || chr(768)), 'e', 'e' || chr(769)) AS dec
      |  FROM documents
      |)
      |SELECT doc_id, length(dec) AS n_decomposed,
      |  nfc_normalize(dec) AS norm_text,
      |  length(nfc_normalize(dec)) AS n_normalized
      |FROM d ORDER BY doc_id""".stripMargin

  /** HTML → text extraction ([[Text.htmlStrip]]). The corpus is plain
    * text, so the query first WRAPS each document in a deterministic
    * HTML shell exercising every strip rule — script with `&&` inside
    * (tag-stripping alone would corrupt it), style, a comment,
    * attributed tags, and the entity set including the double-encoded
    * `&amp;lt;` (which must decode to the literal text `&lt;`, not
    * `<`) — then both engines strip it back. Null text propagates
    * through concat in both engines.
    */
  def t16HtmlStrip(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>t</title><style>p{a:1}</style></head>" +
        "<body><!-- meta --><h1>Doc</h1><p class=\"t\">"),
      col("text"),
      lit("</p><script type=\"x\">if(1&&2){q('<p>')}</script>" +
        "<p>&amp;lt; &lt;tail&gt;&nbsp;&quot;&#39;</p></body></html>"))
    docs(s, dir)
      .select(
        col("doc_id"),
        Text.htmlStrip(html).as("clean"),
        length(Text.htmlStrip(html)).as("n_clean"))
      .orderBy("doc_id")
  }

  val t16Oracle: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>t</title><style>p{a:1}</style></head><body><!-- meta --><h1>Doc</h1><p class="t">'
      |    || text ||
      |    '</p><script type="x">if(1&&2){q(''<p>'')}</script><p>&amp;lt; &lt;tail&gt;&nbsp;&quot;&#39;</p></body></html>' AS html
      |  FROM documents
      |), s1 AS (
      |  SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h
      |), s2 AS (
      |  SELECT doc_id, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1
      |), s3 AS (
      |  SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2
      |), s4 AS (
      |  SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s3
      |), s5 AS (
      |  SELECT doc_id,
      |    replace(replace(replace(replace(replace(replace(t,
      |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      |      '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t
      |  FROM s4
      |)
      |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS clean,
      |  length(trim(regexp_replace(t, '\s+', ' ', 'g'))) AS n_clean
      |FROM s5 ORDER BY doc_id""".stripMargin

  /** Sentence segmentation stats (the chunker/quality-filter input the
    * t-family lacked): sentences split on terminator runs followed by
    * whitespace — `[.!?]+\\s+`, splitting ON the boundary (both regex
    * dialects agree; RE2 has no lookbehind, so keep-the-terminator
    * variants are not cross-engine expressible). Per doc: sentence
    * count, token count, mean tokens/sentence (ONE division of exact
    * longs), and the longest sentence in characters. Pure single-scan
    * projection + array ops.
    */
  def t17SentenceStats(s: SparkSession, dir: String): DataFrame = {
    // rtrim first: text ending "terminator + whitespace" would otherwise
    // split off a trailing "" pseudo-sentence, inflating the count and
    // deflating every per-sentence mean
    val sents = split(regexp_replace(col("text"), "\\s+$", ""), "[.!?]+\\s+")
    docs(s, dir)
      .select(
        col("doc_id"),
        size(sents).as("n_sentences"),
        Text.tokenCount(col("text")).as("n_tokens"),
        (Text.tokenCount(col("text")).cast("double") /
          size(sents).cast("double")).as("mean_tokens_per_sentence"),
        array_max(transform(sents, x => length(x))).as("max_sentence_chars"))
      .orderBy("doc_id")
  }

  val t17Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    string_split_regex(regexp_replace(text, '\\s+$$', '', 'g'), '[.!?]+\\s+') AS sents,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_tokens
       |  FROM documents
       |)
       |SELECT doc_id, CAST(len(sents) AS INT) AS n_sentences,
       |  n_tokens,
       |  CAST(n_tokens AS DOUBLE) / CAST(len(sents) AS DOUBLE) AS mean_tokens_per_sentence,
       |  CAST(list_max(list_transform(sents, x -> length(x))) AS INT) AS max_sentence_chars
       |FROM d ORDER BY doc_id""".stripMargin

  /** Gopher-style document quality rules (Rae et al. 2021, publicly
    * documented heuristics): word-count bounds, mean-word-length band,
    * symbol-to-word ratio (# and …), alphabetic-word fraction, and a
    * distinct-stopword floor — the standard pre-filter every web-corpus
    * pipeline runs before dedup. The corpus is single-line synthetic
    * text, so the reference's line-level rules (bullet/ellipsis line
    * fractions) have no input to bite on and are deliberately out of
    * scope here; the word-level battery is complete.
    *
    * One narrow projection over a pruned two-column scan — token
    * arrays, HOF folds, and regex counts are all per-row codegen;
    * no shuffle at any corpus size. Thresholds follow the paper:
    * 50 ≤ words ≤ 100k, 3 ≤ mean word length ≤ 10, symbol ratio ≤ 0.1,
    * ≥ 80% words with an alphabetic char, ≥ 2 distinct stopwords.
    */
  def t18GopherQuality(s: SparkSession, dir: String): DataFrame = {
    val toksC = Text.tokens(Text.normalize(col("text")))
    val base = docs(s, dir).select(col("doc_id"), col("text"), toksC.as("toks"))
    val nWords = size(col("toks"))
    // strict long fold of token lengths — zero-start, left-to-right,
    // so the DuckDB list_reduce twin is bit-identical
    val sumLen = aggregate(
      transform(col("toks"), t => length(t).cast("long")), lit(0L), (a, b) => a + b)
    val nAlphaWords = size(filter(col("toks"), t => t.rlike("[a-z]")))
    val nSym = regexp_count(col("text"), lit("#")) +
      regexp_count(col("text"), lit("\\.\\.\\."))
    val stopHits = size(filter(
      array(GopherStopwords.map(lit): _*), w => array_contains(col("toks"), w)))
    val m = base.select(
      col("doc_id"),
      nWords.as("n_words"),
      when(nWords > 0, sumLen.cast("double") / nWords).as("mean_word_len"),
      when(nWords > 0, nAlphaWords.cast("double") / nWords).as("alpha_frac"),
      when(nWords > 0, nSym.cast("double") / nWords).as("symbol_ratio"),
      stopHits.as("stop_hits"))
    m.withColumn("keep",
      col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 2)
      .orderBy("doc_id")
  }

  /** The Gopher stopword battery (public rule set: "the be to of and
    * that have with"), shared with the oracle twin.
    */
  private val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val t18Oracle: String = {
    val stopList = GopherStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
       |      THEN CAST([] AS VARCHAR[]) ELSE $duckToksNorm END AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, CAST(len(toks) AS INT) AS n_words,
       |    list_reduce([CAST(0 AS BIGINT)] || list_transform(toks, t -> CAST(length(t) AS BIGINT)), (a, b) -> a + b) AS sum_len,
       |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS n_alpha_words,
       |    len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
       |    CAST(len(list_filter([$stopList], w -> list_contains(toks, w))) AS INT) AS stop_hits
       |  FROM t
       |), r AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words END AS mean_word_len,
       |    CASE WHEN n_words > 0 THEN CAST(n_alpha_words AS DOUBLE) / n_words END AS alpha_frac,
       |    CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE) / n_words END AS symbol_ratio,
       |    stop_hits
       |  FROM m
       |)
       |SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio, stop_hits,
       |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
       |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Vocabulary coverage — the tokenizer-design question ("how much of
    * the corpus do the top-K token types cover?") as one query: corpus
    * token frequencies, rank by count, cumulative coverage share.
    *
    * Scale shape: the explode+count is the d02-envelope corpus pass
    * (map-side partials absorb hot tokens before the token-keyed
    * shuffle); the top-K cut is `TakeOrderedAndProject` — Spark's
    * distributed top-K, per-partition heads merged on the driver, NOT a
    * global sort; the running-sum window then orders only the K
    * survivors (one tiny partition by construction). The prefix cumsum
    * over the top-K equals the global cumsum restricted to the prefix —
    * same order — so cutting BEFORE the window is free of semantic
    * cost, and the full-vocab total comes from the count aggregate as a
    * broadcast scalar.
    */
  def t19VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val k = 200
    val counts = docs(s, dir)
      .select(explode(Text.tokens(Text.normalize(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("__tot"))
    val ord = Seq(col("cnt").desc, col("token"))
    val top = counts.orderBy(ord: _*).limit(k)
    // The single-partition window is INTENTIONAL (the frame is the
    // top-K cut — K rows, never corpus-sized), but an empty partition
    // spec makes WindowExec warn on every (re)plan. pmod(cnt, 1) is a
    // constant 0 per row yet hangs off an attribute, so the optimizer
    // cannot fold it away like a bare lit — same one partition, same
    // row order (cnt desc, token is a total order), warning-free.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("cnt"), lit(1))).orderBy(ord: _*)
    top
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt", sum("cnt").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("cnt"),
        (col("cum_cnt").cast("double") / col("__tot")).as("cum_share"))
      .orderBy("rank")
  }

  val t19Oracle: String =
    s"""WITH tok AS (
       |  SELECT unnest(CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
       |    THEN CAST([] AS VARCHAR[]) ELSE $duckToksNorm END) AS token
       |  FROM documents
       |), c AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
       |), tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c
       |), r AS (
       |  SELECT token, cnt,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
       |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
       |  FROM c
       |)
       |SELECT rank, token, cnt, CAST(cum_cnt AS DOUBLE) / tot AS cum_share
       |FROM r, tot WHERE rank <= 200 ORDER BY rank""".stripMargin

  /** Flesch reading-ease score (public formula: 206.835 − 1.015·(W/S)
    * − 84.6·(Sy/W)) with the standard regex syllable heuristic — a
    * syllable ≈ one vowel-group run ([aeiouy]+) in the lowercased text
    * (spaces and punctuation break runs, so runs never span words;
    * all-consonant tokens count 0 — the documented limit of the
    * heuristic). Sentences reuse t17's terminator-run split; counts
    * are exact ints, the score is one fixed double tree. One narrow
    * projection, no shuffle.
    */
  def t20Readability(s: SparkSession, dir: String): DataFrame = {
    val nWords = Text.tokenCount(col("text"))
    // rtrim: same trailing-""-pseudo-sentence guard as t17
    val nSents = size(split(regexp_replace(col("text"), "\\s+$", ""), "[.!?]+\\s+"))
    val nSyll = regexp_count(Text.normalize(col("text")), lit("[aeiouy]+"))
    docs(s, dir)
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        nSents.as("n_sentences"),
        nSyll.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words"))))
      .orderBy("doc_id")
  }

  val t20Oracle: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_words,
       |    CAST(len(string_split_regex(regexp_replace(text, '\\s+$$', '', 'g'), '[.!?]+\\s+')) AS INT) AS n_sentences,
       |    CAST(len(regexp_extract_all(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '[aeiouy]+')) AS INT) AS n_syllables
       |  FROM documents
       |)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CASE WHEN n_words > 0 AND n_sentences > 0
       |    THEN 206.835
       |      - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
       |      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
       |  END AS flesch
       |FROM m ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t20_readability" -> (t20Readability _),
    "t18_gopher_quality" -> (t18GopherQuality _),
    "t19_vocab_coverage" -> (t19VocabCoverage _),
    "t17_sentence_stats" -> (t17SentenceStats _),
    "t16_html_strip" -> (t16HtmlStrip _),
    "t15_unicode_norm" -> (t15UnicodeNorm _),
    "t14_tfidf_keywords" -> (t14TfidfKeywords _),
    "t13_chunking" -> (t13Chunking _),
    "t12_quality_clf" -> (t12QualityClf _),
    "t11_bpe_tokens" -> (t11BpeTokens _),
    "t09_bigram_ll" -> (t09BigramLl _),
    "t10_bigram_ll_model" -> (t10BigramLlModel _),
    "t07_repetition" -> (t07Repetition _),
    "t08_pii" -> (t08Pii _),
    "m02_media_features" -> (m02MediaFeatures _),
    "m03_wav_features" -> (m03WavFeatures _),
    "m04_video_hash" -> (m04VideoHash _),
    "m05_y4m_video_hash" -> (m05Y4mVideoHash _),
    "m06_avi_video_hash" -> (m06AviVideoHash _),
    "m07_precomputed_video_hash" -> (m07PrecomputedVideoHash _),
    "t01_token_counts" -> (t01TokenCounts _),
    "t02_lang_id" -> (t02LangId _),
    "t22_langid_confusion" -> (t22LangidConfusion _),
    "t03_quality" -> (t03Quality _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_winnow" -> (t05Winnow _),
    "t06_ratios" -> (t06Ratios _),
    "m01_binary_meta" -> (m01BinaryMeta _)
  )

  val oracles: Map[String, String] = Map(
    "t20_readability" -> t20Oracle,
    "t18_gopher_quality" -> t18Oracle,
    "t19_vocab_coverage" -> t19Oracle,
    "t17_sentence_stats" -> t17Oracle,
    "t16_html_strip" -> t16Oracle,
    "t15_unicode_norm" -> t15Oracle,
    "t14_tfidf_keywords" -> t14Oracle,
    "t13_chunking" -> t13Oracle,
    "t12_quality_clf" -> t12Oracle,
    "t11_bpe_tokens" -> t11Oracle,
    "t09_bigram_ll" -> t09Oracle,
    // the persisted-model twin scores the SAME corpus it was fit on:
    // left-join + zero-coalesce ≡ the one-shot inner join there, so
    // t09's full-model replay gates the whole fit→persist→score path
    "t10_bigram_ll_model" -> t09Oracle,
    "t07_repetition" -> t07Oracle,
    "t08_pii" -> t08Oracle,
    "m02_media_features" -> m02Oracle,
    "m03_wav_features" -> m03Oracle,
    "m04_video_hash" -> m04Oracle,
    "m05_y4m_video_hash" -> m05Oracle,
    "m06_avi_video_hash" -> m06Oracle,
    "m07_precomputed_video_hash" -> m07Oracle,
    "t01_token_counts" -> t01Oracle,
    "t02_lang_id" -> t02Oracle,
    "t22_langid_confusion" -> t22Oracle,
    "t03_quality" -> t03Oracle,
    "t04_fingerprint" -> t04Oracle,
    "t05_winnow" -> t05Oracle,
    "t06_ratios" -> t06Oracle,
    "m01_binary_meta" -> m01Oracle
  )
}
