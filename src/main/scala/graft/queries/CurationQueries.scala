package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Composite corpus-curation coverage: the end-to-end shape of a
  * training-data pipeline (quality gate → exact dedup → token-budget
  * rollup) as single oracle-gated queries. Each stage reuses the
  * already-proven primitives (t03 quality, d01 fingerprint dedup), so
  * the oracle checks the COMPOSITION.
  *
  * Plan shape: keep-first via one `groupBy(fp).agg(min(struct(…)))`
  * pass — a single pruned scan and narrow fp shuffle. The Window
  * alternative (row_number over Window.partitionBy(fp)) was rejected
  * deliberately: web-scale corpora have boilerplate documents duplicated
  * millions of times, and a window ships every copy of a hot fingerprint
  * to one task, while groupBy's map-side partial min absorbs exactly
  * that skew; and min-of-struct carries the survivor's payload out of
  * the same aggregate, so no keepers join or second scan is needed.
  */
object CurationQueries {

  private def docs(s: SparkSession, dir: String) = Tables.t(s, dir, "documents")

  private val duckToksRaw = DuckOracle.toksRaw
  private val duckToksNorm = DuckOracle.toksNorm

  /** DuckDB twin of [[gatedDocs]] as a CTE chain (q -> scored -> f):
    * single owner for the c01 and c08 oracles.
    */
  private lazy val duckGatedCte: String =
    s"""q AS (
       |  SELECT doc_id, lang, source, text,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_tokens,
       |    length(text) AS n_chars_calc,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
       |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
       |  FROM documents
       |), scored AS (
       |  SELECT *,
       |    (least(CAST(n_chars_calc AS DOUBLE) / 200.0, 1.0) * 0.4
       |     + (CASE WHEN n_chars_calc > 0 THEN n_alpha / CAST(n_chars_calc AS DOUBLE) ELSE 0.0 END) * 0.4
       |     + (CASE WHEN CASE WHEN n_tokens > 0 THEN CAST(n_chars_calc AS DOUBLE) / n_tokens ELSE 0.0 END BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2) AS quality
       |  FROM q
       |), f AS (
       |  SELECT * FROM scored WHERE quality >= 0.6 AND n_tokens >= 5
       |)""".stripMargin

  /** DuckDB twin of the 5-gram distinct shingle builder (c03/c08):
    * tok -> shg CTEs over `documents`.
    */
  private lazy val duckShingleCte: String =
    s"""tok AS (
       |  SELECT doc_id, $duckToksNorm AS toks FROM documents
       |), shg AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 5
       |    THEN list_transform(generate_series(1, len(toks)-4), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
       |    ELSE [array_to_string(toks, ' ')] END) AS shset
       |  FROM tok
       |)""".stripMargin

  /** Quality-gated, exact-deduped token budget per (lang, source):
    * which corpus slices survive curation and how many tokens they
    * contribute. Keep-first (min doc_id) per fingerprint, computed
    * WITHIN the filtered set (a low-quality duplicate must not shadow
    * a high-quality survivor).
    *
    * Single scan: the keep-first row AND its payload come out of one
    * `min(struct(doc_id, …))` aggregate — struct ordering compares
    * doc_id first (unique ⇒ deterministic), so this is exactly the
    * min-doc_id survivor with its own columns. One pass over the
    * corpus, map-side-combinable (absorbs hot boilerplate
    * fingerprints), no second scan and no keepers join — the previous
    * shape paid the full regex-enrichment scan twice.
    */
  /** Enriched + quality-gated corpus: the shared first stage of c01 and
    * c08 (single owner, like their oracle twin [[duckGatedCte]]).
    */
  private def gatedDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"), col("lang"), col("source"), col("text"),
      Text.tokenCount(col("text")).as("n_tokens"),
      Text.qualityScore(col("text")).as("quality"),
      Text.fingerprint(col("text")).as("fp"))
      .filter(col("quality") >= 0.6 && col("n_tokens") >= 5)

  def c01CorpusCuration(s: SparkSession, dir: String): DataFrame =
    gatedDocs(s, dir)
      .groupBy("fp")
      .agg(min(struct(col("doc_id"), col("lang"), col("source"), col("n_tokens"))).as("keep"))
      .groupBy(col("keep.lang").as("lang"), col("keep.source").as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep.n_tokens")).as("total_tokens"))
      .orderBy("lang", "source")

  val c01Oracle: String =
    s"""WITH $duckGatedCte, keepers AS (
       |  SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY fp
       |)
       |SELECT f.lang AS lang, f.source AS source,
       |  COUNT(*) AS n_docs, CAST(SUM(f.n_tokens) AS BIGINT) AS total_tokens
       |FROM f JOIN keepers k ON f.fp = k.fp AND f.doc_id = k.doc_id
       |GROUP BY f.lang, f.source ORDER BY lang, source""".stripMargin

  /** Duplication profile per (lang, source): how much of each slice is
    * exact-duplicate mass — the "what would dedup save" report.
    */
  def c02DupProfile(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("lang"), col("source"),
      Text.fingerprint(col("text")).as("fp"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_removable"))
      .orderBy("lang", "source")

  val c02Oracle: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
      |  CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_removable
      |FROM (SELECT lang, source,
      |        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |      FROM documents)
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Benchmark decontamination ([[graft.operators.Dedup.contaminationPairs]]):
    * corpus docs (doc_id ≥ 20) sharing any distinct 5-gram with the
    * "benchmark" slice (doc_id < 20), with the shared count. The eval
    * side broadcasts; the corpus streams — see the operator's scaladoc.
    */
  def c03Decontamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Dedup.contaminationPairs(
      d.filter(col("doc_id") >= 20), col("doc_id"), col("text"),
      d.filter(col("doc_id") < 20), col("doc_id"), col("text"),
      n = 5)
      .orderBy("doc_id", "eval_id")
  }

  /** DuckDB replay: same normalized tokenizer, same ≥n CASE fallback and
    * list_distinct as the Spark shingle builder, counts over the
    * distinct-shingle equi-join.
    */
  val c03Oracle: String =
    s"""WITH $duckShingleCte, ex AS (
       |  -- blank docs (degenerate [''] shingle set) are excluded, like
       |  -- the operator: a blank doc cannot leak benchmark content
       |  SELECT doc_id, unnest(shset) AS g FROM shg WHERE shset <> ['']
       |)
       |SELECT c.doc_id, e.doc_id AS eval_id, COUNT(*) AS n_shared
       |FROM ex c JOIN ex e ON c.g = e.g
       |WHERE c.doc_id >= 20 AND e.doc_id < 20
       |GROUP BY c.doc_id, e.doc_id
       |ORDER BY c.doc_id, eval_id""".stripMargin

  /** Per-document contamination share
    * ([[graft.operators.Dedup.contaminationShare]]): the Lee et al.
    * overlap FRACTION — distinct 5-gram shingles of each corpus doc
    * vs the eval set's distinct shingle union; every corpus doc
    * reports, zero-overlap included. Exact counts + one double
    * division, fully replayed by the oracle.
    */
  def c15ContaminationShare(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Dedup.contaminationShare(
      d.filter(col("doc_id") >= 20), col("doc_id"), col("text"),
      d.filter(col("doc_id") < 20), col("doc_id"), col("text"),
      n = 5)
      .orderBy("doc_id")
  }

  val c15Oracle: String =
    s"""WITH $duckShingleCte, ex AS (
       |  SELECT doc_id, unnest(shset) AS g FROM shg WHERE shset <> ['']
       |), ev AS (
       |  SELECT DISTINCT g FROM ex WHERE doc_id < 20
       |), per AS (
       |  SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
       |  FROM ex LEFT JOIN ev ON ex.g = ev.g
       |  WHERE ex.doc_id >= 20 GROUP BY ex.doc_id
       |)
       |SELECT doc_id, n_shingles, n_contaminated,
       |  CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS share
       |FROM per ORDER BY doc_id""".stripMargin

  /** Contamination rolled up to the curation decision level
    * ([[c15ContaminationShare]] pooled per (source, lang)): how much of
    * each slice leaks eval content, as exact-long pools (shingle and
    * leaky-doc counts sum as longs; the ONE pooled division happens on
    * the final exact sums — never an average of per-doc doubles, whose
    * summation order differs cross-engine). The per-slice verdict a
    * recipe actually acts on ("drop sourceX/lang=de, keep the rest").
    */
  def c16ContaminationBySource(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Dedup.contaminationShare(
        d.filter(col("doc_id") >= 20), col("doc_id"), col("text"),
        d.filter(col("doc_id") < 20), col("doc_id"), col("text"),
        n = 5)
      .join(d.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_contaminated") > 0, 1L).otherwise(0L)).as("n_leaky_docs"),
        sum("n_shingles").as("sum_shingles"),
        sum("n_contaminated").as("sum_contaminated"))
      .withColumn("pooled_share",
        col("sum_contaminated").cast("double") / col("sum_shingles").cast("double"))
      .orderBy("source", "lang")
  }

  val c16Oracle: String =
    s"""WITH $duckShingleCte, ex AS (
       |  SELECT doc_id, unnest(shset) AS g FROM shg WHERE shset <> ['']
       |), ev AS (
       |  SELECT DISTINCT g FROM ex WHERE doc_id < 20
       |), per AS (
       |  SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |    CAST(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
       |  FROM ex LEFT JOIN ev ON ex.g = ev.g
       |  WHERE ex.doc_id >= 20 GROUP BY ex.doc_id
       |)
       |SELECT d.source, d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN per.n_contaminated > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_docs,
       |  CAST(SUM(per.n_shingles) AS BIGINT) AS sum_shingles,
       |  CAST(SUM(per.n_contaminated) AS BIGINT) AS sum_contaminated,
       |  CAST(SUM(per.n_contaminated) AS DOUBLE) / CAST(SUM(per.n_shingles) AS DOUBLE) AS pooled_share
       |FROM per JOIN documents d ON d.doc_id = per.doc_id
       |GROUP BY d.source, d.lang ORDER BY d.source, d.lang""".stripMargin

  /** Bloom-prefiltered decontamination
    * ([[graft.operators.Dedup.contaminationPairsBloom]]): identical
    * semantics to [[c03Decontamination]] — the eval shingles compress
    * to a 2^18-bit Bloom filter, uncontaminated corpus docs drop
    * before the verify join, and the no-false-negative guarantee makes
    * c03's exact replay the oracle verbatim.
    */
  def c11BloomDecontam(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Dedup.contaminationPairsBloom(
      d.filter(col("doc_id") >= 20), col("doc_id"), col("text"),
      d.filter(col("doc_id") < 20), col("doc_id"), col("text"),
      n = 5, mBits = 1 << 18, kHash = 5)
      .orderBy("doc_id", "eval_id")
  }

  /** Temperature-based language mixing
    * ([[graft.operators.Sampling.temperatureMix]], α = 0.5): keep
    * rates derived FROM the observed stratum counts — `en` (218 docs)
    * is held back at ~0.21 while the small languages keep ~0.36–0.39,
    * the `p_s ∝ √n_s` rebalance multilingual recipes run. At α = 0.5
    * every rate op is IEEE-exact (sqrt, ·, /, min, the ordered
    * count fold), so the oracle reproduces counts → rates → 1e-6
    * thresholds → h60 membership BIT-for-bit — the approximation-free
    * gate c04's fixed rates get, extended to computed rates.
    */
  def c12TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val kept = graft.operators.Sampling.temperatureMix(
      docs(s, dir), col("lang"), col("doc_id"),
      targetDocs = 150, alpha = 0.5, salt = "temp1")
    kept
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(Text.tokenCount(col("text")).cast("long")).as("kept_tokens"))
      .orderBy("lang")
  }

  val c12Oracle: String = {
    val h = DuckOracle.h60("'temp1:' || CAST(doc_id AS VARCHAR)")
    s"""WITH cnt AS (
       |  SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
       |), tot AS (
       |  -- strict fold of sqrt(n) in stratum-key order (nulls last),
       |  -- exactly Sampling.temperatureMix's count fold
       |  SELECT list_reduce(
       |    [CAST(0 AS DOUBLE)] || LIST(sqrt(CAST(n AS DOUBLE)) ORDER BY s),
       |    (a, b) -> a + b) AS sm
       |  FROM cnt
       |), th AS (
       |  SELECT s,
       |    CAST(FLOOR(LEAST(CAST(150 AS DOUBLE) / (sqrt(CAST(n AS DOUBLE)) * sm), CAST(1 AS DOUBLE)) * 1000000) AS BIGINT) AS thr
       |  FROM cnt, tot
       |), keyed AS (
       |  SELECT d.lang, d.text, $h % 1000000 AS skey, th.thr
       |  FROM documents d JOIN th ON th.s = d.lang
       |)
       |SELECT lang, COUNT(*) AS n_kept,
       |  CAST(SUM(CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END) AS BIGINT) AS kept_tokens
       |FROM keyed WHERE skey < thr
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Deterministic stratified sample-mix rollup
    * ([[graft.operators.Sampling.stratifiedSample]]): downsample the
    * dominant stratum, keep the rest, report surviving docs/tokens per
    * (lang, source) — the data-mixing recipe shape, with hash-threshold
    * membership an oracle can replay bit-for-bit.
    */
  def c04SampleMix(s: SparkSession, dir: String): DataFrame = {
    val kept = graft.operators.Sampling.stratifiedSample(
      docs(s, dir), col("lang"), col("doc_id"),
      rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0, salt = "mix1")
    kept
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(Text.tokenCount(col("text")).cast("long")).as("kept_tokens"))
      .orderBy("lang", "source")
  }

  val c04Oracle: String = {
    // h60(salt:id) mod M replayed with the shared digit-fold; thresholds
    // are the same floor(rate*M) longs
    val h = DuckOracle.h60("'mix1:' || CAST(doc_id AS VARCHAR)")
    s"""WITH keyed AS (
       |  SELECT *, $h % 1000000 AS skey,
       |    CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 500000 ELSE 1000000 END AS threshold
       |  FROM documents
       |)
       |SELECT lang, source, COUNT(*) AS n_kept,
       |  CAST(SUM(CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END) AS BIGINT) AS kept_tokens
       |FROM keyed WHERE skey < threshold
       |GROUP BY lang, source ORDER BY lang, source""".stripMargin
  }

  /** Segment width (tokens) for c05's synthetic segmentation. */
  private val SegW = 5

  /** Corpus-frequent-segment strip ([[graft.operators.Dedup.stripFrequentSegments]]):
    * the CCNet/RefinedWeb boilerplate-removal shape. Real corpora
    * segment on newlines; this corpus has none (single-line synthetic
    * docs), so the query segments each doc into disjoint `SegW`-token
    * windows of the normalized text — a deterministic stand-in that
    * exercises the identical machinery (explode → corpus frequency →
    * salted anti-flag join → in-order reassembly). Any segment seen
    * more than twice corpus-wide is stripped; clean_fp proves the
    * reassembled text byte-for-byte.
    */
  /** The disjoint `SegW`-token-window segmentation shared by c05/c05b
    * (single owner, like its oracle twin in [[c05OracleWith]]).
    */
  private def segmented(s: SparkSession, dir: String): (DataFrame, Column) = {
    val toks = Text.tokens(Text.normalize(col("text")))
    val d = docs(s, dir).withColumn("__toks", toks)
    val segs = when(size(col("__toks")) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0L), floor((size(col("__toks")) - lit(1)) / lit(SegW))),
        i => array_join(slice(col("__toks"), (i * SegW + 1).cast("int"), lit(SegW)), " ")))
    (d, segs)
  }

  def c05BoilerplateStrip(s: SparkSession, dir: String): DataFrame = {
    val (d, segs) = segmented(s, dir)
    graft.operators.Dedup.stripFrequentSegments(d, col("doc_id"), segs, maxFreq = 2)
      .select(col("doc_id"), col("n_segments"), col("n_kept"),
        md5(col("clean_text")).as("clean_fp"))
      .orderBy("doc_id")
  }

  /** The ratio-thresholded strip
    * ([[graft.operators.Dedup.stripFrequentSegmentsByRatio]]): a segment
    * is boilerplate when it appears in more than 0.4% of all documents —
    * the scale-invariant CCNet-style knob (an absolute count means
    * something different at sf0.01 and at 100 TB). Distinct-DOC
    * frequency, not occurrence count, and the mark join BROADCASTS (the
    * ratio bounds the frequent set by construction). Same byte-proving
    * clean_fp contract as c05.
    */
  def c05bBoilerplateRatio(s: SparkSession, dir: String): DataFrame = {
    val (d, segs) = segmented(s, dir)
    graft.operators.Dedup.stripFrequentSegmentsByRatio(
      d, col("doc_id"), segs, maxDocFreqRatio = 0.004)
      .select(col("doc_id"), col("n_segments"), col("n_kept"),
        md5(col("clean_text")).as("clean_fp"))
      .orderBy("doc_id")
  }

  /** DuckDB replay of the strip pipeline, parameterized by the
    * frequent-set HAVING clause — single owner for the c05 (absolute
    * occurrence count) and c05b (distinct-doc ratio) oracles.
    */
  private def c05OracleWith(freqHaving: String): String = {
    val h = DuckOracle.h60("seg")
    s"""WITH t AS (
       |  SELECT doc_id, $duckToksNorm AS toks FROM documents
       |), segs AS (
       |  SELECT doc_id, CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
       |    ELSE list_transform(generate_series(0, CAST(floor((len(toks)-1)/$SegW.0) AS BIGINT)),
       |                        i -> array_to_string(toks[i*$SegW+1:i*$SegW+$SegW], ' ')) END AS arr
       |  FROM t
       |), occ AS (
       |  SELECT doc_id, unnest(arr) AS seg, unnest(generate_series(1, len(arr))) AS pos FROM segs
       |), keyed AS (
       |  SELECT doc_id, pos, seg, $h AS seg_h FROM occ
       |), freq AS (
       |  SELECT seg_h FROM keyed GROUP BY seg_h HAVING $freqHaving
       |)
       |SELECT k.doc_id AS doc_id,
       |  COUNT(*) AS n_segments,
       |  COUNT(*) FILTER (WHERE f.seg_h IS NULL) AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN f.seg_h IS NULL THEN k.seg END, chr(10) ORDER BY k.pos), '')) AS clean_fp
       |FROM keyed k LEFT JOIN freq f ON k.seg_h = f.seg_h
       |GROUP BY k.doc_id ORDER BY doc_id""".stripMargin
  }

  val c05Oracle: String = c05OracleWith("COUNT(*) > 2")

  /** Same ratio arithmetic as the operator: distinct-doc count compared
    * against total-docs × ratio with the ratio CAST TO DOUBLE — a bare
    * DuckDB literal is exact DECIMAL, which disagrees with Spark's
    * binary double at integer boundaries for some ratios (0.3 × 10 docs:
    * DECIMAL keeps a 3-doc segment, double strips it). The cast makes
    * the cross-engine parity structural, not ratio-dependent.
    */
  val c05bOracle: String = c05OracleWith(
    "COUNT(DISTINCT doc_id) > (SELECT COUNT(DISTINCT doc_id) FROM keyed) * CAST(0.004 AS DOUBLE)")

  /** Deterministic shuffle + token-budget shard packing rollup
    * ([[graft.operators.Packing.packShards]]): the "write training
    * shards" tail. Every (bucket, shard) reports its doc count and
    * token mass — integer arithmetic end-to-end, so the window prefix
    * sums replay exactly.
    */
  def c06ShardPack(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packShards(
      docs(s, dir), col("doc_id"), Text.tokenCount(col("text")),
      budget = 512L, nBuckets = 8, salt = "pack1")
      .groupBy("bucket", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("bucket", "shard")

  /** DuckDB twin of the [[graft.operators.Packing.packShards]]
    * assignment (t → p CTEs over `documents`): single owner for the
    * c06 rollup and c09 shard-file oracles.
    */
  private def duckPackCte(salt: String, nBuckets: Int): String = {
    val h = DuckOracle.h60(s"'$salt:' || CAST(doc_id AS VARCHAR)")
    s"""t AS (
       |  SELECT doc_id,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_tokens,
       |    $h AS key
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, n_tokens, key % $nBuckets AS bucket,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY key % $nBuckets ORDER BY key, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start_tok
       |  FROM t
       |)""".stripMargin
  }

  val c06Oracle: String =
    s"""WITH ${duckPackCte("pack1", 8)}
       |SELECT bucket, CAST(floor(start_tok / 512.0) AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM p GROUP BY bucket, shard ORDER BY bucket, shard""".stripMargin

  /** The shard-writer sink round trip
    * ([[graft.operators.Packing.writeShards]]): pack, WRITE one file
    * per (bucket, shard), then report each shard from the FILES — doc
    * count, token mass, file count (the one-artifact contract: oracle
    * pins it to literal 1), and a fingerprint of the doc ids in pack
    * order. The oracle replays the pack assignment and aggregates the
    * same fingerprint, so a shard file with a missing, foreign, or
    * misplaced doc hash-mismatches.
    */
  def c09ShardWrite(s: SparkSession, dir: String): DataFrame = {
    val out = Scratch.wiped(s, "shards", dir) // per-session scratch: see [[Scratch]]
    // budget 4096 (not c06's 512): the shard count, not the shard size,
    // drives this query's cost — at 512 the sf0.1 corpus fans out to
    // ~560 tiny files, paying file-creation overhead that a real
    // training shard (GBs, budget in the billions) never sees. The
    // one-file/order/fingerprint contracts are scale-free.
    graft.operators.Packing.writeShards(
      docs(s, dir), col("doc_id"), Text.tokenCount(col("text")),
      budget = 4096L, nBuckets = 8, salt = "pack1", path = out,
      payload = Seq(col("lang"), col("text")))
    s.read.parquet(out)
      .groupBy(col("bucket").cast("long").as("bucket"), col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        countDistinct(col("_metadata.file_path")).as("n_files"),
        md5(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("start_tok"), col("doc_id")))),
            x => x("doc_id").cast("string")))).as("order_fp"))
      .orderBy("bucket", "shard")
  }

  val c09Oracle: String =
    s"""WITH ${duckPackCte("pack1", 8)}
       |SELECT bucket, CAST(floor(start_tok / 4096.0) AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       |  CAST(1 AS BIGINT) AS n_files,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY start_tok, doc_id)) AS order_fp
       |FROM p GROUP BY bucket, shard ORDER BY bucket, shard""".stripMargin

  /** Length-distribution profile per source: exact token-count
    * percentiles (ordered-set aggregate) — the "where do I cut long/short
    * docs" report that precedes any length filter in a curation recipe.
    *
    * percentile_disc picks actual corpus values (no interpolation), so
    * the result is integer-exact across engines; the oracle replays the
    * SQL-standard definition (least value with cume_dist ≥ p) rather
    * than trusting another engine's quantile flavor. Scale note: Spark's
    * exact percentile buffers a value→count map per group — fine when
    * group count (sources) and distinct token counts are bounded, which
    * is this query's contract; unbounded-cardinality profiling belongs
    * to approx_percentile (a sketch, deliberately not oracle-gated).
    */
  def c07LengthProfile(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .select(col("source"), Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      .createOrReplaceTempView("__c07_docs")
    s.sql("""
      SELECT source,
        count(*) AS n_docs,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS p25,
        CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS p50,
        CAST(percentile_disc(0.9)  WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS p90,
        CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS p99,
        max(n_tokens) AS max_tokens
      FROM __c07_docs GROUP BY source ORDER BY source""")
  }

  val c07Oracle: String =
    s"""WITH t AS (
       |  SELECT source,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_tokens
       |  FROM documents
       |), d AS (
       |  SELECT source, n_tokens,
       |    cume_dist() OVER (PARTITION BY source ORDER BY n_tokens) AS cd
       |  FROM t
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(MIN(n_tokens) FILTER (WHERE cd >= 0.25) AS BIGINT) AS p25,
       |  CAST(MIN(n_tokens) FILTER (WHERE cd >= 0.5)  AS BIGINT) AS p50,
       |  CAST(MIN(n_tokens) FILTER (WHERE cd >= 0.9)  AS BIGINT) AS p90,
       |  CAST(MIN(n_tokens) FILTER (WHERE cd >= 0.99) AS BIGINT) AS p99,
       |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** The full training-data recipe as ONE declarative plan — quality
    * gate → exact dedup (keep-first) → benchmark decontamination →
    * deterministic stratified sample → token-budget shard packing →
    * shard rollup. Every stage is an already-proven primitive (c01,
    * c03, c04, c06); this query proves the COMPOSITION end to end, the
    * way a real pipeline would run it: one job, no materialization
    * between stages, every stage replayed by the oracle.
    *
    * Plan shape at scale: one enrichment scan + fp-shuffle dedup agg,
    * one broadcast contamination pass (eval side bounded), the sample
    * as a narrow filter, one bucket exchange for packing. The eval
    * slice is the corpus' own doc_id < 20 rows, so eval docs and their
    * near-copies inside the corpus are dropped by the decontamination
    * stage itself.
    */
  /** The curated-survivor frame (gate → keep-first dedup →
    * decontaminate → sample): the shared front of c08 (pack rollup) and
    * c10 (shard FILES) — single owner, like their oracle twin CTEs.
    */
  private def curatedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val kept = gatedDocs(s, dir).groupBy("fp")
      .agg(min(struct(col("doc_id"), col("lang"), col("text"), col("n_tokens"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.lang").as("lang"),
        col("k.text").as("text"), col("k.n_tokens").as("n_tokens"))
    // no .distinct() on the contaminated side: left_anti is unaffected
    // by right-side duplicates, and the distinct would be a pure extra
    // exchange + aggregate
    val contaminated = graft.operators.Dedup.contaminationPairs(
      kept, col("doc_id"), col("text"),
      d.filter(col("doc_id") < 20), col("doc_id"), col("text"), n = 5)
      .select("doc_id")
    val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")
    // distinct salts per stage: the sample membership hash must not
    // double as the pack order/bucket key (coupled draws)
    graft.operators.Sampling.stratifiedSample(
      clean, col("lang"), col("doc_id"),
      rates = Map("en" -> 0.5), defaultRate = 1.0, salt = "recipe-mix")
  }

  def c08FullRecipe(s: SparkSession, dir: String): DataFrame =
    graft.operators.Packing.packShards(
      curatedDocs(s, dir), col("doc_id"), col("n_tokens"),
      budget = 512L, nBuckets = 8, salt = "recipe-pack")
      .groupBy("bucket", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
      .orderBy("bucket", "shard")

  /** Stage-by-stage DuckDB replay: the c01 enrichment/gate/keep-first
    * fragments, the c03 shingle/contamination fragments (with the blank
    * exclusion), the c04 hash-threshold membership, and the c06 window
    * prefix-sum — composed in one statement.
    */
  /** The shared curated-survivor CTE chain (gate → keep-first →
    * decontaminate → sample → pack assignment `p`) — the oracle twin of
    * [[curatedDocs]] + packShards, shared by c08 and c10 (their final
    * SELECTs differ only in budget and reported columns; `start_tok`
    * is budget-independent).
    */
  private lazy val duckRecipeCte: String = {
    val hSamp = DuckOracle.h60("'recipe-mix:' || CAST(doc_id AS VARCHAR)")
    val hPack = DuckOracle.h60("'recipe-pack:' || CAST(doc_id AS VARCHAR)")
    s"""$duckGatedCte, keepers AS (
       |  SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY fp
       |), kept AS (
       |  SELECT f.doc_id, f.lang, f.n_tokens FROM f
       |  JOIN keepers k ON f.fp = k.fp AND f.doc_id = k.doc_id
       |), $duckShingleCte, evx AS (
       |  SELECT doc_id, unnest(shset) AS g FROM shg WHERE doc_id < 20 AND shset <> ['']
       |), kx AS (
       |  SELECT sg.doc_id, unnest(sg.shset) AS g FROM shg sg
       |  JOIN kept ON sg.doc_id = kept.doc_id WHERE sg.shset <> ['']
       |), clean AS (
       |  SELECT kept.* FROM kept
       |  WHERE doc_id NOT IN (SELECT DISTINCT kx.doc_id FROM kx JOIN evx ON kx.g = evx.g)
       |), samp AS (
       |  SELECT doc_id, n_tokens FROM clean
       |  WHERE $hSamp % 1000000 <
       |    CASE lang WHEN 'en' THEN 500000 ELSE 1000000 END
       |), p AS (
       |  SELECT doc_id, n_tokens, key % 8 AS bucket,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY key % 8 ORDER BY key, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start_tok
       |  FROM (SELECT *, $hPack AS key FROM samp)
       |)""".stripMargin
  }

  val c08Oracle: String =
    s"""WITH $duckRecipeCte
       |SELECT bucket, CAST(floor(start_tok / 512.0) AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
       |FROM p GROUP BY bucket, shard ORDER BY bucket, shard""".stripMargin

  /** The full recipe ended at the SINK (VERDICT r6 task 6): one
    * statement goes corpus → curated shard FILES — [[curatedDocs]]
    * chained into [[graft.operators.Packing.writeShards]] — then
    * reports each shard from the files with the c09 contract: doc
    * count, token mass, n_files pinned to literal 1, and the in-file
    * doc-order fingerprint over the CURATED survivors. Previously a
    * user hand-wired c08's assignment into writeShards; this is the
    * actual deliverable of a training-data pipeline, oracle-pinned end
    * to end. Budget 4096 for the same reason as c09 (shard COUNT, not
    * size, drives test-scale cost; the contracts are scale-free).
    */
  def c10RecipeShards(s: SparkSession, dir: String): DataFrame = {
    val out = Scratch.wiped(s, "recipe_shards", dir)
    // cached: writeShards consumes the curated frame twice (pack
    // assignment + payload join-back) — one enrichment scan, not two.
    // scopedCache: Verify/Bench clear the cache between queries; a
    // long-lived caller wraps in Dedup.scoped like the dedup operators.
    val curated = graft.operators.Dedup.scopedCache(curatedDocs(s, dir))
    graft.operators.Packing.writeShards(
      curated, col("doc_id"), col("n_tokens"),
      budget = 4096L, nBuckets = 8, salt = "recipe-pack", path = out,
      payload = Seq(col("lang"), col("text")))
    s.read.parquet(out)
      .groupBy(col("bucket").cast("long").as("bucket"), col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("shard_tokens"),
        countDistinct(col("_metadata.file_path")).as("n_files"),
        md5(concat_ws(",",
          transform(
            array_sort(collect_list(struct(col("start_tok"), col("doc_id")))),
            x => x("doc_id").cast("string")))).as("order_fp"))
      .orderBy("bucket", "shard")
  }

  val c10Oracle: String =
    s"""WITH $duckRecipeCte
       |SELECT bucket, CAST(floor(start_tok / 4096.0) AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       |  CAST(1 AS BIGINT) AS n_files,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY start_tok, doc_id)) AS order_fp
       |FROM p GROUP BY bucket, shard ORDER BY bucket, shard""".stripMargin

  /** Z-order clustering round trip ([[graft.etl.Zorder.writeClustered]]):
    * lineitem is rewritten z-clustered on (l_orderkey, l_partkey), then
    * a two-column point-box predicate reads it back. The oracle pins
    * CONTENT (the layout rewrite must lose/duplicate nothing under the
    * predicate — same rows as the original table); the data-SKIPPING
    * the layout exists for is metrics-asserted in ZorderSpec (the
    * clustered scan's parquet reader skips the row groups whose
    * min/max exclude the box, a random layout's cannot skip any).
    * Build-inside-the-query shape like v07/c09: a real deployment
    * clusters once and queries many times.
    */
  def z01ZorderSkip(s: SparkSession, dir: String): DataFrame = {
    val out = Scratch.wiped(s, "zorder_lineitem", dir)
    val li = graft.Tables.t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_extendedprice")
    graft.etl.Zorder.writeClustered(li, out, Seq("l_orderkey", "l_partkey"), nFiles = 16)
    s.read.parquet(out)
      .filter(col("l_orderkey").between(1000, 3000) && col("l_partkey").between(100, 400))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        graft.functions.Money.cents(col("l_extendedprice")).as("price_cents"),
        col("l_quantity").cast("long").as("qty"))
      .orderBy("l_orderkey", "l_partkey", "l_linenumber")
  }

  val z01Oracle: String =
    s"""SELECT l_orderkey, l_partkey, l_linenumber,
       |  CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
       |  CAST(l_quantity AS BIGINT) AS qty
       |FROM lineitem
       |WHERE l_orderkey BETWEEN 1000 AND 3000 AND l_partkey BETWEEN 100 AND 400
       |ORDER BY l_orderkey, l_partkey, l_linenumber""".stripMargin

  /** Fixed URL batch for c13 — the m05/r01 fixed-input convention:
    * the INPUTS are shared literals (here and in the oracle's VALUES),
    * the PIPELINE (parse, case folding, default-port strip, tracking
    * strip, registrable-domain heuristic, blocklist) is what the
    * cross-engine hash gates. Covers: case folding, default vs real
    * ports, tracking params interleaved with real ones (incl.
    * uppercase), fragments, empty paths/queries/params, userinfo,
    * multi-part TLDs, subdomains of blocked domains, single-label
    * hosts, shapeless strings, and null.
    */
  private val c13Urls: Seq[(Long, String)] = Seq(
    (0L, "HTTP://Example.COM:80/Path/Page?utm_source=x&id=42#frag"),
    (1L, "https://News.Site.co.uk:443/?fbclid=abc"),
    (2L, "https://blog.spam.example/post?a=1&utm_campaign=z&b=2"),
    (3L, "http://user:PW@Host.Org/sec"),
    (4L, "http://example.com"),
    (5L, "https://sub.deep.example.com:8443/x?x=1"),
    (6L, "ftp://Files.Example.com/data"),
    (7L, "not a url"),
    (8L, "www.example.com/path"),
    (9L, "http://localhost:8080/health"),
    (10L, "https://shop.com.au/item?ref=partner&id=7&ref_src=tw"),
    (11L, "https://a.ads.test/?gclid=1&utm_medium=m"),
    (12L, "HTTPS://EXAMPLE.COM/A?UTM_SOURCE=X"),
    (13L, "  http://pad.example.com/x  "),
    (14L, "https://example.com/?"),
    (15L, "http://example.com/a?b=2&&c=3"),
    (16L, null))

  private val c13Blocked = Seq("spam.example", "ads.test")

  /** URL curation hygiene ([[graft.functions.Urls]]): canonical form,
    * registrable domain, and blocklist flag for the fixed batch — the
    * whole normalizer pipeline as pure column expressions, one regex
    * parse per URL, oracle-replayed token-for-token.
    */
  def c13UrlFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Urls
    c13Urls.toDF("url_id", "url")
      .select(col("url_id"),
        Urls.normalizeUrl(col("url")).as("norm_url"),
        Urls.registrableDomain(Urls.hostOf(col("url"))).as("domain"),
        Urls.isBlockedDomain(col("url"), c13Blocked).as("blocked"))
      .orderBy("url_id")
  }

  /** DuckDB replay of the URL pipeline: same regexes (RE2-compatible
    * subset), same trim/fold/strip/filter order, same multi-part-TLD
    * set, same blocklist. `string_split` mirrors Spark's `split`
    * (both keep empty tokens; the filter drops them), negative list
    * indexing mirrors `element_at`, and the n-label guards mirror the
    * CaseWhen branches exactly.
    */
  val c13Oracle: String = {
    val values = c13Urls.map { case (i, u) =>
      if (u == null) s"($i, NULL)" else s"($i, '${u.replace("'", "''")}')"
    }.mkString(",\n      |    ")
    val multi = graft.functions.Urls.MultiPartTlds.map(t => s"'$t'").mkString(", ")
    val blocked = c13Blocked.map(b => s"'$b'").mkString(", ")
    s"""WITH raw(url_id, url) AS (VALUES
      |    $values
      |), u AS (
      |  SELECT url_id, url, regexp_replace(trim(url), '#.*$$', '') AS s FROM raw
      |), p AS (
      |  SELECT url_id, url, s,
      |    lower(regexp_extract(s, '^([A-Za-z][A-Za-z0-9+.-]*)://.*$$', 1)) AS scheme,
      |    lower(regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$$', 1)) AS auth0,
      |    regexp_extract(s, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*$$', 1) AS path0,
      |    regexp_extract(s, '^[^?]*\\?(.*)$$', 1) AS q0
      |  FROM u
      |), n AS (
      |  SELECT url_id, url, scheme, auth0,
      |    CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$$', '')
      |         WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$$', '')
      |         ELSE auth0 END AS auth,
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS pth,
      |    -- COALESCE: DuckDB's array_to_string of an EMPTY list is NULL,
      |    -- not '' (Spark's array_join is '') -- an emptied query must
      |    -- compare as '' or every tracking-only URL nulls out
      |    COALESCE(array_to_string(list_filter(string_split(q0, '&'),
      |      t -> t <> '' AND NOT regexp_matches(t, '(?i)^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$$')), '&'), '') AS kept,
      |    regexp_replace(regexp_replace(auth0, '^[^@]*@', ''), ':[0-9]+$$', '') AS host0
      |  FROM p
      |), d AS (
      |  SELECT url_id, url, scheme, auth0, auth, pth, kept,
      |    CASE WHEN url IS NULL OR scheme = '' OR auth0 = '' THEN NULL ELSE host0 END AS host,
      |    string_split(CASE WHEN url IS NULL OR scheme = '' OR auth0 = '' THEN NULL ELSE host0 END, '.') AS labels
      |  FROM n
      |), dom AS (
      |  SELECT url_id, url, scheme, auth0, auth, pth, kept, host,
      |    CASE WHEN host IS NULL THEN NULL
      |         WHEN len(labels) >= 3 AND (labels[-2] || '.' || labels[-1]) IN ($multi)
      |           THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
      |         WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
      |         ELSE host END AS domain
      |  FROM d
      |)
      |SELECT url_id,
      |  CASE WHEN url IS NULL OR scheme = '' OR auth0 = '' THEN NULL
      |       ELSE scheme || '://' || auth || pth ||
      |            (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) END AS norm_url,
      |  domain,
      |  CASE WHEN domain IS NULL THEN NULL ELSE domain IN ($blocked) END AS blocked
      |FROM dom ORDER BY url_id""".stripMargin
  }

  /** DSIR data selection ([[graft.operators.Dsir]]): importance-weight
    * every document between a hashed bag-of-words LM fit on the ENGLISH
    * subset (the "target domain") and one fit on the whole corpus, then
    * Gumbel-top-100 resample. Everything is deterministic — md5-bucketed
    * features, one-ln micro-nat terms, 50-bit exact-double Gumbel seeds
    * — so the oracle replays the ENTIRE pipeline: both LM fits, the
    * totals, every token's smoothed term, the per-doc sums, the noise,
    * and the top-k cut, bit-for-bit.
    */
  def c14DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.operators.Dsir.selectByPredicate(
      d, col("doc_id"), col("text"), isTarget = col("lang") === "en",
      buckets = 4096, k = 100, salt = "dsir1")
      .orderBy(col("key_micro").desc, col("doc_id"))
  }

  val c14Oracle: String = {
    val hTok = DuckOracle.h60("tok")
    val hSeed = DuckOracle.h60("'dsir1:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN text IS NULL THEN NULL
       |         WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = '' THEN []
       |         ELSE $duckToksNorm END AS toks
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, lang, $hTok % 4096 AS bucket
       |  FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM d WHERE toks IS NOT NULL)
       |), tgt AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct FROM tok WHERE lang = 'en' GROUP BY bucket
       |), rawc AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY bucket
       |), tot AS (
       |  SELECT CAST((SELECT SUM(ct) FROM tgt) AS BIGINT) AS nt,
       |         CAST((SELECT SUM(cr) FROM rawc) AS BIGINT) AS nr
       |), terms AS (
       |  SELECT tok.doc_id,
       |    CAST(ROUND(ln(
       |      ((CAST(COALESCE(tgt.ct, 0) AS DOUBLE) + 1.0) * CAST(tot.nr + 4096 AS DOUBLE)) /
       |      ((CAST(COALESCE(rawc.cr, 0) AS DOUBLE) + 1.0) * CAST(tot.nt + 4096 AS DOUBLE))
       |    ) * 1000000.0) AS BIGINT) AS t_micro
       |  FROM tok LEFT JOIN tgt USING (bucket) LEFT JOIN rawc USING (bucket) CROSS JOIN tot
       |), per AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(t_micro) AS BIGINT) AS lw_micro
       |  FROM terms GROUP BY doc_id
       |), w AS (
       |  SELECT d.doc_id,
       |    COALESCE(per.n_tokens, 0) AS n_tokens,
       |    COALESCE(per.lw_micro, 0) AS lw_micro,
       |    CAST(ROUND(-ln(-ln(
       |      (CAST($hSeed % 1125899906842624 AS DOUBLE) + 0.5) / 1125899906842624.0
       |    )) * 1000000.0) AS BIGINT) AS gumbel_micro
       |  FROM d LEFT JOIN per USING (doc_id)
       |)
       |SELECT doc_id, n_tokens, lw_micro, gumbel_micro,
       |       lw_micro + gumbel_micro AS key_micro
       |FROM w
       |ORDER BY key_micro DESC, doc_id LIMIT 100""".stripMargin
  }

  /** Split fractions + fold count shared by the c17 query and its
    * oracle — single owner so the thresholds cannot drift.
    */
  private val c17Fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val c17Folds = 5

  /** Deterministic train/val/test split + 5-fold assignment
    * ([[graft.operators.Sampling.assignSplits]]) — every doc's split
    * and fold are pure functions of its id, so any engine, any re-run,
    * any cluster reproduces the same partition with no coordination.
    * One narrow projection (two md5s per row), no shuffle.
    */
  def c17SplitAssign(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.assignSplits(
      docs(s, dir).select("doc_id"), col("doc_id"),
      c17Fractions, kFolds = c17Folds,
      splitSalt = "split1", foldSalt = "fold1")
      .select("doc_id", "split", "fold")
      .orderBy("doc_id")

  /** DuckDB replay: the SAME h60 digit-fold, the SAME integer band
    * bounds (computed by [[graft.operators.Sampling.splitBounds]] from
    * the same doubles — 0.8·M is not exactly 800000 in binary, so the
    * thresholds are derived once, not re-typed).
    */
  val c17Oracle: String = {
    val bounds = graft.operators.Sampling.splitBounds(c17Fractions)
    val names = c17Fractions.map(_._1)
    val cases = names.zip(bounds).dropRight(1)
      .map { case (n, b) => s"WHEN skey < $b THEN '$n'" }
      .mkString(" ")
    val hSplit = DuckOracle.h60("'split1:' || CAST(doc_id AS VARCHAR)")
    val hFold = DuckOracle.h60("'fold1:' || CAST(doc_id AS VARCHAR)")
    s"""WITH keyed AS (
       |  SELECT doc_id, $hSplit % ${graft.operators.Sampling.Modulus} AS skey,
       |    $hFold % $c17Folds AS fold0
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CASE $cases ELSE '${names.last}' END AS split,
       |  CAST(fold0 AS INT) AS fold
       |FROM keyed ORDER BY doc_id""".stripMargin
  }

  /** Per-source quota cap ([[graft.operators.Sampling.capPerStratum]]):
    * at most 10 docs per source, the smallest-sample-key survivors —
    * the "don't let one crawled host dominate" rule. The operator runs
    * the two-level (bucketed) top-N so a hot source never lands on one
    * task; the oracle replays the SAME selection with a single flat
    * QUALIFY, which is exactly the equivalence the two-level argument
    * guarantees.
    */
  def c18QuotaCap(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.capPerStratum(
      docs(s, dir).select("doc_id", "source"), col("source"), col("doc_id"),
      cap = 10, salt = "cap1")
      .orderBy("source", "doc_id")

  val c18Oracle: String = {
    val h = DuckOracle.h60("'cap1:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source, $h % ${graft.operators.Sampling.Modulus} AS skey
       |  FROM documents
       |) QUALIFY row_number() OVER (PARTITION BY source ORDER BY skey, doc_id) <= 10
       |ORDER BY source, doc_id""".stripMargin
  }

  /** Split-balance profile — the check every pipeline runs right after
    * assigning splits: per (split, fold), doc and token counts plus
    * each split's doc share, verifying the hash bands actually landed
    * near their target fractions and the folds stratify evenly. One
    * aggregate over the c17 assignment (3·5 = 15 output rows); the
    * share is one double division of exact longs over a window on the
    * already-aggregated frame.
    */
  /** c21 recipe: exact rational weights summing to 1; src3 is
    * deliberately over-asked (its target exceeds the corpus's supply →
    * threshold caps at M, a visible shortfall), src99 does not exist
    * (threshold 0, zero row — the recipe reports it rather than
    * crashing or silently renormalizing).
    */
  private val c21Weights: Seq[(String, (Long, Long))] = Seq(
    "src0" -> ((1L, 10L)), "src2" -> ((3L, 10L)),
    "src3" -> ((11L, 20L)), "src99" -> ((1L, 20L)))
  private val c21Budget = 3000L

  /** Budget-constrained mixture sampling
    * ([[graft.operators.Sampling.mixtureThresholds]]): prescribe the
    * mix as exact rational weights of a token budget, derive each
    * source's integer acceptance threshold from its OBSERVED token
    * supply, and report per source target / available / threshold /
    * kept — the recipe step run when the mixture is a spec ("50% web,
    * 30% wiki...") rather than a count-derived temperature (c12/c04).
    * One availability aggregate + one membership filter; thresholds
    * are floor-division integers the oracle re-derives from the same
    * sums, and the hash membership is the shared sampleKey replay.
    */
  def c21MixtureBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      Text.tokenCount(col("text")).cast("long").as("n_toks"))
    val avail = graft.operators.Sampling.mixtureAvail(
      d, col("source"), col("n_toks"), c21Weights.map(_._1))
    val thrs = graft.operators.Sampling.mixtureThresholds(
      avail, c21Weights, c21Budget)
    val kept = graft.operators.Sampling.mixtureSampleAt(
      d, col("source"), col("doc_id"), thrs, salt = "mixw1")
    val keptAgg = kept.groupBy("source").agg(
      count(lit(1)).as("n_kept"), sum("n_toks").as("t_kept"))
    val recipe = thrs
      .map { case (src, tT, thr) => (src, avail.getOrElse(src, 0L), tT, thr) }
      .toDF("source", "t_avail", "t_target", "threshold")
    // recipe-size × kept-rollup join. The hint goes on keptAgg: Spark
    // cannot build-LEFT a left outer join, so broadcast(recipe) would
    // be silently DROPPED (HintErrorLogger) and the join would fall
    // back to a shuffle — keptAgg is ≤ recipe-size by construction, so
    // broadcasting the right side is both honorable and correct.
    recipe.join(broadcast(keptAgg), Seq("source"), "left")
      .select(col("source"), col("t_avail"), col("t_target"), col("threshold"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("t_kept"), lit(0L)).as("t_kept"))
      .orderBy("source")
  }

  val c21Oracle: String = {
    val h = DuckOracle.h60("'mixw1:' || CAST(t.doc_id AS VARCHAR)")
    val vals = c21Weights
      .map { case (s, (num, den)) =>
        s"('$s', CAST($num AS BIGINT), CAST($den AS BIGINT))" }
      .mkString(", ")
    val srcList = c21Weights.map(w => s"'${w._1}'").mkString(", ")
    val nToks = s"CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END"
    s"""WITH recipe(source, wnum, wden) AS (VALUES $vals),
       |toks AS (
       |  SELECT doc_id, source, $nToks AS n_toks
       |  FROM documents WHERE source IN ($srcList)
       |),
       |avail AS (
       |  SELECT r.source, r.wnum, r.wden,
       |    COALESCE(CAST(SUM(t.n_toks) AS BIGINT), 0) AS t_avail
       |  FROM recipe r LEFT JOIN toks t ON t.source = r.source
       |  GROUP BY r.source, r.wnum, r.wden
       |),
       |thr AS (
       |  SELECT source, t_avail,
       |    CAST((CAST(wnum AS HUGEINT) * $c21Budget) // wden AS BIGINT) AS t_target,
       |    CAST(CASE WHEN t_avail = 0 THEN 0
       |      ELSE LEAST(CAST(1000000 AS HUGEINT),
       |        (((CAST(wnum AS HUGEINT) * $c21Budget) // wden) * 1000000) // t_avail)
       |      END AS BIGINT) AS threshold
       |  FROM avail
       |),
       |kept AS (
       |  SELECT t.source, t.n_toks FROM toks t JOIN thr ON thr.source = t.source
       |  WHERE $h % 1000000 < thr.threshold
       |),
       |k AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    CAST(SUM(n_toks) AS BIGINT) AS t_kept
       |  FROM kept GROUP BY source
       |)
       |SELECT thr.source, thr.t_avail, thr.t_target, thr.threshold,
       |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(COALESCE(k.t_kept, 0) AS BIGINT) AS t_kept
       |FROM thr LEFT JOIN k ON k.source = thr.source
       |ORDER BY thr.source""".stripMargin
  }

  /** Weight-biased per-source document selection via priority sampling
    * ([[graft.operators.Sampling.prioritySample]], Duffield–Lund–Thorup
    * JACM'07): keep the 16 highest-priority docs per source, priority
    * q = n_chars/u with u the h60-uniform — long docs are
    * proportionally likelier to survive, and the (k+1)-th priority τ
    * makes ht_chars = max(n_chars, τ) an unbiased estimator of any
    * subset's character total FROM THE SAMPLE ALONE (the property a
    * quality-audit pipeline needs when it can only afford to read k
    * docs per source). The oracle replays the IEEE double keys, ranks,
    * τ, and every HT weight — long→double casts and one division are
    * engine-identical, the whole determinism argument.
    */
  def c22PrioritySample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.prioritySample(
      docs(s, dir), col("source"), col("doc_id"), col("n_chars"),
      k = 16, salt = "c22")
      .select(col("stratum").as("source"), col("id").as("doc_id"),
        col("w").as("n_chars"), col("rnk"), col("tau"),
        col("ht_w").as("ht_chars"))
      .orderBy("source", "rnk")

  val c22Oracle: String = priorityOracleAt("c22")

  /** Incremental priority sampling via a PERSISTED, MERGED sample lake
    * ([[graft.operators.Sampling.prioritySketch]] per language
    * increment → parquet →
    * [[graft.operators.Sampling.mergePrioritySamples]]): DLT candidate
    * sets over row-disjoint increments pool into a superset of the
    * one-shot candidates, so re-ranking the pooled keys and recomputing
    * τ from the merged (k+1)-th reproduces the one-shot sample — ranks,
    * τ, and every Horvitz–Thompson weight — BIT-identically, which is
    * exactly what this oracle (the c22 replay at the c23 salt) asserts.
    * The corpus is scanned once per increment at ingest, never at
    * estimate time — the q27 lifecycle, for weighted samples.
    */
  def c23PriorityMerge(s: SparkSession, dir: String): DataFrame = {
    val out = graft.queries.Scratch.wiped(s, "priority_samples", dir)
    // null-safe increment axis (the q27 / shingleSets discipline): a
    // null lang must land in exactly one increment or its rows silently
    // vanish from every stratum's candidate pool
    val d = docs(s, dir)
      .withColumn("__lang", coalesce(col("lang"), lit("\u0000__null_lang")))
    val langs = d.select("__lang").distinct()
      .collect().map(_.getString(0)).sorted
    // an empty corpus has zero increments; seed the union with an
    // empty sketch frame so `reduce` cannot throw empty.reduceLeft —
    // the lifecycle then degrades to an empty result like every other
    // operator, instead of an unnamed crash
    (graft.operators.Sampling.prioritySketch(
      d.limit(0), col("source"), col("doc_id"), col("n_chars"),
      k = 16, salt = "c23") +:
      langs.toSeq.map(lg =>
        graft.operators.Sampling.prioritySketch(
          d.filter(col("__lang") === lg), col("source"), col("doc_id"),
          col("n_chars"), k = 16, salt = "c23")))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(out)
    graft.operators.Sampling.mergePrioritySamples(s.read.parquet(out), k = 16)
      .select(col("stratum").as("source"), col("id").as("doc_id"),
        col("w").as("n_chars"), col("rnk"), col("tau"),
        col("ht_w").as("ht_chars"))
      .orderBy("source", "rnk")
  }

  val c23Oracle: String = priorityOracleAt("c23")

  /** The one-shot Duffield–Lund–Thorup replay (keys, ranks, τ, HT
    * weights — see [[c22PrioritySample]]), parameterized on the salt so
    * the one-shot (c22) and merged-lake (c23) gates share one owner:
    * merged ≡ one-shot is the c23 claim, so the oracle text differs
    * ONLY in the draw.
    */
  private def priorityOracleAt(salt: String): String = {
    val h = DuckOracle.h60(s"'$salt:' || CAST(doc_id AS VARCHAR)")
    s"""WITH kk AS (
       |  SELECT source, doc_id, n_chars,
       |    CAST($h + 1 AS DOUBLE) / CAST(n_chars AS DOUBLE) AS key
       |  FROM documents
       |), r AS (
       |  SELECT source, doc_id, n_chars, key,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY key, doc_id)
       |      AS INT) AS rnk
       |  FROM kk
       |), ta AS (
       |  SELECT source,
       |    1152921504606846976.0 / MAX(CASE WHEN rnk = 17 THEN key END) AS tau
       |  FROM r GROUP BY source
       |)
       |SELECT r.source, r.doc_id, r.n_chars, r.rnk,
       |  COALESCE(ta.tau, 0.0) AS tau,
       |  GREATEST(CAST(r.n_chars AS DOUBLE), COALESCE(ta.tau, 0.0)) AS ht_chars
       |FROM r LEFT JOIN ta ON r.source = ta.source
       |WHERE r.rnk <= 16
       |ORDER BY r.source, r.rnk""".stripMargin
  }

  def c19SplitProfile(s: SparkSession, dir: String): DataFrame = {
    val assigned = graft.operators.Sampling.assignSplits(
      docs(s, dir).select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_toks")),
      col("doc_id"), c17Fractions, kFolds = c17Folds,
      splitSalt = "split1", foldSalt = "fold1")
    val byCell = assigned.groupBy("split", "fold")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    // whole-frame window over the 15-row (split, fold) rollup — fine at
    // any corpus size. pmod(n_docs, 1) ≡ 0 but is attribute-anchored,
    // so the optimizer keeps the partition spec and WindowExec does not
    // warn (a bare lit(1) gets folded to an EMPTY spec → warning spam)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("n_docs"), lit(1)))
    byCell
      .withColumn("total_docs", sum(col("n_docs")).over(w))
      .select(col("split"), col("fold"), col("n_docs"), col("n_tokens"),
        (col("n_docs").cast("double") / col("total_docs").cast("double")).as("doc_share"))
      .orderBy("split", "fold")
  }

  val c19Oracle: String = {
    val bounds = graft.operators.Sampling.splitBounds(c17Fractions)
    val names = c17Fractions.map(_._1)
    val cases = names.zip(bounds).dropRight(1)
      .map { case (n, b) => s"WHEN skey < $b THEN '$n'" }
      .mkString(" ")
    val hSplit = DuckOracle.h60("'split1:' || CAST(doc_id AS VARCHAR)")
    val hFold = DuckOracle.h60("'fold1:' || CAST(doc_id AS VARCHAR)")
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    CASE WHEN regexp_replace(text, '^\\s+|\\s+$$', '', 'g') = '' THEN 0 ELSE len($duckToksRaw) END AS n_toks,
       |    $hSplit % ${graft.operators.Sampling.Modulus} AS skey,
       |    $hFold % $c17Folds AS fold0
       |  FROM documents
       |), a AS (
       |  SELECT CASE $cases ELSE '${names.last}' END AS split,
       |    CAST(fold0 AS INT) AS fold, n_toks
       |  FROM keyed
       |), c AS (
       |  SELECT split, fold, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM a GROUP BY split, fold
       |)
       |SELECT split, fold, n_docs, n_tokens,
       |  CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS doc_share
       |FROM c ORDER BY split, fold""".stripMargin
  }

  /** Chi-square independence profile of the (lang × source) grid — the
    * stratification sanity check run before sampling (a source that
    * over-carries one language skews every per-language quota drawn
    * from it). Observed counts, margins, and the grand total are exact
    * longs; expected counts and per-cell contributions are ONE fixed
    * double tree over those exact longs (deterministic, engine-
    * replayable — same discipline as t20's score tree), and the grid is
    * COMPLETED (absent combos surface as o=0 rows — their expected
    * count still contributes). Dim-sized crossJoin of the two margin
    * frames; never a corpus-side product.
    */
  def c20LangSourceChisq(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cells = d.groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rows = d.groupBy("lang").agg(count(lit(1)).as("row_n"))
    val cols = d.groupBy("source").agg(count(lit(1)).as("col_n"))
    val total = d.agg(count(lit(1)).as("total"))
    val e = (col("row_n").cast("double") * col("col_n").cast("double")) /
      col("total").cast("double")
    rows.crossJoin(cols)
      .join(cells, Seq("lang", "source"), "left")
      .crossJoin(broadcast(total))
      .select(
        col("lang"), col("source"),
        coalesce(col("o"), lit(0L)).as("o"),
        col("row_n"), col("col_n"),
        e.as("e"),
        ((coalesce(col("o"), lit(0L)).cast("double") - e) *
          (coalesce(col("o"), lit(0L)).cast("double") - e) / e).as("contrib"))
      .orderBy("lang", "source")
  }

  val c20Oracle: String =
    """WITH cells AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY lang, source
      |), r AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS row_n FROM documents GROUP BY lang
      |), c AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS col_n FROM documents GROUP BY source
      |), t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents
      |)
      |SELECT r.lang, c.source, CAST(COALESCE(cells.o, 0) AS BIGINT) AS o,
      |  r.row_n, c.col_n,
      |  CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE) / CAST(t.total AS DOUBLE) AS e,
      |  (CAST(COALESCE(cells.o, 0) AS DOUBLE) - CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE) / CAST(t.total AS DOUBLE))
      |    * (CAST(COALESCE(cells.o, 0) AS DOUBLE) - CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE) / CAST(t.total AS DOUBLE))
      |    / (CAST(r.row_n AS DOUBLE) * CAST(c.col_n AS DOUBLE) / CAST(t.total AS DOUBLE)) AS contrib
      |FROM r CROSS JOIN c CROSS JOIN t
      |LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source
      |ORDER BY r.lang, c.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c21_mixture_budget" -> (c21MixtureBudget _),
    "c22_priority_sample" -> (c22PrioritySample _),
    "c23_priority_merge" -> (c23PriorityMerge _),
    "c20_lang_source_chisq" -> (c20LangSourceChisq _),
    "c19_split_profile" -> (c19SplitProfile _),
    "c18_quota_cap" -> (c18QuotaCap _),
    "c17_split_assign" -> (c17SplitAssign _),
    "c14_dsir_select" -> (c14DsirSelect _),
    "c15_contamination_share" -> (c15ContaminationShare _),
    "c16_contamination_by_source" -> (c16ContaminationBySource _),
    "z01_zorder_skip" -> (z01ZorderSkip _),
    "c13_url_filter" -> (c13UrlFilter _),
    "c01_corpus_curation" -> (c01CorpusCuration _),
    "c02_dup_profile" -> (c02DupProfile _),
    "c03_decontamination" -> (c03Decontamination _),
    "c11_bloom_decontam" -> (c11BloomDecontam _),
    "c12_temperature_mix" -> (c12TemperatureMix _),
    "c04_sample_mix" -> (c04SampleMix _),
    "c05_boilerplate_strip" -> (c05BoilerplateStrip _),
    "c05b_boilerplate_ratio" -> (c05bBoilerplateRatio _),
    "c06_shard_pack" -> (c06ShardPack _),
    "c07_length_profile" -> (c07LengthProfile _),
    "c08_full_recipe" -> (c08FullRecipe _),
    "c09_shard_write" -> (c09ShardWrite _),
    "c10_recipe_shards" -> (c10RecipeShards _)
  )

  val oracles: Map[String, String] = Map(
    "c21_mixture_budget" -> c21Oracle,
    "c22_priority_sample" -> c22Oracle,
    "c23_priority_merge" -> c23Oracle,
    "c20_lang_source_chisq" -> c20Oracle,
    "c19_split_profile" -> c19Oracle,
    "c18_quota_cap" -> c18Oracle,
    "c17_split_assign" -> c17Oracle,
    "c14_dsir_select" -> c14Oracle,
    "c15_contamination_share" -> c15Oracle,
    "c16_contamination_by_source" -> c16Oracle,
    "z01_zorder_skip" -> z01Oracle,
    "c13_url_filter" -> c13Oracle,
    "c01_corpus_curation" -> c01Oracle,
    "c02_dup_profile" -> c02Oracle,
    "c03_decontamination" -> c03Oracle,
    // Bloom pre-filtering must have ZERO semantic footprint (no false
    // negatives) — the exact-decontamination replay IS the oracle
    "c11_bloom_decontam" -> c03Oracle,
    "c12_temperature_mix" -> c12Oracle,
    "c04_sample_mix" -> c04Oracle,
    "c05_boilerplate_strip" -> c05Oracle,
    "c05b_boilerplate_ratio" -> c05bOracle,
    "c06_shard_pack" -> c06Oracle,
    "c07_length_profile" -> c07Oracle,
    "c08_full_recipe" -> c08Oracle,
    "c09_shard_write" -> c09Oracle,
    "c10_recipe_shards" -> c10Oracle
  )
}
