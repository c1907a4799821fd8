package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Hashing, Text}

/** Document deduplication operators for large-scale corpus curation.
  *
  * All operators are pure DataFrame transforms: narrow per-row expression
  * work (hashing, shingling) followed by equi-joins/aggregations on
  * derived keys — the only shuffles are on those keys, so every strategy
  * here scales horizontally (no driver collects, no cross joins except
  * where a broadcast side is provably tiny).
  *
  * CALLER CONTRACT: the pair operators cache narrow intermediates
  * (shingle sets, signatures) that their multi-branch plans re-read.
  * Wrap pipeline runs in [[Dedup.scoped]] — materialize results inside
  * the block and every intermediate block is unpersisted on exit, so
  * long-lived sessions (daemon mode) cannot accumulate storage.
  * Outside a scope the Dataset-level blocks live until the caller
  * clears them (`spark.catalog.clearCache()` — Verify and Bench both
  * do). [[groupPairs]] is the one exception in KIND: its state is
  * RDD-level localCheckpoint blocks (lineage truncation — see its
  * body), which `clearCache` cannot reach; inside a scope they release
  * deterministically via [[scopedCleanup]], outside one they are
  * label-pair-sized and fall to the ContextCleaner on GC. And because
  * a truncated checkpoint cannot recompute, a groupPairs result that
  * escapes its scope FAILS FAST on the next action instead of silently
  * recomputing — the materialize-inside-the-scope contract is enforced,
  * not advisory, for that operator.
  *
  * Reference behaviors re-expressed: exact content-hash duplicate groups
  * (/root/reference/src/file_indexing_system.py:246-319) and
  * bounded-distance similarity grouping
  * (/root/reference/src/media_fingerprinting.py:278-310).
  */
object Dedup {

  /** Frames cached by operators in the current [[scoped]] extent.
    * InheritableThreadLocal so threads SPAWNED inside a scope register
    * into the same (synchronized) buffer; see the [[scoped]] contract
    * for the pool caveat.
    */
  private val scopeTL: InheritableThreadLocal[Option[scala.collection.mutable.ListBuffer[DataFrame]]] =
    new InheritableThreadLocal[Option[scala.collection.mutable.ListBuffer[DataFrame]]] {
      override def initialValue(): Option[scala.collection.mutable.ListBuffer[DataFrame]] = None
    }

  /** Cache `df`, registering it with the enclosing [[scoped]] block
    * (if any) for unpersist-on-exit. A frame whose plan is ALREADY
    * cached (CacheManager lookup, so it catches plan-equal frames, not
    * just this object) passes through untouched: re-caching would
    * no-op with a warning, and registering it here would let THIS
    * scope's exit unpersist data a caller's wider scope still owns.
    */
  private[graft] def scopedCache(df: DataFrame): DataFrame = {
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) return df
    val c = df.cache()
    scopeTL.get().foreach(b => b.synchronized { b += c })
    c
  }

  /** Arbitrary release actions for the enclosing [[scoped]] block —
    * the RDD-level twin of [[scopedCache]], for persisted state
    * `Dataset.unpersist` cannot reach (localCheckpoint blocks inside
    * [[groupPairs]]). No-op outside a scope (blocks then fall to the
    * ContextCleaner, the documented outside-a-scope posture).
    */
  private val cleanupTL: InheritableThreadLocal[Option[scala.collection.mutable.ListBuffer[() => Unit]]] =
    new InheritableThreadLocal[Option[scala.collection.mutable.ListBuffer[() => Unit]]] {
      override def initialValue(): Option[scala.collection.mutable.ListBuffer[() => Unit]] = None
    }

  private[graft] def scopedCleanup(f: () => Unit): Unit =
    cleanupTL.get().foreach(b => b.synchronized { b += f })

  /** Run `body` and unpersist every intermediate frame the Dedup
    * operators cached in its dynamic extent. Results must be
    * MATERIALIZED inside the block — a lazy DataFrame escaping the
    * scope recomputes its cached inputs from source on first action
    * (correct, just slower).
    *
    * THREADING CONTRACT (hard requirement): operator frames must be
    * BUILT either on the scope's thread or on threads *created inside*
    * the scope (those inherit the registration buffer). Frames built on
    * pre-existing pool threads — `scala.concurrent` default pool,
    * parallel collections — do NOT see the scope and their cached
    * intermediates escape cleanup; daemon-mode callers using per-
    * pipeline pools must call `spark.catalog.clearCache()` themselves.
    */
  def scoped[T](body: => T): T = {
    val prev = scopeTL.get()
    val prevCleanup = cleanupTL.get()
    val buf = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val cleanups = scala.collection.mutable.ListBuffer.empty[() => Unit]
    scopeTL.set(Some(buf))
    cleanupTL.set(Some(cleanups))
    try body
    finally {
      scopeTL.set(prev)
      cleanupTL.set(prevCleanup)
      // snapshot under the lock; a straggler thread appending after the
      // drain is the documented out-of-contract case
      val frames = buf.synchronized(buf.toList)
      frames.foreach(_.unpersist(false)) // double-unpersist is a no-op
      val fs = cleanups.synchronized(cleanups.toList)
      fs.foreach(f => f())
    }
  }

  /** (id, [block,] sh) shingle-set frame with the token array
    * materialized as an attribute between projections — each
    * non-attribute occurrence of the token expression would otherwise
    * re-run the regex tokenizer per row (see Text.shinglesOfToks).
    */
  private def shingleSets(
      df: DataFrame, id: Column, text: Column, n: Int,
      blockCol: Option[Column] = None): DataFrame = {
    // null-safe block key: NULL never equi-joins with NULL, so a null
    // block value would silently exclude its documents from pairing
    val base = df.select(
      (Seq(id.as("doc_id")) ++
        blockCol.map(b => coalesce(b.cast("string"), lit("\u0000__null_block")).as("blk")).toSeq :+
        Text.tokens(Text.normalize(text)).as("__toks")): _*)
    base
      // NULL text → NULL token array → the [""] degenerate shingle set;
      // null-text docs would then all pair as jaccard-1.0 "duplicates".
      // Drop them, like exactKeepFirst drops null fingerprints (and like
      // the DuckDB oracle, where unnest over NULL yields no posting rows).
      .filter(col("__toks").isNotNull)
      .withColumn("sh", array_sort(array_distinct(Text.shinglesOfToks(col("__toks"), n))))
      .drop("__toks")
  }

  /** Exact dedup by content fingerprint: keep the lowest id per group
    * ("keep oldest" policy, reference templates/duplicate_detection.yaml).
    */
  def exactKeepFirst(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), Text.fingerprint(text).as("fp"))
      // null text → null fingerprint: those rows are NOT duplicates of
      // each other (same guard as FileIndex.duplicateGroups)
      .filter(col("fp").isNotNull)
      .groupBy("fp")
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id", "fp")

  /** Incremental exact dedup — the shape production corpora actually
    * run: yesterday's corpus is already deduped and its fingerprints
    * persisted as an INDEX; today's batch must drop (a) anything the
    * index has seen and (b) its own internal duplicates, without
    * re-touching the historical corpus text. Survivors of `incoming`:
    * keep-first within the batch, then LEFT ANTI against the index on
    * fp.
    *
    * Scale shape: the index side is fingerprints ONLY (16-byte md5 per
    * historical doc — billions of rows is a few tens of GB, scanned
    * column-pruned, never the text); the batch aggregates keep-first
    * with map-side partial min (hot boilerplate fps collapse before
    * the shuffle), then one fp-keyed anti-join. A small daily batch
    * against a huge index is exactly the AQE broadcast case (the
    * AGGREGATED batch side broadcasts, the index never shuffles);
    * comparable sides take the ordinary shuffled anti-join.
    *
    * `existingFps` must expose an `fp` column (e.g. a persisted
    * [[exactKeepFirst]] output, or `select(Text.fingerprint(text))` of
    * the historical corpus).
    */
  def incrementalKeepFirst(
      existingFps: DataFrame, incoming: DataFrame,
      id: Column, text: Column): DataFrame =
    exactKeepFirst(incoming, id, text)
      .join(existingFps.select(col("fp")), Seq("fp"), "left_anti")
      .select("doc_id", "fp")

  /** Exact duplicate *groups* (the A1 GROUP BY/HAVING shape): one row per
    * fingerprint with >1 member, with member ids collected and sorted.
    */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), Text.fingerprint(text).as("fp"))
      .filter(col("fp").isNotNull) // see exactKeepFirst
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), sort_array(collect_list("doc_id")).as("members"))
      .filter(col("n") > 1)

  /** n-gram Jaccard similarity pairs via an inverted-index equi-join
    * (shingle → doc posting list) within blocking keys, with a
    * document-frequency cap on the posting lists.
    *
    * A shingle shared by f documents contributes f² candidate pairs: one
    * boilerplate line ("all rights reserved …") across a block makes the
    * posting-list self-join quadratic in the block size. Shingles with
    * document frequency > `dfCap` are dropped from CANDIDATE GENERATION
    * only — reported `inter`/`uni`/`jaccard` values are still exact
    * (computed from the full shingle sets in the verify join). The only
    * approximation: a pair whose shared shingles are ALL hotter than
    * `dfCap` is missed — at the default cap that requires a pair made
    * of pure corpus-wide boilerplate, which carries ~no Jaccard signal.
    *
    * `blockCol` bounds the candidate space (e.g. language+source); pass
    * a constant column to disable blocking.
    */
  def jaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      blockCol: Column,
      n: Int,
      minJaccard: Double,
      dfCap: Int = 1000): DataFrame = {
    // Materialize the shingle sets ONCE: candidate generation and verify
    // both scan them — without the cache the (regex-split → n-gram →
    // distinct) expression runs per branch. The cached frame is
    // (id, block, array<string>) — narrow relative to the corpus; a
    // 100 TB pipeline would persist it to parquet between stages instead.
    val docs = scopedCache(shingleSets(df, id, text, n, Some(blockCol)))
    val ex = docs.select(col("doc_id"), col("blk"), explode(col("sh")).as("shingle"))
    // posting-list df per (block, shingle): one narrow aggregate; keys
    // with df > dfCap are excluded before the self-join
    val keep = ex.groupBy("blk", "shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap && col("df") > 1)
      .select("blk", "shingle")
    val exKept = ex.join(keep, Seq("blk", "shingle"))
    val cand = exKept.as("a")
      .join(
        exKept.as("b"),
        col("a.blk") === col("b.blk") && col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // verify with the FULL shingle sets: inter/uni stay exact even when
    // hot shingles were excluded from candidate generation
    cand
      .join(docs.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(docs.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(col("sh1")) + size(col("sh2")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "inter", "uni", "jaccard")
  }

  /** Prefix-filtered set-similarity self-join — all pairs with token
    * Jaccard ≥ tNum/tDen — the AllPairs/PPJoin family (Bayardo, Ma &
    * Srikant, WWW 2007; Xiao et al., WWW 2008), the third lossless
    * pair strategy next to [[simhashPairs]] (Hamming pigeonhole) and
    * [[editDistancePairs]] (segment pigeonhole): if J(x,y) ≥ t then
    * |x∩y| ≥ ⌈t·|x|⌉, so the SMALLEST common token under any fixed
    * total token order must sit inside BOTH sides' first
    * sz − ⌈t·sz⌉ + 1 tokens — the prefixes. Candidates are a
    * prefix-postings SELF-join (plus the size band
    * tDen·s_small ≥ tNum·s_big); the t-fraction tail of every set
    * never enters the join at all.
    *
    * The token order is (corpus document frequency asc, token asc) —
    * rare-first, the selectivity heuristic that makes prefixes nearly
    * unique in practice (correctness holds for any order; df order is
    * pure performance). The threshold is a RATIONAL tNum/tDen and the
    * final predicate is integer cross-multiplication
    * (`tDen·inter ≥ tNum·union`) — membership can never flap on float
    * rounding at the boundary.
    *
    * Scale shape: one token-df aggregate (map-side partials absorb hot
    * tokens), one doc-keyed sort-collect, a prefix×prefix equi-join
    * (both sides carry ONLY prefix tokens — measured 18.8 s → a few
    * seconds at sf0.1 vs the prefix×full form), and an exact verify
    * over the candidate pairs' full sorted sets. Contrast
    * [[jaccardPairs]]: that strategy CAPS hot postings (df ≤ cap,
    * lossy for pairs meeting only on hot tokens); this one is lossless
    * — its cost control is the prefix itself, which shrinks as sets
    * grow (the t-fraction tail never joins).
    *
    * Null ids and tokenless docs are excluded. Output:
    * (d1, d2, inter, uni, jaccard), d1 < d2.
    */
  def prefixJaccardPairs(
      df: DataFrame, id: Column, text: Column,
      tNum: Int, tDen: Int, n: Int = 3): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must satisfy 0 < tNum/tDen <= 1, got $tNum/$tDen")
    // n-gram SHINGLE sets (the d02 construction, block-free), not raw
    // unigrams: prefix filtering lives or dies on element rarity, and
    // unigram vocabularies are small enough that even the rarest 40%
    // of a doc's tokens collide corpus-wide (measured at sf0.1: the
    // unigram form built ~raw-pair-scale candidates and ran 14.7 s;
    // shingles are near-unique outside true near-dups). Cache is
    // DOC-LEVEL sets — both consumers re-derive postings with one
    // cheap explode.
    val sets = scopedCache(
      shingleSets(df, id, text, n)
        .select(col("doc_id"), col("sh").as("ts"))
        .filter(col("doc_id").isNotNull && size(col("ts")) > 0))
    val toks = sets.select(col("doc_id"), explode(col("ts")).as("token"))
    val dfreq = toks.groupBy("token").agg(count(lit(1)).as("tdf"))
    // per-doc tokens in (df, token) order; the prefix keeps
    // sz − ⌈t·sz⌉ + 1 of them, with the ceiling in integer arithmetic:
    // ⌈a·n/b⌉ = (a·n + b − 1) div b
    val ordered = scopedCache(
      toks.join(dfreq, "token")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("tdf"), col("token"))))
          .as("arr"))
        .select(
          col("doc_id"),
          expr("transform(arr, e -> e.token)").as("ts"),
          size(col("arr")).as("sz"))
        .withColumn("px",
          col("sz") - expr(s"($tNum * sz + $tDen - 1) div $tDen") + 1))
    // Candidates need a common token in BOTH prefixes: the smallest
    // common token τ of a qualifying pair sits inside each side's
    // prefix (were τ outside x's, all ≥⌈t·sz⌉ shared tokens would
    // crowd into x's ⌈t·sz⌉−1 suffix slots — pigeonhole), so
    // prefix×prefix is still lossless and the full posting side never
    // enters the join. The size band (tDen·s_small ≥ tNum·s_big ⇔
    // J ≥ t is size-feasible) prunes inside the join, before the
    // pair-distinct shuffle.
    val prefixPost = ordered.select(col("doc_id"), col("sz"),
      explode(expr("slice(ts, 1, px)")).as("token"))
    val cand = prefixPost.as("a")
      .join(prefixPost.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(tDen) * least(col("a.sz"), col("b.sz")) >=
            lit(tNum) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cand
      .join(ordered.select(col("doc_id").as("d1"), col("ts").as("t1"),
        col("sz").as("s1")), "d1")
      .join(ordered.select(col("doc_id").as("d2"), col("ts").as("t2"),
        col("sz").as("s2")), "d2")
      .withColumn("inter", size(array_intersect(col("t1"), col("t2"))))
      .withColumn("uni", col("s1") + col("s2") - col("inter"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * col("uni"))
      .select(col("d1"), col("d2"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** Cross-document repeated n-token spans — the exact-substring dedup
    * signal (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499, at fixed window length; the
    * reference's duplicate templates stop at whole-file identity —
    * templates/duplicate_detection.yaml): every n-token window whose
    * TEXT occurs in ≥ `minDocs` distinct documents, with exact
    * distinct-document and total-occurrence counts. Windows keep
    * multiplicity (unlike [[jaccardPairs]]' shingle SETS): `n_occ`
    * counts every occurrence, including repeats within one document.
    *
    * Two-phase and fingerprint-pruned, the
    * [[Sketches.heavyHitters]] discipline: phase 1 shuffles only
    * (rolling-hash fp, doc_id) pairs — the wide span strings never
    * leave their scan stage — and keeps fps spanning ≥ `minDocs` docs;
    * equal spans always collide to the same fp, so the candidate set
    * is a SUPERSET of the truth and the pruning is exact-preserving.
    * Phase 2 re-derives windows, keeps candidate fps (the candidate
    * side is post-aggregation, so AQE broadcasts it when it is small),
    * and groups by the REAL span text, where any cross-span fp
    * collision dies and both counts are recomputed exactly. A
    * corpus-wide boilerplate span is just a hot GROUP BY key — partial
    * aggregation absorbs it map-side, and with no pair join there is
    * no f² fan-out to cap (contrast [[jaccardPairs]]' dfCap).
    */
  def repeatedSpans(
      df: DataFrame, id: Column, text: Column,
      n: Int, minDocs: Int): DataFrame = {
    require(n >= 1, s"span length must be >= 1 token, got $n")
    require(minDocs >= 2,
      s"a span in < 2 distinct docs is not repeated; got minDocs=$minDocs")
    // null text has no windows (the whole-text fallback would shingle
    // it to [""], pairing every null doc with every EMPTY doc)
    val base = scopedCache(
      df.filter(text.isNotNull)
        .select(id.as("doc_id"), Text.shingles(text, n).as("__sh")))
    val cand = base
      .select(col("doc_id"),
        explode(transform(col("__sh"), s => Text.rollingHash(s))).as("fp"))
      .groupBy("fp")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)
      .select("fp")
    base
      .select(col("doc_id"), explode(col("__sh")).as("span"))
      .withColumn("fp", Text.rollingHash(col("span")))
      .join(cand, "fp")
      .groupBy("span")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
      .select("span", "n_docs", "n_occ")
  }

  /** Per-document duplication share from [[repeatedSpans]]: for every
    * document with at least one window, the fraction of its n-token
    * windows (with multiplicity) whose span repeats across ≥ `minDocs`
    * documents — the "mostly boilerplate" curation signal (drop or
    * downweight docs above a share threshold). Null-text documents
    * have no windows and are absent from the output, mirroring the
    * tokenizer's null semantics.
    *
    * The repeated-span relation is distinct-by-span, so the left join
    * marks each window without fan-out; the share is an exact ratio of
    * two exact longs (bit-stable across engines).
    */
  def repeatedSpanShare(
      df: DataFrame, id: Column, text: Column,
      n: Int, minDocs: Int): DataFrame = {
    val rep = repeatedSpans(df, id, text, n, minDocs)
      .select(col("span"), lit(1L).as("__rep"))
    df.filter(text.isNotNull) // same null contract as repeatedSpans
      .select(id.as("doc_id"), explode(Text.shingles(text, n)).as("span"))
      .join(rep, Seq("span"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        coalesce(sum("__rep"), lit(0L)).as("n_repeated"))
      .withColumn("dup_share",
        col("n_repeated").cast("double") / col("n_spans").cast("double"))
  }

  /** Benchmark-decontamination join (LLM-pipeline op): corpus documents
    * sharing at least one distinct word n-gram with any eval/benchmark
    * document, with the shared-distinct-n-gram count per (corpus, eval)
    * pair. The standard pre-training hygiene step: any corpus doc that
    * appears here leaks eval content and gets dropped or flagged
    * (decontamination is exact by contract — no df-cap, unlike
    * [[ngramPairs]]' similarity search).
    *
    * 100 TB posture: the EVAL side is broadcast — benchmark suites are
    * bounded (10^3..10^6 shingles) while the corpus is not, so the
    * corpus streams through one explode + broadcast-hash-join +
    * partial-count pass; the only shuffle is the final (corpus, eval)
    * pair aggregation, which is result-sized. Pass `broadcastEval =
    * false` only if the eval set genuinely outgrows executor memory —
    * the join then falls back to a shuffle on the shingle key.
    *
    * BLANK documents (zero tokens) are excluded from BOTH sides: they
    * shingle to the degenerate [""] set, so one whitespace-only eval row
    * against a web corpus (where blank docs are plentiful) would flag
    * every blank corpus doc as contaminated. A blank doc cannot leak
    * benchmark content; short-but-nonempty docs keep their whole-text
    * fallback shingle.
    */
  def contaminationPairs(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      evalSet: DataFrame, evalId: Column, evalText: Column,
      n: Int = 5, broadcastEval: Boolean = true): DataFrame = {
    val blank = array(lit(""))
    val c = shingleSets(corpus, corpusId, corpusText, n)
      .filter(col("sh") =!= blank)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val e0 = shingleSets(evalSet, evalId, evalText, n)
      .filter(col("sh") =!= blank)
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("g"))
    val e = if (broadcastEval) broadcast(e0) else e0
    c.join(e, "g")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-document contamination SHARE — the Lee et al. (2022) overlap
    * fraction upgrading [[contaminationPairs]]' boolean hit list: for
    * every corpus document, the fraction of its DISTINCT n-gram
    * shingles that appear anywhere in the eval set. Pipelines
    * threshold this ("drop if > 10% of 5-grams leak") instead of
    * dropping on any single shared shingle — one common phrase should
    * not disqualify a long document.
    *
    * Same 100 TB posture as [[contaminationPairs]]: the eval side
    * collapses to its DISTINCT shingle set (benchmark-bounded) and
    * broadcasts; the corpus streams through one explode + broadcast
    * LEFT join + partial-count pass, so every corpus doc reports even
    * at zero overlap, and the only shuffle is the per-doc aggregation.
    * Output: (doc_id, n_shingles, n_contaminated, share).
    */
  def contaminationShare(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      evalSet: DataFrame, evalId: Column, evalText: Column,
      n: Int = 5, broadcastEval: Boolean = true): DataFrame = {
    val blank = array(lit(""))
    val c = shingleSets(corpus, corpusId, corpusText, n)
      .filter(col("sh") =!= blank)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val eg0 = shingleSets(evalSet, evalId, evalText, n)
      .filter(col("sh") =!= blank)
      .select(explode(col("sh")).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    val eg = if (broadcastEval) broadcast(eg0) else eg0
    c.join(eg, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .withColumn("share",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** [[contaminationPairs]] behind a Bloom pre-filter — the shape for
    * an eval set too large to broadcast as raw shingle strings: the
    * eval shingles compress to an `mBits`-bit Bloom filter
    * ([[Sketches.bloomBuild]], 2^20 bits = 128 KiB vs tens of MB of
    * strings), corpus documents whose every shingle misses it are
    * dropped BEFORE the join (in expectation all uncontaminated docs —
    * the corpus-side explode and shuffle then carry only candidate
    * docs), and the surviving candidates verify EXACTLY against the
    * real eval shingles. Bloom filters have no false negatives, so the
    * output is IDENTICAL to [[contaminationPairs]] — the c11 oracle is
    * c03's verbatim — while false positives cost only wasted verify
    * work, never wrong rows.
    *
    * `broadcastEval` defaults FALSE here (the opposite of
    * [[contaminationPairs]]): this operator's reason to exist is the
    * eval set too large to broadcast as raw strings, so the verify
    * join defaults to a shuffle keyed on the (pre-filtered, small)
    * candidate shingles — flip it on only when the eval side is known
    * broadcast-sized anyway.
    */
  def contaminationPairsBloom(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      evalSet: DataFrame, evalId: Column, evalText: Column,
      n: Int = 5, mBits: Int = 1 << 20, kHash: Int = 5,
      broadcastEval: Boolean = false): DataFrame = {
    val blank = array(lit(""))
    val eSets = shingleSets(evalSet, evalId, evalText, n)
      .filter(col("sh") =!= blank)
    val bloom = Sketches.bloomBuild(
      eSets.select(explode(col("sh")).as("g")), col("g"), mBits, kHash)
    val cand = shingleSets(corpus, corpusId, corpusText, n)
      .filter(col("sh") =!= blank)
      // hash once per shingle (transform binds it to an attribute),
      // then test the k probe positions on the bound hash — see
      // Sketches.bloomContainsHash
      .filter(exists(
        transform(col("sh"), g => graft.functions.Hashing.h60(g)),
        h => Sketches.bloomContainsHash(bloom, h)))
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val e0 = eSets.select(col("doc_id").as("eval_id"), explode(col("sh")).as("g"))
    val e = if (broadcastEval) broadcast(e0) else e0
    cand.join(e, "g")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** MinHash signatures as one native per-row pass
    * ([[graft.functions.expr.MinHashSig]]): md5 each shingle once and
    * fold all k permutations in registers inside whole-stage codegen —
    * no explode, no aggregate, no exchange. The signature is a pure
    * per-document fold, so it should cost exactly one narrow projection.
    */
  def minhashSignatures(df: DataFrame, id: Column, text: Column, n: Int, k: Int): DataFrame =
    minhashSignaturesFromSets(shingleSets(df, id, text, n), k)

  /** As [[minhashSignatures]] but over a pre-built (doc_id, sh) frame —
    * lets callers share one materialized shingle-set scan. Documents
    * whose shingle set has no non-null element produce no signature row
    * (parity with the historical explode → min-agg form, which emitted
    * no group for them; that form survives as the differential twin
    * [[minhashSignaturesAgg]]).
    */
  def minhashSignaturesFromSets(sets: DataFrame, k: Int): DataFrame =
    sets
      .select(col("doc_id"), Hashing.minhashSig(col("sh"), k).as("sig"))
      .filter(col("sig").isNotNull)

  /** Historical explode → hash-once → k min-aggregates form, kept ONLY
    * as the differential-test twin of the native expression (it hashes
    * each shingle once too, but pays the exploded row stream, a
    * 64-column HashAggregate and a shuffle for what is a per-row fold).
    */
  private[graft] def minhashSignaturesAgg(sets: DataFrame, k: Int): DataFrame = {
    val p = Hashing.MinHashP
    val ex = sets
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .withColumn("h", pmod(Hashing.h60(col("shingle")), lit(p)))
    val coeffs = Hashing.minhashCoeffs(k)
    val aggs = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(p))).as(s"m$i")
    }
    ex.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash + LSH near-duplicate pairs: shingle → k-perm MinHash
    * signature → banded equi-join for candidates → exact-Jaccard verify.
    *
    * Scale path for ~100 TB: signatures are a narrow projection;
    * the band join shuffles only (band-key, id) pairs; verification
    * re-joins the shingle sets for candidates only.
    */
  def minhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      n: Int = 3,
      k: Int = 64,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.4): DataFrame = {
    // Shingle sets are scanned by the signature pass AND the verify
    // pass; signatures feed two self-join branches. Cache both narrow
    // frames (k longs / one array per doc) — at any scale these are
    // small next to the corpus.
    val sets = scopedCache(shingleSets(df, id, text, n))
    val sigs = scopedCache(minhashSignaturesFromSets(sets, k))
    val bands = sigs.select(
      col("doc_id"),
      explode(Hashing.minhashBands(col("sig"), k, rowsPerBand)).as("band"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(col("sh1")) + size(col("sh2")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "inter", "uni", "jaccard")
  }

  /** SimHash signatures per document (60-bit, token-frequency weighted)
    * as one native per-row pass ([[graft.functions.expr.SimHash60]]):
    * md5 each token once and fold all 60 bit-sums in registers inside
    * whole-stage codegen — no explode, no 60-column HashAggregate, no
    * exchange (same shape cure as [[minhashSignaturesFromSets]]).
    * Tokenless docs keep simhash 0 (the expression's null contract).
    */
  def simhashes(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      Hashing.simhash(Text.tokens(Text.normalize(text))).as("simhash"))

  /** Historical explode_outer → h60 → 60 sum-aggregates form, kept ONLY
    * as the differential-test twin of the native expression.
    */
  private[graft] def simhashesAgg(df: DataFrame, id: Column, text: Column): DataFrame = {
    val ex = df
      .select(id.as("doc_id"), explode_outer(Text.tokens(Text.normalize(text))).as("tok"))
      .withColumn("h", Hashing.h60(col("tok")))
    val bitAggs = (0 until 60).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"b$j")
    }
    val code = (0 until 60)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    ex.groupBy("doc_id")
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), code.as("simhash"))
  }

  /** SimHash near-duplicate pairs within Hamming distance `maxDist`,
    * found with a bit-band equi-join. With `bands > maxDist` the
    * pigeonhole principle guarantees ZERO false negatives — the result
    * is exactly `{(a,b) : hamming ≤ maxDist}`, computed without the
    * all-pairs cross join.
    */
  def simhashPairs(df: DataFrame, id: Column, text: Column, maxDist: Int = 3): DataFrame = {
    val bands = maxDist + 1
    require(60 % bands == 0, s"bands=$bands must divide 60")
    val sh = scopedCache(simhashes(df, id, text)) // one narrow row per doc

    val banded = sh.select(
      col("doc_id"), col("simhash"),
      explode(Hashing.bitBands(col("simhash"), bands)).as("band"))
    // hamming predicate INSIDE the join: similar corpora cluster in
    // simhash space, so band buckets collide heavily — filtering to
    // true near-dups before the distinct keeps the dedup shuffle at
    // result size instead of candidate size (bit_count on two longs is
    // virtually free next to shuffling millions of candidate pairs).
    banded.as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id") &&
          Hashing.hamming(col("a.simhash"), col("b.simhash")) <= maxDist)
      .select(
        col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        Hashing.hamming(col("a.simhash"), col("b.simhash")).as("dist"))
      .distinct()
  }

  /** Edit-distance threshold self-join — all pairs of keys within
    * Levenshtein distance `maxDist` — via Pass-Join segment blocking
    * (Li, Deng & Feng, "PassJoin", PVLDB 2011), the string twin of
    * [[simhashPairs]]' pigeonhole: split each key into `maxDist+1`
    * contiguous segments; if edit(A,B) ≤ k, some segment of A survives
    * the optimal edit script untouched and appears verbatim in B,
    * shifted by at most the net indels before it (≤ k). So candidates
    * are an EQUI-join of (segment, segIdx, providerLen) against the
    * probe side's windowed substrings — zero false negatives, no
    * all-pairs cross join, and the verify step runs codegen'd
    * `levenshtein` on candidates only.
    *
    * Scale shape: both sides are narrow per-row explodes — the
    * provider emits k+1 segments, the probe O(k²) windowed substrings
    * (bounded by `(2k+1)·(k+1)` per length band) — and the only wide
    * ops are the candidate equi-join on the segment key and the
    * pair-distinct, both at candidate (not corpus²) cardinality. Keys
    * are expected SHORT (normalized title/prefix keys, ≤ ~64 chars);
    * blocking selectivity — not cost — degrades as keys shrink toward
    * k+1 chars, so callers floor the key length (the d13 query uses
    * ≥ 8). Every string takes BOTH roles and pairs canonicalize
    * (least, greatest) before the distinct, keeping the theorem
    * direction-free.
    *
    * Input rows with null id/key or key length < k+1 (segments would
    * be empty — blocking degenerates) are excluded. Output:
    * (d1, d2, dist), d1 < d2, one row per qualifying pair.
    */
  def editDistancePairs(
      df: DataFrame, id: Column, key: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1,8], got $maxDist (0 is exactGroups; " +
        "large k degrades Pass-Join blocking to quadratic)")
    val k = maxDist
    val segs = lit(k + 1)
    val keys = scopedCache(
      df.select(id.as("doc_id"), key.as("key"))
        .filter(col("doc_id").isNotNull && col("key").isNotNull)
        .withColumn("len", length(col("key")).cast("int"))
        .filter(col("len") >= k + 1))

    // Deterministic even split shared by both roles: segment i of a
    // length-L key has l_i = base+1 for i < rem else base, start
    // p_i = i·base + min(i, rem) (0-based); base = L div (k+1).
    def segLen(bigL: Column, i: Column): Column = {
      val base = (bigL / segs).cast("int")
      val rem = pmod(bigL, segs).cast("int")
      base + when(i < rem, 1).otherwise(0)
    }
    def segStart(bigL: Column, i: Column): Column = {
      val base = (bigL / segs).cast("int")
      val rem = pmod(bigL, segs).cast("int")
      i * base + least(i, rem)
    }

    val provider = keys
      .select(col("doc_id"), col("key"), col("len"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .select(
        col("doc_id").as("p_id"),
        col("i"), col("len").as("big_l"),
        col("key").substr(segStart(col("len"), col("i")) + 1,
          segLen(col("len"), col("i"))).as("seg"))

    // Probe role: for every provider length within ±k of mine, every
    // segment index, every start within the ±k indel window, emit the
    // substring of the segment's exact length. A start range that
    // falls outside my key contributes nothing (empty sequence).
    val probe = keys
      .select(col("doc_id"), col("key"), col("len"),
        explode(sequence(col("len") - k, col("len") + k)).as("big_l"))
      .filter(col("big_l") >= k + 1)
      .select(col("doc_id"), col("key"), col("len"), col("big_l"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("sl", segLen(col("big_l"), col("i")))
      .withColumn("sp", segStart(col("big_l"), col("i")))
      .withColumn("lo", greatest(col("sp") - k, lit(0)))
      .withColumn("hi", least(col("sp") + k, col("len") - col("sl")))
      .filter(col("lo") <= col("hi"))
      .select(col("doc_id"), col("key"), col("big_l"), col("i"), col("sl"),
        explode(sequence(col("lo"), col("hi"))).as("q"))
      .select(
        col("doc_id").as("q_id"),
        col("i"), col("big_l"),
        col("key").substr(col("q") + 1, col("sl")).as("seg"))

    val cand = provider
      .join(probe, Seq("seg", "i", "big_l"))
      .filter(col("p_id") =!= col("q_id"))
      .select(
        least(col("p_id"), col("q_id")).as("d1"),
        greatest(col("p_id"), col("q_id")).as("d2"))
      .distinct()

    cand
      .join(keys.select(col("doc_id").as("d1"), col("key").as("k1")), "d1")
      .join(keys.select(col("doc_id").as("d2"), col("key").as("k2")), "d2")
      .withColumn("dist", levenshtein(col("k1"), col("k2")))
      .filter(col("dist") <= k)
      .select("d1", "d2", "dist")
  }

  /** Group similarity pairs into duplicate clusters: connected
    * components by iterative min-label propagation over the pair edges.
    *
    * The reference does this greedily with an in-memory `processed` set
    * (/root/reference/src/media_fingerprinting.py:288-308) — inherently
    * sequential. Label propagation converges in O(diameter) joins
    * (near-dup clusters are shallow — a handful of rounds), each round
    * a pure equi-join + min-aggregate, so it parallelizes at any scale.
    *
    * Input: pairs (d1, d2). Output: (doc_id, group_id) where group_id is
    * the minimum doc id in the component — deterministic.
    */
  def groupPairs(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // both directions in ONE pass over the caller's pair plan: the old
    // self-unionByName REPLICATED the whole upstream edge-generation
    // subtree per branch — executed twice when this cache materializes
    // (d10's chunk-share join pipeline is the expensive part of the
    // query) and reprinted under every downstream reference. Same rows.
    val edges = scopedCache(pairs.select(
        explode(array(
          struct(col("d1"), col("d2")),
          struct(col("d2").as("d1"), col("d1").as("d2")))).as("e"))
      .select(col("e.d1").as("d1"), col("e.d2").as("d2")))
    // LINEAGE TRUNCATION (load-bearing): each round's frame must be
    // checkpointed, not merely cached. Caching materializes DATA but
    // leaves the LOGICAL PLAN intact, and the pointer-jumping
    // self-join references the round's plan twice — so the plan tree
    // doubles every round and Catalyst does O(2^rounds) driver work:
    // measured at sf0.1 this was ~40 s/round climbing to driver OOM,
    // on 610 edges. An eager localCheckpoint cuts the plan to a leaf
    // over the computed blocks, so every round re-plans a constant-size
    // tree (the same cure GraphFrames' connected components uses).
    // The extra createDataFrame hop rebuilds a CLEAN leaf over the
    // checkpointed rows: unioning the raw localCheckpoint frame trips
    // Spark's Union constraint rewrite (stale attribute ids from the
    // pre-checkpoint plan → `key not found` at analysis).
    // Executor-side the checkpoint blocks are label pairs — tiny; a
    // round's blocks are released the moment the next round stops
    // reading them, and the FINAL round's via [[scopedCleanup]].
    def truncate(df: DataFrame): (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
      val chk = df.localCheckpoint(true)
      (chk.sparkSession.createDataFrame(chk.rdd, chk.schema),
        org.apache.spark.sql.GraftColumnShim.checkpointedRdd(chk))
    }
    var (labels, labelsRdd) = truncate(edges.select(col("d1").as("doc_id"))
      .distinct()
      .withColumn("group_id", col("doc_id")))
    var converged = false
    var i = 0
    val gidType = labels.schema("group_id").dataType
    while (!converged && i < maxIters) {
      // each doc's PREVIOUS label rides the round as `old` (restored
      // by max() — exactly one non-null per doc, from its labels row),
      // so the convergence probe below is a narrow filter over the
      // just-checkpointed frame instead of the old shape's extra
      // |V|-join per round against the previous labels.
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "d2"), "d2")
        .select(col("d1").as("doc_id"), col("group_id"),
          lit(null).cast(gidType).as("old"))
      val propagated = labels
        .select(col("doc_id"), col("group_id"), col("group_id").as("old"))
        .unionByName(viaNeighbor)
        .groupBy("doc_id")
        .agg(min("group_id").as("group_id"), max("old").as("old"))
      // pointer jumping: follow each label to ITS label — combined with
      // the neighbor step this roughly halves remaining depth per round,
      // so convergence is O(log diameter), not O(diameter)
      val (next, nextRdd) = truncate(propagated.as("l")
        .join(
          propagated.select(col("doc_id").as("gid"), col("group_id").as("ggid")).as("p"),
          col("l.group_id") === col("p.gid"), "left")
        .select(
          col("l.doc_id").as("doc_id"),
          least(col("l.group_id"), coalesce(col("ggid"), col("l.group_id"))).as("group_id"),
          col("l.old").as("old")))
      // labels are monotone non-increasing, so "any row strictly below
      // its previous label" is exactly "this round changed something"
      val changed = next.filter(col("group_id") < col("old"))
        .limit(1).count() > 0
      // this round fully materialized `next` and the changed check —
      // nothing reads the previous round's blocks again (a truncated
      // localCheckpoint RDD cannot recompute, so release only here)
      labelsRdd.foreach(_.unpersist(false))
      labels = next.drop("old")
      labelsRdd = nextRdd
      converged = !changed
      i += 1
    }
    edges.unpersist()
    if (!converged)
      // never return silently-wrong components
      throw new IllegalStateException(
        s"groupPairs did not converge in $maxIters rounds (component diameter > 2^$maxIters?)")
    // the RETURNED frame's blocks outlive this call by design; an
    // enclosing Dedup.scoped releases them on exit (callers must
    // materialize results inside the scope — the standard contract)
    val finalRdd = labelsRdd
    scopedCleanup(() => finalRdd.foreach(_.unpersist(false)))
    labels
  }

  /** APPLY a [[groupPairs]] labeling to the corpus: keep every document
    * that is its component's label (the minimum doc id) plus every
    * document in no component at all — the end-to-end "deduplicated
    * corpus" materialization (one representative per duplicate
    * cluster, singletons untouched).
    *
    * One left broadcast-or-shuffle equi-join on the id: `groups` is
    * pair-derived and therefore dramatically smaller than the corpus
    * (only docs with at least one duplicate edge appear), so at scale
    * Spark broadcasts it and the corpus never moves.
    */
  def keepComponentMin(df: DataFrame, id: Column, groups: DataFrame): DataFrame = {
    val g = groups.select(col("doc_id").as("__gid"), col("group_id").as("__grp"))
    df.join(g, id === col("__gid"), "left")
      .filter(col("__grp").isNull || col("__grp") === id)
      .drop("__gid", "__grp")
  }

  /** Keep-first dedup by any key with a deterministic tiebreak — the
    * reference's INSERT OR REPLACE upsert semantics as a window
    * (SURVEY §2.5).
    */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Corpus-frequent-segment removal (CCNet/RefinedWeb-style boilerplate
    * strip): drop every segment whose normalized form occurs more than
    * `maxFreq` times across the corpus, and reassemble each document
    * from its surviving segments in original order.
    *
    * `segments` is an already-segmented `array<string>` column — real
    * corpora pass `split(text, "\n")` (line-level dedup); callers with
    * unstructured text pass any deterministic segmentation (see
    * `CurationQueries.c05`). Segments are matched on
    * `h60(normalize(segment))`, so "Subscribe  NOW" and "subscribe now"
    * are the same boilerplate.
    *
    * Two passes over the input, zero state: pass 1 aggregates segment
    * frequencies (map-side combinable — the hot boilerplate keys are
    * exactly the ones partial aggregation absorbs); pass 2 marks each
    * occurrence via a left join against the frequent-key set. Every key
    * in that set is hot by construction (> maxFreq occurrences — web
    * boilerplate reaches 10^8 copies), so a plain shuffle join would
    * send all copies of each frequent segment to one reducer; the join
    * is therefore SALTED by default ([[ScaleJoins.saltedJoin]]), which
    * replicates the frequent side `saltBuckets`×. NOTE the frequent
    * side's size bound, ≤ totalSegments/maxFreq keys, is only tight for
    * LARGE maxFreq: at maxFreq=2 it can approach half of all distinct
    * segments, and the saltBuckets× replication of that set is a real
    * shuffle cost — the deliberate price of spreading the hot keys.
    * When the frequent set is KNOWN small (a ratio threshold bounds it
    * by construction — see [[stripFrequentSegmentsByRatio]] — or a
    * profile run measured it), pass `broadcastFrequent = true`: the
    * mark join becomes a broadcast-hash join with no replication and no
    * shuffle at all.
    *
    * Docs whose every segment is boilerplate survive with n_kept = 0 and
    * clean_text "" (left join, not anti). Null segment ELEMENTS are
    * dropped before counting (a null can't join the frequency table, so
    * it would otherwise count as "kept" yet vanish from the reassembled
    * text — an inconsistent row); docs with a null/empty segment ARRAY
    * produce no output row, like null-text docs in the other operators.
    *
    * Returns one row per input doc: doc_id, n_segments, n_kept,
    * clean_text (kept segments joined with '\n').
    */
  def stripFrequentSegments(
      df: DataFrame,
      id: Column,
      segments: Column,
      maxFreq: Long,
      saltBuckets: Int = 16,
      broadcastFrequent: Boolean = false): DataFrame = {
    require(maxFreq >= 1, s"maxFreq must be >= 1, got $maxFreq")
    // cached: the frequency aggregate AND the mark join both consume
    // the exploded+normalized+hashed occurrence stream — without the
    // cache that pipeline runs twice over the corpus (scopedCache:
    // Verify/Bench clear between queries, long-lived callers wrap in
    // Dedup.scoped)
    val occ = scopedCache(segmentOccurrences(df, id, segments))
    val frequent = occ.groupBy("seg_h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxFreq)
      .select(col("seg_h"), lit(true).as("__freq"))
    reassembleUnmarked(occ, frequent, saltBuckets, broadcastFrequent)
  }

  /** [[stripFrequentSegments]] with the threshold as a DOCUMENT-
    * FREQUENCY RATIO — the CCNet-style definition: a segment is
    * boilerplate when it appears in more than `maxDocFreqRatio` of all
    * documents (distinct-doc count, so a segment repeated inside ONE
    * doc is not corpus boilerplate). An absolute count means different
    * things at sf0.01 and at 100 TB; the ratio form is scale-invariant,
    * which is why it is the primary knob and the absolute form is the
    * low-level one.
    *
    * The frequent set is bounded BY CONSTRUCTION: segments in more than
    * r·N of N docs number fewer than avgSegmentsPerDoc / r — at any
    * corpus size, a broadcastable set for real-world ratios (r ≥ 10⁻⁴
    * with ~10³ segments/doc → ≤ 10⁷ keys of 8 bytes) — so the mark join
    * BROADCASTS by default; pass `broadcastFrequent = false` to fall
    * back to the salted shuffle join for adversarially small ratios.
    */
  def stripFrequentSegmentsByRatio(
      df: DataFrame,
      id: Column,
      segments: Column,
      maxDocFreqRatio: Double,
      saltBuckets: Int = 16,
      broadcastFrequent: Boolean = true): DataFrame = {
    require(maxDocFreqRatio > 0.0 && maxDocFreqRatio < 1.0,
      s"maxDocFreqRatio must be in (0, 1), got $maxDocFreqRatio")
    // cached for the same two-consumer reason as stripFrequentSegments —
    // and the cache makes `total` below nearly free
    val occ = scopedCache(segmentOccurrences(df, id, segments))
    // total = docs with >= 1 non-null segment — EXACTLY the occ
    // universe (posexplode skips null/empty arrays; the occ filter
    // drops null elements). Derived FROM the cached occ: the previous
    // narrow no-explode pass re-evaluated the caller's `segments`
    // expression over the whole corpus, and segment expressions are
    // typically HOF pipelines (tokenize → transform/slice/array_join —
    // interpreted lambdas), so that "cheap" pass was c05b's single
    // biggest cost. A 1-row broadcast, not a collect.
    val total = occ.select(countDistinct(col("doc_id")).as("__total"))
    val frequent = occ.groupBy("seg_h").agg(countDistinct(col("doc_id")).as("__nd"))
      .crossJoin(broadcast(total))
      .filter(col("__nd") > col("__total") * maxDocFreqRatio)
      .select(col("seg_h"), lit(true).as("__freq"))
    reassembleUnmarked(occ, frequent, saltBuckets, broadcastFrequent)
  }

  /** (doc_id, pos, seg, seg_h) occurrence stream shared by the strip
    * variants — one owner for the null-element and normalization rules.
    */
  private def segmentOccurrences(df: DataFrame, id: Column, segments: Column): DataFrame =
    df.select(id.as("doc_id"), posexplode(segments).as(Seq("pos", "seg")))
      .filter(col("seg").isNotNull)
      .withColumn("seg_h", Hashing.h60(Text.normalize(col("seg"))))

  /** Mark occurrences against the frequent-key set (salted or broadcast
    * left join) and reassemble each doc from its unmarked segments in
    * original order.
    */
  private def reassembleUnmarked(
      occ: DataFrame, frequent: DataFrame,
      saltBuckets: Int, broadcastFrequent: Boolean): DataFrame = {
    val marked =
      if (broadcastFrequent) occ.join(broadcast(frequent), Seq("seg_h"), "left")
      else ScaleJoins.saltedJoin(
        occ, frequent, "seg_h", struct(col("doc_id"), col("pos")), saltBuckets, "left")
    marked
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segments"),
        count(when(col("__freq").isNull, 1)).as("n_kept"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("__freq").isNull, struct(col("pos"), col("seg"))))),
            s => s("seg"))).as("clean_text"))
  }
}
