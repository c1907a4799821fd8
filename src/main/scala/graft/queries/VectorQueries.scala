package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors
import graft.operators.Ann

/** Embedding similarity-search coverage over `embeddings`
  * (array<float>, dim 64). Doubles are produced by strict left-to-right
  * folds in both engines, so cosine values compare bit-exactly; grouped
  * sums go through integer micro-units to stay order-independent.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String) = Tables.t(s, dir, "embeddings")

  // strict-fold SQL twins — single owner [[DuckOracle]] (shared with
  // the hybrid retrieval oracle in SearchQueries)
  private def duckFold(arr: String, body: String): String = DuckOracle.duckFold(arr, body)
  private def duckDot(a: String, b: String): String = DuckOracle.duckDot(a, b)
  private def duckNorm(a: String): String = DuckOracle.duckNorm(a)

  /** Brute-force exact top-5 cosine neighbors for the first 10 vectors. */
  def v01KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Ann.knnBruteForce(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5)
      .orderBy("q_id", "rank")
  }

  val v01Oracle: String = {
    val sim = s"${duckDot("q_emb", "b_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |b AS (SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings WHERE vec_id >= 10),
       |scored AS (SELECT q_id, b_id, $sim AS sim FROM b, q)
       |SELECT q_id, b_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) AS INT) AS rank, sim
       |FROM scored
       |WHERE NOT isnan(sim)
       |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) <= 5
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Per-label stats with order-independent exact integer sums. */
  def v02LabelStats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(
        col("label"),
        round(element_at(col("embedding"), 1).cast("double") * 1000000).cast("long").as("c0"),
        round(Vectors.norm2(col("embedding")) * 1000000).cast("long").as("nrm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        sum(col("c0")).as("sum_comp0_micro"),
        sum(col("nrm")).as("sum_norm_micro"))
      .orderBy("label")

  val v02Oracle: String =
    s"""SELECT label, COUNT(*) AS n,
       |  CAST(SUM(CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_comp0_micro,
       |  CAST(SUM(CAST(ROUND(${duckNorm("embedding")} * 1000000) AS BIGINT)) AS BIGINT) AS sum_norm_micro
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  /** Sign-LSH approximate KNN, six hash tables with Hamming-2
    * multiprobe (recall@5 1.00 vs 0.92 for the round-8 radius-1
    * config — see RecallSweep; the probe ladder expands only the tiny
    * broadcast query side, so the base index footprint rides `tables`
    * alone). The bucketing is pure integer/double arithmetic
    * (sign_lsh — deterministic hyperplanes from an (i, j) bit mix)
    * and scoring is the strict-fold cosine, so the DuckDB oracle
    * replays the whole pipeline bit-for-bit, probe expansion
    * included; recall dominance vs brute force is additionally
    * measured in ScalaTest.
    */
  def v03KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Ann.knnLsh(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, bits = 4, tables = 6, multiprobe = true, probeRadius = 2)
      .orderBy("q_id", "rank")
  }

  /** DuckDB replay of one sign-LSH plane projection: for plane j0 of
    * hash table `t` (j = j0 + t*7919), dim i (1-based in DuckDB lists)
    * contributes ±x by bit 13 of `((i-1)*2654435761 + j*40503) mod
    * 2^31` — the exact arithmetic of functions.expr.SignLsh.
    */
  private def duckLshProj(arr: String, t: Int, j0: Int): String = {
    val off = (j0 + t * 7919).toLong * 40503L
    val sign = s"((((CAST(i-1 AS BIGINT) * 2654435761 + $off) % 2147483648) >> 13) & 1) = 1"
    duckFold(arr, s"CASE WHEN $sign THEN CAST($arr[i] AS DOUBLE) ELSE -CAST($arr[i] AS DOUBLE) END")
  }

  /** Bucket id for table `t`: Σ over planes of (proj > 0 ? 1<<j0 : 0). */
  private def duckLshBucket(arr: String, t: Int, bits: Int): String =
    (0 until bits).map { j0 =>
      s"(CASE WHEN ${duckLshProj(arr, t, j0)} > 0 THEN CAST(${1L << j0} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  /** The shared CTE chain of the v03 replay: `b`/`q` (valid-norm base
    * and query sides), LSH buckets with Hamming-2 multiprobe, and
    * `scored` (strict-fold cosine per candidate). Single owner — v24's
    * NDCG oracle replays the SAME ranking before judging it.
    */
  private def lshScoredCtes(bits: Int, tables: Int): String = {
    def bucketed(arr: String) = (0 until tables).map(t =>
      s"STRUCT_PACK(t := $t, bucket := ${duckLshBucket(arr, t, bits)})").mkString(", ")
    // Hamming-2 multiprobe replay: each query bucket expands to itself
    // plus every 1-bit and 2-bit flip — exactly Ann.knnLsh's
    // query-side probe list at probeRadius = 2
    val probeMasks = (0L +:
      ((0 until bits).map(j => 1L << j) ++
        (for { i <- 0 until bits; j <- (i + 1) until bits }
          yield (1L << i) | (1L << j)))).mkString(", ")
    val sim = s"${duckDot("b_emb", "q_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    s"""b AS (
       |  SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings
       |  WHERE vec_id >= 10 AND ${duckNorm("embedding")} > 0
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < 10 AND ${duckNorm("embedding")} > 0
       |), bb AS (
       |  SELECT b_id, unnest([${bucketed("b_emb")}]) AS tb FROM b
       |), qb0 AS (
       |  SELECT q_id, unnest([${bucketed("q_emb")}]) AS tb FROM q
       |), qb AS (
       |  SELECT q_id, STRUCT_PACK(t := tb.t, bucket := xor(tb.bucket, CAST(pm.m AS BIGINT))) AS tb
       |  FROM qb0, UNNEST([$probeMasks]) AS pm(m)
       |), cand AS (
       |  SELECT DISTINCT q_id, b_id
       |  FROM bb JOIN qb ON bb.tb.t = qb.tb.t AND bb.tb.bucket = qb.tb.bucket
       |), scored AS (
       |  SELECT c.q_id, c.b_id, $sim AS sim
       |  FROM cand c
       |  JOIN b ON b.b_id = c.b_id
       |  JOIN q ON q.q_id = c.q_id
       |)""".stripMargin
  }

  val v03Oracle: String = {
    val k = 5
    s"""WITH ${lshScoredCtes(bits = 4, tables = 6)}
       |SELECT q_id, b_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) AS INT) AS rank, sim
       |FROM scored
       |WHERE NOT isnan(sim)
       |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** Embedding-cosine near-duplicate pairs within label blocks — the
    * embedding leg of the dedup family. Label blocking bounds the pair
    * space exactly like the (lang, source) blocks in text dedup; the
    * oracle replays the identical fold arithmetic all-pairs.
    */
  def v04EmbeddingNeardup(s: SparkSession, dir: String): DataFrame = {
    // hoist norms to one per row (not one per pair); the division below
    // keeps the exact op sequence of cosine() so the oracle still
    // matches bit-for-bit
    val e = emb(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", Vectors.norm2(col("embedding")))
    // join first, score after an explicit repartition: the pair stream
    // is tiny in bytes but heavy in per-row work (a 64-dim fold each),
    // and AQE would otherwise coalesce it onto one core. Partition count
    // follows the session's shuffle parallelism — NOT a constant — so a
    // 1000-core cluster spreads the scoring stage over its own width.
    val scoreParallelism = s.conf.get("spark.sql.shuffle.partitions").toInt
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("d1"), col("b.vec_id").as("d2"), col("a.label").as("label"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .repartition(scoreParallelism, col("d1"))
      .select(
        col("d1"), col("d2"), col("label"),
        (Vectors.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= 0.3)
      .orderBy("d1", "d2")
  }

  val v04Oracle: String = {
    val sim = s"${duckDot("a_emb", "b_emb")} / (${duckNorm("a_emb")} * ${duckNorm("b_emb")})"
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
       |SELECT a.vec_id AS d1, b.vec_id AS d2, a.label AS label, $sim AS sim
       |FROM (SELECT vec_id, label, embedding AS a_emb FROM e) a
       |JOIN (SELECT vec_id, label, embedding AS b_emb FROM e) b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE $sim >= 0.3
       |ORDER BY d1, d2""".stripMargin
  }

  /** Embedding near-dup, SCALE PATH: candidates from a multi-table
    * sign-LSH bucket equi-join (no label blocking, no all-pairs), exact
    * strict-fold cosine verify — [[v04EmbeddingNeardup]] retained as
    * the all-pairs test-scale baseline this path's recall is measured
    * against in ScalaTest. Every stage is deterministic integer/double
    * arithmetic, so the oracle replays the whole pipeline (buckets →
    * candidate join → cosine) bit-for-bit, exactly like d03.
    */
  def v06NeardupLsh(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ann.cosineNeardupLsh(
      emb(s, dir), col("vec_id"), col("embedding"),
      minSim = 0.3, bits = 4, tables = 2)
      .orderBy("d1", "d2")

  val v06Oracle: String = {
    val bits = 4
    val tables = 2
    def bucketed(arr: String) = (0 until tables).map(t =>
      s"STRUCT_PACK(t := $t, bucket := ${duckLshBucket(arr, t, bits)})").mkString(", ")
    val sim = s"${duckDot("a_emb", "b_emb")} / (${duckNorm("a_emb")} * ${duckNorm("b_emb")})"
    s"""WITH e AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE ${duckNorm("embedding")} > 0
       |), bk AS (
       |  SELECT vec_id, unnest([${bucketed("embedding")}]) AS tb FROM e
       |), cand AS (
       |  SELECT DISTINCT x.vec_id AS d1, y.vec_id AS d2
       |  FROM bk x JOIN bk y ON x.tb.t = y.tb.t AND x.tb.bucket = y.tb.bucket AND x.vec_id < y.vec_id
       |), scored AS (
       |  SELECT c.d1, c.d2, $sim AS sim
       |  FROM cand c
       |  JOIN (SELECT vec_id, embedding AS a_emb FROM e) a ON a.vec_id = c.d1
       |  JOIN (SELECT vec_id, embedding AS b_emb FROM e) b ON b.vec_id = c.d2
       |)
       |SELECT d1, d2, sim FROM scored WHERE sim >= 0.3 ORDER BY d1, d2""".stripMargin
  }

  /** IVF approximate KNN. Candidate SELECTION is engine-specific
    * (KMeans cells), but the output CONTRACT is still oracle-gated —
    * see [[v05Oracle]]: every reported number is proven, only which
    * neighbors were considered stays engine-side (recall vs brute force
    * is measured in ScalaTest).
    */
  def v05KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Ann.knnIvf(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 7)
      .orderBy("q_id", "rank")
  }

  /** Partial-contract oracle for v05 (the verify-the-scores pattern of
    * reference src/media_fingerprinting.py:250-276): reads the engine's
    * OWN dumped result back (`__GRAFT_OUT__` is substituted with the
    * verify out-dir by [[graft.Verify]]), and keeps each row only if
    * (a) its `sim` equals the DuckDB strict-fold cosine of that exact
    * (q_id, b_id) pair bit-for-bit, and (b) its rank is the
    * descending-sim row number within its query with ranks 1..k.
    * A row with a fabricated score, wrong pair, or inconsistent rank is
    * filtered → row-count mismatch → the gate fails; a query id ABSENT
    * from the dump (engine silently dropping output) yields a sentinel
    * row on the oracle side → same failure, so an empty dump cannot
    * pass vacuously. Candidate selection (which cells were probed)
    * remains engine-specific and is deliberately NOT constrained.
    */
  val v05Oracle: String = selfVerifyingKnnOracle("v05_knn_ivf", k = 5)

  /** The verify-the-scores oracle, shared by every engine-selected knn
    * dump (v05 on-the-fly IVF, v07 persisted-index IVF) — same contract,
    * parameterized only by the dump directory and k. `ghostBWhere`
    * (v13): a predicate over `b_id` naming ids RETENTION-DELETED from
    * the index — a dump row serving such a ghost id is filtered from
    * `ok`, forcing a row-count mismatch (its sim would still verify as
    * a true cosine, so the base contract alone cannot catch it).
    * `eligibleBWhere` (v14, filtered search): a predicate over
    * b_label/b_id that every served row must SATISFY — the dual of the
    * ghost clause (an ineligible neighbor served back carries a valid
    * cosine, so only this clause can catch a filter the engine dropped);
    * `eligibleExistsWhere` narrows the coverage sentinel's base-side
    * EXISTS to the same eligible universe (predicate over alias `b`).
    */
  private def selfVerifyingKnnOracle(
      dump: String, k: Int, ghostBWhere: Option[String] = None,
      eligibleBWhere: Option[String] = None,
      eligibleExistsWhere: Option[String] = None): String = {
    // Spark scores as dot(b_emb, q_emb) / (b_nrm * q_nrm) — replay the
    // same operand order (dot and * are bitwise commutative in IEEE754,
    // but keep the fold direction identical anyway)
    val want = s"${duckDot("b_emb", "q_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    val ghost = ghostBWhere.map(w => s" AND NOT ($w)").getOrElse("")
    val elig = eligibleBWhere.map(w => s" AND ($w)").getOrElse("")
    val eligExists = eligibleExistsWhere.map(w => s" AND ($w)").getOrElse("")
    s"""WITH o AS (
       |  SELECT q_id, b_id, "rank", sim
       |  FROM read_parquet('__GRAFT_OUT__/$dump/*.parquet')
       |), chk AS (
       |  SELECT o.q_id, o.b_id, o."rank", o.sim, b.b_label, $want AS want
       |  FROM o
       |  JOIN (SELECT vec_id, embedding AS q_emb FROM embeddings) q ON q.vec_id = o.q_id
       |  JOIN (SELECT vec_id, embedding AS b_emb, label AS b_label FROM embeddings) b ON b.vec_id = o.b_id
       |), ok AS (
       |  SELECT q_id, b_id, "rank", sim FROM chk
       |  WHERE sim = want AND "rank" BETWEEN 1 AND $k$ghost$elig
       |  QUALIFY "rank" = row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, "rank")
       |), missing AS (
       |  -- minimum-coverage clause: a self-verifying oracle would pass
       |  -- vacuously if the engine silently dropped whole queries (or
       |  -- emitted nothing at all); every valid query id must appear in
       |  -- the dump, else this sentinel row forces a count mismatch.
       |  -- knnIvf GUARANTEES this (live-cell L2 probing: every valid
       |  -- query probes ≥ 1 cell with a scoreable member) whenever the
       |  -- base holds ≥ 1 scoreable vector — the EXISTS mirrors that
       |  -- precondition so a degenerate all-zero-norm base cannot fail
       |  -- a correct empty result
       |  SELECT e.vec_id AS q_id, CAST(NULL AS BIGINT) AS b_id,
       |         CAST(-1 AS INT) AS "rank", CAST(NULL AS DOUBLE) AS sim
       |  FROM embeddings e
       |  WHERE e.vec_id < 10 AND ${duckNorm("e.embedding")} > 0
       |    AND e.vec_id NOT IN (SELECT q_id FROM o)
       |    AND EXISTS (SELECT 1 FROM embeddings b
       |                WHERE b.vec_id >= 10 AND ${duckNorm("b.embedding")} > 0$eligExists)
       |)
       |SELECT * FROM ok UNION ALL SELECT * FROM missing
       |ORDER BY q_id, "rank"""".stripMargin
  }

  /** Persisted-IVF-index round trip ([[Ann.buildIvfIndex]] →
    * [[Ann.queryIvfIndex]]): the index-build deployment of v05. The
    * base lands as parquet partitioned by cell with occupancy stats in
    * a codebook sidecar, and the query pass reads ONLY the probed cell
    * directories (partition pruning — the property that makes a
    * 100 TB index queryable without scanning it). Same oracle contract
    * as v05: every reported score proven, rank-consistency per query,
    * coverage sentinel.
    */
  def v07IvfIndex(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivf_index", dir) // see [[Scratch]]
    Ann.buildIvfIndex(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"), path, nlist = 8)
    Ann.queryIvfIndex(
      s, path, e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 3)
      .orderBy("q_id", "rank")
  }

  val v07Oracle: String = selfVerifyingKnnOracle("v07_ivf_index", k = 5)

  /** Incremental-maintenance round trip ([[Ann.buildIvfIndex]] →
    * [[Ann.addToIvfIndex]] → [[Ann.queryIvfIndex]]): the index is built
    * from the even-id half of the base, the odd-id half is APPENDED
    * with the persisted codebook (no re-fit), and the query runs
    * against the extended index — the grows-1%-a-day deployment of
    * v07. Same oracle contract: every reported score proven bit-exact,
    * rank consistency per query, coverage sentinel over ALL of
    * vec_id < 10 (so a query that can only be answered by appended
    * rows still must appear).
    */
  def v08IvfAppend(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivf_append", dir)
    Ann.buildIvfIndex(
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), path, nlist = 8)
    Ann.addToIvfIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    Ann.queryIvfIndex(
      s, path, e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 3)
      .orderBy("q_id", "rank")
  }

  val v08Oracle: String = selfVerifyingKnnOracle("v08_ivf_append", k = 5)

  /** Product-quantization knn ([[graft.operators.Pq.knnPq]]): the
    * compressed-domain ANN path — 8 subspace codes per vector rank a
    * shortlist, the shortlist re-scores EXACTLY on the originals, so
    * every reported sim is a true cosine and the same self-verifying
    * oracle contract applies (candidate selection stays engine-side,
    * like v05's cells; recall vs brute force is ScalaTest-measured).
    * kSub=32 / shortlist=150 (with a 20k fit-sample cap): the sweep's
    * knee — recall@5 0.98 at sf0.01, and CHEAPER than the kSub=24/
    * shortlist=100 round-8 config (shortlist is the free recall knob:
    * the rerank is exact, more candidates only widen a bounded
    * k-buffer). The 100 TB setting is kSub=256 on the PERSISTED
    * index, which pays encode once at build (one byte per code).
    */
  def v09KnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Pq.knnPq(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, m = 8, kSub = 32, shortlist = 150, maxFit = 20000L)
      .orderBy("q_id", "rank")
  }

  val v09Oracle: String = selfVerifyingKnnOracle("v09_knn_pq", k = 5)

  /** IVF+PQ composition ([[graft.operators.Pq.knnIvfPq]], FAISS
    * IVFADC): cells prune WHICH rows are scanned, codes compress WHAT
    * the scan reads — with the same exact-rerank tail, so the oracle
    * contract is again unchanged.
    */
  def v10KnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Pq.knnIvfPq(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 7, m = 8, kSub = 32, shortlist = 150, maxFit = 20000L)
      .orderBy("q_id", "rank")
  }

  val v10Oracle: String = selfVerifyingKnnOracle("v10_knn_ivfpq", k = 5)

  /** Persisted IVF-PQ index round trip
    * ([[graft.operators.Pq.buildIvfPqIndex]] →
    * [[graft.operators.Pq.queryIvfPqIndex]]): the compressed
    * build-once/query-many serving shape — the index stores only
    * (id, codes, d_nrm) partitioned by cell, the probed-cell scan
    * reads m bytes per candidate, and the exact rerank joins the
    * ORIGINAL vectors back from the source table for shortlist pairs
    * only. Same oracle contract as the rest of the knn family.
    */
  def v11IvfPqIndex(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivfpq_index", dir)
    graft.operators.Pq.buildIvfPqIndex(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"), path,
      nlist = 8, m = 8, kSub = 16)
    graft.operators.Pq.queryIvfPqIndex(
      s, path,
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 3, shortlist = 20)
      .orderBy("q_id", "rank")
  }

  val v11Oracle: String = selfVerifyingKnnOracle("v11_ivfpq_index", k = 5)

  /** Incremental maintenance of the persisted IVF-PQ index
    * ([[graft.operators.Pq.addToIvfPqIndex]]): built from the even-id
    * half, the odd-id half appended with the PERSISTED coarse + PQ
    * codebooks (no re-fit of either quantizer), queried through the
    * same oracle contract — v08's growth story on the compressed
    * index.
    */
  def v12IvfPqAppend(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivfpq_append", dir)
    graft.operators.Pq.buildIvfPqIndex(
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), path, nlist = 8, m = 8, kSub = 16)
    graft.operators.Pq.addToIvfPqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    graft.operators.Pq.queryIvfPqIndex(
      s, path,
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 3, shortlist = 20)
      .orderBy("q_id", "rank")
  }

  val v12Oracle: String = selfVerifyingKnnOracle("v12_ivfpq_append", k = 5)

  /** Retention round trip on the persisted IVF-PQ index
    * ([[graft.operators.Pq.removeFromIvfPqIndex]]): build from the even
    * ids, append the odd ids, then retention-delete every third id from
    * BOTH the source view and the index — the full lifecycle
    * (build → add → remove → query). Before the remove verb existed,
    * this exact state hard-failed every query at the drift guard until
    * a full rebuild. Oracle: the shared self-verifying contract PLUS a
    * ghost-id exclusion — a removed id served back would carry a
    * perfectly valid cosine, so the contract is extended to fail any
    * dump row whose b_id is in the deleted set.
    */
  def v13IvfPqRemove(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivfpq_remove", dir)
    graft.operators.Pq.buildIvfPqIndex(
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), path, nlist = 8, m = 8, kSub = 16)
    graft.operators.Pq.addToIvfPqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    graft.operators.Pq.removeFromIvfPqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0), col("vec_id"))
    graft.operators.Pq.queryIvfPqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 3 =!= 0),
      col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 3, shortlist = 20)
      .orderBy("q_id", "rank")
  }

  val v13Oracle: String = selfVerifyingKnnOracle(
    "v13_ivfpq_remove", k = 5,
    ghostBWhere = Some("b_id >= 10 AND b_id % 3 = 0"))

  /** FILTERED search through the persisted IVF index
    * ([[Ann.queryIvfIndex]]'s `eligible` parameter): top-k over only
    * the base ids passing a metadata predicate (here `label % 2 = 0`),
    * with the predicate semi-joined into the probed-cell scan BEFORE
    * scoring — pre-filtering, so eligible neighbors ranked below k in
    * the unfiltered order are still found (a post-filter would lose
    * them). Oracle: the shared self-verifying contract PLUS the
    * eligibility clause — a served ineligible id carries a perfectly
    * valid cosine, so the contract is extended to fail any dump row
    * whose label violates the predicate; the coverage sentinel's
    * EXISTS narrows to the eligible universe for the same reason.
    */
  def v14IvfFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivf_filtered", dir)
    Ann.buildIvfIndex(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"), path, nlist = 8)
    Ann.queryIvfIndex(
      s, path, e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 3,
      eligible = Some((e.filter(col("label") % 2 === 0), col("vec_id"))))
      .orderBy("q_id", "rank")
  }

  /** Residual sentinel assumption (documented deliberately): the
    * engine's filtered-search contract is "no rows when the probed
    * cells hold no eligible candidate", but the coverage sentinel can
    * only see the eligible UNIVERSE, not which cells were probed — so
    * v14 relies on the filter being dense (label parity ≈ 50% of every
    * cell; 490 base vectors over 8 cells ⇒ ~30 eligible per cell) to
    * keep "every query finds eligible candidates in its 3 probed
    * cells" true on the fixed testdata. A future sparse-filter query
    * must either guarantee per-cell eligibility or drop the sentinel.
    */
  val v14Oracle: String = selfVerifyingKnnOracle(
    "v14_ivf_filtered", k = 5,
    eligibleBWhere = Some("b_label % 2 = 0"),
    eligibleExistsWhere = Some("b.label % 2 = 0"))

  /** SQ8 scalar-quantized knn ([[graft.operators.Sq.knnSq8]]): the
    * closed-form compression tier. Because the quantizer is pure
    * arithmetic (per-dim min/max + linear byte rescale — no k-means),
    * the oracle replays the ENTIRE pipeline bit-for-bit: stats fit,
    * encode, reconstruction, ADC scoring, shortlist membership, exact
    * rerank — a strictly stronger gate than the self-verifying
    * contract the PQ/IVF paths get (their candidate sets are
    * engine-side). Recall floor vs brute force is additionally
    * spec-pinned in SearchSpec.
    */
  def v15KnnSq8(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Sq.knnSq8(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, shortlist = 20)
      .orderBy("q_id", "rank")
  }

  val v15Oracle: String = {
    val dim = 64
    val k = 5
    val sl = 20
    // token-for-token replay of Sq.encodeExpr∘decodeExpr: clamped
    // half-away round to a byte, linear rescale back — all double
    val recon = s"""list_transform(generate_series(1, $dim), i ->
       |      CASE WHEN mxs[i] = mns[i] THEN mns[i]
       |           ELSE mns[i] + ((LEAST(GREATEST(ROUND(((CAST(b_emb[i] AS DOUBLE) - mns[i]) / (mxs[i] - mns[i])) * 255), 0), 255) / 255) * (mxs[i] - mns[i])) END)""".stripMargin
    val adcSim = s"${duckDot("recon", "q_emb")} / (r_nrm * ${duckNorm("q_emb")})"
    val sim = s"${duckDot("b_emb", "q_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    s"""WITH b AS (
       |  -- the engine gates non-FINITE (NaN/±Inf) and null ELEMENTS
       |  -- out before the stats fit (one NaN poisons a dimension's
       |  -- min/max; one Inf makes its fitted max infinite and every
       |  -- reconstruction NaN); the clause is a no-op on this data
       |  -- but mirrors the filter order
       |  SELECT vec_id AS b_id, embedding AS b_emb FROM embeddings
       |  WHERE vec_id >= 10
       |    AND len(list_filter(embedding, x -> x IS NULL
       |          OR isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) = 0
       |    AND ${duckNorm("embedding")} > 0 AND len(embedding) = $dim
       |), q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < 10 AND ${duckNorm("embedding")} > 0 AND len(embedding) = $dim
       |), st AS (
       |  SELECT i, MIN(CAST(b_emb[i] AS DOUBLE)) AS mn, MAX(CAST(b_emb[i] AS DOUBLE)) AS mx
       |  FROM b, (SELECT unnest(generate_series(1, $dim)) AS i) dims
       |  GROUP BY i
       |), stats AS (
       |  SELECT LIST(mn ORDER BY i) AS mns, LIST(mx ORDER BY i) AS mxs FROM st
       |), rec AS (
       |  SELECT b_id, $recon AS recon FROM b, stats
       |), recn AS (
       |  SELECT b_id, recon, ${duckNorm("recon")} AS r_nrm FROM rec
       |), adc AS (
       |  SELECT q_id, b_id, $adcSim AS adc
       |  FROM recn, q
       |  WHERE r_nrm > 0
       |), short AS (
       |  SELECT q_id, b_id FROM adc
       |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, b_id) <= $sl
       |), scored AS (
       |  SELECT s.q_id, s.b_id, $sim AS sim
       |  FROM short s
       |  JOIN b ON b.b_id = s.b_id
       |  JOIN q ON q.q_id = s.q_id
       |)
       |SELECT q_id, b_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) AS INT) AS rank, sim
       |FROM scored
       |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) <= $k
       |ORDER BY q_id, rank""".stripMargin
  }

  /** IVF × SQ8 composition ([[graft.operators.Sq.knnIvfSq8]]): the
    * middle quantizer tier — cells prune the scan, byte codes compress
    * it, exact rerank on the shortlist. Candidate selection is
    * engine-side (k-means cells), so the contract gate is the shared
    * self-verifying oracle, like v05/v10; recall rides the scoreboard
    * with its own spec floor.
    */
  def v16KnnIvfSq8(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Sq.knnIvfSq8(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 7, shortlist = 50)
      .orderBy("q_id", "rank")
  }

  val v16Oracle: String = selfVerifyingKnnOracle("v16_knn_ivfsq8", k = 5)

  /** FULL lifecycle of the persisted IVF-SQ8 index
    * ([[graft.operators.Sq.buildIvfSq8Index]] → add → remove → query):
    * the byte-code serving tier that completes the quantizer ladder's
    * persisted forms (IVF v07/v08/v13, IVF-PQ v11-v13, now IVF-SQ8).
    * Build from the even ids, append the odd ids with the PERSISTED
    * stats+codebook (no re-fit), retention-delete every third id from
    * both views, query through the codes-only probed-cell scan with
    * exact rerank against the source. Oracle: the shared
    * self-verifying contract plus the v13 ghost-id exclusion.
    */
  def v17IvfSq8Lifecycle(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "ivfsq8_index", dir)
    graft.operators.Sq.buildIvfSq8Index(
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), path, nlist = 8)
    graft.operators.Sq.addToIvfSq8Index(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    graft.operators.Sq.removeFromIvfSq8Index(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0), col("vec_id"))
    graft.operators.Sq.queryIvfSq8Index(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 3 =!= 0),
      col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, nprobe = 7, shortlist = 50)
      .orderBy("q_id", "rank")
  }

  val v17Oracle: String = selfVerifyingKnnOracle(
    "v17_ivfsq8_index", k = 5,
    ghostBWhere = Some("b_id >= 10 AND b_id % 3 = 0"))

  /** SemDeDup candidate pairs ([[graft.operators.Ann.semDedupPairs]]):
    * embedding-cluster the corpus (k-means cells), τ-near pairs found
    * WITHIN clusters only — the Abbas et al. 2023 recipe that keeps
    * semantic dedup near-linear at web scale. Cluster assignment is
    * engine-side (like v05's cells), so the oracle is the
    * verify-the-scores pattern: every reported pair's sim must equal
    * the DuckDB strict-fold cosine bit-for-bit and clear τ, pairs must
    * be ordered/distinct, and a NON-VACUOUS floor fails an empty dump
    * whenever the corpus holds ANY global τ-pair (clusters splitting
    * every single one of ~10³ co-directional pairs is not a plausible
    * correct outcome; per-pair coverage stays deliberately
    * unconstrained, measured in ScalaTest instead).
    */
  def d06SemdedupPairs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Ann.semDedupPairs(
      emb(s, dir), col("vec_id"), col("embedding"), tau = 0.3, nlist = 8)
      .orderBy("d1", "d2")

  val d06Oracle: String = {
    val want = s"${duckDot("a_emb", "b_emb")} / (${duckNorm("a_emb")} * ${duckNorm("b_emb")})"
    s"""WITH o AS (
       |  SELECT d1, d2, sim FROM read_parquet('__GRAFT_OUT__/d06_semdedup_pairs/*.parquet')
       |), chk AS (
       |  SELECT o.d1, o.d2, o.sim, $want AS want
       |  FROM o
       |  JOIN (SELECT vec_id, embedding AS a_emb FROM embeddings) a ON a.vec_id = o.d1
       |  JOIN (SELECT vec_id, embedding AS b_emb FROM embeddings) b ON b.vec_id = o.d2
       |), ok AS (
       |  SELECT DISTINCT d1, d2, sim FROM chk
       |  WHERE sim = want AND sim >= 0.3 AND d1 < d2
       |), globalpairs AS (
       |  SELECT count(*) AS n FROM (
       |    SELECT 1
       |    FROM (SELECT vec_id, embedding AS a_emb FROM embeddings) a
       |    JOIN (SELECT vec_id, embedding AS b_emb FROM embeddings) b
       |      ON a.vec_id < b.vec_id
       |    WHERE $want >= 0.3)
       |), missing AS (
       |  -- non-vacuous floor: an EMPTY dump while τ-pairs exist
       |  -- corpus-wide forces a count mismatch
       |  SELECT CAST(NULL AS BIGINT) AS d1, CAST(NULL AS BIGINT) AS d2,
       |         CAST(NULL AS DOUBLE) AS sim
       |  FROM globalpairs
       |  WHERE n > 0 AND NOT EXISTS (SELECT 1 FROM o)
       |)
       |SELECT d1, d2, sim FROM ok
       |UNION ALL SELECT d1, d2, sim FROM missing
       |ORDER BY d1, d2""".stripMargin
  }

  /** PCA dimensionality reduction ([[graft.operators.Pca]]): fit 16
    * components on the deterministic bounded sample, persist the model,
    * serve projections for the first 50 vectors THROUGH the persisted
    * model (the fit/transform lifecycle every quantizer here has). The
    * dump carries the components themselves, so the oracle proves —
    * from the raw embeddings table plus the dump alone — that (a) every
    * projected coordinate is EXACTLY `strict-fold dot(x, pc_j) −
    * offset_j`, (b) every offset is exactly `dot(mean, pc_j)`, (c) the
    * basis is orthonormal to 1e-9, (d) explained variances are
    * non-increasing, and (e) all 50 queries are served at 16
    * coordinates. Which basis the fit chose is engine-specific (like
    * v05's cell selection) and deliberately unconstrained; a failed
    * gate or an empty dump yields a sentinel row → hash mismatch.
    */
  def v18PcaProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val fitted = graft.operators.Pca.fit(
      e, col("vec_id"), col("embedding"), dims = 16)
    val path = Scratch.wiped(s, "pca_model", dir)
    graft.operators.Pca.saveModel(s, fitted, path)
    val model = graft.operators.Pca.loadModel(s, path)
    // vectors ride the dump as comma-joined strings (the hash gate
    // compares scalar columns; Java shortest-double text round-trips
    // bit-exactly through DuckDB's correctly-rounded CAST)
    val pcRows = (
      ("mean", -1, -1L, model.mean.mkString(","), Option.empty[Double], Option(model.trace)) +:
        model.components.indices.map(j =>
          ("pc", j, -1L, model.components(j).mkString(","),
            Option(model.offsets(j)), Option(model.eigvals(j)))))
      .toDF("kind", "idx", "vec_id", "vec", "offset", "eigval")
    val projRows = graft.operators.Pca.project(
      e.filter(col("vec_id") < 50), col("embedding"), model)
      .select(
        lit("proj").as("kind"), lit(-1).as("idx"), col("vec_id"),
        concat_ws(",", transform(col("proj"), x => x.cast("string"))).as("vec"),
        lit(null).cast("double").as("offset"),
        lit(null).cast("double").as("eigval"))
    pcRows.unionByName(projRows).orderBy("kind", "idx", "vec_id")
  }

  val v18Oracle: String = {
    val parse = "list_transform(string_split(vec, ','), x -> CAST(x AS DOUBLE))"
    val projDot = duckDot("e.embedding", "c.cvec")
    val orthDot = duckDot("a.cvec", "b.cvec")
    val offDot = duckDot("m.mvec", "c.cvec")
    s"""WITH d AS (
       |  SELECT kind, idx, vec_id, vec, "offset", eigval
       |  FROM read_parquet('__GRAFT_OUT__/v18_pca_project/*.parquet')
       |), pc AS (SELECT idx, $parse AS cvec, "offset", eigval FROM d WHERE kind = 'pc'),
       |pr AS (SELECT vec_id, $parse AS pvec FROM d WHERE kind = 'proj'),
       |mn AS (SELECT $parse AS mvec FROM d WHERE kind = 'mean'),
       |badproj AS (
       |  SELECT COUNT(*) AS n FROM pr p
       |  JOIN embeddings e ON e.vec_id = p.vec_id
       |  CROSS JOIN pc c
       |  WHERE p.pvec[c.idx + 1] IS DISTINCT FROM ($projDot) - c."offset"
       |), badorth AS (
       |  SELECT COUNT(*) AS n FROM pc a JOIN pc b ON a.idx <= b.idx
       |  WHERE abs(($orthDot) - (CASE WHEN a.idx = b.idx THEN 1.0 ELSE 0.0 END)) > 1e-9
       |), badoff AS (
       |  SELECT COUNT(*) AS n FROM pc c CROSS JOIN mn m
       |  WHERE c."offset" IS DISTINCT FROM ($offDot)
       |), badeig AS (
       |  SELECT (SELECT COUNT(*) FROM pc a JOIN pc b ON b.idx = a.idx + 1
       |          WHERE b.eigval > a.eigval) +
       |         (SELECT COUNT(*) FROM pc WHERE eigval < 0) AS n
       |), gate AS (
       |  SELECT (SELECT n FROM badproj) = 0
       |     AND (SELECT n FROM badorth) = 0
       |     AND (SELECT n FROM badoff) = 0
       |     AND (SELECT n FROM badeig) = 0
       |     AND (SELECT COUNT(*) FROM pc) = 16
       |     AND (SELECT COUNT(*) FROM mn) = 1
       |     AND (SELECT COUNT(DISTINCT vec_id) FROM pr) = 50
       |     AND (SELECT COUNT(*) FROM pr) = 50
       |     AND (SELECT MIN(len(pvec)) FROM pr) = 16
       |     AND (SELECT MAX(len(pvec)) FROM pr) = 16 AS ok
       |)
       |SELECT kind, idx, vec_id, vec, "offset", eigval FROM d
       |WHERE (SELECT ok FROM gate)
       |UNION ALL
       |SELECT '__gate_failed', -1, -1, CAST(NULL AS VARCHAR),
       |       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
       |WHERE NOT (SELECT ok FROM gate)
       |ORDER BY kind, idx, vec_id""".stripMargin
  }

  /** Reduced-space ANN ([[graft.operators.Pca.knnPca]]): unit-sphere
    * PCA to 32 of 64 dims, shortlist by reduced-space L2 (monotone with
    * cosine on the sphere), exact cosine rerank on the original
    * vectors. (The synthetic embeddings are near-isotropic — a worst
    * case for PCA — so 32 dims is the measured recall knee; an
    * anisotropic real corpus supports far deeper cuts.) Every served
    * sim is a true cosine, so the verify-the-scores oracle applies
    * verbatim; which candidates the reduced space surfaced stays
    * engine-specific (recall is spec-floored in PcaSpec instead).
    */
  def v19KnnPca(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Pca.knnPca(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, dims = 32, shortlist = 100)
      .orderBy("q_id", "rank")
  }

  val v19Oracle: String = selfVerifyingKnnOracle("v19_knn_pca", k = 5)

  /** Parametric OPQ ([[graft.operators.Opq.knnOpq]]): full-dimension
    * unit-sphere PCA rotation, eigenvalue-allocated subspaces, PQ ADC-L2
    * shortlist in the rotated space, exact cosine rerank on the
    * ORIGINALS — v09's code budget (m=8) with the rotation FAISS's
    * OPQMatrix applies before PQ. Every served sim is a true cosine, so
    * the verify-the-scores oracle applies verbatim; which candidates
    * the rotated domain surfaced is engine-specific (recall floored in
    * OpqSpec and RECALL_r10).
    */
  def v20KnnOpq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    graft.operators.Opq.knnOpq(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, m = 8, kSub = 32, shortlist = 150, maxFit = 20000L)
      .orderBy("q_id", "rank")
  }

  val v20Oracle: String = selfVerifyingKnnOracle("v20_knn_opq", k = 5)

  /** Full lifecycle of the PERSISTED OPQ index
    * ([[graft.operators.Opq.buildOpqIndex]] →
    * [[graft.operators.Opq.addToOpqIndex]] →
    * [[graft.operators.Opq.removeFromOpqIndex]] →
    * [[graft.operators.Opq.queryOpqIndex]]) — the v13 treatment for
    * the last ANN family member without one: built from the even ids
    * (rotation + codebooks fit once), the odd ids appended with the
    * PERSISTED fit, every third id retention-deleted from BOTH the
    * source view and the index, then served — flat bucketed codes
    * scan, ADC-L2 shortlist, exact rerank on the originals. Oracle:
    * the shared self-verifying contract (every sim a proven cosine,
    * rank-consistent, coverage sentinel) PLUS the ghost-id exclusion —
    * a removed id served back would carry a perfectly valid cosine.
    */
  def v25OpqIndex(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val path = Scratch.wiped(s, "opq_index", dir)
    graft.operators.Opq.buildOpqIndex(
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), path, m = 8, kSub = 16)
    graft.operators.Opq.addToOpqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    graft.operators.Opq.removeFromOpqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 3 === 0), col("vec_id"))
    graft.operators.Opq.queryOpqIndex(
      s, path,
      e.filter(col("vec_id") >= 10 && col("vec_id") % 3 =!= 0),
      col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, shortlist = 20)
      .orderBy("q_id", "rank")
  }

  val v25Oracle: String = selfVerifyingKnnOracle(
    "v25_opq_index", k = 5,
    ghostBWhere = Some("b_id >= 10 AND b_id % 3 = 0"))

  /** kNN majority-vote classification ([[graft.operators.Ann.majorityVote]]
    * over exact [[Ann.knnBruteForce]] neighbors): each unlabeled query
    * takes the most common label among its 5 nearest labeled vectors
    * (ties → smaller label). The dump carries BOTH the neighbor rows
    * (with their labels) and the votes, so the oracle proves (a) every
    * neighbor sim is the true strict-fold cosine and its label the true
    * label, (b) ranks are the (sim desc)-consistent 1..5 with exactly 5
    * per valid query (the exact-knn contract), and (c) each vote row is
    * EXACTLY the majority of the dumped neighbors under the documented
    * tie-break — the classification replayed end to end.
    */
  def v21KnnClassify(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val nn = graft.operators.Dedup.scopedCache(Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), k = 5))
    // pairs broadcast, corpus streams — the majorityVote posture
    val nnRows = base.select(col("vec_id").as("b_id"), col("label"))
      .join(broadcast(nn), "b_id")
      .select(lit("nn").as("kind"), col("q_id"), col("b_id"), col("rank"),
        col("sim"), col("label"), lit(null).cast("long").as("votes"))
    val voteRows = graft.operators.Ann
      .majorityVote(nn, base, col("vec_id"), col("label"))
      .select(lit("vote").as("kind"), col("q_id"), lit(-1L).as("b_id"),
        lit(-1).as("rank"), lit(null).cast("double").as("sim"),
        col("pred_label").as("label"), col("votes"))
    nnRows.unionByName(voteRows).orderBy("kind", "q_id", "rank", "b_id")
  }

  val v21Oracle: String = {
    val want = s"${duckDot("b_emb", "q_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    s"""WITH d AS (
       |  SELECT kind, q_id, b_id, "rank", sim, label, votes
       |  FROM read_parquet('__GRAFT_OUT__/v21_knn_classify/*.parquet')
       |), nn AS (SELECT q_id, b_id, "rank", sim, label FROM d WHERE kind = 'nn'),
       |vt AS (SELECT q_id, label, votes FROM d WHERE kind = 'vote'),
       |chk AS (
       |  SELECT nn.q_id, nn.b_id, nn."rank", nn.sim, nn.label,
       |    $want AS want, b.label AS true_label
       |  FROM nn
       |  JOIN (SELECT vec_id, embedding AS q_emb FROM embeddings) q ON q.vec_id = nn.q_id
       |  JOIN (SELECT vec_id, embedding AS b_emb, label FROM embeddings) b ON b.vec_id = nn.b_id
       |), badnn AS (
       |  SELECT (SELECT COUNT(*) FROM nn) - (SELECT COUNT(*) FROM chk) +
       |         (SELECT COUNT(*) FROM chk
       |          WHERE sim IS DISTINCT FROM want OR label IS DISTINCT FROM true_label
       |             OR "rank" < 1 OR "rank" > 5) AS n
       |), badorder AS (
       |  SELECT COUNT(*) AS n FROM (
       |    SELECT "rank", row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, "rank") AS rn
       |    FROM nn) WHERE "rank" <> rn
       |), badcnt AS (
       |  SELECT COUNT(*) AS n FROM (SELECT q_id, COUNT(*) AS c FROM nn GROUP BY q_id)
       |  WHERE c <> 5
       |), cov AS (
       |  SELECT COUNT(*) AS n FROM embeddings e
       |  WHERE e.vec_id < 10 AND ${duckNorm("e.embedding")} > 0
       |    AND e.vec_id NOT IN (SELECT q_id FROM nn)
       |), winner AS (
       |  SELECT q_id, label, votes FROM (
       |    SELECT q_id, label, CAST(COUNT(*) AS BIGINT) AS votes,
       |      row_number() OVER (PARTITION BY q_id ORDER BY COUNT(*) DESC, label) AS rn
       |    FROM nn WHERE label IS NOT NULL GROUP BY q_id, label)
       |  WHERE rn = 1
       |), badvote AS (
       |  SELECT (SELECT COUNT(*) FROM
       |            ((SELECT * FROM winner) EXCEPT (SELECT q_id, label, votes FROM vt))) +
       |         (SELECT COUNT(*) FROM
       |            ((SELECT q_id, label, votes FROM vt) EXCEPT (SELECT * FROM winner))) AS n
       |), gate AS (
       |  SELECT (SELECT n FROM badnn) = 0 AND (SELECT n FROM badorder) = 0
       |     AND (SELECT n FROM badcnt) = 0 AND (SELECT n FROM cov) = 0
       |     AND (SELECT n FROM badvote) = 0 AS ok
       |)
       |SELECT kind, q_id, b_id, "rank", sim, label, votes FROM d
       |WHERE (SELECT ok FROM gate)
       |UNION ALL
       |SELECT '__gate_failed', -1, -1, -1, CAST(NULL AS DOUBLE),
       |       CAST(NULL AS INT), CAST(NULL AS BIGINT)
       |WHERE NOT (SELECT ok FROM gate)
       |ORDER BY kind, q_id, "rank", b_id""".stripMargin
  }

  /** First-class k-means ([[graft.operators.Clustering]]): fit k = 8 on
    * the bounded sample, assign the whole corpus through the native
    * NearestCentroid pass, dump the MODEL (centroid rows) and the
    * ASSIGNMENT (one row per vector). The oracle recomputes every
    * assignment from the raw embeddings plus the dumped centroids
    * alone: squared-L2 strict fold per (vector, cell), argmin with the
    * lower-cell tie-break — identical IEEE operation order in both
    * engines, so the cells must match exactly and every vector must
    * appear exactly once. WHICH centroids Lloyd chose is
    * engine-specific and deliberately unconstrained (the v18-basis
    * posture); the fit arithmetic itself is pinned by the Quantizer +
    * NearestCentroid determinism/argmin specs.
    */
  def v22Kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cb = graft.operators.Clustering.fit(
      e, col("vec_id"), col("embedding"), k = 8)
    // centroids ride the dump as comma-joined shortest-double text
    // (the hash gate compares scalar columns — the v18 convention)
    val cents = cb.zipWithIndex
      .map { case (c, i) => ("c", i, Option.empty[Long], c.mkString(",")) }.toSeq
      .toDF("kind", "cell", "vec_id", "vec")
    val asg = graft.operators.Clustering.assign(
        e, col("vec_id"), col("embedding"), cb)
      .select(lit("a").as("kind"), col("cell"), col("id").as("vec_id"),
        lit(null).cast("string").as("vec"))
    cents.unionByName(asg).orderBy("kind", "cell", "vec_id")
  }

  val v22Oracle: String = {
    val diff = "(CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])"
    val d2 = DuckOracle.duckFold("e.embedding", s"$diff * $diff")
    s"""WITH cents AS (
       |  SELECT cell, vec,
       |    list_transform(string_split(vec, ','), x -> CAST(x AS DOUBLE)) AS cvec
       |  FROM read_parquet('__GRAFT_OUT__/v22_kmeans/*.parquet') WHERE kind = 'c'
       |), e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE embedding IS NOT NULL
       |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
       |), scored AS (
       |  SELECT e.vec_id, c.cell, $d2 AS d2
       |  FROM e CROSS JOIN cents c
       |), best AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |    FROM scored) WHERE rn = 1
       |)
       |SELECT 'c' AS kind, cell, CAST(NULL AS BIGINT) AS vec_id, vec FROM cents
       |UNION ALL
       |SELECT 'a' AS kind, cell, vec_id, CAST(NULL AS VARCHAR) AS vec FROM best
       |ORDER BY kind, cell, vec_id""".stripMargin
  }

  /** Cluster quality vs ground-truth labels (the evaluation loop of
    * every embedding-clustering job): per k-means cell, the member
    * count, the majority label (smaller label on ties — total order),
    * its count, and purity = n_majority / n. Assignment reuses the v22
    * deterministic fit; the oracle recomputes assignments from the
    * dumped centroids (the v22 argmin contract) and re-derives every
    * count, majority pick, and the exact-long purity division.
    */
  def v23ClusterPurity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cb = graft.operators.Clustering.fit(
      e, col("vec_id"), col("embedding"), k = 8)
    val cents = cb.zipWithIndex
      .map { case (c, i) => ("c", i, c.mkString(","), Option.empty[Long],
        Option.empty[Long], Option.empty[Long], Option.empty[Double]) }.toSeq
      .toDF("kind", "cell", "vec", "n", "maj_label", "n_maj", "purity")
    val asg = graft.operators.Clustering.assign(
        e, col("vec_id"), col("embedding"), cb)
      .join(e.select(col("vec_id").as("id"), col("label")), Seq("id"))
    val byLabel = asg.groupBy("cell", "label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("cell").orderBy(desc("c"), asc("label"))
    val purity = byLabel
      .withColumn("rn", row_number().over(w))
      .groupBy("cell")
      .agg(sum("c").as("n"),
        max(when(col("rn") === 1, col("label"))).cast("long").as("maj_label"),
        max(when(col("rn") === 1, col("c"))).as("n_maj"))
      .select(lit("p").as("kind"), col("cell"),
        lit(null).cast("string").as("vec"), col("n"), col("maj_label"),
        col("n_maj"), (col("n_maj").cast("double") / col("n").cast("double")).as("purity"))
    cents.unionByName(purity).orderBy("kind", "cell")
  }

  val v23Oracle: String = {
    val diff = "(CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])"
    val d2 = DuckOracle.duckFold("e.embedding", s"$diff * $diff")
    s"""WITH cents AS (
       |  SELECT cell, vec,
       |    list_transform(string_split(vec, ','), x -> CAST(x AS DOUBLE)) AS cvec
       |  FROM read_parquet('__GRAFT_OUT__/v23_cluster_purity/*.parquet') WHERE kind = 'c'
       |), e AS (
       |  SELECT vec_id, embedding, label FROM embeddings
       |  WHERE embedding IS NOT NULL
       |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
       |), best AS (
       |  SELECT vec_id, label, cell FROM (
       |    SELECT e.vec_id, e.label, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $d2, c.cell) AS rn
       |    FROM e CROSS JOIN cents c) WHERE rn = 1
       |), byl AS (
       |  SELECT cell, label, COUNT(*) AS c FROM best GROUP BY cell, label
       |), pur AS (
       |  SELECT cell, CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(MAX(CASE WHEN rn = 1 THEN label END) AS BIGINT) AS maj_label,
       |    CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS n_maj
       |  FROM (SELECT cell, label, c,
       |          row_number() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rn
       |        FROM byl)
       |  GROUP BY cell
       |)
       |SELECT 'c' AS kind, cell, vec, CAST(NULL AS BIGINT) AS n,
       |  CAST(NULL AS BIGINT) AS maj_label, CAST(NULL AS BIGINT) AS n_maj,
       |  CAST(NULL AS DOUBLE) AS purity
       |FROM cents
       |UNION ALL
       |SELECT 'p' AS kind, cell, CAST(NULL AS VARCHAR) AS vec, n, maj_label,
       |  n_maj, CAST(n_maj AS DOUBLE) / CAST(n AS DOUBLE) AS purity
       |FROM pur
       |ORDER BY kind, cell""".stripMargin
  }

  /** NDCG@5 of the v03 LSH ranking against brute-force ground truth
    * ([[Ann.ndcgAtK]]) — the ranking-quality eval of the ANN family
    * (recall says whether the true neighbors surfaced; NDCG says
    * WHERE). Fully replayable: the LSH ranking, the exact ranking, the
    * binary relevance join, and the discount FOLD (literal weight
    * table — neither engine calls log2, whose last ulp differs across
    * libm/JVM) all recompute in SQL.
    */
  def v24Ndcg(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val approx = Ann.knnLsh(
      base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"),
      k = 5, bits = 4, tables = 6, multiprobe = true, probeRadius = 2)
    val exact = Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5)
    Ann.ndcgAtK(approx, exact, k = 5).orderBy("q_id")
  }

  val v24Oracle: String = {
    val k = 5
    val ws = Ann.ndcgDiscounts(k)
    val wsSql = ws.map(_.toString).mkString("[", ", ", "]")
    // per-query IDCG: prefix-sum literal table indexed by the query's
    // exact-list size, mirroring Ann.idcgTable — same doubles, same
    // shortest-round-trip embedding
    val psSql = Ann.idcgTable(k).map(_.toString).mkString("[", ", ", "]")
    val sim = s"${duckDot("q_emb", "b_emb")} / (${duckNorm("b_emb")} * ${duckNorm("q_emb")})"
    s"""WITH ${lshScoredCtes(bits = 4, tables = 6)},
       |approx AS (
       |  SELECT q_id, b_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) AS INT) AS rank
       |  FROM scored WHERE NOT isnan(sim)
       |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) <= $k
       |),
       |bscored AS (SELECT q_id, b_id, $sim AS sim FROM b, q),
       |exact AS (
       |  SELECT q_id, b_id FROM bscored WHERE NOT isnan(sim)
       |  QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, b_id) <= $k
       |),
       |hitranks AS (
       |  SELECT a.q_id, a.rank
       |  FROM approx a JOIN exact e ON a.q_id = e.q_id AND a.b_id = e.b_id
       |),
       |agg AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS hits,
       |    list(rank ORDER BY rank) AS rs
       |  FROM hitranks GROUP BY q_id
       |)
       |SELECT eq.q_id, CAST(COALESCE(agg.hits, 0) AS BIGINT) AS hits,
       |  COALESCE(list_reduce([CAST(0 AS DOUBLE)] || list_transform(rs, r -> ($wsSql)[r]), (a, b) -> a + b), CAST(0 AS DOUBLE)) / ($psSql)[eq.n_ex] AS ndcg
       |FROM (SELECT q_id, CAST(COUNT(*) AS INT) AS n_ex FROM exact GROUP BY q_id) eq
       |LEFT JOIN agg ON agg.q_id = eq.q_id
       |ORDER BY eq.q_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v24_ndcg" -> (v24Ndcg _),
    "v23_cluster_purity" -> (v23ClusterPurity _),
    "v22_kmeans" -> (v22Kmeans _),
    "v21_knn_classify" -> (v21KnnClassify _),
    "v20_knn_opq" -> (v20KnnOpq _),
    "v25_opq_index" -> (v25OpqIndex _),
    "v19_knn_pca" -> (v19KnnPca _),
    "v18_pca_project" -> (v18PcaProject _),
    "v16_knn_ivfsq8" -> (v16KnnIvfSq8 _),
    "v17_ivfsq8_index" -> (v17IvfSq8Lifecycle _),
    "d06_semdedup_pairs" -> (d06SemdedupPairs _),
    "v15_knn_sq8" -> (v15KnnSq8 _),
    "v01_knn_bruteforce" -> (v01KnnBruteForce _),
    "v02_label_stats" -> (v02LabelStats _),
    "v03_knn_lsh" -> (v03KnnLsh _),
    "v04_embedding_neardup" -> (v04EmbeddingNeardup _),
    "v05_knn_ivf" -> (v05KnnIvf _),
    "v06_neardup_lsh" -> (v06NeardupLsh _),
    "v07_ivf_index" -> (v07IvfIndex _),
    "v08_ivf_append" -> (v08IvfAppend _),
    "v09_knn_pq" -> (v09KnnPq _),
    "v10_knn_ivfpq" -> (v10KnnIvfPq _),
    "v11_ivfpq_index" -> (v11IvfPqIndex _),
    "v12_ivfpq_append" -> (v12IvfPqAppend _),
    "v13_ivfpq_remove" -> (v13IvfPqRemove _),
    "v14_ivf_filtered" -> (v14IvfFiltered _)
  )

  val oracles: Map[String, String] = Map(
    "v23_cluster_purity" -> v23Oracle,
    "v22_kmeans" -> v22Oracle,
    "v21_knn_classify" -> v21Oracle,
    "v20_knn_opq" -> v20Oracle,
    "v25_opq_index" -> v25Oracle,
    "v19_knn_pca" -> v19Oracle,
    "v18_pca_project" -> v18Oracle,
    "v16_knn_ivfsq8" -> v16Oracle,
    "v17_ivfsq8_index" -> v17Oracle,
    "d06_semdedup_pairs" -> d06Oracle,
    "v15_knn_sq8" -> v15Oracle,
    "v01_knn_bruteforce" -> v01Oracle,
    "v02_label_stats" -> v02Oracle,
    "v03_knn_lsh" -> v03Oracle,
    "v24_ndcg" -> v24Oracle,
    "v04_embedding_neardup" -> v04Oracle,
    "v05_knn_ivf" -> v05Oracle,
    "v06_neardup_lsh" -> v06Oracle,
    "v07_ivf_index" -> v07Oracle,
    "v08_ivf_append" -> v08Oracle,
    "v09_knn_pq" -> v09Oracle,
    "v10_knn_ivfpq" -> v10Oracle,
    "v11_ivfpq_index" -> v11Oracle,
    "v12_ivfpq_append" -> v12Oracle,
    "v13_ivfpq_remove" -> v13Oracle,
    "v14_ivf_filtered" -> v14Oracle
  )
}
