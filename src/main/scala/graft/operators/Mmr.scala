package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance (MMR) result diversification — the
  * standard serving-side re-rank that trades a little relevance for
  * coverage: from a retrieved candidate list, greedily pick the item
  * maximizing `λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)` against the
  * already-selected set S (Carbonell & Goldstein, SIGIR'98). A top-k
  * that would otherwise return five near-duplicates of the best hit
  * returns one of them plus four distinct neighborhoods — directly
  * relevant to training-data curation, where retrieval feeds dedup'd
  * exemplars, not five copies.
  *
  * Scale shape: this operator re-ranks RETRIEVED candidates, never the
  * corpus — input is ≤ queries × topN rows by contract (the output of
  * [[Bm25.searchTopK]] / [[Ann.queryIvfIndex]] / [[Fusion.hybridTopK]],
  * all of which bound their output). The greedy selection is inherently
  * sequential in k, so it runs per-group over the grouped candidate
  * lists (`flatMapGroups` — one shuffle on q_id, each group a bounded
  * in-memory problem), exactly like the k-buffer aggregator tail every
  * knn path already ends with. Nothing here scans or collects
  * corpus-sized data.
  *
  * Determinism contract (the r07 oracle replays it bit-for-bit):
  * pairwise sims are strict left-to-right double dot folds over the
  * embedding arrays (the [[graft.functions.Vectors.dot]] arithmetic);
  * the marginal score is `λ·rel − (1−λ)·pen` with `pen = 0` for the
  * first pick and the running max pairwise sim after; ties break on
  * smaller id. λ arithmetic uses `1.0 − λ` in doubles — the oracle
  * writes `(1 - CAST(λ AS DOUBLE))` so both engines compute the same
  * rounding of the complement.
  */
object Mmr {

  /** Diversify per-query candidates. `cands` columns:
    * `q_id` (long-castable), `b_id` (long-castable), `rel` (double
    * relevance, higher better), `emb` (float array). Returns
    * (q_id, b_id, rank, score) where `score` is the marginal MMR score
    * AT SELECTION TIME (rank 1's score is `λ·rel`). Rows with null
    * rel/emb are dropped; groups smaller than k return what they have.
    */
  def diversify(cands: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = cands.sparkSession
    import spark.implicits._

    val in = cands.select(
      col("q_id").cast("long").as("q_id"),
      col("b_id").cast("long").as("b_id"),
      col("rel").cast("double").as("rel"),
      // cast like every other contract column: an array<double>
      // embedding would otherwise pass analysis and CCE at getSeq[Float]
      col("emb").cast("array<float>").as("emb"))
      // non-FINITE rel (NaN or ±Inf) would poison every score
      // comparison (best stays -1 → AIOOBE in the greedy, or an
      // Inf-norm vector makes every pairwise csim NaN with the same
      // crash at λ=1) — exclude like the r07 oracle's NOT isnan(rel);
      // a null ELEMENT inside emb would NPE the in-memory copy, and a
      // null q_id would NPE the group key — so require a present key
      // and fully-populated FINITE vectors
      .filter(col("q_id").isNotNull && col("b_id").isNotNull &&
        col("rel").isNotNull && !isnan(col("rel")) &&
        abs(col("rel")) < lit(Double.PositiveInfinity) &&
        col("emb").isNotNull &&
        forall(col("emb"), x =>
          x.isNotNull && !isnan(x) && abs(x) < lit(Float.PositiveInfinity)))

    val outSchema = StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("b_id", LongType, nullable = false),
      StructField("rank", IntegerType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)

    in.groupByKey(_.getLong(0))
      .flatMapGroups { (qId: Long, rows: Iterator[Row]) =>
        val cs = rows.map { r =>
          (r.getLong(1), r.getDouble(2), r.getSeq[Float](3).toArray)
        }.toArray.sortBy(_._1) // id order: deterministic regardless of shuffle arrival
        greedy(qId, cs, k, lambda).iterator
      }(enc)
      .toDF()
  }

  /** Strict left-to-right double dot fold — [[graft.functions.Vectors.dot]]
    * / DuckDB `list_reduce` twin (mismatched lengths score the
    * overlapping prefix of the shorter; retrieval outputs are fixed-dim
    * by upstream contract).
    */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def greedy(
      qId: Long, cs: Array[(Long, Double, Array[Float])],
      k: Int, lambda: Double): Seq[Row] = {
    val n = cs.length
    if (n == 0) return Seq.empty
    val norms = cs.map { case (_, _, v) => math.sqrt(dot(v, v)) }
    // cosine between candidates i and j; zero-norm candidates pair at
    // sim 0 (no diversity signal — they can't dominate anything)
    def csim(i: Int, j: Int): Double =
      if (norms(i) == 0.0 || norms(j) == 0.0) 0.0
      else dot(cs(i)._3, cs(j)._3) / (norms(i) * norms(j))

    val compl = 1.0 - lambda
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    // running max sim to the selected set — NegativeInfinity, not 0.0:
    // a candidate whose every selected-pair cosine is negative must
    // keep that negative max (a diversity BONUS under MMR), matching
    // the oracle's plain MAX over the selected set
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val taken = Array.fill(n)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 1
    while (rank <= math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val pen = if (selected.isEmpty) 0.0 else maxSim(i)
          val score = lambda * cs(i)._2 - compl * pen
          // ties on smaller id: cs is id-sorted, strict > keeps the first
          if (score > bestScore) { best = i; bestScore = score }
        }
        i += 1
      }
      taken(best) = true
      selected += best
      out += Row(qId, cs(best)._1, rank, bestScore)
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = csim(j, best)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      rank += 1
    }
    out.toSeq
  }
}
