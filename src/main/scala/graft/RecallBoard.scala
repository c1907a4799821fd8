package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Pq}

/** Per-round recall scoreboard for the approximate knn family.
  *
  * The self-verifying hash oracles prove every REPORTED score is a true
  * cosine and every rank is consistent — deliberately NOT which
  * candidates were considered (that is the engine-side approximation).
  * So a probe/encode regression that halved recall would pass every
  * correctness gate; this main makes candidate quality a per-round
  * ARTIFACT (`RECALL_r{N}.json`) instead of a ScalaTest-only number,
  * and [[recalls]] doubles as the spec floor's measurement
  * (ColumnFunctionsSpec fails the build if a path's recall drops below
  * its pinned floor).
  *
  * Each path runs at the EXACT parameters its oracle query uses
  * (v03/v05/v09/v10 in [[graft.queries.VectorQueries]], fixed seeds) —
  * the scoreboard tracks the shipped configuration, not a tuned one.
  */
object RecallBoard {

  /** Mean per-query recall@k of `approx` against `exact` (knn output
    * frames: q_id, b_id, rank, sim). A query absent from `approx`
    * contributes 0 — silent query drops must read as a recall hole,
    * not vanish from the average.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): Double = {
    def sets(d: DataFrame): Map[Long, Set[Long]] =
      d.select(col("q_id").cast("long"), col("b_id").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val e = sets(exact)
    val a = sets(approx)
    if (e.isEmpty) 1.0
    else e.keys.toSeq.map { q =>
      // denominator bounded by the exact set: a base smaller than k
      // must not make perfect recall unreachable
      (a.getOrElse(q, Set.empty) intersect e(q)).size.toDouble /
        math.min(k, e(q).size)
    }.sum / e.size
  }

  /** Size-derived ANN search-effort parameters — the deployment rule
    * the scoreboard measures at every scale. Fixed ABSOLUTE knobs do
    * not survive corpus growth: the round-10 sweep measured the
    * sf0.01-tuned config (nlist 8 / nprobe 7 / PQ shortlist 150)
    * falling from ≥0.98 recall@5 at n≈500 to 0.76–0.92 at n≈2000 —
    * cells hold 4× the vectors, so a pruned cell hides 4× the
    * neighbors, and a 150-of-2000 shortlist is 4× more selective than
    * 150-of-500. The rule scales effort with n (sweep-validated at
    * both shipped scales):
    *
    *  - `nlist = max(8, ceil(n/125))` — ~125 vectors per cell, the
    *    occupancy the sf0.01 tuning established;
    *  - `nprobe = round(7·nlist/8)` — probe 7/8 of the cells (the
    *    sweep shows 3/4 already reaches the floor once cells
    *    multiply; 7/8 keeps headroom at every scale);
    *  - PQ `shortlist = max(150, ceil(n/5))` — rerank ~20% of the
    *    corpus (compressed-domain scoring stays the candidate gate);
    *  - SQ8 shortlists are distortion-bound, not size-bound (byte
    *    codes rank almost exactly), and stay fixed.
    *
    * At 100 TB the same rule holds per PARTITION of the index (nlist
    * ∝ corpus, nprobe a fraction, shortlist ∝ k·probed-mass) — the
    * point is that effort is a FUNCTION of size, never a constant.
    */
  def scaledAnnParams(n: Long): (Int, Int, Int) = {
    val nlist = math.max(8, math.ceil(n / 125.0).toInt)
    val nprobe = math.min(nlist, math.round(nlist * 7.0 / 8).toInt)
    val shortlist = math.max(150, math.ceil(n / 5.0).toInt)
    (nlist, nprobe, shortlist)
  }

  /** recall@5 per approximate path over `dir`'s embeddings table, at
    * the [[scaledAnnParams]] config for that corpus size (which at
    * sf0.01 reproduces the pinned oracle-query parameters exactly —
    * nlist 8, nprobe 7, shortlist 150).
    */
  def recalls(spark: SparkSession, dir: String): Map[String, Double] = {
    val e = Tables.t(spark, dir, "embeddings")
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val k = 5
    val (nlist, nprobe, shortlist) = scaledAnnParams(base.count())
    val exact = Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), k)
    val paths: Seq[(String, DataFrame)] = Seq(
      "v03_knn_lsh" -> Ann.knnLsh(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, bits = 4, tables = 6, multiprobe = true, probeRadius = 2),
      "v05_knn_ivf" -> Ann.knnIvf(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, nlist = nlist, nprobe = nprobe),
      "v09_knn_pq" -> Pq.knnPq(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, m = 8, kSub = 32, shortlist = shortlist, maxFit = 20000L),
      "v10_knn_ivfpq" -> Pq.knnIvfPq(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, nlist = nlist, nprobe = nprobe, m = 8, kSub = 32,
        shortlist = shortlist, maxFit = 20000L),
      "v15_knn_sq8" -> graft.operators.Sq.knnSq8(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, shortlist = 20),
      "v16_knn_ivfsq8" -> graft.operators.Sq.knnIvfSq8(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, nlist = nlist, nprobe = nprobe, shortlist = 50),
      // PCA dims is a property of the data's SPECTRUM, not corpus size
      // (32/64 is the measured knee on the near-isotropic synthetic
      // embeddings); the shortlist scales like PQ's — candidate
      // selectivity is what degrades with n
      "v19_knn_pca" -> graft.operators.Pca.knnPca(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, dims = 32, shortlist = shortlist, maxFit = 20000L),
      // v09's code budget behind the FAISS OPQMatrix rotation —
      // shortlist scales like PQ's
      "v20_knn_opq" -> graft.operators.Opq.knnOpq(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, m = 8, kSub = 32, shortlist = shortlist, maxFit = 20000L),
      // the persisted OPQ lifecycle (v25): recall must hold through
      // build → serve, not just on-the-fly — the sidecar round trip is
      // part of the measured path. Scratch-owned path: wiped per
      // (name, dir, appId) on reuse and deleted at JVM exit — a bare
      // createTempDirectory would leak one full index copy per
      // measured scale per sweep run
      "v25_opq_index" -> {
        val path = graft.queries.Scratch.wiped(spark, "recall_opq", dir)
        graft.operators.Opq.buildOpqIndex(
          base, col("vec_id"), col("embedding"), path,
          m = 8, kSub = 32, maxFit = 20000L)
        graft.operators.Opq.queryOpqIndex(
          spark, path, base, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k, shortlist = shortlist)
      })
    paths.map { case (name, df) => name -> recallAtK(exact, df, k) }.toMap
  }

  /** `args(0)`: one sf dir, or several comma-separated (the round-10
    * artifact carries BOTH the oracle scale sf0.01 and the bench scale
    * sf0.1 — cell/bucket occupancy differs with corpus size, so a
    * recall hole can exist at one scale and not the other);
    * `args(1)` (optional): output file for the JSON line.
    */
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
      .split(',').toSeq.filter(_.nonEmpty)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JSON string escape (Bench's esc() contract): a quote/backslash in
    // an env- or arg-supplied dir path must not corrupt the artifact
    // line the runner parses
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def obj(dir: String): String =
      recalls(spark, dir).toSeq.sortBy(_._1)
        .map { case (n, v) => s""""$n":${math.rint(v * 1000) / 1000}""" }
        .mkString("{", ",", "}")
    // measured_at: the gate's staleness rule compares COMMIT times of
    // ANN sources vs the RECALL artifact — a re-measurement whose
    // numbers are identical would otherwise produce a byte-identical
    // file, leave nothing to commit, and be unrecordable (hit in round
    // 15: the Opq hardening re-measured to the same 0.98/0.96 and the
    // gate still failed). The timestamp makes every honest sweep a
    // distinct, committable artifact.
    val stamp = s""""measured_at":${System.currentTimeMillis / 1000},"""
    val json =
      if (dirs.size == 1)
        s"""{"metric":"recall@5",$stamp"sf":"${esc(dirs.head)}","recall":${obj(dirs.head)}}"""
      else
        dirs.map(d => s""""${esc(d)}":${obj(d)}""")
          .mkString(s"""{"metric":"recall@5",$stamp"scales":{""", ",", "}}")
    args.lift(1).foreach { out =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8")): Unit
    }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
