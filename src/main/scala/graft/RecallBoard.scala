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

  /** recall@5 per approximate path over `dir`'s embeddings table, at
    * the pinned oracle-query parameters.
    */
  def recalls(spark: SparkSession, dir: String): Map[String, Double] = {
    val e = Tables.t(spark, dir, "embeddings")
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val k = 5
    val exact = Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), k)
    val paths: Seq[(String, DataFrame)] = Seq(
      "v03_knn_lsh" -> Ann.knnLsh(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, bits = 4, tables = 6, multiprobe = true, probeRadius = 2),
      "v05_knn_ivf" -> Ann.knnIvf(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, nlist = 8, nprobe = 7),
      "v09_knn_pq" -> Pq.knnPq(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, m = 8, kSub = 32, shortlist = 150, maxFit = 20000L),
      "v10_knn_ivfpq" -> Pq.knnIvfPq(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, nlist = 8, nprobe = 7, m = 8, kSub = 32, shortlist = 150, maxFit = 20000L),
      "v15_knn_sq8" -> graft.operators.Sq.knnSq8(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, shortlist = 20),
      "v16_knn_ivfsq8" -> graft.operators.Sq.knnIvfSq8(
        base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
        k, nlist = 8, nprobe = 7, shortlist = 50))
    paths.map { case (name, df) => name -> recallAtK(exact, df, k) }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = recalls(spark, sfDir).toSeq.sortBy(_._1)
    val json = r.map { case (n, v) => s""""$n":${math.rint(v * 1000) / 1000}""" }
      .mkString(s"""{"metric":"recall@5","sf":"$sfDir","recall":{""", ",", "}}")
    args.lift(1).foreach { out =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out), (json + "\n").getBytes("UTF-8")): Unit
    }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
