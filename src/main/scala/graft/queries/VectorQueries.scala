package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** DuckDB strict left fold of `expr(i)` over dims, starting at 0.0 —
    * matches Spark's `aggregate(..., lit(0.0), _+_)` exactly.
    */
  private def duckFold(arr: String, body: String): String =
    s"list_reduce([CAST(0 AS DOUBLE)] || list_transform(generate_series(1, len($arr)), i -> $body), (a, b) -> a + b)"

  private def duckDot(a: String, b: String): String =
    duckFold(a, s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)")

  private def duckNorm(a: String): String =
    s"sqrt(${duckFold(a, s"CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)")})"

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

  /** Sign-LSH approximate KNN (rows-only: recall is probabilistic;
    * measured against brute force in ScalaTest).
    */
  def v03KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Ann.knnLsh(
      e.filter(col("vec_id") >= 10), col("vec_id"), col("embedding"),
      e.filter(col("vec_id") < 10), col("vec_id"), col("embedding"),
      k = 5, bits = 4)
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_knn_bruteforce" -> (v01KnnBruteForce _),
    "v02_label_stats" -> (v02LabelStats _),
    "v03_knn_lsh" -> (v03KnnLsh _)
  )

  val oracles: Map[String, String] = Map(
    "v01_knn_bruteforce" -> v01Oracle,
    "v02_label_stats" -> v02Oracle
  )
}
