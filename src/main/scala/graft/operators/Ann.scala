package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Vectors

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force is the correctness baseline: broadcast the (small) query
  * set against the base table — a map-side nested loop with no shuffle
  * except the final per-query top-k. The LSH variant buckets both sides
  * with deterministic sign-hyperplanes and joins on bucket, trading
  * recall for a candidate set ~2^bits smaller — the 100 TB path.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` must be broadcast-sized (it is hint-broadcast).
    */
  def knnBruteForce(
      base: DataFrame, baseId: Column, baseVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      k: Int): DataFrame = {
    val b = base.select(baseId.as("b_id"), baseVec.as("b_emb"))
    val q = queries.select(qId.as("q_id"), qVec.as("q_emb"))
    val scored = b.crossJoin(broadcast(q))
      .withColumn("sim", Vectors.cosine(col("b_emb"), col("q_emb")))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("b_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "b_id", "rank", "sim")
  }

  /** Approximate top-k via sign-LSH bucketing: candidates are base rows
    * sharing the query's bucket; rank within candidates. Recall rises
    * with fewer bits (bigger buckets); 100 TB deployments would hash to
    * multiple tables — keep one here, measured against brute force in
    * tests.
    */
  def knnLsh(
      base: DataFrame, baseId: Column, baseVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      k: Int, bits: Int = 8): DataFrame = {
    val b = base.select(baseId.as("b_id"), baseVec.as("b_emb"))
      .withColumn("bucket", Vectors.signLsh(col("b_emb"), bits))
    val q = queries.select(qId.as("q_id"), qVec.as("q_emb"))
      .withColumn("bucket", Vectors.signLsh(col("q_emb"), bits))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("b_id"))
    b.join(q, "bucket")
      .withColumn("sim", Vectors.cosine(col("b_emb"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "b_id", "rank", "sim")
  }
}
