package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-class k-means over an embedding column — the clustering
  * primitive the vector family already uses internally (IVF coarse
  * quantizers, SemDeDup cells) exposed as fit / assign / stats, for
  * pipelines that want the clusters THEMSELVES (corpus exploration,
  * stratified curation, per-cluster sampling quotas) rather than an
  * index built on top of them.
  *
  * Scale shape (the FAISS train/add division of labor, same as
  * [[Ann.knnIvf]]): `fit` is driver-side Lloyd on a bounded
  * deterministic hash sample (≤ maxFit rows ≈ 25 MB — the one bounded
  * collect; k-means++ seeding + tie-breaks are fixed-seed and
  * sample-order-canonical, so the fit is a pure function of the
  * (id, vector) set), while `assign` is one distributed narrow pass
  * through the native [[graft.functions.expr.NearestCentroid]] codegen
  * expression — no shuffle, no UDF, linear in the corpus at any size.
  */
object Clustering {

  /** Lloyd fit on the bounded deterministic sample; returns the
    * k × dim centroid codebook (row-major). Degenerate corpora clamp k
    * to the sample size (loudly) rather than fail.
    */
  def fit(
      df: DataFrame, id: Column, vec: Column, k: Int,
      seed: Long = 42L, maxFit: Long = 100000L): Array[Array[Double]] =
    Ann.fitCodebook(df.select(id.as("b_id"), vec.as("b_emb")), k, seed, maxFit)

  /** (id, cell) for every row with a complete vector: squared-L2
    * nearest centroid, ties to the lower cell index (the
    * [[graft.functions.expr.NearestCentroid]] contract). Rows with a
    * null vector or null element get no cell and are dropped, like a
    * null join key.
    */
  def assign(
      df: DataFrame, id: Column, vec: Column,
      codebook: Array[Array[Double]]): DataFrame =
    df.select(id.as("id"), Ann.cellExpr(vec, codebook).as("cell"))
      .filter(col("cell").isNotNull)

  /** The codebook as a frame: (cell, centroid array<double>). */
  def centroids(
      spark: SparkSession, codebook: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    codebook.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
  }

  /** Per-cluster occupancy: (cell, n) over an [[assign]] output —
    * result-keyed aggregation, bounded by k rows.
    */
  def stats(assigned: DataFrame): DataFrame =
    assigned.groupBy("cell").agg(count(lit(1)).as("n"))
}
