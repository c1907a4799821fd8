package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md). One parquet file per table under `dir`.
  *
  * All queries take `dir` (a scale-factor directory) so the same code
  * runs at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, by
  * design, unchanged against a 100 TB lake: nothing here assumes
  * single-file inputs, local paths, or collected data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
