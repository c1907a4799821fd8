package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-coverage names → (session, sfDir) → result;
  * `oracleSql` holds an equivalent DuckDB SQL per SQL-expressible query
  * (identical column names/ordering — the driver hash-compares).
  */
object SparkEntry {

  import _root_.graft.{queries => qp}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qp.RelationalQueries.q02RevenueByNation(spark, "/root/testdata/sf0.001")

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (qp.RelationalQueries.queries, qp.RelationalQueries.oracles),
      (qp.EventQueries.queries, qp.EventQueries.oracles),
      (qp.TextQueries.queries, qp.TextQueries.oracles),
      (qp.DedupQueries.queries, qp.DedupQueries.oracles),
      (qp.VectorQueries.queries, qp.VectorQueries.oracles),
      (qp.ParseQueries.queries, qp.ParseQueries.oracles),
      (qp.SearchQueries.queries, qp.SearchQueries.oracles),
      (qp.CurationQueries.queries, qp.CurationQueries.oracles)
    )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
