package graft.analyze

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Ranks

/** The normalized Finding relation (SURVEY §1.1; reference
  * /root/reference/src/audit/models.py:75-105) and its rollups.
  */
case class Finding(
    title: String,
    description: String,
    severity: String, // critical | high | medium | low | info
    domain: String, // process | network | persistence | malware | filesystem | system
    resource: String,
    source: String,
    rawData: String // heterogeneous per tool → JSON string
)

object Findings {

  /** The Finding relation's schema, for readers that must produce an
    * empty findings frame when a saved set has no rows
    * ([[graft.pipeline.ResultStore.readJsonSet]]).
    */
  val schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Finding].schema

  def toDS(spark: SparkSession, fs: Seq[Finding]): Dataset[Finding] = {
    import spark.implicits._
    spark.createDataset(fs)
  }

  /** Union finding streams from pipeline stages (U3). */
  def combine(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Severity floor: drop informational rows (P4). Null severity (a
    * stream combined via allowMissingColumns) is KEPT — `lower(null) !=
    * 'info'` is null-falsy and would silently discard whole streams.
    */
  def dropInfo(df: DataFrame): DataFrame =
    df.filter(coalesce(lower(col("severity")), lit("")) =!= "info")

  /** Severity/domain-ordered top-K (T2) with deterministic tiebreaks. */
  def topFindings(df: DataFrame, limit: Int = 100): DataFrame =
    df.withColumn("sev_rank", Ranks.severityRank(col("severity")))
      .withColumn("dom_rank", Ranks.domainRank(col("domain")))
      .orderBy(asc("sev_rank"), asc("dom_rank"), asc("title"), asc("resource"))
      .limit(limit)
      .drop("sev_rank", "dom_rank")

  /** Count cards: per-severity and per-domain counts (A5). */
  def severityCounts(df: DataFrame): DataFrame =
    df.groupBy(lower(col("severity")).as("severity")).count().orderBy("severity")

  def domainCounts(df: DataFrame): DataFrame =
    df.groupBy(lower(col("domain")).as("domain")).count().orderBy("domain")

  /** Filter by severity and/or domain (P3). */
  def where(df: DataFrame, severity: Option[String] = None, domain: Option[String] = None): DataFrame = {
    val s = severity.map(v => lower(col("severity")) === v.toLowerCase).getOrElse(lit(true))
    val d = domain.map(v => lower(col("domain")) === v.toLowerCase).getOrElse(lit(true))
    df.filter(s && d)
  }
}
