package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordinal ranking of enum-like string columns via `when` chains —
  * the reference's severity/domain ordering maps
  * (/root/reference/src/audit/pipeline.py:373-393,
  * src/audit/reporting/html_report.py:22-48) as Catalyst expressions.
  */
object Ranks {

  private def rankOf(c: Column, order: Seq[String], dflt: Int): Column =
    order.zipWithIndex.foldRight(lit(dflt): Column) { case ((v, i), acc) =>
      when(lower(c) === v, lit(i)).otherwise(acc)
    }

  /** critical=0 … info=4, unknown=99. */
  def severityRank(c: Column): Column =
    rankOf(c, Seq("critical", "high", "medium", "low", "info"), 99)

  /** Finding-domain display order (html_report.py:44-48). */
  def domainRank(c: Column): Column =
    rankOf(c, Seq("malware", "persistence", "network", "process", "filesystem", "system"), 99)

  /** TPC-H-ish order-priority rank: '1-URGENT'=0 … '5-LOW'=4. */
  def priorityRank(c: Column): Column =
    when(c.startsWith("1"), 0)
      .when(c.startsWith("2"), 1)
      .when(c.startsWith("3"), 2)
      .when(c.startsWith("4"), 3)
      .when(c.startsWith("5"), 4)
      .otherwise(99)
}
