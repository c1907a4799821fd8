package graft.parse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Ranks

/** Tool-output parsers (SURVEY §2.10 X3 "parser UDTFs", §2.8 F12-F17).
  *
  * Each parser lifts a raw tool output (CSV/JSON/log text) into the
  * normalized Finding shape. They are pure DataFrame transforms —
  * scans + regexp/`from_json` projections + filters — so they
  * distribute over any number of report files.
  */
object Parsers {

  /** Sigma/Hayabusa-style level → severity normalization (F12,
    * reference /root/reference/src/audit/result_parser.py:158-183).
    */
  def levelToSeverity(level: Column): Column = {
    // trim as well as lowercase — the reference strips (result_parser
    // .py:171), and a padded CSV cell (' high') must not fall to info
    val l = lower(trim(level))
    when(l.isin("critical", "crit"), "critical")
      .when(l.isin("high"), "high")
      .when(l.isin("medium", "med"), "medium")
      .when(l.isin("low"), "low")
      .otherwise("info")
  }

  /** Column-name alias normalization (schema-on-read defense, e.g.
    * "RuleTitle" vs "rule_title" — hayabusa.py:103-107).
    */
  def coalesceCols(df: DataFrame, out: String, candidates: Seq[String]): DataFrame = {
    val present = candidates.filter(df.columns.contains)
    require(present.nonEmpty, s"none of $candidates present")
    df.withColumn(out, coalesce(present.map(col): _*))
  }

  /** Antivirus log parse (F16, clamscan shape): lines
    * `path: SignatureName FOUND` → one finding per hit
    * (result_parser.py:47-80). Input: spark.read.text lines.
    */
  def avLogFindings(lines: DataFrame): DataFrame =
    lines
      .filter(col("value").endsWith(" FOUND"))
      .select(
        // GREEDY first group: Windows paths contain colons ("C:\…"), and
        // the reference splits on the LAST colon (rsplit(":", 1))
        regexp_extract(col("value"), "^(.*): (.*) FOUND$", 1).as("resource"),
        regexp_extract(col("value"), "^(.*): (.*) FOUND$", 2).as("title"))
      .withColumn("severity", lit("critical"))
      .withColumn("domain", lit("malware"))

  /** Summary block of the same log: trailing `Key: value` lines →
    * one-row frame of metrics.
    */
  def avLogSummary(lines: DataFrame): DataFrame =
    lines
      // value must be a VALID double ("0.103.2" from 'Engine version'
      // matches [0-9.]+ but would be an ANSI cast error)
      .filter(col("value").rlike("^[A-Za-z ]+: \\d+(\\.\\d+)?([^0-9.]|$)"))
      .select(
        regexp_extract(col("value"), "^([A-Za-z ]+): ", 1).as("metric"),
        regexp_extract(col("value"), ": (\\d+(?:\\.\\d+)?)", 1).cast("double").as("value"))

  /** Numeric-guarded int parse: non-numeric → null instead of the ANSI
    * CAST_INVALID_INPUT error (Spark 4 default).
    */
  private def intOrNull(c: Column): Column =
    when(c.rlike("^\\d+$"), c.cast("int"))

  /** VirusTotal detection-ratio parse (F15, sigcheck shape):
    * `"5|72"` → positives/total + flag (sysinternals.py:78-100).
    * Non-ratio values the tools actually emit ("Unknown", "n/a", "")
    * parse to nulls/false — under ANSI a raw cast would kill the job
    * on the first such row.
    */
  def vtDetection(df: DataFrame, vtCol: String): DataFrame =
    df.withColumn("vt_positives",
        intOrNull(try_element_at(split(col(vtCol), "\\|"), lit(1))))
      .withColumn("vt_total",
        intOrNull(try_element_at(split(col(vtCol), "\\|"), lit(2))))
      .withColumn("vt_flagged", coalesce(col("vt_positives") > 0, lit(false)))

  /** WMI `/Date(1700000000000)/` millis-epoch extraction (F8/F6,
    * resource_analyzer.py:255-263). Non-matching values (CIM datetime
    * strings, garbage) yield null — regexp_extract returns "" on no
    * match and "".cast(long) is an ANSI error, so the extract is
    * rlike-guarded.
    */
  def wmiDate(c: Column): Column =
    when(c.rlike("/Date\\(\\d+\\)/"),
      timestamp_millis(regexp_extract(c, "/Date\\((\\d+)\\)/", 1).cast("long")))

  /** Integer state-code decode with Unknown(code) fallback (F14,
    * network_mapper.py:36-50, 106-110): non-integer inputs (already
    * decoded strings from some collectors) pass through unchanged,
    * matching the reference's isinstance(int) branch.
    */
  def decodeState(c: Column, mapping: Map[Int, String]): Column = {
    val m = typedlit(mapping.map { case (k, v) => k.toString -> v })
    val s = c.cast("string")
    when(s.rlike("^-?\\d+$"),
      coalesce(element_at(m, s), concat(lit("Unknown("), s, lit(")"))))
      .otherwise(s)
  }

  /** Stateful text parse (F17, ListDLLs shape): banner-delimited
    * sections where a header line names the process/pid and subsequent
    * lines list DLLs. Order-aware: runs per file (wholetext) and
    * propagates the current header with a running `last(...)` window
    * within the file — no cross-file state, so files parallelize.
    *
    * Input: spark.read.option("wholetext", true).text(dir) — one row
    * per file.
    */
  def sectionedReport(files: DataFrame, headerRe: String, itemRe: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = files
      .withColumn("file", input_file_name())
      .select(col("file"), posexplode(split(col("value"), "\n")).as(Seq("line_no", "line")))
    val tagged = lines
      .withColumn("header", when(col("line").rlike(headerRe), regexp_extract(col("line"), headerRe, 1)))
      .withColumn("item", when(col("line").rlike(itemRe), regexp_extract(col("line"), itemRe, 1)))
    val w = Window.partitionBy("file").orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("current_header", last(col("header"), ignoreNulls = true).over(w))
      .filter(col("item").isNotNull && col("current_header").isNotNull)
      .select(col("file"), col("current_header").as("header"), col("item"))
  }

  /** Anomaly-count rollup (A10, hollows_hunter shape): row-wise sum of
    * anomaly columns → suspicion score.
    */
  def suspicionScore(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("total_suspicious",
      cols.map(c => coalesce(col(c), lit(0L)).cast("long")).reduce(_ + _))

  /** Findings ready for report: parsed rows → Finding columns. */
  def asFindings(df: DataFrame, source: String, titleCol: String, resourceCol: String,
      severityCol: String, domain: String): DataFrame =
    df.select(
      col(titleCol).as("title"),
      col(titleCol).as("description"),
      lower(col(severityCol)).as("severity"),
      lit(domain).as("domain"),
      col(resourceCol).as("resource"),
      lit(source).as("source"),
      to_json(struct(df.columns.map(col): _*)).as("rawData"))
}
