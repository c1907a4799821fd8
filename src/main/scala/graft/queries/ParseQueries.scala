package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.ToolParsers

/** Oracle-gated coverage for the per-tool fixture parsers: both engines
  * read the SAME golden fixture files (captured third-party tool
  * outputs under src/test/resources/fixtures), so the DuckDB oracle
  * exercises the full parse → normalize → aggregate path
  * cross-engine. The `sfDir` argument is ignored — fixture location is
  * fixed (overridable via GRAFT_FIXTURES_DIR for non-standard layouts).
  */
object ParseQueries {

  /** Fixture root: env override first, then the checkout-relative path
    * (made absolute so the DuckDB oracle — which may run with a
    * different cwd — reads the same files), then the canonical layout.
    */
  private val fixturesDir: String =
    sys.env.get("GRAFT_FIXTURES_DIR")
      .orElse {
        val local = new java.io.File("src/test/resources/fixtures")
        if (local.isDirectory) Some(local.getAbsolutePath) else None
      }
      .getOrElse("/root/repo/src/test/resources/fixtures")

  /** Hayabusa timeline → per-severity finding counts (the reference's
    * daily severity rollup over hayabusa.py findings).
    */
  def p01HayabusaSeverity(s: SparkSession, dir: String): DataFrame =
    ToolParsers.hayabusa(
      s.read.option("header", "true").csv(s"$fixturesDir/hayabusa_output.csv"))
      .groupBy("severity")
      .agg(count(lit(1)).as("n"))
      .orderBy("severity")

  val p01Oracle: String =
    s"""WITH sev AS (
       |  SELECT CASE lower(trim(Level))
       |    WHEN 'critical' THEN 'critical' WHEN 'crit' THEN 'critical'
       |    WHEN 'high' THEN 'high'
       |    WHEN 'medium' THEN 'medium' WHEN 'med' THEN 'medium'
       |    WHEN 'low' THEN 'low' ELSE 'info' END AS severity
       |  FROM read_csv('$fixturesDir/hayabusa_output.csv', header=true)
       |)
       |SELECT severity, COUNT(*) AS n FROM sev
       |WHERE severity <> 'info'
       |GROUP BY severity ORDER BY severity""".stripMargin

  /** Autorunsc persistence findings: unsigned entries (high) plus
    * VirusTotal hits (critical), the two finding families of
    * sysinternals.py:45-102, as one ordered relation.
    */
  def p02AutorunscFindings(s: SparkSession, dir: String): DataFrame = {
    val rows = s.read.option("header", "true")
      .csv(s"$fixturesDir/autorunsc_output.csv")
    ToolParsers.autorunsc(rows)
      .select(
        col("title"), col("severity"), col("category"), col("target"))
      .orderBy("title")
  }

  val p02Oracle: String =
    s"""WITH r AS (
       |  SELECT * FROM read_csv('$fixturesDir/autorunsc_output.csv', header=true)
       |), unsigned AS (
       |  SELECT 'Autoruns: unsigned entry at ' || COALESCE(Entry, "Entry Location") AS title,
       |    'high' AS severity, 'persistence' AS category,
       |    COALESCE(CASE WHEN "Image Path" <> '' THEN "Image Path" END,
       |             COALESCE(Entry, "Entry Location")) AS target
       |  FROM r WHERE lower(COALESCE(Verified, '')) LIKE '%not verified%'
       |), vt AS (
       |  SELECT 'Autoruns: VT hit on ' || COALESCE(Entry, "Entry Location") AS title,
       |    'critical' AS severity, 'persistence' AS category,
       |    COALESCE(CASE WHEN "Image Path" <> '' THEN "Image Path" END,
       |             COALESCE(Entry, "Entry Location")) AS target
       |  FROM r
       |  WHERE COALESCE("VT detection", '') NOT IN ('', '0|0', 'Unknown')
       |    AND COALESCE(TRY_CAST(split_part("VT detection", '|', 1) AS INT), 0) > 0
       |)
       |SELECT * FROM (SELECT * FROM unsigned UNION ALL SELECT * FROM vt)
       |ORDER BY title""".stripMargin

  /** TCP connection snapshot → state × external-classification rollup:
    * exercises the MIB_TCP_STATE decode (F14) and the RFC1918/v6
    * internal/external rules (P7) cross-engine on collector JSON.
    */
  def p03TcpStates(s: SparkSession, dir: String): DataFrame =
    ToolParsers.tcpConnections(
      s.read.schema(ToolParsers.tcpConnectionSchema)
        .option("multiLine", "true")
        .json(s"$fixturesDir/tcp_connection_output.json"))
      .groupBy("state", "is_outbound_external")
      .agg(count(lit(1)).as("n"))
      .orderBy("state", "is_outbound_external")

  val p03Oracle: String =
    s"""WITH c AS (
       |  SELECT * FROM read_json('$fixturesDir/tcp_connection_output.json')
       |), norm AS (
       |  SELECT
       |    CASE CAST(COALESCE(State, 0) AS INT)
       |      WHEN 1 THEN 'Closed' WHEN 2 THEN 'Listen' WHEN 3 THEN 'SynSent'
       |      WHEN 4 THEN 'SynReceived' WHEN 5 THEN 'Established'
       |      WHEN 6 THEN 'FinWait1' WHEN 7 THEN 'FinWait2' WHEN 8 THEN 'CloseWait'
       |      WHEN 9 THEN 'Closing' WHEN 10 THEN 'LastAck' WHEN 11 THEN 'TimeWait'
       |      WHEN 12 THEN 'DeleteTCB' WHEN 100 THEN 'Bound'
       |      ELSE 'Unknown(' || CAST(COALESCE(State, 0) AS VARCHAR) || ')' END AS state,
       |    CASE
       |      WHEN COALESCE(RemoteAddress, '') = '' THEN false
       |      WHEN contains(RemoteAddress, ':') THEN
       |        NOT (RemoteAddress IN ('::', '::1')
       |             OR lower(RemoteAddress) LIKE 'fe80%'
       |             OR lower(RemoteAddress) LIKE 'fc%'
       |             OR lower(RemoteAddress) LIKE 'fd%')
       |      ELSE NOT (
       |        TRY_CAST(split_part(RemoteAddress, '.', 1) AS INT) IN (0, 10, 127)
       |        OR (TRY_CAST(split_part(RemoteAddress, '.', 1) AS INT) = 172
       |            AND TRY_CAST(split_part(RemoteAddress, '.', 2) AS INT) BETWEEN 16 AND 31)
       |        OR (TRY_CAST(split_part(RemoteAddress, '.', 1) AS INT) = 192
       |            AND TRY_CAST(split_part(RemoteAddress, '.', 2) AS INT) = 168)
       |        OR (TRY_CAST(split_part(RemoteAddress, '.', 1) AS INT) = 169
       |            AND TRY_CAST(split_part(RemoteAddress, '.', 2) AS INT) = 254))
       |    END AS is_outbound_external
       |  FROM c
       |)
       |SELECT state, is_outbound_external, COUNT(*) AS n
       |FROM norm GROUP BY state, is_outbound_external
       |ORDER BY state, is_outbound_external""".stripMargin

  /** Sigcheck unsigned-binary findings as an ordered relation —
    * cross-engine check of the CSV parse + Windows basename extraction.
    */
  def p04SigcheckUnsigned(s: SparkSession, dir: String): DataFrame =
    ToolParsers.sigcheck(
      s.read.option("header", "true").csv(s"$fixturesDir/sigcheck_output.csv"))
      .select("title", "severity", "category", "target")
      .orderBy("target")

  val p04Oracle: String =
    s"""SELECT 'Sigcheck: unsigned binary ' || string_split(Path, '\\')[-1] AS title,
       |  'medium' AS severity, 'unsigned_binary' AS category, Path AS target
       |FROM read_csv('$fixturesDir/sigcheck_output.csv', header=true)
       |WHERE lower(COALESCE(Verified, '')) = 'unsigned'
       |ORDER BY target""".stripMargin

  /** Run-key classification for EVERY entry (not only findings):
    * quoted/unquoted executable extraction + the lenient
    * standard-location rule, differentially checked cross-engine.
    */
  def p05RunKeys(s: SparkSession, dir: String): DataFrame = {
    val keys = ToolParsers.runKeys(
      s.read.option("multiLine", "true").json(s"$fixturesDir/run_keys_output.json"))
    val exe = ToolParsers.runKeyExePath(col("value"))
    keys.select(
      col("name"),
      col("registry_path"),
      exe.as("exe_path"),
      (!ToolParsers.isStandardOrUserPath(exe)).as("suspicious"))
      .orderBy("name")
  }

  val p05Oracle: String =
    s"""WITH k AS (
       |  SELECT * FROM read_json('$fixturesDir/run_keys_output.json')
       |), e AS (
       |  SELECT Name AS name, RegistryPath AS registry_path,
       |    CASE WHEN regexp_matches(trim(Value), '^"[^"]*"')
       |         THEN regexp_extract(trim(Value), '^"([^"]*)"', 1)
       |         ELSE string_split_regex(trim(Value), '\\s+')[1] END AS exe_path
       |  FROM k
       |), n AS (
       |  SELECT name, registry_path, exe_path,
       |    replace(trim(lower(trim(exe_path)), '"'), '/', '\\') AS np
       |  FROM e
       |)
       |SELECT name, registry_path, exe_path,
       |  NOT (starts_with(np, 'c:\\windows\\') OR starts_with(np, 'c:\\program files\\')
       |    OR starts_with(np, 'c:\\program files (x86)\\') OR starts_with(np, 'c:\\programdata\\')
       |    OR starts_with(np, 'c:\\users\\')) AS suspicious
       |FROM n ORDER BY name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_hayabusa_severity" -> (p01HayabusaSeverity _),
    "p02_autorunsc_findings" -> (p02AutorunscFindings _),
    "p03_tcp_states" -> (p03TcpStates _),
    "p04_sigcheck_unsigned" -> (p04SigcheckUnsigned _),
    "p05_run_keys" -> (p05RunKeys _)
  )

  val oracles: Map[String, String] = Map(
    "p01_hayabusa_severity" -> p01Oracle,
    "p02_autorunsc_findings" -> p02Oracle,
    "p03_tcp_states" -> p03Oracle,
    "p04_sigcheck_unsigned" -> p04Oracle,
    "p05_run_keys" -> p05Oracle
  )
}
