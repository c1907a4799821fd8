package graft.parse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Ip

/** Per-tool output parsers for the reference's 13 golden fixtures
  * (S13/S14, reference `tests/audit/fixtures/` directory).
  *
  * Each parser is a pure DataFrame transform from a tool's raw output
  * (CSV rows, JSON documents, log lines) to the normalized finding
  * shape `(tool_name, severity, category, title, description, target,
  * mitre)` — so one job can fan out over thousands of collected report
  * files; nothing here touches the driver.
  *
  * Semantics re-expressed from:
  *   - result_parser.py:47-183 (clamscan, hollows_hunter, level maps)
  *   - scanners/hayabusa.py:88-124, chainsaw.py:98-144
  *   - scanners/sysinternals.py:45-241 (autorunsc, sigcheck, listdlls)
  *   - scanners/yara_scanner.py:102-179
  *   - collectors/{network_mapper,process_snapshot,service_auditor,
  *     persistence_auditor}.py
  */
object ToolParsers {

  // ---------------------------------------------------------------- utils

  private def findingCols(
      tool: String, category: String,
      severity: Column, title: Column, description: Column,
      target: Column, mitre: Column = lit(null).cast("string")): Seq[Column] =
    Seq(
      lit(tool).as("tool_name"),
      severity.as("severity"),
      lit(category).as("category"),
      title.as("title"),
      description.as("description"),
      target.as("target"),
      mitre.as("mitre"))

  /** Windows basename: last backslash-separated component. */
  private def winBasename(c: Column): Column =
    element_at(split(c, "\\\\"), -1)

  /** Lowercased, quote-stripped, forward-slash-normalized path for
    * prefix checks (service_auditor.py:255-267).
    */
  private def normPath(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "^\"+|\"+$", ""), "/", "\\\\")

  private val standardPrefixes = Seq(
    "c:\\windows\\", "c:\\program files\\",
    "c:\\program files (x86)\\", "c:\\programdata\\")

  private def startsWithAny(c: Column, prefixes: Seq[String]): Column =
    prefixes.map(p => c.startsWith(p)).reduce(_ || _)

  /** True when a path is outside the standard Windows locations. */
  def isNonStandardPath(c: Column): Column =
    !startsWithAny(normPath(c), standardPrefixes)

  /** Lenient variant for run keys: user-profile paths (C:\Users\…) also
    * count as standard — common for legitimate auto-start apps
    * (persistence_auditor.py:268-288).
    */
  def isStandardOrUserPath(c: Column): Column =
    startsWithAny(normPath(c), standardPrefixes :+ "c:\\users\\")

  /** Tool category → the engine's Finding domain taxonomy
    * (analyze.Finding: process | network | persistence | malware |
    * filesystem | system).
    */
  val categoryDomain: Map[String, String] = Map(
    "event_log_alert" -> "system",
    "persistence" -> "persistence",
    "unsigned_binary" -> "filesystem",
    "unsigned_dll" -> "process",
    "malware_signature" -> "malware",
    "suspicious_pattern" -> "malware",
    "memory_anomaly" -> "process",
    "unsigned_process" -> "process",
    "non_standard_path" -> "process",
    "many_external_connections" -> "network",
    "suspicious_listener" -> "network",
    "unquoted_service_path" -> "system",
    "system_service_non_standard" -> "system",
    "elevated_scheduled_task" -> "persistence",
    "suspicious_task_path" -> "persistence",
    "suspicious_run_key" -> "persistence")

  /** Adapt any parser's finding frame to the engine's normalized
    * `analyze.Finding` shape, so findings from every tool combine into
    * one report (`Findings.combine` → severity/domain rollups →
    * `HtmlReport`).
    */
  def toFindings(df: DataFrame): DataFrame =
    df.select(
      col("title"),
      col("description"),
      col("severity"),
      coalesce(
        element_at(typedlit(categoryDomain), col("category")),
        lit("system")).as("domain"),
      col("target").as("resource"),
      col("tool_name").as("source"),
      to_json(struct(df.columns.map(col): _*)).as("rawData"))

  // ------------------------------------------------------- event-log tools

  /** Hayabusa CSV timeline → findings (hayabusa.py:88-124): level →
    * severity (with crit/med aliases), info rows dropped, one finding
    * per alert row.
    *
    * Input: `spark.read.option("header", true).csv(...)` of the
    * timeline (columns Timestamp, Computer, Channel, EventID, Level,
    * RecordID, RuleTitle, Details, ExtraFieldInfo, RuleFile).
    */
  def hayabusa(rows: DataFrame, includeInfo: Boolean = false): DataFrame = {
    val aliased = Parsers.coalesceCols(
      Parsers.coalesceCols(rows, "__level", Seq("Level", "level")),
      "__title", Seq("RuleTitle", "rule_title"))
    val sev = Parsers.levelToSeverity(col("__level"))
    // every raw field coalesces to "" — a missing CSV cell OR a whole
    // column absent from this profile's timeline must not null/fail the
    // finding (reference row.get(..., "") semantics)
    def f(name: String): Column =
      if (aliased.columns.contains(name)) coalesce(col(name), lit("")) else lit("")
    aliased
      .filter(if (includeInfo) lit(true) else sev =!= "info")
      .select(findingCols(
        tool = "hayabusa", category = "event_log_alert",
        severity = sev,
        title = concat(lit("Hayabusa: "), coalesce(col("__title"), lit("Unknown rule"))),
        description = concat(
          lit("["), f("__level"), lit("] "),
          coalesce(col("__title"), lit("Unknown rule")),
          lit(" on "), f("Computer"),
          lit(" (Channel: "), f("Channel"), lit(") — "), f("Details")),
        target = concat(f("Computer"), lit(":"), f("Channel"))): _*)
  }

  /** Chainsaw JSON detections → findings (chainsaw.py:110-144): sigma
    * level → severity (default medium when absent), info dropped.
    *
    * Input: `spark.read.option("multiLine", true).json(...)` of the
    * detection array.
    */
  def chainsaw(rows: DataFrame): DataFrame = {
    // reference fallbacks: name → title → "Unknown detection";
    // level → severity → "medium" (chainsaw.py:114-115) — only
    // reference columns that exist in this frame's schema
    def opt(name: String): Seq[Column] =
      if (rows.columns.contains(name)) Seq(col(name)) else Seq.empty
    val name = coalesce((opt("name") ++ opt("title") :+ lit("Unknown detection")): _*)
    val lvl = coalesce((opt("level") ++ opt("severity") :+ lit("medium")): _*)
    val sev = Parsers.levelToSeverity(lvl)
    val src = coalesce((opt("source") :+ lit("")): _*)
    val ts = coalesce((opt("timestamp") :+ lit("")): _*)
    rows
      .filter(sev =!= "info")
      .select(findingCols(
        tool = "chainsaw", category = "event_log_alert",
        severity = sev,
        title = concat(lit("Chainsaw: "), name),
        description = concat_ws(" ",
          name,
          when(ts =!= "", concat(lit("at "), ts)),
          when(src =!= "", concat(lit("in "), src))),
        target = src): _*)
  }

  /** Chainsaw wrapper-object form (chainsaw.py:98-108): some runs emit
    * `{"detections": [...]}` (or `{"hits": [...]}`) instead of a bare
    * array. Input: `spark.read.option("multiLine", true).json(...)` of
    * the wrapper; detections explode to the same findings as
    * [[chainsaw]].
    */
  def chainsawWrapped(doc: DataFrame): DataFrame = {
    val arr =
      if (doc.columns.contains("detections")) col("detections")
      else if (doc.columns.contains("hits")) col("hits")
      else throw new IllegalArgumentException(
        "chainsawWrapped expects a 'detections' or 'hits' array; " +
          "use chainsaw() for bare detection arrays")
    chainsaw(doc.select(explode(arr).as("d")).select("d.*"))
  }

  // ------------------------------------------------------- sysinternals

  /** Autorunsc CSV → findings (sysinternals.py:45-102): one HIGH per
    * not-verified entry, one CRITICAL per entry with VT positives > 0.
    */
  def autorunsc(rows: DataFrame): DataFrame = {
    val entry = coalesce(col("Entry"), col("`Entry Location`"))
    val target = coalesce(
      when(col("`Image Path`") =!= "", col("`Image Path`")), entry)
    val unsigned = rows
      .filter(lower(coalesce(col("Verified"), lit(""))).contains("not verified"))
      .select(findingCols(
        tool = "autorunsc", category = "persistence",
        severity = lit("high"),
        title = concat(lit("Autoruns: unsigned entry at "), entry),
        description = concat(
          lit("Unsigned autostart entry: "), entry,
          lit(". Image: "), coalesce(col("`Image Path`"), lit("")),
          lit(". Launch: "), coalesce(col("`Launch String`"), lit(""))),
        target = target,
        mitre = lit("T1547")): _*)
    // rlike-guarded cast: autoruns emits 'n/a'/'Unknown' in the VT
    // column for unscanned files, and an unguarded cast is an ANSI
    // error — Catalyst also does not guarantee And short-circuit order,
    // so the guard must be inside the expression, not beside it
    val vtRaw = try_element_at(split(col("`VT detection`"), "\\|"), lit(1))
    val vtPos = when(vtRaw.rlike("^\\d+$"), vtRaw.cast("int"))
    val vtHits = rows
      .filter(
        !coalesce(col("`VT detection`"), lit("")).isin("", "0|0", "Unknown") &&
          coalesce(vtPos, lit(0)) > 0)
      .select(findingCols(
        tool = "autorunsc", category = "persistence",
        severity = lit("critical"),
        title = concat(lit("Autoruns: VT hit on "), entry),
        description = concat(
          lit("VirusTotal detection "), col("`VT detection`"),
          lit(" for autostart entry: "), entry,
          lit(". Image: "), coalesce(col("`Image Path`"), lit(""))),
        target = target,
        mitre = lit("T1547")): _*)
    unsigned.unionByName(vtHits)
  }

  /** Sigcheck CSV → findings (sysinternals.py:139-168): MEDIUM per
    * row with Verified == Unsigned.
    */
  def sigcheck(rows: DataFrame): DataFrame =
    rows
      // trim: padded CSV cells (' Unsigned') must not silently drop a
      // detection
      .filter(lower(trim(coalesce(col("Verified"), lit("")))) === "unsigned")
      .select(findingCols(
        tool = "sigcheck", category = "unsigned_binary",
        severity = lit("medium"),
        title = concat(lit("Sigcheck: unsigned binary "), winBasename(col("Path"))),
        description = concat(
          lit("Unsigned executable found: "), col("Path"),
          lit(". Publisher: "),
          when(coalesce(col("Publisher"), lit("")) === "", lit("unknown"))
            .otherwise(col("Publisher"))),
        target = col("Path")): _*)

  /** ListDLLs sectioned text → findings (sysinternals.py:187-241):
    * MEDIUM per DLL line, attributed to the enclosing process header.
    * Keeps `process`/`pid` columns for attribution (reference stores
    * them in raw_data).
    *
    * Input: `spark.read.option("wholetext", true).text(...)` — one row
    * per report file; section state never crosses files.
    */
  def listdlls(files: DataFrame): DataFrame = {
    // item rule mirrors the reference: line starts with 0x and has ≥ 4
    // whitespace fields (sysinternals.py:216-219) — only the FIRST
    // field is required to be hex
    val sections = Parsers.sectionedReport(
      files,
      headerRe = "^\\s*(\\S.* pid: .*)$",
      itemRe = "^\\s*(0x\\S+\\s+\\S+\\s+\\S+\\s+.*)$")
    sections
      .select(
        trim(regexp_extract(col("header"), "^(.*) pid: .*$", 1)).as("process"),
        trim(regexp_extract(col("header"), "^.* pid: (.*)$", 1)).as("pid"),
        // length = size(parts), NOT Int.MaxValue: interpreted Slice
        // computes start+length with raw int add, and 3 + MaxValue
        // wraps negative → empty result outside codegen
        {
          val parts = split(trim(col("item")), "\\s+")
          array_join(slice(parts, lit(4), size(parts)), " ").as("dll_path")
        })
      .select((findingCols(
        tool = "listdlls", category = "unsigned_dll",
        severity = lit("medium"),
        title = concat(lit("ListDLLs: unsigned DLL in "), col("process")),
        description = concat(
          lit("Unsigned DLL loaded into "), col("process"),
          lit(" (PID "), col("pid"), lit("): "), col("dll_path")),
        target = col("dll_path"),
        mitre = lit("T1055.001")) ++ Seq(col("process"), col("pid"))): _*)
  }

  // ------------------------------------------------------------ malware

  /** ClamAV scan log → findings (clamav.py:62-85 + result_parser.py:
    * 47-80): HIGH per `path: Signature FOUND` line. The first regex
    * group is GREEDY — detection paths are Windows paths containing
    * colons, and the reference splits on the LAST colon.
    *
    * Input: `spark.read.text(...)` lines.
    */
  def clamav(lines: DataFrame): DataFrame =
    lines
      .filter(trim(col("value")).endsWith("FOUND"))
      .select(
        trim(regexp_extract(trim(col("value")), "^(.*): (.*) FOUND$", 1)).as("file"),
        regexp_extract(trim(col("value")), "^(.*): (.*) FOUND$", 2).as("malware"))
      .select(findingCols(
        tool = "clamav", category = "malware_signature",
        severity = lit("high"),
        title = concat(lit("ClamAV: "), col("malware")),
        description = concat(
          lit("ClamAV detected known malware signature '"), col("malware"),
          lit("' in file: "), col("file")),
        target = col("file")): _*)

  /** ClamAV summary block → (metric, value) string pairs: only lines
    * AFTER the `----------- SCAN SUMMARY -----------` marker count
    * (result_parser.py:71-78). Values stay strings — the summary mixes
    * counts, versions and timestamps.
    *
    * Input: `spark.read.option("wholetext", true).text(...)`.
    */
  def clamavSummary(files: DataFrame): DataFrame =
    Parsers.sectionedReport(
      files,
      headerRe = "^(-+ SCAN SUMMARY -+)$",
      itemRe = "^([A-Za-z][A-Za-z ]*: .+)$")
      .select(
        trim(regexp_extract(col("item"), "^([^:]+):", 1)).as("metric"),
        trim(regexp_extract(col("item"), "^[^:]+:(.*)$", 1)).as("value"))

  /** YARA-X JSON → findings (yara_scanner.py:102-141): severity from
    * rule metadata (default HIGH), CRITICAL/… when declared.
    *
    * Input: `spark.read.option("multiLine", true).json(...)` of the
    * `{"version": …, "matches": [...]}` object.
    */
  def yara(doc: DataFrame): DataFrame = {
    val m = doc.select(explode(col("matches")).as("m")).select("m.*")
    // metadata is optional per rule AND per file — a corpus where no
    // match carries metadata infers no such column at all
    def meta(field: String): Column = m.schema.find(_.name == "metadata") match {
      case Some(f) if f.dataType.isInstanceOf[StructType] &&
          f.dataType.asInstanceOf[StructType].fieldNames.contains(field) =>
        col(s"metadata.$field")
      case _ => lit(null).cast("string")
    }
    val declared = lower(meta("severity"))
    val sev = when(declared.isin("critical", "high", "medium", "low", "info"), declared)
      .otherwise(lit("high"))
    m.select(findingCols(
      tool = "yara_x", category = "suspicious_pattern",
      severity = sev,
      title = concat(lit("YARA: "), col("rule")),
      description = concat(
        coalesce(meta("description"),
          concat(lit("YARA rule '"), col("rule"), lit("' matched"))),
        lit(" — matched in "), coalesce(col("file"), lit("unknown"))),
      target = coalesce(col("file"), lit("unknown")),
      mitre = meta("mitre_attack")): _*)
  }

  // ------------------------------------------------------ hollows hunter

  /** Anomaly type → (severity, mitre) from hollows_hunter.py:19-55. */
  val hollowsAnomalies: Seq[(String, String, String, String)] = Seq(
    ("replaced", "critical", "T1055.012", "Process hollowing — entire module replaced in memory"),
    ("implanted", "critical", "T1055", "Code injection — foreign code implanted into process"),
    ("hdr_modified", "high", "T1055", "PE header modification — headers tampered in memory"),
    ("patched", "medium", "T1574", "Inline patching — code bytes modified (possible hook)"),
    ("iat_hooked", "high", "T1574", "IAT hooking — import address table entries redirected"),
    ("unreachable_file", "medium", null, "Unreachable file — module on disk cannot be accessed"),
    ("other", "low", null, "Other anomaly detected"))

  private val hollowsProcDdl =
    "map<string, struct<name:string, replaced:long, implanted:long, hdr_modified:long, " +
      "patched:long, iat_hooked:long, unreachable_file:long, other:long>>"

  /** HollowsHunter scan_report.json → one row per scanned process with
    * anomaly counts and `total_suspicious`, keeping only suspicious
    * processes (result_parser.py:83-127).
    *
    * Input: `spark.read.option("wholetext", true).text(...)` — report
    * files are single JSON objects whose `scanned` field is a
    * pid-keyed map (dynamic keys → `from_json` to a map type, not
    * schema inference).
    */
  def hollowsHunterProcesses(files: DataFrame): DataFrame = {
    val counts = hollowsAnomalies.map(_._1)
    files
      .select(from_json(get_json_object(col("value"), "$.scanned"),
        DataType.fromDDL(hollowsProcDdl)).as("scanned"))
      .select(explode(col("scanned")).as(Seq("pid", "p")))
      .select((col("pid") +: coalesce(col("p.name"), lit("unknown")).as("name") +:
        counts.map(c => coalesce(col(s"p.$c"), lit(0L)).as(c))): _*)
      .withColumn("total_suspicious", counts.map(col).reduce(_ + _))
      .filter(col("total_suspicious") > 0)
  }

  /** Per-process subdirectory reports (result_parser.py:129-154):
    * HollowsHunter also writes `<pid>/scan_report.json` per scanned
    * process with top-level anomaly counts and `main_image_path`. The
    * pid comes from the enclosing directory name; only suspicious
    * processes (count sum > 0) survive, with the reference's 4-count
    * total.
    *
    * Input: `spark.read.option("wholetext", true)
    * .text("reports/&#42;/scan_report.json")`.
    */
  def hollowsHunterPerProcess(files: DataFrame): DataFrame = {
    val counts = Seq("replaced", "implanted", "hdr_modified", "patched")
    val ddl = "struct<main_image_path:string, replaced:long, implanted:long, " +
      "hdr_modified:long, patched:long>"
    files
      .withColumn("pid", element_at(split(input_file_name(), "/"), -2))
      .filter(col("pid").rlike("^[0-9]+$")) // only numeric per-pid dirs
      .select(col("pid"), from_json(col("value"), DataType.fromDDL(ddl)).as("r"))
      .select((col("pid") +:
        coalesce(col("r.main_image_path"), lit("unknown")).as("name") +:
        counts.map(c => coalesce(col(s"r.$c"), lit(0L)).as(c))): _*)
      .withColumn("total_suspicious", counts.map(col).reduce(_ + _))
      .filter(col("total_suspicious") > 0)
  }

  /** Per-anomaly findings from [[hollowsHunterProcesses]]
    * (hollows_hunter.py:101-130): one finding per anomaly type with a
    * non-zero count, severity/mitre per type.
    */
  def hollowsHunter(files: DataFrame): DataFrame = {
    // single pass: unpivot the 7 anomaly counts via one explode of
    // literal-tagged structs — a 7-way union of filter branches would
    // re-read and re-parse every report file once per anomaly type
    val anomalyStructs = hollowsAnomalies.map { case (atype, sev, mitre, desc) =>
      struct(
        lit(atype).as("atype"), col(atype).as("cnt"), lit(sev).as("sev"),
        lit(mitre).cast("string").as("mitre"), lit(desc).as("adesc"))
    }
    hollowsHunterProcesses(files)
      .select(col("pid"), col("name"), explode(array(anomalyStructs: _*)).as("a"))
      .filter(col("a.cnt") > 0)
      .select(findingCols(
        tool = "hollows_hunter", category = "memory_anomaly",
        severity = col("a.sev"),
        title = concat(
          lit("HollowsHunter: "), col("a.atype"), lit(" in "), col("name"),
          lit(" (PID "), col("pid"), lit(")")),
        description = concat(
          col("a.adesc"), lit(". Found "), col("a.cnt"),
          lit(" "), col("a.atype"), lit(" "),
          when(col("a.cnt") > 1, lit("anomalies")).otherwise(lit("anomaly")),
          lit(" in process "), col("name"),
          lit(" (PID "), col("pid"), lit(").")),
        target = concat(lit("PID:"), col("pid")),
        mitre = col("a.mitre")): _*)
  }

  // -------------------------------------------------- collector snapshots

  /** Windows MIB_TCP_STATE codes (network_mapper.py:36-50). */
  val tcpStateMap: Map[Int, String] = Map(
    1 -> "Closed", 2 -> "Listen", 3 -> "SynSent", 4 -> "SynReceived",
    5 -> "Established", 6 -> "FinWait1", 7 -> "FinWait2", 8 -> "CloseWait",
    9 -> "Closing", 10 -> "LastAck", 11 -> "TimeWait", 12 -> "DeleteTCB",
    100 -> "Bound")

  val tcpConnectionSchema: StructType = StructType(Seq(
    StructField("LocalAddress", StringType),
    StructField("LocalPort", LongType),
    StructField("RemoteAddress", StringType),
    StructField("RemotePort", LongType),
    StructField("State", LongType),
    StructField("OwningProcess", LongType),
    StructField("ProcessName", StringType)))

  /** Get-NetTCPConnection JSON → normalized connection rows
    * (network_mapper.py:102-129): integer state decoded with
    * Unknown(code) fallback, external classification per the
    * reference's RFC1918/loopback/link-local/v6 rules (empty/null
    * remote ⇒ internal).
    */
  def tcpConnections(rows: DataFrame): DataFrame =
    rows.select(
      coalesce(col("LocalAddress"), lit("")).as("local_address"),
      coalesce(col("LocalPort"), lit(0L)).as("local_port"),
      col("RemoteAddress").as("remote_address"),
      col("RemotePort").as("remote_port"),
      // missing State defaults to 0 like the reference's entry.get("State", 0)
      // (string-typed coalesce: a pre-decoded string state must not be
      // ANSI-cast to BIGINT)
      Parsers.decodeState(coalesce(col("State").cast("string"), lit("0")), tcpStateMap).as("state"),
      coalesce(col("OwningProcess"), lit(0L)).as("pid"),
      col("ProcessName").as("process_name"),
      when(coalesce(col("RemoteAddress"), lit("")) === "", lit(false))
        .otherwise(Ip.isExternal(col("RemoteAddress")))
        .as("is_outbound_external"))

  /** Well-known service ports excluded from the suspicious-listener
    * flag (network_mapper.py:255-262) — the ONE owner of this list;
    * NetworkAnalyzer delegates here.
    */
  val commonListenPorts: Seq[Int] = Seq(
    80, 443, 445, 135, 139, 993, 995, 587, 25, 3389, 5985, 5986,
    1433, 3306, 5432, 8080, 8443)

  /** Network findings (network_mapper.py:131-184): MEDIUM per process
    * with ≥ `manyThreshold` established external connections, LOW per
    * wildcard listener on an uncommon port ≥ 1024.
    */
  def networkFindings(conns: DataFrame, manyThreshold: Int = 10): DataFrame = {
    val many = conns
      .filter(col("is_outbound_external") && col("state") === "Established")
      .groupBy("pid")
      .agg(
        count(lit(1)).as("conn_count"),
        // max, not first(): first() is partition-order dependent; pid →
        // name is functionally dependent in real snapshots, and max
        // keeps the output deterministic even when it is not
        max(col("process_name")).as("process_name"),
        size(collect_set(col("remote_address"))).as("addr_count"))
      .filter(col("conn_count") >= manyThreshold)
      .select(findingCols(
        tool = "network_mapper", category = "many_external_connections",
        severity = lit("medium"),
        title = concat(lit("Many external connections: "),
          coalesce(col("process_name"), concat(lit("PID "), col("pid")))),
        description = concat(
          lit("Process "), coalesce(col("process_name"), concat(lit("PID "), col("pid"))),
          lit(" (PID "), col("pid"), lit(") has "), col("conn_count"),
          lit(" established external connections to "), col("addr_count"),
          lit(" unique addresses.")),
        target = coalesce(col("process_name"), concat(lit("PID "), col("pid")))): _*)
    val listeners = conns
      .filter(
        col("state") === "Listen" &&
          col("local_address").isin("0.0.0.0", "::", "[::]") &&
          !col("local_port").isin(commonListenPorts.map(_.toLong): _*) &&
          col("local_port") >= 1024)
      .select(findingCols(
        tool = "network_mapper", category = "suspicious_listener",
        severity = lit("low"),
        title = concat(
          lit("Unusual listener: "),
          coalesce(col("process_name"), concat(lit("PID "), col("pid"))),
          lit(" on port "), col("local_port")),
        description = concat(
          lit("Process "), coalesce(col("process_name"), concat(lit("PID "), col("pid"))),
          lit(" (PID "), col("pid"), lit(") is listening on "),
          col("local_address"), lit(":"), col("local_port"), lit(".")),
        target = concat(col("local_address"), lit(":"), col("local_port"))): _*)
    many.unionByName(listeners)
  }

  val win32ProcessSchema: StructType = StructType(Seq(
    StructField("ProcessId", LongType),
    StructField("Name", StringType),
    StructField("ExecutablePath", StringType),
    StructField("CommandLine", StringType),
    StructField("ParentProcessId", LongType),
    StructField("ThreadCount", LongType),
    StructField("HandleCount", LongType),
    StructField("WorkingSetSize", LongType),
    StructField("CreationDate", StringType),
    StructField("OwnerDomain", StringType),
    StructField("OwnerUser", StringType)))

  /** Win32_Process JSON → normalized process rows
    * (process_snapshot.py:159-186): RAM in MB rounded to 2 places,
    * WMI /Date(ms)/ creation time, DOMAIN\user when owner known.
    */
  def processes(rows: DataFrame): DataFrame = {
    // owner columns are optional INDEPENDENTLY: a dump can carry
    // OwnerUser without OwnerDomain (the reference reads each per-row)
    val ownerUser =
      if (rows.columns.contains("OwnerUser")) col("OwnerUser")
      else lit(null).cast("string")
    val ownerDomain =
      if (rows.columns.contains("OwnerDomain")) col("OwnerDomain")
      else lit(null).cast("string")
    val user = when(ownerUser.isNotNull,
      when(ownerDomain.isNotNull, concat(ownerDomain, lit("\\"), ownerUser))
        .otherwise(ownerUser))
    rows.select(
      coalesce(col("ProcessId"), lit(0L)).as("pid"),
      coalesce(col("Name"), lit("")).as("name"),
      col("ExecutablePath").as("path"),
      col("CommandLine").as("command_line"),
      col("ParentProcessId").as("parent_pid"),
      user.as("user"),
      coalesce(col("ThreadCount"), lit(0L)).as("thread_count"),
      coalesce(col("HandleCount"), lit(0L)).as("handle_count"),
      round(coalesce(col("WorkingSetSize"), lit(0L)) / (1024.0 * 1024.0), 2).as("ram_mb"),
      Parsers.wmiDate(col("CreationDate")).as("created_at"))
  }

  /** Process findings (process_snapshot.py:215-255): system pids (≤ 4)
    * and pathless rows skipped; MEDIUM when signature-checked unsigned
    * (`is_signed` column present and false), LOW when running from a
    * non-standard location.
    */
  def processFindings(procs: DataFrame): DataFrame = {
    val eligible = procs.filter(col("pid") > 4 && col("path").isNotNull)
    val signedCol = if (procs.columns.contains("is_signed")) col("is_signed")
      else lit(null).cast("boolean")
    val unsigned = eligible
      .filter(signedCol === false)
      .select(findingCols(
        tool = "process_snapshot", category = "unsigned_process",
        severity = lit("medium"),
        title = concat(lit("Unsigned process: "), col("name")),
        description = concat(
          lit("Process "), col("name"), lit(" (PID "), col("pid"),
          lit(") is not digitally signed. Path: "), col("path")),
        target = col("path")): _*)
    val nonStandard = eligible
      .filter(isNonStandardPath(col("path")))
      .select(findingCols(
        tool = "process_snapshot", category = "non_standard_path",
        severity = lit("low"),
        title = concat(lit("Non-standard path: "), col("name")),
        description = concat(
          lit("Process "), col("name"), lit(" (PID "), col("pid"),
          lit(") is running from a non-standard location: "), col("path")),
        target = col("path")): _*)
    unsigned.unionByName(nonStandard)
  }

  /** Unquoted-service-path predicate (service_auditor.py:228-253): the
    * executable segment (arguments split off at ` -`/` /`) contains a
    * space and the path is not quoted.
    */
  def hasUnquotedPath(path: Column): Column = {
    val p = trim(path)
    val exe = trim(split(split(p, "\\s+-").getItem(0), "\\s+/").getItem(0))
    p =!= "" && !p.startsWith("\"") && exe.contains(" ")
  }

  private def isSystemAccount(account: Column): Column = {
    val a = lower(coalesce(account, lit("")))
    a.contains("localsystem") || a.contains("local system") ||
      a.contains("nt authority\\system")
  }

  /** Win32_Service JSON → normalized service rows with unquoted-path
    * and non-standard-location flags (service_auditor.py:97-118).
    */
  def services(rows: DataFrame): DataFrame =
    rows.select(
      coalesce(col("Name"), lit("")).as("name"),
      coalesce(col("DisplayName"), lit("")).as("display_name"),
      coalesce(col("State"), lit("Unknown")).as("state"),
      coalesce(col("StartMode"), lit("Unknown")).as("start_mode"),
      when(coalesce(col("PathName"), lit("")) === "", lit(null).cast("string"))
        .otherwise(col("PathName")).as("binary_path"),
      coalesce(col("StartName"), lit("")).as("account"),
      col("Description").as("description"),
      hasUnquotedPath(coalesce(col("PathName"), lit(""))).as("unquoted_path"),
      (coalesce(col("PathName"), lit("")) =!= "" &&
        isNonStandardPath(col("PathName"))).as("non_standard_binary_location"))

  /** Service findings (service_auditor.py:182-226): HIGH per unquoted
    * path (T1574.009), MEDIUM per running SYSTEM service in a
    * non-standard location.
    */
  def serviceFindings(svcs: DataFrame): DataFrame = {
    val eligible = svcs.filter(col("binary_path").isNotNull)
    val unquoted = eligible
      .filter(col("unquoted_path"))
      .select(findingCols(
        tool = "service_auditor", category = "unquoted_service_path",
        severity = lit("high"),
        title = concat(lit("Unquoted service path: "), col("name")),
        description = concat(
          lit("Service '"), col("display_name"),
          lit("' has an unquoted binary path with spaces, which could allow "),
          lit("privilege escalation. Path: "), col("binary_path")),
        target = col("binary_path"),
        mitre = lit("T1574.009")): _*)
    val nonStandard = eligible
      .filter(
        isSystemAccount(col("account")) &&
          col("non_standard_binary_location") && col("state") === "Running")
      .select(findingCols(
        tool = "service_auditor", category = "system_service_non_standard",
        severity = lit("medium"),
        title = concat(lit("SYSTEM service in non-standard path: "), col("name")),
        description = concat(
          lit("Service '"), col("display_name"), lit("' runs as "), col("account"),
          lit(" from a non-standard location: "), col("binary_path")),
        target = col("binary_path")): _*)
    unquoted.unionByName(nonStandard)
  }

  /** Scheduled-task state codes (persistence_auditor.py:22-33). */
  val taskStateMap: Map[Int, String] = Map(
    0 -> "Unknown", 1 -> "Disabled", 2 -> "Queued", 3 -> "Ready", 4 -> "Running")

  /** Get-ScheduledTask JSON → normalized task rows
    * (persistence_auditor.py:142-170).
    */
  def scheduledTasks(rows: DataFrame): DataFrame =
    rows.select(
      coalesce(col("TaskName"), lit("")).as("task_name"),
      coalesce(col("TaskPath"), lit("")).as("task_path"),
      // missing State → 0 → "Unknown" (persistence_auditor.py:147-149);
      // a null state must not silently drop the task from findings, and
      // the coalesce stays string-typed so "Ready" isn't ANSI-cast
      Parsers.decodeState(coalesce(col("State").cast("string"), lit("0")), taskStateMap).as("state"),
      col("Execute").as("execute"),
      col("Arguments").as("arguments"),
      col("UserId").as("user_id"),
      { // int codes decode with Limited default; pre-decoded strings
        // pass through (persistence_auditor.py:153-157)
        val s = col("RunLevel").cast("string")
        when(s.isNull, lit("Limited"))
          .when(s.rlike("^-?\\d+$"),
            coalesce(
              element_at(typedlit(Map(0 -> "Limited", 1 -> "Highest"))
                .cast("map<string,string>"), s),
              lit("Limited")))
          .otherwise(s)
      }.as("run_level"))

  /** Standard prefixes for task executables — system tools and env-var
    * roots count as standard (persistence_auditor.py:250-267).
    */
  private def isSuspiciousTaskPath(execute: Column): Column = {
    val n = normPath(execute)
    !startsWithAny(n, standardPrefixes ++ Seq("powershell", "cmd", "%systemroot%", "%windir%"))
  }

  /** Task findings (persistence_auditor.py:186-224): disabled tasks
    * skipped; MEDIUM per highest-privilege task, MEDIUM per
    * non-standard executable location.
    */
  def taskFindings(tasks: DataFrame): DataFrame = {
    val active = tasks.filter(col("state") =!= "Disabled")
    val elevated = active
      .filter(col("run_level") === "Highest")
      .select(findingCols(
        tool = "persistence_auditor", category = "elevated_scheduled_task",
        severity = lit("medium"),
        title = concat(lit("Elevated task: "), col("task_name")),
        description = concat(
          lit("Scheduled task '"), col("task_name"),
          lit("' runs with highest privileges. Execute: "),
          coalesce(col("execute"), lit("N/A"))),
        target = coalesce(col("execute"), col("task_name"))): _*)
    val suspicious = active
      .filter(col("execute").isNotNull && isSuspiciousTaskPath(col("execute")))
      .select(findingCols(
        tool = "persistence_auditor", category = "suspicious_task_path",
        severity = lit("medium"),
        title = concat(lit("Non-standard task executable: "), col("task_name")),
        description = concat(
          lit("Scheduled task '"), col("task_name"),
          lit("' executes from a non-standard location: "), col("execute")),
        target = col("execute")): _*)
    elevated.unionByName(suspicious)
  }

  /** Run-key registry entries (persistence_auditor.py:172-184). */
  def runKeys(rows: DataFrame): DataFrame =
    rows.select(
      coalesce(col("RegistryPath"), lit("")).as("registry_path"),
      coalesce(col("Name"), lit("")).as("name"),
      coalesce(col("Value"), lit("")).as("value"))

  /** Executable path out of a run-key value: quoted → between first
    * quote pair; unquoted → first whitespace token
    * (persistence_auditor.py:291-309).
    */
  def runKeyExePath(value: Column): Column = {
    val v = trim(value)
    when(v.startsWith("\"") && v.rlike("^\"[^\"]*\""),
      regexp_extract(v, "^\"([^\"]*)\"", 1))
      .otherwise(split(v, "\\s+").getItem(0))
  }

  /** Run-key findings (persistence_auditor.py:226-248,268-288): MEDIUM
    * per entry whose executable is outside standard locations — user
    * profile paths (C:\Users\…) are accepted as common for legitimate
    * auto-start apps.
    */
  def runKeyFindings(keys: DataFrame): DataFrame = {
    val exe = runKeyExePath(col("value"))
    keys
      .withColumn("exe_path", exe)
      .filter(col("exe_path") =!= "" && !isStandardOrUserPath(col("exe_path")))
      .select(findingCols(
        tool = "persistence_auditor", category = "suspicious_run_key",
        severity = lit("medium"),
        title = concat(lit("Non-standard run key: "), col("name")),
        description = concat(
          lit("Run key '"), col("name"), lit("' in "), col("registry_path"),
          lit(" points to a non-standard location: "), col("exe_path")),
        target = col("exe_path")): _*)
  }
}
