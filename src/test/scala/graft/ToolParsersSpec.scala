package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.parse.ToolParsers

/** Golden-fixture parity tests: every expected count/severity below is
  * pinned to the reference's own test suite over the same 13 captured
  * tool outputs (reference tests/audit/test_scanners.py,
  * test_result_parser.py, test_network_mapper.py, test_service_auditor
  * .py, test_persistence_auditor.py, test_process_snapshot.py).
  */
class ToolParsersSpec extends SparkSpecBase {
  import spark.implicits._

  private val fixtures = "src/test/resources/fixtures"

  private def csv(name: String): DataFrame =
    spark.read.option("header", "true").csv(s"$fixtures/$name")

  private def jsonArr(name: String): DataFrame =
    spark.read.option("multiLine", "true").json(s"$fixtures/$name")

  private def wholeText(name: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$fixtures/$name")

  private def sevCounts(df: DataFrame): Map[String, Long] =
    df.groupBy("severity").count().as[(String, Long)].collect().toMap

  test("hayabusa: 4 findings after info filter; 1 critical, 2 high") {
    val f = ToolParsers.hayabusa(csv("hayabusa_output.csv")).cache()
    assert(f.count() == 4)
    val bySev = sevCounts(f)
    assert(bySev("critical") == 1 && bySev("high") == 2 && bySev("medium") == 1)
    val crit = f.filter($"severity" === "critical").select("title").as[String].head()
    assert(crit.contains("Encoded PowerShell"))
    assert(f.select("tool_name").distinct().as[String].collect().toSeq == Seq("hayabusa"))
  }

  test("chainsaw: informational dropped; 1 critical log-clearing, 1 high powershell") {
    val f = ToolParsers.chainsaw(jsonArr("chainsaw_output.json")).cache()
    assert(f.count() == 2)
    val crit = f.filter($"severity" === "critical").select("title").as[String].head()
    assert(crit.contains("Event Log Clearing"))
    val high = f.filter($"severity" === "high").select("title").as[String].head()
    assert(high.contains("PowerShell"))
    assert(f.select("category").distinct().as[String].collect().toSeq == Seq("event_log_alert"))
  }

  test("autorunsc: 2 unsigned high + 1 VT-hit critical; clean entries skipped") {
    val f = ToolParsers.autorunsc(csv("autorunsc_output.csv")).cache()
    assert(f.count() == 3)
    val crit = f.filter($"severity" === "critical")
    assert(crit.count() == 1)
    assert(crit.select("title").as[String].head().contains("VT hit"))
    assert(f.filter(lower($"title").contains("unsigned")).count() == 2)
    // MicrosoftUpdate is verified with 0|0 VT — no finding mentions it
    assert(f.filter($"title".contains("MicrosoftUpdate")).count() == 0)
    assert(f.select("mitre").distinct().as[String].collect().toSeq == Seq("T1547"))
  }

  test("sigcheck: 2 medium unsigned_binary with exact targets") {
    val f = ToolParsers.sigcheck(csv("sigcheck_output.csv")).cache()
    assert(f.count() == 2)
    assert(f.filter($"severity" === "medium" && $"category" === "unsigned_binary").count() == 2)
    val targets = f.select("target").as[String].collect().toSet
    assert(targets == Set(
      "C:\\Windows\\System32\\evil.dll",
      "C:\\Windows\\System32\\suspicious.sys"))
  }

  test("listdlls: 3 medium unsigned_dll; 2 in explorer.exe, 1 in svchost.exe") {
    val f = ToolParsers.listdlls(wholeText("listdlls_output.txt")).cache()
    assert(f.count() == 3)
    assert(f.filter($"severity" === "medium" && $"category" === "unsigned_dll").count() == 3)
    assert(f.filter($"process" === "explorer.exe").count() == 2)
    val svchost = f.filter($"process" === "svchost.exe")
    assert(svchost.count() == 1)
    assert(svchost.select("pid").as[String].head() == "1234")
    assert(svchost.select("target").as[String].head() == "C:\\ProgramData\\unknown_service.dll")
  }

  test("clamav: 3 detections with full Windows paths; summary key/values") {
    val f = ToolParsers.clamav(spark.read.text(s"$fixtures/clamscan_output.log")).cache()
    assert(f.count() == 3)
    val byTitle = f.select("title", "target").as[(String, String)].collect().toMap
    assert(byTitle("ClamAV: Eicar-Signature") == "C:\\Users\\test\\Downloads\\eicar.txt")
    assert(byTitle.contains("ClamAV: Win.Trojan.Generic-12345"))
    assert(byTitle.contains("ClamAV: Win.Malware.Agent-67890"))
    assert(f.select("severity").distinct().as[String].collect().toSeq == Seq("high"))

    val s = ToolParsers.clamavSummary(wholeText("clamscan_output.log"))
      .as[(String, String)].collect().toMap
    assert(s("Infected files") == "3")
    assert(s("Scanned files") == "42")
    assert(s("Engine version") == "1.4.2")
  }

  test("yara: metadata severity honored, default high; mitre carried") {
    val f = ToolParsers.yara(jsonArr("yara_output.json"))
      .orderBy("title").cache()
    assert(f.count() == 2)
    val rows = f.select("title", "severity", "mitre", "target")
      .as[(String, String, String, String)].collect()
    assert(rows(0) == (("YARA: APT_Backdoor_Win32", "critical", "T1059", "C:\\Users\\test\\malware.exe")))
    assert(rows(1)._1 == "YARA: HKTL_Mimikatz" && rows(1)._2 == "high")
    assert(rows(1)._3 == null)
  }

  test("yara without any metadata: defaults to high, no schema failure") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("yara_nometa")
    Files.writeString(dir.resolve("out.json"),
      """{"version": "1.13.0", "matches": [{"rule": "Bare_Rule", "file": "C:\\a.bin"}]}""")
    val f = ToolParsers.yara(spark.read.option("multiLine", "true").json(dir.toString))
    val row = f.select("title", "severity", "mitre").collect()(0)
    assert(row.getString(0) == "YARA: Bare_Rule")
    assert(row.getString(1) == "high")
    assert(row.isNullAt(2))
  }

  test("hollows_hunter: 2 suspicious processes; 5 findings with per-anomaly severities") {
    val procs = ToolParsers.hollowsHunterProcesses(wholeText("hollows_hunter_output.json")).cache()
    assert(procs.count() == 2) // notepad.exe has zero anomalies
    val byPid = procs.collect().map(r => r.getAs[String]("pid") -> r).toMap
    assert(byPid("4567").getAs[String]("name") == "suspicious.exe")
    assert(byPid("4567").getAs[Long]("replaced") == 2)
    assert(byPid("4567").getAs[Long]("implanted") == 1)
    assert(byPid("4567").getAs[Long]("total_suspicious") == 3)
    assert(byPid("8901").getAs[Long]("total_suspicious") == 6)

    val f = ToolParsers.hollowsHunter(wholeText("hollows_hunter_output.json")).cache()
    assert(f.count() == 5)
    val bySev = sevCounts(f)
    assert(bySev("critical") == 2) // replaced + implanted, both PID 4567
    assert(bySev("high") == 2) // hdr_modified + iat_hooked, PID 8901
    assert(bySev("medium") == 1) // patched, PID 8901
    val replaced = f.filter($"title".startsWith("HollowsHunter: replaced"))
    assert(replaced.count() == 1)
    assert(replaced.select("mitre").as[String].head() == "T1055.012")
  }

  test("malformed tool values parse to nulls, not ANSI cast errors") {
    import graft.parse.Parsers
    // VT column: 'Unknown', 'n/a', '' all occur in real autoruns output
    val vt = Parsers.vtDetection(
      Seq("5|72", "Unknown", "n/a", "", null.asInstanceOf[String]).toDF("vt"), "vt")
      .select("vt_positives", "vt_flagged").collect()
    assert(vt.map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq == Seq(5, -1, -1, -1, -1))
    assert(vt.map(_.getBoolean(1)).toSeq == Seq(true, false, false, false, false))
    // CIM-format dates (not /Date(ms)/) yield null, not a crash
    val d = Seq("/Date(1708200000000)/", "20231101120000.000000+000", "junk")
      .toDF("d").select(Parsers.wmiDate($"d").as("t")).collect()
    assert(!d(0).isNullAt(0) && d(1).isNullAt(0) && d(2).isNullAt(0))
    // real clamscan summaries contain non-numeric values (versions)
    val s = Parsers.avLogSummary(Seq(
      "Engine version: 0.103.2", "Infected files: 3", "Data scanned: 256.50 MB")
      .toDF("value")).as[(String, Double)].collect().toMap
    assert(s("Infected files") == 3.0 && s("Data scanned") == 256.5)
    assert(!s.contains("Engine version")) // unparseable-as-double → excluded
    // autorunsc with an 'n/a' VT row: job survives, unsigned branch intact
    val rows = Seq(
      ("E1", "loc", "enabled", "Services", "", "", "C:\\x.exe", "C:\\x.exe", "", "Not Verified", "n/a"))
      .toDF("Entry", "Entry Location", "Enabled", "Category", "Description",
        "Publisher", "Image Path", "Launch String", "Signer", "Verified", "VT detection")
    val f = ToolParsers.autorunsc(rows)
    assert(f.count() == 1) // the unsigned finding; no VT hit, no crash
    // hayabusa timelines without a Details column still parse
    val hb = ToolParsers.hayabusa(Seq(
      ("2025-01-01T00:00:00Z", "HOST", "Security", "4625", "high", "1", "Rule X"))
      .toDF("Timestamp", "Computer", "Channel", "EventID", "Level", "RecordID", "RuleTitle"))
    assert(hb.count() == 1)
    assert(hb.select("description").as[String].head().endsWith("— "))
  }

  test("levelToSeverity trims padded cells (reference .strip() parity)") {
    import graft.parse.Parsers
    val got = Seq(" high", "HIGH ", " Critical ", "low", "  ").toDF("l")
      .select(Parsers.levelToSeverity($"l").as("s")).as[String].collect().toSeq
    assert(got == Seq("high", "high", "critical", "low", "info"))
  }

  test("hayabusa includeInfo keeps the info row the default path drops") {
    val all = ToolParsers.hayabusa(csv("hayabusa_output.csv"), includeInfo = true)
    assert(all.count() == 5)
    assert(all.filter($"severity" === "info").count() == 1)
  }

  test("chainsaw wrapper-object form parses detections/hits arrays") {
    import java.nio.file.{Files, Paths}
    val raw = Files.readString(Paths.get(s"$fixtures/chainsaw_output.json"))
    val dir = Files.createTempDirectory("chainsaw_wrapped")
    Files.writeString(dir.resolve("wrapped.json"), s"""{"detections": $raw}""")
    val f = ToolParsers.chainsawWrapped(
      spark.read.option("multiLine", "true").json(dir.toString))
    assert(f.count() == 2) // same result as the bare-array form
    intercept[IllegalArgumentException](
      ToolParsers.chainsawWrapped(Seq((1, "x")).toDF("a", "b")))
  }

  test("hollows_hunter per-process subdirectory reports parse with pid from path") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("hh_reports")
    def put(pid: String, json: String): Unit = {
      val d = root.resolve(pid); Files.createDirectories(d)
      Files.writeString(d.resolve("scan_report.json"), json)
    }
    put("4567", """{"main_image_path": "C:\\bad\\a.exe", "replaced": 2, "implanted": 1, "hdr_modified": 0, "patched": 0}""")
    put("1234", """{"main_image_path": "C:\\ok\\b.exe", "replaced": 0, "implanted": 0, "hdr_modified": 0, "patched": 0}""")
    val got = ToolParsers.hollowsHunterPerProcess(
      spark.read.option("wholetext", "true").text(s"$root/*/scan_report.json"))
    val rows = got.collect()
    assert(rows.length == 1) // clean process filtered out
    assert(rows(0).getAs[String]("pid") == "4567")
    assert(rows(0).getAs[String]("name") == "C:\\bad\\a.exe")
    assert(rows(0).getAs[Long]("total_suspicious") == 3)
  }

  test("tcp connections: state decode, external classification, counts from fixture") {
    val c = ToolParsers.tcpConnections(
      spark.read.schema(ToolParsers.tcpConnectionSchema)
        .option("multiLine", "true").json(s"$fixtures/tcp_connection_output.json")).cache()
    assert(c.count() == 11)
    assert(c.filter($"state" === "Listen").count() == 3)
    assert(c.filter($"state" === "Established").count() == 8)
    // external established: 2× chrome→93.184.216.34, 1× suspect→203.0.113.50
    assert(c.filter($"is_outbound_external" && $"state" === "Established").count() == 3)
    // fe80 link-local and RFC1918 are internal
    assert(c.filter($"remote_address".startsWith("fe80") && $"is_outbound_external").count() == 0)
  }

  test("network findings: 2 suspicious listeners (49152, 9999), no many-connections") {
    val c = ToolParsers.tcpConnections(
      spark.read.schema(ToolParsers.tcpConnectionSchema)
        .option("multiLine", "true").json(s"$fixtures/tcp_connection_output.json"))
    val f = ToolParsers.networkFindings(c).cache()
    val listeners = f.filter($"category" === "suspicious_listener")
    assert(listeners.count() == 2)
    val ports = listeners.select("target").as[String].collect().toSet
    assert(ports == Set("0.0.0.0:49152", ":::9999"))
    // port 80 is a common service port — not flagged
    assert(f.filter($"target" === "0.0.0.0:80").count() == 0)
    assert(f.filter($"category" === "many_external_connections").count() == 0)
    assert(f.count() == 2)
  }

  test("network findings: many_external_connections fires at threshold") {
    val rows = (1 to 12).map(i =>
      ("10.0.0.9", 50000L + i, "93.184.216.34", 443L, "Established", 777L, "beacon.exe", true))
    val conns = rows.toDF(
      "local_address", "local_port", "remote_address", "remote_port",
      "state", "pid", "process_name", "is_outbound_external")
    val f = ToolParsers.networkFindings(conns)
    val many = f.filter($"category" === "many_external_connections")
    assert(many.count() == 1)
    assert(many.select("severity").as[String].head() == "medium")
    assert(many.select("title").as[String].head().contains("beacon.exe"))
  }

  test("processes: 7 parsed; ram_mb and WMI dates normalized; suspicious.exe flagged") {
    val p = ToolParsers.processes(
      spark.read.schema(ToolParsers.win32ProcessSchema)
        .option("multiLine", "true").json(s"$fixtures/win32_process_output.json")).cache()
    assert(p.count() == 7)
    val chrome = p.filter($"name" === "chrome.exe")
    assert(chrome.select("ram_mb").as[Double].head() == 500.0)
    assert(p.filter($"created_at".isNull).count() == 0)

    val f = ToolParsers.processFindings(p).cache()
    val nsp = f.filter($"category" === "non_standard_path")
    assert(nsp.select("title").as[String].collect().exists(_.contains("suspicious.exe")))
    // system pids (0, 4) and pathless rows never produce findings
    assert(f.filter($"title".contains("System")).count() == 0)
    // no signature info in fixture → no unsigned_process findings
    assert(f.filter($"category" === "unsigned_process").count() == 0)
  }

  test("processFindings: unsigned process flagged medium when signature known-bad") {
    val procs = Seq((100L, "bad.exe", "C:\\Temp\\bad.exe", false))
      .toDF("pid", "name", "path", "is_signed")
    val f = ToolParsers.processFindings(procs)
    val unsigned = f.filter($"category" === "unsigned_process")
    assert(unsigned.count() == 1)
    assert(unsigned.select("severity").as[String].head() == "medium")
  }

  test("services: 7 parsed; 1 unquoted path (VulnSvc), 1 non-standard SYSTEM (WeirdSvc)") {
    val s = ToolParsers.services(jsonArr("win32_service_output.json")).cache()
    assert(s.count() == 7)
    assert(s.filter($"unquoted_path").select("name").as[String].collect().toSeq == Seq("VulnSvc"))

    val f = ToolParsers.serviceFindings(s).cache()
    assert(f.count() == 2)
    val unquoted = f.filter($"category" === "unquoted_service_path")
    assert(unquoted.count() == 1)
    assert(unquoted.select("severity").as[String].head() == "high")
    assert(unquoted.select("mitre").as[String].head() == "T1574.009")
    assert(unquoted.select("title").as[String].head().contains("VulnSvc"))
    val nonStd = f.filter($"category" === "system_service_non_standard")
    assert(nonStd.count() == 1)
    assert(nonStd.select("title").as[String].head().contains("WeirdSvc"))
  }

  test("scheduled tasks: state/run-level decode; elevated + suspicious-path findings") {
    val t = ToolParsers.scheduledTasks(jsonArr("scheduled_tasks_output.json")).cache()
    assert(t.count() == 6)
    assert(t.filter($"state" === "Ready").count() == 4)
    assert(t.filter($"state" === "Disabled").count() == 1)

    val f = ToolParsers.taskFindings(t).cache()
    val elevated = f.filter($"category" === "elevated_scheduled_task")
      .select("title").as[String].collect()
    assert(elevated.exists(_.contains("WindowsUpdate")))
    assert(elevated.exists(_.contains("MyBackup")))
    assert(!elevated.exists(_.contains("DisabledTask"))) // disabled → skipped
    val suspicious = f.filter($"category" === "suspicious_task_path")
      .select("title").as[String].collect()
    assert(suspicious.exists(_.contains("MyBackup"))) // D:\Scripts
    assert(suspicious.exists(_.contains("SuspiciousTask"))) // AppData Temp
    assert(f.filter($"title".contains("ChromeUpdate")).count() == 0) // Program Files
    assert(f.filter($"title".contains("PowerShellTask") &&
      $"category" === "suspicious_task_path").count() == 0) // powershell.exe is standard
  }

  test("state decode: pre-decoded string states pass through, ints map, unknown codes tag") {
    import graft.parse.Parsers
    val df = Seq("2", "5", "77", "Listen", "Ready").toDF("s")
      .select(Parsers.decodeState($"s", ToolParsers.tcpStateMap).as("d"))
    assert(df.as[String].collect().toSeq ==
      Seq("Listen", "Established", "Unknown(77)", "Listen", "Ready"))
    // scheduled tasks with string State/RunLevel (already-decoded input)
    val t = ToolParsers.scheduledTasks(Seq(
      ("T1", "\\", "Ready", "C:\\x.exe", null.asInstanceOf[String], "u", "Highest"),
      ("T2", "\\", "3", "C:\\y.exe", null.asInstanceOf[String], "u", "1"))
      .toDF("TaskName", "TaskPath", "State", "Execute", "Arguments", "UserId", "RunLevel"))
    val m = t.select("task_name", "state", "run_level")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(m("T1") == (("Ready", "Highest")))
    assert(m("T2") == (("Ready", "Highest")))
  }

  test("end-to-end audit: all 13 fixtures → one combined report") {
    import graft.analyze.Findings
    import graft.pipeline.HtmlReport
    val conns = ToolParsers.tcpConnections(
      spark.read.schema(ToolParsers.tcpConnectionSchema)
        .option("multiLine", "true").json(s"$fixtures/tcp_connection_output.json"))
    val procs = ToolParsers.processes(
      spark.read.schema(ToolParsers.win32ProcessSchema)
        .option("multiLine", "true").json(s"$fixtures/win32_process_output.json"))
    val svcs = ToolParsers.services(jsonArr("win32_service_output.json"))
    val tasks = ToolParsers.scheduledTasks(jsonArr("scheduled_tasks_output.json"))
    val keys = ToolParsers.runKeys(jsonArr("run_keys_output.json"))

    val all = Findings.combine(Seq(
      ToolParsers.hayabusa(csv("hayabusa_output.csv")),
      ToolParsers.chainsaw(jsonArr("chainsaw_output.json")),
      ToolParsers.autorunsc(csv("autorunsc_output.csv")),
      ToolParsers.sigcheck(csv("sigcheck_output.csv")),
      ToolParsers.listdlls(wholeText("listdlls_output.txt")),
      ToolParsers.clamav(spark.read.text(s"$fixtures/clamscan_output.log")),
      ToolParsers.yara(jsonArr("yara_output.json")),
      ToolParsers.hollowsHunter(wholeText("hollows_hunter_output.json")),
      ToolParsers.networkFindings(conns),
      ToolParsers.processFindings(procs),
      ToolParsers.serviceFindings(svcs),
      ToolParsers.taskFindings(tasks),
      ToolParsers.runKeyFindings(keys)).map(ToolParsers.toFindings)).cache()

    // scanners: 4+2+3+2+3+3+2+5 = 24; collectors: net 2 + proc 1 +
    // svc 2 + tasks 4 + runkeys 2 = 11
    assert(all.count() == 35)
    val bySev = all.groupBy("severity").count().as[(String, Long)].collect().toMap
    // criticals: hayabusa 1, chainsaw 1, autorunsc VT 1, clamav 0 (high),
    // yara 1, hollows replaced+implanted 2 = 6
    assert(bySev("critical") == 6, s"$bySev")
    val domains = all.select("domain").distinct().as[String].collect().toSet
    assert(domains.subsetOf(Set("process", "network", "persistence", "malware", "filesystem", "system")))

    val html = HtmlReport.render(all, "Full audit",
      inventory = HtmlReport.inventoryFrom(
        processes = Some(procs), services = Some(svcs), connections = Some(conns),
        tasks = Some(tasks), runKeys = Some(keys)),
      resources = HtmlReport.resourceTables(procs, n = 3))
    assert(html.contains("Full audit") && html.contains("System Inventory"))
    assert(html.contains("11L") == false) // sanity: no bogus card text
    assert(html.contains("3L/8E")) // 11 connections, 3 listen, 8 established
    assert(html.contains("Top Resource Users"))
  }

  test("run keys: 5 parsed; only non-standard drives flagged (user AppData accepted)") {
    val k = ToolParsers.runKeys(jsonArr("run_keys_output.json")).cache()
    assert(k.count() == 5)
    assert(k.filter($"registry_path".startsWith("HKCU")).count() == 3)

    val f = ToolParsers.runKeyFindings(k).cache()
    val names = f.select("title").as[String].collect()
    assert(names.exists(_.contains("RiotClient"))) // G:\
    assert(names.exists(_.contains("Steam"))) // M:\
    assert(!names.exists(_.contains("SecurityHealth"))) // C:\Windows
    assert(!names.exists(_.contains("Discord"))) // C:\Users AppData
    assert(f.count() == 2)
    assert(f.select("severity").distinct().as[String].collect().toSeq == Seq("medium"))
    // quoted value extraction: Steam's exe comes out without quotes
    val steam = f.filter($"title".contains("Steam")).select("target").as[String].head()
    assert(steam == "M:\\Steam\\steam.exe")
  }
}
