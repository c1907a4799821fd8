package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.analyze.{BaselineDiff, Finding, Findings, NetworkAnalyzer, ResourceAnalyzer}
import graft.parse.Parsers

/** Analyzer + parser behavior on synthetic snapshots mirroring the
  * reference's unit-test scenarios (baseline add/remove, thresholds,
  * orphans, suspicious listeners, AV log parse, sectioned report).
  */
class AnalyzeParseSpec extends SparkSpecBase {
  import spark.implicits._

  private def procs(rows: (Long, Long, String, Double, Double, Int, Int, Double, Boolean)*) =
    rows.toSeq.toDF("pid", "parent_pid", "name", "ram_mb", "cpu_seconds",
      "threads", "handles", "start_age_hours", "signed")

  test("baseline diff: added and removed on composite keys") {
    val baseline = Seq(("svc1", "/bin/a"), ("svc2", "/bin/b")).toDF("name", "path")
    val current = Seq(("svc2", "/bin/b"), ("svc3", "/bin/c")).toDF("name", "path")
    val d = BaselineDiff.diff(current, baseline, Seq("name", "path"), "services")
    val got = d.select("name", "change_type").as[(String, String)].collect().toSet
    assert(got == Set(("svc3", "added"), ("svc1", "removed")))
    val sum = BaselineDiff.summary(Seq(d)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sum == Set(("services", "added", 1L), ("services", "removed", 1L)))
  }

  test("resource thresholds tag the right reasons") {
    val df = procs(
      (1, 0, "chrome.exe", 2048.0, 10.0, 50, 100, 1.0, true), // high_ram
      (2, 0, "miner", 100.0, 7200.0, 300, 100, 1.0, true), // high_cpu + high_threads
      (3, 0, "svchost.exe", 100.0, 10.0, 50, 100, 500.0, true), // stale but known-long-running
      (4, 0, "mystery", 100.0, 10.0, 50, 100, 500.0, true)) // stale
    val got = ResourceAnalyzer.thresholdFindings(df)
      .select(col("pid"), col("reasons")).as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("high_ram"))
    assert(got(2L).toSet == Set("high_cpu", "high_threads"))
    assert(!got.contains(3L))
    assert(got(4L) == Seq("stale"))
  }

  test("orphan detection: missing parent + stale-or-unsigned gate") {
    val df = procs(
      (10, 1, "child-of-live", 0, 0, 1, 1, 100.0, true),
      (1, 0, "parent", 0, 0, 1, 1, 100.0, true),
      (20, 999, "orphan-stale", 0, 0, 1, 1, 100.0, true),
      (21, 999, "orphan-fresh-signed", 0, 0, 1, 1, 1.0, true),
      (22, 999, "orphan-fresh-unsigned", 0, 0, 1, 1, 1.0, false))
    val got = ResourceAnalyzer.orphans(df).select("name").as[String].collect().toSet
    assert(got == Set("orphan-stale", "orphan-fresh-unsigned"))
  }

  test("network analyzer: external fan-out and suspicious listeners") {
    val conns = Seq(
      (1L, "curl", "Established", "10.0.0.5", 50000, "8.8.8.8", 443),
      (1L, "curl", "Established", "10.0.0.5", 50001, "1.1.1.1", 443),
      (2L, "local", "Established", "10.0.0.5", 50002, "192.168.1.9", 445),
      (3L, "good", "Listen", "0.0.0.0", 8080, null, 0),
      (4L, "odd", "Listen", "0.0.0.0", 4444, null, 0),
      (5L, "priv", "Listen", "0.0.0.0", 80, null, 0),
      (6L, "bound", "Listen", "127.0.0.1", 9999, null, 0))
      .toDF("pid", "process_name", "state", "local_address", "local_port", "remote_address", "remote_port")
    val ext = NetworkAnalyzer.externalByProcess(conns, flagAt = 2).collect()
    assert(ext.length == 1 && ext(0).getAs[Long]("pid") == 1L && ext(0).getAs[Boolean]("flagged"))
    val susp = NetworkAnalyzer.suspiciousListeners(conns).select("pid").as[Long].collect().toSeq
    assert(susp == Seq(4L))
    val t = NetworkAnalyzer.tallies(conns).head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == (7L, 4L, 3L))
  }

  test("findings rollups: severity ordering, counts, filters") {
    val fs = Findings.toDS(spark, Seq(
      Finding("a", "", "low", "process", "r1", "t", "{}"),
      Finding("b", "", "critical", "malware", "r2", "t", "{}"),
      Finding("c", "", "info", "system", "r3", "t", "{}"),
      Finding("d", "", "high", "network", "r4", "t", "{}"))).toDF()
    val top = Findings.topFindings(Findings.dropInfo(fs), 2)
      .select("title").as[String].collect().toSeq
    assert(top == Seq("b", "d"))
    val counts = Findings.severityCounts(fs).as[(String, Long)].collect().toMap
    assert(counts == Map("critical" -> 1L, "high" -> 1L, "info" -> 1L, "low" -> 1L))
    assert(Findings.where(fs, severity = Some("HIGH")).count() == 1)
  }

  test("AV log parse: FOUND lines → critical findings; summary block") {
    val log = Seq(
      "/data/bad.exe: Win.Trojan.Agent FOUND",
      "/data/ok.txt: OK",
      "/data/worse.dll: Eicar-Test-Signature FOUND",
      "Infected files: 2",
      "Time: 12.5").toDF("value")
    val f = Parsers.avLogFindings(log).collect()
    assert(f.length == 2)
    assert(f.map(_.getAs[String]("title")).toSet == Set("Win.Trojan.Agent", "Eicar-Test-Signature"))
    val s = Parsers.avLogSummary(log).as[(String, Double)].collect().toMap
    assert(s("Infected files") == 2.0 && s("Time") == 12.5)
  }

  test("vt detection parse flags positives") {
    val df = Seq(("a.exe", "5|72"), ("b.exe", "0|72"), ("c.exe", null)).toDF("path", "vt")
    val got = Parsers.vtDetection(df, "vt")
      .select("path", "vt_flagged").as[(String, Boolean)].collect().toMap
    assert(got == Map("a.exe" -> true, "b.exe" -> false, "c.exe" -> false))
  }

  test("wmi date extraction") {
    val df = Seq("/Date(1700000000000)/").toDF("d")
      .select(Parsers.wmiDate(col("d")).cast("long").as("epoch"))
    assert(df.as[Long].head() == 1700000000L)
  }

  test("state decode with unknown fallback") {
    val df = Seq(2, 5, 42).toDF("code")
      .select(Parsers.decodeState(col("code"), Map(2 -> "Listen", 5 -> "Established")).as("s"))
    assert(df.as[String].collect().toSeq == Seq("Listen", "Established", "Unknown(42)"))
  }

  test("sectioned report: header state propagates to items within a file") {
    val dir = Files.createTempDirectory("sect").toString
    Files.writeString(Paths.get(dir, "r1.txt"),
      """ListDLLs v3.2
        |process: alpha.exe pid: 100
        |  c:\windows\a.dll
        |  c:\windows\b.dll
        |process: beta.exe pid: 200
        |  c:\windows\c.dll
        |""".stripMargin)
    val files = spark.read.option("wholetext", "true").text(dir)
    val got = Parsers.sectionedReport(
      files,
      headerRe = "^process: (\\S+) pid: \\d+",
      itemRe = "^\\s+(\\S+\\.dll)$")
      .select("header", "item").as[(String, String)].collect().toSet
    assert(got == Set(
      ("alpha.exe", "c:\\windows\\a.dll"),
      ("alpha.exe", "c:\\windows\\b.dll"),
      ("beta.exe", "c:\\windows\\c.dll")))
  }
}
