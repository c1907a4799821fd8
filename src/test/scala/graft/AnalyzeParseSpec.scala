// (review-hardening tests appended at the bottom of this suite)
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
    // pids > 4: the analyzer skips system pids like the reference
    val df = procs(
      (11, 0, "chrome.exe", 2048.0, 10.0, 50, 100, 1.0, true), // high_ram
      (12, 0, "miner", 100.0, 7200.0, 300, 100, 1.0, true), // high_cpu + high_threads
      (13, 0, "svchost.exe", 100.0, 10.0, 50, 100, 500.0, true), // stale but known-long-running
      (14, 0, "mystery", 100.0, 10.0, 50, 100, 500.0, true), // stale
      (4, 0, "System", 9999.0, 9999.0, 999, 99999, 999.0, true)) // system pid → skipped
    val got = ResourceAnalyzer.thresholdFindings(df)
      .select(col("pid"), col("reasons")).as[(Long, Seq[String])].collect().toMap
    assert(got(11L) == Seq("high_ram"))
    assert(got(12L).toSet == Set("high_cpu", "high_threads"))
    assert(!got.contains(13L))
    assert(got(14L) == Seq("stale"))
    assert(!got.contains(4L)) // reference skips pid <= 4
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

  test("baseline diff: null-key rows match null-safely (no phantom add/remove)") {
    import graft.analyze.BaselineDiff
    val cur = Seq(("svc", null.asInstanceOf[String]), ("app", "C:\\app.exe")).toDF("name", "path")
    val base = Seq(("svc", null.asInstanceOf[String]), ("old", "C:\\old.exe")).toDF("name", "path")
    val added = BaselineDiff.added(cur, base, Seq("name", "path"))
      .select("name").as[String].collect().toSet
    val removed = BaselineDiff.removed(cur, base, Seq("name", "path"))
      .select("name").as[String].collect().toSet
    assert(added == Set("app"), s"unchanged null-path row reported added: $added")
    assert(removed == Set("old"), s"unchanged null-path row reported removed: $removed")
  }

  test("dropInfo keeps null-severity rows (combined streams missing the column)") {
    import graft.analyze.Findings
    val df = Seq(("a", "info"), ("b", "high"), ("c", null.asInstanceOf[String]))
      .toDF("title", "severity")
    assert(Findings.dropInfo(df).select("title").as[String].collect().toSet == Set("b", "c"))
  }

  test("suspicious listeners: redis/mongo and bracketed [::] binds ARE flagged") {
    import graft.analyze.NetworkAnalyzer
    val conns = Seq(
      ("Listen", "0.0.0.0", 6379L, 1L, "redis"),
      ("Listen", "[::]", 4444L, 2L, "thing"),
      ("Listen", "0.0.0.0", 443L, 3L, "web"), // common port → not flagged
      ("Listen", "127.0.0.1", 9000L, 4L, "local")) // loopback → not flagged
      .toDF("state", "local_address", "local_port", "pid", "process_name")
    val got = NetworkAnalyzer.suspiciousListeners(conns)
      .select("process_name").as[String].collect().toSet
    assert(got == Set("redis", "thing"), s"got $got")
  }

  test("upsert: incoming row replaces even when its mtime is OLDER (restore case)") {
    import java.sql.Timestamp
    val existing = Seq(("f", Timestamp.valueOf("2024-06-01 00:00:00"), "newhash"))
      .toDF("file_path", "modified_time", "file_hash")
    val incoming = Seq(("f", Timestamp.valueOf("2024-01-01 00:00:00"), "restoredhash"))
      .toDF("file_path", "modified_time", "file_hash")
    val merged = graft.index.FileIndex.upsert(existing, incoming)
    assert(merged.count() == 1)
    assert(merged.select("file_hash").as[String].head() == "restoredhash")
  }

  test("xlsx read does not resolve external entities (XXE hardening)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("xxe").toString
    val path = s"$dir/evil.xlsx"
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def e(n: String, c: String): Unit = { zos.putNextEntry(new ZipEntry(n)); zos.write(c.getBytes("UTF-8")); zos.closeEntry() }
    e("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE x [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>&xxe;</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    // hardened parser must refuse the DTD (or at minimum never expand
    // the entity) — either way no file content leaks into cell values
    val leaked = try {
      val df = graft.etl.Xlsx.read(spark, path, header = false)
      df.collect().flatMap(_.toSeq).exists {
        case s: String => s.nonEmpty && !s.contains("xxe")
        case _ => false
      }
    } catch { case _: Exception => false } // rejecting the workbook is fine
    assert(!leaked, "external entity content leaked into cell values")
  }
}
