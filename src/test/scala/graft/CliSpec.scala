package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** End-to-end CLI coverage (reference: /root/reference/src/cli.py —
  * the click group at :27-36, scan options :162-172, findings filters
  * :263-267): every verb drives its library module on real inputs
  * through [[Cli.run]]'s injected console/session seams, and the
  * click exit-code convention is pinned — 0 success, 1 runtime
  * failure, 2 usage error.
  */
class CliSpec extends SparkSpecBase {

  private val fixtures = "src/test/resources/fixtures"

  /** (exit, stdout, stderr, mcp stdout) with injected streams. */
  private def cli(
      args: Seq[String],
      stdin: String = "",
      httpHook: Option[Int => Unit] = None): (Int, String, String, String) = {
    val o = new ByteArrayOutputStream(); val e = new ByteArrayOutputStream()
    val mcpOut = new ByteArrayOutputStream()
    val rc = Cli.run(
      args, () => spark,
      new PrintStream(o, true, "UTF-8"), new PrintStream(e, true, "UTF-8"),
      mcpIn = new ByteArrayInputStream(stdin.getBytes(StandardCharsets.UTF_8)),
      mcpOut = mcpOut, httpHook = httpHook)
    (rc, o.toString("UTF-8"), e.toString("UTF-8"), mcpOut.toString("UTF-8"))
  }

  private def tmp(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("cli: help exits 0; unknown verb and bad flags exit 2 (click UsageError)") {
    val (rc0, out0, _, _) = cli(Seq("--help"))
    assert(rc0 == 0 && out0.contains("usage: graft"))
    val (rcNone, outNone, _, _) = cli(Nil)
    assert(rcNone == 0 && outNone.contains("commands:"))
    val (rc2, _, err2, _) = cli(Seq("frobnicate"))
    assert(rc2 == 2 && err2.contains("unknown command: frobnicate"))
    val (rc3, _, err3, _) = cli(Seq("index", "build")) // missing --root/--out
    assert(rc3 == 2 && err3.contains("usage error"))
    val (rc4, _, err4, _) = cli(Seq("index", "search", "--index")) // dangling value
    assert(rc4 == 2 && err4.contains("missing value"))
  }

  test("cli: config show renders the effective config and exits 0") {
    val (rc, out, _, _) = cli(Seq("config", "show"))
    assert(rc == 0)
    assert(out.nonEmpty) // defaults or "(no configuration values)"
  }

  test("cli: etl run full_etl converts csv to parquet; missing input exits 1") {
    val dir = tmp("cli-etl")
    val in = dir.resolve("in.csv")
    Files.writeString(in, "a,b\n1,x\n2,y\n3,z\n")
    val outP = dir.resolve("out.parquet").toString
    val (rc, out, _, _) = cli(Seq(
      "etl", "run", "--op", "full_etl", "--input", in.toString,
      "--output", outP, "--option", "header=true"))
    assert(rc == 0, s"stdout: $out")
    assert(out.contains("completed") && out.contains("(3 rows)"))
    assert(spark.read.parquet(outP).count() == 3)

    val (rc1, out1, _, _) = cli(Seq(
      "etl", "run", "--op", "full_etl", "--input", dir.resolve("nope.csv").toString))
    assert(rc1 == 1 && out1.contains("failed"))
  }

  test("cli: index build / search / stats / export / dups round-trip") {
    val root = tmp("cli-idx-root")
    Files.writeString(root.resolve("alpha.txt"), "same content")
    Files.writeString(root.resolve("beta.txt"), "same content") // dup pair
    Files.writeString(root.resolve("gamma.log"), "different content")
    val idx = tmp("cli-idx").resolve("files.parquet").toString

    val (rcB, outB, _, _) = cli(Seq(
      "index", "build", "--root", root.toString, "--out", idx))
    assert(rcB == 0 && outB.contains("indexed 3 files"))

    val (rcS, outS, _, _) = cli(Seq(
      "index", "search", "--index", idx, "--name", "alpha"))
    assert(rcS == 0 && outS.contains("alpha.txt") && !outS.contains("gamma.log"))

    val (rcSz, outSz, _, _) = cli(Seq(
      "index", "search", "--index", idx,
      "--size", Files.size(root.resolve("gamma.log")).toString))
    assert(rcSz == 0 && outSz.contains("gamma.log"))

    val (rcBoth, _, errBoth, _) = cli(Seq(
      "index", "search", "--index", idx, "--name", "a", "--hash", "b"))
    assert(rcBoth == 2 && errBoth.contains("exactly one"))

    val (rcT, outT, _, _) = cli(Seq("index", "stats", "--index", idx))
    assert(rcT == 0 && outT.linesIterator.size >= 2) // header + totals row

    val exp = tmp("cli-exp").resolve("export.json").toString
    val (rcE, outE, _, _) = cli(Seq(
      "index", "export", "--index", idx, "--out", exp))
    assert(rcE == 0 && outE.contains("exported"))
    assert(Files.exists(Paths.get(exp)))

    val (rcD, outD, _, _) = cli(Seq("dups", "--index", idx))
    assert(rcD == 0 && outD.contains("alpha.txt") && outD.contains("beta.txt")
      && !outD.contains("gamma.log"))
    val (rcR, outR, _, _) = cli(Seq("dups", "--index", idx, "--report"))
    assert(rcR == 0 && outR.contains("wasted"))
  }

  test("cli: audit scan -> findings -> report over the fixture tool outputs") {
    val saved = tmp("cli-scan").toString
    val report = tmp("cli-report").resolve("report.html").toString
    val (rc, out, _, _) = cli(Seq(
      "audit", "scan", "--input", fixtures, "--pipeline", "daily",
      "--out", saved, "--report", report))
    assert(rc == 0, s"stdout: $out")
    assert(out.contains("yara_x") && out.contains("findings"))
    assert(out.contains("saved ->") && out.contains("report ->"))
    assert(Files.exists(Paths.get(report)))

    val (rcF, outF, _, _) = cli(Seq(
      "audit", "findings", "--dir", saved, "--severity", "high", "--limit", "5"))
    assert(rcF == 0)
    val lines = outF.linesIterator.toSeq
    assert(lines.head.contains("severity"))
    assert(lines.tail.forall(l => l.isEmpty || l.startsWith("high")),
      s"severity filter leaked rows:\n$outF")

    val (rcUnknown, _, errU, _) = cli(Seq(
      "audit", "scan", "--input", fixtures, "--pipeline", "nope"))
    assert(rcUnknown == 1 && errU.contains("unknown pipeline"))

    val rpt2 = tmp("cli-report2").resolve("r.html").toString
    val (rcR, outR, _, _) = cli(Seq(
      "report", "--dir", saved, "--out", rpt2, "--title", "CLI Smoke"))
    assert(rcR == 0 && outR.contains("report ->"))
    val html = Files.readString(Paths.get(rpt2))
    assert(html.contains("CLI Smoke"))

    // Baseline Comparison wiring: scan #1 against an --out store is the
    // FIRST run (notice), and a one-scan `report` says the same; a
    // second identical scan then reports "no changes"
    val firstHtml = Files.readString(Paths.get(report))
    assert(firstHtml.contains("Baseline Comparison") && firstHtml.contains("First run"),
      "scan #1 with --out must render the first-run baseline notice")
    assert(html.contains("Baseline Comparison") && html.contains("First run"),
      "report over a single saved scan must render the first-run notice")
    val report3 = tmp("cli-report3").resolve("r3.html").toString
    assert(cli(Seq("audit", "scan", "--input", fixtures, "--pipeline", "daily",
      "--out", saved, "--report", report3))._1 == 0)
    val html3 = Files.readString(Paths.get(report3))
    assert(html3.contains("No changes detected since last baseline."),
      "identical rescan must render the clean baseline state")
    // and `report` over the two saved scans agrees
    val rpt4 = tmp("cli-report4").resolve("r4.html").toString
    assert(cli(Seq("report", "--dir", saved, "--out", rpt4))._1 == 0)
    assert(Files.readString(Paths.get(rpt4))
      .contains("No changes detected since last baseline."))
  }

  test("cli: audit baseline save -> show -> scan diffs against it -> clear gates on --yes") {
    val store = tmp("cli-base").toString
    // save runs the collectors-only pipeline over the fixture snapshots
    val (rcS, outS, _, _) = cli(Seq(
      "audit", "baseline", "save", "--input", fixtures, "--dir", store))
    assert(rcS == 0, s"save: $outS")
    assert(outS.contains("Baseline saved to") && outS.contains("Collectors captured:"))
    assert(outS.contains("tcp_connections"), s"collector list: $outS")

    val (rcH, outH, _, _) = cli(Seq("audit", "baseline", "show", "--dir", store))
    assert(rcH == 0 && outH.contains("Current Baseline"))
    assert(outH.contains("Categories:") && outH.contains("1 baseline(s)"), outH)

    // a scan with the SAME store diffs against the saved baseline even
    // though no previous scan exists; identical fixture snapshots →
    // clean baseline state in the report
    val report = tmp("cli-base-rpt").resolve("r.html").toString
    assert(cli(Seq("audit", "scan", "--input", fixtures,
      "--pipeline", "process-scan", "--out", store, "--report", report))._1 == 0)
    assert(Files.readString(Paths.get(report))
      .contains("No changes detected since last baseline."),
      "scan after baseline save must diff against the saved baseline")

    // clear refuses without --yes (click confirm-abort: exit 1, keep data)
    val (rcC, _, errC, _) = cli(Seq("audit", "baseline", "clear", "--dir", store))
    assert(rcC == 1 && errC.contains("--yes"))
    assert(cli(Seq("audit", "baseline", "show", "--dir", store))._2.contains("Current Baseline"))
    val (rcY, outY, _, _) = cli(Seq("audit", "baseline", "clear", "--dir", store, "--yes"))
    assert(rcY == 0 && outY.contains("Removed 1 baseline file(s)."))
    assert(cli(Seq("audit", "baseline", "show", "--dir", store))._2.contains("No baseline found."))
    // clearing an empty store is a friendly no-op, exit 0
    val (rcE, outE, _, _) = cli(Seq("audit", "baseline", "clear", "--dir", store, "--yes"))
    assert(rcE == 0 && outE.contains("No baselines to clear."))
  }

  test("cli: start composes scheduler + metrics + http + mcp; a scheduled tick lands in /jobs") {
    val store = tmp("cli-start").toString
    assert(cli(Seq("audit", "scan", "--input", fixtures, "--out", store))._1 == 0)
    def get(port: Int, path: String): String = {
      val c = URI.create(s"http://localhost:$port$path").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      try {
        assert(c.getResponseCode == 200, s"$path -> ${c.getResponseCode}")
        new String(c.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      } finally c.disconnect()
    }
    var sawTick = false
    val (rc, out, _, _) = cli(
      Seq("start", "--dir", store, "--port", "0", "--mcp", "--metrics-interval", "1"),
      httpHook = Some { port =>
        assert(get(port, "/health").contains("healthy"))
        assert(get(port, "/jobs").contains("metrics_sampling")) // registered schedule
        assert(get(port, "/audit/findings").contains("findings")) // store-backed data plane
        // the 1s-interval job's first fire: only the scheduler loop
        // registers JobRecords (ids "metrics-<ts>"), so seeing one
        // proves a tick ran end-to-end
        val deadline = System.currentTimeMillis() + 8000
        while (!sawTick && System.currentTimeMillis() < deadline) {
          sawTick = get(port, "/jobs").contains("\"job_id\":\"metrics-")
          if (!sawTick) Thread.sleep(200)
        }
      })
    assert(rc == 0, s"start: $out")
    assert(out.contains("agent running on port") && out.contains("mcp enabled"))
    assert(out.contains("mcp server_running: true"), s"mcp status: $out")
    assert(sawTick, "no scheduled metrics tick observed within 8s")
    val (rcU, _, errU, _) = cli(Seq("start")) // --dir required
    assert(rcU == 2 && errU.contains("usage error"))

    // reference precedence (cli.py:41-52): no --mcp flag + config with
    // mcp.enabled true → the MCP-flavored agent boots anyway
    val cfg = tmp("cli-start-cfg").resolve("config.yaml")
    Files.writeString(cfg,
      """mcp:
        |  enabled: true
        |  security_mode: "permissive"
        |""".stripMargin)
    val (rcC, outC, _, _) = cli(
      Seq("start", "--dir", store, "--port", "0", "--config", cfg.toString),
      httpHook = Some { port => assert(get(port, "/health").contains("healthy")) })
    assert(rcC == 0 && outC.contains("mcp enabled"), s"config-driven mcp: $outC")
    assert(outC.contains("mcp security_mode: permissive"), outC)

    // scheduler.enabled=false (agent.py:126): API up, schedule visibly
    // disabled, NO cadence jobs tick even past the 1s interval
    val cfg2 = tmp("cli-start-cfg2").resolve("config.yaml")
    Files.writeString(cfg2, "scheduler:\n  enabled: false\n")
    val (rcD, _, _, _) = cli(
      Seq("start", "--dir", store, "--port", "0", "--config", cfg2.toString,
        "--metrics-interval", "1"),
      httpHook = Some { port =>
        val jobs0 = get(port, "/jobs")
        assert(jobs0.contains("\"enabled\":false"), s"schedule not shown disabled: $jobs0")
        Thread.sleep(2500) // two intervals — a tick would have landed
        assert(!get(port, "/jobs").contains("\"job_id\":\"metrics-"),
          "disabled scheduler must not run cadence jobs")
      })
    assert(rcD == 0)
  }

  test("cli: malformed numeric flag values exit 2 (usage), not 1") {
    val root = tmp("cli-num-root")
    Files.writeString(root.resolve("a.txt"), "x")
    val idx = tmp("cli-num").resolve("files.parquet").toString
    assert(cli(Seq("index", "build", "--root", root.toString, "--out", idx))._1 == 0)
    val (rc, _, errS, _) = cli(Seq(
      "index", "search", "--index", idx, "--size", "abc"))
    assert(rc == 2, s"expected usage exit for non-numeric --size, got $rc ($errS)")
    assert(errS.contains("usage error"))
  }

  test("cli: serve http binds, answers /health through the hook, and stops") {
    val saved = tmp("cli-http").toString
    // a saved scan so the API has data behind it
    assert(cli(Seq("audit", "scan", "--input", fixtures, "--out", saved))._1 == 0)
    var served: Option[String] = None
    val (rc, out, _, _) = cli(
      Seq("serve", "http", "--dir", saved, "--port", "0"),
      httpHook = Some { port =>
        val c = URI.create(s"http://localhost:$port/health").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        try {
          assert(c.getResponseCode == 200)
          served = Some(new String(c.getInputStream.readAllBytes(), StandardCharsets.UTF_8))
        } finally c.disconnect()
      })
    assert(rc == 0 && out.contains("serving http on port"))
    assert(served.exists(_.contains("healthy")), s"health body: $served")
  }

  test("cli: serve mcp speaks newline-delimited JSON-RPC over the injected stdio") {
    val stdin =
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}
        |{"jsonrpc":"2.0","id":2,"method":"tools/list"}
        |""".stripMargin
    val (rc, _, _, mcp) = cli(Seq("serve", "mcp"), stdin = stdin)
    assert(rc == 0)
    val lines = mcp.linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.size == 2, s"mcp replies: $mcp")
    assert(lines.head.contains("\"result\"") && lines.head.contains("protocolVersion"))
    assert(lines(1).contains("list_directory")) // a known tool name
  }
}
