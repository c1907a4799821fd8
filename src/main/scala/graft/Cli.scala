package graft

import java.io.{InputStream, PrintStream}
import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyze.{AuditScan, Findings}
import graft.etl.EtlJobs
import graft.index.FileIndex
import graft.pipeline.{GraftConfig, HtmlReport, ResultStore}
import graft.serve.{HttpApi, Mcp}

/** Command-line entry point — the engine twin of the reference's CLI
  * (/root/reference/main.py:5-7 dispatching src/cli.py: the `click`
  * group at cli.py:27-36, scan options cli.py:162-172, findings
  * filters cli.py:263-267). Verbs are THIN dispatch onto the library
  * modules; nothing here owns logic beyond argument parsing and
  * console formatting.
  *
  * Exit-code convention mirrors click's: 0 success, 1 runtime failure
  * (a verb ran and failed), 2 usage error (unknown verb / bad flags —
  * click's `UsageError.exit_code`).
  *
  * Verbs:
  * {{{
  * graft config show [--config PATH]
  * graft etl run --op extract|transform|load|full_etl --input P
  *       [--output P] [--transform NAME] [--option k=v]...
  * graft index build --root DIR --out PATH [--hash sha256] [--glob G] [--no-hash]
  * graft index search --index PATH (--name Q | --hash H | --size N) [--limit N]
  * graft index stats --index PATH
  * graft index export --index PATH --out PATH [--format json|csv]
  * graft dups --index PATH [--report]
  * graft audit scan --input DIR [--pipeline daily|forensic|process-scan|full]
  *       [--out DIR] [--report PATH]
  * graft audit findings --dir DIR [--limit N] [--severity S] [--domain D]
  * graft audit baseline save --input DIR [--dir D]
  * graft audit baseline show [--dir D]
  * graft audit baseline clear [--dir D] [--yes]
  * graft report --dir DIR --out PATH [--title T] [--top N]
  * graft serve http --dir DIR [--port N]
  * graft serve mcp
  * graft start --dir DIR [--port N] [--mcp] [--metrics-interval N]
  *       [--config PATH]   # flags > config.yaml (mcp.enabled,
  *                         # monitoring.metrics_port/health_check_interval)
  * }}}
  */
object Cli {

  private val Usage: String =
    """usage: graft <command> [options]
      |
      |commands:
      |  config show            show effective configuration
      |  etl run                run an ETL job (extract/transform/load/full_etl)
      |  index build            index a directory tree (metadata + content hash)
      |  index search           search a saved index by name/hash/size
      |  index stats            totals for a saved index
      |  index export           export a saved index (json/csv, path-ordered)
      |  dups                   duplicate groups (and wasted-bytes report) from an index
      |  audit scan             parse tool outputs under a directory into findings
      |  audit findings         show saved findings (filter by severity/domain)
      |  audit baseline save    capture collector state as the diff baseline
      |  audit baseline show    newest-baseline metadata and per-category counts
      |  audit baseline clear   delete saved baselines (requires --yes)
      |  report                 render the HTML findings report
      |  serve http             serve the monitoring/audit HTTP API
      |  serve mcp              serve the MCP filesystem tools over stdio
      |  start                  run the composed agent (scheduler + metrics + http [+ mcp])
      |""".stripMargin

  def main(args: Array[String]): Unit =
    sys.exit(run(args.toSeq, () => GraftSession.get(), Console.out, Console.err))

  /** Testable core: injected session factory, console streams, stdio
    * for `serve mcp`, and an optional HTTP hook — when set, `serve
    * http` starts, hands the bound port to the hook, stops, and
    * returns (production blocks until stdin closes, the reference
    * agent's lifetime).
    */
  private[graft] def run(
      args: Seq[String],
      sparkF: () => SparkSession,
      out: PrintStream,
      err: PrintStream,
      mcpIn: InputStream = System.in,
      mcpOut: java.io.OutputStream = System.out,
      httpHook: Option[Int => Unit] = None): Int = {

    // --key value / --flag parsing; first non-flag tokens are the verb
    // path. Boolean flags are PER-VERB (`extraFlags`): `dups --report`
    // is a flag, `audit scan --report PATH` takes a value — a global
    // flag set could not serve both.
    def parse(
        rest: Seq[String],
        extraFlags: Set[String] = Set.empty): Either[String, (Map[String, String], Set[String])] = {
      val flags = Set("--no-hash", "--dry-run") ++ extraFlags
      var opts = Map.empty[String, String]
      var set = Set.empty[String]
      var i = 0
      val multi = scala.collection.mutable.ListBuffer.empty[String] // repeated --option k=v
      while (i < rest.length) {
        val a = rest(i)
        if (!a.startsWith("--")) return Left(s"unexpected argument: $a")
        else if (flags.contains(a)) { set += a; i += 1 }
        else if (i + 1 >= rest.length) return Left(s"missing value for $a")
        else {
          if (a == "--option") multi += rest(i + 1) else opts += (a -> rest(i + 1))
          i += 2
        }
      }
      if (multi.nonEmpty) opts += ("--option" -> multi.mkString("\u0000"))
      Right((opts, set))
    }

    def req(opts: Map[String, String], key: String): String =
      opts.getOrElse(key, throw new UsageException(s"missing required $key"))

    def table(df: DataFrame, limit: Int): Unit = {
      // showString is private; a bounded collect of an already-limited
      // frame is the CLI's display contract (never row-scale)
      val rows = df.limit(limit)
      val cols = rows.columns
      out.println(cols.mkString("\t"))
      rows.collect().foreach(r =>
        out.println(cols.indices.map(i => String.valueOf(r.get(i))).mkString("\t")))
    }

    try {
      args.toList match {
        case Nil | ("--help" | "-h") :: _ =>
          out.println(Usage); 0

        case "config" :: "show" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val cfg = GraftConfig.loadOrDefaults(
            Paths.get(opts.getOrElse("--config", "config.yaml")))
          if (cfg.values.isEmpty) out.println("(no configuration values)")
          else cfg.values.toSeq.sorted.foreach { case (k, v) => out.println(s"$k: $v") }
          0

        case "etl" :: "run" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val op = req(opts, "--op") match {
            case "extract" => EtlJobs.Extract
            case "transform" => EtlJobs.Transform
            case "load" => EtlJobs.Load
            case "full_etl" => EtlJobs.FullEtl
            case o => throw new UsageException(s"unknown --op $o")
          }
          val params = opts.get("--option").toSeq
            .flatMap(_.split("\u0000").toSeq)
            .map { kv =>
              kv.split("=", 2) match {
                case Array(k, v) => k -> v
                case _ => throw new UsageException(s"--option needs k=v, got $kv")
              }
            }.toMap
          val job = EtlJobs.EtlJob(
            id = opts.getOrElse("--id", s"cli-${System.currentTimeMillis()}"),
            operation = op,
            sourcePath = req(opts, "--input"),
            destinationPath = opts.get("--output"),
            transform = opts.get("--transform"),
            parameters = params)
          val res = EtlJobs.execute(sparkF(), job)
          out.println(s"job ${res.job.id}: ${res.status}" +
            res.rowsWritten.map(n => s" ($n rows)").getOrElse(""))
          res.error.foreach(e => err.println(s"error: $e"))
          if (res.status == "completed") 0 else 1

        case "index" :: "build" :: rest =>
          val (opts, flags) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val idx =
            if (flags.contains("--no-hash"))
              FileIndex.indexMetadata(s, req(opts, "--root"), opts.get("--glob"))
            else FileIndex.indexWithHash(s, req(opts, "--root"),
              opts.getOrElse("--hash", "sha256"), opts.get("--glob"))
          FileIndex.save(idx, req(opts, "--out"))
          val n = s.read.parquet(req(opts, "--out")).count()
          out.println(s"indexed $n files -> ${req(opts, "--out")}")
          0

        case "index" :: "search" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val idx = s.read.parquet(req(opts, "--index"))
          val hits = (opts.get("--name"), opts.get("--hash"), opts.get("--size")) match {
            case (Some(q), None, None) => FileIndex.searchByName(idx, q)
            case (None, Some(h), None) => FileIndex.searchByHash(idx, h)
            case (None, None, Some(n)) => FileIndex.searchBySize(idx, n.toLong)
            case _ => throw new UsageException("need exactly one of --name/--hash/--size")
          }
          table(hits.select("file_path", "file_name", "file_size"),
            opts.getOrElse("--limit", "100").toInt)
          0

        case "index" :: "stats" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          table(FileIndex.stats(s.read.parquet(req(opts, "--index"))), 1)
          0

        case "index" :: "export" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          FileIndex.export(s.read.parquet(req(opts, "--index")),
            req(opts, "--out"), opts.getOrElse("--format", "json"))
          out.println(s"exported -> ${req(opts, "--out")}")
          0

        case "dups" :: rest =>
          val (opts, flags) = parse(rest, extraFlags = Set("--report"))
            .fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val groups = FileIndex.duplicateGroups(s.read.parquet(req(opts, "--index")))
          if (flags.contains("--report")) table(FileIndex.duplicateReport(groups), 1)
          else table(
            groups.select(col("file_hash"), col("file_size"), col("file_count"),
              concat_ws(", ", transform(col("files"), f => f("file_path"))).as("paths")),
            opts.getOrElse("--limit", "100").toInt)
          0

        // `audit baseline` (reference cli.py:424-530): the baseline is
        // a SAVED collector snapshot the next scan's diff compares
        // against — managed as `baseline_*` sets in the same result
        // store the scans use. Default dir matches the reference's
        // `./data/audit/baselines`.
        case "audit" :: "baseline" :: "save" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val dir = opts.getOrElse("--dir", "./data/audit/baselines")
          out.println("Running collectors to capture system state...")
          // collectors-only pipeline — the reference's baseline_capture
          // (process_snapshot/service_auditor/network_mapper/
          // persistence_auditor); our agreed scope parses their
          // conventional snapshot files under --input
          val (runRes, findings) = AuditScan.scan(s, req(opts, "--input"), "process-scan")
          val captured = runRes.stages.filter(_.status == "completed").map(_.name)
          if (captured.isEmpty) {
            err.println("No data collected. Cannot save baseline.")
            1
          } else {
            val p = ResultStore.save(findings, dir, "baseline", System.currentTimeMillis())
            out.println(s"Baseline saved to $p")
            out.println(s"Collectors captured: ${captured.mkString(", ")}")
            0
          }

        case "audit" :: "baseline" :: "show" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val dir = opts.getOrElse("--dir", "./data/audit/baselines")
          // headOption, not a :: pattern — list() returns Seq, whose
          // concrete type is not contractually a List
          ResultStore.list(dir, "baseline") match {
            case all if all.isEmpty =>
              out.println("No baseline found.")
              out.println("Run 'graft audit baseline save' to create one.")
              0
            case all =>
              val newest = all.head
              val s = sparkF()
              val ts = newest.split('_').last.toLongOption.getOrElse(0L)
              out.println("Current Baseline")
              out.println("=" * 50)
              out.println(s"  Path:       $newest")
              out.println(s"  Modified:   ${java.time.Instant.ofEpochMilli(ts)}")
              // per-category counts — the engine's findings carry the
              // category as `domain`
              val byDomain = ResultStore.readJsonSet(s, newest, Some(Findings.schema))
                .groupBy("domain").count()
                .orderBy("domain")
                .collect().map(r => s"${r.get(0)}=${r.getLong(1)}")
              out.println(s"  Categories: ${byDomain.mkString(", ")}")
              out.println(s"  Files:      ${all.size} baseline(s) on disk")
              0
          }

        case "audit" :: "baseline" :: "clear" :: rest =>
          val (opts, flags) = parse(rest, extraFlags = Set("--yes"))
            .fold(m => throw new UsageException(m), identity)
          val dir = opts.getOrElse("--dir", "./data/audit/baselines")
          val n = ResultStore.list(dir, "baseline").size
          if (n == 0) { out.println("No baselines to clear."); 0 }
          else if (!flags.contains("--yes")) {
            // click.confirm(abort=True) without a tty aborts: exit 1,
            // nothing deleted
            err.println(s"Delete $n baseline file(s) from $dir? pass --yes to confirm")
            1
          } else {
            val removed = ResultStore.clear(dir, "baseline")
            out.println(s"Removed $removed baseline file(s).")
            0
          }

        case "audit" :: "scan" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val pipeline = opts.getOrElse("--pipeline", "daily")
          val (runRes, findings) = AuditScan.scan(s, req(opts, "--input"), pipeline)
          // pin: the stage statuses already ran the plan shape; counts +
          // optional save + report below reuse one materialization
          val pinned = findings.cache()
          // the diff reference must load BEFORE this run's save appends
          // to the same store; an explicitly SAVED baseline (`audit
          // baseline save` into the same dir) wins over the rolling
          // previous scan — the reference's BaselineDiffer likewise
          // prefers its saved baseline file
          val prevScan = opts.get("--out")
            .flatMap(dir => ResultStore.loadLatest(s, dir, "baseline", Some(Findings.schema))
              .orElse(ResultStore.loadLatest(s, dir, "scan", Some(Findings.schema))))
          try {
            val total = pinned.count()
            runRes.stages.zipWithIndex.foreach { case (st, i) =>
              out.println(f"  [${i + 1}/${runRes.stages.size}] ${st.name}%-18s ${st.status}%-9s ${st.durationSec}%.2fs" +
                st.error.map(e => s" ($e)").getOrElse(""))
            }
            val bySev = pinned.groupBy("severity").count()
              .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
            out.println(s"$total findings " +
              Seq("critical", "high", "medium", "low", "info")
                .map(sv => s"$sv=${bySev.getOrElse(sv, 0L)}").mkString("(", " ", ")"))
            opts.get("--out").foreach { dir =>
              val p = ResultStore.save(pinned, dir, "scan", System.currentTimeMillis())
              out.println(s"saved -> $p")
            }
            opts.get("--report").foreach { p =>
              // Baseline Comparison renders only when a result store is
              // in play (--out): first run → notice, else per-domain ±
              // vs the previous saved scan
              val baseline = opts.get("--out")
                .map(_ => HtmlReport.findingsBaseline(pinned, prevScan))
              HtmlReport.write(pinned, s"Audit Scan ($pipeline)", p,
                baseline = baseline)
              out.println(s"report -> $p")
            }
            if (runRes.failed) 1 else 0
          } finally { pinned.unpersist(blocking = false): Unit }

        case "audit" :: "findings" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val saved = ResultStore.loadLatest(s, req(opts, "--dir"), "scan", Some(Findings.schema))
            .getOrElse(throw new IllegalStateException(
              s"no saved scans under ${req(opts, "--dir")} -- run 'graft audit scan --out' first"))
          val filtered = Findings.where(saved,
            severity = opts.get("--severity"), domain = opts.get("--domain"))
          table(
            Findings.topFindings(filtered, opts.getOrElse("--limit", "20").toInt)
              .select("severity", "domain", "title", "resource", "source"),
            opts.getOrElse("--limit", "20").toInt)
          0

        case "report" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val recent = ResultStore.loadRecent(s, req(opts, "--dir"), "scan", 2, Some(Findings.schema))
          val saved = recent.headOption.map(_._2)
            .getOrElse(throw new IllegalStateException(
              s"no saved scans under ${req(opts, "--dir")} -- run 'graft audit scan --out' first"))
          // second-most-recent scan is the baseline; a single saved
          // scan renders the first-run notice
          HtmlReport.write(saved, opts.getOrElse("--title", "Audit Report"),
            req(opts, "--out"), topN = opts.getOrElse("--top", "100").toInt,
            baseline = Some(HtmlReport.findingsBaseline(
              saved, recent.lift(1).map(_._2))))
          out.println(s"report -> ${req(opts, "--out")}")
          0

        case "serve" :: "http" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          val dir = req(opts, "--dir")
          val api = new HttpApi(s,
            () => ResultStore.loadLatest(s, dir, "scan", Some(Findings.schema))
              .getOrElse(Findings.toDS(s, Nil).toDF()))
          val port = api.start(opts.getOrElse("--port", "8080").toInt)
          out.println(s"serving http on port $port (EOF on stdin stops)")
          httpHook match {
            case Some(hook) => try hook(port) finally api.stop()
            case None =>
              try { while (mcpIn.read() != -1) () } finally api.stop()
          }
          0

        case "serve" :: "mcp" :: rest =>
          val (opts, _) = parse(rest).fold(m => throw new UsageException(m), identity)
          // Mcp.configFromEnv is the single owner of the env-var config
          // surface (incl. GRAFT_MCP_ENV_KEYS / GRAFT_MCP_ENV_PREFIXES)
          // so this verb and `graft.serve.Mcp.main` cannot diverge;
          // explicit flags override their env twins
          val cfg = Mcp.configFromEnv(
            roots = opts.get("--allow")
              .map(_.split(java.io.File.pathSeparator).toSeq.filter(_.nonEmpty)),
            mode = opts.get("--mode"))
          new Mcp.McpServer(new Mcp.Tools(cfg)).serve(mcpIn, mcpOut)
          0

        // the reference's `python main.py start [--mcp]` (cli.py:38-64):
        // one foreground command composing scheduler + metrics sampling
        // + the HTTP API (+ the in-process MCP agent with --mcp), with
        // clean shutdown on stdin EOF. All composition lives in
        // serve.AgentRuntime; this verb is flags + config + lifetime.
        case "start" :: rest =>
          val (opts, flags) = parse(rest, extraFlags = Set("--mcp"))
            .fold(m => throw new UsageException(m), identity)
          val s = sparkF()
          // reference precedence (cli.py:41-52 + agent.py:34-43):
          // explicit flags > config.yaml > built-in defaults. With no
          // --mcp flag, `mcp.enabled` in the config decides the agent
          // flavor — exactly the reference's use_mcp=None branch.
          val cfg = GraftConfig.loadOrDefaults(
            Paths.get(opts.getOrElse("--config", "config.yaml")))
          val mcpOn = flags.contains("--mcp") ||
            cfg.getBoolean("mcp.enabled", default = false)
          val mcpCfg =
            if (mcpOn)
              Some(Mcp.configFromEnv(
                roots = opts.get("--allow")
                  .map(_.split(java.io.File.pathSeparator).toSeq.filter(_.nonEmpty)),
                mode = opts.get("--mode").orElse(cfg.get("mcp.security_mode"))))
            else None
          val handle = graft.serve.AgentRuntime.start(
            s, req(opts, "--dir"),
            port = opts.get("--port").map(_.toInt)
              .getOrElse(cfg.getInt("monitoring.metrics_port", 8080)),
            mcp = mcpCfg,
            metricsIntervalSec = opts.get("--metrics-interval").map(_.toInt)
              .getOrElse(cfg.getInt("monitoring.health_check_interval", 30)),
            schedulerEnabled = cfg.getBoolean("scheduler.enabled", default = true),
            maxConcurrent = cfg.getInt("scheduler.max_concurrent_jobs", 2))
          out.println(s"agent running on port ${handle.port}" +
            (if (mcpCfg.isDefined) " (mcp enabled)" else "") +
            " (EOF on stdin stops)")
          handle.mcpStatus.foreach(st =>
            st.toSeq.sorted.foreach { case (k, v) => out.println(s"  mcp $k: $v") })
          httpHook match {
            case Some(hook) => try hook(handle.port) finally handle.stop()
            case None =>
              try { while (mcpIn.read() != -1) () } finally handle.stop()
          }
          0

        case verb :: _ =>
          err.println(s"unknown command: $verb\n\n$Usage"); 2
      }
    } catch {
      case u: UsageException =>
        err.println(s"usage error: ${u.getMessage}\n\n$Usage"); 2
      case e: NumberFormatException =>
        // a non-numeric value for a numeric flag is a USAGE error
        // (click's BadParameter exits 2), not a runtime failure
        err.println(s"usage error: bad numeric flag value: ${e.getMessage}\n\n$Usage"); 2
      case e: Exception =>
        err.println(s"error: ${Option(e.getMessage).getOrElse(e.toString)}"); 1
    }
  }

  private final class UsageException(msg: String) extends RuntimeException(msg)
}
