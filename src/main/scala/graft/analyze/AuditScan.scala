package graft.analyze

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.parse.ToolParsers
import graft.pipeline.Pipeline

/** Directory-driven audit scan composition — the engine twin of the
  * reference's pipeline presets (`create_daily_pipeline` /
  * `create_forensic_pipeline`, /root/reference/src/audit/pipeline.py:
  * 398-470, 514-545, and the process-scan collector set the HTTP route
  * runs). The reference LAUNCHES the third-party tools and parses what
  * they write; this engine's agreed scope (SURVEY §7 — no
  * tool_manager/Sysmon lifecycle) starts at the tool OUTPUT files:
  * each preset names the conventional output files, and `scan` parses
  * whichever exist under a directory into one normalized findings
  * frame via the [[graft.parse.ToolParsers]] fixture-pinned parsers.
  *
  * Composition runs as [[Pipeline.run]] stages (one per tool), so the
  * CLI and HTTP surfaces report the reference's per-step
  * status/duration shape; the data plane stays lazy — Catalyst sees
  * one unioned plan, and nothing is collected here.
  */
object AuditScan {

  /** A tool's conventional output file and its parser (file path →
    * findings frame in the parser's pre-normalized shape — [[toAll]]
    * applies [[ToolParsers.toFindings]]).
    */
  final case class Tool(
      name: String,
      file: String,
      parse: (SparkSession, String) => DataFrame)

  private def csv(s: SparkSession, p: String): DataFrame =
    s.read.option("header", "true").csv(p)
  private def jsonArr(s: SparkSession, p: String): DataFrame =
    s.read.option("multiLine", "true").json(p)
  private def wholeText(s: SparkSession, p: String): DataFrame =
    s.read.option("wholetext", "true").text(p)

  /** Scanner tools (pipeline.py "steps"): third-party scan outputs. */
  val Scanners: Seq[Tool] = Seq(
    Tool("yara_x", "yara_output.json", (s, p) => ToolParsers.yara(jsonArr(s, p))),
    Tool("hollows_hunter", "hollows_hunter_output.json",
      (s, p) => ToolParsers.hollowsHunter(wholeText(s, p))),
    Tool("hayabusa", "hayabusa_output.csv", (s, p) => ToolParsers.hayabusa(csv(s, p))),
    Tool("autorunsc", "autorunsc_output.csv", (s, p) => ToolParsers.autorunsc(csv(s, p))),
    Tool("sigcheck", "sigcheck_output.csv", (s, p) => ToolParsers.sigcheck(csv(s, p))),
    Tool("listdlls", "listdlls_output.txt", (s, p) => ToolParsers.listdlls(wholeText(s, p))),
    Tool("chainsaw", "chainsaw_output.json", (s, p) => ToolParsers.chainsaw(jsonArr(s, p))),
    Tool("clamav", "clamscan_output.log", (s, p) => ToolParsers.clamav(s.read.text(p))))

  /** Collector snapshots (PowerShell collectors) → analyzer findings. */
  val Collectors: Seq[Tool] = Seq(
    Tool("tcp_connections", "tcp_connection_output.json",
      (s, p) => ToolParsers.networkFindings(ToolParsers.tcpConnections(
        s.read.schema(ToolParsers.tcpConnectionSchema).option("multiLine", "true").json(p)))),
    Tool("processes", "win32_process_output.json",
      (s, p) => ToolParsers.processFindings(ToolParsers.processes(
        s.read.schema(ToolParsers.win32ProcessSchema).option("multiLine", "true").json(p)))),
    Tool("services", "win32_service_output.json",
      (s, p) => ToolParsers.serviceFindings(ToolParsers.services(jsonArr(s, p)))),
    Tool("scheduled_tasks", "scheduled_tasks_output.json",
      (s, p) => ToolParsers.taskFindings(ToolParsers.scheduledTasks(jsonArr(s, p)))),
    Tool("run_keys", "run_keys_output.json",
      (s, p) => ToolParsers.runKeyFindings(ToolParsers.runKeys(jsonArr(s, p)))))

  private val byName: Map[String, Tool] =
    (Scanners ++ Collectors).map(t => t.name -> t).toMap

  /** Preset → tool names, mirroring the reference's pipeline builders:
    * daily (pipeline.py:398-470), forensic (pipeline.py:514-545),
    * process-scan (the collector set), full (everything).
    */
  val Pipelines: Map[String, Seq[String]] = Map(
    "daily" -> Seq("yara_x", "hollows_hunter", "hayabusa", "autorunsc", "sigcheck", "listdlls"),
    "forensic" -> Seq("chainsaw", "hayabusa"),
    "process-scan" -> Collectors.map(_.name),
    "full" -> (Scanners ++ Collectors).map(_.name))

  /** Parse every tool of `pipeline` whose conventional output file
    * exists under `dir`; a named tool with no file is reported
    * "skipped" (the reference marks absent tools the same way). Returns
    * the per-step results and the combined NORMALIZED findings frame
    * (empty-schema-safe: at least one parsed tool is required — no
    * files at all is an error, not an empty report).
    */
  def scan(spark: SparkSession, dir: String, pipeline: String = "daily"): (Pipeline.RunResult, DataFrame) = {
    val tools = Pipelines.getOrElse(pipeline,
      throw new IllegalArgumentException(
        s"unknown pipeline '$pipeline' (have: ${Pipelines.keys.toSeq.sorted.mkString(", ")})"))
      .map(byName)
    val present = tools.filter(t => Files.isRegularFile(Paths.get(dir, t.file)))
    require(present.nonEmpty,
      s"no ${pipeline} tool outputs found under $dir (expected any of: " +
        s"${tools.map(_.file).mkString(", ")})")
    val stages: Seq[(String, Pipeline.Stage)] = present.map { t =>
      t.name -> ((ctx: Pipeline.Context) => {
        val f = ToolParsers.toFindings(t.parse(spark, Paths.get(dir, t.file).toString))
        // Validity probe: without it the stage only CONSTRUCTS a lazy
        // plan (plus eager schema inference), so a THROWN parse failure
        // would surface later at the consumer's first action, attributed
        // to no stage. count() forces a full read+parse of THIS tool's
        // file (snapshot-sized — one small job; limit(1) would stop at
        // the first row and still miss an error at row 500), at the cost
        // of re-reading the file when the combined frame is consumed.
        // Honest limit: the readers run Spark's default PERMISSIVE mode,
        // which NULLS corrupt records rather than throwing — the probe
        // catches structural failures (unreadable file, broken JSON
        // array, schema explosion), not per-record corruption; zero rows
        // is a valid outcome (empty parseable file).
        f.count()
        ctx + ("findings" -> ctx.get("findings").map(_.unionByName(f)).getOrElse(f))
      })
    }
    val run = Pipeline.run(stages, stopOnFailure = false)
    val skipped = tools.filterNot(present.contains).map(t =>
      Pipeline.StageResult(t.name, "skipped", Some(s"${t.file} not found"), 0.0))
    val full = Pipeline.RunResult(run.context, run.stages ++ skipped)
    (full, run.context.getOrElse("findings",
      throw new IllegalStateException(
        s"every ${pipeline} parser failed: " +
          run.stages.flatMap(_.error).mkString("; "))))
  }
}
