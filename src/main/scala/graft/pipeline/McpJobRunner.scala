package graft.pipeline

import java.nio.file.{Files, Paths}

import org.json4s._

import graft.serve.{Mcp, McpClient}

/** Scheduler-through-MCP composition (ST5 × S15/S16; reference
  * /root/reference/src/scheduler_mcp.py:17-41,131-185): the reference's
  * `MCPJobScheduler(use_mcp=True)` executes each due job's script via
  * the MCP client's `execute_command` tool instead of a direct
  * subprocess, which routes every scheduled run through the server's
  * command ALLOWLIST and EVENT LOG — the audit surface operators watch.
  *
  * This object is the execution leg only; the schedule algebra stays in
  * [[Scheduler]] (clockless, pure) and composes here via
  * [[Scheduler.due]]/[[Scheduler.afterRun]]. Deliberately driver-side:
  * launching subprocesses is orchestration, not relational work — no
  * Spark job is involved, exactly like the reference (asyncio, not
  * pandas).
  *
  * Env parity, fixed properly: the reference passes job identity via
  * process-global environment mutation around the in-process tool call
  * (scheduler_mcp.py:162-171, `os.environ[key] = value` — a hack that
  * only works because its MCP server shares the scheduler's process;
  * it also RACES concurrent jobs overwriting each other's JOB_ID). A
  * JVM cannot mutate its own environment, so the `execute_command`
  * tool schema here carries an explicit per-call `env` overlay
  * instead — the scheduled script sees the reference's
  * `JOB_ID`/`JOB_NAME`/`JOB_PARAMS` variables, race-free under
  * concurrent jobs, in BOTH legs. Identity additionally rides ARGV
  * (`<job_id> <job_name> <json_params>` as the three trailing
  * arguments) for scripts that prefer arguments over environment.
  */
object McpJobRunner {

  /** `get_mcp_status` (reference agent_mcp.py:116-127), surfaced in
    * every [[JobResult]] so a job's audit row says HOW it ran.
    */
  final case class McpStatus(
      enabled: Boolean,
      serverRunning: Boolean,
      eventsCount: Int,
      securityMode: String)

  final case class JobResult(
      jobId: String,
      name: String,
      returncode: Int,
      stdout: String,
      stderr: String,
      mcpStatus: McpStatus)

  /** Exit code for a missing script — the runner is TOTAL (one absent
    * file must not kill the scheduler loop; the reference logs and
    * returns, scheduler_mcp.py:135-142) but the failure is explicit in
    * the result, shell-conventionally (127 = command not found).
    */
  val MissingScriptRc = 127

  def mcpStatus(
      session: Option[McpClient.Session],
      server: Option[Mcp.McpServer]): McpStatus =
    if (session.isEmpty) McpStatus(enabled = false, serverRunning = false, 0, "")
    else McpStatus(
      enabled = true,
      serverRunning = server.isDefined || session.exists(_.isConnected),
      eventsCount = server.map(_.tools.events.size).getOrElse(0),
      securityMode = server.map(_.tools.config.securityMode).getOrElse("unknown"))

  /** Execute one job's script (scheduler_mcp.py:131-209).
    *
    *  - `session = Some(_)` — the `use_mcp=True` leg: the existence
    *    probe goes through `get_file_info` and the run through
    *    `execute_command`, so the server's command allowlist, cwd
    *    sandbox, bounded output capture, timeout, and event log ALL
    *    apply to the scheduled run; a security refusal surfaces as a
    *    loud nonzero result carrying the server's error text.
    *  - `session = None` — the direct leg (`_execute_script_direct`):
    *    a plain subprocess with captured stdout/stderr.
    *
    * Both legs run `interpreter scriptsDir/script <id> <name> <params>`
    * with cwd = scriptsDir and return the same [[JobResult]] shape;
    * `server` (when the session is an in-process loopback) feeds the
    * event-count/security fields of the embedded [[McpStatus]].
    */
  def runJob(
      job: Scheduler.Job,
      scriptsDir: String,
      script: String,
      params: Map[String, String] = Map.empty,
      interpreter: String = "python3",
      session: Option[McpClient.Session] = None,
      server: Option[Mcp.McpServer] = None,
      timeoutSeconds: Long = 300L): JobResult = {
    val scriptPath = Paths.get(scriptsDir).resolve(script).toString
    val status = () => mcpStatus(session, server)
    val paramsJson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        JObject(params.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })))
    val argv = Seq(scriptPath, job.id, job.name, paramsJson)
    // scheduler_mcp.py:162-166's env_vars, per-call instead of global
    val envVars = Map(
      "JOB_ID" -> job.id, "JOB_NAME" -> job.name, "JOB_PARAMS" -> paramsJson)
    val exists = session match {
      case Some(s) => s.fileExists(scriptPath)
      case None => Files.isRegularFile(Paths.get(scriptPath))
    }
    if (!exists)
      return JobResult(job.id, job.name, MissingScriptRc, "",
        s"script not found: $scriptPath", status())
    session match {
      case Some(s) =>
        // raw callTool, not Session.executeCommand: the tool returns a
        // JSON payload for a RAN script (exit code inside, rc != 0
        // included) but plain "Error: ..." text for a server-side
        // REFUSAL (allowlist, cwd sandbox, timeout) — the wrapper's
        // unconditional JSON parse would turn that audit-relevant
        // refusal text into a bare parse exception
        val a = JObject(
          "command" -> JString(interpreter),
          "args" -> JArray(argv.map(JString(_): JValue).toList),
          "cwd" -> JString(scriptsDir),
          "env" -> JObject(envVars.toList.sortBy(_._1)
            .map { case (k, v) => k -> (JString(v): JValue) }))
        val r = s.callTool("execute_command", a)
        scala.util.Try(org.json4s.jackson.JsonMethods.parse(r.text)) match {
          case scala.util.Success(body) =>
            def str(k: String) = body \ k match { case JString(x) => x; case _ => "" }
            val rc = body \ "returncode" match {
              case JInt(n) => n.toInt
              case _ => -1
            }
            JobResult(job.id, job.name, rc, str("stdout"), str("stderr"), status())
          case scala.util.Failure(_) =>
            JobResult(job.id, job.name, -1, "", r.text, status())
        }
      case None =>
        import scala.jdk.CollectionConverters._
        val pb = new ProcessBuilder((interpreter +: argv).asJava)
        envVars.foreach { case (k, v) => pb.environment().put(k, v) }
        pb.directory(new java.io.File(scriptsDir))
        val proc = pb.start()
        proc.getOutputStream.close()
        // CONCURRENT drains (never sequential readAllBytes): a script
        // that fills the ~64 KiB stderr pipe before closing stdout
        // would deadlock a sequential read forever — the scheduler
        // tick must survive stderr-heavy failures (the MCP leg gets
        // this from the server's BoundedDrain threads; the direct leg
        // needs its own)
        def drain(in: java.io.InputStream): (Thread, java.io.ByteArrayOutputStream) = {
          val buf = new java.io.ByteArrayOutputStream()
          val t = new Thread(() =>
            try in.transferTo(buf)
            catch { case scala.util.control.NonFatal(_) => () })
          t.setDaemon(true); t.start(); (t, buf)
        }
        val (outT, outB) = drain(proc.getInputStream)
        val (errT, errB) = drain(proc.getErrorStream)
        // bounded wait: a hung script must not wedge the scheduler —
        // report the timeout as a failed run (the reference's asyncio
        // tasks are cancellable; a blocking waitFor isn't)
        val finished = proc.waitFor(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
        if (!finished) proc.destroyForcibly().waitFor(5, java.util.concurrent.TimeUnit.SECONDS)
        outT.join(5000); errT.join(5000)
        val out = new String(outB.toByteArray, "UTF-8")
        val err0 = new String(errB.toByteArray, "UTF-8")
        if (finished)
          JobResult(job.id, job.name, proc.exitValue(), out, err0, status())
        else
          JobResult(job.id, job.name, -1, out,
            s"job timed out after ${timeoutSeconds}s and was killed" +
              (if (err0.nonEmpty) s"; stderr so far: $err0" else ""),
            status())
    }
  }

  /** One scheduler tick, MCP-composed: run every [[Scheduler.due]] job
    * through [[runJob]] (sequentially — the reference caps concurrency
    * at 2 via its task map; `due` applies the same cap per tick) and
    * re-arm with [[Scheduler.afterRun]]. Returns the advanced job
    * states zipped with their results. `script` maps a job to its
    * script file under `scriptsDir` (the reference stores it on the
    * job record; the pure [[Scheduler.Job]] deliberately doesn't).
    */
  def tick(
      jobs: Seq[Scheduler.Job],
      now: java.time.LocalDateTime,
      scriptsDir: String,
      script: Scheduler.Job => String,
      params: Scheduler.Job => Map[String, String] = _ => Map.empty,
      interpreter: String = "python3",
      maxConcurrent: Int = 2,
      session: Option[McpClient.Session] = None,
      server: Option[Mcp.McpServer] = None): (Seq[Scheduler.Job], Seq[JobResult]) = {
    val fired = Scheduler.due(jobs, now, running = Set.empty, maxConcurrent)
    val results = fired.map(j =>
      runJob(j, scriptsDir, script(j), params(j), interpreter, session, server))
    val firedIds = fired.map(_.id).toSet
    val advanced = jobs.map(j =>
      if (firedIds.contains(j.id)) Scheduler.afterRun(j, now) else j)
    (advanced, results)
  }
}
