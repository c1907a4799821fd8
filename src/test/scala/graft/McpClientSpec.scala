package graft

import org.json4s._

import graft.serve.{Mcp, McpAgent, McpClient}

/** MCP CLIENT + agent loop (the reference's mcp_client.py /
  * agent_mcp.py surface): wire-level round trips against the real
  * [[Mcp.McpServer]] over the loopback transport, the reference's
  * error conventions, and the agent's MCP-routed extract bridge.
  */
class McpClientSpec extends SparkSpecBase {

  private def sandboxAgent(): (java.nio.file.Path, McpAgent.Agent) = {
    val root = java.nio.file.Files.createTempDirectory("graft_mcp_cli")
    (root, McpAgent(Mcp.McpConfig(allowedPaths = Seq(root.toString))))
  }

  test("scheduler-through-MCP: due jobs run via execute_command with allowlist + event log") {
    import graft.pipeline.{McpJobRunner, Scheduler}
    val dir = java.nio.file.Files.createTempDirectory("graft_mcp_sched")
    // the job script echoes its argv contract: <job_id> <job_name> <params_json>
    java.nio.file.Files.write(dir.resolve("job.sh"),
      "echo \"RAN id=$1 name=$2 params=$3 envid=$JOB_ID envname=$JOB_NAME\"\n".getBytes("UTF-8"))
    val tools = new Mcp.Tools(Mcp.McpConfig(
      allowedPaths = Seq(dir.toString),
      allowedCommands = Set("sh"), securityMode = "strict"))
    val server = new Mcp.McpServer(tools)
    val session = McpClient.loopback(server)
    try {
      session.initialize()
      val now = java.time.LocalDateTime.of(2026, 8, 14, 12, 0)
      val job = Scheduler.Job("j1", "nightly-etl",
        Scheduler.IntervalSchedule(3600), nextRun = Some(now.minusMinutes(5)))
      val (advanced, results) = McpJobRunner.tick(
        Seq(job), now, dir.toString, _ => "job.sh",
        params = _ => Map("sf" -> "0.01"), interpreter = "sh",
        session = Some(session), server = Some(server))
      // the script RAN through the tool surface, with the argv contract
      assert(results.size == 1)
      val r = results.head
      assert(r.returncode == 0, s"rc=${r.returncode} err=${r.stderr}")
      assert(r.stdout.contains("RAN id=j1 name=nightly-etl"), r.stdout)
      assert(r.stdout.contains("""{"sf":"0.01"}"""), r.stdout)
      // reference env parity (scheduler_mcp.py:162-166): the script sees
      // JOB_ID/JOB_NAME through the per-call env overlay, race-free
      assert(r.stdout.contains("envid=j1 envname=nightly-etl"), r.stdout)
      // get_mcp_status rides the result (agent_mcp.py:116-127 parity)
      assert(r.mcpStatus.enabled && r.mcpStatus.serverRunning)
      assert(r.mcpStatus.securityMode == "strict")
      assert(r.mcpStatus.eventsCount >= 1)
      // the EVENT LOG carries the scheduled run — the audit property
      // the composition exists for
      val evs = tools.events.filter(_.eventType == "execute_command")
      assert(evs.exists(e => e.path.contains("job.sh") && e.path.contains("j1")
        && e.metadata.get("returncode").contains("0")), tools.events.toString)
      // the job re-armed through the pure algebra
      assert(advanced.head.lastRun.contains(now))
      assert(advanced.head.nextRun.contains(now.plusSeconds(3600)))
      // DIRECT-mode parity: same script, same argv, same output; the
      // status honestly says MCP was not in the loop
      val direct = McpJobRunner.runJob(job, dir.toString, "job.sh",
        Map("sf" -> "0.01"), interpreter = "sh")
      assert(direct.stdout == r.stdout)
      assert(!direct.mcpStatus.enabled)
      // ALLOWLIST refusal: an interpreter outside allowed_commands is
      // refused server-side and surfaces loudly with the audit text
      val refused = McpJobRunner.runJob(job, dir.toString, "job.sh",
        interpreter = "bash", session = Some(session), server = Some(server))
      assert(refused.returncode != 0)
      assert(refused.stderr.contains("not allowed"), refused.stderr)
      // missing script: total, explicit, shell-conventional
      val missing = McpJobRunner.runJob(job, dir.toString, "nope.sh",
        interpreter = "sh", session = Some(session), server = Some(server))
      assert(missing.returncode == McpJobRunner.MissingScriptRc)
      assert(missing.stderr.contains("nope.sh"))
      // a failing script's nonzero rc comes through the MCP leg intact
      java.nio.file.Files.write(dir.resolve("bad.sh"),
        "echo boom >&2; exit 3\n".getBytes("UTF-8"))
      val bad = McpJobRunner.runJob(job, dir.toString, "bad.sh",
        interpreter = "sh", session = Some(session), server = Some(server))
      assert(bad.returncode == 3 && bad.stderr.contains("boom"), bad.toString)
      // a stderr-heavy script (past the ~64 KiB pipe buffer) must not
      // deadlock the direct leg — the drains run concurrently
      java.nio.file.Files.write(dir.resolve("noisy.sh"),
        ("i=0; while [ $i -lt 3000 ]; do " +
          "echo 'line of diagnostic noise for the stderr pipe buffer' >&2; " +
          "i=$((i+1)); done; echo done; exit 0\n").getBytes("UTF-8"))
      val noisy = McpJobRunner.runJob(job, dir.toString, "noisy.sh",
        interpreter = "sh")
      assert(noisy.returncode == 0 && noisy.stdout.contains("done"), noisy.returncode.toString)
      assert(noisy.stderr.length > 100000, s"stderr not drained: ${noisy.stderr.length}")
      // a hung script is killed at the timeout and reported, never
      // wedging the scheduler tick
      java.nio.file.Files.write(dir.resolve("hang.sh"),
        "sleep 600\n".getBytes("UTF-8"))
      val hung = McpJobRunner.runJob(job, dir.toString, "hang.sh",
        interpreter = "sh", timeoutSeconds = 2L)
      assert(hung.returncode == -1 && hung.stderr.contains("timed out"), hung.toString)
    } finally session.close()
  }

  test("execute_command env overlay: allowlisted vars reach the child; everything else refused") {
    val tools = new Mcp.Tools(Mcp.McpConfig(allowedCommands = Set("sh"),
      allowedEnvPrefixes = Seq("MY_JOB_")))
    val server = new Mcp.McpServer(tools)
    val session = McpClient.loopback(server)
    try {
      session.initialize()
      // a prefix-allowlisted overlay var is visible to the child; the
      // default JOB_* identity keys pass alongside it
      val body = session.executeCommand(
        "sh", Seq("-c", "echo v=$MY_JOB_VAR j=$JOB_ID"),
        env = Map("MY_JOB_VAR" -> "hello", "JOB_ID" -> "j1"))
      assert((body \ "stdout") == JString("v=hello j=j1\n"), body.toString)
      // the audit log records env KEYS, never values
      val ev = tools.events.filter(_.eventType == "execute_command").last
      assert(ev.metadata.get("env_keys").contains("JOB_ID,MY_JOB_VAR"), ev.toString)
      assert(!ev.toString.contains("hello"), "env VALUE leaked into the event log")
      // strict mode is an ALLOWLIST: loader/interpreter hijack keys a
      // deny-list historically missed (_JAVA_OPTIONS, PERLLIB, RUBYOPT,
      // NODE_PATH, GCONV_PATH) are refused like the classic ones, and
      // so is any other unlisted key — before any process starts
      for (bad <- Seq("LD_PRELOAD", "ld_library_path", "PATH", "PYTHONPATH",
          "BASH_ENV", "_JAVA_OPTIONS", "JDK_JAVA_OPTIONS", "PERLLIB",
          "RUBYOPT", "NODE_PATH", "GCONV_PATH", "SOME_RANDOM_KEY")) {
        val r = session.callTool("execute_command", JObject(
          "command" -> JString("sh"), "args" -> JArray(List(JString("-c"), JString("true"))),
          "env" -> JObject(bad -> JString("/tmp/evil"))))
        assert(r.isError && r.text.contains("not allowed"), s"$bad: ${r.text}")
      }
      // strict typing: a non-string env value errors, never stringifies
      val typed = session.callTool("execute_command", JObject(
        "command" -> JString("sh"), "env" -> JObject("TIMEOUT" -> JInt(30))))
      assert(typed.isError && typed.text.contains("must be a string"), typed.text)
    } finally session.close()
    // permissive mode skips the env gate like it skips the command
    // allowlist — with every command allowed, env filtering defends
    // nothing
    val loose = new Mcp.McpServer(
      new Mcp.Tools(Mcp.McpConfig(securityMode = "permissive")))
    val s2 = McpClient.loopback(loose)
    try {
      s2.initialize()
      val out = s2.executeCommand(
        "sh", Seq("-c", "echo p=$ANY_KEY"), env = Map("ANY_KEY" -> "yes"))
      assert((out \ "stdout") == JString("p=yes\n"), out.toString)
    } finally s2.close()
  }

  test("handshake + tools/list through the client: the full seven-tool surface") {
    val (_, agent) = sandboxAgent()
    try {
      assert(agent.serverInfo.name == "graft-filesystem")
      assert(agent.serverInfo.protocolVersion == "2024-11-05")
      val tools = agent.client.listTools()
      assert(tools.map(_.name).toSet == Set(
        "read_file", "write_file", "list_directory", "execute_command",
        "create_directory", "delete_file", "get_file_info"))
      assert(tools.find(_.name == "write_file").get.required.toSet == Set("path", "content"))
    } finally agent.stop()
  }

  test("typed wrappers: full filesystem round trip with reference error conventions") {
    val (root, agent) = sandboxAgent()
    val c = agent.client
    try {
      val dir = s"$root/work"
      assert(c.createDirectory(dir))
      assert(c.isDirectory(dir) && !c.isDirectory(s"$dir/ghost"))
      assert(c.writeFile(s"$dir/a.txt", "alpha beta"))
      assert(c.readFile(s"$dir/a.txt") == "alpha beta")
      val info = c.getFileInfo(s"$dir/a.txt")
      assert((info \ "type") == JString("file"))
      assert((info \ "size") == JInt(10))
      assert(c.fileExists(s"$dir/a.txt") && !c.fileExists(s"$dir/b.txt"))
      val listed = c.listDirectory(dir)
      assert(listed.map(i => (i \ "name")).contains(JString("a.txt")))
      assert(c.deleteFile(s"$dir/a.txt"))
      assert(!c.fileExists(s"$dir/a.txt"))
      // tool-level error RAISES on typed wrappers (mcp_client.py:23-26)
      val e = intercept[McpClient.McpToolException](c.readFile("/etc/passwd"))
      assert(e.getMessage.contains("read_file error"), e.getMessage)
      // ...while the raw call exposes (text, isError) without raising
      val raw = c.callTool("read_file", JObject("path" -> JString("/etc/passwd")))
      assert(raw.isError && raw.text.startsWith("Error:"))
      // unknown tool: isError result, not a protocol failure (MCP rule)
      assert(c.callTool("no_such_tool", JObject()).isError)
      // executeCommand: allowed command returns the JSON payload
      val r = c.executeCommand("ls", Seq(root.toString))
      assert((r \ "returncode") == JInt(0) || (r \ "exit_code") == JInt(0), s"$r")
    } finally agent.stop()
  }

  test("not-connected guard and protocol errors") {
    // a session that never initialized refuses verbs loudly
    // (mcp_client.py:168-170's RuntimeError)
    val (_, agent) = sandboxAgent()
    try {
      val raw = McpClient.loopback(new Mcp.McpServer(agent.tools))
      intercept[IllegalStateException](raw.listTools())
      intercept[IllegalStateException](raw.callTool("read_file", JObject()))
      raw.initialize()
      raw.ping() // now fine
      raw.close()
    } finally agent.stop()
  }

  test("agent: MCP-routed extract bridge feeds the engine; status mirrors the reference") {
    val (root, agent) = sandboxAgent()
    try {
      val dir = s"$root/docs"
      agent.client.createDirectory(dir)
      agent.client.writeFile(s"$dir/one.txt", "the quick brown fox")
      agent.client.writeFile(s"$dir/two.txt", "lazy dogs sleep")
      val df = agent.ingestDirectory(spark, dir)
      assert(df.count() == 2)
      val byName = df.collect().map(r => r.getString(1) -> r.getString(3)).toMap
      assert(byName("one.txt") == "the quick brown fox")
      assert(byName("two.txt") == "lazy dogs sleep")
      // the frame composes with the engine's text operators
      import org.apache.spark.sql.functions._
      val toks = df.select(graft.functions.Text.tokens(
        graft.functions.Text.normalize(col("content"))).as("t"))
        .selectExpr("size(t)").collect().map(_.getInt(0)).sorted
      assert(toks.toSeq == Seq(3, 4))
      // every MCP-routed touch landed in the event log; status reflects it
      val st = agent.status
      assert(st("enabled") == "true" && st("server_running") == "true")
      assert(st("security_mode") == "strict")
      assert(st("events_count").toInt >= 4, st("events_count")) // 2 writes + dir + reads
      // the bounded-bridge contract is loud, not silent truncation
      val e = intercept[IllegalArgumentException](
        agent.ingestDirectory(spark, dir, maxFiles = 1))
      assert(e.getMessage.contains("FileIndex"), e.getMessage)
    } finally agent.stop()
  }

  test("connectProcess: a real subprocess server over stdio answers the same protocol") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val root = java.nio.file.Files.createTempDirectory("graft_mcp_proc")
    val (session, proc) = McpClient.connectProcess(
      Seq(javaBin, "-cp", cp, "graft.serve.Mcp"),
      env = Map(
        "GRAFT_MCP_ALLOWED_PATHS" -> root.toString,
        "GRAFT_MCP_SECURITY_MODE" -> "strict"))
    try {
      val info = session.initialize()
      assert(info.name == "graft-filesystem")
      assert(session.listTools().size == 7)
      session.callTool("write_file", JObject(
        "path" -> JString(s"$root/x.txt"), "content" -> JString("hi")))
      assert(session.readFile(s"$root/x.txt") == "hi")
    } finally {
      session.close()
      proc.destroy()
      if (!proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) proc.destroyForcibly()
    }
  }
}
