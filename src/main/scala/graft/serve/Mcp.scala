package graft.serve

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream, PrintWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.json4s._
import org.json4s.jackson.JsonMethods

/** S15 — the reference's MCP tool surface
  * (/root/reference/src/mcp_server.py:17-326), rebuilt as a
  * dependency-free JSON-RPC 2.0 stdio server (the public MCP wire
  * protocol: newline-delimited JSON-RPC, `initialize` / `tools/list` /
  * `tools/call`).
  *
  * Semantics mirrored from the reference:
  *   - seven tools: read_file, write_file, list_directory,
  *     execute_command, create_directory, delete_file, get_file_info
  *     (mcp_server.py:43-281);
  *   - path allowlist with strict/permissive modes — permissive allows
  *     everything, strict with an EMPTY allowlist also allows everything
  *     (mcp_server.py:283-299), otherwise the resolved path must sit
  *     under an allowed root;
  *   - command allowlist with the reference's default set
  *     (mcp_server.py:33-35), 30 s timeout (mcp_server.py:158-163);
  *   - max_file_size cap on reads (mcp_server.py:55-56, default 100 MB);
  *   - every successful tool call appends a FileSystemEvent
  *     (mcp_server.py:301-310).
  *
  * Errors return an MCP tool result with `isError: true` and an
  * `Error: …` text body — NOT a JSON-RPC error — matching the
  * reference's CallToolResult(isError=True) convention. JSON-RPC errors
  * are reserved for protocol failures (parse error, unknown method).
  *
  * This is a driver-side serving shim by design: the filesystem verbs
  * are inherently single-node, and the DATA-plane twin of the
  * reference's indexing/query surface lives in the Spark operators
  * ([[graft.index.FileIndex]], [[graft.operators.Bm25]], …). The HTTP
  * analytics surface ([[graft.serve.HttpApi]]) is where serving meets
  * the engine.
  */
object Mcp {

  /** mcp_server.py:19-25; commandTimeoutSeconds is the reference's
    * hardcoded 30 s subprocess timeout (mcp_server.py:162), made
    * configurable so the timeout path is spec-testable.
    */
  final case class McpConfig(
      enabled: Boolean = true,
      allowedPaths: Seq[String] = Nil,
      maxFileSize: Long = 100L * 1024 * 1024,
      allowedCommands: Set[String] = DefaultCommands,
      securityMode: String = "strict", // strict | permissive
      commandTimeoutSeconds: Long = 30L,
      // execute_command env overlay ALLOWLIST (strict mode): exact keys
      // plus prefix families. A deny-list is structurally incomplete
      // here — LD_PRELOAD, _JAVA_OPTIONS, PERLLIB, RUBYOPT, NODE_PATH,
      // GCONV_PATH, ... each lets a caller make an allowlisted binary
      // load attacker-controlled code, and the set of such loader /
      // interpreter hijack variables is open-ended. Defaults cover the
      // job-identity keys the scheduler runner passes
      // (scheduler_mcp.py:162-166).
      allowedEnvKeys: Set[String] = DefaultEnvKeys,
      allowedEnvPrefixes: Seq[String] = Nil
  )

  /** mcp_server.py:33-35 */
  val DefaultCommands: Set[String] =
    Set("python", "pip", "git", "curl", "wget", "ls", "cat", "grep", "find")

  /** The job-identity variables the MCP scheduler runner injects
    * ([[graft.pipeline.McpJobRunner]] ≙ scheduler_mcp.py:162-166) —
    * the only env overlay keys strict mode passes by default.
    */
  val DefaultEnvKeys: Set[String] = Set("JOB_ID", "JOB_NAME", "JOB_PARAMS")

  /** Reference FileSystemEvent (src/models.py via mcp_server.py:301-310). */
  final case class FsEvent(
      seq: Long,
      eventType: String,
      path: String,
      metadata: Map[String, String]
  )

  /** Reference CallToolResult: text content + isError flag. */
  final case class ToolResult(text: String, isError: Boolean)

  /** Tool metadata served by `tools/list` (name, description, and the
    * JSON-schema property names with their required subset).
    */
  final case class ToolSpec(
      name: String,
      description: String,
      params: Seq[(String, String)], // (name, json type)
      required: Seq[String]
  )

  val ToolSpecs: Seq[ToolSpec] = Seq(
    ToolSpec("read_file", "Read a file from the filesystem",
      Seq("path" -> "string", "encoding" -> "string"), Seq("path")),
    ToolSpec("write_file", "Write content to a file",
      Seq("path" -> "string", "content" -> "string", "encoding" -> "string"),
      Seq("path", "content")),
    ToolSpec("list_directory", "List contents of a directory",
      Seq("path" -> "string"), Seq("path")),
    ToolSpec("execute_command", "Execute a system command",
      Seq("command" -> "string", "args" -> "array", "cwd" -> "string",
        "env" -> "object"),
      Seq("command")),
    ToolSpec("create_directory", "Create a directory",
      Seq("path" -> "string", "parents" -> "boolean"), Seq("path")),
    ToolSpec("delete_file", "Delete a file or directory",
      Seq("path" -> "string"), Seq("path")),
    ToolSpec("get_file_info", "Get file information",
      Seq("path" -> "string"), Seq("path"))
  )

  /** The seven reference tools plus the security guards and event log.
    * Pure of any transport — [[McpServer]] adds the JSON-RPC framing,
    * [[graft.serve.HttpApi]] reuses the event log for `/events`.
    */
  /** Symlink-resolving realpath, defined for not-yet-existing targets:
    * the deepest EXISTING ancestor is resolved through symlinks and the
    * non-existing remainder appended — the semantics of Python's
    * `Path.resolve()` (strict=False), which the reference's allowlist
    * check uses (mcp_server.py:283-299). Pure textual normalization is
    * NOT enough for the sandbox: a symlink inside an allowed root
    * (`/sandbox/ln -> /etc`) would pass a startsWith check while
    * reading/writing outside it.
    */
  private[serve] def resolveReal(path: String): Path = {
    val abs = Paths.get(path).toAbsolutePath.normalize
    var existing: Path = abs
    var rest = List.empty[String]
    while (existing != null && !Files.exists(existing)) {
      rest = existing.getFileName.toString :: rest
      existing = existing.getParent
    }
    val base =
      if (existing == null) abs.getRoot
      else
        try existing.toRealPath()
        catch { case NonFatal(_) => existing } // dangling symlink tail
    rest.foldLeft(base)(_.resolve(_))
  }

  final class Tools(val config: McpConfig) {
    private val resolvedRoots: Seq[Path] =
      config.allowedPaths.map(resolveReal)
    private val seq = new AtomicLong(0L)
    private val eventBuf = ArrayBuffer.empty[FsEvent]
    // events are capped (newest kept): the reference appends forever
    // (mcp_server.py:308), which in a long-running server is a slow
    // heap leak — one FsEvent per tool call, unbounded
    private val MaxEvents = 10000

    /** mcp_server.py:283-299 — permissive ⇒ all; empty allowlist ⇒ all;
      * else SYMLINK-RESOLVED prefix containment (see [[resolveReal]]).
      */
    def pathAllowed(path: String): Boolean = {
      if (config.securityMode == "permissive") true
      else if (resolvedRoots.isEmpty) true
      else
        try {
          val p = resolveReal(path)
          resolvedRoots.exists(root => p.startsWith(root))
        } catch { case NonFatal(_) => false }
    }

    /** mcp_server.py:312-318 */
    def commandAllowed(command: String): Boolean =
      config.securityMode == "permissive" || config.allowedCommands.contains(command)

    def logEvent(eventType: String, path: String, metadata: Map[String, String]): Unit =
      eventBuf.synchronized {
        eventBuf += FsEvent(seq.incrementAndGet(), eventType, path, metadata)
        if (eventBuf.size > MaxEvents) eventBuf.remove(0, eventBuf.size - MaxEvents)
      }

    def events: Seq[FsEvent] = eventBuf.synchronized(eventBuf.toVector)

    private def err(e: Throwable): ToolResult =
      ToolResult(s"Error: ${e.getMessage}", isError = true)

    private def guarded(body: => ToolResult): ToolResult =
      try body catch { case NonFatal(e) => err(e) }

    def readFile(path: String, encoding: String = "utf-8"): ToolResult = guarded {
      if (!pathAllowed(path)) throw new SecurityException(s"Access denied to path: $path")
      val p = resolveReal(path) // operate on the SAME path the guard checked
      if (!Files.exists(p)) throw new java.io.FileNotFoundException(s"File not found: $path")
      val size = Files.size(p)
      if (size > config.maxFileSize) throw new IllegalArgumentException(s"File too large: $size bytes")
      val content = new String(Files.readAllBytes(p), encoding)
      logEvent("read_file", p.toString, Map("size" -> content.length.toString))
      ToolResult(content, isError = false)
    }

    def writeFile(path: String, content: String, encoding: String = "utf-8"): ToolResult = guarded {
      if (!pathAllowed(path)) throw new SecurityException(s"Access denied to path: $path")
      val p = resolveReal(path) // operate on the SAME path the guard checked
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, content.getBytes(encoding))
      logEvent("write_file", p.toString, Map("size" -> content.length.toString))
      ToolResult(s"Successfully wrote ${content.length} characters to $path", isError = false)
    }

    def listDirectory(path: String): ToolResult = guarded {
      if (!pathAllowed(path)) throw new SecurityException(s"Access denied to path: $path")
      val p = resolveReal(path) // operate on the SAME path the guard checked
      if (!Files.exists(p)) throw new java.io.FileNotFoundException(s"Directory not found: $path")
      if (!Files.isDirectory(p)) throw new IllegalArgumentException(s"Not a directory: $path")
      val stream = Files.list(p)
      val children = try stream.iterator.asScala.toVector finally stream.close() // fd leak otherwise
      val items = children.sortBy(_.getFileName.toString).map { item =>
        JObject(
          "name" -> JString(item.getFileName.toString),
          "path" -> JString(item.toString),
          "type" -> JString(if (Files.isDirectory(item)) "directory" else "file"),
          "size" -> JLong(Files.size(item)),
          "modified" -> JLong(Files.getLastModifiedTime(item).toMillis)
        )
      }
      logEvent("list_directory", p.toString, Map("count" -> items.size.toString))
      ToolResult(JsonMethods.pretty(JsonMethods.render(JArray(items.toList))), isError = false)
    }

    /** mcp_server.py:144-186 — allowlisted command, optional args/cwd,
      * bounded timeout, JSON {returncode, stdout, stderr}; nonzero exit
      * ⇒ isError (matching the reference's
      * `isError=result.returncode != 0`). Output is drained on
      * background threads so the timeout governs a HUNG command too —
      * reading to EOF on the caller thread would block past any
      * deadline until the child exits, and waiting first instead would
      * deadlock a child that fills the pipe buffer.
      */
    def executeCommand(
        command: String, args: Seq[String] = Nil, cwd: Option[String] = None,
        env: Map[String, String] = Map.empty): ToolResult = guarded {
      if (!commandAllowed(command)) throw new SecurityException(s"Command not allowed: $command")
      cwd.foreach { d =>
        if (!pathAllowed(d)) throw new SecurityException(s"Access denied to working directory: $d")
      }
      // env is an additive overlay for job-identity-style variables
      // (scheduler_mcp.py:162-171 passes JOB_ID/JOB_NAME/JOB_PARAMS).
      // Strict mode admits ONLY the configured allowlist — anything
      // else (loader/interpreter hijack vars above all) could subvert
      // the command ALLOWLIST by making an allowed binary load
      // attacker-controlled code, and enumerating the hijack vars is a
      // losing game (LD_*, _JAVA_OPTIONS, PERLLIB, RUBYOPT, NODE_PATH,
      // GCONV_PATH, ...). Permissive mode skips the check like
      // commandAllowed does — with every command allowed, env
      // filtering defends nothing.
      env.keys.find(!envKeyAllowed(_)).foreach(k =>
        throw new SecurityException(s"Environment variable not allowed: $k"))
      val pb = new ProcessBuilder((command +: args).asJava)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      cwd.foreach(d => pb.directory(new java.io.File(d)))
      val proc = pb.start()
      proc.getOutputStream.close()
      // bounded capture: keep at most maxFileSize bytes per stream and
      // DISCARD the rest while still reading (the child must never
      // block on a full pipe). An unbounded buffer would let one
      // `cat /dev/zero` OOM the server and bypass the read_file cap.
      final class BoundedDrain(in: InputStream) {
        val buf = new java.io.ByteArrayOutputStream()
        @volatile var truncated = false
        val thread: Thread = {
          val t = new Thread(() => try {
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            while (n >= 0) {
              val room = config.maxFileSize - buf.size
              if (room > 0) buf.write(chunk, 0, math.min(n.toLong, room).toInt)
              if (n > room) truncated = true
              n = in.read(chunk)
            }
          } catch { case NonFatal(_) => () })
          t.setDaemon(true); t.start(); t
        }
      }
      val outD = new BoundedDrain(proc.getInputStream)
      val errD = new BoundedDrain(proc.getErrorStream)
      if (!proc.waitFor(config.commandTimeoutSeconds, TimeUnit.SECONDS)) {
        proc.destroyForcibly()
        // BOUNDED post-kill wait: an uninterruptible child (D-state on
        // NFS) must not wedge the serve loop — report the timeout and
        // let the daemon drains die with the process
        proc.waitFor(5, TimeUnit.SECONDS): Unit
        throw new RuntimeException(s"Command timed out: $command")
      }
      val drainsDone = {
        outD.thread.join(5000); errD.thread.join(5000)
        !outD.thread.isAlive && !errD.thread.isAlive
      }
      val stdout = new String(outD.buf.toByteArray, StandardCharsets.UTF_8)
      val stderr = new String(errD.buf.toByteArray, StandardCharsets.UTF_8)
      val rc = proc.exitValue()
      // keys only, never values — env payloads may carry credentials
      // and the event log is the operator-visible audit surface
      logEvent("execute_command", (command +: args).mkString(" "),
        Map("returncode" -> rc.toString) ++ cwd.map("cwd" -> _) ++
          (if (env.nonEmpty) Map("env_keys" -> env.keys.toSeq.sorted.mkString(",")) else Map.empty))
      // truncated/incomplete output is SAID, not silently returned as a
      // clean rc=0 result (a grandchild holding the pipe open past the
      // join deadline would otherwise read as full output)
      val base = List(
        "returncode" -> (JInt(rc): JValue),
        "stdout" -> (JString(stdout): JValue),
        "stderr" -> (JString(stderr): JValue))
      val flags =
        (if (outD.truncated || errD.truncated) List("output_truncated" -> (JBool(true): JValue)) else Nil) ++
          (if (!drainsDone) List("output_incomplete" -> (JBool(true): JValue)) else Nil)
      ToolResult(JsonMethods.pretty(JsonMethods.render(JObject(base ++ flags))), isError = rc != 0)
    }

    /** Strict-mode env overlay gate: exact allowlisted keys and
      * allowlisted prefixes pass, everything else is refused — the
      * inverse of a hijack-var deny-list, which is structurally
      * incomplete (any of LD_PRELOAD / _JAVA_OPTIONS / PERLLIB /
      * RUBYOPT / NODE_PATH / GCONV_PATH / ... lets a caller change
      * what code an allowlisted binary runs). Permissive mode passes
      * everything, mirroring commandAllowed.
      */
    private def envKeyAllowed(k: String): Boolean =
      config.securityMode == "permissive" ||
        config.allowedEnvKeys.contains(k) ||
        config.allowedEnvPrefixes.exists(p => p.nonEmpty && k.startsWith(p))

    def createDirectory(path: String, parents: Boolean = true): ToolResult = guarded {
      if (!pathAllowed(path)) throw new SecurityException(s"Access denied to path: $path")
      val p = resolveReal(path) // operate on the SAME path the guard checked
      if (parents) Files.createDirectories(p)
      else if (!Files.exists(p)) Files.createDirectory(p)
      logEvent("create_directory", p.toString, Map("parents" -> parents.toString))
      ToolResult(s"Successfully created directory: $path", isError = false)
    }

    def deleteFile(path: String): ToolResult = guarded {
      if (!pathAllowed(path)) throw new SecurityException(s"Access denied to path: $path")
      val p = resolveReal(path) // operate on the SAME path the guard checked
      if (!Files.exists(p)) throw new java.io.FileNotFoundException(s"Path not found: $path")
      val op =
        if (Files.isDirectory(p)) {
          // rmtree: delete children depth-first (mcp_server.py:225-228)
          val walk = Files.walk(p)
          val victims =
            try walk.sorted(java.util.Comparator.reverseOrder[Path]()).iterator.asScala.toVector
            finally walk.close() // fd leak otherwise
          victims.foreach(Files.delete(_))
          "delete_directory"
        } else {
          Files.delete(p)
          "delete_file"
        }
      logEvent(op, p.toString, Map.empty)
      ToolResult(s"Successfully deleted: $path", isError = false)
    }

    def getFileInfo(path: String): ToolResult = guarded {
      if (!pathAllowed(path)) throw new SecurityException(s"Access denied to path: $path")
      val p = resolveReal(path) // operate on the SAME path the guard checked
      if (!Files.exists(p)) throw new java.io.FileNotFoundException(s"Path not found: $path")
      val isDir = Files.isDirectory(p)
      val info = JObject(
        "path" -> JString(p.toString),
        "name" -> JString(p.getFileName.toString),
        "type" -> JString(if (isDir) "directory" else "file"),
        "size" -> JLong(Files.size(p)),
        "modified" -> JLong(Files.getLastModifiedTime(p).toMillis))
      logEvent("get_file_info", p.toString,
        Map("type" -> (if (isDir) "directory" else "file"), "size" -> Files.size(p).toString))
      ToolResult(JsonMethods.pretty(JsonMethods.render(info)), isError = false)
    }

    /** Dispatch by tool name with json4s argument extraction — the
      * `tools/call` target. Unknown tool ⇒ isError result (MCP keeps
      * protocol-level errors for protocol failures only).
      */
    def call(name: String, args: JValue): ToolResult = {
      def str(k: String): Option[String] = args \ k match {
        case JString(s) => Some(s)
        case JNothing   => None
        case other => throw new IllegalArgumentException(
          s"$k must be a string, got ${JsonMethods.compact(JsonMethods.render(other))}")
      }
      def strReq(k: String): String =
        str(k).getOrElse(throw new IllegalArgumentException(s"missing required argument: $k"))
      def bool(k: String, dflt: Boolean): Boolean = args \ k match {
        case JBool(b) => b
        case _        => dflt
      }
      // strict: a non-string element must ERROR, not be silently
      // dropped — `args: ["checkout", 123, "file"]` running
      // `checkout file` is a materially different command
      def strs(k: String): Seq[String] = args \ k match {
        case JArray(xs) =>
          xs.map {
            case JString(s) => s
            case other => throw new IllegalArgumentException(
              s"$k must contain only strings, got ${JsonMethods.compact(JsonMethods.render(other))}")
          }
        case JNothing => Nil
        case other => throw new IllegalArgumentException(
          s"$k must be an array of strings, got ${JsonMethods.compact(JsonMethods.render(other))}")
      }
      // strict like strs: a non-string value must ERROR — silently
      // stringifying {"TIMEOUT": 30} vs "30" is a materially different
      // child environment
      def strMap(k: String): Map[String, String] = args \ k match {
        case JObject(fields) =>
          fields.map {
            case (key, JString(v)) => key -> v
            case (key, other) => throw new IllegalArgumentException(
              s"$k.$key must be a string, got ${JsonMethods.compact(JsonMethods.render(other))}")
          }.toMap
        case JNothing => Map.empty
        case other => throw new IllegalArgumentException(
          s"$k must be an object of strings, got ${JsonMethods.compact(JsonMethods.render(other))}")
      }
      try name match {
        case "read_file"        => readFile(strReq("path"), str("encoding").getOrElse("utf-8"))
        case "write_file"       => writeFile(strReq("path"), strReq("content"), str("encoding").getOrElse("utf-8"))
        case "list_directory"   => listDirectory(strReq("path"))
        case "execute_command"  => executeCommand(strReq("command"), strs("args"), str("cwd"), strMap("env"))
        case "create_directory" => createDirectory(strReq("path"), bool("parents", dflt = true))
        case "delete_file"      => deleteFile(strReq("path"))
        case "get_file_info"    => getFileInfo(strReq("path"))
        case other              => ToolResult(s"Error: unknown tool: $other", isError = true)
      } catch { case NonFatal(e) => ToolResult(s"Error: ${e.getMessage}", isError = true) }
    }
  }

  // ---------------------------------------------------------------- protocol

  /** JSON-RPC 2.0 framing for the MCP stdio transport: one JSON object
    * per line. Handles `initialize`, `tools/list`, `tools/call`,
    * `ping`; notifications (no id) get no response per JSON-RPC 2.0.
    */
  final class McpServer(val tools: Tools, serverName: String = "graft-filesystem") {

    private def result(id: JValue, r: JValue): JValue =
      JObject("jsonrpc" -> JString("2.0"), "id" -> id, "result" -> r)

    private def rpcError(id: JValue, code: Int, message: String): JValue =
      JObject("jsonrpc" -> JString("2.0"), "id" -> id,
        "error" -> JObject("code" -> JInt(code), "message" -> JString(message)))

    private def toolListJson: JValue = JObject(
      "tools" -> JArray(ToolSpecs.map { t =>
        JObject(
          "name" -> JString(t.name),
          "description" -> JString(t.description),
          "inputSchema" -> JObject(
            "type" -> JString("object"),
            "properties" -> JObject(t.params.map { case (n, ty) =>
              n -> (JObject("type" -> JString(ty)): JValue)
            }.toList),
            "required" -> JArray(t.required.map(JString(_)).toList)))
      }.toList))

    /** One request → Some(response) | None (notification). */
    def handle(req: JValue): Option[JValue] = {
      val id = req \ "id"
      val isNotification = id == JNothing
      def respond(r: JValue): Option[JValue] = if (isNotification) None else Some(r)
      (req \ "method") match {
        case JString("initialize") =>
          respond(result(id, JObject(
            "protocolVersion" -> JString("2024-11-05"),
            "capabilities" -> JObject("tools" -> JObject()),
            "serverInfo" -> JObject(
              "name" -> JString(serverName),
              "version" -> JString("1.0")))))
        case JString("ping") =>
          respond(result(id, JObject()))
        case JString("tools/list") =>
          respond(result(id, toolListJson))
        case JString("tools/call") =>
          val name = (req \ "params" \ "name") match {
            case JString(s) => s
            case _          => ""
          }
          val args = (req \ "params" \ "arguments") match {
            case JNothing => JObject()
            case v        => v
          }
          val r = tools.call(name, args)
          respond(result(id, JObject(
            "content" -> JArray(List(JObject(
              "type" -> JString("text"), "text" -> JString(r.text)))),
            "isError" -> JBool(r.isError))))
        case JString(m) if m.startsWith("notifications/") =>
          None
        case JString(other) =>
          respond(rpcError(id, -32601, s"Method not found: $other"))
        case _ =>
          respond(rpcError(id, -32600, "Invalid request: missing method"))
      }
    }

    /** Newline-delimited serve loop; parse errors answer -32700 as
      * JSON-RPC requires. Blocks until EOF on `in`.
      */
    def serve(in: InputStream, out: OutputStream): Unit = {
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val writer = new PrintWriter(new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8), true)
      var line = reader.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) {
          val response: Option[JValue] =
            try handle(JsonMethods.parse(line))
            catch {
              case NonFatal(_) =>
                Some(JObject("jsonrpc" -> JString("2.0"), "id" -> JNull,
                  "error" -> JObject("code" -> JInt(-32700), "message" -> JString("Parse error"))))
            }
          response.foreach(r => writer.println(JsonMethods.compact(JsonMethods.render(r))))
        }
        line = reader.readLine()
      }
    }
  }

  /** Entry point: `graft.serve.Mcp` serves stdio with paths/commands
    * from GRAFT_MCP_ALLOWED_PATHS (pathsep-joined) /
    * GRAFT_MCP_SECURITY_MODE; GRAFT_MCP_ENV_KEYS /
    * GRAFT_MCP_ENV_PREFIXES (comma-joined) extend the strict-mode env
    * overlay allowlist beyond the JOB_* defaults.
    */
  /** The env-var config surface, shared by [[main]] and the `graft
    * serve mcp` CLI verb so the two entry points cannot diverge on
    * which variables they honor. `roots`/`mode` override the env when
    * the caller already resolved them (CLI flags win over env).
    */
  def configFromEnv(
      roots: Option[Seq[String]] = None,
      mode: Option[String] = None): McpConfig = {
    def csv(key: String): Seq[String] =
      sys.env.get(key).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    McpConfig(
      allowedPaths = roots.getOrElse(
        sys.env.get("GRAFT_MCP_ALLOWED_PATHS")
          .map(_.split(java.io.File.pathSeparator).toSeq.filter(_.nonEmpty))
          .getOrElse(Nil)),
      securityMode = mode.getOrElse(
        sys.env.getOrElse("GRAFT_MCP_SECURITY_MODE", "strict")),
      allowedEnvKeys = DefaultEnvKeys ++ csv("GRAFT_MCP_ENV_KEYS"),
      allowedEnvPrefixes = csv("GRAFT_MCP_ENV_PREFIXES"))
  }

  def main(args: Array[String]): Unit = {
    val cfg = configFromEnv()
    new McpServer(new Tools(cfg)).serve(System.in, System.out)
  }
}
