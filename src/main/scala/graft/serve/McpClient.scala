package graft.serve

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream, PrintWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

import org.json4s._
import org.json4s.jackson.JsonMethods

/** MCP stdio CLIENT — the counterpart of [[Mcp.McpServer]] and the
  * re-expression of the reference's `MCPFileSystemClient`
  * (/root/reference/src/mcp_client.py:105-211): connect over
  * newline-delimited JSON-RPC, `initialize`, then typed wrappers for
  * the seven filesystem tools with the reference's error convention —
  * a tool result with `isError: true` RAISES on the typed wrappers
  * (mcp_client.py:23-26), while [[Session.callTool]] exposes the raw
  * (text, isError) pair for generic orchestration. Calling any wrapper
  * before [[Session.initialize]] fails loudly (the reference's
  * "MCP client not connected" RuntimeError, mcp_client.py:168-170).
  *
  * Transports: [[McpClient.connectProcess]] spawns a server subprocess
  * (the reference's StdioServerParameters shape) and
  * [[McpClient.loopback]] wires a [[Mcp.McpServer]] in-process through
  * piped streams — the spec transport, and the shape
  * [[McpAgent]] uses to serve its own tools locally like
  * agent_mcp.py's in-process server task (agent_mcp.py:60-63).
  *
  * Dependency-free by the same constraint as the server: json4s (on
  * Spark's classpath) + JDK process/pipe APIs.
  */
object McpClient {

  final case class ToolInfo(name: String, description: String, required: Seq[String])
  final case class ServerInfo(name: String, version: String, protocolVersion: String)
  final case class CallResult(text: String, isError: Boolean)

  /** Protocol-level failure (JSON-RPC error, dead transport, malformed
    * response) — distinct from a tool's `isError` result, exactly the
    * server's split between rpcError and ToolResult.
    */
  final class McpProtocolException(msg: String) extends RuntimeException(msg)

  /** Tool-level failure surfaced by a typed wrapper (the reference
    * raises `Exception(f"MCP {tool} error: {text}")`).
    */
  final class McpToolException(msg: String) extends RuntimeException(msg)

  /** One client session over a connected stdio pair. NOT thread-safe
    * (requests are strictly sequential, like the reference's single
    * ClientSession); synchronize externally to share.
    */
  final class Session(in: InputStream, out: OutputStream, clientName: String = "graft-agent") {
    private val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    private val writer = new PrintWriter(new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8), true)
    private val nextId = new AtomicLong(1L)
    private var connected = false

    private def rpc(method: String, params: JValue): JValue = {
      val id = nextId.getAndIncrement()
      val req = JObject(
        "jsonrpc" -> JString("2.0"), "id" -> JInt(BigInt(id)),
        "method" -> JString(method), "params" -> params)
      writer.println(JsonMethods.compact(JsonMethods.render(req)))
      // the server is sequential over one stream, but skip any line
      // that is not OUR response id (a future server may interleave
      // notifications) instead of misreading it as the answer
      var line = reader.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) {
          val resp =
            try JsonMethods.parse(line)
            catch { case NonFatal(_) => throw new McpProtocolException(s"unparseable response line: $line") }
          (resp \ "id") match {
            case JInt(i) if i == BigInt(id) =>
              (resp \ "error") match {
                case JObject(_) =>
                  val msg = (resp \ "error" \ "message") match {
                    case JString(s) => s; case _ => "unknown"
                  }
                  throw new McpProtocolException(s"JSON-RPC error for $method: $msg")
                case _ => return resp \ "result"
              }
            case _ => () // not ours — keep reading
          }
        }
        line = reader.readLine()
      }
      throw new McpProtocolException(s"transport closed before a response to $method")
    }

    /** MCP handshake; every other verb requires it first. */
    def initialize(): ServerInfo = {
      val r = rpc("initialize", JObject(
        "protocolVersion" -> JString("2024-11-05"),
        "capabilities" -> JObject(),
        "clientInfo" -> JObject(
          "name" -> JString(clientName), "version" -> JString("1.0"))))
      connected = true
      def s(v: JValue): String = v match { case JString(x) => x; case _ => "" }
      ServerInfo(
        s(r \ "serverInfo" \ "name"),
        s(r \ "serverInfo" \ "version"),
        s(r \ "protocolVersion"))
    }

    def isConnected: Boolean = connected

    private def requireConnected(): Unit =
      if (!connected) throw new IllegalStateException(
        "MCP client not connected") // mcp_client.py:168-170's RuntimeError

    def ping(): Unit = { requireConnected(); rpc("ping", JObject()): Unit }

    def listTools(): Seq[ToolInfo] = {
      requireConnected()
      (rpc("tools/list", JObject()) \ "tools") match {
        case JArray(ts) => ts.map { t =>
          ToolInfo(
            (t \ "name") match { case JString(s) => s; case _ => "" },
            (t \ "description") match { case JString(s) => s; case _ => "" },
            (t \ "inputSchema" \ "required") match {
              case JArray(r) => r.collect { case JString(s) => s }
              case _ => Nil
            })
        }
        case _ => throw new McpProtocolException("tools/list returned no tools array")
      }
    }

    /** Generic tool invocation — the raw MCP result (first text
      * content + isError), no raise-on-error: orchestration loops
      * decide per call.
      */
    def callTool(name: String, args: JValue): CallResult = {
      requireConnected()
      val r = rpc("tools/call", JObject(
        "name" -> JString(name), "arguments" -> args))
      val text = (r \ "content") match {
        case JArray(c :: _) => (c \ "text") match { case JString(s) => s; case _ => "" }
        case _ => ""
      }
      val isErr = (r \ "isError") match { case JBool(b) => b; case _ => false }
      CallResult(text, isErr)
    }

    private def checked(tool: String, args: JValue): String = {
      val r = callTool(tool, args)
      if (r.isError) throw new McpToolException(s"MCP $tool error: ${r.text}")
      r.text
    }

    // ---- typed wrappers, reference parity (mcp_client.py:17-102) ----

    def readFile(path: String, encoding: String = "utf-8"): String =
      checked("read_file", JObject("path" -> JString(path), "encoding" -> JString(encoding)))

    def writeFile(path: String, content: String, encoding: String = "utf-8"): Boolean = {
      checked("write_file", JObject(
        "path" -> JString(path), "content" -> JString(content),
        "encoding" -> JString(encoding)))
      true
    }

    def listDirectory(path: String): Seq[JValue] =
      JsonMethods.parse(checked("list_directory", JObject("path" -> JString(path)))) match {
        case JArray(items) => items
        case other => throw new McpProtocolException(s"list_directory returned non-array: $other")
      }

    def executeCommand(
        command: String, args: Seq[String] = Nil, cwd: Option[String] = None,
        env: Map[String, String] = Map.empty): JValue = {
      // mirrors the reference: execute_command parses the JSON body
      // WITHOUT the isError raise (mcp_client.py:50-57 returns the
      // payload either way — the exit code rides inside it)
      val a = JObject(List(
        "command" -> JString(command),
        "args" -> JArray(args.map(JString(_)).toList)) ++
        cwd.map(c => "cwd" -> (JString(c): JValue)).toList ++
        (if (env.isEmpty) Nil
         else List("env" -> (JObject(
           env.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }): JValue))))
      JsonMethods.parse(callTool("execute_command", a).text)
    }

    def createDirectory(path: String, parents: Boolean = true): Boolean = {
      checked("create_directory", JObject(
        "path" -> JString(path), "parents" -> JBool(parents)))
      true
    }

    def deleteFile(path: String): Boolean = {
      checked("delete_file", JObject("path" -> JString(path)))
      true
    }

    def getFileInfo(path: String): JValue =
      JsonMethods.parse(checked("get_file_info", JObject("path" -> JString(path))))

    def fileExists(path: String): Boolean =
      try { getFileInfo(path); true }
      catch { case _: McpToolException => false } // mcp_client.py:90-95

    def isDirectory(path: String): Boolean =
      try {
        (getFileInfo(path) \ "type") match {
          case JString("directory") => true
          case _ => false
        }
      } catch { case _: McpToolException => false } // mcp_client.py:97-102

    /** Close the client's write side — the server's serve loop exits
      * on the resulting EOF.
      */
    def close(): Unit = { writer.close(); connected = false }
  }

  /** Spawn a server subprocess and connect — the reference's
    * stdio_client(StdioServerParameters) shape (mcp_client.py:123-147).
    * Caller owns the Process (destroy it after close()).
    */
  def connectProcess(
      command: Seq[String], env: Map[String, String] = Map.empty): (Session, Process) = {
    val pb = new ProcessBuilder(command: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    // stderr must not share stdout (it would corrupt the JSON-RPC
    // stream) NOR stay an undrained pipe (a chatty server would fill
    // the OS buffer and deadlock mid-call) — discard it
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val proc = pb.start()
    (new Session(proc.getInputStream, proc.getOutputStream), proc)
  }

  /** In-process loopback to a [[Mcp.McpServer]]: the server's serve
    * loop runs on a daemon thread over piped streams. Closing the
    * session EOFs the server side. This is agent_mcp.py:60-63's
    * in-process server task without a subprocess.
    */
  def loopback(server: Mcp.McpServer, clientName: String = "graft-agent"): Session = {
    val toServer = new java.io.PipedOutputStream()
    val serverIn = new java.io.PipedInputStream(toServer, 1 << 16)
    val toClient = new java.io.PipedOutputStream()
    val clientIn = new java.io.PipedInputStream(toClient, 1 << 16)
    val t = new Thread(() => server.serve(serverIn, toClient), "graft-mcp-loopback")
    t.setDaemon(true)
    t.start()
    new Session(clientIn, toServer, clientName)
  }
}
