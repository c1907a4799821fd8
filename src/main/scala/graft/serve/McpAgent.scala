package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.json4s._

/** The MCP-enabled agent — the re-expression of the reference's
  * `MCPFileSystemAgent` (/root/reference/src/agent_mcp.py:13-126):
  * the agent RUNS the MCP server in-process (agent_mcp.py:60-63's
  * asyncio server task → a daemon loopback thread here) and routes
  * its own driver-side file operations through the tool surface via a
  * connected [[McpClient.Session]] — the wiring MCPETLEngine /
  * MCPJobScheduler get via `use_mcp=True` (agent_mcp.py:29-41). The
  * value of the indirection is the same as the reference's: every file
  * touch rides the allowlist/sandbox guards and lands in the event log
  * ([[status]] mirrors get_mcp_status, agent_mcp.py:116-126).
  *
  * Division of labor is Spark-first: MCP verbs are the driver-side
  * SERVING plane (listing, small reads, job scripts — single-node by
  * nature); corpus-scale ingest stays on the DATA plane
  * ([[graft.index.FileIndex]] reads distributed). [[ingestDirectory]]
  * is the bridge for the reference's ETL-through-MCP shape: a BOUNDED
  * directory is extracted through the tool surface into a DataFrame
  * the engine's text/dedup operators consume.
  */
object McpAgent {

  final class Agent(val cfg: Mcp.McpConfig) {
    val tools = new Mcp.Tools(cfg)
    private val server = new Mcp.McpServer(tools)
    /** The agent's own client over the in-process server. */
    val client: McpClient.Session = McpClient.loopback(server)
    val serverInfo: McpClient.ServerInfo = client.initialize()

    /** get_mcp_status parity (agent_mcp.py:116-126). */
    def status: Map[String, String] = Map(
      "enabled" -> cfg.enabled.toString,
      "server_running" -> client.isConnected.toString,
      "events_count" -> tools.events.size.toString,
      "security_mode" -> cfg.securityMode)

    /** MCP-backed extract: list `path` through the tool surface, read
      * each regular file, return (path, name, size, content). Bounded
      * by contract (`maxFiles`, fail-loud): this is the serving-plane
      * bridge — the reference's MCPETLEngine extract stage — not the
      * corpus ingest path ([[graft.index.FileIndex]] owns that; a
      * driver-side per-file read does not scale past a job directory).
      * Every read is sandbox-checked and event-logged by the server.
      */
    def ingestDirectory(
        spark: SparkSession, path: String, maxFiles: Int = 10000): DataFrame = {
      val items = client.listDirectory(path)
      val files = items.filter(i => (i \ "type") == JString("file"))
      require(files.size <= maxFiles,
        s"$path holds ${files.size} files > maxFiles=$maxFiles -- " +
          "the MCP ingest bridge is a bounded serving-plane verb; " +
          "use graft.index.FileIndex for corpus-scale ingest")
      val sep = if (path.endsWith("/")) "" else "/"
      val rows = files.map { i =>
        val name = (i \ "name") match { case JString(s) => s; case _ => "" }
        val size = (i \ "size") match { case JInt(n) => n.toLong; case _ => 0L }
        val full = s"$path$sep$name"
        (full, name, size, client.readFile(full))
      }
      import spark.implicits._
      rows.toDF("path", "name", "size", "content")
    }

    def stop(): Unit = client.close()
  }

  def apply(cfg: Mcp.McpConfig = Mcp.McpConfig()): Agent = new Agent(cfg)
}
