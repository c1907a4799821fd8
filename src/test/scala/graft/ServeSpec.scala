package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.analyze.{Finding, Findings}
import graft.pipeline.Pipeline
import graft.serve.{HttpApi, Mcp}

/** S15 serving surface: the MCP stdio tool server
  * ([[graft.serve.Mcp]], reference src/mcp_server.py) and the HTTP
  * monitoring/audit API ([[graft.serve.HttpApi]], reference
  * src/monitoring.py + src/audit/monitor.py). Protocol tests drive the
  * real wire paths: the JSON-RPC loop over byte streams, the HTTP
  * endpoints over a real ephemeral-port server.
  */
class ServeSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def toolsIn(root: String, mode: String = "strict",
      maxFileSize: Long = 100L * 1024 * 1024): Mcp.Tools =
    new Mcp.Tools(Mcp.McpConfig(
      allowedPaths = Seq(root), securityMode = mode, maxFileSize = maxFileSize))

  // ---------------------------------------------------------------- MCP tools

  test("mcp: write/read round trip inside the allowlist") {
    val root = tmpDir("mcp")
    val t = toolsIn(root)
    val w = t.writeFile(s"$root/a/b.txt", "hello graft")
    assert(!w.isError && w.text.contains("11 characters"))
    val r = t.readFile(s"$root/a/b.txt")
    assert(!r.isError && r.text == "hello graft")
  }

  test("mcp: strict mode denies paths outside the allowlist") {
    val root = tmpDir("mcp")
    val t = toolsIn(root)
    val r = t.readFile("/etc/hostname")
    assert(r.isError && r.text.startsWith("Error: Access denied"))
    // denied calls leave no event (reference logs only successes)
    assert(t.events.isEmpty)
  }

  test("mcp: empty allowlist allows everything; permissive mode allows everything") {
    val root = tmpDir("mcp")
    Files.write(Paths.get(root, "x.txt"), "x".getBytes(StandardCharsets.UTF_8))
    val open = new Mcp.Tools(Mcp.McpConfig(allowedPaths = Nil, securityMode = "strict"))
    assert(!open.readFile(s"$root/x.txt").isError)
    val perm = new Mcp.Tools(Mcp.McpConfig(
      allowedPaths = Seq("/nonexistent"), securityMode = "permissive"))
    assert(!perm.readFile(s"$root/x.txt").isError)
  }

  test("mcp: max_file_size caps reads") {
    val root = tmpDir("mcp")
    Files.write(Paths.get(root, "big.txt"), ("x" * 64).getBytes(StandardCharsets.UTF_8))
    val t = toolsIn(root, maxFileSize = 16)
    val r = t.readFile(s"$root/big.txt")
    assert(r.isError && r.text.contains("File too large"))
  }

  test("mcp: list/info/mkdir/delete lifecycle") {
    val root = tmpDir("mcp")
    val t = toolsIn(root)
    assert(!t.createDirectory(s"$root/sub/deep").isError)
    t.writeFile(s"$root/sub/deep/f.txt", "data")
    val ls = t.listDirectory(s"$root/sub")
    assert(!ls.isError)
    val entries = JsonMethods.parse(ls.text).asInstanceOf[JArray].arr
    assert(entries.size == 1)
    assert((entries.head \ "name") == JString("deep"))
    assert((entries.head \ "type") == JString("directory"))
    val info = t.getFileInfo(s"$root/sub/deep/f.txt")
    assert(!info.isError)
    val ij = JsonMethods.parse(info.text)
    assert((ij \ "type") == JString("file"))
    assert((ij \ "size") == JInt(4))
    // recursive directory delete (reference shutil.rmtree branch)
    val del = t.deleteFile(s"$root/sub")
    assert(!del.isError)
    assert(!Files.exists(Paths.get(root, "sub")))
    val missing = t.getFileInfo(s"$root/sub/deep/f.txt")
    assert(missing.isError && missing.text.contains("Path not found"))
  }

  test("mcp: command allowlist and exit-code propagation") {
    val root = tmpDir("mcp")
    val t = toolsIn(root)
    val ok = t.executeCommand("ls", Seq(root))
    assert(!ok.isError)
    val oj = JsonMethods.parse(ok.text)
    assert((oj \ "returncode") == JInt(0))
    val denied = t.executeCommand("rm", Seq("-rf", root))
    assert(denied.isError && denied.text.contains("Command not allowed"))
    assert(Files.exists(Paths.get(root)))
    // allowlisted command with nonzero exit => isError (reference semantics)
    val fail = t.executeCommand("ls", Seq(s"$root/definitely-not-here"))
    assert(fail.isError)
    assert((JsonMethods.parse(fail.text) \ "returncode") != JInt(0))
  }

  test("mcp: symlinks cannot escape the strict-mode allowlist") {
    val root = tmpDir("mcp")
    val outside = tmpDir("mcp-outside")
    Files.write(Paths.get(outside, "secret.txt"), "s3cret".getBytes(StandardCharsets.UTF_8))
    Files.createSymbolicLink(Paths.get(root, "ln"), Paths.get(outside))
    val t = toolsIn(root)
    // textual normalization would pass startsWith(root); the resolved
    // real path lands outside and must be denied (reference
    // Path.resolve() semantics)
    val r = t.readFile(s"$root/ln/secret.txt")
    assert(r.isError && r.text.contains("Access denied"), r.text)
    val w = t.writeFile(s"$root/ln/evil.txt", "x")
    assert(w.isError && w.text.contains("Access denied"))
    assert(!Files.exists(Paths.get(outside, "evil.txt")))
  }

  test("mcp: execute_command caps captured output and says so") {
    val root = tmpDir("mcp")
    Files.write(Paths.get(root, "big.txt"), ("y" * 4096).getBytes(StandardCharsets.UTF_8))
    val t = new Mcp.Tools(Mcp.McpConfig(
      allowedPaths = Seq(root), allowedCommands = Set("cat"), maxFileSize = 128))
    val r = t.executeCommand("cat", Seq(s"$root/big.txt"))
    assert(!r.isError) // rc == 0; truncation is flagged, not an error
    val j = JsonMethods.parse(r.text)
    assert((j \ "output_truncated") == JBool(true), r.text.take(300))
    assert((j \ "stdout").asInstanceOf[JString].s.length == 128)
  }

  test("mcp: non-string args error instead of silently dropping elements") {
    val root = tmpDir("mcp")
    val t = toolsIn(root)
    val r = t.call("execute_command", JsonMethods.parse(
      s"""{"command":"ls","args":["$root",123]}"""))
    assert(r.isError && r.text.contains("only strings"), r.text)
  }

  test("mcp: a hung command hits the timeout, not a forever-block") {
    val root = tmpDir("mcp")
    val t = new Mcp.Tools(Mcp.McpConfig(
      allowedPaths = Seq(root), allowedCommands = Set("sleep"),
      commandTimeoutSeconds = 1L))
    val t0 = System.nanoTime()
    val r = t.executeCommand("sleep", Seq("30"))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(r.isError && r.text.contains("timed out"), r.text)
    assert(sec < 10.0, s"timeout took ${sec}s — output drain is blocking the deadline")
  }

  test("mcp: event log records successful operations in order") {
    val root = tmpDir("mcp")
    val t = toolsIn(root)
    t.writeFile(s"$root/e.txt", "1")
    t.readFile(s"$root/e.txt")
    t.getFileInfo(s"$root/e.txt")
    val evs = t.events
    assert(evs.map(_.eventType) == Seq("write_file", "read_file", "get_file_info"))
    assert(evs.map(_.seq) == Seq(1L, 2L, 3L))
    assert(evs.head.metadata("size") == "1")
  }

  // ---------------------------------------------------------------- MCP wire

  private def runWire(tools: Mcp.Tools, lines: Seq[String]): Seq[JValue] = {
    val in = new ByteArrayInputStream(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val out = new ByteArrayOutputStream()
    new Mcp.McpServer(tools).serve(in, out)
    out.toString(StandardCharsets.UTF_8).split('\n').toSeq
      .filter(_.trim.nonEmpty).map(JsonMethods.parse(_))
  }

  test("mcp wire: initialize / tools list / tools call over the stdio loop") {
    val root = tmpDir("mcpw")
    Files.write(Paths.get(root, "w.txt"), "wire".getBytes(StandardCharsets.UTF_8))
    val reqs = Seq(
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""",
      """{"jsonrpc":"2.0","method":"notifications/initialized"}""",
      """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""",
      s"""{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"read_file","arguments":{"path":"$root/w.txt"}}}""",
      """not json at all""",
      """{"jsonrpc":"2.0","id":4,"method":"no/such"}"""
    )
    val resp = runWire(toolsIn(root), reqs)
    // notification gets no response: 6 lines in, 5 responses out
    assert(resp.size == 5)
    assert((resp(0) \ "result" \ "protocolVersion") == JString("2024-11-05"))
    assert((resp(0) \ "result" \ "serverInfo" \ "name") == JString("graft-filesystem"))
    val toolNames = (resp(1) \ "result" \ "tools").asInstanceOf[JArray].arr
      .map(t => (t \ "name").asInstanceOf[JString].s).toSet
    assert(toolNames == Set("read_file", "write_file", "list_directory",
      "execute_command", "create_directory", "delete_file", "get_file_info"))
    assert((resp(2) \ "result" \ "isError") == JBool(false))
    val text = (resp(2) \ "result" \ "content").asInstanceOf[JArray].arr.head \ "text"
    assert(text == JString("wire"))
    assert((resp(3) \ "error" \ "code") == JInt(-32700))
    assert((resp(4) \ "error" \ "code") == JInt(-32601))
  }

  test("mcp wire: unknown tool is a tool-level error, not a protocol error") {
    val resp = runWire(toolsIn(tmpDir("mcpw")), Seq(
      """{"jsonrpc":"2.0","id":9,"method":"tools/call","params":{"name":"teleport","arguments":{}}}"""))
    assert(resp.size == 1)
    assert((resp.head \ "error") == JNothing)
    assert((resp.head \ "result" \ "isError") == JBool(true))
  }

  // ---------------------------------------------------------------- HTTP API

  private val fixtureFindings = Seq(
    Finding("open admin port", "d1", "critical", "network", "host1", "scan", "{}"),
    Finding("weak cipher", "d2", "high", "network", "host2", "scan", "{}"),
    Finding("stale account", "d3", "high", "process", "host3", "scan", "{}"),
    Finding("note", "d4", "info", "system", "host4", "scan", "{}"))

  private def withApi[A](api: HttpApi)(body: (Int, HttpClient) => A): A = {
    val port = api.start(0)
    val client = HttpClient.newHttpClient()
    try body(port, client) finally api.stop()
  }

  private def get(client: HttpClient, port: Int, path: String): (Int, JValue) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode, JsonMethods.parse(r.body))
  }

  private def post(client: HttpClient, port: Int, path: String): (Int, JValue) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode, JsonMethods.parse(r.body))
  }

  private def postJson(client: HttpClient, port: Int, path: String, body: String): (Int, JValue) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode, JsonMethods.parse(r.body))
  }

  test("http: health, status, metrics, jobs, 404") {
    val api = new HttpApi(spark, () => Findings.toDS(spark, fixtureFindings).toDF)
    api.registerJob(HttpApi.JobRecord("j1", "extract", "completed", 1000L, Some(3000L)))
    api.registerJob(HttpApi.JobRecord("j2", "load", "running", 5000L, None))
    api.registerJob(HttpApi.JobRecord("j3", "transform", "failed", 6000L, Some(6500L)))
    api.registerScheduled(HttpApi.ScheduledJobRecord("nightly", "0 2 * * *", enabled = true))
    withApi(api) { (port, client) =>
      val (hc, hj) = get(client, port, "/health")
      assert(hc == 200 && (hj \ "status") == JString("healthy"))

      val (sc, sj) = get(client, port, "/status")
      assert(sc == 200)
      assert((sj \ "agent_status") == JString("running"))
      assert((sj \ "uptime").asInstanceOf[JDouble].num >= 0.0)
      assert((sj \ "job_metrics" \ "total_jobs") == JInt(3))
      assert((sj \ "job_metrics" \ "running_jobs") == JInt(1))
      assert((sj \ "job_metrics" \ "failed_jobs") == JInt(1))
      assert((sj \ "job_metrics" \ "average_duration") == JDouble(2.0))

      val (mc, mj) = get(client, port, "/metrics")
      assert(mc == 200)
      assert((mj \ "system" \ "cpu_percent").isInstanceOf[JDouble])
      assert((mj \ "system" \ "memory_percent").asInstanceOf[JDouble].num > 0.0)
      assert((mj \ "history").asInstanceOf[JArray].arr.nonEmpty)

      val (jc, jj) = get(client, port, "/jobs")
      assert(jc == 200)
      assert((jj \ "etl_jobs").asInstanceOf[JArray].arr.size == 3)
      val sched = (jj \ "scheduled_jobs").asInstanceOf[JArray].arr
      assert(sched.size == 1 && (sched.head \ "schedule") == JString("0 2 * * *"))

      val (nc, nj) = get(client, port, "/nope")
      assert(nc == 404 && (nj \ "error") != JNothing)

      // contexts match by prefix in com.sun HttpServer — routes must
      // still 404 a prefix-extended path, not answer it (a typo'd
      // POST /audit/process-scan-x would otherwise launch a real scan)
      val (pxc, _) = get(client, port, "/healthzzz")
      assert(pxc == 404, "/healthzzz answered as /health (prefix-match leak)")
      val (pxj, _) = get(client, port, "/jobs-foo")
      assert(pxj == 404)
    }
  }

  test("http: audit findings filter severity/domain with plan-side limit") {
    val api = new HttpApi(spark, () => Findings.toDS(spark, fixtureFindings).toDF)
    withApi(api) { (port, client) =>
      val (c1, j1) = get(client, port, "/audit/findings?severity=high")
      assert(c1 == 200 && (j1 \ "count") == JInt(2))
      val sevs = (j1 \ "findings").asInstanceOf[JArray].arr.map(f => f \ "severity").distinct
      assert(sevs == List(JString("high")))

      val (c2, j2) = get(client, port, "/audit/findings?severity=high&domain=process")
      assert(c2 == 200 && (j2 \ "count") == JInt(1))
      val one = (j2 \ "findings").asInstanceOf[JArray].arr.head
      assert((one \ "title") == JString("stale account"))

      val (c3, j3) = get(client, port, "/audit/findings?limit=2")
      assert(c3 == 200 && (j3 \ "count") == JInt(2))
      // severity-ranked: critical first (Findings.topFindings ordering)
      val first = (j3 \ "findings").asInstanceOf[JArray].arr.head
      assert((first \ "severity") == JString("critical"))
    }
  }

  test("http: search serving over persisted lex + ANN indexes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = tmpDir("srch")
    val docs = Seq(
      (1L, "the quick brown fox jumps", Array(1f, 0f, 0f, 0f)),
      (2L, "lazy dogs sleep all day", Array(0f, 1f, 0f, 0f)),
      (3L, "quick brown foxes and quick dogs", Array(0.9f, 0.1f, 0f, 0f)),
      (4L, "a completely unrelated document", Array(0f, 0f, 1f, 0f)),
      (5L, "brown bears eat honey", Array(0f, 0f, 0.9f, 0.1f)),
      (6L, "the fox den sits under the hill", Array(0.8f, 0f, 0.2f, 0f))
    ).toDF("id", "text", "emb")
    graft.operators.Bm25.buildLexIndex(docs, col("id"), col("text"), s"$root/lex", nBuckets = 8)
    graft.operators.Ann.buildIvfIndex(docs, col("id"), col("emb"), s"$root/ann", nlist = 2)

    // direct persisted-path call = the serving oracle
    val direct = graft.operators.Bm25.queryLexIndex(
      spark, s"$root/lex", Seq((0L, "quick fox")).toDF("q_id", "qtext"),
      col("q_id"), col("qtext"), 3)
      .orderBy(col("rank")).select("doc_id").as[Long].collect().toSeq

    val api = new HttpApi(spark, () => Findings.toDS(spark, fixtureFindings).toDF,
      lexIndexPath = Some(s"$root/lex"), annIndexPath = Some(s"$root/ann"))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    withApi(api) { (port, client) =>
      val (lc, lj) = get(client, port, "/search/lexical?q=quick%20fox&k=3")
      assert(lc == 200)
      val served = (lj \ "results").asInstanceOf[JArray].arr
        .sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
        .map(r => (r \ "doc_id").asInstanceOf[JInt].num.toLong)
      assert(served == direct)

      val (pc, pj) = get(client, port, "/search/phrase?q=quick%20brown&k=5")
      assert(pc == 200)
      val phraseDocs = (pj \ "results").asInstanceOf[JArray].arr
        .map(r => (r \ "doc_id").asInstanceOf[JInt].num.toLong).toSet
      assert(phraseDocs == Set(1L, 3L)) // exact adjacency: not doc 5/6

      val (ac, aj) = get(client, port, "/search/ann?vec=1,0,0,0&k=2&nprobe=2")
      assert(ac == 200)
      val annTop = (aj \ "results").asInstanceOf[JArray].arr
        .sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
        .map(r => (r \ "b_id").asInstanceOf[JInt].num.toLong)
      assert(annTop.head == 1L) // exact match on the query vector
      assert(annTop.size == 2)

      val (hc, hj) = get(client, port, "/search/hybrid?q=quick%20fox&vec=1,0,0,0&k=3&nprobe=2")
      assert(hc == 200)
      val hybridTop = (hj \ "results").asInstanceOf[JArray].arr
        .sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
        .map(r => (r \ "doc_id").asInstanceOf[JInt].num.toLong)
      // doc 1 wins both legs => wins the fusion
      assert(hybridTop.head == 1L)

      // MMR diversification: with vec=1,0,0,0 the plain top-2 is
      // doc 1 + its near-duplicate doc 3; diversify=2 at λ=0.5 keeps
      // doc 1 and displaces the near-dup with an orthogonal doc (the
      // near-dups' penalty ≈ their relevance, ties resolve to the
      // smallest id among the orthogonal remainder: doc 2)
      val (dvc, dvj) = get(client, port,
        "/search/ann?vec=1,0,0,0&k=4&nprobe=2&diversify=2&lambda=0.5")
      assert(dvc == 200)
      val divTop = (dvj \ "results").asInstanceOf[JArray].arr
        .sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
        .map(r => (r \ "b_id").asInstanceOf[JInt].num.toLong)
      assert(divTop == List(1L, 2L), s"diversified ranking was $divTop")

      val (mc, mj) = get(client, port, "/search/lexical?k=3")
      assert(mc == 400 && (mj \ "error") != JNothing)
      val (vc, _) = get(client, port, "/search/ann?vec=not,floats")
      assert(vc == 400)

      // ?diversify= on a non-ann kind is a LOUD 400, not a silent
      // ignore — undiversified results that look diversified would
      // contradict the fail-loud contract
      for (kind <- Seq("lexical?q=quick%20fox", "phrase?q=quick%20fox",
          "hybrid?q=quick%20fox&vec=1,0,0,0")) {
        val (dc, dj) = get(client, port, s"/search/$kind&k=3&diversify=2")
        assert(dc == 400, s"diversify on $kind answered $dc, not 400")
        assert((dj \ "error").asInstanceOf[JString].s.contains("only supported on /search/ann"))
      }

      // bounded sidecar observability: 6 docs indexed in both lakes
      val (ic, ij) = get(client, port, "/index/stats")
      assert(ic == 200)
      assert((ij \ "ann" \ "occupancy") == JInt(6))
      assert((ij \ "ann" \ "cells") == JInt(2))
      assert((ij \ "lex" \ "n_docs") == JInt(6))
      assert((ij \ "lex" \ "indexed_empty") == JInt(0))

      // batch POST: three lexical queries through ONE plan must equal
      // three single GETs, demultiplexed by q_id
      val batch = """{"queries":[
        {"id":11,"q":"quick fox"},
        {"id":12,"q":"lazy dogs"},
        {"id":13,"q":"honey"}]}"""
      val (bc, bj) = postJson(client, port, "/search/lexical?k=3", batch)
      assert(bc == 200)
      val byQuery = (bj \ "results").asInstanceOf[JArray].arr
        .groupBy(r => (r \ "q_id").asInstanceOf[JInt].num.toLong)
        .view.mapValues(_.sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
          .map(r => (r \ "doc_id").asInstanceOf[JInt].num.toLong)).toMap
      for ((id, q) <- Seq(11L -> "quick fox", 12L -> "lazy dogs", 13L -> "honey")) {
        val (sc2, sj2) = get(client, port, s"/search/lexical?q=${q.replace(" ", "%20")}&k=3")
        assert(sc2 == 200)
        val single = (sj2 \ "results").asInstanceOf[JArray].arr
          .sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
          .map(r => (r \ "doc_id").asInstanceOf[JInt].num.toLong)
        assert(byQuery.getOrElse(id, Nil) == single,
          s"batch result for query $id diverged from the single-query GET")
      }

      // batch hybrid: both modalities per query, one plan
      val hb = """{"queries":[
        {"id":1,"q":"quick fox","vec":[1,0,0,0]},
        {"id":2,"q":"honey","vec":[0,0,1,0]}]}"""
      val (hbc, hbj) = postJson(client, port, "/search/hybrid?k=2&nprobe=2", hb)
      assert(hbc == 200)
      val hybridByQ = (hbj \ "results").asInstanceOf[JArray].arr
        .groupBy(r => (r \ "q_id").asInstanceOf[JInt].num.toLong)
      assert(hybridByQ.keySet == Set(1L, 2L))

      // batch + MMR: the diversify params apply per query of the batch
      val db = """{"queries":[
        {"id":1,"vec":[1,0,0,0]},
        {"id":2,"vec":[0,0,1,0]}]}"""
      val (dbc, dbj) = postJson(client, port,
        "/search/ann?k=4&nprobe=2&diversify=2&lambda=0.5", db)
      assert(dbc == 200)
      val divByQ = (dbj \ "results").asInstanceOf[JArray].arr
        .groupBy(r => (r \ "q_id").asInstanceOf[JInt].num.toLong)
        .view.mapValues(_.sortBy(r => (r \ "rank").asInstanceOf[JInt].num)
          .map(r => (r \ "b_id").asInstanceOf[JInt].num.toLong)).toMap
      // query 1 mirrors the GET diversify case; query 2's near-dup
      // (doc 5, cos≈.994 to doc 4's exact match) is displaced the
      // same way
      assert(divByQ(1L) == List(1L, 2L), s"batch diversify q1: ${divByQ(1L)}")
      assert(divByQ(2L).head == 4L && divByQ(2L).size == 2)
      assert(divByQ(2L)(1) != 5L, "near-dup should be displaced for q2")

      // batch guards: duplicate ids, empty batch, missing field
      val (dc, dj) = postJson(client, port, "/search/lexical",
        """{"queries":[{"id":1,"q":"a"},{"id":1,"q":"b"}]}""")
      assert(dc == 400 && (dj \ "error") != JNothing)
      val (ec2, _) = postJson(client, port, "/search/lexical", """{"queries":[]}""")
      assert(ec2 == 400)
      val (fc, fj) = postJson(client, port, "/search/ann",
        """{"queries":[{"id":1,"q":"text but no vec"}]}""")
      assert(fc == 400 && (fj \ "error").asInstanceOf[JString].s.contains("missing query vector"))
      // non-integral id is a 400, NOT a silent renumber (the caller
      // demultiplexes by id — renumbering reads as "no matches")
      val (nc, nj) = postJson(client, port, "/search/lexical",
        """{"queries":[{"id":7.5,"q":"quick"}]}""")
      assert(nc == 400 && (nj \ "error").asInstanceOf[JString].s.contains("non-integral id"))
      val (nsc, _) = postJson(client, port, "/search/lexical",
        """{"queries":[{"id":"7","q":"quick"}]}""")
      assert(nsc == 400)
      // empty vec [] is a 400 like the GET form, not a 500 from dim checks
      val (evc, evj) = postJson(client, port, "/search/ann",
        """{"queries":[{"id":1,"vec":[]}]}""")
      assert(evc == 400 && (evj \ "error").asInstanceOf[JString].s.contains("non-empty"))
      // a stray/malformed vec param on a lexical GET is ignored, not a 400
      val (strayC, strayJ) = get(client, port, "/search/lexical?q=quick%20fox&k=3&vec=abc")
      assert(strayC == 200 && (strayJ \ "count") == JInt(3))

      // served requests must not accumulate cached frames — the route
      // runs under Dedup.scoped, so the verbs' scopedCache
      // intermediates are unpersisted per request (a long-running
      // server would otherwise leak one tiny frame per call)
      assert(spark.sparkContext.getPersistentRDDs.size <= cachedBefore,
        "search serving leaked cached frames into the block manager")
    }

    // an api without indexes refuses serving, not answers garbage
    val bare = new HttpApi(spark, () => Findings.toDS(spark, fixtureFindings).toDF)
    withApi(bare) { (port, client) =>
      val (c, j) = get(client, port, "/search/lexical?q=x")
      assert(c == 503 && (j \ "error") != JNothing)
      val (sc, _) = get(client, port, "/index/stats")
      assert(sc == 503)
    }
  }

  test("http: audit tools, events, process-scan with report") {
    val root = tmpDir("api")
    val mcp = new Mcp.Tools(Mcp.McpConfig(allowedPaths = Seq(root)))
    mcp.writeFile(s"$root/seen.txt", "1")
    val runner: HttpApi.ScanRunner = { s =>
      val run = Pipeline.run(Seq(
        "collect" -> (ctx => ctx + ("raw" -> Findings.toDS(s, fixtureFindings).toDF)),
        "analyze" -> (ctx => ctx + ("findings" -> Findings.dropInfo(ctx("raw"))))))
      (run, run.context("findings"))
    }
    val api = new HttpApi(spark,
      () => Findings.toDS(spark, fixtureFindings).toDF,
      auditTools = Seq(
        HttpApi.AuditTool("sysinternals", "Sysinternals Suite", installed = true, Some("/opt/sys")),
        HttpApi.AuditTool("nmap", "Nmap", installed = false, None)),
      processScan = Some(runner),
      mcpTools = Some(mcp),
      reportDir = Some(root))
    withApi(api) { (port, client) =>
      val (tc, tj) = get(client, port, "/audit/tools")
      assert(tc == 200)
      assert((tj \ "installed_count") == JInt(1) && (tj \ "total_count") == JInt(2))
      assert((tj \ "tools" \ "sysinternals" \ "installed") == JBool(true))

      val (ec, ej) = get(client, port, "/events")
      assert(ec == 200)
      val evs = ej.asInstanceOf[JArray].arr
      assert(evs.size == 1 && (evs.head \ "event_type") == JString("write_file"))

      val (s0, sj0) = get(client, port, "/audit/scans")
      assert(s0 == 200 && (sj0 \ "count") == JInt(0))

      // GET on process-scan is refused; POST runs the pipeline
      val (bad, _) = get(client, port, "/audit/process-scan")
      assert(bad == 405)
      val (pc, pj) = post(client, port, "/audit/process-scan")
      assert(pc == 200)
      assert((pj \ "status") == JString("completed"))
      assert((pj \ "total_findings") == JInt(3)) // info row dropped by analyze stage
      assert((pj \ "critical_findings") == JInt(1))
      assert((pj \ "high_findings") == JInt(2))
      val stages = (pj \ "stages").asInstanceOf[JArray].arr
      assert(stages.map(s => s \ "name") == List(JString("collect"), JString("analyze")))
      val reportPath = (pj \ "report_path").asInstanceOf[JString].s
      assert(Files.exists(Paths.get(reportPath)))
      assert(Files.readString(Paths.get(reportPath)).contains("Process Scan"))

      val (s1, sj1) = get(client, port, "/audit/scans")
      assert(s1 == 200 && (sj1 \ "count") == JInt(1))
      val scan = (sj1 \ "scans").asInstanceOf[JArray].arr.head
      assert((scan \ "pipeline_name") == JString("process_scan"))
    }
  }
}
