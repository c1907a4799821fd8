package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions.col

import graft.serve.HttpApi

/** Serving-latency measurement over the HTTP surface: builds the
  * persisted lex + IVF indexes at the given SF, starts [[HttpApi]] on
  * an ephemeral port, and times N single-query GETs against ONE
  * batched POST of the same N queries per verb. The number this exists
  * to produce is the batch amortization factor — per-query cost of a
  * batch vs per-query cost of request-at-a-time serving (each GET pays
  * a full Spark job; a batch pays it once). Results go to stdout as
  * one JSON line and get recorded in SCALE.md; NOT part of the driver
  * bench contract (Bench.scala owns that).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val n = args.lift(1).flatMap(_.toIntOption).getOrElse(24)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_servebench").toString
    val docs = Tables.t(spark, sfDir, "documents")
    val embs = Tables.t(spark, sfDir, "embeddings")
    graft.operators.Bm25.buildLexIndex(docs, col("doc_id"), col("text"), s"$work/lex")
    graft.operators.Ann.buildIvfIndex(embs, col("vec_id"), col("embedding"), s"$work/ann")

    // query workload drawn from the corpus itself: first 3 words of the
    // first n NON-BLANK docs (the corpus legitimately contains empty
    // docs — lexEmptyDocCount models them — and a blank query would
    // 400 the bench, not measure it), and the first n embeddings
    val texts = docs.orderBy("doc_id").limit(n * 4)
      .select(col("text")).collect()
      .map(r => Option(r.getString(0)).getOrElse("").split("\\s+").filter(_.nonEmpty).take(3).mkString(" "))
      .filter(_.nonEmpty)
      .take(n)
    require(texts.length == n, s"corpus too sparse for $n non-blank queries")
    val vecs = embs.orderBy("vec_id").limit(n)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)

    val api = new HttpApi(spark,
      () => graft.analyze.Findings.toDS(spark, Nil).toDF,
      lexIndexPath = Some(s"$work/lex"), annIndexPath = Some(s"$work/ann"))
    val port = api.start(0)
    val client = HttpClient.newHttpClient()

    def get(path: String): Unit = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
      require(r.statusCode == 200, s"GET $path -> ${r.statusCode}: ${r.body.take(200)}")
    }
    def post(path: String, body: String): Unit = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      require(r.statusCode == 200, s"POST $path -> ${r.statusCode}: ${r.body.take(200)}")
    }
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    def timeSec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // proper JSON string escaping — corpus text may carry quotes,
    // backslashes or control characters, and a broken body would abort
    // the bench instead of measuring it
    def jsonEsc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val lexBatch =
      s"""{"queries":[${texts.zipWithIndex.map { case (t, i) =>
        s"""{"id":$i,"q":"${jsonEsc(t)}"}""" }.mkString(",")}]}"""
    val annBatch =
      s"""{"queries":[${vecs.zipWithIndex.map { case (v, i) =>
        s"""{"id":$i,"vec":[${v.mkString(",")}]}""" }.mkString(",")}]}"""

    // warm both plans once (codegen + sidecar reads), then measure
    get(s"/search/lexical?q=${enc(texts.head)}&k=10")
    post("/search/lexical?k=10", lexBatch)
    get(s"/search/ann?vec=${vecs.head.mkString(",")}&k=10")
    post("/search/ann?k=10", annBatch)

    val lexSingles = timeSec(texts.foreach(t => get(s"/search/lexical?q=${enc(t)}&k=10")))
    val lexBatched = timeSec(post("/search/lexical?k=10", lexBatch))
    val annSingles = timeSec(vecs.foreach(v => get(s"/search/ann?vec=${v.mkString(",")}&k=10")))
    val annBatched = timeSec(post("/search/ann?k=10", annBatch))

    api.stop()
    spark.stop()
    def ms(sec: Double) = math.rint(sec / n * 100000) / 100 // ms per query
    println(
      s"""{"metric":"serve_latency","sf":"$sfDir","n":$n,""" +
        s""""lexical":{"single_ms_per_q":${ms(lexSingles)},"batch_ms_per_q":${ms(lexBatched)}},""" +
        s""""ann":{"single_ms_per_q":${ms(annSingles)},"batch_ms_per_q":${ms(annBatched)}}}""")
    System.out.flush()
  }
}
