package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm EVERY query once at the smallest SF: first execution pays
    // Catalyst analysis + Janino codegen compilation (hundreds of ms to
    // seconds per query) — that cost is per-plan-shape, not per-data,
    // and must not pollute the measured numbers. Fall back to the
    // measured dir if the small SF isn't present on this machine.
    val warmDir0 = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val warmDir = if (new java.io.File(warmDir0).isDirectory) warmDir0 else sfDir
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
    }
    spark.catalog.clearCache()
    // best-of-3 per query, rounds INTERLEAVED (run the whole suite,
    // three times) rather than back-to-back repeats: single-shot numbers
    // on a shared machine swing 5-10x from transient contention, and
    // back-to-back repeats let one contention window poison both samples
    // of the same query. The per-query min across spread-out rounds is
    // the plan's cost.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (round <- 1 to 3; (name, fn) <- names) {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED (round $round): ${e.getMessage}"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // no cross-query cache memory creep
      // a failing query must not report its time-to-exception as a score
      if (ok) samples(name) = dt :: samples(name)
    }
    val results = names.map { case (name, _) =>
      val good = samples(name)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    // JSON string escape (same contract as Verify's q()): a quote or
    // backslash in a query name or the env-supplied sf dir must not
    // corrupt the metric line the runner parses
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // per-query values are ROUNDED to 1 ms in the stdout line: the
    // runner captures only a bounded stdout tail, and round 5's artifact
    // (BENCH_r05.json parsed:null) proved a full-precision 62-query line
    // can outgrow that window and get truncated mid-JSON. Rounding keeps
    // the line comfortably under ~2 KB; full precision lives in the file.
    def qmap(round: Boolean) = results.map { case (k, v) =>
      val value = if (round && v >= 0.0) math.rint(v * 1000) / 1000 else v
      "\"" + esc(k) + "\":" + value
    }.mkString("{", ",", "}")
    // failed queries report -1.0 per-query but are EXCLUDED from the
    // total (a failure must never shrink — i.e. improve — the headline
    // number) and surfaced in an explicit count
    val good = results.filter(_._2 >= 0.0)
    val totalFull = good.map(_._2).sum
    val failed = results.size - good.size
    // total follows its line's quantum: full precision in the file
    // (value == sum of the file's own per-query values), 1 ms on stdout
    def metricLine(round: Boolean) = {
      val total = if (round) math.rint(totalFull * 1000) / 1000 else totalFull
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":${qmap(round)},"sf":"${esc(sfDir)}"}"""
    }
    // belt-and-braces for log-prefixing runners: also drop the (full
    // precision) line in a file before stopping the session
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (metricLine(round = false) + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $outFile: ${e.getMessage}") }
    spark.stop()
    // the metric line is the LAST thing on stdout — printed after
    // spark.stop() so no shutdown logging can push it out of a bounded
    // tail capture — and explicitly flushed
    println(metricLine(round = true))
    System.out.flush()
  }
}
