package graft
object Bench {

  /** Execute a query's FULL plan: the noop sink materializes every
    * output column. `.count()` (used through round 8) let Catalyst
    * PRUNE un-consumed columns — for aggregate-tailed queries that
    * silently measured a plan without its aggregate payload (q22's
    * KMV sketch never ran under count: 0.2 s measured vs 8.5 s real).
    * Numbers from round 9 on are therefore NOT comparable to earlier
    * rounds for agg-tailed queries — the methodology got stronger,
    * not the engine slower (see SCALE.md round-9 notes).
    */
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

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
    // SPARK_GRAFT_BENCH_ONLY (comma-joined names): restrict the run to
    // a query subset — the controlled-experiment affordance (A/B a
    // fixed subset across code versions / suite sizes without editing
    // the suite). Subset runs write BENCH_OUT.subset.json so the
    // committed full-suite gate artifact can never be clobbered by an
    // experiment.
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      only.fold(all) { f =>
        val sel = all.filter(n => f(n._1))
        val missing = f -- sel.map(_._1).toSet
        if (missing.nonEmpty)
          System.err.println(s"[bench] BENCH_ONLY names not in suite: ${missing.toSeq.sorted.mkString(",")}")
        sel
      }
    }
    selected.foreach { case (name, fn) =>
      try exec(fn(spark, warmDir))
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name: ${e.getMessage}") }
    }
    spark.catalog.clearCache()
    // best-of-3 per query, rounds INTERLEAVED (run the whole suite,
    // three times) rather than back-to-back repeats: single-shot numbers
    // on a shared machine swing 5-10x from transient contention, and
    // back-to-back repeats let one contention window poison both samples
    // of the same query. The per-query min across spread-out rounds is
    // the plan's cost.
    val names = selected
    // BUILD/SERVE split (round 10): lifecycle queries (r03/r05/r06,
    // v07–v17, c09/c10, z01 …) eagerly run their index/lake builds
    // INSIDE the query function and return the serving plan, so the
    // fn(...) call duration is the build cost and executing the
    // returned frame is the serving cost. Timing the two separately —
    // uniformly, for every query (a pure query's "build" is just
    // plan construction, milliseconds) — stops serving regressions
    // from hiding inside build noise: the regression gate
    // (tools/bench_gate.py vs BENCH_BASELINE.json) compares serve_s.
    val samples = scala.collection.mutable.Map.empty[String, List[(Double, Double)]]
      .withDefaultValue(Nil)
    for (round <- 1 to 3; (name, fn) <- names) {
      val t0 = System.nanoTime()
      val sample = try {
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        exec(df)
        val t2 = System.nanoTime()
        Some(((t1 - t0) / 1e9, (t2 - t1) / 1e9))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED (round $round): ${e.getMessage}"); None }
      spark.catalog.clearCache() // no cross-query cache memory creep
      // a failing query must not report its time-to-exception as a score
      sample.foreach(s => samples(name) = s :: samples(name))
    }
    // per-phase min across interleaved rounds (same contention
    // rationale as before); the per-query total is the sum of the two
    // phase minima, keeping sum(queries) == value for the gate's
    // internal-consistency check
    val splits = names.map { case (name, _) =>
      val good = samples(name)
      name -> (if (good.nonEmpty) Some((good.map(_._1).min, good.map(_._2).min))
               else None)
    }
    val results = splits.map { case (name, s) =>
      name -> s.fold(-1.0) { case (b, sv) => b + sv }
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
    val qmap = results.map { case (k, v) =>
      "\"" + esc(k) + "\":" + v
    }.mkString("{", ",", "}")
    val splitMap = splits.collect { case (k, Some((b, sv))) =>
      "\"" + esc(k) + "\":{\"build_s\":" + b + ",\"serve_s\":" + sv + "}"
    }.mkString("{", ",", "}")
    // failed queries report -1.0 per-query but are EXCLUDED from the
    // total (a failure must never shrink — i.e. improve — the headline
    // number) and surfaced in an explicit count
    val good = results.filter(_._2 >= 0.0)
    val totalFull = good.map(_._2).sum
    val failed = results.size - good.size
    // STRUCTURAL split, after rounds 5 and 7 both lost the per-query
    // artifact to the runner's bounded stdout-tail capture (a growing
    // suite outgrew the window twice; byte-shaving is not a fix):
    //  - stdout carries ONLY a tiny fixed-size total line — it cannot
    //    outgrow any tail window again, ever;
    //  - the full-precision per-query map goes to FILES: the env
    //    sidecar (SPARK_GRAFT_BENCH_OUT) and BENCH_OUT.json in the
    //    repo working tree, which is COMMITTED each round so the
    //    artifact survives even a runner that reads nothing but git.
    // tools/bench_gate.py fails the round if the committed sidecar is
    // missing, stale-shaped, or inconsistent with its own total.
    // Subset runs carry an explicit marker in EVERY artifact they write
    // — including the env-path one (SPARK_GRAFT_BENCH_OUT), which keeps
    // its fixed path: a consumer reading /tmp/graft_bench.json after a
    // BENCH_ONLY experiment must not mistake a subset-only total for
    // the full-suite gate total.
    val subsetField = only.fold("") { f =>
      s""","subset":true,"subset_filter":"${esc(f.toSeq.sorted.mkString(","))}""""
    }
    val fullLine =
      s"""{"metric":"total","value":$totalFull,"unit":"sec","failed":$failed,"n":${results.size}$subsetField,"queries":$qmap,"split":$splitMap,"sf":"${esc(sfDir)}"}"""
    val sidecarName = if (only.isEmpty) "BENCH_OUT.json" else "BENCH_OUT.subset.json"
    val shortLine = {
      val total = math.rint(totalFull * 1000) / 1000
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"n":${results.size}$subsetField,"sf":"${esc(sfDir)}","perQuery":"$sidecarName"}"""
    }
    val outFiles = Seq(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json"),
      new java.io.File(System.getProperty("user.dir"), sidecarName).getPath)
    outFiles.foreach { outFile =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (fullLine + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] write $outFile: ${e.getMessage}") }
    }
    spark.stop()
    // the metric line is the LAST thing on stdout — printed after
    // spark.stop() so no shutdown logging can push it out of a bounded
    // tail capture — and explicitly flushed
    println(shortLine)
    System.out.flush()
  }
}
