package graft

/** Dev-only: time SparkEntry queries in isolation (args:
  * name[,name…] sfDir [reps]) — the TimeOne methodology
  * `tools/bench_gate.py` reruns flagged queries through: one quiet JVM,
  * per-query build/serve lines, best-of-reps read by the gate.
  * Comma-separated names share the one JVM so an N-query isolation pass
  * pays startup once.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        println(f"[timeone] $name rep $r build ${(t1 - t0) / 1e9}%.3f serve ${(t2 - t1) / 1e9}%.3f")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
