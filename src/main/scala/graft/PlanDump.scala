package graft

/** Dev-only: dump `.explain("formatted")` for declared queries to files
  * (args: name[,name…] outDir [sfDir]) — the optimization-round
  * evidence artifact (`plans/rNN/<query>_{before,after}.txt`). One quiet
  * JVM for the whole list; each query's plan is captured WITHOUT
  * executing it (plan construction only), so lifecycle queries still
  * pay their eager builds — that is the plan the bench serves.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').filter(_.nonEmpty)
    val outDir = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val suffix = if (args.length > 3) args(3) else ""
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = java.nio.file.Paths.get(outDir, s"$name$suffix.txt")
        java.nio.file.Files.write(f, plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $f (${plan.length} chars)")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
