package graft

import org.apache.spark.sql.functions._

/** End-to-end library drive (dev-only): exercises the public API of the
  * etl / index / analyze / streaming / multimodal modules against real
  * files and processes, printing observable results.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._

    // 1. index this repo's sources, find duplicate files
    val idx = index.FileIndex.indexWithHash(spark, "/root/repo/src")
    val groups = index.FileIndex.duplicateGroups(idx)
    println(s"[demo] indexed=${idx.count()} dupGroups=${groups.count()}")
    index.FileIndex.stats(idx).show(truncate = false)

    // 2. ETL round-trip + pipe through an external process
    val tmp = java.nio.file.Files.createTempDirectory("demo").toString
    val df = Seq((1L, "alpha", 10.5), (2L, "beta", 20.25)).toDF("id", "name", "v")
    etl.Formats.write(df, s"$tmp/t.csv")
    val back = etl.Formats.read(spark, s"$tmp/t.csv")
    val piped = etl.Transforms.pipe(back, Seq("cat"))
    println(s"[demo] csv roundtrip rows=${back.count()} piped rows=${piped.count()}")
    etl.Formats.write(df, s"$tmp/report.xlsx")
    val xlsxBack = etl.Formats.read(spark, s"$tmp/report.xlsx")
    println(s"[demo] xlsx roundtrip rows=${xlsxBack.count()} cols=${xlsxBack.columns.mkString(",")}")

    // 3. event analytics over testdata through the streaming module's batch twins
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_t", expr("timestamp_micros(ts div 1000)"))
    streaming.Streams.alerts(ev, "value", warn = 150, crit = 190)
      .groupBy("severity").count().show()
    println("[demo] retention rows=" +
      streaming.Streams.retentionByAge(ev, "ts_t", "30 DAYS").count())

    // 3b. migrate a small tree with structure preservation + summary
    val migSrc = java.nio.file.Files.createTempDirectory("demo-mig").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(migSrc, "sub"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(migSrc, "sub/f.txt"), "payload")
    val migDst = java.nio.file.Files.createTempDirectory("demo-mig-dst").toString
    val planned = index.Migration.plan(index.FileIndex.indexMetadata(spark, migSrc), migSrc, migDst)
    index.Migration.summary(index.Migration.execute(planned)).show(truncate = false)
    println("[demo] migrated exists=" +
      java.nio.file.Files.exists(java.nio.file.Paths.get(migDst, "sub/f.txt")))

    // 4. findings pipeline: parse an AV log → findings → rollup
    val log = Seq("/x/a.exe: Mal.Ware FOUND", "ok line", "/y/b.dll: Eicar FOUND").toDF("value")
    val findings = parse.Parsers.asFindings(
      parse.Parsers.avLogFindings(log), "clamav", "title", "resource", "severity", "malware")
    analyze.Findings.severityCounts(findings).show()

    spark.stop()
  }
}
