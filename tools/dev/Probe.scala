package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main: prints testdata schemas + parity probes. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Tables.names) {
      val df = Tables.t(spark, "/root/testdata/sf0.001", n)
      println(s"== $n")
      df.printSchema()
      if (n == "events" || n == "orders") df.show(2, truncate = false)
    }
    // parity probes vs duckdb
    spark.range(1).select(
      conv(substring(md5(lit("abc")), 1, 15), 16, 10).cast("long").as("h60"),
      hex(lit("abc".getBytes)).as("hexcase"),
      split(lit("a b  c"), "\\s+").as("sp")
    ).show(truncate = false)
    spark.stop()
  }
}
