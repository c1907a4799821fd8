package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md). One parquet file per table under `dir`.
  *
  * All queries take `dir` (a scale-factor directory) so the same code
  * runs at sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, by
  * design, unchanged against a 100 TB lake: nothing here assumes
  * single-file inputs, local paths, or collected data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** `events.ts` as epoch MICROSECONDS, robust to both generations of
    * the driver testdata: parquet TIMESTAMP(NANOS) arrives as long
    * nanoseconds (GraftSession sets `nanosAsLong`; `div 1000`
    * truncates exactly like DuckDB's µs read of the same file), while
    * TIMESTAMP(MICROS) arrives as TIMESTAMP_NTZ (cast is
    * tz-independent under the session's pinned UTC). Single owner —
    * every µs-based event query and its oracle's `epoch_us(ts)` lean
    * on this equivalence.
    */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000")
    case _ => unix_micros(col("ts").cast("timestamp"))
  }

  /** `events.ts` as a calendar-bucketable timestamp (same two-schema
    * tolerance as [[tsUs]]; integer `div`, no double rounding at 1e18
    * magnitudes).
    */
  def tsTimestamp(df: DataFrame): Column = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
    case _ => df("ts")
  }
}
