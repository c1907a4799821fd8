package graft.index

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File migration (SURVEY §2.1 S7 dest calculation, §2.4 A8 summary,
  * §4 retry heuristic) — the reference's FileMigrationTemplate
  * (/root/reference/src/file_migration_template.py) as a plan/execute/
  * summarize trio.
  *
  * Plan is pure column work (structure-preserving dest path); execution
  * is partition-parallel with per-file retry + exponential backoff
  * (reference: 3 retries, 1 s · 2^attempt); the summary is one
  * aggregation. Batching/worker pools map to partitioning.
  */
object Migration {

  /** Structure-preserving destination path: file under srcRoot maps to
    * the same relative path under destRoot (file_migration_template.py
    * `_calculate_dest_path`). Handles binaryFile's `file:` URI prefix.
    *
    * Roots are slash-normalized and the strip is BOUNDARY-anchored:
    * a raw prefix strip would silently fuse paths on a trailing-slash
    * mismatch (`/data/src/` vs dest `/data/dst` → `/data/dsta.txt`)
    * and would claim sibling trees that merely share a name prefix
    * (`/data/src2/b.txt` under srcRoot `/data/src`). Files outside
    * srcRoot get a NULL dest_path — visibly unplanned, never copied
    * to a fused destination.
    */
  def plan(index: DataFrame, srcRoot: String, destRoot: String): DataFrame = {
    val src = srcRoot.stripSuffix("/")
    val dst = destRoot.stripSuffix("/")
    val normalized = regexp_replace(col("file_path"), "^file:", "")
    val q = java.util.regex.Pattern.quote(src)
    // boundary anchor: after the root, the next char must be '/'
    // (captured with the rest of the relative path)
    val rel = regexp_extract(normalized, "^" + q + "(/.+)$", 1)
    index.withColumn("dest_path",
      when(rel =!= "", concat(lit(dst), rel)))
  }

  val resultSchema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("dest_path", StringType, nullable = true), // null = outside srcRoot
    StructField("success", BooleanType, nullable = false),
    StructField("attempts", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("error", StringType, nullable = true)))

  /** Copy each planned file, partition-parallel, with per-file retries
    * and exponential backoff. Returns one result row per file — the
    * input to [[summary]].
    */
  def execute(planned: DataFrame, maxRetries: Int = 3, baseBackoffMs: Long = 10): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resultSchema)
    planned.select("file_path", "dest_path").mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(1)) {
          // plan() marked this file outside srcRoot: fail it up front,
          // no retries — copying to a guessed destination is the bug
          // the boundary anchor exists to prevent
          Row(r.getString(0), null, false, 0, 0L, "dest_path is null (file outside srcRoot)")
        } else {
        val src = r.getString(0).stripPrefix("file:")
        val dst = r.getString(1).stripPrefix("file:")
        var attempt = 0
        var done = false
        var err: String = null
        var bytes = 0L
        while (!done && attempt <= maxRetries) {
          attempt += 1
          try {
            val dp = Paths.get(dst)
            Files.createDirectories(dp.getParent)
            Files.copy(Paths.get(src), dp, StandardCopyOption.REPLACE_EXISTING)
            bytes = Files.size(dp)
            done = true
            err = null
          } catch {
            case e: Exception =>
              err = e.toString
              if (attempt <= maxRetries) Thread.sleep(baseBackoffMs << (attempt - 1))
          }
        }
        Row(r.getString(0), r.getString(1), done, attempt, bytes, err)
        }
      }
    }(enc)
  }

  /** Migration rollup (A8): totals, success rate, moved bytes, failures. */
  def summary(results: DataFrame): DataFrame =
    results.agg(
      count(lit(1)).as("total_files"),
      count_if(col("success")).as("succeeded"),
      count_if(!col("success")).as("failed"),
      sum(when(col("success"), col("bytes")).otherwise(0L)).as("bytes_moved"),
      (count_if(col("success")).cast("double") / count(lit(1))).as("success_rate"))
}
