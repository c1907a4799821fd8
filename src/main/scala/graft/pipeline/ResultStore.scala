package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Timestamped result persistence + newest-first retrieval (SURVEY §2.1
  * S11-S12, §2.6 T4): pipeline results and baselines land as
  * `{prefix}_{millis}` JSON directories; loading picks the newest by
  * embedded timestamp (mtime-equivalent, but deterministic).
  */
object ResultStore {

  def save(df: DataFrame, dir: String, prefix: String, epochMillis: Long): String = {
    val path = s"$dir/${prefix}_$epochMillis"
    df.write.mode(SaveMode.Overwrite).json(path)
    path
  }

  /** Newest-first listing of saved result sets for a prefix. */
  def list(dir: String, prefix: String): Seq[String] = {
    val base = Paths.get(dir)
    if (!Files.isDirectory(base)) return Nil
    val stream = Files.list(base)
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith(s"${prefix}_")) out += p
      }
    } finally stream.close() // directory fd leaks otherwise
    out.sortBy(p => -p.getFileName.toString.stripPrefix(s"${prefix}_").toLongOption.getOrElse(0L))
      .map(_.toString).toSeq
  }

  /** Read a saved JSON set. A caller that knows its schema passes
    * `fallback` and gets it APPLIED, not just used for the empty case:
    * Spark's JSON writer omits null fields per record, so a set whose
    * rows all carry e.g. severity=null infers a schema MISSING that
    * column and every downstream filter on it throws — the same bug
    * class as the zero-row set (only `_SUCCESS`, no part files), where
    * inference itself fails with "Unable to infer schema". With an
    * explicit schema both states read cleanly (the zero-row set as an
    * empty frame); schema-agnostic callers (no fallback) keep
    * inference and its sharp edges.
    */
  def readJsonSet(spark: SparkSession, path: String, fallback: Option[StructType] = None): DataFrame =
    fallback match {
      // FAILFAST with the explicit schema: PERMISSIVE would turn a
      // malformed JSON record into an all-null row — indistinguishable
      // from a legitimately null-heavy saved set, so a corrupt baseline
      // would silently diff as "everything removed". These sets are
      // written by [[save]] (well-formed by construction); a parse
      // failure means disk corruption or an alien file, and a loud
      // error beats a quietly wrong diff. Fields on disk absent from
      // the schema are still ignored (schema projection, not
      // malformation — the S12 contract).
      case Some(schema) =>
        spark.read.schema(schema).option("mode", "FAILFAST").json(path)
      case None => spark.read.json(path)
    }

  /** Load the newest saved set (None if absent) — the baseline-differ's
    * `load_latest_baseline`. `fallback` is the schema an EMPTY saved
    * set loads as (see [[readJsonSet]]); without it, an empty set
    * still throws on read, preserving schema-agnostic behavior.
    */
  def loadLatest(spark: SparkSession, dir: String, prefix: String,
      fallback: Option[StructType] = None): Option[DataFrame] =
    list(dir, prefix).headOption.map(readJsonSet(spark, _, fallback))

  /** Load up to `limit` newest sets, tagged with their timestamp. */
  def loadRecent(spark: SparkSession, dir: String, prefix: String, limit: Int,
      fallback: Option[StructType] = None): Seq[(Long, DataFrame)] =
    list(dir, prefix).take(limit).map { p =>
      val ts = p.split('_').last.toLongOption.getOrElse(0L)
      ts -> readJsonSet(spark, p, fallback)
    }

  /** Delete every saved set for a prefix (the baseline-differ's
    * `clear_baselines`); returns how many sets were removed. Each set
    * is a JSON sink DIRECTORY, so removal walks depth-first.
    */
  def clear(dir: String, prefix: String): Int = {
    val sets = list(dir, prefix)
    sets.foreach { p =>
      val walk = Files.walk(Paths.get(p))
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => { Files.delete(f): Unit })
      finally walk.close()
    }
    sets.size
  }
}
