package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-defined transform surface (SURVEY §2.10 X1).
  *
  * The reference runs arbitrary transform *scripts* as subprocesses with
  * a JSON-records-in/JSON-records-out contract
  * (/root/reference/src/etl.py:178-224). Two first-class equivalents:
  *
  *  1. [[Transforms.register]]: native `DataFrame => DataFrame`
  *     transforms — the idiomatic path, fully Catalyst-optimizable.
  *  2. [[Transforms.pipe]]: external-process parity — each partition's
  *     rows stream as JSON lines through the command's stdin/stdout.
  *     Runs per-partition on executors (no driver bottleneck); the
  *     child process sees `TRANSFORM_PARAMS` in its environment like
  *     the reference contract.
  */
object Transforms {

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame => DataFrame]

  def register(name: String, fn: DataFrame => DataFrame): Unit = registry(name) = fn

  def apply(name: String, df: DataFrame): DataFrame =
    registry.get(name) match {
      case Some(fn) => fn(df)
      case None => throw new NoSuchElementException(s"No transform registered: $name")
    }

  def registered: Seq[String] = registry.keys.toSeq.sorted

  /** Stream rows as JSON lines through an external command, one process
    * per partition. The command must write zero or more JSON objects
    * (one per line) to stdout; an empty stdout yields an empty result
    * (the reference treats "no result written" as identity — callers
    * wanting that should check `isEmpty` and fall back).
    */
  def pipe(df: DataFrame, command: Seq[String], params: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val env = params.map { case (k, v) => s"TRANSFORM_PARAM_$k" -> v } +
      ("TRANSFORM_PARAMS" -> params.map { case (k, v) => s"$k=$v" }.mkString(","))
    val out = df.toJSON.rdd.pipe(command, env)
    spark.read.json(spark.createDataset(out)(org.apache.spark.sql.Encoders.STRING))
  }
}
