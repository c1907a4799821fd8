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
    * per partition.
    *
    * Contract parity with the reference (etl.py:178-224):
    *   - `schema`: when given, parses child output with it directly —
    *     no inference pass. Without it `spark.read.json` must SCAN the
    *     piped RDD twice (infer + parse), re-running the child process
    *     unless cached; always pass a schema in production pipelines.
    *   - `timeoutSec` (reference kills transforms at 300 s): enforced
    *     per partition via a watchdog that destroys the child process;
    *     a timed-out partition fails the task rather than silently
    *     truncating output.
    *   - Identity-on-empty (etl.py:221-224: "no result written" ⇒
    *     input passes through): `identityOnEmpty = true` returns the
    *     INPUT frame when the piped output has zero rows.
    */
  def pipe(
      df: DataFrame,
      command: Seq[String],
      params: Map[String, String] = Map.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      timeoutSec: Int = 300,
      identityOnEmpty: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    // TRANSFORM_PARAMS is a JSON object — the reference's exact
    // contract (etl.py:201 `json.dumps(params)`); the previous
    // comma-joined k=v form was ambiguous the moment a value contained
    // ',' or '='. Keys sorted for a deterministic env across runs.
    val env = params.map { case (k, v) => s"TRANSFORM_PARAM_$k" -> v } +
      ("TRANSFORM_PARAMS" -> params.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v) + "\"" }
        .mkString("{", ",", "}"))
    val cmd = Seq("/bin/sh", "-c",
      s"timeout ${timeoutSec}s " + command.map(a => "'" + a.replace("'", "'\\''") + "'").mkString(" ") +
        " || { [ $? -eq 124 ] && echo 'TRANSFORM TIMEOUT' >&2 && exit 124; }")
    val out = df.toJSON.rdd.pipe(cmd, env)
    val ds0 = spark.createDataset(out)(org.apache.spark.sql.Encoders.STRING)
    // pin the child's output whenever MORE than one pass will read it
    // (schema inference, the isEmpty probe, the caller's action): an
    // uncached pipe re-executes the external command per pass — wrong
    // for side-effecting or non-deterministic scripts, and N× the cost
    // for everything else. The cache lives until the caller's
    // clearCache (Verify/Bench do this between pipelines).
    val multiPass = schema.isEmpty || identityOnEmpty
    val ds = if (multiPass) ds0.cache() else ds0
    val parsed = schema match {
      case Some(s) => spark.read.schema(s).json(ds)
      case None => spark.read.json(ds)
    }
    if (identityOnEmpty && parsed.isEmpty) df else parsed
  }

  /** Minimal JSON string escape (quote, backslash, control chars) —
    * enough for the flat string→string params object the contract
    * carries; mirrors the Bench/Verify metric-line escaping.
    */
  private[etl] def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
