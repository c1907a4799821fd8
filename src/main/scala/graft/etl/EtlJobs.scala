package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's top-level ETL job surface
  * (/root/reference/src/etl.py:29-120 + models.py ETLJob/JobStatus):
  * extract / transform / load / full_etl over the format-dispatch
  * readers and the transform registry, with captured status instead of
  * thrown exceptions — one call per reference `execute_job`.
  *
  * Transforms resolve by registered name ([[Transforms.register]]) —
  * the idiomatic path — or as an external command for script parity
  * ([[Transforms.pipe]]).
  */
object EtlJobs {

  sealed trait Op
  case object Extract extends Op
  case object Transform extends Op
  case object Load extends Op
  case object FullEtl extends Op

  final case class EtlJob(
      id: String,
      operation: Op,
      sourcePath: String,
      destinationPath: Option[String] = None,
      transform: Option[String] = None, // registered transform name
      transformCommand: Option[Seq[String]] = None, // external script parity
      parameters: Map[String, String] = Map.empty)

  final case class EtlResult(
      job: EtlJob,
      status: String, // completed | failed
      error: Option[String],
      rowsWritten: Option[Long])

  def execute(spark: SparkSession, job: EtlJob): EtlResult =
    try {
      val df0 = Formats.read(spark, job.sourcePath, options = job.parameters)
      val needsTransform = job.operation == Transform || job.operation == FullEtl
      val df: DataFrame =
        if (!needsTransform) df0
        else (job.transform, job.transformCommand) match {
          case (Some(name), _) => Transforms(name, df0)
          case (None, Some(cmd)) =>
            // identityOnEmpty: the reference passes input through when a
            // transform script writes nothing (etl.py:216-220)
            Transforms.pipe(df0, cmd, job.parameters, identityOnEmpty = true)
          case (None, None) if job.operation == Transform =>
            throw new IllegalArgumentException("Transform script not provided")
          case _ => df0 // full_etl without a transform passes through
        }
      // write + count are two passes over the plan: pin the frame so a
      // transform (external command OR registered fn over an
      // inferSchema CSV read) computes once. Reference jobs are
      // report-sized (pandas in-memory); callers with lake-scale inputs
      // use Formats/Transforms directly.
      val pin = needsTransform || job.destinationPath.nonEmpty
      val pinned = if (pin) df.cache() else df
      try job.destinationPath match {
        case Some(dest) =>
          Formats.write(pinned, dest)
          EtlResult(job, "completed", None, Some(pinned.count()))
        case None =>
          pinned.count() // materialize like the reference's extract-without-dest
          EtlResult(job, "completed", None, None)
      } finally if (pin) pinned.unpersist()
    } catch {
      case e: Exception => EtlResult(job, "failed", Option(e.getMessage), None)
    }
}
