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
          case (None, Some(cmd)) => Transforms.pipe(df0, cmd, job.parameters)
          case (None, None) if job.operation == Transform =>
            throw new IllegalArgumentException("Transform script not provided")
          case _ => df0 // full_etl without a transform passes through
        }
      job.destinationPath match {
        case Some(dest) =>
          // count once, write from the same frame — a narrow second scan
          // beats a silent no-count; report-scale jobs won't feel it and
          // large jobs can pass destinationPath-only operations
          Formats.write(df, dest)
          EtlResult(job, "completed", None, Some(df.count()))
        case None =>
          df.count() // materialize like the reference's extract-without-dest
          EtlResult(job, "completed", None, None)
      }
    } catch {
      case e: Exception => EtlResult(job, "failed", Option(e.getMessage), None)
    }
}
