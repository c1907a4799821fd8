package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Staged pipeline runner (SURVEY §3.1): named stages transform a shared
  * context of DataFrames (the reference's collectors→scanners→analyzers
  * dict, /root/reference/src/audit/pipeline.py:124-316). Stage-boundary
  * semantics are driver-side control flow only — the data plane stays
  * lazy, so Catalyst optimizes ACROSS stages; `stop_on_failure`
  * reproduces the reference's early-termination switch.
  */
object Pipeline {

  type Context = Map[String, DataFrame]
  type Stage = Context => Context

  case class StageResult(
      name: String,
      status: String, // completed | failed | skipped
      error: Option[String],
      durationSec: Double)

  case class RunResult(context: Context, stages: Seq[StageResult]) {
    def failed: Boolean = stages.exists(_.status == "failed")
  }

  def run(
      stages: Seq[(String, Stage)],
      initial: Context = Map.empty,
      stopOnFailure: Boolean = false): RunResult = {
    var ctx = initial
    var stop = false
    val results = stages.map { case (name, fn) =>
      if (stop) StageResult(name, "skipped", None, 0.0)
      else {
        val t0 = System.nanoTime()
        try {
          ctx = fn(ctx)
          StageResult(name, "completed", None, (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Exception =>
            if (stopOnFailure) stop = true
            StageResult(name, "failed", Some(e.getMessage), (System.nanoTime() - t0) / 1e9)
        }
      }
    }
    RunResult(ctx, results)
  }
}
