package graft.serve

import java.time.LocalDateTime
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

import graft.analyze.Findings
import graft.pipeline.{ResultStore, Scheduler}

/** The composed foreground agent behind `graft start` — the engine twin
  * of the reference's `FileSystemAgent.start` / `MCPFileSystemAgent`
  * (/root/reference/src/cli.py:38-64, src/agent.py): one command boots
  * the monitoring HTTP API, a scheduler loop driving periodic metrics
  * sampling, and (with `--mcp`) the in-process MCP agent whose tool
  * surface feeds the `/events` endpoint — then runs until the caller
  * stops it, shutting every part down cleanly.
  *
  * The scheduler loop is the effectful driver around the PURE
  * [[Scheduler]] model: it supplies wall-clock `now`, runs due jobs,
  * and re-arms them via `afterRun` — exactly the replayable state
  * machine the model documents, so the loop itself stays trivial. Jobs
  * here are driver-side serving-plane actions (a metrics sample); data-
  * plane work belongs in [[graft.pipeline.McpJobRunner]]-style jobs,
  * not this heartbeat.
  *
  * Scale shape: everything here is driver-resident control plane —
  * bounded registries, one sample per interval, no Spark action on any
  * cadence. The findings loader behind the API re-reads the newest
  * saved scan lazily per request, same as `graft serve http`.
  */
object AgentRuntime {

  /** A running agent: bound port + composed parts, stoppable once. */
  final class Handle private[AgentRuntime] (
      val port: Int,
      api: HttpApi,
      agent: Option[McpAgent.Agent],
      loop: Thread,
      stopFlag: AtomicBoolean) {
    def stop(): Unit = {
      stopFlag.set(true)
      loop.join(5000)
      api.stop()
      agent.foreach(_.stop())
    }
    /** get_mcp_status parity when running with --mcp. */
    def mcpStatus: Option[Map[String, String]] = agent.map(_.status)
  }

  /** Boot the composed agent. `mcp` = Some(config) routes the agent's
    * tool surface (and its event log) into the API, the reference's
    * `--mcp` flag. `metricsIntervalSec` is the sampling cadence;
    * `tickMillis` is the scheduler poll granularity (small, cheap —
    * each tick is a pure due-check against driver state).
    */
  def start(
      spark: SparkSession,
      storeDir: String,
      port: Int = 8080,
      mcp: Option[Mcp.McpConfig] = None,
      metricsIntervalSec: Int = 30,
      schedulerEnabled: Boolean = true,
      maxConcurrent: Int = 2,
      tickMillis: Long = 200): Handle = {
    require(metricsIntervalSec >= 1, s"metrics interval must be >= 1s, got $metricsIntervalSec")
    require(maxConcurrent >= 1, s"max concurrent jobs must be >= 1, got $maxConcurrent")
    val agent = mcp.map(cfg => McpAgent(cfg))
    val api = new HttpApi(
      spark,
      () => ResultStore.loadLatest(spark, storeDir, "scan", Some(Findings.schema))
        .getOrElse(Findings.toDS(spark, Nil).toDF()),
      resultStore = Some((storeDir, "scan")),
      mcpTools = agent.map(_.tools))
    val bound = api.start(port)
    // scheduler.enabled=false (agent.py:126) keeps the API up but runs
    // no cadence jobs — /metrics still samples per request; /jobs shows
    // the schedule as disabled so operators can see WHY nothing ticks
    api.registerScheduled(HttpApi.ScheduledJobRecord(
      "metrics_sampling", s"interval:${metricsIntervalSec}s",
      enabled = schedulerEnabled))

    val stopFlag = new AtomicBoolean(false)
    val loop = new Thread(() => {
      var jobs = Seq(Scheduler.arm(
        Scheduler.Job("metrics", "metrics_sampling",
          Scheduler.IntervalSchedule(metricsIntervalSec.toLong),
          enabled = schedulerEnabled),
        LocalDateTime.now()))
      while (!stopFlag.get()) {
        val now = LocalDateTime.now()
        val due = Scheduler.due(jobs, now, maxConcurrent = maxConcurrent)
        due.foreach { j =>
          val t0 = System.currentTimeMillis()
          // a failed sample must not kill the heartbeat thread — record
          // it like the reference records failed scheduled jobs
          val ok = try { api.sampleMetrics(); true } catch { case _: Exception => false }
          api.registerJob(HttpApi.JobRecord(
            jobId = s"${j.id}-$t0", name = j.name,
            status = if (ok) "completed" else "failed",
            startedAtMillis = t0,
            completedAtMillis = Some(System.currentTimeMillis())))
        }
        if (due.nonEmpty) {
          val dueIds = due.map(_.id).toSet
          jobs = jobs.map(j => if (dueIds.contains(j.id)) Scheduler.afterRun(j, now) else j)
        }
        try Thread.sleep(tickMillis) catch { case _: InterruptedException => stopFlag.set(true) }
      }
    }, "graft-agent-scheduler")
    loop.setDaemon(true)
    loop.start()
    new Handle(bound, api, agent, loop, stopFlag)
  }
}
