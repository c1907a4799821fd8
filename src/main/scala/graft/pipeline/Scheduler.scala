package graft.pipeline

import java.time.LocalDateTime

/** Pure scheduler model (ST5; reference /root/reference/src/scheduler.py
  * :54-196 + models.py:44-55): cron / fixed-interval / run-once
  * schedules, a concurrency cap (reference default 2), and one-shot
  * jobs that disable themselves after running.
  *
  * Deliberately clockless and effect-free — `due`/`afterRun` take `now`
  * and return new states, so the driver loop (or a Structured Streaming
  * `ProcessingTime` trigger) supplies time and executes; every decision
  * is unit-testable and replayable.
  */
object Scheduler {

  sealed trait Schedule
  final case class CronSchedule(expr: String) extends Schedule
  final case class IntervalSchedule(seconds: Long) extends Schedule
  final case class OnceSchedule(at: LocalDateTime) extends Schedule

  final case class Job(
      id: String,
      name: String,
      schedule: Schedule,
      enabled: Boolean = true,
      lastRun: Option[LocalDateTime] = None,
      nextRun: Option[LocalDateTime] = None)

  /** First fire time after `now` (scheduler.py:65-87). */
  def nextRunTime(schedule: Schedule, now: LocalDateTime): Option[LocalDateTime] =
    schedule match {
      case CronSchedule(expr) => Some(Cron.nextFire(expr, now))
      case IntervalSchedule(s) =>
        require(s > 0, s"interval must be positive: $s"); Some(now.plusSeconds(s))
      case OnceSchedule(at) => Some(at)
    }

  /** Arm a job: compute its next_run (no-op for disabled jobs). */
  def arm(job: Job, now: LocalDateTime): Job =
    if (!job.enabled) job
    else job.copy(nextRun = nextRunTime(job.schedule, now))

  /** Jobs that should start now: enabled, armed, due, not already
    * running, and within the remaining concurrency budget — in
    * next_run order so the longest-overdue job wins a contended slot
    * (scheduler.py:113-139, max_concurrent default 2).
    */
  def due(
      jobs: Seq[Job], now: LocalDateTime,
      running: Set[String] = Set.empty, maxConcurrent: Int = 2): Seq[Job] = {
    val budget = maxConcurrent - running.size
    // natural chronological ordering (LocalDateTime is Comparable) —
    // not toString, whose ISO rendering drops trailing :00 components
    implicit val ldtOrdering: Ordering[LocalDateTime] =
      Ordering.comparatorToOrdering(java.util.Comparator.naturalOrder[LocalDateTime]())
    if (budget <= 0) Seq.empty
    else jobs
      .filter(j => j.enabled && !running.contains(j.id))
      .filter(_.nextRun.exists(!now.isBefore(_)))
      .sortBy(j => (j.nextRun.get, j.id))
      .take(budget)
  }

  /** State after launching a job at `now`: last_run stamped; one-shot
    * jobs DISABLE themselves (scheduler.py: once jobs get no next run);
    * cron/interval jobs re-arm from `now`.
    */
  def afterRun(job: Job, now: LocalDateTime): Job = job.schedule match {
    case _: OnceSchedule =>
      job.copy(lastRun = Some(now), nextRun = None, enabled = false)
    case s =>
      job.copy(lastRun = Some(now), nextRun = nextRunTime(s, now))
  }
}
