package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Resource-anomaly analyzer (SURVEY §2.2 P10-P11, §2.3 J5, §2.6 T1) —
  * the reference's thresholds and orphan detection
  * (/root/reference/src/audit/analyzers/resource_analyzer.py:28-366)
  * over a process-snapshot DataFrame with columns
  * (pid, parent_pid, name, path, ram_mb, cpu_seconds, threads, handles,
  * start_age_hours, signed).
  */
object ResourceAnalyzer {

  // Reference constants (resource_analyzer.py:28-34)
  val RamMbThreshold = 1024.0
  val CpuSecondsThreshold = 3600.0
  val ThreadsThreshold = 200
  val HandlesThreshold = 5000
  val StaleHours = 168.0
  val OrphanStaleHours = 24.0
  val DefaultTopN = 10

  /** Long-running system names excluded from staleness flags
    * (resource_analyzer.py:37-48 — representative subset).
    */
  val KnownLongRunning: Seq[String] = Seq(
    "system", "smss.exe", "csrss.exe", "wininit.exe", "services.exe",
    "lsass.exe", "svchost.exe", "winlogon.exe", "explorer.exe", "dwm.exe",
    "systemd", "init", "kthreadd", "sshd", "cron", "dbus-daemon")

  /** Top-N per metric (T1): TakeOrderedAndProject, deterministic pid
    * tiebreak.
    */
  def topBy(procs: DataFrame, metric: String, n: Int = DefaultTopN): DataFrame =
    procs.orderBy(desc(metric), asc("pid")).limit(n)

  /** Threshold predicates (P10) → one findings frame with reason tags. */
  def thresholdFindings(procs: DataFrame): DataFrame = {
    val reasons = array(
      when(col("ram_mb") > RamMbThreshold, lit("high_ram")),
      when(col("cpu_seconds") > CpuSecondsThreshold, lit("high_cpu")),
      when(col("threads") > ThreadsThreshold, lit("high_threads")),
      when(col("handles") > HandlesThreshold, lit("high_handles")),
      when(
        col("start_age_hours") > StaleHours &&
          !lower(col("name")).isin(KnownLongRunning: _*), lit("stale")))
    procs
      .filter(col("pid") > 4) // reference skips system pids (resource_analyzer.py:150-151)
      .withColumn("reasons", filter(reasons, r => r.isNotNull))
      .filter(size(col("reasons")) > 0)
  }

  /** Orphan detection (J5): parent pid absent from the snapshot — an
    * anti self-join — gated on stale-or-unsigned like the reference.
    */
  def orphans(procs: DataFrame): DataFrame = {
    val pids = procs.select(col("pid").as("parent_pid")).distinct()
    procs
      // reference exclusions (resource_analyzer.py:321-328): system pids,
      // known long-running daemons, and parents 0/4 (system roots)
      .filter(col("pid") > 4)
      // coalesce: a NULL name is not long-running (the reference's
      // pydantic default is "") — lower(NULL).isin would null-drop the row
      .filter(!coalesce(lower(col("name")), lit("")).isin(KnownLongRunning: _*))
      .filter(col("parent_pid").isNotNull && !col("parent_pid").isin(0, 4))
      .join(pids, Seq("parent_pid"), "left_anti")
      .filter(
        col("start_age_hours") > OrphanStaleHours ||
          (col("signed").isNotNull && !col("signed")))
  }
}
