package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Ip

/** Network analyzer (SURVEY §2.2 P7-P8, §2.4 A6-A7) — external
  * connection grouping and suspicious-listener detection
  * (/root/reference/src/audit/collectors/network_mapper.py:83-267)
  * over a connections DataFrame with columns
  * (pid, process_name, state, local_address, local_port,
  * remote_address, remote_port).
  */
object NetworkAnalyzer {

  /** Well-known service ports excluded from the suspicious-listener
    * flag — delegates to the single reference-faithful list
    * (network_mapper.py:255-262, also used by ToolParsers). A second
    * hand-maintained copy had already drifted (it whitelisted
    * Redis/Mongo ports the reference flags).
    */
  val CommonHighPorts: Seq[Int] = graft.parse.ToolParsers.commonListenPorts

  /** Established connections to external addresses (P7 via
    * graft.functions.Ip — pure Column expressions).
    */
  def externalConnections(conns: DataFrame): DataFrame =
    conns.filter(
      col("state") === "Established" &&
        col("remote_address").isNotNull &&
        Ip.isExternal(col("remote_address")))

  /** Per-process external fan-out (A6): count + distinct remotes,
    * flagged at ≥ `flagAt` connections.
    */
  def externalByProcess(conns: DataFrame, flagAt: Int = 10): DataFrame =
    externalConnections(conns)
      // group by pid ONLY (reference semantics): rows of one pid with
      // mixed null/non-null names must not split below the flag
      // threshold; max() picks the name deterministically
      .groupBy("pid")
      .agg(
        max(col("process_name")).as("process_name"),
        count(lit(1)).as("n_connections"),
        size(collect_set(col("remote_address"))).as("n_remotes"))
      .withColumn("flagged", col("n_connections") >= flagAt)

  /** Suspicious listeners (P8): wildcard bind ∧ unprivileged port ∧ not
    * a well-known service port.
    */
  def suspiciousListeners(conns: DataFrame): DataFrame =
    conns.filter(
      col("state") === "Listen" &&
        col("local_address").isin("0.0.0.0", "::", "[::]") && // bracketed v6-any included (reference)
        col("local_port") >= 1024 &&
        !col("local_port").isin(CommonHighPorts: _*))

  /** Listening/established tallies (A7). */
  def tallies(conns: DataFrame): DataFrame =
    conns.agg(
      count(lit(1)).as("total"),
      count_if(col("state") === "Listen").as("listening"),
      count_if(col("state") === "Established").as("established"))
}
