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

  /** Well-known high ports excluded from the suspicious-listener flag
    * (network_mapper.py:240-267).
    */
  val CommonHighPorts: Seq[Int] = Seq(3389, 5985, 5986, 8080, 8443, 5432, 3306, 1433, 6379, 27017)

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
      .groupBy("pid", "process_name")
      .agg(
        count(lit(1)).as("n_connections"),
        size(collect_set(col("remote_address"))).as("n_remotes"))
      .withColumn("flagged", col("n_connections") >= flagAt)

  /** Suspicious listeners (P8): wildcard bind ∧ unprivileged port ∧ not
    * a well-known service port.
    */
  def suspiciousListeners(conns: DataFrame): DataFrame =
    conns.filter(
      col("state") === "Listen" &&
        col("local_address").isin("0.0.0.0", "::") &&
        col("local_port") >= 1024 &&
        !col("local_port").isin(CommonHighPorts: _*))

  /** Listening/established tallies (A7). */
  def tallies(conns: DataFrame): DataFrame =
    conns.agg(
      count(lit(1)).as("total"),
      count_if(col("state") === "Listen").as("listening"),
      count_if(col("state") === "Established").as("established"))
}
