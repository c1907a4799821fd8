package graft.analyze

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Baseline differ (SURVEY §2.3 J4 / §2.7 U1): added/removed set
  * differences on composite keys, as anti-joins that keep the full
  * payload row (the reference materializes python sets per category,
  * /root/reference/src/audit/analyzers/baseline_differ.py:118-360).
  *
  * Both sides are snapshot-sized (processes/services/listeners), so
  * Spark's planner broadcasts the smaller side; at lake scale the
  * anti-join shuffles on the key columns only.
  */
object BaselineDiff {

  /** Null-safe anti-join: `<=>` on every key — a plain equi-join never
    * matches NULL keys, so an unchanged row with a null key column
    * (e.g. a pathless process) would be reported as added AND removed
    * on every run.
    */
  private def antiByKeys(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val l = left.alias("l")
    val r = right.select(keys.map(col): _*).distinct().alias("r")
    val cond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    l.join(r, cond, "left_anti")
  }

  /** Rows of `current` whose key is absent from `baseline`. */
  def added(current: DataFrame, baseline: DataFrame, keys: Seq[String]): DataFrame =
    antiByKeys(current, baseline, keys)

  /** Rows of `baseline` whose key is absent from `current`. */
  def removed(current: DataFrame, baseline: DataFrame, keys: Seq[String]): DataFrame =
    antiByKeys(baseline, current, keys)

  /** Tagged union of added+removed with a category label — one frame
    * per diff category, ready for the A9 rollup.
    */
  def diff(current: DataFrame, baseline: DataFrame, keys: Seq[String], category: String): DataFrame =
    added(current, baseline, keys)
      .withColumn("change_type", lit("added"))
      .unionByName(removed(current, baseline, keys).withColumn("change_type", lit("removed")))
      .withColumn("category", lit(category))

  /** Per-category/change counts + total (A9). Projects to the two
    * rollup columns BEFORE the union — diff categories carry
    * heterogeneous payload schemas (process vs listener columns), which
    * a full-row unionByName would reject.
    */
  def summary(diffs: Seq[DataFrame]): DataFrame =
    diffs.map(_.select("category", "change_type")).reduce(_.unionByName(_))
      .groupBy("category", "change_type").count()
      .orderBy("category", "change_type")

  /** Listener extraction (P5): LISTEN state rows keyed addr:port. */
  def listeners(conns: DataFrame): DataFrame =
    conns.filter(col("state") === "Listen")
      .withColumn("key", concat_ws(":", col("local_address"), col("local_port")))
}
