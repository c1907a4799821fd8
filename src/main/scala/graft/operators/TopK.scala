package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-K as a typed Aggregator (SURVEY §2.10 X5 — the one
  * aggregation shape Spark lacks natively).
  *
  * `row_number().over(Window.partitionBy(g).orderBy(m))` materializes
  * and sorts EVERY row of every group; this Aggregator keeps a k-element
  * buffer per group on the map side, so the shuffle carries at most
  * k rows per (partition, group) — the difference between sorting 100 TB
  * and sorting k×groups rows. Deterministic: (metric desc, id asc).
  */
object TopK {

  case class MetricId(metric: Long, id: Long)

  class TopKLongs(k: Int) extends Aggregator[MetricId, Seq[MetricId], Seq[MetricId]] {
    require(k >= 1, s"top-k requires k >= 1, got $k") // k=0 would index an empty buffer in reduce
    private def beats(a: MetricId, b: MetricId): Boolean =
      a.metric > b.metric || (a.metric == b.metric && a.id < b.id)

    override def zero: Seq[MetricId] = Seq.empty

    /** Hot path — once per input row. O(1) append while under capacity;
      * at capacity an O(k) scan for the current worst, replaced only when
      * beaten (no per-row sort: that would be O(k log k) per row, which
      * defeats the whole point at corpus scale).
      */
    override def reduce(buf: Seq[MetricId], in: MetricId): Seq[MetricId] =
      if (buf.size < k) buf :+ in
      else {
        var worstIdx = 0
        var i = 1
        while (i < buf.size) { if (beats(buf(worstIdx), buf(i))) worstIdx = i; i += 1 }
        if (beats(in, buf(worstIdx))) buf.updated(worstIdx, in) else buf
      }

    override def merge(a: Seq[MetricId], b: Seq[MetricId]): Seq[MetricId] =
      (a ++ b).sortWith(beats).take(k) // rare (once per partition-group)

    override def finish(buf: Seq[MetricId]): Seq[MetricId] = buf.sortWith(beats)
    override def bufferEncoder: Encoder[Seq[MetricId]] = ExpressionEncoder[Seq[MetricId]]()
    override def outputEncoder: Encoder[Seq[MetricId]] = ExpressionEncoder[Seq[MetricId]]()
  }

  /** Column form: `topK(3)(metricCol, idCol)` inside an agg. */
  def topK(k: Int)(metric: Column, id: Column): Column =
    udaf(new TopKLongs(k), ExpressionEncoder[MetricId]()).apply(metric, id)

  case class ScoredId(sim: Double, id: Long)

  /** Double-metric twin of [[TopKLongs]] for similarity scores (ANN
    * top-k). Same k-buffer shape: map-side partial top-k, shuffle ≤ k
    * rows per (partition, group) instead of the full candidate stream.
    */
  class TopKScored(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k >= 1, s"top-k requires k >= 1, got $k") // k=0 would index an empty buffer in reduce
    /** Total order, NaN-safe: raw `>` is not a strict weak ordering when
      * NaN appears (a zero-norm vector's cosine) — sortWith/TimSort can
      * throw "Comparison method violates its general contract" and
      * NaN rows rank nondeterministically. Double.compare totally orders
      * NaN as largest (matching Window's descending sort, which Spark
      * treats NaN as the largest double); `+ 0.0` first collapses -0.0
      * to 0.0 so zero-similarity ties still break by id like SQL
      * equality would.
      */
    private def beats(a: ScoredId, b: ScoredId): Boolean = {
      val c = java.lang.Double.compare(a.sim + 0.0, b.sim + 0.0)
      c > 0 || (c == 0 && a.id < b.id)
    }

    override def zero: Seq[ScoredId] = Seq.empty

    override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
      if (buf.size < k) buf :+ in
      else {
        var worstIdx = 0
        var i = 1
        while (i < buf.size) { if (beats(buf(worstIdx), buf(i))) worstIdx = i; i += 1 }
        if (beats(in, buf(worstIdx))) buf.updated(worstIdx, in) else buf
      }

    override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      (a ++ b).sortWith(beats).take(k)

    override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf.sortWith(beats)
    override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Column form for similarity metrics: `topKScored(5)(simCol, idCol)`. */
  def topKScored(k: Int)(sim: Column, id: Column): Column =
    udaf(new TopKScored(k), ExpressionEncoder[ScoredId]()).apply(sim, id)

  /** Exploded convenience: top-k rows per group with 1-based rank. */
  def perGroup(df: DataFrame, groupCols: Seq[String], metric: Column, id: Column, k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(topK(k)(metric, id).as("top"))
      .select(
        (groupCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "entry"))): _*)
      .select(
        (groupCols.map(col) :+
          (col("pos") + 1).cast("int").as("rank") :+
          col("entry.metric").as("metric") :+
          col("entry.id").as("id")): _*)
}
