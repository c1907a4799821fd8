package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skyline (Pareto frontier) over two criteria — the "cheapest AND
  * biggest" shortlist query (Börzsönyi, Kossmann & Stocker, "The
  * Skyline Operator", ICDE 2001): keep rows no other row strictly
  * dominates, minimizing `x` and maximizing `y`.
  *
  * The naive spelling is the quadratic NOT EXISTS anti-join (exactly
  * what the q41 oracle runs); the classic single-node cure is one sort
  * by (x asc, y desc) + a running max — but a bare `ORDER BY` window
  * with no PARTITION BY collapses Spark to ONE task, the canonical
  * 100-TB scale killer. This operator keeps the sweep's O(n log n)
  * while staying distributed:
  *
  *   1. reduce rows to per-distinct-x group maxima (one x-keyed
  *      shuffle, map-side partial),
  *   2. a DISTRIBUTED prefix-max scan over the x-sorted group maxima
  *      ([[prefixMax]]: range-repartition → per-partition running max
  *      → per-partition totals (one row per PARTITION, driver-tiny)
  *      → exclusive prefix offsets broadcast-joined back),
  *   3. join the per-x dominance thresholds back to the rows:
  *      dominated iff a strictly-smaller x saw y ≥ mine, or an x ≤
  *      mine saw y > mine.
  *
  * Exact, ties-keep-both semantics: rows equal on BOTH criteria are
  * mutually non-dominating and all survive. Integer/decimal criteria
  * recommended (the q41 query feeds cents) — exactness of the compares
  * is then engine-replayable. Null x/y rows are excluded (SQL
  * three-valued dominance is a trap, not a feature).
  */
object Skyline {

  /** Distributed running max of long `v` over `ord`-ascending order.
    * `ord` values MUST be distinct (callers pre-aggregate ties into
    * one group row — [[skyline2d]] does); under that contract the
    * output is, per ord: `run_le` = max of v over ord' ≤ ord and
    * `run_lt` = max over ord' < ord (null when no predecessor
    * exists).
    *
    * Scale shape: range-repartition bounds come from Spark's
    * reservoir sample, so PARTITION PLACEMENT is nondeterministic
    * run-to-run — but the result is not: prefix-max is associative,
    * so any contiguous range cut yields the same scan. The
    * cross-partition carry is one row per partition (collected —
    * bounded by the partition count, never by data) and rejoins via a
    * broadcast, so no stage ever sees a single-task global sort.
    */
  def prefixMax(df: DataFrame, ord: Column, v: Column, nPartitions: Int): DataFrame = {
    require(nPartitions >= 1, s"nPartitions must be >= 1, got $nPartitions")
    // no sortWithinPartitions here: the window below hash-exchanges on
    // __pid and runs its own sort anyway — a pre-sort would be a
    // wasted O(n log n) pass; the range partitioner alone fixes WHICH
    // rows share a pid, and pid assignment is order-independent
    val base = df.select(ord.as("ord"), v.cast("long").as("v"))
      .filter(col("ord").isNotNull && col("v").isNotNull)
      .repartitionByRange(nPartitions, col("ord"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy("ord")
    // cached: the frame feeds BOTH the per-partition totals (an eager
    // collect — the two-phase scan's phase boundary) and the final
    // select; uncached it would pay the upstream scan + range shuffle
    // twice
    val local = Dedup.scopedCache(base
      .withColumn("__run",
        max(col("v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__runlag", lag("__run", 1).over(w)))
    // One row per partition; the exclusive prefix over partition ids
    // is driver-side arithmetic on a partition-count-sized list.
    val totals = local.groupBy("__pid").agg(max("v").as("__pmax"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = Option.empty[Long]
    val offsets = totals.map { case (pid, pmax) =>
      val before = acc
      acc = Some(acc.fold(pmax)(a => math.max(a, pmax)))
      (pid, before.map(java.lang.Long.valueOf).orNull)
    }
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val offDf = spark.createDataFrame(
      offsets.map { case (pid, off) =>
        org.apache.spark.sql.Row(pid, off)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = true))))
    local.join(broadcast(offDf), Seq("__pid"))
      .select(
        col("ord"), col("v"),
        greatest(col("__run"), coalesce(col("__off"), col("__run")))
          .as("run_le"),
        // strict predecessor: previous row's inclusive max, folded
        // with the carry from earlier partitions; null ⇔ globally
        // first ord (no __runlag AND no carry).
        when(col("__runlag").isNotNull,
          greatest(col("__runlag"), coalesce(col("__off"), col("__runlag"))))
          .otherwise(col("__off"))
          .as("run_lt"))
  }

  /** The 2-criteria skyline: minimize `minCol`, maximize `maxCol`.
    * Both must cast losslessly to long (integer criteria contract —
    * see object doc). Output: the input columns, skyline rows only.
    */
  def skyline2d(
      df: DataFrame, minCol: Column, maxCol: Column,
      nPartitions: Int = 32): DataFrame = {
    // cached: rows feed both the group-max reduction and the final
    // threshold join — uncached, the source scan + projection would
    // run twice (the dominating cost at corpus scale)
    val rows = Dedup.scopedCache(df
      .withColumn("__x", minCol.cast("long"))
      .withColumn("__y", maxCol.cast("long"))
      .filter(col("__x").isNotNull && col("__y").isNotNull))
    val groups = rows.groupBy("__x").agg(max("__y").as("__ymax"))
    val thresholds = prefixMax(groups, col("__x"), col("__ymax"), nPartitions)
      .select(col("ord").as("__x"), col("run_le").as("__le"), col("run_lt").as("__lt"))
    // The threshold side is |distinct x| rows — already reduced, often
    // broadcastable, but not provably: leave the strategy to AQE.
    rows.join(thresholds, Seq("__x"))
      .filter(
        (col("__lt").isNull || col("__lt") < col("__y")) &&
          col("__le") <= col("__y"))
      .drop("__x", "__y", "__le", "__lt")
  }
}
