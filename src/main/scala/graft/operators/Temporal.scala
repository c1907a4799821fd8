package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from what Catalyst
  * CAN plan well — no cross joins, no broadcast-nested-loop fallbacks.
  *
  * Reference anchor: the reference correlates events to the most recent
  * prior state snapshot when diffing scans over time
  * (src/audit/pipeline.py baseline-vs-current flow) — the relational
  * form of that correlation is the AS-OF join; its window/interval
  * variant is the range join. Both are first-class operators in every
  * time-series store (kdb, QuestDB, DuckDB `ASOF JOIN`) and absent from
  * Spark, where the naive spelling (`t2.ts <= t1.ts` as a join
  * predicate) degenerates to a broadcast-nested-loop or sort-merge over
  * the FULL inequality range — quadratic per key at 100 TB.
  *
  * == asofJoinBackward: union + window, ONE shuffle ==
  * Tag both sides, union, sort each key partition once by (ts, side,
  * tiebreak), and carry the latest right payload forward with
  * `last(ignoreNulls)` over the running frame. Cost is the sort-merge
  * as-of: one hash exchange on the key + one per-partition sort —
  * O(n log n) per key group, independent of how far back matches lie
  * (the inequality-join spelling pays O(left × right) per key). Skewed
  * keys hit the same limits as any window — the fix (pre-bucketing by
  * coarse time) composes: run the join per (key, day-bucket) with the
  * previous bucket's tail unioned in.
  *
  * == rangeJoinPoints: bucketed equi-join ==
  * Intervals explode to the fixed-width buckets they overlap (bounded
  * by `maxIntervalBuckets` — a loud contract, not a silent truncation);
  * points land in exactly ONE bucket, so each qualifying
  * (interval, point) pair meets at exactly one equi-key and needs no
  * post-join dedup. The exact containment predicate filters AFTER the
  * equi-join, so Catalyst plans a plain shuffled/broadcast hash join
  * keyed on (key, bucket) — the bin-based range join of Databricks'
  * range-join hints and postgres' temporal GiST bucketing, expressed in
  * vanilla Spark.
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the LATEST right
    * row with `right.tsCol <= left.tsCol` on the same `on` keys and
    * within `tolerance` time units (inclusive both ends). Left rows
    * with no qualifying right row keep null payloads (left-outer
    * semantics). Timestamps must be a numeric column (epoch µs by
    * convention here) — callers normalize calendar types first
    * (`Tables.tsUs`), keeping tolerance arithmetic exact.
    *
    * Ties: right rows sharing (key, ts) resolve to the largest
    * `rightTiebreak`; left ordering among equal (key, ts) is
    * irrelevant (every such left row sees the same right prefix).
    * Right rows with a null timestamp are dropped (they order before
    * every real timestamp and would otherwise "match" as a phantom
    * earliest state); left rows with a null timestamp match nothing
    * but are preserved.
    *
    * @param rightPayload right columns to carry (prefixed with
    *        `rightPrefix` in the output, alongside `<prefix><tsCol>`
    *        and the tiebreak)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      tsCol: String,
      rightTiebreak: String,
      rightPayload: Seq[String],
      tolerance: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame =
    asofImpl(left, right, on, tsCol, rightTiebreak, rightPayload,
      tolerance, rightPrefix, forward = false)

  /** Forward as-of join: the EARLIEST right row with
    * `right.tsCol >= left.tsCol` within `tolerance` — the "next event
    * after" correlation (first purchase after a signup, first scan
    * after a change). Ties on (key, ts) resolve to the SMALLEST
    * `rightTiebreak` (the mirror of backward's largest); everything
    * else matches [[asofJoinBackward]].
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      tsCol: String,
      rightTiebreak: String,
      rightPayload: Seq[String],
      tolerance: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame =
    asofImpl(left, right, on, tsCol, rightTiebreak, rightPayload,
      tolerance, rightPrefix, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      tsCol: String,
      rightTiebreak: String,
      rightPayload: Seq[String],
      tolerance: Option[Long],
      rightPrefix: String,
      forward: Boolean): DataFrame = {
    require(on.nonEmpty, "asof join needs ≥1 equi-key")
    val payloadCols = (Seq(tsCol, rightTiebreak) ++ rightPayload).distinct

    // SQL equi-join semantics for the keys: NULL never matches NULL.
    // Window.partitionBy would happily group null keys together, so
    // null-keyed RIGHTS are dropped here — null-keyed lefts then sit
    // in partitions containing no rights and surface unmatched (null
    // payload), exactly like a LEFT JOIN.
    val rhs = right
      .filter(col(tsCol).isNotNull && on.map(col(_).isNotNull).reduce(_ && _))
      .select(
        on.map(col) ++ Seq(
          col(tsCol).as("__ts"),
          lit(0).as("__side"),
          col(rightTiebreak).as("__tie"),
          struct(payloadCols.map(col): _*).as("__r")): _*)

    val lhs = left.select(
      on.map(col) ++ Seq(
        col(tsCol).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(rhs.schema("__tie").dataType).as("__tie")) ++
        left.columns.map(c => col(c).as(s"__l_$c")): _*)

    // One exchange on the keys, one sort per partition. Backward scans
    // ts ascending: rights sort BEFORE lefts at equal ts (side 0 < 1)
    // => inclusive rt <= t, equal-ts rights by tiebreak asc so last()
    // is the LARGEST tiebreak. Forward scans ts DESCENDING (so the
    // carried right is the earliest rt >= t), equal-ts rights by
    // tiebreak desc so last() is the SMALLEST.
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(
        // null-ts lefts must sort before every right in BOTH scan
        // directions (they match nothing): asc puts nulls first by
        // default, desc needs it forced
        (if (forward) col("__ts").desc_nulls_first else col("__ts").asc) +:
          col("__side").asc +:
          Seq(if (forward) col("__tie").desc else col("__tie").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lhs
      .unionByName(rhs, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val gated = tolerance match {
      case Some(tol) =>
        val gap =
          if (forward) col("__m").getField(tsCol) - col("__ts")
          else col("__ts") - col("__m").getField(tsCol)
        matched.withColumn("__m", when(gap <= tol, col("__m")))
      case None => matched
    }

    gated.select(
      left.columns.map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(p => col("__m").getField(p).as(s"$rightPrefix$p")): _*)
  }

  /** Valid intervals exploded to their covered buckets as `__bucket`,
    * with the fan-out contract folded INTO the consumed bucket bound
    * so column pruning cannot optimize the check away: assert_true
    * throws (failing the job) on any interval spanning MORE than
    * `maxBuckets` buckets, instead of silently exploding or
    * truncating coverage. Invalid intervals (null bounds, end < start)
    * are dropped like null join keys.
    *
    * Bucket ids come from `floor(ts / w)` — double division, exact
    * (and negative-safe, unlike integer `div`'s truncation toward
    * zero) while |ts| < 2^53. Epoch MICROseconds sit at ~1.4e15,
    * comfortably inside; epoch nanos would not be — normalize to µs
    * first ([[graft.Tables.tsUs]]).
    */
  private def explodeBuckets(
      iv: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBuckets: Int): DataFrame = {
    val valid = iv
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("__b0", floor(col(startCol) / bucketWidth))
      .withColumn("__b1", floor(col(endCol) / bucketWidth))
    val b1Checked = when(
      assert_true(
        col("__b1") - col("__b0") < maxBuckets,
        concat(
          lit(s"range join: interval spans more than $maxBuckets buckets of $bucketWidth - widen bucketWidth ("),
          col(startCol).cast("string"), lit(".."), col(endCol).cast("string"), lit(")"))).isNull,
      col("__b1"))
    valid
      .withColumn("__bucket", explode(sequence(col("__b0"), b1Checked)))
      .drop("__b0", "__b1")
  }

  /** Interval × interval overlap join: pairs every left interval
    * `[leftStart, leftEnd]` with the right intervals it overlaps
    * (inclusive on both ends: `lS <= rE && rS <= lE`), equi-keyed on
    * `on`. Same bucket blocking as [[rangeJoinPoints]], on BOTH sides;
    * a pair sharing several buckets is kept only at the FIRST bucket
    * both cover (`floor(max(lS, rS) / w)`), so no dedup pass is needed
    * — the standard handshake convention of bin-based overlap joins.
    * Right columns surface under `rightPrefix`.
    */
  def rangeJoinIntervals(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketWidth: Long,
      maxIntervalBuckets: Int = 1024,
      rightPrefix: String = "r_"): DataFrame = {
    require(on.nonEmpty, "rangeJoinIntervals needs ≥1 equi-key")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = explodeBuckets(left, leftStart, leftEnd, bucketWidth, maxIntervalBuckets)
    val rRenamed = right.select(
      on.map(col) ++ right.columns.filterNot(on.contains)
        .map(c => col(c).as(s"__ri_$c")): _*)
    val r = explodeBuckets(
      rRenamed, s"__ri_$rightStart", s"__ri_$rightEnd", bucketWidth, maxIntervalBuckets)
    l.join(r, on :+ "__bucket")
      .filter(
        col(leftStart) <= col(s"__ri_$rightEnd") &&
          col(s"__ri_$rightStart") <= col(leftEnd))
      .filter(col("__bucket") ===
        floor(greatest(col(leftStart), col(s"__ri_$rightStart")) / bucketWidth))
      .select(
        left.columns.map(col) ++
          right.columns.filterNot(on.contains)
            .map(c => col(s"__ri_$c").as(s"$rightPrefix$c")): _*)
  }

  /** Interval × point range join: pairs every interval row
    * `[startCol, endCol]` (inclusive) with the point rows whose
    * `pointTsCol` falls inside it, equi-keyed on `on`. Inner-join
    * semantics — intervals with no points vanish (wrap with a
    * left-outer re-join on the interval key for outer semantics).
    *
    * Buckets of `bucketWidth` time units block the join: an interval
    * covers `(end/w - start/w) + 1` buckets, a point exactly one, so
    * each qualifying pair meets at exactly one equi-key (no dedup
    * pass). `maxIntervalBuckets` bounds the explode — an interval
    * longer than `bucketWidth × maxIntervalBuckets` fails loudly
    * rather than silently fanning out (pick a wider bucket for long
    * intervals; the classic two-tier refinement composes by unioning
    * two bucket widths).
    *
    * Invalid intervals (null bounds or end < start) and null-ts points
    * are dropped.
    */
  def rangeJoinPoints(
      intervals: DataFrame,
      points: DataFrame,
      on: Seq[String],
      startCol: String,
      endCol: String,
      pointTsCol: String,
      bucketWidth: Long,
      maxIntervalBuckets: Int = 1024,
      pointPrefix: String = "p_"): DataFrame = {
    require(on.nonEmpty, "rangeJoinPoints needs ≥1 equi-key")
    require(bucketWidth > 0, "bucketWidth must be positive")

    val expl = explodeBuckets(intervals, startCol, endCol, bucketWidth, maxIntervalBuckets)

    val pts = points
      .filter(col(pointTsCol).isNotNull)
      .select(
        on.map(col) ++ Seq(floor(col(pointTsCol) / bucketWidth).as("__bucket")) ++
          points.columns.map(c => col(c).as(s"__p_$c")): _*)

    expl
      .join(pts, on :+ "__bucket")
      .filter(
        col(s"__p_$pointTsCol") >= col(startCol) &&
          col(s"__p_$pointTsCol") <= col(endCol))
      .select(
        intervals.columns.map(col) ++
          points.columns.filterNot(on.contains)
            .map(c => col(s"__p_$c").as(s"$pointPrefix$c")): _*)
  }

  /** Per-key exponentially weighted moving average — the classic
    * recursive smoother `s₁ = x₁; sₙ = (1-α)·sₙ₋₁ + α·xₙ` folded over
    * each key's events in (ts, tiebreak) order, returning one row per
    * key: (key, n_events, last value, final EWMA).
    *
    * Scale shape: ONE shuffle (the groupBy on the key); each key's
    * series collects into a sorted array and a single codegen'd
    * `aggregate` HOF walks it — no window over the corpus, no
    * quadratic self-join, and key groups are bounded by per-entity
    * series length (the same contract as [[graft.operators.Funnel]]).
    * Corpora whose single-key series outgrow an array should bucket
    * the series by epoch and chain bucket-level EWMAs — the recursion
    * telescopes: s over a concatenation is a (1-α)^m-weighted blend,
    * so per-bucket partials compose associatively.
    *
    * Determinism: the fold is seeded with the FIRST element and
    * strictly left-associative, the exact shape of DuckDB's
    * `list_reduce` — identical IEEE-754 op order, so a SQL replay
    * hash-matches bit-for-bit (same discipline as the v-query dot
    * products). `alpha` must be exactly representable in binary
    * (0.25, 0.5, …) only if callers ALSO replay it in decimal
    * literals; the operator itself accepts any α ∈ (0, 1].
    *
    * Null key/ts/value rows are excluded (null value would poison the
    * whole fold, not one step). `ts` and `tiebreak` must be INTEGER
    * columns (micros via [[graft.Tables.tsUs]], ids) — the long cast
    * on a TIMESTAMP truncates to seconds and sub-second order with it.
    */
  def ewma(
      events: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val ev = events
      .select(
        key.as("key"), ts.cast("long").as("ts_us"),
        tiebreak.cast("long").as("tie"), value.cast("double").as("x"))
      .filter(
        col("key").isNotNull && col("ts_us").isNotNull && col("x").isNotNull)
    ev.groupBy("key")
      .agg(
        count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("ts_us"), col("tie"), col("x"))))
          .as("series"))
      .select(
        col("key"),
        col("n_events"),
        element_at(col("series"), -1).getField("x").as("last_value"),
        aggregate(
          slice(col("series"), lit(2), greatest(size(col("series")) - 1, lit(0))),
          element_at(col("series"), 1).getField("x"),
          (acc, e) => acc * lit(1.0 - alpha) + e.getField("x") * lit(alpha)
        ).as("ewma"))
  }
}
