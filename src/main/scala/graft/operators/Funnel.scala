package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel over an event stream — "users who did A,
  * then B, then C": for each user, how many steps of the sequence
  * completed IN ORDER (greedy first-touch semantics: each step
  * advances on the earliest qualifying event after the previous
  * advance), with the first-step and completion timestamps.
  *
  * Scale shape: non-step events are filtered BEFORE the shuffle (the
  * only wide op is one groupBy on the user key); each user's step
  * events collect into one sorted array and a single `aggregate` HOF
  * fold walks it — state is a 3-field struct, codegen'd, no window
  * over the corpus and no per-step self-joins (k-step funnels via
  * joins pay k shuffles; this pays one).
  *
  * Determinism: events sort by (ts, step index) — two events at the
  * SAME timestamp count in step order (a view and its click in one
  * micro tick still complete view→click), and the fold is a pure
  * function of the sorted array.
  *
  * Cross-check contract (what the e08 oracle exploits): the greedy
  * fold satisfies the recurrence T₀ = min ts of step-0 events and
  * Tₖ = min{ts : step k, ts ≥ Tₖ₋₁} — an event at the same ts as the
  * previous advance sorts after it (its step index is larger), so
  * "position after" is exactly "ts ≥". The oracle recomputes the
  * funnel through that chained-min formulation; the two independent
  * derivations must agree bit-for-bit.
  *
  * `ts` must be an integer (micros — [[graft.Tables.tsUs]]); `steps`
  * are distinct event-type strings (repeated-type funnels need a
  * per-occurrence encoding this operator does not implement).
  * Rows with null user/ts/type are excluded. Output per user seen in
  * ANY step event: (user_id, steps_completed, first_ts, done_ts) —
  * done_ts null until the final step completes.
  */
object Funnel {

  /** Cohort retention — the funnel's standard companion: users are
    * cohorted by the time bucket of their FIRST anchor event (min ts
    * where `isAnchor`), and each later activity bucket counts them
    * once: (cohort, bucket_offset, n_users). Activity before the
    * anchor is ignored; bucket arithmetic is exact integer division
    * on micros (`bucketUs`, e.g. 7 days), engine-replayable.
    *
    * Scale shape: anchor is one user-keyed aggregation; the join back
    * REUSES the user partitioning (no second shuffle shape); the
    * distinct-user rollup is result-keyed. Exact distinct by
    * contract — swap in approx_count_distinct at 100 TB if the
    * retention matrix itself outgrows exactness needs.
    */
  def cohortRetention(
      events: DataFrame, user: Column, ts: Column, isAnchor: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val ev = events
      .select(user.as("user_id"), ts.cast("long").as("ts_us"), isAnchor.as("anch"))
      .filter(col("user_id").isNotNull && col("ts_us").isNotNull)
    val anchors = ev.filter(col("anch"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t0"))
    val b = lit(bucketUs)
    ev.join(anchors, "user_id")
      .filter(col("ts_us") >= col("t0"))
      .select(
        floor(col("t0") / b).cast("long").as("cohort"),
        (floor(col("ts_us") / b).cast("long") - floor(col("t0") / b).cast("long"))
          .as("bucket_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort", "bucket_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  def funnel(
      events: DataFrame, user: Column, ts: Column, eventType: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps,
      "funnel steps must be distinct event types")
    val k = steps.length
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (t, i)) => when(eventType === lit(t), lit(i)).otherwise(acc)
    }
    val ev = events
      .select(user.as("user_id"), ts.cast("long").as("ts_us"), stepIdx.as("idx"))
      .filter(col("user_id").isNotNull && col("ts_us").isNotNull && col("idx") >= 0)
    val zero = struct(
      lit(0).as("nxt"),
      lit(null).cast("long").as("first_ts"),
      lit(null).cast("long").as("done_ts"))
    ev.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts_us"), col("idx")))).as("evs"))
      .select(col("user_id"),
        aggregate(col("evs"), zero, (acc, e) =>
          when(e.getField("idx") === acc.getField("nxt"),
            struct(
              (acc.getField("nxt") + lit(1)).as("nxt"),
              when(acc.getField("nxt") === 0, e.getField("ts_us"))
                .otherwise(acc.getField("first_ts")).as("first_ts"),
              when(acc.getField("nxt") === k - 1, e.getField("ts_us"))
                .otherwise(acc.getField("done_ts")).as("done_ts")))
            .otherwise(acc)).as("f"))
      .select(col("user_id"),
        col("f.nxt").as("steps_completed"),
        col("f.first_ts").as("first_ts"),
        col("f.done_ts").as("done_ts"))
  }
}
