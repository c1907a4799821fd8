package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.{Ip, Money}

/** Event-stream analytics in batch form (SURVEY.md §2.9 ST1-ST4 have a
  * streaming twin in graft.streaming). `events.ts` is normalized
  * through [[Tables.tsUs]]/[[Tables.tsTimestamp]] — schema-adaptive
  * (long-nanos vs TIMESTAMP µs testdata generations), µs either way so
  * the `epoch_us(ts)` oracles compare exactly.
  */
object EventQueries {

  private def events(s: SparkSession, dir: String) = Tables.t(s, dir, "events")

  /** Tumbling-hour rollup (ST3's 30 s sampling generalized; SURVEY §2.9). */
  def e01HourlyStats(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    ev
      .groupBy(
        date_format(Tables.tsTimestamp(ev), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Money.sumMoney(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  val e01Oracle: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Bounded retention: "last N events" (ST2 / T5 tail slices). */
  def e02RecentEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    ev
      .withColumn("ts_us", Tables.tsUs(ev)) // µs for oracle parity
      .orderBy(desc("ts_us"), desc("event_id"))
      .limit(1000)
      .select("event_id", "ts_us", "event_type", "value")
  }

  val e02Oracle: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value FROM events
      |ORDER BY ts_us DESC, event_id DESC LIMIT 1000""".stripMargin

  /** Threshold alerting with severity tiers (ST4,
    * reference src/monitoring.py:209-253).
    */
  def e03Alerts(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn(
        "severity",
        when(col("value") >= 190, "critical")
          .when(col("value") >= 150, "high")
          .when(col("value") >= 120, "medium"))
      .filter(col("severity").isNotNull)
      .select("event_id", "event_type", "value", "severity")
      .orderBy("event_id")

  val e03Oracle: String =
    """SELECT event_id, event_type, value,
      |  CASE WHEN value >= 190 THEN 'critical' WHEN value >= 150 THEN 'high'
      |       WHEN value >= 120 THEN 'medium' END AS severity
      |FROM events WHERE value >= 120 ORDER BY event_id""".stripMargin

  /** Frame-window function: per-user value deltas via lag (SURVEY §2.5).
    * Subtraction of identical doubles is exact, so the oracle matches
    * bit-for-bit.
    */
  def e04ValueJumps(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val w = Window.partitionBy("user_id")
      .orderBy(Tables.tsUs(ev).asc, asc("event_id")) // µs for oracle parity
    ev
      .withColumn("prev_value", lag("value", 1).over(w))
      .withColumn("jump", col("value") - col("prev_value"))
      .filter(abs(col("jump")) > 150)
      .select("event_id", "user_id", "value", "prev_value", "jump")
      .orderBy("event_id")
  }

  val e04Oracle: String =
    """SELECT event_id, user_id, value, prev_value, value - prev_value AS jump FROM (
      |  SELECT event_id, user_id, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |  FROM events
      |) WHERE abs(value - prev_value) > 150 ORDER BY event_id""".stripMargin

  /** IP classification (SURVEY §2.2 P7): derive a deterministic mixed
    * internal/external address per event — RFC1918 v4, documentation v4,
    * loopback/link-local/ULA/global v6 — and classify with the engine's
    * Column expression. The oracle derives expectations from the
    * *generator* buckets — an independent check of the classifier,
    * including the IPv6 rules (reference network_mapper.py:218-238).
    */
  def q15IpClassify(s: SparkSession, dir: String): DataFrame = {
    val u = col("user_id")
    val ip = when(u % 8 === 0, concat(lit("10."), (u % 200).cast("string"), lit(".0.1")))
      .when(u % 8 === 1, concat(lit("172."), (lit(16) + u % 16).cast("string"), lit(".5.9")))
      .when(u % 8 === 2, concat(lit("203.0.113."), (u % 250).cast("string")))
      .when(u % 8 === 3, concat(lit("198.51.100."), (u % 250).cast("string")))
      .when(u % 8 === 4, lit("::1"))
      .when(u % 8 === 5, concat(lit("fe80::"), (u % 50).cast("string")))
      .when(u % 8 === 6, concat(lit("fd12:3456::"), (u % 50).cast("string")))
      .otherwise(concat(lit("2001:db8::"), (u % 50).cast("string")))
    events(s, dir)
      .withColumn("ip", ip)
      .withColumn("is_external", Ip.isExternal(col("ip")))
      .select("event_id", "ip", "is_external")
      .orderBy("event_id")
  }

  val q15Oracle: String =
    """SELECT event_id,
      |  CASE WHEN user_id % 8 = 0 THEN '10.' || (user_id % 200) || '.0.1'
      |       WHEN user_id % 8 = 1 THEN '172.' || (16 + user_id % 16) || '.5.9'
      |       WHEN user_id % 8 = 2 THEN '203.0.113.' || (user_id % 250)
      |       WHEN user_id % 8 = 3 THEN '198.51.100.' || (user_id % 250)
      |       WHEN user_id % 8 = 4 THEN '::1'
      |       WHEN user_id % 8 = 5 THEN 'fe80::' || (user_id % 50)
      |       WHEN user_id % 8 = 6 THEN 'fd12:3456::' || (user_id % 50)
      |       ELSE '2001:db8::' || (user_id % 50) END AS ip,
      |  user_id % 8 IN (2, 3, 7) AS is_external
      |FROM events ORDER BY event_id""".stripMargin

  /** Semi-structured extraction from the JSON props column (SURVEY §2.8 F9)
    * via regexp (identical semantics in both engines, no JSON-extension
    * dependency in the oracle).
    */
  def q16JsonProps(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
      .filter(col("k") >= 90)
      .select("event_id", "event_type", "k")
      .orderBy("event_id")

  val q16Oracle: String =
    """SELECT event_id, event_type, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
      |FROM events WHERE CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) >= 90
      |ORDER BY event_id""".stripMargin

  /** Gap-based sessionization, batch twin of
    * `streaming.Sessionize` (ST7/W): a session breaks when the gap to
    * the previous event exceeds 30 minutes. Pure window functions, so
    * the DuckDB oracle replays it exactly — the cross-engine proof of
    * the session-assignment semantics the streaming path implements
    * with flatMapGroupsWithState.
    */
  def e05SessionStats(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val w = Window.partitionBy("user_id")
      .orderBy(asc("ts_us"), asc("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("ts_us", Tables.tsUs(ev)) // µs for oracle parity
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("ev"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("ev").as("n_events"),
        max("ev").as("max_session_events"))
      .orderBy("user_id")
  }

  val e05Oracle: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events
      |), flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM t
      |), sess AS (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS session_id
      |  FROM flagged
      |), per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS ev FROM sess GROUP BY user_id, session_id
      |)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(ev) AS BIGINT) AS n_events,
      |  CAST(MAX(ev) AS BIGINT) AS max_session_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Backward AS-OF join ([[graft.operators.Temporal.asofJoinBackward]]):
    * every click attached to the user's most recent purchase within 6
    * hours (left-outer — unmatched clicks keep null payloads). The
    * union+window plan costs ONE key shuffle regardless of lookback
    * depth; the oracle replays the same semantics as the naive
    * inequality join + row_number — the spelling that is correct but
    * quadratic per key, i.e. exactly what the operator exists to avoid.
    * Tie discipline (latest ts, then largest event_id) is pinned by
    * both sides.
    */
  def e06AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val base = ev.withColumn("ts_us", Tables.tsUs(ev))
    val clicks = base.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us", "value")
    val purchases = base.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    graft.operators.Temporal.asofJoinBackward(
      clicks, purchases, on = Seq("user_id"), tsCol = "ts_us",
      rightTiebreak = "event_id", rightPayload = Seq("value"),
      tolerance = Some(6L * 3600 * 1000000), rightPrefix = "p_")
      .orderBy("event_id")
  }

  val e06Oracle: String =
    """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'purchase')
      |SELECT event_id, user_id, ts_us, value, p_ts_us, p_event_id, p_value FROM (
      |  SELECT c.event_id, c.user_id, c.ts_us, c.value,
      |    p.ts_us AS p_ts_us, p.event_id AS p_event_id, p.value AS p_value,
      |    row_number() OVER (PARTITION BY c.event_id ORDER BY p.ts_us DESC, p.event_id DESC) AS rn
      |  FROM c LEFT JOIN p
      |    ON p.user_id = c.user_id AND p.ts_us <= c.ts_us AND c.ts_us - p.ts_us <= 21600000000
      |) WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** Interval × point range join
    * ([[graft.operators.Temporal.rangeJoinPoints]]): each purchase
    * opens a 4-hour attribution window; every click by the same user
    * inside it pairs up. The engine blocks the join on 1-hour time
    * buckets (a purchase interval explodes to ≤5 bucket keys, a click
    * to exactly one) so Catalyst plans a hash equi-join — the oracle is
    * the plain BETWEEN join, proving the bucketing is a pure plan
    * optimization with zero semantic footprint.
    */
  def e07RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val base = ev.withColumn("ts_us", Tables.tsUs(ev))
    val intervals = base.filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("p_id"), col("user_id"),
        col("ts_us").as("start_us"),
        (col("ts_us") + 4L * 3600 * 1000000).as("end_us"))
    val points = base.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us", "value")
    graft.operators.Temporal.rangeJoinPoints(
      intervals, points, on = Seq("user_id"),
      startCol = "start_us", endCol = "end_us", pointTsCol = "ts_us",
      bucketWidth = 3600000000L, pointPrefix = "c_")
      .orderBy("p_id", "c_event_id")
  }

  val e07Oracle: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS start_us,
      |                  epoch_us(ts) + 14400000000 AS end_us
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'click')
      |SELECT p.p_id, p.user_id, p.start_us, p.end_us,
      |  c.event_id AS c_event_id, c.ts_us AS c_ts_us, c.value AS c_value
      |FROM p JOIN c ON c.user_id = p.user_id AND c.ts_us BETWEEN p.start_us AND p.end_us
      |ORDER BY p_id, c_event_id""".stripMargin

  /** view → click → purchase funnel ([[graft.operators.Funnel]]):
    * per-user greedy step completion with first/done timestamps. The
    * oracle recomputes the funnel through the chained-conditional-MIN
    * formulation (Tₖ = min ts of step k at ts ≥ Tₖ₋₁) — a structurally
    * DIFFERENT derivation than the operator's sorted-array fold that
    * provably agrees (see the operator's cross-check contract), so the
    * hash match proves the greedy semantics, not just the arithmetic.
    */
  def e08Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.operators.Funnel.funnel(
      ev.withColumn("ts_us", Tables.tsUs(ev)),
      col("user_id"), col("ts_us"), col("event_type"),
      steps = Seq("view", "click", "purchase"))
      .orderBy("user_id")
  }

  val e08Oracle: String =
    """WITH f AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
      |         WHEN 'purchase' THEN 2 ELSE -1 END AS idx
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IN ('view', 'click', 'purchase')
      |), t0 AS (
      |  SELECT user_id, MIN(ts_us) AS t0 FROM f WHERE idx = 0 GROUP BY user_id
      |), t1 AS (
      |  SELECT f.user_id, MIN(ts_us) AS t1 FROM f JOIN t0 USING (user_id)
      |  WHERE idx = 1 AND ts_us >= t0 GROUP BY f.user_id
      |), t2 AS (
      |  SELECT f.user_id, MIN(ts_us) AS t2 FROM f JOIN t1 USING (user_id)
      |  WHERE idx = 2 AND ts_us >= t1 GROUP BY f.user_id
      |), u AS (SELECT DISTINCT user_id FROM f)
      |SELECT u.user_id,
      |  CASE WHEN t2.t2 IS NOT NULL THEN 3 WHEN t1.t1 IS NOT NULL THEN 2
      |       WHEN t0.t0 IS NOT NULL THEN 1 ELSE 0 END AS steps_completed,
      |  t0.t0 AS first_ts, t2.t2 AS done_ts
      |FROM u LEFT JOIN t0 USING (user_id) LEFT JOIN t1 USING (user_id)
      |       LEFT JOIN t2 USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Weekly cohort retention ([[graft.operators.Funnel.cohortRetention]]):
    * cohort = epoch-week of the user's first `signup`; each later
    * active week counts the user once. Exact integer week arithmetic
    * on micros — the oracle replays cohorting, offsets, and the
    * distinct-user counts bit-for-bit.
    */
  def e09Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.operators.Funnel.cohortRetention(
      ev.withColumn("ts_us", Tables.tsUs(ev)),
      col("user_id"), col("ts_us"), col("event_type") === "signup",
      bucketUs = 604800000000L)
      .orderBy("cohort", "bucket_offset")
  }

  val e09Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |), a AS (
      |  SELECT user_id, MIN(ts_us) AS t0 FROM ev
      |  WHERE event_type = 'signup' GROUP BY user_id
      |), j AS (
      |  SELECT DISTINCT a.t0 // 604800000000 AS cohort,
      |    ev.ts_us // 604800000000 - a.t0 // 604800000000 AS bucket_offset,
      |    ev.user_id
      |  FROM ev JOIN a USING (user_id) WHERE ev.ts_us >= a.t0
      |)
      |SELECT cohort, bucket_offset, COUNT(*) AS n_users
      |FROM j GROUP BY cohort, bucket_offset
      |ORDER BY cohort, bucket_offset""".stripMargin

  /** Trailing 7-day moving window per event type over the DAILY money
    * rollup — the RANGE-interval frame surface (every other window here
    * is ROWS/lag): the frame is value-based (day index −6..0), so gap
    * days genuinely shrink the window (n_days reports it) rather than
    * sliding over a fixed row count. All-integer cents → exact
    * cross-engine. The window runs over the aggregated per-(type, day)
    * series — bounded cardinality at any corpus size.
    */
  def e10MovingWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val daily = ev
      .groupBy(
        date_format(Tables.tsTimestamp(ev), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("day_idx", datediff(to_date(col("day")), to_date(lit("1970-01-01"))).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("day_idx").rangeBetween(-6, 0)
    daily
      .withColumn("ma7_cents", sum("cents").over(w))
      .withColumn("n_days", count(lit(1)).over(w))
      .select("day", "event_type", "cents", "ma7_cents", "n_days")
      .orderBy("day", "event_type")
  }

  val e10Oracle: String =
    """WITH d AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
      |    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents,
      |    date_diff('day', DATE '1970-01-01', CAST(strftime(ts, '%Y-%m-%d') AS DATE)) AS day_idx
      |  FROM events GROUP BY 1, 2, 4
      |)
      |SELECT day, event_type, cents,
      |  CAST(SUM(cents) OVER (PARTITION BY event_type ORDER BY day_idx
      |       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma7_cents,
      |  COUNT(*) OVER (PARTITION BY event_type ORDER BY day_idx
      |       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days
      |FROM d ORDER BY day, event_type""".stripMargin

  /** Inter-event gap histogram (the arrival-process profile behind
    * every sessionization / watermark / retention knob): per-user
    * consecutive gaps in exact µs, bucketed on fixed integer
    * thresholds (1 s / 10 s / 1 min / 10 min / 1 h / 1 d) — a CASE
    * chain on longs, no float log-binning to drift cross-engine. One
    * user-key shuffle for the lag, then a bucket-keyed (≤7-row)
    * rollup.
    */
  def e11GapHistogram(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val w = Window.partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
    val gapped = ev
      .withColumn("ts_us", Tables.tsUs(ev))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .filter(col("gap_us").isNotNull)
    val bucketIdx = when(col("gap_us") < 1000000L, 0)
      .when(col("gap_us") < 10000000L, 1)
      .when(col("gap_us") < 60000000L, 2)
      .when(col("gap_us") < 600000000L, 3)
      .when(col("gap_us") < 3600000000L, 4)
      .when(col("gap_us") < 86400000000L, 5)
      .otherwise(6)
    val label = element_at(
      array(lit("lt_1s"), lit("lt_10s"), lit("lt_1m"), lit("lt_10m"),
        lit("lt_1h"), lit("lt_1d"), lit("ge_1d")),
      bucketIdx + 1)
    gapped
      .groupBy(bucketIdx.as("bucket_idx"), label.as("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_us").as("min_gap_us"), max("gap_us").as("max_gap_us"))
      .orderBy("bucket_idx")
  }

  val e11Oracle: String =
    """WITH g AS (
      |  SELECT epoch_us(ts) - lag(epoch_us(ts))
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      |  FROM events
      |), b AS (
      |  SELECT gap_us,
      |    CASE WHEN gap_us < 1000000 THEN 0
      |         WHEN gap_us < 10000000 THEN 1
      |         WHEN gap_us < 60000000 THEN 2
      |         WHEN gap_us < 600000000 THEN 3
      |         WHEN gap_us < 3600000000 THEN 4
      |         WHEN gap_us < 86400000000 THEN 5
      |         ELSE 6 END AS bucket_idx,
      |    CASE WHEN gap_us < 1000000 THEN 'lt_1s'
      |         WHEN gap_us < 10000000 THEN 'lt_10s'
      |         WHEN gap_us < 60000000 THEN 'lt_1m'
      |         WHEN gap_us < 600000000 THEN 'lt_10m'
      |         WHEN gap_us < 3600000000 THEN 'lt_1h'
      |         WHEN gap_us < 86400000000 THEN 'lt_1d'
      |         ELSE 'ge_1d' END AS bucket
      |  FROM g WHERE gap_us IS NOT NULL
      |)
      |SELECT CAST(bucket_idx AS INT) AS bucket_idx, bucket, COUNT(*) AS n_gaps,
      |  CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
      |  CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
      |FROM b GROUP BY 1, 2 ORDER BY bucket_idx""".stripMargin

  /** Event-type co-occurrence — "which behaviors appear in the same
    * user's history" (the pairwise support counts behind basket
    * analysis / behavioral segmentation). Per user: the DISTINCT type
    * set (collect_set — bounded by the type vocabulary, NOT by the
    * user's event count, so a hot user costs nothing); unordered pairs
    * (t1 < t2) via two narrow explodes of that bounded array; pair-
    * keyed rollup. One user-keyed shuffle (the set agg, map-side
    * partial), one pair-keyed shuffle of ≤ |vocab|²/2 keys.
    */
  def e12Cooccurrence(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(col("ts")).as("t1"), col("ts"))
      .select(col("t1"), explode(col("ts")).as("t2"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("t1", "t2")

  val e12Oracle: String =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events
      |)
      |SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n_users
      |FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY t1, t2""".stripMargin

  /** Per-user EWMA of `value` ([[graft.operators.Temporal.ewma]],
    * α = 0.25): the standard smoothed-metric signal (load averages,
    * engagement scores) as ONE user-keyed shuffle + an array fold.
    * α and 1-α are exactly binary-representable and the fold is
    * first-element-seeded strictly-left — the oracle's `list_reduce`
    * is the identical IEEE-754 op sequence, so the doubles hash-match
    * without any rounding.
    */
  def e13Ewma(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.operators.Temporal
      .ewma(ev, col("user_id"), Tables.tsUs(ev), col("event_id"),
        col("value"), 0.25)
      .withColumnRenamed("key", "user_id")
      .orderBy("user_id")
  }

  val e13Oracle: String =
    """WITH s AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    list(value ORDER BY epoch_us(ts), event_id) AS xs
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      |  GROUP BY user_id
      |)
      |SELECT user_id, n_events, xs[len(xs)] AS last_value,
      |  list_reduce(xs, (a, b) -> a * 0.75 + b * 0.25) AS ewma
      |FROM s ORDER BY user_id""".stripMargin

  /** Per-user TIME-weighted average of `value` — the step-function
    * mean (each reading holds until the next one), the right average
    * for sampled gauges where plain AVG over-weights bursts. Exact
    * arithmetic end-to-end: cents × µs holding-time products summed in
    * DECIMAL(38,0) (order-independent — a term reaches ~2e16 and a
    * user's sum ~2e19, past long range; the q37/q38 decimal
    * discipline), one double division + cents rescale at the very end
    * as a fixed tree. The last event has no successor and holds zero
    * time; all-simultaneous users (span 0) are excluded rather than
    * divided by zero. One user-keyed window shuffle, like e04/e05.
    */
  def e14TimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val w = Window.partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
    // e13's null discipline: a null user_id group would sort NULLS
    // FIRST in Spark but LAST in DuckDB on the final ORDER BY, and a
    // null value would count in n_intervals/span_us while its product
    // silently vanished from sum_vdt, biasing twa
    ev
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .withColumn("ts_us", Tables.tsUs(ev))
      .withColumn("v_c", Money.cents(col("value")))
      .withColumn("dt", lead("ts_us", 1).over(w) - col("ts_us"))
      .filter(col("dt").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dt").cast("decimal(38,0)")).as("sum_dt_us"),
        sum(col("v_c").cast("decimal(38,0)") * col("dt").cast("decimal(38,0)"))
          .as("sum_vdt"))
      .filter(col("sum_dt_us") > 0)
      .select(
        col("user_id"), col("n_intervals"),
        col("sum_dt_us").cast("long").as("span_us"),
        (col("sum_vdt").cast("double") / col("sum_dt_us").cast("double") / 100.0)
          .as("twa"))
      .orderBy("user_id")
  }

  val e14Oracle: String =
    """WITH t AS (
      |  SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS v_c,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |      - epoch_us(ts) AS dt
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
      |), agg AS (
      |  SELECT user_id, COUNT(*) AS n_intervals,
      |    SUM(CAST(dt AS HUGEINT)) AS sum_dt,
      |    SUM(CAST(v_c AS HUGEINT) * CAST(dt AS HUGEINT)) AS sum_vdt
      |  FROM t WHERE dt IS NOT NULL GROUP BY user_id
      |)
      |SELECT user_id, n_intervals, CAST(sum_dt AS BIGINT) AS span_us,
      |  CAST(sum_vdt AS DOUBLE) / CAST(sum_dt AS DOUBLE) / 100.0 AS twa
      |FROM agg WHERE sum_dt > 0 ORDER BY user_id""".stripMargin

  /** Hourly distinct-user HLL sketch over the event stream — the batch
    * twin of [[graft.streaming.Streams.windowDistinctSketch]] (ST3's
    * windowed rollup crossed with the q43 sketch family): one pass,
    * one shuffle, 64 registers of state per hour regardless of event
    * volume — the shape "unique users per hour" takes at 100 TB/day,
    * where exact per-window COUNT(DISTINCT) state grows with
    * cardinality. Uses the one-pass [[graft.operators.Sketches.hllAgg]]
    * aggregator (the streaming-state form; SketchesSpec pins
    * bit-equality with the two-stage `hllSketchByKey`), then the
    * shared estimator. n_events rides the same aggregate for free.
    */
  def e15WindowDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    // e13/e14's ts null discipline, symmetric with the oracle: a null
    // ts would form a null hour group here but fall out of the SQL
    // side's INNER equality join on key — the engines would diverge
    // the day events carry a null timestamp
    val sk = ev
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(date_format(Tables.tsTimestamp(ev), "yyyy-MM-dd HH").as("key"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.operators.Sketches.hllAgg(p = 6)(
          graft.functions.Hashing.h60(col("user_id").cast("string")))
          .as("regs"))
    graft.operators.Sketches.hllEstimate(sk, p = 6)
      .select(col("key").as("hour"), col("n_events"), col("v_zero"),
        col("est_micro"),
        md5(concat_ws(",", transform(col("regs"), r => r.cast("string"))))
          .as("regs_fp"))
      .orderBy("hour")
  }

  val e15Oracle: String =
    s"""WITH ${DuckOracle.hllSql("e", "events",
        "strftime(ts, '%Y-%m-%d %H')", "CAST(user_id AS VARCHAR)",
        extraWhere = " AND ts IS NOT NULL")},
       |n AS (
       |  SELECT strftime(ts, '%Y-%m-%d %H') AS key,
       |    CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1
       |)
       |SELECT e.key AS hour, n.n_events, e.v_zero, e.est_micro, e.regs_fp
       |FROM e_est e JOIN n ON n.key = e.key ORDER BY hour""".stripMargin

  /** Hourly value-quantile SAMPLE over the event stream — the batch
    * twin of [[graft.streaming.Streams.windowQuantileSample]] (the e15
    * treatment for the second semilattice-state sketch): one pass, one
    * shuffle, ≤ k (h60(event_id), cents) pairs of state per hour
    * regardless of event volume — the bounded-state shape "p50/p90
    * latency per hour" takes at stream scale, where exact per-window
    * percentiles buffer every row. Uses the one-pass
    * [[graft.operators.Sketches.pairSampleAgg]] aggregator (the
    * streaming-state form; StreamingSpec pins stream ≡ batch pair
    * equality under out-of-order delivery), then the shared
    * [[graft.operators.Sketches.quantilesFromSample]] estimator; the
    * oracle replays sample MEMBERSHIP (`sample_fp` pins all k pairs),
    * the nearest-rank rule, and exact `n` through
    * [[DuckOracle.pairSampleSql]]. Money rides integer cents (the e01
    * discipline) — the operator's integer-metric contract.
    */
  def e16WindowQuantile(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val sk = ev
      // the operator's null contract (id/value) + e15's ts symmetry
      .filter(col("event_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull)
      .groupBy(date_format(Tables.tsTimestamp(ev), "yyyy-MM-dd HH").as("key"))
      .agg(
        count(lit(1)).as("n"),
        graft.operators.Sketches.pairSampleAgg(64)(
          graft.functions.Hashing.h60(col("event_id").cast("string")),
          Money.cents(col("value"))).as("pairs"))
    graft.operators.Sketches.quantilesFromSample(sk, qs = Seq(0.25, 0.5, 0.9))
      .withColumnRenamed("key", "hour")
      .orderBy("hour")
  }

  val e16Oracle: String =
    s"""WITH ${DuckOracle.pairSampleSql("w", "events",
        "strftime(ts, '%Y-%m-%d %H')", "CAST(event_id AS VARCHAR)",
        "CAST(ROUND(value*100) AS BIGINT)", k = 64, qs = Seq(0.25, 0.5, 0.9),
        extraWhere = " AND ts IS NOT NULL")}
       |SELECT key AS hour, n, m_sample, p25, p50, p90, sample_fp
       |FROM w_est ORDER BY hour""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e16_window_quantile" -> (e16WindowQuantile _),
    "e15_window_distinct" -> (e15WindowDistinct _),
    "e14_time_weighted_avg" -> (e14TimeWeightedAvg _),
    "e13_ewma" -> (e13Ewma _),
    "e11_gap_histogram" -> (e11GapHistogram _),
    "e12_cooccurrence" -> (e12Cooccurrence _),
    "e08_funnel" -> (e08Funnel _),
    "e09_retention" -> (e09Retention _),
    "e10_moving_window" -> (e10MovingWindow _),
    "e06_asof_join" -> (e06AsofJoin _),
    "e07_range_join" -> (e07RangeJoin _),
    "e05_session_stats" -> (e05SessionStats _),
    "e01_hourly_stats" -> (e01HourlyStats _),
    "e02_recent_events" -> (e02RecentEvents _),
    "e03_alerts" -> (e03Alerts _),
    "e04_value_jumps" -> (e04ValueJumps _),
    "q15_ip_classify" -> (q15IpClassify _),
    "q16_json_props" -> (q16JsonProps _)
  )

  val oracles: Map[String, String] = Map(
    "e16_window_quantile" -> e16Oracle,
    "e15_window_distinct" -> e15Oracle,
    "e14_time_weighted_avg" -> e14Oracle,
    "e13_ewma" -> e13Oracle,
    "e11_gap_histogram" -> e11Oracle,
    "e12_cooccurrence" -> e12Oracle,
    "e08_funnel" -> e08Oracle,
    "e09_retention" -> e09Oracle,
    "e10_moving_window" -> e10Oracle,
    "e06_asof_join" -> e06Oracle,
    "e07_range_join" -> e07Oracle,
    "e05_session_stats" -> e05Oracle,
    "e01_hourly_stats" -> e01Oracle,
    "e02_recent_events" -> e02Oracle,
    "e03_alerts" -> e03Oracle,
    "e04_value_jumps" -> e04Oracle,
    "q15_ip_classify" -> q15Oracle,
    "q16_json_props" -> q16Oracle
  )
}
