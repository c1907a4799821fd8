package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Temporal.ewma]]: per-key
  * exponentially weighted moving average over a live event stream,
  * with BATCH PARITY as the contract — the exact-mode discipline
  * [[FunnelStream.progressExact]] established, applied to a numeric
  * fold whose result depends on event ORDER (the whole point of the
  * recursion: `sₙ = (1-α)·sₙ₋₁ + α·xₙ` is not commutative).
  *
  * Events BUFFER until the watermark passes them (strictly — Spark's
  * late-row filter drops only rows strictly older than the watermark,
  * so an event stamped exactly at the watermark can still arrive in a
  * later batch; folding its same-timestamp peer first would diverge
  * from the batch sort). Finalized events replay through the fold in
  * (ts, tie, value) order — the batch operator's exact sort — so the
  * running value emitted per batch equals `Temporal.ewma` over the
  * finalized prefix, and the idle-timeout drain equals it over
  * everything.
  *
  * State bound: O(1) core (n, ewma, last) + the in-horizon buffer
  * (rate × watermark delay per key); the event-time idle timeout
  * (`idleMs` past the key's newest event) drains and EVICTS keys that
  * go quiet, so a churning key population cannot grow state forever.
  *
  * Honest divergence at eviction: a key that RESUMES after its idle
  * drain starts a fresh fold — rows after the gap equal the batch
  * operator over the post-gap SUFFIX, not the full history (the
  * history was emitted as the `finalRow` and its state evicted;
  * keeping it would unbound state on churning key populations).
  * Consumers needing whole-history parity across idle gaps must fold
  * the final rows downstream: EWMA telescopes, so
  * `s = (1-α)^m·s_prev_final + (fresh fold seeded at 0 over the m new
  * events)` — or simply use a larger idleMs.
  */
object EwmaStream {

  /** (userId, ts, tie, value) — `tie` is the deterministic
    * same-timestamp order key (an event id), exactly the batch
    * operator's tiebreak column.
    */
  case class Ev(userId: Long, ts: Timestamp, tie: Long, value: Double)

  case class EwmaExactState(
      n: Long, ewma: Double, last: Double, lastTs: Long,
      buf: Seq[(Long, Long, Double)])

  case class EwmaOut(
      userId: Long, nEvents: Long, lastValue: Double, ewma: Double,
      asOf: Timestamp, finalRow: Boolean)

  def ewmaExact(
      events: Dataset[Ev],
      alpha: Double,
      idleMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[EwmaOut] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(idleMs > 0, s"idleMs must be positive, got $idleMs")
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val stEnc = Encoders.product[EwmaExactState]

    // the batch fold, verbatim: seed on first element, then the
    // recursion — same IEEE op order as Temporal.ewma's aggregate()
    def fold(st: EwmaExactState, ready: Seq[(Long, Long, Double)]): EwmaExactState =
      ready.foldLeft(st) { case (s, (t, _, x)) =>
        if (s.n == 0L) s.copy(n = 1L, ewma = x, last = x, lastTs = t)
        else s.copy(n = s.n + 1, ewma = s.ewma * (1.0 - alpha) + x * alpha,
          last = x, lastTs = t)
      }

    // full parquet/batch precision: getTime is millis-only; nanos
    // carries the rest of the sub-second fraction
    def tsMicros(t: Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // state timestamps are micros; emitted/deadline timestamps are the
    // engine's millisecond domain
    def row(userId: Long, s: EwmaExactState, fin: Boolean): EwmaOut =
      EwmaOut(userId, s.n, s.last, s.ewma,
        new Timestamp(Math.floorDiv(s.lastTs, 1000L)), fin)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[EwmaExactState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[EwmaExactState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[EwmaOut]
          val prior = state.getOption.getOrElse(EwmaExactState(0L, 0.0, 0.0, 0L, Nil))
          if (state.hasTimedOut) {
            // fired deadline = newest event + idle > every buffered ts:
            // the watermark passed the whole buffer, drain it all
            val drained = fold(prior, prior.buf.sorted)
            if (drained.n > 0L) out += row(userId, drained, fin = true)
            state.remove()
          } else {
            val wm = state.getCurrentWatermarkMs()
            // buffer in MICROSECONDS: the batch twin sorts by integer
            // micros, and Timestamp.getTime alone is millis — two
            // same-millisecond events would fall back to the tiebreak
            // and fold in a different order than the batch sort
            // (non-commutative recursion ⇒ different EWMA). Finality
            // still compares at Spark's millisecond watermark
            // granularity (strictly below).
            val buf = prior.buf ++ evs.map(e => (tsMicros(e.ts), e.tie, e.value))
            val (ready, pending) = buf.partition(_._1 < wm * 1000L)
            val cur = fold(prior, ready.sorted)
            if (ready.nonEmpty)
              out += row(userId, cur, fin = false)
            if (cur.n == 0L && pending.isEmpty) {
              if (state.exists) state.remove()
            } else {
              state.update(cur.copy(buf = pending))
              val newestUs = math.max(
                ready.iterator.map(_._1).maxOption.getOrElse(Long.MinValue),
                pending.iterator.map(_._1).maxOption.getOrElse(Long.MinValue))
              // ceil to ms so the deadline still covers every buffered
              // event (floor could fire one ms before a buffered ts)
              val newestMs = Math.floorDiv(newestUs + 999L, 1000L)
              state.setTimeoutTimestamp(math.max(newestMs + idleMs, wm + 1))
            }
          }
          out.iterator
      }
  }
}
