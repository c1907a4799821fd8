package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed stateful processing with flatMapGroupsWithState: per-user
  * session assembly over an event stream (gap-based sessionization).
  *
  * State size is bounded two ways: sessions close inline when a user's
  * next event arrives past the gap, and EVENT-TIME TIMEOUTS close (and
  * evict) sessions of users who never return once the watermark passes
  * their gap deadline — without the timeout, a churning user population
  * grows state forever and final sessions are never emitted.
  */
object Sessionize {

  case class Ev(userId: Long, ts: Timestamp, eventType: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Int, sumValue: Double)

  case class SessionOut(
      userId: Long,
      sessionStart: Timestamp,
      sessionEnd: Timestamp,
      nEvents: Int,
      sumValue: Double)

  /** Emit a session row whenever a user is silent for `gapMs` — either
    * on their next (post-gap) event or via event-time timeout when the
    * watermark passes their deadline. `events` must carry a watermark
    * (applied here from the `ts` field).
    */
  def sessions(
      events: Dataset[Ev],
      gapMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]

    def close(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sumValue)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          if (state.hasTimedOut) {
            state.getOption.foreach(s => out += close(userId, s))
            state.remove()
          } else {
            // micro-batch arrival order is not guaranteed: sort by event time
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // late-but-within-watermark events can arrive in a LATER
                  // micro-batch with t < s.last (or even < s.start): merge
                  // must extend bounds monotonically, never move them
                  // backwards — a shrunken `last` would mis-split the next
                  // gap check and emit sessionEnd < sessionStart
                  cur = Some(s.copy(
                    start = math.min(s.start, t),
                    last = math.max(s.last, t),
                    n = s.n + 1, sumValue = s.sumValue + e.value))
                case Some(s) =>
                  out += close(userId, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // deadline must sit beyond the current watermark or Spark
              // rejects it — a session already "expired" relative to the
              // watermark times out at the next opportunity
              val deadline = math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1)
              state.setTimeoutTimestamp(deadline)
            }
          }
          out.iterator
      }
  }
}
