package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Real-time funnel progression — the streaming twin of
  * [[graft.operators.Funnel.funnel]]: per-user step state advances as
  * events arrive; a row emits the moment a user COMPLETES the final
  * step (state then clears — a re-entering user starts a fresh
  * funnel), and users who go silent past the event-time timeout emit
  * their PARTIAL progress (the drop-off row funnel dashboards chart)
  * and evict.
  *
  * Ordering contract (the honest divergence from the batch operator):
  * events SORT by (ts, step index) within each micro-batch, but the
  * state machine cannot rewind for a late cross-batch event that
  * belonged before an already-taken advance — streaming funnels are
  * greedy in arrival order at micro-batch granularity. The batch
  * operator is the exact replay; run it over the lake when the answer
  * must be order-perfect. (StreamingSpec pins both: same-batch
  * disorder is healed by the sort, cross-batch lateness is not.)
  *
  * State is bounded twice: completion removes the user inline, and
  * EVENT-TIME TIMEOUTS (watermark + `idleMs` past the user's last
  * event) flush the silent — without them a churning user population
  * grows state forever and drop-off rows never emit.
  */
object FunnelStream {

  case class FunnelState(nxt: Int, firstTs: Long, lastTs: Long)

  case class FunnelOut(
      userId: Long,
      stepsCompleted: Int,
      completed: Boolean,
      firstTs: Timestamp,
      lastTs: Timestamp)

  /** `events` is [[Sessionize.Ev]]-shaped; `steps` are distinct event
    * types in funnel order.
    */
  def progress(
      events: Dataset[Sessionize.Ev],
      steps: Seq[String],
      idleMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[FunnelOut] = {
    require(steps.nonEmpty && steps.distinct == steps,
      "funnel steps must be nonempty and distinct")
    val k = steps.length
    val idx = steps.zipWithIndex.toMap
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val stEnc = Encoders.product[FunnelState]

    def row(userId: Long, s: FunnelState): FunnelOut =
      FunnelOut(userId, s.nxt, s.nxt == k,
        new Timestamp(s.firstTs), new Timestamp(s.lastTs))

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[FunnelState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          if (state.hasTimedOut) {
            // silent past the deadline: emit the drop-off row, evict
            state.getOption.foreach(s => out += row(userId, s))
            state.remove()
          } else {
            // same-batch disorder heals here: sort by (ts, step index)
            // — the batch operator's tie-break, so a view+click in one
            // micro tick still completes in order
            val sorted = evs.toSeq
              .flatMap(e => idx.get(e.eventType).map(i => (e.ts.getTime, i)))
              .sorted
            var cur = state.getOption
            for ((t, i) <- sorted) {
              val s = cur.getOrElse(FunnelState(0, t, t))
              val advanced =
                if (i == s.nxt)
                  s.copy(nxt = s.nxt + 1,
                    firstTs = if (s.nxt == 0) t else s.firstTs,
                    lastTs = t)
                else s.copy(lastTs = math.max(s.lastTs, t))
              if (advanced.nxt == k) {
                out += row(userId, advanced)
                cur = None // completion clears: a re-entry starts fresh
              } else cur = Some(advanced)
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // deadline must sit beyond the current watermark or
                // Spark rejects it (the Sessionize contract)
                state.setTimeoutTimestamp(
                  math.max(s.lastTs + idleMs, state.getCurrentWatermarkMs() + 1))
              case None => if (state.exists) state.remove()
            }
          }
          out.iterator
      }
  }
}
