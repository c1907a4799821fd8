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

  /** `firstTs` uses [[NoTs]] as "step 0 not yet completed" — the batch
    * twin leaves first_ts null until step 0 advances, and a drop-off
    * row with stepsCompleted = 0 must match that contract (a real
    * timestamp there would claim a funnel start that never happened).
    */
  case class FunnelState(nxt: Int, firstTs: Long, lastTs: Long)

  private val NoTs = Long.MinValue

  /** The funnel state machine over time-ordered (ts, stepIdx) pairs —
    * ONE implementation shared by the greedy and exact modes so their
    * per-event semantics cannot drift: on-step events advance (step 0
    * claims firstTs), off-step events only extend lastTs, completion
    * calls `emit` and resets (a re-entering user starts fresh).
    * Serializable-closure safe: pure function of its arguments.
    */
  private def fold(
      start: Option[FunnelState], evs: Seq[(Long, Int)], k: Int, noTs: Long,
      emit: FunnelState => Unit): Option[FunnelState] = {
    var cur = start
    for ((t, i) <- evs) {
      val s = cur.getOrElse(FunnelState(0, noTs, t))
      val advanced =
        if (i == s.nxt)
          s.copy(nxt = s.nxt + 1,
            firstTs = if (s.nxt == 0) t else s.firstTs,
            lastTs = t)
        else s.copy(lastTs = math.max(s.lastTs, t))
      if (advanced.nxt == k) { emit(advanced); cur = None }
      else cur = Some(advanced)
    }
    cur
  }

  case class FunnelOut(
      userId: Long,
      stepsCompleted: Int,
      completed: Boolean,
      firstTs: Timestamp,
      lastTs: Timestamp)

  /** [[progressExact]] state: the funnel machine over FINALIZED events
    * plus the per-user buffer of (ts, stepIdx) pairs still inside the
    * watermark horizon. The buffer is bounded by the user's own event
    * rate × the watermark delay — the price of exactness — vs the
    * greedy mode's O(1) state; both are watermark-bounded in user
    * count.
    */
  case class FunnelExactState(
      nxt: Int, firstTs: Long, lastTs: Long, buf: List[(Long, Int)])

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
    // local copy: the state function must capture only locals — an
    // object-field reference would drag the (non-serializable) module
    // into the task closure
    val noTs = NoTs
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val stEnc = Encoders.product[FunnelState]

    def row(userId: Long, s: FunnelState): FunnelOut =
      FunnelOut(userId, s.nxt, s.nxt == k,
        if (s.firstTs == noTs) null else new Timestamp(s.firstTs),
        new Timestamp(s.lastTs))

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
            // seed with firstTs UNSET ([[fold]]): only the step-0
            // advance claims it, so a user whose first events are all
            // off-step emits a null firstTs drop-off row like the
            // batch twin; completion clears — a re-entry starts fresh
            val cur = fold(state.getOption, sorted, k, noTs,
              done => out += row(userId, done))
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

  /** EXACT streaming funnel — the opt-in twin of [[progress]] that
    * buys batch-[[graft.operators.Funnel.funnel]] ordering at the cost
    * of buffered state: per-user events BUFFER until the watermark
    * passes their event time, and only then replay through the state
    * machine in (ts, stepIdx) order. Because Spark drops rows older
    * than the watermark before they reach the state function, every
    * buffered event ≤ watermark is FINAL — no later-arriving event can
    * belong before it — so the replay is the batch fold, incrementally.
    * Cross-batch disorder inside the watermark horizon (the case the
    * greedy mode documents as its divergence) heals here; an event
    * later than the watermark delay is dropped by Spark in BOTH modes.
    *
    * Emission is therefore watermark-delayed: a completion surfaces
    * once the watermark passes the completing event, not the moment it
    * arrives — exactness trades latency, greedy trades ordering.
    *
    * State bound: the machine core is O(1); the buffer holds only the
    * user's own events still inside the watermark horizon (rate ×
    * delay), and the idle timeout (`idleMs` past the user's newest
    * event, buffered or replayed) drains the buffer — every buffered
    * ts sits below the fired deadline, hence below the watermark, so
    * the timeout drain replays EVERYTHING, emits the drop-off (or
    * late completion) row, and evicts.
    */
  def progressExact(
      events: Dataset[Sessionize.Ev],
      steps: Seq[String],
      idleMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[FunnelOut] = {
    require(steps.nonEmpty && steps.distinct == steps,
      "funnel steps must be nonempty and distinct")
    val k = steps.length
    val idx = steps.zipWithIndex.toMap
    val noTs = NoTs
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val stEnc = Encoders.product[FunnelExactState]

    def row(userId: Long, s: FunnelState): FunnelOut =
      FunnelOut(userId, s.nxt, s.nxt == k,
        if (s.firstTs == noTs) null else new Timestamp(s.firstTs),
        new Timestamp(s.lastTs))

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelExactState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[FunnelExactState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          val prior = state.getOption.getOrElse(FunnelExactState(0, noTs, noTs, Nil))
          val core: Option[FunnelState] =
            if (prior.nxt == 0 && prior.firstTs == noTs && prior.lastTs == noTs) None
            else Some(FunnelState(prior.nxt, prior.firstTs, prior.lastTs))
          if (state.hasTimedOut) {
            // the fired deadline covered the newest buffered ts + idle,
            // so watermark > every buffered event: drain it ALL in
            // order, emit the final row (drop-off or late completion),
            // evict
            val drained = fold(core, prior.buf.sorted, k, noTs,
              done => out += row(userId, done))
            drained.foreach(s => out += row(userId, s))
            state.remove()
          } else {
            val wm = state.getCurrentWatermarkMs()
            val buf = prior.buf ++
              evs.flatMap(e => idx.get(e.eventType).map(i => (e.ts.getTime, i)))
            // FINAL events (strictly < watermark) replay now; the rest
            // stay buffered until a later batch's watermark frees them.
            // Strict: Spark's late-row filter drops only rows STRICTLY
            // older than the watermark, so an event stamped exactly at
            // the watermark can still arrive in a later batch — folding
            // a same-timestamp peer first would diverge from the batch
            // ordering. Events equal to the watermark wait one batch;
            // the timeout drain covers them if the stream goes idle.
            val (ready, pending) = buf.partition(_._1 < wm)
            val cur = fold(core, ready.sorted, k, noTs,
              done => out += row(userId, done))
            val hasCore = cur.isDefined
            if (!hasCore && pending.isEmpty) {
              // nothing finalized, nothing buffered (a completion just
              // cleared, or only off-funnel types arrived): evict
              if (state.exists) state.remove()
            } else {
              val c = cur.getOrElse(FunnelState(0, noTs, noTs))
              state.update(FunnelExactState(c.nxt, c.firstTs, c.lastTs, pending))
              // idle deadline past the NEWEST event seen — buffered
              // included, so a fired timeout implies the whole buffer
              // is below the watermark (the drain-all invariant above)
              val newest = math.max(
                if (c.lastTs == noTs) Long.MinValue else c.lastTs,
                if (pending.isEmpty) Long.MinValue else pending.iterator.map(_._1).max)
              state.setTimeoutTimestamp(math.max(newest + idleMs, wm + 1))
            }
          }
          out.iterator
      }
  }
}
