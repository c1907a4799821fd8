package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** [[graft.operators.Temporal]] — AS-OF and range joins. Semantics are
  * pinned on crafted fixtures (ties, tolerance edges, null timestamps,
  * left-outer preservation); plan shape is pinned against the failure
  * mode the operators exist to avoid (inequality-predicate joins
  * degenerating to nested-loop/cartesian plans); the e06/e07 oracles
  * add the cross-engine replay at sf0.01.
  */
class TemporalSpec extends SparkSpecBase {

  import spark.implicits._

  private def asof(
      left: Seq[(Long, Long, Long)], // (id, key, ts)
      right: Seq[(Long, Long, Long, Double)], // (id, key, ts, v)
      tol: Option[Long] = None) = {
    val l = left.toDF("event_id", "k", "ts_us")
    val r = right.toDF("event_id", "k", "ts_us", "v")
    Temporal.asofJoinBackward(
      l, r, on = Seq("k"), tsCol = "ts_us",
      rightTiebreak = "event_id", rightPayload = Seq("v"), tolerance = tol)
  }

  test("asof: latest right at or before each left ts, left-outer") {
    val out = asof(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 50L)),
      right = Seq((10L, 7L, 100L, 1.0), (11L, 7L, 200L, 2.0)))
      .select("event_id", "r_event_id", "r_v")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(1L) === ((Some(10L), Some(1.0)))) // inclusive: rt == t matches
    assert(out(2L) === ((Some(11L), Some(2.0)))) // latest, not first
    assert(out(3L) === ((None, None))) // nothing at-or-before -> kept, null payload
  }

  test("asof: equal-ts rights resolve to the largest tiebreak") {
    val out = asof(
      left = Seq((1L, 7L, 100L)),
      right = Seq((10L, 7L, 100L, 1.0), (12L, 7L, 100L, 3.0), (11L, 7L, 100L, 2.0)))
      .select("r_event_id", "r_v").head()
    assert(out === Row(12L, 3.0))
  }

  test("asof: tolerance gates inclusively and nulls the whole payload") {
    val mk = (tol: Long) => asof(
      left = Seq((1L, 7L, 300L)),
      right = Seq((10L, 7L, 200L, 1.0)), tol = Some(tol))
      .select("r_event_id", "r_ts_us", "r_v").head()
    assert(mk(100L) === Row(10L, 200L, 1.0)) // exactly at tolerance: kept
    assert(mk(99L) === Row(null, null, null)) // just past: all payload null
  }

  test("asof: null-ts rights never match; null-ts lefts survive unmatched") {
    val l = Seq((1L, Some(7L), Some(100L)), (2L, Some(7L), None))
      .toDF("event_id", "k", "ts_us")
    val r = Seq((10L, 7L, Some(50L), 1.0), (11L, 7L, Option.empty[Long], 9.0))
      .toDF("event_id", "k", "ts_us", "v")
    val out = Temporal.asofJoinBackward(
      l, r, Seq("k"), "ts_us", "event_id", Seq("v"))
      .select("event_id", "r_event_id")
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(out(1L) === Some(10L)) // real row matches, null-ts phantom ignored
    assert(out(2L) === None) // null-ts left: kept, no match
    assert(out.size === 2)
  }

  test("asof: NULL keys never match (SQL equi-join semantics), null-key lefts survive") {
    val l = Seq((1L, Option(7L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("event_id", "k", "ts_us")
    val r = Seq((10L, Option(7L), 50L, 1.0), (11L, Option.empty[Long], 50L, 9.0))
      .toDF("event_id", "k", "ts_us", "v")
    val out = Temporal.asofJoinBackward(l, r, Seq("k"), "ts_us", "event_id", Seq("v"))
      .select("event_id", "r_event_id")
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    assert(out(1L) === Some(10L)) // real key matches normally
    assert(out(2L) === None) // null key: left kept, NO null-null match
    assert(out.size === 2)
  }

  test("asof: keys never cross") {
    val out = asof(
      left = Seq((1L, 7L, 100L)),
      right = Seq((10L, 8L, 50L, 1.0)))
      .select("r_event_id").head()
    assert(out === Row(null))
  }

  test("asof plan: one exchange on the key, no nested-loop join") {
    val df = queries.EventQueries.e06AsofJoin(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"),
      s"asof degenerated to a product plan:\n$p")
    assert(p.contains("Window"), "asof should plan as a window, not a join")
  }

  private def asofFwd(
      left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)],
      tol: Option[Long] = None) = {
    val l = left.toDF("event_id", "k", "ts_us")
    val r = right.toDF("event_id", "k", "ts_us", "v")
    Temporal.asofJoinForward(
      l, r, on = Seq("k"), tsCol = "ts_us",
      rightTiebreak = "event_id", rightPayload = Seq("v"), tolerance = tol)
  }

  test("forward asof: earliest right at or after; ties take the SMALLEST tiebreak") {
    val out = asofFwd(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 7L, 50L)),
      right = Seq((12L, 7L, 100L, 9.0), (10L, 7L, 100L, 1.0), (11L, 7L, 200L, 2.0)))
      .select("event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out(1L) === Some(10L)) // inclusive + smallest-id tie at rt == t
    assert(out(2L) === None) // nothing at-or-after 250
    assert(out(3L) === Some(10L)) // earliest of the future rights
  }

  test("forward asof: tolerance gates rt - t; null-ts lefts survive unmatched") {
    val out = asofFwd(
      left = Seq((1L, 7L, 100L)),
      right = Seq((10L, 7L, 200L, 1.0)), tol = Some(99L))
      .select("r_event_id").head()
    assert(out === Row(null)) // 100 past the 99 tolerance

    val l = Seq((1L, 7L, Option.empty[Long])).toDF("event_id", "k", "ts_us")
    val r = Seq((10L, 7L, Option(50L), 1.0)).toDF("event_id", "k", "ts_us", "v")
    val o2 = Temporal.asofJoinForward(l, r, Seq("k"), "ts_us", "event_id", Seq("v"))
      .select("event_id", "r_event_id").collect()
    assert(o2.length === 1 && o2(0).get(1) == null)
  }

  private val H = 3600000000L

  test("range: bucketed join equals the naive BETWEEN join, no dup pairs") {
    // intervals crossing bucket boundaries + points on exact edges
    val iv = Seq((1L, 7L, 10L * H, 14L * H), (2L, 7L, 11L * H, 11L * H),
      (3L, 8L, 10L * H, 14L * H))
      .toDF("iv_id", "k", "start_us", "end_us")
    val pt = Seq((20L, 7L, 10L * H), (21L, 7L, 14L * H), (22L, 7L, 14L * H + 1),
      (23L, 7L, 11L * H), (24L, 8L, 12L * H), (25L, 9L, 12L * H))
      .toDF("event_id", "k", "ts_us")
    val got = Temporal.rangeJoinPoints(
      iv, pt, Seq("k"), "start_us", "end_us", "ts_us", bucketWidth = H)
      .select("iv_id", "p_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      (ivId, ik, s, e) <- Seq((1L, 7L, 10 * H, 14 * H), (2L, 7L, 11 * H, 11 * H), (3L, 8L, 10 * H, 14 * H))
      (pId, pk, t) <- Seq((20L, 7L, 10 * H), (21L, 7L, 14 * H), (22L, 7L, 14 * H + 1),
        (23L, 7L, 11 * H), (24L, 8L, 12 * H), (25L, 9L, 12 * H))
      if ik == pk && t >= s && t <= e
    } yield (ivId, pId)).sorted
    assert(got === want)
    assert(got.distinct === got, "bucketing produced duplicate pairs")
  }

  test("range: invalid intervals and null-ts points drop; overlong interval fails loudly") {
    val iv = Seq((1L, 7L, Some(10L * H), Some(5L * H)), // end < start
      (2L, 7L, Option.empty[Long], Some(12L * H))) // null bound
      .toDF("iv_id", "k", "start_us", "end_us")
    val pt = Seq((20L, 7L, Option.empty[Long])).toDF("event_id", "k", "ts_us")
    assert(Temporal.rangeJoinPoints(
      iv, pt, Seq("k"), "start_us", "end_us", "ts_us", H).count() === 0)

    val big = Seq((1L, 7L, 0L, 10L * H)).toDF("iv_id", "k", "start_us", "end_us")
    val p2 = Seq((20L, 7L, 1L * H)).toDF("event_id", "k", "ts_us")
    val e = intercept[Exception] {
      Temporal.rangeJoinPoints(
        big, p2, Seq("k"), "start_us", "end_us", "ts_us", H,
        maxIntervalBuckets = 4).count()
    }
    assert(e.getMessage != null)
  }

  test("interval overlap join equals the naive predicate join, no dup pairs") {
    // spans crossing bucket boundaries, touching endpoints, nested,
    // disjoint, and cross-key
    val lIv = Seq((1L, 7L, 10 * H, 14 * H), (2L, 7L, 15 * H, 15 * H),
      (3L, 8L, 0L, 2 * H))
      .toDF("l_id", "k", "s_us", "e_us")
    val rIv = Seq((20L, 7L, 13 * H, 16 * H), (21L, 7L, 14 * H, 14 * H),
      (22L, 7L, 16 * H + 1, 20 * H), (23L, 8L, 2 * H, 3 * H), (24L, 9L, 0L, 99 * H))
      .toDF("rid", "k", "s_us", "e_us")
    val got = Temporal.rangeJoinIntervals(
      lIv, rIv, Seq("k"), "s_us", "e_us", "s_us", "e_us", bucketWidth = H)
      .select("l_id", "r_rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (for {
      (li, lk, ls, le) <- Seq((1L, 7L, 10 * H, 14 * H), (2L, 7L, 15 * H, 15 * H), (3L, 8L, 0L, 2 * H))
      (ri, rk, rs, re) <- Seq((20L, 7L, 13 * H, 16 * H), (21L, 7L, 14 * H, 14 * H),
        (22L, 7L, 16 * H + 1, 20 * H), (23L, 8L, 2 * H, 3 * H), (24L, 9L, 0L, 99 * H))
      if lk == rk && ls <= re && rs <= le
    } yield (li, ri)).sorted
    assert(got === want)
    assert(got.distinct === got, "multi-bucket overlap produced duplicate pairs")
  }

  test("property: both asof directions match the quadratic reference on random inputs") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val rowGen = for {
      key <- Gen.choose(0L, 2L)
      ts <- Gen.choose(0L, 40L)
    } yield (key, ts)
    val gen = for {
      ls <- Gen.listOfN(12, rowGen)
      rs <- Gen.listOfN(12, rowGen)
      tol <- Gen.option(Gen.choose(0L, 15L))
      fwd <- Gen.oneOf(true, false)
    } yield (ls, rs, tol, fwd)
    val prop = Prop.forAll(gen) { case (ls, rs, tol, fwd) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (100L + i, k, t, i.toDouble) }
      val out = (if (fwd)
        Temporal.asofJoinForward(
          left.toDF("event_id", "k", "ts_us"), right.toDF("event_id", "k", "ts_us", "v"),
          Seq("k"), "ts_us", "event_id", Seq("v"), tol)
      else
        Temporal.asofJoinBackward(
          left.toDF("event_id", "k", "ts_us"), right.toDF("event_id", "k", "ts_us", "v"),
          Seq("k"), "ts_us", "event_id", Seq("v"), tol))
        .select("event_id", "r_event_id")
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val want = left.map { case (id, k, t) =>
        val cands = right.filter { case (_, rk, rt, _) =>
          rk == k &&
            (if (fwd) rt >= t && tol.forall(rt - t <= _)
             else rt <= t && tol.forall(t - rt <= _))
        }
        val pick =
          if (cands.isEmpty) None
          else if (fwd) Some(cands.minBy { case (rid, _, rt, _) => (rt, rid) }._1)
          else Some(cands.maxBy { case (rid, _, rt, _) => (rt, rid) }._1)
        id -> pick
      }.toMap
      out == want
    }
    assert(check(Parameters.default.withMinSuccessfulTests(25), prop).passed)
  }

  test("property: range joins match the naive predicate joins on random inputs") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val ivGen = for {
      key <- Gen.choose(0L, 2L)
      s <- Gen.choose(0L, 40L)
      len <- Gen.choose(0L, 12L)
    } yield (key, s, s + len)
    val gen = for {
      ivs <- Gen.listOfN(8, ivGen)
      rivs <- Gen.listOfN(8, ivGen)
      pts <- Gen.listOfN(10, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 55L)))
      w <- Gen.choose(1L, 9L)
    } yield (ivs, rivs, pts, w)
    val prop = Prop.forAll(gen) { case (ivs, rivs, pts, w) =>
      val l = ivs.zipWithIndex.map { case ((k, s, e), i) => (i.toLong, k, s, e) }
      val r = rivs.zipWithIndex.map { case ((k, s, e), i) => (100L + i, k, s, e) }
      val p = pts.zipWithIndex.map { case ((k, t), i) => (200L + i, k, t) }

      val gotPts = Temporal.rangeJoinPoints(
        l.toDF("iv_id", "k", "s_us", "e_us"), p.toDF("pid", "k", "ts_us"),
        Seq("k"), "s_us", "e_us", "ts_us", bucketWidth = w, maxIntervalBuckets = 64)
        .select("iv_id", "p_pid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val wantPts = (for {
        (li, lk, ls, le) <- l; (pi, pk, t) <- p
        if lk == pk && t >= ls && t <= le
      } yield (li, pi)).sorted

      val gotIv = Temporal.rangeJoinIntervals(
        l.toDF("iv_id", "k", "s_us", "e_us"), r.toDF("rid", "k", "s_us", "e_us"),
        Seq("k"), "s_us", "e_us", "s_us", "e_us", bucketWidth = w, maxIntervalBuckets = 64)
        .select("iv_id", "r_rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val wantIv = (for {
        (li, lk, ls, le) <- l; (ri, rk, rs, re) <- r
        if lk == rk && ls <= re && rs <= le
      } yield (li, ri)).sorted

      gotPts == wantPts && gotIv == wantIv
    }
    assert(check(Parameters.default.withMinSuccessfulTests(20), prop).passed)
  }

  test("range plan: hash equi-join on (key, bucket), no nested loop") {
    val df = queries.EventQueries.e07RangeJoin(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product plan:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join:\n$p")
  }

  test("ewma: first-element seed, (ts, tiebreak) order, recursion exact") {
    val ev = Seq(
      (1L, 10L, 1L, 2.0), (1L, 20L, 3L, 8.0), (1L, 20L, 2L, 4.0),
      (2L, 5L, 1L, 7.0)).toDF("k", "ts", "id", "v")
    val out = Temporal.ewma(ev, col("k"), col("ts"), col("id"), col("v"), 0.25)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // key 1 sorts (10,1)→(20,2)→(20,3): 2.0 → 2.0·.75+4·.25 = 2.5 →
    // 2.5·.75+8·.25 = 3.875; exact in binary
    assert(out(1L) === ((3L, 8.0, 3.875)))
    // single event: EWMA is the event itself (seed, no fold steps)
    assert(out(2L) === ((1L, 7.0, 7.0)))
  }

  test("ewma: null key/ts/value rows excluded; alpha validated") {
    val ev = Seq(
      (Some(1L), Some(10L), 1L, Some(2.0)),
      (Some(1L), Some(20L), 2L, None), // null value: dropped, not poisoning
      (None, Some(30L), 3L, Some(9.0)),
      (Some(1L), None, 4L, Some(9.0)))
      .toDF("k", "ts", "id", "v")
    val out = Temporal.ewma(ev, col("k"), col("ts"), col("id"), col("v"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 1L, 2.0)))
    intercept[IllegalArgumentException] {
      Temporal.ewma(ev, col("k"), col("ts"), col("id"), col("v"), 0.0)
    }
    intercept[IllegalArgumentException] {
      Temporal.ewma(ev, col("k"), col("ts"), col("id"), col("v"), 1.5)
    }
  }
}
