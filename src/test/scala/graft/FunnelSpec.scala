package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** [[graft.operators.Funnel]] — greedy ordered-sequence completion.
  * The e08 oracle re-derives the funnel through chained conditional
  * MINs; these specs pin the greedy semantics the fold implements.
  */
class FunnelSpec extends SparkSpecBase {

  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def run(rows: Seq[(Long, Long, String)]) =
    Funnel.funnel(rows.toDF("user_id", "ts_us", "event_type"),
      col("user_id"), col("ts_us"), col("event_type"), steps)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap

  test("greedy completion, out-of-order steps, incomplete funnels") {
    val got = run(Seq(
      // u1 completes in order with noise between steps
      (1L, 10L, "a"), (1L, 15L, "x"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2: b before any a never counts; funnel stalls at a
      (2L, 5L, "b"), (2L, 10L, "a"), (2L, 11L, "c"),
      // u3: only later steps, no a → 0 completed but still reported
      (3L, 1L, "b"), (3L, 2L, "c"),
      // u4: completes twice; timestamps are the FIRST greedy path
      (4L, 1L, "a"), (4L, 2L, "b"), (4L, 3L, "c"), (4L, 4L, "a"), (4L, 5L, "b"), (4L, 6L, "c")))
    assert(got(1L) === ((3, Some(10L), Some(30L))))
    assert(got(2L) === ((1, Some(10L), None))) // c at 11 skipped: b never happened after a
    assert(got(3L) === ((0, None, None)))
    assert(got(4L) === ((3, Some(1L), Some(3L))))
  }

  test("same-timestamp events count in step order") {
    // view+click+purchase all in one micro tick still complete
    val got = run(Seq((1L, 7L, "a"), (1L, 7L, "b"), (1L, 7L, "c")))
    assert(got(1L) === ((3, Some(7L), Some(7L))))
    // but a LATER step sharing ts with an EARLIER uncompleted one
    // cannot jump the order: b@7 then a@7 → a advances (sorts by idx
    // after ts), then b@7 does NOT (it sorted before the a)
    val got2 = run(Seq((2L, 7L, "b"), (2L, 7L, "a"), (2L, 9L, "b")))
    assert(got2(2L) === ((2, Some(7L), None)))
  }

  test("deterministic under repartitioning; single-shuffle plan") {
    val rows = (1 to 300).map { i =>
      (i.toLong % 20, (i * 7 % 100).toLong, Seq("a", "b", "c", "x")(i % 4))
    }
    val df = rows.toDF("user_id", "ts_us", "event_type")
    def collectAll(d: org.apache.spark.sql.DataFrame) =
      Funnel.funnel(d, col("user_id"), col("ts_us"), col("event_type"), steps)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(collectAll(df) === collectAll(df.repartition(11)))
    val plan = Funnel.funnel(df, col("user_id"), col("ts_us"), col("event_type"), steps)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 2, // partial+final agg of ONE shuffle
      s"funnel must shuffle once on the user key only:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      "no per-step joins, no corpus window")
  }

  test("cohortRetention: anchoring, offsets, distinct users, pre-anchor activity ignored") {
    // bucket = 10 µs; u1 anchors at 12 (bucket 1), active at 12,25(b2),37(b3)
    // u2 anchors at 13 (bucket 1), active pre-anchor at 4 (IGNORED) and at 29(b2)
    // u3 never anchors → excluded entirely
    val rows = Seq(
      (1L, 12L, "signup"), (1L, 25L, "click"), (1L, 37L, "click"), (1L, 26L, "click"),
      (2L, 4L, "click"), (2L, 13L, "signup"), (2L, 29L, "click"),
      (3L, 50L, "click"))
    val got = Funnel.cohortRetention(
      rows.toDF("user_id", "ts_us", "event_type"),
      col("user_id"), col("ts_us"), col("event_type") === "signup", bucketUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (1L, 0L) -> 2L, // both u1 and u2 active in their anchor bucket
      (1L, 1L) -> 2L, // both active one bucket later (25, 29; 26 dedups)
      (1L, 2L) -> 1L)) // only u1 at 37
    intercept[IllegalArgumentException](
      Funnel.cohortRetention(rows.toDF("user_id", "ts_us", "event_type"),
        col("user_id"), col("ts_us"), col("event_type") === "signup", bucketUs = 0L))
  }

  test("property: the fold equals the chained-conditional-MIN recurrence on random streams") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // the THEOREM the e08 oracle leans on, checked directly: greedy
    // sorted-array advance ≡ T₀ = min ts(step0); Tₖ = min{ts : step k,
    // ts ≥ Tₖ₋₁} — including heavy ts ties and missing steps
    val evGen = Gen.listOfN(30, for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(1L, 12L) // small range forces ts collisions
      s <- Gen.oneOf("a", "b", "c", "x")
    } yield (u, t, s))
    def refRecurrence(evs: Seq[(Long, String)]): (Int, Option[Long], Option[Long]) = {
      val byStep = Map("a" -> 0, "b" -> 1, "c" -> 2)
      val stepEvs = evs.flatMap { case (t, s) => byStep.get(s).map(i => (t, i)) }
      val t0 = stepEvs.collect { case (t, 0) => t }.minOption
      val t1 = t0.flatMap(p => stepEvs.collect { case (t, 1) if t >= p => t }.minOption)
      val t2 = t1.flatMap(p => stepEvs.collect { case (t, 2) if t >= p => t }.minOption)
      val done = Seq(t0, t1, t2).takeWhile(_.isDefined).length
      (done, t0, t2)
    }
    val prop = Prop.forAll(evGen) { rows =>
      val got = run(rows)
      rows.groupBy(_._1).forall { case (u, evs) =>
        if (evs.forall(e => !Seq("a", "b", "c").contains(e._3)))
          !got.contains(u) // no step events → no row
        else got.get(u).contains(refRecurrence(evs.map(e => (e._2, e._3))))
      }
    }
    // each sample is a Spark job — 25 random streams with forced ts
    // collisions cover the tie/missing-step space without minutes of
    // job overhead
    assert(check(Parameters.default.withMinSuccessfulTests(25), prop).passed)
  }

  test("duplicate step names and empty steps are refused") {
    val df = Seq((1L, 1L, "a")).toDF("user_id", "ts_us", "event_type")
    intercept[IllegalArgumentException](
      Funnel.funnel(df, col("user_id"), col("ts_us"), col("event_type"), Seq("a", "a")))
    intercept[IllegalArgumentException](
      Funnel.funnel(df, col("user_id"), col("ts_us"), col("event_type"), Seq.empty))
  }
}
