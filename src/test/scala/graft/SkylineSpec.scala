package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** [[graft.operators.Skyline]] — the distributed Pareto sweep against
  * the quadratic dominance definition (the q41 oracle repeats the same
  * differential cross-engine at sf0.01); [[Skyline.prefixMax]]'s
  * cross-partition carry is pinned directly, since partition cuts are
  * exactly where a prefix scan goes wrong.
  */
class SkylineSpec extends SparkSpecBase {

  import spark.implicits._

  /** Quadratic reference: survivors of strict 2-criteria dominance
    * (minimize x, maximize y).
    */
  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { a =>
      !pts.exists(b =>
        (b._2 < a._2 && b._3 >= a._3) || (b._2 <= a._2 && b._3 > a._3))
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Long, Long)], nPart: Int = 32): Set[Long] =
    Skyline.skyline2d(pts.toDF("id", "x", "y"), col("x"), col("y"), nPart)
      .select("id").collect().map(_.getLong(0)).toSet

  test("skyline equals brute-force dominance on a crafted frontier") {
    val pts = Seq(
      (1L, 1L, 1L), (2L, 1L, 5L), (3L, 2L, 5L), (4L, 2L, 7L),
      (5L, 3L, 7L), (6L, 3L, 7L), (7L, 5L, 2L), (8L, 0L, 0L))
    val want = brute(pts)
    assert(run(pts) === want)
    // sanity on the fixture itself: (2) kills (1) and (3); (4) kills
    // (5)/(6); (8) survives as the cheapest point
    assert(want === Set(2L, 4L, 8L))
  }

  test("rows tied on BOTH criteria are mutually non-dominating") {
    val pts = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 2L, 9L))
    assert(run(pts) === Set(1L, 2L, 3L))
  }

  test("randomized differential across many partition cuts") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    for (nPart <- Seq(1, 3, 8)) {
      assert(run(pts, nPart) === brute(pts), s"nPartitions=$nPart")
    }
  }

  test("prefixMax: inclusive and strict scans with cross-partition carry") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map(i => (i, rnd.nextInt(100).toLong))
    val got = Skyline
      .prefixMax(rows.toDF("o", "v"), col("o"), col("v"), 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(_._1)
    val byOrd = rows.toMap
    got.foreach { case (o, v, le, lt) =>
      assert(v === byOrd(o))
      assert(le === (1L to o).map(byOrd).max, s"run_le at ord=$o")
      val want = if (o == 1L) None else Some((1L until o).map(byOrd).max)
      assert(lt === want, s"run_lt at ord=$o")
    }
  }

  test("skyline plan: no cartesian product and no global-sort window") {
    val pts = (1L to 50L).map(i => (i, i % 9, i % 11))
    val df = Skyline.skyline2d(pts.toDF("id", "x", "y"), col("x"), col("y"), 4)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoopJoin"),
      s"skyline degenerated to a product plan:\n$p")
  }
}
