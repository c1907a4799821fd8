package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{RelationalQueries => R}

/** Physical-plan quality gates: these queries must keep the plan shapes
  * that make them scale — pushed filters, pruned scans, broadcast dims,
  * map-side partial aggregation, TakeOrderedAndProject for top-K, and
  * whole-stage codegen in the hot path. A regression here is a
  * performance bug even while results stay correct.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("q01: shipdate filter pushes to the parquet scan; partial aggregation") {
    val f = formatted(R.q01PricingSummary(spark, sfDir))
    assert(f.contains("PushedFilters") && f.contains("l_shipdate"), "filter must reach the scan")
    assert(f.contains("HashAggregate"), "hash aggregation expected")
    assert(countOccurrences(f, "HashAggregate") >= 2, "partial+final aggregation expected")
  }

  test("q01: scan reads only referenced columns (column pruning)") {
    val f = formatted(R.q01PricingSummary(spark, sfDir))
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unused column read: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("q02: dimension joins broadcast; no dimension-side shuffle join") {
    val p = plan(R.q02RevenueByNation(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "nation/region joins must broadcast")
  }

  test("q03: top-K plans TakeOrderedAndProject, not a global sort") {
    val p = plan(R.q03TopOrders(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$p")
  }

  test("q04: anti join stays a broadcast join, no cartesian") {
    // pre-AQE-execution plan: assert join strategy only (codegen stages
    // only materialize in the final adaptive plan)
    val p = plan(R.q04CustomersWithoutOrders(spark, sfDir))
    assert(p.contains("LeftAnti"), "anti join expected")
    assert(p.contains("BroadcastHashJoin"), "small side should broadcast")
    assert(!p.contains("Cartesian"), "no cartesian product")
  }

  test("rolling_hash participates in whole-stage codegen (no fallback)") {
    val df = Tables.t(spark, sfDir, "documents")
      .select(functions.Text.rollingHash(col("text")).as("h"))
    val p = plan(df)
    // `*(n)` marks a WholeStageCodegen stage; the Project carrying
    // rolling_hash must sit inside one (no CodegenFallback).
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("rolling_hash")),
      s"expression fell out of codegen:\n$p")
  }

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)
}
