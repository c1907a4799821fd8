package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract registry itself ([[SparkEntry]]): the repo's
  * standing claim is that the rows-only residue is ZERO — every
  * operator claimed done has BOTH a `queries` entry and an `oracleSql`
  * entry, so the driver hash-compares everything. Prose in STATUS.md
  * asserted this; this spec PINS it, so a future rows-only addition is
  * a conscious, visible choice (an explicit exemption added here with
  * its reason) rather than silent drift. Pure map arithmetic — no
  * Spark session.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries consciously exempted from the oracle requirement. EMPTY
    * by policy: probabilistic-recall operators have so far all found a
    * deterministic replay form (self-verifying cosine oracles, bit-
    * replayable sketches). Adding a name here must come with a comment
    * saying why no SQL-expressible oracle form exists.
    */
  private val rowsOnlyExempt: Set[String] = Set.empty

  test("every SparkEntry.queries key carries an oracle (rows-only residue pinned at zero)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyExempt
    assert(missing.isEmpty,
      s"queries without an oracleSql entry: ${missing.toSeq.sorted.mkString(", ")} -- " +
        "add the oracle, or exempt it in RegistrySpec with a reason")
  }

  test("no orphan oracles (a renamed/deleted query would leave its oracle silently testing nothing)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("exemptions only name live queries (a stale exemption hides nothing but misleads)") {
    val stale = rowsOnlyExempt -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale exemptions: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
