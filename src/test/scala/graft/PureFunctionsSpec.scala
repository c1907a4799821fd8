package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Glob

/** Pure-function properties (no SparkSession needed). */
class PureFunctionsSpec extends AnyFunSuite {

  test("globToRegex translates wildcards") {
    assert(Glob.globToRegex("*.csv") == "^.*\\.csv$")
    assert(Glob.globToRegex("data_?.json") == "^data_.\\.json$")
    assert("report.csv".matches(Glob.globToRegex("*.csv")))
    assert(!"report.csv.bak".matches(Glob.globToRegex("*.csv")))
    assert("a/b/c.csv".matches(Glob.globToRegex("*.csv"))) // fnmatch: * crosses separators
  }

  test("globToRegex escapes regex metacharacters") {
    for (meta <- Seq("a+b", "a(b)c", "a[b", "x{2}", "a|b", "a^b$")) {
      assert(meta.matches(Glob.globToRegex(meta)), s"glob '$meta' must match itself")
    }
  }

  test("globToLike translates and escapes") {
    assert(Glob.globToLike("*.csv") == "%.csv")
    assert(Glob.globToLike("a?c") == "a_c")
    assert(Glob.globToLike("100%_done*") == "100\\%\\_done%")
  }

  test("property: literal globs (no wildcards) match themselves") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf("./-_+()[]{}^$|\\".toSeq)))
      .map(_.mkString)
    val prop = Prop.forAll(gen) { s => s.matches(Glob.globToRegex(s)) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash coefficients are distinct and in range") {
    val cs = graft.functions.Hashing.minhashCoeffs(128)
    assert(cs.distinct.size == 128)
    assert(cs.forall { case (a, b) =>
      a > 0 && a < graft.functions.Hashing.MinHashP && b >= 0 && b < graft.functions.Hashing.MinHashP
    })
  }
}
