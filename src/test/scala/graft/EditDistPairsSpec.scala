package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** [[graft.operators.Dedup.editDistancePairs]] — Pass-Join blocking
  * must be pigeonhole-lossless: every spec here is a differential
  * against the brute-force all-pairs `levenshtein` join (the d13
  * oracle repeats the same differential cross-engine at sf0.01).
  * Fixtures target the places the segment-window algebra can silently
  * lose pairs: front insertions (maximal shift), boundary distances
  * (exactly k, k+1), uneven segment splits (len % (k+1) ≠ 0), and
  * length bands at the ±k edge.
  */
class EditDistPairsSpec extends SparkSpecBase {

  import spark.implicits._

  private def brute(keys: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ok = keys.filter(_._2.length >= k + 1)
    (for {
      (ia, ka) <- ok; (ib, kb) <- ok
      if ia < ib
      d = lev(ka, kb)
      if d <= k
    } yield (ia, ib, d)).toSet
  }

  private def run(keys: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    Dedup.scoped {
      Dedup.editDistancePairs(
        keys.toDF("doc_id", "key"), col("doc_id"), col("key"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }

  test("crafted edits: subs, front/back indels, boundary k and k+1") {
    val keys = Seq(
      1L -> "the quick brown fox",
      2L -> "the quick brown fox",   // dist 0
      3L -> "the quick brown fax",   // 1 substitution
      4L -> "xthe quick brown fox",  // 1 insertion at the FRONT (max shift)
      5L -> "he quick brown fo",     // 2 deletions at both ends
      6L -> "the quick brown foxes", // 2 insertions at the end
      7L -> "a completely different key",
      8L -> "zzzzzzzzzz",
      9L -> "thequickbrownfox")      // 3 deletions: must NOT pair with 1
    val got = run(keys, 2)
    assert(got === brute(keys, 2))
    assert(got.contains((1L, 2L, 0)))
    assert(got.contains((1L, 4L, 1)))
    assert(got.contains((1L, 5L, 2)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 9L))
  }

  test("keys shorter than k+1 are excluded; maxDist bounds validated") {
    val keys = Seq(1L -> "ab", 2L -> "ab", 3L -> "abcdefgh", 4L -> "abcdefgh")
    // len-2 keys can't form k+1=3 non-empty segments: silently excluded
    assert(run(keys, 2) === Set((3L, 4L, 0)))
    val df = keys.toDF("doc_id", "key")
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, col("doc_id"), col("key"), 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, col("doc_id"), col("key"), 9)
    }
  }

  test("randomized small-alphabet differential (dense near-pairs)") {
    val rnd = new scala.util.Random(42)
    val keys = (1L to 70L).map { i =>
      val len = 8 + rnd.nextInt(7)
      i -> Array.fill(len)(if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    for (k <- Seq(1, 2, 3)) {
      assert(run(keys, k) === brute(keys, k), s"maxDist=$k")
    }
  }
}
