package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** [[graft.operators.Sketches]] — KMV distinct-count. The q22 oracle
  * replays the sketch cross-engine; these specs pin the statistical
  * contract (exactness under k, error bounds over k, duplicate
  * insensitivity, mergeability) that the bit-replay alone can't
  * express.
  */
class SketchesSpec extends SparkSpecBase {

  import spark.implicits._

  test("groups under k distinct values are EXACT; duplicates don't occupy slots") {
    val df = (Seq.fill(50)("a" -> 1) ++ (1 to 30).map("b" -> _) ++
      Seq.fill(10)("b" -> 7)) // b: 30 distinct, value 7 heavily duplicated
      .toDF("key", "v")
    val out = Sketches.kmvDistinctByKey(df, col("key"), col("v"), k = 64)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(3))).toMap
    assert(out("a") === ((1, 1.0)))
    assert(out("b") === ((30, 30.0)))
  }

  test("estimate lands within 3 standard errors at k=256 over 10k distinct values") {
    val n = 10000
    val df = (1 to n).map(i => ("g", s"val_$i")).toDF("key", "v")
    val est = Sketches.kmvDistinctByKey(df, col("key"), col("v"), k = 256)
      .select("est_distinct").head.getDouble(0)
    val se = 1.0 / math.sqrt(256 - 2)
    assert(math.abs(est - n) / n <= 3 * se,
      s"KMV estimate $est vs $n exceeds 3x standard error (${3 * se})")
  }

  test("sketch is mergeable: bottom-k of unioned halves equals whole-corpus sketch") {
    val all = (1 to 5000).map(i => ("g", s"val_$i"))
    val whole = Sketches.kmvDistinctByKey(
      all.toDF("key", "v"), col("key"), col("v"), k = 128)
      .select("kth_hash", "est_distinct").head()
    // merge = union the halves' bottom-k hash sets, re-take the bottom k.
    // (The halves OVERLAP — a real multi-shard merge must dedup, which
    // the distinct() inside the operator models.)
    val h1 = all.take(3000)
    val h2 = all.drop(2000)
    val merged = Sketches.kmvDistinctByKey(
      (h1 ++ h2).toDF("key", "v"), col("key"), col("v"), k = 128)
      .select("kth_hash", "est_distinct").head()
    assert(merged === whole)
  }

  test("nulls are excluded like COUNT(DISTINCT)") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(2)))
      .toDF("key", "v")
    val out = Sketches.kmvDistinctByKey(df, col("key"), col("v"), k = 8)
      .select("n_kept").head.getInt(0)
    assert(out === 2)
  }

  test("k below 3 is rejected") {
    val df = Seq(("a", 1)).toDF("key", "v")
    intercept[IllegalArgumentException] {
      Sketches.kmvDistinctByKey(df, col("key"), col("v"), k = 2)
    }
  }
}
