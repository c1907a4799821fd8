package graft

import org.apache.spark.sql.functions._

import graft.operators.Mmr

/** [[graft.operators.Mmr]] — greedy MMR diversification. The r07
  * oracle replays candidate sets, pairwise sims, and all selection
  * steps cross-engine; these specs pin the semantics on crafted
  * fixtures where the right answer is readable by eye.
  */
class MmrSpec extends SparkSpecBase {

  import spark.implicits._

  // 4-dim fixtures: a1/a2 near-duplicates (sim ≈ 1), b orthogonal
  private def cands(rows: (Long, Long, Double, Array[Float])*) =
    rows.toDF("q_id", "b_id", "rel", "emb")

  private val a1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
  private val a2 = Array(0.999f, 0.01f, 0.0f, 0.0f)
  private val b = Array(0.0f, 1.0f, 0.0f, 0.0f)

  test("rank 1 is the plain relevance argmax; near-dup is displaced by a diverse pick") {
    val df = cands((7L, 1L, 0.99, a1), (7L, 2L, 0.98, a2), (7L, 3L, 0.50, b))
    // top-2 by rel alone would be {1, 2}; at λ=0.5 the a2 near-dup's
    // penalty (~0.5·1.0) sinks it below the orthogonal b
    val out = Mmr.diversify(df, k = 2, lambda = 0.5)
      .orderBy("rank").select("b_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 3L))
  }

  test("λ=1 reduces to plain relevance ranking") {
    val df = cands((7L, 1L, 0.99, a1), (7L, 2L, 0.98, a2), (7L, 3L, 0.50, b))
    val out = Mmr.diversify(df, k = 3, lambda = 1.0)
      .orderBy("rank").select("b_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L, 3L))
  }

  test("score is the marginal at selection time and ties break on smaller id") {
    val df = cands((7L, 5L, 0.8, a1), (7L, 4L, 0.8, b)) // equal rel, orthogonal
    val out = Mmr.diversify(df, k = 2, lambda = 0.7)
      .orderBy("rank").select("b_id", "score").as[(Long, Double)].collect()
    assert(out(0)._1 === 4L) // tie at rank 1 -> smaller id
    assert(out(0)._2 === 0.7 * 0.8 - (1.0 - 0.7) * 0.0)
    assert(out(1)._1 === 5L)
    assert(out(1)._2 === 0.7 * 0.8 - (1.0 - 0.7) * 0.0) // orthogonal: zero penalty
  }

  test("anti-correlated candidate keeps its negative max-sim as a diversity bonus") {
    val anti = Array(-1.0f, 0.0f, 0.0f, 0.0f) // cosine -1 vs a1
    val df = cands((7L, 1L, 0.9, a1), (7L, 2L, 0.1, anti))
    val out = Mmr.diversify(df, k = 2, lambda = 0.7)
      .filter(col("rank") === 2).select("score").as[Double].head()
    // pen = -1 (NOT clamped to 0): score = .7*.1 - .3*(-1) = .37
    assert(out === 0.7 * 0.1 - (1.0 - 0.7) * -1.0)
  }

  test("NaN relevance and null/NaN-element embeddings are excluded, not crashed on") {
    val df = Seq(
      (7L, 1L, 0.9, Seq[Option[Float]](Some(1.0f), Some(0.0f))),
      (7L, 2L, Double.NaN, Seq[Option[Float]](Some(0.0f), Some(1.0f))),
      (7L, 3L, 0.5, Seq[Option[Float]](Some(0.5f), None)),
      // a NaN ELEMENT poisons every pairwise csim: its maxSim never
      // leaves -Infinity, which would hand it a +Infinity marginal at
      // rank 2 (or the best=-1 crash at λ=1)
      (7L, 4L, 0.4, Seq[Option[Float]](Some(Float.NaN), Some(1.0f))))
      .toDF("q_id", "b_id", "rel", "emb")
    // k exceeds the valid candidates: without the gates the greedy
    // would select garbage, index -1, or NPE mid-task
    val out = Mmr.diversify(df, k = 3, lambda = 0.7)
      .orderBy("rank").select("b_id").as[Long].collect().toSeq
    assert(out === Seq(1L))
    val out1 = Mmr.diversify(df, k = 2, lambda = 1.0)
      .orderBy("rank").select("b_id").as[Long].collect().toSeq
    assert(out1 === Seq(1L)) // λ=1 with a NaN-element candidate: no crash
  }

  test("groups smaller than k return what they have; per-query isolation") {
    val df = cands(
      (1L, 10L, 0.9, a1),
      (2L, 20L, 0.9, a1), (2L, 21L, 0.8, a2), (2L, 22L, 0.7, b))
    val out = Mmr.diversify(df, k = 3, lambda = 0.7)
      .groupBy("q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 3L))
  }

  test("r07 smoke at spec scale: k rows per query, ranks consecutive") {
    val df = queries.SearchQueries.r07MmrDiversify(spark, sfDir)
    val perQ = df.groupBy("q_id").agg(
      count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    assert(perQ.nonEmpty)
    perQ.foreach { r =>
      assert(r.getLong(1) === 5L && r.getInt(2) === 5 && r.getInt(3) === 1)
    }
  }
}
