package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** [[graft.operators.Bpe]] — trainable BPE. The t11 oracle proves
  * reconstruction/vocab-closure cross-engine; these specs pin the exact
  * merge sequence and greedy-apply order on the classic Sennrich
  * frequency table, hand-derived.
  */
class BpeSpec extends SparkSpecBase {

  import spark.implicits._

  // Sennrich et al.'s worked example: low×5 lower×2 newest×6 widest×3.
  // Hand-derived merges under (max count, then smallest pair):
  //   1. (e,s)    count 9 (ties (s,t),(t,</w>) lose lexicographically)
  //   2. (es,t)   count 9
  //   3. (est,</w>) count 9
  //   4. (l,o)    count 7 (tie (o,w) loses)
  //   5. (lo,w)   count 7
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("fit reproduces the hand-derived Sennrich merge sequence") {
    val m = Bpe.fitFromWordCounts(sennrich, numMerges = 5)
    assert(m.merges == IndexedSeq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("greedy apply follows merge ranks: lowest/newest segment as derived") {
    val m = Bpe.fitFromWordCounts(sennrich, numMerges = 5)
    assert(Bpe.encodeWord("lowest", m.ranks).toSeq == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("newest", m.ranks).toSeq == Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("low", m.ranks).toSeq == Seq("low", "</w>"))
    // unseen characters stay singletons
    assert(Bpe.encodeWord("xyz", m.ranks).toSeq == Seq("x", "y", "z", "</w>"))
  }

  test("encode partitions the text exactly: tokens concatenate back to words + markers") {
    val df = Seq(
      (1L, "the lowest value row"),
      (2L, "  Newest   LOWER\ttable "), // normalization folds case/space
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val m = Bpe.fitFromWordCounts(sennrich, numMerges = 5)
    val out = Bpe.encode(df, col("text"), m).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
    val words = Map(
      1L -> Seq("the", "lowest", "value", "row"),
      2L -> Seq("newest", "lower", "table"))
    for ((id, ws) <- words) {
      assert(out(id).mkString("") == ws.map(_ + "</w>").mkString(""),
        s"doc $id reconstruction")
    }
    assert(out(3L).isEmpty && out(4L).isEmpty)
    val counts = Bpe.tokenCount(df, col("text"), m).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(counts(1L) == out(1L).size && counts(3L) == 0 && counts(4L) == 0)
  }

  test("fit is a pure function of the corpus: partitioning never changes a merge") {
    val docs = (0 until 60).map(i =>
      (i.toLong, s"alpha beta gamma${i % 5} delta epsilon alpha beta"))
      .toDF("doc_id", "text")
    val a = Bpe.fit(docs.repartition(7), col("text"), numMerges = 30)
    val b = Bpe.fit(docs.repartition(2), col("text"), numMerges = 30)
    assert(a.merges == b.merges)
  }

  test("persisted merge table round-trips; half-written lakes are refused") {
    val m = Bpe.fitFromWordCounts(sennrich, numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_model").toString
    Bpe.saveModel(spark, m, dir)
    val l = Bpe.loadModel(spark, dir)
    assert(l.merges == m.merges)
    // drop a middle rank → refusal
    val dir2 = java.nio.file.Files.createTempDirectory("graft_bpe_bad").toString
    spark.read.parquet(dir).filter(col("rank") =!= 2)
      .write.mode("overwrite").parquet(dir2)
    val e = intercept[IllegalArgumentException](Bpe.loadModel(spark, dir2))
    assert(e.getMessage.contains("contiguous"), e.getMessage)
  }

  test("a corpus with no repeating pair refuses to fit rather than ship an empty model") {
    intercept[IllegalArgumentException](
      Bpe.fitFromWordCounts(Seq(("ab", 1L)), numMerges = 5))
  }

  test("numMerges caps the table; minPairCount stops the long tail") {
    val words = Seq(("aaaa", 10L), ("bb", 1L))
    val m = Bpe.fitFromWordCounts(words, numMerges = 100, minPairCount = 5L)
    // (a,a) merges at 20 then (aa,aa) at 10 then (aaaa,</w>) at 10,
    // then every remaining pair (incl. anything from bb×1) is < 5
    assert(m.merges.forall { case (a, b) => (a + b).forall(c => c == 'a' || c == '<' || c == '/' || c == 'w' || c == '>') })
    assert(m.merges.length < 100)
  }
}
