package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

/** [[graft.operators.LangModel]] — corpus-fit bigram LM scoring. The
  * t09 oracle replays the model cross-engine; these specs verify the
  * arithmetic against hand-computed counts and pin the signal
  * direction (typical text over gibberish) the score exists for.
  */
class LangModelSpec extends SparkSpecBase {

  import spark.implicits._

  private def micro(x: Double): Long = math.round(math.log(x) * 1000000.0)

  test("hand-computed counts, smoothing, and micro-rounded sums") {
    val df = Seq(
      (1L, "a b a b"), (2L, "A  b\tc"), (3L, "z"), (4L, "   "), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // normalized toks: d1=[a,b,a,b] d2=[a,b,c] d3=[z]; bigrams:
    // c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; c1(a)=3 c1(b)=2; V={a,b,c,z}=4
    val out = LangModel.bigramScore(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap

    val ab = micro((3.0 + 1.0) / (3.0 + 4.0)) // ln(4/7) micro
    val ba = micro((1.0 + 1.0) / (2.0 + 4.0)) // ln(2/6)
    val bc = micro((1.0 + 1.0) / (2.0 + 4.0))
    val d1 = 2 * ab + ba
    val d2 = ab + bc
    assert(out(1L) === ((3L, d1, Some((d1.toDouble / 1000000.0) / 3.0))))
    assert(out(2L) === ((2L, d2, Some((d2.toDouble / 1000000.0) / 2.0))))
    assert(out(3L) === ((0L, 0L, None))) // single token: no bigrams
    assert(out(4L) === ((0L, 0L, None))) // whitespace-only
    assert(out(5L) === ((0L, 0L, None))) // null text
  }

  test("typical corpus text outscores token-salad gibberish") {
    val typical = (1 to 40).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val rnd = new scala.util.Random(11)
    val gibberish = (41 to 44).map(i =>
      (i.toLong, Seq.fill(9)(s"tok${rnd.nextInt(100000)}").mkString(" ")))
    val out = LangModel.bigramScore(
      (typical ++ gibberish).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val typMean = typical.map(t => out(t._1)).sum / typical.size
    val gibMean = gibberish.map(t => out(t._1)).sum / gibberish.size
    // mean_ll is in NATS now — a 1-nat margin is a real e-fold
    // perplexity separation, not a vacuous micro-unit epsilon
    assert(typMean > gibMean + 1.0,
      s"LM failed to separate typical ($typMean) from gibberish ($gibMean)")
  }

  test("fit/scoreWith: persisted model ≡ one-shot on the fit corpus; smoothing handles unseen text") {
    val corpus = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_lm_model").toString + "/m"
    LangModel.fit(corpus, col("doc_id"), col("text"), path)
    // the persisted lakes hold exactly the hand-computed model
    val c2 = spark.read.parquet(s"$path/bigrams").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(c2 == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L), s"$c2")
    assert(spark.read.parquet(s"$path/stats").head.getLong(0) == 4L) // V = {a,b,c,z}
    // scoring the FIT corpus through the model is bit-identical to the
    // one-shot form (this is also what lets t10 reuse t09's oracle)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(rows(LangModel.scoreWith(spark, path, corpus, col("doc_id"), col("text"))) ==
      rows(LangModel.bigramScore(corpus, col("doc_id"), col("text"))))
    // NEW text with an unseen bigram: add-one smoothing defines it as
    // (0+1)/(c1+V); an unseen FIRST word as (0+1)/(0+V)
    val fresh = Seq((10L, "a z"), (11L, "q q")).toDF("doc_id", "text")
    val out = LangModel.scoreWith(spark, path, fresh, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def micro2(x: Double): Long = math.round(math.log(x) * 1000000.0)
    assert(out(10L) == micro2(1.0 / (3.0 + 4.0)), s"unseen bigram (a,z): ${out(10L)}")
    assert(out(11L) == micro2(1.0 / (0.0 + 4.0)), s"unseen unigram (q): ${out(11L)}")
    // crash ordering: a model dir without its stats sidecar refuses
    // loudly instead of serving a half-written model
    val half = java.nio.file.Files.createTempDirectory("graft_lm_half").toString + "/m"
    spark.read.parquet(s"$path/bigrams").write.parquet(s"$half/bigrams")
    spark.read.parquet(s"$path/unigrams").write.parquet(s"$half/unigrams")
    intercept[Exception](
      LangModel.scoreWith(spark, half, fresh, col("doc_id"), col("text")).collect())
  }

  test("broadcast-capacity gate refuses loudly; pruneModel shrinks and scores as unseen") {
    val corpus = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_lm_cap").toString + "/m"
    LangModel.fit(corpus, col("doc_id"), col("text"), path)
    // model: (a,b)->3, (b,a)->1, (b,c)->1; a tiny maxBroadcastRows
    // simulates a vocabulary past broadcast capacity — the refusal
    // must name the remedy verb, before any broadcast is attempted
    val e = intercept[IllegalArgumentException](
      LangModel.scoreWith(spark, path, corpus, col("doc_id"), col("text"),
        maxBroadcastRows = 2L))
    assert(e.getMessage.contains("pruneModel"), e.getMessage)
    // prune to c2 >= 2: only (a,b) survives; unigrams + V untouched
    val (before, after) = LangModel.pruneModel(spark, path, minCount = 2)
    assert((before, after) == (3L, 1L))
    assert(spark.read.parquet(s"$path/bigrams").count() == 1)
    assert(spark.read.parquet(s"$path/unigrams").count() == 2) // a, b keep FULL counts
    assert(spark.read.parquet(s"$path/stats").head.getLong(0) == 4L)
    // under the same tiny gate the pruned model now serves
    val out = LangModel.scoreWith(spark, path, corpus, col("doc_id"), col("text"),
      maxBroadcastRows = 2L)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def micro2(x: Double): Long = math.round(math.log(x) * 1000000.0)
    // doc 1 (a b a b): surviving (a,b) keeps the UNPRUNED arithmetic —
    // c2(a,b)=3, c1(a)=3 (full), V=4 → ln((3+1)/(3+4)) per occurrence,
    // ×2; pruned (b,a) scores as unseen: ln((0+1)/(c1(b)=2+4))
    val ab = micro2((3.0 + 1.0) / (3.0 + 4.0))
    val ba = micro2(1.0 / (2.0 + 4.0))
    assert(out(1L) == 2 * ab + ba, s"doc1 ${out(1L)} != ${2 * ab + ba}")
    // doc 2 (a b c): (a,b) survives, (b,c) pruned → unseen
    val bc = micro2(1.0 / (2.0 + 4.0))
    assert(out(2L) == ab + bc, s"doc2 ${out(2L)} != ${ab + bc}")
    // a crashed prune swap parks the original — the next prune refuses
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/bigrams"),
      new org.apache.hadoop.fs.Path(s"$path/bigrams__prune_old")))
    val e2 = intercept[IllegalArgumentException](
      LangModel.pruneModel(spark, path, minCount = 2))
    assert(e2.getMessage.contains("crashed mid-swap"), e2.getMessage)
  }
}
