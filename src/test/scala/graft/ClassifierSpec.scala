package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** [[graft.operators.Classifier]] — hashed-feature logistic regression.
  * The t12 oracle replays scoring from the dumped model cross-engine;
  * these specs pin the FIT itself (hand-replayed gradient steps), the
  * signal (separable classes separate), determinism, persistence, and
  * the scale-shaped scoring plan.
  */
class ClassifierSpec extends SparkSpecBase {

  import spark.implicits._

  private val B = 64

  private def bucketOf(tok: String): Int = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(md5.take(15), 16) % B).toInt
  }

  /** Scalar reference of the operator's full-batch GD: same feature
    * scaling, same 1e-12 fixed-point per-doc gradient quantization
    * (the order-independence contract — Long sums are exact, so doc
    * order is irrelevant here and in the operator alike).
    */
  private def refFit(
      sample: Seq[(String, Double, Seq[String])],
      iters: Int, lr: Double, l2: Double): (Long, Array[Long]) = {
    val S = 1e12
    val feats = sample.map { case (_, y, toks) =>
      val bks = toks.map(bucketOf).sorted
      val runs = bks.distinct.map(b => (b, bks.count(_ == b).toLong))
      (y, bks.length.toLong, runs)
    }
    val w = new Array[Double](B); var b = 0.0
    for (_ <- 0 until iters) {
      val gw = new Array[Long](B); var gb = 0L
      feats.foreach { case (y, n, runs) =>
        var m = 0.0
        runs.foreach { case (bk, c) => m += w(bk) * c }
        val margin = b + (if (n > 0) m / n else 0.0)
        val err = 1.0 / (1.0 + math.exp(-margin)) - y
        gb += math.round(err * S)
        runs.foreach { case (bk, c) => gw(bk) += math.round(err * c / n * S) }
      }
      b -= lr * (gb.toDouble / S) / feats.length
      for (k <- 0 until B) w(k) -= lr * ((gw(k).toDouble / S) / feats.length + l2 * w(k))
    }
    (math.round(b * 1000000.0), w.map(x => math.round(x * 1000000.0)))
  }

  test("fit replays the hand-specified gradient steps bit-for-bit") {
    val sample = Seq(
      ("1", 1.0, Seq("good", "clean", "good")),
      ("2", 1.0, Seq("clean", "prose")),
      ("3", 0.0, Seq("spam", "spam", "junk")),
      ("4", 0.0, Seq("junk", "noise", "spam")))
    val df = sample.map { case (id, y, toks) => (id, y, toks.mkString(" ")) }
      .toDF("doc_id", "label", "text")
    val m = Classifier.fit(df, col("doc_id"), col("text"), col("label"),
      buckets = B, iters = 7, lr = 0.5, l2 = 1e-3)
    val (refBias, refW) = refFit(sample, iters = 7, lr = 0.5, l2 = 1e-3)
    assert(m.biasMicro === refBias)
    assert(m.weightsMicro.toSeq === refW.toSeq)
  }

  test("separable classes separate; scoring matches the micro contract") {
    val pos = (1 to 30).map(i => (i.toLong, 1.0, "alpha bravo charlie delta echo"))
    val neg = (31 to 60).map(i => (i.toLong, 0.0, "zulu yankee xray whiskey victor"))
    val df = (pos ++ neg).toDF("doc_id", "label", "text")
    val m = Classifier.fit(df, col("doc_id"), col("text"), col("label"),
      buckets = 256, iters = 300, lr = 1.0, l2 = 1e-4)
    val scored = Classifier.scoreWith(spark, m, df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(pos.forall(p => scored(p._1) > 500000L), "positives must score > 0.5")
    assert(neg.forall(n => scored(n._1) < 500000L), "negatives must score < 0.5")
  }

  test("fit and scores are bit-identical under repartitioning") {
    val df = (1 to 9).map(i =>
      (i.toLong, (i % 2).toDouble, s"tok${i % 5} tok${i % 3} filler$i"))
      .toDF("doc_id", "label", "text")
    def model(d: org.apache.spark.sql.DataFrame) =
      Classifier.fit(d, col("doc_id"), col("text"), col("label"),
        buckets = B, iters = 25, lr = 0.7, l2 = 1e-3)
    val a = model(df)
    val b = model(df.repartition(7))
    assert(a.biasMicro === b.biasMicro)
    assert(a.weightsMicro.toSeq === b.weightsMicro.toSeq)
  }

  test("treeAggregate path is bit-identical to the driver path (the fixed-point contract)") {
    // big enough that partitions genuinely partial-aggregate, with
    // repeated tokens (uc > 1 pairs) and class overlap so gradients
    // stay non-trivial through the iterations
    val df = (1 to 400).map(i =>
      (i.toLong, (i % 2).toDouble, s"w${i % 11} w${i % 7} w${i % 11} noise${i % 29}"))
      .toDF("doc_id", "label", "text").repartition(13)
    def model(distributeOver: Long) =
      Classifier.fit(df, col("doc_id"), col("text"), col("label"),
        buckets = 128, iters = 30, lr = 0.8, l2 = 1e-3,
        distributeOver = distributeOver)
    val driver = model(Long.MaxValue) // forces the collect path
    val dist = model(0L) // forces the per-iteration treeAggregate path
    assert(driver.biasMicro === dist.biasMicro)
    assert(driver.weightsMicro.toSeq === dist.weightsMicro.toSeq)
  }

  test("token-less documents score at the intercept; nulls survive scoring") {
    val fitDf = Seq((1L, 1.0, "a b"), (2L, 0.0, "c d")).toDF("doc_id", "label", "text")
    val m = Classifier.fit(fitDf, col("doc_id"), col("text"), col("label"),
      buckets = B, iters = 10, lr = 0.5, l2 = 0.0)
    val out = Classifier.scoreWith(spark, m,
      Seq((1L, "a b"), (2L, "   "), (3L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val atIntercept = math.round(
      1000000.0 / (1.0 + math.exp(-(m.biasMicro.toDouble / 1000000.0))))
    assert(out(2L) === ((0L, 0L, atIntercept)))
    assert(out(3L) === ((0L, 0L, atIntercept)))
    assert(out(1L)._1 === 2L)
  }

  test("persistence round-trip; half-written lake refused loudly") {
    val df = Seq((1L, 1.0, "a b"), (2L, 0.0, "c d")).toDF("doc_id", "label", "text")
    val m = Classifier.fit(df, col("doc_id"), col("text"), col("label"),
      buckets = B, iters = 10, lr = 0.5, l2 = 1e-3)
    val path = java.nio.file.Files.createTempDirectory("graft_clf").toString + "/m"
    Classifier.saveModel(spark, m, path)
    val loaded = Classifier.loadModel(spark, path)
    assert(loaded.buckets === m.buckets)
    assert(loaded.biasMicro === m.biasMicro)
    assert(loaded.weightsMicro.toSeq === m.weightsMicro.toSeq)
    // a lake missing the bias row (half-written) must refuse
    val half = path + "_half"
    spark.read.parquet(path).filter(col("kind") =!= "bias")
      .write.mode("overwrite").parquet(half)
    val e = intercept[IllegalArgumentException](Classifier.loadModel(spark, half))
    assert(e.getMessage.contains("half-written"))
  }

  test("plan shape: scoring is a broadcast join, never a token-keyed shuffle join") {
    val df = (1 to 50).map(i => (i.toLong, (i % 2).toDouble, s"t${i % 7} u$i"))
      .toDF("doc_id", "label", "text")
    val m = Classifier.fit(df, col("doc_id"), col("text"), col("label"),
      buckets = 128, iters = 5, lr = 0.5, l2 = 1e-3)
    val plan = Classifier.scoreWith(spark, m, df, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "weight join must broadcast (the corpus never repartitions by token)")
  }
}
