package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** [[graft.operators.Dsir]] — importance-resampling data selection.
  * The c14 oracle replays the whole pipeline cross-engine; these specs
  * verify the arithmetic against a hand-computed model, pin the
  * selection BIAS the operator exists for, and assert the scale-shaped
  * plan (broadcast count joins, TakeOrderedAndProject top-k).
  */
class DsirSpec extends SparkSpecBase {

  import spark.implicits._

  private val B = 64

  /** Reference-implementation of the per-token micro term. */
  private def term(ct: Long, cr: Long, nt: Long, nr: Long): Long =
    math.round(math.log(
      ((ct.toDouble + 1.0) * (nr + B).toDouble) /
        ((cr.toDouble + 1.0) * (nt + B).toDouble)) * 1000000.0)

  private def bucketOf(tok: String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md5.take(15), 16) % B
  }

  test("hand-computed counts, smoothing, per-doc micro sums") {
    val target = Seq((1L, "a a b")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "a a b"), (2L, "c c"), (3L, "a c"),
      (4L, "   "), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")

    // hand model: target tokens = {a,a,b}, raw tokens = {a,a,b,c,c,a,c}
    val tgtToks = Seq("a", "a", "b")
    val rawToks = Seq("a", "a", "b", "c", "c", "a", "c")
    val expTc = tgtToks.groupMapReduce(bucketOf)(_ => 1L)(_ + _)
    val expRc = rawToks.groupMapReduce(bucketOf)(_ => 1L)(_ + _)

    val tc = Dsir.hashedCounts(target, col("text"), B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rc = Dsir.hashedCounts(raw, col("text"), B)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc === expTc)
    assert(rc === expRc)

    val w = Dsir.logWeights(raw, col("doc_id"), col("text"),
      Dsir.hashedCounts(target, col("text"), B),
      Dsir.hashedCounts(raw, col("text"), B), B)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

    val (nt, nr) = (tgtToks.size.toLong, rawToks.size.toLong)
    def docSum(toks: Seq[String]): Long = toks.map { t =>
      val b = bucketOf(t)
      term(expTc.getOrElse(b, 0L), expRc(b), nt, nr)
    }.sum
    assert(w(1L) === ((3L, docSum(Seq("a", "a", "b")))))
    assert(w(2L) === ((2L, docSum(Seq("c", "c")))))
    assert(w(3L) === ((2L, docSum(Seq("a", "c")))))
    assert(w(4L) === ((0L, 0L))) // whitespace-only: neutral weight
    assert(w(5L) === ((0L, 0L))) // null text: neutral weight
  }

  test("selection bias: target-like documents dominate the resample") {
    // target speaks {alpha..golf}; raw is 30 target-like + 30 alien docs.
    // Docs carry 28 tokens each: the log-weight is a SUM over tokens, so
    // document length is what separates signal from the ~1.3-nat Gumbel
    // noise (7-token docs sit inside the noise — the operator working as
    // specified, not a bug)
    val tgtToks = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf")
    val target = (1 to 20).map(i =>
      (i.toLong, Seq.fill(4)(tgtToks.drop(i % 3)).flatten.mkString(" "))).toDF("doc_id", "text")
    val raw = ((1 to 30).map(i => (i.toLong, Seq.fill(4)(tgtToks).flatten.mkString(" "))) ++
      (31 to 60).map(i =>
        (i.toLong, Seq.fill(4)(Seq(s"zz$i", s"yy$i", s"xx$i", s"ww$i", s"vv$i", s"uu$i", s"tt$i")).flatten.mkString(" "))))
      .toDF("doc_id", "text")
    val sel = Dsir.select(raw, col("doc_id"), col("text"),
      target, col("text"), buckets = 4096, k = 20, salt = "s1")
      .collect().map(_.getLong(0)).toSet
    val targetLike = sel.count(_ <= 30)
    assert(targetLike >= 18,
      s"expected the resample to be dominated by target-like docs, got $targetLike/20")
  }

  test("deterministic under repartitioning; salt draws an independent sample") {
    val target = (1 to 10).map(i => (i.toLong, s"t$i common")).toDF("doc_id", "text")
    val raw = (1 to 200).map(i => (i.toLong, s"t${i % 17} common w$i")).toDF("doc_id", "text")
    def run(r: org.apache.spark.sql.DataFrame) =
      Dsir.select(r, col("doc_id"), col("text"), target, col("text"),
        buckets = 512, k = 25, salt = "s1")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val a = run(raw)
    val b = run(raw.repartition(13))
    assert(a === b, "selection must be bit-identical under repartitioning")
    val c = Dsir.select(raw, col("doc_id"), col("text"), target, col("text"),
      buckets = 512, k = 25, salt = "s2").collect().map(_.getLong(0)).toSet
    assert(a.map(_._1).toSet !== c, "a different salt must draw a different sample")
  }

  test("k >= corpus returns every document; key = lw + gumbel") {
    val target = Seq((1L, "a")).toDF("doc_id", "text")
    val raw = Seq((1L, "a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val out = Dsir.select(raw, col("doc_id"), col("text"), target, col("text"),
      buckets = 64, k = 10, salt = "s1").collect()
    assert(out.length === 3)
    out.foreach(r => assert(r.getLong(4) === r.getLong(2) + r.getLong(3)))
    // ordered by key desc then doc_id
    val keys = out.map(r => (r.getLong(4), r.getLong(0)))
    assert(keys === keys.sortBy { case (k, id) => (-k, id) }.toSeq)
  }

  test("selectByPredicate ≡ select over the filtered frame, bit-for-bit") {
    val raw = (1 to 120).map(i =>
      (i.toLong, if (i % 4 == 0) "en" else "xx", s"w${i % 11} w${i % 5} common$i"))
      .toDF("doc_id", "lang", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("key_micro").desc, col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val viaPredicate = rows(Dsir.selectByPredicate(
      raw, col("doc_id"), col("text"), col("lang") === "en",
      buckets = 512, k = 30, salt = "s1"))
    val viaFrames = rows(Dsir.select(
      raw, col("doc_id"), col("text"),
      raw.filter(col("lang") === "en"), col("text"),
      buckets = 512, k = 30, salt = "s1"))
    assert(viaPredicate === viaFrames)
  }

  test("persisted counts: round-trip bit-parity, half-written and cross-space lakes refused") {
    val target = Seq((1L, "a a b")).toDF("doc_id", "text")
    val raw = Seq((1L, "a a b"), (2L, "c c"), (3L, "a c")).toDF("doc_id", "text")
    val tc = Dsir.hashedCounts(target, col("text"), B)
    val rc = Dsir.hashedCounts(raw, col("text"), B)
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    Dsir.saveCounts(spark, tc, B, s"$dir/tc")
    Dsir.saveCounts(spark, rc, B, s"$dir/rc")
    val (tcL, bT) = Dsir.loadCounts(spark, s"$dir/tc")
    val (rcL, bR) = Dsir.loadCounts(spark, s"$dir/rc")
    assert(bT === B && bR === B)
    def w(t: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      Dsir.logWeights(raw, col("doc_id"), col("text"), t, r, B)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq.sortBy(_._1)
    assert(w(tcL, rcL) === w(tc, rc), "loaded counts must score bit-identically")
    // half-written (no meta row) refused
    spark.read.parquet(s"$dir/tc").filter(col("bucket") >= 0)
      .write.parquet(s"$dir/half")
    val e = intercept[IllegalArgumentException](Dsir.loadCounts(spark, s"$dir/half"))
    assert(e.getMessage.contains("half-written"))
    // a lake fit at MORE buckets than its meta claims is refused
    spark.read.parquet(s"$dir/tc")
      .unionByName(Seq((B.toLong + 5L, 1L)).toDF("bucket", "cnt"))
      .write.parquet(s"$dir/cross")
    val e2 = intercept[IllegalArgumentException](Dsir.loadCounts(spark, s"$dir/cross"))
    assert(e2.getMessage.contains("different bucket count"))
  }

  test("plan shape: broadcast count joins, TakeOrderedAndProject top-k") {
    val target = (1 to 10).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val raw = (1 to 100).map(i => (i.toLong, s"t${i % 7} w$i")).toDF("doc_id", "text")
    val sel = Dsir.select(raw, col("doc_id"), col("text"), target, col("text"),
      buckets = 256, k = 5, salt = "s1")
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must plan as TakeOrderedAndProject, never a full sort")
    assert(plan.contains("BroadcastHashJoin"),
      "count tables must join as broadcasts (no token-keyed corpus shuffle)")
    assert(!plan.contains("SortMergeJoin"),
      "no count join may fall back to a corpus-side shuffle join")
  }
}
