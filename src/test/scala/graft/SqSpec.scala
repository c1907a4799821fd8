package graft

import org.apache.spark.sql.functions._

import graft.operators.Sq

/** [[graft.operators.Sq]] — SQ8 scalar quantization. The v15 oracle
  * replays the whole pipeline cross-engine; these specs pin the local
  * numeric contracts (quantization error bound, degenerate dimensions,
  * null propagation) and the recall behavior on structured vectors
  * (where quality actually matters — the oracle corpus is
  * near-random).
  */
class SqSpec extends SparkSpecBase {

  import spark.implicits._

  test("encode/decode round trip stays within half a quantization step per dim") {
    val vecs = Seq(
      (1L, Array(-3.0f, 0.5f, 100.0f, 7.0f)),
      (2L, Array(2.5f, -0.5f, -100.0f, 7.0f)),
      (3L, Array(0.0f, 0.25f, 0.0f, 7.0f))) // dim 4 constant => degenerate
    val df = vecs.toDF("vec_id", "embedding")
    val st = Sq.fitStats(df, col("embedding"), 4)
    assert(st.mins.toSeq === Seq(-3.0, -0.5, -100.0, 7.0))
    assert(st.maxs.toSeq === Seq(2.5, 0.5, 100.0, 7.0))

    val out = df
      .withColumn("codes", Sq.encodeExpr(col("embedding"), st))
      .withColumn("recon", Sq.decodeExpr(col("codes"), st))
      .select("vec_id", "embedding", "codes", "recon")
      .collect()
    for (r <- out) {
      val emb = r.getSeq[Float](1)
      val codes = r.getSeq[Int](2)
      val rec = r.getSeq[Double](3)
      for (i <- emb.indices) {
        assert(codes(i) >= 0 && codes(i) <= 255)
        val step = (st.maxs(i) - st.mins(i)) / 255.0
        val tol = if (step == 0.0) 1e-12 else step / 2 + 1e-12
        assert(math.abs(rec(i) - emb(i)) <= tol,
          s"vec ${r.getLong(0)} dim $i: ${emb(i)} -> ${rec(i)} exceeds half-step $tol")
      }
    }
    // degenerate dimension codes to 0 and reconstructs the constant exactly
    assert(out.forall(r => r.getSeq[Int](2)(3) == 0 && r.getSeq[Double](3)(3) == 7.0))
  }

  test("boundary values code to exactly 0 and 255 and reconstruct the range ends") {
    val df = Seq((1L, Array(0.0f)), (2L, Array(10.0f)), (3L, Array(5.0f)))
      .toDF("vec_id", "embedding")
    val st = Sq.fitStats(df, col("embedding"), 1)
    val codes = df.withColumn("c", Sq.encodeExpr(col("embedding"), st))
      .select("vec_id", "c").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).head).toMap
    assert(codes(1L) === 0)
    assert(codes(2L) === 255)
    assert(codes(3L) === 128) // 5/10*255 = 127.5 rounds half-away to 128
  }

  test("null elements yield null codes (dropped by knnSq8's gate)") {
    val df = Seq((1L, Seq[Option[Float]](Some(1.0f), None)))
      .toDF("vec_id", "embedding")
    val st = Sq.Sq8Stats(Array(0.0, 0.0), Array(2.0, 2.0))
    val c = df.select(Sq.encodeExpr(col("embedding"), st).as("c")).head.getSeq[Any](0)
    assert(c(0) != null && c(1) == null)
  }

  test("a ±Inf element is gated out before the fit: stats not poisoned, results unaffected") {
    // one +Inf element would make that dimension's fitted max infinite,
    // so every reconstruction computes mn + 0*Inf = NaN in that dim —
    // the gate must drop the vector BEFORE the stats aggregate
    val rnd = new scala.util.Random(11)
    val clean = (0 until 60).map(i =>
      (100L + i, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2)))
    val dirty = clean :+ (999L,
      Array(1.0f, Float.PositiveInfinity, 0.5f, 0f, 0f, 0f, 0f, 0f))
    val qs = (0 until 3).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2))).toDF("vec_id", "embedding")
    val onClean = Sq.knnSq8(
      clean.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5, shortlist = 20)
      .select("q_id", "b_id", "rank", "sim").collect().toSeq
    val onDirty = Sq.knnSq8(
      dirty.toDF("vec_id", "embedding"), col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5, shortlist = 20)
      .select("q_id", "b_id", "rank", "sim").collect().toSeq
    assert(onDirty.toSet == onClean.toSet,
      "an Inf vector changed results for the finite corpus (poisoned fit)")
    assert(!onDirty.exists(_.getLong(1) == 999L), "the Inf vector was served")
  }

  test("knnSq8 on clustered vectors: exact top-k survives quantization") {
    // 5 well-separated clusters; queries sit near cluster centers, so
    // the true neighbor sets are unambiguous and SQ8's ~1/255-range
    // error must not disturb them
    val dim = 16
    val rnd = new scala.util.Random(7)
    val base = (0 until 250).map { i =>
      val c = i % 5
      val v = Array.tabulate(dim)(j =>
        (if (j == c) 10.0 else 0.0).toFloat + (rnd.nextFloat() - 0.5f) * 0.2f)
      (100L + i, v)
    }.toDF("vec_id", "embedding")
    val qs = (0 until 5).map { c =>
      (c.toLong, Array.tabulate(dim)(j => if (j == c) 9.0f else 0.05f))
    }.toDF("vec_id", "embedding")

    val exact = graft.operators.Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), k = 5)
    val sq = Sq.knnSq8(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
      k = 5, shortlist = 20)
    val r = RecallBoard.recallAtK(exact, sq, 5)
    assert(r >= 0.99, s"SQ8 recall on separable clusters was $r")
    // and the reported sims are TRUE cosines: spot-check rank-1 rows
    // against the brute-force scores for the same pairs
    val ex = exact.filter(col("rank") === 1)
      .select("q_id", "b_id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, b, s) => (q, b) -> s }.toMap
    val got = sq.filter(col("rank") === 1)
      .select("q_id", "b_id", "sim").as[(Long, Long, Double)].collect()
    for ((q, b, s) <- got if ex.contains((q, b)))
      assert(s == ex((q, b)), s"sq8 sim for ($q,$b) not the exact cosine")
  }

  test("knnIvfSq8 with nprobe >= nlist is bit-equal to knnSq8 (exhaustive cells)") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 200).map(i =>
      (100L + i, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2)))
      .toDF("vec_id", "embedding")
    val qs = (0 until 6).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2)))
      .toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val flat = graft.operators.Sq.knnSq8(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
      k = 5, shortlist = 20)
    val ivf = graft.operators.Sq.knnIvfSq8(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
      k = 5, nlist = 4, nprobe = 4, shortlist = 20)
    assert(rows(ivf) === rows(flat))
  }

  test("persisted IVF-SQ8: build+query ≡ on-the-fly composition bit-for-bit") {
    val rnd = new scala.util.Random(17)
    val base = (0 until 200).map(i =>
      (100L + i, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2)))
      .toDF("vec_id", "embedding")
    val qs = (0 until 6).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2)))
      .toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("graft_ivfsq8").toString + "/ix"
    Sq.buildIvfSq8Index(base, col("vec_id"), col("embedding"), p, nlist = 8)
    val served = Sq.queryIvfSq8Index(
      spark, p, base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5, nprobe = 4, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val fly = Sq.knnIvfSq8(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"),
      k = 5, nlist = 8, nprobe = 4, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(served == fly, "persisted IVF-SQ8 diverged from the on-the-fly composition")
    // the base lake stores codes + r_nrm only (the compression story)
    val cols = spark.read.parquet(s"$p/base").columns.toSet
    assert(cols == Set("b_id", "codes", "r_nrm", "cell"), s"$cols")
  }

  test("persisted IVF-SQ8 lifecycle: add serves new ids, remove never serves victims, guards fire") {
    val rnd = new scala.util.Random(23)
    def vecs(ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2))).toDF("vec_id", "embedding")
    // ONE materialized frame, split by parity (vecs regenerates random
    // data per call — reusing it would diverge the halves)
    val all = vecs(100 until 200).cache(); all.count()
    val p = java.nio.file.Files.createTempDirectory("graft_ivfsq8_lc").toString + "/ix"
    Sq.buildIvfSq8Index(all.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), p, nlist = 4)
    Sq.addToIvfSq8Index(spark, p, all.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"))
    val qs = all.limit(6).select(col("vec_id"), col("embedding"))
    def servedIds() = Sq.queryIvfSq8Index(
      spark, p, all, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5, nprobe = 4, shortlist = 60)
      .select("b_id").as[Long].collect().toSet
    // querying each vector with itself in the index: odd ids reachable
    assert(servedIds().exists(_ % 2 == 1), "added odd ids never served")
    // remove all odd ids; they must never be served again
    Sq.removeFromIvfSq8Index(spark, p,
      all.filter(col("vec_id") % 2 === 1), col("vec_id"))
    val after = Sq.queryIvfSq8Index(
      spark, p, all.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5, nprobe = 4, shortlist = 60)
      .select("b_id").as[Long].collect().toSet
    assert(after.nonEmpty && after.forall(_ % 2 == 0), s"removed ids served: $after")
    // directed-misuse guards: plain-IVF verbs refuse the sq layout —
    // and the remedy names the SQ verb (not the PQ one: an operator
    // sent to Pq.addToIvfPqIndex for an SQ index would be misled twice)
    val eMis = intercept[IllegalArgumentException](graft.operators.Ann.addToIvfIndex(
      spark, p, all.limit(2), col("vec_id"), col("embedding")))
    assert(eMis.getMessage.contains("Sq.addToIvfSq8Index"), eMis.getMessage)
    assert(!eMis.getMessage.contains("Pq."), eMis.getMessage)
    // ...and the sq verbs refuse a plain IVF index
    val plain = java.nio.file.Files.createTempDirectory("graft_plain_ivf").toString + "/ix"
    graft.operators.Ann.buildIvfIndex(all, col("vec_id"), col("embedding"), plain, nlist = 4)
    intercept[IllegalArgumentException](Sq.addToIvfSq8Index(
      spark, plain, all.limit(2), col("vec_id"), col("embedding")))
    intercept[IllegalArgumentException](Sq.queryIvfSq8Index(
      spark, plain, all, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 2))
    all.unpersist()
  }

  test("a wrong-dimension query fails loudly instead of reading as no-neighbors") {
    val base = Seq((10L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (11L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val badQ = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Sq.knnSq8(base, col("vec_id"), col("embedding"),
        badQ, col("vec_id"), col("embedding"), k = 1)
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("an entirely-gated-out increment names every scoreable gate, not just dimension") {
    val rnd = new scala.util.Random(31)
    val all = (300 until 340).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2))).toDF("vec_id", "embedding")
    val p = java.nio.file.Files.createTempDirectory("graft_ivfsq8_gate").toString + "/ix"
    Sq.buildIvfSq8Index(all, col("vec_id"), col("embedding"), p, nlist = 2)
    // right dimension, but every element NaN — the old message blamed
    // only a dimension mismatch, sending the operator down the wrong
    // diagnosis; the broadened one lists all gates
    val nanRows = Seq((999L, Array.fill(8)(Float.NaN))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Sq.addToIvfSq8Index(
      spark, p, nanRows, col("vec_id"), col("embedding")))
    assert(e.getMessage.contains("NaN"), e.getMessage)
    assert(e.getMessage.contains("zero norm"), e.getMessage)
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("fit on an empty frame fails loudly") {
    val df = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Sq.fitStats(df, col("embedding"), 4)
    }
    assert(e.getMessage.contains("empty"))
  }
}
