package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** [[graft.operators.Pca]] — sample-fit PCA with codegen projection.
  * The v18 oracle proves the projection arithmetic and basis properties
  * cross-engine; these specs pin the linear-algebra contract (known
  * eigensystems, variance capture, determinism, persistence) that the
  * dump replay can't express.
  */
class PcaSpec extends SparkSpecBase {

  import spark.implicits._

  test("jacobiEigen recovers a known eigensystem") {
    // [[2,1],[1,2]] has eigenpairs (3, [1,1]/√2), (1, [1,-1]/√2);
    // the appended diagonal block adds (5, e3)
    val m = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(vals.sorted.zip(Seq(1.0, 3.0, 5.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // residual ‖Av − λv‖ per pair
    for (j <- 0 until 3) {
      val v = Array.tabulate(3)(i => vecs(i)(j))
      val av = m.map(row => row.zip(v).map { case (a, x) => a * x }.sum)
      val res = av.zip(v).map { case (a, x) => a - vals(j) * x }
      assert(math.sqrt(res.map(x => x * x).sum) < 1e-10, s"pair $j residual")
    }
  }

  private def clusteredDf(n: Int) = {
    // two anisotropic clusters: dominant variance along dim 0, some
    // along dim 1, none along dim 2
    (0 until n).map { i =>
      val c = if (i % 2 == 0) 10.0f else -10.0f
      (i.toLong, Seq(
        c + (i % 7).toFloat, ((i % 3) - 1).toFloat * 0.5f, 0.25f))
    }.toDF("vec_id", "embedding")
  }

  test("fit: orthonormal basis, descending non-negative eigvals, top axis = cluster axis") {
    val m = Pca.fit(clusteredDf(200), col("vec_id"), col("embedding"), dims = 3)
    assert(m.dims == 3 && m.inputDim == 3)
    for (i <- 0 until 3; j <- i until 3) {
      val dp = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dp - want) < 1e-9, s"<pc$i, pc$j> = $dp")
    }
    assert(m.eigvals.zip(m.eigvals.tail).forall { case (a, b) => a >= b })
    assert(m.eigvals.forall(_ >= -1e-9))
    // the separation (±10 along dim 0) dominates: pc0 ≈ ±e0
    assert(math.abs(math.abs(m.components(0)(0)) - 1.0) < 0.01,
      s"pc0 = ${m.components(0).toSeq}")
    assert(m.explainedRatio > 0.999) // dims = inputDim captures everything
  }

  test("project matches a plain-Scala strict-fold replay bit-for-bit") {
    val df = clusteredDf(50)
    val m = Pca.fit(df, col("vec_id"), col("embedding"), dims = 2)
    val got = Pca.project(df, col("embedding"), m)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.foreach { case (id, x) =>
      val want = m.components.zip(m.offsets).map { case (pc, off) =>
        var acc = 0.0
        var i = 0
        while (i < pc.length) { acc += x(i).toDouble * pc(i); i += 1 }
        acc - off
      }.toSeq
      assert(got(id) == want, s"vec $id: ${got(id)} vs $want")
    }
  }

  test("variance along pc_j equals eigval_j when the sample is the whole corpus") {
    val df = clusteredDf(120)
    val m = Pca.fit(df, col("vec_id"), col("embedding"), dims = 2, maxFit = 10000)
    val projs = Pca.project(df, col("embedding"), m)
      .select("proj").collect().map(_.getSeq[Double](0))
    for (j <- 0 until 2) {
      val xs = projs.map(_(j))
      val mean = xs.sum / xs.length
      val v = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(math.abs(v - m.eigvals(j)) < 1e-6 * math.max(1.0, m.eigvals(j)),
        s"var(proj_$j) = $v vs eigval ${m.eigvals(j)}")
    }
  }

  test("fit is a pure function of the (id, vector) set: partitioning never changes a bit") {
    val df = clusteredDf(150)
    val a = Pca.fit(df.repartition(13), col("vec_id"), col("embedding"), dims = 3)
    val b = Pca.fit(df.repartition(2), col("vec_id"), col("embedding"), dims = 3)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.offsets.toSeq == b.offsets.toSeq && a.eigvals.toSeq == b.eigvals.toSeq)
  }

  test("persisted model round-trips bit-for-bit; serving uses the loaded model") {
    val df = clusteredDf(80)
    val m = Pca.fit(df, col("vec_id"), col("embedding"), dims = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_model").toString
    Pca.saveModel(spark, m, dir)
    val l = Pca.loadModel(spark, dir)
    assert(l.mean.toSeq == m.mean.toSeq && l.trace == m.trace)
    assert(l.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    assert(l.offsets.toSeq == m.offsets.toSeq && l.eigvals.toSeq == m.eigvals.toSeq)
    val a = Pca.project(df, col("embedding"), m).select("proj").collect().map(_.getSeq[Double](0)).toSeq
    val b = Pca.project(df, col("embedding"), l).select("proj").collect().map(_.getSeq[Double](0)).toSeq
    assert(a == b)
  }

  test("loadModel refuses malformed lakes loudly") {
    val df = clusteredDf(40)
    val m = Pca.fit(df, col("vec_id"), col("embedding"), dims = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_bad").toString
    Pca.saveModel(spark, m, dir)
    // drop a middle component → non-contiguous indices
    val rows = spark.read.parquet(dir).filter(col("idx") =!= 1)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_pca_bad2").toString
    rows.write.mode("overwrite").parquet(dir2)
    val e = intercept[IllegalArgumentException](Pca.loadModel(spark, dir2))
    assert(e.getMessage.contains("contiguous"), e.getMessage)
    // no mean row at all
    val dir3 = java.nio.file.Files.createTempDirectory("graft_pca_bad3").toString
    spark.read.parquet(dir).filter(col("kind") =!= "mean")
      .write.mode("overwrite").parquet(dir3)
    val e2 = intercept[IllegalArgumentException](Pca.loadModel(spark, dir3))
    assert(e2.getMessage.contains("mean"), e2.getMessage)
  }

  test("null and dimension-mismatched vectors project to null coordinates") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f, 3.0f))),
      (2L, Some(Seq(1.0f, 2.0f))), // ragged
      (3L, None)
    ).toDF("vec_id", "embedding")
    val m = Pca.fit(clusteredDf(40), col("vec_id"), col("embedding"), dims = 2)
    val out = Pca.project(df, col("embedding"), m)
      .select("vec_id", "proj").collect()
      .map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(out(1L).forall(_ != null))
    assert(out(2L).forall(_ == null), s"ragged: ${out(2L)}")
    assert(out(3L).forall(_ == null), s"null: ${out(3L)}")
  }

  test("knnPca at dims = D with full shortlist degenerates to brute force bit-for-bit") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val got = graft.operators.Dedup.scoped {
      Pca.knnPca(
        base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"),
        k = 5, dims = 64, shortlist = 1000000).collect().toSeq
    }
    val want = graft.operators.Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5).collect().toSeq
    assert(got.sortBy(r => (r.getLong(0), r.getInt(2))) ==
      want.sortBy(r => (r.getLong(0), r.getInt(2))))
  }

  test("knnPca recall@5 at 32 of 64 dims stays high; served sims are true cosines") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val got = graft.operators.Dedup.scoped {
      Pca.knnPca(
        base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"),
        k = 5, dims = 32, shortlist = 100).collect().toSeq
    }
    val exact = graft.operators.Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5).collect().toSeq
    val exactPairs = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSims = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val hits = got.count(r => exactPairs.contains((r.getLong(0), r.getLong(1))))
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall below floor 0.9")
    // every overlapping pair's sim is the exact cosine, bit-for-bit
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSims.get(key).foreach(w => assert(r.getDouble(3) == w, s"sim drift at $key"))
    }
  }

  test("knnPca refuses a dimension-mismatched query loudly, never a silent drop") {
    val base = clusteredDf(40)
    val qs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f)) // ragged: must fail, not read as "no neighbors"
    ).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.scoped {
        Pca.knnPca(
          base, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"),
          k = 2, dims = 2, shortlist = 5)
      }
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("dims out of range and empty fit are refused") {
    val df = clusteredDf(10)
    intercept[IllegalArgumentException](
      Pca.fit(df, col("vec_id"), col("embedding"), dims = 4))
    intercept[IllegalArgumentException](
      Pca.fit(df.limit(0), col("vec_id"), col("embedding"), dims = 2))
  }
}
