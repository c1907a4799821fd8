package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Opq}

/** [[graft.operators.Opq]] — parametric OPQ (rotation + eigenvalue
  * allocation + PQ). The v20 oracle verifies every served sim is a
  * true cosine; these specs pin the allocation arithmetic, the
  * brute-force degeneracy, determinism, and the recall the rotation
  * buys.
  */
class OpqSpec extends SparkSpecBase {

  test("eigenvalue allocation balances subspace products with deterministic ties") {
    // eigvals [8,4,2,1], m=2: 0→g0, 1→g1, 2→g1 (smaller log-product),
    // 3→g0 — products 8·1 = 4·2 = 8, perm subspace-major ascending
    assert(Opq.allocate(Array(8.0, 4.0, 2.0, 1.0), 2).toSeq === Seq(0, 3, 1, 2))
    // heavy head: capacity keeps any subspace from absorbing everything
    assert(Opq.allocate(Array(100.0, 1.0, 1.0, 1.0), 2).toSeq === Seq(0, 3, 1, 2))
    // all-equal eigvalues: deterministic first-fit (identity layout)
    assert(Opq.allocate(Array(1.0, 1.0, 1.0, 1.0), 2).toSeq === Seq(0, 1, 2, 3))
    // zero eigenvalues must not -Inf the log and break balance
    val p = Opq.allocate(Array(2.0, 0.0, 0.0, 0.0, 0.0, 1.0), 3)
    assert(p.sorted.toSeq === (0 until 6))
    // m = 1 degenerates to the identity set
    assert(Opq.allocate(Array(3.0, 1.0, 2.0), 1).sorted.toSeq === Seq(0, 1, 2))
  }

  test("shortlist >= corpus degenerates to brute force bit-for-bit") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10 && col("vec_id") < 110)
    val qs = e.filter(col("vec_id") < 5)
    val got = graft.operators.Dedup.scoped {
      Opq.knnOpq(base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"),
        k = 5, m = 8, kSub = 16, shortlist = 200).collect().toSeq
    }
    val want = Ann.knnBruteForce(base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5).collect().toSeq
    assert(got.sortBy(r => (r.getLong(0), r.getInt(2))) ===
      want.sortBy(r => (r.getLong(0), r.getInt(2))))
  }

  test("recall@5 with an 8-byte code; served sims are true cosines") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val got = graft.operators.Dedup.scoped {
      Opq.knnOpq(base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"),
        k = 5, m = 8, kSub = 32, shortlist = 150).collect().toSeq
    }
    val exact = Ann.knnBruteForce(base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5).collect().toSeq
    val exactPairs = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSims = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val recall = got.count(r => exactPairs.contains((r.getLong(0), r.getLong(1)))).toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall below floor 0.9")
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSims.get(key).foreach(w => assert(r.getDouble(3) == w, s"sim drift at $key"))
    }
  }

  test("results are bit-identical under repartitioning") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10 && col("vec_id") < 210)
    val qs = e.filter(col("vec_id") < 5)
    def run(b: org.apache.spark.sql.DataFrame) = graft.operators.Dedup.scoped {
      Opq.knnOpq(b, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"),
        k = 5, m = 8, kSub = 16, shortlist = 60).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
        .sortBy(t => (t._1, t._3))
    }
    assert(run(base) === run(base.repartition(9)))
  }
}
