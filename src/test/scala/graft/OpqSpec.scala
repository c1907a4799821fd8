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

  // -------------------- persisted OPQ index -------------------- //

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._3))

  test("persisted OPQ index ≡ on-the-fly knnOpq bit-for-bit (same fit, same scores)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10 && col("vec_id") < 310)
    val qs = e.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft_opq_idx").toString + "/idx"
    Opq.buildOpqIndex(base, col("vec_id"), col("embedding"), path,
      m = 8, kSub = 16)
    val got = graft.operators.Dedup.scoped {
      rows(Opq.queryOpqIndex(spark, path, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5, shortlist = 60))
    }
    val want = graft.operators.Dedup.scoped {
      rows(Opq.knnOpq(base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"),
        k = 5, m = 8, kSub = 16, shortlist = 60))
    }
    assert(got === want)
  }

  test("persisted OPQ: build+add ≡ build-all-with-the-same-fit; remove gates and serves without ghosts") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = e.filter(col("vec_id") >= 10 && col("vec_id") < 310)
    val evens = all.filter(col("vec_id") % 2 === 0)
    val odds = all.filter(col("vec_id") % 2 === 1)
    val qs = e.filter(col("vec_id") < 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_opq_life").toString
    // grown index: fit on evens, extend with odds
    val grown = tmp + "/grown"
    Opq.buildOpqIndex(evens, col("vec_id"), col("embedding"), grown, m = 8, kSub = 16)
    Opq.addToOpqIndex(spark, grown, odds, col("vec_id"), col("embedding"))
    // reference: build-all with the SAME fit corpus (fitOn = evens)
    val oneShot = tmp + "/oneshot"
    Opq.buildOpqIndex(all, col("vec_id"), col("embedding"), oneShot,
      m = 8, kSub = 16, fitOn = Some(evens))
    def serve(path: String, src: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.scoped {
        rows(Opq.queryOpqIndex(spark, path, src, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k = 5, shortlist = 60))
      }
    assert(serve(grown, all) === serve(oneShot, all))
    // retention-delete every third id; served results carry no ghost
    val victims = all.filter(col("vec_id") % 3 === 0)
    Opq.removeFromOpqIndex(spark, grown, victims, col("vec_id"))
    val kept = all.filter(col("vec_id") % 3 =!= 0)
    val after = serve(grown, kept)
    assert(after.nonEmpty && after.forall(_._2 % 3 != 0), "removed id served back")
    // removing ids that are not indexed is a no-op, not an error
    Opq.removeFromOpqIndex(spark, grown,
      e.filter(col("vec_id") >= 100000), col("vec_id"))
    assert(serve(grown, kept) === after)
  }

  test("Ann.compactIndex heals OPQ append decay: fewer files, results bit-identical") {
    // compactIndex only sees the partitioned base, so the bucket=
    // layout composes with the shared compaction verb for free — this
    // pins it (daily adds fragment each bucket one file per add)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10 && col("vec_id") < 310)
    val qs = e.filter(col("vec_id") < 5)
    val path = java.nio.file.Files.createTempDirectory("graft_opq_comp").toString + "/idx"
    Opq.buildOpqIndex(base.filter(col("vec_id") % 3 === 0),
      col("vec_id"), col("embedding"), path, m = 8, kSub = 16)
    Opq.addToOpqIndex(spark, path,
      base.filter(col("vec_id") % 3 === 1), col("vec_id"), col("embedding"))
    Opq.addToOpqIndex(spark, path,
      base.filter(col("vec_id") % 3 === 2), col("vec_id"), col("embedding"))
    def dataFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(path + "/base")).size
    }
    def serve() = graft.operators.Dedup.scoped {
      rows(Opq.queryOpqIndex(spark, path, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5, shortlist = 60))
    }
    val before = serve()
    val filesBefore = dataFiles()
    val stats = graft.operators.Ann.compactIndex(spark, path)
    assert(stats.nonEmpty, "two appends must leave at least one compactable bucket")
    assert(dataFiles() < filesBefore,
      s"compaction must shrink the file count ($filesBefore before)")
    assert(serve() === before, "compaction moves bytes, never rows")
  }

  test("persisted OPQ: fully-emptied index refuses by name; mixed-build pq sidecar refused on k_sub") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10 && col("vec_id") < 110)
    val qs = e.filter(col("vec_id") < 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_opq_drift").toString
    // retention-delete EVERY id: the next query must refuse by name,
    // not die in schema inference; a second remove is a no-op
    val a = tmp + "/a"
    Opq.buildOpqIndex(base, col("vec_id"), col("embedding"), a, m = 8, kSub = 16)
    Opq.removeFromOpqIndex(spark, a, base, col("vec_id"))
    val e1 = intercept[IllegalArgumentException] {
      Opq.queryOpqIndex(spark, a, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5)
    }
    assert(e1.getMessage.contains("zero code rows"))
    Opq.removeFromOpqIndex(spark, a, base, col("vec_id")) // no-op, no crash
    // a dense, `rotated` pq sidecar from a DIFFERENT build (smaller
    // code budget) must refuse on the k_sub gate — codes past its
    // range would index in-bounds into the next subspace's LUT region
    // and serve garbage sims with no error
    val b16 = tmp + "/b16"
    val b32 = tmp + "/b32"
    Opq.buildOpqIndex(base, col("vec_id"), col("embedding"), b16, m = 8, kSub = 16)
    Opq.buildOpqIndex(base, col("vec_id"), col("embedding"), b32, m = 8, kSub = 32)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(b32 + "/pq"))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(b16 + "/pq"), new java.io.File(b32 + "/pq"))
    val e2 = intercept[IllegalArgumentException] {
      Opq.queryOpqIndex(spark, b32, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5)
    }
    assert(e2.getMessage.contains("k_sub"))
  }

  test("persisted OPQ refusals: half-built index, IVF-family cross-verb, wrong query dim, parked residue") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") >= 10 && col("vec_id") < 110)
    val qs = e.filter(col("vec_id") < 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_opq_guard").toString
    val path = tmp + "/idx"
    Opq.buildOpqIndex(base, col("vec_id"), col("embedding"), path, m = 8, kSub = 16)
    // half-built: rotation marker gone → every entry point refuses loudly
    val rot = new java.io.File(path + "/rotation")
    val parkedRot = new java.io.File(tmp + "/rot_bak")
    assert(rot.renameTo(parkedRot))
    val e1 = intercept[IllegalArgumentException] {
      Opq.queryOpqIndex(spark, path, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5)
    }
    assert(e1.getMessage.contains("rotation"))
    assert(parkedRot.renameTo(rot))
    // IVF-family cross-verb: a codebook sidecar names the right verbs
    val fakeCb = new java.io.File(path + "/codebook")
    fakeCb.mkdirs()
    val e2 = intercept[IllegalArgumentException] {
      Opq.addToOpqIndex(spark, path, base, col("vec_id"), col("embedding"))
    }
    assert(e2.getMessage.contains("IVF"))
    assert(fakeCb.delete())
    // wrong query dimension refuses by name
    import spark.implicits._
    val shortQ = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e3 = intercept[IllegalArgumentException] {
      Opq.queryOpqIndex(spark, path, base, col("vec_id"), col("embedding"),
        shortQ, col("vec_id"), col("embedding"), k = 5)
    }
    assert(e3.getMessage.toLowerCase.contains("dim"))
    // parked crash residue under base refuses serving and appends
    val parked = new java.io.File(path + "/base__remove_old")
    parked.mkdirs()
    java.nio.file.Files.writeString(parked.toPath.resolve("part-0.parquet"), "x")
    val e4 = intercept[RuntimeException] {
      Opq.queryOpqIndex(spark, path, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5)
    }
    assert(e4.getMessage.contains("parked"))
    java.nio.file.Files.deleteIfExists(parked.toPath.resolve("part-0.parquet"))
    assert(parked.delete())
    // healthy again after recovery
    graft.operators.Dedup.scoped {
      assert(Opq.queryOpqIndex(spark, path, base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k = 5).count() > 0)
    }
  }
}
