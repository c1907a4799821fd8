package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** OPQ — Optimized Product Quantization (Ge et al., CVPR 2013,
  * parametric form; FAISS `OPQMatrix`): rotate the space BEFORE
  * product-quantizing so every PQ subspace carries comparable variance.
  * Plain PQ slices the raw coordinates into m contiguous blocks; when
  * variance concentrates in a few dimensions (every real embedding
  * model) some subspaces quantize almost nothing while others are
  * starved, wasting code budget. Parametric OPQ fixes this with a
  * closed-form rotation: PCA-rotate, then assign principal components
  * to subspaces by EIGENVALUE ALLOCATION — greedily balancing the
  * per-subspace eigenvalue PRODUCTS (the paper's Gaussian-optimal
  * criterion) — and run ordinary PQ in the rotated space.
  *
  * Composition, not reimplementation: the rotation is [[Pca]]'s
  * unit-sphere basis at FULL dimension (an orthonormal map — on the
  * sphere, rotated L2 equals original-cosine ordering exactly), the
  * codebooks/ADC/shortlist machinery is [[Pq]]'s, and the tail is the
  * shared exact-cosine rerank on the ORIGINAL vectors — every served
  * sim is a true cosine, so the self-verifying knn oracle applies
  * verbatim (the [[Pca.knnPca]] contract). Only WHICH candidates the
  * rotated compressed domain surfaces is approximate.
  *
  * The compressed-domain score is ADC **L2** (‖b̂−q‖² = ‖b̂‖² + ‖q‖²
  * − 2·b̂·q with the reconstruction norm and query norm hoisted):
  * projection offsets shift base and query alike, so L2 differences
  * are offset-invariant — unlike the raw-PQ cosine form, which would
  * divide by shifted norms.
  *
  * Scale shape: identical to [[Pq.knnPq]] — one narrow rotation +
  * encode pass over the corpus (native expressions, whole-stage
  * codegen), queries + LUTs broadcast, per-partition top-k buffers,
  * rerank touches only queries × shortlist pairs.
  */
object Opq {

  /** Eigenvalue allocation: a permutation of 0..d-1 placing each
    * principal component into one of `m` equal-size subspaces such
    * that per-subspace eigenvalue products balance (greedy: largest
    * eigenvalue first, into the non-full subspace with the smallest
    * log-product; deterministic tie-breaks). Returned permutation is
    * subspace-major: positions [j·d/m, (j+1)·d/m) hold subspace j's
    * component indices in ascending order.
    */
  private[graft] def allocate(eigvals: Array[Double], m: Int): Array[Int] = {
    val d = eigvals.length
    require(m >= 1 && d % m == 0, s"dim $d must split into m=$m equal subspaces")
    val cap = d / m
    val sizes = new Array[Int](m)
    val logs = new Array[Double](m)
    val groups = Array.fill(m)(Array.newBuilder[Int])
    // descending eigenvalue, ties by component index — total order
    val order = eigvals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    order.foreach { idx =>
      var best = -1
      var bestLog = Double.MaxValue
      var g = 0
      while (g < m) {
        if (sizes(g) < cap && logs(g) < bestLog) { best = g; bestLog = logs(g) }
        g += 1
      }
      groups(best) += idx
      sizes(best) += 1
      // clamp: a zero eigenvalue would -Inf the log and absorb every
      // remaining component into one subspace
      logs(best) += math.log(math.max(eigvals(idx), 1e-300))
    }
    groups.flatMap(_.result().sorted)
  }

  /** Approximate top-k cosine via rotated-space PQ shortlist + exact
    * rerank. Parameters mirror [[Pq.knnPq]]; the rotation fits on the
    * same bounded deterministic sample discipline ([[Pca.fitUnit]]).
    */
  def knnOpq(
      base: DataFrame, baseId: Column, baseVec: Column,
      queries: DataFrame, qId: Column, qVec: Column,
      k: Int, m: Int = 8, kSub: Int = 256, shortlist: Int = 0,
      seed: Long = 42L, maxFit: Long = 20000L): DataFrame = {
    val sl = Pq.shortlistSize(shortlist, k)
    val b0 = base.select(baseId.as("b_id"), baseVec.as("b_emb"))
      .withColumn("b_nrm", Vectors.norm2(col("b_emb")))
      .filter(col("b_nrm") > 0)
    // the rotation is full-dimension: probe D from a small sample
    // (majority-dimension rule), then fit the unit-sphere basis
    val probe = Ann.sampleVectors(b0.select(col("b_id"), col("b_emb")), 256L)
    require(probe.nonEmpty, "OPQ needs at least one non-null base vector")
    val d = probe.head.length
    require(d % m == 0, s"embedding dim $d is not divisible by m=$m subspaces")
    val pca = Pca.fitUnit(b0, col("b_id"), col("b_emb"), dims = d, maxFit = maxFit)
    val perm = allocate(pca.eigvals, m)
    // bake the permutation into the basis: projection emits coordinates
    // already in subspace-major order, one pass, no second shuffle
    val rot = pca.copy(
      components = perm.map(pca.components),
      offsets = perm.map(pca.offsets),
      eigvals = perm.map(pca.eigvals))

    val b = Dedup.scopedCache(
      Pca.projectUnit(b0, col("b_emb"), col("b_nrm"), rot, "bp")
        .filter(col("bp").getItem(0).isNotNull))
    val q0 = Ann.validQueries(queries, qId, qVec)
    Ann.requireQueryDim(q0, d)
    val q = Dedup.scopedCache(
      Pca.projectUnit(q0, col("q_emb"), col("qp_nrm"), rot, "qp")
        .filter(col("qp").getItem(0).isNotNull)
        .withColumn("qp2", Vectors.dot(col("qp"), col("qp"))))

    val cb = Pq.fit(b, col("b_id"), col("bp"), m, kSub, seed, maxFit)
    val zeroCent = typedLit(Seq.fill(d)(0.0f))
    val enc = Pq.encode(b, col("b_id"), col("bp"), cb)
      .withColumn("d_nrm", Pq.reconNormExpr(col("codes"), zeroCent, cb))
      .select("b_id", "codes", "d_nrm")
    val qLut = q.select(col("q_id"), col("qp2"), Pq.lutExpr(col("qp"), cb).as("lut"))
    // ADC L2, negated so "larger is nearer" matches every topk owner
    val approx = enc.crossJoin(broadcast(qLut))
      .select(col("q_id"), col("b_id"),
        (-(col("d_nrm") * col("d_nrm") + col("qp2")
          - lit(2.0) * Pq.adcExpr(col("codes"), col("lut"), cb))).as("sim"))
    val short = Ann.topkPerQuery(approx, sl)
    Pq.rerankExact(short,
      b.select("b_id", "b_emb", "b_nrm"),
      q.select("q_id", "q_emb", "qp_nrm"), k)
  }
}
