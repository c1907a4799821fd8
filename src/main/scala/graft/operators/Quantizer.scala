package graft.operators

/** Driver-local k-means quantizer fit for IVF indexing.
  *
  * The IVF recipe never trains on the full corpus — the quantizer fits
  * a BOUNDED sample (`Ann.knnIvf` caps it at `maxFit`, default 100k
  * rows; ≤ ~25 MB at dim 64) and only the ASSIGNMENT of the full base
  * is distributed. Running that bounded fit through a distributed
  * KMeans costs ~10 iterations × several scheduler round-trips for a
  * dataset that fits in one task's memory: measured 1.3-1.6 s of pure
  * overhead at sf0.1 versus <10 ms here. This is the same division of
  * labor FAISS uses (in-memory `train`, then out-of-core `add`).
  *
  * Deterministic by construction: seeded k-means++ initialization and
  * Lloyd iterations over a fixed-order sample — a retried driver
  * program reproduces the identical centroids (no `rand()` anywhere).
  */
private[graft] object Quantizer {

  /** Squared L2 over the overlapping prefix (ragged inputs never throw
    * — the caller's corpus is fixed-dim by contract).
    */
  private def dist2(v: Array[Float], c: Array[Double]): Double = {
    val d = math.min(v.length, c.length)
    var s = 0.0
    var i = 0
    while (i < d) { val t = v(i) - c(i); s += t * t; i += 1 }
    s
  }

  /** k-means++ init + Lloyd, converging early when assignments stop
    * moving. Empty cells keep their previous centroid (k never
    * silently shrinks; a degenerate duplicate-heavy sample just yields
    * coincident centroids, which assignment handles fine).
    */
  def fit(data: Array[Array[Float]], k: Int, seed: Long, maxIter: Int = 10): Array[Array[Double]] = {
    val n = data.length
    require(n > 0, "quantizer fit sample is empty")
    require(k >= 1 && k <= n, s"k=$k out of range for sample size $n")
    val dim = data(0).length
    val rnd = new scala.util.Random(seed)
    val centroids = Array.ofDim[Double](k, dim)

    // k-means++ seeding
    val first = data(rnd.nextInt(n))
    var j = 0
    while (j < math.min(dim, first.length)) { centroids(0)(j) = first(j); j += 1 }
    val d2 = new Array[Double](n)
    java.util.Arrays.fill(d2, Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < n) {
        val d = dist2(data(i), centroids(c - 1))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      val total = d2.sum
      val pick =
        if (total <= 0) rnd.nextInt(n) // all remaining mass at distance 0
        else {
          val target = rnd.nextDouble() * total
          var acc = 0.0
          var p = 0
          while (p < n - 1 && acc + d2(p) < target) { acc += d2(p); p += 1 }
          p
        }
      val src = data(pick)
      j = 0
      while (j < math.min(dim, src.length)) { centroids(c)(j) = src(j); j += 1 }
      c += 1
    }

    // Lloyd iterations; the assignment pass is the O(n·k·dim) term —
    // parallelized over the fixed index range, so still deterministic
    val assign = new Array[Int](n)
    val prev = new Array[Int](n)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0
        var bestD = Double.MaxValue
        var cc = 0
        while (cc < k) {
          val d = dist2(data(i), centroids(cc))
          if (d < bestD) { bestD = d; best = cc }
          cc += 1
        }
        assign(i) = best
      }
      // the FIRST iteration must always update: `prev` starts all-zero,
      // and an initial assignment that happens to be all-zero too (k=1,
      // or every point nearest centroid 0) would otherwise return the
      // k-means++ seed instead of the cell mean
      moved = iter == 0 || !java.util.Arrays.equals(assign, prev)
      if (moved) {
        System.arraycopy(assign, 0, prev, 0, n)
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Int](k)
        var i = 0
        while (i < n) {
          val a = assign(i)
          counts(a) += 1
          val v = data(i)
          var jj = 0
          val lim = math.min(dim, v.length)
          while (jj < lim) { sums(a)(jj) += v(jj); jj += 1 }
          i += 1
        }
        var cc = 0
        while (cc < k) {
          if (counts(cc) > 0) {
            var jj = 0
            while (jj < dim) { centroids(cc)(jj) = sums(cc)(jj) / counts(cc); jj += 1 }
          } // empty cell: keep previous centroid
          cc += 1
        }
      }
      iter += 1
    }
    centroids
  }
}
