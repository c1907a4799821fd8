package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling, Stats}

/** Exact integer statistics (Stats), deterministic split assignment
  * (Sampling.assignSplits), and incremental dedup
  * (Dedup.incrementalKeepFirst) — the round-12 operator battery.
  */
class StatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("corrMoments: hand-computed moments and corr on a tiny group") {
    // group a: x = 1,2,3 ; y = 2,4,6 (perfectly correlated)
    // group b: x = 1,2,3 ; y = 3,1,2 (corr = -1/2 exactly? compute below)
    val df = Seq(
      ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 1L, 3L), ("b", 2L, 1L), ("b", 3L, 2L)).toDF("g", "x", "y")
    val got = Stats.corrMoments(df, Seq(col("g")), col("x"), col("y"))
      .orderBy("g").collect()
    val a = got(0)
    assert(a.getLong(1) === 3L)     // n
    assert(a.getLong(2) === 6L)     // sum_x
    assert(a.getLong(3) === 12L)    // sum_y
    assert(a.getLong(4) === 14L)    // sum_xx
    assert(a.getLong(5) === 56L)    // sum_yy
    assert(a.getLong(6) === 28L)    // sum_xy
    // √6·√24 rounds to 11.999999999999998, so corr lands one ulp above
    // 1.0 — deterministic (the oracle twin computes the identical tree),
    // just not the real-arithmetic value
    assert(math.abs(a.getDouble(7) - 1.0) < 1e-12)
    val b = got(1)
    // n=3 Sx=6 Sy=6 Sxx=14 Syy=14 Sxy=(3+2+6)=11
    // num = 3*11-36 = -3 ; dx = 3*14-36 = 6 ; dy = 6 → corr = -3/6 = -0.5
    // (±1 ulp: √6·√6 ≠ 6.0 exactly — same sqrt story as group a)
    assert(math.abs(b.getDouble(7) - (-0.5)) < 1e-12)
  }

  test("corrMoments: n=1 and zero-variance groups yield null corr, not NaN") {
    val df = Seq(("s", 5L, 7L), ("z", 1L, 1L), ("z", 1L, 2L)).toDF("g", "x", "y")
    val got = Stats.corrMoments(df, Seq(col("g")), col("x"), col("y"))
      .orderBy("g").collect()
    assert(got(0).isNullAt(7), "single row: corr undefined")
    assert(got(1).isNullAt(7), "zero x-variance: corr undefined")
  }

  test("corrMoments/zscoreOutliers: null measures drop pairwise, never skew n vs sums") {
    val df = Seq(
      ("g", Some(1L), Some(2L)), ("g", Some(3L), Some(4L)),
      ("g", None, Some(9L)), ("g", Some(9L), None))
      .toDF("g", "x", "y")
    val m = Stats.corrMoments(df, Seq(col("g")), col("x"), col("y")).collect()(0)
    assert(m.getLong(1) === 2L, "n counts only pairwise-complete rows")
    assert(m.getLong(2) === 4L && m.getLong(3) === 6L)
    val z = Stats.zscoreOutliers(
      Seq(("g", 1L, Some(10L)), ("g", 2L, None)).toDF("g", "id", "v"),
      col("g"), col("v"), kNum = 3, kDen = 1, keep = Seq("id"))
    assert(z.count() === 0L, "null measure rows are dropped, not flagged")
  }

  test("corrMoments: moments merge componentwise (the sketch-merge contract)") {
    val df = (1L to 100L).map(i => ("g", i, i * 3 % 17)).toDF("g", "x", "y")
    val whole = Stats.corrMoments(df, Seq(col("g")), col("x"), col("y")).collect()(0)
    val parts = Seq(df.filter($"x" <= 50), df.filter($"x" > 50))
      .map(p => Stats.corrMoments(p, Seq(col("g")), col("x"), col("y")).collect()(0))
    for (i <- 1 to 6) // n, sum_x, sum_y, sum_xx, sum_yy, sum_xy all add
      assert(parts.map(_.getLong(i)).sum === whole.getLong(i), s"moment col $i")
  }

  test("zscoreOutliers: exact integer predicate flags the planted extreme") {
    // 20 values of 10 and one 1000 → the 1000 is far out; no 10 is
    val df = ((1 to 20).map(i => ("g", i.toLong, 10L)) :+ (("g", 21L, 1000L)))
      .toDF("g", "id", "v")
    val got = Stats.zscoreOutliers(df, col("g"), col("v"),
      kNum = 3, kDen = 1, keep = Seq("id")).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq === Seq(21L))
    assert(got(0).getAs[Long]("x") === 1000L)
  }

  test("zscoreOutliers: stats side broadcasts; empty when nothing clears k") {
    val df = (1 to 50).map(i => ("g", i.toLong, (i % 5).toLong)).toDF("g", "id", "v")
    val q = Stats.zscoreOutliers(df, col("g"), col("v"),
      kNum = 5, kDen = 1, keep = Seq("id"))
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "moment frame must attach via broadcast")
    assert(q.count() === 0L, "uniform-ish values have no 5-sigma outliers")
  }

  test("splitBounds: bands tile the key space and respect weights") {
    val b = Sampling.splitBounds(Seq("tr" -> 0.8, "va" -> 0.1, "te" -> 0.1))
    assert(b.last === Sampling.Modulus)
    assert(b === b.sorted, "bounds must be nondecreasing")
    assert(b.head === (Sampling.Modulus * 0.8).toLong)
    // weights need not sum to 1: normalized
    val b2 = Sampling.splitBounds(Seq("a" -> 2.0, "b" -> 2.0))
    assert(b2 === Seq(Sampling.Modulus / 2, Sampling.Modulus))
  }

  test("assignSplits: deterministic, exhaustive, fold independent of split") {
    val df = (1L to 2000L).toDF("id")
    val out = Sampling.assignSplits(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), kFolds = 5,
      splitSalt = "s1", foldSalt = "f1")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.length === 2000)
    assert(rows.forall { case (_, s, f) =>
      Set("train", "val", "test")(s) && f >= 0 && f < 5 }, "every row assigned")
    // determinism: a second evaluation is identical
    val again = out.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq === again.toSeq)
    // rough proportions (hash-uniform: ±5% absolute at n=2000)
    val frac = rows.groupBy(_._2).view.mapValues(_.length / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.05, frac.toString)
    // folds stratify within each split: every (split, fold) cell occupied
    assert(rows.map(r => (r._2, r._3)).distinct.length === 15,
      "5 folds must appear inside each of the 3 splits")
    // changing the fold salt reshuffles folds but never splits
    val other = Sampling.assignSplits(df, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), kFolds = 5,
      splitSalt = "s1", foldSalt = "f2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(other.map(r => (r._1, r._2)).toSeq === rows.map(r => (r._1, r._2)).toSeq)
    assert(other.map(_._3).toSeq !== rows.map(_._3).toSeq)
  }

  test("assignSplits: plan is one narrow projection — no shuffle") {
    val df = (1L to 100L).toDF("id")
    val plan = Sampling.assignSplits(df, col("id"),
      Seq("a" -> 0.5, "b" -> 0.5), kFolds = 3, splitSalt = "x", foldSalt = "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "split assignment must not shuffle")
  }

  test("assignSplits: invalid arguments refused") {
    val df = (1L to 10L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, col("id"), Seq.empty, 2, "a", "b") }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, col("id"), Seq("a" -> 0.5, "a" -> 0.5), 2, "a", "b") }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, col("id"), Seq("a" -> 1.0), 0, "a", "b") }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, col("id"), Seq("a" -> -1.0, "b" -> 2.0), 2, "a", "b") }
  }

  test("capPerStratum: two-level top-N equals the flat smallest-key selection") {
    val df = (1L to 500L).map(i => (i, s"s${i % 7}")).toDF("id", "st")
    val got = Sampling.capPerStratum(df, col("st"), col("id"),
      cap = 10, salt = "q1", nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // flat reference selection: per stratum, the 10 smallest sample keys
    val keyed = df.withColumn("k", Sampling.sampleKey(col("id"), "q1"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = keyed.groupBy(_._2).values.flatMap(
      _.sortBy(t => (t._3, t._1)).take(10).map(t => (t._1, t._2))).toSet
    assert(got === want)
    assert(got.groupBy(_._2).values.forall(_.size == 10), "every stratum capped at 10")
    // strata smaller than the cap survive whole
    val small = Sampling.capPerStratum(
      Seq((1L, "a"), (2L, "a")).toDF("id", "st"), col("st"), col("id"),
      cap = 10, salt = "q1").count()
    assert(small === 2L)
    intercept[IllegalArgumentException] {
      Sampling.capPerStratum(df, col("st"), col("id"), cap = 0, salt = "q1") }
  }

  test("property: capPerStratum equals the flat top-N selection for random shapes") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(1, 300)
      k <- Gen.choose(1, 8)
      cap <- Gen.choose(1, 12)
      b <- Gen.choose(1, 7)
      salt <- Gen.alphaLowerStr.map(s => "p" + s.take(5))
    } yield (n, k, cap, b, salt)
    val prop = Prop.forAll(gen) { case (n, k, cap, b, salt) =>
      val df = (1L to n.toLong).map(i => (i, s"s${i % k}")).toDF("id", "st")
      val got = Sampling.capPerStratum(df, col("st"), col("id"), cap, salt, b)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val keyed = df.withColumn("kk", Sampling.sampleKey(col("id"), salt))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val want = keyed.groupBy(_._2).values.flatMap(
        _.sortBy(t => (t._3, t._1)).take(cap).map(t => (t._1, t._2))).toSet
      got == want
    }
    assert(check(Parameters.default.withMinSuccessfulTests(12), prop).passed)
  }

  test("property: splitBounds tiles the key space for arbitrary positive weights") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = Gen.nonEmptyListOf(Gen.choose(1, 1000)).map(_.take(6))
    val prop = Prop.forAll(gen) { ws =>
      val fr = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w / 100.0 }
      val b = Sampling.splitBounds(fr)
      b.last == Sampling.Modulus && b == b.sorted && b.forall(_ >= 0) &&
        b.length == fr.length
    }
    assert(check(Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }

  test("incrementalKeepFirst: drops index hits and batch-internal dups") {
    val existing = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA   beta"), // dup of indexed doc 1 after normalization
      (11L, "delta"),        // novel
      (12L, "delta"),        // batch-internal dup of 11
      (13L, "epsilon"),      // novel
      (14L, null.asInstanceOf[String])) // null text: not a dup of anything
      .toDF("doc_id", "text")
    val idx = Dedup.exactKeepFirst(existing, col("doc_id"), col("text"))
    val got = Dedup.incrementalKeepFirst(idx, batch, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(11L, 13L))
  }

  test("incrementalKeepFirst: index side never needs text (fp-only contract)") {
    val fpsOnly = Seq("alpha beta").toDF("text")
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
    val batch = Seq((1L, "alpha beta"), (2L, "new")).toDF("doc_id", "text")
    val got = Dedup.incrementalKeepFirst(fpsOnly, batch, col("doc_id"), col("text"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L))
  }
}
