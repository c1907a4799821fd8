package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.functions.expr.RollingHash
import graft.pipeline.{HtmlReport, Pipeline, ResultStore}
import graft.analyze.{Finding, Findings}

/** Native Catalyst expression (rolling_hash), winnowing, and the staged
  * pipeline runner + result store + HTML report.
  */
class ExpressionPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("rolling_hash: SQL registration, value parity, null safety") {
    // manual: ((97*31+98)*31+99) % p
    val expected = ((97L * 31 + 98) * 31 + 99) % 2147483647L
    assert(RollingHash.hash("abc") == expected)
    assert(spark.sql("SELECT rolling_hash('abc') AS h").as[Long].head() == expected)
    val viaColumn = Seq("abc").toDF("s").select(Text.rollingHash(col("s"))).as[Long].head()
    assert(viaColumn == expected)
    val nulls = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(Text.rollingHash(col("s")).as("h"))
    assert(nulls.filter(col("h").isNull).count() == 1)
  }

  test("rolling_hash survives whole-stage codegen over many rows") {
    val df = spark.range(1000).select(concat(lit("doc-"), col("id")).as("s"))
      .select(Text.rollingHash(col("s")).as("h"))
    val sample = df.collect().map(_.getLong(0))
    assert(sample.distinct.length > 990) // collisions possible but rare
    assert(sample(7) == RollingHash.hash("doc-7"))
  }

  test("vec_dot: SQL registration, HOF parity, null semantics") {
    import graft.functions.Vectors
    // bit-exact parity with the HOF fold it replaces
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.7f))).toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("native"), hof.as("hof"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bit mismatch: $r")
    }
    // SQL surface
    assert(spark.sql("SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .as[Double].head() == 11.0)
    // length mismatch and null input → NULL (zip_with padding semantics)
    val nulls = spark.sql(
      "SELECT vec_dot(array(1.0f), array(1.0f, 2.0f)) AS m, vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0f)) AS n")
    val row = nulls.head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    // double arrays work too
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS d")
      .as[Double].head() == 8.0)
  }

  test("sign_lsh: bit-parity differential vs the HOF form it replaced") {
    import graft.functions.Vectors
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 200).map { i =>
      i.toLong -> Array.fill(1 + rnd.nextInt(64))(rnd.nextFloat() * 2 - 1)
    }
    val df = vecs.toDF("id", "v")
    for (bits <- Seq(1, 4, 8); table <- Seq(0, 1, 3)) {
      val both = df.select(
        Vectors.signLsh(col("v"), bits, table).as("native"),
        Vectors.signLshHof(col("v"), bits, table).as("hof"))
      both.collect().foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"bits=$bits table=$table: native=${r.getLong(0)} hof=${r.getLong(1)}")
      }
    }
    // double arrays take the getDouble path
    val d = Seq(Array(0.5, -1.5, 2.25)).toDF("v").select(
      Vectors.signLsh(col("v"), 8, 0).as("native"),
      Vectors.signLshHof(col("v"), 8, 0).as("hof")).head()
    assert(d.getLong(0) == d.getLong(1))
    // NaN pins Spark/DuckDB comparison semantics deterministically (not
    // just when the property seed draws it): NaN ranks above every
    // value, so a NaN element sets every plane's bit in BOTH forms
    val nan = Seq(Array(1.0, Double.NaN, -3.0)).toDF("v").select(
      Vectors.signLsh(col("v"), 5, 0).as("native"),
      Vectors.signLshHof(col("v"), 5, 0).as("hof")).head()
    assert(nan.getLong(0) == 31L && nan.getLong(1) == 31L,
      s"NaN must set all 5 bits in both forms: native=${nan.getLong(0)} hof=${nan.getLong(1)}")
    // null parity: NULL array and null element both bucket to 0 in the
    // HOF form (null folds through when/otherwise) — native must match
    val nulls = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Float]]),
      (2L, Array[java.lang.Float](1.0f, null, 2.0f))).toDF("id", "v")
    val np = nulls.select(
      Vectors.signLsh(col("v"), 4, 0).as("native"),
      Vectors.signLshHof(col("v"), 4, 0).as("hof")).collect()
    np.foreach { r =>
      assert(!r.isNullAt(0) && r.getLong(0) == 0L, s"native null handling: $r")
      assert(r.getLong(0) == r.getLong(1), s"null parity: $r")
    }
    // SQL registration surface
    val viaSql = spark.sql("SELECT sign_lsh(array(1.0f, -2.0f, 0.5f), 4, 1) AS b").head().getLong(0)
    val viaCol = Seq(Array(1.0f, -2.0f, 0.5f)).toDF("v")
      .select(Vectors.signLsh(col("v"), 4, 1)).head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("sign_lsh: property parity vs HOF over dims 0-256, nulls, ±0.0/NaN, full table range") {
    // The example-based differential above pins table ∈ {0,1,3}; this
    // property run drives the parity CONTRACT — any Int table (negative,
    // and large enough that table*7919 wraps Int, where the pre-floorMod
    // native form silently diverged from the HOF's pmod), empty arrays,
    // null elements mid-array, signed zeros and NaN. NaN is the sharp
    // edge: Spark/DuckDB comparisons rank NaN above every value, so a
    // NaN element sets EVERY plane's bit — the pre-fix native form used
    // Java's NaN > 0 == false and returned bucket 0 instead.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.Vectors
    val specialF = Gen.oneOf(0.0f, -0.0f, Float.NaN, 1e30f, -1e-30f)
    val elemF: Gen[java.lang.Float] = Gen.frequency(
      8 -> Gen.chooseNum(-10f, 10f).map(java.lang.Float.valueOf),
      1 -> specialF.map(java.lang.Float.valueOf),
      1 -> Gen.const(null.asInstanceOf[java.lang.Float]))
    val arrF = Gen.choose(0, 256).flatMap(n => Gen.listOfN(n, elemF).map(_.toArray))
    val bitsGen = Gen.oneOf(1, 2, 5, 16, 63)
    val tableGen = Gen.oneOf(
      Gen.choose(-300000, 300000),
      // 271829*7919 and the extremes wrap Int — both forms must wrap identically
      Gen.oneOf(0, -1, 271829, Int.MaxValue, Int.MinValue))
    val propF = Prop.forAll(arrF, bitsGen, tableGen) { (a, bits, table) =>
      val r = Seq(Tuple1(a)).toDF("v").select(
        Vectors.signLsh(col("v"), bits, table).as("native"),
        Vectors.signLshHof(col("v"), bits, table).as("hof")).head()
      r.getLong(0) == r.getLong(1)
    }
    val resF = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), propF)
    assert(resF.passed, s"float-array parity: ${resF.status}")
    // double element type takes the getDouble path in the native bucket
    val elemD: Gen[java.lang.Double] = Gen.frequency(
      8 -> Gen.chooseNum(-10.0, 10.0).map(java.lang.Double.valueOf),
      1 -> Gen.oneOf(0.0, -0.0, Double.NaN).map(java.lang.Double.valueOf),
      1 -> Gen.const(null.asInstanceOf[java.lang.Double]))
    val arrD = Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, elemD).map(_.toArray))
    val propD = Prop.forAll(arrD, bitsGen, tableGen) { (a, bits, table) =>
      val r = Seq(Tuple1(a)).toDF("v").select(
        Vectors.signLsh(col("v"), bits, table).as("native"),
        Vectors.signLshHof(col("v"), bits, table).as("hof")).head()
      r.getLong(0) == r.getLong(1)
    }
    val resD = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), propD)
    assert(resD.passed, s"double-array parity: ${resD.status}")
  }

  test("minhash_sig: SQL registration, null contract, agg-pipeline parity") {
    import graft.functions.Hashing
    // SQL and Column surfaces agree
    val viaSql = spark.sql("SELECT minhash_sig(array('a b', 'b c'), 8) AS s")
      .head().getSeq[Long](0)
    val viaCol = Seq(Tuple1(Array("a b", "b c"))).toDF("sh")
      .select(Hashing.minhashSig(col("sh"), 8)).head().getSeq[Long](0)
    assert(viaSql == viaCol && viaSql.length == 8)
    // null contract: NULL array → NULL; all-null / empty array → NULL
    // (the historical agg form emits NO group for such docs — callers
    // filter nulls to keep that semantics)
    val edge = Seq(
      (1L, null.asInstanceOf[Array[String]]),
      (2L, Array.empty[String]),
      (3L, Array[String](null, null)),
      (4L, Array[String](null, "x", null))).toDF("doc_id", "sh")
      .select(col("doc_id"), Hashing.minhashSig(col("sh"), 4).as("sig"))
    val nulls = edge.collect().map(r => r.getLong(0) -> (r.get(1) == null)).toMap
    assert(nulls == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false),
      "null/empty/all-null shingle sets must yield NULL; null elements are skipped")
    // and the skipped-null signature equals the signature without them
    val noNull = Seq(Tuple1(Array("x"))).toDF("sh")
      .select(Hashing.minhashSig(col("sh"), 4)).head().getSeq[Long](0)
    val withNull = Seq(Tuple1(Array[String](null, "x", null))).toDF("sh")
      .select(Hashing.minhashSig(col("sh"), 4)).head().getSeq[Long](0)
    assert(noNull == withNull)
  }

  test("minhash_sig: property parity vs HOF and vs the explode/min-agg pipeline") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.Hashing
    // arbitrary shingle strings: unicode, empties, long runs — the md5
    // byte-fold must match conv(substring(md5(s),1,15),16,10) everywhere
    val shingle = Gen.frequency(
      4 -> Gen.alphaNumStr.map(_.take(24)),
      3 -> Gen.oneOf("", " ", "émoji ✓ 汉字", "a b c", "\u0000nul"),
      2 -> Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString),
      // null elements: native skips them, a no-non-null set is NULL --
      // the HOF twin must implement the same contract
      1 -> Gen.const(null.asInstanceOf[String]))
    val arr = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, shingle).map(_.toArray))
    val kGen = Gen.oneOf(1, 2, 64)
    val prop = Prop.forAll(arr, kGen) { (a, k) =>
      val r = Seq(Tuple1(a)).toDF("sh").select(
        Hashing.minhashSig(col("sh"), k).as("native"),
        Hashing.minhashSignature(col("sh"), k).as("hof")).head()
      r.getSeq[Long](0) == r.getSeq[Long](1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"native/HOF parity: ${res.status}")
    // whole-pipeline twin: per-row native signatures == explode → hash →
    // k min-aggregates, over a real tokenized corpus (shared shingle
    // builder, so any divergence is the signature stage itself)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content with other words entirely"),
      (4L, "short"),
      (5L, "")).toDF("doc_id", "text")
    val sets = graft.operators.Dedup.minhashSignatures(
      docs, col("doc_id"), col("text"), n = 3, k = 32)
    val setsDf = docs.select(col("doc_id"),
      array_sort(array_distinct(Text.shinglesOfToks(
        Text.tokens(Text.normalize(col("text"))), 3))).as("sh"))
    val agg = graft.operators.Dedup.minhashSignaturesAgg(setsDf, 32)
    val nat = sets.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val old = agg.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(nat == old, "native signature frame must equal the historical agg frame")
  }

  test("simhash60: SQL registration, null contract, parity vs HOF and agg pipeline") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.Hashing
    // SQL and Column surfaces agree
    val viaSql = spark.sql("SELECT simhash60(array('a', 'b', 'a')) AS h").head().getLong(0)
    val viaCol = Seq(Tuple1(Array("a", "b", "a"))).toDF("t")
      .select(Hashing.simhash(col("t"))).head().getLong(0)
    assert(viaSql == viaCol)
    // null contract: NULL array, empty array and all-null elements → 0
    // (parity with the explode_outer agg form keeping tokenless docs at
    // simhash 0); null elements are skipped
    val edge = Seq(
      (1L, null.asInstanceOf[Array[String]]),
      (2L, Array.empty[String]),
      (3L, Array[String](null, null)),
      (4L, Array[String](null, "x"))).toDF("id", "t")
      .select(col("id"), Hashing.simhash(col("t")).as("h"))
    val m = edge.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 0L && m(2L) == 0L && m(3L) == 0L)
    val justX = Seq(Tuple1(Array("x"))).toDF("t")
      .select(Hashing.simhash(col("t"))).head().getLong(0)
    assert(m(4L) == justX, "null elements must be skipped, not poison the code")
    // property parity vs the HOF twin — multiplicity matters
    // (frequency-weighted), so generate LISTS with repeats
    val tok = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(12)),
      3 -> Gen.oneOf("", "é✓", "the", "a"),
      // null tokens are skipped by the native expression; the HOF twin
      // must not null-poison its bit sums
      1 -> Gen.const(null.asInstanceOf[String]))
    val arr = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, tok).map(_.toArray))
    val prop = Prop.forAll(arr) { a =>
      val r = Seq(Tuple1(a)).toDF("t").select(
        Hashing.simhash(col("t")).as("native"),
        Hashing.simhash60(col("t")).as("hof")).head()
      r.getLong(0) == r.getLong(1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"native/HOF parity: ${res.status}")
    // whole-pipeline twin over a real corpus slice: per-row native ==
    // explode_outer → 60 sum-aggs (incl. a null-text doc)
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "completely different words"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val nat = graft.operators.Dedup.simhashes(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = graft.operators.Dedup.simhashesAgg(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat == agg, "native simhash frame must equal the historical agg frame")
  }

  test("video_hash60: SQL registration, null contract, property parity vs the Scala form") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.multimodal.Media
    // SQL and Column surfaces agree (nFrames literal form included)
    val viaSql = spark.sql(
      "SELECT video_hash60(cast('hello video world' AS BINARY)) AS h").head().getLong(0)
    val viaCol = Seq(Tuple1("hello video world")).toDF("t")
      .select(Media.videoHash60Col(col("t").cast("binary"))).head().getLong(0)
    assert(viaSql == viaCol)
    val sql4 = spark.sql(
      "SELECT video_hash60(cast('hello video world' AS BINARY), 4) AS h").head().getLong(0)
    assert(sql4 == Media.videoHash60("hello video world".getBytes("UTF-8"), 4))
    // untyped SQL NULL analyzes (ImplicitCastInputTypes) and honors the
    // documented NULL → 0 contract; bare strings coerce to binary
    assert(spark.sql("SELECT video_hash60(NULL) AS h").head().getLong(0) == 0L)
    assert(spark.sql("SELECT video_hash60('hello video world') AS h").head().getLong(0) == viaSql)
    // null contract: NULL and empty payloads → 0, non-nullable column
    val edge = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array.empty[Byte]),
      (3L, "x".getBytes("UTF-8"))).toDF("id", "b")
      .select(col("id"), Media.videoHash60Col(col("b")).as("h"))
    assert(!edge.schema("h").nullable)
    val m = edge.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 0L && m(2L) == 0L)
    assert(m(3L) == Media.videoHash60("x".getBytes("UTF-8")))
    // property parity: native expression vs the plain Scala function
    // over arbitrary payloads (incl. shorter than 64 bytes / 8 frames)
    val payload = Gen.choose(0, 2000).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)).map(_.toArray))
    val prop = Prop.forAll(payload) { b =>
      val native = Seq(Tuple1(b)).toDF("b")
        .select(Media.videoHash60Col(col("b"))).head().getLong(0)
      native == Media.videoHash60(b)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"native/Scala parity: ${res.status}")
  }

  test("word_ngrams: SQL registration, null/short-doc contract, property parity vs HOF") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // SQL and Column surfaces agree
    val viaSql = spark.sql("SELECT word_ngrams(array('a','b','c'), 2) AS g")
      .head().getSeq[String](0)
    assert(viaSql == Seq("a b", "b c"))
    // contract edges, each mirrored against the HOF twin below by the
    // property — pinned here deterministically:
    //   null array → [""], short array → one concat_ws shingle,
    //   null token inside a window → null shingle
    val edge = Seq(
      (1L, null.asInstanceOf[Array[String]]),
      (2L, Array.empty[String]),
      (3L, Array[String]("only", null)),
      (4L, Array[String]("a", null, "b", "c"))).toDF("id", "toks")
      .select(col("id"), Text.shinglesOfToks(col("toks"), 3).as("g"))
    val m = edge.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq(""))
    assert(m(2L) == Seq(""))
    assert(m(3L) == Seq("only"), "short-doc fallback joins NON-NULL tokens")
    assert(m(4L) == Seq(null, null), "null token nulls every window containing it")
    // property: any token array (nulls, empties, unicode), any n 1..6
    val tok = Gen.frequency(
      6 -> Gen.alphaNumStr.map(_.take(8)),
      1 -> Gen.oneOf("", "é✓", "x y"),
      2 -> Gen.const(null.asInstanceOf[String]))
    val arr = Gen.choose(0, 30).flatMap(k => Gen.listOfN(k, tok).map(_.toArray))
    val nGen = Gen.choose(1, 6)
    val prop = Prop.forAll(arr, nGen) { (a, n) =>
      val r = Seq(Tuple1(a)).toDF("toks").select(
        Text.shinglesOfToks(col("toks"), n).as("native"),
        Text.shinglesOfToksHof(col("toks"), n).as("hof")).head()
      r.getSeq[String](0) == r.getSeq[String](1)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"native/HOF parity: ${res.status}")
  }

  test("Quantizer + NearestCentroid: deterministic fit, argmin parity, null rows drop") {
    import graft.operators.Quantizer
    import graft.functions.expr.NearestCentroid
    // three well-separated blobs → k-means must place one centroid each
    val rnd = new scala.util.Random(7)
    val blobs = Seq(Array(0f, 0f), Array(10f, 10f), Array(-10f, 10f))
    val data: Array[Array[Float]] = Array.tabulate(300) { i =>
      val c = blobs(i % 3)
      Array(c(0) + rnd.nextFloat() * 0.5f, c(1) + rnd.nextFloat() * 0.5f)
    }
    val cb1 = Quantizer.fit(data, 3, seed = 42L)
    val cb2 = Quantizer.fit(data, 3, seed = 42L)
    assert(cb1.map(_.toSeq).toSeq == cb2.map(_.toSeq).toSeq, "fit must be deterministic")
    // every blob center has a centroid within its spread
    for (b <- blobs)
      assert(cb1.exists(c => math.abs(c(0) - b(0)) < 1 && math.abs(c(1) - b(1)) < 1),
        s"no centroid near blob ${b.toSeq}: ${cb1.map(_.toSeq).toSeq}")
    // NearestCentroid == brute-force argmin on random vectors, via the
    // SQL engine (exercises codegen), ties broken toward lower index
    val flat = cb1.flatten
    def brute(v: Array[Float]): Int =
      cb1.zipWithIndex.minBy { case (c, i) =>
        (c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, i)
      }._2
    val probes = Array.tabulate(50)(_ => Array(rnd.nextFloat() * 30 - 15, rnd.nextFloat() * 30 - 15))
    val df = probes.toSeq.map(Tuple1(_)).toDF("v").select(
      col("v"),
      org.apache.spark.sql.GraftColumnShim.column(
        NearestCentroid(org.apache.spark.sql.GraftColumnShim.expression(col("v")), flat, 3, 2))
        .as("cell"))
    val got = df.collect().map(r => (r.getSeq[Float](0).toArray, r.getInt(1)))
    for ((v, cell) <- got) assert(cell == brute(v), s"argmin mismatch at ${v.toSeq}")
    // null array and null element → NULL cell
    val nulls = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Float]]),
      (2L, Array[java.lang.Float](1.0f, null))).toDF("id", "v")
      .select(col("id"), org.apache.spark.sql.GraftColumnShim.column(
        NearestCentroid(org.apache.spark.sql.GraftColumnShim.expression(col("v")), flat, 3, 2))
        .as("cell"))
    assert(nulls.filter(col("cell").isNull).count() == 2)
    // degenerate sample: all-identical points with k = n must not loop/crash
    val flatData = Array.fill(4)(Array(1f, 1f))
    val cbFlat = Quantizer.fit(flatData, 4, seed = 1L)
    assert(cbFlat.length == 4)
    // k=1 must return the MEAN, not the k-means++ seed point (the
    // initial assignment equals the all-zero prev array, which once
    // skipped the first centroid update entirely)
    val line = Array(Array(0f, 0f), Array(2f, 0f), Array(4f, 6f))
    val cb1k = Quantizer.fit(line, 1, seed = 5L)
    assert(math.abs(cb1k(0)(0) - 2.0) < 1e-9 && math.abs(cb1k(0)(1) - 2.0) < 1e-9,
      s"k=1 centroid must be the mean, got ${cb1k(0).toSeq}")
  }

  test("winnowing: shared token runs produce shared fingerprints") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      ("a", s"unique prefix one two $shared"),
      ("b", s"$shared totally different suffix words here"),
      ("c", "nothing in common with the others at all ok")).toDF("id", "t")
      .select(col("id"), Text.winnowFingerprints(col("t"), 3, 4).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert((m("a") intersect m("b")).nonEmpty, "8-token shared run must share a fingerprint")
    assert((m("a") intersect m("c")).isEmpty)
  }

  test("TopK aggregator: per-group top-k with deterministic tiebreaks") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 30L, 2L), ("a", 20L, 3L), ("a", 30L, 4L),
      ("b", 5L, 9L)).toDF("g", "m", "id")
    val got = graft.operators.TopK.perGroup(df, Seq("g"), col("m"), col("id"), 2)
      .select("g", "rank", "metric", "id")
      .as[(String, Int, Long, Long)].collect().toSet
    // ties on metric resolve to the smaller id
    assert(got == Set(("a", 1, 30L, 2L), ("a", 2, 30L, 4L), ("b", 1, 5L, 9L)))
  }

  test("jaccardPairs df-cap: universal boilerplate shingle stays ~linear, stats stay exact") {
    // 40 docs share one boilerplate sentence (df=40 > cap=10) but are
    // otherwise unique; docs a/b genuinely overlap. With the cap, the
    // boilerplate shingles are excluded from candidate generation — no
    // f² pair blowup — while the reported inter/uni/jaccard for the
    // surviving pair must equal the uncapped (exact) run.
    val boiler = "all rights reserved by the original author"
    val filler = (0 until 40).map(i =>
      (i.toLong, s"$boiler unique$i token$i word$i item$i thing$i"))
    val real = Seq(
      (100L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      (101L, "spark catalyst optimizer rewrites logical plans into efficient physical plans"))
    val df = (filler ++ real).toDF("doc_id", "text")
    def run(cap: Int) = graft.operators.Dedup
      .jaccardPairs(df, col("doc_id"), col("text"), lit("x"), n = 3, minJaccard = 0.4, dfCap = cap)
      .select("d1", "d2", "inter", "uni", "jaccard")
      .as[(Long, Long, Int, Int, Double)].collect().toSet
    val capped = run(10)
    val exact = run(1000000)
    assert(capped.exists(p => p._1 == 100L && p._2 == 101L), s"real pair lost: $capped")
    // boilerplate-only pairs are below minJaccard in the exact run too,
    // so the capped result must be identical here — exactness preserved
    assert(capped == exact, s"capped=$capped exact=$exact")
  }

  test("TopKScored: randomized differential vs sort-based reference (with ties)") {
    val rnd = new scala.util.Random(42)
    // sims drawn from a tiny set to force plenty of ties; ids unique
    val rows = (0 until 500).map { i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(5) * 0.25, i.toLong)
    }
    val k = 4
    val got = rows.toDF("g", "sim", "id")
      .groupBy("g")
      .agg(graft.operators.TopK.topKScored(k)(col("sim"), col("id")).as("top"))
      .select(col("g"), col("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1))))
      .toMap
    val expected = rows.groupBy(_._1).view.mapValues { grp =>
      grp.map(t => (t._2, t._3)).sortBy { case (s, id) => (-s, id) }.take(k)
    }.toMap
    assert(got.keySet == expected.keySet)
    for (g <- expected.keys)
      assert(got(g) == expected(g), s"group $g: ${got(g)} vs ${expected(g)}")
  }

  test("TopKScored: NaN sims neither throw nor vanish; rank first like a desc window") {
    val rows = Seq(
      ("g", Double.NaN, 1L), ("g", 0.9, 2L), ("g", 0.8, 3L),
      ("g", Double.NaN, 4L), ("g", 0.7, 5L), ("g", -0.0, 6L), ("g", 0.0, 7L))
    val got = rows.toDF("g", "sim", "id")
      .groupBy("g")
      .agg(graft.operators.TopK.topKScored(4)(col("sim"), col("id")).as("top"))
      .select(explode(col("top.id")).as("id")).as[Long].collect().toSeq
    // NaN ranks largest (ids 1, 4), then 0.9, 0.8; -0.0 == 0.0 ties by id
    assert(got == Seq(1L, 4L, 2L, 3L), s"got $got")
  }

  test("knn requires integral ids with a clear error (no silent null cast)") {
    val base = Seq(("a", Array(1.0f, 0.0f)), ("b", Array(0.0f, 1.0f))).toDF("id", "emb")
    val qs = Seq(("q", Array(1.0f, 0.0f))).toDF("id", "emb")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Ann.knnBruteForce(
        base, col("id"), col("emb"), qs, col("id"), col("emb"), 1)
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("null-text docs produce no similarity pairs and no language guess") {
    val df = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "alpha beta gamma delta"), (4L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    // jaccard: the two null docs must NOT appear as jaccard-1.0 partners
    val jp = graft.operators.Dedup
      .jaccardPairs(df, col("doc_id"), col("text"), lit("x"), n = 3, minJaccard = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(jp == Set((3L, 4L)), s"null docs paired: $jp")
    // minhash: same contract
    val mp = graft.operators.Dedup
      .minhashPairs(df, col("doc_id"), col("text"), n = 3, k = 16, rowsPerBand = 2, minJaccard = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(mp == Set((3L, 4L)), s"null docs paired via minhash: $mp")
    // langId: null in, null out (not a confident 'de')
    val lang = Seq(null.asInstanceOf[String]).toDF("t")
      .select(graft.functions.Text.langId(col("t")).as("l")).collect()(0)
    assert(lang.isNullAt(0))
  }

  test("TopK aggregators reject k < 1 at construction") {
    intercept[IllegalArgumentException](new graft.operators.TopK.TopKScored(0))
    intercept[IllegalArgumentException](new graft.operators.TopK.TopKLongs(0))
    intercept[IllegalArgumentException](new graft.operators.TopK.TopKScored(-3))
  }

  test("exact dedup: null texts are not duplicates of each other") {
    val df = Seq(
      (1L, "same text"), (2L, "same text"),
      (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept = graft.operators.Dedup.exactKeepFirst(df, col("doc_id"), col("text"))
    assert(kept.count() == 1) // null rows neither keep nor group
    val groups = graft.operators.Dedup.exactGroups(df, col("doc_id"), col("text"))
    assert(groups.count() == 1)
    assert(groups.select("n").as[Long].head() == 2) // not a bogus 2-member null group
  }

  test("jaccardPairs: null block values still pair within the null block") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon", null.asInstanceOf[String]),
      (2L, "alpha beta gamma delta zeta", null.asInstanceOf[String]),
      (3L, "alpha beta gamma delta epsilon", "en"))
    .toDF("doc_id", "text", "lang")
    val pairs = graft.operators.Dedup
      .jaccardPairs(df, col("doc_id"), col("text"), col("lang"), n = 3, minJaccard = 0.3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"null-block docs must pair with each other: $pairs")
  }

  test("knn excludes zero-norm (NaN-sim) base vectors instead of ranking them first") {
    val base = Seq(
      (10L, Array(0.0f, 0.0f)), // zero-norm garbage
      (11L, Array(1.0f, 0.0f)), (12L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((1L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val got = graft.operators.Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), 2)
      .select("b_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L), s"zero-norm vector leaked into top-k: $got")
  }

  test("baseline diff summary handles heterogeneous category schemas") {
    import graft.analyze.BaselineDiff
    val procsCur = Seq((1L, "a.exe", "C:\\a")).toDF("pid", "name", "path")
    val procsBase = Seq((2L, "b.exe", "C:\\b")).toDF("pid", "name", "path")
    val listenCur = Seq(("0.0.0.0", 80L, "Listen")).toDF("local_address", "local_port", "state")
    val listenBase = Seq(("0.0.0.0", 443L, "Listen")).toDF("local_address", "local_port", "state")
    val s = BaselineDiff.summary(Seq(
      BaselineDiff.diff(procsCur, procsBase, Seq("pid"), "processes"),
      BaselineDiff.diff(listenCur, listenBase, Seq("local_address", "local_port"), "listeners")))
      .as[(String, String, Long)].collect().toSet
    assert(s == Set(
      ("processes", "added", 1L), ("processes", "removed", 1L),
      ("listeners", "added", 1L), ("listeners", "removed", 1L)))
  }

  test("jaccardPairs: randomized differential vs brute-force all-pairs") {
    val rnd = new scala.util.Random(9)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val corpus = (0 until 60).map { i =>
      val n = 4 + rnd.nextInt(6)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def shingleSet(text: String): Set[String] = {
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      (if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
       else Seq(toks.mkString(" "))).toSet
    }
    val sets = corpus.map { case (id, t) => id -> shingleSet(t) }.toMap
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      inter = (sets(a) intersect sets(b)).size
      uni = (sets(a) union sets(b)).size
      j = inter.toDouble / uni if j >= 0.2
    } yield (a, b, inter, uni)).toSet
    val got = graft.operators.Dedup
      .jaccardPairs(corpus.toDF("doc_id", "text"), col("doc_id"), col("text"),
        lit("x"), n = 3, minJaccard = 0.2, dfCap = 1000000)
      .select("d1", "d2", "inter", "uni")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("repeatedSpans: randomized differential vs brute-force window counting") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val boiler = "all rights reserved by the author" // 6 tokens → two 5-gram windows
    val corpus = (0 until 40).map { i =>
      val n = 3 + rnd.nextInt(10)
      val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, if (i % 3 == 0) s"$boiler $body" else body)
    } ++ Seq(
      (100L, "short doc"), (101L, "short doc"), (102L, "short doc"), // whole-text fallback
      (200L, s"$boiler $boiler"), (201L, s"$boiler $boiler")) // doc-internal repeats: n_occ > n_docs
    def windows(text: String): Seq[String] = {
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      if (toks.length >= 5) toks.sliding(5).map(_.mkString(" ")).toSeq
      else Seq(toks.mkString(" "))
    }
    val all = corpus.flatMap { case (id, t) => windows(t).map(id -> _) }
    val expected = all.groupBy(_._2).map { case (sp, occ) =>
      (sp, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.filter(_._2 >= 2).toSet
    assert(expected.exists { case (_, nd, no) => no > nd },
      "fixture has no doc-internal repeat — multiplicity untested")
    val got = graft.operators.Dedup.repeatedSpans(
      corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), n = 5, minDocs = 2)
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("repeatedSpanShare: exact per-document ratios; null text absent; guards") {
    import graft.operators.Dedup
    val shared = "one two three four five"
    val docs = Seq(
      (1L, s"$shared unique1 unique2"), // 3 windows, 1 repeated
      (2L, s"pre1 $shared"), // 2 windows, 1 repeated
      (3L, "totally different text entirely here"), // 1 window, 0 repeated
      (4L, null.asInstanceOf[String])) // no windows: absent
    val got = Dedup.repeatedSpanShare(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), n = 5, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 1L, 1.0 / 3.0),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0)))
    intercept[IllegalArgumentException](
      Dedup.repeatedSpans(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        n = 0, minDocs = 2))
    intercept[IllegalArgumentException](
      Dedup.repeatedSpans(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        n = 5, minDocs = 1))
  }

  test("Dedup.scoped: zero persisted blocks after a full dedup pipeline") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "completely different words entirely here now"),
      (4L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (nj, nm, ns, ng) = Dedup.scoped {
      val j = Dedup.jaccardPairs(df, col("doc_id"), col("text"), lit("x"),
        n = 3, minJaccard = 0.3).count()
      val mp = Dedup.minhashPairs(df, col("doc_id"), col("text"),
        n = 3, k = 16, rowsPerBand = 2, minJaccard = 0.3)
      val m = mp.count()
      val s = Dedup.simhashPairs(df, col("doc_id"), col("text")).count()
      val g = Dedup.groupPairs(mp).count()
      // caches ARE live inside the scope (the whole point of them)
      assert(spark.sparkContext.getPersistentRDDs.size > before.size)
      (j, m, s, g)
    }
    assert(nj > 0 && nm > 0 && ns > 0 && ng > 0)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after == before,
      s"leaked cache blocks after scope exit: ${after -- before}")
  }

  test("groupPairs: connected components labeled by component-min id") {
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L), (9L, 3L)).toDF("d1", "d2")
    val got = graft.operators.Dedup.groupPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("Clustering: fit recovers separated centers, assign is exact argmin, stats") {
    import graft.operators.Clustering
    // two tight blobs far apart; k = 2 must put one centroid in each
    val pts = (Seq.tabulate(20)(i => (i.toLong, Array(0.0f + i * 0.01f, 0f))) ++
      Seq.tabulate(20)(i => (100L + i, Array(10.0f + i * 0.01f, 0f))))
    val df = pts.toDF("vec_id", "embedding")
    val cb = Clustering.fit(df, col("vec_id"), col("embedding"), k = 2)
    assert(cb.length === 2 && cb(0).length === 2)
    val asg = Clustering.assign(df, col("vec_id"), col("embedding"), cb)
      .as[(Long, Int)].collect().toMap
    assert(asg.size === 40)
    // each blob lands whole in one cell, and the two cells differ
    val loCells = (0L to 19L).map(asg).toSet
    val hiCells = (100L to 119L).map(asg).toSet
    assert(loCells.size === 1 && hiCells.size === 1 && loCells != hiCells)
    // assignment is the true argmin over the returned codebook
    for ((id, vec) <- pts) {
      val d2 = cb.map(c => c.zip(vec.map(_.toDouble)).map { case (ci, xi) =>
        (xi - ci) * (xi - ci) }.sum)
      assert(d2(asg(id)) === d2.min, s"vec $id not argmin-assigned")
    }
    // stats is the per-cell occupancy
    val st = Clustering.stats(
      Clustering.assign(df, col("vec_id"), col("embedding"), cb))
      .as[(Int, Long)].collect().toMap
    assert(st.values.toSeq.sorted === Seq(20L, 20L))
    // null vector rows drop from assignment
    val withNull = pts.toDF("vec_id", "embedding")
      .unionByName(Seq((999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    assert(Clustering.assign(withNull, col("vec_id"), col("embedding"), cb).count() === 40)
  }

  test("keepComponentMin: one representative per cluster, singletons untouched") {
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("d1", "d2")
    val groups = graft.operators.Dedup.groupPairs(pairs)
    val corpus = (1L to 7L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.keepComponentMin(corpus, col("doc_id"), groups)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // {1,2,3} -> 1, {5,6} -> 5; 4 and 7 have no edges and survive
    assert(kept === Seq(1L, 4L, 5L, 7L))
    // original columns intact
    val cols = graft.operators.Dedup.keepComponentMin(corpus, col("doc_id"), groups).columns.toSeq
    assert(cols === Seq("doc_id", "text"))
  }

  test("pipeline: staged context flow, failure handling, stop_on_failure") {
    val init: Pipeline.Context = Map("src" -> Seq((1, "x")).toDF("id", "v"))
    val ok = Pipeline.run(Seq(
      "double" -> (ctx => ctx + ("doubled" -> ctx("src").withColumn("id", col("id") * 2))),
      "count" -> (ctx => ctx + ("n" -> ctx("doubled").agg(count(lit(1)).as("n"))))
    ), init)
    assert(!ok.failed && ok.context.contains("n"))
    assert(ok.stages.map(_.status) == Seq("completed", "completed"))

    val bad = Pipeline.run(Seq(
      "boom" -> (_ => throw new RuntimeException("nope")),
      "after" -> (ctx => ctx)
    ), init, stopOnFailure = true)
    assert(bad.failed)
    assert(bad.stages.map(_.status) == Seq("failed", "skipped"))

    val cont = Pipeline.run(Seq(
      "boom" -> (_ => throw new RuntimeException("nope")),
      "after" -> (ctx => ctx)
    ), init, stopOnFailure = false)
    assert(cont.stages.map(_.status) == Seq("failed", "completed"))
  }

  test("result store: timestamped save, newest-first load") {
    val dir = java.nio.file.Files.createTempDirectory("rs").toString
    ResultStore.save(Seq((1, "old")).toDF("id", "tag"), dir, "baseline", 1000L)
    ResultStore.save(Seq((2, "new")).toDF("id", "tag"), dir, "baseline", 2000L)
    ResultStore.save(Seq((9, "other")).toDF("id", "tag"), dir, "results", 1500L)
    val latest = ResultStore.loadLatest(spark, dir, "baseline").get
    assert(latest.select("tag").as[String].head() == "new")
    val recent = ResultStore.loadRecent(spark, dir, "baseline", 10)
    assert(recent.map(_._1) == Seq(2000L, 1000L))
    assert(ResultStore.loadLatest(spark, dir, "missing").isEmpty)
  }

  test("html report renders severity cards and top findings") {
    val fs = Findings.toDS(spark, Seq(
      Finding("Trojan found", "", "critical", "malware", "/x/a.exe", "av", "{}"),
      Finding("Odd listener", "", "medium", "network", "0.0.0.0:4444", "net", "{}"))).toDF()
    val html = HtmlReport.render(fs, "Daily scan")
    assert(html.contains("Daily scan"))
    assert(html.contains("sev-critical") && html.contains("Trojan found"))
    assert(html.contains("<td>network</td>"))
    // the severity grid is fixed-order and zero-filled — LOW/INFO cards
    // render even with no such findings
    assert(html.contains("LOW") && html.contains("INFO"))
    assert(html.indexOf("CRITICAL") < html.indexOf("HIGH"))
    assert(html.indexOf("HIGH") < html.indexOf("MEDIUM"))
  }

  test("html report: top-resource tables from the collector process frame") {
    val procs = graft.parse.ToolParsers.processes(
      spark.read.schema(graft.parse.ToolParsers.win32ProcessSchema)
        .option("multiLine", "true")
        .json("src/test/resources/fixtures/win32_process_output.json"))
    val tables = HtmlReport.resourceTables(procs, n = 2)
    assert(tables.map(_.label) ==
      Seq("Top RAM Users", "Top Thread Users", "Top Handle Users"))
    val ram = tables.head.rows
    assert(ram.head._1 == "bigtool.exe" && ram.head._3 == "3072 MB")
    assert(ram(1)._1 == "chrome.exe" && ram(1)._3 == "500 MB")
    val fs = Findings.toDS(spark, Seq(
      Finding("x", "", "low", "process", "r", "s", "{}"))).toDF()
    val html = HtmlReport.render(fs, "R", resources = tables)
    assert(html.contains("Top Resource Users") && html.contains("bigtool.exe"))
  }

  test("html report golden: byte-for-byte render of a fixed report") {
    // Full-surface render pinned against a checked-in golden file: card
    // grid order, severity/domain ordering, zero-fill, escaping, and the
    // resource/steps tables all regress loudly here (reference layout:
    // src/audit/reporting/html_report.py:349-495). Regenerate with
    // GRAFT_REGEN_GOLDEN=1 after an INTENDED layout change.
    val fs = Findings.toDS(spark, Seq(
      Finding("Trojan found", "d1", "critical", "malware", "/x/a.exe", "av", "{}"),
      Finding("Odd listener", "", "medium", "network", "0.0.0.0:4444", "net", "{}"),
      Finding("Quoted <tag> & \"attr\"", "", "low", "process", "r&d", "s", "{}"))).toDF()
    val steps = Seq(
      Pipeline.StageResult("collect", "completed", None, 1.5),
      Pipeline.StageResult("scan", "failed", Some("boom"), 0.5))
    val inv = Seq(
      HtmlReport.InventoryCard("3", "Processes"),
      HtmlReport.InventoryCard("42", "Connections", "3L/8E"))
    val resources = Seq(HtmlReport.ResourceTable(
      "Top RAM Users", Seq(("big.exe", 42L, "3072 MB", "C:\\big.exe"))))
    val baseline = HtmlReport.BaselineSection(firstRun = false,
      Seq(("listeners", 2L, 0L), ("processes", 1L, 3L)))
    val html = HtmlReport.render(
      fs, "Golden Audit", inventory = inv, steps = steps, resources = resources,
      baseline = Some(baseline))
    val golden = java.nio.file.Paths.get("src/test/resources/golden/html_report.html")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.createDirectories(golden.getParent)
      java.nio.file.Files.writeString(golden, html)
    }
    // never auto-regenerate on a missing golden: comparing a render
    // against a file this test just wrote would pass vacuously on any
    // checkout where the golden was deleted or the cwd resolves elsewhere
    assert(java.nio.file.Files.exists(golden),
      s"golden file missing at ${golden.toAbsolutePath} — run with GRAFT_REGEN_GOLDEN=1 to (re)create it")
    val expected = java.nio.file.Files.readString(golden)
    if (html != expected) {
      val i = html.zip(expected).indexWhere { case (a, b) => a != b }
      val at = if (i >= 0) i else math.min(html.length, expected.length)
      fail(s"golden mismatch at char $at: " +
        s"got …${html.slice(at - 40, at + 40)}… expected …${expected.slice(at - 40, at + 40)}…")
    }
  }

  test("html report: inventory cards and pipeline steps sections") {
    val fs = Findings.toDS(spark, Seq(
      Finding("Trojan found", "", "critical", "malware", "/x/a.exe", "av", "{}"))).toDF()
    val conns = Seq(("Listen", 1L), ("Established", 2L), ("Established", 3L))
      .toDF("state", "pid")
    val inv = HtmlReport.inventoryFrom(
      processes = Some(Seq(1, 2, 3).toDF("pid")),
      connections = Some(conns),
      tasks = Some(Seq(1, 2).toDF("t")),
      runKeys = Some(Seq(1).toDF("k")))
    val steps = Seq(
      Pipeline.StageResult("collect", "completed", None, 1.5),
      Pipeline.StageResult("scan", "failed", Some("boom"), 0.5))
    val html = HtmlReport.render(fs, "Audit", inventory = inv, steps = steps)
    assert(html.contains("System Inventory"))
    assert(html.contains("Processes") && html.contains("1L/2E"))
    assert(html.contains("2T/1K"))
    assert(html.contains("Pipeline Steps"))
    assert(html.contains("boom"))
    assert(html.contains("FAILED")) // a failed step fails the pipeline status card
  }

  test("html report: baseline comparison section (first run / clean / diff table)") {
    // the three states of html_report.py's _section_baseline_diff
    val fs = Findings.toDS(spark, Seq(
      Finding("x", "", "low", "process", "r", "s", "{}"))).toDF()
    val first = HtmlReport.render(fs, "B",
      baseline = Some(HtmlReport.BaselineSection(firstRun = true, Nil)))
    assert(first.contains("Baseline Comparison") && first.contains("First run"))
    val clean = HtmlReport.render(fs, "B",
      baseline = Some(HtmlReport.BaselineSection(firstRun = false, Nil)))
    assert(clean.contains("No changes detected since last baseline."))
    // diff-table state built through the BaselineDiff.summary adapter:
    // the rollup's (category, change_type, count) rows land as
    // per-category +added/-removed cells, zero-filled per side
    val cur = Seq(("a:80", "x"), ("b:81", "y")).toDF("key", "v")
    val base = Seq(("a:80", "x"), ("c:82", "z")).toDF("key", "v")
    val summary = graft.analyze.BaselineDiff.summary(Seq(
      graft.analyze.BaselineDiff.diff(cur, base, Seq("key"), "listeners")))
    val sect = HtmlReport.baselineFrom(summary)
    assert(sect.rows == Seq(("listeners", 1L, 1L)) && sect.totalChanges == 2)
    val html = HtmlReport.render(fs, "B", baseline = Some(sect))
    assert(html.contains("2 change(s) detected since last baseline."))
    assert(html.contains("<td>listeners</td><td class=\"pass\">+1</td><td class=\"fail\">-1</td>"))
    // absent baseline (None) renders no section at all
    assert(!HtmlReport.render(fs, "B").contains("Baseline Comparison"))
  }

  test("prefixJaccardPairs: lossless vs brute-force token Jaccard at 3/5") {
    import spark.implicits._
    // small-vocabulary docs: heavy token overlap, several pairs exactly
    // AT the threshold (5·inter == 3·uni) where a float compare flaps
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (1L to 40L).map { i =>
      val n = 3 + rnd.nextInt(6)
      i -> rnd.shuffle(vocab).take(n).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    def toks(t: String) = t.split("\\s+").toSet
    val brute = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib
      i = toks(ta).intersect(toks(tb)).size
      u = toks(ta).size + toks(tb).size - i
      if 5 * i >= 3 * u
    } yield (ia, ib, i, u)).toSet
    val got = graft.operators.Dedup.scoped {
      graft.operators.Dedup
        .prefixJaccardPairs(df, col("doc_id"), col("text"), tNum = 3, tDen = 5,
          n = 1) // unigram sets keep the brute-force reference trivial
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
    }
    assert(got === brute)
    assert(brute.exists { case (_, _, i, u) => 5 * i == 3 * u },
      "fixture must include an exactly-at-threshold pair")
  }

  test("ndcgAtK: perfect ranking 1.0, miss 0.0, displaced hit discounted") {
    import spark.implicits._
    def rk(rows: Seq[(Long, Long, Int)]) = rows.toDF("q_id", "b_id", "rank")
    val exact = rk(Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2)))
    // q1: perfect; q2: the two hits swapped (still NDCG 1.0 — binary
    // relevance is position-set based); q3: one hit displaced to rank 2,
    // one true neighbor missed
    val approx = rk(Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 21L, 1), (2L, 20L, 2),
      (3L, 99L, 1), (3L, 30L, 2)))
    val got = graft.operators.Ann.ndcgAtK(approx, exact, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val w = graft.operators.Ann.ndcgDiscounts(2)
    assert(got(1L) === ((2L, 1.0)))
    assert(got(2L) === ((2L, 1.0)))
    assert(got(3L) === ((1L, w(1) / (w(0) + w(1)))))
    // a query the approximate ranking misses entirely scores (0, 0.0)
    val got4 = graft.operators.Ann.ndcgAtK(
      rk(Seq((1L, 99L, 1))), rk(Seq((1L, 10L, 1), (4L, 40L, 1))), k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got4 === Map(1L -> ((0L, 0.0)), 4L -> ((0L, 0.0))))
    // IDCG is per query: an exact list SHORTER than k (1 entry, k=3)
    // with a perfect approximate hit reaches exactly 1.0 — the old
    // constant-IDCG normalization capped it at w(0)/Σw
    val got5 = graft.operators.Ann.ndcgAtK(
      rk(Seq((1L, 10L, 1), (1L, 98L, 2), (1L, 99L, 3))),
      rk(Seq((1L, 10L, 1))), k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got5 === Map(1L -> ((1L, 1.0))))
    // displaced hit against a short exact list: discount w(1), ideal w(0)
    val got6 = graft.operators.Ann.ndcgAtK(
      rk(Seq((2L, 99L, 1), (2L, 20L, 2))), rk(Seq((2L, 20L, 1))), k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val w3 = graft.operators.Ann.ndcgDiscounts(3)
    assert(got6 === Map(2L -> ((1L, w3(1) / w3(0)))))
    // out-of-contract input — duplicate (q_id, b_id) rows in `exact`
    // push n_ex past k; the IDCG lookup clamps to the k-entry table
    // instead of returning null (ANSI off) / throwing (ANSI on)
    val dupEx = rk(Seq((1L, 10L, 1), (1L, 10L, 1), (1L, 11L, 2)))
    val got7 = graft.operators.Ann.ndcgAtK(
      rk(Seq((1L, 10L, 1), (1L, 11L, 2))), dupEx, k = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!got7(1L).isNaN && got7(1L) > 0.0,
      "duplicate exact pairs must degrade, not corrupt the ndcg column")
  }

  test("result store: an EMPTY saved set loads as an empty frame with the caller's schema") {
    val dir = java.nio.file.Files.createTempDirectory("rs-empty").toString
    // a clean-system baseline: zero findings is a legitimate state —
    // the JSON sink writes only _SUCCESS, and read.json on that throws
    // 'Unable to infer schema' without the fallback
    val empty = Findings.toDS(spark, Nil).toDF()
    ResultStore.save(empty, dir, "baseline", 1000L)
    val loaded = ResultStore.loadLatest(
      spark, dir, "baseline", Some(Findings.schema)).get
    assert(loaded.count() === 0L)
    assert(loaded.schema === Findings.schema)
    // downstream shapes that crashed before the guard: per-domain
    // rollup (baseline show) and the diff path both run on the frame
    assert(loaded.groupBy("domain").count().collect().isEmpty)
    val recent = ResultStore.loadRecent(
      spark, dir, "baseline", 5, Some(Findings.schema))
    assert(recent.map(_._1) === Seq(1000L) && recent.head._2.count() === 0L)
    // without a fallback the schema-agnostic contract is preserved: the
    // read either throws outright or yields a SCHEMA-LESS frame — both
    // crash the first column access, which is what the fallback fixes
    intercept[Exception] {
      ResultStore.loadLatest(spark, dir, "baseline").get
        .groupBy("domain").count().collect()
    }
  }

  test("result store: an all-null column survives the JSON round-trip when the schema is applied") {
    import org.apache.spark.sql.functions.col
    // Spark's JSON writer OMITS null fields per record, so a non-empty
    // set whose rows all carry severity=null infers a schema MISSING
    // the column — the same crash class the zero-row fallback fixed,
    // on a set that HAS data. The applied schema reads it back as a
    // present, all-null column.
    val dir = java.nio.file.Files.createTempDirectory("rs-nullcol").toString
    val rows = Seq(
      ("t", "d", null: String, "network", "r", "netstat", "{}"))
      .toDF(Findings.schema.fieldNames.toIndexedSeq: _*)
    ResultStore.save(rows, dir, "scan", 1000L)
    val loaded = ResultStore.loadLatest(
      spark, dir, "scan", Some(Findings.schema)).get
    assert(loaded.schema === Findings.schema)
    assert(loaded.count() === 1L)
    // the filter that crashed with the inferred (column-less) schema
    assert(loaded.filter(col("severity").isNull).count() === 1L)
  }
}
