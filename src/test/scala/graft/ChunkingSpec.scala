package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

/** [[graft.operators.Chunking]] — overlapping token-window splitting.
  * The t13 oracle replays every chunk cross-engine; these specs pin
  * the window arithmetic, coverage, the degeneracies, and the
  * shuffle-free plan.
  */
class ChunkingSpec extends SparkSpecBase {

  import spark.implicits._

  test("hand-computed windows: starts, overlap, short tail") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6: [t1..t4][t4..t7][t7..t10]
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunk(df, col("doc_id"), col("text"), window = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10")))
    // 11 tokens → a 4th, SHORT chunk [t10 t11]
    val df2 = Seq((1L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got2 = Chunking.chunk(df2, col("doc_id"), col("text"), window = 4, stride = 3)
      .orderBy("chunk_idx").collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got2.length === 4)
    assert(got2.last === ((3, 2, "t10 t11")))
  }

  test("n <= window yields one whole-document chunk; empty/null yield none") {
    val df = Seq(
      (1L, "a b c"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Chunking.chunk(df, col("doc_id"), col("text"), window = 8, stride = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(got.toSeq === Seq((1L, 0, "a b c")))
  }

  test("coverage: every token position appears in at least one chunk") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 40).map(i =>
      (i.toLong, (1 to (1 + rnd.nextInt(200))).map(j => s"w$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val got = Chunking.chunk(df, col("doc_id"), col("text"), window = 16, stride = 11)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val byDoc = got.groupBy(_._1)
    docs.foreach { case (id, text) =>
      val n = text.split(" ").length
      val covered = byDoc(id).map { case (_, idx, len) => (idx * 11, idx * 11 + len) }
        .sortBy(_._1)
      // windows tile with stride <= window: contiguous coverage of [0, n)
      assert(covered.head._1 === 0)
      assert(covered.map(_._2).max === n, s"doc $id: last window must end at $n")
      covered.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 <= e1, s"doc $id: gap at $s2")
        case _ =>
      }
    }
  }

  test("chunk_fp is the md5 of the chunk text; invalid strides refused") {
    val df = Seq((1L, "x y z")).toDF("doc_id", "text")
    val r = Chunking.chunk(df, col("doc_id"), col("text"), window = 2, stride = 1)
      .orderBy("chunk_idx").collect()
    r.foreach { row =>
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(row.getString(3).getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(row.getString(4) === want)
    }
    intercept[IllegalArgumentException](
      Chunking.chunk(df, col("doc_id"), col("text"), window = 4, stride = 5))
    intercept[IllegalArgumentException](
      Chunking.chunk(df, col("doc_id"), col("text"), window = 0, stride = 1))
  }

  test("chunkDupShare: shared blocks flagged, own repeats are not cross-doc") {
    val block = (1 to 4).map(i => s"b$i").mkString(" ") // one full 4-token chunk
    val df = Seq(
      // doc 1: shared block + unique tail chunk
      (1L, s"$block u1 u2 u3 u4"),
      // doc 2: the same block twice (own repeat) + unique chunk
      (2L, s"$block $block v1 v2 v3 v4"),
      // doc 3: fully unique
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val got = Chunking.chunkDupShare(df, col("doc_id"), col("text"), window = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc1: 2 chunks, block is cross-doc → 1 dup
    assert(got(1L) === ((2L, 1L, 0.5)))
    // doc2: 3 chunks, BOTH block copies count as dup rows (the block IS
    // cross-doc); the repeat alone would not have made it one
    assert(got(2L) === ((3L, 2L, 2.0 / 3.0)))
    assert(got(3L) === ((2L, 0L, 0.0)))
  }

  test("chunkDupShare hot-fp split: a boilerplate fp owning half the corpus broadcasts, answers unchanged") {
    // one boilerplate block in EVERY doc (~50% of all chunks) — the
    // skew shape that floods one reducer of a plain fp-keyed join —
    // plus a block shared by exactly two docs (stays cold at
    // hotMinDocs = 3) and unique tails
    val boiler = (1 to 4).map(i => s"h$i").mkString(" ")
    val pair = (1 to 4).map(i => s"p$i").mkString(" ")
    val df = (1L to 40L).map { i =>
      val tail = (1 to 4).map(j => s"u${i}_$j").mkString(" ")
      val mid = if (i <= 2) s" $pair" else ""
      (i, s"$boiler$mid $tail")
    }.toDF("doc_id", "text")
    def run(hotMinDocs: Int) = graft.operators.Dedup.scoped {
      Chunking.chunkDupShare(df, col("doc_id"), col("text"), window = 4,
        hotMinDocs = hotMinDocs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toSeq.sortBy(_._1)
    }
    val split = run(3) // boiler (40 docs) hot, pair (2 docs) cold
    val allCold = run(1000000) // everything cold: the plain join path
    assert(split === allCold, "hot/cold split must not change any answer")
    // docs 1-2: boiler + pair + tail = 3 chunks, 2 cross-doc
    assert(split.take(2).forall(_._2 == ((3L, 2L, 2.0 / 3.0))), split.take(2).toString)
    // the rest: boiler + tail = 2 chunks, 1 cross-doc
    assert(split.drop(2).forall(_._2 == ((2L, 1L, 0.5))), split.drop(2).take(2).toString)
    // plan shape: the hot-slice attach is AQE-decided — after execution
    // the FINAL adaptive plan must have converted the small built hot
    // slice to a broadcast join (its key never enters a shuffled join);
    // an oversized hot slice would keep the shuffled join with the SAME
    // output, which is the whole point of deciding at runtime
    val q = graft.operators.Dedup.scoped {
      val d = Chunking.chunkDupShare(df, col("doc_id"), col("text"), window = 4,
        hotMinDocs = 3)
      d.collect()
      d
    }
    assert(q.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "AQE must convert the small hot-fp slice to a broadcast join at runtime")
    spark.catalog.clearCache()
  }

  test("plan shape: narrow — no shuffle at any corpus size") {
    val df = (1 to 100).map(i => (i.toLong, s"a b c d e f g h i$i")).toDF("doc_id", "text")
    val plan = Chunking.chunk(df, col("doc_id"), col("text"), window = 4, stride = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
  }

  test("chunkShareEdges: shared chunks edge, df cap drops boilerplate, CC transitivity") {
    // window=3, non-overlapping chunks. Docs 1/2 share chunk "x x x";
    // docs 2/3 share chunk "y y y"; doc 4 is unique; docs 5..9 all share
    // the boilerplate chunk "b b b" (5 docs > dfCap=4 → NO edges from it).
    val mk = (chunks: Seq[String]) => chunks.mkString(" ")
    val df = Seq(
      (1L, mk(Seq("x x x", "p p p"))),
      (2L, mk(Seq("x x x", "y y y"))),
      (3L, mk(Seq("y y y", "q q q"))),
      (4L, mk(Seq("u u u"))),
      (5L, mk(Seq("b b b", "m5 m5 m5"))),
      (6L, mk(Seq("b b b", "m6 m6 m6"))),
      (7L, mk(Seq("b b b", "m7 m7 m7"))),
      (8L, mk(Seq("b b b", "m8 m8 m8"))),
      (9L, mk(Seq("b b b", "m9 m9 m9")))).toDF("doc_id", "text")
    val edges = Chunking.chunkShareEdges(
      df, col("doc_id"), col("text"), window = 3, dfCap = 4)
      .as[(Long, Long)].collect().toSet
    assert(edges === Set((1L, 2L), (2L, 3L)),
      "one edge per sharing pair, boilerplate fp over the cap emits none")
    // the chain 1-2-3 is ONE component labeled by its min id
    val groups = graft.operators.Dedup.groupPairs(
      Chunking.chunkShareEdges(df, col("doc_id"), col("text"), window = 3, dfCap = 4))
      .as[(Long, Long)].collect().toMap
    assert(groups === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a doc sharing the SAME chunk twice still yields one edge (distinct)
    val dup = Seq((1L, "x x x x x x"), (2L, "x x x")).toDF("doc_id", "text")
    val e2 = Chunking.chunkShareEdges(dup, col("doc_id"), col("text"), window = 3, dfCap = 4)
      .as[(Long, Long)].collect().toSeq
    assert(e2 === Seq((1L, 2L)))
    // cap below 2 refused
    assertThrows[IllegalArgumentException] {
      Chunking.chunkShareEdges(df, col("doc_id"), col("text"), window = 3, dfCap = 1)
    }
  }
}
