package graft

import org.apache.spark.sql.functions._

import graft.etl.Zorder

/** [[graft.etl.Zorder]] — Morton-curve file clustering. Pins the two
  * properties the layout exists for: written content is row-identical
  * to the input, and BOTH clustered dimensions confine their
  * predicates to a subset of files (where a 1-D sort only serves its
  * own column).
  */
class ZorderSpec extends SparkSpecBase {

  private def filesMatching(dir: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(dir).filter(pred)
      .select(input_file_name()).distinct().count()

  test("writeClustered re-clusters a lake IN PLACE (df reads from the target path)") {
    // the primary production shape: a direct overwrite either trips
    // Spark's self-overwrite check or deletes the source mid-plan; the
    // tmp+swap write must make this just work, crash-safe
    val orders = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_inplace").toString + "/lake"
    orders.write.parquet(dir)
    val self = spark.read.parquet(dir)
    Zorder.writeClustered(self, dir, Seq("o_custkey", "o_totalprice"), 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === orders.count())
    assert(back.except(orders).isEmpty && orders.except(back).isEmpty)
    // no swap residue
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent == Seq("lake"), s"swap residue: $parent")
  }

  test("content identical; both z dimensions skip files where 1-D sort can't") {
    val orders = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val nFiles = 16

    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Zorder.writeClustered(orders, zDir, Seq("o_custkey", "o_totalprice"), nFiles)

    // 1-D control: same file count, clustered on custkey alone
    val oneDir = java.nio.file.Files.createTempDirectory("graft_zorder_1d").toString
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(oneDir)

    // row-identical content (layout only)
    val back = spark.read.parquet(zDir)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).count() === 0 && orders.exceptAll(back).count() === 0)

    // ~10%-of-domain predicates on each dimension
    val ck = orders.agg(min("o_custkey"), max("o_custkey")).head()
    val (ckLo, ckHi) = (ck.getLong(0), ck.getLong(1))
    val ckMid = ckLo + (ckHi - ckLo) / 2
    val ckW = math.max((ckHi - ckLo) / 20, 1L)
    val custPred = col("o_custkey").between(ckMid - ckW, ckMid + ckW)

    val tp = orders.agg(min("o_totalprice"), max("o_totalprice")).head()
    val (tpLo, tpHi) = (tp.getDouble(0), tp.getDouble(1))
    val tpMid = tpLo + (tpHi - tpLo) / 2
    val tpW = (tpHi - tpLo) / 20
    val pricePred = col("o_totalprice").between(tpMid - tpW, tpMid + tpW)

    val allZ = filesMatching(zDir, lit(true))
    val zCust = filesMatching(zDir, custPred)
    val zPrice = filesMatching(zDir, pricePred)
    val oneCust = filesMatching(oneDir, custPred)
    val onePrice = filesMatching(oneDir, pricePred)

    // sanity: predicates select rows, and the 1-D layout serves its
    // own column well
    assert(spark.read.parquet(zDir).filter(custPred).count() > 0)
    assert(spark.read.parquet(zDir).filter(pricePred).count() > 0)
    assert(oneCust < allZ)

    // the z layout confines BOTH dimensions...
    assert(zCust < allZ, s"custkey matches spread over all $allZ z files")
    assert(zPrice < allZ, s"totalprice matches spread over all $allZ z files")
    // ...while the 1-D layout cannot confine the column it's not
    // sorted by: z must strictly beat it there
    assert(zPrice < onePrice,
      s"z-order read $zPrice files for the price box; 1-D custkey layout read $onePrice")
  }

  test("4-column keys stay clear of the sign bit (top corner sorts last, not first)") {
    import spark.implicits._
    val df = Seq((1.0, 1.0, 1.0, 1.0), (0.0, 0.0, 0.0, 0.0))
      .toDF("a", "b", "c", "d")
    val z = df.select(Zorder.zvalue(
      Seq(col("a"), col("b"), col("c"), col("d")),
      Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0, 1.0)).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z(0) === (1L << 60) - 1) // all 60 lane bits set, positive
    assert(z(1) === 0L)
    assert(z.forall(_ >= 0L), "a 64-bit interleave would flip the sign here")
  }

  test("degenerate and null lanes: constant column contributes nothing, rows survive") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0), (3L, 5.0, 3.0))
      .toDF("id", "const_col", "x")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_deg").toString
    Zorder.writeClustered(df, dir, Seq("const_col", "x"), 2)
    assert(spark.read.parquet(dir).count() === 3)

    val dfn = Seq((1L, Some(1.0), 1.0), (2L, None, 2.0), (3L, Some(3.0), 3.0))
      .toDF("id", "maybe", "x")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zorder_null").toString
    Zorder.writeClustered(dfn, dir2, Seq("maybe", "x"), 2)
    assert(spark.read.parquet(dir2).count() === 3)
  }

  test("z01: scan METRICS prove skipping — clustered scan decodes fewer rows than the lake holds") {
    // the oracle pins z01's CONTENT; this pins the point of the
    // layout: the parquet reader's row-group min/max pruning actually
    // fires on the clustered lake (scan outputs ≪ table rows), and
    // CANNOT fire on a round-robin control of the same file count
    def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          unwrap(a.executedPlan).sum
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }
      unwrap(df.queryExecution.executedPlan).sum
    }
    val li = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber")
    val total = li.count()
    val pred = col("l_orderkey").between(1000, 3000) && col("l_partkey").between(100, 400)

    val zDir = java.nio.file.Files.createTempDirectory("graft_z01_z").toString
    Zorder.writeClustered(li, zDir, Seq("l_orderkey", "l_partkey"), 16)
    val zRead = scanOutputRows(spark.read.parquet(zDir).filter(pred))

    val rrDir = java.nio.file.Files.createTempDirectory("graft_z01_rr").toString
    li.repartition(16).write.mode("overwrite").parquet(rrDir)
    val rrRead = scanOutputRows(spark.read.parquet(rrDir).filter(pred))

    val matches = spark.read.parquet(zDir).filter(pred).count()
    assert(matches > 0, "predicate selects nothing — test is vacuous")
    assert(zRead < total,
      s"z-clustered scan decoded all $total rows — no row group was skipped")
    assert(rrRead == total,
      s"round-robin control skipped rows ($rrRead < $total) — control invalid")
    assert(zRead * 2 < total,
      s"z scan decoded $zRead of $total — skipping too weak to matter")
    // and z01's own served result is exactly the predicate's rows
    val z01 = graft.queries.CurationQueries.z01ZorderSkip(spark, sfDir)
    assert(z01.count() == graft.Tables.t(spark, sfDir, "lineitem").filter(pred).count())
  }

  test("a ±Inf row does not poison the stats: finite rows keep distinct lanes") {
    import spark.implicits._
    // one +Inf row used to set mx=Inf, sending every FINITE row of the
    // column to lane 0 and silently destroying its clustering; with
    // finite-only stats the z-keys of the finite rows are unchanged
    val finiteRows = (0 until 64).map(i => (i.toLong, i.toDouble, (63 - i).toDouble))
    val clean = finiteRows.toDF("id", "a", "b")
    val dirty = (finiteRows :+ ((999L, Double.PositiveInfinity, 1.0)) :+
      ((998L, Double.NegativeInfinity, 2.0))).toDF("id", "a", "b")
    def zkeys(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val aggs = Seq("a", "b").flatMap(c => Seq(
        min(when(!isnan(col(c)) && abs(col(c)) < lit(Double.PositiveInfinity), col(c))).as(s"mn_$c"),
        max(when(!isnan(col(c)) && abs(col(c)) < lit(Double.PositiveInfinity), col(c))).as(s"mx_$c")))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      df.select(col("id"), Zorder.zvalue(Seq(col("a"), col("b")),
        Seq(r.getDouble(0), r.getDouble(2)), Seq(r.getDouble(1), r.getDouble(3))).as("z"))
        .as[(Long, Long)].collect().toMap
    }
    val zClean = zkeys(clean)
    val zDirty = zkeys(dirty)
    for ((id, z) <- zClean)
      assert(zDirty(id) == z, s"finite row $id moved lanes because of an Inf row")
    assert(zClean.values.toSet.size > 32, "finite rows collapsed into few lanes")
    // ±Inf rows survive the write and sort to their range's ends
    assert(zDirty(999L) > zDirty(998L), "+Inf should lane above −Inf")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_inf").toString
    Zorder.writeClustered(dirty.toDF(), dir, Seq("a", "b"), 2)
    assert(spark.read.parquet(dir).count() === 66)
  }
}
