package graft

import org.apache.spark.sql.types._

/** Regression net for driver testdata regeneration (TESTDATA.md): the
  * driver REWRITES `/root/testdata` between rounds and the parquet
  * schemas have drifted before (round 7: `events.ts` went
  * TIMESTAMP(NANOS)-read-as-long → TIMESTAMP_NTZ micros, and a whole
  * query family failed as five unrelated oracle errors). This spec
  * pins the ADAPTED contract — what the engine relies on after
  * [[Tables]]' per-schema adaptation — one assertion per table, so the
  * next drift fails in seconds with a named table and column instead
  * of as mysterious downstream mismatches.
  *
  * Deliberately tolerant where the adapters are tolerant: `events.ts`
  * may arrive as LongType (nanos) or TimestampType*; everything else
  * is pinned exactly.
  */
class TestdataContractSpec extends SparkSpecBase {

  /** name -> expected Spark type, per column, in order. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"testdata contract: $table") {
      val schema = Tables.t(spark, sfDir, table).schema
      assert(schema.fieldNames.toSeq === cols.map(_._1),
        s"-- $table column set/order drifted (regenerate adapters?)")
      for ((name, tpe) <- cols) {
        // containsNull/nullable flags are driver-side noise — compare
        // the value types the engine actually relies on
        def strip(dt: DataType): DataType = dt match {
          case ArrayType(e, _) => ArrayType(strip(e))
          case other => other
        }
        assert(strip(schema(name).dataType) === strip(tpe),
          s"-- $table.$name type drifted")
      }
    }
  }

  test("testdata contract: events (ts adapts long-nanos or timestamp)") {
    val df = Tables.t(spark, sfDir, "events")
    assert(df.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "-- events column set/order drifted")
    val tsType = df.schema("ts").dataType
    assert(tsType == LongType || tsType.isInstanceOf[TimestampType.type] ||
      tsType == TimestampNTZType,
      s"-- events.ts drifted to $tsType: Tables.tsUs/tsTimestamp handle " +
        "long-nanos and timestamp forms only")
    assert(df.schema("event_id").dataType === LongType, "-- events.event_id")
    assert(df.schema("user_id").dataType === LongType, "-- events.user_id")
    assert(df.schema("event_type").dataType === StringType, "-- events.event_type")
    assert(df.schema("value").dataType === DoubleType, "-- events.value")
    assert(df.schema("props").dataType === StringType, "-- events.props")
    // the adapters themselves must evaluate (this is what round 7 lost
    // hours to): µs extraction and calendar bucketing both resolve
    val r = df.select(Tables.tsUs(df).as("us"), Tables.tsTimestamp(df).as("t"))
      .limit(1).collect()
    assert(r.nonEmpty && r(0).getLong(0) > 0L, "-- Tables.tsUs broken on current events schema")
  }

  test("testdata contract: tables are null-free (the null-ORDER divergence guard)") {
    // Spark sorts NULLS FIRST on ASC, DuckDB NULLS LAST — a null in any
    // column that reaches a final ORDER BY breaks the ordered-hash gate
    // even when every VALUE matches. The oracle suite's null discipline
    // (explicit IS NOT NULL filters where a query's semantics call for
    // them, e.g. e13/e14) is verified against these fixtures, which are
    // null-free BY GENERATION; if the driver ever regenerates testdata
    // WITH nulls, this fails in seconds with a named column instead of
    // as a wall of oracle hash mismatches.
    import org.apache.spark.sql.functions.{col, count, when, lit}
    for (table <- expected.keys.toSeq.sorted :+ "events") {
      val df = Tables.t(spark, sfDir, table)
      val counts = df.select(df.columns.map(c =>
        count(when(col(c).isNull, lit(1))).as(c)).toSeq: _*).head()
      val nullCols = df.columns.zipWithIndex.collect {
        case (c, i) if counts.getLong(i) > 0 => s"$c=${counts.getLong(i)}"
      }
      assert(nullCols.isEmpty,
        s"-- $table grew null cells (${nullCols.mkString(", ")}): audit " +
          "every query ordering by these columns for cross-engine null order")
    }
  }

  test("SparkEntry.entry: the driver's flagship smoke returns rows") {
    // the round driver smoke-checks entry(spark).count() > 0 at
    // sf0.001; pin the same contract here so a refactor that breaks
    // the flagship path fails in the suite, not in the driver log
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SparkEntry registry: packs merge without key collisions; oracles ⊆ queries") {
    // the 8 query packs merge with ++ — a duplicate name between packs
    // would SILENTLY drop one query from the gate, shrinking coverage
    // with every row still green
    val packs = Seq(
      graft.queries.RelationalQueries.queries,
      graft.queries.EventQueries.queries,
      graft.queries.TextQueries.queries,
      graft.queries.DedupQueries.queries,
      graft.queries.VectorQueries.queries,
      graft.queries.ParseQueries.queries,
      graft.queries.SearchQueries.queries,
      graft.queries.CurationQueries.queries)
    val merged = SparkEntry.queries
    assert(merged.size == packs.map(_.size).sum,
      s"pack key collision: merged ${merged.size} != sum ${packs.map(_.size).sum}")
    // same invariant inside each pack's own pair of maps
    val orphanOracles = SparkEntry.oracleSql.keySet -- merged.keySet
    assert(orphanOracles.isEmpty,
      s"oracles with no query (dead gate rows): $orphanOracles")
    // and every query carries an oracle — this engine's contract is
    // 100% SQL-gated coverage, so a rows-only residue is a regression
    val unOracled = merged.keySet -- SparkEntry.oracleSql.keySet
    assert(unOracled.isEmpty, s"queries with no oracle: $unOracled")
    // the committed gate size, pinned: STATUS.md's Gates block and the
    // driver's CORRECTNESS artifact both claim this number — a query
    // added or retired without updating the docs fails HERE, not in a
    // future audit. (q29 and t21 were never assigned — see STATUS.md —
    // so the count is not max-index arithmetic.)
    assert(merged.size == 166,
      s"query registry holds ${merged.size} entries, docs claim 166 -- " +
        "update STATUS.md Gates + this pin together")
  }
}
