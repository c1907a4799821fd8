package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed descriptive statistics over INTEGER-quantized
  * measures — the engine's standing rule (never hash-compare raw double
  * aggregates; see graft.functions.Money) applied to second-moment
  * statistics: every moment is an exact BIGINT sum, so results are
  * bit-reproducible across engines, partitionings, and retries, and a
  * DuckDB oracle replays them to the last bit. Doubles appear only in
  * the FINAL derived ratio (corr), computed from the exact integer
  * moments with one fixed expression tree — IEEE-deterministic on both
  * engines.
  *
  * Scale shape: both operators are one map-side-combinable groupBy over
  * a pruned scan — the sufficient-statistic pattern (n, Σx, Σy, Σxy,
  * Σx², Σy² per group). Partial aggregation absorbs any row-count skew
  * before the (group-cardinality-sized) shuffle; the stats frame is
  * dim-sized, so the outlier pass attaches it back with a BROADCAST
  * join and the flagging filter is a narrow codegen'd projection.
  *
  * Overflow posture: the MOMENT SUMS stay LongType (decimal partial
  * aggregation is ~3× slower) — with |x| ≤ X that is exact while
  * n·X² < 2⁶³, i.e. any corpus size for small quantized measures
  * (X ≤ 10⁴ ⇒ n < 9·10¹⁴ rows per group); callers with large-magnitude
  * measures (raw cents of big totals) must downscale or promote the
  * measure first. The DERIVED second-order terms (n·Σxx − Σx² and the
  * z² predicate's products, ~n²·X²) overflow LONG orders of magnitude
  * earlier — at n·X ≳ 3·10⁹, hit by any 10⁸-row group — and Spark's
  * non-ANSI long multiply WRAPS silently while DuckDB raises, so those
  * terms are computed in DECIMAL(38,0) (exact to 10³⁸; n·X ≤ 10¹⁹),
  * which costs nothing measurable on group-cardinality-sized frames
  * and only a narrow filter on the fact side.
  */
object Stats {

  /** Per-group Pearson sufficient statistics over integer measures
    * `x`, `y` (already quantized by the caller — counts, cents,
    * micro-units), plus the correlation derived from them.
    *
    * Returns: group cols, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy
    * (all BIGINT-exact) and corr (double). The moments — not the
    * correlation — are the mergeable artifact: two partitions' (or two
    * days') moment rows ADD componentwise, the same merge-by-sum
    * contract as the KMV/heavy-hitter sketches (q23/q26), so a 100 TB
    * corr is a tree of integer adds with one final double division.
    */
  def corrMoments(df: DataFrame, groups: Seq[Column], x: Column, y: Column): DataFrame = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    // pairwise-complete: a null in either measure drops the ROW — mixing
    // count(*) with null-skipping sums would silently produce moments of
    // DIFFERENT populations (n of all rows, Σx of the non-null subset)
    val m = df.filter(xl.isNotNull && yl.isNotNull).groupBy(groups: _*).agg(
      count(lit(1)).as("n"),
      sum(xl).as("sum_x"),
      sum(yl).as("sum_y"),
      sum(xl * xl).as("sum_xx"),
      sum(yl * yl).as("sum_yy"),
      sum(xl * yl).as("sum_xy"))
    // corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²));
    // products in exact DECIMAL(38,0) — in LONG, n·Σxx ~ n²·X² wraps
    // silently past n·X ≈ 3·10⁹ (any 10⁸-row group) — doubles enter
    // only at the sqrt/division: one fixed tree, IEEE-identical anywhere
    def dec(c: Column) = c.cast("decimal(38,0)")
    val num = (dec(col("n")) * dec(col("sum_xy")) - dec(col("sum_x")) * dec(col("sum_y"))).cast("double")
    val dx = (dec(col("n")) * dec(col("sum_xx")) - dec(col("sum_x")) * dec(col("sum_x"))).cast("double")
    val dy = (dec(col("n")) * dec(col("sum_yy")) - dec(col("sum_y")) * dec(col("sum_y"))).cast("double")
    m.withColumn("corr",
      when(col("n") > 1 && dx > 0.0 && dy > 0.0, num / (sqrt(dx) * sqrt(dy))))
  }

  /** Rows whose integer measure `x` sits more than `kNum/kDen`
    * population standard deviations from its group mean — with the
    * ENTIRE predicate in exact integer arithmetic, so membership never
    * depends on floating-point rounding at the threshold:
    *
    *   z² > k²  ⇔  kDen²·(n·x − Σx)² > kNum²·(n·Σx² − (Σx)²)
    *
    * (both sides exact DECIMAL(38,0) products of the long moments — in
    * LONG the squares ~n²·X² wrap silently past n·X ≈ 3·10⁹; see the
    * header's overflow posture). Two passes: the moment aggregate
    * (dim-sized output) broadcast-joins back onto the fact side, and
    * the filter is a narrow projection — no window, no sort, no second
    * shuffle at any scale.
    *
    * Returns the input rows of `df` (caller-selected `keep` columns)
    * plus the group's n/sum_x/sum_xx, filtered to outliers. `keep`
    * names must not collide with the output's own columns
    * (grp/x/n/sum_x/sum_xx) — refused loudly.
    */
  def zscoreOutliers(
      df: DataFrame, group: Column, x: Column,
      kNum: Int, kDen: Int,
      keep: Seq[String]): DataFrame = {
    require(kNum > 0 && kDen > 0, s"threshold must be positive, got $kNum/$kDen")
    val reserved = Set("grp", "x", "n", "sum_x", "sum_xx", "__g", "__x")
    val clash = keep.filter(reserved)
    require(clash.isEmpty,
      s"keep columns collide with the output's own columns: ${clash.mkString(", ")} " +
        "-- rename them before calling (the moment columns join back onto every row)")
    val xl = x.cast("long")
    // null measures carry no z-score: dropped, not flagged (and never
    // allowed to skew n vs Σx — the corrMoments population rule)
    val g = df.filter(xl.isNotNull)
      .select((group.as("__g") +: keep.map(col)) :+ xl.as("__x"): _*)
    def dec(c: Column) = c.cast("decimal(38,0)")
    // GROUP-LEVEL decimal work happens once per group on the dim-sized
    // stats frame (kNum²·(n·Σxx − Σx²) — the n²·X²-scale products that
    // wrap in long), so the fact side pays only ONE decimal square per
    // row. First cut did all five decimal products per fact row — a
    // measured 1.9× serve regression at sf0.1.
    val stats = g.groupBy(col("__g")).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sum_x"),
      sum(col("__x") * col("__x")).as("sum_xx"))
      .withColumn("__rhs",
        lit(kNum.toLong * kNum).cast("decimal(38,0)") *
          (dec(col("n")) * dec(col("sum_xx")) - dec(col("sum_x")) * dec(col("sum_x"))))
    // n·(x − mean) in LONG is exact while n·|x| < 2⁶³ (n < 10¹⁷ rows
    // per group at 4-digit measures — beyond any corpus); its SQUARE is
    // what wraps early, so that one multiply is decimal
    val dev = dec(col("n") * col("__x") - col("sum_x"))
    g.join(broadcast(stats), Seq("__g"))
      .filter(lit(kDen.toLong * kDen).cast("decimal(38,0)") * dev * dev > col("__rhs"))
      .select(col("__g").as("grp") +: keep.map(col) :+
        col("__x").as("x") :+ col("n") :+ col("sum_x") :+ col("sum_xx"): _*)
  }
}
