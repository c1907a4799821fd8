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
  * Overflow envelope (documented, not silent): with |x| ≤ X and n rows
  * per group, Σx² ≤ n·X² and the z² predicate's products reach
  * ~9·n²·X²·… — BIGINT-exact through ~10⁹ rows × 4-digit measures
  * (n·Σx² < 2⁶³). Past that envelope, promote the moment columns to
  * DECIMAL(38,0) at the call site; the operator keeps LongType because
  * decimal partial aggregation is ~3× slower and every gated corpus
  * fits the envelope.
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
    // every product stays in exact long arithmetic, doubles enter only
    // at the sqrt/division — one fixed tree, IEEE-identical anywhere
    val num = (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).cast("double")
    val dx = (col("n") * col("sum_xx") - col("sum_x") * col("sum_x")).cast("double")
    val dy = (col("n") * col("sum_yy") - col("sum_y") * col("sum_y")).cast("double")
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
    * (both sides exact BIGINT products of the group moments). Two
    * passes: the moment aggregate (dim-sized output) broadcast-joins
    * back onto the fact side, and the filter is a narrow projection —
    * no window, no sort, no second shuffle at any scale.
    *
    * Returns the input rows of `df` (caller-selected `keep` columns)
    * plus the group's n/sum_x/sum_xx, filtered to outliers.
    */
  def zscoreOutliers(
      df: DataFrame, group: Column, x: Column,
      kNum: Int, kDen: Int,
      keep: Seq[String]): DataFrame = {
    require(kNum > 0 && kDen > 0, s"threshold must be positive, got $kNum/$kDen")
    val xl = x.cast("long")
    // null measures carry no z-score: dropped, not flagged (and never
    // allowed to skew n vs Σx — the corrMoments population rule)
    val g = df.filter(xl.isNotNull)
      .select((group.as("__g") +: keep.map(col)) :+ xl.as("__x"): _*)
    val stats = g.groupBy(col("__g")).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sum_x"),
      sum(col("__x") * col("__x")).as("sum_xx"))
    val dev = col("n") * col("__x") - col("sum_x") // n·(x − mean), scaled exact
    val varN2 = col("n") * col("sum_xx") - col("sum_x") * col("sum_x") // n²·varPop
    g.join(broadcast(stats), Seq("__g"))
      .filter(lit(kDen.toLong * kDen) * dev * dev > lit(kNum.toLong * kNum) * varN2)
      .select(col("__g").as("grp") +: keep.map(col) :+
        col("__x").as("x") :+ col("n") :+ col("sum_x") :+ col("sum_xx"): _*)
  }
}
