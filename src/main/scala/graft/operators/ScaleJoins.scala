package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes AQE can't fix alone (SURVEY §2.3 at
  * 100 TB; SCALE.md "Partitioning & shuffle").
  *
  * - Salting: a hot key floods one reducer in a shuffle join. Salting
  *   splits each fact key into `buckets` synthetic sub-keys and
  *   replicates the matching dim rows across all sub-keys — the hot key
  *   spreads over `buckets` tasks at the cost of a `buckets`× dim
  *   replication (dim side must be the small one, but too big / too
  *   dynamic to broadcast outright).
  * - Bucketing: pre-shuffling both tables into the same bucket layout at
  *   write time makes every subsequent equi-join on the bucket key
  *   exchange-free — the write-once/join-many trade.
  */
object ScaleJoins {

  /** Skew-resistant equi-join. `saltBy` must distribute rows of the SAME
    * key across salts (any per-row column works — an id, a timestamp);
    * determinism matters for retries, so no rand().
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: Column,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `buckets` null-padded copies of every
    // unmatched (replicated) dim row — semantically wrong, so refuse
    val jt = joinType.toLowerCase.replace("_", "")
    require(
      Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross").contains(jt),
      s"saltedJoin supports inner/left/semi/anti joins, not $joinType (dim side is replicated)")
    val salted = fact.withColumn("__salt", pmod(hash(saltBy), lit(buckets)))
    val replicated = dim.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Propose a [[saltedJoin]] bucket count from the OBSERVED hot-key
    * share of the fact side, instead of a caller guess — the same
    * sizing logic AQE applies to skew splits: a key carrying share `p`
    * of the rows floods one reducer unless split ~`p × parallelism`
    * ways, at which point its splits shrink to the average partition.
    *
    * The histogram comes from a bounded PER-SPLIT prefix sample: the
    * head of EVERY input partition (~sampleRows total across them), not
    * one global `limit` — a global prefix reads a single split, and on
    * key-clustered input (sorted/bucketed lakes, the common case) that
    * split can hold only cold keys, hiding exactly the hot key this
    * helper exists to find. A hot key at salting-relevant scale spans
    * many splits by definition (one split is bounded by
    * maxPartitionBytes), so every split's head sees it. The estimate
    * steers a knob, not correctness. Returns a value in [1, shuffle
    * parallelism]; 1 means "no salting needed" (uniform keys).
    */
  def suggestSaltBuckets(
      fact: DataFrame, key: String, sampleRows: Int = 100000): Int = {
    val spark = fact.sparkSession
    val par = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = fact.select(col(key).cast("string").as("value"))
    // the REAL scan-partition count, from the physical plan's partition
    // metadata (no job runs, no row decodes — only the file listing the
    // query needs anyway). The prefix is taken PER SPLIT, so sizing it
    // by anything else (file count, default parallelism) mis-sizes the
    // sample whenever files != splits — thousands of small files
    // coalesced into few splits would sample almost nothing, one giant
    // file split wide would sample almost everything.
    val nParts = math.max(1, keyed.queryExecution.toRdd.getNumPartitions)
    val perPart = math.max(1, sampleRows / nParts)
    // per-split prefix via a typed mapPartitions take: the row iterator
    // is LAZY over the vectorized reader's batches, so each split
    // decodes ~perPart rows (about one columnar batch) and STOPS —
    // ~sampleRows rows read in total. A filter on
    // monotonically_increasing_id offsets cannot do this: a
    // nondeterministic-expression filter never short-circuits the scan,
    // so every row of every split would be decoded just to be
    // discarded — a full key-column pass on the 10^9-row table this
    // helper exists to protect.
    import keyed.sparkSession.implicits._
    val r = keyed.as[String].mapPartitions(_.take(perPart)).toDF("value")
      .groupBy("value").agg(count(lit(1)).as("__n"))
      .agg(max("__n").as("hot"), sum("__n").as("total"))
      .head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 1
    else {
      val share = r.getLong(0).toDouble / r.getLong(1)
      math.max(1, math.min(par, math.ceil(share * par).toInt))
    }
  }

  /** Write a table bucketed+sorted by `key` — subsequent equi-joins
    * between tables sharing this layout plan without an Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
