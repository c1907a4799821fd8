package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic shuffle + token-budget shard packing — the "write
  * training shards" tail of a data pipeline.
  *
  * Training runs want the corpus (a) in a reproducible pseudo-random
  * order (data order is part of the training recipe) and (b) chopped
  * into fixed-token-budget shards (concatenate-and-chop packing). Both
  * must be deterministic under task retries and re-runs, so ordering by
  * `rand()` or `monotonically_increasing_id()` is wrong — the order key
  * is `h60(salt:id)`: changing `salt` draws an independent permutation,
  * same salt reproduces the same shards bit-for-bit on any cluster
  * (same argument as [[Sampling]]).
  *
  * Scale shape: one shuffle. Docs are hash-bucketed into `nBuckets`
  * independent streams (bucket = key mod nBuckets); within a bucket the
  * prefix-token sum runs as a window over (bucket) ordered by the
  * shuffle key — a distributed sort + per-partition running sum that
  * spills. A doc starts in shard `floor(prefixTokens / budget)` of its
  * bucket. `nBuckets` bounds both parallelism and the sequential stream
  * length: size it to the cluster (thousands at 100 TB), not to the
  * shard count — shards are unbounded per bucket.
  */
object Packing {

  /** Assign every doc a (bucket, shard, start_tok) under
    * concatenate-and-chop packing in deterministic shuffled order.
    *
    * Null token counts propagate as null start_tok/shard for THAT row
    * (window sum skips nulls, so later docs in the bucket are unaffected)
    * — garbage in, visibly-null out, never a silently shifted shard
    * boundary.
    *
    * Returns one row per input doc: doc_id, n_tokens, bucket, shard,
    * start_tok (token offset of the doc within its bucket's stream).
    */
  /** The "size nBuckets to the cluster" contract, enforced as a
    * warning: the pack window runs ONE task per bucket, so nBuckets far
    * below the session's shuffle width leaves most of the cluster idle
    * through the heaviest stage. Pure so the spec can pin the boundary.
    */
  private[graft] def bucketSizingWarning(
      nBuckets: Int, shufflePartitions: Int): Option[String] =
    if (nBuckets < shufflePartitions / 4)
      Some(s"packShards nBuckets=$nBuckets is far below the session's shuffle " +
        s"parallelism ($shufflePartitions): the pack stage runs one task per bucket, " +
        "so most of the cluster idles -- size nBuckets to the cluster " +
        "(thousands at 100 TB), not to the shard count")
    else None

  /** The cluster-derived [[packShards]] `nBuckets` default (the 0
    * sentinel): max of core parallelism and the session's shuffle
    * width, so the shipped default saturates whatever cluster runs it
    * — a fixed literal here would be the exact anti-pattern
    * [[bucketSizingWarning]] exists to flag. CAVEAT — the 0 sentinel
    * makes the OUTPUT LAYOUT environment-dependent: bucket and shard
    * assignment per doc differ across clusters (and across re-runs on a
    * resized cluster), because the derived count feeds the pmod that
    * places each doc. Reproducible recipes MUST pin nBuckets
    * explicitly; the derived value is logged at info on every
    * default-config run so a layout can be replayed after the fact.
    * Callers pass an explicit nBuckets whenever the bucket layout
    * itself is part of the contract (reproducing a published recipe's
    * shard map).
    */
  private def derivedBuckets(df: DataFrame): Int =
    math.max(
      df.sparkSession.sparkContext.defaultParallelism,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)

  def packShards(
      df: DataFrame,
      id: Column,
      tokens: Column,
      budget: Long,
      nBuckets: Int = 0,
      salt: String): DataFrame = {
    require(budget > 0, s"shard token budget must be positive, got $budget")
    require(nBuckets >= 0, s"nBuckets must be positive (or 0 = derive from the cluster), got $nBuckets")
    val nb = if (nBuckets == 0) derivedBuckets(df) else nBuckets
    if (nBuckets == 0)
      org.slf4j.LoggerFactory.getLogger(getClass).info(
        s"packShards derived nBuckets=$nb from the cluster (0 sentinel): the " +
          "bucket/shard layout is environment-dependent -- pin nBuckets to " +
          "reproduce this layout elsewhere")
    bucketSizingWarning(
      nb, df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .foreach(org.slf4j.LoggerFactory.getLogger(getClass).warn(_))
    val key = Hashing.h60(concat(lit(salt + ":"), id.cast("string")))
    // doc_id tiebreak: h60 collisions must not make the order ambiguous
    val w = Window.partitionBy("bucket").orderBy(col("__key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("doc_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("__key", key)
      .withColumn("bucket", pmod(col("__key"), lit(nb.toLong)))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", floor(col("start_tok") / budget))
      .drop("__key")
  }

  /** Write the packed corpus as ONE artifact per (bucket, shard) — the
    * actual tail of a training-data pipeline ([[packShards]] only
    * assigns; this materializes). The reference's export walks docs to
    * files in a caller-chosen order
    * (/root/reference/src/file_indexing_system.py:436-489, write
    * dispatch /root/reference/src/etl.py:157-176); here the layout is
    * `path/bucket=B/shard=S/` with exactly one file per leaf and the
    * docs INSIDE each file in pack order (start_tok) — intra-shard
    * order is part of the training recipe, and Spark guarantees no
    * write order without an explicit sort contract, so this sink owns
    * it:
    *
    *  - `repartition(bucket, shard)` puts every (bucket, shard) group
    *    wholly inside one task → one output file per leaf directory;
    *  - `sortWithinPartitions(bucket, shard, start_tok, doc_id)` fixes
    *    the row order inside each file. Its (bucket, shard) prefix is
    *    exactly the ordering the dynamic-partition writer would sort by
    *    anyway, so no second sort sneaks in to disturb it.
    *
    * Both the placement hash and the order key are deterministic
    * functions of (salt, doc_id), so two runs over the same input
    * produce identical files — retry/rerun-stable like [[packShards]].
    *
    * `payload` columns (doc text, metadata) are joined back by doc id
    * AFTER the narrow pack pass: the wide rows shuffle once into
    * placement instead of dragging through the pack window's sort.
    * Docs with null token counts have no shard (see [[packShards]]) and
    * land in the writer's null partition (`shard=__HIVE_DEFAULT...`) —
    * visible quarantine, never a silently shifted boundary.
    *
    * `format`: "parquet" (default) or "json" (one JSON doc per line —
    * the jsonl shape).
    */
  def writeShards(
      df: DataFrame,
      id: Column,
      tokens: Column,
      budget: Long,
      nBuckets: Int = 0,
      salt: String,
      path: String,
      payload: Seq[Column] = Nil,
      format: String = "parquet"): Unit = {
    require(Set("parquet", "json").contains(format),
      s"writeShards supports parquet/json, got $format")
    val assigned = packShards(df, id, tokens, budget, nBuckets, salt)
    val full =
      if (payload.isEmpty) assigned
      else assigned.join(df.select((id.as("doc_id") +: payload): _*), "doc_id")
    full
      .repartition(col("bucket"), col("shard"))
      .sortWithinPartitions(col("bucket"), col("shard"), col("start_tok"), col("doc_id"))
      .write.partitionBy("bucket", "shard").mode("overwrite").format(format).save(path)
  }
}
